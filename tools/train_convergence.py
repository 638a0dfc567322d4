"""Training convergence artifact: synthetic structured data -> N hundred
steps through the REAL run_train.py CLI -> assert the loss drops materially
-> drive the saved checkpoint through the REAL tile CLI -> assert plausible,
mask-aligned instances (round-4 verdict task 5; reference behavior being
matched: models/run_desc.py:25-230 + run_utils/engine.py:140-216 — the
reference ships the engine with no launcher and no convergence evidence).

CPU-feasible: 48² geometry, resnet18, ~320 steps (~5 min). Writes
logging/TRAIN_CONVERGENCE.json with the per-epoch loss curve and the
train->checkpoint->infer round-trip stats.

Usage: python tools/train_convergence.py [--epochs=20] [--root=/tmp/train_conv]
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODEL_KWARGS = {
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": {"Gland": {"INST": 3},
                       "Gland#TYPE": {"TYPE": 3},
                       "Patch-Class": {"OUT": 9}},
    "considered_tasks": ["Gland", "Gland#TYPE", "Patch-Class"],
}
TARGET_CODE = {"Gland-INST": "IP-ERODED-CONTOUR-3", "Gland-TYPE": "TP",
               "Patch-Class": "PC"}


def _draw_sample(rng, hw=64, infer_scale=1):
    """White background + dark discs: a color rule a small net can learn.
    Returns (img, inst_map)."""
    import cv2

    h = w = hw * infer_scale
    img = np.full((h, w, 3), 235, np.uint8)
    inst = np.zeros((h, w), np.int32)
    n = rng.integers(1, 3) if infer_scale == 1 else 12
    for i in range(1, int(n) + 1):
        r = int(rng.integers(9, 14)) * infer_scale
        cy = int(rng.integers(r + 2, h - r - 2))
        cx = int(rng.integers(r + 2, w - r - 2))
        col = tuple(int(v) for v in rng.integers(30, 110, 3))
        cv2.circle(img, (cx, cy), r, col, -1)
        cv2.circle(inst, (cx, cy), r, int(i), -1)
    return img, inst


def make_dataset(data_dir, n=64, seed=0):
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        img, inst = _draw_sample(rng)
        sample = {
            "img": img,
            "ann": np.stack([inst, (inst > 0).astype(np.int32)], -1),
            "channels": ["Gland-INST", "Gland-TYPE"],
            "patch_class": 1,
        }
        np.save(os.path.join(data_dir, f"s{i}.npy"), sample)


def main():
    epochs = 20
    root = "/tmp/train_conv"
    for a in sys.argv[1:]:
        if a.startswith("--epochs="):
            epochs = int(a.split("=", 1)[1])
        elif a.startswith("--root="):
            root = a.split("=", 1)[1]
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    data_dir = os.path.join(root, "data")
    make_dataset(data_dir)

    settings = {
        "model_kwargs": MODEL_KWARGS,
        "optimizer_kwargs": {"lr": 1.0e-3, "betas": [0.9, 0.999]},
        "loss_kwargs": {"loss_info": {
            "Gland-INST": {"weight": 1, "loss": {"ce": 1}},
            "Gland-TYPE": {"weight": 1, "loss": {"ce": 1, "dice": 1}},
            "Patch-Class": {"weight": 0.4, "loss": {"ce": 1}},
        }},
        "dataset_kwargs": {
            "req_target_code": dict(TARGET_CODE),
            "train_dir": data_dir,
            "input_shape": 48,
            "output_shape": 48,
        },
    }
    settings_path = os.path.join(root, "settings.yml")
    with open(settings_path, "w") as f:
        yaml.safe_dump(settings, f)

    # ---- train through the real CLI ---------------------------------
    log_dir = os.path.join(root, "logs")
    env = dict(os.environ, JAX_PLATFORMS="cpu", CERBERUS_DEFAULT_DEVICE="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_train.py"),
         f"--settings={settings_path}", f"--log_dir={log_dir}",
         f"--nr_epochs={epochs}", "--batch_size=4", "--per_n_steps=16"],
        capture_output=True, text=True, timeout=3600, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-4000:]
    with open(os.path.join(log_dir, "stats.yml")) as f:
        stats = yaml.safe_load(f)

    def epoch_loss(entry):
        for k, v in entry.items():
            if k.endswith("overall_loss") or k == "train-overall_loss":
                return float(v)
        # fall back: sum every train loss component
        return float(sum(float(v) for k, v in entry.items()
                         if "loss" in k and isinstance(v, (int, float))))

    keys = sorted(stats.keys(), key=int)  # epoch keys are stringified ints
    curve = [epoch_loss(stats[k]) for k in keys]
    first, last = curve[0], curve[-1]
    print(f"loss curve: first={first:.4f} last={last:.4f} "
          f"({len(curve)} epochs)")
    assert last < 0.5 * first, (
        f"loss did not decrease materially: {first:.4f} -> {last:.4f}")

    # ---- drive the saved checkpoint through the tile CLI -------------
    ckpts = (sorted(glob.glob(os.path.join(log_dir, "*epoch-*.tar")))
             or sorted(glob.glob(os.path.join(log_dir, "*step-*.tar"))))
    assert ckpts, f"no checkpoints under {log_dir}"
    model_dir = os.path.join(root, "model")
    os.makedirs(model_dir, exist_ok=True)
    shutil.copy(ckpts[-1], os.path.join(model_dir, "weights.tar"))
    with open(os.path.join(model_dir, "settings.yml"), "w") as f:
        yaml.safe_dump({"dataset_kwargs":
                        {"req_target_code": dict(TARGET_CODE)},
                        "model_kwargs": MODEL_KWARGS}, f)

    import cv2

    rng = np.random.default_rng(99)
    img, inst_true = _draw_sample(rng, hw=64, infer_scale=6)  # 384²
    in_dir = os.path.join(root, "input")
    os.makedirs(in_dir, exist_ok=True)
    cv2.imwrite(os.path.join(in_dir, "t.png"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    out_dir = os.path.join(root, "out")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_infer_tile.py"),
         f"--model={model_dir}", f"--input_dir={in_dir}",
         f"--output_dir={out_dir}", "--batch_size=4",
         "--patch_input_shape=144", "--patch_output_shape=48",
         "--nr_inference_workers=0", "--nr_post_proc_workers=0"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-4000:]

    import scipy.io as sio

    mat = sio.loadmat(os.path.join(out_dir, "gland_mat", "t.mat"))
    inst_map = mat["inst_map"]
    n_inst = len(np.unique(inst_map)) - 1
    true_fg = inst_true > 0
    pred_fg = inst_map > 0
    iou = (np.logical_and(true_fg, pred_fg).sum()
           / max(np.logical_or(true_fg, pred_fg).sum(), 1))
    print(f"instances={n_inst} fg-IoU vs ground truth={iou:.3f}")
    assert n_inst > 0, "trained checkpoint produced no instances"
    assert iou > 0.3, f"instances not mask-aligned (IoU {iou:.3f})"

    artifact = {
        "metric": "train->checkpoint->infer round trip (CPU, 48² resnet18)",
        "epochs": epochs, "steps": epochs * 16,
        "loss_curve_per_epoch": [round(v, 5) for v in curve],
        "loss_first": round(first, 5), "loss_last": round(last, 5),
        "infer_instances": int(n_inst), "infer_fg_iou": round(float(iou), 4),
    }
    os.makedirs(os.path.join(REPO, "logging"), exist_ok=True)
    with open(os.path.join(REPO, "logging", "TRAIN_CONVERGENCE.json"),
              "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
