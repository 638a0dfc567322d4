"""Long-tail components: patch eval, tissue mask, wasabi export, viz,
serializers, train utils."""
import json
import os

import joblib
import numpy as np
import pytest

import jax

from cerberus_tpu.config import (DEFAULT_DECODER_KWARGS,
                                 DEFAULT_TARGET_CODE, ModelConfig)


def test_patch_eval_pipeline(tmp_path):
    from cerberus_tpu.infer.patch import InferManager

    # synthetic .dat patch files
    input_dir = tmp_path / "patches"
    os.makedirs(input_dir)
    rng = np.random.default_rng(0)
    for i in range(12):
        joblib.dump(
            {"img": rng.integers(0, 255, (160, 160, 3)).astype(np.uint8),
             "ann": int(i % 3)},
            input_dir / f"p{i}.dat")

    model_kwargs = {
        "encoder_backbone_name": "resnet18",
        "decoder_kwargs": DEFAULT_DECODER_KWARGS,
        "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
    }
    infer = InferManager(decoder_dict=dict(DEFAULT_TARGET_CODE),
                         model_args=model_kwargs)
    results = infer.process_file_list({
        "input_dir": str(input_dir),
        "batch_size": 4,
        "patch_input_shape": 144,
    })
    assert 0.0 <= results["acc_all"] <= 1.0
    assert results["conf_mat"].shape == (9, 9)


def test_tissue_mask_separates_tissue_from_background():
    from cerberus_tpu.ops.tissue_mask import get_tissue_mask

    rng = np.random.default_rng(0)
    img = np.full((160, 160, 3), 245, np.uint8)  # white background
    # tissue-like textured pink region
    region = rng.integers(0, 80, (160, 80, 3))
    img[:, :80] = np.clip(np.array([200, 120, 160]) - region, 0, 255)
    mask = get_tissue_mask(img)
    assert mask.dtype == np.uint8
    assert mask[:, 10:70].mean() > 0.5      # tissue side mostly on
    assert mask[:, 100:].mean() < 0.2       # background mostly off


def test_wasabi_export(tmp_path):
    from cerberus_tpu.utils.export import to_wasabi
    from cerberus_tpu.utils.viz import DEFAULT_VIZ_INFO

    inst = {
        "a": {"contour": np.array([[0, 0], [10, 0], [10, 10]]), "type": 1},
        "b": {"contour": np.array([[5, 5], [15, 5], [15, 15]])},
    }
    path = tmp_path / "ann.json"
    to_wasabi(str(path), inst, DEFAULT_VIZ_INFO["nuclei"], "contour", 2.0,
              "cerberus")
    data = json.loads(path.read_text())
    elements = data["annotation"]["elements"]
    assert len(elements) == 2
    assert elements[0]["type"] == "polyline"
    assert elements[0]["points"][1] == [20, 0, 0]  # scaled by 2


def test_viz_step_output_grid():
    from cerberus_tpu.train.viz import viz_step_output

    rng = np.random.default_rng(0)
    raw = {
        "img": rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8),
        "true": {"Gland-INST": rng.integers(0, 3, (2, 32, 32))},
        "pred": {"Gland-INST": rng.random((2, 32, 32, 3))},
    }
    canvas = viz_step_output(raw, {"Gland-INST": 3})
    assert canvas.dtype == np.uint8
    assert canvas.shape[0] == 64 and canvas.shape[1] >= 96


def test_serializers_and_fig2data():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cerberus_tpu.train.serialize import fig2data, serialize

    assert serialize("scalar", "console", 0.123456) == "0.12346"
    assert serialize("conf_mat", "json", np.eye(2)) == [[1, 0], [0, 1]]
    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1])
    arr = fig2data(fig)
    plt.close(fig)
    assert arr.ndim == 3 and arr.shape[-1] == 3 and arr.dtype == np.uint8


def test_model_summary_counts():
    from cerberus_tpu.config import ModelConfig
    from cerberus_tpu.models.net_desc import init_net_params
    from cerberus_tpu.train.utils import count_parameters, get_model_summary

    cfg = ModelConfig.from_kwargs({
        "encoder_backbone_name": "resnet18",
        "decoder_kwargs": {"Gland": {"INST": 3}},
        "considered_tasks": ["Gland"],
    })
    params = init_net_params(jax.random.PRNGKey(0), cfg)
    total = count_parameters(params)
    assert total > 1e6
    summary = get_model_summary(params)
    assert "TOTAL" in summary and "backbone.conv1" in summary


def test_pairwise_iou_and_matching():
    from cerberus_tpu.utils.geometry import match_instances, pairwise_iou

    true = np.zeros((8, 8), np.int32)
    pred = np.zeros((8, 8), np.int32)
    true[0:4, 0:4] = 1
    true[5:8, 5:8] = 2
    pred[0:4, 1:4] = 1   # IoU 12/16 with true 1
    pred[5:8, 4:8] = 2   # IoU 9/12 with true 2
    pred[0:2, 6:8] = 3   # spurious
    iou = pairwise_iou(true, pred)
    assert iou.shape == (2, 3)
    np.testing.assert_allclose(iou[0, 0], 12 / 16)
    np.testing.assert_allclose(iou[1, 1], 9 / 12)
    assert iou[0, 2] == 0.0
    pairs, un_t, un_p = match_instances(true, pred)
    assert [(t, p) for t, p, _ in pairs] == [(2, 2), (1, 1)]
    assert un_t == [] and un_p == [3]

    # empty maps
    assert pairwise_iou(np.zeros((4, 4)), pred[:4, :4]).shape[0] == 0


def test_run_eval_patch_cli_smoke(tmp_path):
    """run_eval_patch.py end-to-end via subprocess: prints metrics and
    exits 0 (the reference's infer/patch.py is bit-rotted and has no CLI;
    this one completes it — reference infer/patch.py:1-40)."""
    import subprocess
    import sys

    import yaml

    import jax

    from cerberus_tpu.models.convert import save_checkpoint
    from cerberus_tpu.models.net_desc import init_net_params

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model_kwargs = {
        "encoder_backbone_name": "resnet18",
        "decoder_kwargs": DEFAULT_DECODER_KWARGS,
        "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
    }
    model_dir = tmp_path / "model"
    os.makedirs(model_dir)
    save_checkpoint(str(model_dir / "weights.tar"),
                    init_net_params(jax.random.PRNGKey(0),
                                    ModelConfig.from_kwargs(model_kwargs)))
    with open(model_dir / "settings.yml", "w") as f:
        yaml.safe_dump({"dataset_kwargs":
                        {"req_target_code": dict(DEFAULT_TARGET_CODE)},
                        "model_kwargs": model_kwargs}, f)
    input_dir = tmp_path / "patches"
    os.makedirs(input_dir)
    rng = np.random.default_rng(0)
    for i in range(6):
        joblib.dump(
            {"img": rng.integers(0, 255, (160, 160, 3)).astype(np.uint8),
             "ann": int(i % 3)},
            input_dir / f"p{i}.dat")

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               CERBERUS_DEFAULT_DEVICE="cpu")
    result = subprocess.run(
        [sys.executable, os.path.join(repo, "run_eval_patch.py"),
         f"--model={model_dir}", f"--input_dir={input_dir}",
         "--batch_size=3", "--patch_input_shape=144"],
        capture_output=True, text=True, timeout=480, env=env, cwd=repo)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "acc" in result.stdout.lower()
