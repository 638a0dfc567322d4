"""run_train.py CLI smoke test: tiny dataset, one epoch, via subprocess."""
import os
import subprocess
import sys

import numpy as np
import yaml


def test_run_train_cli_one_epoch(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    rng = np.random.default_rng(0)
    for i in range(4):
        inst = np.zeros((64, 64), np.int32)
        inst[8:24, 8:24] = 1
        sample = {
            "img": rng.integers(0, 255, (64, 64, 3)).astype(np.uint8),
            "ann": np.stack([inst, (inst > 0).astype(np.int32)], -1),
            "channels": ["Gland-INST", "Gland-TYPE"],
            "patch_class": 1,
        }
        np.save(data_dir / f"s{i}.npy", sample)

    settings = {
        "model_kwargs": {
            "encoder_backbone_name": "resnet18",
            "decoder_kwargs": {"Gland": {"INST": 3},
                               "Gland#TYPE": {"TYPE": 3},
                               "Patch-Class": {"OUT": 9}},
            "considered_tasks": ["Gland", "Gland#TYPE", "Patch-Class"],
        },
        "optimizer_kwargs": {"lr": 1.0e-3, "betas": [0.9, 0.999]},
        "loss_kwargs": {"loss_info": {
            "Gland-INST": {"weight": 1, "loss": {"ce": 1}},
            "Gland-TYPE": {"weight": 1, "loss": {"ce": 1, "dice": 1}},
            "Patch-Class": {"weight": 0.4, "loss": {"ce": 1}},
        }},
        "dataset_kwargs": {
            "req_target_code": {"Gland-INST": "IP-ERODED-CONTOUR-3",
                                "Gland-TYPE": "TP", "Patch-Class": "PC"},
            "train_dir": str(data_dir),
            "input_shape": 48,
            "output_shape": 48,
        },
    }
    settings_path = tmp_path / "settings.yml"
    with open(settings_path, "w") as f:
        yaml.safe_dump(settings, f)

    log_dir = tmp_path / "logs"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               CERBERUS_DEFAULT_DEVICE="cpu")
    result = subprocess.run(
        [sys.executable, os.path.join(repo, "run_train.py"),
         f"--settings={settings_path}", f"--log_dir={log_dir}",
         "--nr_epochs=1", "--batch_size=2", "--per_n_steps=1",
         "--remat=towers"],
        capture_output=True, text=True, timeout=480, env=env, cwd=repo)
    assert result.returncode == 0, result.stderr[-3000:]
    assert os.path.exists(log_dir / "stats.yml"), result.stderr[-2000:]

    # bad --remat values must fail fast, before any compilation
    result = subprocess.run(
        [sys.executable, os.path.join(repo, "run_train.py"),
         f"--settings={settings_path}", f"--log_dir={log_dir}",
         "--nr_epochs=1", "--batch_size=2", "--remat=bogus"],
        capture_output=True, text=True, timeout=240, env=env, cwd=repo)
    assert result.returncode != 0
    assert "--remat" in result.stderr
