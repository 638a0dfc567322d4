"""Tile pipeline end-to-end with postproc_backend='tpu' (on-chip instance
kernels) produces the same outputs as the CPU oracle path."""
import os

import numpy as np
import pytest
import scipy.io as sio
import yaml

import jax

from cerberus_tpu.config import (
    DEFAULT_DECODER_KWARGS,
    DEFAULT_TARGET_CODE,
    DEFAULT_TARGET_LIST,
    ModelConfig,
)
from cerberus_tpu.models.convert import save_checkpoint
from cerberus_tpu.models.net_desc import init_net_params

MODEL_KWARGS = {
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
}


def test_tile_pipeline_tpu_backend_matches_cpu(tmp_path):
    import cv2

    from cerberus_tpu.infer.tile import InferManager

    model_dir = tmp_path / "model"
    os.makedirs(model_dir)
    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    save_checkpoint(str(model_dir / "weights.tar"),
                    init_net_params(jax.random.PRNGKey(7), cfg))
    with open(model_dir / "settings.yml", "w") as f:
        yaml.safe_dump({"dataset_kwargs":
                        {"req_target_code": dict(DEFAULT_TARGET_CODE)},
                        "model_kwargs": MODEL_KWARGS}, f)

    input_dir = tmp_path / "input"
    os.makedirs(input_dir)
    rng = np.random.default_rng(0)
    cv2.imwrite(str(input_dir / "t.png"),
                rng.integers(0, 255, (96, 96, 3)).astype(np.uint8))

    outputs = {}
    for backend in ("cpu", "tpu"):
        out_dir = tmp_path / f"out_{backend}"
        infer = InferManager(
            checkpoint_path=str(model_dir / "weights.tar"),
            decoder_dict=dict(DEFAULT_TARGET_CODE),
            model_args=MODEL_KWARGS,
        )
        infer.process_file_list({
            "nr_inference_workers": 0,
            "nr_post_proc_workers": 0,
            "batch_size": 4,
            "input_dir": str(input_dir),
            "output_dir": str(out_dir),
            "patch_input_shape": 144,
            "patch_output_shape": 48,
            "patch_output_overlap": 0,
            "postproc_list": list(DEFAULT_TARGET_LIST),
            "postproc_backend": backend,
        })
        outputs[backend] = {
            task: sio.loadmat(str(out_dir / f"{task}_mat" / "t.mat"))
            for task in ("gland", "lumen", "nuclei")
        }

    for task in ("gland", "lumen", "nuclei"):
        cpu_map = outputs["cpu"][task]["inst_map"]
        tpu_map = outputs["tpu"][task]["inst_map"]
        # identical instance counts and near-identical pixel coverage
        assert len(np.unique(cpu_map)) == len(np.unique(tpu_map)), task
        disagree = ((cpu_map > 0) != (tpu_map > 0)).mean()
        assert disagree < 0.02, (task, disagree)
