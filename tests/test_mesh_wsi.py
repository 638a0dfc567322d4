"""WSI pipeline with batch-sharded inference over the 8-device CPU mesh —
the config-4 shape (multi-chip tile feeder) without real chips."""
import os

import numpy as np
import pytest
import yaml

import conftest

import jax
import joblib

from cerberus_tpu.config import (
    DEFAULT_DECODER_KWARGS,
    DEFAULT_TARGET_CODE,
    DEFAULT_TARGET_LIST,
    ModelConfig,
)
from cerberus_tpu.models.convert import save_checkpoint
from cerberus_tpu.models.net_desc import init_net_params
from cerberus_tpu.parallel.mesh import make_mesh

MODEL_KWARGS = {
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
}


def test_wsi_pipeline_mesh_sharded(tmp_path):
    import cv2

    from cerberus_tpu.infer.wsi import InferManager

    model_dir = tmp_path / "model"
    os.makedirs(model_dir)
    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    save_checkpoint(str(model_dir / "weights.tar"),
                    init_net_params(jax.random.PRNGKey(5), cfg))
    with open(model_dir / "settings.yml", "w") as f:
        yaml.safe_dump({"dataset_kwargs":
                        {"req_target_code": dict(DEFAULT_TARGET_CODE)},
                        "model_kwargs": MODEL_KWARGS}, f)

    slide_dir = tmp_path / "input" / "s"
    os.makedirs(slide_dir)
    rng = np.random.default_rng(0)
    np.save(slide_dir / "level_0.npy",
            rng.integers(80, 250, (400, 500, 3)).astype(np.uint8))
    with open(slide_dir / "meta.yml", "w") as f:
        yaml.safe_dump({"mpp": 0.5}, f)

    mesh = make_mesh(conftest.cpu_mesh_devices())
    infer = InferManager(
        checkpoint_path=str(model_dir / "weights.tar"),
        decoder_dict=dict(DEFAULT_TARGET_CODE),
        model_args=MODEL_KWARGS,
        mesh=mesh,
    )
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    infer.process_wsi_list({
        "nr_inference_workers": 2,
        "nr_post_proc_workers": 0,
        "batch_size": 8,  # = mesh size: one patch per device per step
        "input_list": [str(slide_dir)],
        "mask_list": [None],
        "output_dir": out_dir,
        "patch_input_shape": 144,
        "patch_output_shape": 48,
        "save_thumb": False,
        "save_mask": False,
        "postproc_list": list(DEFAULT_TARGET_LIST),
        "tile_shape": 192,
        "chunk_shape": 480,
        "ambiguous_size": 16,
        "cache_path": str(tmp_path / "cache"),
        "logging_dir": str(tmp_path / "logging"),
        "wsi_proc_mag": 0.5,
    })
    dat = joblib.load(f"{out_dir}/dat/s.dat")
    assert set(dat.keys()) >= {"Nuclei", "Gland", "Lumen"}
    np.testing.assert_array_equal(dat["proc_dimensions"], [400, 500])


def test_sharded_infer_accepts_non_divisible_batch():
    """CLI default batch sizes (10/30) are not multiples of an 8-chip
    host; the sharded step pads to a mesh multiple and slices back
    (code-review r2 finding — it hard-crashed with ValueError before)."""
    import conftest
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
    from cerberus_tpu.models.net_desc import init_net_params
    from cerberus_tpu.parallel.mesh import make_mesh, make_sharded_infer_step

    cfg = ModelConfig.from_kwargs({
        "encoder_backbone_name": "resnet18",
        "decoder_kwargs": DEFAULT_DECODER_KWARGS,
        "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys())})
    params = init_net_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(conftest.cpu_mesh_devices())
    run = make_sharded_infer_step(params, cfg, mesh, output_shape=48,
                                  compute_dtype=jnp.float32)
    full = np.asarray(run(np.zeros((16, 144, 144, 3), np.uint8)))
    partial = np.asarray(run(np.zeros((10, 144, 144, 3), np.uint8)))
    assert partial.shape[0] == 10
    np.testing.assert_array_equal(partial, full[:10])
