"""End-to-end tile inference on a synthetic model + images.

Uses 144->48 patch geometry (bottom features are exactly 9x9, like the
production 448->144 case) to keep the CPU run fast, and verifies the
reference output contract: overlay/, {gland,lumen,nuclei}_mat/, pclass_mat/.
"""
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
from cerberus_tpu.models.convert import load_checkpoint, save_checkpoint
from cerberus_tpu.models.net_desc import init_net_params
from cerberus_tpu.ops.stitch import stitch_canvas


MODEL_KWARGS = {
    "encoder_backbone_name": "resnet34",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
}


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    params = init_net_params(jax.random.PRNGKey(42), cfg)
    save_checkpoint(str(d / "weights.tar"), params)
    settings = {
        "dataset_kwargs": {"req_target_code": dict(DEFAULT_TARGET_CODE)},
        "model_kwargs": MODEL_KWARGS,
    }
    with open(d / "settings.yml", "w") as f:
        yaml.safe_dump(settings, f)
    return d


def test_checkpoint_roundtrip(model_dir):
    params = load_checkpoint(str(model_dir / "weights.tar"))
    assert "backbone.conv1" in params
    assert params["backbone.conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert "decoder_head.Patch-Class.conv2" in params
    assert "output_head.Gland.INST.x.1.conv" in params


def test_stitch_canvas_paste_and_average():
    a = np.full((4, 4, 2), 1.0, np.float32)
    b = np.full((4, 4, 2), 3.0, np.float32)
    canvas = stitch_canvas([a, b], [(0, 0), (0, 4)], (4, 8))
    assert (canvas[:, :4] == 1).all() and (canvas[:, 4:] == 3).all()
    # overlapping average
    canvas = stitch_canvas([a, b], [(0, 0), (0, 2)], (4, 6), average=True)
    np.testing.assert_allclose(canvas[:, 2:4], 2.0, atol=1e-5)


def test_tile_pipeline_end_to_end(model_dir, tmp_path):
    import cv2

    from cerberus_tpu.infer.tile import InferManager

    input_dir = tmp_path / "input"
    output_dir = tmp_path / "output"
    os.makedirs(input_dir)
    rng = np.random.default_rng(0)
    for name in ["t1", "t2"]:
        img = rng.integers(0, 255, (100, 120, 3), np.uint8)
        cv2.imwrite(str(input_dir / f"{name}.png"), img)

    infer = InferManager(
        checkpoint_path=str(model_dir / "weights.tar"),
        decoder_dict=dict(DEFAULT_TARGET_CODE),
        model_args=MODEL_KWARGS,
    )
    run_args = {
        "nr_inference_workers": 0,
        "nr_post_proc_workers": 0,
        "batch_size": 4,
        "input_dir": str(input_dir),
        "output_dir": str(output_dir),
        "patch_input_shape": 144,
        "patch_output_shape": 48,
        "patch_output_overlap": 0,
        "postproc_list": list(DEFAULT_TARGET_LIST),
    }
    infer.process_file_list(run_args)

    for name in ["t1", "t2"]:
        assert (output_dir / "overlay" / f"{name}.jpg").exists()
        for task in ["gland", "lumen", "nuclei"]:
            mat = sio.loadmat(str(output_dir / f"{task}_mat" / f"{name}.mat"))
            assert mat["inst_map"].shape == (100, 120)
        pclass = sio.loadmat(str(output_dir / "pclass_mat" / f"{name}.mat"))
        assert pclass["pclass"].shape == (100, 120)
        # patch-class values are class ids
        assert pclass["pclass"].min() >= 0 and pclass["pclass"].max() <= 8
        # gland/nuclei mats carry a type_map, lumen does not
        gland = sio.loadmat(str(output_dir / "gland_mat" / f"{name}.mat"))
        assert "type_map" in gland
        lumen = sio.loadmat(str(output_dir / "lumen_mat" / f"{name}.mat"))
        assert "type_map" not in lumen

    # skip-if-done: re-running with outputs present skips every file, and
    # the manager then raises its "Not Detected Any Files From Path"
    # AssertionError — the reference's own empty-worklist behavior, pinned
    # deliberately (a clean no-op exit would diverge from it)
    with pytest.raises(AssertionError):
        infer.process_file_list(dict(run_args))
