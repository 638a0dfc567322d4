"""Synthetic-WSI integration: full process_wsi_list over an .npy pyramid
(SURVEY.md §4 item 3) — checks the dat/tissue output contract, mask-driven
sparsity, skip-if-done resume, and thumbnail/mask side outputs."""
import os

import joblib
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


@pytest.fixture(scope="module")
def wsi_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("wsi")
    # model dir
    model_dir = root / "model"
    os.makedirs(model_dir)
    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    save_checkpoint(str(model_dir / "weights.tar"),
                    init_net_params(jax.random.PRNGKey(3), cfg))
    with open(model_dir / "settings.yml", "w") as f:
        yaml.safe_dump({"dataset_kwargs":
                        {"req_target_code": dict(DEFAULT_TARGET_CODE)},
                        "model_kwargs": MODEL_KWARGS}, f)
    # synthetic slide: npy pyramid dir, 700x600 at 0.5 mpp
    slide_dir = root / "input" / "slide_a"
    os.makedirs(slide_dir)
    rng = np.random.default_rng(0)
    level0 = rng.integers(100, 255, (600, 700, 3), np.uint8)
    np.save(slide_dir / "level_0.npy", level0)
    with open(slide_dir / "meta.yml", "w") as f:
        yaml.safe_dump({"mpp": 0.5, "objective_power": 40}, f)
    # mask: tissue only on the left half (at 4x downsample)
    import cv2

    mask_dir = root / "masks"
    os.makedirs(mask_dir)
    mask = np.zeros((150, 175), np.uint8)
    mask[:, :80] = 255
    cv2.imwrite(str(mask_dir / "slide_a.png"), mask)
    return root, model_dir, slide_dir, mask_dir


def test_wsi_pipeline_end_to_end(wsi_setup):
    from cerberus_tpu.infer.wsi import InferManager

    root, model_dir, slide_dir, mask_dir = wsi_setup
    output_dir = str(root / "output")
    os.makedirs(output_dir, exist_ok=True)

    infer = InferManager(
        checkpoint_path=str(model_dir / "weights.tar"),
        decoder_dict=dict(DEFAULT_TARGET_CODE),
        model_args=MODEL_KWARGS,
    )
    run_args = {
        "nr_inference_workers": 2,
        "nr_post_proc_workers": 0,
        "batch_size": 4,
        "input_list": [str(slide_dir)],
        "mask_list": [str(mask_dir / "slide_a.png")],
        "output_dir": output_dir,
        "patch_input_shape": 144,
        "patch_output_shape": 48,
        "save_thumb": False,
        "save_mask": True,
        "save_json": True,
        "postproc_list": list(DEFAULT_TARGET_LIST),
        "tile_shape": 240,
        "chunk_shape": 480,
        "ambiguous_size": 16,
        "cache_path": str(root / "cache"),
        "logging_dir": str(root / "logging"),
        "wsi_proc_mag": 0.5,
    }
    infer.process_wsi_list(dict(run_args))

    dat = joblib.load(f"{output_dir}/dat/slide_a.dat")
    assert set(dat.keys()) >= {"Nuclei", "Gland", "Lumen", "proc_resolution",
                               "base_resolution", "proc_dimensions",
                               "base_dimensions"}
    assert dat["proc_resolution"] == {"resolution": 0.5, "units": "mpp"}
    np.testing.assert_array_equal(dat["proc_dimensions"], [600, 700])
    for inst in dat["Nuclei"].values():
        assert set(inst) >= {"box", "centroid", "contour"}
        # instance coordinates stay within the masked (left) region + margin
        assert inst["centroid"][0] <= 370

    tissue = sio.loadmat(f"{output_dir}/tissue/slide_a.mat")
    assert tissue["pclass"].shape == (150, 175)
    # mask gating: right half must be zero
    assert np.all(tissue["pclass"][:, 90:] == 0)

    assert os.path.exists(f"{output_dir}/mask/slide_a.png")
    import json as _json

    with open(f"{output_dir}/json/slide_a.json") as f:
        jd = _json.load(f)
    assert set(jd["instances"].keys()) >= {"Nuclei", "Gland", "Lumen"}
    assert len(os.listdir(f"{root}/logging")) >= 1
    # cache wiped at the end
    assert os.listdir(str(root / "cache")) == []

    # skip-if-done: second run leaves results and does not recompute
    mtime = os.path.getmtime(f"{output_dir}/dat/slide_a.dat")
    infer.process_wsi_list(dict(run_args))
    assert os.path.getmtime(f"{output_dir}/dat/slide_a.dat") == mtime


def test_wsi_auto_mask_end_to_end(tmp_path):
    """--auto_mask: maskless slides get a stain-entropy tissue mask and the
    pipeline gates work to it (reference ships get_tissue_mask but never
    wires it into the WSI CLI — misc/utils.py:238-244)."""
    from cerberus_tpu.infer.wsi import InferManager

    model_dir = tmp_path / "model"
    os.makedirs(model_dir)
    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    save_checkpoint(str(model_dir / "weights.tar"),
                    init_net_params(jax.random.PRNGKey(3), cfg))
    with open(model_dir / "settings.yml", "w") as f:
        yaml.safe_dump({"dataset_kwargs":
                        {"req_target_code": dict(DEFAULT_TARGET_CODE)},
                        "model_kwargs": MODEL_KWARGS}, f)
    # white slide with one textured tissue blob on the left half
    slide_dir = tmp_path / "input" / "slide_b"
    os.makedirs(slide_dir)
    rng = np.random.default_rng(2)
    level0 = np.full((600, 700, 3), 245, np.uint8)
    tex = rng.integers(60, 230, (600, 700, 3)).astype(np.uint8)
    yy, xx = np.ogrid[:600, :700]
    blob = (yy - 300) ** 2 + (xx - 180) ** 2 <= 150 ** 2
    level0[blob] = tex[blob]
    np.save(slide_dir / "level_0.npy", level0)
    with open(slide_dir / "meta.yml", "w") as f:
        yaml.safe_dump({"mpp": 0.5, "objective_power": 40}, f)

    output_dir = str(tmp_path / "out")
    infer = InferManager(
        checkpoint_path=str(model_dir / "weights.tar"),
        decoder_dict=dict(DEFAULT_TARGET_CODE),
        model_args=MODEL_KWARGS,
    )
    infer.process_wsi_list({
        "nr_inference_workers": 2,
        "nr_post_proc_workers": 0,
        "batch_size": 4,
        "input_list": [str(slide_dir)],
        "mask_list": [None],
        "auto_mask": True,
        "output_dir": output_dir,
        "patch_input_shape": 144,
        "patch_output_shape": 48,
        "save_thumb": False,
        "save_mask": True,
        "postproc_list": list(DEFAULT_TARGET_LIST),
        "tile_shape": 240,
        "chunk_shape": 480,
        "ambiguous_size": 16,
        "cache_path": str(tmp_path / "cache"),
        "logging_dir": str(tmp_path / "logging"),
        "wsi_proc_mag": 0.5,
    })
    dat = joblib.load(f"{output_dir}/dat/slide_b.dat")
    # instances exist and stay inside the auto-detected tissue (blob + margin)
    for fam in ("Nuclei", "Gland", "Lumen"):
        for inst in dat[fam].values():
            cx, cy = inst["centroid"]
            assert (cy - 300) ** 2 + (cx - 180) ** 2 <= 230 ** 2, (fam, cx, cy)
    # the auto mask itself was saved and is blob-shaped
    import cv2

    m = cv2.imread(f"{output_dir}/mask/slide_b.png", cv2.IMREAD_GRAYSCALE)
    assert m is not None and (m > 0).mean() < 0.5  # not all-tissue
    assert (m > 0).sum() > 0.5 * blob.mean() * m.size  # covers most of blob
