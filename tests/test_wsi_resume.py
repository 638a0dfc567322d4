"""Mid-slide resume: a preempted WSI job continues where it stopped.

The disk canvas plus a tile-progress marker (`infer/wsi.py` progress.json)
let a killed job skip already-inferred tiles on rerun and still produce
the same instance payloads as an uninterrupted run (SURVEY.md §5 failure
recovery — exceeds the reference, which restarts the slide)."""
import os

import joblib
import numpy as np
import pytest
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
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("wsi_resume")
    model_dir = root / "model"
    os.makedirs(model_dir)
    save_checkpoint(str(model_dir / "weights.tar"),
                    init_net_params(jax.random.PRNGKey(3),
                                    ModelConfig.from_kwargs(MODEL_KWARGS)))
    with open(model_dir / "settings.yml", "w") as f:
        yaml.safe_dump({"dataset_kwargs":
                        {"req_target_code": dict(DEFAULT_TARGET_CODE)},
                        "model_kwargs": MODEL_KWARGS}, f)
    slide_dir = root / "input" / "slide_a"
    os.makedirs(slide_dir)
    rng = np.random.default_rng(1)
    np.save(slide_dir / "level_0.npy",
            rng.integers(100, 255, (600, 700, 3), np.uint8))
    with open(slide_dir / "meta.yml", "w") as f:
        yaml.safe_dump({"mpp": 0.5, "objective_power": 40}, f)
    import cv2

    mask_dir = root / "masks"
    os.makedirs(mask_dir)
    cv2.imwrite(str(mask_dir / "slide_a.png"),
                np.full((150, 175), 255, np.uint8))
    return root, model_dir, slide_dir, mask_dir


def _args(root, slide_dir, mask_dir, tag):
    return {
        "nr_inference_workers": 2,
        "nr_post_proc_workers": 0,
        "batch_size": 4,
        "input_list": [str(slide_dir)],
        "mask_list": [str(mask_dir / "slide_a.png")],
        "output_dir": str(root / f"out_{tag}"),
        "patch_input_shape": 144,
        "patch_output_shape": 48,
        "save_thumb": False,
        "save_mask": False,
        "postproc_list": list(DEFAULT_TARGET_LIST),
        "tile_shape": 240,
        "chunk_shape": 480,  # 600x700 proc plane -> 2x2 inference tiles
        "ambiguous_size": 16,
        "cache_path": str(root / f"cache_{tag}"),
        "logging_dir": str(root / f"logging_{tag}"),
        "wsi_proc_mag": 0.5,
    }


def _canon(d):
    return sorted(
        tuple(sorted((k, np.asarray(v).tobytes()) for k, v in inst.items()))
        for inst in d.values())


def test_mid_slide_resume_after_interrupt(setup, monkeypatch):
    from cerberus_tpu.infer import wsi as wsi_mod

    root, model_dir, slide_dir, mask_dir = setup

    def make_manager():
        return wsi_mod.InferManager(
            checkpoint_path=str(model_dir / "weights.tar"),
            decoder_dict=dict(DEFAULT_TARGET_CODE),
            model_args=MODEL_KWARGS)

    # uninterrupted reference run
    make_manager().process_wsi_list(_args(root, slide_dir, mask_dir, "ref"))
    ref = joblib.load(str(root / "out_ref" / "dat" / "slide_a.dat"))

    # interrupted run: kill the job after the first inference tile
    orig = wsi_mod.InferManager._run_tile_pipelined
    calls = {"n": 0}

    def interrupting(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated preemption")
        return orig(self, *a, **kw)

    monkeypatch.setattr(wsi_mod.InferManager, "_run_tile_pipelined",
                        interrupting)
    with pytest.raises(KeyboardInterrupt):
        make_manager().process_wsi_list(_args(root, slide_dir, mask_dir, "resume"))
    monkeypatch.setattr(wsi_mod.InferManager, "_run_tile_pipelined", orig)

    # progress marker recorded the completed tile
    import json

    with open(root / "cache_resume" / "progress.json") as f:
        meta = json.load(f)
    assert meta["slide"] == "slide_a" and len(meta["done_tiles"]) == 1

    # resumed run: skips the done tile, completes, output matches reference
    counted = {"n": 0}

    def counting(self, *a, **kw):
        counted["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(wsi_mod.InferManager, "_run_tile_pipelined", counting)
    make_manager().process_wsi_list(_args(root, slide_dir, mask_dir, "resume"))
    got = joblib.load(str(root / "out_resume" / "dat" / "slide_a.dat"))

    n_tiles = 4  # 2x2 grid at chunk 480 on a 700x600 plane
    assert counted["n"] == n_tiles - 1  # the finished tile was skipped
    for fam in ("Nuclei", "Gland", "Lumen"):
        assert _canon(ref[fam]) == _canon(got[fam]), fam
