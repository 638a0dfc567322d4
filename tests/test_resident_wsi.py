"""HBM-resident WSI hot loop (infer/resident_wsi.py) vs the legacy
disk-canvas path: .dat payloads must be CONTENT-identical (keys are uuid4
per run) and the landed disk canvas byte-identical, for both the tpu-legacy
and cpu-oracle baselines (VERDICT r4 task 1 'Done' criterion).
"""
import os

import numpy as np
import pytest
import yaml

import conftest  # noqa: F401  (CPU pinning)

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

MODEL_KWARGS = {
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
}


def _biased_params(seed=5):
    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    params = init_net_params(jax.random.PRNGKey(seed), cfg)
    params = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
              for k, v in params.items()}
    for head in ("Gland", "Nuclei", "Lumen"):
        leaf = params[f"output_head.{head}.INST.x.1.conv"]
        leaf["kernel"] = leaf["kernel"] * 0.01
        b = np.zeros_like(leaf["bias"])
        b[0], b[1], b[2] = -1.5, 1.5, -1.0
        leaf["bias"] = b
    return params


def _sig(x):
    if isinstance(x, dict):
        return tuple(sorted((repr(k), _sig(v)) for k, v in x.items()))
    if isinstance(x, np.ndarray):
        return (x.dtype.str, x.shape, x.tobytes())
    if isinstance(x, (list, tuple)):
        return tuple(_sig(v) for v in x)
    return repr(x)


def _payload(dat):
    per = {}
    for k, v in dat.items():
        if k in ("Nuclei", "Gland", "Lumen"):
            per[k] = tuple(sorted(_sig(iv) for iv in v.values()))
        else:
            per[k] = _sig(v)
    return per


def _run(tmp_path, tag, slide_dir, model_dir, backend, resident,
         monkeypatch):
    from cerberus_tpu.infer.wsi import InferManager

    monkeypatch.setenv("CERBERUS_RESIDENT", "1" if resident else "0")
    infer = InferManager(
        checkpoint_path=str(model_dir / "weights.tar"),
        decoder_dict=dict(DEFAULT_TARGET_CODE),
        model_args=MODEL_KWARGS,
    )
    out_dir = str(tmp_path / f"out_{tag}")
    os.makedirs(out_dir, exist_ok=True)
    cache = str(tmp_path / f"cache_{tag}")
    infer.process_wsi_list({
        "nr_inference_workers": 2,
        "nr_post_proc_workers": 0,
        "batch_size": 8,
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
        "cache_path": cache,
        "logging_dir": str(tmp_path / f"logging_{tag}"),
        "wsi_proc_mag": 0.5,
        "postproc_backend": backend,
    })
    import pathlib

    stem = pathlib.Path(str(slide_dir)).stem
    return joblib.load(os.path.join(out_dir, "dat", f"{stem}.dat"))


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("resident")
    model_dir = tmp_path / "model"
    os.makedirs(model_dir)
    save_checkpoint(str(model_dir / "weights.tar"), _biased_params())
    with open(model_dir / "settings.yml", "w") as f:
        yaml.safe_dump({"dataset_kwargs":
                        {"req_target_code": dict(DEFAULT_TARGET_CODE)},
                        "model_kwargs": MODEL_KWARGS}, f)

    slide_dir = tmp_path / "input" / "s"
    os.makedirs(slide_dir)
    rng = np.random.default_rng(3)
    base = rng.random((50, 63, 3))
    plane = np.clip(np.kron(base, np.ones((8, 8, 1))) * 255, 0,
                    255).astype(np.uint8)
    np.save(slide_dir / "level_0.npy", plane)
    with open(slide_dir / "meta.yml", "w") as f:
        yaml.safe_dump({"mpp": 0.5}, f)
    return tmp_path, slide_dir, model_dir


def test_resident_matches_legacy_tpu_and_cpu(fixtures, tmp_path,
                                             monkeypatch):
    root, slide_dir, model_dir = fixtures
    dat_res = _run(tmp_path, "resident", slide_dir, model_dir, "tpu",
                   True, monkeypatch)
    dat_leg = _run(tmp_path, "legacy", slide_dir, model_dir, "tpu",
                   False, monkeypatch)
    dat_cpu = _run(tmp_path, "cpu", slide_dir, model_dir, "cpu",
                   False, monkeypatch)

    found = sum(len(dat_res[t]) for t in ("Nuclei", "Gland", "Lumen"))
    assert found > 0, "fixture produced no instances — test is vacuous"
    # resident vs legacy tpu: BYTE-identical instance content (same kernels,
    # same canvas values, different residency)
    assert _payload(dat_res) == _payload(dat_leg)
    # vs the CPU oracle: identical instance counts (tpu watershed has the
    # documented <=1 px plateau-tie divergence class, so bytes may differ)
    for t in ("Nuclei", "Gland", "Lumen"):
        assert len(dat_res[t]) == len(dat_cpu[t]), t

    # the landed pclass tissue map is derived from the disk canvas — its
    # equality across modes checks the async canvas landing end-to-end
    import scipy.io as sio

    m_res = sio.loadmat(str(tmp_path / "out_resident" / "tissue" / "s.mat"))
    m_leg = sio.loadmat(str(tmp_path / "out_legacy" / "tissue" / "s.mat"))
    np.testing.assert_array_equal(m_res["pclass"], m_leg["pclass"])


def test_read_decimated_equals_nearest_resize(tmp_path):
    """CanvasSet.read_decimated == the stripe-wise cv2 INTER_NEAREST path
    for step-divisible planes (the condition the tissue phase gates on),
    including across the 4096-row stripe boundary."""
    import cv2

    from cerberus_tpu.infer.wsi import _read_region_resized
    from cerberus_tpu.wsi.merge import CanvasSet

    rng = np.random.default_rng(0)
    h, w = 4096 + 512, 768  # spans two read stripes; both % 4 == 0
    canvas = CanvasSet(str(tmp_path / "c"), (h, w), 3)
    canvas.raw[:] = rng.integers(0, 8, (h, w, 3)).astype(np.float16)
    ref = _read_region_resized(canvas, (0, 0, w, h), [1], 0.25,
                               interp=cv2.INTER_NEAREST)[..., 0]
    fast = canvas.read_decimated(4, 1)
    np.testing.assert_array_equal(ref, fast)
    canvas.close()


def test_bif_slide_through_wsi_pipeline(fixtures, tmp_path, monkeypatch):
    """Ventana BIF fixture driven end-to-end through the real WSI pipeline
    (VERDICT r4 task 8 'Done' criterion): native TIFF reader dispatch,
    placement, inference, postproc, .dat output."""
    from test_tiff_reader import _write_tiff, _ISCAN_XML

    root, _slide_dir, model_dir = fixtures
    rng = np.random.default_rng(11)
    base = rng.random((50, 63, 3))
    lv0 = np.clip(np.kron(base, np.ones((8, 8, 1))) * 255, 0,
                  255).astype(np.uint8)  # 400 x 504
    thumb = lv0[::8, ::8]
    xmp = _ISCAN_XML.replace('ScanRes="0.25"', 'ScanRes="0.5"').encode()
    bif = str(tmp_path / "b.bif")
    _write_tiff(bif, [thumb, lv0, lv0[::2, ::2]], big=True,
                description=["Thumbnail", None, None],
                extra_tags={1: [(700, 7, len(xmp), xmp)]})

    dat = _run(tmp_path, "bif", bif, model_dir, "cpu", False, monkeypatch)
    assert tuple(dat["proc_dimensions"]) == (400, 504)
    assert sum(len(dat[t]) for t in ("Nuclei", "Gland", "Lumen")) > 0


def test_resident_resume_defers_done_tiles(fixtures, tmp_path, monkeypatch):
    """Preemption mid-resident-run: tiles whose canvas already landed are
    deferred to the legacy mmap grid postproc on resume; the final payload
    matches an uninterrupted resident run."""
    from cerberus_tpu.wsi import merge as merge_mod

    root, slide_dir, model_dir = fixtures

    ref = _run(tmp_path, "rref", slide_dir, model_dir, "tpu", True,
               monkeypatch)

    orig = merge_mod.CanvasSet.write_region
    calls = {"n": 0}

    def crashing(self, bounds, values):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated preemption mid-landing")
        return orig(self, bounds, values)

    monkeypatch.setattr(merge_mod.CanvasSet, "write_region", crashing)
    with pytest.raises(KeyboardInterrupt):
        _run(tmp_path, "rres", slide_dir, model_dir, "tpu", True,
             monkeypatch)
    monkeypatch.setattr(merge_mod.CanvasSet, "write_region", orig)

    import json

    with open(tmp_path / "cache_rres" / "progress.json") as f:
        meta = json.load(f)
    assert len(meta["done_tiles"]) >= 1  # at least one tile landed+marked

    got = _run(tmp_path, "rres", slide_dir, model_dir, "tpu", True,
               monkeypatch)
    assert _payload(got) == _payload(ref)
