"""Dense inference mode: larger patch windows at the same RF margin.

The reference fixes 448->144 windows at stride 144, so every slide pixel
pays the encoder (448/144)^2 ~ 9.7x; widening the window to keep a larger
central core at the SAME per-side margin (e.g. 1168->864 in production,
(1168/864)^2 ~ 1.8x) cuts forward FLOPs per output pixel ~3x (XLA cost
analysis: 7.29 -> 2.43 MFLOP/px). Every kept pixel keeps the reference's
worst-case 152 px context margin — interior pixels see MORE real tissue
where the reference saw window padding (documented divergence, PARITY.md).

This test pins the geometry plumbing end-to-end at the tile-manager
surface with the CPU-sized analog: 144->48 windowed vs 240->144 dense
(same 48 px margin). Reference geometry: run_infer_tile.py:17-21.
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
from cerberus_tpu.models.convert import save_checkpoint
from cerberus_tpu.models.net_desc import init_net_params

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
    # biased INST heads so postproc produces real instances (same recipe
    # as the verify skill / tools/bench_wsi.py)
    for head in ("Gland", "Nuclei", "Lumen"):
        leaf = params[f"output_head.{head}.INST.x.1.conv"]
        leaf = dict(leaf)
        leaf["kernel"] = np.asarray(leaf["kernel"]) * 0.003
        b = np.zeros_like(np.asarray(leaf["bias"]))
        b[0], b[1], b[2] = -2.0, 2.0, -1.5
        leaf["bias"] = b
        params[f"output_head.{head}.INST.x.1.conv"] = leaf
    save_checkpoint(str(d / "weights.tar"), params)
    with open(d / "settings.yml", "w") as f:
        yaml.safe_dump({
            "dataset_kwargs": {"req_target_code": dict(DEFAULT_TARGET_CODE)},
            "model_kwargs": MODEL_KWARGS}, f)
    return d


def _run(model_dir, tmp_path, tag, patch_in, patch_out, input_dir):
    from cerberus_tpu.infer.tile import InferManager

    output_dir = tmp_path / f"out_{tag}"
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
        "output_dir": str(output_dir),
        "patch_input_shape": patch_in,
        "patch_output_shape": patch_out,
        "patch_output_overlap": 0,
        "postproc_list": list(DEFAULT_TARGET_LIST),
    })
    return output_dir


def test_dense_mode_matches_windowed(model_dir, tmp_path):
    import cv2

    input_dir = tmp_path / "input"
    os.makedirs(input_dir)
    rng = np.random.default_rng(3)
    img = np.full((288, 288, 3), 225, np.uint8)
    for _ in range(12):
        c = tuple(int(v) for v in rng.integers(30, 258, 2))
        col = tuple(int(v) for v in rng.integers(60, 190, 3))
        cv2.circle(img, c, int(rng.integers(6, 16)), col, -1)
    cv2.imwrite(str(input_dir / "t.png"), img)

    out_win = _run(model_dir, tmp_path, "win", 144, 48, input_dir)
    out_dense = _run(model_dir, tmp_path, "dense", 240, 144, input_dir)

    found_any = False
    for fam in ("gland", "lumen", "nuclei"):
        a = sio.loadmat(str(out_win / f"{fam}_mat" / "t.mat"))["inst_map"]
        b = sio.loadmat(str(out_dense / f"{fam}_mat" / "t.mat"))["inst_map"]
        assert a.shape == b.shape == (288, 288)
        fa, fb = a > 0, b > 0
        union = (fa | fb).sum()
        if union == 0:
            continue
        found_any = True
        iou = (fa & fb).sum() / union
        # only window-padding-context pixels may differ between the modes
        assert iou > 0.95, (fam, iou)
    # the biased-head fixture must yield real instances — all-empty would
    # make every IoU assertion above vacuous
    assert found_any
    pa = sio.loadmat(str(out_win / "pclass_mat" / "t.mat"))["pclass"]
    pb = sio.loadmat(str(out_dense / "pclass_mat" / "t.mat"))["pclass"]
    # Patch-Class granularity is per output patch: dense mode broadcasts
    # over 144^2 blocks where windowed uses 48^2 (documented divergence)
    assert pa.shape == pb.shape
    assert set(np.unique(pb)) <= set(range(9))


def test_patch_class_grid_head_matches_per_window_crops():
    """patch_class_head_grid cell k == _patch_class_head on the 28² bottom
    window [9k, 9k+28) — the exact windowed-reference geometry, feature-
    for-feature (no padding-context confound: same bottom tensor)."""
    from cerberus_tpu.models.net_desc import (
        _patch_class_head,
        patch_class_head_grid,
        init_net_params,
    )

    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    params = init_net_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    n = 3  # 3x3 cells: bottom = 9*3+19 = 46
    bottom = rng.normal(size=(2, 46, 46, 512)).astype(np.float32)

    grid = np.asarray(patch_class_head_grid(params, bottom, n))
    assert grid.shape == (2, n, n, 9)
    for ky in range(n):
        for kx in range(n):
            win = bottom[:, 9 * ky:9 * ky + 28, 9 * kx:9 * kx + 28, :]
            ref = np.asarray(_patch_class_head(params, win, None, None))
            np.testing.assert_allclose(grid[:, ky, kx], ref[:, 0, 0],
                                       rtol=2e-5, atol=2e-5)


def test_dense_pclass_has_per_cell_granularity():
    """Margin-304 dense windows emit a 144²-blockwise Patch-Class map."""
    from cerberus_tpu.infer.steps import fused_infer_outputs
    from cerberus_tpu.data.patching import make_channel_index_map
    from cerberus_tpu.models.net_desc import init_net_params
    import jax.numpy as jnp

    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    params = init_net_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (1, 592, 592, 3)).astype(np.uint8)
    out = np.asarray(jax.jit(
        lambda p, x: fused_infer_outputs(p, x, cfg, output_shape=288,
                                         compute_dtype=jnp.float32)
    )(params, img))
    idx, _ = make_channel_index_map(cfg.active_decoder_kwargs)
    s, _e = idx["Patch-Class"]
    pc = out[0, :, :, s]
    # constant within each 144² cell
    for cy in range(2):
        for cx in range(2):
            cell = pc[cy * 144:(cy + 1) * 144, cx * 144:(cx + 1) * 144]
            assert len(np.unique(cell)) == 1
    assert set(np.unique(pc)) <= set(float(v) for v in range(9))


def test_dense_pclass_granularity_survives_full_tower_path(monkeypatch):
    """CERBERUS_VALID_REGION=0 (full towers + crop) must not change the
    dense Patch-Class output structure (code-review r2 finding)."""
    from cerberus_tpu.infer.steps import fused_infer_outputs
    from cerberus_tpu.data.patching import make_channel_index_map
    from cerberus_tpu.models.net_desc import init_net_params
    import jax.numpy as jnp

    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    params = init_net_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (1, 592, 592, 3)).astype(np.uint8)

    def run(valid_region):
        return np.asarray(jax.jit(
            lambda p, x: fused_infer_outputs(
                p, x, cfg, output_shape=288, compute_dtype=jnp.float32,
                valid_region=valid_region))(params, img))

    idx, _ = make_channel_index_map(cfg.active_decoder_kwargs)
    s, _e = idx["Patch-Class"]
    pc_valid = run(True)[0, :, :, s]
    pc_full = run(False)[0, :, :, s]
    # same per-144² block structure on both paths; same feature geometry
    # -> identical class ids in fp32
    np.testing.assert_array_equal(pc_valid, pc_full)
    for cy in range(2):
        for cx in range(2):
            cell = pc_full[cy * 144:(cy + 1) * 144, cx * 144:(cx + 1) * 144]
            assert len(np.unique(cell)) == 1


def test_dense_infer_composes_with_mesh():
    """Dense windows + batch sharding over the 8-device CPU mesh: the
    sharded step accepts any (input, output) geometry and matches the
    single-device result."""
    import conftest
    import jax.numpy as jnp

    from cerberus_tpu.infer.steps import fused_infer_outputs
    from cerberus_tpu.models.net_desc import init_net_params
    from cerberus_tpu.parallel.mesh import make_mesh, make_sharded_infer_step

    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    params = init_net_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(conftest.cpu_mesh_devices())
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (8, 240, 240, 3)).astype(np.uint8)

    sharded = make_sharded_infer_step(params, cfg, mesh, output_shape=144,
                                      compute_dtype=jnp.float32)
    got = np.asarray(sharded(imgs))
    want = np.asarray(jax.jit(
        lambda p, x: fused_infer_outputs(p, x, cfg, output_shape=144,
                                         compute_dtype=jnp.float32)
    )(params, imgs))
    assert got.shape == (8, 144, 144, want.shape[-1])
    # sharded vs unsharded are different XLA compilations: fp32
    # reassociation perturbs softmax tails (1e-24 vs 1e-32) and can flip
    # argmax at exact ties — require probability agreement at 1e-3 and
    # near-zero class-flip rate rather than elementwise bit equality
    d = np.abs(got - want)
    assert (d > 1e-3).mean() < 5e-3, (d > 1e-3).mean()
    assert (d > 0.5).mean() < 1e-3, (d > 0.5).mean()
