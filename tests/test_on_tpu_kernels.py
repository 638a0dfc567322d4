"""Real-Mosaic kernel validation ON the TPU (VERDICT r2 task 7).

The regular suite exercises the Pallas kernels in interpreter mode on
CPU; the VMEM caps and 2-D-only Mosaic pitfalls (CLAUDE.md) were
established by hand. This module runs the REAL compiled kernels on the
device — gated behind ``CERBERUS_TEST_TPU=1`` (tests/conftest.py leaves
the TPU as default backend then) so the hermetic CPU suite is unchanged.

Run: ``CERBERUS_TEST_TPU=1 python -m pytest tests/test_on_tpu_kernels.py``
"""
import os

import numpy as np
import pytest

from test_lax_postproc import _blob_mask, _label_isomorphic

pytestmark = pytest.mark.skipif(
    not os.environ.get("CERBERUS_TEST_TPU"),
    reason="on-TPU kernel tests need CERBERUS_TEST_TPU=1 (real device)")


def _require_tpu():
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU device visible")


def test_vmem_resident_cc_real_mosaic():
    """448^2 canvas (the tile-mode postproc size): compiled VMEM-resident
    kernel labels identically to scipy."""
    _require_tpu()
    import jax.numpy as jnp

    from cerberus_tpu.ops import cc_cpu
    from cerberus_tpu.ops.pallas_cc import cc_pallas

    mask = _blob_mask(hw=448, seed=3, n=40, r=12)
    got = np.asarray(cc_pallas(jnp.asarray(mask)))
    ref, _ = cc_cpu.label(mask)  # 4-connected, like the kernel
    assert _label_isomorphic(ref, got)


def test_blocked_strip_cc_real_mosaic():
    """2048^2 canvas (above the 400k px VMEM-resident cap): the
    blocked-strip kernel with its carry row, compiled, vs scipy."""
    _require_tpu()
    import jax.numpy as jnp

    from cerberus_tpu.ops import cc_cpu
    from cerberus_tpu.ops.pallas_cc_blocked import cc_pallas_blocked

    mask = _blob_mask(hw=2048, seed=5, n=200, r=24)
    got = np.asarray(cc_pallas_blocked(jnp.asarray(mask)))
    ref, _ = cc_cpu.label(mask)  # 4-connected, like the kernel
    assert _label_isomorphic(ref, got)


def test_mxu_histogram_real_mosaic():
    """16384-bin MXU histogram, compiled on device, vs np.bincount at the
    WSI postproc canvas scale (id plane > the VMEM-resident CC cap)."""
    _require_tpu()
    import jax.numpy as jnp

    from cerberus_tpu.ops.pallas_hist import N_BINS, hist16384_pallas

    rng = np.random.default_rng(11)
    ids = rng.integers(0, 3000, size=(1152, 2304)).astype(np.int32)
    got = np.asarray(hist16384_pallas(jnp.asarray(ids)))
    np.testing.assert_array_equal(
        got, np.bincount(ids.reshape(-1), minlength=N_BINS))


def test_gland_family_on_device_matches_cpu_oracle():
    """The full eroded-contour instance family through the real on-chip
    path (pallas CC engaged by default on TPU) vs the CPU oracle."""
    _require_tpu()
    from test_lax_postproc import _contour_raw

    from cerberus_tpu.ops.postproc import PostProcInstErodedContourMap
    from cerberus_tpu.ops.tpu_postproc import TPUPostProcInstErodedContourMap

    raw = np.zeros((192, 192, 4), np.float32)
    raw[..., 0:2] = _contour_raw(192, [(30, 80, 30, 80), (100, 150, 100, 150)])
    idx = {"Gland-INST": [0, 2], "Gland-TYPE": [3, 4]}
    cpu_inst, cpu_type = PostProcInstErodedContourMap.post_process(
        raw, idx, "Gland")
    tpu_inst, tpu_type = TPUPostProcInstErodedContourMap.post_process(
        raw, idx, "Gland")
    assert _label_isomorphic(cpu_inst, tpu_inst)
    np.testing.assert_array_equal(np.asarray(cpu_type), np.asarray(tpu_type))


def test_paired_forward_real_device_matches_cpu():
    """The TPU-default forward (width-paired towers + encoder at batch 8,
    bf16) against the CPU unpaired f32 reference on the same weights —
    catches device-specific miscompiles of the paired path that the
    CPU-only paired-vs-unpaired tests cannot see. Tolerance is the bf16
    class PARITY.md documents for the pairing (plus bf16-vs-f32 itself)."""
    _require_tpu()
    import jax
    import jax.numpy as jnp

    from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
    from cerberus_tpu.infer.steps import fused_infer_outputs
    from cerberus_tpu.models.net_desc import init_net_params

    cfg = ModelConfig.from_kwargs({
        "encoder_backbone_name": "resnet34",
        "decoder_kwargs": DEFAULT_DECODER_KWARGS,
        "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
    })
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_net_params(jax.random.PRNGKey(0), cfg)
    imgs = np.random.default_rng(0).integers(
        0, 255, (8, 448, 448, 3)).astype(np.uint8)

    tpu_dev = jax.devices()[0]
    out_tpu = np.asarray(jax.jit(
        lambda p, im: fused_infer_outputs(p, im, cfg, 144),
        device=tpu_dev)(jax.device_put(params, tpu_dev),
                        jax.device_put(imgs, tpu_dev)))

    os.environ["CERBERUS_PAIRED"] = "0"
    try:
        with jax.default_device(cpu):
            out_cpu = np.asarray(fused_infer_outputs(
                jax.device_put(params, cpu),
                jax.device_put(imgs, cpu), cfg, 144,
                compute_dtype=jnp.float32))
    finally:
        os.environ.pop("CERBERUS_PAIRED", None)

    assert out_tpu.shape == out_cpu.shape
    # probability/argmax channels live in [0, 9]; bf16 + pairing
    # reassociation bounds absolute error well under 0.1 on probabilities.
    # argmax id channels may flip at near-ties — allow a small fraction.
    close = np.abs(out_tpu - out_cpu) < 0.1
    frac_bad = 1.0 - close.mean()
    assert frac_bad < 0.01, frac_bad
