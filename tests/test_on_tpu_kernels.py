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
