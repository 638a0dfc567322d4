"""Pallas MXU histogram (ops/pallas_hist.py) vs np.bincount, interpreter
mode on CPU. The real-Mosaic compile is covered by test_on_tpu_kernels."""
import numpy as np
import pytest

from cerberus_tpu.ops.pallas_hist import N_BINS, hist16384_pallas


@pytest.mark.parametrize("seed,shape,hi", [
    (0, (448, 448), 300),       # tile-mode canvas, small id space
    (1, (257, 515), N_BINS),    # ragged shape exercising the pad path
    (2, (70000,), 5),           # 1-D flat, heavy duplicate counts
])
def test_hist_matches_bincount(seed, shape, hi):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, hi, size=shape).astype(np.int32)
    got = np.asarray(hist16384_pallas(ids, interpret=True))
    want = np.bincount(ids.reshape(-1), minlength=N_BINS)
    np.testing.assert_array_equal(got, want)


def test_hist_extreme_bins_and_padding_exact():
    """Bin 0 must be exact even though tiling pads with zeros, and the
    last bin must not be clipped away."""
    ids = np.zeros((333,), np.int32)
    ids[:7] = N_BINS - 1
    got = np.asarray(hist16384_pallas(ids, interpret=True))
    assert got[0] == 333 - 7
    assert got[N_BINS - 1] == 7
    assert got.sum() == 333


def test_lax_histogram_agrees():
    """The XLA scan formulation and the pallas kernel count identically
    (they back the same remove_small_objects decision)."""
    from cerberus_tpu.ops.lax_postproc import _sizes_histogram

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 2000, size=(448, 448)).astype(np.int32)
    import jax.numpy as jnp

    lax_hist = np.asarray(_sizes_histogram(jnp.asarray(ids), N_BINS))
    pal_hist = np.asarray(hist16384_pallas(ids, interpret=True))
    np.testing.assert_array_equal(lax_hist, pal_hist)
