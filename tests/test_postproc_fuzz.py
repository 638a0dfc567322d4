"""Pinned-seed fuzz of the on-chip postproc primitives vs the CPU oracles.

Breadth hardening for the round-3 kernel rewrites (run-min scan CC,
blocked-strip CC, shift-chain morphology, hole filling): random
smoothed-noise masks at several densities plus structured edge cases,
across even/odd/wide/thin shapes. All comparisons are EXACT (partitions
up to id renaming for CC; byte equality for masks) — the primitives have
no documented divergence, unlike the composed families.

Oracle: ops/cc_cpu (scipy-equivalent 4-connected reimplementations,
themselves pinned against the reference's skimage/scipy behavior).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cerberus_tpu.ops import cc_cpu
from cerberus_tpu.ops import lax_postproc as L
from cerberus_tpu.ops.pallas_cc import connected_components_pallas
from cerberus_tpu.ops.pallas_cc_blocked import (
    connected_components_pallas_blocked,
)


def _label_isomorphic(a, b):
    a = np.asarray(a).astype(np.int64)
    b = np.asarray(b).astype(np.int64)
    if (a > 0).sum() != (b > 0).sum():
        return False
    pairs = set(zip(a.ravel().tolist(), b.ravel().tolist()))
    a_ids = {p[0] for p in pairs}
    b_ids = {p[1] for p in pairs}
    return len(pairs) == len(a_ids) == len(b_ids)


def _smooth_noise_mask(shape, seed, density):
    """Thresholded box-smoothed noise: blob-like at low density, labyrinth
    at ~0.5, lake-with-holes near 1.0 — the content regimes the WSI
    postproc actually sees."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=shape)
    for _ in range(2):                       # separable 5-tap box blur
        for axis in (0, 1):
            x = sum(np.roll(x, s, axis=axis) for s in (-2, -1, 0, 1, 2)) / 5
    thresh = np.quantile(x, 1.0 - density)
    return x > thresh


def _cases():
    cases = []
    for shape in [(64, 128), (96, 96), (97, 131), (48, 384)]:
        for seed, density in [(0, 0.15), (1, 0.5), (2, 0.85)]:
            cases.append(_smooth_noise_mask(shape, seed, density))
    # structured edges: empty, full, single pixels, border stripes
    cases.append(np.zeros((40, 130), bool))
    cases.append(np.ones((40, 130), bool))
    dots = np.zeros((33, 129), bool)
    dots[::4, ::5] = True
    cases.append(dots)
    stripes = np.zeros((64, 160), bool)
    stripes[:, ::3] = True
    stripes[0, :] = True                     # border-touching comb
    cases.append(stripes)
    return cases


CASES = _cases()


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_cc_lax_matches_oracle(idx):
    mask = CASES[idx]
    ref, _ = cc_cpu.label(mask)
    got = np.asarray(L.connected_components(jnp.asarray(mask)))
    assert _label_isomorphic(ref, got)


@pytest.mark.parametrize("idx", range(0, len(CASES), 2))
def test_cc_pallas_interpret_matches_oracle(idx):
    mask = CASES[idx]
    ref, _ = cc_cpu.label(mask)
    got = np.asarray(connected_components_pallas(jnp.asarray(mask),
                                                 interpret=True))
    assert _label_isomorphic(ref, got)


@pytest.mark.parametrize("idx", range(0, len(CASES), 2))
def test_cc_blocked_interpret_matches_oracle(idx):
    mask = CASES[idx]
    ref, _ = cc_cpu.label(mask)
    got = np.asarray(connected_components_pallas_blocked(jnp.asarray(mask),
                                                         interpret=True))
    assert _label_isomorphic(ref, got)


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_fill_holes_matches_oracle(idx):
    mask = CASES[idx]
    ref = cc_cpu.binary_fill_holes(mask)
    got = np.asarray(L.fill_holes(jnp.asarray(mask))) > 0
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("idx", range(len(CASES)))
@pytest.mark.parametrize("min_size", [4, 64])
def test_remove_small_matches_oracle(idx, min_size):
    mask = CASES[idx]
    lab_ref, _ = cc_cpu.label(mask)
    ref = cc_cpu.remove_small_objects(lab_ref, min_size) > 0
    lab = L.connected_components(jnp.asarray(mask))
    got = np.asarray(L.remove_small_objects(lab, min_size)) > 0
    np.testing.assert_array_equal(got, ref)
