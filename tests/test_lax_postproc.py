"""On-TPU postproc kernels vs the CPU oracles (ops/cc_cpu, ops/postproc)."""
import numpy as np
import pytest

import jax.numpy as jnp

from cerberus_tpu.ops import cc_cpu
from cerberus_tpu.ops import lax_postproc as L
from cerberus_tpu.ops.postproc import PostProcInstErodedContourMap
from cerberus_tpu.ops.tpu_postproc import TPUPostProcInstErodedContourMap


def _label_isomorphic(a, b):
    """Two label maps describe the same partition (up to id renaming)."""
    a = np.asarray(a).astype(np.int64)
    b = np.asarray(b).astype(np.int64)
    if (a > 0).sum() != (b > 0).sum():
        return False
    pairs = set(zip(a.ravel().tolist(), b.ravel().tolist()))
    a_ids = {p[0] for p in pairs}
    b_ids = {p[1] for p in pairs}
    return len(pairs) == len(a_ids) == len(b_ids)


def _blob_mask(hw=96, seed=0, n=6, r=8):
    rng = np.random.default_rng(seed)
    mask = np.zeros((hw, hw), bool)
    yy, xx = np.ogrid[:hw, :hw]
    for _ in range(n):
        cy, cx = rng.integers(r, hw - r, 2)
        mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
    return mask


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_matches_scipy(seed):
    mask = _blob_mask(seed=seed)
    ref, _ = cc_cpu.label(mask)
    got = np.asarray(L.connected_components(jnp.asarray(mask)))
    assert _label_isomorphic(ref, got)


def test_remove_small_objects_matches():
    mask = np.zeros((64, 64), bool)
    mask[2:5, 2:5] = True        # 9 px
    mask[20:40, 20:40] = True    # 400 px
    lab = np.asarray(L.connected_components(jnp.asarray(mask)))
    out = np.asarray(L.remove_small_objects(jnp.asarray(lab), 50))
    assert out[3, 3] == 0 and out[30, 30] > 0


def test_fill_holes_matches_scipy():
    ring = np.zeros((32, 32), bool)
    ring[5:25, 5:25] = True
    ring[10:20, 10:20] = False
    ring[28:31, 2:8] = True  # solid blob, no hole
    ref = cc_cpu.binary_fill_holes(ring)
    got = np.asarray(L.fill_holes(jnp.asarray(ring)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fill_holes_matches_scipy_random(seed):
    # random blob fields produce nested/irregular holes and border-touching
    # background — the CC-based fill must equal the flood-fill oracle exactly
    mask = _blob_mask(seed=seed, n=10, r=10)
    ref = cc_cpu.binary_fill_holes(mask)
    got = np.asarray(L.fill_holes(jnp.asarray(mask)))
    np.testing.assert_array_equal(got, ref)


def test_fill_label_holes_single_owner():
    # a lumen-style hole enclosed by one instance adopts that instance's id
    lab = np.zeros((48, 48), np.int32)
    lab[5:40, 5:40] = 7
    lab[15:30, 15:30] = 0          # hole inside instance 7
    lab[44:47, 2:10] = 3           # separate solid instance
    out = np.asarray(L.fill_label_holes(jnp.asarray(lab)))
    assert (out[15:30, 15:30] == 7).all()
    assert (out[44:47, 2:10] == 3).all()
    # nothing outside instances was filled
    assert out[0, 0] == 0 and out[42, 42] == 0


def test_fill_label_holes_contested_matches_flood():
    # a cavity jointly enclosed by two instances: the exact lockstep flood
    # (labels advance 1 px/sweep, min id wins the meeting line) must run
    lab = np.zeros((40, 60), np.int32)
    lab[5:35, 5:30] = 2
    lab[5:35, 30:55] = 9
    lab[12:28, 12:48] = 0          # hole spanning both instances
    out = np.asarray(L.fill_label_holes(jnp.asarray(lab)))
    big = jnp.int32(40 * 60 + 2)
    holes = (lab == 0) & np.asarray(
        L.fill_holes(jnp.asarray(lab > 0)))
    ref = np.asarray(L._propagate_labels(
        jnp.asarray(lab), jnp.asarray(holes | (lab > 0)), big))
    np.testing.assert_array_equal(out, ref)
    # both ids own part of the cavity
    assert (out[12:28, 12:48] == 2).any() and (out[12:28, 12:48] == 9).any()
    assert (out[12:28, 12:48] > 0).all()


def test_binary_morphology_matches_cv2():
    import cv2

    mask = _blob_mask(seed=3).astype(np.uint8)
    se = L.disk_kernel(3)
    ref_d = cv2.dilate(mask, se.astype(np.uint8), iterations=1) > 0
    ref_e = cv2.erode(mask, se.astype(np.uint8), iterations=1) > 0
    got_d = np.asarray(L.binary_dilate(jnp.asarray(mask), se))
    got_e = np.asarray(L.binary_erode(jnp.asarray(mask), se))
    np.testing.assert_array_equal(got_d, ref_d)
    np.testing.assert_array_equal(got_e, ref_e)


def test_watershed_separates_two_touching_basins():
    # same scenario as the CPU nuclei test: two seeds, fused mask
    inner = np.zeros((64, 64), np.float32)
    inner[20:30, 14:26] = 0.9
    inner[20:30, 30:42] = 0.9
    mask = np.zeros((64, 64), bool)
    mask[18:32, 12:44] = True
    markers = np.zeros((64, 64), np.int32)
    markers[24, 20] = 1
    markers[24, 36] = 2
    out = np.asarray(L.watershed(jnp.asarray(-inner), jnp.asarray(markers),
                                 jnp.asarray(mask)))
    assert out[24, 20] == 1 and out[24, 36] == 2
    assert (out[mask] > 0).all()
    assert out[24, 16] == 1 and out[24, 40] == 2


def _contour_raw(hw, blobs, shrink=2):
    inner = np.zeros((hw, hw), np.float32)
    contour = np.zeros((hw, hw), np.float32)
    for (y1, y2, x1, x2) in blobs:
        contour[y1:y2, x1:x2] = 0.9
        inner[y1 + shrink:y2 - shrink, x1 + shrink:x2 - shrink] = 0.9
        contour[y1 + shrink:y2 - shrink, x1 + shrink:x2 - shrink] = 0.0
    return np.stack([inner, contour], axis=-1)


def test_tpu_gland_family_matches_cpu_oracle():
    # blobs kept > 2*ksize from borders: the CPU oracle replicates the
    # reference's border clamp (no bbox expansion when the pad doesn't fit,
    # loader/postproc.py:296-300) while the TPU path grows uniformly
    raw = np.zeros((192, 192, 4), np.float32)
    raw[..., 0:2] = _contour_raw(192, [(30, 80, 30, 80), (100, 150, 100, 150)])
    idx = {"Gland-INST": [0, 2], "Gland-TYPE": [3, 4]}
    cpu_inst, cpu_type = PostProcInstErodedContourMap.post_process(
        raw, idx, "Gland")
    tpu_inst, tpu_type = TPUPostProcInstErodedContourMap.post_process(
        raw, idx, "Gland")
    assert _label_isomorphic(cpu_inst, tpu_inst)
    np.testing.assert_array_equal(np.asarray(cpu_type), np.asarray(tpu_type))


def test_tpu_nuclei_family_close_to_cpu_oracle():
    rng = np.random.default_rng(5)
    raw = np.zeros((96, 96, 3), np.float32)
    blobs = [(10, 26, 10, 26), (10, 26, 27, 43), (40, 60, 40, 60),
             (70, 90, 20, 40)]
    raw[..., 0:2] = _contour_raw(96, blobs)
    idx = {"Nuclei-INST": [0, 2]}
    cpu_inst, _ = PostProcInstErodedContourMap.post_process(raw, idx, "Nuclei")
    tpu_inst, _ = TPUPostProcInstErodedContourMap.post_process(raw, idx,
                                                               "Nuclei")
    # same number of instances...
    assert len(np.unique(cpu_inst)) == len(np.unique(tpu_inst))
    # ...and per-pixel agreement up to the documented 1-px boundary band
    disagree = ((np.asarray(cpu_inst) > 0) != (np.asarray(tpu_inst) > 0)).mean()
    assert disagree < 0.01


def test_connected_components_spiral_long_geodesic():
    # a spiral has geodesic diameter ~O(H*W/2); pointer jumping must still
    # label it as ONE component quickly
    hw = 65
    mask = np.zeros((hw, hw), bool)
    top, bottom, left, right = 0, hw - 1, 0, hw - 1
    while top <= bottom and left <= right:
        mask[top, left:right + 1] = True
        mask[top:bottom + 1, right] = True
        mask[bottom, left:right + 1] = True
        # leave a gap so rings connect into one spiral arm
        mask[top + 1:bottom + 1, left] = True
        if top + 2 <= bottom:
            mask[top + 2, left:right - 1] = False
        top += 2
        bottom -= 2
        left += 2
        right -= 2
    ref, n_ref = cc_cpu.label(mask)
    got = np.asarray(L.connected_components(jnp.asarray(mask)))
    assert _label_isomorphic(ref, got)


def test_morphology_shift_and_conv_paths_agree():
    """binary_erode/dilate take a shifted and/or chain for <=25-tap SEs
    and the conv for bigger ones — both must implement the identical
    cv2-anchored correlation (incl. even-kernel anchor and border rules)."""
    import cv2

    rng = np.random.default_rng(7)
    mask = (rng.random((96, 128)) > 0.55)
    for k in (2, 3, 4, 5, 7, 9):  # 9 -> 69 taps: conv path; rest: shifts
        se = L.disk_kernel(k)
        got_d = np.asarray(L.binary_dilate(jnp.asarray(mask), se))
        got_e = np.asarray(L.binary_erode(jnp.asarray(mask), se))
        inv = np.asarray(L._se_conv(1.0 - jnp.asarray(mask, jnp.float32), se))
        conv_e = inv < 0.5
        conv_d = np.asarray(L._se_conv(jnp.asarray(mask, jnp.float32),
                                       se)) > 0.5
        np.testing.assert_array_equal(got_d, conv_d, err_msg=f"dilate k={k}")
        np.testing.assert_array_equal(got_e, conv_e, err_msg=f"erode k={k}")
        ref_d = cv2.dilate(mask.astype(np.uint8), se.astype(np.uint8)) > 0
        ref_e = cv2.erode(mask.astype(np.uint8), se.astype(np.uint8)) > 0
        np.testing.assert_array_equal(got_d, ref_d, err_msg=f"cv2 d k={k}")
        np.testing.assert_array_equal(got_e, ref_e, err_msg=f"cv2 e k={k}")


def test_chunked_gather_and_lut_match_unchunked(monkeypatch):
    """The pixel-axis chunking of _row_gather/_lut_matmul (bounds the
    (P, 128) temps that OOMed 16 GB HBM on 47M px canvases) must be
    value-identical to the single-shot path, including the ragged tail."""
    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.integers(0, 1 << 22, 5000, dtype=np.int32))
    idx = rng.integers(0, 5000, size=(123, 77)).astype(np.int32)
    lut = jnp.asarray(rng.integers(0, 2, L._HIST_CAP).astype(np.int32))
    idx_l = rng.integers(0, L._HIST_CAP, size=(123, 77)).astype(np.int32)
    want_g = np.asarray(L._row_gather(table, jnp.asarray(idx)))
    want_l = np.asarray(L._lut_matmul(lut, jnp.asarray(idx_l)))
    monkeypatch.setattr(L, "_GATHER_CHUNK", 1000)  # force chunking + tail
    got_g = np.asarray(L._row_gather(table, jnp.asarray(idx)))
    got_l = np.asarray(L._lut_matmul(lut, jnp.asarray(idx_l)))
    np.testing.assert_array_equal(got_g, want_g)
    np.testing.assert_array_equal(got_l, want_l)
    np.testing.assert_array_equal(want_g,
                                  np.asarray(table)[idx.reshape(-1)]
                                  .reshape(idx.shape))
