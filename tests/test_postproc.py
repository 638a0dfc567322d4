"""CPU post-processing primitives: hand-computed oracles + properties."""
import numpy as np

from cerberus_tpu.ops.cc_cpu import (
    binary_fill_holes,
    label,
    remove_small_objects,
    watershed,
)
from cerberus_tpu.ops.postproc import (
    PostProcInstErodedContourMap,
    get_inst_info_dict,
)


def test_label_4_connectivity():
    mask = np.array([
        [1, 0, 0, 1],
        [1, 0, 1, 0],
        [0, 0, 0, 0],
        [1, 1, 0, 0],
    ], bool)
    lab, num = label(mask)
    assert num == 4  # diagonal pixels are NOT connected
    assert lab[0, 0] == lab[1, 0]
    assert lab[0, 3] != lab[1, 2]


def test_remove_small_objects_bool_and_labeled():
    mask = np.zeros((20, 20), bool)
    mask[1:3, 1:3] = True        # size 4
    mask[10:16, 10:16] = True    # size 36
    out = remove_small_objects(mask, min_size=10)
    assert not out[1, 1] and out[12, 12]

    lab, _ = label(mask)
    out_lab = remove_small_objects(lab, min_size=10)
    assert out_lab[1, 1] == 0 and out_lab[12, 12] != 0


def test_watershed_two_basins():
    # two markers on a ridge-separated valley pair: each basin floods to the
    # ridge; the ridge column is claimed by whoever reaches it first in
    # priority order (lower elevation first).
    img = np.array([
        [0.0, 1.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 1.0, 0.0],
    ])
    markers = np.zeros((3, 3), np.int32)
    markers[1, 0] = 1
    markers[1, 2] = 2
    out = watershed(img, markers)
    assert (out[:, 0] == 1).all()
    assert (out[:, 2] == 2).all()
    assert set(np.unique(out[:, 1])) <= {1, 2}


def test_watershed_respects_mask_and_markers():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32))
    mask = np.zeros((32, 32), bool)
    mask[4:28, 4:28] = True
    markers = np.zeros((32, 32), np.int32)
    markers[8, 8] = 1
    markers[20, 20] = 2
    out = watershed(img, markers, mask=mask)
    assert out[8, 8] == 1 and out[20, 20] == 2
    assert (out[~mask] == 0).all()
    assert (out[mask] > 0).all()  # everything in-mask is flooded


def test_fill_holes():
    ring = np.zeros((9, 9), bool)
    ring[2:7, 2:7] = True
    ring[3:6, 3:6] = False
    assert binary_fill_holes(ring)[4, 4]


def _make_contour_map(shape, blobs, inner_shrink=2):
    """Build a synthetic (H, W, 2) [inner_prob, contour_prob] raw map."""
    inner = np.zeros(shape, np.float32)
    contour = np.zeros(shape, np.float32)
    for (y1, y2, x1, x2) in blobs:
        contour[y1:y2, x1:x2] = 0.9
        s = inner_shrink
        inner[y1 + s:y2 - s, x1 + s:x2 - s] = 0.9
        contour[y1 + s:y2 - s, x1 + s:x2 - s] = 0.0
    return np.stack([inner, contour], axis=-1)


def test_contour_map_gland_segments_two_blobs():
    raw = np.zeros((128, 128, 9), np.float32)
    fg = _make_contour_map((128, 128), [(10, 60, 10, 60), (70, 120, 70, 120)])
    raw[..., 2:4] = fg  # Gland-INST channels in the default layout
    idx_dict = {"Gland-INST": [2, 4], "Gland-TYPE": [7, 8]}
    inst_map, type_map = PostProcInstErodedContourMap.post_process(
        raw, idx_dict, "Gland")
    ids = np.unique(inst_map)
    assert len(ids) == 3  # bg + 2 glands
    assert inst_map[30, 30] != inst_map[90, 90]
    assert inst_map[30, 30] > 0 and inst_map[90, 90] > 0
    assert type_map.shape == (128, 128)


def test_contour_map_nuclei_watershed_splits_touching():
    # two touching nuclei: inner markers separated, combined mask fused
    inner = np.zeros((64, 64), np.float32)
    contour = np.zeros((64, 64), np.float32)
    inner[20:30, 14:26] = 0.9
    inner[20:30, 30:42] = 0.9
    contour[18:32, 12:44] = 0.8
    contour[20:30, 14:26] = 0.0
    contour[20:30, 30:42] = 0.0
    raw = np.stack([inner, contour], axis=-1)
    idx_dict = {"Nuclei-INST": [0, 2]}
    inst_map, type_map = PostProcInstErodedContourMap.post_process(
        raw, idx_dict, "Nuclei")
    assert type_map is None
    assert inst_map[25, 20] != inst_map[25, 36]
    assert inst_map[25, 20] > 0 and inst_map[25, 36] > 0


def test_get_inst_info_dict_types_and_geometry():
    inst_map = np.zeros((64, 64), np.float64)
    inst_map[10:20, 10:20] = 1
    inst_map[40:50, 30:45] = 2
    type_map = np.zeros((64, 64), np.int32)
    type_map[10:20, 10:20] = 2
    type_map[40:50, 30:45] = 0  # majority bg
    type_map[40:50, 30:35] = 1  # runner-up -> should win
    info = get_inst_info_dict(inst_map, type_map)
    assert set(info.keys()) == {1.0, 2.0}
    np.testing.assert_array_equal(info[1]["box"], [[10, 10], [20, 20]])
    np.testing.assert_allclose(info[1]["centroid"], [14.5, 14.5])
    assert info[1]["type"] == 2
    assert info[2]["type"] == 1  # bg demoted to runner-up
    # contour points lie on the blob boundary, in XY
    cnt = info[1]["contour"]
    assert cnt[:, 0].min() == 10 and cnt[:, 0].max() == 19
    assert cnt[:, 1].min() == 10 and cnt[:, 1].max() == 19


def test_get_inst_info_dict_ds_factor_rescales():
    inst_map = np.zeros((32, 32), np.float64)
    inst_map[8:16, 8:16] = 1
    info = get_inst_info_dict(inst_map, None, ds_factor=0.5)
    np.testing.assert_array_equal(info[1]["box"], [[16, 16], [32, 32]])
