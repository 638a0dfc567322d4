"""Seam-free boundary dedup: synthetic nuclei drawn across post-processing
tile boundaries must each appear exactly once after the 4-set repair pass
(the tile_mode 0-3 logic — SURVEY.md §4 integration item)."""
import numpy as np

from cerberus_tpu.infer.wsi import _process_tile_predictions
from cerberus_tpu.wsi.coords import get_tile_info
from cerberus_tpu.wsi.ioconfig import IOSegmentorConfig
from cerberus_tpu.wsi.merge import CanvasSet


def _draw_nucleus(inner, contour, cy, cx, r=6):
    yy, xx = np.ogrid[: inner.shape[0], : inner.shape[1]]
    d2 = (yy - cy) ** 2 + (xx - cx) ** 2
    inner[d2 <= (r - 2) ** 2] = 0.95
    contour[(d2 > (r - 2) ** 2) & (d2 <= r ** 2)] = 0.9


def test_no_duplicates_across_tile_seams(tmp_path):
    H = W = 512
    tile = 128
    margin = 16
    res = {"units": "mpp", "resolution": 0.5}
    ioconfig_pp = IOSegmentorConfig(
        input_resolutions=[res], output_resolutions=[res], margin=margin,
        tile_shape=[tile, tile], patch_input_shape=[144, 144],
        patch_output_shape=[48, 48], stride_shape=[48, 48])

    inner = np.zeros((H, W), np.float32)
    contour = np.zeros((H, W), np.float32)
    # nuclei everywhere trouble can happen: tile interiors, edges (x=128
    # boundary), corners (128,128), image border vicinity
    centers = [
        (40, 40), (40, 128), (128, 40), (128, 128),  # first seam cluster
        (256, 60), (60, 256), (256, 256),            # second boundaries
        (384, 384), (384, 128), (128, 384),          # more crossings
        (200, 200), (330, 70), (70, 330), (450, 450),
        (128, 260), (260, 128),                      # on-seam mid-edge
    ]
    for cy, cx in centers:
        _draw_nucleus(inner, contour, cy, cx)

    # canvas layout: [Nuclei-INST x2 (inner, contour), Nuclei-TYPE]
    canvas = CanvasSet(str(tmp_path / "cache"), (H, W), 3)
    raw = np.stack([inner, contour, (inner > 0.5).astype(np.float32)], -1)
    canvas.write_patches(raw[None], np.array([[0, 0, W, H]]))
    canvas.flush()

    inst_info = {}
    tile_sets = get_tile_info((W, H), ioconfig_pp)
    for set_idx, (bounds, flags) in enumerate(tile_sets):
        for tile_idx, tile_bounds in enumerate(bounds):
            ref_uids = list(inst_info.keys())
            ref_boxes = (np.array([inst_info[u]["box"] for u in ref_uids])
                         if (set_idx == 3 and ref_uids) else np.zeros((0, 4)))
            new_dict, remove = _process_tile_predictions(
                canvas.raw_path, canvas.shape, [0, 2], [2, 3],
                tile_bounds, flags[tile_idx], set_idx,
                ref_boxes, ref_uids if set_idx == 3 else [],
                margin, "IP-ERODED-CONTOUR-3")
            inst_info.update(new_dict)
            for u in remove:
                inst_info.pop(u, None)

    got_centroids = np.array([v["centroid"] for v in inst_info.values()])
    # every synthetic nucleus is detected exactly once
    assert len(got_centroids) == len(centers), (
        f"expected {len(centers)} instances, got {len(got_centroids)}")
    for cy, cx in centers:
        d = np.linalg.norm(got_centroids - np.array([cx, cy]), axis=1)
        assert (d < 4).sum() == 1, f"nucleus at ({cy},{cx}) matched {(d<4).sum()}x"
