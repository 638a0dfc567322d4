"""WSI coordinate/tile/merge primitives."""
import numpy as np

from cerberus_tpu.wsi.coords import (
    assign_patches_to_tiles,
    filter_coordinates,
    get_coordinates,
    get_tile_info,
)
from cerberus_tpu.wsi.ioconfig import IOSegmentorConfig
from cerberus_tpu.wsi.merge import CanvasSet


def _ioconfig(tile=480, margin=16, pin=144, pout=48):
    res = {"units": "mpp", "resolution": 0.5}
    return IOSegmentorConfig(
        input_resolutions=[res], output_resolutions=[res], margin=margin,
        tile_shape=[tile, tile], patch_input_shape=[pin, pin],
        patch_output_shape=[pout, pout], stride_shape=[pout, pout])


def test_get_coordinates_cover_and_center():
    cfg = _ioconfig()
    ins, outs = get_coordinates((500, 400), cfg)
    assert len(ins) == len(outs)
    # output windows cover the whole image
    cover = np.zeros((400, 500), np.int32)
    for x0, y0, x1, y1 in outs:
        cover[y0:min(y1, 400), x0:min(x1, 500)] += 1
    assert cover.min() >= 1
    # inputs centered on outputs with (in-out)/2 margin
    np.testing.assert_array_equal(outs[:, :2] - ins[:, :2], 48)


def test_filter_coordinates_integral_mask():
    cfg = _ioconfig()
    _, outs = get_coordinates((480, 480), cfg)
    mask = np.zeros((48, 48), np.uint8)  # 10x downsampled mask
    mask[0:10, 0:10] = 1  # tissue only in top-left 100x100 proc px
    sel = filter_coordinates(mask, outs, (480, 480))
    kept = outs[sel]
    assert len(kept) > 0
    # every kept patch touches the tissue region; every dropped one doesn't
    for x0, y0, x1, y1 in kept:
        assert x0 < 100 and y0 < 100
    for x0, y0, x1, y1 in outs[~sel]:
        assert x0 >= 96 or y0 >= 96  # 4px mask-pixel quantization slack


def test_tile_info_four_sets_and_flags():
    cfg = _ioconfig(tile=480, pout=48)
    sets = get_tile_info((960, 960), cfg)
    assert len(sets) == 4
    grid, flags = sets[0]
    assert len(grid) == 4
    # top-left tile: only bottom+right edges are internal
    tl_idx = int(np.argwhere((grid[:, 0] == 0) & (grid[:, 1] == 0))[0][0])
    np.testing.assert_array_equal(flags[tl_idx], [0, 1, 0, 1])
    v_bounds, v_flags = sets[1]
    assert (v_flags == [0, 0, 1, 1]).all()
    assert len(v_bounds) == 2  # one internal x boundary, two tile rows
    c_bounds, c_flags = sets[3]
    assert len(c_bounds) == 1  # single internal corner
    assert (c_flags == 1).all()


def test_tile_info_small_image_single_tile():
    cfg = _ioconfig(tile=480)
    sets = get_tile_info((300, 300), cfg)
    grid, flags = sets[0]
    assert len(grid) == 1
    np.testing.assert_array_equal(flags[0], [0, 0, 0, 0])
    assert all(len(b) == 0 for b, _ in sets[1:])


def test_assign_patches_partition():
    cfg = _ioconfig(tile=480, pout=48)
    _, outs = get_coordinates((960, 960), cfg)
    grid, _ = get_tile_info((960, 960), cfg)[0]
    seen = np.zeros(len(outs), np.int32)
    for tile in grid:
        seen[assign_patches_to_tiles(outs, tile)] += 1
    assert (seen == 1).all()  # exact partition: no double compute, no gaps


def test_canvas_set_roundtrip(tmp_path):
    canvas = CanvasSet(str(tmp_path / "cache"), (100, 120), 3)
    pred = np.random.default_rng(0).random((2, 40, 40, 3)).astype(np.float32)
    canvas.write_patches(pred, np.array([[0, 0, 40, 40], [100, 80, 140, 120]]))
    got = canvas.read_region((0, 0, 40, 40))
    np.testing.assert_allclose(got, pred[0], atol=1e-2)  # float16 storage
    # clipped edge write: only the in-canvas part of the second patch lands
    got2 = canvas.read_region((100, 80, 120, 100))
    np.testing.assert_allclose(got2, pred[1][:20, :20], atol=1e-2)
    canvas.close()


def test_tile_info_dense_stride_alignment():
    """Dense-mode geometry (1168->864): grid tiles snap to multiples of the
    864 stride (the reference's 15000 tile floors to 14688), every output
    patch lands in exactly one grid tile, and the 4-set union still covers
    internal boundaries."""
    cfg = _ioconfig(tile=15000, margin=64, pin=1168, pout=864)
    shape = (20000, 17000)
    sets = get_tile_info(shape, cfg)
    grid, _flags = sets[0]
    # tile starts/edges are stride-aligned (clipped at the image boundary)
    for x0, y0, x1, y1 in grid:
        assert x0 % 864 == 0 and y0 % 864 == 0
        assert x1 % 864 == 0 or x1 == shape[0]
        assert y1 % 864 == 0 or y1 == shape[1]
    _patch_in, patch_out = get_coordinates(shape, cfg)
    sel_sum = np.zeros(len(patch_out), np.int64)
    for t in range(len(grid)):
        sel_sum[assign_patches_to_tiles(patch_out, grid[t])] += 1
    assert (sel_sum == 1).all()  # exact partition at dense stride
