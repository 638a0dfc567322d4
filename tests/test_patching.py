"""Patch-grid math pinned to the reference `_prepare_patching` semantics
(infer/tile.py:43-106) and channel-map construction (infer/tile.py:118-134)."""
import numpy as np

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS
from cerberus_tpu.data.patching import make_channel_index_map, prepare_patching


def test_grid_covers_image_exactly():
    img = np.arange(600 * 500 * 3, dtype=np.uint8).reshape(600, 500, 3)
    padded, info, (padt, padl) = prepare_patching(img, 448, 144, 0)
    assert padt == padl == (448 - 144) // 2 == 152
    # source image recoverable from pad offset
    np.testing.assert_array_equal(
        padded[padt : padt + 600, padl : padl + 500], img
    )
    # every patch: input window 448², output window 144² centered inside it
    for (in_tl, in_br), (out_tl, out_br) in info:
        assert tuple(in_br - in_tl) == (448, 448)
        assert tuple(out_br - out_tl) == (144, 144)
        np.testing.assert_array_equal(out_tl - in_tl, [152, 152])
        assert np.all(in_br <= padded.shape[:2])
    # output windows tile the source region without gaps or overlap
    cover = np.zeros(padded.shape[:2], np.int32)
    for _, (out_tl, out_br) in info:
        cover[out_tl[0]:out_br[0], out_tl[1]:out_br[1]] += 1
    src_cover = cover[padt : padt + 600, padl : padl + 500]
    assert src_cover.min() == 1 and src_cover.max() == 1


def test_grid_matches_reference_formula():
    """Counts must match the reference's ceil-based last-step computation."""
    import math

    for h, w in [(448, 448), (1000, 777), (145, 144), (144, 144)]:
        img = np.zeros((h, w, 3), np.uint8)
        _, info, _ = prepare_patching(img, 448, 144, 0)
        ny = math.ceil((h - 144) / 144) + 1
        nx = math.ceil((w - 144) / 144) + 1
        assert len(info) == ny * nx, (h, w)


def test_channel_index_map_default_layout():
    idx_dict, n = make_channel_index_map(DEFAULT_DECODER_KWARGS)
    assert n == 9
    assert idx_dict == {
        "Lumen-INST": [0, 2],
        "Gland-INST": [2, 4],
        "Nuclei-INST": [4, 6],
        "Nuclei-TYPE": [6, 7],
        "Gland-TYPE": [7, 8],
        "Patch-Class": [8, 9],
    }


def test_small_image_multi_reflection_pad():
    # images smaller than the window still work: np.pad 'reflect' reflects
    # repeatedly, so a 100^2 input yields a valid 448-window grid
    img = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
    padded, info, src_pos = prepare_patching(img, 448, 144, 0)
    assert len(info) >= 1
    np.testing.assert_array_equal(
        padded[src_pos[0]: src_pos[0] + 100, src_pos[1]: src_pos[1] + 100],
        img)
