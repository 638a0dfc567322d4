"""GT target encoders + augmentations."""
import numpy as np

from cerberus_tpu.data.augs import (
    add_to_brightness,
    add_to_contrast,
    add_to_hue,
    add_to_saturation,
    fix_mirror_padding,
    gaussian_blur,
    median_blur,
)
from cerberus_tpu.data.targets import gen_targets, unet_weight_map


def _two_square_ann(hw=64):
    ann = np.zeros((hw, hw), np.int32)
    ann[10:25, 10:25] = 1
    ann[30:45, 30:45] = 2
    return ann


def test_eroded_contour_target_encoding():
    ann = np.stack([_two_square_ann(), (_two_square_ann() > 0) * 2], -1)
    targets, has_flag = gen_targets(
        ann, ["INST", "TYPE"],
        {"INST": "IP-ERODED-CONTOUR-3", "TYPE": "TP"},
        crop_shape=(48, 48))
    assert set(targets) == {"INST", "INST#WEIGHT-MAP", "TYPE"}
    pos = targets["INST"][..., 0]
    assert pos.shape == (48, 48)
    assert set(np.unique(pos)) <= {0, 1, 2}   # bg / inner / contour
    assert (pos == 1).any() and (pos == 2).any()
    # contour rings surround inner cores
    assert targets["INST#WEIGHT-MAP"].min() >= 1  # weight map is 1 + boundary
    assert has_flag == ["INST", "INST#WEIGHT-MAP", "TYPE"]


def test_gen_targets_dummy_fill():
    ann = np.stack([_two_square_ann()], -1)
    targets, has_flag = gen_targets(
        ann, ["INST"], {"INST": "IP-ERODED-3", "TYPE": "TP"},
        crop_shape=(48, 48))
    assert has_flag == ["INST", "INST#WEIGHT-MAP", None]
    assert (targets["TYPE"] == 0).all()


def test_unet_weight_map_peaks_between_instances():
    ann = np.zeros((40, 40), np.int32)
    ann[10:18, 5:15] = 1
    ann[22:30, 5:15] = 2
    w = unet_weight_map(ann, [1, 2], w0=10.0, sigma=3.0)
    assert w[20, 10] > w[20, 35]  # gap between instances outweighs far bg
    assert w[12, 8] == 0          # zero inside instances


def test_fix_mirror_padding_splits_duplicates():
    ann = np.zeros((20, 20), np.int32)
    ann[2:6, 2:6] = 1
    ann[12:16, 12:16] = 1  # duplicated id from mirroring
    fixed = fix_mirror_padding(ann.copy())
    assert fixed[3, 3] != fixed[13, 13]
    assert fixed[3, 3] > 0 and fixed[13, 13] > 0


def test_photometric_augs_preserve_shape_dtype():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    for fn in [gaussian_blur, median_blur, add_to_hue, add_to_saturation,
               add_to_contrast, add_to_brightness]:
        out = fn(img, rng)
        assert out.shape == img.shape and out.dtype == np.uint8


def test_add_to_contrast_actually_changes_image():
    # the reference clips the INPUT (loader/augs.py:76), silently disabling
    # contrast jitter; ours must move pixel values
    rng = np.random.default_rng(1)
    img = (np.arange(32 * 32 * 3).reshape(32, 32, 3) % 200).astype(np.uint8)
    out = add_to_contrast(img, rng, range=(1.5, 1.5))
    assert not np.array_equal(out, img)
