"""Native C++ patch gather vs numpy slicing."""
import numpy as np

from cerberus_tpu.native import gather_patches, native_available


def _oracle(src, coords, wh, ww):
    h, w = src.shape[:2]
    out = np.zeros((len(coords), wh, ww, src.shape[2]), np.uint8)
    for i, (y0, x0) in enumerate(coords):
        ys, ye = max(y0, 0), min(y0 + wh, h)
        xs, xe = max(x0, 0), min(x0 + ww, w)
        if ys < ye and xs < xe:
            out[i, ys - y0: ye - y0, xs - x0: xe - x0] = src[ys:ye, xs:xe]
    return out


def test_native_builds():
    assert native_available(), "C++ toolchain should be present in this image"


def test_gather_matches_numpy_incl_oob():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (300, 400, 3)).astype(np.uint8)
    coords = np.array([
        [0, 0], [100, 200], [250, 350],     # partially OOB bottom-right
        [-20, -20],                          # OOB top-left
        [296, 396],                          # mostly OOB
        [-64, 150], [150, -64],
    ])
    got = gather_patches(src, coords, 64, 64)
    ref = _oracle(src, coords, 64, 64)
    np.testing.assert_array_equal(got, ref)


def test_gather_from_memmap(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (256, 256, 3)).astype(np.uint8)
    path = tmp_path / "slide.npy"
    np.save(path, arr)
    mm = np.load(path, mmap_mode="r")
    coords = np.array([[10, 10], [100, 100], [200, 200]])
    got = gather_patches(mm, coords, 48, 48)
    np.testing.assert_array_equal(got, _oracle(arr, coords, 48, 48))
