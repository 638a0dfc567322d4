"""Pyramid-level selection, O(thumbnail) reads of giant planes, and the
gated OpenSlide/JP2 backends (exercised through stub modules).

Reference behaviors matched: best-level reads (tiatoolbox WSIReader;
reference prepare_reading caches a resampled plane instead —
misc/wsi_handler.py:55-95), JP2 pseudo-levels + strided reads
(misc/wsi_handler.py:190-300)."""
import os
import sys
import types

import numpy as np
import pytest
import yaml

from cerberus_tpu.wsi import reader as reader_mod
from cerberus_tpu.wsi.reader import (
    JP2Reader,
    NpyPyramidReader,
    OpenSlideReader,
    open_wsi,
)


@pytest.fixture
def pyramid_dir(tmp_path):
    d = tmp_path / "slide"
    os.makedirs(d)
    rng = np.random.default_rng(0)
    level0 = rng.integers(0, 255, (400, 600, 3)).astype(np.uint8)
    np.save(d / "level_0.npy", level0)
    # coarser levels: 2x and 4x decimations
    np.save(d / "level_1.npy", level0[::2, ::2])
    np.save(d / "level_2.npy", level0[::4, ::4])
    with open(d / "meta.yml", "w") as f:
        yaml.safe_dump({"mpp": 0.25, "objective_power": 40}, f)
    return d, level0


def test_multilevel_reads_use_coarse_levels(pyramid_dir):
    d, level0 = pyramid_dir
    reader = open_wsi(str(d))
    assert isinstance(reader, NpyPyramidReader)
    assert reader._level_downsamples == [1.0, 2.0, 4.0]

    # a 4x-scale read must come from level 2 verbatim (no resize needed)
    region = reader.read_bounds([0, 0, 100, 50], 1.0)  # scale 4
    np.testing.assert_array_equal(region, level0[::4, ::4][:50, :100])
    # a 2x read from level 1
    region = reader.read_bounds([10, 10, 60, 40], 0.5)
    np.testing.assert_array_equal(region, level0[::2, ::2][10:40, 10:60])
    # native read still exact
    region = reader.read_bounds([5, 7, 25, 27], 0.25)
    np.testing.assert_array_equal(region, level0[7:27, 5:25])
    # a 3x read picks level 1 (coarsest <= 3) and resizes
    region = reader.read_bounds([0, 0, 100, 100], 0.75)
    assert region.shape == (100, 100, 3)


def test_thumbnail_of_giant_plane_is_o_thumbnail(tmp_path):
    """A 40000^2 level-0-only pyramid (sparse file, never materialized):
    slide_thumbnail must decimate at read time, not allocate the plane."""
    d = tmp_path / "giant"
    os.makedirs(d)
    arr = np.lib.format.open_memmap(d / "level_0.npy", mode="w+",
                                    dtype=np.uint8, shape=(40000, 40000, 3))
    arr[:100, :100] = 200  # touch one corner so content is verifiable
    del arr
    with open(d / "meta.yml", "w") as f:
        yaml.safe_dump({"mpp": 0.25, "objective_power": 40}, f)

    reader = open_wsi(str(d))
    reads = []
    orig = NpyPyramidReader._read_level_strided

    def counting(self, lvl, x0, y0, x1, y1, stride):
        out = orig(self, lvl, x0, y0, x1, y1, stride)
        reads.append(out.nbytes)
        return out

    NpyPyramidReader._read_level_strided = counting
    try:
        thumb = reader.slide_thumbnail(resolution=1.25, units="power")
    finally:
        NpyPyramidReader._read_level_strided = orig
    assert thumb.shape == (1250, 1250, 3)
    assert reads, "strided path was not taken"
    # decimated read stays within 4x of the thumbnail payload
    assert sum(reads) < 4 * thumb.nbytes
    assert thumb[0, 0, 0] > 0  # corner content survived


def test_openslide_reader_via_stub(tmp_path, monkeypatch):
    """OpenSlideReader drives a stub openslide module: correct level choice
    and level-0 addressing of read_region."""
    rng = np.random.default_rng(1)
    level0 = rng.integers(0, 255, (256, 512, 3)).astype(np.uint8)
    levels = [level0, level0[::2, ::2], level0[::4, ::4]]
    calls = []

    class FakeSlide:
        properties = {"openslide.mpp-x": "0.25",
                      "openslide.objective-power": "40"}
        dimensions = (512, 256)
        level_downsamples = [1.0, 2.0, 4.0]

        def __init__(self, path):
            pass

        def read_region(self, loc, lvl, size):
            calls.append((loc, lvl, size))
            x0l, y0l = loc[0] // int(2 ** lvl), loc[1] // int(2 ** lvl)
            return levels[lvl][y0l:y0l + size[1], x0l:x0l + size[0]]

    fake = types.ModuleType("openslide")
    fake.OpenSlide = FakeSlide
    monkeypatch.setitem(sys.modules, "openslide", fake)

    reader = OpenSlideReader("fake.svs")
    np.testing.assert_array_equal(reader.slide_dimensions(0.25), [512, 256])
    region = reader.read_bounds([0, 0, 64, 32], 1.0)  # scale 4 -> level 2
    assert calls[-1][1] == 2
    np.testing.assert_array_equal(region, levels[2][:32, :64])
    # native-scale read from level 0, location in level-0 coords
    region = reader.read_bounds([10, 20, 42, 52], 0.25)
    assert calls[-1] == ((10, 20), 0, (32, 32))
    np.testing.assert_array_equal(region, level0[20:52, 10:42])


def test_jp2_reader_via_stub(tmp_path, monkeypatch):
    """JP2Reader's pseudo-levels are strided reads of the codestream."""
    rng = np.random.default_rng(2)
    plane = rng.integers(0, 255, (300, 400, 3)).astype(np.uint8)

    class FakeJp2k:
        shape = plane.shape

        def __init__(self, path):
            pass

        def __getitem__(self, key):
            return plane[key]

    fake = types.ModuleType("glymur")
    fake.Jp2k = FakeJp2k
    monkeypatch.setitem(sys.modules, "glymur", fake)

    reader = JP2Reader("fake.jp2", mpp=0.25)
    assert reader._level_downsamples == [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]
    # scale-4 read = stride-4 slice of the codestream
    region = reader.read_bounds([0, 0, 64, 32], 1.0)
    np.testing.assert_array_equal(region, plane[::4, ::4][:32, :64])
    # native
    region = reader.read_bounds([3, 5, 33, 25], 0.25)
    np.testing.assert_array_equal(region, plane[5:25, 3:33])
    # dispatch: .jp2 without glymur falls back to the native cv2 reader
    monkeypatch.delitem(sys.modules, "glymur")
    import cv2

    from cerberus_tpu.wsi.reader import Jp2NativeReader

    ok, enc = cv2.imencode(".jp2", cv2.cvtColor(plane, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000])
    assert ok
    (tmp_path / "x.jp2").write_bytes(enc.tobytes())
    assert isinstance(open_wsi(str(tmp_path / "x.jp2")), Jp2NativeReader)


def test_jp2_native_reader(tmp_path):
    """Jp2NativeReader (cv2/OpenJPEG, no glymur): header-only geometry,
    lossless round-trip, strided pseudo-levels value-identical to the
    glymur slicing contract, raw .j2k SIZ parse."""
    import cv2

    from cerberus_tpu.wsi.reader import Jp2NativeReader

    rng = np.random.default_rng(3)
    plane = rng.integers(0, 255, (300, 400, 3)).astype(np.uint8)
    ok, enc = cv2.imencode(".jp2", cv2.cvtColor(plane, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000])
    assert ok
    path = tmp_path / "s.jp2"
    path.write_bytes(enc.tobytes())

    reader = Jp2NativeReader(str(path), mpp=0.25)
    # geometry parsed from the ihdr box, no decode yet
    assert reader._img is None
    assert reader.info.slide_dimensions == (400, 300)
    assert reader._level_downsamples == [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]
    # native-scale read is a lossless round-trip
    np.testing.assert_array_equal(reader.read_bounds([3, 5, 33, 25], 0.25),
                                  plane[5:25, 3:33])
    # scale-4 read = stride-4 slice (the JP2Reader pseudo-level contract)
    np.testing.assert_array_equal(reader.read_bounds([0, 0, 64, 32], 1.0),
                                  plane[::4, ::4][:32, :64])

    # raw codestream (.j2k): dimensions come from the SIZ marker
    data = enc.tobytes()
    i = data.find(b"jp2c")
    cs = data[i + 4:]
    assert cs[:2] == b"\xff\x4f"
    j2k = tmp_path / "s.j2k"
    j2k.write_bytes(cs)
    r2 = Jp2NativeReader(str(j2k), mpp=0.25)
    assert r2.info.slide_dimensions == (400, 300)
    # cv2 stores components R,G,B when fed BGR with MCT off (see
    # tests/test_tiff_reader._j2k_codestream) — the raw codestream decodes
    # with channels swapped vs the container, so only check shape here
    assert r2.read_bounds([0, 0, 400, 300], 0.25).shape == plane.shape


def test_jp2_native_box_walk_robustness(tmp_path):
    """_parse_dimensions must survive real-world box layouts: a multi-KB
    metadata (uuid) box BEFORE jp2h, and the 64-bit XLBox length encoding
    (LBox == 1) — both desynced the old fixed-4096-byte walk."""
    import struct as _struct

    import cv2

    from cerberus_tpu.wsi.reader import Jp2NativeReader

    rng = np.random.default_rng(5)
    plane = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
    ok, enc = cv2.imencode(".jp2", cv2.cvtColor(plane, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000])
    assert ok
    data = enc.tobytes()
    # find the end of the ftyp box (signature box is first, ftyp second)
    (sig_len,) = _struct.unpack(">I", data[0:4])
    (ftyp_len,) = _struct.unpack(">I", data[sig_len:sig_len + 4])
    cut = sig_len + ftyp_len

    # (a) an 8 KB uuid metadata box before jp2h (scanner XMP et al.)
    payload = b"\0" * 8192
    uuid_box = _struct.pack(">I4s", 8 + len(payload), b"uuid") + payload
    p = tmp_path / "meta.jp2"
    p.write_bytes(data[:cut] + uuid_box + data[cut:])
    assert Jp2NativeReader(str(p), mpp=0.25).info.slide_dimensions == (80, 60)

    # (b) the same box in XLBox encoding: LBox == 1, 64-bit length follows
    xl_box = (_struct.pack(">I4s", 1, b"uuid")
              + _struct.pack(">Q", 16 + len(payload)) + payload)
    p2 = tmp_path / "xlbox.jp2"
    p2.write_bytes(data[:cut] + xl_box + data[cut:])
    assert Jp2NativeReader(str(p2), mpp=0.25).info.slide_dimensions == (80, 60)


def test_jp2_native_oversize_fails_fast_at_open(tmp_path, monkeypatch):
    """Slides past cv2.imdecode's pixel cap must fail at OPEN time with an
    actionable message, not mid-pipeline at the first tile read (the
    native path decodes the whole frame)."""
    import cv2

    from cerberus_tpu.wsi.reader import Jp2NativeReader

    rng = np.random.default_rng(7)
    plane = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
    ok, enc = cv2.imencode(".jp2", cv2.cvtColor(plane, cv2.COLOR_RGB2BGR))
    assert ok
    p = tmp_path / "t.jp2"
    p.write_bytes(enc.tobytes())
    # under the cap: opens fine
    assert Jp2NativeReader(str(p), mpp=0.25).info.slide_dimensions == (80, 60)
    # shrink the cap below 60*80 px: open must raise with the workarounds
    monkeypatch.setenv("OPENCV_IO_MAX_IMAGE_PIXELS", "1000")
    with pytest.raises(RuntimeError, match="glymur|npy"):
        Jp2NativeReader(str(p), mpp=0.25)
