"""Native TIFF/SVS reader: container parsing, tile decode, pyramid levels.

Ground truth is the source numpy array (independent of the TIFF encoding),
written through a minimal tiled-TIFF writer below — uncompressed, deflate
and JPEG variants, classic and BigTIFF, Aperio-style description metadata.
Reference surface: OpenSlide usage at ``misc/wsi_handler.py:303-320``."""
import struct
import zlib

import cv2
import numpy as np
import pytest

from cerberus_tpu.wsi.tiff_reader import TiffSlideReader


def _write_tiff(path, levels, compression=1, description=None, big=False,
                tile=64):
    """Minimal tiled TIFF writer (little endian). ``levels``: list of HxWx3
    uint8 arrays, full resolution first."""
    out = bytearray()
    if big:
        out += b"II" + struct.pack("<HHHQ", 43, 8, 0, 0)  # offset patched
    else:
        out += b"II" + struct.pack("<HI", 42, 0)

    def pad():
        while len(out) % 2:
            out.extend(b"\0")

    ifd_offsets = []
    for lvl_idx, img in enumerate(levels):
        h, w = img.shape[:2]
        # encode tiles
        offsets, counts = [], []
        for ty in range(-(-h // tile)):
            for tx in range(-(-w // tile)):
                t = np.zeros((tile, tile, 3), np.uint8)
                sub = img[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
                t[:sub.shape[0], :sub.shape[1]] = sub
                if compression == 1:
                    data = t.tobytes()
                elif compression == 8:
                    data = zlib.compress(t.tobytes())
                elif compression == 7:
                    ok, enc = cv2.imencode(
                        ".jpg", cv2.cvtColor(t, cv2.COLOR_RGB2BGR),
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
                    assert ok
                    data = enc.tobytes()
                pad()
                offsets.append(len(out))
                counts.append(len(data))
                out += data

        entries = []  # (tag, type, count, values)
        entries.append((256, 4, 1, [w]))
        entries.append((257, 4, 1, [h]))
        entries.append((258, 3, 3, [8, 8, 8]))
        entries.append((259, 3, 1, [compression]))
        entries.append((262, 3, 1, [6 if compression == 7 else 2]))
        if description and lvl_idx == 0:
            entries.append((270, 2, len(description) + 1,
                            description.encode() + b"\0"))
        entries.append((277, 3, 1, [3]))
        entries.append((322, 4, 1, [tile]))
        entries.append((323, 4, 1, [tile]))
        entries.append((324, 4, len(offsets), offsets))
        entries.append((325, 4, len(counts), counts))
        entries.sort()

        # materialize out-of-line values
        value_field = 8 if big else 4
        sizes = {2: 1, 3: 2, 4: 4}
        blobs = []
        for tag, vtype, count, vals in entries:
            if vtype == 2:
                data = bytes(vals)
            else:
                data = struct.pack("<" + {3: "H", 4: "I"}[vtype] * count,
                                   *vals)
            if len(data) > value_field:
                pad()
                blobs.append((tag, len(out)))
                out += data
        blob_at = dict(blobs)

        pad()
        ifd_offsets.append(len(out))
        if big:
            out += struct.pack("<Q", len(entries))
        else:
            out += struct.pack("<H", len(entries))
        for tag, vtype, count, vals in entries:
            if vtype == 2:
                data = bytes(vals)
            else:
                data = struct.pack("<" + {3: "H", 4: "I"}[vtype] * count,
                                   *vals)
            if len(data) > value_field:
                field = struct.pack("<" + ("Q" if big else "I"),
                                    blob_at[tag])
            else:
                field = data + b"\0" * (value_field - len(data))
            if big:
                out += struct.pack("<HHQ", tag, vtype, count) + field
            else:
                out += struct.pack("<HHI", tag, vtype, count) + field
        out += b"\0" * (8 if big else 4)  # next-IFD, patched below

    # chain the IFDs
    blob = bytes(out)
    arr = bytearray(blob)
    if big:
        struct.pack_into("<Q", arr, 8, ifd_offsets[0])
    else:
        struct.pack_into("<I", arr, 4, ifd_offsets[0])
    for i, off in enumerate(ifd_offsets):
        n = struct.unpack_from("<Q" if big else "<H", arr, off)[0]
        link = off + (8 if big else 2) + n * (20 if big else 12)
        nxt = ifd_offsets[i + 1] if i + 1 < len(ifd_offsets) else 0
        struct.pack_into("<Q" if big else "<I", arr, link, nxt)
    with open(path, "wb") as f:
        f.write(arr)


@pytest.fixture(scope="module")
def slide_arrays():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (20, 25, 3)).astype(np.uint8)
    lv0 = np.kron(base, np.ones((10, 10, 1))).astype(np.uint8)  # 200x250
    lv1 = lv0[::2, ::2]
    return lv0, lv1


@pytest.mark.parametrize("compression", [1, 8])
@pytest.mark.parametrize("big", [False, True])
def test_lossless_pyramid_roundtrip(tmp_path, slide_arrays, compression, big):
    lv0, lv1 = slide_arrays
    path = str(tmp_path / f"s_{compression}_{big}.svs")
    _write_tiff(path, [lv0, lv1], compression=compression, big=big,
                description="Aperio Fake |AppMag = 40|MPP = 0.25|")
    r = TiffSlideReader(path)
    assert r.info.mpp == 0.25 and r.info.objective_power == 40
    assert tuple(r.info.slide_dimensions) == (250, 200)
    assert r._level_downsamples == [1.0, 2.0]
    # exact window reads at native scale, tile-boundary crossing
    got = r.read_bounds([30, 50, 130, 150], resolution=0.25, units="mpp")
    np.testing.assert_array_equal(got, lv0[50:150, 30:130])
    # level-1 read at 0.5 mpp is exact (decimated source)
    got1 = r.read_bounds([10, 10, 60, 50], resolution=0.5, units="mpp")
    np.testing.assert_array_equal(got1, lv1[10:50, 10:60])
    # out-of-bounds zero padding
    edge = r.read_bounds([200, 150, 300, 250], resolution=0.25, units="mpp")
    np.testing.assert_array_equal(edge[:50, :50], lv0[150:200, 200:250])
    assert (edge[50:] == 0).all() and (edge[:, 50:] == 0).all()


def test_jpeg_tiles_decode_close(tmp_path, slide_arrays):
    lv0, lv1 = slide_arrays
    path = str(tmp_path / "jpeg.svs")
    _write_tiff(path, [lv0, lv1], compression=7,
                description="Aperio |MPP = 0.5|")
    r = TiffSlideReader(path)
    got = r.read_bounds([0, 0, 128, 128], resolution=0.5, units="mpp")
    # lossy: blocky 10x10 texture survives JPEG q95 up to chroma
    # subsampling on the random colors (~7 counts mean)
    err = np.abs(got.astype(int) - lv0[:128, :128].astype(int)).mean()
    assert err < 12.0, err


def test_aspect_mismatched_ifds_skipped(tmp_path, slide_arrays):
    lv0, lv1 = slide_arrays
    label = np.zeros((40, 90, 3), np.uint8)  # label image, wrong aspect
    path = str(tmp_path / "label.svs")
    _write_tiff(path, [lv0, label, lv1], description="|MPP = 0.25|")
    r = TiffSlideReader(path)
    assert r._level_downsamples == [1.0, 2.0]


def test_mpp_from_resolution_tags(tmp_path, slide_arrays):
    lv0, _ = slide_arrays
    path = str(tmp_path / "res.tif")
    _write_tiff(path, [lv0])
    with pytest.raises(ValueError):
        TiffSlideReader(path)  # no mpp anywhere
    r = TiffSlideReader(path, mpp=0.5)
    assert r.info.mpp == 0.5


def test_open_wsi_dispatches_svs(tmp_path, slide_arrays):
    from cerberus_tpu.wsi.reader import open_wsi

    lv0, lv1 = slide_arrays
    path = str(tmp_path / "slide.svs")
    _write_tiff(path, [lv0, lv1], description="|MPP = 0.25|")
    r = open_wsi(path)
    assert isinstance(r, TiffSlideReader)
    thumb = r.slide_thumbnail(resolution=2.0, units="mpp")
    assert thumb.shape[:2] == (25, 31)


def _lzw_encode(data: bytes) -> bytes:
    """Minimal TIFF-LZW encoder (early change) for the roundtrip test."""
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code, w):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << w) | code
        bitcnt += w
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    emit(CLEAR, width)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # early change: widen when the NEXT code would not fit
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(EOI, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def test_lzw_roundtrip_and_tiff(tmp_path, slide_arrays):
    from cerberus_tpu.wsi.tiff_reader import _lzw_decode

    rng = np.random.default_rng(5)
    for blob in (b"TOBEORNOTTOBEORTOBEORNOT" * 40,
                 rng.integers(0, 256, 5000).astype(np.uint8).tobytes(),
                 bytes(3000)):
        assert _lzw_decode(_lzw_encode(blob)) == blob

    # whole-file path: write an LZW-compressed tiled TIFF by swapping the
    # tile encoder (compression tag 5)
    lv0, _ = slide_arrays
    path = str(tmp_path / "lzw.tif")
    import cerberus_tpu.wsi.tiff_reader as tr

    _write_tiff_lzw(path, lv0)
    r = tr.TiffSlideReader(path, mpp=0.5)
    got = r.read_bounds([10, 20, 120, 140], resolution=0.5, units="mpp")
    np.testing.assert_array_equal(got, lv0[20:140, 10:120])


def _write_tiff_lzw(path, img, tile=64):
    """Single-level LZW tiled TIFF via the generic writer with encoded
    tiles spliced in (compression tag 5)."""
    import struct as _s

    h, w = img.shape[:2]
    out = bytearray(b"II" + _s.pack("<HI", 42, 0))

    def pad():
        while len(out) % 2:
            out.extend(b"\0")

    offsets, counts = [], []
    for ty in range(-(-h // tile)):
        for tx in range(-(-w // tile)):
            t = np.zeros((tile, tile, 3), np.uint8)
            sub = img[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            t[:sub.shape[0], :sub.shape[1]] = sub
            data = _lzw_encode(t.tobytes())
            pad()
            offsets.append(len(out)); counts.append(len(data))
            out += data
    entries = [(256, 4, 1, [w]), (257, 4, 1, [h]), (258, 3, 3, [8, 8, 8]),
               (259, 3, 1, [5]), (262, 3, 1, [2]), (277, 3, 1, [3]),
               (322, 4, 1, [tile]), (323, 4, 1, [tile]),
               (324, 4, len(offsets), offsets),
               (325, 4, len(counts), counts)]
    blob_at = {}
    for tag, vtype, count, vals in entries:
        data = _s.pack("<" + {3: "H", 4: "I"}[vtype] * count, *vals)
        if len(data) > 4:
            pad(); blob_at[tag] = len(out); out += data
    pad()
    ifd = len(out)
    out += _s.pack("<H", len(entries))
    for tag, vtype, count, vals in entries:
        data = _s.pack("<" + {3: "H", 4: "I"}[vtype] * count, *vals)
        field = (_s.pack("<I", blob_at[tag]) if len(data) > 4
                 else data + b"\0" * (4 - len(data)))
        out += _s.pack("<HHI", tag, vtype, count) + field
    out += b"\0\0\0\0"
    _s.pack_into("<I", out, 4, ifd)
    open(path, "wb").write(out)
