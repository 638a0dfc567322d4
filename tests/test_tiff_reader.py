"""Native TIFF/SVS reader: container parsing, tile decode, pyramid levels.

Ground truth is the source numpy array (independent of the TIFF encoding),
written through a minimal tiled-TIFF writer below — uncompressed, deflate
and JPEG variants, classic and BigTIFF, Aperio-style description metadata.
Reference surface: OpenSlide usage at ``misc/wsi_handler.py:303-320``."""
import os
import struct
import zlib

import cv2
import numpy as np
import pytest

from cerberus_tpu.wsi.tiff_reader import TiffSlideReader


def _write_tiff(path, levels, compression=1, description=None, big=False,
                tile=64, tile_encoder=None, extra_tags=(),
                sparse_tiles=()):
    """Minimal tiled TIFF writer (little endian). ``levels``: list of HxWx3
    uint8 arrays, full resolution first. ``tile_encoder`` overrides the
    per-tile byte encoding (the compression tag is still written as given);
    ``extra_tags``: extra (tag, type, count, values) IFD entries — a flat
    sequence applies to every IFD, a dict keys them by level index.
    ``description`` may be a per-level list (None entries skip the tag).
    ``sparse_tiles``: set of (level, flat_tile_idx) written with offset 0 /
    bytecount 0 (the Philips sparse-background convention)."""
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
        flat_idx = -1
        for ty in range(-(-h // tile)):
            for tx in range(-(-w // tile)):
                flat_idx += 1
                if (lvl_idx, flat_idx) in set(sparse_tiles):
                    offsets.append(0)
                    counts.append(0)
                    continue
                t = np.zeros((tile, tile, 3), np.uint8)
                sub = img[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
                t[:sub.shape[0], :sub.shape[1]] = sub
                if tile_encoder is not None:
                    data = tile_encoder(t)
                elif compression == 1:
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
        desc = (description[lvl_idx] if isinstance(description, list)
                else (description if lvl_idx == 0 else None))
        if desc:
            entries.append((270, 2, len(desc) + 1, desc.encode() + b"\0"))
        entries.append((277, 3, 1, [3]))
        entries.append((322, 4, 1, [tile]))
        entries.append((323, 4, 1, [tile]))
        entries.append((324, 4, len(offsets), offsets))
        entries.append((325, 4, len(counts), counts))
        entries.extend(extra_tags.get(lvl_idx, ())
                       if isinstance(extra_tags, dict) else extra_tags)
        entries.sort()

        # materialize out-of-line values
        value_field = 8 if big else 4
        sizes = {2: 1, 3: 2, 4: 4}
        blobs = []
        for tag, vtype, count, vals in entries:
            if vtype in (1, 2, 7):  # byte-ish payloads pass through
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
            if vtype in (1, 2, 7):  # byte-ish payloads pass through
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


# -- predictor (tag 317) and Aperio J2K ----------------------------------

def _hdiff(t: np.ndarray) -> bytes:
    """Horizontal differencing (predictor 2): per-channel row diffs mod 256."""
    d = t.astype(np.int16)
    d[:, 1:] -= t[:, :-1].astype(np.int16)
    return (d % 256).astype(np.uint8).tobytes()


@pytest.mark.parametrize("compression", [5, 8])
def test_predictor2_roundtrip(tmp_path, slide_arrays, compression):
    lv0, _ = slide_arrays
    enc = _lzw_encode if compression == 5 else zlib.compress
    path = str(tmp_path / f"pred_{compression}.tif")
    _write_tiff(path, [lv0], compression=compression,
                tile_encoder=lambda t: enc(_hdiff(t)),
                extra_tags=[(317, 3, 1, [2])])
    r = TiffSlideReader(path, mpp=0.5)
    got = r.read_bounds([10, 20, 120, 140], resolution=0.5, units="mpp")
    np.testing.assert_array_equal(got, lv0[20:140, 10:120])


def test_unsupported_predictor_raises(tmp_path, slide_arrays):
    lv0, _ = slide_arrays
    path = str(tmp_path / "pred3.tif")
    _write_tiff(path, [lv0], compression=8, extra_tags=[(317, 3, 1, [3])])
    r = TiffSlideReader(path, mpp=0.5)
    with pytest.raises(ValueError, match="predictor"):
        r.read_bounds([0, 0, 64, 64], resolution=0.5, units="mpp")


def test_unsupported_compression_fails_at_open(tmp_path, slide_arrays):
    """PackBits (32773) must raise at OPEN time so open_wsi's plain-tiff
    fallback can trigger (ADVICE r2); the fallback itself needs a
    cv2-readable file, which this fake isn't, so just assert the raise."""
    lv0, _ = slide_arrays
    path = str(tmp_path / "packbits.tif")
    _write_tiff(path, [lv0], compression=32773,
                tile_encoder=lambda t: t.tobytes())
    with pytest.raises(ValueError, match="compression 32773"):
        TiffSlideReader(path, mpp=0.5)


def _j2k_codestream(t: np.ndarray) -> bytes:
    """Encode a tile to a raw lossless J2K codestream (strip the JP2
    container), as Aperio SVS stores them. cv2's encoder keeps MCT off, so
    the three components are stored as the raw planes fed in (BGR order
    reversed: imencode treats input as BGR, stores components R,G,B)."""
    ok, enc = cv2.imencode(".jp2", cv2.cvtColor(t, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000])
    assert ok
    data = enc.tobytes()
    i = data.find(b"jp2c")
    assert i > 0
    cs = data[i + 4:]
    assert cs[:2] == b"\xff\x4f"  # SOC
    return cs


def test_aperio_j2k_rgb_tiles(tmp_path, slide_arrays):
    """33005 (RGB wavelet) SVS decodes via cv2's OpenJPEG — lossless
    fixture, exact roundtrip, pyramid + window reads through the normal
    machinery."""
    lv0, lv1 = slide_arrays
    path = str(tmp_path / "j2k_33005.svs")
    _write_tiff(path, [lv0, lv1], compression=33005,
                description="Aperio |AppMag = 40|MPP = 0.25|",
                tile_encoder=_j2k_codestream)
    r = TiffSlideReader(path)
    assert r._level_downsamples == [1.0, 2.0]
    got = r.read_bounds([30, 50, 130, 150], resolution=0.25, units="mpp")
    np.testing.assert_array_equal(got, lv0[50:150, 30:130])
    got1 = r.read_bounds([10, 10, 60, 50], resolution=0.5, units="mpp")
    np.testing.assert_array_equal(got1, lv1[10:50, 10:60])


def test_j2k_mct_flag():
    from cerberus_tpu.wsi.tiff_reader import _j2k_mct_enabled

    rgb = (np.random.default_rng(3).random((32, 32, 3)) * 255).astype(np.uint8)
    # cv2/OpenJPEG encodes with the component transform DISABLED
    assert not _j2k_mct_enabled(_j2k_codestream(rgb))
    # crafted COD with MCT=1: marker(2) Lcod(2) Scod(1) order(1) layers(2) MCT(1)
    fake = b"\xff\x4f\xff\x51" + bytes(10) + \
        b"\xff\x52\x00\x0c\x00\x00\x00\x01\x01" + bytes(8)
    assert _j2k_mct_enabled(fake)


def test_aperio_j2k_ycbcr_no_mct(tmp_path, slide_arrays):
    """33003 streams without the in-stream component transform carry raw
    Y,Cb,Cr planes (OpenSlide's Aperio driver makes the same tag-based
    assumption). cv2's encoder genuinely emits MCT=0, so encoding the
    (Cr,Cb,Y)-as-BGR reorder losslessly stores components (Y,Cb,Cr) —
    a faithful MCT-less Aperio 33003 tile."""
    lv0, _ = slide_arrays
    ycc = cv2.cvtColor(lv0, cv2.COLOR_RGB2YCrCb)  # (Y, Cr, Cb)

    def enc(t):  # t is the RGB tile; re-derive its (Cr,Cb,Y) planes
        tyc = cv2.cvtColor(t, cv2.COLOR_RGB2YCrCb)
        ok, enc_ = cv2.imencode(
            ".jp2", tyc[..., [1, 2, 0]],
            [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000])
        assert ok
        data = enc_.tobytes()
        return data[data.find(b"jp2c") + 4:]

    path = str(tmp_path / "j2k_ycc.svs")
    _write_tiff(path, [lv0], compression=33003,
                description="|MPP = 0.25|", tile_encoder=enc)
    r = TiffSlideReader(path)
    got = r.read_bounds([0, 0, 128, 128], resolution=0.25, units="mpp")
    # YCbCr quantizes chroma: exact up to the RGB->YCbCr->RGB roundtrip
    ref = cv2.cvtColor(ycc, cv2.COLOR_YCrCb2RGB)[:128, :128]
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_j2k_svs_through_wsi_pipeline(tmp_path):
    """A J2K-compressed SVS drives the full WSI pipeline end-to-end
    (VERDICT r2 task 3): slide open -> chunk/tile reads -> inference ->
    postproc -> dat/tissue outputs. Mirrors test_wsi_pipeline.py on an
    SVS container instead of an .npy pyramid."""
    import joblib
    import yaml

    import jax

    from cerberus_tpu.config import (
        DEFAULT_DECODER_KWARGS,
        DEFAULT_TARGET_CODE,
        DEFAULT_TARGET_LIST,
        ModelConfig,
    )
    from cerberus_tpu.infer.wsi import InferManager
    from cerberus_tpu.models.convert import save_checkpoint
    from cerberus_tpu.models.net_desc import init_net_params

    model_kwargs = {
        "encoder_backbone_name": "resnet18",
        "decoder_kwargs": DEFAULT_DECODER_KWARGS,
        "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
    }
    model_dir = tmp_path / "model"
    os.makedirs(model_dir)
    cfg = ModelConfig.from_kwargs(model_kwargs)
    save_checkpoint(str(model_dir / "weights.tar"),
                    init_net_params(jax.random.PRNGKey(3), cfg))
    with open(model_dir / "settings.yml", "w") as f:
        yaml.safe_dump({"dataset_kwargs":
                        {"req_target_code": dict(DEFAULT_TARGET_CODE)},
                        "model_kwargs": model_kwargs}, f)

    rng = np.random.default_rng(0)
    lv0 = rng.integers(100, 255, (600, 700, 3), np.uint8)
    lv1 = lv0[::2, ::2]
    slide = tmp_path / "slide_j.svs"
    _write_tiff(str(slide), [lv0, lv1], compression=33005,
                description="Aperio |AppMag = 40|MPP = 0.5|",
                tile_encoder=_j2k_codestream)

    mask = np.zeros((150, 175), np.uint8)
    mask[:, :80] = 255
    mask_path = tmp_path / "slide_j.png"
    cv2.imwrite(str(mask_path), mask)

    output_dir = str(tmp_path / "out")
    infer = InferManager(
        checkpoint_path=str(model_dir / "weights.tar"),
        decoder_dict=dict(DEFAULT_TARGET_CODE),
        model_args=model_kwargs,
    )
    infer.process_wsi_list({
        "nr_inference_workers": 2,
        "nr_post_proc_workers": 0,
        "batch_size": 4,
        "input_list": [str(slide)],
        "mask_list": [str(mask_path)],
        "output_dir": output_dir,
        "patch_input_shape": 144,
        "patch_output_shape": 48,
        "save_thumb": False,
        "save_mask": False,
        "postproc_list": list(DEFAULT_TARGET_LIST),
        "tile_shape": 240,
        "chunk_shape": 480,
        "ambiguous_size": 16,
        "cache_path": str(tmp_path / "cache"),
        "logging_dir": str(tmp_path / "logging"),
        "wsi_proc_mag": 0.5,
    })
    dat = joblib.load(f"{output_dir}/dat/slide_j.dat")
    assert set(dat.keys()) >= {"Nuclei", "Gland", "Lumen"}
    np.testing.assert_array_equal(dat["proc_dimensions"], [600, 700])
    for inst in dat["Nuclei"].values():
        assert inst["centroid"][0] <= 370  # masked left half + margin


def test_large_plain_tiff_offsets_not_relocated(tmp_path):
    """A >4 GB classic TIFF WITHOUT the NDPI marker keeps its stored
    offsets verbatim: the NDPI 32-bit unwrap is gated on tag 65420, so a
    legitimately large plain TIFF (all structure below 4 GB, sparse tail
    past it) must parse and read identically to its small twin."""
    rng = np.random.default_rng(11)
    lv0 = rng.integers(0, 255, (150, 200, 3)).astype(np.uint8)
    small = tmp_path / "small.tif"
    _write_tiff(str(small), [lv0, lv0[::2, ::2]], description="|MPP = 0.5|")
    ref = TiffSlideReader(str(small)).read_bounds(
        [0, 0, 128, 128], resolution=0.5, units="mpp")

    big = tmp_path / "big.tif"
    big.write_bytes(small.read_bytes())
    try:
        with open(big, "r+b") as f:
            f.truncate((1 << 32) + 4096)
    except OSError:
        pytest.skip("filesystem cannot hold a 4 GB sparse file")
    if os.stat(big).st_blocks * 512 > 64 * 1024 * 1024:
        big.unlink()
        pytest.skip("filesystem does not store sparse files sparsely")

    r = TiffSlideReader(str(big))
    assert r._level_downsamples == [1.0, 2.0]
    got = r.read_bounds([0, 0, 128, 128], resolution=0.5, units="mpp")
    np.testing.assert_array_equal(got, ref)


_SCN_XML = """<?xml version="1.0"?>
<scn xmlns="http://www.leica-microsystems.com/scn/2010/10/01">
 <collection sizeX="20000000" sizeY="16000000">
  <image name="macro">
   <view sizeX="20000000" sizeY="16000000" offsetX="0" offsetY="0"/>
   <pixels sizeX="100" sizeY="80">
    <dimension sizeX="100" sizeY="80" r="0" ifd="0"/>
   </pixels>
  </image>
  <image name="region0">
   <view sizeX="62500" sizeY="50000" offsetX="1000000" offsetY="900000"/>
   <pixels sizeX="250" sizeY="200">
    <dimension sizeX="250" sizeY="200" r="0" ifd="1"/>
    <dimension sizeX="250" sizeY="200" r="0" ifd="0" z="1"/>
    <dimension sizeX="125" sizeY="100" r="1" ifd="2"/>
   </pixels>
   <scanSettings><objectiveSettings><objective>20</objective>
   </objectiveSettings></scanSettings>
  </image>
 </collection>
</scn>"""


def test_leica_scn_collection(tmp_path, slide_arrays):
    """Leica SCN: the collection XML (not aspect inference) names the
    scan's pyramid IFDs — the macro overview sits at IFD 0 where the
    generic path would anchor the pyramid. mpp derives from the view's
    physical extent (nm) over the pixel width; objective from the XML;
    duplicate-r z-planes keep the first (z=0)."""
    lv0, lv1 = slide_arrays
    rng = np.random.default_rng(4)
    macro = rng.integers(0, 255, (80, 100, 3)).astype(np.uint8)
    path = str(tmp_path / "slide.scn")
    _write_tiff(path, [macro, lv0, lv1], big=True, description=_SCN_XML)
    r = TiffSlideReader(path)
    assert r.info.slide_dimensions == (250, 200)
    assert r._level_downsamples == [1.0, 2.0]
    assert abs(r.info.mpp - 0.25) < 1e-9  # 62500 nm / 250 px / 1000
    assert r.info.objective_power == 20.0
    got = r.read_bounds([0, 0, 128, 128], resolution=0.25, units="mpp")
    np.testing.assert_array_equal(got, lv0[:128, :128])

    from cerberus_tpu.wsi.reader import open_wsi
    assert isinstance(open_wsi(path), TiffSlideReader)

    # corrupt XML fails loudly, not as a mis-inferred pyramid
    bad = str(tmp_path / "bad.scn")
    _write_tiff(bad, [macro, lv0], big=True,
                description="<scn><image></scn>")
    with pytest.raises(ValueError, match="SCN"):
        TiffSlideReader(bad)


_ISCAN_XML = ('<?xpacket begin=""?><x:xmpmeta xmlns:x="adobe:ns:meta/">'
              '<iScan Magnification="40" ScanRes="0.25" UnitNumber="1"/>'
              '</x:xmpmeta>')


def test_ventana_bif(tmp_path, slide_arrays):
    """Ventana BIF: thumbnail-first IFD order; the iScan XMP names mpp
    (ScanRes) + objective; the pyramid anchors on the largest candidate,
    not IFD0. (AOI overlap stitching of real scanner output is documented
    as out of scope — fixture has no overlaps.)"""
    lv0, lv1 = slide_arrays
    rng = np.random.default_rng(7)
    thumb = rng.integers(0, 255, (40, 50, 3)).astype(np.uint8)
    xmp = _ISCAN_XML.encode()
    path = str(tmp_path / "slide.bif")
    _write_tiff(path, [thumb, lv0, lv1], big=True,
                description=["Thumbnail", None, None],
                extra_tags={1: [(700, 7, len(xmp), xmp)]})
    r = TiffSlideReader(path)
    assert r.info.slide_dimensions == (250, 200)
    assert abs(r.info.mpp - 0.25) < 1e-9
    assert r.info.objective_power == 40.0
    assert r._level_downsamples == [1.0, 2.0]
    got = r.read_bounds([0, 0, 128, 128], resolution=0.25, units="mpp")
    np.testing.assert_array_equal(got, lv0[:128, :128])

    from cerberus_tpu.wsi.reader import open_wsi
    assert isinstance(open_wsi(path), TiffSlideReader)

    # corrupt ScanRes fails closed
    bad_xmp = _ISCAN_XML.replace('ScanRes="0.25"',
                                 'ScanRes="9e99"').encode()
    bad = str(tmp_path / "bad.bif")
    _write_tiff(bad, [thumb, lv0], big=True,
                extra_tags={1: [(700, 7, len(bad_xmp), bad_xmp)]})
    with pytest.raises(ValueError, match="BIF"):
        TiffSlideReader(bad)


_PHILIPS_XML = (
    '<DataObject ObjectType="DPUfsImport"><Attribute Name="PIM_DP_SCANNED'
    '_IMAGES" PMSVR="IDataObjectArray"><Attribute Name="DICOM_PIXEL_SPACING"'
    ' Group="0x0028" Element="0x0030" PMSVR="IDoubleArray">&quot;0.00025'
    '&quot; &quot;0.00025&quot;</Attribute></Attribute></DataObject>')


def test_philips_tiff_sparse(tmp_path, slide_arrays):
    """Philips TIFF: Software tag detection, DICOM_PIXEL_SPACING mm->µm,
    Macro/Label IFDs excluded by name, and sparse background tiles
    (offset/count 0) decoding as scanner-white."""
    lv0, lv1 = slide_arrays
    rng = np.random.default_rng(8)
    macro = rng.integers(0, 255, (40, 50, 3)).astype(np.uint8)
    soft = b"Philips DP v1.0\0"
    path = str(tmp_path / "slide.tiff")
    # level 0 tile grid is 4x4 (tile=64, 250x200): drop flat tile 5
    _write_tiff(path, [lv0, lv1, macro],
                description=[_PHILIPS_XML, None, "Macro image"],
                extra_tags=[(305, 2, len(soft), soft)],
                sparse_tiles={(0, 5)})
    r = TiffSlideReader(path)
    assert r.info.slide_dimensions == (250, 200)
    assert abs(r.info.mpp - 0.25) < 1e-9
    assert len(r._levels) == 2  # macro excluded by name
    got = r.read_bounds([0, 0, 250, 200], resolution=0.25, units="mpp")
    # dropped tile = rows 64:128, cols 64:128 -> white; everything else exact
    expect = lv0.copy()
    expect[64:128, 64:128] = 255
    np.testing.assert_array_equal(got[:200], expect)

    # a zero-length tile in a NON-sparse format still fails loudly
    svs = str(tmp_path / "s.svs")
    _write_tiff(svs, [lv0, lv1], description="Aperio |MPP = 0.25",
                sparse_tiles={(0, 5)})
    rs = TiffSlideReader(svs)
    with pytest.raises(ValueError, match="empty tile"):
        rs.read_bounds([0, 0, 250, 200], resolution=0.25, units="mpp")
