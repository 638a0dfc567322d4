"""Hamamatsu NDPI support in the native TIFF reader (VERDICT r3 task 8).

NDPI is classic TIFF with quirks: single-strip JPEG IFDs, per-IFD
SourceLens (tag 65421: objective magnification; -1 = macro, -2 = map),
format marker 65420, resolution in cm, and 32-bit offsets stored modulo
2^32 once files pass 4 GB. The reference reads NDPI only through
OpenSlide (misc/wsi_handler.py:303-320); these tests drive a generated
NDPI-style fixture through the native reader and the full WSI pipeline.
"""
import os
import struct
import zlib

import cv2
import numpy as np
import pytest

from cerberus_tpu.wsi.tiff_reader import TiffSlideReader, _unwrap_ndpi_offset


def _write_ndpi(path, images, lenses, mpp=0.5, z_offsets=None):
    """NDPI-style writer: little-endian classic TIFF, one single-strip
    JPEG IFD per image, SourceLens/marker private tags, resolution in cm.
    ``z_offsets``: optional per-image focal-plane offsets (tag 65422,
    SLONG, nm); None entries omit the tag (the macro has no z)."""
    if z_offsets is None:
        z_offsets = [None] * len(images)
    out = bytearray(b"II" + struct.pack("<HI", 42, 0))

    def pad():
        while len(out) % 2:
            out.extend(b"\0")

    xres_cm = 10000.0 / mpp  # px per cm
    ifd_offsets = []
    for img, lens, z_off in zip(images, lenses, z_offsets):
        h, w = img.shape[:2]
        ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                               [cv2.IMWRITE_JPEG_QUALITY, 95])
        assert ok
        data = enc.tobytes()
        pad()
        strip_at = len(out)
        out.extend(data)

        entries = [
            (256, 4, 1, struct.pack("<I", w)),
            (257, 4, 1, struct.pack("<I", h)),
            (258, 3, 3, struct.pack("<HHH", 8, 8, 8)),
            (259, 3, 1, struct.pack("<H", 7)),        # JPEG
            (262, 3, 1, struct.pack("<H", 6)),        # YCbCr
            (273, 4, 1, struct.pack("<I", strip_at)),
            (277, 3, 1, struct.pack("<H", 3)),
            (278, 4, 1, struct.pack("<I", h)),        # one strip
            (279, 4, 1, struct.pack("<I", len(data))),
            (282, 5, 1, struct.pack("<II", int(xres_cm * 100), 100)),
            (296, 3, 1, struct.pack("<H", 3)),        # centimeter
            (65420, 4, 1, struct.pack("<I", 1)),      # NDPI marker
            (65421, 11, 1, struct.pack("<f", lens)),  # SourceLens (float)
        ]
        if z_off is not None:
            entries.append((65422, 9, 1, struct.pack("<i", z_off)))
        entries.sort()
        # out-of-line values (> 4 bytes)
        blob_at = {}
        for tag, vtype, count, data_ in entries:
            if len(data_) > 4:
                pad()
                blob_at[tag] = len(out)
                out.extend(data_)
        pad()
        ifd_offsets.append(len(out))
        out.extend(struct.pack("<H", len(entries)))
        for tag, vtype, count, data_ in entries:
            if len(data_) > 4:
                field = struct.pack("<I", blob_at[tag])
            else:
                field = data_ + b"\0" * (4 - len(data_))
            out.extend(struct.pack("<HHI", tag, vtype, count) + field)
        out.extend(b"\0\0\0\0")  # next-IFD, patched below

    arr = bytearray(bytes(out))
    struct.pack_into("<I", arr, 4, ifd_offsets[0])
    for i, off in enumerate(ifd_offsets):
        n = struct.unpack_from("<H", arr, off)[0]
        nxt = ifd_offsets[i + 1] if i + 1 < len(ifd_offsets) else 0
        struct.pack_into("<I", arr, off + 2 + n * 12, nxt)
    with open(path, "wb") as f:
        f.write(arr)


@pytest.fixture(scope="module")
def ndpi_arrays():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (20, 25, 3)).astype(np.uint8)
    lv0 = np.kron(base, np.ones((10, 10, 1))).astype(np.uint8)  # 200x250
    lv1 = lv0[::2, ::2]
    macro = rng.integers(0, 255, (40, 90, 3)).astype(np.uint8)
    return lv0, lv1, macro


def test_ndpi_pyramid_macro_skip_and_metadata(tmp_path, ndpi_arrays):
    lv0, lv1, macro = ndpi_arrays
    path = str(tmp_path / "slide.ndpi")
    # macro sits between the levels (as in real files, the IFD order is
    # levels then macro/map; interleave to prove tag-based skipping)
    _write_ndpi(path, [lv0, lv1, macro], [40.0, 10.0, -1.0], mpp=0.44)
    r = TiffSlideReader(path)
    assert r._level_downsamples == [1.0, 2.0]
    assert r.info.objective_power == 40.0
    assert abs(r.info.mpp - 0.44) < 1e-3
    assert r.info.slide_dimensions == (250, 200)

    got = r.read_bounds([0, 0, 128, 128], resolution=0.44, units="mpp")
    err = np.abs(got.astype(int) - lv0[:128, :128].astype(int)).mean()
    assert err < 12.0, err  # lossy JPEG, same bound as the SVS test


def test_ndpi_open_wsi_dispatch(tmp_path, ndpi_arrays):
    from cerberus_tpu.wsi.reader import open_wsi

    lv0, lv1, macro = ndpi_arrays
    path = str(tmp_path / "d.ndpi")
    _write_ndpi(path, [lv0, lv1, macro], [40.0, 10.0, -1.0], mpp=0.5)
    r = open_wsi(path)
    assert isinstance(r, TiffSlideReader)
    assert r.info.slide_dimensions == (250, 200)


def test_ndpi_offset_unwrap_heuristic():
    G = 0x100000000
    # under 4 GB: identity
    assert _unwrap_ndpi_offset(123, 456, G - 1) == 123
    anchor = G + 0x2000  # IFD just past the 4 GB line
    fsize = 2 * G
    true_off = G + 0x1000  # data 4 KiB before the IFD, past the 4 GB line
    stored = true_off % G
    assert _unwrap_ndpi_offset(stored, anchor, fsize) == true_off
    # data written in the PREVIOUS window (large strip crossing 4 GB)
    true_off2 = G - 0x1000
    stored2 = true_off2 % G
    assert _unwrap_ndpi_offset(stored2, anchor, fsize) == true_off2
    # candidate past EOF falls back to the raw value
    assert _unwrap_ndpi_offset(0x500, 0x1000, G + 0x2000) == 0x500


def test_ndpi_through_wsi_pipeline(tmp_path):
    """Generated NDPI fixture drives the full WSI pipeline end-to-end:
    open -> chunk/tile reads -> inference -> postproc -> dat outputs
    (VERDICT r3 task 8 'Done' criterion)."""
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
    macro = rng.integers(0, 255, (60, 100, 3), np.uint8)
    slide = tmp_path / "slide_n.ndpi"
    _write_ndpi(str(slide), [lv0, lv1, macro], [40.0, 10.0, -1.0], mpp=0.5)

    mask = np.zeros((150, 175), np.uint8)
    mask[:, :80] = 255
    mask_path = tmp_path / "slide_n.png"
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
    dat = joblib.load(f"{output_dir}/dat/slide_n.dat")
    assert set(dat.keys()) >= {"Nuclei", "Gland", "Lumen"}
    np.testing.assert_array_equal(dat["proc_dimensions"], [600, 700])
    for inst in dat["Nuclei"].values():
        assert inst["centroid"][0] <= 370  # masked left half + margin


def test_ndpi_over_4gb_parse_and_read(tmp_path, ndpi_arrays):
    """>4 GB NDPI end-to-end: shifting the whole body by EXACTLY 2^32
    leaves every stored 32-bit offset equal to (true offset mod 2^32) —
    the real wrapped-container encoding — so the header IFD0 pointer, the
    next-IFD chain, out-of-line tag values (xres rational, bits) and strip
    offsets ALL need the unwrap at parse/read time. The hole is sparse, so
    the fixture costs ~100 KB of disk."""
    lv0, lv1, macro = ndpi_arrays
    small = tmp_path / "small.ndpi"
    _write_ndpi(str(small), [lv0, lv1, macro], [40.0, 10.0, -1.0], mpp=0.44)
    data = small.read_bytes()
    big = tmp_path / "big.ndpi"
    try:
        with open(big, "wb") as f:
            f.write(data[:8])   # header (II, 42, wrapped IFD0 pointer)
            f.seek(1 << 32)
            f.write(data)       # body shifted by 2^32 (dup header harmless)
    except OSError:
        pytest.skip("filesystem cannot hold a 4 GB sparse file")
    if os.stat(big).st_blocks * 512 > 64 * 1024 * 1024:
        big.unlink()
        pytest.skip("filesystem does not store sparse files sparsely")

    r = TiffSlideReader(str(big))
    assert r._level_downsamples == [1.0, 2.0]
    assert r.info.objective_power == 40.0
    assert abs(r.info.mpp - 0.44) < 1e-3
    got = r.read_bounds([0, 0, 128, 128], resolution=0.44, units="mpp")
    ref = TiffSlideReader(str(small)).read_bounds(
        [0, 0, 128, 128], resolution=0.44, units="mpp")
    np.testing.assert_array_equal(got, ref)


def test_ndpi_zstack_picks_in_focus_plane(tmp_path, ndpi_arrays):
    """Z-stacked NDPI (each magnification repeated per focal plane with
    ZOffset tag 65422): the pyramid must hold exactly ONE level per
    magnification — the in-focus z=0 plane — not duplicates from
    arbitrary focal planes."""
    lv0, lv1, macro = ndpi_arrays
    blur0 = cv2.GaussianBlur(lv0, (15, 15), 7)
    blur1 = cv2.GaussianBlur(lv1, (15, 15), 7)
    path = str(tmp_path / "zstack.ndpi")
    _write_ndpi(
        path,
        [blur0, lv0, blur0, blur1, lv1, blur1, macro],
        [40.0, 40.0, 40.0, 10.0, 10.0, 10.0, -1.0],
        mpp=0.44,
        z_offsets=[-2000, 0, 2000, -2000, 0, 2000, None])
    r = TiffSlideReader(path)
    assert r._level_downsamples == [1.0, 2.0]
    assert r.info.slide_dimensions == (250, 200)
    got = r.read_bounds([0, 0, 128, 128], resolution=0.44, units="mpp")
    err_focus = np.abs(got.astype(int) - lv0[:128, :128].astype(int)).mean()
    err_blur = np.abs(got.astype(int) - blur0[:128, :128].astype(int)).mean()
    # content comes from the z=0 plane, not the blurred neighbors
    assert err_focus < 12.0 and err_focus < err_blur, (err_focus, err_blur)
