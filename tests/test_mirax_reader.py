"""Native MIRAX (.mrxs) reader tests.

The fixture writer emits the container layout described in
cerberus_tpu/wsi/mirax_reader.py (Slidedat.ini + Index.dat +
Data####.dat, per the OpenSlide project's MIRAX notes): PNG tiles keep
the pixel path lossless so grid reads can assert exact equality. The
reference reaches MIRAX only through OpenSlide
(misc/wsi_handler.py:303-320).
"""
import os
import struct
import zlib

import cv2
import numpy as np
import pytest

from cerberus_tpu.wsi.mirax_reader import MiraxSlideReader

TW, TH = 64, 48  # camera-image (stored tile) size


def _encode(tile, fmt):
    ext = {"PNG": ".png", "JPEG": ".jpg", "BMP": ".bmp"}[fmt]
    ok, enc = cv2.imencode(ext, cv2.cvtColor(tile, cv2.COLOR_RGB2BGR))
    assert ok
    return enc.tobytes()


def _write_mrxs(path, plane, nx, ny, mpp=0.25, fmt="PNG",
                positions=None, fill_bgr=0, overlap=(0.0, 0.0),
                skip_tiles=()):
    """Write a 2-zoom-level MIRAX container for an ``ny*TH x nx*TW``
    plane. ``positions``: optional {img_no: (x, y)} level-0 camera
    positions (emitted as a VIMSLIDE_POSITION_BUFFER; tiles are still CUT
    from the plane on the regular grid — content placement then follows
    the buffer, which tests exercise). ``skip_tiles``: img_nos with no
    stored tile (sparse scan areas)."""
    base = os.path.splitext(path)[0]
    os.makedirs(base, exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"MIRAX fixture marker\n")

    data = bytearray()
    lv_entries = [[], []]
    # level 0: one camera image per grid cell
    for cy in range(ny):
        for cx in range(nx):
            img_no = cy * nx + cx
            if img_no in skip_tiles:
                continue
            tile = plane[cy * TH:(cy + 1) * TH, cx * TW:(cx + 1) * TW]
            blob = _encode(tile, fmt)
            lv_entries[0].append((img_no, len(data), len(blob), 0))
            data.extend(blob)
    # level 1: concat 2 — 2x2 camera blocks downsampled to tile size
    for cy in range(0, ny, 2):
        for cx in range(0, nx, 2):
            img_no = cy * nx + cx
            block = plane[cy * TH:(cy + 2) * TH, cx * TW:(cx + 2) * TW]
            tile = cv2.resize(block, (TW, TH),
                              interpolation=cv2.INTER_AREA)
            blob = _encode(tile, fmt)
            lv_entries[1].append((img_no, len(data), len(blob), 0))
            data.extend(blob)

    nonhier_blob = None
    if positions is not None:
        raw = bytearray()
        for i in range(nx * ny):
            if i in positions:
                raw += struct.pack("<Bii", 1, *positions[i])
            else:
                raw += struct.pack("<Bii", 0, 0, 0)
        blob = zlib.compress(bytes(raw))
        nonhier_blob = (0, len(data), len(blob), 0)
        data.extend(blob)

    with open(os.path.join(base, "Data0000.dat"), "wb") as f:
        f.write(bytes(data))

    # index: header(37) + roots(8) + hier table(2*4) + nonhier table(4)
    # + one page per list
    index = bytearray(b"01.02" + b"F" * 32 + b"\0" * 8)
    struct.pack_into("<ii", index, 37, 45, 45 + 8)
    index += b"\0" * 12  # tables, patched below
    page_at = []
    for entries in lv_entries:
        page_at.append(len(index))
        index += struct.pack("<ii", len(entries), 0)
        for e in entries:
            index += struct.pack("<iiii", *e)
    struct.pack_into("<ii", index, 45, page_at[0], page_at[1])
    if nonhier_blob is not None:
        off = len(index)
        index += struct.pack("<ii", 1, 0) + struct.pack("<iiii",
                                                        *nonhier_blob)
        struct.pack_into("<i", index, 45 + 8, off)
    with open(os.path.join(base, "Index.dat"), "wb") as f:
        f.write(bytes(index))

    lines = [
        "[GENERAL]",
        "SLIDE_VERSION = 1.9",
        "SLIDE_ID = " + "F" * 32,
        f"IMAGENUMBER_X = {nx}",
        f"IMAGENUMBER_Y = {ny}",
        "OBJECTIVE_MAGNIFICATION = 20",
        "CAMERA_IMAGE_DIVISIONS_PER_SIDE = 1",
        "",
        "[HIERARCHICAL]",
        "HIER_COUNT = 1",
        "HIER_0_NAME = Slide zoom level",
        "HIER_0_COUNT = 2",
        "HIER_0_VAL_0 = ZoomLevel_0",
        "HIER_0_VAL_0_SECTION = LAYER_0_LEVEL_0_SECTION",
        "HIER_0_VAL_1 = ZoomLevel_1",
        "HIER_0_VAL_1_SECTION = LAYER_0_LEVEL_1_SECTION",
        "NONHIER_COUNT = 1",
        "NONHIER_0_NAME = VIMSLIDE_POSITION_BUFFER",
        "NONHIER_0_COUNT = 1",
        "NONHIER_0_VAL_0 = default",
        "INDEXFILE = Index.dat",
        "",
        "[DATAFILE]",
        "FILE_COUNT = 1",
        "FILE_0 = Data0000.dat",
        "",
    ]
    for lvl, concat in ((0, 1), (1, 2)):
        lines += [
            f"[LAYER_0_LEVEL_{lvl}_SECTION]",
            f"DIGITIZER_WIDTH = {TW}",
            f"DIGITIZER_HEIGHT = {TH}",
            f"OVERLAP_X = {overlap[0] * concat}",
            f"OVERLAP_Y = {overlap[1] * concat}",
            f"MICROMETER_PER_PIXEL_X = {mpp * 2 ** lvl}",
            f"MICROMETER_PER_PIXEL_Y = {mpp * 2 ** lvl}",
            f"IMAGE_FORMAT = {fmt}",
            f"IMAGE_FILL_COLOR_BGR = {fill_bgr}",
            f"IMAGE_CONCAT_FACTOR = {concat}",
            "",
        ]
    with open(os.path.join(base, "Slidedat.ini"), "w",
              encoding="utf-8-sig") as f:
        f.write("\n".join(lines))


@pytest.fixture(scope="module")
def plane():
    rng = np.random.default_rng(3)
    # 4x4 camera grid; smooth blocks so INTER_AREA level 1 stays close
    base = rng.integers(30, 225, (4 * TH // 8, 4 * TW // 8, 3))
    return np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)


def test_mirax_grid_exact_roundtrip(tmp_path, plane):
    path = str(tmp_path / "a.mrxs")
    _write_mrxs(path, plane, nx=4, ny=4, mpp=0.25)
    r = MiraxSlideReader(path)
    assert r.info.slide_dimensions == (4 * TW, 4 * TH)
    assert r.info.objective_power == 20.0
    assert r.info.mpp == 0.25
    assert r._level_downsamples == [1.0, 2.0]
    # lossless PNG + overlap-0 grid: exact level-0 pixels
    got = r.read_bounds([0, 0, 4 * TW, 4 * TH], resolution=0.25)
    np.testing.assert_array_equal(got, plane)
    # a window crossing tile seams
    got = r.read_bounds([50, 30, 200, 120], resolution=0.25)
    np.testing.assert_array_equal(got, plane[30:120, 50:200])
    # 2x read comes from level 1 (INTER_AREA of the blocks)
    got2 = r.read_bounds([0, 0, 2 * TW, 2 * TH], resolution=0.5)
    exp = cv2.resize(plane, (2 * TW, 2 * TH),
                     interpolation=cv2.INTER_AREA)
    assert np.abs(got2.astype(int) - exp.astype(int)).mean() < 3.0


def test_mirax_position_buffer_and_fill(tmp_path, plane):
    """Recorded camera positions shift content; uncovered canvas takes
    the fill color."""
    nx = ny = 4
    shift = (7, 11)
    positions = {cy * nx + cx: (cx * TW + shift[0], cy * TH + shift[1])
                 for cy in range(ny) for cx in range(nx)}
    path = str(tmp_path / "b.mrxs")
    _write_mrxs(path, plane, nx, ny, positions=positions,
                fill_bgr=(255 << 16) | (0 << 8) | 0)  # blue BGR -> fill
    r = MiraxSlideReader(path)
    assert r.info.slide_dimensions == (4 * TW + 7, 4 * TH + 11)
    got = r.read_bounds([0, 0, 4 * TW + 7, 4 * TH + 11], resolution=0.25)
    np.testing.assert_array_equal(got[11:, 7:], plane)
    # the unscanned top-left strip carries the BGR fill color as RGB
    np.testing.assert_array_equal(
        got[:11, :7], np.full((11, 7, 3), [0, 0, 255], np.uint8))


def test_mirax_sparse_tiles_and_jpeg(tmp_path, plane):
    """Missing tiles (unscanned cells) render as fill; JPEG tiles decode
    within the usual lossy bound."""
    path = str(tmp_path / "c.mrxs")
    _write_mrxs(path, plane, nx=4, ny=4, fmt="JPEG", skip_tiles={5},
                fill_bgr=0xFFFFFF)
    r = MiraxSlideReader(path)
    got = r.read_bounds([0, 0, 4 * TW, 4 * TH], resolution=0.25)
    # skipped cell (cx=1, cy=1) is pure fill
    cell = got[TH:2 * TH, TW:2 * TW]
    np.testing.assert_array_equal(cell, np.full_like(cell, 255))
    # the rest is JPEG-lossy plane content
    mask = np.ones(got.shape[:2], bool)
    mask[TH:2 * TH, TW:2 * TW] = False
    err = np.abs(got.astype(int) - plane.astype(int))[mask].mean()
    assert err < 6.0, err


def test_mirax_open_wsi_dispatch_and_thumbnail(tmp_path, plane):
    from cerberus_tpu.wsi.reader import open_wsi

    path = str(tmp_path / "d.mrxs")
    _write_mrxs(path, plane, nx=4, ny=4)
    r = open_wsi(path)
    assert isinstance(r, MiraxSlideReader)
    thumb = r.slide_thumbnail(resolution=5.0, units="power")
    assert thumb.shape == (TH, TW, 3)


def test_mirax_rejects_divisions_and_missing_dir(tmp_path, plane):
    path = str(tmp_path / "e.mrxs")
    _write_mrxs(path, plane, nx=4, ny=4)
    ini = os.path.join(str(tmp_path / "e"), "Slidedat.ini")
    with open(ini, encoding="utf-8-sig") as f:
        txt = f.read()
    with open(ini, "w", encoding="utf-8-sig") as f:
        f.write(txt.replace("CAMERA_IMAGE_DIVISIONS_PER_SIDE = 1",
                            "CAMERA_IMAGE_DIVISIONS_PER_SIDE = 2"))
    with pytest.raises(ValueError, match="DIVISIONS"):
        MiraxSlideReader(path)
    lone = tmp_path / "lone.mrxs"
    lone.write_bytes(b"x")
    with pytest.raises(ValueError, match="data directory"):
        MiraxSlideReader(str(lone))


def test_mirax_through_wsi_pipeline(tmp_path):
    """Generated MIRAX fixture drives the full WSI pipeline end-to-end:
    open -> tissue mask -> tile reads -> inference -> postproc -> dat."""
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
    nx, ny = 12, 10  # 768 x 480 plane
    plane = rng.integers(100, 255, (ny * TH, nx * TW, 3)).astype(np.uint8)
    slide = tmp_path / "slide_m.mrxs"
    _write_mrxs(str(slide), plane, nx, ny, mpp=0.5)

    mask = np.zeros((120, 192), np.uint8)
    mask[:, :90] = 255
    cv2.imwrite(str(tmp_path / "slide_m.png"), mask)

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
        "mask_list": [str(tmp_path / "slide_m.png")],
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
    dat = joblib.load(os.path.join(output_dir, "dat", "slide_m.dat"))
    assert set(dat) >= {"Nuclei", "Gland", "Lumen", "proc_dimensions"}
    np.testing.assert_array_equal(dat["proc_dimensions"],
                                  [ny * TH, nx * TW])
    for inst in dat["Nuclei"].values():
        # masked left ~60% of the plane + tile margin
        assert inst["centroid"][0] <= 0.62 * nx * TW


def test_mirax_partial_positions_and_negative_origin(tmp_path, plane):
    """A PARTIAL position buffer (only camera 0 recorded, shifted to
    NEGATIVE coords) must still yield bounds covering every placed tile:
    grid-pitch fallbacks beyond the recorded extent stay readable, and
    the negative minimum shifts the coordinate system so content starts
    at 0 instead of being cropped."""
    nx = ny = 4
    path = str(tmp_path / "f.mrxs")
    _write_mrxs(path, plane, nx, ny, positions={0: (-5, -3)})
    r = MiraxSlideReader(path)
    assert r.info.slide_dimensions == (4 * TW + 5, 4 * TH + 3)
    got = r.read_bounds([0, 0, 4 * TW + 5, 4 * TH + 3], resolution=0.25)
    # camera 0's recorded (-5,-3) normalizes to the plane origin
    np.testing.assert_array_equal(got[:TH, :TW], plane[:TH, :TW])
    # camera (1,1) falls back to grid pitch, shifted by the origin (+5,+3)
    np.testing.assert_array_equal(
        got[TH + 3:2 * TH + 3, TW + 5:2 * TW + 5],
        plane[TH:2 * TH, TW:2 * TW])


def test_mirax_corrupt_index_rejected(tmp_path, plane):
    path = str(tmp_path / "g.mrxs")
    _write_mrxs(path, plane, nx=4, ny=4)
    idx = os.path.join(str(tmp_path / "g"), "Index.dat")
    data = bytearray(open(idx, "rb").read())
    struct.pack_into("<i", data, 37, -8)  # negative hier root
    open(idx, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="corrupt index"):
        MiraxSlideReader(path)
