"""CLI parser (docopt-compatible) and slide readers."""
import os
import struct

import numpy as np
import pytest
import yaml

from cerberus_tpu.utils.cli import docopt
from cerberus_tpu.wsi.reader import (
    NpyPyramidReader,
    VirtualWSIReader,
    open_wsi,
)

TILE_DOC = open(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "run_infer_tile.py")).read().split('"""')[1]
WSI_DOC = open(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "run_infer_wsi.py")).read().split('"""')[1]


def test_tile_cli_defaults_match_reference():
    args = docopt(TILE_DOC, argv=[])
    assert args["--gpu"] == "0"
    assert args["--batch_size"] == "10"
    assert args["--patch_input_shape"] == "448"
    assert args["--patch_output_shape"] == "144"
    assert args["--output_dir"] == "output/"
    assert args["--model"] is None


def test_wsi_cli_defaults_and_overrides():
    args = docopt(WSI_DOC, argv=[
        "--model=/m", "--batch_size=25", "--save_thumb",
        "--wsi_bulk_idx=3", "--input_dir", "/slides",
    ])
    assert args["--model"] == "/m"
    assert args["--batch_size"] == "25"
    assert args["--save_thumb"] is True
    assert args["--save_mask"] is False
    assert args["--wsi_bulk_idx"] == "3"
    assert args["--input_dir"] == "/slides"
    assert args["--chunk_shape"] == "15000"
    assert args["--tile_shape"] == "2048"
    assert args["--ambiguous_size"] == "64"
    assert args["--wsi_proc_mag"] == "0.5"
    assert args["--cache_path"] == "cache/"


def test_npy_pyramid_reader_scaling(tmp_path):
    slide_dir = tmp_path / "slide"
    os.makedirs(slide_dir)
    rng = np.random.default_rng(0)
    level0 = rng.integers(0, 255, (200, 300, 3)).astype(np.uint8)
    np.save(slide_dir / "level_0.npy", level0)
    with open(slide_dir / "meta.yml", "w") as f:
        yaml.safe_dump({"mpp": 0.25, "objective_power": 40}, f)

    reader = open_wsi(str(slide_dir))
    assert isinstance(reader, NpyPyramidReader)
    assert reader.info.mpp == 0.25
    np.testing.assert_array_equal(reader.slide_dimensions(0.25), [300, 200])
    np.testing.assert_array_equal(reader.slide_dimensions(0.5), [150, 100])
    # native-scale read is exact
    region = reader.read_bounds([10, 20, 60, 70], 0.25)
    np.testing.assert_array_equal(region, level0[20:70, 10:60])
    # out-of-bounds zero padding
    region = reader.read_bounds([280, 180, 330, 230], 0.25)
    assert region.shape == (50, 50, 3)
    assert (region[25:, 25:] == 0).all()
    # 2x-downsampled read has the right shape
    region = reader.read_bounds([0, 0, 50, 50], 0.5)
    assert region.shape == (50, 50, 3)
    # batched native read matches per-window reads
    bounds = np.array([[0, 0, 32, 32], [100, 50, 132, 82]])
    batch = reader.read_batch(bounds, 0.25)
    np.testing.assert_array_equal(batch[0], level0[0:32, 0:32])
    np.testing.assert_array_equal(batch[1], level0[50:82, 100:132])


def test_virtual_reader_wraps_mask():
    mask = (np.arange(100).reshape(10, 10) % 2).astype(np.uint8)
    reader = VirtualWSIReader(mask)
    region = reader._read_level(0, 0, 0, 10, 10)
    assert region.shape == (10, 10, 3)


def test_open_wsi_unknown_format(tmp_path):
    bad = tmp_path / "slide.xyz"
    bad.write_text("nope")
    with pytest.raises(ValueError):
        open_wsi(str(bad))


def test_open_wsi_svs_without_openslide(tmp_path):
    """Without OpenSlide, .svs now routes to the native TIFF parser
    (wsi/tiff_reader.py); a truncated file fails with a parse error, not
    a missing-dependency error."""
    fake = tmp_path / "slide.svs"
    fake.write_bytes(b"II*\x00")
    with pytest.raises((ValueError, struct.error)):
        open_wsi(str(fake))


def test_parse_defaults_wrapped_bracket_and_blank_lines():
    """A [default: ...] landing at the START of a wrapped continuation
    line, or separated from its option by a blank line, must still be
    found (real docopt scans the whole description block) — a dropped
    default turns int(args[flag]) into a TypeError crash."""
    from cerberus_tpu.utils.cli import parse_defaults

    doc = """Usage:
    prog.py [--grad_accum=<n>] [--lr=<x>] [--tag=<s>]

Options:
    --grad_accum=<n>  Accumulate gradients over n microbatches.
                      [default: 1]
    --lr=<x>    Learning rate,
                with a wrapped description line before the default
                [default: 0.001]
    --tag=<s>   A description whose default follows a blank line.

                [default: base]
"""
    d = parse_defaults(doc)
    assert d["--grad_accum"] == "1"
    assert d["--lr"] == "0.001"
    assert d["--tag"] == "base"
    # end-to-end through docopt: the value flag keeps its default (and is
    # not reclassified as a False boolean)
    args = docopt(doc, argv=[])
    assert int(args["--grad_accum"]) == 1
    assert float(args["--lr"]) == 0.001


def test_parse_defaults_continuation_line_starting_with_dashes():
    """A wrapped description line that happens to START with '--word '
    (single space, deeper indent) is a continuation, not a new option —
    the [default: ...] below it still belongs to the real flag."""
    from cerberus_tpu.utils.cli import parse_defaults

    doc = """Usage:
    prog.py [--lr=<x>]

Options:
    --lr=<x>  Learning rate for the
              --bf16 path variant
              [default: 0.001]
"""
    d = parse_defaults(doc)
    assert d["--lr"] == "0.001"
    assert "--bf16" not in d
