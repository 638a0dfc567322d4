"""convert_slide.py — materialize any supported slide as an .npy pyramid.

Usage:
  convert_slide.py <slide_path> <output_dir> [--levels=<n>] [--mpp=<f>]

Converts a slide (SVS/TIFF via the native parser, JP2/OpenSlide formats
when their libraries exist, or a plain image) into the framework's
fastest input format: a directory of ``level_<N>.npy`` memmaps +
``meta.yml``. Useful for staging cohorts onto local SSD ahead of a WSI
run (the npy path feeds the C++ patch gather directly) and for decoding
exotic codecs once on a machine that has the codec.

Reads and writes in row stripes — peak RAM is O(stripe), any slide size.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cerberus_tpu.wsi.reader import open_wsi

STRIPE = 4096


def convert(slide_path: str, out_dir: str, n_levels: int = 4,
            mpp: float = None) -> None:
    reader = open_wsi(slide_path, mpp=mpp)
    w, h = reader.info.slide_dimensions
    os.makedirs(out_dir, exist_ok=True)

    lv0 = np.lib.format.open_memmap(
        os.path.join(out_dir, "level_0.npy"), mode="w+", dtype=np.uint8,
        shape=(h, w, 3))
    for y0 in range(0, h, STRIPE):
        y1 = min(y0 + STRIPE, h)
        lv0[y0:y1] = reader.read_bounds([0, y0, w, y1],
                                        resolution=reader.info.mpp,
                                        units="mpp")
    lv0.flush()

    prev, ph, pw = lv0, h, w
    for lev in range(1, n_levels):
        nh, nw = ph // 2, pw // 2
        if min(nh, nw) < 64:
            break
        cur = np.lib.format.open_memmap(
            os.path.join(out_dir, f"level_{lev}.npy"), mode="w+",
            dtype=np.uint8, shape=(nh, nw, 3))
        for y0 in range(0, nh, STRIPE):
            y1 = min(y0 + STRIPE, nh)
            cur[y0:y1] = prev[2 * y0:2 * y1:2, :2 * nw:2]
        cur.flush()
        prev, ph, pw = cur, nh, nw

    with open(os.path.join(out_dir, "meta.yml"), "w") as f:
        yaml.safe_dump({"mpp": float(reader.info.mpp),
                        "objective_power": reader.info.objective_power}, f)
    print(f"converted {slide_path} -> {out_dir} "
          f"({w}x{h} @ {reader.info.mpp} mpp)")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:]
                if a.startswith("--") and "=" in a)
    if len(argv) != 2 or "-h" in sys.argv or "--help" in sys.argv:
        print(__doc__)
        sys.exit(0 if "-h" in sys.argv or "--help" in sys.argv else 1)
    convert(argv[0], argv[1], n_levels=int(opts.get("levels", 4)),
            mpp=float(opts["mpp"]) if "mpp" in opts else None)
