"""Canvas stitching: reassemble patch outputs into a full-tile map.

The reference sum-accumulates every patch onto a float canvas plus a count
canvas and divides (``infer/tile.py:139-160``) — including a duplicated,
byte-identical second placement grid (``:90-103``). Our placement grid is
exact (stride == output window, no duplication), so the standard path is a
pure paste: zero FLOPs, one memcpy per patch. The averaging path remains for
overlapped grids (``patch_output_overlap != 0``).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def stitch_canvas(patch_outputs: Sequence[np.ndarray],
                  out_tl_list: Sequence[np.ndarray],
                  canvas_hw,
                  average: bool = False) -> np.ndarray:
    """Paste (or average) per-patch outputs onto a canvas.

    patch_outputs: list of (h, w, C); out_tl_list: matching (y, x) top-left
    coords (in padded-image space); canvas_hw: (H, W) of the padded canvas.
    """
    first = np.asarray(patch_outputs[0])
    n_ch = first.shape[-1]
    canvas = np.zeros((*canvas_hw, n_ch), dtype=np.float32)
    if not average:
        for out, (ty, tx) in zip(patch_outputs, out_tl_list):
            out = np.asarray(out)
            canvas[ty : ty + out.shape[0], tx : tx + out.shape[1]] = out
        return canvas
    count = np.zeros((*canvas_hw, 1), dtype=np.float32)
    for out, (ty, tx) in zip(patch_outputs, out_tl_list):
        out = np.asarray(out)
        canvas[ty : ty + out.shape[0], tx : tx + out.shape[1]] += out
        count[ty : ty + out.shape[0], tx : tx + out.shape[1]] += 1.0
    return canvas / (count + 1.0e-8)
