"""Array geometry helpers (numpy; shape contracts identical to the reference's
``misc/utils.py:82-104,133-192`` and ``models/utils/misc_utils.py:6-25``)."""
from __future__ import annotations

import numpy as np


def get_bounding_box(img: np.ndarray):
    """Tight [rmin, rmax, cmin, cmax] box of the nonzero region; max indices
    are exclusive (+1) so slicing with them covers the object."""
    rows = np.any(img, axis=1)
    cols = np.any(img, axis=0)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    return [rmin, rmax + 1, cmin, cmax + 1]


def cropping_center(x: np.ndarray, crop_shape, batch: bool = False) -> np.ndarray:
    """Center-crop leading-HW (or N,HW) array. The offset uses
    ``int((orig - crop) * 0.5)`` — i.e. floor for the non-negative sizes seen
    in practice — matching the reference exactly."""
    orig_shape = x.shape
    if not batch:
        h0 = int((orig_shape[0] - crop_shape[0]) * 0.5)
        w0 = int((orig_shape[1] - crop_shape[1]) * 0.5)
        return x[h0 : h0 + crop_shape[0], w0 : w0 + crop_shape[1]]
    h0 = int((orig_shape[1] - crop_shape[0]) * 0.5)
    w0 = int((orig_shape[2] - crop_shape[1]) * 0.5)
    return x[:, h0 : h0 + crop_shape[0], w0 : w0 + crop_shape[1]]


def center_pad_to_shape(img: np.ndarray, size, cval=255) -> np.ndarray:
    pad_h = size[0] - img.shape[0]
    pad_w = size[1] - img.shape[1]
    pad_h = (pad_h // 2, pad_h - pad_h // 2)
    pad_w = (pad_w // 2, pad_w - pad_w // 2)
    if len(img.shape) == 2:
        pad_shape = (pad_h, pad_w)
    else:
        pad_shape = (pad_h, pad_w, (0, 0))
    return np.pad(img, pad_shape, "constant", constant_values=cval)


def remap_label(pred: np.ndarray, by_size: bool = False) -> np.ndarray:
    """Relabel instance ids to be contiguous [1..N]; optionally order by
    descending size. Vectorized (no per-instance python loop) — the reference
    loops per id (``misc/utils.py:133-164``)."""
    pred_id = np.unique(pred)
    pred_id = pred_id[pred_id != 0]
    if len(pred_id) == 0:
        return pred
    if by_size:
        sizes = np.array([(pred == i).sum() for i in pred_id])
        order = np.argsort(-sizes, kind="stable")
        pred_id = pred_id[order]
    lut = np.zeros(int(pred.max()) + 1, dtype=np.int32)
    lut[pred_id] = np.arange(1, len(pred_id) + 1, dtype=np.int32)
    return lut[pred.astype(np.int64)]


def get_overlap(bb1, bb2) -> float:
    """IoU of two [rmin, rmax, cmin, cmax] boxes (reference
    ``misc/utils.py:25-75``)."""
    a = {"x1": bb1[2], "y1": bb1[0], "x2": bb1[3], "y2": bb1[1]}
    b = {"x1": bb2[2], "y1": bb2[0], "x2": bb2[3], "y2": bb2[1]}
    x_left = max(a["x1"], b["x1"])
    y_top = max(a["y1"], b["y1"])
    x_right = min(a["x2"], b["x2"])
    y_bottom = min(a["y2"], b["y2"])
    if x_right < x_left or y_bottom < y_top:
        return 0.0
    inter = (x_right - x_left) * (y_bottom - y_top)
    area_a = (a["x2"] - a["x1"]) * (a["y2"] - a["y1"])
    area_b = (b["x2"] - b["x1"]) * (b["y2"] - b["y1"])
    return inter / float(area_a + area_b - inter)
