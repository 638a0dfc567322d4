"""Disk-backed prediction canvases for WSI-scale stitching.

Behavioral equivalent of ``merge_prediction`` (SURVEY.md §2.8; used at
``infer/wsi.py:455-469,613-621``): per-head float canvases as ``.npy``
memmaps under a cache directory, accumulated patch-by-patch, plus a count
canvas. Differences by design:

  * one (H, W, C_total) canvas instead of six single-head files — every
    patch lands with ONE strided memcpy of the fused step output, and
    post-processing reads channel slices without re-concatenation. Per-head
    ``raw.{idx}.npy``-compatible views are exposed for parity tooling.
  * patches are partitioned (not multiply-assigned) across inference tiles
    (coords.assign_patches_to_tiles), so values are written exactly once and
    no count normalization is needed; the count canvas remains for the
    overlapped-stride configuration.
  * float16 storage by default: probabilities/argmax ids lose nothing
    material and the disk cache (the reference's ~100 GB SSD budget,
    run_infer_wsi.py:25) halves.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


class CanvasSet:
    def __init__(self, cache_dir: str, canvas_hw, n_ch: int,
                 dtype=np.float16, track_count: bool = False,
                 resume: bool = False):
        self.cache_dir = cache_dir
        self.shape = (int(canvas_hw[0]), int(canvas_hw[1]), n_ch)
        os.makedirs(cache_dir, exist_ok=True)
        self.raw_path = os.path.join(cache_dir, "raw.npy")
        if resume and os.path.exists(self.raw_path):
            existing = np.lib.format.open_memmap(self.raw_path, mode="r+")
            if existing.shape == self.shape and existing.dtype == dtype:
                self.raw = existing  # mid-slide resume: keep written tiles
            else:
                del existing
                self.raw = np.lib.format.open_memmap(
                    self.raw_path, mode="w+", dtype=dtype, shape=self.shape)
        else:
            self.raw = np.lib.format.open_memmap(
                self.raw_path, mode="w+", dtype=dtype, shape=self.shape)
        self.count = None
        if track_count:
            self.count_path = os.path.join(cache_dir, "count.npy")
            self.count = np.lib.format.open_memmap(
                self.count_path, mode="w+", dtype=np.uint8,
                shape=self.shape[:2])

    def write_patches(self, predictions: np.ndarray,
                      locations: np.ndarray) -> None:
        """predictions: (N, h, w, C); locations: (N, 4) XY output bounds.
        Out-of-canvas parts of edge windows are clipped."""
        H, W, _ = self.shape
        for pred, (x0, y0, x1, y1) in zip(predictions, locations):
            cx1, cy1 = min(int(x1), W), min(int(y1), H)
            pw, ph = cx1 - int(x0), cy1 - int(y0)
            if pw <= 0 or ph <= 0:
                continue
            if self.count is None:
                self.raw[y0:cy1, x0:cx1] = pred[:ph, :pw]
            else:
                self.raw[y0:cy1, x0:cx1] += pred[:ph, :pw]
                self.count[y0:cy1, x0:cx1] += 1

    def write_region(self, bounds, values: np.ndarray) -> None:
        """Land one contiguous region (XY bounds) in a single strided write —
        the async disk landing of the HBM-resident path (infer/resident_wsi):
        the device tile canvas arrives already stitched, so the per-patch
        loop of ``write_patches`` collapses to one memcpy."""
        x0, y0, x1, y1 = [int(v) for v in bounds]
        H, W, _ = self.shape
        cx1, cy1 = min(x1, W), min(y1, H)
        if cx1 <= x0 or cy1 <= y0:
            return
        self.raw[y0:cy1, x0:cx1] = values[: cy1 - y0, : cx1 - x0]

    def read_region(self, bounds, channels: Optional[Sequence[int]] = None,
                    normalized: bool = True) -> np.ndarray:
        """Read an XY-bounds region to RAM as float32 (count-normalized when
        a count canvas is tracked)."""
        x0, y0, x1, y1 = [int(v) for v in bounds]
        x1, y1 = min(x1, self.shape[1]), min(y1, self.shape[0])
        region = self.raw[y0:y1, x0:x1]
        if channels is not None:
            region = region[..., list(channels)]
        region = np.asarray(region, dtype=np.float32)
        if self.count is not None and normalized:
            cnt = np.asarray(self.count[y0:y1, x0:x1], np.float32)[..., None]
            region = region / np.maximum(cnt, 1.0)
        return region

    def read_decimated(self, step: int, channel: int) -> np.ndarray:
        """``[::step, ::step]`` of one channel as float32.

        Exactly equals the stripe-wise cv2 INTER_NEAREST 1/step resize of
        the whole plane when H % step == W % step == 0 (integer scale:
        cv2 maps dst j -> src floor(j * step) = j * step), while touching
        only every ``step``-th row of the mmap instead of materializing the
        full-resolution plane (the round-4 49k² tissue phase read 2.4 Gpx
        to produce a 150 Mpx map)."""
        region = np.asarray(self.raw[::step, ::step, channel], np.float32)
        if self.count is not None:
            cnt = np.asarray(self.count[::step, ::step], np.float32)
            region = region / np.maximum(cnt, 1.0)
        return region

    def flush(self) -> None:
        self.raw.flush()
        if self.count is not None:
            self.count.flush()

    def close(self) -> None:
        self.flush()
        del self.raw
        self.raw = None
        self.count = None
