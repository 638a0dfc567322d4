"""Whole-slide readers.

Behavioral equivalent of the reader surface the reference uses
(``WSIReader.open`` / ``VirtualWSIReader`` from tiatoolbox at
``infer/wsi.py:522-545,559-566``, plus the legacy in-repo handlers in
``misc/wsi_handler.py``): mpp-aware ``slide_dimensions``, bounds reads at a
requested resolution, thumbnails. Neither OpenSlide nor tifffile is present
in this environment, so the concrete backends are:

  * ``NpyPyramidReader`` — a directory with ``level_<N>.npy`` arrays (or a
    single array) + ``meta.yml`` (mpp, objective power). This is both the
    synthetic-test backend and the practical interchange format here.
  * ``ImageReader`` — plain png/jpg behind the same API (small slides).
  * ``OpenSlideReader`` — used automatically when the openslide package
    exists (gated import; absent in this image).

All reads are XY bounds at processing resolution; out-of-bounds regions are
zero-padded, matching pyramidal reader behavior.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import cv2
import numpy as np
import yaml


@dataclasses.dataclass
class SlideInfo:
    mpp: float                 # microns-per-pixel at level 0
    slide_dimensions: Tuple[int, int]  # (w, h) at level 0
    objective_power: Optional[float] = None


class WSIReader:
    """Abstract reader. Subclasses implement `_read_level0` and `info`."""

    info: SlideInfo

    def slide_dimensions(self, resolution: float, units: str = "mpp"):
        """(w, h) of the slide plane at the requested resolution."""
        scale = self._scale_for(resolution, units)
        w, h = self.info.slide_dimensions
        return np.array([int(round(w / scale)), int(round(h / scale))])

    def _scale_for(self, resolution: float, units: str) -> float:
        if units == "mpp":
            return float(resolution) / self.info.mpp
        if units == "power":
            if not self.info.objective_power:
                raise ValueError("slide has no objective power metadata")
            return self.info.objective_power / float(resolution)
        if units == "baseline":
            return 1.0 / float(resolution)
        raise ValueError(f"unknown units {units}")

    def read_bounds(self, bounds, resolution: float, units: str = "mpp"
                    ) -> np.ndarray:
        """Read XY bounds given at the *requested* resolution; returns
        (h, w, 3) uint8, zero-padded where the region exits the slide."""
        scale = self._scale_for(resolution, units)
        x0, y0, x1, y1 = [int(v) for v in bounds]
        out_w, out_h = x1 - x0, y1 - y0
        # corresponding level-0 bounds
        lx0, ly0 = int(np.floor(x0 * scale)), int(np.floor(y0 * scale))
        lx1, ly1 = int(np.ceil(x1 * scale)), int(np.ceil(y1 * scale))
        region = self._read_level0_padded(lx0, ly0, lx1, ly1)
        if region.shape[:2] != (out_h, out_w):
            region = cv2.resize(region, (out_w, out_h),
                                interpolation=cv2.INTER_LINEAR)
        return region

    def slide_thumbnail(self, resolution: float = 1.25, units: str = "power"
                        ) -> np.ndarray:
        w, h = self.slide_dimensions(resolution, units)
        return self.read_bounds([0, 0, int(w), int(h)], resolution, units)

    # -- backend hooks -------------------------------------------------
    def _read_level0_padded(self, x0, y0, x1, y1) -> np.ndarray:
        w, h = self.info.slide_dimensions
        out = np.zeros((y1 - y0, x1 - x0, 3), np.uint8)
        sx0, sy0 = max(x0, 0), max(y0, 0)
        sx1, sy1 = min(x1, w), min(y1, h)
        if sx1 > sx0 and sy1 > sy0:
            out[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = \
                self._read_level0(sx0, sy0, sx1, sy1)
        return out

    def _read_level0(self, x0, y0, x1, y1) -> np.ndarray:
        raise NotImplementedError


class NpyPyramidReader(WSIReader):
    """Pyramid from ``level_0.npy`` (+ optional coarser levels) and
    ``meta.yml`` with {mpp, objective_power} in a directory; or a bare
    ``.npy`` file (mpp given by caller). Level 0 is mmap'd — reads touch only
    the requested window."""

    def __init__(self, path: str, mpp: Optional[float] = None,
                 objective_power: Optional[float] = None):
        if os.path.isdir(path):
            meta_path = os.path.join(path, "meta.yml")
            meta = {}
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = yaml.safe_load(f) or {}
            mpp = meta.get("mpp", mpp)
            objective_power = meta.get("objective_power", objective_power)
            self._level0 = np.load(os.path.join(path, "level_0.npy"),
                                   mmap_mode="r")
        else:
            self._level0 = np.load(path, mmap_mode="r")
        if mpp is None:
            mpp = 0.5
        h, w = self._level0.shape[:2]
        self.info = SlideInfo(mpp=float(mpp), slide_dimensions=(w, h),
                              objective_power=objective_power)

    def _read_level0(self, x0, y0, x1, y1):
        region = np.asarray(self._level0[y0:y1, x0:x1])
        if region.ndim == 2:
            region = np.repeat(region[..., None], 3, axis=-1)
        return region.astype(np.uint8)

    def read_batch(self, bounds_list, resolution: float, units: str = "mpp"
                   ) -> np.ndarray:
        """Batched window read. At native scale this is ONE threaded C++
        gather straight off the level-0 memmap (cerberus_tpu.native) — the
        fast path feeding the jitted step; other scales fall back to
        per-window reads."""
        scale = self._scale_for(resolution, units)
        bounds = np.asarray(bounds_list)
        win_w = int(bounds[0, 2] - bounds[0, 0])
        win_h = int(bounds[0, 3] - bounds[0, 1])
        if abs(scale - 1.0) < 1e-9 and self._level0.ndim == 3 \
                and self._level0.shape[2] == 3:
            from ..native import gather_patches

            coords_yx = bounds[:, [1, 0]]
            return gather_patches(self._level0, coords_yx, win_h, win_w)
        return np.stack([self.read_bounds(b, resolution, units)
                         for b in bounds])


class ImageReader(NpyPyramidReader):
    """png/jpg behind the WSIReader API (loaded fully; small inputs only)."""

    def __init__(self, path: str, mpp: float = 0.5,
                 objective_power: Optional[float] = 40.0):
        img = cv2.imread(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        self._level0 = img
        h, w = img.shape[:2]
        self.info = SlideInfo(mpp=float(mpp), slide_dimensions=(w, h),
                              objective_power=objective_power)


class VirtualWSIReader(WSIReader):
    """Wraps an in-memory array (e.g. a low-res tissue mask) as a pseudo
    slide, like tiatoolbox's VirtualWSIReader (infer/wsi.py:559)."""

    def __init__(self, img: np.ndarray, info: Optional[SlideInfo] = None):
        self._img = np.asarray(img)
        h, w = self._img.shape[:2]
        self.info = info or SlideInfo(mpp=0.5, slide_dimensions=(w, h))

    def _read_level0(self, x0, y0, x1, y1):
        region = self._img[y0:y1, x0:x1]
        if region.ndim == 2:
            region = np.repeat(region[..., None], 3, axis=-1)
        return region.astype(np.uint8)


class OpenSlideReader(WSIReader):  # pragma: no cover - openslide not in image
    def __init__(self, path: str):
        import openslide  # gated: not available in this environment

        self._slide = openslide.OpenSlide(path)
        props = self._slide.properties
        mpp = float(props.get("openslide.mpp-x", 0.25))
        power = props.get("openslide.objective-power")
        w, h = self._slide.dimensions
        self.info = SlideInfo(mpp=mpp, slide_dimensions=(w, h),
                              objective_power=float(power) if power else None)

    def _read_level0(self, x0, y0, x1, y1):
        region = self._slide.read_region((x0, y0), 0, (x1 - x0, y1 - y0))
        return np.asarray(region.convert("RGB"))


def open_wsi(path: str, mpp: Optional[float] = None) -> WSIReader:
    """Extension dispatch (the reference's get_file_handler /
    WSIReader.open analog, misc/wsi_handler.py:303-320)."""
    ext = os.path.splitext(path)[1].lower()
    if os.path.isdir(path) or ext == ".npy":
        return NpyPyramidReader(path, mpp=mpp)
    if ext in (".png", ".jpg", ".jpeg", ".tif", ".bmp"):
        return ImageReader(path, mpp=mpp or 0.5)
    if ext in (".svs", ".ndpi", ".mrxs", ".scn", ".vms", ".vmu", ".svslide"):
        try:
            return OpenSlideReader(path)
        except ImportError as exc:
            raise RuntimeError(
                f"{path}: pyramidal format requires openslide, which is not "
                "available in this environment; convert to an .npy pyramid "
                "directory (level_0.npy + meta.yml)"
            ) from exc
    raise ValueError(f"unsupported slide format: {path}")
