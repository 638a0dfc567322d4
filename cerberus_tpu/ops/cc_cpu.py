"""CPU instance-segmentation primitives (numpy/scipy/cv2; no skimage).

These are the host-side oracles for the on-TPU kernels in ``ops/lax_*.py``
and the default post-processing path. Semantics match what the reference
gets from skimage/scipy (``loader/postproc.py:1-7``):

  * ``label``: 4-connected components (scipy.ndimage.label default).
  * ``remove_small_objects``: drop components < min_size; accepts bool masks
    (labels internally, 4-connectivity, like skimage's connectivity=1
    default) or already-labeled int arrays.
  * ``binary_fill_holes``: scipy.ndimage.
  * ``watershed``: marker-based priority-flood identical to
    skimage.segmentation.watershed(image, markers, mask=mask,
    connectivity=1): pixels are popped in (value, insertion-order) priority,
    labels spread to unlabeled in-mask neighbors.
"""
from __future__ import annotations

import heapq

import numpy as np
from scipy import ndimage


def label(mask: np.ndarray):
    """4-connected component labeling; returns (labels int32, count)."""
    lab, num = ndimage.label(mask)
    return lab.astype(np.int32), num


def binary_fill_holes(mask: np.ndarray) -> np.ndarray:
    return ndimage.binary_fill_holes(mask)


def remove_small_objects(ar: np.ndarray, min_size: int) -> np.ndarray:
    """skimage-compatible: bool input -> bool output; labeled int input ->
    same dtype with small components zeroed. connectivity=1."""
    if min_size <= 0:
        return ar.copy()
    if ar.dtype == bool:
        lab, num = label(ar)
    else:
        lab, num = ar.astype(np.int64), int(ar.max())
    if num == 0:
        return ar.copy()
    sizes = np.bincount(lab.ravel(), minlength=num + 1)
    keep = sizes >= min_size
    keep[0] = True
    out = ar.copy()
    out[~keep[lab]] = 0 if ar.dtype != bool else False
    return out


_N4 = ((-1, 0), (1, 0), (0, -1), (0, 1))


def watershed(image: np.ndarray, markers: np.ndarray,
              mask: np.ndarray = None) -> np.ndarray:
    """Marker-based watershed by priority flood (4-connectivity).

    ``image`` is the topography (flood ascends values — pass the negated
    probability map, as the reference does at ``loader/postproc.py:378``);
    ``markers`` a labeled seed array; ``mask`` restricts the flooded region.
    Matches skimage's semantics: strict FIFO tie-break on equal elevation,
    neighbors enqueued with the elevation at the *neighbor* pixel.
    """
    image = np.asarray(image)
    markers = np.asarray(markers)
    if mask is None:
        mask = np.ones(image.shape, bool)
    else:
        mask = np.asarray(mask).astype(bool)

    output = np.where(mask, markers, 0).astype(np.int32)
    h, w = image.shape
    heap = []
    counter = 0
    seeds = np.flatnonzero((output != 0))
    # seed pixels enter in raster order, like skimage's flattened marker scan
    for flat in seeds:
        y, x = divmod(int(flat), w)
        heapq.heappush(heap, (image[y, x], counter, y, x))
        counter += 1

    while heap:
        _val, _cnt, y, x = heapq.heappop(heap)
        lab_here = output[y, x]
        for dy, dx in _N4:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and output[ny, nx] == 0:
                output[ny, nx] = lab_here
                heapq.heappush(heap, (image[ny, nx], counter, ny, nx))
                counter += 1
    return output
