"""On-TPU instance post-processing primitives (pure jax.lax, jit-compiled).

The reference's post-processing is CPU scipy/skimage (connected components,
marker watershed, per-instance morphology — ``loader/postproc.py``), which on
large tiles dominates wall-clock and forces device->host->device round trips.
These kernels keep the whole pipeline on-chip:

  * binary erosion/dilation: thresholded convolution with the structuring
    element (one MXU/VPU conv instead of pixel loops);
  * connected components: iterative min-label propagation
    (``lax.while_loop`` to a fixed point) — 4-connectivity, labels are
    (flattened-index + 1) minima so components get stable, order-independent
    ids;
  * small-object removal: per-label pixel counts via one ``segment_sum``;
  * hole filling: background flood from the border (fixed-point propagation),
    holes = unreachable background;
  * marker watershed: level-ordered flooding — elevations are bucketed into
    N_LEVELS monotone fronts, and labels propagate through each submerged
    front to a fixed point. This reproduces skimage's priority-flood up to
    tie-breaking on contested plateau pixels (a <=1 px boundary band between
    adjacent basins), which is the documented tolerance for instance
    parity (BASELINE.md: label-isomorphism / dice, not bit equality);
  * label dilation (grayscale max) for the per-instance re-growth step: the
    reference grows instances one at a time with ascending-id overwrite
    (later id wins overlaps) — identical to a max-dilation of the label map.

All shapes are static; every function is shape-polymorphic under jit and
safe to pjit over a batch of tiles.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_LEVELS = 64  # watershed elevation buckets


def disk_kernel(ksize: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (k, k)) equivalent."""
    import cv2

    return cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                     (int(ksize), int(ksize))).astype(np.float32)


def _se_conv(x: jnp.ndarray, se: jnp.ndarray) -> jnp.ndarray:
    """2-D correlation of a binary map with a structuring element."""
    k = jnp.asarray(se, jnp.float32)[..., None, None]  # HWIO, 1->1 ch
    # cv2 morphology anchors at k//2 (matters for even kernels)
    pad_h = se.shape[0] // 2, se.shape[0] - 1 - se.shape[0] // 2
    pad_w = se.shape[1] // 2, se.shape[1] - 1 - se.shape[1] // 2
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32)[None, ..., None], k, (1, 1),
        [pad_h, pad_w], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[0, ..., 0]


def binary_dilate(x, se) -> jnp.ndarray:
    return _se_conv(x, se) > 0.5


def binary_erode(x, se) -> jnp.ndarray:
    """cv2-compatible: out-of-image neighborhood counts as foreground
    (cv2.erode uses BORDER_CONSTANT with +inf for erosion)."""
    inv = _se_conv(1.0 - jnp.asarray(x, jnp.float32), se)
    return inv < 0.5


def _neighbor_min(lab: jnp.ndarray, big: jnp.ndarray) -> jnp.ndarray:
    """Min over the 4-neighborhood (edges padded with `big`)."""
    up = jnp.concatenate([lab[:1] * 0 + big, lab[:-1]], axis=0)
    down = jnp.concatenate([lab[1:], lab[:1] * 0 + big], axis=0)
    left = jnp.concatenate([lab[:, :1] * 0 + big, lab[:, :-1]], axis=1)
    right = jnp.concatenate([lab[:, 1:], lab[:, :1] * 0 + big], axis=1)
    return jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))


@partial(jax.jit, static_argnames=("max_iters",))
def connected_components(mask: jnp.ndarray, max_iters: int = 0) -> jnp.ndarray:
    """4-connected labeling. Returns int32 labels where each component's id
    is (min flattened index in component) + 1; background is 0.

    Each sweep combines 4-neighbor min-propagation with pointer jumping
    (labels are pixel indices, so ``lab <- lab[lab]`` contracts label chains
    like union-find path compression): convergence in O(log diameter) sweeps
    instead of O(diameter) — this is what keeps snake-shaped instances on
    4096^2 WSI postproc tiles cheap.
    """
    h, w = mask.shape
    mask = mask.astype(bool)
    big = jnp.int32(h * w + 2)
    idx = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w) + 1)
    lab = jnp.where(mask, idx, big)

    def jump(lab):
        """lab[p] <- lab at the pixel lab points to (background -> self)."""
        flat = jnp.where(mask, lab, idx).reshape(-1)
        target = jnp.clip(flat - 1, 0, h * w - 1)
        jumped = flat[target].reshape(h, w)
        return jnp.where(mask, jnp.minimum(lab, jumped), big)

    def cond(state):
        lab, changed, it = state
        return changed & (it < (max_iters if max_iters else h * w))

    def body(state):
        lab, _, it = state
        new = jnp.minimum(lab, _neighbor_min(lab, big))
        new = jnp.where(mask, new, big)
        new = jump(jump(new))
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True),
                                                jnp.int32(0)))
    return jnp.where(mask, lab, 0).astype(jnp.int32)


@jax.jit
def label_sizes(lab: jnp.ndarray) -> jnp.ndarray:
    """Pixel count per raw label id, indexed by flattened-index id space."""
    h, w = lab.shape
    flat = lab.reshape(-1)
    return jax.ops.segment_sum(jnp.ones_like(flat, jnp.int32), flat,
                               num_segments=h * w + 1)


@partial(jax.jit, static_argnames=("min_size",))
def remove_small_objects(lab: jnp.ndarray, min_size: int) -> jnp.ndarray:
    """Zero out components with < min_size pixels (labels from
    connected_components)."""
    sizes = label_sizes(lab)
    keep = sizes >= min_size
    keep = keep.at[0].set(False)
    return jnp.where(keep[lab], lab, 0)


@jax.jit
def fill_holes(mask: jnp.ndarray) -> jnp.ndarray:
    """Binary fill via border-seeded background flood."""
    h, w = mask.shape
    mask = mask.astype(bool)
    bg = ~mask
    border = jnp.zeros((h, w), bool).at[0, :].set(True).at[-1, :].set(True) \
        .at[:, 0].set(True).at[:, -1].set(True)
    reach = border & bg

    def cond(state):
        reach, changed, it = state
        return changed & (it < h + w)

    def body(state):
        reach, _, it = state
        grow = reach | (_neighbor_or(reach) & bg)
        return grow, jnp.any(grow != reach), it + 1

    # flood has geodesic diameter <= h*w in pathological mazes; h+w covers
    # convex-ish holes, then a second guard loop finishes stragglers
    reach, _, _ = jax.lax.while_loop(cond, body, (reach, jnp.bool_(True),
                                                  jnp.int32(0)))

    def cond2(state):
        reach, changed = state
        return changed

    def body2(state):
        reach, _ = state
        grow = reach | (_neighbor_or(reach) & bg)
        return grow, jnp.any(grow != reach)

    reach, _ = jax.lax.while_loop(cond2, body2, (reach, jnp.bool_(True)))
    return mask | (~reach & bg)


def _neighbor_or(x: jnp.ndarray) -> jnp.ndarray:
    up = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    down = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
    left = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
    right = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    return up | down | left | right


def _propagate_labels(lab, allowed, big):
    """Spread labels (min-id wins) through `allowed` pixels to fixed point."""
    work = jnp.where(lab == 0, big, lab)

    def cond(state):
        work, changed = state
        return changed

    def body(state):
        work, _ = state
        cand = _neighbor_min(work, big)
        new = jnp.where(allowed & (work == big), cand, work)
        # also let labeled plateau pixels keep their label (no overwrite)
        return new, jnp.any(new != work)

    work, _ = jax.lax.while_loop(cond, body, (work, jnp.bool_(True)))
    return jnp.where(work == big, 0, work)


@partial(jax.jit, static_argnames=("n_levels",))
def watershed(image: jnp.ndarray, markers: jnp.ndarray, mask: jnp.ndarray,
              n_levels: int = N_LEVELS) -> jnp.ndarray:
    """Marker-based watershed by level-ordered flooding.

    image: elevation (flood ascends); markers: int labels; mask: flood
    region. Elevations inside the mask are bucketed into ``n_levels``; at
    each level, labels propagate to a fixed point through pixels whose
    elevation is below the waterline. Matches priority-flood up to plateau
    tie-breaks (<=1 px at basin boundaries).
    """
    h, w = image.shape
    mask = mask.astype(bool)
    big = jnp.int32(h * w + 2)
    lab = jnp.where(mask, markers.astype(jnp.int32), 0)

    img = jnp.where(mask, image, jnp.inf)
    lo = jnp.min(jnp.where(mask, image, jnp.inf))
    hi = jnp.max(jnp.where(mask, image, -jnp.inf))
    span = jnp.maximum(hi - lo, 1e-6)
    level_of = jnp.clip(((img - lo) / span * (n_levels - 1)).astype(jnp.int32),
                        0, n_levels - 1)

    def level_body(level, lab):
        allowed = mask & (level_of <= level)
        return _propagate_labels(lab, allowed, big)

    lab = jax.lax.fori_loop(0, n_levels, level_body, lab)
    return jnp.where(mask, lab, 0)


@partial(jax.jit, static_argnames=("ksize",))
def dilate_labels(lab: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Grayscale (max) dilation of a label map by an elliptical SE — the
    vectorized equivalent of the reference's per-instance dilate loop with
    ascending-id overwrite (higher id wins overlaps either way)."""
    if ksize <= 0:
        return lab
    se = disk_kernel(ksize)
    # cv2.dilate semantics: dst(p) = max over src(p + q - anchor) with
    # anchor k//2 and the SE un-reflected -> roll shifts = anchor - q
    offs = np.array([se.shape[0] // 2, se.shape[1] // 2]) - np.argwhere(se > 0)
    out = lab
    for dy, dx in offs:
        shifted = jnp.roll(lab, (int(dy), int(dx)), axis=(0, 1))
        # zero the wrapped-around edges
        h, w = lab.shape
        if dy > 0:
            shifted = shifted.at[:dy, :].set(0)
        elif dy < 0:
            shifted = shifted.at[dy:, :].set(0)
        if dx > 0:
            shifted = shifted.at[:, :dx].set(0)
        elif dx < 0:
            shifted = shifted.at[:, dx:].set(0)
        out = jnp.maximum(out, shifted)
    return out


@jax.jit
def fill_label_holes(lab: jnp.ndarray) -> jnp.ndarray:
    """Fill enclosed background inside labeled instances: hole pixels adopt
    the label flooding in from their surrounding instance."""
    holes = fill_holes(lab > 0) & (lab == 0)
    big = jnp.int32(lab.shape[0] * lab.shape[1] + 2)
    return _propagate_labels(lab, holes | (lab > 0), big)
