"""On-TPU instance post-processing primitives (pure jax.lax, jit-compiled).

The reference's post-processing is CPU scipy/skimage (connected components,
marker watershed, per-instance morphology — ``loader/postproc.py``), which on
large tiles dominates wall-clock and forces device->host->device round trips.
These kernels keep the whole pipeline on-chip:

  * binary erosion/dilation: thresholded convolution with the structuring
    element (one MXU/VPU conv instead of pixel loops);
  * connected components: multigrid-seeded min-label propagation
    (``lax.while_loop`` to a fixed point) — 4-connectivity, labels are
    (flattened-index + 1) minima so components get stable, order-independent
    ids; a 2x2-all-foreground coarsening pyramid seeds labels so dense
    regions converge in a few sweeps, with periodic pointer jumping as the
    O(log diameter) worst-case backstop;
  * small-object removal: per-label pixel counts via one ``segment_sum``;
  * hole filling: holes = background components that do not touch the
    border (one CC + one segment reduction — no 1 px/sweep border flood);
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


def _shift_bool(x: jnp.ndarray, dy: int, dx: int, fill: bool) -> jnp.ndarray:
    """x[p + (dy, dx)] with out-of-image -> fill (static shifts)."""
    h, w = x.shape

    def pad(shape):
        return jnp.full(shape, fill, bool)

    if dy > 0:
        x = jnp.concatenate([x[dy:], pad((dy, w))], 0)
    elif dy < 0:
        x = jnp.concatenate([pad((-dy, w)), x[:dy]], 0)
    if dx > 0:
        x = jnp.concatenate([x[:, dx:], pad((h, dx))], 1)
    elif dx < 0:
        x = jnp.concatenate([pad((h, -dx)), x[:, :dx]], 1)
    return x


_SE_SHIFT_MAX_TAPS = 25  # shifted and/or chains beat the 1-channel f32


# conv for small SEs (the conv pays layout transposes + f32 casts: 4.5 ms
# vs <1 ms for the 5-tap disk3 erosion at 1152x2304 — round-3 device
# profiling); big SEs amortize the conv better
def _se_offsets(se: np.ndarray):
    anchor = np.array([se.shape[0] // 2, se.shape[1] // 2])
    return [tuple(off) for off in (np.argwhere(np.asarray(se) > 0) - anchor)]


def binary_dilate(x, se) -> jnp.ndarray:
    offs = _se_offsets(np.asarray(se))
    if len(offs) <= _SE_SHIFT_MAX_TAPS:
        x = jnp.asarray(x, bool)
        out = jnp.zeros_like(x)
        for dy, dx in offs:
            # correlation tap q reads x[p + q - anchor]; OOB = background
            # (conv_general_dilated zero-pads the input)
            out = out | _shift_bool(x, dy, dx, False)
        return out
    return _se_conv(x, se) > 0.5


def binary_erode(x, se) -> jnp.ndarray:
    """cv2-compatible: out-of-image neighborhood counts as foreground
    (cv2.erode uses BORDER_CONSTANT with +inf for erosion)."""
    offs = _se_offsets(np.asarray(se))
    if len(offs) <= _SE_SHIFT_MAX_TAPS:
        x = jnp.asarray(x, bool)
        out = jnp.ones_like(x)
        for dy, dx in offs:
            out = out & _shift_bool(x, dy, dx, True)
        return out
    inv = _se_conv(1.0 - jnp.asarray(x, jnp.float32), se)
    return inv < 0.5


def _neighbor_min(lab: jnp.ndarray, big: jnp.ndarray) -> jnp.ndarray:
    """Min over the 4-neighborhood (edges padded with `big`)."""
    up = jnp.concatenate([lab[:1] * 0 + big, lab[:-1]], axis=0)
    down = jnp.concatenate([lab[1:], lab[:1] * 0 + big], axis=0)
    left = jnp.concatenate([lab[:, :1] * 0 + big, lab[:, :-1]], axis=1)
    right = jnp.concatenate([lab[:, 1:], lab[:, :1] * 0 + big], axis=1)
    return jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))


def _cc_seed(mask: jnp.ndarray, idx: jnp.ndarray, big) -> jnp.ndarray:
    """Multigrid seeding: label the 2x2-all-foreground coarsening recursively
    and map each coarse id (min coarse flat index + 1) back to the flat index
    of that cell's top-left fine pixel. Seeds are valid component members, so
    the fine fixed point is unchanged — taking min(own index, mapped seed)
    preserves the exact min-flat-index id contract — but the fine sweeps now
    only need to stitch the thin boundary ring the coarsening missed (a few
    iterations) instead of traversing whole components. On 4096^2 WSI
    postproc tiles this cuts the gather-heavy pointer-jump sweeps ~5x."""
    h, w = mask.shape
    if h % 2 or w % 2 or min(h, w) < 64:
        return jnp.where(mask, idx, big)
    cm = mask.reshape(h // 2, 2, w // 2, 2).all(axis=(1, 3))
    clab = connected_components(cm)
    ci = (clab - 1) // (w // 2)
    cj = (clab - 1) % (w // 2)
    mapped = jnp.where(clab > 0, (2 * ci) * w + 2 * cj + 1, big)
    seed = jnp.repeat(jnp.repeat(mapped, 2, axis=0), 2, axis=1)
    return jnp.where(mask, jnp.minimum(idx, seed), big)


@partial(jax.jit, static_argnames=("max_iters",))
def connected_components(mask: jnp.ndarray, max_iters: int = 0) -> jnp.ndarray:
    """4-connected labeling. Returns int32 labels where each component's id
    is (min flattened index in component) + 1; background is 0.

    Multigrid-seeded (``_cc_seed``), then each sweep combines 4-neighbor
    min-propagation with pointer jumping (labels are pixel indices, so
    ``lab <- lab[lab]`` contracts label chains like union-find path
    compression): convergence in O(log diameter) sweeps instead of
    O(diameter) — this is what keeps snake-shaped instances on 4096^2 WSI
    postproc tiles cheap.
    """
    h, w = mask.shape
    mask = mask.astype(bool)
    big = jnp.int32(h * w + 2)
    idx = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w) + 1)
    lab = _cc_seed(mask, idx, big)

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
        # 4 cheap shift sweeps per iteration: multigrid-seeded dense regions
        # converge in a handful of iterations without touching a gather
        # (TPU gathers cost ~2x a full sweep — measured on v5e). A pointer-
        # jump pair fires only every 16th iteration as worst-case insurance:
        # thin-corridor masks (the spiral test) stay O(log diameter) while
        # realistic tissue masks never reach it.
        new = lab
        for _ in range(4):
            new = jnp.where(mask, jnp.minimum(new, _neighbor_min(new, big)),
                            big)
        new = jax.lax.cond(it % 16 == 15, lambda x: jump(jump(x)),
                           lambda x: x, new)
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True),
                                                jnp.int32(0)))
    return jnp.where(mask, lab, 0).astype(jnp.int32)


@jax.jit
def label_sizes(lab: jnp.ndarray) -> jnp.ndarray:
    """Pixel count per raw label id, indexed by flattened-index id space.

    Scatter path (XLA lowers segment_sum to a serialized scatter-add, ~17
    ns/px on v5e — round-3 device profiling); kept as the exact fallback
    for canvases with more components than the matmul histogram cap."""
    h, w = lab.shape
    flat = lab.reshape(-1)
    return jax.ops.segment_sum(jnp.ones_like(flat, jnp.int32), flat,
                               num_segments=h * w + 1)


# matmul-histogram cap: canvases with more components fall back to the
# scatter path. 16384 = 128*128 factored one-hot planes; a 2.65M px canvas
# costs ~87 GFLOP bf16 (<1 ms on v5e MXU) vs ~45 ms for the scatter.
_HIST_CAP = 16384
_HIST_CHUNK = 1 << 20  # px per accumulation step bounds the one-hot temps


# pixel-axis chunk for the (P, 128) row/one-hot temps of the gather and
# LUT lookups below: unchunked, a 47M px canvas (49k^2 WSI runs) wants a
# 24 GB temp and OOMs 16 GB HBM at compile time (round-3 regression).
# 4M px chunks bound the temps at 2 GB; smaller chunks cost real fusion
# (1M chunks added ~10 ms e2e at the 2.65M px bench canvas, which 4M
# keeps single-shot)
_GATHER_CHUNK = 1 << 22


def _chunked_px(flat: jnp.ndarray, body) -> jnp.ndarray:
    """Apply ``body`` ((chunk,) -> (chunk,)) over a flat pixel vector in
    bounded chunks (single call when it already fits)."""
    m = flat.shape[0]
    if m <= _GATHER_CHUNK:
        return body(flat)
    pad = (-m) % _GATHER_CHUNK
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    out = jax.lax.map(body, flat.reshape(-1, _GATHER_CHUNK))
    return out.reshape(-1)[:m]


def _row_gather(table_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table_flat[idx] via 128-wide row slices + a one-hot column select.

    XLA lowers a per-element TPU gather at ~17 ns/lookup regardless of
    table size (round-3 microbench: 19 ms for 2.65M lookups); gathering
    contiguous 128-lane ROWS instead is bandwidth-shaped (7.3 ms), and the
    column select fuses. Exact for int32 values < 2^24 (the select rides
    f32). Any index shape; table is zero-padded to a 128 multiple;
    lookups stream in _GATHER_CHUNK chunks so the (chunk, 128) row temp
    stays bounded on giant canvases."""
    n = table_flat.shape[0]
    pad = (-n) % 128
    if pad:
        table_flat = jnp.concatenate(
            [table_flat, jnp.zeros((pad,), table_flat.dtype)])
    t2 = table_flat.reshape(-1, 128)

    def body(flat):
        rows = t2[flat // 128].astype(jnp.float32)
        sel = jax.nn.one_hot(flat % 128, 128, dtype=jnp.float32)
        return (rows * sel).sum(-1).astype(table_flat.dtype)

    # chunk padding is zeros -> indexes row 0; those lanes are discarded
    return _chunked_px(idx.reshape(-1), body).reshape(idx.shape)


def _lut_matmul(lut: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """lut[idx] for a 16384-entry LUT as one (P,128)@(128,128) matmul plus
    a fused one-hot row-dot — 0.63 ms for 2.65M lookups on v5e vs 19 ms
    for the scalar gather (round-3 microbench). Exact for values < 2^24
    (one-hots are exact in bf16; accumulation in f32)."""
    assert lut.shape[0] == _HIST_CAP
    lut2 = lut.reshape(128, 128).astype(jnp.float32)

    def body(flat):
        # f32 operands: one-hots are exact either way, but a bf16 LUT
        # would round values > 256 (8-bit mantissa) — f32 keeps lookups
        # exact to 2^24
        hi = jax.nn.one_hot(flat // 128, 128, dtype=jnp.float32)
        tmp = jax.lax.dot_general(
            hi, lut2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sel = jax.nn.one_hot(flat % 128, 128, dtype=jnp.float32)
        return (tmp * sel).sum(-1).astype(lut.dtype)

    return _chunked_px(idx.reshape(-1), body).reshape(idx.shape)


def _compact_labels_jit(lab: jnp.ndarray):
    """Scatter-free id compaction for min-flat-index labels.

    The CC contract (id = component's min flattened index + 1) means the
    pixel AT flat index ``id - 1`` is the component's root, so
    ``is_root[p] = (lab[p] == p + 1)`` is elementwise, a raster cumsum of
    it ranks the roots 1..n in raster order, and one gather through the
    rank image relabels every pixel — no scatter anywhere. Returns
    (compact labels 1..n in raster-of-root order, n)."""
    h, w = lab.shape
    idx1 = jnp.arange(1, h * w + 1, dtype=jnp.int32).reshape(h, w)
    is_root = (lab == idx1).astype(jnp.int32)
    # 2-level cumsum (rows, then row offsets) — cheaper on TPU than one
    # h*w-long 1-D scan
    row_cum = jnp.cumsum(is_root, axis=1)
    row_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(row_cum[:, -1])[:-1]])
    rank = (row_cum + row_off[:, None]).reshape(-1)
    n = rank[-1]
    root_rank = _row_gather(rank, jnp.clip(lab - 1, 0, h * w - 1))
    lab_k = jnp.where(lab > 0, root_rank, 0)
    return lab_k, n


def _hist_impl() -> str:
    """Same env/platform contract as tpu_postproc._cc_impl: CERBERUS_PALLAS
    '0' kills the pallas histogram kernel, non-empty force-enables, empty
    decides by where computation runs."""
    import os

    env = os.environ.get("CERBERUS_PALLAS", "")
    if env == "0":
        return "lax"
    if env:
        return "pallas"
    default_device = jax.config.jax_default_device
    platform = (default_device.platform if default_device is not None
                else jax.default_backend())
    return "pallas" if platform == "tpu" else "lax"


def _sizes_histogram(lab_k: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Per-id pixel counts for ids in [0, cap) without a scatter: factor
    id = hi*128 + lo and accumulate onehot(hi)^T @ onehot(lo) on the MXU
    (counts are exact in f32 up to 2^24; keep decisions only ever compare
    against min_size <= O(1e3)). Chunked so the one-hot temps stay bounded
    on 4096^2 WSI postproc tiles.

    On TPU the pallas kernel (ops/pallas_hist.py) computes the same
    histogram with VMEM-resident one-hots — this XLA scan materializes
    the one-hot planes in HBM (~10.2 ms vs ~1 ms at 2.65M px)."""
    if _hist_impl() == "pallas":
        from .pallas_hist import hist16384_pallas

        assert cap == _HIST_CAP
        return hist16384_pallas(lab_k)
    side = int(np.sqrt(cap))
    assert side * side == cap
    flat = lab_k.reshape(-1)
    m = flat.shape[0]
    chunk = min(_HIST_CHUNK, m)
    pad = (-m) % chunk
    if pad:
        # padding counts into id 0 (background), which is never kept
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    chunks = flat.reshape(-1, chunk)

    def step(acc, chunk):
        hi = jax.nn.one_hot(chunk // side, side, dtype=jnp.bfloat16)
        lo = jax.nn.one_hot(chunk % side, side, dtype=jnp.bfloat16)
        part = jax.lax.dot_general(hi, lo, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return acc + part, None

    acc, _ = jax.lax.scan(step, jnp.zeros((side, side), jnp.float32), chunks)
    return acc.reshape(-1)


@partial(jax.jit, static_argnames=("min_size",))
def remove_small_objects(lab: jnp.ndarray, min_size: int) -> jnp.ndarray:
    """Zero out components with < min_size pixels (labels from
    connected_components).

    Returns COMPACTED ids (1..n in raster order of component roots — the
    same ordering the host-side ``_compact_labels`` normalization and
    scipy's ``label`` produce), not the raw flat-index ids: downstream
    consumers (dilate_labels max-overwrite, hole fill, host relabeling)
    depend only on id distinctness and ascending order, both preserved.
    Sizes come from the factored one-hot matmul histogram when the canvas
    has < _HIST_CAP components (the overwhelming case), else from the
    scatter fallback — round-3 device profiling showed the segment_sum
    scatter at h*w+1 ids was the single most expensive postproc op."""
    h, w = lab.shape
    lab_k, n = _compact_labels_jit(lab)

    def fast(lab, lab_k):
        sizes = _sizes_histogram(lab_k, _HIST_CAP)
        keep = (sizes >= min_size).astype(jnp.int32)
        keep = keep.at[0].set(0)
        safe = jnp.clip(lab_k, 0, _HIST_CAP - 1)
        return jnp.where(_lut_matmul(keep, safe) > 0, lab_k, 0)

    def slow(lab, lab_k):
        sizes = label_sizes(lab)
        keep = sizes >= min_size
        keep = keep.at[0].set(False)
        return jnp.where(keep[lab], lab_k, 0)

    return jax.lax.cond(n < _HIST_CAP, fast, slow, lab, lab_k)


def _label_fn(cc_impl: str):
    """Resolve the labeling backend for the INTERNAL component labelings
    of hole filling. ``"lax"`` (default) keeps the pure-lax path; other
    values dispatch through ``tpu_postproc._cc`` (pallas VMEM-resident /
    blocked-strip kernels) — measured 1.25-4.1x faster, and these hidden
    background-CCs are a large share of postproc device time (round 3:
    each fill_* call labels a full canvas a second time)."""
    if cc_impl == "lax":
        return connected_components
    from .tpu_postproc import _cc

    return lambda m: _cc(m, cc_impl)


def _ring_bg_cc(is_bg: jnp.ndarray, cc_impl: str) -> jnp.ndarray:
    """CC of the background padded with a 1 px all-background ring.

    Every border-touching bg component is 4-connected to the ring, so they
    all merge into the single component containing padded pixel (0, 0) —
    whose id is exactly 1 by the min-flat-index contract. \"Touches the
    border\" therefore becomes the elementwise test ``id == 1``: no
    segment reduction, no (h*w+1)-entry LUT gather (round-3 device
    profiling: that scatter+gather pair dominated fill_holes at ~95 ms on
    a 2.65M px canvas vs ~3 ms for the labeling itself).
    Returns the padded (h+2, w+2) label plane."""
    return _label_fn(cc_impl)(jnp.pad(is_bg, 1, constant_values=True))


@partial(jax.jit, static_argnames=("cc_impl",))
def fill_holes(mask: jnp.ndarray, cc_impl: str = "lax") -> jnp.ndarray:
    """Binary fill: holes are background components not touching the border.

    Same output as a border-seeded 4-connected background flood (a bg pixel
    is flood-reachable iff its 4-connected bg component contains a border
    pixel), computed with ONE connected-components call on the ring-padded
    background (``_ring_bg_cc``): reachable bg = component id 1.
    """
    mask = mask.astype(bool)
    bg_lab = _ring_bg_cc(~mask, cc_impl)[1:-1, 1:-1]
    return mask | (~mask & (bg_lab != 1))


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


def _neighbor_max(lab: jnp.ndarray) -> jnp.ndarray:
    """Max over the 4-neighborhood (edges padded with 0)."""
    up = jnp.concatenate([jnp.zeros_like(lab[:1]), lab[:-1]], axis=0)
    down = jnp.concatenate([lab[1:], jnp.zeros_like(lab[:1])], axis=0)
    left = jnp.concatenate([jnp.zeros_like(lab[:, :1]), lab[:, :-1]], axis=1)
    right = jnp.concatenate([lab[:, 1:], jnp.zeros_like(lab[:, :1])], axis=1)
    return jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right))


@partial(jax.jit, static_argnames=("cc_impl",))
def fill_label_holes(lab: jnp.ndarray, cc_impl: str = "lax") -> jnp.ndarray:
    """Fill enclosed background inside labeled instances: hole pixels adopt
    the label flooding in from their surrounding instance.

    Fast path: a hole component bounded by exactly ONE instance (the
    overwhelmingly common case — a lumen inside one gland) is assigned by
    one ring-padded connected-components call plus one gather at the pixel
    above each hole's root (see the inline derivation). When a hole
    touches two or more instances, a lockstep flood (labels advance
    together, min id wins the meeting line) partitions it.

    Divergence from the CPU oracle (documented here + PARITY.md): the
    reference fills holes PER INSTANCE inside each instance's bbox
    (loader/postproc.py via binary_fill_holes), so a background pocket
    jointly enclosed by two instances but by neither alone stays
    unfilled there, and a hole enclosed by instance A that merely touches
    B is filled entirely with A. This global formulation fills such
    contested pockets, split along the lockstep meeting line. Real
    gland/lumen morphology essentially never produces these cases (no
    oracle-comparison test has ever hit one); the behavior difference is
    confined to multi-instance-enclosed background.
    """
    h, w = lab.shape
    big = jnp.int32(h * w + 2)
    is_bg = lab == 0
    # ONE ring-padded background CC serves both steps (no segment
    # reductions anywhere — round-3 device profiling showed the former
    # per-component min/max scatters dominating this op):
    #  * holes = bg components whose padded id != 1 (_ring_bg_cc);
    #  * owner lookup: a hole component's id encodes its ROOT (the
    #    component's min-flat-index pixel, i.e. its top-left-most pixel).
    #    The pixel directly ABOVE that root cannot be in the same bg
    #    component (it has a smaller flat index), cannot be in a different
    #    bg component (4-adjacency would have merged them), and cannot be
    #    the ring (the component would then have id 1) — so it is always a
    #    labeled fg pixel of the enclosing instance. One gather fetches it.
    bg_lab_p = _ring_bg_cc(is_bg, cc_impl)          # (h+2, w+2), padded ids
    bg_lab = bg_lab_p[1:-1, 1:-1]
    holes = is_bg & (bg_lab != 1)
    wp = w + 2
    lab_pad_flat = jnp.pad(lab, 1).reshape(-1)
    above_root = jnp.clip(bg_lab - 1 - wp, 0, (h + 2) * wp - 1)
    fill = jnp.where(holes, _row_gather(lab_pad_flat, above_root), 0)
    # contested (hole bounded by >1 instance) detection is elementwise:
    # some hole pixel then borders an instance other than the adopted one
    nbr_min = _neighbor_min(jnp.where(lab > 0, lab, big), big)
    nbr_max = _neighbor_max(jnp.where(lab > 0, lab, 0))
    contested = jnp.any(holes & (((nbr_max > 0) & (nbr_max != fill))
                                 | ((nbr_min < big) & (nbr_min != fill))))

    def exact(lab):
        return _propagate_labels(lab, holes | (lab > 0), big)

    def fast(lab):
        return jnp.where(holes, fill, lab)

    return jax.lax.cond(contested, exact, fast, lab)
