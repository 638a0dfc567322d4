"""Spatially-sharded connected components: halo exchange over the device mesh.

The reference's "long context" is gigapixel spatial extent, handled by disk
tiles + margin-based boundary repair (SURVEY.md §2.9: the spatial analog of
sequence parallelism). The TPU-native equivalent implemented here: the label
canvas is ROW-SHARDED across the mesh; each device runs the fixed-point
min-label kernel (ops/lax_postproc) on its strip, then boundary rows are
exchanged with ``jax.lax.ppermute`` over ICI and labels re-propagate — the
loop converges when a global ``psum`` of change flags hits zero. Only halo
rows ever cross chips; no disk cache, no host round trips, no STRtree dedup.

Label ids are GLOBAL flattened indices (+1), so results are bit-identical to
the single-device kernel regardless of mesh size.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import lax_postproc as L
from .pallas_cc import run_min_axis

AXIS = "rows"  # default axis name; public fns adopt the mesh's own axis


def _local_seed(mask, row0, w, big):
    """Strip-local multigrid seeding (mirrors lax_postproc._cc_seed, but
    shard_map-safe: the fixed-point flags carry the varying-axis type, and
    the coarse recursion stays in strip-local id space until the final
    global-offset conversion). Seeds are strict component members and the
    returned labels take min(own global id, mapped seed), so the global
    fixed point — and therefore bit-identity with the single-device kernel —
    is unchanged."""
    h_local = mask.shape[0]
    idx = (row0 * w
           + jnp.arange(h_local * w, dtype=jnp.int32).reshape(h_local, w) + 1)
    if h_local % 2 or w % 2 or min(h_local, w) < 64:
        return jnp.where(mask, idx, big)
    cm = mask.reshape(h_local // 2, 2, w // 2, 2).all(axis=(1, 3))
    # label the coarse strip locally: seeded recursion + sweep fixed point
    cbig = jnp.int32(cm.shape[0] * cm.shape[1] + 2)
    clab = _local_seed_coarse(cm, cbig)
    ci = (clab - 1) // (w // 2)
    cj = (clab - 1) % (w // 2)
    mapped = jnp.where(clab < cbig, (row0 + 2 * ci) * w + 2 * cj + 1, big)
    seed = jnp.repeat(jnp.repeat(mapped, 2, axis=0), 2, axis=1)
    return jnp.where(mask, jnp.minimum(idx, seed), big)


def _local_seed_coarse(mask, big):
    """Local-id CC used only for seeding: recursive coarsening + 4-sweep
    fixed point (no jumps needed — seeds keep iteration counts small, and
    the caller's fine loop has the jump backstop)."""
    h, w = mask.shape
    idx = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w) + 1)
    if h % 2 == 0 and w % 2 == 0 and min(h, w) >= 64:
        cm = mask.reshape(h // 2, 2, w // 2, 2).all(axis=(1, 3))
        cbig = jnp.int32(cm.shape[0] * cm.shape[1] + 2)
        clab = _local_seed_coarse(cm, cbig)
        ci = (clab - 1) // (w // 2)
        cj = (clab - 1) % (w // 2)
        mapped = jnp.where(clab < cbig, (2 * ci) * w + 2 * cj + 1, big)
        seed = jnp.repeat(jnp.repeat(mapped, 2, axis=0), 2, axis=1)
        lab = jnp.where(mask, jnp.minimum(idx, seed), big)
    else:
        lab = jnp.where(mask, idx, big)

    def cond(state):
        return state[1]

    def body(state):
        lab, _ = state
        new = lab
        for _ in range(4):
            new = jnp.where(mask, jnp.minimum(new, L._neighbor_min(new, big)),
                            big)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(cond, body, (lab, jnp.any(mask) | True))
    return lab


def _local_pass(lab, mask, big, row0, w):
    """Local fixed-point: shift sweeps + periodic pointer jumping inside the
    strip (same cadence as the single-device kernel: 4 cheap sweeps per
    iteration, a jump pair every 16th as the worst-case backstop). Labels
    are global ids; pointer jumping uses local gather on ids that fall
    inside this strip (others pass through unchanged)."""
    h_local = lab.shape[0]
    idx_local = (row0 * w
                 + jnp.arange(h_local * w, dtype=jnp.int32).reshape(h_local, w)
                 + 1)

    def jump(lab):
        flat = jnp.where(mask, lab, idx_local).reshape(-1)
        target = flat - 1 - row0 * w
        in_strip = (target >= 0) & (target < h_local * w)
        safe = jnp.clip(target, 0, h_local * w - 1)
        jumped = jnp.where(in_strip.reshape(lab.shape),
                           flat[safe].reshape(lab.shape), lab)
        return jnp.where(mask, jnp.minimum(lab, jumped), big)

    def cond(state):
        lab, changed, it = state
        return changed

    # iteration strategy is platform-static (trace-time choice): on TPU
    # the segmented run-min scans (pallas_cc.run_min_axis — labels cross
    # whole straight runs per iteration, O(geodesic turns) convergence)
    # win like they do in the single-device kernels; on CPU the log2
    # shifted chains cost more than they save per iteration (the 8-dev
    # CPU-mesh dryrun regressed 110 -> 170 s) so the multigrid-seeded
    # sweep cadence stays. Both reach the same fixed point.
    use_scans = jax.default_backend() == "tpu"

    def body(state):
        lab, _, it = state
        if use_scans:
            new = run_min_axis(lab, mask, big, 1)
            new = run_min_axis(new, mask, big, 0)
        else:
            new = lab
            for _ in range(4):
                new = jnp.where(mask,
                                jnp.minimum(new, L._neighbor_min(new, big)),
                                big)
        new = jax.lax.cond(it % 16 == 15, lambda x: jump(jump(x)),
                           lambda x: x, new)
        return new, jnp.any(new != lab), it + 1

    # initial flag must carry the shard_map varying-axis type of the body's
    # output (data-dependent); `any(mask) | True` is a varying constant True
    lab, _, _ = jax.lax.while_loop(cond, body, (lab, jnp.any(mask) | True,
                                                jnp.int32(0)))
    return lab


def _sharded_cc_kernel(mask, axis=AXIS):
    """shard_map body: mask (h_local, W) bool on each device."""
    d = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    h_local, w = mask.shape
    big = jnp.int32(0x7FFFFFF0)
    row0 = d * h_local
    lab = _local_seed(mask, row0, w, big)

    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def outer_cond(state):
        lab, changed = state
        return changed

    def outer_body(state):
        lab, _ = state
        lab = _local_pass(lab, mask, big, row0, w)
        # halo exchange: my last row -> next device's "above" halo;
        # my first row -> previous device's "below" halo
        above = jax.lax.ppermute(lab[-1], axis, fwd)   # row from d-1
        below = jax.lax.ppermute(lab[0], axis, bwd)    # row from d+1
        above = jnp.where(d == 0, big, above)
        below = jnp.where(d == n_dev - 1, big, below)
        top = jnp.where(mask[0], jnp.minimum(lab[0], above), big)
        bot = jnp.where(mask[-1], jnp.minimum(lab[-1], below), big)
        new = lab.at[0].set(top).at[-1].set(bot)
        local_changed = jnp.any(new != lab)
        changed = jax.lax.psum(local_changed.astype(jnp.int32), axis) > 0
        return new, changed

    # psum makes the outer flag replicated (unvarying), so plain True here
    lab, _ = jax.lax.while_loop(outer_cond, outer_body,
                                (lab, jnp.bool_(True)))
    return jnp.where(mask, lab, 0)


def _propagate_sharded(lab, allowed, big, d, n_dev, axis=AXIS):
    """Min-label propagation through ``allowed`` pixels to a GLOBAL fixed
    point: local sweeps + ppermute halo rows until psum says done."""
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def local_sweeps(lab):
        def cond(state):
            lab, changed = state
            return changed

        def body(state):
            lab, _ = state
            # watershed rule: only UNLABELED allowed pixels adopt the min
            # labeled neighbor; labeled pixels are never overwritten
            cand = L._neighbor_min(lab, big)
            new = jnp.where(allowed & (lab == big), cand, lab)
            return new, jnp.any(new != lab)

        lab, _ = jax.lax.while_loop(cond, body,
                                    (lab, jnp.any(allowed) | True))
        return lab

    def outer_cond(state):
        lab, changed = state
        return changed

    def outer_body(state):
        lab, _ = state
        lab = local_sweeps(lab)
        above = jax.lax.ppermute(lab[-1], axis, [(i, (i + 1) % n_dev)
                                                 for i in range(n_dev)])
        below = jax.lax.ppermute(lab[0], axis, [(i, (i - 1) % n_dev)
                                                for i in range(n_dev)])
        above = jnp.where(d == 0, big, above)
        below = jnp.where(d == n_dev - 1, big, below)
        top = jnp.where(allowed[0] & (lab[0] == big),
                        jnp.minimum(lab[0], above), lab[0])
        bot = jnp.where(allowed[-1] & (lab[-1] == big),
                        jnp.minimum(lab[-1], below), lab[-1])
        new = lab.at[0].set(top).at[-1].set(bot)
        changed = jax.lax.psum(jnp.any(new != lab).astype(jnp.int32),
                               axis) > 0
        return new, changed

    lab, _ = jax.lax.while_loop(outer_cond, outer_body,
                                (lab, jnp.bool_(True)))
    return lab


def _sharded_watershed_kernel(image, markers, mask, n_levels, axis=AXIS):
    d = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    big = jnp.int32(0x7FFFFFF0)
    mask = mask.astype(bool)
    lab = jnp.where(mask & (markers > 0), markers.astype(jnp.int32), big)

    img = jnp.where(mask, image, jnp.inf)
    lo = jax.lax.pmin(jnp.min(jnp.where(mask, image, jnp.inf)), axis)
    hi = jax.lax.pmax(jnp.max(jnp.where(mask, image, -jnp.inf)), axis)
    span = jnp.maximum(hi - lo, 1e-6)
    level_of = jnp.clip(((img - lo) / span * (n_levels - 1)).astype(jnp.int32),
                        0, n_levels - 1)

    def level_body(level, lab):
        allowed = mask & (level_of <= level)
        return _propagate_sharded(lab, allowed, big, d, n_dev, axis)

    lab = jax.lax.fori_loop(0, n_levels, level_body, lab)
    return jnp.where(mask & (lab != big), lab, 0)


def watershed_sharded(image: np.ndarray, markers: np.ndarray,
                      mask: np.ndarray, mesh: Mesh,
                      n_levels: int = 64) -> np.ndarray:
    """Marker watershed on a row-sharded canvas: level-ordered flooding with
    halo-row exchange per propagation round. Matches ops/lax_postproc.
    watershed semantics (same level bucketing) across any mesh size.

    Divergence (documented in PARITY.md): within a level, claims are
    permanent and local sweeps run to a LOCAL fixed point between halo
    exchanges, so the BFS front crosses strip boundaries later than it
    travels inside a strip — plateau TIES at strip boundaries can resolve
    to the other basin vs the single-device kernel (measured 25 of 331k px
    on a 288x1152 canvas, instance id sets identical). The same tie-break
    caveat already applies between the single-device kernel and
    priority-flood (lax_postproc.watershed docstring). CC propagation is
    immune: min-label claims are overwritable, so its fixed point is
    order-independent and connected_components_sharded stays bit-identical.
    A lockstep variant (one sweep per exchange) would be bit-identical but
    costs ~basin-diameter collectives per level — rejected for the same
    dispatch-cost reason as the blocked-strip watershed (CLAUDE.md)."""
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    h, w = image.shape
    assert h % n_dev == 0, f"H={h} must divide by mesh size {n_dev}"
    sharding = NamedSharding(mesh, P(axis, None))
    fn = jax.jit(
        jax.shard_map(partial(_sharded_watershed_kernel, n_levels=n_levels,
                              axis=axis),
                      mesh=mesh, in_specs=P(axis, None),
                      out_specs=P(axis, None)))
    args = [jax.device_put(np.asarray(a), sharding)
            for a in (image.astype(np.float32), markers.astype(np.int32),
                      np.asarray(mask, bool))]
    return np.asarray(fn(*args))


def connected_components_sharded(mask: np.ndarray, mesh: Mesh) -> np.ndarray:
    """4-connected labeling of a row-sharded canvas over ``mesh`` (1-D).

    H must divide evenly by the mesh size; ids match the single-device
    kernel (global min flattened index + 1)."""
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    h, w = mask.shape
    assert h % n_dev == 0, f"H={h} must divide by mesh size {n_dev}"

    sharding = NamedSharding(mesh, P(axis, None))
    fn = jax.jit(
        jax.shard_map(partial(_sharded_cc_kernel, axis=axis), mesh=mesh,
                      in_specs=P(axis, None), out_specs=P(axis, None)))
    mask_dev = jax.device_put(np.asarray(mask, bool), sharding)
    return np.asarray(fn(mask_dev))


# ---------------------------------------------------------------------------
# production compositions (the tpu_postproc families with their CC/watershed
# cores row-sharded over a mesh) — wired into infer/wsi.py when the manager
# holds a mesh and postproc_backend='tpu' (SURVEY.md §2.9 SP row)
# ---------------------------------------------------------------------------

def _pad_rows(arr: np.ndarray, n_dev: int):
    """Zero-pad rows to a mesh multiple (zeros are background)."""
    h = arr.shape[0]
    ph = -(-h // n_dev) * n_dev
    if ph == h:
        return arr, h
    pad = [(0, ph - h)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(np.asarray(arr), pad), h


def sharded_nuclei_watershed(inner_raw, cnt_raw, mesh: Mesh) -> np.ndarray:
    """ops/tpu_postproc._nuclei_watershed with the heavy cores (three CC
    labelings + the watershed flood) row-sharded over ``mesh`` via ppermute
    halos. Mask/marker prep (erode, small-object removal, hole fill) are
    single-program jit — they are one conv / one segment-sum each."""
    inner, h = _pad_rows(np.asarray(inner_raw, np.float32), mesh.devices.size)
    cnt, _ = _pad_rows(np.asarray(cnt_raw, np.float32), mesh.devices.size)

    se3 = L.disk_kernel(3)
    msk = np.asarray(L.binary_erode(jnp.asarray((inner + cnt) > 0.5), se3))
    msk_lab = connected_components_sharded(msk, mesh)
    msk = np.asarray(L.remove_small_objects(jnp.asarray(msk_lab), 8)) > 0

    mrk_lab = connected_components_sharded(inner > 0.5, mesh)
    mrk_lab = L.remove_small_objects(jnp.asarray(mrk_lab), 4)
    mrk = np.asarray(L.fill_holes(mrk_lab > 0))
    markers = connected_components_sharded(mrk, mesh)

    lab = watershed_sharded(-inner, markers, msk, mesh)
    return lab[:h]


def sharded_contour_instances(inner_raw, cnt_raw, thresh: float,
                              min_size: int, ksize: int,
                              mesh: Mesh) -> np.ndarray:
    """ops/tpu_postproc._inner_contour_instances (gland/lumen family) with
    the CC core row-sharded; regrowth (label max-dilation + hole fill) runs
    as one jit program."""
    inner, h = _pad_rows(np.asarray(inner_raw, np.float32), mesh.devices.size)
    cnt, _ = _pad_rows(np.asarray(cnt_raw, np.float32), mesh.devices.size)
    fg = (inner - (cnt > 0.5)) > thresh
    lab = connected_components_sharded(fg, mesh)

    @partial(jax.jit, static_argnames=("min_size", "ksize"))
    def regrow(lab, min_size, ksize):
        lab = L.remove_small_objects(lab, min_size)
        lab = L.dilate_labels(lab, ksize)
        return L.fill_label_holes(lab)

    return np.asarray(regrow(jnp.asarray(lab), min_size, ksize))[:h]


def sharded_eroded_instances(fg_raw, thresh: float, min_size: int,
                             ksize: int, mesh: Mesh) -> np.ndarray:
    """ops/tpu_postproc._eroded_map_instances with the CC core sharded."""
    fg, h = _pad_rows(np.asarray(fg_raw, np.float32), mesh.devices.size)
    lab = connected_components_sharded(fg > thresh, mesh)

    @partial(jax.jit, static_argnames=("min_size", "ksize"))
    def regrow(lab, min_size, ksize):
        lab = L.remove_small_objects(lab, min_size)
        lab = L.dilate_labels(lab, ksize)
        return L.fill_label_holes(lab)

    return np.asarray(regrow(jnp.asarray(lab), min_size, ksize))[:h]
