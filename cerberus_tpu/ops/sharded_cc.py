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

AXIS = "rows"


def _local_pass(lab, mask, big, row0, w):
    """Local fixed-point: neighbor-min + pointer jumping inside the strip.
    Labels are global ids; pointer jumping uses local gather on ids that
    fall inside this strip (others pass through unchanged)."""
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
        lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        new = jnp.where(mask, jnp.minimum(lab, L._neighbor_min(lab, big)), big)
        new = jump(jump(new))
        return new, jnp.any(new != lab)

    # initial flag must carry the shard_map varying-axis type of the body's
    # output (data-dependent); `any(mask) | True` is a varying constant True
    lab, _ = jax.lax.while_loop(cond, body, (lab, jnp.any(mask) | True))
    return lab


def _sharded_cc_kernel(mask):
    """shard_map body: mask (h_local, W) bool on each device."""
    d = jax.lax.axis_index(AXIS)
    n_dev = jax.lax.axis_size(AXIS)
    h_local, w = mask.shape
    big = jnp.int32(0x7FFFFFF0)
    row0 = d * h_local
    idx = (row0 * w
           + jnp.arange(h_local * w, dtype=jnp.int32).reshape(h_local, w) + 1)
    lab = jnp.where(mask, idx, big)

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
        above = jax.lax.ppermute(lab[-1], AXIS, fwd)   # row from d-1
        below = jax.lax.ppermute(lab[0], AXIS, bwd)    # row from d+1
        above = jnp.where(d == 0, big, above)
        below = jnp.where(d == n_dev - 1, big, below)
        top = jnp.where(mask[0], jnp.minimum(lab[0], above), big)
        bot = jnp.where(mask[-1], jnp.minimum(lab[-1], below), big)
        new = lab.at[0].set(top).at[-1].set(bot)
        local_changed = jnp.any(new != lab)
        changed = jax.lax.psum(local_changed.astype(jnp.int32), AXIS) > 0
        return new, changed

    # psum makes the outer flag replicated (unvarying), so plain True here
    lab, _ = jax.lax.while_loop(outer_cond, outer_body,
                                (lab, jnp.bool_(True)))
    return jnp.where(mask, lab, 0)


def connected_components_sharded(mask: np.ndarray, mesh: Mesh) -> np.ndarray:
    """4-connected labeling of a row-sharded canvas over ``mesh`` (1-D).

    H must divide evenly by the mesh size; ids match the single-device
    kernel (global min flattened index + 1)."""
    n_dev = mesh.devices.size
    h, w = mask.shape
    assert h % n_dev == 0, f"H={h} must divide by mesh size {n_dev}"

    sharding = NamedSharding(mesh, P(AXIS, None))
    fn = jax.jit(
        jax.shard_map(_sharded_cc_kernel, mesh=mesh,
                      in_specs=P(AXIS, None), out_specs=P(AXIS, None)))
    mask_dev = jax.device_put(np.asarray(mask, bool), sharding)
    return np.asarray(fn(mask_dev))
