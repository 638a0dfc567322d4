"""Pallas TPU kernel: blocked connected-component labeling for canvases
bigger than VMEM (the 4096^2 WSI postproc tiles).

The VMEM-resident kernel (ops/pallas_cc.py) needs the whole label plane
on-chip and is capped at ~1M px. The lax fixed point
(ops/lax_postproc.connected_components) handles any size but pays one HBM
round trip of the label plane per fused sweep group. This kernel gets the
best of both: the canvas is processed in row strips that DO fit VMEM, and a
carry row in persistent scratch threads label information across strips, so
one top-to-bottom grid pass propagates labels arbitrarily far DOWN the
canvas (and the mirrored pass, up) while each strip converges to its local
fixed point entirely in VMEM. Passes alternate until no down+up pair
changes anything (accumulated in an SMEM flag) — blob-like masks need 2-4
pairs, i.e. a handful of HBM round trips total instead of one per sweep.

Semantics identical to lax/scipy: 4-connectivity, id = min flattened index
(+1) in the ORIGINAL (unpadded) grid, background 0. (No-change over a full
down+up pair implies a global fixed point: within-strip neighbors are
covered by the strip's local fixed point, down-neighbors by the carry row
of the up pass, up-neighbors by the carry row of the down pass.)

Reference behavior pinned by ops/postproc.py (scipy oracle); selected by
ops/tpu_postproc._cc for canvases above the VMEM cap when Pallas is enabled
(CERBERUS_PALLAS), with the lax path as fallback.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_cc import run_min_axis


def _strip_rows(w: int) -> int:
    """Strip height targeting ~0.5 MB per (rows, w) i32 plane: the run-min
    scan body keeps ~16 strip-sized live buffers (3 refs + forward/backward
    value+connectivity planes + shifted temps) against the 16 MB scoped
    VMEM cap — 1 MB strips OOMed the Mosaic compiler by 740 KB at
    w=2048."""
    rows = (1 << 19) // (w * 4)
    return max(8, min(512, rows - rows % 8))


def _strip_kernel(mask_ref, lab_in_ref, lab_out_ref, changed_ref, carry_ref,
                  *, direction: int):
    """One strip: local fixed point with a carry halo row.

    direction 0 = top-to-bottom pass (carry holds the bottom row of the
    strip above); 1 = bottom-to-top (grid order reversed by the index_map,
    carry holds the top row of the strip below).
    """
    i = pl.program_id(0)
    mask = mask_ref[:] != 0
    s, w = mask.shape
    big = jnp.int32(jnp.iinfo(jnp.int32).max // 2)
    lab_in = jnp.where(mask, lab_in_ref[:], big)

    @pl.when(i == 0)
    def _init():
        changed_ref[0, 0] = 0
        carry_ref[:] = jnp.full((1, w), big, jnp.int32)

    # all values stay 2-D: Mosaic's TC lowering has no 1-D vector path
    carry = carry_ref[:]
    no_halo = jnp.full((1, w), big, jnp.int32)
    top_halo = carry if direction == 0 else no_halo
    bot_halo = no_halo if direction == 0 else carry

    def neighbor_min(lab):
        up = jnp.concatenate([top_halo, lab[:-1]], 0)
        down = jnp.concatenate([lab[1:], bot_halo], 0)
        left = jnp.concatenate([jnp.full((s, 1), big, jnp.int32),
                                lab[:, :-1]], 1)
        right = jnp.concatenate([lab[:, 1:],
                                 jnp.full((s, 1), big, jnp.int32)], 1)
        return jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))

    def cond(state):
        return state[1]

    def body(state):
        lab, _ = state
        # the neighbor-min sweep ingests the carry halo; the run-min scans
        # (pallas_cc.run_min_axis) then cross whole straight runs per
        # application, so the strip fixed point converges in O(geodesic
        # turns) iterations instead of O(strip diameter) sweeps
        new = jnp.where(mask, jnp.minimum(lab, neighbor_min(lab)), big)
        new = run_min_axis(new, mask, big, 1)
        new = run_min_axis(new, mask, big, 0)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(cond, body, (lab_in, jnp.bool_(True)))

    changed_ref[0, 0] |= jnp.any(lab != lab_in).astype(jnp.int32)
    lab_out_ref[:] = lab
    # carry this strip's trailing edge to the next grid step
    carry_ref[:] = lab[-1:] if direction == 0 else lab[:1]


def _one_pass(mask_p, lab, direction: int, n_strips: int, w: int,
              interpret: bool):
    """One full sweep over the canvas (0 = down, 1 = up)."""
    s = mask_p.shape[0] // n_strips

    if direction == 0:
        idx = lambda i: (i, 0)
    else:
        idx = lambda i: (n_strips - 1 - i, 0)

    lab_out, changed = pl.pallas_call(
        partial(_strip_kernel, direction=direction),
        grid=(n_strips,),
        in_specs=[pl.BlockSpec((s, w), idx), pl.BlockSpec((s, w), idx)],
        out_specs=[pl.BlockSpec((s, w), idx),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(mask_p.shape, jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((1, w), jnp.int32)],
        # write labels back into the input buffer: halves the HBM traffic
        # allocation per pass and lets XLA chain passes without copies
        # (safe: each grid step reads only its own block; the cross-strip
        # carry travels through VMEM scratch, never through the buffer)
        input_output_aliases={1: 0},
        interpret=interpret,
    )(mask_p, lab)
    return lab_out, changed[0, 0] > 0


def cc_pallas_blocked(mask: jnp.ndarray, interpret: bool = False
                      ) -> jnp.ndarray:
    """Traceable blocked CC (usable inside larger jitted programs)."""
    h, w = mask.shape
    mask_i = mask.astype(jnp.int32)
    pw = (-w) % 128
    strip = _strip_rows(w + pw)
    ph = (-h) % strip
    if ph or pw:
        mask_i = jnp.pad(mask_i, ((0, ph), (0, pw)))
    hp, wp = mask_i.shape
    n_strips = hp // strip

    big = jnp.int32(jnp.iinfo(jnp.int32).max // 2)
    idx = (jnp.arange(hp * wp, dtype=jnp.int32).reshape(hp, wp) + 1)
    lab0 = jnp.where(mask_i != 0, idx, big)

    def pair(lab):
        lab, _ch_down = _one_pass(mask_i, lab, 0, n_strips, wp, interpret)
        lab, ch_up = _one_pass(mask_i, lab, 1, n_strips, wp, interpret)
        # convergence needs only the UP half to be quiet: the down pass
        # leaves every strip at a local fixpoint given its TOP neighbor's
        # final state (strips processed top->bottom, carries final); if the
        # up pass then changes nothing, each strip is also at a fixpoint
        # given its BOTTOM neighbor's current state, and no state moved
        # since the down pass — a global fixpoint. The first pair's
        # ch_down is always True (seeding), so gating on it costs one
        # full extra verify pair on every strip-local canvas (the typical
        # blob case: 4 passes where 2 suffice — measured in BASELINE.md).
        return lab, ch_up

    def cond(state):
        return state[1]

    def body(state):
        lab, _ = state
        return pair(lab)

    lab, changed = pair(lab0)
    lab, _ = jax.lax.while_loop(cond, body, (lab, changed))

    lab = jnp.where(lab == big, 0, lab)[:h, :w]
    # remap padded-grid ids to the unpadded flattened-index space
    nz = lab > 0
    r = (lab - 1) // wp
    c = (lab - 1) % wp
    return jnp.where(nz, r * w + c + 1, 0)


@partial(jax.jit, static_argnames=("interpret",))
def connected_components_pallas_blocked(mask: jnp.ndarray,
                                        interpret: bool = False
                                        ) -> jnp.ndarray:
    return cc_pallas_blocked(mask, interpret)
