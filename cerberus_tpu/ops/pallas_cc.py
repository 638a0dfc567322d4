"""Pallas TPU kernel: VMEM-resident connected-component labeling.

The lax implementation (ops/lax_postproc.connected_components) runs one XLA
while_loop iteration per propagation sweep; each sweep is a separate fused
kernel whose label map round-trips HBM. A 448^2 int32 label map is ~800 KB —
it fits comfortably in VMEM (~16 MB/core), so this kernel keeps the whole
fixed-point loop on-chip: load the mask once, iterate min-label propagation
entirely in vector registers/VMEM, store the result once.

Semantics identical to the lax/scipy versions: 4-connectivity, component id
= min flattened index + 1, background 0. Shapes are padded to (8, 128)
tiles; the padded border is treated as background.

Falls back to the lax implementation on backends without Mosaic (tests run
the kernel in interpreter mode on CPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lax_postproc


def _shift_fwd(x, d: int, axis: int, fill):
    """result[j] = x[j - d] along ``axis`` (leading edge <- fill). Static
    slice + concat — the only shift form Mosaic's TC lowering handles for
    every distance; everything stays 2-D."""
    if axis == 1:
        pad = jnp.full((x.shape[0], d), fill, x.dtype)
        return jnp.concatenate([pad, x[:, :-d]], 1)
    pad = jnp.full((d, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([pad, x[:-d]], 0)


def _shift_bwd(x, d: int, axis: int, fill):
    """result[j] = x[j + d] along ``axis`` (trailing edge <- fill)."""
    if axis == 1:
        pad = jnp.full((x.shape[0], d), fill, x.dtype)
        return jnp.concatenate([x[:, d:], pad], 1)
    pad = jnp.full((d, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([x[d:], pad], 0)


def run_min_axis(lab, mask, big, axis: int):
    """Min over each pixel's maximal foreground RUN along ``axis`` in
    O(log n) shifted ops (segmented Hillis-Steele prefix-min, forward +
    backward, combined).

    This is the convergence engine of the CC kernels: a label crosses an
    entire straight run in ONE application instead of one pixel per
    neighbor-min sweep, so the fixed-point iteration count drops from
    O(component diameter) to O(geodesic turns). Axis-adjacent foreground
    pixels are by definition run-connected, so iterating both axes to a
    fixed point reaches exactly the 4-connected neighbor-min fixed point.
    Invariant per doubling step d: f[j] = min over the last min(d, run
    prefix) labels; ok[j] = positions j-d..j all foreground.
    """
    n = lab.shape[axis]
    # connectivity planes ride int32: Mosaic's TC lowering rejects shifted
    # i1 vectors ("Invalid vector register cast"), and min() doubles as AND
    # on {0, 1}
    m = mask.astype(jnp.int32)
    f = lab
    okf = jnp.minimum(_shift_fwd(m, 1, axis, 0), m)
    d = 1
    while d < n:
        f = jnp.minimum(f, jnp.where(okf > 0,
                                     _shift_fwd(f, d, axis, big), big))
        okf = jnp.minimum(okf, _shift_fwd(okf, d, axis, 0))
        d *= 2
    b = lab
    okb = jnp.minimum(_shift_bwd(m, 1, axis, 0), m)
    d = 1
    while d < n:
        b = jnp.minimum(b, jnp.where(okb > 0,
                                     _shift_bwd(b, d, axis, big), big))
        okb = jnp.minimum(okb, _shift_bwd(okb, d, axis, 0))
        d *= 2
    return jnp.minimum(f, b)


def _cc_kernel(mask_ref, out_ref):
    mask = mask_ref[:] != 0
    h, w = mask.shape
    big = jnp.int32(h * w + 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lab0 = jnp.where(mask, row * w + col + 1, big)

    def cond(state):
        _lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        # one horizontal + one vertical run-min per test: labels cross
        # whole straight runs per application (run_min_axis docstring)
        new = run_min_axis(lab, mask, big, 1)
        new = run_min_axis(new, mask, big, 0)
        return (new, jnp.any(new != lab))

    lab, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True)))
    out_ref[:] = jnp.where(mask, lab, 0)


def _pad_to_tile(x, tile=(8, 128)):
    h, w = x.shape
    ph = (-h) % tile[0]
    pw = (-w) % tile[1]
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)))
    return x, (h, w)


def cc_pallas(mask: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Traceable (un-jitted) pallas CC — usable inside larger jitted
    programs (ops/tpu_postproc families)."""
    mask_i = mask.astype(jnp.int32)
    mask_p, (h, w) = _pad_to_tile(mask_i)
    out = pl.pallas_call(
        _cc_kernel,
        out_shape=jax.ShapeDtypeStruct(mask_p.shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        interpret=interpret,
    )(mask_p)
    out = out[:h, :w]
    # remap padded-grid ids to the unpadded flattened-index id space used by
    # the lax/scipy implementations (id = min index + 1 in the ORIGINAL grid)
    wp = mask_p.shape[1]
    nz = out > 0
    r = (out - 1) // wp
    c = (out - 1) % wp
    return jnp.where(nz, r * w + c + 1, 0)


@partial(jax.jit, static_argnames=("interpret",))
def connected_components_pallas(mask: jnp.ndarray,
                                interpret: bool = False) -> jnp.ndarray:
    """4-connected labeling, whole fixed-point loop in one pallas_call."""
    return cc_pallas(mask, interpret)


def connected_components(mask, prefer_pallas: bool = None):
    """Pallas kernel when enabled, lax fallback otherwise.

    Measured on v5e: 50 ms vs 206 ms for the lax while_loop at 448^2 dense
    noise (4.1x) with identical labels; first Mosaic compile is ~minutes on
    the tunneled dev chip but lands in the persistent compilation cache.
    Default ON for TPU backends; ``CERBERUS_PALLAS=0`` is the kill switch."""
    import os

    if prefer_pallas is None:
        env = os.environ.get("CERBERUS_PALLAS", "")
        if env == "0":
            prefer_pallas = False
        elif env:
            prefer_pallas = True
        else:
            prefer_pallas = jax.default_backend() == "tpu"
    if prefer_pallas:
        backend = jax.default_backend()
        try:
            return connected_components_pallas(mask,
                                               interpret=backend == "cpu")
        except Exception:
            pass
    return lax_postproc.connected_components(mask)
