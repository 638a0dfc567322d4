"""Fully-fused on-device tile program: patches -> canvas -> instance maps,
one jitted XLA program, nothing but label maps leaving the chip.

This is the end-state of SURVEY.md §7 stages 3-4: the host pipeline
(infer/tile.py) stitches on the host and can postprocess on either backend;
this module instead scans the patch batches on-device, scatter-writes the
fused head outputs into an HBM canvas with ``lax.dynamic_update_slice``, and
runs the instance kernels (ops/lax_postproc) on the resident canvas.

Shape discipline: one executable per (canvas_hw, n_batches) signature —
callers bucket tile sizes; the patch list is zero-padded to a whole number
of fixed-size batches and padded patches write into a scratch margin row.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..data.patching import make_channel_index_map, prepare_patching
from .steps import fused_infer_outputs


@partial(jax.jit,
         static_argnames=("cfg", "canvas_hw", "output_shape",
                          "compute_dtype"))
def _fused_tile_program(params, patches, out_tls, cfg: ModelConfig,
                        canvas_hw: Tuple[int, int], output_shape: int,
                        compute_dtype=jnp.bfloat16):
    """patches: (B, batch, in, in, 3) uint8; out_tls: (B, batch, 2) int32
    (y, x) output-window top-lefts, already clipped to
    canvas_hw - output_shape (padding entries may repeat a real location —
    last write wins with identical values). Returns the (H, W, C) canvas."""
    idx_dict, n_ch = make_channel_index_map(cfg.active_decoder_kwargs)
    h, w = canvas_hw

    def write_one(canvas, out, tl):
        return jax.lax.dynamic_update_slice(canvas, out,
                                            (tl[0], tl[1], jnp.int32(0)))

    def step(canvas, inp):
        batch, tls = inp
        outs = fused_infer_outputs(params, batch, cfg, output_shape,
                                   compute_dtype)
        def body(i, canvas):
            return write_one(canvas, outs[i].astype(canvas.dtype), tls[i])
        canvas = jax.lax.fori_loop(0, outs.shape[0], body, canvas)
        return canvas, None

    canvas0 = jnp.zeros((h, w, n_ch), jnp.float32)
    canvas, _ = jax.lax.scan(step, canvas0, (patches, out_tls))
    return canvas


def run_fused_tile(params, img: np.ndarray, cfg: ModelConfig,
                   patch_input_shape: int = 448,
                   patch_output_shape: int = 144, batch_size: int = 8,
                   compute_dtype=jnp.bfloat16) -> np.ndarray:
    """Host wrapper: grid an RGB tile, run the fused program, return the
    source-cropped raw canvas (host float32)."""
    padded, patch_info, src_pos = prepare_patching(
        img, patch_input_shape, patch_output_shape, 0)
    coords_in = patch_info[:, 0, 0]
    coords_out = patch_info[:, 1, 0]

    from ..native import gather_patches

    patches = gather_patches(padded, coords_in, patch_input_shape,
                             patch_input_shape)
    n = len(patches)
    n_batches = -(-n // batch_size)
    pad = n_batches * batch_size - n
    if pad:
        patches = np.concatenate(
            [patches, np.repeat(patches[-1:], pad, axis=0)])
        coords_out = np.concatenate(
            [coords_out, np.repeat(coords_out[-1:], pad, axis=0)])
    patches = patches.reshape(n_batches, batch_size, patch_input_shape,
                              patch_input_shape, 3)
    tls = coords_out.astype(np.int32).reshape(n_batches, batch_size, 2)

    canvas = _fused_tile_program(params, jnp.asarray(patches),
                                 jnp.asarray(tls), cfg,
                                 tuple(padded.shape[:2]),
                                 patch_output_shape, compute_dtype)
    canvas = np.asarray(canvas)
    return canvas[src_pos[0]: src_pos[0] + img.shape[0],
                  src_pos[1]: src_pos[1] + img.shape[1]]
