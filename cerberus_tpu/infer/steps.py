"""The jitted inference kernel: forward + per-head activation + crop, fused
into one XLA program that emits a single stitched-canvas-ready tensor.

Behavioral spec is the reference ``infer_step`` (``models/run_desc.py:439-502``):
  * INST heads -> softmax over channels, keep foreground classes (drop ch 0);
  * TYPE heads -> softmax then argmax (1 channel);
  * Patch-Class -> argmax of softmax, nearest-upsampled to the output shape
    (i.e. a constant map of the class id);
  * non-classifier heads center-cropped from 448^2 to the 144^2 output window.

Where the reference returns a python list of per-head numpy dicts, we return
ONE (N, out, out, C_total) array laid out by the canvas channel-index map
(``data/patching.make_channel_index_map``) — the exact layout the stitcher
consumes — so a batch leaves the chip as a single contiguous D2H transfer.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..data.patching import make_channel_index_map
from ..models.layers import center_crop
from ..models.net_desc import net_forward

# head order used when re-splitting the fused canvas tensor per head
HEAD_NAME_MAP = {
    "Gland": "Gland-INST",
    "Gland#TYPE": "Gland-TYPE",
    "Lumen": "Lumen-INST",
    "Nuclei": "Nuclei-INST",
    "Nuclei#TYPE": "Nuclei-TYPE",
    "Patch-Class": "Patch-Class",
}


def fused_infer_outputs(params, imgs, cfg: ModelConfig, output_shape: int,
                        compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Forward + activations + crop -> (N, output_shape, output_shape, C)."""
    pred_dict = net_forward(params, imgs, cfg, compute_dtype=compute_dtype)
    idx_dict, _n_ch = make_channel_index_map(cfg.decoder_kwargs)

    chunks = []
    for head_code, _slc in idx_dict.items():
        out = pred_dict[head_code].astype(jnp.float32)
        if head_code == "Patch-Class":
            cls = jnp.argmax(jax.nn.softmax(out, axis=-1), axis=-1)  # (N,1,1)
            chunk = jnp.broadcast_to(
                cls[:, :, :, None].astype(jnp.float32),
                (out.shape[0], output_shape, output_shape, 1),
            )
        elif head_code.endswith("-INST"):
            prob = jax.nn.softmax(out, axis=-1)[..., 1:]
            chunk = center_crop(prob, output_shape, output_shape)
        else:  # TYPE: softmax -> argmax
            cls = jnp.argmax(jax.nn.softmax(out, axis=-1), axis=-1)
            chunk = center_crop(cls[..., None].astype(jnp.float32),
                                output_shape, output_shape)
        chunks.append(chunk)
    return jnp.concatenate(chunks, axis=-1)


def make_infer_step(params, cfg: ModelConfig, output_shape: int = 144,
                    compute_dtype=jnp.bfloat16, donate: bool = False):
    """Build the jitted step: uint8 NHWC batch -> (N, out, out, C) float32.

    One compiled program per batch shape; callers pad the final partial batch
    to a fixed size (shape discipline: SURVEY.md §7 hard-part 5).
    """

    @partial(jax.jit, static_argnames=())
    def step(p, imgs):
        return fused_infer_outputs(p, imgs, cfg, output_shape, compute_dtype)

    return lambda imgs: step(params, imgs)


def split_canvas_channels(canvas, decoder_kwargs) -> Dict[str, jnp.ndarray]:
    """Re-split a stitched canvas (or fused step output) per head code."""
    idx_dict, _ = make_channel_index_map(decoder_kwargs)
    return {code: canvas[..., s:e] for code, (s, e) in idx_dict.items()}
