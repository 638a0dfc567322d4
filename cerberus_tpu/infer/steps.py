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


def _default_backend_is_tpu() -> bool:
    """Where computation actually runs — a pinned jax_default_device (tests
    pin CPU while the axon TPU plugin stays the default backend) wins over
    the backend name (same contract as ops/tpu_postproc._cc_impl)."""
    default_device = jax.config.jax_default_device
    platform = (default_device.platform if default_device is not None
                else jax.default_backend())
    return platform == "tpu"

# NB: the reference remaps decoder names to head codes inside infer_step
# (models/run_desc.py:466-473, Gland -> Gland-INST etc.); here net_forward
# already emits head codes, so no remap table is needed.


def model_head_outputs(params, imgs, cfg: ModelConfig,
                       compute_dtype=jnp.bfloat16, fused=None,
                       head_specs=None,
                       pclass_cells: int = 1) -> Dict[str, jnp.ndarray]:
    """Forward through encoder + decoder bank (+ classifier).

    With ``fused``/``head_specs`` given (models/fused_decoder.py), the five
    segmentation towers run as one grouped-conv bank; otherwise the
    sequential reference-shaped path runs. Outputs are identical.
    ``pclass_cells > 1``: dense-window per-144² Patch-Class grid."""
    if fused is None:
        return net_forward(params, imgs, cfg, compute_dtype=compute_dtype,
                           pclass_cells=pclass_cells)
    from ..models.backbones import get_backbone
    from ..models.fused_decoder import fused_decoder_forward
    from ..models.layers import conv2d
    from ..models.net_desc import pclass_for_cells

    _, backbone_fwd, _ = get_backbone(cfg.encoder_backbone_name)
    x = imgs.astype(compute_dtype) / jnp.asarray(255.0, compute_dtype)
    feat_list = backbone_fwd(params, x, "backbone", None)
    bottom = feat_list[-1]
    feat_list = feat_list[:-1] + [conv2d(params["conv_map"], bottom,
                                         padding=0)]
    out = fused_decoder_forward(fused, head_specs, feat_list, compute_dtype)
    if "Patch-Class" in cfg.considered_tasks:
        out["Patch-Class"] = pclass_for_cells(params, bottom, pclass_cells)
    return out


def fused_infer_outputs(params, imgs, cfg: ModelConfig, output_shape: int,
                        compute_dtype=jnp.bfloat16, fused=None,
                        head_specs=None,
                        out_dtype=jnp.float32,
                        valid_region: bool = True,
                        data_parallel: int = 1) -> jnp.ndarray:
    """Forward + activations + crop -> (N, output_shape, output_shape, C).

    ``out_dtype=float16`` halves the D2H payload; probabilities lose nothing
    material (thresholded at 0.5/0.55 downstream) and argmax ids are exact.

    ``valid_region`` (default ON): run the decoder towers only on the central
    output window + receptive-field margin (models/valid_decode.py) — the
    reference computes full 448^2 towers and crops afterwards
    (models/run_desc.py:489), discarding ~8x of the decoder FLOPs. The kept
    pixels are bit-identical. Falls back to the full path for DSF encoders,
    the grouped-fused decoder bank, or geometries whose crop windows don't
    fit."""
    plan = None
    if valid_region and fused is None:
        from ..models.valid_decode import supports_valid_region

        plan = supports_valid_region(cfg, int(imgs.shape[1]), output_shape)
    # dense inference windows (margin-304 family, output a multiple of 144):
    # keep the reference's per-144² Patch-Class granularity via the strided
    # grid head (net_desc.patch_class_head_grid) instead of one class per
    # dense window — on EVERY forward path (valid-region, full towers,
    # fused bank), so CERBERUS_VALID_REGION=0 doesn't change the output
    # structure
    pclass_cells = 1
    if output_shape % 144 == 0 and int(imgs.shape[1]) - output_shape == 304:
        pclass_cells = output_shape // 144
    if plan is not None:
        from ..models.valid_decode import valid_head_outputs

        # width-paired towers (models/paired_decode.py): same windows, 128-
        # channel lane-filling convs + interleave-free upsampling. Default ON
        # for TPU lowering (18% faster dense forward, 3% windowed, measured
        # device-side); OFF elsewhere so CPU runs keep bit-exact parity with
        # the unpaired reference path (paired reassociates conv accumulation:
        # f32 rel ~5e-6, bf16 rel ~3e-2 on raw logits — PARITY.md).
        import os

        use_paired = os.environ.get("CERBERUS_PAIRED")
        if use_paired is None:
            use_paired = "1" if _default_backend_is_tpu() else "0"
        if use_paired == "1":
            from ..models.paired_decode import (
                paired_head_outputs,
                supports_paired,
            )

            if supports_paired(plan, int(imgs.shape[1])):
                pred_dict = paired_head_outputs(params, imgs, cfg, plan,
                                                compute_dtype, pclass_cells,
                                                data_parallel=data_parallel)
            else:
                pred_dict = valid_head_outputs(params, imgs, cfg, plan,
                                               compute_dtype, pclass_cells)
        else:
            pred_dict = valid_head_outputs(params, imgs, cfg, plan,
                                           compute_dtype, pclass_cells)
    else:
        pred_dict = model_head_outputs(params, imgs, cfg, compute_dtype,
                                       fused, head_specs, pclass_cells)
    # only considered tasks contribute canvas channels (partial-task
    # checkpoints, e.g. nuclei-only configs)
    idx_dict, _n_ch = make_channel_index_map(cfg.active_decoder_kwargs)

    chunks = []
    for head_code, _slc in idx_dict.items():
        out = pred_dict[head_code].astype(jnp.float32)
        if head_code == "Patch-Class":
            cls = jnp.argmax(jax.nn.softmax(out, axis=-1), axis=-1)
            # (N, cells, cells) -> each cell broadcast over its block
            # (cells=1 reproduces the reference's constant-per-patch map)
            cell_px = output_shape // cls.shape[1]
            chunk = jnp.repeat(jnp.repeat(cls, cell_px, axis=1),
                               cell_px, axis=2)[..., None]
            chunk = chunk.astype(jnp.float32)
        elif head_code.endswith("-INST"):
            prob = jax.nn.softmax(out, axis=-1)[..., 1:]
            chunk = center_crop(prob, output_shape, output_shape)
        else:  # TYPE: softmax -> argmax
            cls = jnp.argmax(jax.nn.softmax(out, axis=-1), axis=-1)
            chunk = center_crop(cls[..., None].astype(jnp.float32),
                                output_shape, output_shape)
        chunks.append(chunk)
    return jnp.concatenate(chunks, axis=-1).astype(out_dtype)


def make_infer_step(params, cfg: ModelConfig, output_shape: int = 144,
                    compute_dtype=jnp.bfloat16, fuse_decoders: bool = False,
                    out_dtype=jnp.float16):
    """Build the jitted step: uint8 NHWC batch -> (N, out, out, C) float32.

    One compiled program per batch shape; callers pad the final partial batch
    to a fixed size (shape discipline: SURVEY.md §7 hard-part 5).

    ``fuse_decoders`` runs the five towers as one grouped-conv bank — OFF by
    default: measured on v5e it buys only ~5% step time while XLA pads the
    5x64-channel grouped activations 2x, materializing a (N, 448, 448, 5, 64)
    bf16 temp (15.3 GB at batch 64 -> OOM; ~8 GB extra peak at batch 32).
    The sequential towers let XLA free each tower's activations before the
    next, peaking at ~1/5 the memory for the same math.
    """
    # escape hatch: CERBERUS_VALID_REGION=0 restores the reference's
    # full-tower-then-crop compute (e.g. to isolate a numerics question)
    import os

    valid_region = os.environ.get("CERBERUS_VALID_REGION", "1") != "0"
    fused = head_specs = None
    if fuse_decoders:
        try:
            from ..models.fused_decoder import build_fused_decoder

            fused, head_specs = build_fused_decoder(params, cfg)
        except KeyError:
            fused = head_specs = None  # partial-task checkpoints: fall back

    @partial(jax.jit, static_argnames=())
    def step(p, fz, imgs):
        return fused_infer_outputs(p, imgs, cfg, output_shape, compute_dtype,
                                   fz, head_specs, out_dtype,
                                   valid_region=valid_region)

    return lambda imgs: step(params, fused, imgs)


def split_canvas_channels(canvas, decoder_kwargs) -> Dict[str, jnp.ndarray]:
    """Re-split a stitched canvas (or fused step output) per head code."""
    idx_dict, _ = make_channel_index_map(decoder_kwargs)
    return {code: canvas[..., s:e] for code, (s, e) in idx_dict.items()}
