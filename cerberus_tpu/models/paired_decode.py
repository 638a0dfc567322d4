"""Width-paired ("pair-plane") valid-region decoding.

The valid-region towers (models/valid_decode.py) run 3x3 VALID convs with 64
output channels. On TPU the MXU contracts onto 128 output columns, so a
64-wide conv leaves half the systolic array idle — the measured decoder conv
fusions run at ~87 TF/s vs ~197 TF/s for the 128/256/512-channel encoder
stages (tools/bench_fwd_spans.py, BASELINE.md round-3 forward attribution).
The bilinear upsample's even/odd interleave additionally lowers to physical
layout copies (~14.5 ms of `copy`/`pad` ops per batch-128 step) because a
(W,2,C=64) -> (2W,C) reshape cannot be a bitcast when C pads to 128 lanes.

This module reformulates the towers on a *width-paired* representation:

    paired(x)[n, h, j, p*C + c] == x[n, h, 2*j + p, c]

i.e. adjacent column pairs are stacked into 2*64 = 128 channels — exactly
filling the TPU lane width. Key properties:

  * pair/unpair are pure reshapes (row-major (W, C) == (W/2, 2C) when the
    pairing starts on an even window-local column);
  * a 3x3 VALID conv becomes a 3x2-block VALID conv with a repacked
    (3, 2, 2C, 2C) kernel. For output parity p, original tap k maps to
    block (p+k)//2, input parity (p+k)%2 — each output element consumes the
    SAME multiplicands in the SAME (kh, kw, ci) order as the unpaired conv
    (the extra kernel entries are exact zeros), so the contraction is
    mathematically identical with 2x the MXU occupancy at 4/3 the MACs;
  * `upsample2x_bilinear`'s even/odd output arrays ARE the two parity
    groups of the paired form — the interleave disappears into a channel
    concat;
  * BN / bias / 1x1 head convs pair by tiling their (C,) vectors to (2C,).

The kept output pixels are mathematically identical to the unpaired valid
path (same summands, same per-axis upsample order); any difference is
floating-point reassociation inside the conv contraction, bounded by bf16
rounding (tests/test_paired_decode.py pins both f32 and bf16 agreement).

Reference behavior being reproduced: models/net_desc.py decoder towers +
output heads (/root/reference/models/net_desc.py:147-215), already
valid-region-transformed by models/valid_decode.py.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .backbones import get_backbone
from .layers import batch_norm, conv2d, relu
from .valid_decode import ValidPlan, _crop


def pair_w(x):
    """(N, H, W, C) -> (N, H, W/2, 2C); W must be even."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


def unpair_w(x):
    """(N, H, Wb, 2C) -> (N, H, 2*Wb, C)."""
    n, h, wb, c2 = x.shape
    return x.reshape(n, h, 2 * wb, c2 // 2)


def pair_conv_kernel(kernel):
    """(3, 3, Ci, Co) HWIO -> (3, 2, 2Ci, 2Co) width-paired block kernel.

    Output parity p at block j covers window-local column 2j+p; original
    tap k reads column 2j+p+k = block j + (p+k)//2, parity (p+k)%2.
    """
    kh, kw, ci, co = kernel.shape
    assert kw == 3, kernel.shape
    out = jnp.zeros((kh, 2, 2 * ci, 2 * co), kernel.dtype)
    for p in range(2):
        for k in range(kw):
            wb, pi = (p + k) // 2, (p + k) % 2
            out = out.at[:, wb, pi * ci:(pi + 1) * ci,
                         p * co:(p + 1) * co].set(kernel[:, k])
    return out


def pair_conv1x1_kernel(kernel):
    """(1, 1, Ci, Co) -> (1, 1, 2Ci, 2Co) block-diagonal (parity-preserving)."""
    _kh, _kw, ci, co = kernel.shape
    out = jnp.zeros((1, 1, 2 * ci, 2 * co), kernel.dtype)
    for p in range(2):
        out = out.at[:, :, p * ci:(p + 1) * ci, p * co:(p + 1) * co].set(
            kernel[:, :])
    return out


def _pair_vec(p: dict) -> dict:
    return {k: jnp.tile(v, 2) for k, v in p.items()}


def _paired_conv_block(params, name: str, x, n_layers: int):
    """Width-paired inference ConvBlock (VALID): conv -> BN -> relu."""
    for idx in range(n_layers):
        cp = params[f"{name}.block.{idx}.conv"]
        pairer = (pair_conv1x1_kernel if cp["kernel"].shape[1] == 1
                  else pair_conv_kernel)
        p2 = {"kernel": pairer(cp["kernel"])}
        if "bias" in cp:
            p2["bias"] = jnp.tile(cp["bias"], 2)
        x = conv2d(p2, x, padding=0)
        x = relu(batch_norm(_pair_vec(params[f"{name}.block.{idx}.bn"]), x))
    return x


def _upsample_h_crop(x, lo: int, hi: int):
    """Double axis 1 with the half-pixel bilinear weights (same arithmetic
    and order as layers._upsample2x_axis(axis=1)), keeping only output rows
    [lo, 2n-hi). Only the contributing input rows are touched, so the
    transients are crop-sized rather than full-sized."""
    n = x.shape[1]
    n_out = 2 * n - hi - lo
    # output row r reads input rows {floor((r-1)/2), floor((r+1)/2)} (edge
    # clamped); generate whole pairs covering [lo, 2n-hi) then trim parity.
    i0, i1 = lo // 2, (2 * n - hi + 1) // 2      # pair range [i0, i1)
    xp = jnp.pad(x, [(0, 0), (1, 1), (0, 0), (0, 0)], mode="edge")
    center = xp[:, i0 + 1:i1 + 1]
    even = 0.25 * xp[:, i0:i1] + 0.75 * center
    odd = 0.75 * center + 0.25 * xp[:, i0 + 2:i1 + 2]
    out = jnp.stack([even, odd], axis=2)
    out = out.reshape(x.shape[0], 2 * (i1 - i0), *x.shape[2:])
    off = lo - 2 * i0
    return out[:, off:off + n_out]


def _upsample_w_crop_pair(x, lo: int, length: int):
    """Axis-2 doubling restricted to output columns [lo, lo+length),
    emitted directly in paired form (parity groups on channels, no
    interleave). ``length`` must be even.

    With xp = edge-pad(x): up[2j] = .25*xp[j] + .75*xp[j+1] and
    up[2j+1] = .75*xp[j+1] + .25*xp[j+2] — the same multiply/add order as
    layers._upsample2x_axis, so kept values are bit-identical."""
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (0, 0)], mode="edge")
    half = length // 2

    def ev(j0):   # up[2j] for j in [j0, j0+half)
        return 0.25 * xp[:, :, j0:j0 + half] + \
            0.75 * xp[:, :, j0 + 1:j0 + 1 + half]

    def od(j0):   # up[2j+1] for j in [j0, j0+half)
        return 0.75 * xp[:, :, j0 + 1:j0 + 1 + half] + \
            0.25 * xp[:, :, j0 + 2:j0 + 2 + half]

    if lo % 2 == 0:
        j = lo // 2
        p0, p1 = ev(j), od(j)
    else:
        j = (lo - 1) // 2
        p0, p1 = od(j), ev(j + 1)
    return jnp.concatenate([p0, p1], axis=-1)


def _crop_w_paired(t, win):
    """Square-window crop of an already width-paired (phase-0) feature map.

    Rows crop normally; columns [lo, hi) with even ``lo`` are a whole-block
    slice. An odd ``lo`` re-phases: window-local block i covers global
    columns (lo+2i, lo+2i+1) = (block (lo-1)//2 + i, parity 1) and
    (block (lo+1)//2 + i, parity 0) — two shifted channel-half slices whose
    concat IS the locally-paired crop (fuses into the consuming conv's
    input; no full-map repack)."""
    lo, hi = win
    if lo % 2 == 0:
        return t[:, lo:hi, lo // 2:hi // 2, :]
    c = t.shape[-1] // 2
    j0 = (lo - 1) // 2
    nb = (hi - lo) // 2
    local_p0 = t[:, lo:hi, j0:j0 + nb, c:]
    local_p1 = t[:, lo:hi, j0 + 1:j0 + 1 + nb, :c]
    return jnp.concatenate([local_p0, local_p1], axis=-1)


def supports_paired(plan: ValidPlan, in_size: int) -> bool:
    """Pairing needs every tower window to have even width.

    An odd *bottom* window (every margin-304 dense geometry has one — e.g.
    1168->864 crops 63 of 73) is handled by widening its W-crop one column
    to the right: the extra column is dropped by the level-0 upsample crop
    (up_lo >= 2 of slack on the right for all solved plans), so the kept
    values are untouched. That needs one spare column in the bottom feature
    map. Level windows are even for every margin-304 geometry (the crop
    arithmetic yields even lengths above the bottom); odd level windows are
    not widened — fall back to the unpaired valid path.
    """
    lo, hi = plan.bottom_win
    if (hi - lo) % 2 and hi >= (in_size >> len(plan.levels)):
        return False
    return all((lvl.skip_win[1] - lvl.skip_win[0]) % 2 == 0
               for lvl in plan.levels)


def paired_decoder_tower(params, decoder_name: str, bottom_p, skips_p,
                         plan: ValidPlan):
    """One summation-skip tower, entirely in the width-paired domain.

    ``bottom_p``/``skips_p`` are already cropped AND paired (shared across
    the five towers)."""
    prev = bottom_p
    for blk_idx, (lvl, skip_p) in enumerate(zip(plan.levels, skips_p)):
        lo, hi = lvl.up_lo, lvl.up_hi
        length = 2 * prev.shape[1] - hi - lo
        up_h = _upsample_h_crop(prev, lo, hi)   # (N, length, wb, 2C)
        up_p = _upsample_w_crop_pair(unpair_w(up_h), lo, length)
        prev = _paired_conv_block(
            params, f"decoder_head.{decoder_name}.{blk_idx}",
            skip_p + up_p, 2)
    return prev


def paired_head_outputs(params, imgs, cfg: ModelConfig, plan: ValidPlan,
                        compute_dtype=jnp.bfloat16,
                        pclass_cells: int = 1,
                        data_parallel: int = 1) -> Dict[str, jnp.ndarray]:
    """Width-paired counterpart of valid_decode.valid_head_outputs.

    Same contract: {head_code: (N, out, out, C) logits} (already the central
    window), plus the Patch-Class grid head on the unpaired bottom features.
    """
    from .net_desc import _patch_class_head, pclass_for_cells
    from .paired_encoder import resnet_forward_paired, use_paired_front

    x = imgs.astype(compute_dtype) / jnp.asarray(255.0, compute_dtype)
    # paired encoder front (models/paired_encoder.py): the stem and layer1
    # run width-paired too, so their convs fill the MXU lanes and the x0/x1
    # skips arrive already paired (phase 0 = block-aligned with even-start
    # crop windows). Batch-gated on PER-DEVICE batch — mesh-sharded callers
    # pass their data-axis size via ``data_parallel`` (see use_paired_front
    # for the measured rationale; CERBERUS_PAIRED_ENCODER=1/0 overrides).
    import os as _os

    paired_front = use_paired_front(
        cfg.encoder_backbone_name, int(imgs.shape[2]), int(imgs.shape[0]),
        data_parallel, _os.environ.get("CERBERUS_PAIRED_ENCODER"))
    if paired_front:
        feat_list = resnet_forward_paired(params, x,
                                          cfg.encoder_backbone_name,
                                          "backbone")
    else:
        _init, backbone_fwd, _filters = get_backbone(
            cfg.encoder_backbone_name)
        feat_list = backbone_fwd(params, x, "backbone", None)
    bottom_feats = feat_list[-1]
    mapped = conv2d(params["conv_map"], bottom_feats, padding=0)

    b0, b1 = plan.bottom_win
    # odd bottom width: widen the W-crop one column right (see
    # supports_paired — the extra column is discarded by the level-0 crop)
    bw1 = b1 + 1 if (b1 - b0) % 2 else b1
    bottom_p = pair_w(mapped[:, b0:b1, b0:bw1, :])
    # skip order inside a tower is coarse->fine = feat_list[-2] .. feat_list[0]
    skips_p = []
    for b, lvl in enumerate(plan.levels):
        idx = len(plan.levels) - 1 - b
        feat = feat_list[idx]
        if paired_front and idx <= 1:
            skips_p.append(_crop_w_paired(feat, lvl.skip_win))
        else:
            skips_p.append(pair_w(_crop(feat, lvl.skip_win)))

    output_dict: Dict[str, jnp.ndarray] = {}
    prev_out = None
    for decoder_name, heads in cfg.decoder_info:
        if decoder_name not in cfg.considered_tasks:
            continue
        if decoder_name == "Patch-Class":
            output_dict["Patch-Class"] = (
                pclass_for_cells(params, bottom_feats, pclass_cells)
                if pclass_cells > 1
                else _patch_class_head(params, bottom_feats, None, None))
            continue
        if prev_out is not None:
            # serialize the towers: without an ordering edge XLA interleaves
            # all five, and their finest-level working sets stack up —
            # batch-16 dense (1168^2) overflows HBM by ~0.6 GB. The barrier
            # caps liveness at one tower's working set (values unchanged)
            # and costs no time (A/B at windowed b8: 13.95 vs 13.93 ms —
            # XLA leaves no scheduling gaps between serialized towers).
            bottom_p, prev_out = jax.lax.optimization_barrier(
                (bottom_p, prev_out))
        prev = paired_decoder_tower(params, decoder_name, bottom_p, skips_p,
                                    plan)
        prev_out = prev
        for head_name, _out_ch in heads:
            base = f"output_head.{decoder_name}.{head_name}.x"
            out = _paired_conv_block(params, f"{base}.0", prev, 1)
            cp = params[f"{base}.1.conv"]
            p2 = {"kernel": pair_conv1x1_kernel(cp["kernel"])}
            if "bias" in cp:
                p2["bias"] = jnp.tile(cp["bias"], 2)
            out = conv2d(p2, out, padding=0)
            output_dict[decoder_name.split("#")[0] + "-" + head_name] = (
                unpair_w(out))
    return output_dict
