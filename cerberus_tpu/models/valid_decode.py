"""Valid-region decoding: run each decoder tower only on the central output
window plus its receptive-field margin, instead of the full patch.

The reference computes all five decoder towers at full 448^2 and then crops
the central 144^2 AFTER the fact (``models/run_desc.py:489`` via
``cropping_center``). Only ~10% of the finest-level pixels ever survive the
crop, so ~8x of the decoder FLOPs (the dominant cost of the network — the
encoder runs once, the towers run five times) are discarded. Here we solve,
per decoder level, the exact input window needed to reproduce the kept
output bit-for-bit, crop the skip pyramid once after the encoder, and run
every tower with VALID convolutions on the small windows.

Exactness argument (why this is bit-identical, not approximate):
  * A 3x3 conv with VALID padding on a cropped window computes precisely the
    same dot products as the same-padded full conv restricted to interior
    pixels; each block of 2 convs therefore needs a +2px margin per side.
  * ``upsample2x_bilinear`` (models/layers.py:84-119) maps fine pixel g to
    coarse coordinate g/2 - 0.25, i.e. even g=2k reads coarse {k-1, k}, odd
    g=2k+1 reads {k, k+1}. Cropping the coarse tensor to [c0, c1) and
    upsampling reproduces full-tensor fine pixels on [2*c0+2, 2*c1-2)
    exactly (one guard pixel per side keeps the edge-replication clamp of
    the crop away from the kept window). So a fine window [f0, f1) needs the
    coarse window [floor(f0/2)-1, ceil(f1/2)+1) and a slice of
    [f0-2*c0 : f1-2*c0] from the upsampled result.
  * 1x1 head convs need no margin.

If any solved window falls outside its feature map (possible for small
inputs / large output ratios), the caller falls back to the full tower +
crop path; for the production 448->144 geometry every window fits with
slack (bottom crop [5,23) of 28).

This is an inference-only transform; training needs full-extent outputs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from ..config import ModelConfig
from .backbones import get_backbone
from .layers import center_crop, conv2d, relu, upsample2x_bilinear
from .backbones.resnet import apply_bn

CONV_MARGIN = 2  # 2 convs per decoder block x (k=3)//2 px each


@dataclass(frozen=True)
class _Level:
    """Per-decoder-level crop plan (block index == list position)."""
    skip_win: Tuple[int, int]   # crop of the skip feature at this scale
    up_lo: int                  # fine-scale slice offsets after upsample2x
    up_hi: int


@dataclass(frozen=True)
class ValidPlan:
    bottom_win: Tuple[int, int]   # crop of the bottom (conv_map) feature
    levels: Tuple[_Level, ...]    # coarse -> fine (block 0 .. n_up-1)
    out_size: int


def solve_windows(in_size: int, out_size: int,
                  n_up: int = 4) -> Optional[ValidPlan]:
    """Solve per-level crop windows for a centered ``out_size`` output of an
    ``in_size`` patch, or None when any window exceeds its feature map.

    The final crop offset matches the reference's floor-center semantics
    (``models/utils/misc_utils.py:6-25``: start = int((in-out)*0.5)).
    """
    start = int((in_size - out_size) * 0.5)
    win = (start, start + out_size)
    levels: List[_Level] = []
    for b in reversed(range(n_up)):
        skip_scale = in_size >> (n_up - 1 - b)
        i0, i1 = win[0] - CONV_MARGIN, win[1] + CONV_MARGIN
        if i0 < 0 or i1 > skip_scale:
            return None
        c0 = i0 // 2 - 1
        c1 = -((-i1) // 2) + 1
        levels.append(_Level((i0, i1), i0 - 2 * c0, 2 * c1 - i1))
        win = (c0, c1)
    if win[0] < 0 or win[1] > (in_size >> n_up):
        return None
    levels.reverse()
    return ValidPlan(bottom_win=win, levels=tuple(levels), out_size=out_size)


def _crop(x, win: Tuple[int, int]):
    return x[:, win[0]:win[1], win[0]:win[1], :]


def _valid_conv_block(params, name, x, n_layers):
    """Inference ConvBlock with VALID padding (exact interior values)."""
    for idx in range(n_layers):
        x = conv2d(params[f"{name}.block.{idx}.conv"], x, padding=0)
        x = relu(apply_bn(params, f"{name}.block.{idx}.bn", x, None))
    return x


def valid_decoder_tower(params, decoder_name: str, bottom, skips,
                        plan: ValidPlan):
    """Run one summation-skip tower on the planned windows.

    ``bottom``: conv_map output already cropped to ``plan.bottom_win``;
    ``skips``: per-level skip features already cropped to ``skip_win``
    (coarse -> fine order matching ``plan.levels``)."""
    prev = bottom
    for blk_idx, (lvl, skip) in enumerate(zip(plan.levels, skips)):
        up = upsample2x_bilinear(prev)
        n = up.shape[1]
        up = up[:, lvl.up_lo:n - lvl.up_hi, lvl.up_lo:n - lvl.up_hi, :]
        prev = _valid_conv_block(
            params, f"decoder_head.{decoder_name}.{blk_idx}", skip + up, 2)
    return prev


def valid_head_outputs(params, imgs, cfg: ModelConfig, plan: ValidPlan,
                       compute_dtype=jnp.bfloat16,
                       pclass_cells: int = 1) -> Dict[str, jnp.ndarray]:
    """Full encoder + valid-region towers + 1x1 heads.

    Returns {head_code: (N, out, out, C) logits} for segmentation heads and
    (N, cells, cells, C) for Patch-Class (cells=1 unless dense inference
    restores the per-144² granularity, net_desc.patch_class_head_grid) —
    segmentation outputs already ARE the central ``plan.out_size`` window
    (no further crop needed).
    """
    from .net_desc import _patch_class_head, pclass_for_cells

    _init, backbone_fwd, _filters = get_backbone(cfg.encoder_backbone_name)
    x = imgs.astype(compute_dtype) / jnp.asarray(255.0, compute_dtype)
    feat_list = backbone_fwd(params, x, "backbone", None)
    bottom_feats = feat_list[-1]
    mapped = conv2d(params["conv_map"], bottom_feats, padding=0)

    bottom = _crop(mapped, plan.bottom_win)
    # skip order inside a tower is coarse->fine = feat_list[-2] .. feat_list[0]
    skips = [
        _crop(feat_list[len(plan.levels) - 1 - b], lvl.skip_win)
        for b, lvl in enumerate(plan.levels)
    ]

    output_dict: Dict[str, jnp.ndarray] = {}
    for decoder_name, heads in cfg.decoder_info:
        if decoder_name not in cfg.considered_tasks:
            continue
        if decoder_name == "Patch-Class":
            output_dict["Patch-Class"] = (
                pclass_for_cells(params, bottom_feats, pclass_cells)
                if pclass_cells > 1
                else _patch_class_head(params, bottom_feats, None, None))
            continue
        prev = valid_decoder_tower(params, decoder_name, bottom, skips, plan)
        for head_name, _out_ch in heads:
            base = f"output_head.{decoder_name}.{head_name}.x"
            out = _valid_conv_block(params, f"{base}.0", prev, 1)
            out = conv2d(params[f"{base}.1.conv"], out, padding=0)
            output_dict[decoder_name.split("#")[0] + "-" + head_name] = out
    return output_dict


def supports_valid_region(cfg: ModelConfig, in_size: int,
                          out_size: int) -> Optional[ValidPlan]:
    """Plan if the config/geometry admits valid-region decoding, else None.

    DSF (steerable G-conv) decoders use k=7 pre-act blocks with a different
    margin structure and group pooling; they keep the full-tower path.
    """
    if cfg.encoder_backbone_name[:3] == "dsf":
        return None
    if out_size >= in_size:
        return None
    return solve_windows(in_size, out_size)
