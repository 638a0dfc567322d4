"""Width-paired TRAINING decoder towers (+ output heads).

Training runs the five summation-skip towers at full resolution with SAME
convs (net_desc._decoder_tower); at 448² the two finest blocks are
64-channel 3x3 convs over 224²/448² maps — the dominant training FLOPs —
and 64 output channels fill only half the MXU's 128 lanes: the same
starvation the width-pairing fixed for inference (models/paired_decode.py,
+18% dense forward) and for the encoder front (models/paired_encoder.py).
This module lowers exactly those levels onto the paired representation

    paired(x)[n, h, j, p*C + c] == x[n, h, 2*j + p, c]

while the coarse 256/128-wide blocks (0, 1) stay unpaired — they are
already lane-full, so pairing them would cost 4/3 the MACs for no
occupancy gain.  ``pair_from=2`` selects the 64-channel levels for every
basic-block resnet (filters [64, 64, 128, 256, 512]); the ``paired=True``
gate in net_forward restricts the path to those backbones.

Building blocks reused from the inference lowerings:

  * ``pair_same3_kernel`` / ``_conv_paired(w_pad=1)`` — SAME 3x3 conv as a
    phase-0 (3, 3, 2C, 2C) block conv whose extra kernel entries are exact
    zeros (models/paired_encoder.py);
  * ``pair_conv1x1_kernel`` — block-diagonal parity-preserving 1x1;
  * ``_upsample_h_crop`` / ``_upsample_w_crop_pair`` (models/
    paired_decode.py) with full-range crops: the H pass runs directly on
    the paired tensor, the W pass emits the even/odd output columns AS the
    two parity channel groups — same per-axis order and multiply/add
    arithmetic as layers.upsample2x_bilinear, so kept values are
    bit-identical;
  * ``_paired_bn`` (models/paired_encoder.py) — train-mode BN whose paired
    batch stats fold exactly to the unpaired channel statistics and are
    recorded under the torch-keyed names.

Reference behavior being reproduced: the training forward of the decoder
towers + output heads (/root/reference/models/net_desc.py:147-215, driven
by /root/reference/models/run_desc.py:25-117 train_step).  Divergence is
conv-accumulation reassociation only — the PARITY.md width-paired rows'
divergence class; pinned by tests/test_paired_train.py (tower-isolated
backward ≤1e-5 abs).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp

from .layers import relu, upsample2x_bilinear
from .net_desc import _conv_block
from .paired_decode import (
    _upsample_h_crop,
    _upsample_w_crop_pair,
    pair_conv1x1_kernel,
    pair_w,
    unpair_w,
)
from .paired_encoder import _conv_paired, _paired_bn, pair_same3_kernel

PAIR_FROM = 2  # first tower block lowered paired: the 64-channel levels


def _paired_bias(cp: dict, x):
    if "bias" in cp:
        return x + jnp.tile(cp["bias"], 2).astype(x.dtype)
    return x


def _paired_conv_block_train(params, name: str, x, n_layers: int,
                             bn_sink: Optional[dict]):
    """Width-paired SAME ConvBlock: conv -> (+bias) -> BN -> relu, with
    train-mode BN when ``bn_sink`` is given (mirrors net_desc._conv_block
    on the paired representation)."""
    for idx in range(n_layers):
        cp = params[f"{name}.block.{idx}.conv"]
        k = cp["kernel"]
        if k.shape[0] == 1:
            x = _conv_paired(pair_conv1x1_kernel(k), x, w_pad=0)
        else:
            x = _conv_paired(pair_same3_kernel(k), x, w_pad=1)
        x = _paired_bias(cp, x)
        x = relu(_paired_bn(params, f"{name}.block.{idx}.bn", x, bn_sink))
    return x


def _upsample2x_paired(prev, paired_in: bool):
    """Full 2x bilinear upsample emitted in paired (phase-0) form.

    H doubles on the (paired or unpaired) tensor directly; the W pass's
    even/odd outputs ARE the parity channel groups, so the interleave the
    unpaired path materializes becomes a channel concat."""
    up_h = _upsample_h_crop(prev, 0, 0)
    xu = unpair_w(up_h) if paired_in else up_h
    return _upsample_w_crop_pair(xu, 0, 2 * xu.shape[2])


def paired_train_tower(params, decoder_name: str, feat_list: List,
                       bn_sink: Optional[dict],
                       pair_from: int = PAIR_FROM):
    """One summation-skip tower; blocks < ``pair_from`` run the regular
    unpaired path, the rest run width-paired.  Returns the finest feature
    map in PAIRED form (phase 0)."""
    n_blocks = len(feat_list) - 1
    assert 0 <= pair_from < n_blocks, (pair_from, n_blocks)
    prev = feat_list[-1]
    for idx in range(1, n_blocks + 1):
        blk = idx - 1
        name = f"decoder_head.{decoder_name}.{blk}"
        skip = feat_list[-(idx + 1)]
        if blk < pair_from:
            prev = upsample2x_bilinear(prev)
            prev = _conv_block(params, name, skip + prev, 2, bn_sink)
        else:
            up_p = _upsample2x_paired(prev, paired_in=blk > pair_from)
            prev = _paired_conv_block_train(params, name,
                                            pair_w(skip) + up_p, 2, bn_sink)
    return prev


def paired_train_head(params, base: str, prev_p, bn_sink: Optional[dict]):
    """Output head on a paired tower map; ``base`` =
    ``output_head.<decoder>.<head>.x``.  Returns UNPAIRED logits (tiny
    channel count — the unpair reshape is trivial)."""
    x = _paired_conv_block_train(params, f"{base}.0", prev_p, 1, bn_sink)
    cp = params[f"{base}.1.conv"]
    x = _conv_paired(pair_conv1x1_kernel(cp["kernel"]), x, w_pad=0)
    x = _paired_bias(cp, x)
    return unpair_w(x)
