"""DSF-CNN: rotation-equivariant steerable-filter encoder (4/8/12 orients).

Behavioral spec (reference ``models/backbone/dsf_cnn.py:6-35``): input G-conv
pair (Z2->G k7, then a preact G-conv block), then four G-dense blocks with
2x2 max-pools between; forward returns [x1..x5] at scales
[1, 1/2, 1/4, 1/8, 1/16] with per-orientation channels [10, 16, 32, 32, 32].

Dense blocks (gconv_layers.py:113-306): each unit is
GBN-ReLU-GConv(k7,14ch) -> GBN-ReLU-GConv(k5,6ch), densely concatenated
along the channel (not orientation) axis; a GBN-ReLU-GConv(k5) transition
maps to the block's output width.

All parameters keep the reference's torch state_dict names.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..gconv import (
    g_batch_norm,
    gconv2d,
    group_concat_channels,
    init_gconv,
)
from ..layers import init_bn, key_stream, relu

# GDenseBlock configs: (in_ch, out_ch, unit_count)
DENSE_BLOCKS = [("d1", 10, 16, 3), ("d2", 16, 32, 4), ("d3", 32, 32, 5),
                ("d4", 32, 32, 6)]
UNIT_KSIZE = [7, 5]
UNIT_CH = [14, 6]


def init_dsf_cnn_params(rng, nr_orients: int, prefix: str = "backbone") -> Dict:
    params = {}
    keys = key_stream(rng)
    params[f"{prefix}.i1"] = init_gconv(next(keys), 7, 1, 3, 10)
    params[f"{prefix}.i2.block.0.pre_bn.norm"] = init_bn(10)
    params[f"{prefix}.i2.block.0.conv"] = init_gconv(next(keys), 7, nr_orients,
                                                     10, 10)
    for name, in_ch, out_ch, n_units in DENSE_BLOCKS:
        unit_in = in_ch
        for u in range(n_units):
            base = f"{prefix}.{name}.units.{u}"
            params[f"{base}.norm1.norm"] = init_bn(unit_in)
            params[f"{base}.conv1"] = init_gconv(next(keys), UNIT_KSIZE[0],
                                                 nr_orients, unit_in, UNIT_CH[0])
            params[f"{base}.norm2.norm"] = init_bn(UNIT_CH[0])
            params[f"{base}.conv2"] = init_gconv(next(keys), UNIT_KSIZE[1],
                                                 nr_orients, UNIT_CH[0],
                                                 UNIT_CH[1])
            unit_in = in_ch + UNIT_CH[1] * (u + 1)
        sub_ch = in_ch + n_units * UNIT_CH[1]
        params[f"{prefix}.{name}.transition.bn.norm"] = init_bn(sub_ch)
        params[f"{prefix}.{name}.transition.conv"] = init_gconv(
            next(keys), 5, nr_orients, sub_ch, out_ch)
    return params


def _max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), [(0, 0)] * 4)


def _dense_block(params, base, x, in_ch, n_units, nr_orients, bn_sink):
    feat_list = [x]
    unit_in = in_ch
    for u in range(n_units):
        ubase = f"{base}.units.{u}"
        feat = group_concat_channels(feat_list, nr_orients)
        feat = relu(g_batch_norm(params[f"{ubase}.norm1.norm"], feat,
                                 nr_orients, bn_sink, f"{ubase}.norm1.norm"))
        feat = gconv2d(params[f"{ubase}.conv1"], feat, UNIT_KSIZE[0],
                       nr_orients, nr_orients)
        feat = relu(g_batch_norm(params[f"{ubase}.norm2.norm"], feat,
                                 nr_orients, bn_sink, f"{ubase}.norm2.norm"))
        feat = gconv2d(params[f"{ubase}.conv2"], feat, UNIT_KSIZE[1],
                       nr_orients, nr_orients)
        feat_list.append(feat)
        unit_in = in_ch + UNIT_CH[1] * (u + 1)
    feat = group_concat_channels(feat_list, nr_orients)
    feat = relu(g_batch_norm(params[f"{base}.transition.bn.norm"], feat,
                             nr_orients, bn_sink, f"{base}.transition.bn.norm"))
    return gconv2d(params[f"{base}.transition.conv"], feat, 5, nr_orients,
                   nr_orients)


def make_dsf_cnn_forward(nr_orients: int):
    def forward(params, x, prefix: str = "backbone",
                bn_sink: Optional[dict] = None) -> List[jnp.ndarray]:
        x = gconv2d(params[f"{prefix}.i1"], x, 7, 1, nr_orients)
        x = relu(g_batch_norm(params[f"{prefix}.i2.block.0.pre_bn.norm"], x,
                              nr_orients, bn_sink,
                              f"{prefix}.i2.block.0.pre_bn.norm"))
        x1 = x = gconv2d(params[f"{prefix}.i2.block.0.conv"], x, 7,
                         nr_orients, nr_orients)
        feats = [x1]
        for name, in_ch, _out_ch, n_units in DENSE_BLOCKS:
            x = _max_pool_2x2(x)
            x = _dense_block(params, f"{prefix}.{name}", x, in_ch, n_units,
                             nr_orients, bn_sink)
            feats.append(x)
        return feats

    return forward
