"""DenseNet-121 encoder as functional JAX.

Behavioral spec (reference ``models/backbone/densenet.py``): torchvision
densenet with a stride-1 7x7 stem (:202-210) and forward rewritten to emit
the 5-scale feature list [x0(stem), x1(block1), x2(block2), x3(block3),
x4(norm5(block4))] (:257-279). Note x4 passes the final BN but NOT a ReLU.

Param names mirror the torch state_dict
(``features.denseblock1.denselayer1.conv1`` etc.) for mechanical conversion.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..layers import conv2d, init_bn, init_conv, key_stream, max_pool_3x3_s2, relu
from .resnet import apply_bn

GROWTH = 32
BLOCK_CONFIG = (6, 12, 24, 16)
BN_SIZE = 4
INIT_FEATURES = 64


def init_densenet121_params(rng, prefix: str = "backbone") -> Dict:
    params = {}
    keys = key_stream(rng)
    f = f"{prefix}.features"
    params[f"{f}.conv0"] = {
        "kernel": init_conv(next(keys), 7, 7, 3, INIT_FEATURES,
                            bias=False)["kernel"]}
    params[f"{f}.norm0"] = init_bn(INIT_FEATURES)

    num_features = INIT_FEATURES
    for bi, num_layers in enumerate(BLOCK_CONFIG, start=1):
        for li in range(1, num_layers + 1):
            cin = num_features + (li - 1) * GROWTH
            base = f"{f}.denseblock{bi}.denselayer{li}"
            params[f"{base}.norm1"] = init_bn(cin)
            params[f"{base}.conv1"] = {
                "kernel": init_conv(next(keys), 1, 1, cin, BN_SIZE * GROWTH,
                                    bias=False)["kernel"]}
            params[f"{base}.norm2"] = init_bn(BN_SIZE * GROWTH)
            params[f"{base}.conv2"] = {
                "kernel": init_conv(next(keys), 3, 3, BN_SIZE * GROWTH,
                                    GROWTH, bias=False)["kernel"]}
        num_features += num_layers * GROWTH
        if bi != len(BLOCK_CONFIG):
            base = f"{f}.transition{bi}"
            params[f"{base}.norm"] = init_bn(num_features)
            params[f"{base}.conv"] = {
                "kernel": init_conv(next(keys), 1, 1, num_features,
                                    num_features // 2, bias=False)["kernel"]}
            num_features //= 2
    params[f"{f}.norm5"] = init_bn(num_features)
    return params


def _avg_pool_2x2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), [(0, 0)] * 4
    ) * 0.25


def _dense_block(params, base, x, num_layers, bn_sink):
    for li in range(1, num_layers + 1):
        layer = f"{base}.denselayer{li}"
        y = relu(apply_bn(params, f"{layer}.norm1", x, bn_sink))
        y = conv2d(params[f"{layer}.conv1"], y, padding=0)
        y = relu(apply_bn(params, f"{layer}.norm2", y, bn_sink))
        y = conv2d(params[f"{layer}.conv2"], y)
        x = jnp.concatenate([x, y], axis=-1)
    return x


def densenet121_forward(params, x, prefix: str = "backbone",
                        bn_sink: Optional[dict] = None) -> List[jnp.ndarray]:
    f = f"{prefix}.features"
    x = conv2d(params[f"{f}.conv0"], x)
    x0 = x = relu(apply_bn(params, f"{f}.norm0", x, bn_sink))

    x = max_pool_3x3_s2(x)
    x1 = x = _dense_block(params, f"{f}.denseblock1", x, BLOCK_CONFIG[0],
                          bn_sink)
    feats = [x0, x1]
    for bi in range(2, 5):
        t = f"{f}.transition{bi - 1}"
        x = relu(apply_bn(params, f"{t}.norm", x, bn_sink))
        x = conv2d(params[f"{t}.conv"], x, padding=0)
        x = _avg_pool_2x2(x)
        x = _dense_block(params, f"{f}.denseblock{bi}", x,
                         BLOCK_CONFIG[bi - 1], bn_sink)
        if bi == 4:
            x = apply_bn(params, f"{f}.norm5", x, bn_sink)  # no relu (ref :274)
        feats.append(x)
    return feats
