"""Stride-1-stem ResNet encoders (18/34/50/101/152) as functional JAX.

Behavioral spec from the reference's modified torchvision ResNet
(``models/backbone/resnet.py``): the 7x7 stem conv is stride **1** (``:195-197``)
so the 5-scale pyramid is [1, 1/2, 1/4, 1/8, 1/16]; forward returns the
feature list ``[x0..x4]`` (``:273-286``), where x0 is the post-stem/bn/relu
map and x1 the output of layer1 after the 3x3/2 maxpool.

Parameters live in a flat ``{torch_dotted_name: leaf}`` dict under the
``backbone.`` prefix (e.g. ``backbone.layer2.0.downsample.0``), matching the
reference checkpoints' state_dict names so conversion is mechanical.

``bn_sink``: when a dict is passed, train-mode batch norm uses batch
statistics and records ``{bn_name: (batch_mean, batch_var_unbiased)}`` into
it for the caller's running-stat update; when None, folded inference BN runs.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
from jax import random

from ..layers import (batch_norm, conv2d, init_bn, init_conv, key_stream,
                      max_pool_3x3_s2, relu)

# arch -> (block kind, per-stage block counts)
RESNET_SPECS = {
    "resnet18": ("basic", [2, 2, 2, 2]),
    "resnet34": ("basic", [3, 4, 6, 3]),
    "resnet50": ("bottleneck", [3, 4, 6, 3]),
    "resnet101": ("bottleneck", [3, 4, 23, 3]),
    "resnet152": ("bottleneck", [3, 8, 36, 3]),
}
STAGE_PLANES = [64, 128, 256, 512]
EXPANSION = {"basic": 1, "bottleneck": 4}


def apply_bn(params, name: str, x, bn_sink: Optional[dict]):
    if bn_sink is None:
        return batch_norm(params[name], x, train=False)
    y, mean, var = batch_norm(params[name], x, train=True)
    bn_sink[name] = (mean, var)
    return y


def init_resnet_params(rng, arch: str, prefix: str = "backbone") -> Dict:
    block, counts = RESNET_SPECS[arch]
    exp = EXPANSION[block]
    params = {}
    keys = key_stream(rng)

    params[f"{prefix}.conv1"] = {
        "kernel": init_conv(next(keys), 7, 7, 3, 64, bias=False)["kernel"]
    }
    params[f"{prefix}.bn1"] = init_bn(64)

    inplanes = 64
    for stage_idx, (planes, n_blocks) in enumerate(zip(STAGE_PLANES, counts)):
        stride = 1 if stage_idx == 0 else 2
        for b in range(n_blocks):
            name = f"{prefix}.layer{stage_idx + 1}.{b}"
            s = stride if b == 0 else 1
            if b == 0 and (s != 1 or inplanes != planes * exp):
                params[f"{name}.downsample.0"] = {
                    "kernel": init_conv(next(keys), 1, 1, inplanes, planes * exp,
                                        bias=False)["kernel"]
                }
                params[f"{name}.downsample.1"] = init_bn(planes * exp)
            if block == "basic":
                shapes = [(3, inplanes, planes), (3, planes, planes)]
            else:
                shapes = [(1, inplanes, planes), (3, planes, planes),
                          (1, planes, planes * exp)]
            for ci, (k, cin, cout) in enumerate(shapes):
                params[f"{name}.conv{ci + 1}"] = {
                    "kernel": init_conv(next(keys), k, k, cin, cout,
                                        bias=False)["kernel"]
                }
                params[f"{name}.bn{ci + 1}"] = init_bn(cout)
            inplanes = planes * exp
    return params


def _basic_block(params, name, x, stride, bn_sink):
    identity = x
    out = relu(apply_bn(params, f"{name}.bn1",
                        conv2d(params[f"{name}.conv1"], x, stride=stride), bn_sink))
    out = apply_bn(params, f"{name}.bn2",
                   conv2d(params[f"{name}.conv2"], out), bn_sink)
    if f"{name}.downsample.0" in params:
        identity = conv2d(params[f"{name}.downsample.0"], x, stride=stride, padding=0)
        identity = apply_bn(params, f"{name}.downsample.1", identity, bn_sink)
    return relu(out + identity)


def _bottleneck_block(params, name, x, stride, bn_sink):
    identity = x
    out = relu(apply_bn(params, f"{name}.bn1",
                        conv2d(params[f"{name}.conv1"], x, padding=0), bn_sink))
    out = relu(apply_bn(params, f"{name}.bn2",
                        conv2d(params[f"{name}.conv2"], out, stride=stride), bn_sink))
    out = apply_bn(params, f"{name}.bn3",
                   conv2d(params[f"{name}.conv3"], out, padding=0), bn_sink)
    if f"{name}.downsample.0" in params:
        identity = conv2d(params[f"{name}.downsample.0"], x, stride=stride, padding=0)
        identity = apply_bn(params, f"{name}.downsample.1", identity, bn_sink)
    return relu(out + identity)


def resnet_forward(params, x, arch: str, prefix: str = "backbone",
                   bn_sink: Optional[dict] = None) -> List[jnp.ndarray]:
    """Returns the 5-scale feature pyramid [x0..x4] (NHWC)."""
    block, counts = RESNET_SPECS[arch]
    blk_fn = _basic_block if block == "basic" else _bottleneck_block

    x = conv2d(params[f"{prefix}.conv1"], x)  # 7x7 stride-1 stem
    x0 = x = relu(apply_bn(params, f"{prefix}.bn1", x, bn_sink))

    x = max_pool_3x3_s2(x)
    feats = []
    for stage_idx, n_blocks in enumerate(counts):
        stride = 1 if stage_idx == 0 else 2
        for b in range(n_blocks):
            x = blk_fn(params, f"{prefix}.layer{stage_idx + 1}.{b}", x,
                       stride if b == 0 else 1, bn_sink)
        feats.append(x)
    return [x0] + feats
