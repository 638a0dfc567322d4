"""MobileNetV2 encoder as functional JAX.

Behavioral spec (reference ``models/backbone/mobilenet.py``): stride-1 stem
(:143 with stride=1), standard inverted-residual stack, and the reference's
feature-capture quirk (:132-157,189-210): ``ds_idx_list`` records the
*block-counter* index of each stride-2 block, but forward enumerates
``self.features`` (stem included, so offset by one) — the captured pyramid
is therefore [stem@1x 32ch, 24ch@1/2, 32ch@1/4, 96ch@1/8(after 2 of 3
96-blocks), 1280ch@1/16]. Replicated exactly, including the offset.

Param names mirror torch (``features.{i}.conv.{j}...``).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..layers import conv2d, init_bn, init_conv, key_stream
from .resnet import apply_bn

# t (expand), c (out ch), n (repeats), s (first-block stride)
IR_SETTING = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]
STEM_CH = 32
LAST_CH = 1280


def _block_plan():
    """[(features_idx, cin, cout, stride, expand)] + ds capture indices."""
    plan = []
    ds_idx_list = []
    layer_idx = 0
    cin = STEM_CH
    for t, c, n, s in IR_SETTING:
        for i in range(n):
            stride = s if i == 0 else 1
            plan.append((layer_idx + 1, cin, c, stride, t))
            if stride != 1:
                ds_idx_list.append(layer_idx)  # the reference's off-by-one
            cin = c
            layer_idx += 1
    return plan, ds_idx_list


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def init_mobilenet_v2_params(rng, prefix: str = "backbone") -> Dict:
    params = {}
    keys = key_stream(rng)
    f = f"{prefix}.features"
    params[f"{f}.0.0"] = {"kernel": init_conv(next(keys), 3, 3, 3, STEM_CH,
                                              bias=False)["kernel"]}
    params[f"{f}.0.1"] = init_bn(STEM_CH)

    plan, _ = _block_plan()
    for fi, cin, cout, _stride, t in plan:
        hidden = int(round(cin * t))
        base = f"{f}.{fi}.conv"
        li = 0
        if t != 1:
            params[f"{base}.{li}.0"] = {
                "kernel": init_conv(next(keys), 1, 1, cin, hidden,
                                    bias=False)["kernel"]}
            params[f"{base}.{li}.1"] = init_bn(hidden)
            li += 1
        # depthwise 3x3: torch kernel (hidden, 1, 3, 3) -> HWIO (3,3,1,hidden)
        params[f"{base}.{li}.0"] = {
            "kernel": init_conv(next(keys), 3, 3, 1, hidden,
                                bias=False)["kernel"]}
        params[f"{base}.{li}.1"] = init_bn(hidden)
        li += 1
        params[f"{base}.{li}"] = {
            "kernel": init_conv(next(keys), 1, 1, hidden, cout,
                                bias=False)["kernel"]}
        params[f"{base}.{li + 1}"] = init_bn(cout)

    last_fi = plan[-1][0] + 1
    params[f"{f}.{last_fi}.0"] = {
        "kernel": init_conv(next(keys), 1, 1, plan[-1][2], LAST_CH,
                            bias=False)["kernel"]}
    params[f"{f}.{last_fi}.1"] = init_bn(LAST_CH)
    return params


def _inverted_residual(params, base, x, cin, cout, stride, t, bn_sink):
    hidden = int(round(cin * t))
    y = x
    li = 0
    if t != 1:
        y = relu6(apply_bn(params, f"{base}.{li}.1",
                           conv2d(params[f"{base}.{li}.0"], y, padding=0),
                           bn_sink))
        li += 1
    y = relu6(apply_bn(params, f"{base}.{li}.1",
                       conv2d(params[f"{base}.{li}.0"], y, stride=stride,
                              groups=hidden), bn_sink))
    li += 1
    y = apply_bn(params, f"{base}.{li + 1}",
                 conv2d(params[f"{base}.{li}"], y, padding=0), bn_sink)
    if stride == 1 and cin == cout:
        return x + y
    return y


def mobilenet_v2_forward(params, x, prefix: str = "backbone",
                         bn_sink: Optional[dict] = None) -> List[jnp.ndarray]:
    f = f"{prefix}.features"
    plan, ds_idx_list = _block_plan()
    x = relu6(apply_bn(params, f"{f}.0.1",
                       conv2d(params[f"{f}.0.0"], x), bn_sink))

    feat_list = []
    for bi, (fi, cin, cout, stride, t) in enumerate(plan):
        # the reference captures the INPUT of features[i] for i in
        # ds_idx_list, where ds_idx_list holds block-counter indices
        if fi in ds_idx_list:
            feat_list.append(x)
        x = _inverted_residual(params, f"{f}.{fi}.conv", x, cin, cout,
                               stride, t, bn_sink)
    last_fi = plan[-1][0] + 1
    x = relu6(apply_bn(params, f"{f}.{last_fi}.1",
                       conv2d(params[f"{f}.{last_fi}.0"], x, padding=0),
                       bn_sink))
    feat_list.append(x)
    return feat_list
