"""Plain 5-stage double-conv U-Net encoder (64..1024 channels).

Behavioral spec: reference ``models/backbone/unet_encoder.py:4-62`` — stage 1
has no downsample; stages 2-5 start with a 2x2 maxpool; each stage is
2 x (conv3x3 + BN + ReLU); forward returns the 5-scale feature list.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from jax import random

from ..layers import conv2d, init_bn, init_conv, key_stream
from .resnet import apply_bn

STAGE_CH = [(3, 64), (64, 128), (128, 256), (256, 512), (512, 1024)]


def init_unet_encoder_params(rng, prefix: str = "backbone") -> Dict:
    params = {}
    keys = key_stream(rng)
    for stage, (cin, cout) in enumerate(STAGE_CH, start=1):
        params[f"{prefix}.module{stage}.conv1"] = init_conv(next(keys), 3, 3, cin, cout)
        params[f"{prefix}.module{stage}.bn1"] = init_bn(cout)
        params[f"{prefix}.module{stage}.conv2"] = init_conv(next(keys), 3, 3, cout, cout)
        params[f"{prefix}.module{stage}.bn2"] = init_bn(cout)
    return params


def _max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding=[(0, 0)] * 4,
    )


def unet_encoder_forward(params, x, prefix: str = "backbone",
                         bn_sink: Optional[dict] = None) -> List[jnp.ndarray]:
    feats = []
    for stage in range(1, 6):
        if stage > 1:
            x = _max_pool_2x2(x)
        name = f"{prefix}.module{stage}"
        x = jax.nn.relu(apply_bn(params, f"{name}.bn1",
                                 conv2d(params[f"{name}.conv1"], x), bn_sink))
        x = jax.nn.relu(apply_bn(params, f"{name}.bn2",
                                 conv2d(params[f"{name}.conv2"], x), bn_sink))
        feats.append(x)
    return feats
