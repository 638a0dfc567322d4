"""Functional NN primitives (NHWC, HWIO) with torch-compatible semantics.

Parameter convention: every layer is a small dict leaf inside a flat
``{torch_dotted_name: leaf}`` tree —
  conv: ``{"kernel": (H, W, I, O) array, ["bias": (O,)]}``
  bn:   ``{"scale": (C,), "bias": (C,), "mean": (C,), "var": (C,)}``
Keys deliberately reuse the reference's torch module paths so checkpoint
conversion (models/convert.py) is a pure per-tensor transform.

All spatial ops use *explicit* torch-style padding (pad k//2 each side, floor
output size), never XLA 'SAME', because torch and XLA split uneven SAME
padding differently for stride-2 convs.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch default: running = (1-m)*running + m*batch


def conv2d(p, x, stride: int = 1, padding: Optional[int] = None,
           dilation: int = 1, groups: int = 1):
    """2-D convolution, NHWC x HWIO -> NHWC, torch-style explicit padding."""
    kernel = p["kernel"]
    k = kernel.shape[0]
    if padding is None:
        padding = (k // 2) * dilation
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def batch_norm(p, x, train: bool = False):
    """Inference BN folds to one multiply-add; train mode returns
    ``(y, batch_mean, batch_var_unbiased)`` for running-stat updates."""
    if not train:
        inv = (p["scale"] / jnp.sqrt(p["var"] + BN_EPS)).astype(x.dtype)
        shift = (p["bias"] - p["mean"] * p["scale"] /
                 jnp.sqrt(p["var"] + BN_EPS)).astype(x.dtype)
        return x * inv + shift
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x.astype(jnp.float32), axis=axes)
    var = jnp.var(x.astype(jnp.float32), axis=axes)
    inv = (p["scale"] / jnp.sqrt(var + BN_EPS)).astype(x.dtype)
    shift = (p["bias"] - mean * p["scale"] / jnp.sqrt(var + BN_EPS)).astype(x.dtype)
    n = float(np.prod([x.shape[a] for a in axes]))
    var_unbiased = var * (n / max(n - 1.0, 1.0))
    return x * inv + shift, mean, var_unbiased


def relu(x):
    return jax.nn.relu(x)


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel 3, stride 2, padding 1)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _upsample2x_axis(x, axis: int):
    """Double one spatial axis with half-pixel bilinear weights [0.25, 0.75]."""
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (1, 1)
    xp = jnp.pad(x, pad_cfg, mode="edge")
    n = x.shape[axis]

    def sl(start, size):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + size)
        return xp[tuple(idx)]

    center = sl(1, n)
    even = 0.25 * sl(0, n) + 0.75 * center   # out[2i]   = .25 x[i-1] + .75 x[i]
    odd = 0.75 * center + 0.25 * sl(2, n)    # out[2i+1] = .75 x[i]   + .25 x[i+1]
    out = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return out.reshape(new_shape)


def upsample2x_bilinear(x):
    """Bilinear 2x upsample with half-pixel centers (== torch
    ``F.interpolate(scale_factor=2, mode='bilinear', align_corners=False)``,
    the reference's ``upsample2x``, models/utils/net_layers.py:45-46).

    Separable elementwise formulation (4 fused multiply-adds per output px on
    the VPU) instead of the gather chains ``jax.image.resize`` emits — this
    runs at every decoder level of every head, so it must fuse cleanly.
    Border outputs clamp to the edge pixel via replicate padding.

    Computes in the input dtype: the 0.25/0.75 half-pixel weights are exact
    in bfloat16, and the op is bandwidth-bound — upcasting bf16 activations
    to f32 (as before round 2) doubled its HBM bytes for ~2 extra mantissa
    bits on an interpolation.
    """
    x = _upsample2x_axis(x, 1)
    return _upsample2x_axis(x, 2)


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def center_crop(x, crop_h: int, crop_w: int):
    """Batched center crop, floor offset (reference
    ``models/utils/misc_utils.py:6-25`` with batch=True)."""
    h0 = int((x.shape[1] - crop_h) * 0.5)
    w0 = int((x.shape[2] - crop_w) * 0.5)
    return x[:, h0 : h0 + crop_h, w0 : w0 + crop_w, :]


def dropout(x, rate: float, rng):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# initializers (match reference models/utils/__init__.py:10-20)
# ---------------------------------------------------------------------------

def key_stream(rng):
    """Infinite generator of derived PRNG keys via fold_in — avoids
    materializing and host-iterating a giant split() array."""
    import itertools

    return (jax.random.fold_in(rng, i) for i in itertools.count())


def kaiming_normal_fan_out(rng, shape_hwio):
    """Kaiming-normal, mode=fan_out, relu gain — torch's
    ``nn.init.kaiming_normal_(w, mode='fan_out', nonlinearity='relu')``."""
    kh, kw, _i, o = shape_hwio
    fan_out = o * kh * kw
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(rng, shape_hwio, dtype=jnp.float32) * std


def init_conv(rng, kh, kw, cin, cout, bias: bool = True):
    p = {"kernel": kaiming_normal_fan_out(rng, (kh, kw, cin, cout))}
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def init_bn(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }
