"""Steerable-filter group convolutions (rotation equivariance).

Behavioral spec: the reference's DSF-CNN stack (``models/utils/
gconv_utils.py`` + ``gconv_layers.py``):
  * circular-harmonic atomic basis filters with per-radius bandlimits for
    k in {5, 7, 9} (gconv_utils.py:9-88);
  * phase-rotation tables e^{-i f theta} per orientation (:91-116);
  * filter synthesis: real part of (w_re + i w_im) x rotated basis, summed
    over basis atoms (:191-212);
  * cyclic permutation of input-orientation channels for G->G convs
    (:152-188 — note its hardcoded ``.to("cuda")``, a reference bug);
  * G-batchnorm: one stat set per channel shared across orientations
    (gconv_layers.py:400-423); orientation max/mean pooling (:426-459).

TPU-first: the rotated basis is a compile-time constant (the reference
rebuilds it every forward); the cyclic permutation is a static per-
orientation roll folded into kernel construction, so each forward emits ONE
ordinary XLA convolution whose kernel is a small einsum over the parameters
— fully fusible and MXU-shaped.

Channel layout: NHWC with the channel axis orientation-major, i.e.
``(..., O * C)`` flattened from ``(..., O, C)`` — identical ordering to the
reference's ``(N, O*C, H, W)``.

Parameters: ``{"gweight": (2, 1, Q, 1, 1, O_in, in, out)}`` kept in the
torch checkpoint layout so conversion stays mechanical.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

BASIS_INFO = {
    5: ([0, 1, 2], [0, 1, 2], [0, 2, 2]),
    7: ([0, 1, 2, 3], [0, 1, 2, 3], [0, 2, 3, 2]),
    9: ([0, 1, 2, 3, 4], [0, 1, 2, 3, 4], [0, 3, 4, 4, 3]),
}


@lru_cache(maxsize=None)
def basis_filters(ksize: int):
    """Atomic complex basis filters; returns (filters (Q,K,K) complex,
    frequencies tuple)."""
    freq_list, radius_list, bandlimit_list = BASIS_INFO[ksize]
    filters, used_freqs = [], []
    eps = 1e-8
    his = ksize // 2
    y_index, x_index = np.mgrid[-his: his + 1, -his: his + 1]
    z = (x_index + 1j * (-y_index)) + eps
    r = np.abs(z)
    for radius in radius_list:
        sigma = 0.4 if radius == radius_list[-1] else 0.6
        rad_prof = np.exp(-((r - radius) ** 2) / (2 * sigma ** 2))
        for freq in freq_list:
            if freq <= bandlimit_list[radius]:
                c_image = rad_prof * (z / r) ** freq
                c_image = (math.sqrt(2) * c_image) / np.linalg.norm(c_image)
                filters.append(c_image)
                used_freqs.append(freq)
    return np.array(filters), tuple(used_freqs)


@lru_cache(maxsize=None)
def rotated_basis(ksize: int, nr_orients: int):
    """(2 [re/im], O, Q, K, K) float32 rotated basis constant."""
    filters, freqs = basis_filters(ksize)
    freqs = np.array(freqs)[None, :]  # (1, Q)
    angles = (2 * np.pi / nr_orients) * np.arange(nr_orients)[:, None]
    rot = np.exp(-1j * freqs * angles)  # (O, Q)
    rotated = rot[:, :, None, None] * filters[None]  # (O, Q, K, K)
    return np.stack([rotated.real, rotated.imag]).astype(np.float32)


def n_basis(ksize: int) -> int:
    return basis_filters(ksize)[0].shape[0]


def synthesize_kernel(gweight, ksize: int, nr_orients_in: int,
                      nr_orients_out: int, dtype=jnp.float32):
    """gweight (2,1,Q,1,1,O_in,in,out) -> HWIO kernel
    (K, K, O_in*in, O_out*out), orientation-major channels, with the cyclic
    input-orientation permutation applied for G->G convs."""
    basis = jnp.asarray(rotated_basis(ksize, nr_orients_out))  # (2,O,Q,K,K)
    w = gweight.astype(jnp.float32)
    w_re = w[0, 0, :, 0, 0]  # (Q, O_in, in, out)
    w_im = w[1, 0, :, 0, 0]
    # real part of complex product, summed over basis atoms:
    # (O_out, K, K, O_in, in, out)
    comb = (jnp.einsum("oqhw,qiab->ohwiab", basis[0], w_re)
            - jnp.einsum("oqhw,qiab->ohwiab", basis[1], w_im))
    if nr_orients_in > 1:
        # G->G: out-orientation o reads input orientations rolled by o
        comb = jnp.stack(
            [jnp.roll(comb[o], o, axis=2) for o in range(nr_orients_out)])
    k = comb.shape[1]
    # -> (K, K, O_in, in, O_out, out) -> (K, K, O_in*in, O_out*out)
    kernel = comb.transpose(1, 2, 3, 4, 0, 5)
    kernel = kernel.reshape(k, k, nr_orients_in * comb.shape[4],
                            nr_orients_out * comb.shape[5])
    return kernel.astype(dtype)


def gconv2d(p, x, ksize: int, nr_orients_in: int, nr_orients_out: int,
            stride: int = 1, padding: Optional[int] = None):
    """Steerable G-convolution. x: (N,H,W,O_in*in) orientation-major."""
    kernel = synthesize_kernel(p["gweight"], ksize, nr_orients_in,
                               nr_orients_out, x.dtype)
    if padding is None:
        padding = ksize // 2
    out = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def g_batch_norm(p, x, nr_orients: int, bn_sink: Optional[dict] = None,
                 name: Optional[str] = None):
    """G-equivariant BN: stats per channel, shared across orientations.
    x: (N,H,W,O*C)."""
    n, h, w, oc = x.shape
    c = oc // nr_orients
    xr = x.reshape(n, h, w, nr_orients, c)
    from .layers import BN_EPS

    if bn_sink is None:
        inv = (p["scale"] / jnp.sqrt(p["var"] + BN_EPS)).astype(x.dtype)
        shift = (p["bias"] - p["mean"] * p["scale"] /
                 jnp.sqrt(p["var"] + BN_EPS)).astype(x.dtype)
        out = xr * inv + shift
    else:
        mean = jnp.mean(xr.astype(jnp.float32), axis=(0, 1, 2, 3))
        var = jnp.var(xr.astype(jnp.float32), axis=(0, 1, 2, 3))
        inv = (p["scale"] / jnp.sqrt(var + BN_EPS)).astype(x.dtype)
        shift = (p["bias"] - mean * p["scale"] /
                 jnp.sqrt(var + BN_EPS)).astype(x.dtype)
        count = n * h * w * nr_orients
        var_unbiased = var * (count / max(count - 1.0, 1.0))
        bn_sink[name] = (mean, var_unbiased)
        out = xr * inv + shift
    return out.reshape(n, h, w, oc)


def group_pool(x, nr_orients: int, pool_type: str = "max"):
    """Pool over the orientation axis: (N,H,W,O*C) -> (N,H,W,C)."""
    n, h, w, oc = x.shape
    c = oc // nr_orients
    xr = x.reshape(n, h, w, nr_orients, c)
    if pool_type == "max":
        return jnp.max(xr, axis=3)
    return jnp.mean(xr, axis=3)


def group_concat_channels(tensors, nr_orients: int):
    """Concatenate G-maps along the channel (not orientation) axis."""
    parts = []
    for t in tensors:
        n, h, w, oc = t.shape
        parts.append(t.reshape(n, h, w, nr_orients, oc // nr_orients))
    out = jnp.concatenate(parts, axis=-1)
    n, h, w, o, c = out.shape
    return out.reshape(n, h, w, o * c)


def init_gconv(rng, ksize: int, nr_orients_in: int, in_ch: int, out_ch: int,
               use_bias: bool = False):
    """weights_init_dsf: normal with std sqrt(2 / fan_out * Q)
    (models/utils/__init__.py:23-30)."""
    q = n_basis(ksize)
    std = math.sqrt(2.0 / out_ch * q)
    p = {"gweight": jax.random.normal(
        rng, (2, 1, q, 1, 1, nr_orients_in, in_ch, out_ch),
        dtype=jnp.float32) * std}
    if use_bias:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p
