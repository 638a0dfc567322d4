"""Width-paired ResNet encoder front == plain inference ResNet.

The repacked stem/layer1/layer2-entry kernels interleave exact zeros, so
agreement is at conv-reassociation level (f32 ~1e-5 relative); the paired
maxpool is order-free and must be exact. Reference behavior:
/root/reference/models/backbone/resnet.py:195-197,273-286 via
models/backbones/resnet.py (already parity-pinned there).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cerberus_tpu.models.backbones.resnet import (
    init_resnet_params,
    resnet_forward,
)
from cerberus_tpu.models.layers import max_pool_3x3_s2
from cerberus_tpu.models.paired_decode import _crop_w_paired, pair_w, unpair_w
from cerberus_tpu.models.paired_encoder import (
    max_pool_paired,
    pair_s2_exit_kernel,
    pair_same3_kernel,
    pair_stem_kernel,
    resnet_forward_paired,
    supports_paired_encoder,
    use_paired_front,
)


def test_use_paired_front_gate():
    # per-DEVICE batch < 48 pairs; global batch alone does not decide
    assert use_paired_front("resnet34", 448, 8)
    assert use_paired_front("resnet34", 448, 32)
    assert use_paired_front("resnet34", 1168, 16)
    assert not use_paired_front("resnet34", 448, 64)
    assert not use_paired_front("resnet34", 448, 128)
    # mesh: global 64 over 8 devices = 8/device -> pairs
    assert use_paired_front("resnet34", 448, 64, data_parallel=8)
    assert not use_paired_front("resnet34", 448, 512, data_parallel=8)
    # env override beats the auto gate (but never an unsupported config)
    assert use_paired_front("resnet34", 448, 128, env="1")
    assert not use_paired_front("resnet34", 448, 8, env="0")
    assert not use_paired_front("resnet50", 448, 8, env="1")
    assert not use_paired_front("resnet34", 446, 8, env="1")


def _conv(x, k, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_stem_kernel_matches_same_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 20, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 8)).astype(np.float32))
    ref = _conv(x, k, pad=3)
    got = unpair_w(jax.lax.conv_general_dilated(
        pair_w(x), pair_stem_kernel(k), (1, 1), [(3, 3), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_same3_kernel_matches_same_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32))
    ref = _conv(x, k, pad=1)
    got = unpair_w(jax.lax.conv_general_dilated(
        pair_w(x), pair_same3_kernel(k), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2_exit_kernel_matches_stride2_conv():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 12, 16, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    ref = _conv(x, k, stride=2, pad=1)
    got = jax.lax.conv_general_dilated(
        pair_w(x), pair_s2_exit_kernel(k), (2, 1), [(1, 1), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_max_pool_paired_exact():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 14, 16, 5)).astype(np.float32))
    ref = max_pool_3x3_s2(x)
    got = unpair_w(max_pool_paired(pair_w(x)))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_crop_w_paired_even_and_odd_start():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 4)).astype(np.float32))
    xp = pair_w(x)
    for lo, hi in [(2, 8), (3, 9)]:
        ref = pair_w(x[:, lo:hi, lo:hi, :])
        got = _crop_w_paired(xp, (lo, hi))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("arch", ["resnet18", "resnet34"])
def test_paired_pyramid_matches_plain(arch):
    assert supports_paired_encoder(arch, 48)
    assert not supports_paired_encoder("resnet50", 48)
    assert not supports_paired_encoder(arch, 46)

    params = init_resnet_params(jax.random.PRNGKey(0), arch)
    # non-trivial BN statistics so folding errors can't hide (crc32 keys:
    # hash() is salted per process and would make failures irreproducible)
    import zlib

    for name, leaf in params.items():
        if "bn" in name or "downsample.1" in name:
            ks = jax.random.split(
                jax.random.PRNGKey(zlib.crc32(name.encode())), 4)
            leaf["mean"] = 0.1 * jax.random.normal(ks[0], leaf["mean"].shape)
            leaf["var"] = 0.5 + jnp.abs(jax.random.normal(ks[1],
                                                          leaf["var"].shape))
            leaf["scale"] = 1.0 + 0.1 * jax.random.normal(
                ks[2], leaf["scale"].shape)
            leaf["bias"] = 0.1 * jax.random.normal(ks[3], leaf["bias"].shape)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3), jnp.float32)
    ref = resnet_forward(params, x, arch)
    got = resnet_forward_paired(params, x, arch)
    flat = [unpair_w(got[0]), unpair_w(got[1])] + list(got[2:])
    assert len(ref) == len(flat)
    for r, g in zip(ref, flat):
        assert r.shape == g.shape
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        err = float(jnp.max(jnp.abs(r - g))) / scale
        assert err < 2e-5, err
