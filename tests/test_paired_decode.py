"""Width-paired valid-region towers == unpaired valid towers.

The paired formulation (models/paired_decode.py) computes the same dot
products with the same multiplicands in the same (kh, kw, ci) order — the
repacked block kernels interleave exact zeros — so f32 agreement is at
conv-reassociation level (~1e-5 relative) and bf16 at bf16-rounding level.
The kept-window geometry (including the odd-bottom widening every margin-304
dense plan needs) must be exact.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.models.net_desc import init_net_params
from cerberus_tpu.models.paired_decode import (
    pair_conv_kernel,
    pair_w,
    paired_head_outputs,
    supports_paired,
    unpair_w,
)
from cerberus_tpu.models.valid_decode import (
    supports_valid_region,
    valid_head_outputs,
)

CFG = ModelConfig.from_kwargs({
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
})


def test_pair_unpair_roundtrip():
    x = jnp.arange(2 * 3 * 8 * 5).reshape(2, 3, 8, 5).astype(jnp.float32)
    p = pair_w(x)
    assert p.shape == (2, 3, 4, 10)
    # channel group p*C+c holds column 2j+p
    np.testing.assert_array_equal(np.asarray(p[..., 1, :5]),
                                  np.asarray(x[..., 2, :]))
    np.testing.assert_array_equal(np.asarray(p[..., 1, 5:]),
                                  np.asarray(x[..., 3, :]))
    np.testing.assert_array_equal(np.asarray(unpair_w(p)), np.asarray(x))


def test_paired_conv_matches_valid_conv():
    """A width-paired 3x2-block VALID conv == the 3x3 VALID conv."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = unpair_w(jax.lax.conv_general_dilated(
        pair_w(x), pair_conv_kernel(k), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    # paired output width = 2*(Wb-1) = W-2 == ref width
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size,cells", [
    (224, 72, 1),        # windowed geometry (even bottom)
    (592, 288, 2),       # margin-304 dense geometry (odd bottom -> widened)
])
def test_paired_towers_match_valid(in_size, out_size, cells):
    params = init_net_params(jax.random.PRNGKey(0), CFG)
    plan = supports_valid_region(CFG, in_size, out_size)
    assert plan is not None
    assert supports_paired(plan, in_size)
    imgs = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (1, in_size, in_size, 3)).astype(np.uint8))

    a = valid_head_outputs(params, imgs, CFG, plan, jnp.float32, cells)
    b = paired_head_outputs(params, imgs, CFG, plan, jnp.float32, cells)
    assert set(a) == set(b)
    for head in a:
        x, y = np.asarray(a[head]), np.asarray(b[head])
        assert x.shape == y.shape, head
        scale = np.max(np.abs(x)) + 1e-9
        np.testing.assert_allclose(y / scale, x / scale, atol=2e-5,
                                   err_msg=head)


def test_env_gate_routes_paired(monkeypatch):
    """CERBERUS_PAIRED=1 routes fused_infer_outputs through the paired
    towers; =0 keeps the unpaired valid path bit-exactly."""
    from cerberus_tpu.infer.steps import fused_infer_outputs

    params = init_net_params(jax.random.PRNGKey(2), CFG)
    imgs = jnp.asarray(np.random.default_rng(3).integers(
        0, 255, (1, 224, 224, 3)).astype(np.uint8))
    monkeypatch.setenv("CERBERUS_PAIRED", "0")
    off = np.asarray(fused_infer_outputs(params, imgs, CFG, 72, jnp.float32))
    base = np.asarray(fused_infer_outputs(params, imgs, CFG, 72, jnp.float32,
                                          valid_region=False))
    np.testing.assert_array_equal(off, base)
    monkeypatch.setenv("CERBERUS_PAIRED", "1")
    on = np.asarray(fused_infer_outputs(params, imgs, CFG, 72, jnp.float32))
    assert on.shape == off.shape
    np.testing.assert_allclose(on, off, rtol=1e-4, atol=1e-4)
