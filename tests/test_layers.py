"""Primitive-level torch parity: padding, pooling, bilinear upsample, BN."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from cerberus_tpu.models import layers  # noqa: E402


def test_upsample2x_matches_torch_bilinear():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 28, 29, 5)).astype(np.float32)
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
                      mode="bilinear", align_corners=False)
        .permute(0, 2, 3, 1).numpy()
    )
    got = np.asarray(layers.upsample2x_bilinear(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_maxpool_3x3_s2_matches_torch():
    rng = np.random.default_rng(1)
    for hw in [(448, 448), (144, 144), (65, 67)]:
        x = rng.standard_normal((1, *hw, 3)).astype(np.float32)
        ref = (
            F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2, 1)
            .permute(0, 2, 3, 1).numpy()
        )
        got = np.asarray(layers.max_pool_3x3_s2(jnp.asarray(x)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("stride,k", [(1, 3), (2, 3), (1, 7), (1, 1)])
def test_conv2d_matches_torch(stride, k):
    rng = np.random.default_rng(2)
    cin, cout = 4, 6
    x = rng.standard_normal((2, 56, 56, cin)).astype(np.float32)
    w = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.1
    b = rng.standard_normal((cout,)).astype(np.float32)
    ref = (
        F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
                 torch.from_numpy(b), stride=stride, padding=k // 2)
        .permute(0, 2, 3, 1).numpy()
    )
    p = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
         "bias": jnp.asarray(b)}
    import jax
    with jax.default_matmul_precision("highest"):
        got = np.asarray(layers.conv2d(p, jnp.asarray(x), stride=stride))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_batch_norm_inference_matches_torch():
    rng = np.random.default_rng(3)
    c = 8
    x = rng.standard_normal((2, 14, 14, c)).astype(np.float32)
    bn = torch.nn.BatchNorm2d(c, eps=1e-5).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.standard_normal(c).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.standard_normal(c).astype(np.float32)))
        bn.running_mean.copy_(
            torch.from_numpy(rng.standard_normal(c).astype(np.float32)))
        bn.running_var.copy_(
            torch.from_numpy(np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5))
        ref = bn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    p = {
        "scale": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
        "mean": jnp.asarray(bn.running_mean.numpy()),
        "var": jnp.asarray(bn.running_var.numpy()),
    }
    got = np.asarray(layers.batch_norm(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)
