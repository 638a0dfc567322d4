"""msge / simclr / focal loss properties."""
import numpy as np

import jax.numpy as jnp

from cerberus_tpu.train.losses import focal_loss, msge_loss, simclr_loss, xentropy_loss


def test_msge_zero_for_identical_maps():
    rng = np.random.default_rng(0)
    hv = jnp.asarray(rng.standard_normal((2, 32, 32, 2)).astype(np.float32))
    focus = jnp.ones((2, 32, 32))
    assert float(msge_loss(hv, hv, focus)) == 0.0


def test_msge_detects_gradient_mismatch():
    rng = np.random.default_rng(1)
    true = jnp.asarray(rng.standard_normal((1, 32, 32, 2)).astype(np.float32))
    pred = true * 0.0
    focus = jnp.ones((1, 32, 32))
    assert float(msge_loss(true, pred, focus)) > 0.0
    # loss only counts the focused region
    focus0 = jnp.zeros((1, 32, 32))
    assert float(msge_loss(true, pred, focus0)) == 0.0


def test_simclr_prefers_aligned_views():
    rng = np.random.default_rng(2)
    base = rng.standard_normal((8, 16)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    aligned = jnp.asarray(np.stack([base, base], axis=1))
    shuffled = jnp.asarray(np.stack([base, base[::-1]], axis=1))
    assert float(simclr_loss(aligned)) < float(simclr_loss(shuffled))


def test_focal_reduces_to_ce_at_gamma0():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32))
    true = jnp.asarray(rng.integers(0, 5, 4))
    np.testing.assert_allclose(
        np.asarray(focal_loss(true, logits, gamma=0.0)),
        np.asarray(xentropy_loss(true, logits)), rtol=1e-5)
