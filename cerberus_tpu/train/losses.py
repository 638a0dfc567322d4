"""Loss functions for multi-task training (NHWC logits).

Parity targets (reference ``models/utils/loss_utils.py``):
  * ``xentropy_loss`` (:6-21): per-pixel CE over channel logits;
  * ``dice_loss`` (:60-75): batch-joint dice summed over classes, optional
    mask, smooth 1e-3;
  * ``focal_loss`` (:24-57) and ``mse_loss`` (:78-95) for completeness.

The multi-task composition rules live in train/steps.py (per-head ce+dice
with class-weight maps and dummy-sample masking, ``models/run_desc.py:92-165``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def xentropy_loss(true, logits):
    """Per-pixel cross entropy. true: (..., ) int labels; logits: (..., C)."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    true_onehot = jax.nn.one_hot(true, logits.shape[-1], dtype=log_p.dtype)
    return -jnp.sum(true_onehot * log_p, axis=-1)


def dice_loss(true_onehot, pred_prob, mask=None, smooth: float = 1.0e-3):
    """Batch-joint dice over classes. true_onehot/pred_prob: (N,H,W,C);
    mask broadcastable to them. Sums (1 - dice) over classes."""
    if mask is not None:
        true_onehot = true_onehot * mask
        pred_prob = pred_prob * mask
    inse = jnp.sum(pred_prob * true_onehot, axis=(0, 1, 2))
    l = jnp.sum(pred_prob, axis=(0, 1, 2))
    r = jnp.sum(true_onehot, axis=(0, 1, 2))
    loss = 1.0 - (2.0 * inse + smooth) / (l + r + smooth)
    return jnp.sum(loss)


def focal_loss(true, logits, gamma: float = 2.0):
    """Focal loss on per-pixel logits."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    true_onehot = jax.nn.one_hot(true, logits.shape[-1], dtype=log_p.dtype)
    log_pt = jnp.sum(true_onehot * log_p, axis=-1)
    pt = jnp.exp(log_pt)
    return -((1.0 - pt) ** gamma) * log_pt


def mse_loss(true, pred):
    diff = pred - true
    return diff * diff


def _hv_sobel_kernels(size: int = 5):
    """Normalized-coordinate gradient kernels (loss_utils.py:116-137)."""
    import numpy as np

    rng = np.arange(-(size // 2), size // 2 + 1, dtype=np.float32)
    h, v = np.meshgrid(rng, rng, indexing="ij")
    denom = h * h + v * v + 1.0e-15
    return jnp.asarray(h / denom), jnp.asarray(v / denom)


def _grad_hv(hv, kernel_h, kernel_v):
    """Directional gradients of a 2-channel HV map (NHWC, C=2)."""
    def conv1(x, k):
        k = k[..., None, None]
        pad = (k.shape[0] - 1) // 2
        return jax.lax.conv_general_dilated(
            x[..., None], k, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]

    dh = conv1(hv[..., 0], kernel_h)
    dv = conv1(hv[..., 1], kernel_v)
    return jnp.stack([dh, dv], axis=-1)


def msge_loss(true, pred, focus):
    """HoVerNet-style masked MSE of horizontal/vertical map gradients
    (loss_utils.py:98-163). true/pred: (N,H,W,2); focus: (N,H,W)."""
    kh, kv = _hv_sobel_kernels(5)
    focus = jnp.stack([focus, focus], axis=-1).astype(jnp.float32)
    diff = _grad_hv(pred, kh, kv) - _grad_hv(true, kh, kv)
    loss = focus * diff * diff
    return jnp.sum(loss) / (jnp.sum(focus) + 1.0e-8)


def simclr_loss(features, temperature: float = 0.07,
                contrast_mode: str = "all", base_temperature: float = 0.07):
    """Supervised-contrastive / SimCLR loss (loss_utils.py:166-230).
    features: (bsz, n_views, dim)."""
    bsz, n_views = features.shape[0], features.shape[1]
    features = features.reshape(bsz, n_views, -1)
    mask = jnp.eye(bsz, dtype=jnp.float32)

    contrast_feature = jnp.concatenate(
        [features[:, v] for v in range(n_views)], axis=0)
    if contrast_mode == "one":
        anchor_feature, anchor_count = features[:, 0], 1
    elif contrast_mode == "all":
        anchor_feature, anchor_count = contrast_feature, n_views
    else:
        raise ValueError(f"Unknown mode: {contrast_mode}")

    logits = anchor_feature @ contrast_feature.T / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1,
                                                    keepdims=True))
    mask = jnp.tile(mask, (anchor_count, n_views))
    logits_mask = 1.0 - jnp.eye(bsz * anchor_count, bsz * n_views)
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / jnp.sum(mask, axis=1)
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss.reshape(anchor_count, bsz))


def class_weight_map(true, class_weights: dict, n_classes: int):
    """Per-pixel weights from a {class: weight} table.

    Faithful to ``get_class_wmap`` (models/run_desc.py:18-22): classes absent
    from the table keep their *label value* as weight — in the shipped
    configs that zeroes background (label 0) and nothing else.
    """
    lut = jnp.array(
        [float(class_weights.get(c, c)) for c in range(n_classes)],
        dtype=jnp.float32,
    )
    return lut[true]
