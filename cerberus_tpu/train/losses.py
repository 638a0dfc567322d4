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
