"""Jitted training / validation steps for the multi-task model.

Behavioral spec: reference ``train_step`` / ``valid_step``
(``models/run_desc.py:25-230,332-436``):
  * batch = {img NHWC uint8, per-head GT maps, per-head weight maps
    (``<head>#WEIGHT-MAP``), has_target mask};
  * per-head loss = sum over {ce, dice} with per-head loss weights, class
    weight maps for TYPE heads (bg weight 0 under the shipped config), and
    dummy-sample masking so samples without that GT contribute 0;
  * dice runs on softmax foreground classes only, masked to true-positive
    pixels, batch-joint (dummy samples contribute 0 naturally);
  * Adam + StepLR(75000 steps, x0.1) (``models/opt.py:47-57``).

JAX-first differences (documented, not accidental):
  * the reference derives ``train_decoder_list`` per batch and gates branch
    gradients with ``set_grad_enabled``; with exact dummy masking the same
    gradients arise from the masked loss alone, so one XLA program serves
    every GT combination — no recompiles, no python control flow.
  * the reference's Patch-Class loss averages over dummy samples too (an
    N,1,1-broadcast quirk at ``models/run_desc.py:153-159``); we mask
    dummies like every other head.
  * BN running stats update functionally: train forward emits batch stats
    via ``bn_sink``; the step folds them into the param tree with torch
    momentum 0.1 — matching DataParallel semantics where frozen-by-flag
    branches still update their BN stats.

``has_target``: (N, n_heads) float/bool matrix in the head order of
``head_order(cfg)`` — the jit-friendly encoding of the reference's N x B
string array ``dummy_target``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models.net_desc import head_output_channels, net_forward
from .losses import class_weight_map, dice_loss, xentropy_loss

BN_MOMENTUM = 0.1


def head_order(cfg: ModelConfig):
    return list(head_output_channels(cfg).keys())


def make_lr_schedule(base_lr: float = 1.0e-3, decay_steps: int = 75000,
                     gamma: float = 0.1):
    """StepLR(decay every `decay_steps`, factor `gamma`)."""

    def schedule(step):
        return base_lr * gamma ** (step // decay_steps)

    return schedule


def make_optimizer(optimizer_kwargs: Optional[Mapping[str, Any]] = None,
                   schedule=None, frozen_pred=None):
    """``frozen_pred(param_name) -> bool`` additionally routes whole frozen
    modules (subtype fine-tuning, reference _freeze_weight) to set_to_zero
    so not even weight decay touches them."""
    kwargs = dict(optimizer_kwargs or {})
    lr = float(kwargs.get("lr", 1.0e-3))
    betas = kwargs.get("betas", (0.9, 0.999))
    wd = float(kwargs.get("weight_decay", 0.0))
    if schedule is None:
        # honor a configured decay cadence: callers (build_trainer) thread
        # the config's lr_decay_steps through optimizer_kwargs so the
        # schedule the optimizer APPLIES is the one the logs report
        schedule = make_lr_schedule(lr,
                                    int(kwargs.get("lr_decay_steps", 75000)))
    opt = optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=wd) \
        if wd else optax.adam(schedule, b1=betas[0], b2=betas[1])
    # BN running stats live in the param tree but are not trainable: route
    # them to set_to_zero so the optimizer never touches them (they update
    # via the bn_sink fold in the step itself)
    tx = optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()},
        partial(_trainable_labels, frozen_pred=frozen_pred),
    )
    return tx, schedule


def _trainable_labels(params, frozen_pred=None):
    return {
        name: {k: ("freeze" if (k in ("mean", "var") or
                                (frozen_pred is not None and
                                 frozen_pred(name))) else "train")
               for k in leaf}
        for name, leaf in params.items()
    }


@dataclasses.dataclass
class TrainState:
    params: Dict
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def create_train_state(params, optimizer_kwargs=None, schedule=None,
                       cfg: Optional[ModelConfig] = None):
    from ..models.net_desc import subtype_frozen_prefixes

    frozen = subtype_frozen_prefixes(cfg) if cfg is not None else None
    tx, _ = make_optimizer(optimizer_kwargs, schedule, frozen_pred=frozen)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32)), tx


def _loss_weight_tables(loss_kwargs: Mapping, cfg: ModelConfig):
    """Static (head -> (head_weight, {loss_name: weight}, class_weights))."""
    loss_info = (loss_kwargs or {}).get("loss_info", {})
    class_weight = (loss_kwargs or {}).get("class_weight", {}) or {}
    tables = {}
    for head in head_order(cfg):
        info = loss_info.get(head, {"weight": 1.0, "loss": {"ce": 1}})
        tables[head] = (
            float(info.get("weight", 1.0)),
            {k: float(v) for k, v in info.get("loss", {"ce": 1}).items()},
            {int(k): float(v) for k, v in (class_weight.get(head) or {}).items()},
        )
    return tables


def multitask_loss(params, batch, cfg: ModelConfig, loss_tables,
                   bn_sink: Optional[dict], dropout_rng,
                   compute_dtype=jnp.float32, remat=False,
                   paired: bool = False):
    """Returns (total_loss, per-head scalar dict)."""
    heads = head_order(cfg)
    n_ch = head_output_channels(cfg)
    imgs = batch["img"]
    has_target = batch["has_target"].astype(jnp.float32)  # (N, n_heads)

    # Subtype fine-tuning: stop gradients at the PARAMETERS of frozen
    # modules (reference _freeze_weight sets requires_grad=False on
    # backbone/conv_map/non-active decoders) — output-level stop_gradient
    # alone would let gradients flow into the shared trunk through the
    # trainable TYPE decoder.
    from ..models.net_desc import subtype_frozen_prefixes

    frozen_pred = subtype_frozen_prefixes(cfg)
    if frozen_pred is not None:
        params = {
            name: (jax.tree.map(jax.lax.stop_gradient, leaf)
                   if frozen_pred(name) else leaf)
            for name, leaf in params.items()
        }

    # All branches marked trainable: heads without GT in the batch get zero
    # masked loss and hence exactly the zero gradients the reference achieves
    # with per-batch `train_decoder_list` grad gating — but in ONE compiled
    # program for every GT combination. Subtype freezing still applies inside
    # net_forward's branch_trainable.
    pred_dict = net_forward(params, imgs, cfg,
                            train_decoder_list=tuple(cfg.active_decoders()),
                            bn_sink=bn_sink,
                            dropout_rng=dropout_rng,
                            compute_dtype=compute_dtype,
                            remat=remat,
                            paired=paired)

    total = jnp.zeros((), jnp.float32)
    metrics = {}
    for h_idx, head in enumerate(heads):
        if head not in batch:
            continue
        head_weight, loss_dict, cls_weights = loss_tables[head]
        logits = pred_dict[head].astype(jnp.float32)
        true = batch[head]
        head_flag = has_target[:, h_idx]

        if head == "Patch-Class":
            true_lbl = true.reshape(true.shape[0]).astype(jnp.int32)
            logits_flat = logits.reshape(logits.shape[0], -1)
            ce = xentropy_loss(true_lbl, logits_flat)
            term = jnp.sum(ce * head_flag) / (jnp.sum(head_flag) + 1.0e-8)
            head_loss = loss_dict.get("ce", 0.0) * term
            metrics[f"{head}_loss"] = head_loss * head_weight
            total = total + head_loss * head_weight
            continue

        true_lbl = true[..., 0].astype(jnp.int32)  # (N,h,w)
        head_loss = jnp.zeros((), jnp.float32)
        # per-pixel weight map: dataset-provided boundary weights for INST
        # heads, class-weight LUT for TYPE heads (run_desc.py:112-124)
        if head.endswith("-TYPE"):
            wmap = class_weight_map(true_lbl, cls_weights, n_ch[head])
        else:
            wmap_key = head + "#WEIGHT-MAP"
            wmap = (batch[wmap_key][..., 0].astype(jnp.float32)
                    if wmap_key in batch else jnp.ones_like(
                        true_lbl, dtype=jnp.float32))

        for loss_name, loss_weight in loss_dict.items():
            if loss_name == "dice":
                true_oh = jax.nn.one_hot(true_lbl, n_ch[head])
                prob = jax.nn.softmax(logits, axis=-1)
                binary_mask = (true_lbl > 0).astype(jnp.float32)[..., None]
                term = dice_loss(true_oh[..., 1:], prob[..., 1:],
                                 mask=binary_mask)
            else:
                pix = xentropy_loss(true_lbl, logits) * wmap
                per_sample = jnp.mean(pix, axis=(1, 2))
                term = jnp.sum(per_sample * head_flag) / (
                    jnp.sum(head_flag) + 1.0e-8)
            head_loss = head_loss + loss_weight * term
        metrics[f"{head}_loss"] = head_loss * head_weight
        total = total + head_loss * head_weight

    metrics["overall_loss"] = total
    return total, metrics


def _apply_bn_updates(params, bn_sink):
    params = dict(params)
    for name, (mean, var) in bn_sink.items():
        leaf = dict(params[name])
        leaf["mean"] = (1.0 - BN_MOMENTUM) * leaf["mean"] + BN_MOMENTUM * mean
        leaf["var"] = (1.0 - BN_MOMENTUM) * leaf["var"] + BN_MOMENTUM * var
        params[name] = leaf
    return params


def _apply_bn_updates_stacked(params, bn_sink, k: int):
    """Fold K per-microbatch batch stats (stacked on axis 0) into the running
    stats EXACTLY as K sequential momentum updates would — the closed form of
    ``run = (1-m)*run + m*stat_i`` applied i = 0..K-1 in order:

        new = (1-m)^K * old + sum_i  m * (1-m)^(K-1-i) * stat_i
    """
    keep = (1.0 - BN_MOMENTUM) ** k
    coef = BN_MOMENTUM * (1.0 - BN_MOMENTUM) ** jnp.arange(
        k - 1, -1, -1, dtype=jnp.float32)
    params = dict(params)
    for name, (means, vars_) in bn_sink.items():
        leaf = dict(params[name])
        cshape = (k,) + (1,) * (means.ndim - 1)
        leaf["mean"] = keep * leaf["mean"] + jnp.sum(
            coef.reshape(cshape) * means, axis=0)
        leaf["var"] = keep * leaf["var"] + jnp.sum(
            coef.reshape(cshape) * vars_, axis=0)
        params[name] = leaf
    return params


def make_train_step(cfg: ModelConfig, loss_kwargs=None, optimizer_kwargs=None,
                    compute_dtype=jnp.float32, donate: bool = True,
                    return_grads: bool = False, remat=False,
                    grad_accum: int = 1, micro_sharding=None,
                    paired: bool = False):
    """Returns (train_step(state, batch, rng) -> (state, metrics[, grads]),
    tx).

    The whole step — forward over all heads, masked multi-task loss,
    backward, Adam update, BN running-stat fold — is ONE jitted XLA program.
    ``return_grads`` additionally returns the gradient tree (for the
    LoggingGradient histogram callback).

    ``grad_accum=K`` splits the batch into K microbatches and runs them
    sequentially under ``lax.scan`` inside the SAME jitted program: gradients
    are averaged, ONE optimizer update is applied, and BN running stats are
    folded per microbatch in order (exactly what K torch forwards before one
    ``optimizer.step()`` would do — the reference has no accumulation; this
    is the TPU path to its batch-32 config, whose backward working set can
    never fit a 16 GB chip at 448² even fully rematerialized — see
    BASELINE.md "Training-step"). Peak memory is one microbatch's backward
    plus a params-sized gradient accumulator. Per-microbatch loss
    normalizers (masked-head counts, batch-joint dice) span the microbatch,
    not the full batch — standard accumulation semantics.

    ``micro_sharding``: optional sharding constraint applied to each
    microbatched leaf (shape (K, N/K, ...)); the mesh path passes
    ``P(None, 'data')`` so every microbatch stays batch-sharded.

    ``paired=True`` (opt-in, run_train.py --paired): width-paired encoder
    front in the training forward+backward — the inference TPU default's
    divergence class (conv reassociation only, PARITY.md) applied to
    training, where the 64-channel stages otherwise run batch-minor and
    starve the MXU (~13% MFU, VERDICT r3 weak #5). Default stays the
    bit-exact unpaired path.
    """
    from ..models.net_desc import subtype_frozen_prefixes

    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    loss_tables = _loss_table_static(loss_kwargs, cfg)
    tx, _ = make_optimizer(optimizer_kwargs,
                           frozen_pred=subtype_frozen_prefixes(cfg))

    def grad_fn(params, batch, rng):
        def loss_fn(p):
            # bn_sink is filled during the traced forward; it must leave the
            # grad trace through the aux output, never by closure capture
            bn_sink: dict = {}
            total, metrics = multitask_loss(
                p, batch, cfg, loss_tables, bn_sink, rng, compute_dtype,
                remat, paired)
            return total, (metrics, bn_sink)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def step_fn(state: TrainState, batch, rng):
        if grad_accum == 1:
            (_, (metrics, bn_sink)), grads = grad_fn(state.params, batch, rng)
        else:
            k = grad_accum
            n = batch["img"].shape[0]
            if n % k:
                raise ValueError(
                    f"batch size {n} not divisible by grad_accum={k}")
            micro = {key: v.reshape((k, n // k) + v.shape[1:])
                     for key, v in batch.items()}
            if micro_sharding is not None:
                micro = {key: jax.lax.with_sharding_constraint(
                    v, micro_sharding) for key, v in micro.items()}
            mb_rngs = jax.random.split(rng, k)
            # carry structure (metric keys / bn names / grad tree) comes
            # from an abstract eval_shape trace — zero FLOPs in the
            # compiled program, so the heavy fwd+bwd is compiled exactly
            # once, inside the scan body
            first = {key: v[0] for key, v in micro.items()}
            (_, (m_shape, _)), g_shape = jax.eval_shape(
                grad_fn, state.params, first, mb_rngs[0])
            zeros = lambda s: jnp.zeros(s.shape, s.dtype)
            carry0 = (jax.tree.map(zeros, g_shape),
                      jax.tree.map(zeros, m_shape))

            def body(carry, xs):
                g_sum, m_sum = carry
                mb, mb_rng = xs
                (_, (m, bn)), g = grad_fn(state.params, mb, mb_rng)
                return (jax.tree.map(jnp.add, g_sum, g),
                        jax.tree.map(jnp.add, m_sum, m)), bn

            (g_sum, m_sum), bn_sink = jax.lax.scan(
                body, carry0, (micro, mb_rngs))
            grads = jax.tree.map(lambda x: x / k, g_sum)
            metrics = jax.tree.map(lambda x: x / k, m_sum)
            # scan stacks each bn leaf to (K, C) per layer, in order
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = (_apply_bn_updates(new_params, bn_sink)
                      if grad_accum == 1 else
                      _apply_bn_updates_stacked(new_params, bn_sink,
                                                grad_accum))
        new_state = TrainState(params=new_params, opt_state=new_opt_state,
                               step=state.step + 1)
        if return_grads:
            return new_state, metrics, grads
        return new_state, metrics

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    return jitted, tx


def _loss_table_static(loss_kwargs, cfg):
    return _loss_weight_tables(loss_kwargs or {}, cfg)


def make_valid_step(cfg: ModelConfig, compute_dtype=jnp.float32):
    """Eval forward + activations (reference valid_step,
    models/run_desc.py:332-436): INST -> softmax fg, TYPE -> softmax,
    Patch-Class -> argmax. Returns {head: activation array} per batch."""

    @partial(jax.jit)
    def step(params, imgs):
        pred = net_forward(params, imgs, cfg, compute_dtype=compute_dtype)
        out = {}
        for head, logits in pred.items():
            logits = logits.astype(jnp.float32)
            if head == "Patch-Class":
                out[head] = jnp.argmax(logits.reshape(logits.shape[0], -1),
                                       axis=-1)
            elif head.endswith("-INST"):
                out[head] = jax.nn.softmax(logits, axis=-1)[..., 1:]
            else:
                out[head] = jax.nn.softmax(logits, axis=-1)
        return out

    return step
