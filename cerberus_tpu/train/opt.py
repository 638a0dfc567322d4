"""Training configuration factory + runnable trainer.

Behavioral spec: ``models/opt.py`` — single-phase config: Adam(lr 1e-3,
betas (0.9, 0.999)), StepLR(75000), 140 epochs (:41-74); engine graph: a
``train`` engine whose STEP_COMPLETED callbacks are [ScalarMovingAverage,
TrackLr, PeriodicSaver(2000 steps), VisualizeOutput, LoggingOutput,
TriggerEngine('infer'), ScheduleLr], and an ``infer`` engine accumulating
raw outputs into epoch metrics (:80-119).

The reference ships this engine graph with NO top-level launcher
(SURVEY.md §1); ``build_trainer``/``run_training`` below complete it.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from ..config import ModelConfig
from ..models.net_desc import head_output_channels, init_net_params
from .callbacks import (
    LoggingOutput,
    PeriodicSaver,
    ProcessAccumulatedEpochOutput,
    ScalarMovingAverage,
    ScheduleLr,
    TrackLr,
    TriggerEngine,
)
from .engine import Events, NetHolder, RunEngine
from .metrics import ProcStepRawOutput
from .steps import (
    TrainState,
    head_order,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    make_valid_step,
)

PER_N_STEPS = 2000  # mtl cadence (models/opt.py:23)


def get_config(model_kwargs: Dict, loss_kwargs: Dict,
               optimizer_kwargs: Optional[Dict] = None,
               nr_epochs: int = 140, per_n_steps: int = PER_N_STEPS) -> Dict:
    """Single-phase training config (the reference's phase_list schema)."""
    return {
        "phase_list": [{
            "run_info": {
                "net": {
                    "model_kwargs": model_kwargs,
                    "optimizer_kwargs": optimizer_kwargs or
                        {"lr": 1.0e-3, "betas": (0.9, 0.999)},
                    "lr_decay_steps": 75000,
                    "extra_info": {"loss": loss_kwargs},
                    "pretrained": None,
                },
            },
            "nr_epochs": nr_epochs,
        }],
        "per_n_steps": per_n_steps,
    }


def build_trainer(config: Dict, train_loaders: Dict, valid_loaders: Dict,
                  log_dir: Optional[str] = None, seed: int = 0,
                  pretrained_params=None, best_metric: Optional[str] = None,
                  mesh=None, remat=False, compute_dtype=None,
                  grad_accum: int = 1, paired: bool = False):
    """Build chained train/infer engines for phase 0; returns (train_engine,
    infer_engine, net_holder).

    ``mesh``: a 1-D device mesh for data-parallel training (params/opt state
    replicated, batch sharded); ``remat`` enables per-stage activation
    rematerialization for large-batch training (True = every stage, or
    "backbone"/"towers" to checkpoint only that stage class — see
    net_forward._maybe_remat); ``grad_accum=K`` runs K sequential
    microbatches per optimizer step (train/steps.make_train_step) — the path
    to the reference batch-32 config on a 16 GB chip; ``compute_dtype``
    (e.g. jnp.bfloat16) runs forward/backward activations in that dtype
    while params, optimizer moments, BN statistics and loss reductions stay
    float32 — the standard TPU mixed-precision recipe (the float32 torch
    reference has no analog; divergence documented in PARITY.md)."""
    phase = config["phase_list"][0]
    net_cfg = phase["run_info"]["net"]
    cfg = ModelConfig.from_kwargs(net_cfg["model_kwargs"])
    loss_kwargs = net_cfg["extra_info"]["loss"]
    per_n = config.get("per_n_steps", PER_N_STEPS)

    import jax.numpy as jnp

    dtype = compute_dtype if compute_dtype is not None else jnp.float32
    # pretrained trees overlay a fresh init rather than replacing it: a
    # backbone-only (ImageNet) tree leaves decoders/heads freshly
    # initialized, exactly the reference's backbone_imagenet_pretrained
    # split (models/net_desc.py:82-100); full checkpoints overlay every key
    params = init_net_params(jax.random.PRNGKey(seed), cfg)
    if pretrained_params is not None:
        from ..models.convert import overlay_pretrained

        params = overlay_pretrained(params, pretrained_params)
    # thread the configured decay cadence into the optimizer kwargs so the
    # schedule the step functions BUILD matches the one logged below (the
    # optimizer previously hardcoded the 75000 default regardless)
    opt_kwargs = dict(net_cfg["optimizer_kwargs"],
                      lr_decay_steps=int(net_cfg.get("lr_decay_steps",
                                                     75000)))
    schedule = make_lr_schedule(
        float(opt_kwargs.get("lr", 1e-3)), opt_kwargs["lr_decay_steps"])
    if mesh is not None:
        from ..parallel.mesh import make_sharded_train_step

        train_step, init_state, tx = make_sharded_train_step(
            cfg, mesh, loss_kwargs, opt_kwargs,
            compute_dtype=dtype, grad_accum=grad_accum, remat=remat,
            paired=paired)
        state = init_state(params)
    else:
        train_step, tx = make_train_step(cfg, loss_kwargs,
                                         opt_kwargs,
                                         compute_dtype=dtype,
                                         remat=remat,
                                         grad_accum=grad_accum,
                                         paired=paired)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=np.int32(0))
    resume_from = net_cfg.get("resume_from")
    if resume_from:
        # full resume: params + optimizer moments + step (and thereby the
        # LR schedule position) — handled AFTER the mesh/non-mesh split so
        # data-parallel training resumes too (restored state is re-placed
        # with the replicated sharding)
        from ..models.convert import load_train_state

        r_params, r_opt, r_step = load_train_state(resume_from,
                                                   state.opt_state)
        r_params = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                    for k, v in r_params.items()}
        if mesh is not None:
            state = init_state(r_params)
            if r_opt is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                r_opt = jax.device_put(r_opt, NamedSharding(mesh, P()))
                state = TrainState(params=state.params, opt_state=r_opt,
                                   step=state.step)
            state = TrainState(params=state.params,
                               opt_state=state.opt_state,
                               step=np.int32(r_step))
        else:
            state = TrainState(
                params=r_params,
                opt_state=r_opt if r_opt is not None else state.opt_state,
                step=np.int32(r_step))
    net = NetHolder(state, train_step=train_step, schedule=schedule,
                    rng=jax.random.PRNGKey(seed + 1), cfg=cfg,
                    extra_info=net_cfg["extra_info"])
    valid_step = make_valid_step(cfg, compute_dtype=dtype)
    heads = head_order(cfg)
    n_ch = head_output_channels(cfg)

    def train_run_step(batch, step_run_info):
        run_info, _ = step_run_info
        holder = run_info["net"]
        new_state, metrics = holder.train_step(holder.state, batch,
                                               holder.next_rng())
        holder.state = new_state
        return {"EMA": {k: float(v) for k, v in metrics.items()},
                "raw": {"img": batch["img"][:2]}}

    def valid_run_step(batch, step_run_info):
        run_info, _ = step_run_info
        holder = run_info["net"]
        act = valid_step(holder.state.params, batch["img"])
        pred_labels, true_labels = {}, {}
        for head in heads:
            if head not in batch:
                continue
            out = np.asarray(act[head])
            if head == "Patch-Class":
                pred_labels[head] = out
                true_labels[head] = np.asarray(batch[head]).reshape(-1)
            elif head.endswith("-INST"):
                # fg prob -> class map: argmax over [bg=1-sum(fg), fg...]
                bg = 1.0 - out.sum(-1, keepdims=True)
                pred_labels[head] = np.argmax(
                    np.concatenate([bg, out], -1), -1)
                true_labels[head] = np.asarray(batch[head])[..., 0]
            else:
                pred_labels[head] = np.argmax(out, -1)
                true_labels[head] = np.asarray(batch[head])[..., 0]
        return {"raw": {"pred": pred_labels, "true": true_labels,
                        "dummy": batch["has_target"]}}

    run_info = {"net": net}
    train_engine = RunEngine("train", train_loaders, train_run_step, run_info)
    infer_engine = RunEngine("infer", valid_loaders, valid_run_step, run_info)
    if resume_from:
        # keep engine step counters (logging cadence, TB step axis) aligned
        # with the restored optimizer step instead of restarting at 0
        train_engine.state.curr_global_step = int(state.step)

    proc = ProcStepRawOutput(n_ch, heads)
    infer_engine.add_event_handler(Events.STEP_COMPLETED, proc)
    infer_engine.add_event_handler(
        Events.EPOCH_COMPLETED,
        ProcessAccumulatedEpochOutput(proc.proc_cum_epoch))
    infer_engine.add_event_handler(
        Events.EPOCH_COMPLETED, LoggingOutput(per_n_epoch=1))

    train_engine.add_event_handler(Events.STEP_COMPLETED,
                                   ScalarMovingAverage(alpha=0.95))
    train_engine.add_event_handler(Events.STEP_COMPLETED, TrackLr())
    if log_dir is not None:
        train_engine.state.logging = True
        train_engine.state.log_dir = log_dir
        train_engine.state.log_info = {"yaml_file": f"{log_dir}/stats.yml"}
        infer_engine.state.logging = True
        infer_engine.state.log_dir = log_dir
        infer_engine.state.log_info = train_engine.state.log_info
        train_engine.add_event_handler(
            Events.STEP_COMPLETED,
            PeriodicSaver(per_n_epoch=None, per_n_step=per_n))
        train_engine.add_event_handler(
            Events.STEP_COMPLETED,
            LoggingOutput(per_n_epoch=None, per_n_step=per_n))
    trigger = TriggerEngine("infer", per_n_epoch=None, per_n_step=per_n)
    trigger.triggered_engine = infer_engine
    train_engine.add_event_handler(Events.STEP_COMPLETED, trigger)
    train_engine.add_event_handler(Events.STEP_COMPLETED, ScheduleLr())
    if best_metric is not None and log_dir is not None:
        from .callbacks import ConditionalSaver

        # fires after the epoch's LoggingOutput has flushed stats.yml;
        # metric names are the flushed keys, e.g. "valid-Gland-INST-dice-1"
        infer_engine.add_event_handler(Events.EPOCH_COMPLETED,
                                       ConditionalSaver(best_metric))

    return train_engine, infer_engine, net


def run_training(config: Dict, train_loaders: Dict, valid_loaders: Dict,
                 log_dir: Optional[str] = None, seed: int = 0,
                 pretrained_params=None, best_metric=None, mesh=None,
                 remat=False, compute_dtype=None, grad_accum: int = 1,
                 paired: bool = False):
    """Run every phase of ``config["phase_list"]`` sequentially.

    The reference's schema runs phases "sequentially from index 0 to N"
    with ``pretrained: -1`` meaning "auto load checkpoint from previous
    phase" and ``None`` meaning "start from scratch"
    (``models/opt.py:39-41,66-68`` — schema only; the reference ships no
    launcher, so the multi-phase runner itself is defined here). With more
    than one phase, each phase checkpoints/logs under ``<log_dir>/<idx>``.
    Returns the final phase's net holder."""
    import os as _os

    phases = config["phase_list"]
    carry = pretrained_params
    net = None
    for idx, phase in enumerate(phases):
        spec = phase["run_info"]["net"].get("pretrained", -1 if idx else None)
        if isinstance(spec, str):  # explicit checkpoint path
            from ..models.convert import load_checkpoint

            pre = load_checkpoint(spec)
        else:
            pre = carry if (idx == 0 or spec == -1) else None
        phase_dir = (log_dir if len(phases) == 1 or log_dir is None
                     else _os.path.join(log_dir, "%02d" % idx))
        if phase_dir and not _os.path.isdir(phase_dir):
            _os.makedirs(phase_dir, exist_ok=True)
        train_engine, _infer_engine, net = build_trainer(
            dict(config, phase_list=[phase]), train_loaders, valid_loaders,
            phase_dir, seed, pre, best_metric=best_metric, mesh=mesh,
            remat=remat, compute_dtype=compute_dtype, grad_accum=grad_accum,
            paired=paired)
        try:
            train_engine.run(nr_epoch=phase["nr_epochs"])
        finally:
            # an exception mid-run must not orphan in-flight async
            # checkpoint writes (RunEngine.run flushes only on clean
            # completion) — and a flush failure must not MASK the original
            # training exception
            import sys as _sys

            from ..models.convert import flush_pending_saves

            unwinding = _sys.exc_info()[0] is not None
            try:
                flush_pending_saves()
            except Exception:
                if not unwinding:
                    raise
                import logging

                logging.exception("async checkpoint flush failed during "
                                  "exception unwind")
        carry = net.state.params
    return net
