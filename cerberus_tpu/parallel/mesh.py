"""Device mesh + sharded step builders.

The reference's entire parallelism story is single-process
``torch.nn.DataParallel`` over visible GPUs for inference (``infer/base.py:46``)
plus manual job sharding across machines (``run_infer_wsi.py:89-95``) — see
SURVEY.md §2.9. The TPU-native equivalent here:

  * 1-D ``data`` mesh over all local chips; parameters replicated, batches
    sharded on the leading axis — XLA inserts the (nil-cost, ICI-local)
    collectives. This subsumes DataParallel with zero scatter/gather host
    code.
  * the same layout drives training: gradients are averaged by XLA because
    the masked loss already sums over the global batch axis under
    ``NamedSharding``; no pmean plumbing is needed with jit-over-mesh.
  * multi-host (v5e pods): ``jax.distributed.initialize`` +
    the same mesh spanning all processes; the WSI work queue stays
    slide-level host-sharded (``--wsi_bulk_idx`` semantics preserved).

A 448^2 CNN never needs tensor/pipeline sharding (SURVEY.md §2.9: TP/PP
"N/A — model fits on one chip"); the spatial analog of sequence parallelism
is the WSI tile grid, handled in wsi/ by sharding the *patch batch* axis.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..infer.steps import fused_infer_outputs

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_params(params, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def shard_batch(batch, mesh: Mesh):
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.device_put(batch, sharding)


def make_sharded_infer_step(params, cfg: ModelConfig, mesh: Mesh,
                            output_shape: int = 144,
                            compute_dtype=jnp.bfloat16):
    """Batch-sharded inference step: params replicated, batch split on the
    data axis. Any batch size works: batches are zero-padded up to a mesh
    multiple on the way in and sliced back on the way out (the CLI defaults
    — batch 10/30 — are not multiples of an 8-chip host; the reference's
    DataParallel accepted arbitrary batch sizes too)."""
    params = replicate_params(params, mesh)
    n_dev = int(np.prod(mesh.devices.shape))
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    out_sharding = NamedSharding(mesh, P(DATA_AXIS))

    @jax.jit
    def step(p, imgs):
        imgs = jax.lax.with_sharding_constraint(imgs, batch_sharding)
        # data_parallel: the paired-encoder auto gate keys on per-DEVICE
        # batch (imgs here is the global batch)
        out = fused_infer_outputs(p, imgs, cfg, output_shape, compute_dtype,
                                  data_parallel=n_dev)
        return jax.lax.with_sharding_constraint(out, out_sharding)

    def run(imgs: np.ndarray):
        n = len(imgs)
        pad = (-n) % n_dev
        if pad:
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        imgs = jax.device_put(imgs, batch_sharding)
        out = step(params, imgs)
        return out[:n] if pad else out

    return run


def make_sharded_train_step(cfg: ModelConfig, mesh: Mesh, loss_kwargs=None,
                            optimizer_kwargs=None,
                            compute_dtype=jnp.float32, grad_accum: int = 1,
                            remat=False, paired: bool = False):
    """Data-parallel training step over the mesh.

    Parameters/optimizer state replicated; batch sharded on the leading
    axis. The jitted step computes globally-consistent gradients (the loss
    reductions span the full global batch), so every device applies the same
    update — standard DP without any explicit collective code.

    ``grad_accum=K`` composes with DP: the global batch reshapes to
    (K, N/K, ...) and each microbatch stays sharded on the data axis
    (constrained to P(None, 'data')), so every chip runs K sequential
    microbatch backwards and the gradient average spans mesh x microbatch.
    """
    from ..train.steps import TrainState, make_train_step

    micro_sharding = (NamedSharding(mesh, P(None, DATA_AXIS))
                      if grad_accum > 1 else None)
    # donate as on the single-device path: in/out states share shardings,
    # and callbacks consume state N before step N+1 invalidates it, so the
    # params+moments buffers update in place instead of double-buffering
    train_step, tx = make_train_step(cfg, loss_kwargs, optimizer_kwargs,
                                     compute_dtype, donate=True,
                                     grad_accum=grad_accum,
                                     micro_sharding=micro_sharding,
                                     remat=remat, paired=paired)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))

    def init_state(params) -> TrainState:
        params = jax.device_put(params, repl)
        return TrainState(params=params, opt_state=jax.device_put(
            tx.init(params), repl), step=jnp.zeros((), jnp.int32))

    n_data = mesh.shape[DATA_AXIS]

    def run(state, batch, rng):
        n = batch["img"].shape[0]
        if n % (grad_accum * n_data):
            # P(None, 'data') on the (K, N/K, ...) microbatch axis would
            # otherwise rely on GSPMD implicit padding for uneven shards
            raise ValueError(
                f"batch size {n} must be divisible by grad_accum*devices "
                f"({grad_accum}*{n_data})")
        batch = {k: jax.device_put(v, data) for k, v in batch.items()}
        return train_step(state, batch, rng)

    return run, init_state, tx
