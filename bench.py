"""Benchmark: 448^2 tiles/sec/chip for the fused 6-head inference step.

Measures the production configuration (bf16 compute, batch 32, all six heads
+ in-graph activations/crops emitting the stitcher-ready canvas tensor) on
the default accelerator. Prints ONE JSON line.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the divisor is the reference's default tile operating point of ~25
448^2-patches/s implied by its shipped batch-25 single-GPU examples —
an explicitly-labeled estimate, not a measured torch number.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.infer.steps import fused_infer_outputs
from cerberus_tpu.models.net_desc import init_net_params

BATCH = 128
WARMUP = 2
ITERS = 10
EST_REFERENCE_TILES_PER_SEC = 25.0


def _watchdog(seconds: int = 480) -> None:
    """The tunneled dev chip intermittently wedges (ops hang indefinitely);
    emit a diagnostic JSON line instead of hanging the harness."""
    import signal

    def on_alarm(_sig, _frame):
        print(json.dumps({
            "metric": "448^2 tiles/sec/chip (6-head fused forward+activations, bf16, batch 128)",
            "value": 0.0,
            "unit": "tiles/s",
            "vs_baseline": 0.0,
            "note": f"device unresponsive for {seconds}s (tunnel wedged)",
        }), flush=True)
        import os

        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main() -> None:
    _watchdog()
    cfg = ModelConfig.from_kwargs({
        "encoder_backbone_name": "resnet34",
        "decoder_kwargs": DEFAULT_DECODER_KWARGS,
        "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
    })
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_net_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    # sequential decoders: ~1/5 the peak HBM of the grouped bank for the
    # same math (see make_infer_step docstring)

    @jax.jit
    def step(p, imgs):
        return fused_infer_outputs(p, imgs, cfg, output_shape=144,
                                   compute_dtype=jnp.bfloat16,
                                   out_dtype=jnp.float16)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.integers(0, 255, (BATCH, 448, 448, 3)).astype(np.uint8))

    for _ in range(WARMUP):
        np.asarray(step(params, imgs))  # host materialization, not
        # just block_until_ready: the tunneled device backend acks readiness
        # before compute completes, so only a D2H copy is a true barrier

    # best-of-3 timing loops: the shared/tunneled chip shows large external
    # contention swings; the minimum approximates uncontended throughput.
    # At most 2 steps in flight (deep async queues can exhaust HBM).
    best_dt = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        prev = None
        for _ in range(ITERS):
            cur = step(params, imgs)
            if prev is not None:
                _ = np.asarray(prev[0, 0, 0])
            prev = cur
        _ = np.asarray(prev)
        best_dt = min(best_dt, time.perf_counter() - t0)

    tiles_per_sec = BATCH * ITERS / best_dt
    print(json.dumps({
        "metric": "448^2 tiles/sec/chip (6-head fused forward+activations, bf16, batch 128)",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_sec / EST_REFERENCE_TILES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
