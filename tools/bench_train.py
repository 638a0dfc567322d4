"""Training-step throughput benchmark (flagship 6-head config).

Measures jitted train-step steps/s and imgs/s on the current default device
— the full pipeline a production fine-tune runs: forward over all heads,
masked multi-task loss, backward, Adam update, BN running-stat fold in ONE
XLA program (train/steps.make_train_step). The reference ships no training
launcher or benchmark (SURVEY.md §1); its train_step is torch GPU-only
(models/run_desc.py:92-165).

Usage:
  python tools/bench_train.py [--batch=N] [--size=N] [--bf16]
                              [--remat[=all|backbone|towers]]
                              [--steps=N] [--watchdog=SECONDS]
                              [--backbone=NAME] [--device_spans]
                              [--paired]

--device_spans additionally traces N steps and reports tunnel-immune
ON-DEVICE ms/step + imgs/s from the TPU lane's jit_ spans.

Prints ONE JSON line. The tunneled dev chip swings 5-25x with external
contention — a matmul condition probe is reported alongside (CLAUDE.md).
"""
from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.models.net_desc import init_net_params
from cerberus_tpu.train.steps import (
    TrainState,
    head_order,
    make_train_step,
)

LOSS_KWARGS = {
    "loss_info": {
        "Lumen-INST": {"weight": 1.5, "loss": {"ce": 1}},
        "Gland-INST": {"weight": 1.4, "loss": {"ce": 1}},
        "Nuclei-INST": {"weight": 1, "loss": {"ce": 1}},
        "Nuclei-TYPE": {"weight": 1, "loss": {"ce": 1, "dice": 1}},
        "Gland-TYPE": {"weight": 1, "loss": {"ce": 1, "dice": 1}},
        "Patch-Class": {"weight": 0.4, "loss": {"ce": 1}},
    },
}


def _watchdog(seconds: int = 480) -> None:
    def on_alarm(_sig, _frame):
        print(json.dumps({"metric": "train steps/sec", "value": 0.0,
                          "unit": "steps/s",
                          "note": f"device unresponsive for {seconds}s"}),
              flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main() -> None:
    # persist the train-step executables (the heaviest programs in the
    # repo, minutes to compile over a degraded tunnel) across invocations
    from cerberus_tpu.infer.manager import _enable_compilation_cache

    _enable_compilation_cache()
    wd = 480
    for arg in sys.argv[1:]:
        if arg.startswith("--watchdog="):
            wd = int(arg.split("=")[1])
    _watchdog(wd)
    batch, hw, steps = 12, 448, 6
    bf16 = remat = device_spans = paired = False
    for arg in sys.argv[1:]:
        if arg.startswith("--batch="):
            batch = int(arg.split("=")[1])
        elif arg.startswith("--size="):
            hw = int(arg.split("=")[1])
        elif arg.startswith("--steps="):
            steps = int(arg.split("=")[1])
        elif arg == "--bf16":
            bf16 = True
        elif arg == "--remat":
            remat = True
        elif arg.startswith("--remat="):
            val = arg.split("=")[1]  # all | backbone | towers
            remat = True if val in ("all", "true", "1") else val
        elif arg == "--device_spans":
            device_spans = True
        elif arg == "--paired":
            paired = True
    grad_accum = 1
    for arg in sys.argv[1:]:
        if arg.startswith("--grad_accum="):
            grad_accum = int(arg.split("=")[1])
    backbone = "resnet34"
    for arg in sys.argv[1:]:
        if arg.startswith("--backbone="):
            backbone = arg.split("=")[1]

    cfg = ModelConfig.from_kwargs({
        "encoder_backbone_name": backbone,
        "decoder_kwargs": DEFAULT_DECODER_KWARGS,
        "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
    })
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_net_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)

    heads = head_order(cfg)
    rng = np.random.default_rng(0)
    batch_data = {
        "img": rng.integers(0, 255, (batch, hw, hw, 3)).astype(np.uint8),
        "has_target": np.ones((batch, len(heads)), np.float32),
    }
    ch = {"Lumen-INST": 3, "Gland-INST": 3, "Nuclei-INST": 3,
          "Nuclei-TYPE": 7, "Gland-TYPE": 3}
    for head, n_cls in ch.items():
        batch_data[head] = rng.integers(
            0, n_cls, (batch, hw, hw, 1)).astype(np.int32)
        if head.endswith("-INST"):
            batch_data[head + "#WEIGHT-MAP"] = np.ones(
                (batch, hw, hw, 1), np.float32)
    batch_data["Patch-Class"] = rng.integers(
        0, 9, (batch, 1, 1, 1)).astype(np.int32)
    batch_data = jax.device_put(batch_data)

    step_fn, tx = make_train_step(
        cfg, LOSS_KWARGS, {"lr": 1e-3},
        compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
        donate=True, remat=remat, grad_accum=grad_accum, paired=paired)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(1)

    # warmup/compile (donated state: keep the chain)
    state, metrics = step_fn(state, batch_data, key)
    _ = float(metrics["overall_loss"])  # true barrier via D2H

    best = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step_fn(state, batch_data, key)
        _ = float(metrics["overall_loss"])
        best = min(best, time.perf_counter() - t0)
    sps = steps / best

    device_ms = None
    if device_spans:
        # tunnel-immune: sum the TPU lane's jit_ spans (CLAUDE.md round-2
        # methodology — wall clock on the shared tunnel is dispatch-bound).
        # Fault-isolated: the wall result above is already in hand, so a
        # wedge/empty-trace here must not discard it (never-abort rule) —
        # disarm the one-shot watchdog first and degrade to spans=None.
        signal.alarm(0)
        try:
            import glob
            import gzip
            import tempfile

            prof = tempfile.mkdtemp()
            with jax.profiler.trace(prof):
                for _ in range(steps):
                    state, metrics = step_fn(state, batch_data, key)
                _ = float(metrics["overall_loss"])
            paths = sorted(glob.glob(f"{prof}/**/*.trace.json.gz",
                                     recursive=True))
            if paths:
                with gzip.open(paths[-1]) as handle:
                    trace = json.load(handle)
                events = trace.get("traceEvents", [])
                tpu_pids = {e["pid"] for e in events
                            if e.get("ph") == "M"
                            and e.get("name") == "process_name"
                            and "TPU" in e.get("args", {}).get("name", "")}
                tot = sum(e["dur"] for e in events
                          if e.get("ph") == "X" and e.get("pid") in tpu_pids
                          and e.get("name", "").startswith("jit_"))
                if tot > 0:
                    device_ms = tot / steps / 1e3
        except Exception as exc:                      # noqa: BLE001
            print(f"device_spans failed: {exc!r}", file=sys.stderr)

    x = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    np.asarray(mm(x))
    t0 = time.perf_counter()
    np.asarray(mm(x))
    probe_tflops = 2 * 4096 ** 3 / (time.perf_counter() - t0) / 1e12

    print(json.dumps({
        "metric": f"train steps/sec ({backbone}, {hw}^2, batch {batch}, "
                  f"{'bf16' if bf16 else 'fp32'}"
                  f"{f', remat={remat}' if remat else ''}"
                  f"{', paired' if paired else ''})",
        "value": round(sps, 3),
        "unit": "steps/s",
        "imgs_per_sec": round(sps * batch, 2),
        "final_loss": float(metrics["overall_loss"]),
        "chip_condition_probe_tflops_bf16": round(probe_tflops, 1),
        **({"device_ms_per_step": round(device_ms, 2),
            "device_imgs_per_sec": round(batch / device_ms * 1e3, 1)}
           if device_ms else {}),
    }))


if __name__ == "__main__":
    main()
