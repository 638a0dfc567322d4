"""Chip condition probe: one JSON line with live matmul TF/s and D2H MB/s.

The tunneled dev chip swings 5-36 TF bf16 (healthy) down to 0.1 TF or a
full wedge under external contention (CLAUDE.md).  This probe is the
committed replacement for the ephemeral /tmp/verify_vr/probe.py noted in
VERDICT r2 — run it standalone, or let bench.py / tools/chip_watch.sh
invoke it as a subprocess (so a hung probe can be killed without taking
the parent's device client down with it).

Prints: {"tflops_bf16": X, "d2h_mb_s": Y, "platform": "..."}
Exit 0 on success; any hang is the caller's timeout to enforce.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    x = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    np.asarray(mm(x))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(mm(x))
        best = min(best, time.perf_counter() - t0)
    tflops = 2 * 4096 ** 3 / best / 1e12

    # D2H bandwidth: a 64 MB buffer copied host-side (np.asarray is the
    # only true barrier on this backend — CLAUDE.md)
    buf = jnp.ones((4096, 4096), jnp.float32)
    np.asarray(buf)
    t0 = time.perf_counter()
    np.asarray(buf)
    d2h = buf.nbytes / (time.perf_counter() - t0) / 1e6

    print(json.dumps({
        "tflops_bf16": round(tflops, 2),
        "d2h_mb_s": round(d2h, 1),
        "platform": dev.platform,
    }), flush=True)


if __name__ == "__main__":
    main()
