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
    import sys

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import jax
    import jax.numpy as jnp

    # persistent compile cache: over the tunnel, even the probe matmul's
    # compile is remote and costs tens of seconds when degraded
    from cerberus_tpu.infer.manager import _enable_compilation_cache

    _enable_compilation_cache()
    dev = jax.devices()[0]

    def bench_mm(n: int, reps: int) -> float:
        x = jnp.ones((n, n), jnp.bfloat16)
        mm = jax.jit(lambda a: a @ a)
        np.asarray(mm(x))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(mm(x))
            best = min(best, time.perf_counter() - t0)
        return 2 * n ** 3 / best / 1e12

    # adaptive sizing: a 0.03-0.2 TF degraded chip takes 3-20 s PER 4096^2
    # matmul (a fixed 4x4096^2 probe can itself blow the caller's
    # timeout), while a healthy chip finishes 2048^2 so fast the tunnel's
    # dispatch latency dominates and under-reports — so start small and
    # only re-measure big when the small result says it's affordable
    tflops = bench_mm(2048, 2)
    if tflops > 2.0:
        tflops = bench_mm(4096, 3)

    # D2H bandwidth: a fresh 16 MB device result copied host-side
    # (np.asarray is the only true barrier on this backend — CLAUDE.md).
    # Must be a NEW array each time: jax caches the host copy of an
    # already-fetched buffer, which would measure memcpy, not the link.
    add = jax.jit(lambda a, b: a + b)
    base = jnp.ones((2048, 2048), jnp.float32)
    np.asarray(add(base, jnp.float32(1.0)))  # compile + warm
    fresh = add(base, jnp.float32(2.0))
    t0 = time.perf_counter()
    np.asarray(fresh)
    d2h = base.nbytes / (time.perf_counter() - t0) / 1e6

    print(json.dumps({
        "tflops_bf16": round(tflops, 2),
        "d2h_mb_s": round(d2h, 1),
        "platform": dev.platform,
    }), flush=True)


if __name__ == "__main__":
    main()
