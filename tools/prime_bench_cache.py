"""AOT-compile every bench.py program variant into the persistent XLA
compilation cache — no device execution, so it works (slowly) even on a
degraded tunnel and makes later bench.py / driver runs warm.

Variants: forward + forward_postproc at batches 8/32/128 (the degraded-
scaling set and the default), optionally 192/256 (--all), the dense-mode
forward at batches 4/8/16, and the probe's matmul/add.

Usage: python tools/prime_bench_cache.py [--all]
"""
from __future__ import annotations

import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cerberus_tpu.infer.manager import _enable_compilation_cache  # noqa: E402


def _compile(label, jitted, *abstract_args):
    t0 = time.time()
    try:
        jitted.lower(*abstract_args).compile()
        print(f"{label}: compiled in {time.time() - t0:.1f}s", flush=True)
    except Exception as exc:  # noqa: BLE001 — priming is best-effort
        print(f"{label}: FAILED after {time.time() - t0:.1f}s: "
              f"{type(exc).__name__}: {exc}", flush=True)


def main() -> None:
    _enable_compilation_cache()
    import bench
    from cerberus_tpu.models.net_desc import init_net_params

    cfg0, _, _ = bench.build_programs(8)
    params_abs = jax.eval_shape(
        lambda key: init_net_params(key, cfg0),
        jax.ShapeDtypeStruct((2,), jnp.uint32))

    batches = [8, 32, 128] + ([192, 256] if "--all" in sys.argv else [])
    for batch in batches:
        _, forward, forward_postproc = bench.build_programs(batch)
        imgs = jax.ShapeDtypeStruct((batch, 448, 448, 3), jnp.uint8)
        _compile(f"forward[b{batch}]", forward, params_abs, imgs)
        _compile(f"forward_postproc[b{batch}]", forward_postproc,
                 params_abs, imgs)

    _, forward_dense = bench.build_dense_program(864)
    for batch in (4, 8, 16):
        imgs = jax.ShapeDtypeStruct((batch, 1168, 1168, 3), jnp.uint8)
        _compile(f"forward_dense[b{batch}]", forward_dense, params_abs, imgs)

    # the probe's two tiny programs
    mm = jax.jit(lambda a: a @ a)
    add = jax.jit(lambda a, b: a + b)
    x_bf = jax.ShapeDtypeStruct((4096, 4096), jnp.bfloat16)
    x_f32 = jax.ShapeDtypeStruct((4096, 4096), jnp.float32)
    _compile("probe matmul", mm, x_bf)
    _compile("probe add", add, x_f32,
             jax.ShapeDtypeStruct((), jnp.float32))


if __name__ == "__main__":
    main()
