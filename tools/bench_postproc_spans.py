"""Device-side span microbenchmark for the on-chip postproc sub-ops.

Prints per-program ON-DEVICE milliseconds (TPU-lane jit_* spans from a
Chrome trace — the tunnel-immune methodology bench.py uses), for the three
production families plus their constituent kernels, on a synthetic blobby
canvas shaped like the bench's stitched batch-128 canvas. This is the
committed version of the ad-hoc round-3 profiling that identified the
(h*w+1)-id segment reductions as the postproc bottleneck (BASELINE.md
"Round-3 device-side attribution").

Usage:
  python tools/bench_postproc_spans.py [--h=1152] [--w=2304] [--steps=3]
                                       [--cpu]    # wall-clock smoke, no trace
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canvas(h: int, w: int, seed: int = 0):
    """Blobby inner/contour planes (kron-upsampled noise, like bench.py) so
    CC/watershed/hole-fill do representative work."""
    rng = np.random.default_rng(seed)
    base = rng.random((h // 8, w // 8)).astype(np.float32)
    inner = np.kron(base, np.ones((8, 8), np.float32))
    base2 = rng.random((h // 8, w // 8)).astype(np.float32)
    cnt = (np.kron(base2, np.ones((8, 8), np.float32)) > 0.8).astype(
        np.float32)
    return inner, cnt


def main() -> None:
    h, w, steps, cpu = 1152, 2304, 3, False
    for arg in sys.argv[1:]:
        if arg.startswith("--h="):
            h = int(arg.split("=")[1])
        elif arg.startswith("--w="):
            w = int(arg.split("=")[1])
        elif arg.startswith("--steps="):
            steps = int(arg.split("=")[1])
        elif arg == "--cpu":
            cpu = True

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/cerberus_tpu/xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from cerberus_tpu.ops import lax_postproc as L
    from cerberus_tpu.ops import tpu_postproc as T

    impl = T._cc_impl()
    inner_np, cnt_np = _canvas(h, w)
    inner = jnp.asarray(inner_np)
    cnt = jnp.asarray(cnt_np)
    fg = jnp.asarray((inner_np - (cnt_np > 0.5)) > 0.55)

    from functools import partial

    cc = jax.jit(partial(T._cc, impl=impl))
    lab = cc(fg)
    rs = partial(L.remove_small_objects, min_size=1500)
    lab_rs = rs(lab)
    dil = partial(L.dilate_labels, ksize=11)
    lab_dil = dil(lab_rs)

    programs = [
        ("cc", cc, (fg,)),
        ("remove_small_objects", rs, (lab,)),
        ("dilate_labels_k11", dil, (lab_rs,)),
        ("fill_label_holes", partial(L.fill_label_holes, cc_impl=impl),
         (lab_dil,)),
        ("fill_holes", partial(L.fill_holes, cc_impl=impl), (lab_rs > 0,)),
        ("watershed", L.watershed, (-inner, lab_rs, fg)),
        ("gland_family", partial(T._inner_contour_instances, thresh=0.55,
                                 min_size=1000, ksize=11, cc_impl=impl),
         (inner, cnt)),
        ("nuclei_family", partial(T._nuclei_watershed, cc_impl=impl),
         (inner, cnt)),
    ]

    # compile + one warm run each (D2H is the only true barrier here)
    for name, fn, args in programs:
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        print(f"# warm {name}: {time.perf_counter() - t0:.2f}s wall",
              file=sys.stderr)

    if cpu:
        out = {}
        for name, fn, args in programs:
            t0 = time.perf_counter()
            for _ in range(steps):
                np.asarray(fn(*args))
            out[name] = round((time.perf_counter() - t0) / steps * 1e3, 1)
        print(json.dumps({"mode": "cpu_wall_ms", "shape": [h, w], **out}))
        return

    prof_dir = tempfile.mkdtemp(prefix="pp_spans_")
    with jax.profiler.trace(prof_dir):
        for _name, fn, args in programs:
            for _ in range(steps):
                np.asarray(fn(*args))

    paths = sorted(glob.glob(f"{prof_dir}/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(paths[-1]) as handle:
        trace = json.load(handle)
    events = trace.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e.get("args", {}).get("name", "")}
    by_name: dict = {}
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in tpu_pids
                and e.get("name", "").startswith("jit_")):
            by_name[e["name"]] = by_name.get(e["name"], 0.0) + e["dur"]
    spans = {k: round(v / steps / 1e3, 2) for k, v in sorted(
        by_name.items(), key=lambda kv: -kv[1])}
    print(json.dumps({"mode": "device_ms_per_step", "shape": [h, w],
                      "cc_impl": impl, **spans}))


if __name__ == "__main__":
    main()
