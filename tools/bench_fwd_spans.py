"""Per-op device-side attribution of the flagship fused forward.

The round-3 postproc work (tools/bench_postproc_spans.py) left the
448->144 valid-region forward as ~61% of the device e2e budget
(BASELINE.md "Run-min scan kernels"). This tool answers WHERE those
forward milliseconds go: it traces the batch-N fused forward on-device
and prints

  * the jit_forward program total (tunnel-immune device-lane span),
  * the top individual XLA ops (fusions/convolutions) by summed device
    time, with their HLO shapes resolved from the compiled module text,
  * a coarse component split (backbone stages vs decoder towers) from
    separately-jitted stage programs.

Usage:
  python tools/bench_fwd_spans.py [--batch=128] [--steps=3] [--top=30]
                                  [--stages]   # also run the stage split
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tpu_op_spans(prof_dir: str, steps: int):
    paths = sorted(glob.glob(f"{prof_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1]) as handle:
        trace = json.load(handle)
    events = trace.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e.get("args", {}).get("name", "")}
    jit_totals: dict = {}
    op_totals: dict = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            jit_totals[name] = jit_totals.get(name, 0.0) + e["dur"]
        else:
            op_totals[name] = op_totals.get(name, 0.0) + e["dur"]
    jit_ms = {k: round(v / steps / 1e3, 2) for k, v in jit_totals.items()}
    op_ms = {k: round(v / steps / 1e3, 3) for k, v in sorted(
        op_totals.items(), key=lambda kv: -kv[1])}
    return jit_ms, op_ms


def _hlo_shapes(hlo_text: str):
    """op name -> the '= shape op(...)' definition line (truncated)."""
    shapes = {}
    for m in re.finditer(r"^\s*(?:ROOT )?%?([\w.\-]+) = (\S+) ([\w\-]+)\(",
                         hlo_text, re.M):
        name, shape, kind = m.groups()
        shapes[name] = f"{kind} {shape}"
    return shapes


def main() -> None:
    batch, steps, top, stages = 128, 3, 30, False
    for arg in sys.argv[1:]:
        if arg.startswith("--batch="):
            batch = int(arg.split("=")[1])
        elif arg.startswith("--steps="):
            steps = int(arg.split("=")[1])
        elif arg.startswith("--top="):
            top = int(arg.split("=")[1])
        elif arg == "--stages":
            stages = True

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/cerberus_tpu/xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
        __file__))))
    import bench as B
    from cerberus_tpu.models.net_desc import init_net_params

    cfg, forward, _fp = B.build_programs(batch)
    params = jax.device_put(init_net_params(jax.random.PRNGKey(0), cfg))
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (batch, 448, 448, 3),
                                          dtype=np.uint8))

    t0 = time.perf_counter()
    compiled = forward.lower(params, imgs).compile()
    np.asarray(jax.tree.leaves(forward(params, imgs))[0])
    print(f"# warm forward: {time.perf_counter() - t0:.1f}s wall",
          file=sys.stderr)
    hlo = compiled.as_text()
    shapes = _hlo_shapes(hlo)

    prof_dir = tempfile.mkdtemp(prefix="fwd_spans_")
    with jax.profiler.trace(prof_dir):
        for _ in range(steps):
            np.asarray(jax.tree.leaves(forward(params, imgs))[0])

    jit_ms, op_ms = _tpu_op_spans(prof_dir, steps)
    out = {"mode": "device_ms_per_step", "batch": batch,
           "jit_programs": jit_ms}
    top_ops = []
    for name, ms in list(op_ms.items())[:top]:
        base = name.split("/")[-1]
        top_ops.append({"op": name, "ms": ms,
                        "hlo": shapes.get(base, shapes.get(name, "?"))[:120]})
    out["top_ops"] = top_ops
    out["op_total_ms"] = round(sum(op_ms.values()), 1)
    print(json.dumps(out, indent=1))

    if not stages:
        return

    # ---- coarse stage split: backbone alone vs full forward -------------
    from cerberus_tpu.models.backbones import get_backbone

    _init, backbone_fwd, _filters = get_backbone(cfg.encoder_backbone_name)

    @jax.jit
    def backbone_only(p, x):
        xin = x.astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)
        return backbone_fwd(p, xin, "backbone", None)[-1]

    np.asarray(backbone_only(params, imgs))
    prof_dir = tempfile.mkdtemp(prefix="fwd_stage_")
    with jax.profiler.trace(prof_dir):
        for _ in range(steps):
            np.asarray(backbone_only(params, imgs))
    jit_ms2, _ = _tpu_op_spans(prof_dir, steps)
    print(json.dumps({"stage_split": {
        "backbone_only": jit_ms2,
        "full_forward": jit_ms.get("jit_forward")}}))


if __name__ == "__main__":
    main()
