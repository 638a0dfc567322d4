"""Per-op device-side attribution of the DENSE fused forward.

Dense-mode counterpart of tools/bench_fwd_spans.py: traces the margin-304
dense-geometry forward (default 1168->864) on-device, prints the tunnel-
immune jit program total plus the top XLA ops by summed device time with
their HLO shapes AND source lines resolved from the compiled module text —
the round-3 tool that attributed the paired-encoder/maxpool layout costs
(BASELINE.md "Width-paired encoder front").

Caveat learned round 3: op-span SUMS are not critical-path time — TPU
scalar-core ops overlap the vector units (removing five 1.2 ms f32[64]
BN-fold fusions left the program total exactly unchanged). Use the jit
total for A/Bs; use the op list to locate structure, not to budget.

Usage:
  python tools/bench_dense_spans.py [--batch=4] [--in=1168] [--out=864]
                                    [--steps=1] [--top=28]
                                    [--paired_encoder=0|1]
"""
from __future__ import annotations

import json
import os
import re
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    batch, in_sz, out_sz, steps, top = 4, 1168, 864, 1, 28
    for arg in sys.argv[1:]:
        if arg.startswith("--batch="):
            batch = int(arg.split("=")[1])
        elif arg.startswith("--in="):
            in_sz = int(arg.split("=")[1])
        elif arg.startswith("--out="):
            out_sz = int(arg.split("=")[1])
        elif arg.startswith("--steps="):
            steps = int(arg.split("=")[1])
        elif arg.startswith("--top="):
            top = int(arg.split("=")[1])
        elif arg.startswith("--paired_encoder="):
            os.environ["CERBERUS_PAIRED_ENCODER"] = arg.split("=")[1]

    import jax
    import jax.numpy as jnp  # noqa: F401 (forces backend init before config)

    os.environ.setdefault("CERBERUS_PAIRED", "1")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/cerberus_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
    from cerberus_tpu.infer.steps import fused_infer_outputs
    from cerberus_tpu.models.net_desc import init_net_params

    cfg = ModelConfig.from_kwargs({
        "encoder_backbone_name": "resnet34",
        "decoder_kwargs": DEFAULT_DECODER_KWARGS,
        "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
    })
    params = jax.device_put(init_net_params(jax.random.PRNGKey(0), cfg))
    imgs = jax.device_put(np.zeros((batch, in_sz, in_sz, 3), np.uint8))
    fwd = jax.jit(lambda p, im: fused_infer_outputs(p, im, cfg, out_sz))

    r = fwd(params, imgs)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0][:1])   # true barrier
    prof = tempfile.mkdtemp()
    with jax.profiler.trace(prof):
        for _ in range(steps):
            r = fwd(params, imgs)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0][:1])

    # reuse the one canonical TPU-lane trace parser (same methodology as
    # bench.py / bench_wsi / bench_postproc_spans)
    from bench_fwd_spans import _tpu_op_spans

    jit_ms, op_ms = _tpu_op_spans(prof, steps)
    print(json.dumps({
        "batch": batch, "in": in_sz, "out": out_sz,
        "paired_encoder": os.environ.get("CERBERUS_PAIRED_ENCODER", "auto"),
        "fwd_ms_per_step": round(sum(jit_ms.values()), 2),
    }))

    hlo = fwd.lower(params, imgs).compile().as_text()

    def resolve(op: str) -> str:
        # trace names may carry a namespace path; HLO instruction names
        # are the last component. Anchor at line start so a name that is
        # a suffix of another op's name cannot match the wrong line.
        base = op.split("/")[-1]
        m = re.search(rf"(?m)^\s*%?{re.escape(base)} = [^\n]+", hlo)
        if not m:
            return "?"
        line = m.group(0)
        src = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        shp = line.split(" = ")[1][:42]
        if src:
            shp += "  @" + src.group(1).split("/")[-1] + ":" + src.group(2)
        return shp

    for name, ms in list(op_ms.items())[:top]:
        print(f"{ms:8.2f} ms  {name[:34]:34s} {resolve(name)}")


if __name__ == "__main__":
    main()
