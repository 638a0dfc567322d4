"""Measure the reference PyTorch implementation's tile throughput.

Runs the reference's own ``infer_step`` (models/run_desc.py:439-502) on
torch-CPU (the only torch backend in this image; the reference hardcodes
``.to("cuda")``, patched to CPU exactly like tests/test_train_parity.py).
This turns bench.py's ``vs_baseline`` denominator from an estimate into a
measured number — clearly labeled CPU-measured, since no reference-era GPU
exists in this environment.

Usage: python tools/bench_reference_torch.py [batch] [iters]
Prints one JSON line: reference CPU tiles/s for the production batch-25
448->144 operating point (run_tile.sh:3).
"""
from __future__ import annotations

import json
import sys
import time
import types

import numpy as np


def _stub_skimage():
    """Minimal fake skimage so the reference's misc.utils imports (the image
    lacks skimage; the stubs are never called by infer_step)."""
    sk = types.ModuleType("skimage")
    for sub in ("filters", "morphology", "color"):
        mod = types.ModuleType(f"skimage.{sub}")
        sys.modules[f"skimage.{sub}"] = mod
        setattr(sk, sub, mod)
    sk.filters.rank = types.ModuleType("skimage.filters.rank")
    sys.modules["skimage.filters.rank"] = sk.filters.rank
    _unused = lambda *a, **k: None  # noqa: E731 — import-time placeholders
    sk.filters.threshold_otsu = _unused
    sk.morphology.disk = _unused
    sk.morphology.remove_small_holes = _unused
    sk.morphology.remove_small_objects = _unused
    sys.modules["skimage"] = sk


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    _stub_skimage()
    if not hasattr(np, "math"):  # numpy 2.x removed np.math
        np.math = __import__("math")
    sys.path.insert(0, "/root/reference")

    import torch

    # reference hardcodes .to("cuda") (models/run_desc.py:440); remap to CPU
    _orig_to = torch.Tensor.to

    def _to(self, *args, **kwargs):
        args = tuple("cpu" if a == "cuda" else a for a in args)
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to

    from models.net_desc import create_model
    from models.run_desc import infer_step

    sys.path.insert(0, "/root/repo")
    from cerberus_tpu.config import DEFAULT_DECODER_KWARGS

    tasks = list(DEFAULT_DECODER_KWARGS.keys())
    torch.manual_seed(0)
    net = create_model(
        encoder_backbone_name="resnet34",
        decoder_kwargs=DEFAULT_DECODER_KWARGS,
        considered_tasks=tasks,
    )
    net.eval()

    rng = np.random.default_rng(0)
    imgs = torch.from_numpy(
        rng.integers(0, 255, (batch, 448, 448, 3)).astype(np.uint8))

    infer_step(imgs, net, [144, 144], tasks)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        infer_step(imgs, net, [144, 144], tasks)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "reference torch-CPU 448^2 tiles/s (infer_step, batch %d)"
                  % batch,
        "value": round(batch * iters / dt, 3),
        "unit": "tiles/s",
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
