"""Batch sweep driver for bench.py (CLAUDE.md: find the 128/192/256 sweet
spot once the tunnel is healthy — 192/256 fit HBM only with valid-region
decoding).

Runs bench.py once per batch size in a subprocess (fresh compile cache
state is fine — the persistent XLA cache makes repeats warm) and prints
each JSON line plus a final best-of summary line.

Usage: python tools/bench_sweep.py [batches...]   (default: 128 192 256)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    batches = [int(a) for a in sys.argv[1:]] or [128, 192, 256]
    results = []
    for batch in batches:
        env = dict(os.environ, CERBERUS_BENCH_BATCH=str(batch))
        try:
            # bench.py's internal watchdog scales with batch; give the
            # subprocess more headroom than that so a slow-but-alive run
            # is reported by bench.py itself, not killed here
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True, text=True, cwd=REPO, env=env,
                timeout=480 * max(1, batch // 128) * 2 + 600)
            rec = json.loads(proc.stdout.strip().splitlines()[-1])
        except subprocess.TimeoutExpired:
            rec = {"batch": batch, "error": "subprocess timeout"}
        except (json.JSONDecodeError, IndexError):
            rec = {"batch": batch, "error": proc.stderr[-500:]}
        rec["batch"] = batch
        results.append(rec)
        print(json.dumps(rec), flush=True)
    scored = [r for r in results if isinstance(r.get("value"), (int, float))
              and r["value"] > 0]
    if scored:
        best = max(scored, key=lambda r: r["value"])
        print(json.dumps({"metric": "batch sweep best", "batch": best["batch"],
                          "value": best["value"], "unit": "tiles/s"}))
        # dense-mode sweep at the winning windowed batch: 1168->864
        # windows, batches 4/8/16 (16 = the verified 16 GB HBM ceiling),
        # reported in 448^2-tile equivalents (VERDICT r2 task 5)
        for d_batch in (4, 8, 16):
            env = dict(os.environ, CERBERUS_BENCH_BATCH=str(best["batch"]),
                       CERBERUS_BENCH_DENSE="1",
                       CERBERUS_BENCH_DENSE_BATCH=str(d_batch))
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py")],
                    capture_output=True, text=True, cwd=REPO, env=env,
                    timeout=1800)
                print(json.dumps({"metric": "dense-mode run",
                                  "dense_batch": d_batch,
                                  **json.loads(
                                      proc.stdout.strip().splitlines()[-1])}))
            except subprocess.TimeoutExpired:
                print(json.dumps({"metric": "dense-mode run",
                                  "dense_batch": d_batch,
                                  "error": "subprocess timeout"}))
            except (json.JSONDecodeError, IndexError):
                print(json.dumps({"metric": "dense-mode run",
                                  "dense_batch": d_batch,
                                  "error": proc.stderr[-500:]}))


if __name__ == "__main__":
    main()
