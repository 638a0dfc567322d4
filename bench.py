"""Benchmark: 448^2 tiles/sec/chip, 6-head forward + on-chip instance
postprocessing (the BASELINE.json metric), plus forward-only throughput.

Pipeline measured per iteration (batch 128):
  uint8 tiles -> fused forward (bf16, valid-region decoders) + activations
  -> on-chip stitch into one canvas -> gland/lumen eroded-contour postproc,
  nuclei marker watershed, lumen-by-gland gate (ops/tpu_postproc kernels)
  -> instance label maps materialized on host.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
Denominator = 25 tiles/s, the operating point implied by its shipped
batch-25 single-GPU examples — an estimate, clearly labeled. A MEASURED
reference number also exists: 0.13 tiles/s for the reference's own
``infer_step`` on torch-CPU/1-core in this image
(tools/bench_reference_torch.py) — reported alongside, not used as the
divisor (a 2022 GPU is the honest peer, not one CPU core).
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

import os


def _grid(batch: int) -> tuple:
    """Largest divisor pair (gh, gw), gh <= gw, for the stitch canvas."""
    gh = int(batch ** 0.5)
    while batch % gh:
        gh -= 1
    return gh, batch // gh


# batch sweep hooks (CLAUDE.md: 192/256 fit HBM with valid-region decoders;
# sweep for the sweet spot when the tunnel is healthy)
BATCH = int(os.environ.get("CERBERUS_BENCH_BATCH", "128"))
WARMUP = 2
ITERS = int(os.environ.get("CERBERUS_BENCH_ITERS", "10"))
EST_REFERENCE_TILES_PER_SEC = 25.0
MEASURED_TORCH_CPU_1CORE = 0.13


PARTIAL: dict = {}  # fields already measured, reported even on a wedge

MODEL_KWARGS = {
    "encoder_backbone_name": "resnet34",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
}


def build_programs(batch: int):
    """The two benchmarked XLA programs at ``batch``: fused forward and
    forward + on-chip postproc to instance label maps. Module-level so
    tools/prime_bench_cache.py can AOT-compile every variant into the
    persistent compilation cache without executing anything."""
    from cerberus_tpu.data.patching import make_channel_index_map
    from cerberus_tpu.ops.tpu_postproc import (
        _cc_impl,
        _inner_contour_instances,
        _nuclei_watershed,
    )

    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    idx_dict, n_ch = make_channel_index_map(cfg.active_decoder_kwargs)
    cc = _cc_impl()
    gh, gw = _grid(batch)

    @jax.jit
    def forward(p, imgs):
        return fused_infer_outputs(p, imgs, cfg, output_shape=144,
                                   compute_dtype=jnp.bfloat16,
                                   out_dtype=jnp.float16)

    @jax.jit
    def forward_postproc(p, imgs):
        out = forward(p, imgs)  # (batch, 144, 144, C)
        canvas = (out.reshape(gh, gw, 144, 144, n_ch)
                  .transpose(0, 2, 1, 3, 4)
                  .reshape(gh * 144, gw * 144, n_ch).astype(jnp.float32))
        s, e = idx_dict["Gland-INST"]
        gland = _inner_contour_instances(canvas[..., s], canvas[..., s + 1],
                                         0.55, 1000, 11, cc)
        s, e = idx_dict["Lumen-INST"]
        lumen = _inner_contour_instances(canvas[..., s], canvas[..., s + 1],
                                         0.5, 150, 3, cc)
        s, e = idx_dict["Nuclei-INST"]
        nuclei = _nuclei_watershed(canvas[..., s], canvas[..., s + 1], cc)
        # lumen gated by the gland mask (reference infer/tile.py:187-191)
        lumen = jnp.where(gland > 0, lumen, 0)
        return gland, lumen, nuclei

    return cfg, forward, forward_postproc


def build_checksum_program(forward_postproc):
    """Transfer-minimal wall variant (VERDICT r4 task 3): per-iter D2H is
    ONE 24-byte signature — the only true barrier on this backend
    (block_until_ready acks before compute finishes; a D2H copy does not).
    Module-level so tools/prime_bench_cache.py can AOT-compile it."""

    @jax.jit
    def forward_postproc_checksum(p, x):
        maps = forward_postproc(p, x)
        # exact int32 signature (x64 is off, f32 sums of flat-index labels
        # would lose integer precision): nonzero count + max label per map
        return jnp.stack([jnp.stack([jnp.sum((m > 0).astype(jnp.int32)),
                                     jnp.max(m).astype(jnp.int32)])
                          for m in maps]).ravel()

    return forward_postproc_checksum


def build_dense_program(d_out: int = 864):
    """Dense-mode forward (1168^2 windows, 864^2 kept core)."""
    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)

    @jax.jit
    def forward_dense(p, x):
        return fused_infer_outputs(p, x, cfg, output_shape=d_out,
                                   compute_dtype=jnp.bfloat16,
                                   out_dtype=jnp.float16)

    return cfg, forward_dense


def _wedge_record(note: str) -> dict:
    # if the e2e wall number was already measured before the wedge, report
    # it as the headline instead of a misleading 0.0
    value = float(PARTIAL.get("e2e_tiles_per_sec", 0.0))
    return {
        "metric": "448^2 tiles/sec/chip (6-head forward+postproc, bf16, "
                  f"batch {BATCH})",
        "value": round(value, 2),
        "unit": "tiles/s",
        "vs_baseline": round(value / EST_REFERENCE_TILES_PER_SEC, 2),
        "note": note,
        **PARTIAL,
    }


def _probe_with_retry(deadline: float):
    """Run tools/probe.py in a SUBPROCESS (killable even if the tunnel
    wedges mid-op, unlike an in-process hang) with sleep-retry until
    ``deadline``.  Returns the probe record or None.  Runs BEFORE this
    process touches the device, so a killed child can't poison our
    client (VERDICT r2 task 1: retry a few times instead of dying once)."""
    import subprocess
    import sys

    probe_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "probe.py")
    attempts: list = []
    while True:
        t0 = time.time()
        try:
            # 100 s: the adaptive probe needs ~10-60 s even at 0.05 TF;
            # the tunnel's stalls are minutes-long and uncorrelated with
            # attempt length, so MORE shorter attempts win
            proc = subprocess.run([sys.executable, probe_path],
                                  capture_output=True, text=True,
                                  timeout=100)
            rec = json.loads(proc.stdout.strip().splitlines()[-1])
            attempts.append(rec["tflops_bf16"])
            PARTIAL["probe_attempts_tflops"] = attempts
            return rec
        except subprocess.TimeoutExpired:
            attempts.append(f"timeout@{time.time() - t0:.0f}s")
            PARTIAL["probe_attempts_tflops"] = attempts
        except Exception as exc:  # crash/parse failure, NOT a hang —
            # label it honestly (a "timeout" here once hid a child crash)
            err = ""
            try:
                err = (proc.stderr or "")[-200:]
            except Exception:
                pass
            attempts.append(f"{type(exc).__name__}@{time.time() - t0:.0f}s"
                            + (f": {err}" if err else ""))
            PARTIAL["probe_attempts_tflops"] = attempts
        if time.time() + 100 > deadline:
            return None
        time.sleep(30)


def _watchdog(seconds: int = 480) -> None:
    """The tunneled dev chip intermittently wedges (ops hang indefinitely);
    emit a diagnostic JSON line instead of hanging the harness."""
    import signal

    def on_alarm(_sig, _frame):
        # PARTIAL carries anything measured before the wedge (device-side
        # trace runs FIRST precisely so it survives a mid-bench collapse)
        print(json.dumps(_wedge_record(
            f"device unresponsive for {seconds}s (tunnel wedged)")),
            flush=True)
        import os

        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main() -> None:
    global BATCH, ITERS, WARMUP
    # Persist XLA executables across invocations — the same cache the CLIs
    # use (infer/manager.py): a driver bench after any successful run this
    # round skips the 20-40 s cold compiles that wedged BENCH_r02.
    from cerberus_tpu.infer.manager import _enable_compilation_cache

    _enable_compilation_cache()
    # scale the hang watchdog with the requested work (default knobs = the
    # driver's 480 s budget; larger sweeps must not be misreported as a
    # wedged tunnel)
    budget = int(480 * max(1.0, ITERS / 10.0) * max(1.0, BATCH / 128.0))
    if os.environ.get("CERBERUS_BENCH_DENSE") == "1":
        budget += 300
    _watchdog(budget)

    # Probe the chip via a killable subprocess BEFORE any in-process device
    # use; sleep-retry within a bounded window. The tunnel's stalls are
    # intermittent on ~minute timescales (measured ~25% probe success at
    # 0.03 TF), so a failed probe phase does NOT abort: it means "assume
    # worst-case degradation and attempt the measurement anyway" — the
    # watchdog + PARTIAL reporting remain the backstop.
    probe_rec = _probe_with_retry(time.time() + min(280, budget // 2))
    if probe_rec is None:
        probe_tflops = None
        PARTIAL["probe_failed_assuming_degraded"] = True
    else:
        probe_tflops = float(probe_rec["tflops_bf16"])
        PARTIAL["chip_condition_probe_tflops_bf16"] = round(probe_tflops, 2)
    # the probe phase ate into the watchdog; give the measured sections
    # their full budget
    import signal

    signal.alarm(budget)
    # Degraded-chip scaling: at <5 TF (healthy range is 5-36) a batch-128
    # trace step alone is ~90 s+ — shrink the work so a SLOW chip still
    # yields a complete, honestly-labeled artifact instead of a watchdog
    # kill. Explicit CERBERUS_BENCH_BATCH/_ITERS override this.
    degraded = probe_tflops is None or probe_tflops < 5.0
    if degraded and "CERBERUS_BENCH_BATCH" not in os.environ:
        BATCH = 32 if (probe_tflops or 0) >= 1.0 else 8
        PARTIAL["degraded_chip_reduced_batch"] = BATCH
    if degraded and "CERBERUS_BENCH_ITERS" not in os.environ:
        ITERS = 3 if (probe_tflops or 0) >= 0.5 else 2
    if degraded:
        WARMUP = 1

    cfg, forward, forward_postproc = build_programs(BATCH)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_net_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    # blobby inputs so CC/watershed do representative (not empty-image) work
    base = rng.random((BATCH, 56, 56, 3)).astype(np.float32)
    imgs = jax.device_put(np.clip(np.kron(
        base, np.ones((1, 8, 8, 1))) * 255, 0, 255).astype(np.uint8))

    # best-of-3 on a healthy chip; single trial when degraded (the extra
    # trials would triple an already-slow run into the watchdog)
    trials = 1 if degraded else 3

    def timed(fn, iters, batch_imgs=None, batch_n=None):
        """best-of-N: the shared tunneled chip shows large contention
        swings; only a D2H copy is a true barrier on this backend. Keeps
        one batch in flight (dispatch overlap) and syncs the previous."""
        batch_imgs = imgs if batch_imgs is None else batch_imgs
        batch_n = BATCH if batch_n is None else batch_n
        for _ in range(WARMUP):
            jax.tree.map(np.asarray, fn(params, batch_imgs))
        best = float("inf")
        for _trial in range(trials):
            t0 = time.perf_counter()
            prev = None
            for _ in range(iters):
                cur = fn(params, batch_imgs)
                if prev is not None:
                    _ = np.asarray(jax.tree.leaves(prev)[0])[0, 0]
                prev = cur
            jax.tree.map(np.asarray, prev)
            best = min(best, time.perf_counter() - t0)
        return batch_n * iters / best

    # device-side truth FIRST (so a tunnel collapse mid-bench still
    # reports it via the watchdog's PARTIAL): trace 3 e2e steps and read
    # the TPU lane's jit spans from the Chrome trace — ON-DEVICE execution
    # time, independent of the tunnel's dispatch/D2H latency (the
    # wall-clock headline is tunnel-bound whenever mfu_vs_probe >> 1).
    # Measured 202 t/s device-side at batch 128 on a chip walling 39 t/s.
    device_tps = None
    try:
        import glob
        import gzip
        import shutil
        import tempfile

        jax.tree.map(np.asarray, forward_postproc(params, imgs))  # compile
        n_trace = 3 if (probe_tflops or 0) >= 1.0 else 2
        prof_dir = tempfile.mkdtemp(prefix="bench_prof_")
        with jax.profiler.trace(prof_dir):
            for _ in range(n_trace):
                jax.tree.map(np.asarray, forward_postproc(params, imgs))
        path = sorted(glob.glob(
            f"{prof_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
        with gzip.open(path) as handle:
            trace = json.load(handle)
        tpu_pids = {e["pid"] for e in trace.get("traceEvents", [])
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "TPU" in e.get("args", {}).get("name", "")}
        dev_us = sum(e["dur"] for e in trace.get("traceEvents", [])
                     if e.get("ph") == "X" and e.get("pid") in tpu_pids
                     and e.get("name", "").startswith("jit_"))
        if dev_us > 0:
            device_tps = BATCH * n_trace / (dev_us / 1e6)
            PARTIAL["device_side_tiles_per_sec"] = round(device_tps, 1)
        shutil.rmtree(prof_dir, ignore_errors=True)
    except Exception:
        device_tps = None

    # re-probe in-process right before the wall sections (attributes a
    # later wedge) — but only when the chip can afford the 4096^2 matmul;
    # a <2 TF chip keeps the subprocess probe's number
    if probe_tflops is not None and probe_tflops >= 2.0:
        x = jnp.ones((4096, 4096), jnp.bfloat16)
        mm = jax.jit(lambda a: a @ a)
        np.asarray(mm(x))
        t0 = time.perf_counter()
        np.asarray(mm(x))
        probe_tflops = 2 * 4096 ** 3 / (time.perf_counter() - t0) / 1e12
        PARTIAL["chip_condition_probe_tflops_bf16"] = round(probe_tflops, 1)

    fwd_tps = timed(forward, ITERS)
    PARTIAL["forward_only_tiles_per_sec"] = round(fwd_tps, 2)
    e2e_tps = timed(forward_postproc, max(3, ITERS // 2))
    PARTIAL["e2e_tiles_per_sec"] = round(e2e_tps, 2)

    # transfer-minimal wall variant (VERDICT r4 task 3): the headline wall
    # loop materializes tens of MB of label maps per iter, so on the shared
    # tunnel (measured 10-40 MB/s D2H) it times the LINK, not the chip +
    # dispatch. One scalar checksum per iter instead; fully materializes
    # once at the end and validates the checksum against a host recompute.
    forward_postproc_checksum = build_checksum_program(forward_postproc)

    def timed_checksum(iters):
        for _ in range(WARMUP):
            np.asarray(forward_postproc_checksum(params, imgs))
        best = float("inf")
        for _trial in range(trials):
            t0 = time.perf_counter()
            prev = None
            for _ in range(iters):
                cur = forward_postproc_checksum(params, imgs)
                if prev is not None:
                    _ = np.asarray(prev)  # 24-byte D2H = the barrier
                prev = cur
            last_sig = np.asarray(prev)
            best = min(best, time.perf_counter() - t0)
        return BATCH * iters / best, last_sig

    checksum_tps, device_sig = timed_checksum(max(3, ITERS // 2))
    PARTIAL["wall_tiles_per_sec_checksum"] = round(checksum_tps, 2)
    # one full materialization validates the signature actually summarizes
    # the real outputs (guards against a dead-code-eliminated program)
    full = [np.asarray(x) for x in forward_postproc(params, imgs)]
    host_sig = np.array([v for m in full
                         for v in (int((m > 0).sum()), int(m.max()))])
    checksum_valid = bool(np.array_equal(host_sig, device_sig))

    # dense inference mode (CERBERUS_BENCH_DENSE=1): 1168^2 windows with an
    # 864^2 kept core — same 152 px margin as 448->144 but ~3x fewer FLOPs
    # per output pixel (tests/test_dense_infer.py). Reported in 448^2-tile
    # EQUIVALENTS (labeled output px / 144^2) for comparability.
    dense = None
    if os.environ.get("CERBERUS_BENCH_DENSE") == "1":
        # dense batch is its own knob (windows are 6.8x a 448^2 tile; 16 is
        # the verified 16 GB HBM ceiling — VERDICT r2 task 5 sweep)
        d_batch = int(os.environ.get("CERBERUS_BENCH_DENSE_BATCH", "4"))
        d_in, d_out = 1168, 864
        d_base = rng.random((d_batch, d_in // 8, d_in // 8, 3))
        d_imgs = jax.device_put(np.clip(np.kron(
            d_base, np.ones((1, 8, 8, 1))) * 255, 0, 255).astype(np.uint8))

        _, forward_dense = build_dense_program(d_out)

        # same dispatch-overlap methodology as the headline (timed), so the
        # two numbers are comparable
        d_per_sec = timed(forward_dense, max(2, ITERS // 2),
                          batch_imgs=d_imgs, batch_n=d_batch)
        px_per_sec = d_per_sec * d_out * d_out
        dense = {"geometry": f"{d_in}->{d_out}", "batch": d_batch,
                 "tiles448_equiv_per_sec": round(px_per_sec / 144 ** 2, 2)}

    # MFU: exact model FLOPs from XLA's cost analysis of the compiled
    # forward (falls back to the documented estimate if the backend
    # doesn't expose it — CLAUDE.md: ~90-100 GFLOP/tile valid-region)
    try:
        cost = forward.lower(params, imgs).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_tile = float(cost["flops"]) / BATCH
    except Exception:
        flops_per_tile = 95e9
    achieved_tflops = fwd_tps * flops_per_tile / 1e12

    print(json.dumps({
        "metric": "448^2 tiles/sec/chip (6-head forward+postproc to instance "
                  f"label maps, bf16, batch {BATCH})",
        "value": round(e2e_tps, 2),
        "unit": "tiles/s",
        "vs_baseline": round(e2e_tps / EST_REFERENCE_TILES_PER_SEC, 2),
        "forward_only_tiles_per_sec": round(fwd_tps, 2),
        # wall-clock with per-iter D2H limited to a 24-byte signature (the
        # true barrier on this backend); full label maps materialized once
        # at the end and validated against the signature. Measures chip +
        # dispatch without the headline's tens-of-MB-per-iter link cost.
        "wall_tiles_per_sec_checksum": round(checksum_tps, 2),
        "checksum_validated_against_full_output": checksum_valid,
        **({"chip_condition_probe_tflops_bf16": round(probe_tflops, 2)}
           if probe_tflops is not None else
           {"probe_failed_assuming_degraded": True}),
        # on-device e2e throughput from trace spans: what THIS chip
        # executes, with the shared tunnel's dispatch/D2H latency excluded
        **({"device_side_tiles_per_sec": round(device_tps, 1)}
           if device_tps else {}),
        **({"dense_mode_forward": dense} if dense else {}),
        # MFU stated two ways: against v5e peak (197 TF bf16) and against
        # what the shared tunneled chip can actually deliver RIGHT NOW
        # (the matmul probe) — a low headline with high mfu_vs_probe means
        # the gap is the tunnel, not this framework
        "model_gflops_per_tile": round(flops_per_tile / 1e9, 1),
        "achieved_tflops_forward": round(achieved_tflops, 2),
        "mfu_vs_v5e_peak": round(achieved_tflops / 197.0, 3),
        **({"mfu_vs_probe":
            round(achieved_tflops / max(probe_tflops, 1e-9), 3)}
           if probe_tflops is not None else {}),
        **{k: PARTIAL[k] for k in ("probe_attempts_tflops",
                                   "degraded_chip_reduced_batch")
           if k in PARTIAL},
        "wall_provenance": {
            "value": "per-iter full label-map D2H to host (link included)",
            "wall_tiles_per_sec_checksum":
                "per-iter 24-byte signature D2H; full D2H once at end",
        },
        "baseline": {
            "estimate_reference_gpu": EST_REFERENCE_TILES_PER_SEC,
            "measured_reference_torch_cpu_1core": MEASURED_TORCH_CPU_1CORE,
        },
    }))


if __name__ == "__main__":
    main()
