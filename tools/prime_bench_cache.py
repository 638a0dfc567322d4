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
        _compile(f"forward_postproc_checksum[b{batch}]",
                 bench.build_checksum_program(forward_postproc),
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

    if any(a.startswith("--resident") for a in sys.argv):
        prime_resident()


def _row_plan(proc: int, out: int, tile: int = 2048):
    """Row-granular resident geometry for a proc² slide (mirrors
    infer/resident_wsi.run): returns (w_row, aw_slide, rows) where rows =
    [(hp, h_clip, [(wp, w_clip), ...])]. Tile default matches the WSI
    CLI's --tile_shape [default: 2048] (the reference flag surface)."""
    tw = max((tile // out) * out, out)
    if proc <= tw:
        starts = [0]
    else:
        last = -(-(proc - tw) // tw) * tw
        starts = list(range(0, last + 1, tw))
    clips = [min(s + tw, proc) - s for s in starts]

    def pad512(n):
        return max(-(-n // 512) * 512, 512)

    def wp(c):
        return pad512(-(-c // out) * out)

    aw_slide = -(-proc // out) * out
    w_row = max([aw_slide] + [s + wp(c) for s, c in zip(starts, clips)])
    col_buckets = sorted({(wp(c), c) for c in clips})
    rows = [(pad512(-(-c // out) * out), c, col_buckets)
            for c in sorted(set(clips))]
    return w_row, aw_slide, rows


def prime_resident() -> None:
    """AOT-compile the HBM-resident WSI programs (row writer + gather +
    per-tile nuclei/land slices + gland/lumen region families) for the 49k²
    bench geometry — dense 864 by default, plus windowed 144 with --all.
    Gland/lumen REGION shapes depend on the slide's tissue bboxes and
    cannot be known ahead; everything else is deterministic."""
    from cerberus_tpu.data.patching import make_channel_index_map
    from cerberus_tpu.config import DEFAULT_DECODER_KWARGS
    from cerberus_tpu.infer.resident_wsi import ResidentWSIProcessor

    proc_side = 24576  # 49152 base at 40x -> 20x proc
    for a in sys.argv:
        if a.startswith("--resident="):
            proc_side = int(a.split("=", 1)[1])
    idx_dict, n_ch = make_channel_index_map(DEFAULT_DECODER_KWARGS)

    geoms = [(864, 1168, 16)] + ([(144, 448, 128)]
                                 if "--all" in sys.argv else [])
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    for out, in_sz, batch in geoms:
        proc = ResidentWSIProcessor(
            manager=None, idx_dict=idx_dict, n_ch=n_ch,
            postproc_code="IP-ERODED-CONTOUR-3", output_shape=out,
            margin=64)
        m_in = (in_sz - out) // 2
        w_row, aw_slide, rows = _row_plan(proc_side, out)
        outs_abs = jax.ShapeDtypeStruct((batch, out, out, n_ch), jnp.float16)
        tls_abs = jax.ShapeDtypeStruct((batch, 2), jnp.int32)
        for hp, h_clip, col_buckets in rows:
            canvas_abs = jax.ShapeDtypeStruct((hp + out, w_row, n_ch),
                                              jnp.float16)
            _compile(f"resident_writer[{hp}x{w_row},o{out}]",
                     proc._writer((hp + out, w_row, n_ch)), canvas_abs,
                     outs_abs, tls_abs)
            align_h = -(-h_clip // out) * out
            region_abs = jax.ShapeDtypeStruct(
                (align_h + 2 * m_in, aw_slide + 2 * m_in, 3), jnp.uint8)
            _compile(f"resident_gather[{align_h}+2m,o{out}]",
                     proc._gather_program(region_abs.shape, in_sz),
                     region_abs, tls_abs)
            for wp_t, w_clip in col_buckets:
                _compile(f"resident_nuclei[{hp}x{wp_t}]",
                         proc._nuclei_program(hp, wp_t), canvas_abs, i32,
                         i32, i32)
                _compile(f"resident_land[{h_clip}x{w_clip}]",
                         proc._land_slice(h_clip, w_clip), canvas_abs, i32)


if __name__ == "__main__":
    main()
