"""Capture an XPlane/TensorBoard profile of the tile hot loop.

One command for the healthy-chip profiling session VERDICT asks for:
runs the bench.py operating point (6-head bf16 forward + on-chip postproc,
batch CERBERUS_BENCH_BATCH or 128) under jax.profiler.trace and prints
where the trace landed. View with TensorBoard's profile plugin or
xprof; the op-level breakdown attributes time to encoder / decoder /
CC / watershed stages (profiling spans name the phases).

Usage: python tools/profile_tile.py [out_dir]   (default /tmp/cerberus_prof)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    # the tunneled dev chip intermittently wedges (CLAUDE.md): bail with a
    # message instead of hanging forever
    import signal

    def on_alarm(_sig, _frame):
        print("device unresponsive for 900s (tunnel wedged); no profile "
              "captured", file=sys.stderr)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(900)

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cerberus_prof"
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
    from cerberus_tpu.data.patching import make_channel_index_map
    from cerberus_tpu.infer.steps import fused_infer_outputs
    from cerberus_tpu.models.net_desc import init_net_params
    from cerberus_tpu.ops.tpu_postproc import (
        _cc_impl,
        _inner_contour_instances,
        _nuclei_watershed,
    )

    # NB: mirrors bench.py's operating point (grid, thresholds, gland gate)
    # so the profile attributes the HEADLINE pipeline — keep in sync with
    # bench.py when the operating point changes
    batch = int(os.environ.get("CERBERUS_BENCH_BATCH", "128"))
    gh = int(batch ** 0.5)
    while batch % gh:
        gh -= 1
    gw = batch // gh

    cfg = ModelConfig.from_kwargs({
        "encoder_backbone_name": "resnet34",
        "decoder_kwargs": DEFAULT_DECODER_KWARGS,
        "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
    })
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_net_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    idx_dict, n_ch = make_channel_index_map(cfg.active_decoder_kwargs)
    cc = _cc_impl()

    @jax.jit
    def step(p, imgs):
        out = fused_infer_outputs(p, imgs, cfg, output_shape=144,
                                  compute_dtype=jnp.bfloat16,
                                  out_dtype=jnp.float16)
        canvas = (out.reshape(gh, gw, 144, 144, n_ch)
                  .transpose(0, 2, 1, 3, 4)
                  .reshape(gh * 144, gw * 144, n_ch).astype(jnp.float32))
        s, _ = idx_dict["Gland-INST"]
        gland = _inner_contour_instances(canvas[..., s], canvas[..., s + 1],
                                         0.55, 1000, 11, cc)
        s, _ = idx_dict["Lumen-INST"]
        lumen = _inner_contour_instances(canvas[..., s], canvas[..., s + 1],
                                         0.5, 150, 3, cc)
        s, _ = idx_dict["Nuclei-INST"]
        nuclei = _nuclei_watershed(canvas[..., s], canvas[..., s + 1], cc)
        return gland, jnp.where(gland > 0, lumen, 0), nuclei

    rng = np.random.default_rng(0)
    base = rng.random((batch, 56, 56, 3)).astype(np.float32)
    imgs = jax.device_put(np.clip(np.kron(
        base, np.ones((1, 8, 8, 1))) * 255, 0, 255).astype(np.uint8))

    # compile outside the trace
    jax.tree.map(np.asarray, step(params, imgs))

    with jax.profiler.trace(out_dir):
        t0 = time.perf_counter()
        for _ in range(3):
            jax.tree.map(np.asarray, step(params, imgs))
        dt = time.perf_counter() - t0
    print(f"traced 3 steps ({3 * batch / dt:.1f} tiles/s) -> {out_dir}")


if __name__ == "__main__":
    main()
