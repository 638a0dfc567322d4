"""Width-paired ResNet encoder front (stem + maxpool + layer1 + layer2 entry).

Device profiling of the paired-tower forward (tools/bench_fwd_spans.py,
BASELINE.md round-3 "Width-paired decoder towers") left the encoder's
64-channel stages as the largest remaining block: XLA lowers the stem and
layer1 convs with a *batch-minor* layout (``{0,3,2,1}``) because 64 output
channels only half-fill the 128-wide MXU lanes, and those convs measure
~56-82 TF/s vs ~192 TF/s for the 128/256/512-channel stages on the same
chip.  This module extends the width-pairing of models/paired_decode.py
through the encoder front so every conv keeps 128 "channels":

    paired(x)[n, h, j, p*C + c] == x[n, h, 2*j + p, c]      (phase 0)

All transforms below stay at phase 0 (block j always covers columns
(2j, 2j+1)), so the x0/x1 skip feature maps stay block-aligned for the
paired decoder towers' even-start crop windows — no repack copies.

Kernel repacking (cf. paired_decode.pair_conv_kernel, which handles the
towers' VALID convs): output column 2j+p consuming input column 2j+p+t-o
(tap t, left reach o) maps to input block j + (p+t-o)//2, parity
(p+t-o)%2.  For the SAME-padded encoder convs the block span is

  * 7x7 stem, o=3:  (p+t-3)//2 in [-2,2]  -> (7, 5, 2*3,  2*64) kernel
  * 3x3 layer1, o=1: (p+t-1)//2 in [-1,1] -> (3, 3, 2*64, 2*64) kernel
  * 3x3 stride-2 layer2 entry, o=1 (output UNPAIRED: out col c reads
    cols 2c-1..2c+1 = blocks c-1 (parity 1) and c (parities 0,1))
                                           -> (3, 2, 2*64, 128) kernel

Every original tap appears exactly once with the same (kh, t, ci)
multiplicands; the remaining kernel entries are exact zeros, so the
contraction is mathematically identical up to float reassociation inside
the wider dot (the zero products add 2x MACs for layer1, 1.43x for the
stem — more than paid back by full-lane MXU occupancy and channel-minor
layouts; measured A/B in BASELINE.md).  Zero-padding the *block* axis
over-pads by one column at each edge relative to the SAME conv; those
columns are only touched by the exact-zero kernel entries (derived at
each repacker below), so edge outputs are unchanged.

Reference behavior being reproduced: the modified torchvision ResNet of
/root/reference/models/backbone/resnet.py:195-197,273-286 (stride-1 7x7
stem, maxpool, layer1) — numerics already pinned by
tests/test_paired_encoder.py against models/backbones/resnet.py.
Training: opt-in via run_train.py --paired (bn_sink on resnet_forward_paired
— train-mode BN folds paired batch stats exactly to the unpaired channel
stats); the default training path stays unpaired bit-exact.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .backbones.resnet import RESNET_SPECS
from .layers import batch_norm, conv2d, relu


def _paired_bn_inference(params, name: str, x):
    """Inference BN on a width-paired tensor: per-channel vectors tile x2
    (same composition paired_decode._paired_conv_block uses — tiling the
    raw stats before folding equals tiling the folded inv/shift)."""
    from .paired_decode import _pair_vec

    return batch_norm(_pair_vec(params[name]), x, train=False)


def _paired_bn_train(params, name: str, x, sink: dict):
    """Train-mode BN on a width-paired tensor.

    Each unpaired channel c appears as paired channels {c, C+c} with equal
    element counts (W even), so the union statistics fold exactly:

        mean_c = (m0 + m1) / 2
        var_c  = (v0 + v1) / 2 + ((m0 - m1) / 2)^2     (biased)

    — the same values a train-mode BN on the unpaired tensor computes, up
    to f32 reduction reassociation (the divergence class the paired path
    already carries).  Records (mean, var_unbiased) under the UNPAIRED
    param name so running-stat folds and checkpoints stay torch-keyed.
    """
    from .layers import BN_EPS

    p = params[name]
    c = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    m2 = jnp.mean(xf, axis=axes)
    v2 = jnp.var(xf, axis=axes)
    mean = 0.5 * (m2[:c] + m2[c:])
    var = 0.5 * (v2[:c] + v2[c:]) + jnp.square(0.5 * (m2[:c] - m2[c:]))
    inv = (p["scale"] / jnp.sqrt(var + BN_EPS))
    shift = p["bias"] - mean * p["scale"] / jnp.sqrt(var + BN_EPS)
    y = x * jnp.tile(inv, 2).astype(x.dtype) + jnp.tile(shift, 2).astype(
        x.dtype)
    n = 2.0 * float(np.prod([x.shape[a] for a in axes]))
    sink[name] = (mean, var * (n / max(n - 1.0, 1.0)))
    return y


def _paired_bn(params, name: str, x, bn_sink):
    if bn_sink is None:
        return _paired_bn_inference(params, name, x)
    return _paired_bn_train(params, name, x, bn_sink)


def pair_stem_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, Ci, Co) SAME(pad 3) -> (7, 5, 2Ci, 2Co) phase-0 block kernel.

    Block pad is 2 (= columns -4..-1 on the left); column -4 is only read
    by entries with p+t-3 <= -4, i.e. t <= -1 — none exist, so the extra
    pad column multiplies exact zeros.
    """
    kh, kw, ci, co = kernel.shape
    assert kh == 7 and kw == 7, kernel.shape
    out = jnp.zeros((7, 5, 2 * ci, 2 * co), kernel.dtype)
    for p in range(2):
        for t in range(7):
            m = (p + t - 3) // 2          # floor division: -2..2
            q = (p + t - 3) % 2
            out = out.at[:, m + 2, q * ci:(q + 1) * ci,
                         p * co:(p + 1) * co].set(kernel[:, t])
    return out


def pair_same3_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) SAME(pad 1) -> (3, 3, 2Ci, 2Co) phase-0 block kernel.

    Block pad 1 = columns -2, -1; column -2 needs p+t-1 <= -2 -> t <= -1
    for p=0 (and t <= -2 for p=1) — absent, so it multiplies exact zeros.
    """
    kh, kw, ci, co = kernel.shape
    assert kh == 3 and kw == 3, kernel.shape
    out = jnp.zeros((3, 3, 2 * ci, 2 * co), kernel.dtype)
    for p in range(2):
        for t in range(3):
            m = (p + t - 1) // 2          # -1, 0, or 1
            q = (p + t - 1) % 2
            out = out.at[:, m + 1, q * ci:(q + 1) * ci,
                         p * co:(p + 1) * co].set(kernel[:, t])
    return out


def pair_s2_exit_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) stride-2 SAME(pad 1) -> (3, 2, 2Ci, Co), paired input,
    UNPAIRED output.

    Output column c reads columns 2c-1, 2c, 2c+1 = block c-1 parity 1 and
    block c parities 0, 1; with a left block pad of 1 the window over
    blocks [c-1, c] is a width-2 stride-1 block conv.  The pad block's
    parity-0 column (-2) is only read by the (b=0, q=0) slot — empty.
    """
    kh, kw, ci, co = kernel.shape
    assert kh == 3 and kw == 3, kernel.shape
    out = jnp.zeros((3, 2, 2 * ci, co), kernel.dtype)
    out = out.at[:, 0, ci:2 * ci, :].set(kernel[:, 0])   # col 2c-1
    out = out.at[:, 1, 0:ci, :].set(kernel[:, 1])        # col 2c
    out = out.at[:, 1, ci:2 * ci, :].set(kernel[:, 2])   # col 2c+1
    return out


def _conv_paired(kernel, x, w_pad, h_stride: int = 1,
                 h_pad: Optional[int] = None):
    if h_pad is None:
        h_pad = kernel.shape[0] // 2
    if isinstance(w_pad, int):
        w_pad = (w_pad, w_pad)
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(h_stride, 1),
        padding=[(h_pad, h_pad), w_pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def max_pool_paired(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(3, stride 2, pad 1) on a phase-0 paired tensor.

    Separable max: pool H on the paired tensor first (halves every
    subsequent temp), then unpair -> pool W -> re-pair.  The un/re-pair
    reshapes are physical lane retiles on TPU, but they run on the
    H-halved map (~0.8 GB at batch 128) — the earlier quad-view
    formulation's (Wb, 2C) -> (Wb/2, 4C) reshape + shifted-slice concat
    measured ~31 ms of copy/slice/fusion at batch 128 vs ~3 ms for this
    ordering (BASELINE.md round-3).  max is order-free, so outputs are
    exactly torch MaxPool2d(3, 2, 1).  Requires W % 4 == 0 (every
    margin-304 geometry satisfies it).
    """
    n, h, wb, c2 = x.shape
    assert wb % 2 == 0, x.shape
    c = c2 // 2
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    xh = jax.lax.reduce_window(
        x, neg, jax.lax.max, window_dimensions=(1, 3, 1, 1),
        window_strides=(1, 2, 1, 1),
        padding=[(0, 0), (1, 1), (0, 0), (0, 0)])
    # NEGATIVE RESULTS (round 3, do not redo): (a) the quad view
    # (Wb, 2C) -> (Wb/2, 4C) is a physical lane retile — ~31 ms of
    # copy/slice at batch 128; (b) strided W-block slice maxes
    # (p1[2i-1], p0[2i], ...) don't fuse either — the slices and the
    # channel concat materialize (~24 ms + a slower overall schedule).
    # The unpair -> reduce_window -> re-pair retiles on the H-halved map
    # measured cheapest (~11 ms total at batch 128).
    hu = xh.shape[1]
    xu = xh.reshape(n, hu, 2 * wb, c)            # unpair
    xw = jax.lax.reduce_window(
        xu, neg, jax.lax.max, window_dimensions=(1, 1, 3, 1),
        window_strides=(1, 1, 2, 1),
        padding=[(0, 0), (0, 0), (1, 1), (0, 0)])
    return xw.reshape(n, hu, wb // 2, c2)        # re-pair


def supports_paired_encoder(arch: str, width: int) -> bool:
    """Basic-block ResNets only (layer1 is the 64-channel stage; bottleneck
    layer1 is 256-wide already) and W divisible by 4 (quad maxpool view)."""
    spec = RESNET_SPECS.get(arch)
    return spec is not None and spec[0] == "basic" and width % 4 == 0


def use_paired_front(arch: str, width: int, batch: int,
                     data_parallel: int = 1,
                     env: Optional[str] = None) -> bool:
    """The paired-encoder auto gate (pure, unit-tested).

    Pair when the PER-DEVICE batch is < 48: below that XLA lowers the
    64-channel encoder stages batch-minor and starves the MXU lanes
    (batch-8 device e2e 395.6 -> 456.3 t/s; batch-32 forward 57.9 -> 55.3
    ms; dense 1168² batch 16: 532 -> 481 ms); from ~64 up the batch-minor
    layout is lane-full and the pairing's zero MACs lose slightly (wash at
    64: 115.6 vs 116.9 ms; 161 -> 172 ms at batch 128) — measured
    crossover between 32 and 64, BASELINE.md round-3.  ``env`` is the
    CERBERUS_PAIRED_ENCODER override ("1"/"0"); callers pass the value so
    the decision stays a pure function of its arguments.
    """
    if not supports_paired_encoder(arch, width):
        return False
    if env is not None:
        return env == "1"
    return batch // max(int(data_parallel), 1) < 48


def resnet_forward_paired(params: Dict, x: jnp.ndarray, arch: str,
                          prefix: str = "backbone",
                          bn_sink: Optional[dict] = None
                          ) -> List[jnp.ndarray]:
    """[x0_paired, x1_paired, x2, x3, x4] — width-paired feature pyramid.

    x0/x1 come back width-paired at phase 0 (block-aligned with even-start
    crop windows); x2..x4 are regular unpaired NHWC, bit-compatible with
    models/backbones/resnet.resnet_forward up to conv reassociation.

    ``bn_sink``: when given, batch-norm runs in TRAIN mode — batch stats
    are computed on the paired tensors, folded exactly to the unpaired
    channel stats (_paired_bn_train) and recorded under the torch-keyed
    names, making this the paired TRAINING encoder front (run_train.py
    --paired). Gradients reach the unpaired param tree through the kernel
    repacks automatically (they are traced gather/scatter ops).
    """
    _block, counts = RESNET_SPECS[arch]
    n, h, w, c_in = x.shape
    assert w % 4 == 0, x.shape
    xp = x.reshape(n, h, w // 2, 2 * c_in)

    xp = _conv_paired(pair_stem_kernel(params[f"{prefix}.conv1"]["kernel"]),
                      xp, w_pad=2)
    x0p = xp = relu(_paired_bn(params, f"{prefix}.bn1", xp, bn_sink))

    xp = max_pool_paired(xp)
    # layer1: paired basic blocks (stride 1, no downsample for basic
    # resnets) on the phase-0 SAME repack. NEGATIVE RESULT (round 3, do
    # not redo): a phase-shift variant (output pairing offset one column
    # so the 3-tap window spans 2 blocks -> width-2 kernels at 4/3 MACs,
    # with junk-edge-column zeroing standing in for the next conv's SAME
    # pad and a block-slice re-align before each residual add) measured
    # ~equal at batch 128 (171.1 vs 172.3 ms) and WORSE at dense batch 4
    # (168.8 vs 163.5 ms): the odd Wb+1/Wb+2 conv widths cost Mosaic more
    # than the 2x->4/3 MAC cut saves (removed at commit 1d368eb~).
    for b in range(counts[0]):
        name = f"{prefix}.layer1.{b}"
        out = _conv_paired(
            pair_same3_kernel(params[f"{name}.conv1"]["kernel"]), xp, w_pad=1)
        out = relu(_paired_bn(params, f"{name}.bn1", out, bn_sink))
        out = _conv_paired(
            pair_same3_kernel(params[f"{name}.conv2"]["kernel"]), out, w_pad=1)
        out = _paired_bn(params, f"{name}.bn2", out, bn_sink)
        xp = relu(out + xp)
    x1p = xp

    # layer2.0: consume the paired x1 directly — conv1 via the stride-2 exit
    # kernel, downsample via a parity-0 channel slice (1x1 stride-2 reads
    # even columns only); output is unpaired, the rest of the net unchanged
    from .backbones.resnet import _basic_block, apply_bn

    name = f"{prefix}.layer2.0"
    # block window [c-1, c]: one zero block on the LEFT only (the pad
    # block's parity-0 column is the exact-zero (b=0, q=0) slot)
    out = _conv_paired(
        pair_s2_exit_kernel(params[f"{name}.conv1"]["kernel"]), xp,
        w_pad=(1, 0), h_stride=2, h_pad=1)
    out = relu(apply_bn(params, f"{name}.bn1", out, bn_sink))
    out = conv2d(params[f"{name}.conv2"], out)
    out = apply_bn(params, f"{name}.bn2", out, bn_sink)
    ds = jax.lax.conv_general_dilated(
        xp[..., :xp.shape[-1] // 2],
        params[f"{name}.downsample.0"]["kernel"].astype(xp.dtype),
        window_strides=(2, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=xp.dtype)
    ds = apply_bn(params, f"{name}.downsample.1", ds, bn_sink)
    x = relu(out + ds)

    feats = []
    for stage_idx, n_blocks in enumerate(counts):
        if stage_idx == 0:
            continue
        first = 1 if stage_idx == 1 else 0
        for b in range(first, n_blocks):
            x = _basic_block(params, f"{prefix}.layer{stage_idx + 1}.{b}", x,
                             (2 if stage_idx else 1) if b == 0 else 1,
                             bn_sink)
        feats.append(x)
    return [x0p, x1p] + feats
