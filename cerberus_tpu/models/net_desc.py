"""Multi-task U-Net: shared encoder, per-task summation-skip decoders, 1x1
heads, and a global-pool tissue classifier — one fused XLA program.

Behavioral spec (reference ``models/net_desc.py``):
  * ``imgs / 255.0`` (:147); encoder returns a 5-scale pyramid;
  * ``conv_map``: 1x1 f[-1]->f[-2], bias-free (:51-53);
  * each decoder runs ``prev = blk(upsample2x(prev) + skip)`` over 4 levels
    (:183-189), decoder blocks per ``models/utils/net_layers.py:22-26``
    (ConvBlock(f[-2],[f[-2],f[-3]],3) ... ConvBlock(f[-5],[f[-5],f[-5]],3));
  * per-output 1x1 head: ConvBlock(f[-5],[96],1) + Conv(96,out,1) (:31-38);
  * Patch-Class head: center-crop the PRE-conv_map bottom features to 9x9
    when larger (inference-size invariance), global-average-pool, then
    BN-ReLU-Dropout(0.3)-Conv1x1(512->256)-BN-ReLU-Conv1x1(256->9) (:64-76,
    :169-180);
  * output dict keys are ``f"{decoder.split('#')[0]}-{output}"`` (:198) and
    plain ``"Patch-Class"`` for the classifier (:180).

Branch freezing (``train_decoder_list``, :160-189 and subtype flags
:105-142) maps to ``jax.lax.stop_gradient`` on non-trained branch outputs;
BN running stats still update for all branches in train mode, matching the
torch ``set_grad_enabled`` semantics.

Parameters are a flat dict keyed by the reference checkpoints' state_dict
names (``decoder_head.Gland.0.block.0.conv`` etc.), so conversion from
``weights.tar`` is a mechanical per-tensor transform (models/convert.py).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import random

from ..config import ModelConfig
from .backbones import get_backbone
from .layers import (
    center_crop,
    conv2d,
    dropout,
    global_avg_pool,
    init_bn,
    init_conv,
    key_stream,
    relu,
    upsample2x_bilinear,
)
from .backbones.resnet import apply_bn

CLS_HEAD_INT_CH = 96  # classification-head hidden width (net_layers.py:31)


def head_output_channels(cfg: ModelConfig) -> Dict[str, int]:
    """{head_code: channel count} in decoder order."""
    out = {}
    for decoder_name, heads in cfg.decoder_info:
        if decoder_name not in cfg.considered_tasks:
            continue
        for head_name, ch in heads:
            if decoder_name == "Patch-Class":
                out["Patch-Class"] = ch
            else:
                out[decoder_name.split("#")[0] + "-" + head_name] = ch
    return out


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_conv_block(params, keys, name, in_ch, unit_ch, ksize):
    """ConvBlock = sequence of (conv+BN+ReLU) layers (conv_layers.py:63-103)."""
    for idx, out_ch in enumerate(unit_ch):
        params[f"{name}.block.{idx}.conv"] = init_conv(
            next(keys), ksize, ksize, in_ch, out_ch, bias=True
        )
        params[f"{name}.block.{idx}.bn"] = init_bn(out_ch)
        in_ch = out_ch
    return in_ch


def _torch_default_conv_init(rng, kh, kw, cin, cout, bias=False):
    """torch's default Conv2d init (kaiming uniform, a=sqrt(5)) — used for
    conv_map, which the reference never re-initializes (net_desc.py:89-101
    applies weights_init_cnn only to backbone/decoder/output heads)."""
    fan_in = cin * kh * kw
    bound = 1.0 / (fan_in ** 0.5)
    k1, k2 = random.split(rng)
    p = {"kernel": random.uniform(k1, (kh, kw, cin, cout), jnp.float32,
                                  -bound, bound)}
    if bias:
        p["bias"] = random.uniform(k2, (cout,), jnp.float32, -bound, bound)
    return p


def _is_dsf(cfg: ModelConfig) -> bool:
    return cfg.encoder_backbone_name[:3] == "dsf"


def _nr_orients(cfg: ModelConfig) -> int:
    return int(cfg.encoder_backbone_name.split("_")[-1])


def init_net_params(rng, cfg: ModelConfig) -> Dict:
    """Build the full parameter tree with reference-equivalent initialization
    (kaiming fan_out for convs, unit/zero BN — models/utils/__init__.py:10-20;
    basis-count-scaled normal for G-convs, :23-30)."""
    init_backbone, _fwd, filters = get_backbone(cfg.encoder_backbone_name)
    keys = key_stream(rng)
    params = init_backbone(next(keys), "backbone")
    dsf = _is_dsf(cfg)
    if not dsf:
        # conv_map is identity for dsf nets (net_desc.py:51-54)
        params["conv_map"] = {
            "kernel": _torch_default_conv_init(next(keys), 1, 1, filters[-1],
                                               filters[-2])["kernel"]
        }

    for decoder_name, heads in cfg.decoder_info:
        if decoder_name not in cfg.considered_tasks:
            continue
        if decoder_name == "Patch-Class":
            base = "decoder_head.Patch-Class"
            (_, out_ch), = heads
            params[f"{base}.bn1"] = init_bn(filters[-1])
            params[f"{base}.conv1"] = init_conv(next(keys), 1, 1, filters[-1], 256)
            params[f"{base}.bn2"] = init_bn(256)
            params[f"{base}.conv2"] = init_conv(next(keys), 1, 1, 256, out_ch)
            continue
        # 4 up-blocks u4..u1 (stored as ModuleList indices 0..3)
        spec = [
            (filters[-2], [filters[-2], filters[-3]]),
            (filters[-3], [filters[-3], filters[-4]]),
            (filters[-4], [filters[-4], filters[-5]]),
            (filters[-5], [filters[-5], filters[-5]]),
        ]
        for blk_idx, (in_ch, unit_ch) in enumerate(spec):
            name = f"decoder_head.{decoder_name}.{blk_idx}"
            if dsf:
                from .gconv import init_gconv

                nr = _nr_orients(cfg)
                cur = in_ch
                for li, out_c in enumerate(unit_ch):
                    params[f"{name}.block.{li}.pre_bn.norm"] = init_bn(cur)
                    params[f"{name}.block.{li}.conv"] = init_gconv(
                        next(keys), 7, nr, cur, out_c)
                    cur = out_c
            else:
                _init_conv_block(params, keys, name, in_ch, unit_ch, ksize=3)
        for head_name, out_ch in heads:
            if dsf:
                # ConvBlock_PreAct head (net_layers.py:33-34): bn-relu-conv x2
                base = f"output_head.{decoder_name}.{head_name}"
                params[f"{base}.block.0.bn"] = init_bn(filters[-5])
                params[f"{base}.block.0.conv"] = init_conv(
                    next(keys), 1, 1, filters[-5], CLS_HEAD_INT_CH)
                params[f"{base}.block.1.bn"] = init_bn(CLS_HEAD_INT_CH)
                params[f"{base}.block.1.conv"] = init_conv(
                    next(keys), 1, 1, CLS_HEAD_INT_CH, out_ch)
            else:
                base = f"output_head.{decoder_name}.{head_name}.x"
                _init_conv_block(params, keys, f"{base}.0", filters[-5],
                                 [CLS_HEAD_INT_CH], ksize=1)
                params[f"{base}.1.conv"] = init_conv(next(keys), 1, 1,
                                                     CLS_HEAD_INT_CH, out_ch)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _conv_block(params, name, x, n_layers, bn_sink):
    for idx in range(n_layers):
        x = conv2d(params[f"{name}.block.{idx}.conv"], x)
        x = relu(apply_bn(params, f"{name}.block.{idx}.bn", x, bn_sink))
    return x


def _decoder_tower(params, decoder_name, feat_list, bn_sink):
    prev = feat_list[-1]
    for idx in range(1, len(feat_list)):
        prev = upsample2x_bilinear(prev)
        prev = _conv_block(params, f"decoder_head.{decoder_name}.{idx - 1}",
                           feat_list[-(idx + 1)] + prev, 2, bn_sink)
    return prev


def _gconv_decoder_tower(params, decoder_name, feat_list, nr, bn_sink):
    """DSF decoder: preact G-conv blocks (GConvBlock k7,
    net_layers.py:16-21)."""
    from .gconv import g_batch_norm, gconv2d

    prev = feat_list[-1]
    for idx in range(1, len(feat_list)):
        prev = upsample2x_bilinear(prev)
        x = feat_list[-(idx + 1)] + prev
        name = f"decoder_head.{decoder_name}.{idx - 1}"
        for li in range(2):
            bn_name = f"{name}.block.{li}.pre_bn.norm"
            x = relu(g_batch_norm(params[bn_name], x, nr, bn_sink, bn_name))
            x = gconv2d(params[f"{name}.block.{li}.conv"], x, 7, nr, nr)
        prev = x
    return prev


def _patch_class_head(params, bottom_feats, bn_sink, dropout_rng):
    feat_h, feat_w = bottom_feats.shape[1], bottom_feats.shape[2]
    if feat_h != 9 and feat_w != 9:
        bottom_feats = center_crop(bottom_feats, 9, 9)
    x = global_avg_pool(bottom_feats)
    return _patch_class_mlp(params, x, bn_sink, dropout_rng)


def _patch_class_mlp(params, x, bn_sink, dropout_rng):
    base = "decoder_head.Patch-Class"
    x = relu(apply_bn(params, f"{base}.bn1", x, bn_sink))
    if dropout_rng is not None:
        x = dropout(x, 0.3, dropout_rng)
    x = conv2d(params[f"{base}.conv1"], x, padding=0)
    x = relu(apply_bn(params, f"{base}.bn2", x, bn_sink))
    return conv2d(params[f"{base}.conv2"], x, padding=0)


def patch_class_head_grid(params, bottom_feats, n_cells: int):
    """Per-144²-cell tissue classification for dense inference windows.

    For margin-304 geometries (input = 144·n + 304), the 448-window the
    reference would center on output cell k has bottom features at dense
    bottom indices [9k, 9k+28), and its center-9² crop (net_desc.py:64-76,
    crop start int((28-9)/2) = 9) is exactly dense bottom [9k+9, 9k+18) —
    so a 9×9/stride-9 average pool over bottom[9 : 9+9n] reproduces the
    reference's per-window GAP feature for every cell. n_cells=1 is the
    windowed 448->144 case itself (identical values to the center crop).

    Returns (N, n, n, n_classes) logits (inference only: eval-mode BN).
    """
    x = bottom_feats[:, 9:9 + 9 * n_cells, 9:9 + 9 * n_cells, :]
    x = jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        (1, 9, 9, 1), (1, 9, 9, 1), "VALID") / jnp.asarray(81, x.dtype)
    return _patch_class_mlp(params, x, None, None)


def pclass_for_cells(params, bottom_feats, n_cells: int):
    """Grid Patch-Class head when the bottom geometry supports it (bottom
    must be the /16-scale 9n+19 plane the cell math assumes), else the
    reference's single-class center-crop head."""
    expect = 9 * n_cells + 19
    if n_cells > 1 and bottom_feats.shape[1] == expect \
            and bottom_feats.shape[2] == expect:
        return patch_class_head_grid(params, bottom_feats, n_cells)
    return _patch_class_head(params, bottom_feats, None, None)


def subtype_frozen_prefixes(cfg: ModelConfig):
    """Subtype fine-tune freezing (reference ``_freeze_weight``,
    net_desc.py:105-142): backbone, conv_map, Patch-Class and every decoder
    + output head EXCEPT the active TYPE decoder(s) are frozen — their
    params get no gradient (and no optimizer update) and their BN layers run
    in eval mode (stored running stats, no stat updates).

    Returns a predicate ``frozen(param_or_module_name) -> bool``, or None
    when no subtype flag is set (normal training: nothing frozen)."""
    if not (cfg.subtype_gland or cfg.subtype_nuclei):
        return None
    trainable = []
    if cfg.subtype_gland:
        trainable.append("Gland#TYPE")
    if cfg.subtype_nuclei:
        trainable.append("Nuclei#TYPE")

    def frozen(name: str) -> bool:
        for t in trainable:
            if name.startswith(f"decoder_head.{t}.") or name.startswith(
                    f"output_head.{t}."):
                return False
        return True

    return frozen


def net_forward(
    params,
    imgs,
    cfg: ModelConfig,
    *,
    train_decoder_list: Tuple[str, ...] = (),
    bn_sink: Optional[dict] = None,
    dropout_rng=None,
    compute_dtype=jnp.float32,
    remat=False,
    pclass_cells: int = 1,
    paired: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Run all considered heads. ``imgs``: NHWC, any numeric dtype, 0-255.

    Returns {head_code: NHWC logits}. With ``bn_sink`` given (train mode),
    batch statistics are used and recorded, and branches outside
    ``train_decoder_list`` have gradients stopped at their outputs.

    ``paired=True`` routes the encoder front (models/paired_encoder.py)
    AND the decoder towers' 64-channel finest levels + heads
    (models/paired_tower.py) through the width-paired lowering — the
    training-side counterpart of the inference TPU default
    (run_train.py --paired; reassociation-only divergence, PARITY.md;
    1.42x device ms/step at b8 bf16). Requires a basic-block resnet and
    W % 4 == 0.
    """
    training = bn_sink is not None
    if paired:
        from .paired_encoder import supports_paired_encoder

        if not supports_paired_encoder(cfg.encoder_backbone_name,
                                       int(imgs.shape[2])):
            raise ValueError(
                f"paired=True needs a basic-block resnet and width % 4 == 0"
                f" (got {cfg.encoder_backbone_name}, W={imgs.shape[2]})")
    _init_fn, backbone_fwd, _filters = get_backbone(cfg.encoder_backbone_name)
    dsf = _is_dsf(cfg)

    def _maybe_remat(fn, stage):
        """Per-stage rematerialization: BN batch stats are produced inside
        the checkpointed region and RETURNED (a local sink becomes an output
        pytree), so remat never leaks tracers through a side channel. Peak
        training memory drops from the sum of stage activations to roughly
        the largest single stage.

        ``remat`` may be a bool (True = checkpoint every stage) or a
        granularity string: "backbone" / "towers" checkpoint only that
        stage class — the backward pass then recomputes only that side
        while the other side's activations stay stored.  Measured at
        448² resnet34 on 16 GB HBM, the selective modes do NOT fit the
        practical configs (b12 f32 / b16 bf16 towers-only both miss by
        ~1 GB: the stored backbone dominates once tower residuals
        shrink) — remat=True is what buys the reference-default batch
        (BASELINE.md "Training-step"); the granularities are kept for
        smaller geometries / other backbones.
        """
        if remat not in (False, True, "backbone", "towers"):
            raise ValueError(f"remat must be bool or 'backbone'/'towers', "
                             f"got {remat!r}")
        if remat is True or (remat == "backbone" and stage == "backbone") or (
                remat == "towers" and stage == "tower"):
            return jax.checkpoint(fn)
        return fn

    x = imgs.astype(compute_dtype) / jnp.asarray(255.0, compute_dtype)

    # Subtype fine-tuning: frozen modules use stored BN running stats and
    # record nothing (reference _freeze_weight puts their BN in eval mode).
    frozen_pred = subtype_frozen_prefixes(cfg)
    trunk_train = training and frozen_pred is None

    def run_backbone(p, x):
        sink: Dict = {}
        if paired:
            from .paired_decode import unpair_w
            from .paired_encoder import resnet_forward_paired

            feats = resnet_forward_paired(p, x, cfg.encoder_backbone_name,
                                          "backbone",
                                          sink if trunk_train else None)
            # decoders consume the regular unpaired pyramid in training
            feats = [unpair_w(feats[0]), unpair_w(feats[1])] + feats[2:]
        else:
            feats = backbone_fwd(p, x, "backbone",
                                 sink if trunk_train else None)
        return feats, sink

    feat_list, stage_stats = _maybe_remat(run_backbone, "backbone")(params, x)
    if trunk_train:
        bn_sink.update(stage_stats)
    bottom_feats = feat_list[-1]
    if not dsf:
        feat_list = feat_list[:-1] + [conv2d(params["conv_map"], bottom_feats,
                                             padding=0)]

    def branch_trainable(decoder_name: str) -> bool:
        flag = decoder_name in train_decoder_list
        if cfg.subtype_gland or cfg.subtype_nuclei:
            if "TYPE" not in decoder_name:
                return False
            if ("Gland" in decoder_name and not cfg.subtype_gland) or (
                    "Nuclei" in decoder_name and not cfg.subtype_nuclei):
                return False
        return flag

    output_dict: Dict[str, jnp.ndarray] = {}
    for decoder_name, heads in cfg.decoder_info:
        if decoder_name not in cfg.considered_tasks:
            continue
        # per-branch BN mode: eval (stored stats, no recording) when the
        # branch is subtype-frozen
        dec_train = training and (frozen_pred is None or
                                  not frozen_pred(f"decoder_head.{decoder_name}."))
        dec_sink = bn_sink if dec_train else None
        if decoder_name == "Patch-Class":
            if dsf:
                raise NotImplementedError(
                    "Patch-Class head assumes 512-ch bottom features "
                    "(net_desc.py:68) and is incompatible with dsf encoders "
                    "in the reference as well")
            if pclass_cells > 1 and not training:
                # dense inference windows: per-144² cell classification
                out = pclass_for_cells(params, bottom_feats, pclass_cells)
            else:
                out = _patch_class_head(params, bottom_feats, dec_sink,
                                        dropout_rng if training else None)
            if training and not branch_trainable(decoder_name):
                out = jax.lax.stop_gradient(out)
            output_dict["Patch-Class"] = out
            continue
        if dsf:
            from .gconv import group_pool

            nr = _nr_orients(cfg)

        # The whole branch — tower AND its output heads — is one remat
        # region: with the heads outside, each branch stores a full-res
        # 64-ch residual (f32[b,448,448,64] padded 2.7x on TPU = 1.5 GB
        # at batch 12; five branches = the HBM peak), while inside the
        # region only the 3-7-ch head logits persist and the backward
        # recomputes two cheap convs per head.
        def run_branch(p, feats, _name=decoder_name, _train=dec_train,
                       _heads=tuple(h for h, _ in heads)):
            sink: Dict = {}
            s = sink if _train else None
            if paired:
                # width-paired tower + heads (models/paired_tower.py): the
                # 64-channel finest levels — the dominant training FLOPs —
                # run at full MXU lane occupancy; reassociation-only
                # divergence (PARITY.md)
                from .paired_tower import paired_train_head, paired_train_tower

                prev = paired_train_tower(p, _name, feats, s)
                return {
                    head_name: paired_train_head(
                        p, f"output_head.{_name}.{head_name}.x", prev, s)
                    for head_name in _heads
                }, sink
            if dsf:
                prev = _gconv_decoder_tower(p, _name, feats, nr, s)
                prev = group_pool(prev, nr, "max")
            else:
                prev = _decoder_tower(p, _name, feats, s)
            outs = {}
            for head_name in _heads:
                if dsf:
                    base = f"output_head.{_name}.{head_name}"
                    out = prev
                    for li in range(2):
                        out = relu(apply_bn(p, f"{base}.block.{li}.bn",
                                            out, s))
                        out = conv2d(p[f"{base}.block.{li}.conv"], out,
                                     padding=0)
                else:
                    base = f"output_head.{_name}.{head_name}.x"
                    out = _conv_block(p, f"{base}.0", prev, 1, s)
                    out = conv2d(p[f"{base}.1.conv"], out, padding=0)
                outs[head_name] = out
            return outs, sink

        outs, branch_stats = _maybe_remat(run_branch, "tower")(params,
                                                               feat_list)
        if dec_train:
            bn_sink.update(branch_stats)
        for head_name, _out_ch in heads:
            out = outs[head_name]
            if training and not branch_trainable(decoder_name):
                out = jax.lax.stop_gradient(out)
            output_dict[decoder_name.split("#")[0] + "-" + head_name] = out
    return output_dict
