"""Width-paired TRAINING path (VERDICT r3 task 2): forward+backward through
the paired encoder front must match the unpaired bit-exact path up to conv
reassociation (the divergence class the inference TPU default already
carries, PARITY.md), with BN batch stats folded exactly to the unpaired
channel statistics.

Reference match: models/run_desc.py:25-230 (train_step being accelerated).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.models.net_desc import init_net_params, net_forward
from cerberus_tpu.train.steps import (
    TrainState,
    _loss_table_static,
    head_order,
    make_train_step,
    multitask_loss,
)

from tests._train_helpers import (  # noqa: E402  (shared fixtures)
    CFG,
    LOSS_KWARGS,
    MODEL_KWARGS,
    _make_batch,
    _tame_heads,
)


@pytest.fixture(scope="module")
def params():
    return _tame_heads(init_net_params(jax.random.PRNGKey(0), CFG))


def test_paired_train_forward_and_bn_stats_match(params):
    """Train-mode forward: logits and recorded BN batch stats match the
    unpaired path (reassociation-level tolerances; _paired_bn_train's exact
    parity fold)."""
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 48, 48, 3), np.uint8))
    outs, sinks = {}, {}
    for paired in (False, True):
        sink = {}
        outs[paired] = net_forward(
            params, imgs, CFG,
            train_decoder_list=tuple(CFG.active_decoders()),
            bn_sink=sink, paired=paired)
        sinks[paired] = sink
    for head in outs[False]:
        np.testing.assert_allclose(
            np.asarray(outs[True][head]), np.asarray(outs[False][head]),
            atol=2e-3, rtol=0, err_msg=head)
    assert set(sinks[True]) == set(sinks[False])
    for name in sinks[False]:
        for i, what in enumerate(("mean", "var")):
            np.testing.assert_allclose(
                np.asarray(sinks[True][name][i]),
                np.asarray(sinks[False][name][i]),
                atol=5e-3, rtol=1e-3, err_msg=f"{name} {what}")


def test_paired_train_loss_and_grads_match(params):
    """value_and_grad through the paired forward: loss and gradient tree
    match the unpaired path (post-Adam params are NOT compared — near-zero
    gradients amplify reassociation noise to ~lr through g/(|g|+eps))."""
    loss_tables = _loss_table_static(LOSS_KWARGS, CFG)
    batch = _make_batch(np.random.default_rng(1))
    key = jax.random.PRNGKey(2)

    results = {}
    for paired in (False, True):
        def loss_fn(p):
            sink = {}
            total, mets = multitask_loss(p, batch, CFG, loss_tables, sink,
                                         key, paired=paired)
            return total, mets
        (loss, mets), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        results[paired] = (float(loss), grads)

    loss_u, g_u = results[False]
    loss_p, g_p = results[True]
    # Tolerance calibration (measured, CPU f32): loss rel ~1e-4. Full-model
    # gradients at RANDOM init amplify reassociation noise via cancellation
    # — the stem grads sum five towers' large, partially-cancelling
    # contributions, so even plain jit-vs-eager of the UNPAIRED path
    # differs by ~2e-3 abs on backbone.bn1.bias and the paired path lands
    # ~2% rel there. The tight backward correctness check is
    # test_paired_encoder_backward_matches (encoder-isolated: <=5e-6 abs);
    # this test guards structure (scaling/averaging/rng-routing bugs are
    # O(1) rel).
    np.testing.assert_allclose(loss_p, loss_u, rtol=1e-3)
    for name in g_u:
        for leaf in g_u[name]:
            a, b = np.asarray(g_p[name][leaf]), np.asarray(g_u[name][leaf])
            # scale-aware atol: the cancellation noise floor on a leaf is
            # proportional to its largest gradient (partial sums are ~1e3x
            # the residual), measured ~1e-3 x max|g| on conv1.kernel
            atol = max(1e-3, 5e-3 * float(np.abs(b).max()))
            np.testing.assert_allclose(
                a, b, atol=atol, rtol=5e-2, err_msg=f"grad {name}.{leaf}")


def test_paired_encoder_backward_matches(params):
    """Encoder-isolated backward: gradients through the paired train-mode
    front (train BN + repacked kernels + maxpool) vs the unpaired backbone
    match at reassociation level (<=1e-5 abs, measured ~5e-6) — the tight
    correctness check for the paired backward, free of the loss-side
    cancellation amplification documented above."""
    from cerberus_tpu.models.backbones.resnet import resnet_forward
    from cerberus_tpu.models.paired_decode import unpair_w
    from cerberus_tpu.models.paired_encoder import resnet_forward_paired

    x = jnp.asarray(
        np.random.default_rng(5).random((2, 48, 48, 3)), jnp.float32)

    def loss(p, paired):
        sink = {}
        if paired:
            feats = resnet_forward_paired(p, x, "resnet18", "backbone", sink)
            feats = [unpair_w(feats[0]), unpair_w(feats[1])] + feats[2:]
        else:
            feats = resnet_forward(p, x, "resnet18", "backbone", sink)
        return sum(jnp.sum(jnp.square(f)) for f in feats) / 1e4

    bb = {k: v for k, v in params.items() if k.startswith("backbone.")}
    lu, gu = jax.value_and_grad(lambda p: loss(p, False))(bb)
    lp, gp = jax.value_and_grad(lambda p: loss(p, True))(bb)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-6)
    for name in gu:
        for leaf in gu[name]:
            np.testing.assert_allclose(
                np.asarray(gp[name][leaf]), np.asarray(gu[name][leaf]),
                atol=1e-5, rtol=0, err_msg=f"grad {name}.{leaf}")


def test_paired_train_step_runs_and_updates(params):
    """The full jitted paired train step (make_train_step(paired=True))
    compiles, runs, and moves the stem weights — including the paired
    kernels' gradient flow back through the repack scatters."""
    step_fn, tx = make_train_step(CFG, LOSS_KWARGS, {"lr": 1e-3},
                                  donate=False, paired=True)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    batch = _make_batch(np.random.default_rng(3))
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["overall_loss"]))
    w0 = np.asarray(state.params["backbone.conv1"]["kernel"])
    w1 = np.asarray(new_state.params["backbone.conv1"]["kernel"])
    assert not np.allclose(w0, w1)
    # BN running stats moved too (the paired train BN recorded real stats)
    m0 = np.asarray(state.params["backbone.bn1"]["mean"])
    m1 = np.asarray(new_state.params["backbone.bn1"]["mean"])
    assert not np.allclose(m0, m1)


def test_paired_rejects_unsupported():
    cfg50 = ModelConfig.from_kwargs(dict(
        MODEL_KWARGS, encoder_backbone_name="resnet50"))
    params50 = init_net_params(jax.random.PRNGKey(0), cfg50)
    imgs = jnp.zeros((1, 48, 48, 3), jnp.uint8)
    with pytest.raises(ValueError, match="basic-block"):
        net_forward(params50, imgs, cfg50, bn_sink={}, paired=True)
    # width not divisible by 4
    params18 = init_net_params(jax.random.PRNGKey(0), CFG)
    with pytest.raises(ValueError, match="basic-block"):
        net_forward(params18, jnp.zeros((1, 46, 46, 3), jnp.uint8), CFG,
                    bn_sink={}, paired=True)


def test_paired_tower_backward_matches(params):
    """Tower-isolated backward: gradients through one width-paired training
    tower + head (train BN, repacked SAME kernels, paired upsample) vs the
    unpaired _decoder_tower path at reassociation level (<=1e-5 abs) — the
    tight correctness check for the paired tower backward, free of the
    full-loss cancellation amplification documented above."""
    from cerberus_tpu.models.net_desc import _conv_block, _decoder_tower
    from cerberus_tpu.models.layers import conv2d
    from cerberus_tpu.models.paired_tower import (
        paired_train_head,
        paired_train_tower,
    )

    rng = np.random.default_rng(7)
    feats = [jnp.asarray(rng.random((2, s, s, c)) - 0.5, jnp.float32)
             for s, c in ((48, 64), (24, 64), (12, 128), (6, 256), (3, 256))]
    name = "Gland"
    sub = {k: v for k, v in params.items()
           if k.startswith(f"decoder_head.{name}.")
           or k.startswith(f"output_head.{name}.INST.")}

    def loss(p, paired):
        sink = {}
        if paired:
            prev = paired_train_tower(p, name, feats, sink)
            out = paired_train_head(p, f"output_head.{name}.INST.x", prev,
                                    sink)
        else:
            prev = _decoder_tower(p, name, feats, sink)
            out = _conv_block(p, f"output_head.{name}.INST.x.0", prev, 1,
                              sink)
            out = conv2d(p[f"output_head.{name}.INST.x.1.conv"], out,
                         padding=0)
        aux = sum(jnp.sum(m) + jnp.sum(v) for m, v in sink.values())
        return jnp.sum(jnp.square(out)) / out.size + aux * 1e-3

    lu, gu = jax.value_and_grad(lambda p: loss(p, False))(sub)
    lp, gp = jax.value_and_grad(lambda p: loss(p, True))(sub)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-5)
    for pname in gu:
        for leaf in gu[pname]:
            np.testing.assert_allclose(
                np.asarray(gp[pname][leaf]), np.asarray(gu[pname][leaf]),
                atol=1e-5, rtol=0, err_msg=f"grad {pname}.{leaf}")


def test_paired_train_forward_matches_resnet34():
    """The bench/production backbone (resnet34: 3-block layer1, deeper
    stages) through the paired training forward at a non-test width (64):
    guards the pairing against layer-count/width assumptions baked into
    the resnet18/48² fixtures above."""
    cfg34 = ModelConfig.from_kwargs(dict(
        MODEL_KWARGS, encoder_backbone_name="resnet34"))
    params34 = _tame_heads(init_net_params(jax.random.PRNGKey(1), cfg34))
    imgs = jnp.asarray(
        np.random.default_rng(9).integers(0, 255, (2, 64, 64, 3), np.uint8))
    outs = {}
    for paired in (False, True):
        sink = {}
        outs[paired] = net_forward(
            params34, imgs, cfg34,
            train_decoder_list=tuple(cfg34.active_decoders()),
            bn_sink=sink, paired=paired)
    for head in outs[False]:
        np.testing.assert_allclose(
            np.asarray(outs[True][head]), np.asarray(outs[False][head]),
            atol=2e-3, rtol=0, err_msg=head)
