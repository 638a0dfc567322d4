"""Training-step semantics: masked multi-task loss, BN stat updates, and the
8-device CPU-mesh data-parallel path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.models.net_desc import init_net_params
from cerberus_tpu.train.steps import (
    TrainState,
    head_order,
    make_lr_schedule,
    make_train_step,
    make_optimizer,
)

# tiny geometry: 48^2 input keeps CPU compile+run fast; bottom feats are 3x3
MODEL_KWARGS = {
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
}
CFG = ModelConfig.from_kwargs(MODEL_KWARGS)

LOSS_KWARGS = {
    "loss_info": {
        "Lumen-INST": {"weight": 1.5, "loss": {"ce": 1}},
        "Gland-INST": {"weight": 1.4, "loss": {"ce": 1}},
        "Nuclei-INST": {"weight": 1, "loss": {"ce": 1}},
        "Nuclei-TYPE": {"weight": 0, "loss": {"ce": 1, "dice": 1}},
        "Gland-TYPE": {"weight": 1, "loss": {"ce": 1, "dice": 1}},
        "Patch-Class": {"weight": 0.4, "loss": {"ce": 1}},
    },
    "class_weight": {
        "Gland-TYPE": {1: 1, 2: 1},
        "Nuclei-TYPE": {1: 12, 2: 1, 3: 2, 4: 6, 5: 12, 6: 2},
    },
}


def _make_batch(rng, n=2, hw=48):
    heads = head_order(CFG)
    batch = {
        "img": rng.integers(0, 255, (n, hw, hw, 3)).astype(np.uint8),
        "has_target": np.ones((n, len(heads)), np.float32),
    }
    ch = {"Lumen-INST": 3, "Gland-INST": 3, "Nuclei-INST": 3,
          "Nuclei-TYPE": 7, "Gland-TYPE": 3}
    for head, n_cls in ch.items():
        batch[head] = rng.integers(0, n_cls, (n, hw, hw, 1)).astype(np.int32)
        if head.endswith("-INST"):
            batch[head + "#WEIGHT-MAP"] = np.ones((n, hw, hw, 1), np.float32)
    batch["Patch-Class"] = rng.integers(0, 9, (n, 1, 1, 1)).astype(np.int32)
    return batch


@pytest.fixture(scope="module")
def state_and_step():
    params = init_net_params(jax.random.PRNGKey(0), CFG)
    step_fn, tx = make_train_step(CFG, LOSS_KWARGS, {"lr": 1e-3},
                                  donate=False)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    return state, step_fn


def test_train_step_updates_params_and_bn(state_and_step):
    state, step_fn = state_and_step
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))

    assert float(metrics["overall_loss"]) > 0
    assert int(new_state.step) == 1
    # trainable weights moved
    w0 = state.params["backbone.conv1"]["kernel"]
    w1 = new_state.params["backbone.conv1"]["kernel"]
    assert not np.allclose(np.asarray(w0), np.asarray(w1))
    # BN running stats moved (mean was 0, batch mean isn't)
    m0 = np.asarray(state.params["backbone.bn1"]["mean"])
    m1 = np.asarray(new_state.params["backbone.bn1"]["mean"])
    assert not np.allclose(m0, m1)
    # zero-weight head tracked but contributes nothing
    assert float(metrics["Nuclei-TYPE_loss"]) == 0.0


def test_dummy_masking_zeroes_missing_heads(state_and_step):
    state, step_fn = state_and_step
    rng = np.random.default_rng(1)
    batch = _make_batch(rng)
    heads = head_order(CFG)
    # mark Gland-INST GT as dummy for all samples + zero the map
    gi = heads.index("Gland-INST")
    batch["has_target"][:, gi] = 0.0
    batch["Gland-INST"][:] = 0
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert float(metrics["Gland-INST_loss"]) == 0.0
    assert float(metrics["overall_loss"]) > 0


def test_lr_schedule_steps():
    sched = make_lr_schedule(1e-3, decay_steps=10, gamma=0.1)
    assert np.isclose(sched(0), 1e-3)
    assert np.isclose(sched(9), 1e-3)
    assert np.isclose(sched(10), 1e-4)
    assert np.isclose(sched(20), 1e-5)


def test_optimizer_masks_bn_stats():
    params = {"backbone.bn1": {"scale": jnp.ones(4), "bias": jnp.zeros(4),
                               "mean": jnp.zeros(4), "var": jnp.ones(4)},
              "conv": {"kernel": jnp.ones((1, 1, 4, 4))}}
    tx, _ = make_optimizer({"lr": 1.0})
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # stats untouched, trainables updated
    assert float(jnp.abs(updates["backbone.bn1"]["mean"]).max()) == 0.0
    assert float(jnp.abs(updates["conv"]["kernel"]).max()) > 0.0


def test_data_parallel_mesh_train_step():
    import conftest

    from cerberus_tpu.parallel.mesh import make_mesh, make_sharded_train_step

    mesh = make_mesh(conftest.cpu_mesh_devices())
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices
    run, init_state, _tx = make_sharded_train_step(CFG, mesh, LOSS_KWARGS)
    params = init_net_params(jax.random.PRNGKey(0), CFG)
    state = init_state(params)
    rng_np = np.random.default_rng(2)
    batch = _make_batch(rng_np, n=8)
    new_state, metrics = run(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["overall_loss"]))
    assert int(new_state.step) == 1


def test_remat_train_step_matches_plain():
    """Per-stage jax.checkpoint must not change the math — identical
    metrics and updated params vs the non-remat step."""
    params = init_net_params(jax.random.PRNGKey(3), CFG)
    rng_np = np.random.default_rng(5)
    batch = _make_batch(rng_np)
    key = jax.random.PRNGKey(2)

    outs = {}
    # granularity strings checkpoint only that stage class (run_train.py
    # --remat=backbone/towers); each must stay in the same reassociation
    # band as full remat
    for remat in (False, True, "backbone", "towers"):
        step_fn, tx = make_train_step(CFG, LOSS_KWARGS, {"lr": 1e-3},
                                      donate=False, remat=remat)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        new_state, metrics = step_fn(state, batch, key)
        outs[remat] = (new_state, metrics)

    m0 = outs[False][1]
    p0 = np.asarray(outs[False][0].params["backbone.conv1"]["kernel"])
    s0 = outs[False][0].params["backbone.bn1"]["mean"]
    for mode in (True, "backbone", "towers"):
        m1 = outs[mode][1]
        for k in m0:
            np.testing.assert_allclose(np.asarray(m0[k]), np.asarray(m1[k]),
                                       rtol=1e-5, err_msg=f"{mode}:{k}")
        # recompute reassociates float ops; near-zero grads can flip Adam's
        # +-lr normalized update, so allow a 2*lr band on a tiny fraction
        p1 = np.asarray(outs[mode][0].params["backbone.conv1"]["kernel"])
        np.testing.assert_allclose(p0, p1, atol=2.5e-3, err_msg=str(mode))
        assert (np.abs(p0 - p1) > 1e-6).mean() < 0.005, mode
        # BN stats updated identically through the remat boundary
        s1 = outs[mode][0].params["backbone.bn1"]["mean"]
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   atol=1e-6, err_msg=str(mode))


def test_bf16_train_step_mixed_precision():
    """--bf16 mixed precision: activations in bfloat16, but params/opt
    moments/BN stats stay float32, the loss tracks the fp32 step closely,
    and a second step keeps improving (no dtype-induced blowup)."""
    params = init_net_params(jax.random.PRNGKey(3), CFG)
    rng_np = np.random.default_rng(5)
    batch = _make_batch(rng_np)
    key = jax.random.PRNGKey(2)

    outs = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        step_fn, tx = make_train_step(CFG, LOSS_KWARGS, {"lr": 1e-3},
                                      compute_dtype=dtype, donate=False)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        new_state, metrics = step_fn(state, batch, key)
        outs[dtype] = (new_state, metrics)

    m32 = outs[jnp.float32][1]
    m16 = outs[jnp.bfloat16][1]
    for k in m32:
        a, b = float(m32[k]), float(m16[k])
        assert np.isfinite(b), k
        # bf16 has ~3 decimal digits; losses are O(1)
        assert abs(a - b) <= 0.05 * max(abs(a), 1.0), (k, a, b)
    st16 = outs[jnp.bfloat16][0]
    # master weights, optimizer moments and BN statistics remain fp32
    assert st16.params["backbone.conv1"]["kernel"].dtype == jnp.float32
    assert st16.params["backbone.bn1"]["mean"].dtype == jnp.float32
    leaf_dtypes = {l.dtype for l in jax.tree.leaves(st16.opt_state)
                   if hasattr(l, "dtype") and l.dtype.kind == "f"}
    assert leaf_dtypes <= {np.dtype("float32")}
    # BN stats moved (batch statistics were recorded through the bf16 pass)
    assert not np.allclose(np.asarray(st16.params["backbone.bn1"]["mean"]),
                           np.asarray(params["backbone.bn1"]["mean"]))


def test_bf16_trainer_build(tmp_path):
    """compute_dtype threads through build_trainer (non-mesh path)."""
    from cerberus_tpu.train.opt import build_trainer, get_config

    config = get_config(MODEL_KWARGS, LOSS_KWARGS, {"lr": 1e-3},
                        nr_epochs=1, per_n_steps=10)
    rng_np = np.random.default_rng(0)
    batch = _make_batch(rng_np)
    loaders = {"train": [batch]}
    train_engine, infer_engine, net = build_trainer(
        config, loaders, {"valid": [batch]}, compute_dtype=jnp.bfloat16)
    new_state, metrics = net.train_step(net.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["overall_loss"]))
    assert new_state.params["backbone.conv1"]["kernel"].dtype == jnp.float32


def test_train_state_checkpoint_roundtrip(tmp_path):
    """Full train-state save/restore: optimizer moments and step survive."""
    from cerberus_tpu.models.convert import (
        load_checkpoint,
        load_train_state,
        save_train_state,
    )

    params = init_net_params(jax.random.PRNGKey(0), CFG)
    step_fn, tx = make_train_step(CFG, LOSS_KWARGS, {"lr": 1e-3},
                                  donate=False)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    batch = _make_batch(np.random.default_rng(0))
    state, _ = step_fn(state, batch, jax.random.PRNGKey(1))

    path = str(tmp_path / "ckpt.tar")
    save_train_state(path, state.params, state.opt_state,
                     step=int(state.step))

    template = tx.init(params)
    p2, opt2, step2 = load_train_state(path, template)
    assert step2 == 1
    # adam moments restored (nonzero after one step)
    flat_a = jax.tree.leaves(state.opt_state)
    flat_b = jax.tree.leaves(opt2)
    assert len(flat_a) == len(flat_b)
    moved = [np.abs(np.asarray(x)).max() for x in flat_b
             if hasattr(x, "shape") and np.asarray(x).size > 1]
    assert any(m > 0 for m in moved)
    # params-only loader still reads the same file
    p3 = load_checkpoint(path)
    np.testing.assert_allclose(
        np.asarray(p3["backbone.conv1"]["kernel"]),
        np.asarray(state.params["backbone.conv1"]["kernel"]))


def test_data_parallel_mesh_train_step_paired():
    """--paired on the mesh: the width-paired training forward+backward
    composes with batch sharding (per-device microbatch width still
    satisfies W % 4 == 0 since pairing is a width-axis lowering, not a
    batch-axis one)."""
    import conftest

    from cerberus_tpu.parallel.mesh import make_mesh, make_sharded_train_step

    mesh = make_mesh(conftest.cpu_mesh_devices())
    run, init_state, _tx = make_sharded_train_step(CFG, mesh, LOSS_KWARGS,
                                                   paired=True)
    params = init_net_params(jax.random.PRNGKey(0), CFG)
    state = init_state(params)
    batch = _make_batch(np.random.default_rng(3), n=8)
    new_state, metrics = run(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["overall_loss"]))
    assert int(new_state.step) == 1
