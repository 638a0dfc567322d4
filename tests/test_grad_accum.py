"""Gradient-accumulation equivalence (ADVICE r3 medium).

``make_train_step(grad_accum=K)`` must equal K manual grad computations
averaged into ONE optimizer update, with BN running stats folded per
microbatch in order (what K torch forwards before one ``optimizer.step()``
produce — reference run semantics, models/run_desc.py:25-230, which the
reference reaches with a big device instead of accumulation).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.models.net_desc import init_net_params
from cerberus_tpu.train.steps import (
    TrainState,
    _apply_bn_updates,
    _loss_table_static,
    head_order,
    make_optimizer,
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
def init():
    params = _tame_heads(init_net_params(jax.random.PRNGKey(0), CFG))
    tx, _ = make_optimizer({"lr": 1e-3})
    return params, tx


def test_grad_accum_matches_manual_sequential(init):
    """grad_accum=K decomposes into: (a) grads == K explicit per-microbatch
    grads averaged, (b) ONE optax update applied to those grads, (c) BN
    running stats == K sequential momentum folds in microbatch order (the
    closed-form stacked fold in _apply_bn_updates_stacked).

    (b) is verified against the step's OWN returned grads: comparing
    post-Adam weights across independently-summed grads would amplify f32
    summation-order noise on near-zero gradients to ~lr (update ->
    lr*g/(|g|+eps) flips sign at |g| ~ eps)."""
    params, tx = init
    k, n = 2, 4
    rng_np = np.random.default_rng(1)
    batch = _make_batch(rng_np, n=n)
    key = jax.random.PRNGKey(7)

    step_fn, tx_a = make_train_step(CFG, LOSS_KWARGS, {"lr": 1e-3},
                                    donate=False, grad_accum=k,
                                    return_grads=True)
    state = TrainState(params=params, opt_state=tx_a.init(params),
                       step=jnp.zeros((), jnp.int32))
    new_state, metrics, step_grads = step_fn(state, batch, key)

    # --- manual reference: same microbatch split, same rng split ---
    loss_tables = _loss_table_static(LOSS_KWARGS, CFG)
    mb_rngs = jax.random.split(key, k)

    def loss_fn(p, mb, r):
        sink = {}
        total, mets = multitask_loss(p, mb, CFG, loss_tables, sink, r)
        return total, (mets, sink)

    g_sum = None
    m_sum = None
    folds = []
    for i in range(k):
        mb = {key_: np.asarray(v).reshape((k, n // k) + v.shape[1:])[i]
              for key_, v in batch.items()}
        (_, (mets, sink)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params, mb, mb_rngs[i])
        g_sum = g if g_sum is None else jax.tree.map(jnp.add, g_sum, g)
        m_sum = mets if m_sum is None else jax.tree.map(jnp.add, m_sum, mets)
        folds.append(sink)
    grads = jax.tree.map(lambda x: x / k, g_sum)
    want_metrics = jax.tree.map(lambda x: x / k, m_sum)

    # (a) averaged gradients. Tolerance calibration (measured, CPU f32):
    # stem-level grads sum five towers' large partially-cancelling
    # contributions at random init, so even plain jit-vs-eager of ONE
    # microbatch differs ~2e-3 abs on backbone.bn1.bias; the jitted-scan
    # vs eager-loop comparison lands ~4e-2 rel there. Structural bugs
    # (missing/double-counted microbatch, wrong rng routing, bad averaging)
    # are O(1) rel and still caught.
    for name in grads:
        for leaf, arr in grads[name].items():
            np.testing.assert_allclose(
                np.asarray(step_grads[name][leaf]), np.asarray(arr),
                rtol=1e-1, atol=5e-3, err_msg=f"grad {name}.{leaf}")
    np.testing.assert_allclose(
        float(metrics["overall_loss"]), float(want_metrics["overall_loss"]),
        rtol=1e-5)

    # (b) one optimizer update on the step's own grads
    updates, _ = tx.update(step_grads, tx.init(params), params)
    want_params = optax.apply_updates(params, updates)
    # (c) sequential momentum folds, microbatch order
    for sink in folds:
        want_params = _apply_bn_updates(want_params, sink)

    for name in want_params:
        for leaf, arr in want_params[name].items():
            # atol 1e-4: jit-scan vs eager forward noise on near-zero BN
            # batch stats (e.g. Patch-Class bn means post-dropout) measured
            # 1.9e-5 abs; weights move by ~lr=1e-3 so structure errors in
            # the update/fold are still 10x the bound
            np.testing.assert_allclose(
                np.asarray(new_state.params[name][leaf]), np.asarray(arr),
                rtol=2e-5, atol=1e-4, err_msg=f"{name}.{leaf}")


def test_grad_accum_grads_match_plain_on_duplicated_batch(init):
    """On a batch of K identical microbatches every per-microbatch loss
    normalizer (masked-head counts, batch-joint dice) equals the full-batch
    one, so accumulated grads == plain full-batch grads exactly (the
    documented divergence only appears for UNEVEN normalizers)."""
    params, tx = init
    k = 2
    rng_np = np.random.default_rng(2)
    mb = _make_batch(rng_np, n=2)
    batch = {key_: np.concatenate([v] * k) for key_, v in mb.items()}

    # the Patch-Class head's DROPOUT mask differs between the paths (the
    # plain step consumes the key whole, accumulation splits it per
    # microbatch), so its weight must be 0 for gradient equality — the
    # remaining five heads are rng-free
    loss_kwargs = {"loss_info": dict(LOSS_KWARGS["loss_info"],
                                     **{"Patch-Class": {"weight": 0,
                                                        "loss": {"ce": 1}}})}
    kwargs = dict(donate=False, return_grads=True)
    step1, tx1 = make_train_step(CFG, loss_kwargs, {"lr": 1e-3}, **kwargs)
    stepk, txk = make_train_step(CFG, loss_kwargs, {"lr": 1e-3},
                                 grad_accum=k, **kwargs)
    s0 = TrainState(params=params, opt_state=tx1.init(params),
                    step=jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(3)
    _, m1, g1 = step1(s0, batch, key)
    s0 = TrainState(params=params, opt_state=txk.init(params),
                    step=jnp.zeros((), jnp.int32))
    _, mk, gk = stepk(s0, batch, key)

    flat1 = jax.tree.leaves(g1)
    flatk = jax.tree.leaves(gk)
    for a, b in zip(flat1, flatk):
        # same cancellation-amplification caveat as the manual test above
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-1, atol=5e-3)
    np.testing.assert_allclose(float(m1["overall_loss"]),
                               float(mk["overall_loss"]), rtol=1e-5)


def test_grad_accum_on_mesh(init):
    """grad_accum composes with the 8-virtual-device DP mesh: microbatches
    stay batch-sharded (P(None,'data')) and the step runs; non-divisible
    batches raise the explicit error (ADVICE r3 low)."""
    import conftest

    from cerberus_tpu.parallel.mesh import make_mesh, make_sharded_train_step

    params, _ = init
    mesh = make_mesh(conftest.cpu_mesh_devices())
    run, init_state, _tx = make_sharded_train_step(
        CFG, mesh, LOSS_KWARGS, grad_accum=2)
    state = init_state(params)
    batch = _make_batch(np.random.default_rng(3), n=32)
    new_state, metrics = run(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["overall_loss"]))
    assert int(new_state.step) == 1

    bad = _make_batch(np.random.default_rng(4), n=24)  # 24 % (2*8) != 0
    with pytest.raises(ValueError, match="divisible"):
        run(state, bad, jax.random.PRNGKey(0))
