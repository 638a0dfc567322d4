"""Subtype fine-tuning freezes the trunk (reference ``_freeze_weight``,
models/net_desc.py:105-142): backbone/conv_map/non-active decoders get no
gradient, no optimizer update, and their BN runs in eval mode (running
stats used and NOT updated). Only the active TYPE decoder trains."""
import numpy as np

import jax

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.models.net_desc import (
    init_net_params,
    subtype_frozen_prefixes,
)
from cerberus_tpu.train.steps import TrainState, head_order, make_train_step

MODEL_KWARGS = {
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
    "subtype_gland": True,
}
CFG = ModelConfig.from_kwargs(MODEL_KWARGS)

LOSS_KWARGS = {
    "loss_info": {
        "Lumen-INST": {"weight": 1, "loss": {"ce": 1}},
        "Gland-INST": {"weight": 1, "loss": {"ce": 1}},
        "Nuclei-INST": {"weight": 1, "loss": {"ce": 1}},
        "Nuclei-TYPE": {"weight": 1, "loss": {"ce": 1}},
        "Gland-TYPE": {"weight": 1, "loss": {"ce": 1, "dice": 1}},
        "Patch-Class": {"weight": 0.4, "loss": {"ce": 1}},
    },
}


def test_frozen_predicate():
    frozen = subtype_frozen_prefixes(CFG)
    assert frozen is not None
    assert frozen("backbone.conv1")
    assert frozen("conv_map")
    assert frozen("decoder_head.Gland.0.block.0.conv")
    assert frozen("output_head.Gland.INST.x.1.conv")
    assert frozen("decoder_head.Patch-Class.conv1")
    assert not frozen("decoder_head.Gland#TYPE.0.block.0.conv")
    assert not frozen("output_head.Gland#TYPE.TYPE.x.0.block.0.conv")
    # not in subtype mode -> nothing frozen
    assert subtype_frozen_prefixes(ModelConfig.from_kwargs(
        {**MODEL_KWARGS, "subtype_gland": False})) is None


def test_subtype_step_only_updates_active_type_decoder():
    rng = np.random.default_rng(0)
    params = init_net_params(jax.random.PRNGKey(0), CFG)
    step_fn, tx = make_train_step(CFG, LOSS_KWARGS, {"lr": 1.0e-2})
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=np.int32(0))

    heads = head_order(CFG)
    n, hw = 2, 48
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

    before = jax.tree.map(np.asarray, state.params)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    after = jax.tree.map(np.asarray, new_state.params)

    frozen = subtype_frozen_prefixes(CFG)
    changed_trainable = 0
    for name in before:
        for key in before[name]:
            a, b = before[name][key], after[name][key]
            if frozen(name):
                # weights AND BN running stats must be untouched
                np.testing.assert_array_equal(
                    a, b, err_msg=f"frozen {name}.{key} changed")
            elif key not in ("mean", "var"):
                changed_trainable += int(not np.array_equal(a, b))
    assert changed_trainable > 0, "active TYPE decoder did not train"
    # the active decoder's BN stats DO update (it is in train mode)
    bn_name = "decoder_head.Gland#TYPE.0.block.0.bn"
    assert not np.array_equal(before[bn_name]["mean"], after[bn_name]["mean"])
