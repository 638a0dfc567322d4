"""Training data pipeline: synthetic patch dir -> MTL batches -> one real
train step."""
import os

import numpy as np

import jax

from cerberus_tpu.config import (
    DEFAULT_DECODER_KWARGS,
    DEFAULT_TARGET_CODE,
    ModelConfig,
)
from cerberus_tpu.data.train_loader import MTLPatchDataset
from cerberus_tpu.models.net_desc import init_net_params
from cerberus_tpu.train.steps import TrainState, head_order, make_train_step

MODEL_KWARGS = {
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
}
CFG = ModelConfig.from_kwargs(MODEL_KWARGS)


def _write_samples(data_dir, n=6, hw=64):
    rng = np.random.default_rng(0)
    os.makedirs(data_dir, exist_ok=True)
    for i in range(n):
        inst = np.zeros((hw, hw), np.int32)
        inst[10:30, 10:30] = 1
        inst[35:55, 30:50] = 2
        types = (inst > 0).astype(np.int32) * rng.integers(1, 3)
        if i % 2 == 0:  # half the samples carry gland GT
            ann = np.stack([inst, types], -1)
            channels = ["Gland-INST", "Gland-TYPE"]
        else:  # the others carry nuclei GT
            ann = np.stack([inst, types], -1)
            channels = ["Nuclei-INST", "Nuclei-TYPE"]
        sample = {
            "img": rng.integers(0, 255, (hw, hw, 3)).astype(np.uint8),
            "ann": ann,
            "channels": channels,
            "patch_class": int(rng.integers(0, 9)),
        }
        np.save(os.path.join(data_dir, f"s{i}.npy"), sample)


def test_loader_batches_and_train_step(tmp_path):
    _write_samples(str(tmp_path / "data"))
    ds = MTLPatchDataset.from_dir(
        str(tmp_path / "data"), CFG, DEFAULT_TARGET_CODE,
        input_shape=48, output_shape=48, batch_size=2, seed=1)
    assert len(ds) == 3
    batches = list(ds)
    assert len(batches) == 3
    batch = batches[0]
    heads = head_order(CFG)
    assert batch["img"].shape == (2, 48, 48, 3)
    assert batch["has_target"].shape == (2, len(heads))
    assert batch["Gland-INST"].shape == (2, 48, 48, 1)
    assert set(np.unique(batch["Gland-INST"])) <= {0, 1, 2}
    assert "Gland-INST#WEIGHT-MAP" in batch
    assert batch["Gland-INST#WEIGHT-MAP"].min() >= 1.0
    assert batch["Patch-Class"].shape == (2, 1, 1, 1)
    # each sample has exactly one of gland/nuclei GT present
    gi = heads.index("Gland-INST")
    ni = heads.index("Nuclei-INST")
    assert ((batch["has_target"][:, gi] + batch["has_target"][:, ni]) == 1).all()

    loss_kwargs = {"loss_info": {h: {"weight": 1, "loss": {"ce": 1}}
                                 for h in heads}}
    step_fn, tx = make_train_step(CFG, loss_kwargs, {"lr": 1e-3},
                                  donate=False)
    params = init_net_params(jax.random.PRNGKey(0), CFG)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=np.int32(0))
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["overall_loss"]))
    assert float(metrics["overall_loss"]) > 0
