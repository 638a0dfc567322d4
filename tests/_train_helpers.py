"""Shared train-test fixtures: the small resnet18 6-head config, a loss
table, a synthetic batch builder, and the head-logit taming re-export —
single source of truth for test_paired_train.py / test_grad_accum.py
(the taming logic itself lives in cerberus_tpu.train.utils so
__graft_entry__.py can share it too)."""
import numpy as np

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.train.steps import head_order
from cerberus_tpu.train.utils import tame_head_logits as _tame_heads  # noqa: F401

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
}


def _make_batch(rng, n=2, hw=48, cfg=CFG):
    heads = head_order(cfg)
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
