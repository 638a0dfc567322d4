"""Partial-task configurations: nuclei-only checkpoint (graded config 1 —
single 448^2 tile, nuclei instance+semantic heads only, batch 1, CPU)."""
import numpy as np

import jax

from cerberus_tpu.config import ModelConfig
from cerberus_tpu.infer.steps import make_infer_step
from cerberus_tpu.models.net_desc import init_net_params

NUCLEI_KWARGS = {
    "encoder_backbone_name": "resnet34",
    "decoder_kwargs": {"Nuclei": {"INST": 3}, "Nuclei#TYPE": {"TYPE": 7}},
    "considered_tasks": ["Nuclei", "Nuclei#TYPE"],
}


def test_nuclei_only_single_tile_batch1():
    cfg = ModelConfig.from_kwargs(NUCLEI_KWARGS)
    params = init_net_params(jax.random.PRNGKey(0), cfg)
    step = make_infer_step(params, cfg, output_shape=144)
    img = np.random.default_rng(0).integers(
        0, 255, (1, 448, 448, 3)).astype(np.uint8)
    out = np.asarray(step(img))
    # canvas channels: Nuclei-INST fg x2 + Nuclei-TYPE argmax x1
    assert out.shape == (1, 144, 144, 3)
    probs = out[..., 0:2]
    assert probs.min() >= 0.0 and probs.max() <= 1.0
    types = out[..., 2]
    assert types.min() >= 0 and types.max() <= 6
    assert np.all(types == np.round(types))
