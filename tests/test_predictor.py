"""High-level predictor API."""
import numpy as np

import jax

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, DEFAULT_TARGET_CODE
from cerberus_tpu.models.net_desc import init_net_params
from cerberus_tpu.config import ModelConfig
from cerberus_tpu.predictor import CerberusPredictor

MODEL_KWARGS = {
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
}


def test_predict_tile_in_memory():
    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    params = init_net_params(jax.random.PRNGKey(0), cfg)
    predictor = CerberusPredictor(
        checkpoint_path=None, model_args=MODEL_KWARGS,
        decoder_dict=dict(DEFAULT_TARGET_CODE),
        batch_size=4, patch_input_shape=144, patch_output_shape=48,
        params=params)

    img = np.random.default_rng(0).integers(0, 255, (96, 110, 3), np.uint8)
    result = predictor.predict_tile(img)
    assert set(result) >= {"Gland", "Lumen", "Nuclei", "pclass_map"}
    assert result["Gland"]["inst_map"].shape == (96, 110)
    assert result["pclass_map"].shape == (96, 110)
    assert result["Gland"]["type_map"] is not None
    assert result["Lumen"]["type_map"] is None
    # raw canvas matches channel layout
    canvas = predictor.predict_raw(img)
    assert canvas.shape == (96, 110, 9)
