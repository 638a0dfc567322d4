"""On-device fused tile program (forward+stitch in one XLA program) vs the
host-stitched path."""
import numpy as np

import jax
import jax.numpy as jnp

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.infer.fused_tile import run_fused_tile
from cerberus_tpu.models.net_desc import init_net_params
from cerberus_tpu.predictor import CerberusPredictor

MODEL_KWARGS = {
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
}


def test_fused_tile_matches_host_stitch():
    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    params = init_net_params(jax.random.PRNGKey(1), cfg)
    img = np.random.default_rng(0).integers(0, 255, (100, 120, 3), np.uint8)

    device_canvas = run_fused_tile(params, img, cfg, patch_input_shape=144,
                                   patch_output_shape=48, batch_size=4,
                                   compute_dtype=jnp.float32)

    predictor = CerberusPredictor(
        checkpoint_path=None, model_args=MODEL_KWARGS, decoder_dict={},
        batch_size=4, patch_input_shape=144, patch_output_shape=48,
        params=params, compute_dtype=jnp.float32)
    host_canvas = predictor.predict_raw(img)

    assert device_canvas.shape == host_canvas.shape == (100, 120, 9)
    # prob channels agree to step-output (f16) resolution; argmax ids exact
    np.testing.assert_allclose(device_canvas[..., :6], host_canvas[..., :6],
                               atol=2e-3)
    np.testing.assert_array_equal(device_canvas[..., 6:], host_canvas[..., 6:])
