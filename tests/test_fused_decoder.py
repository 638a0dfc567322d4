"""Fused grouped-conv decoder bank vs the sequential tower path."""
import numpy as np

import jax
import jax.numpy as jnp

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.infer.steps import fused_infer_outputs, model_head_outputs
from cerberus_tpu.models.fused_decoder import build_fused_decoder
from cerberus_tpu.models.net_desc import init_net_params

CFG = ModelConfig.from_kwargs({
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
})


def test_fused_decoder_matches_sequential():
    params = init_net_params(jax.random.PRNGKey(0), CFG)
    fused, head_specs = build_fused_decoder(params, CFG)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (2, 48, 48, 3)).astype(np.uint8))

    seq = model_head_outputs(params, imgs, CFG, jnp.float32)
    fus = model_head_outputs(params, imgs, CFG, jnp.float32, fused, head_specs)
    assert set(seq) == set(fus)
    for head in seq:
        ref = np.asarray(seq[head])
        got = np.asarray(fus[head])
        scale = max(1.0, np.abs(ref).max())
        assert np.abs(ref - got).max() / scale < 1e-3, head

    # the full fused step (activations + crop) agrees too
    a = np.asarray(fused_infer_outputs(params, imgs, CFG, 16, jnp.float32))
    b = np.asarray(fused_infer_outputs(params, imgs, CFG, 16, jnp.float32,
                                       fused, head_specs))
    # INST prob channels close; argmax channels may flip only on exact ties
    np.testing.assert_allclose(a[..., :6], b[..., :6], atol=1e-3)
    assert (a[..., 6:] != b[..., 6:]).mean() < 0.01
