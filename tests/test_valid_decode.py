"""Valid-region decoding == full-tower + center-crop, bit for bit.

The reference crops the central output window AFTER computing full-extent
decoder towers (models/run_desc.py:489); valid-region decoding
(models/valid_decode.py) must reproduce exactly the kept pixels.
"""
import numpy as np

import jax
import jax.numpy as jnp

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig
from cerberus_tpu.infer.steps import fused_infer_outputs
from cerberus_tpu.models.layers import center_crop
from cerberus_tpu.models.net_desc import init_net_params, net_forward
from cerberus_tpu.models.valid_decode import (
    solve_windows,
    supports_valid_region,
    valid_head_outputs,
)

CFG = ModelConfig.from_kwargs({
    "encoder_backbone_name": "resnet18",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
})


def test_production_448_to_144_windows():
    """Hand-verified window plan for the production geometry."""
    plan = solve_windows(448, 144)
    assert plan is not None
    assert plan.bottom_win == (5, 23)
    assert [l.skip_win for l in plan.levels] == [
        (13, 43), (33, 79), (72, 152), (150, 298)]
    assert [(l.up_lo, l.up_hi) for l in plan.levels] == [
        (3, 3), (3, 3), (2, 2), (2, 2)]


def test_out_of_bounds_geometries_rejected():
    # coarse-level windows would go negative -> must fall back
    assert solve_windows(128, 32) is None
    # trivial/degenerate
    assert supports_valid_region(CFG, 144, 144) is None


def test_valid_region_bit_identical_to_full():
    """f32 CPU: valid-region towers compute the same dot products on the
    same values in the same order -> exact equality with full + crop."""
    params = init_net_params(jax.random.PRNGKey(0), CFG)
    imgs = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (2, 224, 224, 3)).astype(np.uint8))

    plan = supports_valid_region(CFG, 224, 72)
    assert plan is not None

    full = net_forward(params, imgs, CFG, compute_dtype=jnp.float32)
    valid = valid_head_outputs(params, imgs, CFG, plan, jnp.float32)
    assert set(full) == set(valid)
    for head, v in valid.items():
        ref = np.asarray(full[head]) if head == "Patch-Class" else np.asarray(
            center_crop(full[head], 72, 72))
        np.testing.assert_array_equal(ref, np.asarray(v), err_msg=head)


def test_fused_infer_outputs_flag_equivalence():
    params = init_net_params(jax.random.PRNGKey(2), CFG)
    imgs = jnp.asarray(np.random.default_rng(3).integers(
        0, 255, (1, 224, 224, 3)).astype(np.uint8))
    a = np.asarray(fused_infer_outputs(params, imgs, CFG, 72, jnp.float32,
                                       valid_region=False))
    b = np.asarray(fused_infer_outputs(params, imgs, CFG, 72, jnp.float32,
                                       valid_region=True))
    np.testing.assert_array_equal(a, b)
