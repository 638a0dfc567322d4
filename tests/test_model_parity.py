"""Golden-parity: reference torch NetDesc (random weights) vs our JAX model.

Strategy per SURVEY.md §4 item 2 — fixed-seed random torch weights, convert
with models/convert.py, run both forwards on the same input, compare each
head within fp tolerance. The reference package is imported straight from
/root/reference (never copied).
"""
import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig  # noqa: E402
from cerberus_tpu.models.convert import convert_torch_state_dict  # noqa: E402
from cerberus_tpu.models.net_desc import net_forward  # noqa: E402


@pytest.fixture(scope="module")
def torch_net():
    if not conftest.reference_available():
        pytest.skip("reference repo not mounted")
    conftest.add_reference_to_path()
    from models.net_desc import create_model  # reference module

    torch.manual_seed(0)
    net = create_model(
        encoder_backbone_name="resnet34",
        decoder_kwargs=DEFAULT_DECODER_KWARGS,
        considered_tasks=list(DEFAULT_DECODER_KWARGS.keys()),
    )
    net.eval()
    # randomize BN running stats so BN parity is actually exercised
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in net.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=gen) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=gen) + 0.5)
    return net


@pytest.fixture(scope="module")
def jax_params(torch_net):
    return {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
            for k, v in convert_torch_state_dict(torch_net.state_dict()).items()}


CFG = ModelConfig.from_kwargs(
    {"encoder_backbone_name": "resnet34",
     "decoder_kwargs": DEFAULT_DECODER_KWARGS,
     "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys())}
)


@pytest.mark.parametrize(
    "hw",
    [144,
     pytest.param(448, marks=pytest.mark.skipif(
         not __import__("os").environ.get("CERBERUS_SLOW_TESTS"),
         reason="slow (minutes on CPU); set CERBERUS_SLOW_TESTS=1"))],
)
def test_all_heads_match_torch(torch_net, jax_params, hw):
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, size=(2, hw, hw, 3)).astype(np.float32)

    import jax

    with torch.no_grad():
        ref = torch_net(torch.from_numpy(imgs).permute(0, 3, 1, 2))
    with jax.default_matmul_precision("highest"):
        got = net_forward(jax_params, jnp.asarray(imgs), CFG)

    assert set(got.keys()) == set(ref.keys())
    for head, ref_out in ref.items():
        ref_np = ref_out.permute(0, 2, 3, 1).numpy()
        got_np = np.asarray(got[head])
        assert got_np.shape == ref_np.shape, head
        scale = max(1.0, float(np.abs(ref_np).max()))
        err = np.abs(got_np - ref_np).max() / scale
        assert err < 2e-4, f"{head}: rel err {err}"
