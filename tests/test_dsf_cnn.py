"""DSF-CNN steerable stack: golden parity vs the reference torch model.

The reference's ``cycle_channels`` hardcodes ``.to("cuda")``
(gconv_utils.py:178-180, a known bug — SURVEY.md §7); the fixture patches
Tensor.to to stay on CPU so the oracle can run in this torch-cpu image.
"""
import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cerberus_tpu.config import ModelConfig  # noqa: E402
from cerberus_tpu.models.backbones import get_backbone  # noqa: E402
from cerberus_tpu.models.convert import convert_torch_state_dict  # noqa: E402
from cerberus_tpu.models.net_desc import net_forward  # noqa: E402

DECODER_KWARGS = {"Gland": {"INST": 3}, "Gland#TYPE": {"TYPE": 3}}


@pytest.fixture()
def patched_cuda_to(monkeypatch):
    # the reference also uses np.math.pi (gconv_utils.py:109), removed in
    # numpy 2.x — shim it so the oracle can run at all
    import math

    monkeypatch.setattr(np, "math", math, raising=False)
    orig_to = torch.Tensor.to

    def cpu_to(self, *args, **kwargs):
        args = tuple("cpu" if a == "cuda" else a for a in args)
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", cpu_to)


def _randomize_bn(net):
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in net.modules():
            if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=gen) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=gen) + 0.5)
        # the dsf init (std ~ sqrt(2Q/fan_out)) explodes to inf/nan within 3
        # dense blocks without trained BN stats; shrink coefficients so the
        # parity comparison stays finite
        for name, p in net.named_parameters():
            if p.ndim == 8:
                p.mul_(0.05)


def test_dsf_backbone_matches_torch(patched_cuda_to):
    if not conftest.reference_available():
        pytest.skip("reference repo not mounted")
    conftest.add_reference_to_path()
    from models.backbone import get_backbone as ref_get_backbone
    from models.utils import weights_init_dsf

    torch.manual_seed(0)
    ref_net, filters, _ = ref_get_backbone("dsf_cnn_4")
    ref_net.apply(weights_init_dsf)
    ref_net.eval()
    _randomize_bn(ref_net)

    state = {f"backbone.{k}": v for k, v in ref_net.state_dict().items()}
    params = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
              for k, v in convert_torch_state_dict(state).items()}
    _init, fwd, our_filters = get_backbone("dsf_cnn_4")
    assert our_filters == filters

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref_net(torch.from_numpy(x).permute(0, 3, 1, 2))
    with jax.default_matmul_precision("highest"):
        got_feats = fwd(params, jnp.asarray(x), "backbone", None)

    for i, (ref_f, got_f) in enumerate(zip(ref_feats, got_feats)):
        ref_np = ref_f.permute(0, 2, 3, 1).numpy()
        got_np = np.asarray(got_f)
        assert got_np.shape == ref_np.shape, f"level {i}"
        scale = max(1.0, float(np.abs(ref_np).max()))
        err = np.abs(got_np - ref_np).max() / scale
        assert err < 1e-3, f"level {i}: rel err {err}"


def test_dsf_full_net_matches_torch(patched_cuda_to):
    if not conftest.reference_available():
        pytest.skip("reference repo not mounted")
    conftest.add_reference_to_path()
    from models.net_desc import create_model

    torch.manual_seed(0)
    ref_net = create_model(
        encoder_backbone_name="dsf_cnn_4",
        decoder_kwargs=DECODER_KWARGS,
        considered_tasks=list(DECODER_KWARGS.keys()),
    )
    ref_net.eval()
    _randomize_bn(ref_net)

    params = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
              for k, v in convert_torch_state_dict(ref_net.state_dict()).items()}
    cfg = ModelConfig.from_kwargs({
        "encoder_backbone_name": "dsf_cnn_4",
        "decoder_kwargs": DECODER_KWARGS,
        "considered_tasks": list(DECODER_KWARGS.keys()),
    })

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = ref_net(torch.from_numpy(imgs).permute(0, 3, 1, 2))
    with jax.default_matmul_precision("highest"):
        got = net_forward(params, jnp.asarray(imgs), cfg)

    assert set(got) == set(ref)
    for head, ref_out in ref.items():
        ref_np = ref_out.permute(0, 2, 3, 1).numpy()
        got_np = np.asarray(got[head])
        scale = max(1.0, float(np.abs(ref_np).max()))
        err = np.abs(got_np - ref_np).max() / scale
        assert err < 1e-3, f"{head}: rel err {err}"
