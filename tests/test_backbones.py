"""Backbone golden parity vs the reference torch encoders (random weights)."""
import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cerberus_tpu.models.backbones import get_backbone  # noqa: E402
from cerberus_tpu.models.convert import convert_torch_state_dict  # noqa: E402


def _torch_backbone(name):
    if not conftest.reference_available():
        pytest.skip("reference repo not mounted")
    conftest.add_reference_to_path()
    from models.backbone import get_backbone as ref_get_backbone

    torch.manual_seed(0)
    net, filters, _ = ref_get_backbone(name)
    net.eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in net.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=gen) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=gen) + 0.5)
    return net, filters


@pytest.mark.parametrize("name", ["resnet50", "densenet121", "mobilenet_v2",
                                  "unet_encoder"])
def test_backbone_matches_torch(name):
    ref_net, filters = _torch_backbone(name)
    state = {f"backbone.{k}": v for k, v in ref_net.state_dict().items()}
    params = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
              for k, v in convert_torch_state_dict(state).items()}

    _init, fwd, our_filters = get_backbone(name)
    assert our_filters == filters

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref_net(torch.from_numpy(x).permute(0, 3, 1, 2))
    with jax.default_matmul_precision("highest"):
        got_feats = fwd(params, jnp.asarray(x), "backbone", None)

    assert len(got_feats) == len(ref_feats) == 5
    for i, (ref_f, got_f) in enumerate(zip(ref_feats, got_feats)):
        ref_np = ref_f.permute(0, 2, 3, 1).numpy()
        got_np = np.asarray(got_f)
        assert got_np.shape == ref_np.shape, f"{name} level {i}"
        assert got_np.shape[-1] == filters[i]
        scale = max(1.0, float(np.abs(ref_np).max()))
        err = np.abs(got_np - ref_np).max() / scale
        assert err < 5e-4, f"{name} level {i}: rel err {err}"
