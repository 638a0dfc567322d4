"""ImageNet-pretrained encoder initialization (VERDICT r2 task 6).

The reference loads torchvision ImageNet weights into its backbone
(``models/backbone/resnet.py:19-29,292-297``, gated by
``backbone_imagenet_pretrained``, ``models/net_desc.py:26,91``) and ships
a fold->weights map (``models/pretrained.yml``). Here: a RAW torchvision
resnet34 state_dict (bare keys + fc head) converts to a ``backbone.*``
subtree, overlays a fresh init leaving decoders untouched, and the
converted backbone matches the reference torch backbone's features.
"""
import os

import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cerberus_tpu.config import DEFAULT_DECODER_KWARGS, ModelConfig  # noqa: E402
from cerberus_tpu.models.backbones import get_backbone  # noqa: E402
from cerberus_tpu.models.convert import (  # noqa: E402
    convert_torchvision_backbone,
    is_torchvision_backbone_state_dict,
    load_checkpoint,
    overlay_pretrained,
    resolve_pretrained_map,
)
from cerberus_tpu.models.net_desc import init_net_params  # noqa: E402


def _reference_resnet34():
    if not conftest.reference_available():
        pytest.skip("reference repo not mounted")
    conftest.add_reference_to_path()
    from models.backbone import get_backbone as ref_get_backbone

    torch.manual_seed(0)
    net, filters, _ = ref_get_backbone("resnet34")
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


def test_torchvision_resnet34_roundtrip_matches_reference(tmp_path):
    """Save a torchvision-style resnet34 state_dict (bare keys, fc head),
    load it through the normal checkpoint path, overlay on a fresh
    flagship init — backbone features must match the reference torch net."""
    ref_net, filters = _reference_resnet34()
    sd = ref_net.state_dict()  # bare torchvision keys incl. fc.*
    assert any(k.startswith("fc.") for k in sd)
    assert is_torchvision_backbone_state_dict(sd)
    path = str(tmp_path / "resnet34-imagenet.pth")
    torch.save(sd, path)

    tree = load_checkpoint(path)  # content dispatch -> backbone subtree
    assert all(k.startswith("backbone.") for k in tree)
    assert "backbone.fc" not in tree

    cfg = ModelConfig.from_kwargs({
        "encoder_backbone_name": "resnet34",
        "decoder_kwargs": DEFAULT_DECODER_KWARGS,
        "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
    })
    init = init_net_params(jax.random.PRNGKey(7), cfg)
    params = overlay_pretrained(init, tree)
    # decoders/heads keep their fresh init; backbone got the checkpoint
    changed = [k for k in init if init[k] is not params[k]]
    assert changed and all(k.startswith("backbone.") for k in changed)
    non_backbone = [k for k in init if not k.startswith("backbone.")]
    assert non_backbone
    assert all(init[k] is params[k] for k in non_backbone)

    _init, fwd, our_filters = get_backbone("resnet34")
    assert our_filters == filters
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref_net(torch.from_numpy(x).permute(0, 3, 1, 2))
    jparams = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
               for k, v in params.items() if k.startswith("backbone.")}
    with jax.default_matmul_precision("highest"):
        got_feats = fwd(jparams, jnp.asarray(x), "backbone", None)
    for i, (ref_f, got_f) in enumerate(zip(ref_feats, got_feats)):
        ref_np = ref_f.permute(0, 2, 3, 1).numpy()
        got_np = np.asarray(got_f)
        assert got_np.shape == ref_np.shape, f"level {i}"
        scale = max(1.0, float(np.abs(ref_np).max()))
        assert np.abs(got_np - ref_np).max() / scale < 2e-5, f"level {i}"


def test_overlay_shape_mismatch_raises():
    cfg = ModelConfig.from_kwargs({
        "encoder_backbone_name": "resnet18",
        "decoder_kwargs": DEFAULT_DECODER_KWARGS,
        "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
    })
    init = init_net_params(jax.random.PRNGKey(0), cfg)
    bad = {"backbone.conv1": {"kernel": np.zeros((3, 3, 3, 64), np.float32)}}
    with pytest.raises(ValueError, match="shape"):
        overlay_pretrained(init, bad)
    # unknown keys are skipped (full-task ckpt -> reduced-task config)
    out = overlay_pretrained(init, {"no.such.key": {"kernel": np.zeros(1)}})
    assert out.keys() == init.keys()


def test_is_torchvision_detection():
    assert is_torchvision_backbone_state_dict(
        {"conv1.weight": 0, "layer1.0.conv1.weight": 0, "fc.weight": 0})
    assert is_torchvision_backbone_state_dict(
        {"features.conv0.weight": 0, "classifier.weight": 0})  # densenet
    assert not is_torchvision_backbone_state_dict(
        {"backbone.conv1.weight": 0, "decoder.Gland.u3.conv.weight": 0})
    assert not is_torchvision_backbone_state_dict(
        {"module.backbone.conv1.weight": 0})
    assert not is_torchvision_backbone_state_dict({})


def test_pretrained_yml_map(tmp_path):
    """pretrained.yml-style resolution (reference models/pretrained.yml
    schema: backbone -> foldN -> tag -> relative path)."""
    import yaml

    weights_dir = tmp_path / "pretrained_weights"
    os.makedirs(weights_dir)
    (weights_dir / "r34_f2.tar").write_bytes(b"x")
    map_path = tmp_path / "pretrained.yml"
    with open(map_path, "w") as f:
        yaml.safe_dump({"resnet34": {
            "fold2": {"imagenet_mtl": "pretrained_weights/r34_f2.tar"}}}, f)
    got = resolve_pretrained_map(str(map_path), "resnet34", 2,
                                 "imagenet_mtl")
    assert got == str(weights_dir / "r34_f2.tar")
    with pytest.raises(ValueError, match="no entry"):
        resolve_pretrained_map(str(map_path), "resnet34", 1, "imagenet_mtl")
    with pytest.raises(ValueError, match="no entry"):
        resolve_pretrained_map(str(map_path), "resnet50", 2, "imagenet_mtl")
