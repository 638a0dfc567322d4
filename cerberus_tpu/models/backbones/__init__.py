"""Backbone registry: name -> (init_fn, forward_fn, filter pyramid).

Mirrors the reference registry and per-backbone filter tables
(``models/backbone/__init__.py:13-73``). ResNets are implemented; the
remaining encoders (densenet121, mobilenet_v2, unet_encoder, dsf_cnn_*) are
registered as they land.
"""
from __future__ import annotations

from .resnet import RESNET_SPECS, init_resnet_params, resnet_forward

FILTER_INFO = {
    "resnet18": [64, 64, 128, 256, 512],
    "resnet34": [64, 64, 128, 256, 512],
    "resnet50": [64, 256, 512, 1024, 2048],
    "resnet101": [64, 256, 512, 1024, 2048],
    "resnet152": [64, 256, 512, 1024, 2048],
    "densenet121": [64, 256, 512, 1024, 1024],
    "mobilenet_v2": [32, 24, 32, 96, 1280],
    "unet_encoder": [64, 128, 256, 512, 1024],
    "dsf_cnn_4": [10, 16, 32, 32, 32],
    "dsf_cnn_8": [10, 16, 32, 32, 32],
    "dsf_cnn_12": [10, 16, 32, 32, 32],
}


def get_backbone(backbone_name: str):
    """Returns (init_fn(rng, prefix) -> params,
                forward_fn(params, x, prefix, bn_sink) -> [x0..x4],
                filters)."""
    if backbone_name in RESNET_SPECS:
        def init_fn(rng, prefix="backbone"):
            return init_resnet_params(rng, backbone_name, prefix)

        def forward_fn(params, x, prefix="backbone", bn_sink=None):
            return resnet_forward(params, x, backbone_name, prefix, bn_sink)

        return init_fn, forward_fn, FILTER_INFO[backbone_name]
    if backbone_name == "unet_encoder":
        from .unet_encoder import init_unet_encoder_params, unet_encoder_forward

        return (init_unet_encoder_params, unet_encoder_forward,
                FILTER_INFO[backbone_name])
    if backbone_name == "densenet121":
        from .densenet import densenet121_forward, init_densenet121_params

        return (init_densenet121_params, densenet121_forward,
                FILTER_INFO[backbone_name])
    if backbone_name == "mobilenet_v2":
        from .mobilenet import init_mobilenet_v2_params, mobilenet_v2_forward

        return (init_mobilenet_v2_params, mobilenet_v2_forward,
                FILTER_INFO[backbone_name])
    if backbone_name.startswith("dsf_cnn"):
        from .dsf_cnn import init_dsf_cnn_params, make_dsf_cnn_forward

        nr_orients = int(backbone_name.split("_")[-1])

        def init_fn(rng, prefix="backbone"):
            return init_dsf_cnn_params(rng, nr_orients, prefix)

        return (init_fn, make_dsf_cnn_forward(nr_orients),
                FILTER_INFO[backbone_name])
    raise NotImplementedError(
        f"backbone '{backbone_name}' not yet available in cerberus_tpu"
    )
