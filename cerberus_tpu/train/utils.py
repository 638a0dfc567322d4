"""Training-run utilities.

Parity targets: ``run_utils/utils.py`` — ``convert_pytorch_checkpoint``
(DataParallel prefix strip: models/convert.strip_data_parallel_prefix),
``check_manual_seed`` (:~seeding), ``check_log_dir`` (interactive delete
prompt), ``get_model_summary`` (per-layer parameter table).
"""
from __future__ import annotations

import os
import random
import shutil
from typing import Dict

import numpy as np

import jax

from ..models.convert import strip_data_parallel_prefix  # noqa: F401  (re-export)


def tame_head_logits(params: Dict, factor: float = 0.05,
                     inst_only: bool = False,
                     zero_bias: bool = False) -> Dict:
    """Scale the final head convs so RANDOM-INIT logits are O(1).

    Random-init head logits are O(±40): softmax saturates to exact 0/1,
    CE gradients jump discretely when reassociation-level activation
    noise flips saturation-boundary pixels, and inference canvases lose
    all spatial structure. Demos, dryruns, and numerics tests on
    untrained params use this to keep the loss smooth / let instances
    form; trained checkpoints never need it.

    ``inst_only`` restricts to the three *-INST segmentation heads (and
    can zero their biases via ``zero_bias``) — the variant the multichip
    dryrun uses so instance maps form downstream.
    """
    params = {k: dict(v) for k, v in params.items()}
    hits = 0
    for name, leaf in params.items():
        if inst_only:
            hit = name.endswith(".INST.x.1.conv") and \
                name.startswith("output_head.")
        else:
            hit = (name.endswith(".x.1.conv")
                   and name.startswith("output_head.")) or \
                name == "decoder_head.Patch-Class.conv2"
        if not hit:
            continue
        hits += 1
        leaf = dict(leaf)
        leaf["kernel"] = leaf["kernel"] * factor
        if zero_bias:
            leaf["bias"] = np.zeros_like(leaf["bias"])
        params[name] = leaf
    if not hits:
        # fail loudly: a head-naming change must not silently leave the
        # logits untamed (callers rely on the smoothing for tolerances)
        raise ValueError("tame_head_logits matched no head conv params — "
                         "did the output_head naming change?")
    return params


def check_manual_seed(seed: int):
    """Seed python/numpy and return the JAX PRNG key — the functional
    analog of the reference's random+numpy+torch(+cuda) seeding."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def check_log_dir(log_dir: str, interactive: bool = True) -> None:
    """Refuse to clobber an existing log dir without confirmation."""
    if not os.path.isdir(log_dir):
        os.makedirs(log_dir)
        return
    if interactive:
        answer = input(f"Log dir '{log_dir}' exists. Overwrite? [y/N] ")
        if answer.strip().lower() != "y":
            raise SystemExit("aborted: log dir exists")
    shutil.rmtree(log_dir)
    os.makedirs(log_dir)


def count_parameters(params: Dict) -> int:
    return sum(int(np.prod(v.shape))
               for leaf in params.values() for v in leaf.values())


def get_model_summary(params: Dict) -> str:
    """Layer table: name, leaf shapes, parameter count."""
    lines = ["{:<60s} {:>12s}".format("layer", "#params")]
    total = 0
    for name in sorted(params):
        n = sum(int(np.prod(v.shape)) for v in params[name].values())
        total += n
        lines.append("{:<60s} {:>12,d}".format(name, n))
    lines.append("{:<60s} {:>12,d}".format("TOTAL", total))
    return "\n".join(lines)
