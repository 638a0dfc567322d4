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
