"""Debug / numerical-safety modes.

The reference has no sanitizers — only commented-out NaN/Inf scans
(models/backbone/resnet.py:138-152) and an unused worker lock. Rebuild
guards (SURVEY.md §5):

  * ``enable_debug_mode()``: turns on ``jax_debug_nans`` (which itself
    forces a sync check after each primitive, surfacing NaNs at the
    faulting op) and disables most XLA optimizations so program structure
    maps back to source;
  * ``deterministic_mode()``: single-threaded, fixed-seed, highest-precision
    context for reproducing numerics.

Activated by ``CERBERUS_DEBUG=1`` at import of the CLI entry points.
"""
from __future__ import annotations

import contextlib
import os

import jax


def configure_from_env() -> None:
    """CLI-entry configuration knobs:

    * ``CERBERUS_DEFAULT_DEVICE=cpu|tpu`` pins jax's default device — needed
      because some accelerator plugins ignore ``JAX_PLATFORMS``;
    * ``CERBERUS_DEBUG=1`` turns on NaN checking / debug mode.
    """
    platform = os.environ.get("CERBERUS_DEFAULT_DEVICE")
    if platform:
        try:
            jax.config.update("jax_default_device", jax.devices(platform)[0])
        except RuntimeError:
            pass
    if debug_mode_requested():
        enable_debug_mode()


def enable_debug_mode() -> None:
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_disable_most_optimizations", True)


def debug_mode_requested() -> bool:
    return os.environ.get("CERBERUS_DEBUG", "") not in ("", "0")


@contextlib.contextmanager
def deterministic_mode(seed: int = 0):
    """Highest-precision, fixed-seed region for numerics reproduction."""
    import numpy as np
    import random as _random

    _random.seed(seed)
    np.random.seed(seed)
    with jax.default_matmul_precision("highest"):
        yield jax.random.PRNGKey(seed)
