"""Tracing / profiling helpers.

The reference's observability is coarse ``time.perf_counter()`` spans logged
per WSI phase (``infer/wsi.py:517-856``). Here every span also emits a
``jax.profiler.TraceAnnotation`` so phases show up in TensorBoard/XPlane
profiles, and a process-wide profile dump can be toggled via
``CERBERUS_PROFILE_DIR``.
"""
from __future__ import annotations

import contextlib
import logging
import os
import time

import jax


@contextlib.contextmanager
def trace_span(name: str, logger: logging.Logger = None):
    """Wall-clock + profiler span; logs '<name>: <seconds>' on exit."""
    start = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    elapsed = time.perf_counter() - start
    (logger or logging).info("%s: %.4f", name, elapsed)


@contextlib.contextmanager
def maybe_profile():
    """Dump a TensorBoard-viewable profile when CERBERUS_PROFILE_DIR is set."""
    profile_dir = os.environ.get("CERBERUS_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
