"""Base inference manager: checkpoint load + jitted step binding.

Parity target: ``infer/base.py:9-54`` — constructor kwargs become attributes;
the model is built from ``model_args``, the ``weights.tar`` checkpoint's
``desc`` state_dict is loaded (DataParallel ``module.`` prefixes stripped)
and the run step is bound. TPU differences: parameters convert to a JAX tree
and are placed once on device; "DataParallel" is replaced by pjit batch
sharding over the local mesh (parallel/mesh.py) when more than one chip is
visible; one compiled program serves each (batch, output_shape) signature.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.convert import load_checkpoint
from ..models.net_desc import init_net_params
from .steps import make_infer_step


def _enable_compilation_cache() -> None:
    """Persist XLA executables across CLI invocations (first 448^2 compile
    is ~20-40 s; cached reloads are sub-second). Opt-out via
    CERBERUS_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("CERBERUS_NO_COMPILE_CACHE"):
        return
    cache_dir = os.environ.get("CERBERUS_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/cerberus_tpu/xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


class InferManager:
    def __init__(self, checkpoint_path: Optional[str] = None,
                 decoder_dict: Optional[dict] = None,
                 model_args: Optional[dict] = None,
                 params: Optional[Dict] = None,
                 compute_dtype=jnp.bfloat16,
                 mesh=None,
                 **kwargs):
        """``mesh``: a 1-D ``jax.sharding.Mesh`` to batch-shard inference
        over (the DataParallel analog, SURVEY.md §2.9). ``mesh='auto'``
        builds one over all local devices when more than one is visible."""
        self.checkpoint_path = checkpoint_path
        self.decoder_dict = decoder_dict or {}
        self.model_args = model_args or {}
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        for variable, value in kwargs.items():
            setattr(self, variable, value)
        self.cfg = ModelConfig.from_kwargs(self.model_args)
        _enable_compilation_cache()
        if self.mesh == "auto":
            from ..parallel.mesh import make_mesh

            devices = jax.devices()
            self.mesh = make_mesh(devices) if len(devices) > 1 else None
        self._load_model(params)

    def _load_model(self, params: Optional[Dict]) -> None:
        if params is None:
            if self.checkpoint_path is None:
                # random weights (tests / benchmarking without a checkpoint)
                params = init_net_params(jax.random.PRNGKey(0), self.cfg)
            else:
                params = load_checkpoint(self.checkpoint_path)
        # single device_put of the whole tree; replication across local chips
        # is handled by the sharded step builder when requested.
        self.params = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x)), params
        )
        self._step_cache: Dict[int, callable] = {}

    def run_step(self, batch: np.ndarray, output_shape: int) -> np.ndarray:
        """uint8 NHWC batch -> (N, out, out, C_total) array.

        One compiled executable per output_shape; batch shape is the caller's
        responsibility (pad to a fixed size to avoid recompiles). With a mesh
        configured, the batch is sharded across its devices (params
        replicated) — batch size must divide by the mesh size.
        """
        if output_shape not in self._step_cache:
            if self.mesh is not None:
                from ..parallel.mesh import make_sharded_infer_step

                self._step_cache[output_shape] = make_sharded_infer_step(
                    self.params, self.cfg, self.mesh, output_shape,
                    self.compute_dtype)
            else:
                self._step_cache[output_shape] = make_infer_step(
                    self.params, self.cfg, output_shape, self.compute_dtype
                )
        return self._step_cache[output_shape](batch)
