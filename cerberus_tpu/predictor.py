"""High-level serving API: load once, predict arrays.

The CLI managers are file-system oriented (directories in, ``.mat``/``.dat``
out). Production serving wants an in-process API; this wraps the same fused
step + post-processing into one object:

    predictor = CerberusPredictor.from_model_dir("model/")
    result = predictor.predict_tile(rgb_uint8_image)
    # result["Gland"]["inst_map"], result["Gland"]["inst_info"], ...
    # result["pclass_map"]

Thread-safe for concurrent predict calls (jitted executables are); one
compiled program per (batch, output) signature, shared across calls.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .config import DEFAULT_TARGET_LIST, ModelConfig, load_settings
from .data.patching import prepare_patching
from .infer.manager import InferManager
from .infer.tile import post_process_tile
from .ops.stitch import stitch_canvas


class CerberusPredictor:
    def __init__(self, checkpoint_path: Optional[str], model_args: dict,
                 decoder_dict: dict, batch_size: int = 8,
                 patch_input_shape: int = 448, patch_output_shape: int = 144,
                 postproc_backend: str = "cpu", params=None,
                 compute_dtype=None):
        import jax.numpy as jnp

        self._manager = InferManager(
            checkpoint_path=checkpoint_path, model_args=model_args,
            params=params,
            compute_dtype=compute_dtype or jnp.bfloat16)
        self.decoder_dict = decoder_dict
        self.batch_size = int(batch_size)
        self.patch_input_shape = int(patch_input_shape)
        self.patch_output_shape = int(patch_output_shape)
        self.postproc_backend = postproc_backend

    @classmethod
    def from_model_dir(cls, model_dir: str, **kwargs) -> "CerberusPredictor":
        paramset = load_settings(model_dir)
        return cls(checkpoint_path=f"{model_dir}/weights.tar",
                   model_args=paramset.model_kwargs,
                   decoder_dict=paramset.req_target_code, **kwargs)

    @property
    def cfg(self) -> ModelConfig:
        return self._manager.cfg

    def predict_raw(self, img: np.ndarray) -> np.ndarray:
        """RGB uint8 (H, W, 3) -> stitched raw canvas (H, W, C_total)
        (softmax foreground probabilities / argmax class ids per the canvas
        channel map)."""
        from .native import gather_patches

        padded, patch_info, src_pos = prepare_patching(
            img, self.patch_input_shape, self.patch_output_shape, 0)
        coords = patch_info[:, 0, 0]
        patches = gather_patches(padded, coords, self.patch_input_shape,
                                 self.patch_input_shape)
        outputs = []
        for start in range(0, len(patches), self.batch_size):
            chunk = patches[start : start + self.batch_size]
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), np.uint8)])
            out = np.asarray(self._manager.run_step(
                chunk, self.patch_output_shape))
            outputs.append(out[: self.batch_size - pad])
        outputs = np.concatenate(outputs, axis=0)
        canvas = stitch_canvas(list(outputs), patch_info[:, 1, 0],
                               padded.shape[:2])
        return canvas[src_pos[0]: src_pos[0] + img.shape[0],
                      src_pos[1]: src_pos[1] + img.shape[1]]

    def predict_tile(self, img: np.ndarray,
                     postproc_list=None) -> Dict:
        """RGB uint8 (H, W, 3) -> per-task instance maps + info dicts +
        tissue-class map (the `.mat` payloads, in memory)."""
        postproc_list = list(postproc_list or DEFAULT_TARGET_LIST)
        canvas = self.predict_raw(img)
        (_name, _src, inst_maps, inst_infos, type_maps,
         pclass_map) = post_process_tile(
            canvas, {"name": "tile", "src_image": img},
            self.decoder_dict, postproc_list,
            self.cfg.active_decoder_kwargs, self.postproc_backend)
        result = {}
        for tissue, inst_map in inst_maps.items():
            result[tissue] = {
                "inst_map": inst_map,
                "inst_info": inst_infos.get(tissue, {}),
                "type_map": type_maps.get(tissue),
            }
        result["pclass_map"] = pclass_map
        return result
