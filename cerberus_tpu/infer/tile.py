"""Tile inference pipeline: directory of large images -> per-task instance
maps, instance dictionaries, overlays and ``.mat`` files.

Parity target: ``infer/tile.py`` end-to-end —
  * skip-if-done against ``<out>/<task>_mat/<name>.mat`` (:228-241);
  * cache batching: pop files until >256 patches accumulated (:294-325);
  * reflect-pad + placement grid (data/patching.py, pinned to :43-106);
  * batched jitted forward (one XLA program; fixed batch shape, the final
    partial batch is zero-padded instead of shape-specializing);
  * per-file stitch + post-process, sync or in a process pool (:290-292,
    :399-428);
  * ``proc_callback`` output contract (:243-288): ``overlay/<name>.jpg``,
    ``<task>_mat/<name>.mat`` with {inst_map, type, id[, type_map]},
    ``pclass_mat/<name>.mat`` with {pclass}.

Deliberate reference-behavior notes:
  * the 2x-upscaled instance-info extraction (:193-203) reuses the previous
    task's resized type map for Lumen (which has no TYPE head) — i.e. lumen
    instances are typed against the *gland* type map. Replicated, since the
    .mat 'type' vectors depend on it.
  * the tile path logs and continues on postproc-worker failure ("Silent
    Crash", :420-424). We keep per-file isolation but log the actual error.
"""
from __future__ import annotations

import os
import pathlib
import multiprocessing
from concurrent.futures import ProcessPoolExecutor, as_completed

import cv2
import numpy as np
import scipy.io as sio

from ..config import DEFAULT_TARGET_LIST
from ..data.patching import make_channel_index_map, prepare_patching
from ..ops.postproc import POSTPROC_FUNC_DICT, get_inst_info_dict
from ..ops.stitch import stitch_canvas
from ..utils import log_info, mkdir, recur_find_ext
from ..utils.viz import load_viz_info, visualize_instances_dict
from .manager import InferManager as BaseInferManager


def post_process_tile(canvas: np.ndarray, image_info: dict,
                      postproc_code: dict, postproc_list: list,
                      decoder_kwargs: dict, backend: str = "cpu"):
    """Per-tile post-processing on an already-stitched, source-cropped canvas.

    ``backend='tpu'`` runs the instance kernels on-chip
    (ops/tpu_postproc.py); 'cpu' is the scipy/cv2 oracle path. Returns the
    same tuple as the reference `_post_process_patches`:
    (name, src_image, inst_map_dict, inst_info_dict, type_map_dict, pclass_map).
    """
    if backend == "tpu":
        from ..ops.tpu_postproc import TPU_POSTPROC_FUNC_DICT as func_dict
    else:
        func_dict = POSTPROC_FUNC_DICT
    idx_dict, _ = make_channel_index_map(decoder_kwargs)

    # NB deliberately NOT shape-bucketed (unlike the WSI path's pad_to_512):
    # zero padding changes erosion/watershed at the image's true
    # bottom/right edge, which tile mode exposes directly (no margin dedup
    # hides it) — tested to diverge from the CPU oracle. Tile directories
    # are typically uniform-size, so per-shape compiles amortize anyway.
    pred_inst_map_dict = {}
    pred_type_map_dict = {}
    pred_inst_info_dict = {}
    pclass_map = None
    for tissue_code in postproc_list:
        tissue_code = tissue_code.capitalize()
        if tissue_code + "-INST" in postproc_code:
            proc_cls = func_dict[postproc_code[tissue_code + "-INST"]]
            inst_map, type_map = proc_cls.post_process(canvas, idx_dict,
                                                       tissue_code)
            pred_inst_map_dict[tissue_code] = inst_map
            pred_type_map_dict[tissue_code] = type_map
        elif tissue_code == "Patch-class" and "Patch-Class" in idx_dict:
            pclass_map = canvas[..., idx_dict["Patch-Class"][0]]

    # lumen predictions only survive inside glands (infer/tile.py:187-191)
    if "Lumen" in pred_inst_map_dict and "Gland" in pred_inst_map_dict:
        binary_gland = (pred_inst_map_dict["Gland"] > 0).astype(
            pred_inst_map_dict["Lumen"].dtype)
        pred_inst_map_dict["Lumen"] = binary_gland * pred_inst_map_dict["Lumen"]

    pred_type_tmp = None
    for tissue_code in postproc_list:
        tissue_code = tissue_code.capitalize()
        if tissue_code not in pred_inst_map_dict:
            # partial-task checkpoints (e.g. nuclei-only): the default
            # postproc_list names tasks this model does not predict
            continue
        pred_inst_tmp = cv2.resize(pred_inst_map_dict[tissue_code], (0, 0),
                                   fx=2, fy=2, interpolation=cv2.INTER_NEAREST)
        if tissue_code != "Lumen" and pred_type_map_dict[tissue_code] is not None:
            pred_type_tmp = cv2.resize(pred_type_map_dict[tissue_code], (0, 0),
                                       fx=2, fy=2,
                                       interpolation=cv2.INTER_NEAREST)
        pred_inst_info_dict[tissue_code] = get_inst_info_dict(pred_inst_tmp,
                                                              pred_type_tmp)

    return (
        image_info["name"],
        image_info["src_image"],
        pred_inst_map_dict,
        pred_inst_info_dict,
        pred_type_map_dict,
        pclass_map,
    )


def _stitch_and_postproc(patch_outputs, out_tl_list, canvas_hw, image_info,
                         postproc_code, postproc_list, decoder_kwargs,
                         average, backend="cpu"):
    canvas = stitch_canvas(patch_outputs, out_tl_list, canvas_hw, average)
    src_pos, src_shape = image_info["src_pos"], image_info["src_shape"]
    canvas = canvas[src_pos[0]: src_pos[0] + src_shape[0],
                    src_pos[1]: src_pos[1] + src_shape[1]]
    return post_process_tile(canvas, image_info, postproc_code,
                             postproc_list, decoder_kwargs, backend)


class InferManager(BaseInferManager):
    """Tile-mode inference (images < ~5000^2)."""

    def process_file_list(self, run_args: dict) -> None:
        for variable, value in run_args.items():
            setattr(self, variable, value)
        self.postproc_list = getattr(self, "postproc_list", DEFAULT_TARGET_LIST)
        self.patch_output_overlap = getattr(self, "patch_output_overlap", 0)
        viz_info = load_viz_info()

        file_path_list_all = recur_find_ext(self.input_dir, [".png", ".jpg"])
        file_path_list = []
        for file_path in file_path_list_all:
            # stem (not split('.')[0]): outputs are written under Path.stem,
            # so dotted names like slide.v2.png must probe slide.v2.mat
            base_name = pathlib.Path(file_path).stem
            # skip-if-done (infer/tile.py:228-241). Deliberate fix vs the
            # reference: it probes 'patch-class_mat/' which is never written
            # (outputs land in 'pclass_mat/'), so its check always re-runs;
            # we probe the directory actually written.
            missing = sum(
                not os.path.exists("%s/%s_mat/%s.mat" % (
                    self.output_dir,
                    "pclass" if t == "patch-class" else t,
                    base_name))
                for t in self.postproc_list
                # partial-task checkpoints never write absent tasks' dirs;
                # counting them as missing would defeat skip-if-done forever
                if (t.capitalize() + "-INST" in self.decoder_dict
                    or (t == "patch-class"
                        and "Patch-Class" in self.decoder_dict))
            )
            if missing > 0:
                file_path_list.append(file_path)
        file_path_list.sort()
        assert len(file_path_list) > 0, "Not Detected Any Files From Path"

        # postproc_backend='tpu' keeps instance postproc on-chip; it runs
        # in-process (pool workers would re-initialize the device)
        backend = getattr(self, "postproc_backend", "cpu")

        # tile_backend='fused': the SURVEY.md §7 stage-3/4 end-state — the
        # patch scan, forward and canvas scatter run as ONE on-device XLA
        # program per file (infer/fused_tile.py); only the stitched canvas
        # (or, with backend='tpu', the instance maps) leaves the chip.
        if getattr(self, "tile_backend", "host") == "fused":
            assert self.patch_output_overlap == 0, (
                "fused tile backend writes patches last-write-wins and "
                "requires non-overlapping output windows")
            from .fused_tile import run_fused_tile

            for file_path in file_path_list:
                img = cv2.imread(file_path)
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                canvas = run_fused_tile(
                    self.params, img, self.cfg,
                    int(self.patch_input_shape),
                    int(self.patch_output_shape), int(self.batch_size),
                    self.compute_dtype)
                image_info = {
                    "src_pos": (0, 0),
                    "src_shape": img.shape[:2],
                    "src_image": img,
                    "name": pathlib.Path(file_path).stem,
                }
                results = post_process_tile(
                    canvas, image_info, self.decoder_dict,
                    self.postproc_list, self.cfg.active_decoder_kwargs,
                    backend)
                self._save_results(results, self.output_dir, viz_info)
                log_info("Done Assembling %s" % image_info["name"])
            return
        proc_pool = None
        if getattr(self, "nr_post_proc_workers", 0) > 0 and backend != "tpu":
            proc_pool = ProcessPoolExecutor(
                self.nr_post_proc_workers,
                mp_context=multiprocessing.get_context("spawn"))

        while len(file_path_list) > 0:
            cache_images, cache_infos = [], []
            nr_cached_patches = 0
            while len(file_path_list) > 0:
                file_path = file_path_list.pop(0)
                img = cv2.imread(file_path)
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                padded_img, patch_info, src_pos = prepare_patching(
                    img, self.patch_input_shape, self.patch_output_shape,
                    self.patch_output_overlap,
                )
                cache_images.append(padded_img)
                cache_infos.append({
                    "path": file_path,
                    "src_shape": img.shape[:2],
                    "src_pos": src_pos,
                    "patch_info": patch_info,
                })
                nr_cached_patches += len(patch_info)
                if nr_cached_patches > 256:
                    break

            outputs_per_file = self._run_cached(cache_images, cache_infos)

            future_list = []
            for file_idx, info in enumerate(cache_infos):
                padded_img = cache_images[file_idx]
                src_pos, src_shape = info["src_pos"], info["src_shape"]
                src_image = padded_img[src_pos[0]: src_pos[0] + src_shape[0],
                                       src_pos[1]: src_pos[1] + src_shape[1]]
                image_info = {
                    "src_pos": src_pos,
                    "src_shape": src_shape,
                    "src_image": src_image,
                    "name": pathlib.Path(info["path"]).stem,
                }
                out_tl_list = info["patch_info"][:, 1, 0]  # output window TLs
                args = (
                    outputs_per_file[file_idx],
                    out_tl_list,
                    padded_img.shape[:2],
                    image_info,
                    self.decoder_dict,
                    self.postproc_list,
                    self.cfg.active_decoder_kwargs,
                    self.patch_output_overlap != 0,
                    backend,
                )
                if proc_pool is not None:
                    future_list.append(proc_pool.submit(_stitch_and_postproc,
                                                        *args))
                else:
                    results = _stitch_and_postproc(*args)
                    self._save_results(results, self.output_dir, viz_info)
                    log_info("Done Assembling %s" % image_info["name"])

            for future in as_completed(future_list):
                if future.exception() is not None:
                    log_info("Postproc worker failed: %r" % future.exception())
                else:
                    results = future.result()
                    self._save_results(results, self.output_dir, viz_info)
                    log_info("Done Assembling %s" % results[0])

        if proc_pool is not None:
            proc_pool.shutdown()

    # ------------------------------------------------------------------
    def _run_cached(self, cache_images, cache_infos):
        """Run the jitted step over every cached patch; returns per-file lists
        of (144,144,C) numpy outputs ordered like each file's patch_info.

        Batches are dispatched back-to-back; JAX's async dispatch overlaps
        H2D, compute and the host-side crop assembly of the next batch.
        """
        batch_size = int(self.batch_size)
        in_shape = int(self.patch_input_shape)

        from ..native import gather_patches

        jobs = []  # (file_idx, within-file patch index)
        file_patches = []
        for file_idx, info in enumerate(cache_infos):
            # one native threaded gather per file: all windows packed in a
            # single pass over the padded image
            coords = info["patch_info"][:, 0, 0]  # input window TLs (y, x)
            file_patches.append(
                gather_patches(cache_images[file_idx], coords, in_shape,
                               in_shape))
            jobs.extend((file_idx, pi) for pi in range(len(coords)))

        device_batches = []
        for start in range(0, len(jobs), batch_size):
            chunk = jobs[start : start + batch_size]
            batch = np.zeros((batch_size, in_shape, in_shape, 3), np.uint8)
            for bi, (file_idx, pi) in enumerate(chunk):
                batch[bi] = file_patches[file_idx][pi]
            device_batches.append(
                (self.run_step(batch, self.patch_output_shape), len(chunk))
            )

        outputs_per_file = [[] for _ in cache_infos]
        job_iter = iter(jobs)
        for dev_out, valid in device_batches:
            host_out = np.asarray(dev_out)[:valid]
            for bi in range(valid):
                file_idx, _ = next(job_iter)
                outputs_per_file[file_idx].append(host_out[bi])
        return outputs_per_file

    # ------------------------------------------------------------------
    @staticmethod
    def _save_results(results, save_root_dir: str, viz_info) -> None:
        """Write overlay jpg + per-task .mat files (infer/tile.py:243-288)."""
        (base_name, src_image, pred_inst_map_dict, pred_inst_info_dict,
         pred_type_map_dict, pclass_map) = results

        mkdir("%s/overlay/" % save_root_dir)
        src_2x = cv2.resize(src_image, (0, 0), fx=2, fy=2,
                            interpolation=cv2.INTER_NEAREST)
        overlay = visualize_instances_dict(src_2x, pred_inst_info_dict, viz_info)
        overlay = cv2.cvtColor(overlay, cv2.COLOR_BGR2RGB)
        cv2.imwrite("%s/overlay/%s.jpg" % (save_root_dir, base_name), overlay)

        for tissue_code, pred_inst in pred_inst_map_dict.items():
            inst_info = pred_inst_info_dict[tissue_code]
            inst_id = list(inst_info.keys())
            type_pred = [d.get("type", -1) for d in inst_info.values()]
            mkdir("%s/%s_mat/" % (save_root_dir, tissue_code.lower()))
            mat_dict = {"inst_map": pred_inst, "type": type_pred, "id": inst_id}
            type_map = pred_type_map_dict[tissue_code]
            if type_map is not None:
                mat_dict["type_map"] = type_map
            sio.savemat("%s/%s_mat/%s.mat"
                        % (save_root_dir, tissue_code.lower(), base_name),
                        mat_dict)

        if pclass_map is not None:
            mkdir("%s/pclass_mat/" % save_root_dir)
            sio.savemat("%s/pclass_mat/%s.mat" % (save_root_dir, base_name),
                        {"pclass": pclass_map})
