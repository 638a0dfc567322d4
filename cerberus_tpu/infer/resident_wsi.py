"""HBM-resident WSI hot loop: patches -> on-device tile canvas -> on-chip
grid-set nuclei instances, with the disk canvas landed asynchronously.

This is the SURVEY-mandated end-state for the WSI data path (SURVEY.md
§3.2:244-246, §7:416-422: "HBM-resident per-tile canvases with on-TPU
postproc and only instance dicts leaving the chip"), replacing the
reference's disk-canvas round trips (``/root/reference/infer/wsi.py:455-469,
613-621``). The host pipeline it supersedes (``infer/wsi.py`` legacy mode)
landed EVERY batch on the host, wrote it to a disk mmap, then re-read and
re-uploaded each 4096² postproc tile — every proc-plane pixel crossed the
host boundary 3-6x (round-4 verdict, measured at 49k²).

Design (per postproc grid tile, the set-0 grid of ``wsi/coords.get_tile_info``):

  * inference batches run through the manager's UNCHANGED jitted step (same
    executable as legacy mode -> bit-identical outputs), but instead of a
    host copy each output batch is scatter-written into an HBM float16
    canvas by a tiny donated-buffer program (``lax.dynamic_update_slice``);
  * grid tiles are patch-OUTPUT-aligned (tile side is floored to a multiple
    of the output shape), so the patch partition never straddles tiles and
    no patch is computed twice;
  * the canvas is allocated at the 512-bucketed shape ``pad_to_512`` would
    produce (one XLA program per bucket, ~4 buckets per slide) plus one
    output-shape scratch row that absorbs the zero-padded tail of the last
    batch (padded entries write at (HP, 0); the valid region is untouched);
  * the nuclei grid-set program runs ON the resident canvas: channel slice
    -> family kernels (ops/lax_postproc via ops/tpu_postproc dispatch) ->
    on-device id compaction -> uint16 instance ids + uint8 type ids. Only
    label maps leave the chip (3 B/px vs the legacy int32+float32 8 B/px —
    round-4 verdict task 7);
  * the full-precision canvas tile is D2H'd ONCE, asynchronously, into the
    disk ``CanvasSet`` (kept for mid-slide resume, the tissue map, the
    nuclei boundary-repair strips and the gland/lumen region reads) — off
    the critical path, overlapped with the next tile's inference.

Content contract: byte-identical .dat payloads vs the legacy
``postproc_backend='tpu'`` path (verified by tests/test_resident_wsi.py and
tools/verify_postproc_ab.py). The on-device compaction reproduces the host
``np.unique`` relabel exactly: ids absent from the final map (e.g. markers
that claim no watershed pixels, small components swallowed by a neighbour's
max-dilation) are dropped, survivors are ranked in ascending-id order
(monotone, so watershed min-id tie-breaks are unaffected).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lax_postproc as L
from ..ops.tpu_postproc import _cc, _cc_impl
from ..wsi.coords import assign_patches_to_tiles, filter_coordinates
from ..wsi.dedup import select_tile_removals

_U16_LIMIT = 65535


def _pad512(n: int) -> int:
    return max(-(-int(n) // 512) * 512, 512)


def _compact_present_ids(lab: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """On-device ``np.unique``-style relabel: ids with zero surviving pixels
    are dropped, the rest become 1..n in ascending-id order (a monotone map,
    so every downstream min/max-id convention is preserved).

    Input ids must already be dense-ish (bounded by a prior compaction —
    markers/components go through ``_compact_labels_jit`` or
    ``remove_small_objects`` first); the fast path uses the MXU presence
    histogram for ids < 16384, the rare wide-id tile falls back to the
    segment-sum table."""
    h, w = lab.shape
    nmax = jnp.max(lab)

    def fast(lab):
        sizes = L._sizes_histogram(lab, L._HIST_CAP)
        present = (sizes > 0).astype(jnp.int32)
        present = present.at[0].set(0)
        rank = jnp.cumsum(present).astype(jnp.int32)
        out = L._lut_matmul(rank, jnp.clip(lab, 0, L._HIST_CAP - 1))
        return jnp.where(lab > 0, out, 0), rank[-1]

    def slow(lab):
        sizes = L.label_sizes(lab)
        present = (sizes > 0).astype(jnp.int32)
        present = present.at[0].set(0)
        rank = jnp.cumsum(present).astype(jnp.int32)
        out = L._row_gather(rank, jnp.clip(lab, 0, h * w))
        return jnp.where(lab > 0, out, 0), rank[-1]

    return jax.lax.cond(nmax < L._HIST_CAP, fast, slow, lab)


class ResidentWSIProcessor:
    """Fused inference + grid-set postproc over the postproc tile grid.

    ``manager`` is the WSI InferManager (supplies ``run_step``, the batch
    reader and config); single-device only (mesh callers keep the legacy
    sharded path)."""

    def __init__(self, manager, idx_dict: Dict, n_ch: int,
                 postproc_code: Optional[str], output_shape: int,
                 margin: int):
        self.manager = manager
        self.idx_dict = idx_dict
        self.n_ch = n_ch
        self.postproc_code = postproc_code
        self.out = int(output_shape)
        self.margin = int(margin)
        self.cc_impl = _cc_impl()
        self._writer_cache: Dict = {}
        self._nuclei_cache: Dict = {}

    # ------------------------------------------------------------------
    def _writer(self, canvas_shape):
        """(canvas, outs, tls) -> canvas with each batch entry scatter-
        written at its local (y, x) top-left. The canvas buffer is donated:
        the whole tile accumulates in one HBM allocation."""
        if canvas_shape not in self._writer_cache:

            @partial(jax.jit, donate_argnums=(0,))
            def write(canvas, outs, tls):
                outs = outs.astype(canvas.dtype)

                def body(i, c):
                    return jax.lax.dynamic_update_slice(
                        c, outs[i], (tls[i, 0], tls[i, 1], jnp.int32(0)))

                return jax.lax.fori_loop(0, outs.shape[0], body, canvas)

            self._writer_cache[canvas_shape] = write
        return self._writer_cache[canvas_shape]

    # ------------------------------------------------------------------
    def _nuclei_program(self, hp: int, wp: int):
        """Grid-set nuclei instances on the resident canvas.

        Mirrors ops/tpu_postproc's Nuclei dispatch (same kernels, same
        thresholds — reference ``loader/postproc.py`` contract) plus the
        on-device compaction; rows/cols past the slide edge are zeroed so
        the program sees exactly what ``pad_to_512`` fed the legacy path."""
        key = (hp, wp)
        if key in self._nuclei_cache:
            return self._nuclei_cache[key]

        s, e = self.idx_dict["Nuclei-INST"]
        t_slice = self.idx_dict.get("Nuclei-TYPE")
        contour_family = self.postproc_code.startswith("IP-ERODED-CONTOUR")
        cc_impl = self.cc_impl

        @jax.jit
        def prog(canvas, h_valid, w_valid):
            valid = ((jnp.arange(hp)[:, None] < h_valid)
                     & (jnp.arange(wp)[None, :] < w_valid))

            def ch(i):
                return jnp.where(valid, canvas[:hp, :wp, i]
                                 .astype(jnp.float32), 0.0)

            if contour_family:
                inner, cnt = ch(s), ch(s + 1)
                se3 = L.disk_kernel(3)
                msk = L.binary_erode((inner + cnt) > 0.5, se3)
                msk = L.remove_small_objects(_cc(msk, cc_impl), 8) > 0
                mrk_lab = L.remove_small_objects(_cc(inner > 0.5, cc_impl), 4)
                mrk = L.fill_holes(mrk_lab > 0, cc_impl=cc_impl)
                # compact the markers first (monotone relabel: raster-of-root
                # order == ascending flat-index order) so the watershed
                # output ids stay < 2^16 and the presence pass is MXU-shaped
                markers, _n_m = L._compact_labels_jit(_cc(mrk, cc_impl))
                lab = L.watershed(-inner, markers, msk)
            else:
                fg = ch(s)  # ErodedMap nuclei: single fg channel
                lab = _cc(fg > 0.5, cc_impl)
                lab = L.remove_small_objects(lab, 8)
                lab = L.dilate_labels(lab, 3)
                lab = L.fill_label_holes(lab, cc_impl=cc_impl)
            lab_k, count = _compact_present_ids(lab)
            inst16 = lab_k.astype(jnp.uint16)
            if t_slice is not None:
                type8 = jnp.where(valid, canvas[:hp, :wp, t_slice[0]]
                                  .astype(jnp.float32), 0.0).astype(jnp.uint8)
            else:
                type8 = jnp.zeros((hp, wp), jnp.uint8)
            return inst16, type8, count

        self._nuclei_cache[key] = prog
        return prog

    # ------------------------------------------------------------------
    def region_program(self, shape: Tuple[int, int], tissue: str, code: str,
                       ds: float):
        """Gland/lumen family on an uploaded (pad512'd) 0.5x region plane,
        with on-device id compaction: only u16 instance ids leave the chip
        (the legacy path D2H'd int32 and relabelled through a host float64
        LUT — round-4 verdict task 7). Numerics: the family kernels are the
        SAME jitted functions the legacy tpu backend calls
        (ops/tpu_postproc), traced inline."""
        key = ("region", shape, tissue, code, round(float(ds), 6))
        if key in self._nuclei_cache:
            return self._nuclei_cache[key]
        from ..ops import tpu_postproc as T

        cc_impl = self.cc_impl
        contour = code.startswith("IP-ERODED-CONTOUR")
        if contour:
            thresh, base_min, base_k = \
                T.TPUPostProcInstErodedContourMap._SPEC[tissue]
            min_size = int(base_min * ds ** 2)
            ksize = int((base_k - 1) * ds)

            @jax.jit
            def prog(region):
                lab = T._inner_contour_instances(
                    region[..., 0], region[..., 1], thresh, min_size,
                    ksize, cc_impl)
                lab_k, n = _compact_present_ids(lab)
                return lab_k.astype(jnp.uint16), n
        else:
            min_size, ksize = T.TPUPostProcInstErodedMap._SPEC[tissue]

            @jax.jit
            def prog(region):
                lab = T._eroded_map_instances(region[..., 0], 0.5, min_size,
                                              ksize, cc_impl)
                lab_k, n = _compact_present_ids(lab)
                return lab_k.astype(jnp.uint16), n

        self._nuclei_cache[key] = prog
        return prog

    # ------------------------------------------------------------------
    def _tile_batches(self, reader, tile_in, tile_out, tile_bounds,
                      resolution, scratch_tl):
        """Prefetching generator of (batch, tls_device) for one tile.

        Same bounded-queue reader-thread pattern as the legacy
        ``_run_tile_pipelined``; tls are canvas-local int32 (y, x) with the
        zero-padded tail of the last batch pointed at the scratch row."""
        mgr = self.manager
        batch_size = int(mgr.batch_size)
        x0, y0 = int(tile_bounds[0]), int(tile_bounds[1])
        tls_all = np.stack([tile_out[:, 1] - y0, tile_out[:, 0] - x0],
                           axis=1).astype(np.int32)

        read_q: "queue.Queue" = queue.Queue(maxsize=2)
        _END = object()
        stop = threading.Event()

        def _bounded_put(item):
            while not stop.is_set():
                try:
                    read_q.put(item, timeout=0.5)
                    return
                except queue.Full:
                    continue

        def read_worker():
            try:
                for item in mgr._read_patch_batches(reader, tile_in,
                                                    resolution):
                    _bounded_put(item)
                    if stop.is_set():
                        return
                _bounded_put(_END)
            except BaseException as exc:
                _bounded_put(exc)

        th = threading.Thread(target=read_worker, daemon=True)
        th.start()
        try:
            cursor = 0
            while True:
                item = read_q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                batch, valid = item
                tls = np.full((batch_size, 2), -1, np.int32)
                tls[:] = scratch_tl
                tls[:valid] = tls_all[cursor:cursor + valid]
                cursor += valid
                yield batch, jnp.asarray(tls)
        finally:
            stop.set()
            th.join(timeout=60)

    # ------------------------------------------------------------------
    def run(self, reader, resolution, patch_inputs, patch_outputs,
            set0, wsi_mask, wsi_proc_shape_xy, done_tiles, save_progress,
            canvas, logger=None):
        """Process every set-0 grid tile. Returns
        ``(nuclei_inst_info, deferred_tile_idxs)`` — deferred tiles (resumed
        from a previous run's disk canvas, or u16-overflow tiles) must go
        through the legacy mmap grid postproc."""
        set_bounds, set_flags = set0
        nuclei_info: Dict = {}
        deferred: List[int] = []
        run_nuclei = ("Nuclei-INST" in self.idx_dict
                      and self.postproc_code is not None)

        land_pool = ThreadPoolExecutor(max_workers=1)   # canvas D2H + mmap
        host_pool = ThreadPoolExecutor(max_workers=3)   # contours + dedup
        land_futs: List = []
        host_futs: List = []
        info_lock = threading.Lock()

        def land_canvas(dev, bounds, tile_idx):
            x0, y0, x1, y1 = [int(v) for v in bounds]
            # slice on-device first: the 512-bucket pad + scratch row are up
            # to ~2.8x the valid bytes in dense mode — never ship them
            arr = np.asarray(dev[: y1 - y0, : x1 - x0])
            canvas.write_region(bounds, arr)
            canvas.flush()
            done_tiles.add(tile_idx)
            save_progress()

        def finish_tile(inst_dev, type_dev, count_dev, bounds, flags,
                        tile_idx):
            from ..ops.postproc import get_inst_info_dict
            from .wsi import _info_to_wsi_format

            count = int(np.asarray(count_dev))
            if count > _U16_LIMIT:  # u16 transfer would alias ids
                deferred.append(tile_idx)
                return
            x0, y0, x1, y1 = [int(v) for v in bounds]
            h, w = y1 - y0, x1 - x0
            inst_map = np.asarray(inst_dev[:h, :w])
            type_map = None
            if "Nuclei-TYPE" in self.idx_dict:
                type_map = np.asarray(type_dev[:h, :w]).astype(np.float32)
            info = get_inst_info_dict(inst_map, type_map)
            if not info:
                return
            boxes = np.array([
                [v["box"][0][1], v["box"][0][0], v["box"][1][1],
                 v["box"][1][0]] for v in info.values()])
            drop = select_tile_removals(boxes, (w, h), self.margin, flags, 0)
            kept = {k: info[k] for k, d in zip(info.keys(), drop) if not d}
            wsi_fmt = _info_to_wsi_format(kept, np.array([x0, y0]))
            with info_lock:
                nuclei_info.update(wsi_fmt)

        try:
            for tile_idx, bounds in enumerate(set_bounds):
                if tile_idx in done_tiles:
                    deferred.append(tile_idx)  # canvas already on disk
                    continue
                sel = assign_patches_to_tiles(patch_outputs, bounds)
                has_tissue = bool(filter_coordinates(
                    wsi_mask, np.asarray(bounds)[None],
                    wsi_proc_shape_xy)[0])
                if len(sel) == 0 and not has_tissue:
                    done_tiles.add(tile_idx)
                    save_progress()
                    continue

                x0, y0, x1, y1 = [int(v) for v in bounds]
                h_clip, w_clip = y1 - y0, x1 - x0
                hp = _pad512(-(-h_clip // self.out) * self.out)
                wp = _pad512(-(-w_clip // self.out) * self.out)
                canvas_shape = (hp + self.out, wp, self.n_ch)

                # backpressure: at most one finished tile's canvas still in
                # flight (2 canvases + batches bound device memory)
                while len(land_futs) > 1:
                    land_futs.pop(0).result()

                dev = jnp.zeros(canvas_shape, jnp.float16)
                writer = self._writer(canvas_shape)
                for batch, tls in self._tile_batches(
                        reader, patch_inputs[sel], patch_outputs[sel],
                        bounds, resolution, scratch_tl=(hp, 0)):
                    outs = self.manager.run_step(batch, self.out)
                    dev = writer(dev, outs, tls)

                if run_nuclei and len(sel) > 0:
                    inst16, type8, count = self._nuclei_program(hp, wp)(
                        dev, jnp.int32(h_clip), jnp.int32(w_clip))
                    host_futs.append(host_pool.submit(
                        finish_tile, inst16, type8, count, bounds,
                        set_flags[tile_idx], tile_idx))
                land_futs.append(land_pool.submit(
                    land_canvas, dev, bounds, tile_idx))
                del dev
                while host_futs and host_futs[0].done():
                    host_futs.pop(0).result()
            for fut in land_futs + host_futs:
                fut.result()
        finally:
            land_pool.shutdown(wait=True)
            host_pool.shutdown(wait=True)
        return nuclei_info, sorted(deferred)
