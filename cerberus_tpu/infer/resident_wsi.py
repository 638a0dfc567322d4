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

Design (per TILE ROW of the set-0 postproc grid, ``wsi/coords.get_tile_info``):

  * the row's input pixels ride H2D ONCE as a u8 region (patch-window
    union); the 448²/1168² windows are gathered on-device (vmapped
    ``dynamic_slice`` — exact integer math), cutting per-pixel upload
    (in/out)²-fold (9.7x windowed, 1.83x dense) and turning N window reads
    into one region read;
  * every batch is FULL-SIZE (the row's patches stream through one
    executable; one zero-padded tail per row). This is a correctness
    requirement, not just throughput: an on-chip CLI A/B (2026-08-19)
    showed sub-batch executables flip rare threshold pixels — different
    XLA batch tilings reassociate conv accumulations — so byte-parity with
    the legacy loop demands the identical batch-shape program;
  * outputs scatter-write into an HBM float16 ROW canvas by a tiny
    donated-buffer program; grid tiles are patch-OUTPUT-aligned, so the
    patch partition never straddles tiles and no patch is computed twice;
  * the canvas is allocated at 512-bucketed height (one XLA program per
    bucket, ~2 row buckets per slide) plus one output-shape scratch row
    that absorbs the zero-padded batch tails (padded entries write at
    (HP, 0); the valid region is untouched);
  * per tile, the nuclei grid-set program slices its padded window from
    the resident row canvas: channel slice -> family kernels
    (ops/lax_postproc via ops/tpu_postproc dispatch) -> on-device id
    compaction -> uint16 instance ids + uint8 type ids. Only label maps
    leave the chip (3 B/px vs the legacy int32+float32 8 B/px — round-4
    verdict task 7);
  * each tile's full-precision canvas window is D2H'd ONCE (exact-extent
    device slice), asynchronously, into the disk ``CanvasSet`` (kept for
    mid-slide resume, the tissue map, the nuclei boundary-repair strips
    and the gland/lumen region reads) — off the critical path, overlapped
    with the next row's inference.

Content contract: byte-identical .dat payloads vs the legacy
``postproc_backend='tpu'`` path (verified by tests/test_resident_wsi.py and
tools/verify_postproc_ab.py). The on-device compaction reproduces the host
``np.unique`` relabel exactly: ids absent from the final map (e.g. markers
that claim no watershed pixels, small components swallowed by a neighbour's
max-dilation) are dropped, survivors are ranked in ascending-id order
(monotone, so watershed min-id tie-breaks are unaffected).
"""
from __future__ import annotations

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
        def prog(canvas, x_off, h_valid, w_valid):
            # the tile's padded window, sliced from the resident ROW canvas
            # (callers guarantee x_off + wp <= row width — dynamic_slice
            # clamping must never engage)
            tile = jax.lax.dynamic_slice(
                canvas, (jnp.int32(0), x_off, jnp.int32(0)),
                (hp, wp, canvas.shape[-1]))
            valid = ((jnp.arange(hp)[:, None] < h_valid)
                     & (jnp.arange(wp)[None, :] < w_valid))

            def ch(i):
                return jnp.where(valid, tile[..., i]
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
                type8 = jnp.where(valid, tile[..., t_slice[0]]
                                  .astype(jnp.float32), 0.0).astype(jnp.uint8)
            else:
                type8 = jnp.zeros((hp, wp), jnp.uint8)
            return inst16, type8, count

        self._nuclei_cache[key] = prog
        return prog

    def _land_slice(self, h: int, w: int):
        """(row_canvas, x_off) -> the tile's EXACT valid window, sliced on
        device so only real bytes ride the landing D2H (shapes bucket to
        the <=4 clipped tile extents)."""
        key = ("land", h, w)
        if key not in self._writer_cache:

            @jax.jit
            def land(canvas, x_off):
                return jax.lax.dynamic_slice(
                    canvas, (jnp.int32(0), x_off, jnp.int32(0)),
                    (h, w, canvas.shape[-1]))

            self._writer_cache[key] = land
        return self._writer_cache[key]

    def _gather_program(self, region_shape, in_sz: int):
        """(input_region u8, tls) -> (B, in, in, 3) u8 window batch via
        vmapped dynamic_slice — exact integer gather, so the batch pixels
        are bit-identical to host-read windows while each overlapping
        pixel crosses the link once instead of (in/out)² times."""
        key = ("gather", tuple(region_shape), in_sz)
        if key not in self._writer_cache:

            @jax.jit
            def gather(inp, tls):
                def one(tl):
                    return jax.lax.dynamic_slice(
                        inp, (tl[0], tl[1], jnp.int32(0)),
                        (in_sz, in_sz, 3))

                return jax.vmap(one)(tls)

            self._writer_cache[key] = gather
        return self._writer_cache[key]

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
        host_futs: List = []
        info_lock = threading.Lock()

        def land_canvas(tile_dev, bounds, tile_idx):
            # tile_dev is already the exact valid window (device-sliced by
            # _land_slice) — this D2H is the tile's one full-precision copy
            arr = np.asarray(tile_dev)
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

        # plan pass: resolve skips/deferrals per tile, then group the
        # remaining work by tile ROW. One input region, one resident canvas
        # and one uninterrupted FULL-batch stream per row: every patch rides
        # the same forward executable the legacy loop uses — sub-batch
        # executables were measured (on-chip A/B, 2026-08-19) to flip rare
        # threshold pixels because different XLA batch tilings reassociate
        # conv accumulations. Row granularity also bounds tail padding to
        # one partial batch per row instead of per tile.
        work = []
        for tile_idx, bounds in enumerate(set_bounds):
            if tile_idx in done_tiles:
                deferred.append(tile_idx)  # canvas already on disk
                continue
            sel = assign_patches_to_tiles(patch_outputs, bounds)
            has_tissue = bool(filter_coordinates(
                wsi_mask, np.asarray(bounds)[None], wsi_proc_shape_xy)[0])
            if len(sel) == 0 and not has_tissue:
                done_tiles.add(tile_idx)
                save_progress()
                continue
            work.append((tile_idx, np.asarray(bounds), sel))

        rows: Dict[int, List] = {}
        for item in work:
            rows.setdefault(int(item[1][1]), []).append(item)
        row_keys = sorted(rows)
        for key in row_keys:
            rows[key].sort(key=lambda it: int(it[1][0]))  # by tile x0

        in_sz = (int(patch_inputs[0, 2] - patch_inputs[0, 0])
                 if len(patch_inputs) else self.out)
        m_in = (in_sz - self.out) // 2
        W = int(wsi_proc_shape_xy[0])
        aw_slide = -(-W // self.out) * self.out  # covers every patch window

        def _wp(w_clip):
            return _pad512(-(-w_clip // self.out) * self.out)

        # row canvas width: every tile's padded slice must stay in-bounds
        # (dynamic_slice clamping would silently shift the window)
        w_row = max([aw_slide] + [int(b[0]) + _wp(int(b[2]) - int(b[0]))
                                  for b in set_bounds])

        def read_row_input(y0, align_h):
            """ONE host read of the row's input pixels (the union of its
            patch windows): uploaded once, windows gathered ON-DEVICE
            (exact u8 slicing). Replaces per-patch host reads + per-window
            H2D — overlapping windows shipped the same pixel (in/out)²
            times: 9.7x at 448->144, 1.83x dense."""
            rb = (-m_in, y0 - m_in, aw_slide + m_in, y0 + align_h + m_in)
            return np.ascontiguousarray(
                reader.read_bounds(rb, **resolution))

        def _row_geom(key):
            tiles = rows[key]
            y1 = max(int(it[1][3]) for it in tiles)
            align_h = -(-(y1 - key) // self.out) * self.out
            return y1 - key, align_h

        batch_size = max(int(self.manager.batch_size), 1)
        read_pool = ThreadPoolExecutor(max_workers=1)
        row_land_futs: List[List] = []
        try:
            if row_keys:
                rfut = read_pool.submit(
                    read_row_input, row_keys[0], _row_geom(row_keys[0])[1])
            for ri, key in enumerate(row_keys):
                tiles = rows[key]
                region = rfut.result()
                if ri + 1 < len(row_keys):
                    rfut = read_pool.submit(
                        read_row_input, row_keys[ri + 1],
                        _row_geom(row_keys[ri + 1])[1])

                h_clip_row, align_h = _row_geom(key)
                hp = _pad512(align_h)
                canvas_shape = (hp + self.out, w_row, self.n_ch)

                # backpressure: at most two row canvases alive
                while len(row_land_futs) > 1:
                    for fut in row_land_futs.pop(0):
                        fut.result()

                dev = jnp.zeros(canvas_shape, jnp.float16)
                writer = self._writer(canvas_shape)
                inp_dev = jnp.asarray(region)
                gather = self._gather_program(region.shape, in_sz)
                # output-window top-lefts in canvas coords == input-window
                # top-lefts in input-region coords (both origins sit m_in
                # before the row corner), so one tls array drives both
                sel_row = np.concatenate([it[2] for it in tiles])
                row_out = patch_outputs[sel_row]
                tls_all = np.stack([row_out[:, 1] - key, row_out[:, 0]],
                                   axis=1).astype(np.int32)
                n = len(sel_row)
                for start in range(0, n, batch_size):
                    valid = min(batch_size, n - start)
                    tls = np.full((batch_size, 2), 0, np.int32)
                    tls[:] = (hp, 0)  # scratch row absorbs tail padding
                    tls[:valid] = tls_all[start:start + valid]
                    tls_dev = jnp.asarray(tls)
                    batch = gather(inp_dev, tls_dev)
                    outs = self.manager.run_step(batch, self.out)
                    dev = writer(dev, outs, tls_dev)
                del inp_dev

                futs: List = []
                for tile_idx, bounds, sel in tiles:
                    x0, y0, x1, y1 = [int(v) for v in bounds]
                    h_clip, w_clip = y1 - y0, x1 - x0
                    if run_nuclei and len(sel) > 0:
                        prog = self._nuclei_program(hp, _wp(w_clip))
                        inst16, type8, count = prog(
                            dev, jnp.int32(x0), jnp.int32(h_clip),
                            jnp.int32(w_clip))
                        host_futs.append(host_pool.submit(
                            finish_tile, inst16, type8, count, bounds,
                            set_flags[tile_idx], tile_idx))
                    tile_dev = self._land_slice(h_clip, w_clip)(
                        dev, jnp.int32(x0))
                    futs.append(land_pool.submit(
                        land_canvas, tile_dev, bounds, tile_idx))
                row_land_futs.append(futs)
                del dev
                while host_futs and host_futs[0].done():
                    host_futs.pop(0).result()
                # each pending host future pins its u16/u8 label planes in
                # HBM; a slow contour host must stall dispatch rather than
                # accumulate unbounded device buffers
                while len(host_futs) > 8:
                    host_futs.pop(0).result()
            for futs in row_land_futs:
                for fut in futs:
                    fut.result()
            for fut in host_futs:
                fut.result()
        finally:
            read_pool.shutdown(wait=True)
            land_pool.shutdown(wait=True)
            host_pool.shutdown(wait=True)
        return nuclei_info, sorted(deferred)
