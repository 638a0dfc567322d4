"""Multi-host orchestration: distributed init + the sharded WSI work queue.

The reference scales across machines by manual job sharding — each
invocation processes slides ``[(bulk_idx-1)*step, bulk_idx*step)`` of the
sorted list (``run_infer_wsi.py:89-95``) with zero IPC. The TPU-native
equivalent (SURVEY.md §2.9 / config 5, the 599-slide TCGA cohort on v5e-64):

  * ``initialize()``: ``jax.distributed.initialize`` so every host sees the
    global device mesh (ICI within a slice, DCN across);
  * ``shard_slides()``: deterministic per-process slide assignment layered
    UNDER the bulk-idx contract — the CLI flags keep their meaning for
    fleet-level sharding, and within one job each host takes a strided
    slice of that job's slides. Slide-level independence means no cross-host
    synchronization is needed beyond initialization; per-slide skip-if-done
    gives elastic re-run semantics (a lost host's slides are picked up by a
    re-launched job).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-ops when single-process (the common
    single-chip / single-host case) or when already initialized."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as exc:  # already initialized
        if "already" not in str(exc):
            raise


def process_info() -> Tuple[int, int]:
    return jax.process_index(), jax.process_count()


def shard_slides(slides: Sequence, masks: Sequence,
                 process_id: Optional[int] = None,
                 process_count: Optional[int] = None
                 ) -> Tuple[List, List]:
    """Strided per-host slice of this job's slide list.

    Applied after the CLI-level bulk-idx slicing, so single-host behavior is
    unchanged (process_count == 1 returns everything)."""
    if process_id is None:
        process_id, process_count = process_info()
    elif process_count is None:
        # slides[pid::None] would be an OVERLAPPING tail slice — two hosts
        # would both process nearly the whole cohort
        raise ValueError("shard_slides: process_count is required when "
                         "process_id is given explicitly")
    return (list(slides[process_id::process_count]),
            list(masks[process_id::process_count]))
