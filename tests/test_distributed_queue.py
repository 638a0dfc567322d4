"""Multi-host slide-queue sharding semantics (parallel/distributed.py)."""
from cerberus_tpu.parallel.distributed import shard_slides


def test_strided_partition_covers_all_slides():
    slides = [f"s{i}" for i in range(10)]
    masks = [f"m{i}" for i in range(10)]
    seen = []
    for pid in range(4):
        s, m = shard_slides(slides, masks, pid, 4)
        assert len(s) == len(m)
        for si, mi in zip(s, m):
            assert si[1:] == mi[1:]
        seen += s
    assert sorted(seen) == sorted(slides)  # exact partition


def test_single_process_noop():
    slides = ["a", "b"]
    s, m = shard_slides(slides, [None, None], 0, 1)
    assert s == slides and m == [None, None]


def test_compose_with_bulk_idx_contract():
    # the CLI slices [(bulk_idx-1)*step, bulk_idx*step) FIRST; host sharding
    # then partitions within the job — together they cover a cohort exactly
    cohort = [f"s{i:03d}" for i in range(599)]
    step = 100
    covered = []
    for bulk_idx in range(1, 7):
        job = cohort[(bulk_idx - 1) * step: bulk_idx * step]
        for pid in range(8):
            s, _ = shard_slides(job, [None] * len(job), pid, 8)
            covered += s
    assert sorted(covered) == cohort
