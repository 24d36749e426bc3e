"""Per-process numpy arena pre-touch for the Arrow gram kernels.

This host exhibits a first-touch page pathology: newly mapped anonymous
memory faults at ~100µs/page in waves, so the first kernel batch in a
fresh Python worker pays tens of seconds just faulting its temporaries
(measured: 145s first pass vs 9s warmed for the repetition kernel on a
4.8M-token batch).  With `MALLOC_TRIM_THRESHOLD_=-1` and a high
`MALLOC_MMAP_THRESHOLD_` (set in ``vector_spark/__init__``), freed large
blocks stay in the brk arena — so touching a block once up front leaves
a warm arena every later temporary reuses.  PySpark reuses worker
processes across tasks (`spark.python.worker.reuse` default), so the
cost is paid once per worker, not per batch.
"""

from __future__ import annotations

_warmed = False


def warm_numpy_arena(nbytes: int = 64 << 20) -> None:
    """Touch ``nbytes`` of arena once per process (no-op afterwards).

    Sized deliberately small: a big pre-touch ADDS page faults on top of
    the kernel's own, and with 32 workers faulting simultaneously the
    kernel-side mm contention dominates (measured: a 256MB pre-touch per
    worker made the cold run WORSE, 180s -> 304s, while steady-state
    improved 180s -> 23s).  64MB warms the hot small-temporary range;
    the large lexsort buffers fault once on first use either way."""
    global _warmed
    if _warmed:
        return
    import numpy as np

    block = np.empty(nbytes, dtype=np.uint8)
    block[::4096] = 1  # one write per page
    del block
    _warmed = True
