"""whakoom_webscrapper_ray — Ray-Data-native crawl + data-ops engine.

Importing the package tunes the glibc allocator for the data plane (see
:func:`_tune_allocator`); everything else lives in submodules
(``pipelines``, ``stages``, ``sources``, ``state``, ``functions``,
``storage``).
"""

from __future__ import annotations

import os


def _tune_allocator() -> bool:
    """Keep large malloc blocks in the heap instead of mmap/munmap.

    Batch engines allocate and free large (tens-of-MB) numpy/temporary
    buffers once per batch.  glibc serves those via mmap and returns
    them with munmap, so every batch pays page-table setup/teardown and
    TLB shootdowns — on virtualized hosts this is a kernel-side storm:
    measured here, a 32 MB alloc+touch+free cycle costs ~10 ms of pure
    SYSTEM time (200 cycles = 2.0 s sys), and 0.00 s after this tuning.
    Raising M_MMAP_THRESHOLD and M_TRIM_THRESHOLD makes glibc carve
    large blocks from the arena and KEEP them on free for reuse, so
    steady-state batch processing does zero memory syscalls.

    Cost: freed memory stays resident per process (RSS ~= peak live
    set, bounded by batch size × pipeline depth, not dataset size).
    Arrow buffers are unaffected (pyarrow uses its own jemalloc pool,
    which already recycles).  No-op on non-glibc platforms; opt out
    with WKM_NO_MALLOC_TUNING=1.
    """
    if os.environ.get("WKM_NO_MALLOC_TUNING"):
        return False
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        m_mmap_threshold, m_trim_threshold = -3, -1
        ok = libc.mallopt(m_mmap_threshold, 1 << 30)
        ok &= libc.mallopt(m_trim_threshold, 1 << 30)
        return bool(ok)
    except Exception:
        return False


_ALLOCATOR_TUNED = _tune_allocator()
_WARMED = False


def warm_worker(numpy_mb: int | None = None,
                arrow_mb: int | None = None) -> None:
    """Pre-fault this process's allocator arenas (call once per worker).

    On virtualized hosts, a page's FIRST fault into the VM is far more
    expensive than a refault of an arena-retained page (measured here:
    a 330k-row frontier poll under 16-way concurrency is 9.2 s cold vs
    2.5 s warm — 7.5 s vs 1.1 s of system time, same work).  Long-lived
    workers in a real deployment are warm by their second batch; this
    makes the FIRST batch behave the same.  Pairs with
    :func:`_tune_allocator` (glibc keeps the numpy arena) and a large
    jemalloc decay (Arrow keeps its dirty pages) so the faulted pages
    stay resident for reuse.

    Sizes via WKM_WARM_NUMPY_MB / WKM_WARM_ARROW_MB (defaults 48/64,
    ~the per-actor working set of a 330k-row poll); 0 disables.
    """
    global _WARMED
    if _WARMED:
        return
    _WARMED = True
    import numpy as np
    import pyarrow as pa

    try:
        # keep Arrow's freed dirty pages resident instead of purging
        # them between rounds (refaulting purged pages is the storm)
        pa.jemalloc_set_decay_ms(10_000_000)
    except Exception:
        pass
    n_mb = int(os.environ.get("WKM_WARM_NUMPY_MB", numpy_mb or 48))
    a_mb = int(os.environ.get("WKM_WARM_ARROW_MB", arrow_mb or 64))
    if n_mb > 0:
        w = np.empty(n_mb * (1 << 20) // 8, np.int64)
        w[::512] = 1                      # touch every 4 KiB page
        del w                             # trim-off: arena keeps pages
    if a_mb > 0:
        buf = pa.allocate_buffer(a_mb * (1 << 20), resizable=False)
        np.frombuffer(buf, np.uint8)[::4096] = 1
        del buf                           # decay-off: pool keeps pages
