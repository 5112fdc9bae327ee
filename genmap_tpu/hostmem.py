"""Host-memory tuning for this VM's pathological huge-page faults.

Root cause (measured, round 2): numpy calls madvise(MADV_HUGEPAGE) on every
large allocation, and on this hypervisor a 2 MB huge-page fault takes ~400 ms
— so writing a fresh 256 MB numpy array runs at ~5 MB/s (52 s!) while a plain
mmap of the same size fills in 0.19 s.  Every fresh numpy temporary in the
index-construction pipeline paid this, which is what round 1 observed as
"lazily-paged memory" (188 s to build an 8 Mbp index).

Fixes applied here (idempotent):
  * turn numpy's huge-page madvise off at runtime (and via the env var for
    child processes) — np.full(256 MB): 52 s -> 0.13 s
  * raise glibc's mmap/trim thresholds so freed large buffers are reused from
    the heap instead of being returned to the kernel and re-faulted

Call once before heavy host-side numpy work (CLI entry, bench, build).
"""

from __future__ import annotations

import ctypes
import os

_DONE = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def retain_heap() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    try:
        import numpy as np

        # runtime switch for the already-imported numpy (the env var is only
        # read at import time)
        np._core.multiarray._set_madvise_hugepage(False)
    except Exception:
        pass
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, 64 << 20)
        libc.mallopt(_M_TRIM_THRESHOLD, 64 << 20)
    except Exception:
        pass  # non-glibc platform: defaults are fine
