"""Small shared helpers for stage sizing and process tuning."""

from __future__ import annotations

__all__ = ["default_concurrency", "tune_malloc"]


def tune_malloc(threshold: int = 1 << 30) -> None:
    """Stop glibc from mmap()ing/munmap()ing large allocations.

    On VMs with slow first-touch page faults (encrypted/ballooned memory),
    every numpy/Arrow buffer above glibc's mmap threshold (128 KiB) costs a
    fresh mmap + page-fault storm and is unmapped on free — measured here
    at ~10 MB/s vs ~13 GB/s for arena-reused pages.  Raising
    M_MMAP_THRESHOLD/M_TRIM_THRESHOLD keeps big buffers in the arena so
    pages are faulted once and reused.

    Applies to the CURRENT process via mallopt(3) and to future CHILD
    processes (Ray raylet → workers) via the glibc env tunables — call
    BEFORE ``ray.init``.
    """
    import os
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(threshold))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(threshold))
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, threshold)
        libc.mallopt(M_TRIM_THRESHOLD, threshold)
    except Exception:
        pass  # non-glibc platform: env vars alone


def default_concurrency(cap: int | None = None) -> tuple:
    """Autoscaling actor-pool size ``(1, n_cpus)`` derived from the current
    Ray cluster (works identically in local mode and on a real cluster —
    the pool scales to the CPUs actually present).  ``cap`` bounds the max.
    """
    import ray
    n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    hi = max(2, n)
    if cap is not None:
        hi = min(hi, cap)
    return (1, hi)
