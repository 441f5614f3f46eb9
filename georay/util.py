"""Small shared helpers for stage sizing."""

from __future__ import annotations

__all__ = ["default_concurrency"]


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
