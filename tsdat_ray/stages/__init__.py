"""tsdat_ray.stages"""

from __future__ import annotations


def safe_pool_size(requested: int, headroom: int = 2, floor: int = 1) -> int:
    """Cap an actor-pool size to the cluster's CPUs minus shuffle headroom.

    An actor pool sized >= available CPUs can wedge a concurrent all-to-all:
    pool actors pin their CPUs for the whole stage while the shuffle's
    reduce tasks wait for a slot that never frees (observed at 4 CPUs with
    pools > 2 — see tests/conftest.py).  Every stateful ``map_batches(Cls,
    concurrency=...)`` call in the library routes its requested size through
    this guard so a mis-sized pool degrades to fewer actors instead of
    deadlocking, on a laptop or a 256-node deployment alike.
    """
    import ray

    if not ray.is_initialized():
        return max(floor, requested)
    cpus = int(ray.cluster_resources().get("CPU", requested + headroom))
    return max(floor, min(requested, cpus - headroom))
