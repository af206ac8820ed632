"""Session-level Ray Data tuning.

``read_op_min_num_blocks`` defaults to 200, which pads SMALL inputs out to
200 blocks — every downstream stage then pays 200 task launches and the
sort-shuffle pays 200x200 exchange overhead (measured: a trivial 5000-row
groupby costs ~3s at 200 blocks vs ~0.3s at 8). At 100 TB the block count
is governed by ``target_max_block_size`` (128 MiB), so lowering the floor
to ~2x CPUs keeps full parallelism on big data while removing pure
overhead on small partitions of it.
"""

from __future__ import annotations

_TUNED = False


def tune_context(force: bool = False) -> None:
    """Idempotent; safe to call from every pipeline builder."""
    global _TUNED
    if _TUNED and not force:
        return
    import ray
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ncpu = 8
    if ray.is_initialized():
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001
            pass
    ctx.read_op_min_num_blocks = max(2 * ncpu, 8)
    # Per-operator resource reservation starves the long-pole map operator
    # in low-CPU sessions with several downstream ops: measured 81.9s -> 29.0s
    # for the canonicalize exchange leg at 8 CPUs (the reserved shares left
    # the producer ~1 concurrent task while the sorts sat idle waiting for
    # its output). All engine pipelines are acyclic map/shuffle chains with
    # min-1 actor pools, so reservation's deadlock protection buys nothing.
    ctx.op_resource_reservation_enabled = False
    _TUNED = True


def default_pool() -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster: min 1 (a small
    session must never deadlock on CPU reservation), max = cluster CPUs (an
    actor stage must be able to use the whole machine — a fixed cap of 8
    silently flatlines scaling past 8 cores)."""
    import ray

    ncpu = 8
    if ray.is_initialized():
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001
            pass
    return (1, max(8, ncpu))
