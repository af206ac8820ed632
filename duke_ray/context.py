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
    # its output). Lean metadata-sized exchange plans (the KG pipeline)
    # never approach the object-store limit, so the default stays off — BUT
    # the r3 claim that "deadlock protection buys nothing" was falsified at
    # 10M docs: a plan whose live working set exceeds the store (the dedup
    # verify exchange, ~2x the shingle-set table in flight) livelocks under
    # the global-limit policy (every op stalled at the limit, a Sort barrier
    # preventing drain, driver spinning at 100%). Memory-heavy plans must
    # opt back in via :func:`reserve_memory_for`.
    ctx.op_resource_reservation_enabled = False
    _TUNED = True


def reserve_memory_for(ds):
    """Opt a dataset's lineage back into Ray's per-operator resource
    reservation (progress-guaranteed backpressure).

    ``tune_context`` disables reservation globally because it starves lean
    acyclic chains at low CPU counts, but a plan whose in-flight working
    set can exceed the object store (shuffle payloads carrying per-doc
    value lists, e.g. the dedup verify exchanges) NEEDS it: under the
    plain global-limit policy such a plan livelocks once total usage hits
    the limit while an all-to-all barrier holds its inputs (observed at
    10M docs: UnionOperator buffered 464 blocks, output 0, all workers
    idle, driver spinning). Ray snapshots one DataContext per root dataset
    and shares it down the lineage, so flipping the snapshot here scopes
    the policy to exactly this pipeline.
    """
    ds._plan._context.op_resource_reservation_enabled = True
    return ds


def join_partitions() -> int:
    """Hash-partition count for ``Dataset.join`` derived from cluster
    size (VERDICT r4 #3): one partition per cluster CPU with a floor of
    16, so a corpus-scale join fans out across the whole cluster instead
    of 16 fixed aggregator actors each holding 1/16th of the data.

    Ray allocates ``num_partitions`` aggregator ACTORS per join, so keep
    at most ONE ``Dataset.join`` per executing plan — two chained joins
    (16+16 actors) deadlocked a 4-CPU session (r4); multi-join plans use
    ``state.exchange.partitioned_reduce`` attach exchanges instead."""
    return max(16, default_pool()[1])


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
