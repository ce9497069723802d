"""Central Ray Data context configuration for the engine.

Called (idempotently) by pipeline builders, bench and tests. Does NOT call
``ray.init`` — session ownership stays with the caller (driver contract).
"""

from __future__ import annotations


def configure(target_max_block_size: int | None = None) -> None:
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    import ray

    ctx = DataContext.get_current()
    # key-based repartition (our dedup's hash-partition) and large
    # groupbys use the hash-shuffle implementation
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # size shuffle aggregator actors so they coexist with the extraction
    # actor pools instead of starving them (deadlocks a small cluster)
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
        ctx.max_hash_shuffle_aggregators = max(1, cpus // 4)
        # default hash parallelism is 200 -> 50 reserved CPUs; scale it to
        # the cluster instead (callers can still pass num_partitions)
        ctx.default_hash_shuffle_parallelism = max(2, min(2 * cpus, 64))
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.1
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.1
    # output order is never semantic in this engine (identity = url key)
    ctx.execution_options.preserve_order = False
    ctx.enable_progress_bars = False
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
