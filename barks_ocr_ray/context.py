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
        ctx.max_hash_shuffle_aggregators = max(2, cpus // 2)
        # default hash parallelism is 200 -> 50 reserved CPUs; scale it to
        # the cluster instead (callers can still pass num_partitions).
        # Kept EQUAL to the aggregator count: Ray's
        # ReducingShuffleAggregation holds ONE block list per AGGREGATOR
        # (hash_aggregate.py:49-79), so an aggregator owning >1 partition
        # emits all rows at its first finalize and a schema-less
        # pa.table({}) for every later partition — the "RefBundle with a
        # different schema ... new schema: ." warning. One partition per
        # aggregator keeps every finalized block typed.
        ctx.default_hash_shuffle_parallelism = max(2, cpus // 2)
        # default read parallelism is 200 blocks regardless of input size,
        # which shreds medium inputs into 1 MiB blocks and makes every
        # upstream stage scheduling-bound; scale to the cluster and let
        # target_max_block_size govern big inputs
        ctx.read_op_min_num_blocks = max(2, 2 * cpus)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05
    # joins spawn their own aggregator actors: without this override a
    # 16-partition join on a 4-CPU cluster deadlocks waiting for actors
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.05
    # default upscaling threshold (2.0) makes actor pools ramp far too
    # slowly for a post-shuffle burst of heavy blocks: the pool sits at
    # 1-2 actors while a barrier's worth of work drains. Scale as soon
    # as tasks are queued beyond current capacity.
    from ray.data.context import AutoscalingConfig

    ctx.autoscaling_config = AutoscalingConfig(
        actor_pool_util_upscaling_threshold=1.0
    )
    # output order is never semantic in this engine (identity = url key)
    ctx.execution_options.preserve_order = False
    ctx.enable_progress_bars = False
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size


def hash_partitions(requested: int | None = None) -> int:
    """Partition count for hash-aggregating operators (``groupby``,
    ``Dataset.join``), capped at the shuffle-aggregator count.

    Ray's per-aggregator aggregation state (ReducingShuffleAggregation,
    hash_aggregate.py:49-79) merges ALL of an aggregator's partitions at
    its first ``finalize`` — extra partitions per aggregator add shard
    overhead and emit schema-less empty blocks for the later finalizes
    (the "RefBundle with a different schema" warning), with no extra
    reduce parallelism in return. One partition per aggregator is the
    efficient shape; key-based ``repartition`` (Concat path, per-
    partition builders) is NOT subject to this cap.
    """
    from ray.data import DataContext

    n = DataContext.get_current().default_hash_shuffle_parallelism
    return n if requested is None else max(2, min(requested, n))
