"""Iterative graph algorithms over Ray Datasets — distributed PageRank
in exact fixed-point arithmetic.

PageRank is the canonical "iterative algorithm" a data-processing engine
must express (the reference's dup-cluster resolution is the same
join-propagate-aggregate loop; /root/reference/src/barks_ocr/tools/
ocr_check.py:521-538 resolves duplicate chains iteratively). The
distributed shape per iteration is the textbook one:

    contribs = edges ⋈ ranks (on src)          # edge-sized, streamed
    ranks'   = deg  ⟕ Σ contribs (on dst)      # node-sized

Only node-sized tables are ever materialized between iterations; the
edge table streams through one keyed exchange per iteration and is
never collected. At 100 TB the edge relation dominates and this loop is
the standard BSP PageRank — per-iteration cost is one hash join plus
one grouped sum, both keyed on the SAME node id so a future
partition-aligned scheduler can elide the second exchange.

Why fixed-point: float addition is order-dependent, so a distributed
sum of float contributions cannot hash-match a serial SQL replay.
Every quantity here is an int64 "micro-rank" (SCALE = 10^12) and every
operation is integer floor division / multiplication replicated
verbatim by the DuckDB oracle (`//`), making the result bit-exact under
ANY partitioning, block order, or cluster size — the same trick the
engine's money aggregates use (queries.py q71 cents rationale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from barks_ocr_ray.context import hash_partitions
from barks_ocr_ray.functions.relational import compact_nonempty

#: fixed-point scale: 1.0 of total rank mass == 10^12 micro-units
SCALE = 10**12
#: damping factor d = DAMP_NUM / DAMP_DEN (0.85, the classic choice)
DAMP_NUM, DAMP_DEN = 85, 100

_RANKS_SCHEMA = pa.schema([("node", pa.string()), ("pr", pa.int64())])


def _distinct_edges(pairs: Dataset, num_partitions: int) -> Dataset:
    """Distinct directed (src, dst) pairs via one keyed exchange."""
    return (
        pairs.groupby(["src", "dst"], num_partitions=num_partitions)
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
        )
    )


def symmetrize(edges: Dataset) -> Dataset:
    """Add the reverse of every edge (undirected graph as two directed
    arcs). Guarantees every node with an edge has out-degree >= 1, so
    there are no dangling nodes and no global mass-redistribution term —
    the per-iteration state stays strictly node-local."""

    def _rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("dst"), "dst": t.column("src")})

    return edges.union(edges.map_batches(_rev, batch_format="pyarrow"))


def _code_edge_block(t: pa.Table, nodes):
    """One-time integer coding of an edge block against the global node
    order: (src_idx, dst_idx) int64 arrays. Runs once per block as a
    Ray task; every BSP round reuses the coded block from the object
    store (the loop-invariant work of a per-round index_in or an
    edges-x-deg join, hoisted)."""
    if t.num_rows == 0:
        return None
    import pyarrow.compute as pc

    src_idx = (
        pc.index_in(t.column("src"), value_set=nodes)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    dst_idx = (
        pc.index_in(t.column("dst"), value_set=nodes)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return src_idx, dst_idx


def _block_contrib_dense(coded, prs: np.ndarray, outdeg: np.ndarray):
    """One BSP round over one coded edge block: dense node-sized int64
    contribution partial (exact — np.add.at, no float accumulation).
    ``outdeg`` is the node-sized degree vector, shipped once per run."""
    if coded is None:
        return None
    src_idx, dst_idx = coded
    c = ((prs[src_idx] // outdeg[src_idx]) * DAMP_NUM) // DAMP_DEN
    acc = np.zeros(len(prs), dtype=np.int64)
    np.add.at(acc, dst_idx, c)
    return acc


#: below this node count the per-round rank table broadcasts (ray.put
#: once, vectorized index_in per edge block) instead of hash-joining —
#: the measured signature-attach gate precedent (BASELINE.md session-3:
#: broadcast beat the join's two operator spin-ups well past 100k rows).
#: Above it every round runs the distributed join.
BROADCAST_NODE_GATE = 2_000_000


def pagerank(
    pairs: Dataset,
    iterations: int = 5,
    num_partitions: int | None = None,
    broadcast_gate: int = BROADCAST_NODE_GATE,
) -> Dataset:
    """Exact fixed-point PageRank over the undirected graph induced by
    ``pairs`` (columns ``src``, ``dst``; duplicates allowed).

    Returns a node-sized Dataset ``(node: string, pr: int64)`` where
    ``pr`` is micro-rank after ``iterations`` synchronous updates:

        pr'[v] = (15 * SCALE) // (100 * N)
                 + Σ_{u -> v} ((pr[u] // outdeg[u]) * 85) // 100

    All-integer, so bit-exact regardless of partitioning — the DuckDB
    oracle replays the identical recurrence with ``//``.
    """
    np_ = num_partitions or hash_partitions(16)
    # materialize ONCE: both the degree derivation and the round loop
    # read the symmetrized distinct edges — a lazy `edges` re-executes
    # the distinct exchange per consumer (measured: it doubled the
    # pre-loop wall at sf0.1)
    edges = symmetrize(_distinct_edges(pairs, np_)).materialize()

    deg = edges.groupby("src", num_partitions=np_).aggregate(
        Count(alias_name="outdeg")
    )

    def _as_node(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t.column("src"), "outdeg": t.column("outdeg")}
        )

    deg = deg.map_batches(_as_node, batch_format="pyarrow").materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        return rd.from_arrow(_RANKS_SCHEMA.empty_table())
    base = (15 * SCALE) // (100 * n_nodes)
    r0 = SCALE // n_nodes

    if n_nodes <= broadcast_gate:
        # BSP rounds as RAW RAY TASKS — the documented Dataset-API
        # exception (SURVEY custom-operator rule (c)): under the gate
        # the rank AND degree vectors are node-sized driver state, and
        # the Dataset formulation re-spins a map op + a hash-aggregate
        # actor pool + a materialize barrier EVERY round (measured:
        # ~2.5 s/round of pure spin-up at sf0.1 — 20 rounds paid 50+ s
        # of the 65 s wall). Instead: code each edge block ONCE into
        # integer (src_idx, dst_idx) pairs held in the object store
        # (which also replaces the loop-invariant edges-x-deg join —
        # outdeg ships once as a node-sized vector), then each round is
        # one wave of pure-numpy tasks over the coded blocks plus an
        # exact int64 driver merge. Bit-exactness is unchanged —
        # integer partial sums commute, and the recurrence is evaluated
        # with the identical // arithmetic (pinned by the serial-replay
        # and broadcast-vs-join tests).
        #
        # Partitioning assumption: n_nodes <= broadcast_gate, so the
        # rank/degree vectors (8 B/node) and one dense per-block
        # partial fit comfortably in driver/worker heaps; the edge
        # relation itself stays block-partitioned in the object store.
        # Above the gate the distributed-join rounds below run instead.
        import ray as _ray

        deg_blocks = [
            b
            for b in (_ray.get(r) for r in deg.to_arrow_refs())
            if b.num_rows
        ]
        deg_tbl = pa.concat_tables(deg_blocks)
        nodes = deg_tbl.column("node").combine_chunks()
        outdeg_vec = (
            deg_tbl.column("outdeg")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        nodes_ref = _ray.put(nodes)
        od_ref = _ray.put(outdeg_vec)
        prep = _ray.remote(num_cpus=1)(_code_edge_block)
        step = _ray.remote(num_cpus=1)(_block_contrib_dense)
        coded = [
            prep.remote(blk, nodes_ref) for blk in edges.to_arrow_refs()
        ]

        prs = np.full(n_nodes, r0, dtype=np.int64)
        for _ in range(iterations):
            pr_ref = _ray.put(prs)
            acc = np.full(n_nodes, base, dtype=np.int64)
            pending = [step.remote(c, pr_ref, od_ref) for c in coded]
            while pending:
                done, pending = _ray.wait(
                    pending, num_returns=min(8, len(pending))
                )
                for part in _ray.get(done):
                    if part is not None:
                        acc += part
            prs = acc
        return rd.from_arrow(
            pa.table({"node": nodes, "pr": pa.array(prs, pa.int64())})
        )

    # edge-with-outdeg is loop-invariant: join it ONCE, reuse per round
    deg_c, _ = compact_nonempty(deg, np_)
    edges_c, _ = compact_nonempty(edges, np_)
    edges_deg = edges_c.join(
        deg_c,
        join_type="inner",
        num_partitions=np_,
        on=("src",),
        right_on=("node",),
    ).materialize()

    def _init(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "pr": pa.array(
                    np.full(t.num_rows, r0, dtype=np.int64), pa.int64()
                ),
            }
        )

    ranks = deg.map_batches(_init, batch_format="pyarrow").materialize()

    def _partial_sum(dst: pa.ChunkedArray | pa.Array, c: np.ndarray) -> pa.Table:
        """Combiner: per-block partial sum by dst BEFORE the exchange —
        the shuffle ships at most (distinct dst per block) rows instead
        of one row per edge (int sums commute, exactness unaffected)."""
        return (
            pa.table({"dst": dst, "contrib": pa.array(c, pa.int64())})
            .group_by("dst")
            .aggregate([("contrib", "sum")])
            .rename_columns(["dst", "contrib"])
        )

    def _contrib(t: pa.Table) -> pa.Table:
        pr = t.column("pr").to_numpy(zero_copy_only=False).astype(np.int64)
        od = t.column("outdeg").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        c = ((pr // od) * DAMP_NUM) // DAMP_DEN
        return _partial_sum(t.column("dst"), c)

    # post-symmetrize every node has in-degree >= 1, so the grouped
    # contribution sum covers EVERY node — no outer join back onto the
    # node table is needed; each round is exactly one keyed join plus
    # one grouped sum
    def _update(t: pa.Table) -> pa.Table:
        c = t.column("contrib").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "node": t.column("dst"),
                "pr": pa.array(base + c, pa.int64()),
            }
        )

    # Each round MUST materialize: chaining all rounds into one lazy
    # DAG spins every round's hash-shuffle aggregator pools at once
    # (5 joins + 5 aggregates x np_ actors), blowing the CPU budget and
    # deadlocking the streaming executor (measured — the verify-skill
    # gotcha). What CAN go per round is the compact: when nodes
    # outnumber partitions 100x, every keyed partition is non-empty for
    # all practical purposes, so the compact's extra count() execution
    # per round is pure overhead. Tiny graphs keep it — empty blocks
    # into a join are fatal (compact_nonempty contract).
    skip_compact = n_nodes >= 100 * np_

    for _ in range(iterations):
        if skip_compact:
            ranks_c = ranks
        else:
            ranks_c, _ = compact_nonempty(ranks, np_)
        ranks = (
            edges_deg.join(
                ranks_c,
                join_type="inner",
                num_partitions=np_,
                on=("src",),
                right_on=("node",),
            )
            .map_batches(_contrib, batch_format="pyarrow")
            .groupby("dst", num_partitions=np_)
            .aggregate(Sum("contrib", alias_name="contrib"))
            .map_batches(_update, batch_format="pyarrow")
            .materialize()
        )

    return ranks


def triangle_counts(
    edges: "Dataset",
    *,
    num_partitions: int = 8,
) -> "Dataset":
    """Per-node triangle participation counts over an undirected edge
    list — the classic distributed graph-analytics kernel beside
    PageRank (functions above) and connected components (dedupe.py
    label propagation). Input: (a, b) rows with a < b, distinct.

    Algorithm (the standard orientation trick, public literature —
    Suri & Vassilvitskii's MapReduce formulation): with every edge
    stored low<high, wedges enumerate as edges(a,b) JOIN edges(b,c) on
    the middle node, producing ordered triples a<b<c; a wedge closes
    iff (a,c) is an edge — ONE more distributed join against the edge
    table on the composite (a, c) key. Per-node counts emit 3 rows per
    closed triangle into a node-keyed aggregation. Exchanges: two
    joins + one grouped count; the wedge table is sum(deg^2)-sized —
    the documented partitioning assumption (degree-cap/salt the hub
    nodes before calling this at 100 TB; TPC-H-ish co-purchase graphs
    are bounded-degree)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    from barks_ocr_ray.context import hash_partitions
    from barks_ocr_ray.functions.relational import compact_nonempty

    edges_c, n_edges = compact_nonempty(edges, num_partitions)
    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "n_triangles": pa.array([], pa.int64()),
        }
    )
    if n_edges == 0:
        return rd.from_arrow(empty)

    # wedges: (a, b) x (b, c) -> a < b < c by the low<high invariant
    right = edges_c.map_batches(
        lambda t: t.rename_columns(["b", "c"]), batch_format="pyarrow"
    )
    wedges = edges_c.join(
        right,
        join_type="inner",
        num_partitions=hash_partitions(num_partitions),
        on=("b",),
    )
    wedges, n_wedges = compact_nonempty(wedges, num_partitions)
    if n_wedges == 0:
        return rd.from_arrow(empty)

    # close the wedge: (a, c) must be an edge
    closing = edges_c.map_batches(
        lambda t: t.rename_columns(["a", "c"]), batch_format="pyarrow"
    )
    tris = wedges.join(
        closing,
        join_type="inner",
        num_partitions=hash_partitions(num_partitions),
        on=("a", "c"),
    )

    def _emit_nodes(t: pa.Table) -> pa.Table:
        cols = [
            t.column("a").combine_chunks(),
            t.column("b").combine_chunks(),
            t.column("c").combine_chunks(),
        ]
        return pa.table({"node": pa.concat_arrays(cols)})

    return (
        tris.map_batches(_emit_nodes, batch_format="pyarrow")
        .groupby("node", num_partitions=hash_partitions(num_partitions))
        .aggregate(Count(alias_name="n_triangles"))
    )
