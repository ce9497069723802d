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
import pyarrow.compute as pc
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
    seed_prefix: str | None = None,
) -> Dataset:
    """Exact fixed-point PageRank over the undirected graph induced by
    ``pairs`` (columns ``src``, ``dst``; duplicates allowed).

    Returns a node-sized Dataset ``(node: string, pr: int64)`` where
    ``pr`` is micro-rank after ``iterations`` synchronous updates:

        pr'[v] = (v teleportable ? (15 * SCALE) // (100 * N_t) : 0)
                 + Σ_{u -> v} ((pr[u] // outdeg[u]) * 85) // 100

    With ``seed_prefix=None`` every node is teleportable (N_t = N:
    classic PageRank). With a prefix, only nodes whose id starts with
    it receive teleport mass and initial rank (N_t = seed count) —
    personalized PageRank with a uniform seed-set teleport vector
    (Haveliwala's topic-sensitive formulation; the prefix predicate
    keeps the seed set replayable in SQL as a LIKE, never a broadcast
    membership set). All-integer, so bit-exact regardless of
    partitioning — the DuckDB oracle replays the identical recurrence
    with ``//``.
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
    if seed_prefix is None:
        n_tele = n_nodes
    else:
        n_tele = (
            deg.map_batches(
                lambda t: pa.table(
                    {
                        "s": pc.cast(
                            pc.starts_with(t.column("node"), seed_prefix),
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            ).sum("s")
            or 0
        )
        if n_tele == 0:
            return rd.from_arrow(_RANKS_SCHEMA.empty_table())
    base = (15 * SCALE) // (100 * n_tele)
    r0 = SCALE // n_tele

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

        if seed_prefix is None:
            tele_mask = np.ones(n_nodes, dtype=bool)
        else:
            tele_mask = pc.starts_with(nodes, seed_prefix).to_numpy(
                zero_copy_only=False
            )
        prs = np.where(tele_mask, r0, 0).astype(np.int64)
        for _ in range(iterations):
            pr_ref = _ray.put(prs)
            acc = np.where(tele_mask, base, 0).astype(np.int64)
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
        if seed_prefix is None:
            v = np.full(t.num_rows, r0, dtype=np.int64)
        else:
            m = pc.starts_with(t.column("node"), seed_prefix).to_numpy(
                zero_copy_only=False
            )
            v = np.where(m, r0, 0).astype(np.int64)
        return pa.table(
            {
                "node": t.column("node"),
                "pr": pa.array(v, pa.int64()),
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
        if seed_prefix is None:
            b = base
        else:
            m = pc.starts_with(t.column("dst"), seed_prefix).to_numpy(
                zero_copy_only=False
            )
            b = np.where(m, base, 0).astype(np.int64)
        return pa.table(
            {
                "node": t.column("dst"),
                "pr": pa.array(b + c, pa.int64()),
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


def _block_core_contrib(coded, mask: np.ndarray):
    """One peeling round over one coded edge block: per-node count of
    arcs whose BOTH endpoints are still members."""
    if coded is None:
        return None
    src_idx, dst_idx = coded
    sel = mask[src_idx] & mask[dst_idx]
    acc = np.zeros(len(mask), dtype=np.int64)
    np.add.at(acc, src_idx[sel], 1)
    return acc


def kcore_membership(
    pairs: Dataset,
    k: int = 3,
    rounds: int = 8,
    num_partitions: int | None = None,
    broadcast_gate: int = BROADCAST_NODE_GATE,
) -> Dataset:
    """Members of the k-core after ``rounds`` synchronous peeling
    sweeps over the undirected graph induced by ``pairs`` (columns
    ``src``/``dst``): each round keeps exactly the nodes with >= k
    still-member neighbors (Matula & Beck's peeling, run as fixed-round
    BSP so the DuckDB oracle can replay it as unrolled CTEs; converged
    rounds are idempotent, so early convergence and the fixed unroll
    agree). Same two execution regimes as ``pagerank``: under the
    node-count gate, rounds are raw task waves over coded edge blocks
    with a node-sized bool mask; above it, each round is two
    membership semi-joins + one grouped count, all node-/edge-sized."""
    np_ = num_partitions or hash_partitions(16)
    edges = symmetrize(_distinct_edges(pairs, np_)).materialize()
    deg = edges.groupby("src", num_partitions=np_).aggregate(
        Count(alias_name="outdeg")
    )

    def _as_node(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("src")})

    members = deg.map_batches(_as_node, batch_format="pyarrow").materialize()
    n_nodes = members.count()
    empty = pa.table({"node": pa.array([], pa.string())})
    if n_nodes == 0:
        return rd.from_arrow(empty)

    if n_nodes <= broadcast_gate:
        import ray as _ray

        node_blocks = [
            b
            for b in (_ray.get(r) for r in members.to_arrow_refs())
            if b.num_rows
        ]
        nodes = pa.concat_tables(node_blocks).column("node").combine_chunks()
        nodes_ref = _ray.put(nodes)
        prep = _ray.remote(num_cpus=1)(_code_edge_block)
        step = _ray.remote(num_cpus=1)(_block_core_contrib)
        coded = [
            prep.remote(blk, nodes_ref) for blk in edges.to_arrow_refs()
        ]
        mask = np.ones(n_nodes, dtype=bool)
        for _ in range(rounds):
            mask_ref = _ray.put(mask)
            acc = np.zeros(n_nodes, dtype=np.int64)
            pending = [step.remote(c, mask_ref) for c in coded]
            while pending:
                done, pending = _ray.wait(
                    pending, num_returns=min(8, len(pending))
                )
                for part in _ray.get(done):
                    if part is not None:
                        acc += part
            new_mask = acc >= k
            if np.array_equal(new_mask, mask):
                break  # converged: further rounds are idempotent
            mask = new_mask
        keep = pa.array(np.flatnonzero(mask), pa.int64())
        out = nodes.take(keep)
        return rd.from_arrow(pa.table({"node": out}))

    # distributed rounds: two membership semi-joins + one grouped count
    cur = members
    for _ in range(rounds):
        cur_c, n_cur = compact_nonempty(cur, np_)
        if n_cur == 0:
            return rd.from_arrow(empty)
        edges_c, _ = compact_nonempty(edges, np_)
        e1 = edges_c.join(
            cur_c,
            join_type="inner",
            num_partitions=np_,
            on=("src",),
            right_on=("node",),
        )
        e1_c, n_e1 = compact_nonempty(e1, np_)
        if n_e1 == 0:
            return rd.from_arrow(empty)
        cur2 = cur_c.map_batches(
            lambda t: pa.table({"node2": t.column("node")}),
            batch_format="pyarrow",
        )
        cur2_c, _ = compact_nonempty(cur2, np_)
        e2 = e1_c.join(
            cur2_c,
            join_type="inner",
            num_partitions=np_,
            on=("dst",),
            right_on=("node2",),
        )
        counts = e2.groupby("src", num_partitions=np_).aggregate(
            Count(alias_name="d")
        )

        def _keep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            t = t.filter(
                _pc.greater_equal(t.column("d"), pa.scalar(k, pa.int64()))
            )
            return pa.table({"node": t.column("src")})

        cur = counts.map_batches(_keep, batch_format="pyarrow").materialize()
    return cur


def orient_by_degree(
    edges: "Dataset",
    *,
    num_partitions: int = 8,
) -> "Dataset":
    """Orient an undirected distinct edge list (a, b) [a < b] by the
    DEGREE rank r(u) = (deg(u), u): each edge emits exactly one row
    (src, dst, dd) with r(src) < r(dst), dd = deg(dst). This is the
    hub-killing preprocessing of the classic exact triangle-counting
    algorithms (compact-forward, Latapy 2008; Suri & Vassilvitskii's
    'curse of the last reducer', WWW 2011): after orientation a node's
    OUT-degree is bounded by the number of neighbours of >= its own
    degree, so a degree-d hub has out-degree O(|E|/d) — on any graph
    sum(outdeg^2) <= O(|E|^1.5) (arboricity bound), vs the
    sum(deg^2) wedge blow-up of naive low<high orientation.

    Distributed shape: one node-keyed grouped count (degrees) + two
    node-keyed joins to attach (deg_a, deg_b) — every exchange is
    node- or edge-sized; no driver state, no broadcast."""
    deg_np = hash_partitions(num_partitions)
    edges_c, n_edges = compact_nonempty(edges, num_partitions)
    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "dd": pa.array([], pa.int64()),
        }
    )
    if n_edges == 0:
        return rd.from_arrow(empty)

    def _endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        t.column("a").combine_chunks().cast(pa.int64()),
                        t.column("b").combine_chunks().cast(pa.int64()),
                    ]
                )
            }
        )

    deg = (
        edges_c.map_batches(_endpoints, batch_format="pyarrow")
        .groupby("node", num_partitions=deg_np)
        .aggregate(Count(alias_name="deg"))
    )
    deg_a = deg.map_batches(
        lambda t: t.rename_columns(["a", "da"]), batch_format="pyarrow"
    )
    deg_b = deg.map_batches(
        lambda t: t.rename_columns(["b", "db"]), batch_format="pyarrow"
    )
    deg_a, _ = compact_nonempty(deg_a, num_partitions)
    deg_b, _ = compact_nonempty(deg_b, num_partitions)
    with_da = edges_c.join(
        deg_a, join_type="inner", num_partitions=deg_np, on=("a",)
    )
    with_da, _ = compact_nonempty(with_da, num_partitions)
    with_deg = with_da.join(
        deg_b, join_type="inner", num_partitions=deg_np, on=("b",)
    )

    def _orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("db").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        dd = np.where(a_first, db, da)
        return pa.table(
            {
                "src": pa.array(src.astype(np.int64), pa.int64()),
                "dst": pa.array(dst.astype(np.int64), pa.int64()),
                "dd": pa.array(dd.astype(np.int64), pa.int64()),
            }
        )

    return with_deg.map_batches(_orient, batch_format="pyarrow")


def triangle_counts(
    edges: "Dataset",
    *,
    num_partitions: int = 8,
) -> "Dataset":
    """Per-node triangle participation counts over an undirected edge
    list — the classic distributed graph-analytics kernel beside
    PageRank (functions above) and connected components (dedupe.py
    label propagation). Input: (a, b) rows with a < b, distinct.
    EXACT — no degree cap, no sampling.

    Algorithm: degree-ordering orientation (orient_by_degree above —
    compact-forward / Suri & Vassilvitskii), then wedges enumerate
    ONLY at each triangle's minimum-rank apex: oriented edges
    (u→v) self-join on u give candidate pairs {v, w} with
    r(v) < r(w), and a wedge closes iff the oriented edge v→w
    exists — one more distributed join on the composite (v, w) key.
    Because every wedge is charged to its min-degree apex, a degree-d
    hub contributes 0 wedges as apex (all its edges point INTO it),
    so the wedge table is sum(outdeg^2) <= O(|E|^1.5) on ANY graph —
    skewed web graphs included — instead of the sum(deg^2) blow-up of
    mid-node wedge joins. tests/test_r5_operators.py pins the bound
    on a one-hot-hub fixture. Exchanges: degree count + 2 orientation
    joins + wedge join + closing join + one grouped count, all
    node-/edge-/wedge-keyed; no driver state."""
    edges_c, n_edges = compact_nonempty(edges, num_partitions)
    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "n_triangles": pa.array([], pa.int64()),
        }
    )
    if n_edges == 0:
        return rd.from_arrow(empty)

    oriented = orient_by_degree(edges_c, num_partitions=num_partitions)
    oriented = oriented.materialize()  # read by wedge AND closing joins

    np_ = hash_partitions(num_partitions)
    left = oriented.map_batches(
        lambda t: t.rename_columns(["u", "v", "dv"]), batch_format="pyarrow"
    )
    right = oriented.map_batches(
        lambda t: t.rename_columns(["u", "w", "dw"]), batch_format="pyarrow"
    )
    left, n_l = compact_nonempty(left, num_partitions)
    right, _ = compact_nonempty(right, num_partitions)
    if n_l == 0:
        return rd.from_arrow(empty)
    wedges = left.join(
        right, join_type="inner", num_partitions=np_, on=("u",)
    )

    def _order_pairs(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        dv = t.column("dv").to_numpy(zero_copy_only=False)
        dw = t.column("dw").to_numpy(zero_copy_only=False)
        keep = (dv < dw) | ((dv == dw) & (v < w))
        u = t.column("u").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "u": pa.array(u.astype(np.int64), pa.int64()),
                "v": pa.array(v[keep].astype(np.int64), pa.int64()),
                "w": pa.array(w[keep].astype(np.int64), pa.int64()),
            }
        )

    cand = wedges.map_batches(_order_pairs, batch_format="pyarrow")
    cand, n_cand = compact_nonempty(cand, num_partitions)
    if n_cand == 0:
        return rd.from_arrow(empty)

    # close the wedge: the oriented edge v→w must exist (r(v) < r(w)
    # by construction, so {v, w} present implies that orientation)
    closing = oriented.map_batches(
        lambda t: t.select(["src", "dst"]).rename_columns(["v", "w"]),
        batch_format="pyarrow",
    )
    closing, _ = compact_nonempty(closing, num_partitions)
    tris = cand.join(
        closing, join_type="inner", num_partitions=np_, on=("v", "w")
    )

    def _emit_nodes(t: pa.Table) -> pa.Table:
        cols = [
            t.column("u").combine_chunks(),
            t.column("v").combine_chunks(),
            t.column("w").combine_chunks(),
        ]
        return pa.table({"node": pa.concat_arrays(cols)})

    return (
        tris.map_batches(_emit_nodes, batch_format="pyarrow")
        .groupby("node", num_partitions=np_)
        .aggregate(Count(alias_name="n_triangles"))
    )


# ---------------------------------------------------------------------------
# HITS (hubs & authorities) — exact fixed point
# ---------------------------------------------------------------------------

#: HITS fixed-point scale. Deliberately 10^9 (not PageRank's 10^12):
#: the L1-renormalized vectors keep every score <= ~SCALE, so the
#: largest intermediate is sum_v a_raw[v] = sum_u outdeg(u)*h(u)
#: <= max_outdeg * SCALE — int64-safe to ~10^9-edge hubs at this scale.
HITS_SCALE = 10**9

_HITS_SCHEMA = pa.schema(
    [("node", pa.string()), ("hub", pa.int64()), ("auth", pa.int64())]
)


def _hits_norm(raw: np.ndarray) -> np.ndarray:
    """The L1 renormalization both engines replay verbatim: divide by
    D = max(1, floor(sum/SCALE)) so the vector's mass returns to
    ~SCALE. Integer throughout — the scalar sum is exact under any
    partial order, the flooring division is a single scalar op."""
    d = max(1, int(raw.sum()) // HITS_SCALE)
    return raw // d


def _block_gather_sum(coded, vec: np.ndarray, forward: bool):
    """One HITS half-round over one coded edge block: dense node-sized
    int64 partial. forward=True sums h over in-edges (auth update,
    acc[dst] += vec[src]); forward=False sums a over out-edges (hub
    update, acc[src] += vec[dst])."""
    if coded is None:
        return None
    src_idx, dst_idx = coded
    acc = np.zeros(len(vec), dtype=np.int64)
    if forward:
        np.add.at(acc, dst_idx, vec[src_idx])
    else:
        np.add.at(acc, src_idx, vec[dst_idx])
    return acc


def hits(
    pairs: Dataset,
    iterations: int = 5,
    num_partitions: int | None = None,
    broadcast_gate: int = BROADCAST_NODE_GATE,
) -> Dataset:
    """Exact fixed-point HITS (Kleinberg hubs & authorities, public
    literature) over the DIRECTED graph induced by ``pairs`` (columns
    ``src``, ``dst``; duplicates collapse). Returns a node-sized
    Dataset ``(node: string, hub: int64, auth: int64)``.

    Recurrence, replayed verbatim by the sequential golden (all-integer
    so the distributed sums are bit-exact under any partitioning):

        h0[v]    = SCALE // n                          (all nodes)
        a_raw[v] = Σ_{u→v} h[u];  a = a_raw // max(1, Σa_raw // SCALE)
        h_raw[u] = Σ_{u→v} a[v];  h = h_raw // max(1, Σh_raw // SCALE)

    The L1 renormalization keeps every score <= ~SCALE so int64 never
    overflows (see HITS_SCALE). Same two-regime execution as
    ``pagerank``: under the node gate, BSP raw-task waves over coded
    edge blocks (one wave per half-round) with an exact driver merge;
    above it, per-round distributed join + grouped-sum passes with
    only node-sized tables materialized between rounds."""
    np_ = num_partitions or hash_partitions(16)
    edges = _distinct_edges(pairs, np_).materialize()

    def _node_col(col):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column(col)})

        return _f

    nodes_ds = (
        edges.map_batches(_node_col("src"), batch_format="pyarrow")
        .union(edges.map_batches(_node_col("dst"), batch_format="pyarrow"))
        .groupby("node", num_partitions=np_)
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow"
        )
        .materialize()
    )
    n_nodes = nodes_ds.count()
    if n_nodes == 0:
        return rd.from_arrow(_HITS_SCHEMA.empty_table())
    h0 = HITS_SCALE // n_nodes

    if n_nodes <= broadcast_gate:
        # BSP raw-task regime (q94 rationale: a Dataset round pays
        # ~2.5 s of operator spin-up; HITS pays it TWICE per round).
        # Edge blocks are integer-coded once; each half-round is one
        # task wave + an exact int64 driver merge + the scalar
        # renormalization.
        import ray as _ray

        node_blocks = [
            b
            for b in (_ray.get(r) for r in nodes_ds.to_arrow_refs())
            if b.num_rows
        ]
        nodes = pa.concat_tables(node_blocks).column("node").combine_chunks()
        nodes_ref = _ray.put(nodes)
        prep = _ray.remote(num_cpus=1)(_code_edge_block)
        step = _ray.remote(num_cpus=1)(_block_gather_sum)
        coded = [
            prep.remote(blk, nodes_ref) for blk in edges.to_arrow_refs()
        ]

        def _wave(vec: np.ndarray, forward: bool) -> np.ndarray:
            vec_ref = _ray.put(vec)
            acc = np.zeros(n_nodes, dtype=np.int64)
            pending = [step.remote(c, vec_ref, forward) for c in coded]
            while pending:
                done, pending = _ray.wait(
                    pending, num_returns=min(8, len(pending))
                )
                for part in _ray.get(done):
                    if part is not None:
                        acc += part
            return acc

        h = np.full(n_nodes, h0, dtype=np.int64)
        a = np.zeros(n_nodes, dtype=np.int64)
        for _ in range(iterations):
            a = _hits_norm(_wave(h, forward=True))
            h = _hits_norm(_wave(a, forward=False))
        return rd.from_arrow(
            pa.table(
                {
                    "node": nodes,
                    "hub": pa.array(h, pa.int64()),
                    "auth": pa.array(a, pa.int64()),
                }
            )
        )

    # Distributed regime: per half-round one edge-sized join + one
    # node-keyed grouped sum (per-block combiner partials), then the
    # scalar renormalization — only node-sized tables persist between
    # rounds. Nodes absent from a half-round's inner join have raw 0
    # and stay absent until the final zero-filled assembly.
    edges_c, _ = compact_nonempty(edges, np_)

    def _init(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "s": pa.array(
                    np.full(t.num_rows, h0, dtype=np.int64), pa.int64()
                ),
            }
        )

    h_ds = nodes_ds.map_batches(_init, batch_format="pyarrow").materialize()

    def _half_round(vec_ds: Dataset, join_on: str, emit: str) -> Dataset:
        vec_c, n_vec = compact_nonempty(vec_ds, np_)
        if n_vec == 0:
            return rd.from_arrow(
                pa.schema([("node", pa.string()), ("s", pa.int64())])
                .empty_table()
            )

        def _partial(t: pa.Table) -> pa.Table:
            return (
                pa.table(
                    {"node": t.column(emit), "s": t.column("s")}
                )
                .group_by("node")
                .aggregate([("s", "sum")])
                .rename_columns(["node", "s"])
            )

        raw = (
            edges_c.join(
                vec_c,
                join_type="inner",
                num_partitions=np_,
                on=(join_on,),
                right_on=("node",),
            )
            .map_batches(_partial, batch_format="pyarrow")
            .groupby("node", num_partitions=np_)
            .aggregate(Sum("s", alias_name="s"))
            .materialize()
        )
        total = raw.sum("s") or 0
        d = max(1, int(total) // HITS_SCALE)

        def _norm(t: pa.Table) -> pa.Table:
            s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"node": t.column("node"), "s": pa.array(s // d, pa.int64())}
            )

        return raw.map_batches(_norm, batch_format="pyarrow").materialize()

    a_ds = rd.from_arrow(
        pa.schema([("node", pa.string()), ("s", pa.int64())]).empty_table()
    )
    for _ in range(iterations):
        a_ds = _half_round(h_ds, "src", "dst")
        h_ds = _half_round(a_ds, "dst", "src")

    # zero-filled assembly without an outer join: union (node, hub, 0),
    # (node, 0, auth), (node, 0, 0) and sum — each node appears once
    # per branch at most, so Sum == coalesce
    def _as3(hub_col: bool):
        def _f(t: pa.Table) -> pa.Table:
            z = pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64())
            s = t.column("s") if "s" in t.column_names else z
            return pa.table(
                {
                    "node": t.column("node"),
                    "hub": s if hub_col else z,
                    "auth": z if hub_col else s,
                }
            )

        return _f

    def _nodes3(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64())
        return pa.table({"node": t.column("node"), "hub": z, "auth": z})

    return (
        h_ds.map_batches(_as3(True), batch_format="pyarrow")
        .union(a_ds.map_batches(_as3(False), batch_format="pyarrow"))
        .union(nodes_ds.map_batches(_nodes3, batch_format="pyarrow"))
        .groupby("node", num_partitions=np_)
        .aggregate(
            Sum("hub", alias_name="hub"), Sum("auth", alias_name="auth")
        )
    )


def _block_frontier_reach(coded, frontier_ref):
    """One BFS wave over a coded edge block: dst indices reachable from
    the boolean frontier (pure numpy; runs as a Ray task)."""
    if coded is None:
        return None
    src_idx, dst_idx = coded
    hit = frontier_ref[src_idx]
    if not hit.any():
        return None
    return np.unique(dst_idx[hit])


def bfs_hops(
    pairs: Dataset,
    source,
    *,
    max_hops: int = 20,
    num_partitions: int | None = None,
    broadcast_gate: int = BROADCAST_NODE_GATE,
) -> "pa.Table":
    """Single-source BFS hop distances over the undirected graph of
    ``pairs`` (src, dst; duplicates allowed) — the traversal kernel the
    graph shelf was missing beside PageRank/HITS/PPR/k-core/CC/
    triangles. Exact min-hop per reached node, capped at ``max_hops``
    (mirrored in the recursive-CTE oracle).

    Distributed shape (the q94/q126 BSP discipline): the symmetrized
    distinct edge relation is coded ONCE into integer block pairs in
    the object store; each wave is one round of pure-numpy tasks over
    the coded blocks plus a node-sized boolean merge on the driver —
    rounds = eccentricity(source), not corpus passes. Partitioning
    assumption: n_nodes <= broadcast_gate so the dist/frontier vectors
    (1-8 B/node) fit driver/worker heaps; above the gate, per-round
    Dataset semi-joins run instead (frontier joined against the edge
    relation — node-keyed exchanges, no driver vectors)."""
    import ray as _ray

    np_ = num_partitions or hash_partitions(8)
    edges = symmetrize(_distinct_edges(pairs, np_)).materialize()
    deg = (
        edges.groupby("src", num_partitions=np_)
        .aggregate(Count(alias_name="_d"))
        .materialize()
    )
    n_nodes = deg.count()
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "hops": pa.array([], pa.int64())}
    )
    if n_nodes == 0:
        return empty

    if n_nodes <= broadcast_gate:
        blocks = [
            b
            for b in (_ray.get(r) for r in deg.to_arrow_refs())
            if b.num_rows
        ]
        nodes_tbl = pa.concat_tables(blocks)
        nodes = pc.cast(
            nodes_tbl.column("src").combine_chunks(), pa.int64()
        )
        node_np = nodes.to_numpy(zero_copy_only=False)
        pos = {int(v): i for i, v in enumerate(node_np)}
        if int(source) not in pos:
            # isolated source: by convention just itself at hop 0
            return pa.table(
                {
                    "node": pa.array([int(source)], pa.int64()),
                    "hops": pa.array([0], pa.int64()),
                }
            )
        prep = _ray.remote(num_cpus=1)(_code_edge_block)
        wave = _ray.remote(num_cpus=1)(_block_frontier_reach)
        nodes_ref = _ray.put(nodes)
        coded = [
            prep.remote(blk, nodes_ref) for blk in edges.to_arrow_refs()
        ]
        dist = np.full(n_nodes, -1, dtype=np.int64)
        frontier = np.zeros(n_nodes, dtype=bool)
        frontier[pos[int(source)]] = True
        dist[pos[int(source)]] = 0
        for d in range(1, max_hops + 1):
            f_ref = _ray.put(frontier)
            reached = np.zeros(n_nodes, dtype=bool)
            pending = [wave.remote(c, f_ref) for c in coded]
            while pending:
                done, pending = _ray.wait(
                    pending, num_returns=min(8, len(pending))
                )
                for part in _ray.get(done):
                    if part is not None:
                        reached[part] = True
            new = reached & (dist < 0)
            if not new.any():
                break
            dist[new] = d
            frontier = new
        keep = dist >= 0
        order = np.argsort(node_np[keep])
        return pa.table(
            {
                "node": pa.array(node_np[keep][order], pa.int64()),
                "hops": pa.array(dist[keep][order], pa.int64()),
            }
        )

    # above the gate: per-round Dataset semi-joins, no driver vectors
    from barks_ocr_ray.functions.relational import compact_nonempty

    dist = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([int(source)], pa.int64()),
                "hops": pa.array([0], pa.int64()),
            }
        )
    ).materialize()
    frontier = dist
    for d in range(1, max_hops + 1):
        f_c, n_f = compact_nonempty(
            frontier.map_batches(
                lambda t: t.select(["node"]).rename_columns(["src"]),
                batch_format="pyarrow",
            ),
            8,
        )
        if n_f == 0:
            break
        reach = (
            edges.join(
                f_c,
                join_type="inner",
                num_partitions=np_,
                on=("src",),
            )
            .groupby("dst", num_partitions=np_)
            .aggregate(Count(alias_name="_c"))
            .map_batches(
                lambda t: pa.table(
                    {"node": pc.cast(t.column("dst"), pa.int64())}
                ),
                batch_format="pyarrow",
            )
        )
        reach_c, n_r = compact_nonempty(reach, 8)
        if n_r == 0:
            break
        dist_c, _ = compact_nonempty(dist, 8)
        new = reach_c.join(
            dist_c,
            join_type="left_outer",
            num_partitions=np_,
            on=("node",),
        ).map_batches(
            lambda t: t.filter(pc.is_null(t.column("hops"))),
            batch_format="pyarrow",
        )
        new = new.map_batches(
            lambda t, _d=d: pa.table(
                {
                    "node": t.column("node"),
                    "hops": pa.array([_d] * t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        new_c, n_new = compact_nonempty(new, 8)
        if n_new == 0:
            break
        dist = dist.union(new_c).materialize()
        frontier = new_c
    return pa.concat_tables(
        [
            b
            for b in (_ray.get(r) for r in dist.to_arrow_refs())
            if b.num_rows
        ]
    ).sort_by([("node", "ascending")])
