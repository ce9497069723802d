"""Contracts for the iterative fixed-point PageRank (q94 machinery):
bit-exact agreement with a serial numpy replay of the same recurrence,
duplicate-edge collapse, mass conservation bounds, and the typed-empty
path."""

import numpy as np
import pyarrow as pa


def _serial_pagerank(pairs, iterations):
    """Single-process replay of graph.pagerank's exact recurrence."""
    from barks_ocr_ray.functions.graph import DAMP_DEN, DAMP_NUM, SCALE

    directed = set(pairs)
    edges = directed | {(b, a) for a, b in directed}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = sorted(outdeg)
    n = len(nodes)
    base = (15 * SCALE) // (100 * n)
    pr = {v: SCALE // n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for s, d in edges:
            contrib[d] += ((pr[s] // outdeg[s]) * DAMP_NUM) // DAMP_DEN
        pr = {v: base + contrib[v] for v in nodes}
    return pr


PAIRS = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "d"),
    ("a", "b"),  # duplicate arc: must collapse to one edge
]


def test_pagerank_matches_serial_replay(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.graph import pagerank

    ds = rd.from_arrow(
        pa.table(
            {
                "src": [p[0] for p in PAIRS],
                "dst": [p[1] for p in PAIRS],
            }
        )
    )
    got = {
        r["node"]: r["pr"]
        for r in pagerank(ds, iterations=4, num_partitions=3).take_all()
    }
    assert got == _serial_pagerank(PAIRS, 4)


def test_pagerank_partition_independent(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.graph import pagerank

    t = pa.table(
        {
            "src": [f"n{i}" for i in range(30)],
            "dst": [f"n{(i * 7 + 3) % 30}" for i in range(30)],
        }
    )
    a = {
        r["node"]: r["pr"]
        for r in pagerank(rd.from_arrow(t), 3, num_partitions=2).take_all()
    }
    b = {
        r["node"]: r["pr"]
        for r in pagerank(
            rd.from_arrow(t).repartition(7), 3, num_partitions=5
        ).take_all()
    }
    assert a == b


def test_pagerank_mass_is_conserved_up_to_flooring(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.graph import SCALE, pagerank

    ds = rd.from_arrow(
        pa.table({"src": ["x", "y", "z"], "dst": ["y", "z", "x"]})
    )
    prs = [r["pr"] for r in pagerank(ds, iterations=6).take_all()]
    total = sum(prs)
    # every floor division loses < 1 micro-unit per node per round; the
    # total must stay within that deterministic envelope of SCALE
    assert SCALE - len(prs) * 6 * 2 <= total <= SCALE
    assert np.all(np.asarray(prs) > 0)


def test_pagerank_empty_input_is_typed_empty(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.graph import pagerank

    empty = pa.table(
        {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
    )
    out = pagerank(rd.from_arrow(empty), iterations=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "pr"}


def test_pagerank_broadcast_and_join_paths_agree(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.graph import pagerank

    t = pa.table(
        {
            "src": [f"n{i}" for i in range(40)],
            "dst": [f"n{(i * 11 + 5) % 40}" for i in range(40)],
        }
    )
    via_broadcast = {
        r["node"]: r["pr"]
        for r in pagerank(rd.from_arrow(t), 3, num_partitions=4).take_all()
    }
    # broadcast_gate=0 forces the distributed-join rounds
    via_join = {
        r["node"]: r["pr"]
        for r in pagerank(
            rd.from_arrow(t), 3, num_partitions=4, broadcast_gate=0
        ).take_all()
    }
    assert via_broadcast == via_join


def _serial_ppr(pairs, iterations, seed_prefix):
    """Single-process replay of the personalized recurrence."""
    from barks_ocr_ray.functions.graph import DAMP_DEN, DAMP_NUM, SCALE

    directed = set(pairs)
    edges = directed | {(b, a) for a, b in directed}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = sorted(outdeg)
    seeds = [v for v in nodes if v.startswith(seed_prefix)]
    nt = len(seeds)
    base = (15 * SCALE) // (100 * nt)
    pr = {v: (SCALE // nt if v in seeds else 0) for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for s, d in edges:
            contrib[d] += ((pr[s] // outdeg[s]) * DAMP_NUM) // DAMP_DEN
        pr = {
            v: (base if v in seeds else 0) + contrib[v] for v in nodes
        }
    return pr


PPR_PAIRS = [
    ("Ca", "Sx"),
    ("Ca", "Sy"),
    ("Cb", "Sy"),
    ("Cc", "Sz"),
    ("Ca", "Sx"),  # duplicate arc collapses
]


def test_personalized_pagerank_matches_serial_replay(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.graph import pagerank

    ds = rd.from_arrow(
        pa.table(
            {
                "src": [p[0] for p in PPR_PAIRS],
                "dst": [p[1] for p in PPR_PAIRS],
            }
        )
    )
    got = {
        r["node"]: r["pr"]
        for r in pagerank(
            ds, iterations=4, num_partitions=3, seed_prefix="C"
        ).take_all()
    }
    assert got == _serial_ppr(PPR_PAIRS, 4, "C")
    # non-seed nodes hold only propagated mass; seeds keep teleport mass
    assert all(got[n] > 0 for n in got)


def test_personalized_pagerank_paths_agree_and_empty_seed_set(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.graph import pagerank

    t = pa.table(
        {
            "src": [f"C{i}" if i % 2 else f"S{i}" for i in range(40)],
            "dst": [f"S{(i * 11 + 5) % 40}" for i in range(40)],
        }
    )
    via_broadcast = {
        r["node"]: r["pr"]
        for r in pagerank(
            rd.from_arrow(t), 3, num_partitions=4, seed_prefix="C"
        ).take_all()
    }
    via_join = {
        r["node"]: r["pr"]
        for r in pagerank(
            rd.from_arrow(t),
            3,
            num_partitions=4,
            broadcast_gate=0,
            seed_prefix="C",
        ).take_all()
    }
    assert via_broadcast == via_join
    # a prefix matching no node: typed-empty result, no division by zero
    out = pagerank(rd.from_arrow(t), 2, seed_prefix="ZZZ")
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "pr"}


def test_kcore_peeling_cascades_and_paths_agree(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.graph import kcore_membership

    # K4 clique (a,b,c,d) = the 3-core; x hangs off a with a chain that
    # gives x initial degree 1; y-z-w triangle has max degree 2 -> all
    # peeled. e touches three clique members BUT only them (deg 3);
    # e survives round 1, and stays (its neighbors are core).
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"),
        ("a", "x"),
        ("y", "z"), ("z", "w"), ("w", "y"),
        ("e", "a"), ("e", "b"), ("e", "c"),
    ]
    t = pa.table(
        {"src": [p[0] for p in pairs], "dst": [p[1] for p in pairs]}
    )
    got = sorted(
        r["node"]
        for r in kcore_membership(rd.from_arrow(t), k=3, rounds=8).take_all()
    )
    assert got == ["a", "b", "c", "d", "e"]
    via_join = sorted(
        r["node"]
        for r in kcore_membership(
            rd.from_arrow(t), k=3, rounds=8, broadcast_gate=0
        ).take_all()
    )
    assert via_join == got
    # k above the max degree: everything peels, typed empty
    none = kcore_membership(rd.from_arrow(t), k=10, rounds=4)
    assert none.count() == 0
