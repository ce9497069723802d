"""Round-5 operator tests.

Covers the VERDICT r4 follow-ups: the hub-safe exact triangle counting
(degree-ordering orientation — the wedge table must stay bounded on a
one-hot-hub graph), plus later r5 additions.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd


class TestHubSafeTriangles:
    def _star_with_triangles(self, n_leaves: int = 400):
        # hub 0 — leaves 1..n; every consecutive leaf pair (2k-1, 2k)
        # is also an edge, closing a triangle with the hub
        a, b = [], []
        for i in range(1, n_leaves + 1):
            a.append(0)
            b.append(i)
        for k in range(1, n_leaves // 2 + 1):
            a.append(2 * k - 1)
            b.append(2 * k)
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
        )

    def test_orientation_kills_the_hub(self):
        """After degree-rank orientation the deg-400 hub has OUT-degree
        0, so sum(outdeg^2) — the wedge-table size — stays O(|E|)
        instead of the sum(deg^2) ~ 160k blow-up of mid-node wedge
        enumeration. This is the bound VERDICT r4 asked to pin."""
        from barks_ocr_ray.functions.graph import orient_by_degree

        edges_t = self._star_with_triangles(400)
        n_edges = edges_t.num_rows
        out = orient_by_degree(rd.from_arrow(edges_t)).to_pandas()
        assert len(out) == n_edges  # one oriented row per edge
        outdeg = out.groupby("src").size()
        assert outdeg.get(0, 0) == 0  # the hub is never an apex
        wedge_bound = int((outdeg**2).sum())
        naive = int(
            (
                out[["src", "dst"]]
                .melt()["value"]
                .value_counts()
                ** 2
            ).sum()
        )
        assert wedge_bound <= 10 * n_edges  # linear, not quadratic
        assert naive > 150_000  # the blow-up the orientation avoids

    def test_counts_exact_on_hub_graph(self):
        from barks_ocr_ray.functions.graph import triangle_counts

        edges_t = self._star_with_triangles(100)
        out = (
            triangle_counts(rd.from_arrow(edges_t))
            .to_pandas()
            .set_index("node")["n_triangles"]
        )
        # 50 leaf-pair edges, each closing one triangle with the hub
        assert out[0] == 50
        assert len(out) == 101  # hub + all 100 leaves
        assert (out.drop(0) == 1).all()

    def test_degree_ties_handled(self):
        from barks_ocr_ray.functions.graph import triangle_counts

        # K4: every node degree 3 — orientation falls back to id
        # order; 4 triangles, each node in 3
        edges_t = pa.table(
            {
                "a": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                "b": pa.array([2, 3, 4, 3, 4, 4], pa.int64()),
            }
        )
        out = (
            triangle_counts(rd.from_arrow(edges_t))
            .to_pandas()
            .set_index("node")["n_triangles"]
        )
        assert len(out) == 4 and (out == 3).all()
