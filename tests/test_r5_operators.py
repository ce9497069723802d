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


class TestRealCodecs:
    """Round-5 real decode boundary: pure-Python PNG/BMP/netpbm codecs
    (functions/codecs.py) replace the r4 NotImplementedError stub for
    formats the public specs + stdlib zlib can decode."""

    def test_roundtrip_all_formats(self):
        from barks_ocr_ray.datagen import media_image_array, media_record
        from barks_ocr_ray.functions.codecs import decode_media

        for i in range(9):  # 3 of each format
            arr = media_image_array(i)
            dec = decode_media(media_record(i)["media"])
            assert dec.shape == arr.shape
            assert (dec == arr).all()

    def test_png_all_filter_types(self):
        from barks_ocr_ray.datagen import media_image_array
        from barks_ocr_ray.functions.codecs import decode_png, encode_png

        arr = media_image_array(7)
        for f in range(5):  # None/Sub/Up/Average/Paeth defilters
            assert (decode_png(encode_png(arr, f)) == arr).all()

    def test_gray_and_topdown_variants(self):
        import numpy as np

        from barks_ocr_ray.datagen import media_image_array
        from barks_ocr_ray.functions.codecs import decode_bmp, decode_pnm

        arr = media_image_array(4)
        h, w = arr.shape[:2]
        g = arr[:, :, 0]
        p5 = b"P5\n%d %d\n255\n" % (w, h) + g.tobytes()
        d = decode_pnm(p5)
        assert (d[:, :, 0] == g).all() and (d[:, :, 2] == g).all()
        # ascii P3
        p3 = ("P3\n%d %d\n255\n" % (w, h)).encode() + " ".join(
            str(v) for v in arr.reshape(-1)
        ).encode()
        assert (decode_pnm(p3) == arr).all()
        # top-down BMP (negative height), hand-built
        import struct

        row = w * 3
        pad = (-row) % 4
        body = b"".join(
            arr[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h)
        )
        hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(body), 0, 0, 0, 0
        )
        assert (decode_bmp(hdr + info + body) == arr).all()
        assert isinstance(np.asarray(arr), np.ndarray)

    def test_library_formats_still_stub(self):
        import pytest

        from barks_ocr_ray.functions.codecs import decode_media, sniff_media

        assert sniff_media(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
        with pytest.raises(NotImplementedError):
            decode_media(b"\xff\xd8\xff\xe0JFIF")
        with pytest.raises(NotImplementedError):
            decode_media(b"RIFF\x00\x00\x00\x00WEBPVP8 ")

    def test_real_pipeline_stages(self):
        """media_features / media_resize / frame_sample with
        fake_decode=False over the media corpus: widths/heights are the
        DECODED dims, thumbnails are real pixels."""
        from barks_ocr_ray.datagen import media_image_array, media_table
        from barks_ocr_ray.functions.codecs import (
            media_feature_vector,
            resize_nearest,
            thumb_digest,
        )
        from barks_ocr_ray.functions.multimodal import (
            media_features,
            media_resize,
        )

        pages = rd.from_arrow(media_table(12))
        feats = (
            media_features(pages, payload_col="media", fake_decode=False)
            .to_pandas()
            .set_index("url")
        )
        rs = (
            media_resize(pages, payload_col="media", fake_decode=False)
            .to_pandas()
            .set_index("url")
        )
        for i in (0, 1, 2, 11):
            arr = media_image_array(i)
            h, w = arr.shape[:2]
            url = media_table(12).column("url")[i].as_py()
            assert (feats.loc[url, "width"], feats.loc[url, "height"]) == (
                w,
                h,
            )
            assert np.allclose(
                feats.loc[url, "features"], media_feature_vector(arr)
            )
            assert rs.loc[url, "thumb_digest"] == thumb_digest(
                resize_nearest(arr, 128)
            )


class TestMediaContentDedup:
    def test_cross_format_dup_collapses(self):
        """Row 9 re-encodes row 5's image in another codec: different
        bytes, same decoded pixels -> one pixel-digest group."""
        from barks_ocr_ray.datagen import media_aug_record
        from barks_ocr_ray.functions.codecs import (
            decode_media,
            pixel_digest,
        )

        r5, r9 = media_aug_record(5), media_aug_record(9)
        assert r5["media"] != r9["media"] and r5["fmt"] != r9["fmt"]
        assert pixel_digest(decode_media(r5["media"])) == pixel_digest(
            decode_media(r9["media"])
        )

    def test_pixel_dedup_pipeline_groups(self):
        from barks_ocr_ray.pipelines.queries import q298_media_pixel_dedup

        out = q298_media_pixel_dedup("unused").to_pandas()
        # 150 rows, 29 cross-format dups (i%5==4, i>=5, excl. i%7==6
        # overlaps counted once) -> fewer distinct groups than rows
        assert out["n_copies"].sum() == 150
        assert (out["n_copies"] >= 2).any()
        dup = out[out["n_copies"] >= 2].iloc[0]
        assert dup["winner_url"].startswith("media://aug/")

    def test_phash_near_pair_found(self):
        """Row 13 is row 7's image with 3 high-bit pixel flips: pixel
        digests differ, dhash distance <= 7 -> the pair surfaces."""
        from barks_ocr_ray.datagen import media_aug_record
        from barks_ocr_ray.functions.codecs import (
            decode_media,
            dhash64,
            hamming64,
            pixel_digest,
        )
        from barks_ocr_ray.pipelines.queries import (
            q299_media_phash_neardup,
        )

        r7, r13 = media_aug_record(7), media_aug_record(13)
        assert pixel_digest(decode_media(r7["media"])) != pixel_digest(
            decode_media(r13["media"])
        )
        assert (
            hamming64(
                dhash64(decode_media(r7["media"])),
                dhash64(decode_media(r13["media"])),
            )
            <= 7
        )
        pairs = q299_media_phash_neardup("unused").to_pandas()
        key = {tuple(sorted((a, b))) for a, b in zip(pairs.url_a, pairs.url_b)}
        assert tuple(sorted((r7["url"], r13["url"]))) in key


class TestR5Stats:
    SF = "/root/testdata/sf0.001"

    def test_mann_whitney_matches_brute_force(self):
        """u1_x2 and tie_cubes from the histogram fold must equal the
        O(n0*n1) per-pair definition computed independently here."""
        import pyarrow.parquet as pq

        from barks_ocr_ray.pipelines.queries import q302_mann_whitney_u

        t = pq.read_table(
            f"{self.SF}/documents.parquet", columns=["source", "n_chars"]
        )
        xs = [
            int(v)
            for s, v in zip(
                t.column("source").to_pylist(), t.column("n_chars").to_pylist()
            )
            if s == "src0"
        ]
        ys = [
            int(v)
            for s, v in zip(
                t.column("source").to_pylist(), t.column("n_chars").to_pylist()
            )
            if s == "src1"
        ]
        u1x2 = sum(
            2 if x > y else (1 if x == y else 0) for x in xs for y in ys
        )
        from collections import Counter

        cc = Counter(xs + ys)
        tcube = sum(c**3 - c for c in cc.values())
        out = q302_mann_whitney_u(self.SF).to_pandas().iloc[0]
        assert int(out["u1_x2"]) == u1x2
        assert int(out["tie_cubes"]) == tcube
        assert int(out["n0"]) == len(xs) and int(out["n1"]) == len(ys)

    def test_benford_accounting(self):
        from barks_ocr_ray.pipelines.queries import q300_benford_price_audit

        out = q300_benford_price_audit(self.SF).to_pandas()
        assert list(out["digit"]) == list(range(1, 10))
        # expected masses sum to ~total (log10 terms sum to exactly 1)
        total = int(out["n"].sum())
        assert abs(int(out["expected_micro"].sum()) - total * 1_000_000) <= 9
        assert (out["chi_micro"] >= 0).all()

    def test_acf_bounds_and_lags(self):
        from barks_ocr_ray.pipelines.queries import q301_acf_daily_volume

        out = q301_acf_daily_volume(self.SF).to_pandas()
        assert list(out["lag"]) == list(range(1, len(out) + 1))
        assert (out["acf_micro"].abs() <= 1_000_000).all()

    def test_clustering_coefficient_range(self):
        from barks_ocr_ray.pipelines.queries import (
            q297_clustering_coefficient,
        )

        out = q297_clustering_coefficient(self.SF).to_pandas()
        assert (out["deg"] >= 2).all()
        assert ((out["clustering"] >= 0) & (out["clustering"] <= 1)).all()
        # sf0.001: 10 suppliers, co-purchase graph near-complete — dense
        assert len(out) == 10


class TestR5bOperators:
    SF = "/root/testdata/sf0.001"

    def test_huffman_kernel_optimality_and_kraft(self):
        from barks_ocr_ray.functions.importance import huffman_code_lengths

        terms = ["a", "b", "c", "d", "e"]
        counts = [45, 13, 12, 16, 9]
        lens = huffman_code_lengths(terms, counts)
        # Kraft equality for a full binary code tree
        assert sum(2 ** -l for l in lens) == 1.0
        # optimal weighted length for this fixture: merges 9+12=21,
        # 13+16=29, 21+29=50, 45+50=95 -> depths {45:1, rest:3} ->
        # 45*1 + (9+12+13+16)*3 = 195
        assert sum(c * l for c, l in zip(counts, lens)) == 195
        # degenerate vocabs
        assert huffman_code_lengths(["x"], [7]) == [1]
        assert huffman_code_lengths([], []) == []
        # two symbols: one bit each regardless of skew
        assert huffman_code_lengths(["x", "y"], [1, 999]) == [1, 1]

    def test_huffman_beats_entropy_bound_from_below(self):
        """H <= E[len] < H+1 (Shannon) on the real corpus output."""
        import math

        from barks_ocr_ray.pipelines.queries import q304_huffman_code_lengths

        out = q304_huffman_code_lengths(self.SF).to_pandas()
        n = out["cnt"].sum()
        probs = out["cnt"] / n
        H = -(probs * probs.map(lambda p: math.log2(p))).sum()
        elen = (probs * out["code_len"]).sum()
        assert H <= elen + 1e-9 < H + 1

    def test_funnel_monotone_and_base(self):
        from barks_ocr_ray.pipelines.queries import q303_funnel_conversion

        out = q303_funnel_conversion(self.SF).to_pandas()
        n = list(out["n_users"])
        assert n[0] >= n[1] >= n[2]
        assert int(out["conv_ppm"].iloc[0]) == 1_000_000
        # sf0.001 has 15 users, all active across ~200 events/type:
        # every user views at least once
        assert n[0] == 15

    def test_k_anonymity_accounting(self):
        import pyarrow.parquet as pq

        from barks_ocr_ray.pipelines.queries import q305_k_anonymity

        out = q305_k_anonymity(self.SF).to_pandas().iloc[0]
        t = pq.read_table(
            f"{self.SF}/documents.parquet", columns=["lang", "source"]
        )
        from collections import Counter

        sizes = Counter(
            zip(t.column("lang").to_pylist(), t.column("source").to_pylist())
        )
        assert int(out["k_min"]) == min(sizes.values())
        assert int(out["n_classes"]) == len(sizes)


class TestR5cOperators:
    SF = "/root/testdata/sf0.001"

    def test_gini_hand_cases(self):
        """Perfectly equal counts -> (n-1)/... ~ 0; one-hot -> ~1-1/n,
        via the query kernel's exact formula recomputed here."""
        # equal distribution: numerator telescopes to 0
        xs = [7, 7, 7, 7]
        n = len(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        assert num == 0
        # extreme concentration
        xs = [1, 1, 1, 97]
        num = sum((2 * (i + 1) - n - 1) * sorted(xs)[i] for i in range(n))
        g = num / (n * sum(xs))
        assert 0.7 < g < 0.75

    def test_pmi_round_before_rank_and_bounds(self):
        from barks_ocr_ray.pipelines.queries import q307_pmi_collocations

        out = q307_pmi_collocations(self.SF).to_pandas()
        assert len(out) == 20
        assert (out["c_pair"] >= 5).all()
        # micro scores are sorted desc with (w1, w2) tie order
        m = list(out["pmi_micro"])
        assert m == sorted(m, reverse=True)

    def test_simpson_between_0_and_1(self):
        from barks_ocr_ray.pipelines.queries import q308_simpson_diversity

        out = q308_simpson_diversity(self.SF).to_pandas()
        assert len(out) == 20  # one row per source
        assert ((out["simpson_micro"] > 0) & (out["simpson_micro"] < 1_000_000)).all()

    def test_emd_vs_brute_force(self):
        """EMD of empirical 1-D distributions == mean |F0-F1| integral,
        recomputed here straight from the parquet."""
        import numpy as np
        import pyarrow.parquet as pq

        from barks_ocr_ray.pipelines.queries import q309_emd_length_shift

        t = pq.read_table(
            f"{self.SF}/documents.parquet", columns=["source", "n_chars"]
        )
        xs = sorted(
            int(v)
            for s, v in zip(
                t.column("source").to_pylist(), t.column("n_chars").to_pylist()
            )
            if s == "src0"
        )
        ys = sorted(
            int(v)
            for s, v in zip(
                t.column("source").to_pylist(), t.column("n_chars").to_pylist()
            )
            if s == "src1"
        )
        grid = np.array(sorted(set(xs) | set(ys)), dtype=np.float64)
        F0 = np.searchsorted(xs, grid, side="right") / len(xs)
        F1 = np.searchsorted(ys, grid, side="right") / len(ys)
        brute = float(np.sum(np.abs(F0[:-1] - F1[:-1]) * np.diff(grid)))
        out = q309_emd_length_shift(self.SF).to_pandas().iloc[0]
        assert abs(int(out["emd_micro"]) - 1e6 * brute) < 2


class TestR5dOperators:
    SF = "/root/testdata/sf0.001"

    def test_lineage_manifest_resume_skips_everything(self):
        """Second run over the unchanged input recomputes 0 buckets —
        the manifest IS the commit marker (north-rule resumability)."""
        import shutil

        from barks_ocr_ray.oracle_data import Q24_N, Q310_BUCKETS
        from barks_ocr_ray.pipelines.queries import q310_lineage_manifest
        from barks_ocr_ray.pipelines.resume import run_resumable

        first = q310_lineage_manifest(self.SF).to_pandas()
        assert len(first) == Q310_BUCKETS
        assert first["n_rows"].sum() > 0
        summary = run_resumable(
            f"/tmp/barks_lineage_in_{Q24_N}",
            f"/tmp/barks_lineage_out_{Q24_N}",
            num_buckets=Q310_BUCKETS,
            num_partitions=8,
        )
        assert summary["skipped"] == Q310_BUCKETS
        assert summary["computed"] == 0
        # deleting one bucket's manifest recomputes ONLY that bucket
        import os

        out_dir = f"/tmp/barks_lineage_out_{Q24_N}"
        victim = int(first[first["n_rows"] > 0].iloc[0]["bucket"])
        os.remove(
            os.path.join(out_dir, "_manifests", f"bucket-{victim:05d}.json")
        )
        summary2 = run_resumable(
            f"/tmp/barks_lineage_in_{Q24_N}",
            out_dir,
            num_buckets=Q310_BUCKETS,
            num_partitions=8,
        )
        assert summary2["computed"] == 1
        again = q310_lineage_manifest(self.SF).to_pandas()
        assert (
            again.sort_values("bucket").reset_index(drop=True)
            == first.sort_values("bucket").reset_index(drop=True)
        ).all().all()

    def test_bm25_matches_brute_force(self):
        """Per-doc micro scores recomputed from the raw parquet with
        the same IEEE chain must equal the pipeline's (and the tf=0
        docs must be absent)."""
        import math
        import re
        from collections import Counter

        import pyarrow.parquet as pq

        from barks_ocr_ray.pipelines.queries import (
            Q311_B,
            Q311_K1,
            Q311_QUERY,
            q311_bm25_ranking,
        )
        from barks_ocr_ray.functions.relational import round_like_duckdb

        t = pq.read_table(
            f"{self.SF}/documents.parquet", columns=["doc_id", "text"]
        )
        tok = re.compile(r"[a-z0-9]+")
        docs = {
            int(d): tok.findall((x or "").lower())
            for d, x in zip(
                t.column("doc_id").to_pylist(), t.column("text").to_pylist()
            )
        }
        N = len(docs)
        avgdl = sum(len(v) for v in docs.values()) / N
        df = {
            q: sum(1 for v in docs.values() if q in v) for q in Q311_QUERY
        }
        scores = {}
        for d, toks in docs.items():
            c = Counter(toks)
            sc = 0
            for q in Q311_QUERY:
                tf = c.get(q, 0)
                if not tf:
                    continue
                idf = math.log((N - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
                contrib = idf * (
                    (tf * (Q311_K1 + 1.0))
                    / (
                        tf
                        + Q311_K1
                        * (1.0 - Q311_B + Q311_B * (len(toks) / avgdl))
                    )
                )
                sc += int(round_like_duckdb(1e6 * contrib, 0))
            if sc:
                scores[d] = sc
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        out = q311_bm25_ranking(self.SF).to_pandas()
        got = list(zip(out["doc_id"], out["score_micro"]))
        assert [(int(a), int(b)) for a, b in got] == want


class TestBfsHops:
    def _edges(self):
        # path 1-2-3-4, branch 2-5, island 8-9
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([1, 2, 3, 2, 8], pa.int64()),
                    "dst": pa.array([2, 3, 4, 5, 9], pa.int64()),
                }
            )
        )

    EXPECT = {1: 0, 2: 1, 3: 2, 5: 2, 4: 3}

    def test_gated_raw_task_path(self):
        from barks_ocr_ray.functions.graph import bfs_hops

        out = bfs_hops(self._edges(), 1)
        got = dict(
            zip(out.column("node").to_pylist(), out.column("hops").to_pylist())
        )
        assert got == self.EXPECT  # island 8-9 unreached, absent

    def test_join_fallback_path_matches(self):
        from barks_ocr_ray.functions.graph import bfs_hops

        out = bfs_hops(self._edges(), 1, broadcast_gate=0)
        got = dict(
            zip(out.column("node").to_pylist(), out.column("hops").to_pylist())
        )
        assert got == self.EXPECT

    def test_hop_cap(self):
        from barks_ocr_ray.functions.graph import bfs_hops

        out = bfs_hops(self._edges(), 1, max_hops=2)
        got = dict(
            zip(out.column("node").to_pylist(), out.column("hops").to_pylist())
        )
        assert got == {1: 0, 2: 1, 3: 2, 5: 2}  # node 4 beyond the cap


class TestBinarySegmentation:
    def test_finds_planted_level_shift(self):
        """The gain expression recomputed on a planted step series must
        put the split at the step (exactness of the fold, not Ray)."""
        import numpy as np

        from barks_ocr_ray.functions.relational import round_like_duckdb

        y = np.array([10] * 12 + [40] * 18, np.int64)
        T, S1 = len(y), int(y.sum())
        best = None
        for k in range(1, T):
            L1 = int(y[:k].sum())
            R1 = S1 - L1
            gain = (
                (float(L1) * L1 / k)
                + (float(R1) * R1 / (T - k))
                - (float(S1) * S1 / T)
            )
            gm = int(round_like_duckdb(1e6 * gain, 0))
            if best is None or gm > best[0]:
                best = (gm, k)
        assert best[1] == 12

    def test_query_runs_and_gain_nonnegative(self):
        from barks_ocr_ray.pipelines.queries import q315_binary_segmentation

        out = q315_binary_segmentation("/root/testdata/sf0.001").to_pandas()
        assert len(out) == 1
        assert int(out["gain_micro"].iloc[0]) >= 0
        assert int(out["split_day"].iloc[0]) >= 1


class TestR5eOperators:
    SF = "/root/testdata/sf0.001"

    def test_srm_counts_cover_all_users(self):
        import pyarrow.parquet as pq

        from barks_ocr_ray.pipelines.queries import q320_srm_check

        out = q320_srm_check(self.SF).to_pandas().iloc[0]
        t = pq.read_table(f"{self.SF}/events.parquet", columns=["user_id"])
        n_users = len(set(t.column("user_id").to_pylist()))
        assert int(out["n_a"]) + int(out["n_b"]) == n_users

    def test_rebalance_hrw_vs_mod(self):
        """The whole point: mod-hash moves ~16/17 of rows on a 16->17
        resize; rendezvous moves ~1/17."""
        from barks_ocr_ray.pipelines.queries import q321_rebalance_audit

        out = q321_rebalance_audit(self.SF).to_pandas().iloc[0]
        n = int(out["n_docs"])
        assert n == 500
        mod_frac = int(out["mod_moved"]) / n
        hrw_frac = int(out["hrw_moved"]) / n
        assert mod_frac > 0.8           # ~0.941 expected
        assert hrw_frac < 0.15          # ~0.059 expected
        assert hrw_frac < mod_frac / 4  # the rendezvous win
