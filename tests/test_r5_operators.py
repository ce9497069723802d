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
