"""Contract for sorted-neighborhood dedup (q98 machinery): the banded
distributed pairing must equal the serial row_number window self-join
even when bands are tiny enough that a window spans MULTIPLE band
boundaries (the hard case for the boundary-table construction)."""

import pyarrow as pa


def _serial_pairs(rows, window, max_dist, key_len):
    import re

    from barks_ocr_ray.functions.fuzzy import levenshtein

    keyed = []
    for doc_id, text in rows:
        if text is None:
            continue
        skey = re.sub(r"[^a-z0-9]", "", text.lower())[:key_len]
        keyed.append((skey, doc_id))
    keyed.sort()
    out = set()
    for i in range(len(keyed)):
        for j in range(i + 1, min(i + window + 1, len(keyed))):
            lv = levenshtein(keyed[i][0], keyed[j][0])
            if lv <= max_dist:
                out.add((keyed[i][1], keyed[j][1], lv))
    return out


def _rows():
    rows = [(i, f"doc {i:03d} alpha beta") for i in range(24)]
    rows.append((90, None))  # null text: dropped on both sides
    rows.append((91, "doc 001 alpha beta!"))  # near-dup of doc 1
    return rows


def test_banded_pairs_match_serial_even_with_tiny_bands(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.dedupe import sorted_neighborhood_pairs

    rows = _rows()
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    want = _serial_pairs(rows, window=4, max_dist=6, key_len=16)
    # n_bands=12 over 25 docs -> ~2 rows per band, so a window of 4
    # regularly crosses two or three band boundaries at once
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in sorted_neighborhood_pairs(
            ds, window=4, max_dist=6, key_len=16, n_bands=12
        ).take_all()
    }
    assert got == want
    assert len(got) > 0  # fixture sanity: the near-dup is found


def test_single_band_equals_serial(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.dedupe import sorted_neighborhood_pairs

    rows = _rows()
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(5)
    want = _serial_pairs(rows, window=2, max_dist=3, key_len=20)
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in sorted_neighborhood_pairs(
            ds, window=2, max_dist=3, key_len=20, n_bands=1
        ).take_all()
    }
    assert got == want
