"""Property contracts for the CMS sketch (q85) and the event-sequence
pattern op (q92): one-sided CMS error vs exact counts, and the
distributed pattern match vs a naive single-process replay."""

import re
from collections import Counter

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_cms_estimates_are_one_sided_and_tight(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.sketches import CMS_PROBES, cms_token_counts
    from barks_ocr_ray.functions.text import Tokenizer

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    out = cms_token_counts(rd.from_arrow(docs), "text", CMS_PROBES).to_pandas()
    tok = Tokenizer()
    true = Counter()
    for v in docs.column("text"):
        s = v.as_py()
        if s is not None:
            true.update(tok.tokens(s))
    est = dict(zip(out["word"], out["est_count"]))
    assert set(est) == set(CMS_PROBES)
    n_total = sum(true.values())
    for w in CMS_PROBES:
        assert est[w] >= true[w], w  # CMS error is strictly one-sided
        # standard CMS bound: overestimate < 2e/width * n with high prob
        assert est[w] - true[w] <= max(10, 0.01 * n_total), w


def test_event_pattern_matches_naive_replay(ray_session):
    from barks_ocr_ray.pipelines.queries import (
        EVENT_PATTERN,
        q92_event_pattern,
    )

    got = sorted(q92_event_pattern(SF).to_pandas()["user_id"])
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    ).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    pat = re.compile(EVENT_PATTERN)
    expected = sorted(
        int(u)
        for u, g in ev.groupby("user_id")
        if pat.search("".join(s[0] for s in g["event_type"]))
    )
    assert got == expected
    assert len(got) > 0  # the corpus plants conversion paths
