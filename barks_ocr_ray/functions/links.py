"""Outlink extraction over the synthesized web-page corpus: the
web-graph rung of the extraction engine (link graph + anchor-text
index). The reference's analog surface is the word-index experiment
(/root/reference/experiments/make-word-index-from-gemini-ai-groups.py:174-194
— token -> page postings); here the postings are anchor targets, the
classic web-search signal.

The per-row kernel (`page_outlinks`) is pure — sniff + decode via the
extraction kernels, one compiled regex pass, stdlib urljoin resolution —
and is shared with the single-process golden (golden replay pins the
distributed two-level aggregation, not the parse). Everything emitted by
a page lives in its own input row, so edge extraction is embarrassingly
block-local; the only exchanges are the (target, src)-keyed distinct
and the target-keyed rollup, both edge-bounded.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from barks_ocr_ray.context import hash_partitions
from barks_ocr_ray.extract.sniff import sniff

#: anchor tags as the corpus emits them (href always first/only attr);
#: kept mildly general (whitespace, attr order after href ignored)
HREF_RE = re.compile(
    r'<a\s+href="([^"]*)"[^>]*>(.*?)</a>', re.IGNORECASE | re.DOTALL
)
_WS_RE = re.compile(r"\s+")
_TAG_RE = re.compile(r"<[^>]+>")


def page_outlinks(url: str, payload: bytes) -> list[tuple[str, str]]:
    """Pure per-row kernel: (resolved absolute target, normalized anchor
    text) for every <a href> in an HTML payload; non-HTML payloads emit
    nothing. Decoding reuses the extraction sniffer (charset meta /
    magic rules), resolution is stdlib urljoin against the page url."""
    kind, enc = sniff(payload)
    if kind != "html":
        return []
    doc = payload.decode(enc, errors="replace")
    out = []
    for href, anchor in HREF_RE.findall(doc):
        text = _WS_RE.sub(" ", _TAG_RE.sub(" ", anchor)).strip()
        out.append((urljoin(url, href), text))
    return out


def _edge_batches(t: pa.Table) -> pa.Table:
    urls = t.column("url").to_pylist()
    payloads = t.column("html").to_pylist()
    srcs, tgts, anchors = [], [], []
    for u, p in zip(urls, payloads):
        for tgt, anchor in page_outlinks(u, p):
            srcs.append(u)
            tgts.append(tgt)
            anchors.append(anchor)
    return pa.table(
        {
            "src": pa.array(srcs, pa.string()),
            "target": pa.array(tgts, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
        }
    )


def outlink_edges(pages: Dataset) -> Dataset:
    """(src, target, anchor) edge table — block-local flat extraction."""
    return pages.map_batches(_edge_batches, batch_format="pyarrow")


def link_graph_topk(pages: Dataset, k: int = 20) -> Dataset:
    """Top-k link targets by reference count with exact distinct-source
    counts: two chained keyed aggregations ((target, src) distinct with
    per-block pre-count, then the target rollup), then a k-sized sort.
    Refetched duplicate urls contribute per physical fetch, matching the
    golden replay."""
    pair_counts = (
        outlink_edges(pages)
        .map_batches(_pair_partials, batch_format="pyarrow")
        .groupby(["target", "src"], num_partitions=hash_partitions(8))
        .aggregate(Sum("n", alias_name="n"))
    )
    per_target = pair_counts.groupby(
        "target", num_partitions=hash_partitions(4)
    ).aggregate(
        Sum("n", alias_name="n_refs"),
        Count(alias_name="n_src_pages"),
    )
    return per_target.sort(
        ["n_refs", "target"], descending=[True, False]
    ).limit(k)


def _pair_partials(t: pa.Table) -> pa.Table:
    pairs = np.array(
        [
            f"{a}\x00{b}"
            for a, b in zip(
                t.column("target").to_pylist(), t.column("src").to_pylist()
            )
        ],
        dtype=object,
    )
    u, c = np.unique(pairs, return_counts=True)
    tgt, src = (
        zip(*(x.split("\x00", 1) for x in u)) if len(u) else ((), ())
    )
    return pa.table(
        {
            "target": pa.array(list(tgt), pa.string()),
            "src": pa.array(list(src), pa.string()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
        }
    )


def anchor_term_index(pages: Dataset, k: int = 30) -> Dataset:
    """Anchor-text inverted index: token -> (n_links, n_distinct_targets),
    top-k by link count (tie: term ascending). Same two-level exchange
    shape as the link graph, keyed by (term, target)."""
    from barks_ocr_ray.functions.text import Tokenizer

    tokenize = Tokenizer()

    def _term_target(t: pa.Table) -> pa.Table:
        terms, tgts = [], []
        for anchor, tgt in zip(
            t.column("anchor").to_pylist(), t.column("target").to_pylist()
        ):
            for w in tokenize.tokens(anchor):
                terms.append(w)
                tgts.append(tgt)
        tt = pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "target": pa.array(tgts, pa.string()),
            }
        )
        return _term_partials(tt)

    pair_counts = (
        outlink_edges(pages)
        .map_batches(_term_target, batch_format="pyarrow")
        .groupby(["term", "target"], num_partitions=hash_partitions(8))
        .aggregate(Sum("n", alias_name="n"))
    )
    per_term = pair_counts.groupby(
        "term", num_partitions=hash_partitions(4)
    ).aggregate(
        Sum("n", alias_name="n_links"),
        Count(alias_name="n_targets"),
    )
    return per_term.sort(
        ["n_links", "term"], descending=[True, False]
    ).limit(k)


def _term_partials(t: pa.Table) -> pa.Table:
    pairs = np.array(
        [
            f"{a}\x00{b}"
            for a, b in zip(
                t.column("term").to_pylist(), t.column("target").to_pylist()
            )
        ],
        dtype=object,
    )
    u, c = np.unique(pairs, return_counts=True)
    term, tgt = (
        zip(*(x.split("\x00", 1) for x in u)) if len(u) else ((), ())
    )
    return pa.table(
        {
            "term": pa.array(list(term), pa.string()),
            "target": pa.array(list(tgt), pa.string()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Canonical-URL dedup (crawl-side URL aliasing)
# ---------------------------------------------------------------------------

_TRACKING_PREFIXES = ("utm_",)


def canonical_url(u: str) -> str:
    """Pure canonicalization kernel (the classic crawl normalizations,
    public conventions): lowercase scheme+host, strip a leading 'www.',
    drop default ports (80/http, 443/https), strip fragments, strip a
    trailing slash on non-root paths, drop utm_* tracking params and
    sort the survivors. Deterministic; shared verbatim with the
    sequential golden."""
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    s = urlsplit(u.strip())
    scheme = s.scheme.lower()
    host = (s.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    port = s.port
    if port is not None and not (
        (scheme == "http" and port == 80)
        or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    path = s.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    q = sorted(
        (k, v)
        for k, v in parse_qsl(s.query, keep_blank_values=True)
        if not k.lower().startswith(_TRACKING_PREFIXES)
    )
    return urlunsplit((scheme, host, path, urlencode(q), ""))


def canonical_url_dedup(
    fetches: Dataset, num_partitions: int = 8
) -> Dataset:
    """Collapse crawl-side URL aliases: per canonical form, the kept
    fetch (latest warc_ts, tie: lexicographically smallest raw url),
    total physical fetches, and distinct raw spellings. Two keyed
    aggregations — (canonical, url) with per-block pre-count + max ts,
    then a canonical-keyed map_groups (groups are alias-cluster-sized,
    bounded by how many spellings a page has) — so at 100 TB the
    exchange carries one row per distinct spelling, not per fetch."""

    def _canon(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        return pa.table(
            {
                "canonical_url": pa.array(
                    [canonical_url(u) for u in urls], pa.string()
                ),
                "url": t.column("url"),
                "warc_ts": t.column("warc_ts"),
            }
        )

    from ray.data.aggregate import Max

    per_spelling = (
        fetches.map_batches(_canon, batch_format="pyarrow")
        .groupby(["canonical_url", "url"], num_partitions=hash_partitions(num_partitions))
        .aggregate(
            Count(alias_name="n_fetches"),
            Max("warc_ts", alias_name="max_ts"),
        )
    )

    def _resolve(g: pa.Table) -> pa.Table:
        urls = g.column("url").to_pylist()
        ts = g.column("max_ts").to_pylist()
        nf = g.column("n_fetches").to_pylist()
        best = min(range(len(urls)), key=lambda i: (_neg_ts(ts[i]), urls[i]))
        return pa.table(
            {
                "canonical_url": pa.array(
                    [g.column("canonical_url")[0].as_py()], pa.string()
                ),
                "kept_url": pa.array([urls[best]], pa.string()),
                "n_fetches": pa.array([int(sum(nf))], pa.int64()),
                "n_raw_urls": pa.array([len(urls)], pa.int64()),
            }
        )

    return (
        per_spelling.groupby(
            "canonical_url", num_partitions=hash_partitions(num_partitions)
        )
        .map_groups(_resolve, batch_format="pyarrow")
    )


def _neg_ts(ts):
    """Sort helper: latest timestamp first (None sorts last)."""
    import datetime

    if ts is None:
        return datetime.datetime.max
    return -ts.timestamp() if hasattr(ts, "timestamp") else -ts


def url_host(u: str) -> str:
    """Pure kernel: lowercase registered host of a URL ('' if none)."""
    from urllib.parse import urlsplit

    return (urlsplit(u).hostname or "").lower()


def frontier_by_host(pages: Dataset, k: int = 30) -> Dataset:
    """Crawl-frontier discovery: outlink targets never crawled (no
    physical fetch row), rolled up per target host — the table a
    crawler's scheduler consumes next, and the dead-link/spray profile
    per domain (link farms dominate it on this corpus). Returns
    (host, n_uncrawled_urls, n_refs) top-k by distinct uncrawled urls
    (tie: host ascending).

    Fully distributed anti-join — no broadcast: per-target reference
    counts (the q161 two-level machinery) UNION crawled-url marker rows
    into ONE target-keyed merge (Max flag + Sum counts), keep
    crawled == 0, then a host-sized rollup. Every exchange is
    edge-bounded; the crawled side ships one marker row per page."""
    pair_counts = (
        outlink_edges(pages)
        .map_batches(_pair_partials, batch_format="pyarrow")
        .groupby(["target", "src"], num_partitions=hash_partitions(8))
        .aggregate(Sum("n", alias_name="n"))
    )
    per_target = pair_counts.groupby(
        "target", num_partitions=hash_partitions(4)
    ).aggregate(
        Sum("n", alias_name="n_refs"),
        Count(alias_name="n_src_pages"),
    )

    def _target_rows(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, dtype=np.int64)
        return pa.table(
            {
                "url": t.column("target"),
                "n_refs": t.column("n_refs"),
                "crawled": pa.array(z, pa.int64()),
            }
        )

    def _crawled_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t.column("url"),
                "n_refs": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64), pa.int64()
                ),
                "crawled": pa.array(
                    np.ones(t.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Max

    merged = (
        per_target.map_batches(_target_rows, batch_format="pyarrow")
        .union(
            pages.map_batches(_crawled_rows, batch_format="pyarrow")
        )
        .groupby("url", num_partitions=hash_partitions(8))
        .aggregate(
            Sum("n_refs", alias_name="n_refs"),
            Max("crawled", alias_name="crawled"),
        )
    )

    def _host_partials(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.equal(t.column("crawled"), 0), pc.greater(t.column("n_refs"), 0)
        )
        t = t.filter(keep)
        hosts = [url_host(u) for u in t.column("url").to_pylist()]
        tt = pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_urls": pa.array(
                    np.ones(t.num_rows, dtype=np.int64), pa.int64()
                ),
                "n_refs": t.column("n_refs"),
            }
        )
        return (
            tt.group_by("host")
            .aggregate([("n_urls", "sum"), ("n_refs", "sum")])
            .rename_columns(["host", "n_urls", "n_refs"])
        )

    rolled = (
        merged.map_batches(_host_partials, batch_format="pyarrow")
        .groupby("host", num_partitions=2)
        .aggregate(
            Sum("n_urls", alias_name="n_uncrawled_urls"),
            Sum("n_refs", alias_name="n_refs"),
        )
    )
    return rolled.sort(
        ["n_uncrawled_urls", "host"], descending=[True, False]
    ).limit(k)
