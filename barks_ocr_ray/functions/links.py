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
