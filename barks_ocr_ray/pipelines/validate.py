"""Stage 7 — validation: sampled re-extraction with an INDEPENDENT second
implementation + similarity scoring.

The reference validates with N-version programming: a second OCR engine
(/root/reference/src/barks_ocr/tools/compare.py:44-206) and a third-model
spot check on a sample (/root/reference/src/barks_ocr/tools/florence_check.py,
default 20 bubbles/title, fuzzy threshold 85). Our analog: a crude
regex-based tag stripper (deliberately independent of the html.parser
walker) re-extracts a deterministic sample of pages; token-overlap
similarity between the main extraction and the stripped full text is
scored, and html pages whose extraction lost too much content are flagged
for review — the queue-file analog (D1 dedup by url is inherent: one row
per url).
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

import pyarrow as pa
from ray.data import Dataset

from barks_ocr_ray.extract.html_extract import clean_text
from barks_ocr_ray.extract.sniff import sniff

_TAG_RE = re.compile(r"<script.*?</script>|<style.*?</style>|<[^>]*>", re.S | re.I)


def strip_tags(payload: bytes) -> str:
    """The independent 'second engine': regex tag strip of the whole
    document (no block model, no density classification)."""
    kind, enc = sniff(payload)
    if kind != "html":
        return ""
    doc = payload.decode(enc, errors="replace")
    return clean_text(_TAG_RE.sub(" ", doc))


def similarity(extracted: str, stripped: str) -> float:
    """Token-containment score: how much of the extraction's tokens appear
    in the stripped full text (cheap, order-insensitive), refined with a
    SequenceMatcher ratio on a bounded prefix for reporting parity with
    the reference's fuzzy scoring (tools/ocr_check.py:213)."""
    ex_toks = extracted.split()
    st_toks = set(stripped.split())
    if not ex_toks:
        return 1.0 if not stripped else 0.0
    contained = sum(1 for t in ex_toks if t in st_toks) / len(ex_toks)
    sm = SequenceMatcher(None, extracted[:2000], stripped[:2000]).ratio()
    return round(0.5 * contained + 0.5 * min(1.0, sm + 0.5), 4)


class Validator:
    """Actor-pool stage over sampled (url, html, extracted_text) rows."""

    def __init__(self, threshold: float = 0.6):
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        kinds = batch.column("kind").to_pylist()
        scores, flagged = [], []
        texts = batch.column("extracted_text").to_pylist()
        for i, payload in enumerate(batch.column("html")):
            stripped = strip_tags(payload.as_py() or b"")
            score = similarity(texts[i] or "", stripped)
            scores.append(score)
            # empty extractions are by design (link farms); only flag
            # pages where real extracted content diverges from the source
            flagged.append(
                kinds[i] == "html" and bool(texts[i]) and score < self.threshold
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "score": pa.array(scores, pa.float64()),
                "flagged": pa.array(flagged, pa.bool_()),
            }
        )


def sample_mask(urls: list[str], frac: float, seed: int) -> list[bool]:
    """Deterministic per-url sample decision: md5(seed:url) first-8-hex
    fraction < frac. A pure row function — the sampled set is identical
    at any parallelism/partitioning (``random_sample`` is not), which is
    what lets the validation output be golden-compared."""
    import hashlib

    out = []
    for u in urls:
        h = hashlib.md5(f"{seed}:{u}".encode("utf-8")).hexdigest()[:8]
        out.append(int(h, 16) / float(1 << 32) < frac)
    return out


def validate_extraction(
    pages: Dataset,
    *,
    sample_frac: float = 0.05,
    seed: int = 7,
    threshold: float = 0.6,
    concurrency: int = 4,
    **pipeline_kwargs,
) -> Dataset:
    """Run the flagship pipeline keeping the payload, sample it
    (deterministic url-hash fraction), and score each sampled page's
    extraction against the second engine."""
    from barks_ocr_ray.pipelines.extraction import extraction_pipeline

    extracted = extraction_pipeline(pages, keep_html=True, **pipeline_kwargs)

    def _sample(t: pa.Table) -> pa.Table:
        mask = sample_mask(
            t.column("url").to_pylist(), sample_frac, seed
        )
        return t.filter(pa.array(mask, pa.bool_()))

    sample = extracted.map_batches(_sample, batch_format="pyarrow")
    return sample.map_batches(
        Validator,
        fn_constructor_kwargs={"threshold": threshold},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, concurrency),
    )
