"""Stage 4 — extraction actor pools (the "warm parser" stage).

The reference instantiated its OCR engines once per page
(/root/reference/src/barks_ocr/pipeline/batch_ocr.py:185,230 — the
anti-pattern); here the parser kernel is a callable CLASS handed to
``map_batches(..., concurrency=N)`` so setup happens once per actor and
every batch reuses it (SURVEY.md §2.3 T1/T2 -> actor pool).

Skew routing (north rule): instead of branching the Dataset (which would
either recompute the upstream dedup per branch or force a mid-pipeline
materialize), routing is expressed as TWO SEQUENTIAL actor-pool stages on
one streaming pipeline:

* ``ExtractSmall`` — the main pool; processes every row with
  ``html_len <= oversize_bytes`` and passes oversized rows through
  untouched (``extract_done=False``).
* ``ExtractBig`` — the dedicated high-memory pool (small ``concurrency``,
  small ``batch_size``, more ``num_cpus`` per actor); processes exactly
  the rows the first pool skipped and forwards the rest zero-copy.

Each row's heavy parse runs exactly once, in the right pool, with no extra
shuffle or materialization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from barks_ocr_ray.datagen import OVERSIZE_BYTES
from barks_ocr_ray.extract.reference import extract_page

SPANS_TYPE = pa.list_(
    pa.struct([("start", pa.int64()), ("end", pa.int64())])
)
BLOCKS_TYPE = pa.list_(
    pa.struct(
        [
            ("block_id", pa.int32()),
            ("type", pa.string()),
            ("text", pa.string()),
            ("link_density", pa.float32()),
            ("text_density", pa.float32()),
        ]
    )
)

DONE_COL = "extract_done"
OUTPUT_COLS = ("extracted_text", "spans", "blocks", "n_blocks", "error")


def _extract_rows(batch: pa.Table, mask: list[bool]) -> pa.Table:
    """Run the frozen kernel on rows where mask is True; placeholder
    (null) outputs elsewhere. Returns batch + output columns + done col."""
    payloads = batch.column("html")
    texts: list[str | None] = []
    spans: list[list[dict] | None] = []
    blocks: list[list[dict] | None] = []
    n_blocks: list[int | None] = []
    errors: list[str | None] = []
    for i, do in enumerate(mask):
        if not do:
            texts.append(None)
            spans.append(None)
            blocks.append(None)
            n_blocks.append(None)
            errors.append(None)
            continue
        payload = payloads[i].as_py()
        try:
            res = extract_page(payload)
        except Exception as exc:  # dead-letter row, don't kill the batch
            # (the reference's tolerant per-line parse with error counter,
            # /root/reference/src/barks_ocr/pipeline/gemini_batch_results.py:94-114)
            texts.append("")
            spans.append([])
            blocks.append([])
            n_blocks.append(0)
            errors.append(f"{type(exc).__name__}: {exc}"[:500])
            continue
        errors.append(None)
        texts.append(res.extracted_text)
        spans.append([{"start": s, "end": e} for s, e in res.spans])
        blocks.append(
            [
                {
                    "block_id": b.block_id,
                    "type": b.type,
                    "text": b.text,
                    "link_density": b.link_density,
                    "text_density": b.text_density,
                }
                for b in res.blocks
            ]
        )
        n_blocks.append(len(res.blocks))
    return (
        batch.append_column("extracted_text", pa.array(texts, pa.string()))
        .append_column("spans", pa.array(spans, SPANS_TYPE))
        .append_column("blocks", pa.array(blocks, BLOCKS_TYPE))
        .append_column("n_blocks", pa.array(n_blocks, pa.int32()))
        .append_column("error", pa.array(errors, pa.string()))
        .append_column(DONE_COL, pa.array(mask, pa.bool_()))
    )


class ExtractSmall:
    """Main extraction pool: all rows up to the oversize threshold."""

    def __init__(self, oversize_bytes: int = OVERSIZE_BYTES):
        self.oversize_bytes = oversize_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        small = pc.less_equal(
            batch.column("html_len"), pa.scalar(self.oversize_bytes)
        )
        return _extract_rows(batch, small.to_pylist())


class ExtractBig:
    """High-memory pool: finishes the rows ExtractSmall passed through.
    Batches that are already fully done are forwarded zero-copy."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        done = batch.column(DONE_COL)
        if pc.all(done).as_py():
            return batch
        todo = pc.invert(done).to_pylist()
        base = batch.drop_columns(list(OUTPUT_COLS) + [DONE_COL])
        redone = _extract_rows(base, todo)
        # merge: keep prior outputs where done, new outputs where todo.
        # (Python-side merge — batches reaching the big pool are small by
        # construction, and nested list<struct> columns have no if_else
        # kernel.)
        out = base
        for col in OUTPUT_COLS:
            old = batch.column(col).to_pylist()
            new = redone.column(col).to_pylist()
            merged = [n if t else o for o, n, t in zip(old, new, todo)]
            out = out.append_column(
                col, pa.array(merged, batch.schema.field(col).type)
            )
        return out.append_column(
            DONE_COL, pa.array([True] * batch.num_rows, pa.bool_())
        )
