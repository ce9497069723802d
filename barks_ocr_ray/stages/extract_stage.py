"""Stage 4 — the extraction ("warm parser") stages.

The reference instantiated its OCR engines once per page
(/root/reference/src/barks_ocr/pipeline/batch_ocr.py:185,230 — the
anti-pattern); here the parser kernel is a callable CLASS whose state is
built once per worker and reused per batch (SURVEY.md §2.3 T1/T2). The
pipeline runs these classes as stateless TASK pools by default (the state
is a few compiled regexes; Ray's own sizing rule — cheap init -> tasks —
and a measured 2.2x actor-pool dispatch penalty decide this) and as
dedicated ACTOR pools under ``stateful=True`` for genuinely heavy warm
state.

Skew routing (north rule): instead of branching the Dataset (which would
either recompute the upstream dedup per branch or force a mid-pipeline
materialize), routing is TWO SEQUENTIAL stages on one streaming pipeline:

* ``ExtractBig`` FIRST — the dedicated high-memory stage (small batches,
  own num_cpus in stateful mode): processes exactly the oversized rows
  (``html_len > oversize_bytes``, usually few rows but most bytes),
  yielding the untouched small rows as a separate table. Running it
  first means the heavy payloads are consumed at the earliest stage and
  never ride through a second stage boundary.
* ``ExtractSmall`` — the main stage; finishes every remaining row.
  Batches that are already fully done are forwarded without
  deserialization.

Each row's parse runs exactly once, in the right stage, with no extra
shuffle or materialization.

Output layout note: per-block ``text`` is stored ONLY for non-content
blocks (title/nav/boilerplate). Content-block text is exactly what
``extracted_text`` concatenates (and spans point into the source), so
persisting it again would double the output and every downstream
exchange — measured 2x on the bench corpus.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from barks_ocr_ray.datagen import OVERSIZE_BYTES
from barks_ocr_ray.extract.html_extract import TYPE_CONTENT
from barks_ocr_ray.extract.reference import extract_page
from barks_ocr_ray.stages.sniff_stage import PAYLOAD_Z, payload_codec

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


def _payload_getter(batch: pa.Table):
    """Payload accessor: raw ``html`` or zstd ``html_z`` (decompressed
    per row with the recorded html_len as size hint).

    NOTE (worker-executed code): no runtime `from barks_ocr_ray...`
    imports in any function that runs inside a Ray task — when the
    package ships by value (cloudpickle registration in __ray_entry__),
    workers cannot import it; only references captured at pickle time
    resolve."""
    if PAYLOAD_Z in batch.column_names:
        z = batch.column(PAYLOAD_Z)
        lens = batch.column("html_len").to_pylist()
        codec = payload_codec()

        def _get(i: int) -> bytes:
            return codec.decompress(
                z[i].as_py(), decompressed_size=lens[i], asbytes=True
            )

        return _get
    payloads = batch.column("html")
    return lambda i: payloads[i].as_py()


def _payload_col(batch: pa.Table) -> str:
    return PAYLOAD_Z if PAYLOAD_Z in batch.column_names else "html"


def _extract_rows(batch: pa.Table, mask: list[bool]) -> pa.Table:
    """Run the frozen kernel on rows where mask is True; null outputs
    elsewhere. Nested columns are built with flat offset/child buffers
    (no per-row list-of-dict conversion)."""
    get_payload = _payload_getter(batch)
    texts: list[str | None] = []
    errors: list[str | None] = []
    n_blocks: list[int | None] = []
    # flat builders for spans / blocks
    span_offsets: list[int] = [0]
    span_starts: list[int] = []
    span_ends: list[int] = []
    blk_offsets: list[int] = [0]
    blk_ids: list[int] = []
    blk_types: list[str] = []
    blk_texts: list[str | None] = []
    blk_ld: list[float] = []
    blk_td: list[float] = []

    def _null_row() -> None:
        # placeholder for a row this pool does not process: empty lists
        # (the placeholders are dropped before any output surfaces)
        texts.append(None)
        n_blocks.append(None)
        errors.append(None)
        span_offsets.append(len(span_starts))
        blk_offsets.append(len(blk_ids))

    for i, do in enumerate(mask):
        if not do:
            _null_row()
            continue
        try:
            res = extract_page(get_payload(i))
        except Exception as exc:  # dead-letter row, don't kill the batch
            # (the reference's tolerant per-line parse with error counter,
            # /root/reference/src/barks_ocr/pipeline/gemini_batch_results.py:94-114)
            texts.append("")
            n_blocks.append(0)
            errors.append(f"{type(exc).__name__}: {exc}"[:500])
            span_offsets.append(len(span_starts))
            blk_offsets.append(len(blk_ids))
            continue
        texts.append(res.extracted_text)
        n_blocks.append(len(res.blocks))
        errors.append(None)
        for s, e in res.spans:
            span_starts.append(s)
            span_ends.append(e)
        span_offsets.append(len(span_starts))
        for b in res.blocks:
            blk_ids.append(b.block_id)
            blk_types.append(b.type)
            blk_texts.append(None if b.type == TYPE_CONTENT else b.text)
            blk_ld.append(b.link_density)
            blk_td.append(b.text_density)
        blk_offsets.append(len(blk_ids))

    spans_arr = pa.ListArray.from_arrays(
        pa.array(span_offsets, pa.int32()),
        pa.StructArray.from_arrays(
            [pa.array(span_starts, pa.int64()), pa.array(span_ends, pa.int64())],
            names=["start", "end"],
        ),
    )
    blocks_arr = pa.ListArray.from_arrays(
        pa.array(blk_offsets, pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(blk_ids, pa.int32()),
                pa.array(blk_types, pa.string()),
                pa.array(blk_texts, pa.string()),
                pa.array(blk_ld, pa.float32()),
                pa.array(blk_td, pa.float32()),
            ],
            names=["block_id", "type", "text", "link_density", "text_density"],
        ),
    )
    return (
        batch.append_column("extracted_text", pa.array(texts, pa.string()))
        .append_column("spans", spans_arr)
        .append_column("blocks", blocks_arr)
        .append_column("n_blocks", pa.array(n_blocks, pa.int32()))
        .append_column("error", pa.array(errors, pa.string()))
        .append_column(DONE_COL, pa.array(mask, pa.bool_()))
    )


def _passthrough(t: pa.Table) -> pa.Table:
    """Rows this stage does not process: null output columns (O(1)
    null-buffer arrays, no per-row work) + done=False."""
    n = t.num_rows
    return (
        t.append_column("extracted_text", pa.nulls(n, pa.string()))
        .append_column("spans", pa.nulls(n, SPANS_TYPE))
        .append_column("blocks", pa.nulls(n, BLOCKS_TYPE))
        .append_column("n_blocks", pa.nulls(n, pa.int32()))
        .append_column("error", pa.nulls(n, pa.string()))
        .append_column(DONE_COL, pa.array([False] * n, pa.bool_()))
    )


class ExtractBig:
    """First routing stage: the high-memory pool. Processes ONLY rows
    over the oversize threshold; splits each batch and forwards the rest
    untouched (as a separate yielded table — no per-row placeholder or
    payload copies for the small side)."""

    def __init__(self, oversize_bytes: int = OVERSIZE_BYTES, keep_html: bool = False):
        self.oversize_bytes = oversize_bytes
        self.keep_html = keep_html

    def __call__(self, batch: pa.Table):
        big = pc.greater(
            batch.column("html_len"), pa.scalar(self.oversize_bytes)
        )
        if not pc.any(big).as_py():
            yield _passthrough(batch)
            return
        small_part = batch.filter(pc.invert(big))
        big_part = batch.filter(big)
        out = _extract_rows(big_part, [True] * big_part.num_rows)
        if not self.keep_html:
            # the oversized payloads (most of the corpus bytes) are
            # consumed here; null the column so they never cross another
            # stage boundary. (pa.nulls, not pc.if_else — pyarrow 16's
            # if_else emits corrupt offsets for sliced binary arrays.)
            col = _payload_col(out)
            idx = out.schema.get_field_index(col)
            out = out.set_column(
                idx, col, pa.nulls(out.num_rows, out.schema.field(col).type)
            )
        if small_part.num_rows:
            yield _passthrough(small_part)
        yield out


class ExtractSmall:
    """Second routing stage: the main pool. Finishes every row the big
    pool skipped; fully-done batches are forwarded as-is."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        done = batch.column(DONE_COL)
        if pc.all(done).as_py():
            return batch
        done_part = batch.filter(done)
        todo_part = batch.filter(pc.invert(done))
        base = todo_part.drop_columns(list(OUTPUT_COLS) + [DONE_COL])
        redone = _extract_rows(base, [True] * todo_part.num_rows)
        if done_part.num_rows == 0:
            return redone
        # row order within a batch is not semantic (identity = url key)
        return pa.concat_tables([done_part, redone])
