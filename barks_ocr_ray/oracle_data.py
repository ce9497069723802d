"""Golden parquet files for the DuckDB oracle of the non-SQL pipelines.

The flagship extraction arc runs over a corpus SYNTHESIZED by datagen.py
(the pages table is not part of the TPC-H-ish testdata), so its oracle
cannot be written against the sf views. Instead, the single-process
golden extractor (extract/golden.py — the dual-engine second opinion,
SURVEY.md §5) is materialized ONCE to a parquet under /tmp and the oracle
SQL simply reads it: the driver then value-compares the distributed
pipeline against the sequential reference run, which pins the dedup
winners, oversize routing, encoding handling and text assembly of the
Ray pipeline — not just its row count.

The oracle-gated extraction corpora are FIXED-SIZE by design (they do not
scale with sf_dir) so the embedded parquet paths in the static SQL are
valid at any sf the driver picks; bench uses its own scaled corpus.

Everything here is a pure function of the datagen seed: regenerating a
golden file yields byte-identical content, so exists-checks are safe.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

ORACLE_DIR = "/tmp/barks_oracle"

#: fixed corpus sizes for the oracle-gated synthesized-corpus queries
Q24_N = 1000  # flagship extraction pipeline
Q34_N = 400  # extraction issues (+ dismissals)
Q25_N = 200  # multimodal feature plumbing


def _atomic_write(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, path)


def extraction_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_extraction_n{n}.parquet")


def ensure_extraction_golden(n: int) -> str:
    """Materialize the single-process golden extraction of the n-row
    corpus (url, warc_ts, kind, html_len, n_blocks, content_hash,
    extracted_text, error)."""
    path = extraction_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.extract.golden import golden_corpus

    gold = golden_corpus(n)
    urls = sorted(gold)
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [gold[u]["warc_ts"] for u in urls], pa.timestamp("us")
            ),
            "kind": pa.array([gold[u]["kind"] for u in urls], pa.string()),
            "html_len": pa.array(
                [gold[u]["html_len"] for u in urls], pa.int64()
            ),
            "n_blocks": pa.array(
                [gold[u]["n_blocks"] for u in urls], pa.int64()
            ),
            "content_hash": pa.array(
                [gold[u]["content_hash"] for u in urls], pa.string()
            ),
            "extracted_text": pa.array(
                [gold[u]["extracted_text"] for u in urls], pa.string()
            ),
            # the golden kernel never dead-letters the synthesized corpus;
            # the column exists so the issue oracle can express the
            # extract_error predicate
            "error": pa.array([None] * len(urls), pa.string()),
        }
    )
    _atomic_write(table, path)
    return path


def media_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_media_real_n{n}.parquet")


def ensure_media_golden(n: int) -> str:
    """Single-process golden of the multimodal REAL-decode over the
    n-row media corpus (url, media_bytes, width, height, features) —
    pins the Ray-side binary-column plumbing AND the pure-Python codec
    boundary value-exactly (dual-engine: shared per-row kernels from
    functions/codecs.py, orchestration replayed as a plain loop)."""
    path = media_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.datagen import media_record
    from barks_ocr_ray.functions.codecs import (
        FEATURE_DIM,
        decode_media,
        media_feature_vector,
    )

    urls, sizes, widths, heights, feats = [], [], [], [], []
    for i in range(n):
        rec = media_record(i)
        payload = rec["media"]
        arr = decode_media(payload)
        h, w = arr.shape[:2]
        urls.append(rec["url"])
        sizes.append(len(payload))
        widths.append(w)
        heights.append(h)
        feats.append(media_feature_vector(arr).tolist())
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "media_bytes": pa.array(sizes, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "features": pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)),
        }
    )
    _atomic_write(table, path)
    return path


def resize_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_resize_real_n{n}.parquet")


def ensure_resize_golden(n: int) -> str:
    """Single-process golden of the REAL resize stage: decode via the
    pure-Python codecs, nearest-neighbour resample into the aspect-fit
    box, digest of the actual thumbnail pixels."""
    path = resize_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.datagen import media_record
    from barks_ocr_ray.functions.codecs import (
        decode_media,
        resize_nearest,
        thumb_digest,
    )
    from barks_ocr_ray.functions.multimodal import THUMB_BOX

    urls, sw, sh, ow, oh, digests = [], [], [], [], [], []
    for i in range(n):
        rec = media_record(i)
        arr = decode_media(rec["media"])
        h, w = arr.shape[:2]
        thumb = resize_nearest(arr, THUMB_BOX)
        th, tw = thumb.shape[:2]
        urls.append(rec["url"])
        sw.append(w); sh.append(h); ow.append(tw); oh.append(th)
        digests.append(thumb_digest(thumb))
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "src_width": pa.array(sw, pa.int32()),
            "src_height": pa.array(sh, pa.int32()),
            "out_width": pa.array(ow, pa.int32()),
            "out_height": pa.array(oh, pa.int32()),
            "thumb_digest": pa.array(digests, pa.string()),
        }
    )
    _atomic_write(table, path)
    return path


def frames_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_frames_real_n{n}.parquet")


def ensure_frames_golden(n: int) -> str:
    """Single-process golden of the frame-sampling explode through the
    REAL decode boundary (frame count from decoded pixels, digests from
    decoded scanlines)."""
    path = frames_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.datagen import media_record
    from barks_ocr_ray.functions.codecs import (
        FRAME_INTERVAL_MS,
        decode_media,
        frame_count,
        frame_digest,
    )

    urls, idxs, ts, digests = [], [], [], []
    for i in range(n):
        rec = media_record(i)
        arr = decode_media(rec["media"])
        taken = 0
        for idx in range(0, frame_count(arr), 5):
            if taken >= 8:
                break
            urls.append(rec["url"])
            idxs.append(idx)
            ts.append(idx * FRAME_INTERVAL_MS)
            digests.append(frame_digest(arr, idx))
            taken += 1
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "ts_ms": pa.array(ts, pa.int64()),
            "frame_digest": pa.array(digests, pa.string()),
        }
    )
    _atomic_write(table, path)
    return path


def validation_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_validation_n{n}.parquet")


def ensure_validation_golden(
    n: int, sample_frac: float = 0.2, seed: int = 7, threshold: float = 0.6
) -> str:
    """Single-process golden of the validation stage: the deterministic
    url-hash sample of the golden extraction, re-extracted by the
    independent second engine and similarity-scored."""
    path = validation_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.datagen import page_record
    from barks_ocr_ray.extract.golden import golden_corpus
    from barks_ocr_ray.pipelines.validate import (
        sample_mask,
        similarity,
        strip_tags,
    )

    gold = golden_corpus(n)
    # winning payload per url, selected by the same rank rule the golden
    # extraction uses (keep max dedup rank)
    from barks_ocr_ray.extract.reference import content_sha256
    from barks_ocr_ray.stages.sniff_stage import make_dedup_rank

    from datetime import datetime

    payloads: dict[str, tuple[str, bytes]] = {}
    for i in range(n):
        rec = page_record(i)
        ts = int(
            (rec["warc_ts"] - datetime(1970, 1, 1)).total_seconds() * 1_000_000
        )
        rank = make_dedup_rank(ts, content_sha256(rec["html"]))
        cur = payloads.get(rec["url"])
        if cur is None or rank > cur[0]:
            payloads[rec["url"]] = (rank, rec["html"])
    payloads = {u: p for u, (_, p) in payloads.items()}
    urls = sorted(gold)
    keep = sample_mask(urls, sample_frac, seed)
    out_u, out_k, out_s, out_f = [], [], [], []
    for u, k in zip(urls, keep):
        if not k:
            continue
        g = gold[u]
        stripped = strip_tags(payloads[u])
        score = similarity(g["extracted_text"] or "", stripped)
        out_u.append(u)
        out_k.append(g["kind"])
        out_s.append(score)
        out_f.append(
            g["kind"] == "html"
            and bool(g["extracted_text"])
            and score < threshold
        )
    table = pa.table(
        {
            "url": pa.array(out_u, pa.string()),
            "kind": pa.array(out_k, pa.string()),
            "score": pa.array(out_s, pa.float64()),
            "flagged": pa.array(out_f, pa.bool_()),
        }
    )
    _atomic_write(table, path)
    return path


#: sf dirs the near-dup/ANN goldens are materialized for — the fast
#: local loop and the driver's correctness scale. These tables DO vary
#: with sf (unlike the fixed synthesized corpora above), so every golden
#: row carries a corpus fingerprint the static SQL recomputes from its
#: registered view (sum(hash(col)) — DuckDB computes the tag on BOTH
#: sides, so it is stable by construction); an unknown sf selects zero
#: golden rows and the comparison fails loudly rather than silently.
NEARDUP_SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")

#: the hashed column per table for the corpus fingerprint
TAG_COL = {
    "documents": "text",
    "embeddings": "embedding",
    "events": "event_id",
}


def link_graph_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_link_graph_n{n}.parquet")


def ensure_link_graph_golden(n: int) -> str:
    """Single-process golden of the outlink graph top-k over the n-row
    corpus (golden_dedup.golden_link_graph replay)."""
    path = link_graph_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.datagen import pages_table
    from barks_ocr_ray.golden_dedup import golden_link_graph

    _atomic_write(golden_link_graph(pages_table(n)), path)
    return path


def anchor_terms_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_anchor_terms_n{n}.parquet")


def ensure_anchor_terms_golden(n: int) -> str:
    """Single-process golden of the anchor-text term index top-k."""
    path = anchor_terms_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.datagen import pages_table
    from barks_ocr_ray.golden_dedup import golden_anchor_terms

    _atomic_write(golden_anchor_terms(pages_table(n)), path)
    return path


def hits_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_hits_n{n}.parquet")


def ensure_hits_golden(n: int) -> str:
    """Single-process golden of fixed-point HITS over the n-row pages
    corpus's outlink graph (golden_dedup.golden_hits replay)."""
    path = hits_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.datagen import pages_table
    from barks_ocr_ray.golden_dedup import golden_hits

    _atomic_write(golden_hits(pages_table(n)), path)
    return path


def canonical_dedup_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_canonical_dedup_n{n}.parquet")


def ensure_canonical_dedup_golden(n: int) -> str:
    """Single-process golden of canonical-URL dedup over the
    alias-decorated n-row crawl (golden_dedup.golden_canonical_dedup)."""
    path = canonical_dedup_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.datagen import pages_table
    from barks_ocr_ray.golden_dedup import golden_canonical_dedup

    _atomic_write(golden_canonical_dedup(pages_table(n)), path)
    return path


def frontier_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_frontier_n{n}.parquet")


def ensure_frontier_golden(n: int) -> str:
    """Single-process golden of crawl-frontier discovery per host."""
    path = frontier_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.datagen import pages_table
    from barks_ocr_ray.golden_dedup import golden_frontier

    _atomic_write(golden_frontier(pages_table(n)), path)
    return path


def corpus_tag_sql(table: str) -> str:
    """The fingerprint subquery the golden-backed oracle SQL embeds."""
    return (
        f"(SELECT CAST(sum(hash({TAG_COL[table]})) AS VARCHAR) FROM {table})"
    )


def neardup_golden_path(name: str) -> str:
    return os.path.join(ORACLE_DIR, f"golden_{name}.parquet")


def ensure_neardup_golden(name: str, table: str, builder) -> str:
    """Materialize the single-process golden of one near-dup/ANN/sketch
    query (golden_dedup.py) for every NEARDUP_SF_DIRS corpus, each slice
    tagged with its DuckDB corpus fingerprint."""
    path = neardup_golden_path(name)
    if os.path.exists(path):
        return path
    import duckdb
    import pyarrow.parquet as pq

    parts = []
    for sf_dir in NEARDUP_SF_DIRS:
        src = os.path.join(sf_dir, f"{table}.parquet")
        out = builder(pq.read_table(src))
        tag = duckdb.sql(
            f"SELECT CAST(sum(hash({TAG_COL[table]})) AS VARCHAR) "
            f"FROM read_parquet('{src}')"
        ).fetchone()[0]
        parts.append(
            out.append_column(
                "corpus_tag", pa.array([tag] * out.num_rows, pa.string())
            )
        )
    _atomic_write(pa.concat_tables(parts), path)
    return path


def ensure_neardup_goldens() -> dict[str, str]:
    """All nine near-dup/ANN/sketch goldens (each builder runs in well
    under a second per corpus at these sfs — measured 0.4 s total)."""
    from barks_ocr_ray import golden_dedup as g
    from barks_ocr_ray.functions.selection import (
        golden_max_coverage as _golden_max_coverage,
    )

    return {
        "q19": ensure_neardup_golden(
            "minhash_pairs", "documents",
            lambda t: g.golden_minhash_pairs(t, threshold=0.4),
        ),
        "q20": ensure_neardup_golden(
            "simhash_pairs", "documents",
            lambda t: g.golden_simhash_pairs(t, max_hamming=6),
        ),
        "q22": ensure_neardup_golden(
            "embedding_pairs", "embeddings",
            lambda t: g.golden_embedding_pairs(t, threshold=0.8),
        ),
        "q23": ensure_neardup_golden(
            "lsh_topk", "embeddings",
            lambda t: g.golden_lsh_topk(t, list(range(8)), k=10),
        ),
        "q33": ensure_neardup_golden(
            "fuzzy_pairing", "documents",
            lambda t: g.golden_fuzzy_pairing(t, min_ratio=0.3),
        ),
        "q35": ensure_neardup_golden(
            "dup_clusters", "documents",
            lambda t: g.golden_dup_clusters(
                g.golden_minhash_pairs(t, threshold=0.4)
            ),
        ),
        "q48": ensure_neardup_golden(
            "ivf_topk", "embeddings",
            lambda t: g.golden_ivf_topk(t, list(range(8)), k=10),
        ),
        "q67": ensure_neardup_golden(
            "hll_distinct", "documents",
            lambda t: g.golden_hll_distinct(t, "text"),
        ),
        "q75": ensure_neardup_golden(
            "semdedup", "embeddings",
            lambda t: g.golden_semdedup(t, threshold=0.95, n_clusters=16),
        ),
        "q85": ensure_neardup_golden(
            "cms_counts", "documents",
            lambda t: g.golden_cms_counts(t, "text"),
        ),
        "q102": ensure_neardup_golden(
            "hll_grouped", "events",
            lambda t: g.golden_hll_grouped(t, "event_type", "user_id"),
        ),
        "q107": ensure_neardup_golden(
            "pq_topk", "embeddings",
            lambda t: g.golden_pq_topk(t, list(range(8)), k=10),
        ),
        "q126": ensure_neardup_golden(
            "kmeans", "embeddings",
            lambda t: g.golden_kmeans(t, k=8, rounds=5),
        ),
        "q131": ensure_neardup_golden(
            "bpe_merges", "documents",
            lambda t: g.golden_bpe_merges(t, n_merges=12),
        ),
        "q132": ensure_neardup_golden(
            "bpe_encode", "documents",
            lambda t: g.golden_bpe_encode_stats(t, n_merges=12),
        ),
        "q136": ensure_neardup_golden(
            "inc_minhash", "documents",
            lambda t: g.golden_incremental_minhash(t, threshold=0.4),
        ),
        "q159": ensure_neardup_golden(
            "comp_ratio", "documents", g.golden_compression_stats
        ),
        "q182": ensure_neardup_golden(
            "mmr_topk", "embeddings",
            lambda t: g.golden_mmr_topk(t, list(range(8))),
        ),
        "q204": ensure_neardup_golden(
            "max_coverage", "documents",
            lambda t: _golden_max_coverage(t, k=10),
        ),
        "q247": ensure_neardup_golden(
            "int8_quant", "embeddings", g.golden_int8_quant
        ),
        "q248": ensure_neardup_golden(
            "cdc_dedup", "documents", g.golden_cdc_stats
        ),
        "q249": ensure_neardup_golden(
            "pca_top", "embeddings", g.golden_pca_top
        ),
        "q256": ensure_neardup_golden(
            "jl_distortion", "embeddings", g.golden_jl_distortion
        ),
        "q277": ensure_neardup_golden(
            "span_corruption", "documents", g.golden_span_corruption
        ),
        "q278": ensure_neardup_golden(
            "bpe_fertility", "documents", g.golden_bpe_fertility
        ),
        "q279": ensure_neardup_golden(
            "lz_complexity", "events", g.golden_lz_complexity
        ),
        "q282": ensure_neardup_golden(
            "silhouette", "embeddings", g.golden_silhouette
        ),
        "q284": ensure_neardup_golden(
            "self_repeat", "documents", g.golden_self_repeat
        ),
        "q291": ensure_neardup_golden(
            "neardup_lcs", "documents", g.golden_neardup_lcs
        ),
        "q294": ensure_neardup_golden(
            "alias_sampler", "documents", g.golden_alias_sampler
        ),
        "q304": ensure_neardup_golden(
            "huffman_lengths", "documents", g.golden_huffman_lengths
        ),
    }


Q298_N = 150  # augmented media corpus (planted cross-format/near dups)
Q299_HAMMING_MAX = 7  # 8 bands x 8 bits: dist <= 7 => some band exact


def media_dedup_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_media_dedup_n{n}.parquet")


def ensure_media_dedup_golden(n: int) -> str:
    """Single-process golden of cross-format pixel dedup: decode every
    augmented-corpus payload through the REAL codecs, group by decoded
    pixel digest, min-url winner + copy count per group."""
    path = media_dedup_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.datagen import media_aug_record
    from barks_ocr_ray.functions.codecs import decode_media, pixel_digest

    groups: dict = {}
    for i in range(n):
        rec = media_aug_record(i)
        d = pixel_digest(decode_media(rec["media"]))
        g = groups.setdefault(d, [0, None])
        g[0] += 1
        if g[1] is None or rec["url"] < g[1]:
            g[1] = rec["url"]
    keys = sorted(groups)
    table = pa.table(
        {
            "pixel_digest": pa.array(keys, pa.string()),
            "n_copies": pa.array([groups[k][0] for k in keys], pa.int64()),
            "winner_url": pa.array(
                [groups[k][1] for k in keys], pa.string()
            ),
        }
    )
    _atomic_write(table, path)
    return path


def media_phash_golden_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"golden_media_phash_n{n}.parquet")


def ensure_media_phash_golden(n: int) -> str:
    """Single-process golden of perceptual-hash near-dup pairs: brute
    all-pairs Hamming over dhash64 of the decoded images (exact; the
    distributed 8x8-bit banding is COMPLETE for dist <= 7 by
    pigeonhole, so banded results must equal this)."""
    path = media_phash_golden_path(n)
    if os.path.exists(path):
        return path
    from barks_ocr_ray.datagen import media_aug_record
    from barks_ocr_ray.functions.codecs import (
        decode_media,
        dhash64,
        hamming64,
    )

    items = []
    for i in range(n):
        rec = media_aug_record(i)
        items.append((rec["url"], dhash64(decode_media(rec["media"]))))
    items.sort()
    a_out, b_out, hd = [], [], []
    for x in range(len(items)):
        for y in range(x + 1, len(items)):
            d = hamming64(items[x][1], items[y][1])
            if d <= Q299_HAMMING_MAX:
                a_out.append(items[x][0])
                b_out.append(items[y][0])
                hd.append(d)
    table = pa.table(
        {
            "url_a": pa.array(a_out, pa.string()),
            "url_b": pa.array(b_out, pa.string()),
            "hamming": pa.array(hd, pa.int64()),
        }
    )
    _atomic_write(table, path)
    return path


Q310_BUCKETS = 16


def lineage_golden_path(n: int) -> str:
    return os.path.join(
        ORACLE_DIR, f"golden_lineage_n{n}_b{Q310_BUCKETS}.parquet"
    )


def ensure_lineage_golden(n: int) -> str:
    """Single-process golden of the per-partition lineage manifests
    (north rule: partition id, row count, order-insensitive content
    hash): bucket the golden extraction's winner urls with the SHARED
    bucket_of/combine_hashes kernels."""
    path = lineage_golden_path(n)
    if os.path.exists(path):
        return path
    import pyarrow.parquet as pq

    from barks_ocr_ray.state.manifest import bucket_of, combine_hashes

    gold = pq.read_table(
        ensure_extraction_golden(n), columns=["url", "content_hash"]
    )
    per_bucket: dict[int, list] = {b: [] for b in range(Q310_BUCKETS)}
    for u, h in zip(
        gold.column("url").to_pylist(), gold.column("content_hash").to_pylist()
    ):
        per_bucket[bucket_of(u, Q310_BUCKETS)].append(h)
    table = pa.table(
        {
            "bucket": pa.array(range(Q310_BUCKETS), pa.int64()),
            "n_rows": pa.array(
                [len(per_bucket[b]) for b in range(Q310_BUCKETS)], pa.int64()
            ),
            "content_hash": pa.array(
                [
                    combine_hashes(per_bucket[b])
                    for b in range(Q310_BUCKETS)
                ],
                pa.string(),
            ),
        }
    )
    _atomic_write(table, path)
    return path


def ensure_all() -> dict[str, str]:
    """Materialize every golden the oracle SQL references (idempotent;
    called from the registry build so the files exist regardless of
    whether the driver runs the Ray query or the SQL first)."""
    out = {
        "q24": ensure_extraction_golden(Q24_N),
        "q34": ensure_extraction_golden(Q34_N),
        "q25": ensure_media_golden(Q25_N),
        "q49": ensure_frames_golden(Q25_N),
        "q50": ensure_resize_golden(Q25_N),
        "q26": ensure_validation_golden(Q34_N),
        "q161": ensure_link_graph_golden(Q24_N),
        "q162": ensure_anchor_terms_golden(Q24_N),
        "q163": ensure_hits_golden(Q24_N),
        "q164": ensure_canonical_dedup_golden(Q24_N),
        "q168": ensure_frontier_golden(Q24_N),
        "q298": ensure_media_dedup_golden(Q298_N),
        "q310": ensure_lineage_golden(Q24_N),
        "q299": ensure_media_phash_golden(Q298_N),
    }
    out.update(ensure_neardup_goldens())
    return out
