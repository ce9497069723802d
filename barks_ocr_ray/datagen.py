"""Deterministic synthetic pages corpus (FIXTURES.md §F1).

One Parquet table of Common-Crawl-style web pages with the exact
`input_hint` shape from BASELINE.json:

    (url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)

Every value is a pure function of ``(seed, row_index)`` — no wall clock, no
global RNG — so pytest fixtures, the bench corpus, and any re-run at any
scale produce byte-identical rows. Mirrors the reference corpus's record
shapes (page payload + metadata; cf. the page-file enumeration at
/root/reference/src/barks_ocr/pipeline/batch_ocr.py:59-62) without using any
external data.

Row classes, assigned by ``logical_id % 10`` (FIXTURES.md F1):
    0-4  plain HTML article (nav/header/footer boilerplate + content paras)
    5    link-farm page (all text inside <a>; golden extraction ~empty)
    6-7  PDF-like payload: b"%SPDF" + JSON layout of text boxes (1 or 2 cols)
    8    oversized HTML article (> OVERSIZE_BYTES; exercises skew routing)
    9    junk/binary payload (no HTML/PDF magic; golden = empty, kind=binary)

Duplicates (~10% of rows): physical row ``i`` with ``i % 10 == 4 and i >= 10``
is a *re-fetch* of logical page ``i - 4`` (class 0, plain article) with a
later ``warc_ts`` and a different content variant — the dedup exercise
(keep max(warc_ts)). A small tie-group (``i % 50 == 14``) re-fetches with an
*equal* ``warc_ts`` to pin the documented tie-break: lexicographically
smallest content sha256 wins.

A slice of articles (``logical_id % 20 == 1``) is encoded latin-1 with a
``<meta charset="iso-8859-1">`` declaration and non-ASCII words, exercising
encoding detection in the sniffer.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta

import pyarrow as pa

SEED = 42
N_HOSTS = 50
OVERSIZE_BYTES = 128 * 1024  # routing threshold; oversized pages exceed this
_EPOCH = datetime(2026, 1, 1, 0, 0, 0)

_WORDS = (
    "duck coin vault adventure square egg nephew luck worry gold barn river "
    "storm treasure map whisker feather umbrella pocket fortune scheme tonic "
    "gadget rocket valley canyon harbor lantern compass anchor meadow orchard "
    "thimble marble walnut copper silver bronze granite pebble summit tunnel "
    "bridge windmill beacon harvest clover badger falcon otter heron juniper "
    "cedar maple aspen willow bramble thicket hollow glade brook delta mesa "
    "plateau prairie tundra lagoon atoll reef dune oasis grove quarry mill "
    "forge anvil chisel plank mast rudder keel sail galley cargo ledger"
).split()

_LATIN1_WORDS = ["café", "naïve", "über", "señor", "crème"]
_LANGS = ["en", "de", "fr", "es", ""]

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _rng(seed: int, *key) -> random.Random:
    return random.Random(f"{seed}:" + ":".join(str(k) for k in key))


def _b36(n: int) -> str:
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    if n == 0:
        return "0"
    out = []
    while n:
        n, r = divmod(n, 36)
        out.append(digits[r])
    return "".join(reversed(out))


def _sentence(rng: random.Random, n_words: int, extra_words=()) -> str:
    ws = [rng.choice(_WORDS) for _ in range(n_words)]
    for w in extra_words:
        ws[rng.randrange(len(ws))] = w
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def url_for(logical_id: int) -> str:
    return f"https://host{logical_id % N_HOSTS}.example/{_b36(logical_id)}"


def _article_html(
    logical_id: int, variant: int, seed: int, oversize: bool
) -> tuple[bytes, str]:
    """Plain-article HTML. Returns (encoded bytes, encoding name)."""
    rng = _rng(seed, "article", logical_id, variant)
    latin1 = logical_id % 20 == 1
    extra = _LATIN1_WORDS if latin1 else ()
    title = _sentence(rng, 3)[:-1]
    headline = _sentence(rng, 5)[:-1]
    n_para = 3 + rng.randrange(4) + variant
    paras = [
        _sentence(rng, 25 + rng.randrange(30), extra_words=extra)
        for _ in range(n_para)
    ]
    nav = " ".join(
        f'<a href="/{w}">{w.capitalize()}</a>'
        for w in rng.sample(_WORDS, 6)
    )
    charset = "iso-8859-1" if latin1 else "utf-8"
    parts = [
        "<html><head>",
        f'<meta charset="{charset}">',
        f"<title>{title}</title>",
        "</head><body>",
        f'<div class="nav">{nav}</div>',
        f'<div class="header"><a href="/">host{logical_id % N_HOSTS}</a> '
        f'<a href="/news">News</a> <a href="/archive">Archive</a></div>',
        f"<h1>{headline}</h1>",
    ]
    parts += [f"<p>{p}</p>" for p in paras]
    if oversize:
        # repeat the paragraph run until the body exceeds the routing threshold
        body_len = sum(len(p) for p in paras)
        reps = max(1, (OVERSIZE_BYTES + 32 * 1024) // max(1, body_len))
        for r in range(reps):
            parts += [f"<p>{p}</p>" for p in paras]
    parts += [
        '<div class="footer"><a href="/privacy">Privacy</a> '
        '<a href="/terms">Terms</a> <a href="/contact">Contact</a> (c)</div>',
        "</body></html>",
    ]
    html = "\n".join(parts)
    return html.encode(charset), charset


def _link_farm_html(logical_id: int, seed: int) -> bytes:
    rng = _rng(seed, "farm", logical_id)
    items = "".join(
        f'<li><a href="/{_b36(rng.randrange(10**6))}">'
        f"{_sentence(rng, 4)[:-1]}</a></li>"
        for _ in range(30)
    )
    return (
        "<html><head><meta charset=\"utf-8\"><title>Links</title></head>"
        f"<body><ul>{items}</ul></body></html>"
    ).encode("utf-8")


def _pdf_payload(logical_id: int, seed: int) -> bytes:
    """%SPDF magic + deterministic JSON layout of text boxes (1-2 columns).

    Stand-in for a PDF page: the layout kernel must emit boxes in reading
    order — per column, by (y_band, x) — the analog of the reference's
    contour precedence sort (/root/reference/scraps/damishshah_comic_book_reader.py:33-37).
    """
    rng = _rng(seed, "pdf", logical_id)
    ncols = 1 if logical_id % 10 == 6 else 2
    width, height = 600, 800
    pages = []
    for p in range(1 + rng.randrange(2)):
        boxes = []
        n_boxes = 6 + rng.randrange(6)
        for b in range(n_boxes):
            col = 0 if ncols == 1 else rng.randrange(2)
            x = 20 + col * (width // 2) + rng.randrange(40)
            y = 30 + (b // ncols) * 90 + rng.randrange(25)
            boxes.append(
                {
                    "x": x,
                    "y": y,
                    "w": width // (2 * ncols),
                    "h": 40,
                    "text": _sentence(rng, 6 + rng.randrange(6))[:-1],
                }
            )
        pages.append({"page": p, "boxes": boxes})
    doc = {"width": width, "height": height, "ncols": ncols, "pages": pages}
    return b"%SPDF" + json.dumps(doc, sort_keys=True).encode("utf-8")


def _junk_payload(logical_id: int, seed: int) -> bytes:
    rng = _rng(seed, "junk", logical_id)
    return b"\x89JNK" + bytes(
        rng.randrange(256) for _ in range(200 + rng.randrange(800))
    )


def _html_for(logical_id: int, variant: int, seed: int) -> bytes:
    cls = logical_id % 10
    if cls == 5:
        return _link_farm_html(logical_id, seed)
    if cls in (6, 7):
        return _pdf_payload(logical_id, seed)
    if cls == 9:
        return _junk_payload(logical_id, seed)
    oversize = cls == 8
    return _article_html(logical_id, variant, seed, oversize)[0]


def page_record(i: int, seed: int = SEED) -> dict:
    """Physical row ``i`` of the corpus — pure function of (seed, i)."""
    is_refetch = i >= 10 and i % 10 == 4
    logical_id = i - 4 if is_refetch else i
    tie = is_refetch and i % 50 == 14
    variant = 2 if tie else (1 if is_refetch else 0)
    ts = _EPOCH + timedelta(seconds=logical_id * 37)
    if is_refetch and not tie:
        ts += timedelta(days=30)
    rng = _rng(seed, "meta", i)
    fallback = _sentence(rng, 12) + " CRAWLER-FALLBACK-NOISE"
    return {
        "url": url_for(logical_id),
        "warc_ts": ts,
        "html": _html_for(logical_id, variant, seed),
        "text": fallback,
        "lang": _LANGS[logical_id % 5],
    }


def pages_batch(start: int, count: int, seed: int = SEED) -> pa.Table:
    recs = [page_record(i, seed) for i in range(start, start + count)]
    return pa.Table.from_pylist(recs, schema=PAGES_SCHEMA)


def pages_table(n: int, seed: int = SEED) -> pa.Table:
    return pages_batch(0, n, seed)


def logical_urls(n: int) -> set[str]:
    """The post-dedup url set for a corpus of ``n`` physical rows."""
    out = set()
    for i in range(n):
        is_refetch = i >= 10 and i % 10 == 4
        out.add(url_for(i - 4 if is_refetch else i))
    return out


def write_pages_corpus_ray(
    out_dir: str, n: int, seed: int = SEED, num_shards: int = 64
) -> str:
    """Generate the corpus in parallel with Ray Data (used by bench for
    the sf0.1-scale corpus): range -> map_batches(row ids -> page rows)
    -> write_parquet. Deterministic per row id regardless of
    partitioning; cached behind a _SUCCESS marker."""
    import os

    import ray.data as rd

    from barks_ocr_ray.context import configure

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    configure()

    def _gen(batch) -> pa.Table:
        ids = batch["id"].tolist() if hasattr(batch["id"], "tolist") else list(batch["id"])
        return pa.Table.from_pylist(
            [page_record(int(i), seed) for i in ids], schema=PAGES_SCHEMA
        )

    (
        rd.range(n, override_num_blocks=num_shards)
        .map_batches(_gen, batch_format="numpy", batch_size=2048)
        .write_parquet(out_dir)
    )
    with open(marker, "w") as f:
        f.write(str(n))
    return out_dir


def write_pages_corpus(
    out_dir: str, n: int, seed: int = SEED, rows_per_file: int = 2000
) -> list[str]:
    """Write the corpus as a directory of Parquet shards (driver-side;
    used by tests and the bench generator). Idempotent layout: shard k
    covers rows [k*rows_per_file, ...) — resumable generation for free."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for k, start in enumerate(range(0, n, rows_per_file)):
        path = os.path.join(out_dir, f"pages-{k:05d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        tbl = pages_batch(start, min(rows_per_file, n - start), seed)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, path)
    return paths


def write_bucketed_pages_corpus(
    out_dir: str, n: int, num_buckets: int, seed: int = SEED
) -> str:
    """Write the corpus laid out by url-hash bucket (bucket=K/ dirs plus
    the ``_bucketing.json`` marker): the staged-input layout that lets
    ``run_resumable``'s chunked mode prune at the read — a resumed chunk
    opens only its own buckets' files instead of re-scanning the corpus."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from barks_ocr_ray.pipelines.resume import write_bucketing_marker
    from barks_ocr_ray.state.manifest import bucket_of

    tbl = pages_batch(0, n, seed)
    buckets = [bucket_of(u, num_buckets) for u in tbl.column("url").to_pylist()]
    tbl = tbl.append_column("__bucket", pa.array(buckets, pa.int64()))
    for b in range(num_buckets):
        part = tbl.filter(pc.equal(tbl.column("__bucket"), b)).drop_columns(
            ["__bucket"]
        )
        if part.num_rows == 0:
            continue
        bdir = os.path.join(out_dir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        path = os.path.join(bdir, "pages-00000.parquet")
        tmp = path + ".tmp"
        pq.write_table(part, tmp, compression="zstd")
        os.replace(tmp, path)
    write_bucketing_marker(out_dir, num_buckets)
    return out_dir


def url_variant(url: str, i: int) -> str:
    """Deterministic crawl-side re-spelling of ``url`` for physical row
    ``i`` — the alias classes a canonicalizer must collapse (case,
    fragments, tracking params, default ports, trailing slash, www.).
    Every variant canonicalizes back to the plain ``url`` form."""
    k = i % 5
    if k == 0:
        return url
    scheme, rest = url.split("://", 1)
    host, _, path = rest.partition("/")
    if k == 1:
        return f"{scheme}://{host.upper()}/{path}#frag{i % 7}"
    if k == 2:
        return f"{url}?utm_source=feed&utm_medium=m{i % 3}"
    if k == 3:
        return f"{scheme}://{host}:443/{path}/"
    return f"{scheme}://www.{host}/{path}"


# ---------------------------------------------------------------------------
# synthetic media corpus (round 5: the REAL decode path's input)
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("fmt", pa.string()),
        ("media", pa.binary()),
    ]
)

_MEDIA_FMTS = ("png", "bmp", "ppm")


def media_image_array(i: int, seed: int = SEED):
    """Deterministic procedural RGB image for media row ``i``: dims in
    16..96 and a gradient + modular-noise pattern, pure function of
    (seed, i), fully vectorized — the image the real codecs encode and
    the decode boundary must reproduce byte-exactly."""
    import hashlib

    import numpy as np

    d = hashlib.blake2b(
        f"{seed}:media:{i}".encode(), digest_size=16
    ).digest()
    w = 16 + d[0] % 81
    h = 16 + d[1] % 81
    a, b, c = d[2] | 1, d[3] | 1, d[4]
    yy, xx = np.ogrid[0:h, 0:w]
    base = xx * a + yy * b + c
    r = (base % 251).astype(np.uint8)
    g = ((base * 7 + d[5]) % 241).astype(np.uint8)
    bl = ((xx * yy + d[6]) % 253).astype(np.uint8)
    return np.dstack(
        [r, g, np.broadcast_to(bl, (h, w))]
    ).astype(np.uint8)


def media_record(i: int, seed: int = SEED) -> dict:
    """Media corpus row ``i``: the procedural image encoded with a real
    pure-Python codec, format round-robin png/bmp/ppm."""
    from barks_ocr_ray.functions.codecs import (
        encode_bmp,
        encode_png,
        encode_ppm,
    )

    arr = media_image_array(i, seed)
    fmt = _MEDIA_FMTS[i % 3]
    enc = {"png": encode_png, "bmp": encode_bmp, "ppm": encode_ppm}[fmt]
    return {
        "url": f"media://img/{_b36(i)}.{fmt}",
        "fmt": fmt,
        "media": enc(arr),
    }


def media_table(n: int, seed: int = SEED) -> pa.Table:
    return pa.Table.from_pylist(
        [media_record(i, seed) for i in range(n)], schema=MEDIA_SCHEMA
    )


def media_aug_record(i: int, seed: int = SEED) -> dict:
    """Augmented media corpus row with PLANTED duplicates (the media
    dedup exercise; deterministic):

    * ``i % 5 == 4`` (i >= 5): cross-format EXACT pixel dup — the image
      of row i-4 re-encoded in a different codec (same pixels,
      different bytes/format/url).
    * else ``i % 7 == 6`` (i >= 7): NEAR dup — row i-6's image with 3
      deterministic single-pixel high-bit flips (perceptual-hash
      distance small, pixel digest different).
    * else: the base procedural image of row i.
    """
    import numpy as np  # noqa: F401  (kept local: driver-side helper)

    from barks_ocr_ray.functions.codecs import (
        encode_bmp,
        encode_png,
        encode_ppm,
    )

    if i >= 5 and i % 5 == 4:
        src = i - 4
        arr = media_image_array(src, seed)
        fmt = _MEDIA_FMTS[(src + 1) % 3]
    elif i >= 7 and i % 7 == 6:
        src = i - 6
        arr = media_image_array(src, seed).copy()
        h, w = arr.shape[:2]
        for k in range(3):
            arr[(src + k) % h, (src * 3 + k) % w, 0] ^= 0x80
        fmt = _MEDIA_FMTS[i % 3]
    else:
        arr = media_image_array(i, seed)
        fmt = _MEDIA_FMTS[i % 3]
    enc = {"png": encode_png, "bmp": encode_bmp, "ppm": encode_ppm}[fmt]
    return {
        "url": f"media://aug/{_b36(i)}.{fmt}",
        "fmt": fmt,
        "media": enc(arr),
    }


def media_aug_table(n: int, seed: int = SEED) -> pa.Table:
    return pa.Table.from_pylist(
        [media_aug_record(i, seed) for i in range(n)], schema=MEDIA_SCHEMA
    )
