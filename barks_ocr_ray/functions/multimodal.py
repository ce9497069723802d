"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode boundary is REAL as of round 5: ``fake_decode=False``
dispatches to the pure-Python PNG/BMP/netpbm codecs in
functions/codecs.py (public format specs, stdlib zlib — mirrors the
reference's actual image decode at
/root/reference/src/barks_ocr/pipeline/batch_ocr.py:119-122 and
utils/preprocessing.py:6-22), and only formats that genuinely need a
codec LIBRARY (JPEG/WebP/audio/video) still raise NotImplementedError.
``fake_decode=True`` keeps the payload-digest pseudo-decode for
arbitrary binary columns (e.g. running the stage over HTML payloads).
The per-row feature/resize/frame kernels are SHARED with the
single-process golden builders (oracle_data.py) — dual-engine,
value-exact.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from barks_ocr_ray.functions.codecs import (
    FEATURE_DIM,
    decode_media,
    frame_count,
    frame_digest,
    media_feature_vector,
    resize_nearest,
    thumb_digest,
)

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("media_bytes", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("features", pa.list_(pa.float32(), FEATURE_DIM)),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic pseudo-decode: dimensions + features derived from a
    blake2 digest of the payload (pure function of the bytes)."""
    d = hashlib.blake2b(payload, digest_size=4 + 4 * FEATURE_DIM).digest()
    width = 64 + int.from_bytes(d[0:2], "big") % 1024
    height = 64 + int.from_bytes(d[2:4], "big") % 1024
    feats = np.frombuffer(d[4:], dtype=np.uint32).astype(np.float32)
    feats = np.round(feats / np.float32(2**32), 6)
    return width, height, feats


class MediaFeatureExtractor:
    """Actor-pool stage over a binary media column. Keep ``batch_size``
    SMALL when payloads are large (batch bytes = batch_size x payload
    size must fit the worker heap — SURVEY.md memory-aware rule)."""

    def __init__(self, payload_col: str = "html", fake_decode: bool = True):
        self.payload_col = payload_col
        self.fake_decode = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        widths, heights, feats, sizes = [], [], [], []
        for s in batch.column(self.payload_col):
            payload = s.as_py() or b""
            sizes.append(len(payload))
            if self.fake_decode:
                w, h, f = _fake_decode(payload)
            else:
                arr = decode_media(payload)  # real codec dispatch
                h, w = arr.shape[:2]
                f = media_feature_vector(arr)
            widths.append(w)
            heights.append(h)
            feats.append(f.tolist())
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(sizes, pa.int64()),
                pa.array(widths, pa.int32()),
                pa.array(heights, pa.int32()),
                pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)),
            ],
            schema=MEDIA_FEATURES_SCHEMA,
        )


def media_features(
    pages: Dataset,
    *,
    payload_col: str = "html",
    fake_decode: bool = True,
    batch_size: int = 16,
    concurrency: int = 4,
) -> Dataset:
    return pages.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={
            "payload_col": payload_col,
            "fake_decode": fake_decode,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


# --- resize (aspect-fit thumbnail) ----------------------------------------

THUMB_BOX = 128

RESIZE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("src_width", pa.int32()),
        ("src_height", pa.int32()),
        ("out_width", pa.int32()),
        ("out_height", pa.int32()),
        ("thumb_digest", pa.string()),
    ]
)


def aspect_fit(w: int, h: int, box: int = THUMB_BOX) -> tuple[int, int]:
    """Integer aspect-preserving fit into a box x box square (the real
    resize geometry; pixel resampling is the stubbed part)."""
    if w >= h:
        return box, max(1, (h * box) // w)
    return max(1, (w * box) // h), box


class MediaResizer:
    """Actor-pool resize stage: geometry is computed for real; the pixel
    resample is the stubbed decode boundary (fake mode emits a
    deterministic digest standing in for the thumbnail bytes)."""

    def __init__(
        self, payload_col: str = "html", box: int = THUMB_BOX,
        fake_decode: bool = True,
    ):
        self.payload_col = payload_col
        self.box = box
        self.fake_decode = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        sw, sh, ow, oh, digests = [], [], [], [], []
        for s in batch.column(self.payload_col):
            payload = s.as_py() or b""
            if self.fake_decode:
                w, h, _ = _fake_decode(payload)
                tw, th = aspect_fit(w, h, self.box)
                digest = hashlib.blake2b(
                    payload + tw.to_bytes(4, "big") + th.to_bytes(4, "big"),
                    digest_size=16,
                ).hexdigest()
            else:
                arr = decode_media(payload)  # real codec dispatch
                h, w = arr.shape[:2]
                thumb = resize_nearest(arr, self.box)  # real pixel path
                th, tw = thumb.shape[:2]
                digest = thumb_digest(thumb)
            sw.append(w); sh.append(h); ow.append(tw); oh.append(th)
            digests.append(digest)
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(sw, pa.int32()),
                pa.array(sh, pa.int32()),
                pa.array(ow, pa.int32()),
                pa.array(oh, pa.int32()),
                pa.array(digests, pa.string()),
            ],
            schema=RESIZE_SCHEMA,
        )


def media_resize(
    pages: Dataset,
    *,
    payload_col: str = "html",
    box: int = THUMB_BOX,
    fake_decode: bool = True,
    batch_size: int = 16,
    concurrency: int = 4,
) -> Dataset:
    return pages.map_batches(
        MediaResizer,
        fn_constructor_kwargs={
            "payload_col": payload_col,
            "box": box,
            "fake_decode": fake_decode,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


# --- frame sampling (video-style explode) ---------------------------------

FRAME_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("frame_idx", pa.int64()),
        ("ts_ms", pa.int64()),
        ("frame_digest", pa.string()),
    ]
)

#: deterministic pseudo frame count: one frame per 4 KiB of payload
_FRAME_BYTES = 4096
_FRAME_INTERVAL_MS = 40  # 25 fps


def fake_frame_count(payload: bytes) -> int:
    return 1 + len(payload) // _FRAME_BYTES


class FrameSampler:
    """Explode stage: one media row -> every ``stride``-th frame (capped
    at ``max_frames``) as its own row. Output rows outnumber input rows,
    so batches stay SMALL and the payload column is dropped at this
    stage — frames, not source bytes, cross the next exchange."""

    def __init__(
        self, payload_col: str = "html", stride: int = 5,
        max_frames: int = 8, fake_decode: bool = True,
    ):
        self.payload_col = payload_col
        self.stride = stride
        self.max_frames = max_frames
        self.fake_decode = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls_out, idxs, ts, digests = [], [], [], []
        for url, s in zip(
            batch.column("url").to_pylist(), batch.column(self.payload_col)
        ):
            payload = s.as_py() or b""
            arr = None
            if self.fake_decode:
                n = fake_frame_count(payload)
            else:
                arr = decode_media(payload)  # real codec dispatch
                n = frame_count(arr)
            taken = 0
            for idx in range(0, n, self.stride):
                if taken >= self.max_frames:
                    break
                urls_out.append(url)
                idxs.append(idx)
                ts.append(idx * _FRAME_INTERVAL_MS)
                digests.append(
                    frame_digest(arr, idx)
                    if arr is not None
                    else hashlib.blake2b(
                        payload + idx.to_bytes(8, "big"), digest_size=16
                    ).hexdigest()
                )
                taken += 1
        return pa.Table.from_arrays(
            [
                pa.array(urls_out, pa.string()),
                pa.array(idxs, pa.int64()),
                pa.array(ts, pa.int64()),
                pa.array(digests, pa.string()),
            ],
            schema=FRAME_SCHEMA,
        )


def frame_sample(
    pages: Dataset,
    *,
    payload_col: str = "html",
    stride: int = 5,
    max_frames: int = 8,
    fake_decode: bool = True,
    batch_size: int = 16,
    concurrency: int = 4,
) -> Dataset:
    return pages.map_batches(
        FrameSampler,
        fn_constructor_kwargs={
            "payload_col": payload_col,
            "stride": stride,
            "max_frames": max_frames,
            "fake_decode": fake_decode,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
