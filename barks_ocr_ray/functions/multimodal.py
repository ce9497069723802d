"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode kernels are STUBBED (no image/audio libraries exist in this
environment — mirrors SURVEY.md §7.3 environment constraint): the
Ray-side plumbing — schema, batch sizing for wide binary rows, actor
signature, output layout — is real and tested. ``fake_decode=True``
substitutes a deterministic payload-derived pseudo-decode so pipelines
can run end-to-end; ``fake_decode=False`` raises NotImplementedError at
the decode boundary, exactly where a real codec would plug in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

FEATURE_DIM = 8

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("media_bytes", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("features", pa.list_(pa.float32(), FEATURE_DIM)),
    ]
)


def decode_media(payload: bytes) -> np.ndarray:
    """The real decode boundary. STUB: no codec libraries available."""
    raise NotImplementedError(
        "media decoding requires an image/audio codec library not present "
        "in this environment; use fake_decode=True for the deterministic "
        "stand-in"
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
                arr = decode_media(payload)  # NotImplementedError boundary
                h, w = arr.shape[:2]
                f = arr.mean(axis=(0, 1))
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
