"""Pure-Python image codecs + the shared per-row media kernels.

The real decode boundary for the multimodal family (SURVEY.md §7.3;
reference decodes page images in src/barks_ocr/pipeline/batch_ocr.py and
utils/preprocessing.py — here the decoded-array contract is the same,
the codecs are reimplemented from the PUBLIC format specs with zero
external dependencies):

- PPM/PGM (netpbm P6/P5 binary, P3/P2 ascii) — trivial header + raster.
- BMP — uncompressed BI_RGB 24/32-bit, BITMAPINFOHEADER, bottom-up or
  top-down rows, 4-byte row padding, BGR order.
- PNG — 8-bit depth, color types 0/2/3/4/6, interlace 0, all five
  scanline filters (None/Sub/Up/Average/Paeth), zlib-inflated IDAT
  (stdlib zlib; no external codec library needed).

Formats that genuinely need a codec LIBRARY (JPEG's DCT/huffman, WebP,
AVIF, any audio/video container) still raise NotImplementedError — that
is the honest remaining stub, now scoped to exactly those formats.

Everything decodes to a (H, W, 3) uint8 RGB ndarray: grayscale
replicates, palette looks up, alpha is dropped. The per-row feature /
resize / frame kernels below are SHARED between the Ray actor-pool
stages (functions/multimodal.py) and the single-process golden builders
(oracle_data.py) — the dual-engine discipline: same kernel, different
orchestration, value-exact comparison.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

# --------------------------------------------------------------------------
# netpbm (PPM/PGM)
# --------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """P6 binary RGB."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr[:, :, :3], dtype=np.uint8
    ).tobytes()


def _pnm_tokens(payload: bytes, n: int, start: int = 2):
    """Yield the first n whitespace tokens after the magic, skipping
    ``#`` comments; returns (tokens, offset_after_last)."""
    toks, i, L = [], start, len(payload)
    while len(toks) < n and i < L:
        c = payload[i : i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":
            while i < L and payload[i : i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < L and payload[j : j + 1] not in b" \t\r\n":
                j += 1
            toks.append(payload[i:j])
            i = j
    return toks, i


def decode_pnm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic in (b"P6", b"P5"):
        toks, off = _pnm_tokens(payload, 3)
        w, h, maxv = (int(t) for t in toks)
        if maxv > 255:
            raise NotImplementedError("16-bit netpbm not supported")
        off += 1  # single whitespace after maxval
        ch = 3 if magic == b"P6" else 1
        raster = np.frombuffer(payload, np.uint8, h * w * ch, off)
        arr = raster.reshape(h, w, ch)
    elif magic in (b"P3", b"P2"):
        ch = 3 if magic == b"P3" else 1
        toks, off = _pnm_tokens(payload, 3)
        w, h, _ = (int(t) for t in toks)
        vals, _ = _pnm_tokens(payload, 3 + h * w * ch)
        arr = np.array(
            [int(v) for v in vals[3:]], dtype=np.uint8
        ).reshape(h, w, ch)
    else:
        raise ValueError("not a netpbm payload")
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    return np.ascontiguousarray(arr)


# --------------------------------------------------------------------------
# BMP (BI_RGB uncompressed, BITMAPINFOHEADER)
# --------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up."""
    h, w = arr.shape[:2]
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    rgb = np.ascontiguousarray(arr[:, :, :3], dtype=np.uint8)
    for y in range(h - 1, -1, -1):  # bottom-up
        body += rgb[y, :, ::-1].tobytes()  # BGR
        body += b"\x00" * pad
    pix_off = 14 + 40
    size = pix_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP compression={compression} bpp={bpp} not supported "
            "(only uncompressed BI_RGB 24/32-bit)"
        )
    h = abs(h_signed)
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, stride * h, pix_off).reshape(
        h, stride
    )[:, : w * ch].reshape(h, w, ch)
    if h_signed > 0:
        rows = rows[::-1]  # bottom-up -> top-down
    return np.ascontiguousarray(rows[:, :, 2::-1])  # BGR(A) -> RGB


# --------------------------------------------------------------------------
# PNG (8-bit, interlace 0)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per pixel by color type
_PNG_CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit RGB (color type 2), stdlib zlib. ``filter_type`` applies
    one scanline filter uniformly (0-4) — 1-4 exist mainly so the
    decoder's defilter paths have roundtrip coverage."""
    h, w = arr.shape[:2]
    rgb = np.ascontiguousarray(arr[:, :, :3], dtype=np.uint8)
    ch, stride = 3, w * 3
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = rgb[y].reshape(-1).astype(np.int32)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            enc = cur.copy()
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                enc[i] = (cur[i] - _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {filter_type}")
        raw += bytes([filter_type]) + enc.astype(np.uint8).tobytes()
        prev = cur
    out = bytearray(_PNG_SIG)

    def chunk(typ: bytes, data: bytes):
        out.extend(struct.pack(">I", len(data)))
        out.extend(typ)
        out.extend(data)
        out.extend(struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    chunk(b"IDAT", zlib.compress(bytes(raw), 9))
    chunk(b"IEND", b"")
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png(payload: bytes) -> np.ndarray:
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, L = 8, len(payload)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= L:
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        pos += 12 + clen
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CH:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace} not supported (8-bit non-interlaced only)"
        )
    ch = _PNG_CH[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — fully vectorized
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — sequential in x, vector per channel lag
            cur = line.copy()
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + _paeth(int(a), int(prev[i]), int(c))) & 0xFF
        else:
            raise ValueError(f"PNG bad filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG palette image missing PLTE")
        return np.ascontiguousarray(palette[px[:, :, 0]])
    if color_type == 0:
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if color_type == 4:
        return np.ascontiguousarray(np.repeat(px[:, :, :1], 3, axis=2))
    return np.ascontiguousarray(px[:, :, :3])  # 2 or 6 (alpha dropped)


# --------------------------------------------------------------------------
# sniff + dispatch — THE decode boundary
# --------------------------------------------------------------------------


def sniff_media(payload: bytes) -> str:
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P6", b"P5", b"P3", b"P2"):
        return "pnm"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    return "unknown"


def decode_media(payload: bytes) -> np.ndarray:
    """Decode an image payload to (H, W, 3) uint8 RGB. PNG/BMP/netpbm
    decode for real (pure Python, public format specs); JPEG/WebP/etc.
    remain the honest NotImplementedError stub — they need a codec
    library this environment does not have."""
    fmt = sniff_media(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "pnm":
        return decode_pnm(payload)
    raise NotImplementedError(
        f"media format {fmt!r} requires a codec library not present in "
        "this environment (JPEG/WebP/AVIF/audio/video); PNG, BMP and "
        "netpbm decode natively — or use fake_decode=True for the "
        "deterministic stand-in"
    )


# --------------------------------------------------------------------------
# shared per-row kernels (pipeline AND golden call these)
# --------------------------------------------------------------------------

FEATURE_DIM = 8


def media_feature_vector(arr: np.ndarray) -> np.ndarray:
    """8-dim image descriptor: per-channel means + stds (float64 math,
    rounded to 6 dp) and the raw (h, w). One IEEE evaluation order —
    the whole array is one row's payload, so pipeline and golden see
    byte-identical inputs and produce bit-identical outputs."""
    a = arr.astype(np.float64)
    means = a.mean(axis=(0, 1))
    stds = a.std(axis=(0, 1))
    h, w = arr.shape[:2]
    f = np.array(
        [means[0], means[1], means[2], stds[0], stds[1], stds[2], h, w],
        dtype=np.float64,
    )
    return np.round(f, 6).astype(np.float32)


def aspect_fit(w: int, h: int, box: int) -> tuple[int, int]:
    """Integer aspect-preserving fit into a box x box square."""
    if w >= h:
        return box, max(1, (h * box) // w)
    return max(1, (w * box) // h), box


def resize_nearest(arr: np.ndarray, box: int) -> np.ndarray:
    """Nearest-neighbour resample into the aspect-fit box — the real
    pixel path the r4 stub stood in for."""
    h, w = arr.shape[:2]
    tw, th = aspect_fit(w, h, box)
    iy = (np.arange(th, dtype=np.int64) * h) // th
    ix = (np.arange(tw, dtype=np.int64) * w) // tw
    return np.ascontiguousarray(arr[iy][:, ix])


def thumb_digest(thumb: np.ndarray) -> str:
    th, tw = thumb.shape[:2]
    return hashlib.blake2b(
        thumb.tobytes() + tw.to_bytes(4, "big") + th.to_bytes(4, "big"),
        digest_size=16,
    ).hexdigest()


#: one pseudo-frame per 4096 decoded pixels (the decoded-array analog of
#: the fake path's one-per-4KiB-of-payload)
_FRAME_PIXELS = 4096
FRAME_INTERVAL_MS = 40  # 25 fps


def frame_count(arr: np.ndarray) -> int:
    return 1 + (arr.shape[0] * arr.shape[1]) // _FRAME_PIXELS


def frame_digest(arr: np.ndarray, idx: int) -> str:
    """Digest of the idx-th sampled 'frame': scanline idx mod H of the
    decoded array (cheap, decode-dependent, deterministic)."""
    row = arr[idx % arr.shape[0]]
    return hashlib.blake2b(
        np.ascontiguousarray(row).tobytes() + idx.to_bytes(8, "big"),
        digest_size=16,
    ).hexdigest()


# --------------------------------------------------------------------------
# content-addressing kernels over DECODED pixels (round 5: these only
# make sense because the decode boundary is real — the same image
# encoded as PNG vs BMP vs PPM has different bytes but identical pixels)
# --------------------------------------------------------------------------


def pixel_digest(arr: np.ndarray) -> str:
    """Digest of the decoded RGB pixel content + dims: the cross-format
    exact-dedup key (byte-level sha256 of the PAYLOAD cannot collapse a
    PNG/BMP re-encode of the same image; this does)."""
    h, w = arr.shape[:2]
    return hashlib.blake2b(
        np.ascontiguousarray(arr).tobytes()
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big"),
        digest_size=16,
    ).hexdigest()


def luma(arr: np.ndarray) -> np.ndarray:
    """Integer Rec.601 luma: (299 R + 587 G + 114 B) // 1000 — exact,
    no float rounding to mirror."""
    a = arr.astype(np.int64)
    return (a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114) // 1000


def dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash (dHash, public perceptual-hash design):
    nearest-sample the integer luma to a 8x9 grid, emit bit 1 where the
    left cell is strictly brighter than its right neighbour, row-major
    MSB-first. All integer — bit-identical across any partitioning."""
    g = luma(arr)
    h, w = g.shape
    iy = (np.arange(8, dtype=np.int64) * h) // 8
    ix = (np.arange(9, dtype=np.int64) * w) // 9
    small = g[iy][:, ix]
    bits = (small[:, :-1] > small[:, 1:]).reshape(-1)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
