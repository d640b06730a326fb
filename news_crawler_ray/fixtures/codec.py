"""Pure-Python image codecs for the synthetic page-store.

The sandbox has no PIL/imageio, so the page-store's ``bytes`` column is
produced by two self-contained codecs:

* ``"png"``  — a minimal but REAL PNG writer/reader (RGB8, filter 0,
  zlib). Lossless: decode(encode(px)) is byte-exact.
* ``"jpeg"`` — a clearly-marked STAND-IN for a lossy codec: deterministic
  6-bit-per-channel quantization behind a private container format
  (magic ``QIM1``). It is genuinely lossy (PSNR ~46 dB), which exercises
  the per-row invariant from BASELINE.json input_hint (PSNR >= 40 dB for
  lossy formats) without a real JPEG library. Swapping in libjpeg later
  only changes this module.

Also provides ``phash64`` — an average-hash perceptual digest (8x8
block-mean grayscale, 64-bit), used for the ``phash:int64`` column.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QIM_MAGIC = b"QIM1"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real RGB8 PNG (filter 0)."""
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), px.reshape(h, w * 3)], axis=1
    ).tobytes()  # each scanline prefixed by filter byte 0
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`encode_png` (RGB8, filter 0/1/2)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only RGB8 supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * 3 + 1
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride)
    filters, body = rows[:, 0], rows[:, 1:].copy()
    if np.any(filters == 1):  # Sub filter
        for y in np.nonzero(filters == 1)[0]:
            line = body[y].reshape(w, 3)
            for x in range(1, w):
                line[x] = line[x] + line[x - 1]
    if np.any(filters == 2):  # Up filter
        for y in np.nonzero(filters == 2)[0]:
            if y > 0:
                body[y] = body[y] + body[y - 1]
    if np.any(filters > 2):
        raise ValueError("unsupported PNG filter")
    return body.reshape(h, w, 3)


def encode_lossy(px: np.ndarray) -> bytes:
    """STUB lossy codec (JPEG stand-in): 6-bit/channel quantization.

    Deterministic and genuinely lossy (PSNR ~46 dB on natural noise),
    so the PSNR>=40 invariant path is exercised for real. Replace with
    libjpeg when available.
    """
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = px.shape[:2]
    q = (px >> 2).astype(np.uint8)  # 6-bit quantize
    return _QIM_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _QIM_MAGIC:
        raise ValueError("not a QIM1 payload")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), np.uint8).reshape(h, w, 3)
    return ((q.astype(np.uint16) << 2) | (q >> 4)).astype(np.uint8)  # dequantize


def encode(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(px)
    if fmt == "jpeg":
        return encode_lossy(px)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_lossy(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def cell_vector64(px: np.ndarray) -> np.ndarray:
    """64-dim image embedding: the 8x8 block-mean grayscale grid (the
    same cells phash thresholds, kept as floats). float32, row-major.
    Shared by the distributed embed stage and the sequential kNN oracle
    so both derive bit-identical vectors."""
    gray = px.mean(axis=2, dtype=np.float32)
    h, w = gray.shape
    if h % 8 == 0 and w % 8 == 0:
        cells = gray.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        cells = np.empty((8, 8), dtype=np.float32)
        for i in range(8):
            for j in range(8):
                cells[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    return cells.astype(np.float32).ravel()


def tile_hashes64(px: np.ndarray, tile: int = 16) -> np.ndarray:
    """64-bit content hash per aligned ``tile``×``tile`` block, over the
    6-bit-quantized pixels.

    Quantizing first makes the hash codec-invariant: ``encode_lossy``
    stores ``px >> 2`` and its dequantize ``(q << 2) | (q >> 4)`` maps
    back to the same ``q`` under ``>> 2``, so a PNG original and its
    lossy re-encode produce identical tile hashes. Partial tiles at the
    right/bottom edge are dropped (crops aligned to the tile grid share
    every interior tile with the original). Shared pure primitive —
    the distributed explode stage and the sequential oracle both call
    this. Returns uint64, row-major tile order, duplicates included."""
    q = (px >> 2).astype(np.uint8)
    h, w = q.shape[:2]
    th, tw = h // tile, w // tile
    out = np.empty(th * tw, dtype=np.uint64)
    i = 0
    for r in range(th):
        for c in range(tw):
            blk = q[r * tile : (r + 1) * tile, c * tile : (c + 1) * tile]
            d = hashlib.blake2b(blk.tobytes(), digest_size=8).digest()
            out[i] = int.from_bytes(d, "little")
            i += 1
    return out


# ------------------------------------------------------------- audio (WAV)
#
# REAL RIFF/WAVE PCM16 mono codec — pure struct, no dependencies. Any
# standard tool can read these bytes; decode walks chunks (robust to
# LIST/fact chunks a real-world file may carry).

_RIFF = b"RIFF"
_WAVE = b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 PCM samples → canonical mono RIFF/WAVE bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("expected 1-D int16 samples")
    data = samples.astype("<i2").tobytes()
    n = len(data)
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, rate, byte-rate, block align, 16-bit
    return (
        _RIFF
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + n)
        + _WAVE
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", n)
        + data
    )


def decode_wav(data: bytes) -> "tuple[np.ndarray, int]":
    """RIFF/WAVE bytes → (1-D int16 samples, sample_rate). Chunk-walking
    reader: only PCM16 mono is supported; unknown chunks are skipped."""
    if data[:4] != _RIFF or data[8:12] != _WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(data)
    rate, bits, channels, codec_tag = None, None, None, None
    pcm = None
    while pos + 8 <= n:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            codec_tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # RIFF chunks are word-aligned
    if pcm is None or rate is None:
        raise ValueError("missing fmt/data chunk")
    if codec_tag != 1 or channels != 1 or bits != 16:
        raise ValueError("only PCM16 mono supported")
    return np.frombuffer(pcm[: (len(pcm) // 2) * 2], dtype="<i2").astype(np.int16), int(rate)


# ----------------------------------------------------- video (framed frames)
#
# Length-framed frame container (the WET trick applied to video): a
# fixed header, then per frame ``u32 length + encoded image bytes``
# (PNG / QIM via the image codec above). Length framing means a frame
# sampler SEEKS over unsampled frames without decoding them — the
# property a real container (fMP4 / MKV cluster index) provides and the
# at-scale reason sampling every Nth frame is cheap.

_VID_MAGIC = b"NCV1"


def encode_video(frames: "list[np.ndarray]", fps: int, fmt: str = "png") -> bytes:
    """(h, w, 3) uint8 frames → framed container bytes."""
    if not frames:
        raise ValueError("need at least one frame")
    fmt_code = {"png": 0, "jpeg": 1}[fmt]
    parts = [
        _VID_MAGIC + struct.pack("<HBI", fps, fmt_code, len(frames))
    ]
    for px in frames:
        payload = encode(px, fmt)
        parts.append(struct.pack("<I", len(payload)) + payload)
    return b"".join(parts)


def video_info(data: bytes) -> "tuple[int, str, int]":
    """Header-only read → (fps, fmt, n_frames)."""
    if data[:4] != _VID_MAGIC:
        raise ValueError("not an NCV1 payload")
    fps, fmt_code, n_frames = struct.unpack("<HBI", data[4:11])
    return fps, {0: "png", 1: "jpeg"}[fmt_code], n_frames


def video_frame_offsets(data: bytes) -> "list[tuple[int, int]]":
    """(offset, length) per frame — pointer walk only, zero decode."""
    _, _, n_frames = video_info(data)
    out = []
    pos = 11
    for _ in range(n_frames):
        (length,) = struct.unpack("<I", data[pos : pos + 4])
        out.append((pos + 4, length))
        pos += 4 + length
    return out


def decode_video_frames(
    data: bytes, indices: "list[int] | None" = None
) -> "list[tuple[int, np.ndarray]]":
    """Decode (frame_idx, pixels) for ``indices`` (default: all frames).
    Unsampled frames are skipped by offset arithmetic, never decoded."""
    _, fmt, n_frames = video_info(data)
    offs = video_frame_offsets(data)
    want = range(n_frames) if indices is None else indices
    return [
        (i, decode(data[offs[i][0] : offs[i][0] + offs[i][1]], fmt))
        for i in want
    ]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64_batch(px_stack: np.ndarray, gray: "np.ndarray | None" = None) -> np.ndarray:
    """Vectorized :func:`phash64` over a (n, h, w, 3) stack (h, w % 8 == 0).

    Bit-identical to the scalar version for multiple-of-8 sizes. Pass a
    precomputed ``gray`` = ``px_stack.mean(axis=3, dtype=np.float32)``
    to skip the stack's largest reduction when the caller already has it
    (the feature kernel computes it for std_gray anyway).
    """
    if gray is None:
        gray = px_stack.mean(axis=3, dtype=np.float32)
    n, h, w = gray.shape
    cells = gray.reshape(n, 8, h // 8, 8, w // 8).mean(axis=(2, 4))
    bits = (cells > cells.mean(axis=(1, 2), keepdims=True)).reshape(n, 64)
    packed = np.packbits(bits.astype(np.uint8), axis=1)
    return (
        np.ascontiguousarray(packed).view(">u8").ravel().astype(np.uint64).view(np.int64)
    )


def phash64(px: np.ndarray) -> int:
    """64-bit average-hash: 8x8 block-mean grayscale vs its mean.

    Signed int64 (two's complement) so it fits the ``phash:int64``
    page-store column.
    """
    gray = px.mean(axis=2, dtype=np.float32)
    h, w = gray.shape
    if h % 8 == 0 and w % 8 == 0:
        # one reshape-mean instead of 64 slice-means (hot path: all
        # fixture sizes are multiples of 8)
        cells = gray.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        cells = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                cells[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells > cells.mean()).ravel()
    val = int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])
    return int(np.int64(np.uint64(val)))
