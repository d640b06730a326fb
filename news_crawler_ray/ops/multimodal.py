"""Multimodal column operators: image / audio / video decode, resize,
feature-extract, hashing, and curation stages.

Media rides as opaque Arrow ``binary`` columns with typed metadata
(images: ``w:int32, h:int32, fmt:string`` — the input_hint schema).
Decode-class stages are actor pools (``map_batches(Cls, concurrency=..)``):
codec state initialises once per actor, batches stay small because each
row is ~KB-MB of payload (SURVEY.md §7 "wide binary rows" — tune
``batch_size`` × concurrency to worker heap, never convert binary blocks
to pandas).

All three codecs are real, pure-Python, and oracled:

- images: the repo's PNG/lossy pair (fixtures/codec.py) — real decode,
  real PSNR invariant;
- audio: a RIFF/PCM16 WAV walk (``decode_wav``) — chunk parse, sample
  extraction, spectral features;
- video: the length-framed NCV1 container (``decode_video_frames``) —
  per-frame decode, scene cuts, frame sampling.

PIL/libjpeg/ffmpeg are not in this container; swapping a system codec in
changes only the actor ``__init__``/decode call, not the Ray plumbing.
Decode failures follow the T5 row-level-error contract: corrupt payloads
yield a ``decode_ok=False`` sentinel row (or are skipped, where the
output is a manifest), never a stage-wide exception.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..fixtures import codec

# Everything a corrupt/truncated payload can raise across the three
# codecs (struct walks, reshape size mismatches, zlib streams) — the T5
# row-level-error catch set shared by every decode-class stage below.
_DECODE_ERRORS = (ValueError, struct.error, IndexError, zlib.error)

IMG_FEATURE_COLS = [
    "mean_r", "mean_g", "mean_b", "std_gray", "phash_check",
]


def _parse_dims(buf: bytes, fmt: str):
    """(w, h) from a payload header without decoding; None = unknown
    layout (caller falls back to the per-row codec)."""
    try:
        if fmt == "jpeg" and buf[:4] == b"QIM1":
            return struct.unpack(">II", buf[4:12])
        if fmt == "png" and buf[:8] == codec._PNG_SIG and buf[12:16] == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", buf[16:26])
            if depth == 8 and ctype == 2:
                return w, h
    except Exception:
        return None
    return None


def _decode_group_stack(bufs: list, fmt: str, w: int, h: int):
    """Decode same-(fmt,w,h) payloads straight into ONE (k, h, w, 3)
    uint8 stack.

    The irreducible C work (zlib) stays per row; everything else —
    dequantize, filter strip, stacking — runs once over the whole stack
    instead of allocating per-image temporaries (the per-row path spends
    ~half its time in small-array numpy overhead at 32 px). Returns
    (stack, ok) where ok flags rows that decoded; failed rows are left
    zeroed. Rows needing PNG filter reconstruction (never produced by
    the fixture encoder, filter 0 only) decode via the scalar codec.
    """
    k = len(bufs)
    ok = np.ones(k, dtype=bool)
    stack = np.zeros((k, h, w * 3), np.uint8)
    if fmt == "jpeg":
        flat = stack.reshape(k, -1)
        for j, buf in enumerate(bufs):
            try:
                q = np.frombuffer(zlib.decompress(buf[12:]), np.uint8)
                if q.size != h * w * 3:
                    raise ValueError("size mismatch")
                flat[j] = q
            except Exception:
                ok[j] = False
        # 6-bit dequantize, vectorized over the stack (q<=63 so q<<2
        # cannot overflow uint8; matches codec.decode_lossy bit-exactly)
        np.bitwise_or(stack << 2, stack >> 4, out=stack)
        return stack.reshape(k, h, w, 3), ok
    stride = w * 3 + 1
    for j, buf in enumerate(bufs):
        try:
            pos, idat = 8, bytearray()
            while pos < len(buf):
                (length,) = struct.unpack(">I", buf[pos : pos + 4])
                tag = buf[pos + 4 : pos + 8]
                if tag == b"IDAT":
                    idat += buf[pos + 8 : pos + 8 + length]
                elif tag == b"IEND":
                    break
                pos += 12 + length
            rows = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8).reshape(
                h, stride
            )
            if rows[:, 0].any():  # filtered scanlines: rare, scalar path
                stack[j] = codec.decode_png(buf).reshape(h, w * 3)
            else:
                stack[j] = rows[:, 1:]
        except Exception:
            ok[j] = False
    return stack.reshape(k, h, w, 3), ok


def decode_feature_arrays(
    data: list, fmts: list, out: "tuple[np.ndarray, ...] | None" = None,
    positions: "np.ndarray | None" = None, n: int | None = None,
    decode=None, flush_at: int = 2048,
):
    """Decode a list of encoded buffers → (mean_rgb, std_gray, phash, ok)
    arrays. ``positions`` scatters results into preallocated ``out``
    arrays (the fused fetch+decode stage decodes shard-grouped rows and
    writes features at their batch positions — no payload reorder pass).
    With the default codec, same-(fmt,w,h) payloads decode straight into
    one uint8 stack (:func:`_decode_group_stack`: only zlib stays per
    row) and statistics run once per stack; a custom ``decode`` or an
    unrecognized header falls back to the per-row codec. Stacks are
    FLUSHED every ``flush_at`` images: unbounded stacks of a 31 k-row
    block allocate ~0.5 GB of float temporaries per task and thrash
    memory bandwidth — measured 9x slower than 2 k-image chunks when 8
    tasks decode concurrently.
    """
    batched = decode is None or decode is codec.decode
    if decode is None:
        decode = codec.decode
    if n is None:
        n = len(data)
    if out is None:
        out = (
            np.zeros((n, 3), dtype=np.float64),
            np.zeros(n, dtype=np.float64),
            np.zeros(n, dtype=np.int64),
            np.ones(n, dtype=bool),
        )
    mean_rgb, std_gray, phash, ok = out
    if positions is None:
        positions = np.arange(len(data))

    def stack_features(P: np.ndarray, ix: np.ndarray):
        mean_rgb[ix] = P.reshape(len(ix), -1, 3).mean(axis=1, dtype=np.float32)
        # one float32 convert + slice adds ≡ P.mean(axis=3, dtype=f32)
        # bit-for-bit ((a+b)+c then /3 — the same order numpy's len-3
        # axis reduce uses) but SIMD-wide instead of a 3-elem inner loop;
        # gray then feeds BOTH std and phash (recomputing it was the
        # kernel's single largest reduction)
        F = P.astype(np.float32)
        gray = F[..., 0] + F[..., 1]
        gray += F[..., 2]
        gray /= np.float32(3.0)
        std_gray[ix] = gray.reshape(len(ix), -1).std(axis=1)
        if P.shape[1] % 8 == 0 and P.shape[2] % 8 == 0:
            phash[ix] = codec.phash64_batch(P, gray=gray)
        else:
            for j in range(len(ix)):
                phash[ix[j]] = codec.phash64(P[j])

    def flush(shape, idxs, pxs):
        stack_features(np.stack(pxs), np.asarray(idxs))

    by_shape: dict[tuple, tuple[list, list]] = {}
    groups: dict[tuple, tuple[list, list]] = {}
    for i, buf, fmt in zip(positions, data, fmts):
        if buf is None:
            ok[i] = False
            continue
        if batched:
            dims = _parse_dims(buf, fmt)
            if dims is not None:
                idxs, bufs = groups.setdefault((fmt, *dims), ([], []))
                idxs.append(i)
                bufs.append(buf)
                if len(idxs) >= flush_at:
                    groups.pop((fmt, *dims))
                    _decode_flush(
                        bufs, fmt, dims, np.asarray(idxs), stack_features, ok
                    )
                continue
        try:
            px = decode(buf, fmt)
        except Exception:
            ok[i] = False
            continue
        idxs, pxs = by_shape.setdefault(px.shape, ([], []))
        idxs.append(i)
        pxs.append(px)
        if len(idxs) >= flush_at:
            flush(px.shape, idxs, pxs)
            by_shape.pop(px.shape)
    for shape, (idxs, pxs) in by_shape.items():
        flush(shape, idxs, pxs)
    for (fmt, w, h), (idxs, bufs) in groups.items():
        _decode_flush(bufs, fmt, (w, h), np.asarray(idxs), stack_features, ok)
    return mean_rgb, std_gray, phash, ok


def _decode_flush(bufs, fmt, dims, ix, stack_features, ok):
    stack, gok = _decode_group_stack(bufs, fmt, *dims)
    if gok.all():
        stack_features(stack, ix)
    else:
        ok[ix[~gok]] = False
        if gok.any():
            stack_features(np.ascontiguousarray(stack[gok]), ix[gok])


def append_feature_columns(
    out: pa.Table, mean_rgb: np.ndarray, std_gray: np.ndarray,
    phash: np.ndarray, ok: np.ndarray,
) -> pa.Table:
    for j, name in enumerate(("mean_r", "mean_g", "mean_b")):
        out = out.append_column(name, pa.array(mean_rgb[:, j], pa.float64()))
    out = out.append_column("std_gray", pa.array(std_gray, pa.float64()))
    out = out.append_column("phash_check", pa.array(phash, pa.int64()))
    return out.append_column("decode_ok", pa.array(ok))


class ImageDecodeStage:
    """binary → per-image features (decode happens HERE, once per row).

    Emits mean RGB, grayscale std, and a recomputed phash to verify the
    stored ``phash`` column — the pixel-level invariant stage.
    """

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt"):
        self.bytes_col, self.fmt_col = bytes_col, fmt_col
        self.decode = codec.decode  # slot for a real codec (PIL) later

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        mean_rgb, std_gray, phash, ok = decode_feature_arrays(
            data, fmts, decode=self.decode
        )
        out = batch.drop_columns([self.bytes_col])
        return append_feature_columns(out, mean_rgb, std_gray, phash, ok)


_DEFAULT_DECODER: "ImageDecodeStage | None" = None


def decode_features_batch(batch: pa.Table) -> pa.Table:
    """Task-form decode+features: the codec is a pure function (zlib +
    numpy, no model weights), so there is no per-actor state worth
    pinning — task-based ``map_batches`` lets the streaming executor use
    every free CPU elastically instead of a fixed actor reservation.
    A stage that actually loads a model keeps the actor-pool form
    (:class:`ImageDecodeStage` + ``concurrency=``)."""
    global _DEFAULT_DECODER
    if _DEFAULT_DECODER is None:  # once per worker process
        _DEFAULT_DECODER = ImageDecodeStage()
    return _DEFAULT_DECODER(batch)


def image_features(ds, concurrency=2, batch_size: int = 256):
    """Decode + feature-extract as an actor pool; small batches on purpose
    (binary payload × batch_size × concurrency must fit worker heap)."""
    return ds.map_batches(
        ImageDecodeStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def image_meta_audit_batch(
    batch: pa.Table,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_col: str = "iid",
) -> pa.Table:
    """Ingest metadata-consistency gate: the input_hint schema carries
    (w, h, fmt, phash) as MANIFEST columns, and nothing guarantees they
    match the payload bytes — this audit flags rows whose header dims
    or pixel-recomputed phash disagree, before any downstream op trusts
    the metadata (aspect buckets, admission filters, exact-phash dedup
    all read these columns without decoding). Header dims are a bytes
    peek (no decode, per-row struct unpack — the same trade as the md5
    loops); the phash recompute rides the shared decode kernel.
    Output: (id, dims_ok — null when the header layout is unknown,
    phash_ok — null when decode failed (the recomputed phash is a
    garbage placeholder there, so True/False would be a confident
    misread, mirroring dims_ok's unknown-layout null), decode_ok)."""
    data = batch[bytes_col].to_pylist()
    fmts = batch[fmt_col].to_pylist()
    _, _, ph, ok = decode_feature_arrays(data, fmts, decode=codec.decode)
    sw = batch["w"].to_pylist()
    sh = batch["h"].to_pylist()
    sp = np.asarray(batch["phash"], np.int64)
    dims_ok: list[bool | None] = []
    for buf, fmt, w, h in zip(data, fmts, sw, sh):
        hdr = _parse_dims(buf, fmt) if buf is not None else None
        dims_ok.append(None if hdr is None else hdr == (w, h))
    ok_arr = np.asarray(ok, dtype=bool)
    phash_eq = pa.array(np.asarray(ph, np.int64) == sp, pa.bool_())
    phash_ok = pc.if_else(pa.array(ok_arr), phash_eq, pa.scalar(None, pa.bool_()))
    return pa.table(
        {
            id_col: batch[id_col],
            "dims_ok": pa.array(dims_ok, pa.bool_()),
            "phash_ok": phash_ok,
            "decode_ok": pa.array(ok),
        }
    )


def image_meta_audit(ds, batch_size: int = 128):
    return ds.map_batches(
        image_meta_audit_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def _laplacian_moments(P: np.ndarray):
    """Exact integer sharpness moments over a (k,h,w,3) stack: the
    4-neighbor Laplacian of the INTEGER sum-gray channel (r+g+b, no
    float /3) on interior pixels, returned as (n_interior, lap_sum,
    lap_sq_sum) int64 — variance of Laplacian (the classic blur
    detector) = (n·Σx² − (Σx)²)/n² downstream, while the moments stay
    exact and layout-proof. Bounds: |lap| ≤ 8·765, Σx² ≤ 1.5e11 per
    4096-px image — int64-safe."""
    g = P.astype(np.int64).sum(axis=3)
    c = g[:, 1:-1, 1:-1]
    lap = (
        4 * c
        - g[:, :-2, 1:-1]
        - g[:, 2:, 1:-1]
        - g[:, 1:-1, :-2]
        - g[:, 1:-1, 2:]
    )
    k = P.shape[0]
    flat = lap.reshape(k, -1)
    n_int = np.full(k, flat.shape[1], dtype=np.int64)
    return n_int, flat.sum(axis=1), (flat * flat).sum(axis=1)


def sharpness_batch(
    batch: pa.Table, bytes_col: str = "bytes", fmt_col: str = "fmt",
    id_col: str = "iid",
) -> pa.Table:
    """Blur detection (the low-sharpness filter of an image curation
    pass): per image the exact integer Laplacian moments — callers
    threshold on variance = (n·Σx² − (Σx)²)/n². Stacked group decode
    as everywhere in this module."""
    data = batch[bytes_col].to_pylist()
    fmts = batch[fmt_col].to_pylist()
    n = batch.num_rows
    res = np.zeros((3, n), np.int64)
    ok = np.ones(n, dtype=bool)
    groups: dict[tuple, tuple[list, list]] = {}
    singles: list[int] = []
    for i, (buf, fmt) in enumerate(zip(data, fmts)):
        if buf is None:
            ok[i] = False
            continue
        dims = _parse_dims(buf, fmt)
        if dims is None:
            singles.append(i)
            continue
        idxs, bufs = groups.setdefault((fmt, *dims), ([], []))
        idxs.append(i)
        bufs.append(buf)
    for (fmt, w, h), (idxs, bufs) in groups.items():
        stack, gok = _decode_group_stack(bufs, fmt, w, h)
        ix = np.asarray(idxs)
        ok[ix[~gok]] = False
        if gok.any():
            mom = _laplacian_moments(np.ascontiguousarray(stack[gok]))
            for a, r in zip(res, mom):
                a[ix[gok]] = r
    for i in singles:
        try:
            px = codec.decode(data[i], fmts[i])
        except Exception:
            ok[i] = False
            continue
        for a, r in zip(res, _laplacian_moments(px[None])):
            a[i] = r[0]
    return pa.table(
        {
            id_col: batch[id_col],
            "n_interior": pa.array(res[0], pa.int64()),
            "lap_sum": pa.array(res[1], pa.int64()),
            "lap_sq_sum": pa.array(res[2], pa.int64()),
            "decode_ok": pa.array(ok),
        }
    )


def sharpness_score(ds, batch_size: int = 128):
    return ds.map_batches(
        sharpness_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def _border_runs(P: np.ndarray):
    """Leading/trailing uniform-border runs per image in a (k,h,w,3)
    stack: a row/col is 'bar' if every pixel equals the top-left pixel.
    Fully-uniform images report (h, 0) / (w, 0) — the whole frame is one
    bar. All vectorized boolean reduces, no per-image Python."""
    color = P[:, :1, :1, :]
    eq = (P == color).all(axis=3)
    rowu, colu = eq.all(axis=2), eq.all(axis=1)
    h, w = P.shape[1], P.shape[2]
    all_r, all_c = rowu.all(axis=1), colu.all(axis=1)
    top = np.where(all_r, h, rowu.argmin(axis=1)).astype(np.int64)
    bottom = np.where(all_r, 0, rowu[:, ::-1].argmin(axis=1)).astype(np.int64)
    left = np.where(all_c, w, colu.argmin(axis=1)).astype(np.int64)
    right = np.where(all_c, 0, colu[:, ::-1].argmin(axis=1)).astype(np.int64)
    return top, bottom, left, right


def letterbox_stats_batch(
    batch: pa.Table, bytes_col: str = "bytes", fmt_col: str = "fmt",
    id_col: str = "iid",
) -> pa.Table:
    """Letterbox/pillarbox bar detection (the cropped/padded-media
    filter of a LAION-style image curation pass): per image, the number
    of leading/trailing rows and columns uniformly equal to the
    top-left border color. Same-(fmt,w,h) payloads decode into ONE
    stack (only zlib stays per row, like decode_feature_arrays); the
    bar counts are four vectorized reduces per stack."""
    data = batch[bytes_col].to_pylist()
    fmts = batch[fmt_col].to_pylist()
    n = batch.num_rows
    res = np.zeros((4, n), np.int64)
    ok = np.ones(n, dtype=bool)
    groups: dict[tuple, tuple[list, list]] = {}
    singles: list[int] = []
    for i, (buf, fmt) in enumerate(zip(data, fmts)):
        if buf is None:
            ok[i] = False
            continue
        dims = _parse_dims(buf, fmt)
        if dims is None:
            singles.append(i)
            continue
        idxs, bufs = groups.setdefault((fmt, *dims), ([], []))
        idxs.append(i)
        bufs.append(buf)
    for (fmt, w, h), (idxs, bufs) in groups.items():
        stack, gok = _decode_group_stack(bufs, fmt, w, h)
        ix = np.asarray(idxs)
        ok[ix[~gok]] = False
        if gok.any():
            runs = _border_runs(np.ascontiguousarray(stack[gok]))
            for a, r in zip(res, runs):
                a[ix[gok]] = r
    for i in singles:
        try:
            px = codec.decode(data[i], fmts[i])
        except Exception:
            ok[i] = False
            continue
        for a, r in zip(res, _border_runs(px[None])):
            a[i] = r[0]
    return pa.table(
        {
            id_col: batch[id_col],
            "n_top": pa.array(res[0], pa.int64()),
            "n_bottom": pa.array(res[1], pa.int64()),
            "n_left": pa.array(res[2], pa.int64()),
            "n_right": pa.array(res[3], pa.int64()),
            "decode_ok": pa.array(ok),
        }
    )


def _dominant_colors(P: np.ndarray) -> np.ndarray:
    """Per-image dominant quantized color over a (k,h,w,3) stack: 4
    bits/channel → 4096 bins, mode per image via one bincount matrix
    (ties → smallest bin). Returns int64 bins (r<<8 | g<<4 | b on the
    quantized nibbles)."""
    k = P.shape[0]
    q = (P >> 4).astype(np.int64)
    bins = (q[..., 0] << 8) | (q[..., 1] << 4) | q[..., 2]
    flat = bins.reshape(k, -1)
    counts = np.zeros((k, 4096), dtype=np.int64)
    rows = np.repeat(np.arange(k, dtype=np.int64), flat.shape[1])
    np.add.at(counts, (rows, flat.ravel()), 1)
    return counts.argmax(axis=1).astype(np.int64)  # argmax → smallest tie


def dominant_color_batch(
    batch: pa.Table, bytes_col: str = "bytes", fmt_col: str = "fmt",
    id_col: str = "iid",
) -> pa.Table:
    """Dominant 12-bit quantized color per image (the palette/solid-
    color screen the LAION analysis pass runs): stacked group decode,
    then one bincount matrix per stack."""
    data = batch[bytes_col].to_pylist()
    fmts = batch[fmt_col].to_pylist()
    n = batch.num_rows
    dom = np.zeros(n, np.int64)
    ok = np.ones(n, dtype=bool)
    groups: dict[tuple, tuple[list, list]] = {}
    singles: list[int] = []
    for i, (buf, fmt) in enumerate(zip(data, fmts)):
        if buf is None:
            ok[i] = False
            continue
        dims = _parse_dims(buf, fmt)
        if dims is None:
            singles.append(i)
            continue
        idxs, bufs = groups.setdefault((fmt, *dims), ([], []))
        idxs.append(i)
        bufs.append(buf)
    for (fmt, w, h), (idxs, bufs) in groups.items():
        stack, gok = _decode_group_stack(bufs, fmt, w, h)
        ix = np.asarray(idxs)
        ok[ix[~gok]] = False
        if gok.any():
            dom[ix[gok]] = _dominant_colors(np.ascontiguousarray(stack[gok]))
    for i in singles:
        try:
            px = codec.decode(data[i], fmts[i])
        except Exception:
            ok[i] = False
            continue
        dom[i] = _dominant_colors(px[None])[0]
    return pa.table(
        {
            id_col: batch[id_col],
            "dominant_bin": pa.array(dom, pa.int64()),
            "decode_ok": pa.array(ok),
        }
    )


def dominant_color(ds, batch_size: int = 128):
    return ds.map_batches(
        dominant_color_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def detect_letterbox(ds, batch_size: int = 128):
    """Task-form stage (pure zlib+numpy, no per-actor state — same
    rationale as decode_features_batch)."""
    return ds.map_batches(
        letterbox_stats_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


class ImageResizeStage:
    """binary → resized binary (nearest-neighbor, re-encoded same fmt).

    Real resize over the pure-Python codec; output schema mirrors the
    input page-store so resized stores compose with every other stage.
    """

    def __init__(self, out_w: int, out_h: int, bytes_col: str = "bytes", fmt_col: str = "fmt"):
        self.out_w, self.out_h = out_w, out_h
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out_bytes, ws, hs = [], [], []
        yi = None
        for buf, fmt in zip(data, fmts):
            px = codec.decode(buf, fmt)
            h, w = px.shape[:2]
            yi = (np.arange(self.out_h) * h) // self.out_h
            xi = (np.arange(self.out_w) * w) // self.out_w
            resized = px[yi][:, xi]
            out_bytes.append(codec.encode(np.ascontiguousarray(resized), fmt))
            ws.append(self.out_w)
            hs.append(self.out_h)
        i_b = batch.schema.get_field_index(self.bytes_col)
        out = batch.set_column(i_b, self.bytes_col, pa.array(out_bytes, pa.binary()))
        if "w" in out.column_names:
            out = out.set_column(out.schema.get_field_index("w"), "w", pa.array(ws, pa.int32()))
            out = out.set_column(out.schema.get_field_index("h"), "h", pa.array(hs, pa.int32()))
        return out


def resize_images(ds, out_w: int, out_h: int, concurrency=2, batch_size: int = 128):
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioFeatureStage:
    """Audio binary → per-clip features with a REAL WAV (PCM16 mono)
    decode (fixtures/codec.decode_wav — pure-struct RIFF chunk walk).

    Schema contract: input (audio_id:string, bytes:binary,
    sample_rate:int32, fmt:string) → output drops ``bytes`` and adds
    (n_samples:int64, duration_us:int64, sum_sq:int64, peak:int64,
    zero_cross:int64, rms:float64, decode_ok:bool). Every aggregate is
    an EXACT integer moment over the int16 samples (Σs², max|s|, sign
    transitions), so results are bit-identical at any parallelism;
    ``rms`` is one float expression from the integer moments. A payload
    that fails to decode yields a null-moment row with
    ``decode_ok=False`` — row-level errors, not job failure (T5
    semantics, /root/reference/src/secbot/fetchers/news.py:136-138).
    The decoded rate must equal the metadata ``sample_rate`` column or
    the row is marked failed (metadata/payload drift is data, not a
    crash)."""

    def __init__(self, bytes_col: str = "bytes"):
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fixtures import codec

        n_s, dur, ssq, peak, zc, rms, ok = [], [], [], [], [], [], []
        for buf, sr_meta in zip(
            batch[self.bytes_col].to_pylist(), batch["sample_rate"].to_pylist()
        ):
            try:
                samples, rate = codec.decode_wav(buf)
                if rate != sr_meta:
                    raise ValueError("sample_rate metadata != payload rate")
            except _DECODE_ERRORS:
                n_s.append(0)
                dur.append(0)
                ssq.append(0)
                peak.append(0)
                zc.append(0)
                rms.append(0.0)
                ok.append(False)
                continue
            n = len(samples)
            s64 = samples.astype(np.int64)
            s_sq = int(np.dot(s64, s64))
            n_s.append(n)
            dur.append(n * 1_000_000 // max(rate, 1))
            ssq.append(s_sq)
            peak.append(int(np.abs(s64).max()) if n else 0)
            # sign transition count; 0 counts as non-negative
            neg = s64 < 0
            zc.append(int(np.count_nonzero(neg[1:] != neg[:-1])) if n > 1 else 0)
            rms.append(float(np.sqrt(s_sq / n)) if n else 0.0)
            ok.append(True)
        out_names = (
            "n_samples", "duration_us", "sum_sq", "peak", "zero_cross",
            "rms", "decode_ok",
        )
        # decoded values supersede any same-named metadata column (the
        # synth store carries n_samples as writer metadata)
        drop = [self.bytes_col] + [
            c for c in out_names if c in batch.column_names
        ]
        return (
            batch.drop_columns(drop)
            .append_column("n_samples", pa.array(n_s, pa.int64()))
            .append_column("duration_us", pa.array(dur, pa.int64()))
            .append_column("sum_sq", pa.array(ssq, pa.int64()))
            .append_column("peak", pa.array(peak, pa.int64()))
            .append_column("zero_cross", pa.array(zc, pa.int64()))
            .append_column("rms", pa.array(rms, pa.float64()))
            .append_column("decode_ok", pa.array(ok, pa.bool_()))
        )


def audio_features(ds, concurrency=(1, 4), batch_size: int = 256):
    """Actor-pool audio feature extraction (decode state-free but the
    pool keeps codec warm + bounds in-flight payload bytes)."""
    return ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class VideoFrameSampleStage:
    """Video binary → sampled-frame features with REAL frame decode.

    Input (video_id, bytes:binary NCV1 container, fps:int32, fmt) →
    one output row per SAMPLED frame: (video_id, frame_idx:int32,
    luma_sum:int64, n_px:int64, phash:int64). The container is
    length-framed (fixtures/codec.encode_video), so the stage seeks
    straight to every ``every_n``-th frame's offset and decodes ONLY
    those — at 100 TB the decode cost is frames_sampled/frames_total of
    the naive plan, which is the entire point of frame sampling.
    ``luma_sum`` = Σ(r+g+b) over the frame as an exact int; ``phash``
    uses the shared perceptual-hash kernel so sampled frames plug into
    the existing phash dedup/cluster family."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fixtures import codec

        vids, idxs, lsums, npx, ph = [], [], [], [], []
        for vid, buf in zip(
            batch["video_id"].to_pylist(), batch["bytes"].to_pylist()
        ):
            # T5 row-level errors: corrupt containers (bad header OR
            # truncated frame data) skip the clip, not the batch.
            try:
                _, _, n_frames = codec.video_info(buf)
                want = list(range(0, n_frames, self.every_n))
                sampled = list(codec.decode_video_frames(buf, want))
            except _DECODE_ERRORS:
                continue
            for f, px in sampled:
                vids.append(vid)
                idxs.append(f)
                lsums.append(int(px.astype(np.int64).sum()))
                npx.append(px.shape[0] * px.shape[1])
                ph.append(codec.phash64(px))
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "luma_sum": pa.array(lsums, pa.int64()),
                "n_px": pa.array(npx, pa.int64()),
                "phash": pa.array(ph, pa.int64()),
            }
        )


class ImageAugmentStage:
    """Deterministic training-data augmentation: per-image horizontal
    flip + edge crop chosen by a CONTENT-STABLE hash of the image id
    (splitmix64 — rerun-, layout- and parallelism-proof, like the
    sampling family's md5 decisions): bit 0 → hflip, bits 1-2 → crop
    margin ∈ {0, 2, 4, 6} px per side (clamped so ≥8 px survive).
    Decodes with the real codec, re-encodes in the row's own format.
    Emits (image_id, bytes, w, h, fmt, aug_flip:bool,
    aug_crop:int32) — the augmented store is a drop-in page-store."""

    def __init__(self, bytes_col: str = "bytes"):
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fixtures.synth import _splitmix64

        ids = batch["image_id"].to_pylist()
        base = np.array([_stable_id64(s) for s in ids], dtype=np.uint64)
        h64 = _splitmix64(base) if len(base) else base
        flips = (h64 & np.uint64(1)).astype(bool)
        crops = (((h64 >> np.uint64(1)) & np.uint64(3)) * np.uint64(2)).astype(np.int64)
        out_b, ws, hs = [], [], []
        for buf, fmt, fl, cr in zip(
            batch[self.bytes_col].to_pylist(),
            batch["fmt"].to_pylist(),
            flips.tolist(),
            crops.tolist(),
        ):
            px = codec.decode(buf, fmt)
            if fl:
                px = px[:, ::-1]
            c = int(cr)
            if c and px.shape[0] > 2 * c + 8 and px.shape[1] > 2 * c + 8:
                px = px[c:-c, c:-c]
            px = np.ascontiguousarray(px)
            out_b.append(codec.encode(px, fmt))
            hs.append(px.shape[0])
            ws.append(px.shape[1])
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(out_b, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": batch["fmt"],
                "aug_flip": pa.array(flips.tolist(), pa.bool_()),
                "aug_crop": pa.array(crops.tolist(), pa.int32()),
            }
        )


def _stable_id64(s: str) -> int:
    """Content-stable 64-bit int of a string id (md5 low bits — no
    Python hash() randomization)."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def augment_images(ds, concurrency=(1, 4), batch_size: int = 64):
    return ds.map_batches(
        ImageAugmentStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_envelope_hash64(samples: np.ndarray) -> int:
    """64-bit energy-envelope perceptual hash of an int16 waveform —
    the audio analog of the image phash: 64 equal-split windows, bit k
    set iff window k's mean |amplitude| exceeds the clip's overall mean
    |amplitude|. The comparison is an exact integer cross-multiply
    (sum_k · n_total > total · len_k), so the hash is bit-identical at
    any parallelism and robust to small additive noise (near-dup clips
    share an envelope even when their samples differ). Shared pure
    kernel: the distributed stage and the sequential oracle both call
    this."""
    s = np.abs(samples.astype(np.int64))
    n = len(s)
    if n == 0:
        return 0
    total = int(s.sum())
    offs = (np.arange(65, dtype=np.int64) * n) // 64
    sums = np.add.reduceat(s, offs[:-1])
    # reduceat quirk: empty slices (offs[k] == offs[k+1]) return s[offs[k]]
    lens = np.diff(offs)
    sums = np.where(lens > 0, sums, 0)
    bits = (sums * n) > (total * lens)
    val = int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])
    return int(np.int64(np.uint64(val)))


class AudioHashStage:
    """Audio binary → (id_col passthrough, ahash:int64) via real WAV
    decode + :func:`audio_envelope_hash64`. Feeds the shared
    ``hash64_near_dup_pairs`` banded-hamming family — audio near-dup
    detection rides the exact same exchange machinery as simhash /
    image phash."""

    def __init__(self, bytes_col: str = "bytes"):
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fixtures import codec as fcodec

        hashes, keep = [], []
        for i, buf in enumerate(batch[self.bytes_col].to_pylist()):
            # T5 row-level errors: an undecodable clip cannot hash, so
            # it is dropped row-locally, never failing the stage.
            try:
                samples, _rate = fcodec.decode_wav(buf)
            except _DECODE_ERRORS:
                continue
            keep.append(i)
            hashes.append(audio_envelope_hash64(samples))
        return (
            batch.drop_columns([self.bytes_col])
            .take(pa.array(keep, pa.int64()))
            .append_column("ahash", pa.array(hashes, pa.int64()))
        )


def audio_near_dup_pairs(
    ds,
    id_col: str = "aid",
    max_hamming: int = 6,
    bands: int = 8,
    max_bucket: int = 1024,
    concurrency=(1, 4),
):
    """Audio near-dup pairs: envelope-hash actor pool → the generic
    banded-hamming pairing (one narrow (id, band, bucket, hash)
    exchange — no all-pairs). ``id_col`` must be int64. Default
    ``bands=8`` keeps the pigeonhole guarantee exact for
    ``max_hamming`` ≤ 7 (noisy near-dup envelopes differ in more bits
    than image phashes)."""
    from .dedup import hash64_near_dup_pairs

    hashed = ds.map_batches(
        AudioHashStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
        concurrency=concurrency,
    )
    return hash64_near_dup_pairs(
        hashed,
        hash_col="ahash",
        id_col=id_col,
        max_hamming=max_hamming,
        bands=bands,
        max_bucket=max_bucket,
        kind="audio",
    )


def audio_spectral_kernel(samples: np.ndarray, rate: int) -> "tuple[int, int, int]":
    """(dominant_bin, dominant_hz, n_bins) of an int16 clip via one
    rfft: DC excluded, argmax ties → lowest bin, dominant_hz = exact
    integer floor of bin·rate/n. Whole-clip single-task transform —
    parallelism cannot change it. Shared pure kernel (stage + oracle),
    like codec.phash64."""
    n = len(samples)
    if n == 0:
        return 0, 0, 0
    sp = np.abs(np.fft.rfft(samples.astype(np.float64)))
    sp[0] = 0.0  # DC carries the clip offset, not a tone
    b = int(np.argmax(sp))
    return b, b * rate // n, len(sp)


class AudioSpectralStage:
    """Audio binary → spectral features: real WAV decode + one rfft per
    clip (:func:`audio_spectral_kernel`). Output adds (dominant_bin:
    int64, dominant_hz:int64, n_bins:int64); integer outputs keep the
    query oracle exact."""

    def __init__(self, bytes_col: str = "bytes"):
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fixtures import codec as fcodec

        bins, hzs, nbs, keep = [], [], [], []
        for i, buf in enumerate(batch[self.bytes_col].to_pylist()):
            # T5 row-level errors: undecodable clips are dropped
            # row-locally (no spectral features exist for them).
            try:
                samples, rate = fcodec.decode_wav(buf)
            except _DECODE_ERRORS:
                continue
            b, hz, nb = audio_spectral_kernel(samples, rate)
            keep.append(i)
            bins.append(b)
            hzs.append(hz)
            nbs.append(nb)
        return (
            batch.drop_columns([self.bytes_col])
            .take(pa.array(keep, pa.int64()))
            .append_column("dominant_bin", pa.array(bins, pa.int64()))
            .append_column("dominant_hz", pa.array(hzs, pa.int64()))
            .append_column("n_bins", pa.array(nbs, pa.int64()))
        )


def audio_spectral(ds, concurrency=(1, 4), batch_size: int = 256):
    return ds.map_batches(
        AudioSpectralStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def curate_audio_manifest_batch(
    t: pa.Table,
    min_duration_us: int = 40_000,
    min_rms_milli: int = 1_500_000,
) -> pa.Table:
    """ONE fused pass of the audio-corpus curation pipeline (the audio
    analog of curate_image_manifest_batch): each clip decodes ONCE;
    admission = decode_ok AND duration ≥ min_duration_us AND rms ≥
    min_rms_milli/1000 — the rms gate as the EXACT integer
    cross-multiply sum_sq·10⁶ ≥ n·(min_rms_milli/1000)² ⇒
    sum_sq·10⁶·10⁶ ≥ n·min_rms_milli² (no float compare); survivors
    emit manifest rows (audio_id, n_samples, duration_us, sum_sq,
    ahash) for downstream exact-envelope dedup on the narrow rows."""
    from ..fixtures import codec as fcodec

    ids, ns, dur, ssq, ah = [], [], [], [], []
    for aid, buf, sr in zip(
        t["audio_id"].to_pylist(),
        t["bytes"].to_pylist(),
        t["sample_rate"].to_pylist(),
    ):
        try:
            samples, rate = fcodec.decode_wav(buf)
            if rate != sr:
                raise ValueError("rate drift")
        except _DECODE_ERRORS:
            continue
        n = len(samples)
        if n == 0:
            continue
        d_us = n * 1_000_000 // rate
        s64 = samples.astype(np.int64)
        s_sq = int(np.dot(s64, s64))
        if d_us < min_duration_us:
            continue
        # integer rms gate: rms >= m/1000  <=>  sum_sq*10^6 >= n*m^2
        if s_sq * 1_000_000 < n * min_rms_milli * min_rms_milli:
            continue
        ids.append(aid)
        ns.append(n)
        dur.append(d_us)
        ssq.append(s_sq)
        ah.append(audio_envelope_hash64(samples))
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.string()),
            "n_samples": pa.array(ns, pa.int64()),
            "duration_us": pa.array(dur, pa.int64()),
            "sum_sq": pa.array(ssq, pa.int64()),
            "ahash": pa.array(ah, pa.int64()),
        }
    )


def curate_audio_corpus(
    ds, min_duration_us: int = 40_000, min_rms_milli: int = 1_500_000
):
    """Admission → features+hash (fused single-decode map) → EXACT
    envelope-hash dedup keeping the min admitted audio_id per hash
    (group_top_k on the narrow manifest — payload bytes never enter
    the exchange). The audio analog of curate_image_corpus."""
    from .agg import group_top_k

    manifest = ds.map_batches(
        lambda t: curate_audio_manifest_batch(t, min_duration_us, min_rms_milli),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
    )
    return group_top_k(
        manifest, "ahash", ["audio_id"], [False], 1
    )


class VideoSceneCutStage:
    """Video binary → per-video scene-cut stats. Decodes consecutive
    frames (a cut detector inherently needs adjacent frames — this is
    the one video op that reads every frame) and flags a cut when the
    inter-frame SAD (sum of absolute per-pixel differences — a
    luma-SUM delta cannot see a same-brightness scene change) exceeds
    ``threshold_milli`` permille of the maximum possible difference
    (n_px·3·255). All-integer: results are bit-identical at any
    parallelism. Output: (video_id, n_frames:int32, n_cuts:int64,
    max_delta_milli:int64)."""

    def __init__(self, threshold_milli: int = 120):
        self.threshold_milli = threshold_milli

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fixtures import codec as fcodec

        vids, nfs, cuts, maxd = [], [], [], []
        for vid, buf in zip(
            batch["video_id"].to_pylist(), batch["bytes"].to_pylist()
        ):
            # T5 row-level errors: a corrupt/truncated/zero-frame
            # container skips this clip, never failing the batch.
            try:
                frames = [
                    px.astype(np.int64)
                    for _, px in fcodec.decode_video_frames(buf)
                ]
            except _DECODE_ERRORS:
                continue
            if not frames:
                continue
            h, w = frames[0].shape[0], frames[0].shape[1]
            full = h * w * 3 * 255
            n_cuts = 0
            max_delta = 0
            for a, b in zip(frames, frames[1:]):
                sad = int(np.abs(b - a).sum())
                dm = sad * 1000 // full
                max_delta = max(max_delta, dm)
                if dm >= self.threshold_milli:
                    n_cuts += 1
            vids.append(vid)
            nfs.append(len(frames))
            cuts.append(n_cuts)
            maxd.append(max_delta)
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "n_frames": pa.array(nfs, pa.int32()),
                "n_cuts": pa.array(cuts, pa.int64()),
                "max_delta_milli": pa.array(maxd, pa.int64()),
            }
        )


def video_scene_cuts(ds, threshold_milli: int = 120, concurrency=(1, 4)):
    return ds.map_batches(
        VideoSceneCutStage,
        fn_constructor_kwargs={"threshold_milli": threshold_milli},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=32,
        concurrency=concurrency,
    )


def curate_video_manifest_batch(
    t: pa.Table,
    min_frames: int = 8,
    max_cut_ratio_milli: int = 400,
    cut_threshold_milli: int = 120,
) -> pa.Table:
    """ONE fused pass of the video-corpus curation pipeline: each clip
    walks its container once — admission = frame count ≥ ``min_frames``
    AND scene-cut density below ``max_cut_ratio_milli`` permille of
    transitions (jump-cut-heavy clips are poor training video), with
    the SAD cut detector inlined; survivors emit manifest rows
    (video_id, n_frames, n_cuts, first_phash) where ``first_phash`` is
    the shared phash64 of frame 0 — the dedup key downstream."""
    from ..fixtures import codec as fcodec

    ids, nfs, cuts, ph = [], [], [], []
    for vid, buf in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
        # Full decode stays inside the try: a valid header over
        # truncated frame data must skip the clip, not drop the batch.
        try:
            _, _, n_frames = fcodec.video_info(buf)
            if n_frames < min_frames:
                continue
            frames = [
                px.astype(np.int64)
                for _, px in fcodec.decode_video_frames(buf)
            ]
        except _DECODE_ERRORS:
            continue
        if not frames:
            continue
        h, w = frames[0].shape[0], frames[0].shape[1]
        full = h * w * 3 * 255
        n_cuts = 0
        for a, b in zip(frames, frames[1:]):
            if int(np.abs(b - a).sum()) * 1000 // full >= cut_threshold_milli:
                n_cuts += 1
        if n_cuts * 1000 > (n_frames - 1) * max_cut_ratio_milli:
            continue
        ids.append(vid)
        nfs.append(n_frames)
        cuts.append(n_cuts)
        ph.append(fcodec.phash64(frames[0].astype(np.uint8)))
    return pa.table(
        {
            "video_id": pa.array(ids, pa.string()),
            "n_frames": pa.array(nfs, pa.int32()),
            "n_cuts": pa.array(cuts, pa.int64()),
            "first_phash": pa.array(ph, pa.int64()),
        }
    )


def curate_video_corpus(
    ds,
    min_frames: int = 8,
    max_cut_ratio_milli: int = 400,
    cut_threshold_milli: int = 120,
):
    """Admission (frame floor + jump-cut density) → exact first-frame
    phash dedup keeping the min admitted video_id per hash on the
    narrow manifest — the video analog of curate_image/audio_corpus."""
    from .agg import group_top_k

    manifest = ds.map_batches(
        lambda t: curate_video_manifest_batch(
            t, min_frames, max_cut_ratio_milli, cut_threshold_milli
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=32,
    )
    return group_top_k(manifest, "first_phash", ["video_id"], [False], 1)


def sample_video_frames(ds, every_n: int = 30, concurrency=(1, 4), batch_size: int = 64):
    """Actor-pool frame sampling; small batches bound in-flight video
    payload bytes (the multimodal batch-size rule from the build brief)."""
    return ds.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ------------------------------------------------------- image near-dup


def phash_near_dup_pairs(
    ds,
    id_col: str = "iid",
    phash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 1024,
):
    """Image near-dup pairs by perceptual-hash hamming distance.

    The image analog of simhash text near-dup (the operator the
    reference's link-only dedup, news.py:152-162, cannot express):
    EXACT pairs with hamming(phash) <= ``max_hamming`` via the same
    pigeonhole banding — one narrow-row (id, band, bucket, hash)
    exchange, no all-pairs, over-cap buckets degrade to a logged hub
    star. ``id_col`` must be int64 (derive one from the string
    image_id upstream; canonical a<b ordering needs an ordinal key).
    """
    from .dedup import hash64_near_dup_pairs

    return hash64_near_dup_pairs(
        ds,
        hash_col=phash_col,
        id_col=id_col,
        max_hamming=max_hamming,
        bands=bands,
        kind="phash",
        max_bucket=max_bucket,
    )


def image_near_dup_pairs(
    ds, concurrency=2, batch_size: int = 64, max_hamming: int = 3, id_col: str = "iid"
):
    """Full image near-dup pipeline: decode -> recompute phash from
    PIXELS (never trust the stored metadata column) -> banded hamming
    pairing. Input needs (``id_col``:int64, bytes, fmt); the decode is
    the actor-pool stage, the pairing one bucket exchange."""
    feats = image_features(ds, concurrency=concurrency, batch_size=batch_size)
    sigs = feats.map_batches(
        lambda t: t.select([id_col, "phash_check"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return phash_near_dup_pairs(
        sigs, id_col=id_col, phash_col="phash_check", max_hamming=max_hamming
    )


def tile_fingerprint_batch(
    batch: pa.Table,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_col: str = "iid",
    tile: int = 16,
) -> pa.Table:
    """Explode each image into its codec-invariant tile fingerprints
    (codec.tile_hashes64 over 6-bit-quantized aligned tiles), value-
    deduped per image. Only narrow (iid, fp) rows leave the stage —
    the image-side analog of winnowing's fingerprint explode; undecodable
    rows contribute no fingerprints."""
    data = batch[bytes_col].to_pylist()
    fmts = batch[fmt_col].to_pylist()
    ids = np.asarray(batch[id_col], dtype=np.int64)
    out_id: list[np.ndarray] = []
    out_fp: list[np.ndarray] = []
    for i, (buf, fmt) in enumerate(zip(data, fmts)):
        if buf is None:
            continue
        try:
            px = codec.decode(buf, fmt)
        except Exception:
            continue
        fps = np.unique(codec.tile_hashes64(px, tile=tile))
        out_fp.append(fps)
        out_id.append(np.full(len(fps), ids[i], dtype=np.int64))
    if not out_fp:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "fp": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "fp": pa.array(np.concatenate(out_fp).view(np.int64), pa.int64()),
        }
    )


def tile_dup_pairs(
    ds,
    id_col: str = "iid",
    tile: int = 16,
    min_shared: int = 6,
    max_bucket: int = 4096,
    batch_size: int = 64,
):
    """Crop-robust image near-dup pairs: images sharing >= ``min_shared``
    aligned tile hashes. Catches the family phash misses — a grid-aligned
    crop shifts every 8×8 phash cell (hamming ~random) but shares every
    interior tile verbatim. Same scale shape as winnow_dup_pairs: narrow
    explode → shared_fingerprint_pairs' one fp exchange + (id_a,id_b)
    group-agg; over-cap tiles (flat-color boilerplate) star + log."""
    from .dedup import shared_fingerprint_pairs

    exploded = ds.map_batches(
        lambda b: tile_fingerprint_batch(b, id_col=id_col, tile=tile),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    return shared_fingerprint_pairs(
        exploded, id_col=id_col, min_shared=min_shared,
        max_bucket=max_bucket, family="tile",
    )


def image_cell_vectors(ds, id_col: str = "iid", concurrency=2, batch_size: int = 64):
    """decode -> 64-dim block-mean grayscale embedding per image
    (codec.cell_vector64), emitted as ``embedding: list<float32>`` —
    the image-side input to the similarity-search ops (knn_brute_force
    / knn_ivf take it as-is). Task-form decode like
    :func:`decode_features_batch`: the codec is pure, no actor state."""

    def embed(batch: pa.Table) -> pa.Table:
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        vecs = np.stack(
            [codec.cell_vector64(codec.decode(b, f)) for b, f in zip(data, fmts)]
        ) if data else np.zeros((0, 64), np.float32)
        return pa.table(
            {
                id_col: batch[id_col],
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            }
        )

    return ds.map_batches(
        embed, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def corpus_channel_histogram(ds, bins: int = 16, concurrency=2, batch_size: int = 64):
    """Corpus-wide per-channel pixel histogram: decode each image, one
    np.bincount per channel per batch (256/bins-wide buckets), emit
    (channel, bin, n) partials — a few hundred rows per block no matter
    how many pixels — merged by the zero-exchange combiner. The
    at-scale dataset-statistics pass (channel balance / normalization
    constants) over binary image columns. Exact integer counts."""
    from .agg import partial_group_agg

    width = 256 // bins

    def partial(batch: pa.Table) -> pa.Table:
        counts = np.zeros((3, bins), dtype=np.int64)
        for buf, fmt in zip(
            batch["bytes"].to_pylist(), batch["fmt"].to_pylist()
        ):
            px = codec.decode(buf, fmt)
            for c in range(3):
                counts[c] += np.bincount(
                    px[:, :, c].ravel() // width, minlength=bins
                )[:bins]
        ch = np.repeat(np.arange(3, dtype=np.int64), bins)
        bn = np.tile(np.arange(bins, dtype=np.int64), 3)
        return pa.table(
            {
                "channel": pa.array(ch, pa.int64()),
                "bin": pa.array(bn, pa.int64()),
                "n": pa.array(counts.ravel(), pa.int64()),
            }
        )

    part_ds = ds.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return partial_group_agg(part_ds, ["channel", "bin"], [("n", "sum", "n")])


class ImageTensorStage:
    """Training-batch tensor prep: decode → center-crop to square →
    block-mean resize to (out, out) → per-channel normalize to float32
    in [-1, 1]. The crop/resize stays in INTEGER space (block sums,
    floor division) so a sequential oracle verifies it exactly; the
    float normalize is a fixed affine of those ints. Emits the flat
    tensor (list<float32>, CHW) plus exact per-channel uint8 sums as
    the verification columns."""

    def __init__(self, out: int = 16, bytes_col: str = "bytes", fmt_col: str = "fmt"):
        self.out, self.bytes_col, self.fmt_col = out, bytes_col, fmt_col

    def _prep(self, px: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        out = self.out
        h, w, _ = px.shape
        s = min(h, w)
        y0, x0 = (h - s) // 2, (w - s) // 2
        c = px[y0 : y0 + s, x0 : x0 + s, :]
        b = max(s // out, 1)
        c = c[: b * out, : b * out, :]
        sums = c.reshape(out, b, out, b, 3).sum(axis=(1, 3), dtype=np.int64)
        q = (sums // (b * b)).astype(np.uint8)
        tensor = (q.astype(np.float32) / 255.0 - 0.5) / 0.5
        return q, np.moveaxis(tensor, 2, 0).ravel()  # CHW

    def __call__(self, batch: pa.Table) -> pa.Table:
        qs, tensors = [], []
        for buf, fmt in zip(
            batch[self.bytes_col].to_pylist(), batch[self.fmt_col].to_pylist()
        ):
            q, t = self._prep(codec.decode(buf, fmt))
            qs.append(q)
            tensors.append(t)
        sums = (
            np.stack([q.sum(axis=(0, 1)) for q in qs])
            if qs
            else np.zeros((0, 3), np.int64)
        )
        out = batch.drop_columns([self.bytes_col])
        out = out.append_column(
            "tensor",
            pa.array([t.tolist() for t in tensors], pa.list_(pa.float32())),
        )
        for j, name in enumerate(("sum_r", "sum_g", "sum_b")):
            out = out.append_column(name, pa.array(sums[:, j], pa.int64()))
        return out


def tensor_prep(ds, out: int = 16, concurrency=2, batch_size: int = 32):
    return ds.map_batches(
        ImageTensorStage,
        fn_constructor_kwargs={"out": out},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def image_meta_keep_mask(
    t: pa.Table,
    min_dim: int = 64,
    max_aspect: int = 2,
    min_caption_tokens: int = 8,
    fmts: tuple = ("png", "jpeg"),
):
    """(keep_mask, n_caption_tokens) for the admission predicates —
    one shared implementation so the standalone filter and the fused
    curation stage cannot drift."""
    import pyarrow.compute as pc

    w, h = t["w"], t["h"]
    lo = pc.min_element_wise(w, h)
    hi = pc.max_element_wise(w, h)
    ntok = pc.cast(
        pc.count_substring_regex(pc.coalesce(t["caption"], ""), r"\S+"), pa.int64()
    )
    keep = pc.and_(
        pc.and_(
            pc.greater_equal(lo, min_dim),
            pc.less_equal(hi, pc.multiply(lo, max_aspect)),
        ),
        pc.and_(
            pc.greater_equal(ntok, min_caption_tokens),
            pc.is_in(t["fmt"], value_set=pa.array(list(fmts))),
        ),
    )
    return keep, ntok


def image_meta_filter_batch(
    t: pa.Table,
    min_dim: int = 64,
    max_aspect: int = 2,
    min_caption_tokens: int = 8,
    fmts: tuple = ("png", "jpeg"),
) -> pa.Table:
    """LAION-style corpus admission filter on METADATA ONLY — the cheap
    first pass a 100 TB image corpus runs before any decode: minimum
    dimension, aspect-ratio bound (max(w,h) <= max_aspect*min(w,h),
    integer-exact), minimum caption token count, format allowlist. All
    pyarrow.compute; the ``bytes`` column never enters the stage (prune
    it at the read). Emits (image_id, w, h, fmt, n_caption_tokens)."""
    keep, ntok = image_meta_keep_mask(
        t, min_dim, max_aspect, min_caption_tokens, fmts
    )
    w, h = t["w"], t["h"]
    out = pa.table(
        {
            "image_id": t["image_id"],
            "w": w,
            "h": h,
            "fmt": t["fmt"],
            "n_caption_tokens": ntok,
        }
    )
    return out.filter(keep)


def image_meta_filter(ds, **kw):
    return ds.map_batches(
        lambda t: image_meta_filter_batch(t, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ASPECT_BUCKETS = ((1, 1), (4, 3), (3, 4), (16, 9), (9, 16), (2, 1), (1, 2))


def aspect_bucket_batch(t: pa.Table, buckets: tuple = ASPECT_BUCKETS) -> pa.Table:
    """Aspect-ratio bucketing for training (SDXL-style): each image
    goes to the bucket minimizing the INTEGER-EXACT distortion ratio
    ``max(w·bh, h·bw) / min(w·bh, h·bw)`` (first bucket wins ties) —
    cross-multiplied ints, so the argmin is reproducible across engines
    with no float log. Metadata-only; batching groups of one aspect
    into uniform training batches avoids padding waste. Emits
    (image_id, w, h, bucket)."""
    n = t.num_rows
    w = np.asarray(t["w"], dtype=np.int64)
    h = np.asarray(t["h"], dtype=np.int64)
    bw = np.array([b[0] for b in buckets], dtype=np.int64)
    bh = np.array([b[1] for b in buckets], dtype=np.int64)
    A = w[:, None] * bh[None, :]
    B = h[:, None] * bw[None, :]
    R = np.maximum(A, B) / np.minimum(A, B)
    idx = np.argmin(R, axis=1)  # first occurrence wins ties
    labels = np.array([f"{a}:{b}" for a, b in buckets])
    return pa.table(
        {
            "image_id": t["image_id"],
            "w": t["w"],
            "h": t["h"],
            "bucket": pa.array(labels[idx].tolist(), pa.string()),
        }
    )


def aspect_buckets(ds, buckets: tuple = ASPECT_BUCKETS):
    return ds.map_batches(
        lambda t: aspect_bucket_batch(t, buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def caption_consistency_batch(t: pa.Table) -> pa.Table:
    """Deterministic caption↔image consistency score (the CLIP-filter
    slot of an image-corpus pipeline, per the build contract's
    deterministic-fake rule for model steps): image side = the 8x8
    block-mean cell embedding (codec.cell_vector64, shared with the kNN
    oracle); caption side = 64-dim signed feature hashing of the tokens
    (integer accumulation — batching-order-proof); score = cosine of
    the two unit vectors. Real decode, real batching, real schema — a
    CLIP model swaps in at the embed lines only. Emits
    (image_id, clip_score: float64)."""
    from .hashing import tokenize_batch

    n = t.num_rows
    data = t["bytes"].to_pylist()
    fmts = t["fmt"].to_pylist()
    V = (
        np.stack([cell_vector64_f64(b, f) for b, f in zip(data, fmts)])
        if n
        else np.zeros((0, 64), np.float64)
    )
    hashes, offsets = tokenize_batch(t["caption"].combine_chunks())
    M = np.zeros((n, 64), dtype=np.int64)
    doc_idx = np.repeat(np.arange(n), np.diff(offsets))
    dims = (hashes % np.uint64(64)).astype(np.int64)
    signs = 1 - 2 * ((hashes >> np.uint64(6)) & np.uint64(1)).astype(np.int64)
    np.add.at(M, (doc_idx, dims), signs)
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    C = M.astype(np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    score = np.sum(Vn * Cn, axis=1)
    return pa.table(
        {
            "image_id": t["image_id"],
            "clip_score": pa.array(score, pa.float64()),
        }
    )


def cell_vector64_f64(buf: bytes, fmt: str) -> np.ndarray:
    """decode → cell embedding → float64 (one shared conversion point
    so the stage and the sequential oracle round identically)."""
    return codec.cell_vector64(codec.decode(buf, fmt)).astype(np.float64)


def caption_image_consistency(ds, batch_size: int = 64):
    return ds.map_batches(
        caption_consistency_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


RETRIEVAL_Q = 1 << 20


def unit_q64(v: np.ndarray, q: int = RETRIEVAL_Q) -> np.ndarray:
    """Unit-normalize a 64-dim float vector and quantize to int64
    (×q, half-away rounding via rint on non-adversarial values). Shared
    pure kernel: retrieval scores become EXACT integer dot products —
    bit-identical at any batch split, where a float BLAS matmul is not
    row-slice deterministic (measured, round 2)."""
    n = float(np.linalg.norm(v))
    return np.rint(v / max(n, 1e-12) * q).astype(np.int64)


def caption_retrieval_eval(ds, ks: tuple = (1, 5, 10), batch_size: int = 64):
    """Caption→image retrieval recall@k over the whole store — the
    cross-modal EVAL metric of a CLIP-style corpus (does this caption
    retrieve its own image from the gallery?).

    Gallery = every image's quantized unit cell embedding, assembled
    from per-block partials (ordinal + 64 ints per row — a documented
    small-side materialization, the brute-force baseline; the IVF path
    is the gallery-scale answer) and broadcast ONCE via ``ray.put``.
    Each caption batch builds its signed-feature-hash unit vectors,
    scores the gallery with ONE int64 matmul (exact — no float
    accumulation), and ranks the TRUE image by (score desc, ordinal
    asc). Output: one row per k — (k:int64, n_queries:int64,
    n_hits:int64)."""
    import ray as _ray

    from .agg import partial_group_agg
    from .hashing import tokenize_batch

    def gal_part(t: pa.Table) -> pa.Table:
        vecs = [
            unit_q64(cell_vector64_f64(b, f))
            for b, f in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist())
        ]
        flat = (
            np.stack(vecs).ravel() if vecs else np.zeros(0, np.int64)
        )
        return pa.table(
            {
                "ordinal": t["ordinal"],
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, pa.int64()), 64
                ),
            }
        )

    parts = ds.map_batches(
        gal_part, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    parts.sort(key=lambda r: r["ordinal"])
    G = np.array([r["vec"] for r in parts], dtype=np.int64)  # (N, 64)
    g_ref = _ray.put(G)
    ks_arr = np.array(sorted(ks), dtype=np.int64)

    def score(t: pa.Table) -> pa.Table:
        gal = _ray.get(g_ref)
        n = t.num_rows
        hashes, offsets = tokenize_batch(t["caption"].combine_chunks())
        M = np.zeros((n, 64), dtype=np.int64)
        doc_idx = np.repeat(np.arange(n), np.diff(offsets))
        dims = (hashes % np.uint64(64)).astype(np.int64)
        signs = 1 - 2 * ((hashes >> np.uint64(6)) & np.uint64(1)).astype(np.int64)
        np.add.at(M, (doc_idx, dims), signs)
        Mq = np.stack(
            [unit_q64(M[i].astype(np.float64)) for i in range(n)]
        ) if n else np.zeros((0, 64), np.int64)
        true_ord = np.asarray(t["ordinal"], dtype=np.int64)
        S = Mq @ gal.T  # exact int64 scores (B, N)
        s_true = S[np.arange(n), true_ord]
        better = (S > s_true[:, None]).sum(axis=1)
        ties_before = (
            (S == s_true[:, None]) & (np.arange(gal.shape[0])[None, :] < true_ord[:, None])
        ).sum(axis=1)
        rank = better + ties_before
        hits = (rank[:, None] < ks_arr[None, :]).sum(axis=0)
        return pa.table(
            {
                "k": pa.array(ks_arr, pa.int64()),
                "n_queries": pa.array(np.full(len(ks_arr), n), pa.int64()),
                "n_hits": pa.array(hits.astype(np.int64), pa.int64()),
            }
        )

    scored = ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )
    return partial_group_agg(
        scored,
        ["k"],
        [("n_queries", "sum", "n_queries"), ("n_hits", "sum", "n_hits")],
    )


def curate_image_manifest_batch(
    t: pa.Table, min_clip_score: float = 0.0
) -> pa.Table:
    """ONE fused pass of the image-corpus curation pipeline: admission
    predicates (image_meta_keep_mask) gate which rows pay the decode,
    then caption↔image consistency scoring and aspect-bucket assignment
    run on the survivors only — at 100 TB this fusion is the difference
    between one payload read and three. Emits the training-manifest
    columns (image_id, w, h, fmt, bucket, clip_score, phash); exact
    phash dedup happens downstream on the narrow manifest rows."""
    import pyarrow.compute as pc

    keep, _ = image_meta_keep_mask(t)
    s = t.filter(keep)
    scored = caption_consistency_batch(s)
    buckets = aspect_bucket_batch(s)
    ok = pc.greater_equal(scored["clip_score"], min_clip_score)
    return pa.table(
        {
            "image_id": s["image_id"],
            "w": s["w"],
            "h": s["h"],
            "fmt": s["fmt"],
            "bucket": buckets["bucket"],
            "clip_score": scored["clip_score"],
            "phash": s["phash"],
        }
    ).filter(ok)


def curate_image_corpus(ds, min_clip_score: float = 0.0):
    """Admission → decode-score → bucket (fused map) → exact phash
    dedup keeping the min admitted image_id per hash (group_top_k on
    the narrow manifest — payload bytes never enter the exchange)."""
    from .agg import group_top_k

    manifest = ds.map_batches(
        lambda t: curate_image_manifest_batch(t, min_clip_score),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
    )
    deduped = group_top_k(manifest, "phash", ["image_id"], [False], k=1)
    return deduped.map_batches(
        lambda t: t.select(
            ["image_id", "w", "h", "fmt", "bucket", "clip_score", "phash"]
        ),
        batch_format="pyarrow",
    )


def payload_psnr_batch(t: pa.Table) -> pa.Table:
    """The input_hint's per-row payload invariant as DATA: decode each
    payload and measure PSNR against the row's REFERENCE pixels
    (``ref_px`` raw uint8 bytes, shaped by the row's w/h) — lossless
    formats must match exactly (psnr_db NULL, lossless=true), lossy
    ones must stay ≥ 40 dB (the north-rule bound). ``psnr_ok`` makes
    corpus-wide invariant checks one filter, the same way
    politeness_audit turns the crawl budget into a checkable column."""
    ids, fmts_out, lossless, vals, oks = [], [], [], [], []
    for iid, buf, fmt, ref, w, h in zip(
        t["image_id"].to_pylist(),
        t["bytes"].to_pylist(),
        t["fmt"].to_pylist(),
        t["ref_px"].to_pylist(),
        t["w"].to_pylist(),
        t["h"].to_pylist(),
    ):
        px = codec.decode(buf, fmt)
        ref_arr = np.frombuffer(ref, dtype=np.uint8).reshape(h, w, 3)
        p = codec.psnr(ref_arr, px)
        ids.append(iid)
        fmts_out.append(fmt)
        if p == float("inf"):
            lossless.append(True)
            vals.append(None)
            oks.append(True)
        else:
            lossless.append(False)
            vals.append(p)
            oks.append(p >= 40.0)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "fmt": pa.array(fmts_out, pa.string()),
            "lossless": pa.array(lossless, pa.bool_()),
            "psnr_db": pa.array(vals, pa.float64()),
            "psnr_ok": pa.array(oks, pa.bool_()),
        }
    )


def payload_psnr_audit(ds, batch_size: int = 64):
    """Actor-free decode audit (the codec is pure, like the other
    decode-class task stages); per-row loop is the decode itself."""
    return ds.map_batches(
        payload_psnr_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
