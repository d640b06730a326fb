"""Multimodal column operators: image decode / resize / feature-extract,
audio & video stubs.

Images ride as opaque Arrow ``binary`` columns with typed metadata
(``w:int32, h:int32, fmt:string`` — the input_hint schema). Decode-class
stages are actor pools (``map_batches(Cls, concurrency=..)``): codec
state initialises once per actor, batches stay small because each row is
~KB-MB of pixels (SURVEY.md §7 "wide binary rows" — tune ``batch_size``
× concurrency to worker heap, never convert binary blocks to pandas).

The image codec here is the repo's pure-Python PNG/lossy pair
(fixtures/codec.py) — real decode, real PSNR invariant. PIL/libjpeg are
not in this container; swapping them in changes only ``__init__``. Audio
and video decoding have no pure-Python stand-in, so those stages carry
the full Ray-side plumbing (schema, actor signature, batching) and raise
``NotImplementedError`` at the codec call, per the build contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures import codec

IMG_FEATURE_COLS = [
    "mean_r", "mean_g", "mean_b", "std_gray", "phash_check",
]


def decode_feature_arrays(
    data: list, fmts: list, out: "tuple[np.ndarray, ...] | None" = None,
    positions: "np.ndarray | None" = None, n: int | None = None,
    decode=None, flush_at: int = 2048,
):
    """Decode a list of encoded buffers → (mean_rgb, std_gray, phash, ok)
    arrays. ``positions`` scatters results into preallocated ``out``
    arrays (the fused fetch+decode stage decodes shard-grouped rows and
    writes features at their batch positions — no payload reorder pass).
    Decode is per row (zlib is C); statistics are vectorized across
    same-shape (k, h, w, 3) stacks, FLUSHED every ``flush_at`` images:
    unbounded stacks of a 31 k-row block allocate ~0.5 GB of float
    temporaries per task and thrash memory bandwidth — measured 9x
    slower than 2 k-image chunks when 8 tasks decode concurrently.
    """
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

    def flush(shape, idxs, pxs):
        P = np.stack(pxs)
        ix = np.asarray(idxs)
        mean_rgb[ix] = P.reshape(len(ix), -1, 3).mean(axis=1, dtype=np.float32)
        gray = P.mean(axis=3, dtype=np.float32)
        std_gray[ix] = gray.reshape(len(ix), -1).std(axis=1)
        if shape[0] % 8 == 0 and shape[1] % 8 == 0:
            phash[ix] = codec.phash64_batch(P)
        else:
            for j, px in zip(ix, pxs):
                phash[j] = codec.phash64(px)

    by_shape: dict[tuple, tuple[list, list]] = {}
    for i, buf, fmt in zip(positions, data, fmts):
        if buf is None:
            ok[i] = False
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
    return mean_rgb, std_gray, phash, ok


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
    """STUB: audio binary → features. Plumbing real, codec absent.

    Schema contract: input (audio_id:string, bytes:binary, sample_rate:
    int32, fmt:string) → output adds (duration_s:float64, rms:float64).
    The decode call raises NotImplementedError until a codec (soundfile/
    ffmpeg) is installed; ``fake=True`` substitutes a deterministic
    length-derived stand-in so pipelines exercise the full path.
    """

    def __init__(self, fake: bool = False, bytes_col: str = "bytes"):
        self.fake, self.bytes_col = fake, bytes_col

    def _decode(self, buf: bytes, sample_rate: int) -> np.ndarray:
        if self.fake:
            # deterministic stand-in: bytes → int16-ish waveform
            arr = np.frombuffer(buf[: (len(buf) // 2) * 2], dtype=np.int16)
            return arr.astype(np.float64) / 32768.0
        raise NotImplementedError("no audio codec in this environment (install soundfile)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, rms = [], []
        for buf, sr in zip(batch[self.bytes_col].to_pylist(), batch["sample_rate"].to_pylist()):
            wave = self._decode(buf, sr)
            durs.append(len(wave) / max(sr, 1))
            rms.append(float(np.sqrt(np.mean(wave**2))) if len(wave) else 0.0)
        return (
            batch.drop_columns([self.bytes_col])
            .append_column("duration_s", pa.array(durs, pa.float64()))
            .append_column("rms", pa.array(rms, pa.float64()))
        )


class VideoFrameSampleStage:
    """STUB: video binary → sampled frame features. Plumbing real.

    Contract: input (video_id, bytes, fps:int32, fmt) → output
    (video_id, frame_idx:int32, frame_feature:float64) rows via the
    same flat_map-style expansion a real frame sampler would use.
    """

    def __init__(self, every_n: int = 30, fake: bool = False):
        self.every_n, self.fake = every_n, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, feats = [], [], []
        for vid, buf in zip(batch["video_id"].to_pylist(), batch["bytes"].to_pylist()):
            if not self.fake:
                raise NotImplementedError("no video codec in this environment (install av)")
            n_frames = max(1, len(buf) // 1024)
            for f in range(0, n_frames, self.every_n):
                vids.append(vid)
                idxs.append(f)
                feats.append(float(buf[f % len(buf)]) if buf else 0.0)
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_feature": pa.array(feats, pa.float64()),
            }
        )
