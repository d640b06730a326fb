"""Deterministic synthetic fixtures: page-store, frontier, robots, IOC pages.

Shapes follow FIXTURES.md / BASELINE.json ``input_hint``. Everything is
reproducible from ``(seed, row_count)`` alone — no wall clock, no network.

The page-store is the stand-in for the reference's fetched HTML pages
(SURVEY.md §2.1 S1-S4): a table of image+caption pairs whose captions
embed ``link:imgXXXXXXXX`` outlink tokens, so the parse stage discovers
depth-1+ frontier rows deterministically (the ASEC listing->post
expansion, /root/reference/src/secbot/fetchers/asec.py:64-76, becomes a
caption-token expansion here).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import codec

N_HOSTS = 50
SIZES = (32, 64, 128)
EPOCH_US = 1_750_000_000_000_000  # fixed base timestamp (us)

_VOCAB = (
    "malware ransom phishing exploit patch advisory breach botnet leak "
    "zero day campaign actor sample report update security network data "
    "image photo caption scene object color light frame detail view"
).split()

_KEYWORDS = (
    "malware ransom phishing exploit breach botnet zeroday backdoor "
    "trojan rootkit spyware keylogger cve vulnerability apt injection "
    "xss dos hijack stealer wiper worm rat loader dropper miner c2 skimmer"
).split()  # 28 tokens, mirroring the reference's 28-keyword list (news.py:38-68)


def _zipf_cdf(n_hosts: int, zipf_s: float) -> np.ndarray:
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = ranks**-zipf_s
    return np.cumsum(p / p.sum())


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based 64-bit mix (splitmix64): vectorized, stateless."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hosts_for(idxs: np.ndarray, n_hosts: int, zipf_s: float, seed: int) -> np.ndarray:
    """Vectorized Zipf-skewed host assignment keyed by (seed, idx).

    Counter-based hash → uniform → inverse-CDF; fully vectorized so
    10^6-row fixture generation is hashing-speed, not RNG-construction
    speed.
    """
    cdf = _zipf_cdf(n_hosts, zipf_s)
    x = (np.uint64(seed) << np.uint64(32)) ^ np.asarray(idxs, dtype=np.uint64)
    u = _splitmix64(x).astype(np.float64) / float(1 << 64)
    choice = np.searchsorted(cdf, u, side="right")
    return np.array([f"news{c}.example.com" for c in choice])


def host_of(idx: int, n_hosts: int = N_HOSTS, zipf_s: float = 1.2, seed: int = 42) -> str:
    """Deterministic Zipf-skewed host for image index ``idx``.

    Delegates to :func:`_hosts_for` — outlink expansion maps an
    image_id back to the exact URL the frontier generator would emit.
    """
    return str(_hosts_for(np.array([idx]), n_hosts, zipf_s, seed)[0])


def image_id(k: int) -> str:
    return f"img{k:08d}"


def url_for(k: int, seed: int = 42) -> str:
    return f"https://{host_of(k, seed=seed)}/p/{image_id(k)}"


def make_pagestore(
    n: int,
    seed: int = 42,
    out_degree: int = 3,
    ioc_every: int = 7,
    image_pool: int | None = None,
    sizes: tuple = SIZES,
) -> pa.Table:
    """Build the image+caption page-store (input_hint schema).

    ``image_pool``: if set, only that many distinct pixel arrays are
    encoded and rows cycle through them (bytes/w/h/fmt/phash repeat) —
    for large benchmark stores where encoding 10^6 unique images would
    dominate generation time. Captions/ids stay unique. ``bytes`` is
    ``large_binary`` so multi-GB stores never overflow int32 offsets.
    """
    rng = np.random.default_rng(seed)
    pool_n = image_pool or n
    pool_px, pool_bytes, pool_w, pool_h, pool_fmt, pool_hash = [], [], [], [], [], []
    for k in range(pool_n):
        r = np.random.default_rng((seed, 1, k))
        w = int(r.choice(sizes))
        h = int(r.choice(sizes))
        fmt = "png" if r.random() < 0.5 else "jpeg"
        px = r.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        pool_px.append(px)
        pool_bytes.append(codec.encode(px, fmt))
        pool_w.append(w)
        pool_h.append(h)
        pool_fmt.append(fmt)
        pool_hash.append(codec.phash64(px))

    # vectorized caption assembly: one RNG, batched draws, offsets per row
    r2 = np.random.default_rng((seed, 2))
    word_mat = r2.choice(_VOCAB, size=(n, 8)) if n else np.zeros((0, 8), dtype=object)
    degs = r2.integers(0, out_degree + 1, size=n)
    offsets = np.concatenate([[0], np.cumsum(degs)])
    targets = r2.integers(0, n, size=int(degs.sum())) if n else np.zeros(0, np.int64)
    t_hosts = _hosts_for(targets, N_HOSTS, 1.2, seed)
    link_toks = [
        f"link:https://{h}/p/{image_id(int(t))}" for t, h in zip(targets, t_hosts)
    ]
    ioc_idx = np.arange(0, n, ioc_every)
    ioc_oct = r2.integers(0, 256, size=(len(ioc_idx), 4))
    ioc_oct[:, 0] = np.maximum(ioc_oct[:, 0], 1)
    ioc_oct[:, 3] = np.maximum(ioc_oct[:, 3], 1)
    ioc_toks = {
        int(k): f"{a}[.]{b}[.]{c}[.]{d}"
        for k, (a, b, c, d) in zip(ioc_idx, ioc_oct)
    }

    # pooled columns: replicate the pool via vectorized Arrow take
    # (byte-identical to the old per-row Python loop, ~20x faster at
    # bench scale — the 2M-row store was ~17 min single-threaded)
    j = (np.arange(n, dtype=np.int64) % pool_n) if n else np.zeros(0, np.int64)
    j_idx = pa.array(j)
    bytes_arr = pa.array(pool_bytes, pa.large_binary()).take(j_idx)
    w_arr = pa.array(pool_w, pa.int32()).take(j_idx)
    h_arr = pa.array(pool_h, pa.int32()).take(j_idx)
    fmt_arr = pa.array(pool_fmt, pa.string()).take(j_idx)
    hash_arr = pa.array(pool_hash, pa.int64()).take(j_idx)
    ids = pa.array([image_id(k) for k in range(n)], pa.string())

    # caption := " ".join(8 words + out-links + optional ioc token):
    # scatter all tokens into one flat array in row order, then one
    # vectorized pc.binary_join over a ListArray view
    ioc_flag = np.zeros(n, dtype=np.int64)
    ioc_flag[ioc_idx] = 1
    row_len = 8 + degs + ioc_flag
    row_off = np.concatenate([[0], np.cumsum(row_len)])
    flat = np.empty(int(row_off[-1]), dtype=object)
    word_slots = (row_off[:-1, None] + np.arange(8)[None, :]).ravel()
    flat[word_slots] = word_mat.ravel()
    if len(targets):
        link_row = np.repeat(np.arange(n), degs)
        within = np.arange(len(targets)) - np.repeat(offsets[:-1], degs)
        flat[row_off[link_row] + 8 + within] = np.asarray(link_toks, dtype=object)
    if len(ioc_idx):
        flat[row_off[ioc_idx] + 8 + degs[ioc_idx]] = np.asarray(
            [ioc_toks[int(k)] for k in ioc_idx], dtype=object
        )
    token_list = pa.ListArray.from_arrays(
        pa.array(row_off, pa.int32()), pa.array(flat, pa.string())
    )
    captions = pc.binary_join(token_list, " ")

    return pa.table(
        {
            "image_id": ids,
            "bytes": bytes_arr,
            "w": w_arr,
            "h": h_arr,
            "fmt": fmt_arr,
            "caption": captions,
            "phash": hash_arr,
        }
    )


def make_neardup_pagestore(
    n_base: int, seed: int = 42, flip_cells: int = 2
) -> pa.Table:
    """Page-store (input_hint schema) with PLANTED image near-dups.

    Each base image is a 64x64 block pattern — every 8x8 phash cell is
    uniformly 0 or 255, exactly 32 bright — so the average-hash bits ARE
    the bright-cell mask with margin ~127 (no threshold fragility, lossy
    encodings included). Row k's near-dup copy (id ``dup{k:08d}``) flips
    exactly ``flip_cells`` cells, so hamming(phash_k, phash_dup_k) ==
    flip_cells deterministically; distinct base patterns sit ~32 apart.
    Stand-in for the reference re-posting the same screenshot with a
    cropped corner (news.py:152-162 dedups only by link, so the image
    dup survives there — this is the operator the reference lacks).
    """
    px_list, ids = [], []
    for k in range(n_base):
        r = np.random.default_rng((seed, 7, k))
        bright = np.zeros(64, dtype=bool)
        bright[r.choice(64, 32, replace=False)] = True
        flips = r.choice(64, flip_cells, replace=False)
        dup = bright.copy()
        dup[flips] = ~dup[flips]
        for mask, prefix in ((bright, "img"), (dup, "dup")):
            cells = (mask.reshape(8, 8).astype(np.uint8)) * np.uint8(255)
            px = np.repeat(np.repeat(cells, 8, axis=0), 8, axis=1)
            px_list.append(np.repeat(px[:, :, None], 3, axis=2))
            ids.append(f"{prefix}{k:08d}")
    r2 = np.random.default_rng((seed, 8))
    fmts = ["png" if r2.random() < 0.5 else "jpeg" for _ in px_list]
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(
                [codec.encode(px, f) for px, f in zip(px_list, fmts)],
                pa.large_binary(),
            ),
            "w": pa.array([64] * len(ids), pa.int32()),
            "h": pa.array([64] * len(ids), pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array([f"block pattern {i}" for i in ids], pa.string()),
            "phash": pa.array([codec.phash64(px) for px in px_list], pa.int64()),
        }
    )


def make_cropdup_pagestore(n_base: int, seed: int = 42, tile: int = 16) -> pa.Table:
    """Image store with PLANTED grid-aligned cropped copies.

    Base k is 64×64 random pixels; its copy (id ``crp{k:08d}``) is the
    top-left 48×48 crop of the SAME pixels, possibly re-encoded in the
    other format. With ``tile``=16 the base has 16 tile hashes and the
    crop 9 — all 9 shared (codec.tile_hashes64 is 6-bit-quantization
    invariant) — while distinct random bases collide on 0 tiles whp.
    The near-dup case phash misses: a crop shifts every 8×8 phash cell,
    so hamming(base, crop) is ~random; tile bags still overlap."""
    px_list, ids, fmts = [], [], []
    for k in range(n_base):
        r = np.random.default_rng((seed, 11, k))
        px = r.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        crop = px[:48, :48]
        base_fmt = "png" if r.random() < 0.5 else "jpeg"
        crop_fmt = "jpeg" if base_fmt == "png" else "png"
        for p, prefix, f in ((px, "img", base_fmt), (crop, "crp", crop_fmt)):
            px_list.append(p)
            ids.append(f"{prefix}{k:08d}")
            fmts.append(f)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(
                [codec.encode(px, f) for px, f in zip(px_list, fmts)],
                pa.large_binary(),
            ),
            "w": pa.array([px.shape[1] for px in px_list], pa.int32()),
            "h": pa.array([px.shape[0] for px in px_list], pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array([f"crop family {i}" for i in ids], pa.string()),
            "phash": pa.array(
                [codec.phash64(px) if px.shape[0] % 8 == 0 else 0 for px in px_list],
                pa.int64(),
            ),
        }
    )


def make_letterbox_store(n: int, seed: int = 42, sizes: tuple = (32, 48)) -> pa.Table:
    """Image store with PLANTED letterbox/pillarbox bars: row i gets
    black top+bottom bars (i%3==0, h//8 rows each), black left+right
    bars (i%3==1, w//8 cols each), or no bars (i%3==2). Interior pixels
    draw from [16,256) so lossy 6-bit quantization can never alias an
    interior pixel to the bar color — bar counts are exact for both
    codecs."""
    rows = []
    for i in range(n):
        r = np.random.default_rng((seed, 9, i))
        w, h = int(r.choice(sizes)), int(r.choice(sizes))
        fmt = "png" if r.random() < 0.5 else "jpeg"
        px = r.integers(16, 256, size=(h, w, 3), dtype=np.uint8)
        if i % 3 == 0:
            k = max(2, h // 8)
            px[:k] = 0
            px[h - k :] = 0
        elif i % 3 == 1:
            m = max(2, w // 8)
            px[:, :m] = 0
            px[:, w - m :] = 0
        rows.append(
            {
                "iid": i,
                "bytes": codec.encode(px, fmt),
                "fmt": fmt,
                "w": w,
                "h": h,
            }
        )
    t = pa.Table.from_pylist(rows)
    return t.set_column(
        t.column_names.index("bytes"),
        "bytes",
        pa.array([r["bytes"] for r in rows], pa.large_binary()),
    )


def make_audiostore(n: int, seed: int = 42, dup_every: int = 0) -> pa.Table:
    """Audio store: (audio_id, bytes:large_binary REAL WAV PCM16 mono,
    sample_rate:int32, fmt='wav', n_samples:int32).

    Waveform i = two deterministic sine partials + seeded integer noise,
    length 400..2399 samples at 8 or 16 kHz — small enough that a
    100k-row store stays in MBs, structured enough that RMS/peak/ZCR
    features differ per row. ``dup_every=k`` plants near-duplicates:
    every k-th clip (i % k == 0, i > 0) reuses clip i-1's waveform with
    tiny fresh noise — same energy envelope, different samples (the
    audio analog of the page-store's planted near-dup images). The
    reference has no audio (SURVEY §2); this extends the input_hint's
    opaque-binary payload column family to the audio modality."""
    rows = []
    prev_wave = None
    for i in range(n):
        r = np.random.default_rng((seed, 11, i))
        rate = 8000 if i % 2 == 0 else 16000
        n_samp = 400 + int(r.integers(0, 2000))
        t = np.arange(n_samp, dtype=np.float64) / rate
        f0 = 100.0 + float(r.integers(0, 900))
        amp = 3000 + int(r.integers(0, 9000))
        wave = amp * np.sin(2 * np.pi * f0 * t) + 0.3 * amp * np.sin(
            2 * np.pi * 2.7 * f0 * t
        )
        wave = wave + r.integers(-500, 500, size=n_samp)
        if dup_every and i > 0 and i % dup_every == 0:
            wave = prev_wave + r.integers(-40, 40, size=len(prev_wave))
            rate = 8000 if (i - 1) % 2 == 0 else 16000
            n_samp = len(wave)
        prev_wave = wave
        samples = np.clip(np.rint(wave), -32768, 32767).astype(np.int16)
        rows.append(
            {
                "audio_id": f"au{i:06d}",
                "bytes": codec.encode_wav(samples, rate),
                "sample_rate": rate,
                "fmt": "wav",
                "n_samples": n_samp,
            }
        )
    t = pa.Table.from_pylist(rows)
    t = t.set_column(
        t.column_names.index("bytes"),
        "bytes",
        pa.array([r["bytes"] for r in rows], pa.large_binary()),
    )
    t = t.set_column(
        t.column_names.index("sample_rate"),
        "sample_rate",
        pa.array([r["sample_rate"] for r in rows], pa.int32()),
    )
    return t.set_column(
        t.column_names.index("n_samples"),
        "n_samples",
        pa.array([r["n_samples"] for r in rows], pa.int32()),
    )


def make_videostore(
    n: int, seed: int = 42, sizes: tuple = (32, 48), cut_every: int = 0
) -> pa.Table:
    """Video store: (video_id, bytes:large_binary NCV1 length-framed
    frames, fps:int32, n_frames:int32, fmt). Frames are a moving bright
    square over a per-video random background — consecutive frames
    differ deterministically so frame-sample features are
    discriminative. Frame payloads use the real image codecs (PNG /
    QIM); the container's length framing lets the sampler seek over
    unsampled frames without decoding (fixtures/codec.encode_video)."""
    rows = []
    for i in range(n):
        r = np.random.default_rng((seed, 12, i))
        w, h = int(r.choice(sizes)), int(r.choice(sizes))
        fmt = "png" if r.random() < 0.5 else "jpeg"
        fps = int(r.choice([10, 24]))
        n_frames = 6 + int(r.integers(0, 19))
        bg = r.integers(0, 128, size=(h, w, 3), dtype=np.uint8)
        frames = []
        sq = max(4, min(w, h) // 4)
        for f in range(n_frames):
            if cut_every and f > 0 and f % cut_every == 0:
                # planted SCENE CUT: a fresh background (large luma jump
                # vs the moving-square-only deltas between other frames)
                bg = r.integers(0, 128, size=(h, w, 3), dtype=np.uint8)
            px = bg.copy()
            x0 = (f * 3) % max(1, w - sq)
            y0 = (f * 2) % max(1, h - sq)
            px[y0 : y0 + sq, x0 : x0 + sq] = 200 + (f % 8) * 4
            frames.append(px)
        rows.append(
            {
                "video_id": f"vid{i:06d}",
                "bytes": codec.encode_video(frames, fps, fmt),
                "fps": fps,
                "n_frames": n_frames,
                "fmt": fmt,
            }
        )
    t = pa.Table.from_pylist(rows)
    t = t.set_column(
        t.column_names.index("bytes"),
        "bytes",
        pa.array([r["bytes"] for r in rows], pa.large_binary()),
    )
    t = t.set_column(
        t.column_names.index("fps"),
        "fps",
        pa.array([r["fps"] for r in rows], pa.int32()),
    )
    return t.set_column(
        t.column_names.index("n_frames"),
        "n_frames",
        pa.array([r["n_frames"] for r in rows], pa.int32()),
    )


def make_frontier(
    n: int, seed: int = 42, dup_frac: float = 0.05, noise_frac: float = 0.05
) -> pa.Table:
    """Seed/candidate frontier over the first ``n`` page-store URLs.

    ~dup_frac verbatim duplicates and ~noise_frac canonicalization-noise
    duplicates (uppercase host, :443 port, trailing '?', defanged [.])
    exercise the canonicalizer (reference dedup identity:
    scheduler.py:52-75, news.py:154-162).
    """
    idxs = np.arange(n)
    hosts = _hosts_for(idxs, N_HOSTS, 1.2, seed)
    urls = [f"https://{h}/p/{image_id(int(k))}" for k, h in zip(idxs, hosts)]
    rng = np.random.default_rng((seed, 3))

    rows_url, rows_host, rows_seq = list(urls), list(hosts), list(range(n))
    n_dup = int(n * dup_frac)
    for i in rng.integers(0, n, size=n_dup):
        rows_url.append(urls[int(i)])
        rows_host.append(hosts[int(i)])
        rows_seq.append(n + len(rows_seq) - n)
    n_noise = int(n * noise_frac)
    for i in rng.integers(0, n, size=n_noise):
        u, h = urls[int(i)], hosts[int(i)]
        kind = int(rng.integers(0, 4))
        if kind == 0:
            u = u.replace("https://", "https://" + "", 1).replace(h, h.upper(), 1)
        elif kind == 1:
            u = u.replace(h, h + ":443", 1)
        elif kind == 2:
            u = u + "?"
        else:
            u = u.replace(".", "[.]")
        rows_url.append(u)
        rows_host.append(h)
        rows_seq.append(len(rows_seq))

    m = len(rows_url)
    seq = np.arange(m, dtype=np.int64)
    discovered = EPOCH_US + seq * 1_000_000
    priority = 1.0 - seq / max(1, m)  # newer rows appended later get LOWER seq-priority;
    # recency-derived: priority decreases with seq so file order == priority order,
    # mirroring the reference's ordered feed list + newest-first sort (news.py:152).
    return pa.table(
        {
            "url": pa.array(rows_url, pa.string()),
            "host": pa.array(rows_host, pa.string()),
            "depth": pa.array(np.zeros(m, np.int32)),
            "discovered_at": pa.array(discovered, pa.timestamp("us")),
            "priority": pa.array(priority, pa.float64()),
        }
    )


def make_robots(seed: int = 42, n_hosts: int = N_HOSTS) -> pa.Table:
    """Per-host robots rules + crawl delay (reference sleep(1) analog)."""
    rng = np.random.default_rng((seed, 4))
    hosts = [f"news{i}.example.com" for i in range(n_hosts)]
    disallow, delay = [], []
    for i in range(n_hosts):
        if rng.random() < 0.10:
            disallow.append([f"/p/img000000"])  # blocks img000000x ids by prefix
        else:
            disallow.append([])
        delay.append(int(rng.choice([100, 500, 1000])))
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "disallow_prefixes": pa.array(disallow, pa.list_(pa.string())),
            "crawl_delay_ms": pa.array(delay, pa.int32()),
        }
    )


def make_ioc_pages(n: int = 60, seed: int = 42, today: str = "2025-06-20") -> pa.Table:
    """ASEC-analog text fixtures with known IOC counts (FIXTURES.md §5)."""
    rng = np.random.default_rng((seed, 5))
    docs, texts, dates, titles = [], [], [], []
    for k in range(n):
        r = np.random.default_rng((seed, 5, k))
        parts = list(r.choice(_VOCAB, size=6))
        parts.append(f"{r.integers(1,223)}.{r.integers(0,255)}.{r.integers(0,255)}.{r.integers(1,254)}")
        parts.append(f"{r.integers(1,223)}[.]{r.integers(0,255)}[.]{r.integers(0,255)}[.]{r.integers(1,254)}")
        parts.append("999.1.1.1")  # non-match (invalid octet)
        parts.append("".join(r.choice(list("0123456789abcdef"), size=32)))  # md5
        if k % 2 == 0:
            parts.append("".join(r.choice(list("0123456789abcdef"), size=64)))  # sha256
        parts.append(f"https://mal{k}.example.org/x{k}")
        parts.append(f"https[:]//bad{k}[.]example[.]net/y{k}")
        parts.append(f"https://asec.ahnlab.com/post{k}")  # excluded domain
        parts.append("deadbeef" * 9)  # overlong hex, must not match
        docs.append(f"doc{k:04d}")
        texts.append(" ".join(parts))
        dates.append(today if k % 3 != 2 else "2025-06-01")
        kw = _KEYWORDS[k % len(_KEYWORDS)] if k % 2 == 0 else "weather"
        titles.append(f"{kw} report {k}")
    import datetime as _dt

    return pa.table(
        {
            "doc_id": pa.array(docs, pa.string()),
            "text": pa.array(texts, pa.string()),
            "published": pa.array(
                [_dt.date.fromisoformat(d) for d in dates], pa.date32()
            ),
            "title": pa.array(titles, pa.string()),
        }
    )


def _listing_items(n_pages: int, items_per_page: int, seed: int) -> list[dict]:
    """Item-level ground truth behind the HTML listing fixture.

    Every 5th item on a page re-links the article of item ``i-2`` (same
    page) under a different title and date — a genuine duplicate-link
    case so dedup-by-link keep-newest is actually exercised (the
    reference's news.get dedup, news.py:154-162). Both rows of a dup
    pair carry keyword titles so they survive the keyword filter.
    """
    rng = np.random.default_rng((seed, 6))
    items = []
    for p in range(n_pages):
        page_url = f"https://news{p}.example.com/list?page={p}"
        for i in range(items_per_page):
            k = p * items_per_page + i
            idx = k - 2 if (i % 5 == 4 and i >= 2) else k
            kw = _KEYWORDS[k % len(_KEYWORDS)] if i % 2 == 0 else "weather"
            day = 1 + int(rng.integers(0, 27))
            items.append(
                {
                    "page_url": page_url,
                    "href": f"/view?idx={idx}",
                    "link": f"https://news{p}.example.com/view?idx={idx}",
                    "title": f"{kw} headline {k}",
                    "day": day,
                    "minute": i % 10,
                }
            )
    return items


def make_html_listing(n_pages: int = 5, items_per_page: int = 8, seed: int = 42) -> pa.Table:
    """Synthetic BoanNews-style HTML listing pages (M1/S1 fixture).

    Each page embeds ``items_per_page`` news_list blocks with relative
    hrefs, keyword-bearing titles (even items) and Korean-format bylines.
    Rendered from :func:`_listing_items`, whose item table doubles as
    the ground-truth oracle for the news pipeline.
    """
    items = _listing_items(n_pages, items_per_page, seed)
    urls, htmls = [], []
    by_page: dict[str, list[str]] = {}
    for it in items:
        by_page.setdefault(it["page_url"], []).append(
            f'<div class="news_list"><a href="{it["href"]}">'
            f'<span class="news_txt">{it["title"]}</span>'
            f'<span class="news_writer">kim 기자 | 2025년 6월 {it["day"]}일 09:0{it["minute"]}</span>'
            f"</a></div>"
        )
    for page_url, blocks in by_page.items():
        urls.append(page_url)
        htmls.append("<html><body>" + "\n".join(blocks) + "</body></html>")
    return pa.table(
        {
            "base_url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.string()),
        }
    )


def make_html_listing_truth(
    n_pages: int = 5, items_per_page: int = 8, seed: int = 42
) -> pa.Table:
    """Ground-truth item table for :func:`make_html_listing`: what a
    correct parse must recover (absolutized link, title, published)."""
    import datetime as _dt

    items = _listing_items(n_pages, items_per_page, seed)
    return pa.table(
        {
            "link": pa.array([it["link"] for it in items], pa.string()),
            "title": pa.array([it["title"] for it in items], pa.string()),
            "published": pa.array(
                [_dt.date(2025, 6, it["day"]) for it in items], pa.date32()
            ),
        }
    )


def make_rss_feed(n: int = 40, seed: int = 42, today: str = "2025-06-20") -> pa.Table:
    """Synthetic KISA-style feed entries (S2/M4/M5 fixture).

    Four published-date shapes cycle through the entries, exercising
    every branch of the reference's date handling (advisory.py:81-95):
    same-day UTC timestamps; previous-day LATE-UTC timestamps that cross
    into ``today`` only after the +9 h Seoul shift; bare ``YYYY-MM-DD``
    regex-fallback strings (half yesterday's date → dropped by the today
    filter); and junk that falls through to the default day. Titles and
    links carry edge whitespace; every 3rd summary is null so the
    description fallback fires.
    """
    rng = np.random.default_rng((seed, 7))
    ids, seqs, titles, links, published, summaries, descriptions = (
        [], [], [], [], [], [], []
    )
    for k in range(n):
        kind = k % 4
        if kind == 0:
            hour = int(rng.integers(0, 15))  # +9h stays on the same day
            pub = f"{today}T{hour:02d}:{int(rng.integers(0, 60)):02d}:00"
        elif kind == 1:
            hour = int(rng.integers(15, 24))  # +9h crosses into `today`
            pub = f"2025-06-19T{hour:02d}:{int(rng.integers(0, 60)):02d}:00"
        elif kind == 2:
            d = today if k % 8 == 2 else "2025-06-19"
            pub = f"posted on {d} KST"
        else:
            pub = "yesterday-ish"
        ids.append(f"adv{k:04d}")
        seqs.append(k)
        titles.append(f"  {_KEYWORDS[k % len(_KEYWORDS)]} advisory {k} ")
        links.append(f" https://kisa.example.org/adv/{k} ")
        published.append(pub)
        summaries.append(None if k % 3 == 0 else f"summary body {k}")
        descriptions.append(f"description body {k}")
    return pa.table(
        {
            "entry_id": pa.array(ids, pa.string()),
            "seq": pa.array(seqs, pa.int32()),
            "title": pa.array(titles, pa.string()),
            "link": pa.array(links, pa.string()),
            "published": pa.array(published, pa.string()),
            "summary": pa.array(summaries, pa.string()),
            "description": pa.array(descriptions, pa.string()),
        }
    )


def keywords() -> list[str]:
    return list(_KEYWORDS)


def write_fixture_dir(
    out_dir: str, n_pages: int, seed: int = 42, image_pool: int | None = None,
    sizes: tuple = SIZES,
) -> dict[str, str]:
    """Materialize pagestore/frontier/robots parquet under ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, tbl in (
        ("pagestore", make_pagestore(n_pages, seed=seed, image_pool=image_pool, sizes=sizes)),
        ("frontier", make_frontier(n_pages, seed=seed)),
        ("robots", make_robots(seed=seed)),
    ):
        p = os.path.join(out_dir, f"{name}.parquet")
        # bounded row groups: Ray parallelizes parquet reads by row
        # group, so one giant group would cap the whole pre-shuffle
        # pipeline at single-task parallelism
        pq.write_table(tbl, p, row_group_size=100_000)
        paths[name] = p
    return paths


def reference_pixels(k: int, seed: int = 42, sizes: tuple = SIZES) -> np.ndarray:
    """The TRUE pixels of pool image ``k`` — the same recipe
    make_pagestore encodes (row i uses pool image ``i % pool_n``). The
    per-row payload invariant (input_hint: decoded-pixel allclose /
    PSNR ≥ 40 dB for lossy) is checked against THIS ground truth."""
    r = np.random.default_rng((seed, 1, k))
    w = int(r.choice(sizes))
    h = int(r.choice(sizes))
    r.random()  # fmt draw, consumed to stay stream-aligned
    return r.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------- JSONL source


def make_jsonl_docs(n: int = 400, seed: int = 42) -> list[dict]:
    """Deterministic JSONL-source records — the raw-feed shape an
    ingest pipeline receives before parquet lands (one JSON object per
    line: id, kind, n_tokens, text). Pure Python so the expected
    oracle can recompute the same rows without touching Ray or the
    file (pipelines/expected.expected_jsonl_ingest)."""
    import random

    r = random.Random(f"jsonl-{seed}")
    kinds = ["article", "advisory", "ioc", "misc"]
    rows = []
    for i in range(n):
        kind = kinds[r.randrange(len(kinds))]
        n_tokens = r.randrange(5, 200)
        rows.append(
            {
                "rec_id": i,
                "kind": kind,
                "n_tokens": n_tokens,
                "text": f"{kind} record {i} " + "tok " * min(n_tokens, 8),
            }
        )
    return rows


def write_jsonl_gz(rows: list[dict], path: str) -> str:
    """Write records as gzip'd JSON-lines (atomic tmp+rename)."""
    import gzip
    import json
    import os

    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(tmp, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.replace(tmp, path)
    return path


def write_csv_gz(rows: list[dict], path: str) -> str:
    """Write records as gzip'd CSV (atomic tmp+rename; header row).
    Text fields must not contain commas/newlines — the JSONL fixture's
    don't; quoting is deliberately not implemented."""
    import gzip
    import os

    if not rows:
        raise ValueError("write_csv_gz: empty rows")
    cols = list(rows[0])
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(tmp, "wt") as f:
        f.write(",".join(cols) + "\n")
        for r in rows:
            vals = [str(r[c]) for c in cols]
            if any("," in v or "\n" in v for v in vals):
                raise ValueError("write_csv_gz: field needs quoting")
            f.write(",".join(vals) + "\n")
    os.replace(tmp, path)
    return path


def make_trap_urls(n: int = 240, seed: int = 42) -> pa.Table:
    """Deterministic URL-hygiene fixture: a mix of clean URLs, crawler
    traps (repeated path segments — calendar/faceted loops), overly
    deep paths, and session-id query-string bloat, in fixed proportion.
    ASCII-only and globally unique so byte offsets == char offsets and
    the SQL oracle can join on the url value. Pure Python; the trap
    oracle re-derives the flags in SQL from these same strings."""
    import random

    r = random.Random(f"traps-{seed}")
    segs = ["news", "world", "tech", "a", "b", "cal", "2025", "06", "page"]
    urls = []
    for i in range(n):
        host = f"http://site{r.randrange(40)}.example.com"
        mode = i % 4
        if mode == 0:  # clean
            path = "/".join(r.sample(segs, r.randint(1, 4)))
        elif mode == 1:  # repeated-segment loop trap
            s = r.choice(segs)
            path = "/".join([s] * r.randint(3, 6) + [f"x{r.randrange(5)}"])
        elif mode == 2:  # depth trap
            path = "/".join(r.choices(segs, k=r.randint(9, 14)))
        else:  # query-string bloat
            path = "/".join(r.sample(segs, 2))
            sid = "".join(r.choices("abcdef0123456789", k=r.randint(60, 90)))
            urls.append(f"{host}/{path}/p{i}.html?session={sid}")
            continue
        urls.append(f"{host}/{path}/p{i}.html")
    return pa.table({"url": pa.array(urls, pa.string())})


def make_redirects(n_chains: int = 50, seed: int = 42) -> pa.Table:
    """Deterministic redirect mapping (src, dst): chains of 1-8 hops
    ending at a terminal URL (never a src), plus a few pure cycles of
    length 2-4 — the 3xx graph a fetch scheduler must canonicalize.
    Functional (one dst per src), all URLs unique."""
    import random

    r = random.Random(f"redirects-{seed}")
    src, dst = [], []
    for c in range(n_chains):
        length = r.randint(1, 8)
        nodes = [f"http://r{c}.example.com/hop{j}" for j in range(length)]
        nodes.append(f"http://final{c}.example.com/")  # terminal
        for a, b in zip(nodes, nodes[1:]):
            src.append(a)
            dst.append(b)
    for c in range(5):  # cycles
        k = 2 + c % 3
        nodes = [f"http://loop{c}.example.com/n{j}" for j in range(k)]
        for j in range(k):
            src.append(nodes[j])
            dst.append(nodes[(j + 1) % k])
    return pa.table({"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())})


def make_sitemaps(n: int = 30, seed: int = 42) -> pa.Table:
    """Deterministic sitemap-XML fixture: each document holds 0-6
    ``<url>`` blocks (mandatory <loc>, optional <lastmod>), single
    quotes avoided so the oracle can inline the XML as SQL VALUES."""
    import random

    r = random.Random(f"sitemaps-{seed}")
    ids, xmls = [], []
    for i in range(n):
        blocks = []
        for j in range(r.randint(0, 6)):
            loc = f"http://sm{i}.example.com/page{j}"
            if r.random() < 0.6:
                d = f"2025-0{r.randint(1, 6)}-{r.randint(10, 28)}"
                blocks.append(f"<url><loc>{loc}</loc><lastmod>{d}</lastmod></url>")
            else:
                blocks.append(f"<url><loc>{loc}</loc></url>")
        xmls.append(
            '<?xml version="1.0"?><urlset>' + "".join(blocks) + "</urlset>"
        )
        ids.append(f"sm{i}")
    return pa.table(
        {"sitemap_id": pa.array(ids, pa.string()), "xml": pa.array(xmls, pa.string())}
    )


def make_entity_names(n: int = 120, seed: int = 42) -> tuple[list[dict], list[dict]]:
    """Deterministic record-linkage fixture: canonical entity names and
    a dirty variant list (swapped interior chars / one dropped char —
    edit distance 1-2, first byte untouched so blocking keeps every
    true pair). Pure Python so the oracle re-renders the same rows as
    inline SQL VALUES."""
    import random

    r = random.Random(f"entities-{seed}")
    adjs = ["amber", "brisk", "coral", "dusky", "ember", "frost", "gale", "husk"]
    nouns = ["anchor", "beacon", "cairn", "delta", "ridge", "spire", "vale", "wharf"]
    canon = [
        {"id": i, "s": f"{adjs[i % 8]}-{nouns[(i * 3) % 8]}-{i:04d}"}
        for i in range(n)
    ]
    dirty = []
    for i in range(n):
        s = canon[i]["s"]
        k = r.randrange(3)
        if k == 0:  # swap chars 2,3
            s2 = s[:2] + s[3] + s[2] + s[4:]
        elif k == 1:  # drop char 4
            s2 = s[:4] + s[5:]
        else:  # swap 2,3 AND drop 6 -> distance 2-3
            t = s[:2] + s[3] + s[2] + s[4:]
            s2 = t[:6] + t[7:]
        dirty.append({"id": 10_000 + i, "s": s2})
    return canon, dirty


def render_rss_xml(rows: pa.Table, feed_title: str = "synthetic feed") -> str:
    """Flat feed-entry rows (make_rss_feed schema, one feed) → RSS-ish
    XML the vectorized parser (stages/rss.extract_rss_entries_batch)
    reads back: channel header with a FEED <title> (must not leak into
    entries), one <item> per row in seq order, null summary/description
    → tag omitted (so the projection's coalesce fallback fires)."""
    order = rows.sort_by("seq")
    items = []
    for r in order.to_pylist():
        parts = ["<item>"]
        for tag, col in (
            ("title", "title"), ("link", "link"),
            ("pubDate", "published"), ("summary", "summary"),
            ("description", "description"),
        ):
            v = r.get(col)
            if v is not None:
                parts.append(f"<{tag}>{v}</{tag}>")
        parts.append("</item>")
        items.append("".join(parts))
    return (
        '<?xml version="1.0"?><rss><channel>'
        f"<title>{feed_title}</title><link>http://feed.example</link>"
        + "".join(items)
        + "</channel></rss>"
    )
