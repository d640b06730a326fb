"""URL canonicalization + seen-key hashing (vectorized).

This is the engine's dedup identity — the analog of the reference's
``sha256(title|link)`` seen-key (/root/reference/src/secbot/scheduler.py:52-53)
combined with its defang/refang normalizers
(src/secbot/main.py:38-42, src/secbot/defense/suricata_url.py:85-88).
Canonical rules: refang ``[.]``/``[:]``, lowercase scheme+host, strip
default ports, percent-decode the path, drop fragments and empty query
strings, ensure a ``/`` path. Seen key = SHA-1(canonical URL) as 20-byte
binary (north rule: canonicalized+SHA1).

Design: most URLs in a crawl are already canonical, so a vectorized
regex classifies each batch and only the nonconforming tail goes through
the per-row ``urlsplit`` fallback. Runs inside ``map_batches`` over
Arrow batches; no pandas conversion.
"""

from __future__ import annotations

import hashlib
from urllib.parse import unquote, urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Already-canonical fast path: lowercase scheme+host, no port, no escape
# sequences, non-empty path, no query/fragment/defang markers.
_CANONICAL_RE = r"^https?://[a-z0-9.\-]+/[^?#%\[\]]*$"


def refang(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """``[.]`` -> ``.`` and ``[:]`` -> ``:`` (M11 defang normalizer)."""
    out = pc.replace_substring(arr, pattern="[.]", replacement=".")
    return pc.replace_substring(out, pattern="[:]", replacement=":")


def _canonicalize_one(url: str) -> str:
    s = url.strip().replace("[.]", ".").replace("[:]", ":")
    if "://" not in s:
        s = "http://" + s
    parts = urlsplit(s)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower().rstrip(".")
    port = parts.port
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    path = unquote(parts.path) or "/"
    out = f"{scheme}://{host}{path}"
    if parts.query:
        out += f"?{parts.query}"
    return out


def canonicalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonicalize a string array: vectorized classify + slow-path loop."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ok = pc.match_substring_regex(arr, _CANONICAL_RE)
    ok_np = ok.to_numpy(zero_copy_only=False)
    if ok_np.all():
        return arr
    vals = arr.to_pylist()
    out = [v if good else _canonicalize_one(v) for v, good in zip(vals, ok_np)]
    return pa.array(out, pa.string())


def sha1_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """SHA-1 digests (20-byte binary) of each string. Seen-key column.

    Casting to binary first makes ``to_pylist`` yield ``bytes`` — no
    per-row ``str.encode`` — and the digest loop itself is C-bound.
    SHA-1 is the conformance identity (north rule: canonicalized+SHA1);
    callers keep it off hot paths by hashing only post-dedup rows.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.binary())
    _sha1 = hashlib.sha1
    return pa.array([_sha1(v).digest() for v in arr.to_pylist()], pa.binary())


def host_array(canon: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Extract host (incl. nonstandard port) from canonical URLs."""
    m = pc.extract_regex(canon, r"^[a-z]+://(?P<host>[^/]+)")
    return pc.struct_field(m, "host")


def shard_of(sha1_bytes: bytes, num_shards: int) -> int:
    """Seen-set shard for a key: first 4 big-endian bytes mod P."""
    return int.from_bytes(sha1_bytes[:4], "big") % num_shards


def binary20_matrix(keys: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Zero-copy (n, 20) uint8 view of a binary array of 20-byte keys.

    Reads the Arrow value buffer directly when offsets are contiguous
    20-byte strides (always true for sha1 columns we build); falls back
    to a join for ragged input.
    """
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    n = len(keys)
    if n == 0:
        return np.zeros((0, 20), dtype=np.uint8)
    offs_buf, data_buf = keys.buffers()[1], keys.buffers()[2]
    offs = np.frombuffer(offs_buf, dtype=np.int32)[keys.offset : keys.offset + n + 1]
    if offs[-1] - offs[0] == 20 * n:
        data = np.frombuffer(data_buf, dtype=np.uint8)
        return data[offs[0] : offs[-1]].reshape(n, 20)
    return np.frombuffer(b"".join(keys.to_pylist()), dtype=np.uint8).reshape(n, 20)


def shard_array(keys: pa.Array | pa.ChunkedArray, num_shards: int) -> np.ndarray:
    """Vectorized shard ids for a binary(20) key array."""
    buf = binary20_matrix(keys)
    head = (
        buf[:, 0].astype(np.uint64) << 24
        | buf[:, 1].astype(np.uint64) << 16
        | buf[:, 2].astype(np.uint64) << 8
        | buf[:, 3].astype(np.uint64)
    )
    return (head % np.uint64(num_shards)).astype(np.int64)


def url_trap_flags(
    batch: pa.Table,
    url_col: str = "url",
    max_depth: int = 8,
    max_repeat: int = 2,
    max_qs: int = 64,
) -> pa.Table:
    """Crawler-trap hygiene flags per URL — the frontier pre-filter a
    web-scale crawl needs before spending fetch budget (calendar loops,
    faceted-search explosions, session-id churn). Emits (url, depth,
    max_seg_repeat, qs_len, is_trap): depth = non-empty path segments,
    max_seg_repeat = occurrences of the most-repeated segment (loop
    traps repeat a segment), qs_len = characters after '?'. is_trap
    fires when any signal exceeds its bound.

    Fully vectorized: one extract_regex for the path, one split, then
    offset arithmetic (bincount / sort + reduceat) over the flattened
    segments — no per-row Python. ASCII assumption: byte offsets ==
    char offsets (canonicalize first for the general case)."""
    urls = batch[url_col].combine_chunks()
    n = len(urls)
    if n == 0:
        return pa.table(
            {
                url_col: pa.array([], pa.string()),
                "depth": pa.array([], pa.int64()),
                "max_seg_repeat": pa.array([], pa.int64()),
                "qs_len": pa.array([], pa.int64()),
                "is_trap": pa.array([], pa.bool_()),
            }
        )
    ulen = pc.utf8_length(urls).to_numpy(zero_copy_only=False).astype(np.int64)
    qpos = pc.find_substring(urls, "?").to_numpy(zero_copy_only=False).astype(np.int64)
    qs_len = np.where(qpos >= 0, ulen - qpos - 1, 0)

    ext = pc.extract_regex(urls, r"^https?://[^/?#]+(?P<p>[^?#]*)")
    path = pc.fill_null(pc.struct_field(ext, "p"), "")
    segs = pc.split_pattern(path, "/")
    lens = pc.list_value_length(segs).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(segs)
    row_id = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    row_id = row_id[keep]
    flat = flat.filter(pa.array(keep))
    depth = np.bincount(row_id, minlength=n).astype(np.int64)

    max_rep = np.zeros(n, np.int64)
    m = len(row_id)
    if m:
        tmp = pa.table({"r": pa.array(row_id, pa.int64()), "s": flat})
        order = pc.sort_indices(
            tmp, sort_keys=[("r", "ascending"), ("s", "ascending")]
        )
        r_s = tmp["r"].take(order).to_numpy(zero_copy_only=False)
        s_s = tmp["s"].take(order).combine_chunks()
        new_run = np.empty(m, bool)
        new_run[0] = True
        if m > 1:
            new_run[1:] = (r_s[1:] != r_s[:-1]) | ~pc.equal(
                s_s.slice(1), s_s.slice(0, m - 1)
            ).to_numpy(zero_copy_only=False)
        run_starts = np.flatnonzero(new_run)
        run_counts = np.diff(np.append(run_starts, m))
        run_rows = r_s[run_starts]
        new_row = np.empty(len(run_rows), bool)
        new_row[0] = True
        if len(run_rows) > 1:
            new_row[1:] = run_rows[1:] != run_rows[:-1]
        row_starts = np.flatnonzero(new_row)
        max_rep[run_rows[row_starts]] = np.maximum.reduceat(run_counts, row_starts)

    is_trap = (depth > max_depth) | (max_rep > max_repeat) | (qs_len > max_qs)
    return pa.table(
        {
            url_col: urls,
            "depth": pa.array(depth, pa.int64()),
            "max_seg_repeat": pa.array(max_rep, pa.int64()),
            "qs_len": pa.array(qs_len, pa.int64()),
            "is_trap": pa.array(is_trap, pa.bool_()),
        }
    )


# ----- tracking-param strip + query-param sort (dedup canonical form)

# single source of truth with the SQL oracle (DuckDB regexp_matches uses
# the same RE2 pattern); RE2-safe, anchored on the param NAME
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def dedup_canonical_batch(
    batch: pa.Table, url_col: str = "url", out_col: str = "canon"
) -> pa.Table:
    """Crawl-dedup canonical URL: drop tracking params (TRACKING_PARAM_RE)
    and SORT the survivors, so param-order permutations and utm-tagged
    copies of one page share a key — the canonicalization layer crawl
    frontiers apply above scheme/host normalization (M11/M14/M15
    semantics, /root/reference/src/secbot/scheduler.py:52-53 dedups on
    the raw string and re-fetches utm-tagged copies; this closes that).

    Vectorized end to end: explode params with row offsets, one regex
    filter, ONE block-local sort_indices over (row, param), then a
    zero-copy ListArray re-stitch + binary_join — no per-row Python, no
    exchange."""
    urls = pc.coalesce(batch[url_col], "")
    base = pc.struct_field(pc.extract_regex(urls, r"^(?P<b>[^?#]*)"), "b")
    # anchor the query to the pre-'#' prefix: a bare r"\?" would match a
    # '?' INSIDE the fragment ('/p#sec?id=1'), resurrecting fragment text
    # as query params and collapsing distinct pages to one frontier key
    q = pc.struct_field(pc.extract_regex(urls, r"^[^?#]*\?(?P<q>[^#]*)"), "q")
    q = pc.fill_null(q, "")
    n = batch.num_rows
    params = pc.split_pattern(q, "&")
    params = params.combine_chunks() if isinstance(params, pa.ChunkedArray) else params
    lens = pc.list_value_length(params).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    flat = pc.list_flatten(params)
    keep = pc.and_(
        pc.not_equal(flat, ""),
        pc.invert(pc.match_substring_regex(flat, TRACKING_PARAM_RE)),
    ).to_numpy(zero_copy_only=False)
    kept = pa.table(
        {"r": pa.array(row_idx[keep], pa.int64()), "p": flat.filter(pa.array(keep))}
    )
    kept = kept.take(
        pc.sort_indices(kept, sort_keys=[("r", "ascending"), ("p", "ascending")])
    )
    counts = np.bincount(kept["r"].to_numpy(zero_copy_only=False), minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    lst = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), kept["p"].combine_chunks()
    )
    joined = pc.binary_join(lst, "&")
    canon = pc.if_else(
        pa.array(counts > 0),
        pc.binary_join_element_wise(base, "?", joined, ""),
        base,
    )
    return batch.append_column(out_col, canon)


# ------------------------------------------- registrable-domain (PLD)

# multi-label public suffixes handled by the lite extractor — the
# embedded head of the public-suffix list (full PSL is a data file this
# container doesn't ship; the op takes extra suffixes via parameter)
PLD_SECOND_LEVEL = (
    "co.uk", "com.au", "co.jp", "ac.uk", "gov.uk",
    "co.kr", "com.br", "co.in", "com.cn",
)


def _pld_patterns(second_level: tuple[str, ...]):
    alt = "|".join(s.replace(".", r"\.") for s in second_level)
    return (
        rf"(?P<pld>[^.]+\.(?:{alt}))$",
        r"(?P<pld>[^.]+\.[^.]+)$",
    )


def registrable_domain(hosts, second_level: tuple[str, ...] = PLD_SECOND_LEVEL):
    """Registrable domain (pay-level domain) per host — the key crawl
    politeness, reputation and dedup roll up on at web scale (a full
    host like news.bbc.co.uk over-partitions; bbc.co.uk is the
    ownership unit). Public-suffix-lite: hosts ending in a known
    multi-label suffix keep THREE labels, everything else keeps two;
    single-label hosts pass through. Two vectorized RE2 extracts + one
    coalesce — zero per-row Python, and the same two patterns express
    the oracle SQL verbatim (ref parity: reference keys politeness on
    the raw netloc, utils/url.py split_host_uri)."""
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    ml_re, two_re = _pld_patterns(second_level)
    ml = pc.struct_field(pc.extract_regex(hosts, ml_re), "pld")
    two = pc.struct_field(pc.extract_regex(hosts, two_re), "pld")
    return pc.coalesce(ml, two, hosts)
