"""Independent sequential oracles for the non-SQL-expressible queries.

Each function recomputes a query's expected result with plain Python
loops / dict buckets / numpy over the SAME deterministic inputs — no Ray,
no Arrow shuffles, no shared pipeline machinery (hash/codec primitives
are shared pure functions; everything distributed is re-derived
sequentially, the way the reference's single-process loops would,
/root/reference/src/secbot/scheduler.py:39-89). The results are rendered
as inline ``VALUES`` SQL (:func:`values_sql`) so DuckDB can verify the
Ray pipelines row-for-row without reading any temp files.

Caps note: the engine truncates LSH buckets (minhash 256, simhash 1024,
cosine 512 rows); these oracles REFUSE (raise) if a fixture bucket ever
exceeds the cap, so an oracle can never silently agree with a truncated
result.
"""

from __future__ import annotations

import os
from collections import defaultdict
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..fixtures import synth
from ..ops import hashing as H
from ..testing.oracle import crawl_oracle

_SQL_TYPE = {
    pa.int64(): "BIGINT",
    pa.int32(): "INTEGER",
    pa.string(): "VARCHAR",
    pa.bool_(): "BOOLEAN",
    pa.date32(): "DATE",
    pa.float64(): "DOUBLE",
}


def _sql_literal(v, typ: pa.DataType) -> str:
    if v is None:
        return "NULL"
    if pa.types.is_string(typ):
        return "'" + str(v).replace("'", "''") + "'"
    if pa.types.is_boolean(typ):
        return "TRUE" if v else "FALSE"
    if pa.types.is_date(typ):
        return f"DATE '{v.isoformat()}'"
    if pa.types.is_floating(typ):
        # A bare decimal literal is parsed by DuckDB as DECIMAL and then
        # cast to DOUBLE — two roundings, which drops the last ulp on
        # ~12% of values (measured). A string cast goes through strtod
        # (correctly rounded), so repr() round-trips bit-exactly.
        return f"CAST('{v!r}' AS DOUBLE)"
    return repr(v)


def values_sql(tbl: pa.Table) -> str:
    """Render a small Arrow table as a typed DuckDB VALUES subquery."""
    cols = tbl.column_names
    types = [tbl.schema.field(c).type for c in cols]
    rows = []
    pylists = [tbl[c].to_pylist() for c in cols]
    for i in range(tbl.num_rows):
        rows.append(
            "(" + ", ".join(_sql_literal(pylists[j][i], types[j]) for j in range(len(cols))) + ")"
        )
    casts = ", ".join(
        f"CAST(c{j} AS {_SQL_TYPE[t]}) AS {c}" for j, (c, t) in enumerate(zip(cols, types))
    )
    names = ", ".join(f"c{j}" for j in range(len(cols)))
    return (
        f"SELECT {casts} FROM (VALUES " + ", ".join(rows) + f") AS _v({names})"
    )


def _pairs_table(pairs: set[tuple[int, int]]) -> pa.Table:
    rows = sorted(pairs)
    return pa.table(
        {
            "id_a": pa.array([a for a, _ in rows], pa.int64()),
            "id_b": pa.array([b for _, b in rows], pa.int64()),
        }
    )


def _check_cap(size: int, cap: int, what: str) -> None:
    if size > cap:
        raise RuntimeError(
            f"{what} oracle fixture produced a bucket of {size} > engine cap "
            f"{cap}: the oracle would not match the capped engine output"
        )


# ------------------------------------------------------------------ IOC


def expected_iocs() -> pa.Table:
    """Sequential re-extraction over the IOC fixture pages (M8/A6/A7):
    per-page findall → refang/validate → global distinct+sort. Shares
    only the compiled patterns with the engine (the regex IS the
    operator's spec, ref src/secbot/parsers/ioc.py:34-53); the distinct/
    merge machinery under test is re-derived with a plain set."""
    from ..stages.parse import HASH_RE, IP_RE, URL_RE, _refang, _valid_ip

    pages = synth.make_ioc_pages(60, seed=42)
    seen: set[tuple[str, str]] = set()
    for text in pages["text"].to_pylist():
        for m in IP_RE.findall(text):
            v = _refang(m)
            if _valid_ip(v):
                seen.add(("ip", v))
        for m in HASH_RE.findall(text):
            seen.add(("hash", m.lower()))
        for m in URL_RE.findall(text):
            seen.add(("url", _refang(m)))
    rows = sorted(seen)
    return pa.table(
        {
            "kind": pa.array([k for k, _ in rows], pa.string()),
            "value": pa.array([v for _, v in rows], pa.string()),
        }
    )


# ------------------------------------------------------------ LSH pairs


def _planted(sf_dir: str, mutate) -> pa.Table:
    from .queries import _planted_docs_tbl

    return _planted_docs_tbl(sf_dir, mutate)


def expected_minhash_pairs(sf_dir: str, threshold: float = 0.5) -> pa.Table:
    """Brute-force MinHash-LSH pairs: dict-of-buckets + nested loops."""
    from .queries import _drop_word3

    tbl = _planted(sf_dir, _drop_word3)
    th, off = H.tokenize_batch(tbl["text"])
    sh, soff = H.shingle_hashes(th, off, 5)
    sig = H.minhash_signatures(sh, soff, 64)
    bh = H.band_hashes(sig, 16)
    ids = np.asarray(tbl["doc_id"], dtype=np.int64)
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    n, bands = bh.shape
    for i in range(n):
        for b in range(bands):
            buckets[(b, int(bh[i, b]))].append(i)
    pairs: set[tuple[int, int]] = set()
    for rows in buckets.values():
        _check_cap(len(rows), 256, "minhash")
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                i, j = rows[x], rows[y]
                key = (min(ids[i], ids[j]), max(ids[i], ids[j]))
                if key in pairs:
                    continue
                est = float((sig[i] == sig[j]).mean())
                if est >= threshold:
                    pairs.add(key)
    return _pairs_table(pairs)


def expected_letterbox() -> pa.Table:
    """Sequential per-image replica of q_letterbox_stats: decode each
    payload with the scalar codec and count bar rows/cols with explicit
    Python loops over the same spec (leading/trailing rows/cols equal to
    the top-left pixel; fully-uniform → (h,0)/(w,0))."""
    from ..fixtures import codec, synth
    from .queries import LETTERBOX_N

    t = synth.make_letterbox_store(LETTERBOX_N, seed=42)
    rows = []
    for iid, buf, fmt in zip(
        t["iid"].to_pylist(), t["bytes"].to_pylist(), t["fmt"].to_pylist()
    ):
        px = codec.decode(buf, fmt)
        h, w = px.shape[0], px.shape[1]
        color = px[0, 0]

        def bar_rows(rng):
            c = 0
            for y in rng:
                if (px[y] == color).all():
                    c += 1
                else:
                    break
            return c

        def bar_cols(rng):
            c = 0
            for x in rng:
                if (px[:, x] == color).all():
                    c += 1
                else:
                    break
            return c

        top = bar_rows(range(h))
        bottom = 0 if top == h else bar_rows(range(h - 1, -1, -1))
        left = bar_cols(range(w))
        right = 0 if left == w else bar_cols(range(w - 1, -1, -1))
        rows.append(
            {
                "iid": iid,
                "n_top": top,
                "n_bottom": bottom,
                "n_left": left,
                "n_right": right,
                "decode_ok": True,
            }
        )
    return pa.Table.from_pylist(rows)


def expected_span_removal(sf_dir: str, n: int = 5) -> pa.Table:
    """Independent plain-Python replica of dedup_span_removal (Lee et
    al. exact substring removal): dict-of-occurrences owner selection,
    per-position mask removal, str.split() token rebuild. Shares only
    the tokenize/shingle hash kernels (the gram identity)."""
    from collections import defaultdict as dd_

    from .queries import _drop_word3

    tbl = _planted(sf_dir, _drop_word3)
    th, off = H.tokenize_batch(tbl["text"])
    sh, soff = H.shingle_hashes(th, off, n)
    ids = np.asarray(tbl["doc_id"], dtype=np.int64)
    occ: dict[int, list[tuple[int, int]]] = dd_(list)
    for d in range(len(ids)):
        for j, hval in enumerate(sh[soff[d] : soff[d + 1]]):
            occ[int(hval)].append((int(ids[d]), j))
    spans: dict[int, list[int]] = dd_(list)
    for lst in occ.values():
        if len(lst) < 2:
            continue
        owner = min(lst)
        for d, p in lst:
            if (d, p) != owner:
                spans[d].append(p)
    rows = []
    for d, text in zip(ids, tbl["text"].to_pylist()):
        toks = [w for w in (text or "").split() if w]
        mask = [False] * len(toks)
        for p in spans.get(int(d), ()):
            for q in range(p, min(p + n, len(toks))):
                mask[q] = True
        rows.append(
            {
                "doc_id": int(d),
                "clean_text": " ".join(w for w, m in zip(toks, mask) if not m),
                "n_tokens_removed": sum(mask),
            }
        )
    return pa.Table.from_pylist(rows)


def expected_dominant_color() -> pa.Table:
    """Sequential replica of q_dominant_color: scalar decode + Counter
    per image over the same 4-bit/channel quantization, smallest bin on
    ties."""
    from collections import Counter

    from ..fixtures import codec, synth
    from .queries import LETTERBOX_N

    t = synth.make_letterbox_store(LETTERBOX_N, seed=42)
    rows = []
    for iid, buf, fmt in zip(
        t["iid"].to_pylist(), t["bytes"].to_pylist(), t["fmt"].to_pylist()
    ):
        px = codec.decode(buf, fmt)
        q = (px.astype(np.int64) >> 4)
        bins = (q[..., 0] << 8) | (q[..., 1] << 4) | q[..., 2]
        c = Counter(bins.ravel().tolist())
        best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        rows.append({"iid": iid, "dominant_bin": best, "decode_ok": True})
    return pa.Table.from_pylist(rows)


def expected_sharpness() -> pa.Table:
    """Sequential replica of q_sharpness: scalar decode + explicit
    Python double loops over interior pixels with the same integer
    4-neighbor Laplacian on sum-gray."""
    from ..fixtures import codec, synth
    from .queries import LETTERBOX_N

    t = synth.make_letterbox_store(LETTERBOX_N, seed=42)
    rows = []
    for iid, buf, fmt in zip(
        t["iid"].to_pylist(), t["bytes"].to_pylist(), t["fmt"].to_pylist()
    ):
        px = codec.decode(buf, fmt).astype(np.int64)
        g = px[..., 0] + px[..., 1] + px[..., 2]
        h, w = g.shape
        s1 = s2 = cnt = 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                lap = 4 * g[y, x] - g[y - 1, x] - g[y + 1, x] - g[y, x - 1] - g[y, x + 1]
                s1 += int(lap)
                s2 += int(lap) * int(lap)
                cnt += 1
        rows.append(
            {"iid": iid, "n_interior": cnt, "lap_sum": s1, "lap_sq_sum": s2,
             "decode_ok": True}
        )
    return pa.Table.from_pylist(rows)


def _expected_pq(sf_dir: str):
    """Sequential re-derivation of q_pq_codes: per subspace, the same
    pure _kmeans_partial kernel over the same block plan reduced in
    block-min order (expected_kmeans's contract), then the same argmax
    encode — bit-for-bit including float summation order."""
    from ..ops import similarity as sim
    from .queries import KMEANS_BLOCKS

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    n = t.num_rows
    raw = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    m, k, iters = 8, 16, 2
    d = raw.shape[1]
    dsub = d // m
    step = max(256, -(-n // KMEANS_BLOCKS))
    slices = sorted(range(0, n, step), key=lambda s: ids[s : s + step].min())
    codebooks = []
    for j in range(m):
        sub_raw = raw[:, j * dsub : (j + 1) * dsub]
        V = sim._normalize(sub_raw)
        C = sim._normalize(np.ascontiguousarray(raw[:k, j * dsub : (j + 1) * dsub]))
        for _ in range(iters):
            counts = np.zeros(k, dtype=np.int64)
            sums = np.zeros((k, dsub), dtype=np.float64)
            for s in slices:
                _, c, sm = sim._kmeans_partial(V[s : s + step], C)
                counts += c
                sums += sm
            C = sim._kmeans_step(C, counts, sums)
        codebooks.append(C)
    code = np.zeros(n, dtype=np.int64)
    for j in range(m):
        S = sim._normalize(raw[:, j * dsub : (j + 1) * dsub])
        code |= np.argmax(S @ codebooks[j].T, axis=1).astype(np.int64) << (4 * j)
    return ids, raw, np.stack(codebooks), code


def expected_pq_codes(sf_dir: str) -> pa.Table:
    ids, _, _, code = _expected_pq(sf_dir)
    return pa.table(
        {"vec_id": pa.array(ids, pa.int64()), "pq_code": pa.array(code, pa.int64())}
    )


def expected_pq_knn(sf_dir: str, k: int = 10) -> pa.Table:
    """Sequential ADC replay: the same shared LUT/score kernels over the
    full code array, ties (score desc, neighbor asc)."""
    from ..ops import similarity as sim

    ids, raw, cb, code = _expected_pq(sf_dir)
    qm = raw[:5]
    lut = sim.pq_adc_lut(qm, cb)
    sc = sim.pq_adc_scores(code, lut)
    rows = []
    for qi in range(5):
        row = np.where(ids == qi, -np.inf, sc[qi])
        order = np.lexsort((ids, -row))[:k]
        for nb in ids[order]:
            rows.append({"query_id": qi, "neighbor_id": int(nb)})
    return pa.Table.from_pylist(rows)


def expected_winnow_pairs(sf_dir: str) -> pa.Table:
    """Independent plain-Python winnowing (per-doc window loops, explicit
    rightmost-min tie rule) + all-pairs shared-fingerprint counting over
    the planted near-dup corpus. Shares only the low-level tokenize/
    shingle hash kernels with the engine; the selection and pairing
    logic is re-derived from the MOSS spec."""
    from collections import Counter, defaultdict as dd_

    from .queries import WINNOW_K, WINNOW_MIN_SHARED, WINNOW_W, _drop_word3

    tbl = _planted(sf_dir, _drop_word3)
    th, off = H.tokenize_batch(tbl["text"])
    sh, soff = H.shingle_hashes(th, off, WINNOW_K)
    ids = np.asarray(tbl["doc_id"], dtype=np.int64)
    inv: dict[int, list[int]] = dd_(list)
    for d in range(len(ids)):
        seg = [int(x) for x in sh[soff[d] : soff[d + 1]]]
        if not seg:
            continue
        sel: set[int] = set()
        if len(seg) < WINNOW_W:
            sel.add(min(seg))
        else:
            for i in range(len(seg) - WINNOW_W + 1):
                win = seg[i : i + WINNOW_W]
                m = min(win)
                sel.add(win[len(win) - 1 - win[::-1].index(m)])
        for f in sorted(sel):
            inv[f].append(int(ids[d]))
    cnt: Counter[tuple[int, int]] = Counter()
    for docs in inv.values():
        docs = sorted(set(docs))
        for x in range(len(docs)):
            for y in range(x + 1, len(docs)):
                cnt[(docs[x], docs[y])] += 1
    rows = [
        {"id_a": a, "id_b": b, "n_shared": n}
        for (a, b), n in sorted(cnt.items())
        if n >= WINNOW_MIN_SHARED
    ]
    if not rows:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
            }
        )
    return pa.Table.from_pylist(rows)


def expected_ngram_pairs(sf_dir: str, threshold: float = 0.6) -> pa.Table:
    """Exact shingle-jaccard filter over the expected minhash pairs."""
    from .queries import _drop_word3

    tbl = _planted(sf_dir, _drop_word3)
    th, off = H.tokenize_batch(tbl["text"])
    sh, soff = H.shingle_hashes(th, off, 5)
    ids = np.asarray(tbl["doc_id"], dtype=np.int64)
    pos = {int(v): i for i, v in enumerate(ids)}
    shingle_sets = [
        set(sh[soff[i] : soff[i + 1]].tolist()) for i in range(len(soff) - 1)
    ]
    cand = expected_minhash_pairs(sf_dir)
    keep: set[tuple[int, int]] = set()
    for a, b in zip(cand["id_a"].to_pylist(), cand["id_b"].to_pylist()):
        A, B = shingle_sets[pos[a]], shingle_sets[pos[b]]
        u = len(A | B)
        j = (len(A & B) / u) if u else 1.0
        if j >= threshold:
            keep.add((a, b))
    return _pairs_table(keep)


def expected_simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    from .queries import _swap01

    tbl = _planted(sf_dir, _swap01)
    th, off = H.tokenize_batch(tbl["text"])
    h = H.simhash64(th, off)
    ids = np.asarray(tbl["doc_id"], dtype=np.int64)
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i in range(len(h)):
        for b in range(4):
            buckets[(b, int((h[i] >> np.uint64(16 * b)) & np.uint64(0xFFFF)))].append(i)
    pairs: set[tuple[int, int]] = set()
    for rows in buckets.values():
        _check_cap(len(rows), 1024, "simhash")
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                i, j = rows[x], rows[y]
                key = (min(ids[i], ids[j]), max(ids[i], ids[j]))
                if key in pairs:
                    continue
                if int(H.hamming_distance64(h[i : i + 1], h[j : j + 1])[0]) <= max_hamming:
                    pairs.add(key)
    return _pairs_table(pairs)


def expected_embedding_pairs(sf_dir: str, threshold: float = 0.98) -> pa.Table:
    """Sequential hyperplane-LSH cosine pairs. V is taken from the SAME
    float32 Arrow table the query feeds the pipeline (identical
    rounding)."""
    from .queries import _planted_embeddings_tbl

    tbl = _planted_embeddings_tbl(sf_dir)
    n = tbl.num_rows
    V = np.asarray(tbl["embedding"].combine_chunks().flatten(), dtype=np.float64).reshape(n, -1)
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    rng = np.random.default_rng(11)
    proj = rng.standard_normal((4, 12, 64))
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    weights = 1 << np.arange(12, dtype=np.int64)
    for t in range(4):
        codes = ((V @ proj[t].T) > 0) @ weights
        for i in range(n):
            buckets[(t, int(codes[i]))].append(i)
    pairs: set[tuple[int, int]] = set()
    for rows in buckets.values():
        _check_cap(len(rows), 512, "cosine")
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                i, j = rows[x], rows[y]
                key = (min(ids[i], ids[j]), max(ids[i], ids[j]))
                if key in pairs:
                    continue
                if float(V[i] @ V[j]) >= threshold:
                    pairs.add(key)
    return _pairs_table(pairs)


def expected_semantic_dedup(sf_dir: str) -> pa.Table:
    """Sequential SemDeDup: identical centroid training (driver-side
    head sample), identical normalized-argmax assignment, brute
    within-cluster cosine pairing, min-id union-find — mirrors
    ops/dedup.semantic_dedup_ids exactly (same float64 expressions over
    the same float32-stored table)."""
    from ..ops.similarity import _normalize, train_centroids
    from .queries import (
        SEMDEDUP_NLIST,
        SEMDEDUP_THRESHOLD,
        SEMDEDUP_TRAIN_N,
        _planted_embeddings_tbl,
    )

    tbl = _planted_embeddings_tbl(sf_dir)
    n = tbl.num_rows
    V = np.asarray(
        tbl["embedding"].combine_chunks().flatten(), dtype=np.float64
    ).reshape(n, -1)
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    C = _normalize(train_centroids(V[:SEMDEDUP_TRAIN_N], nlist=SEMDEDUP_NLIST))
    Vn = _normalize(V)
    assign = np.argmax(Vn @ C.T, axis=1)
    drop, rep = [], []
    for c in np.unique(assign):
        members = np.nonzero(assign == c)[0]
        members = members[np.argsort(ids[members], kind="stable")]
        m = len(members)
        if m < 2:
            continue
        _check_cap(m, 4096, "semantic-dedup")
        S = Vn[members] @ Vn[members].T
        ia, ib = np.nonzero(np.triu(S >= SEMDEDUP_THRESHOLD, k=1))
        parent = np.arange(m)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(ia.tolist(), ib.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        for i in range(m):
            r = find(i)
            if r != i:
                drop.append(int(ids[members[i]]))
                rep.append(int(ids[members[r]]))
    return pa.table(
        {"vec_id": pa.array(drop, pa.int64()), "rep_id": pa.array(rep, pa.int64())}
    )


# ------------------------------------------------------------------ kNN


def expected_knn_ivf(sf_dir: str) -> pa.Table:
    """Sequential IVF scan: same centroids, same probe pruning (union of
    all queries' nprobe lists), exact per-query top-10 with
    (score desc, neighbor_id asc) ties."""
    from ..ops.similarity import train_centroids

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    E = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    C = train_centroids(E[: min(len(E), 2000)], nlist=16)

    def norm(M):
        return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)

    En, Cn, Qn = norm(E), norm(C), norm(E[:5])
    q_ids = ids[:5]
    assign = np.argmax(En @ Cn.T, axis=1)
    probe = np.argsort(-(Qn @ Cn.T), axis=1)[:, :8]
    wanted = set(np.unique(probe.ravel()).tolist())
    cand = np.array([i for i in range(len(E)) if assign[i] in wanted])
    out_q, out_n = [], []
    for qi, qid in enumerate(q_ids):
        scores = En[cand] @ Qn[qi]
        order = sorted(
            range(len(cand)),
            key=lambda r: (-scores[r], ids[cand[r]]),
        )
        picked = [r for r in order if ids[cand[r]] != qid][:10]
        for r in picked:
            out_q.append(int(qid))
            out_n.append(int(ids[cand[r]]))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
        }
    )


# ----------------------------------------------------------- multimodal


def expected_image_features() -> pa.Table:
    """Sequential decode + phash of every fixture image (the distributed
    actor-pool stage must agree row-for-row). The stored ``phash`` is
    NOT used: lossy jpeg round-trips legitimately flip 1-2 phash bits,
    so the oracle derives phash_check from an actual decode, exactly as
    the reference would process pages one at a time."""
    from ..fixtures import codec

    ps = synth.make_pagestore(60, seed=42)
    checks = [
        int(codec.phash64(codec.decode(buf, fmt)))
        for buf, fmt in zip(ps["bytes"].to_pylist(), ps["fmt"].to_pylist())
    ]
    return pa.table(
        {
            "image_id": ps["image_id"],
            "phash_check": pa.array(checks, pa.int64()),
            "decode_ok": pa.array([True] * ps.num_rows, pa.bool_()),
        }
    )


def expected_phash_pairs(max_hamming: int = 3) -> pa.Table:
    """Sequential all-pairs hamming over decoded phashes of the planted
    near-dup page-store — NO banding, so it independently verifies the
    pigeonhole bucketing finds the exact same pair set."""
    from ..fixtures import codec

    ps = synth.make_neardup_pagestore(60, seed=42)
    h = np.array(
        [
            np.uint64(np.int64(codec.phash64(codec.decode(buf, fmt))))
            for buf, fmt in zip(ps["bytes"].to_pylist(), ps["fmt"].to_pylist())
        ],
        dtype=np.uint64,
    )
    ids = [
        int(i[3:]) + (1_000_000 if i.startswith("dup") else 0)
        for i in ps["image_id"].to_pylist()
    ]
    pairs: set[tuple[int, int]] = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            if int(H.hamming_distance64(h[x : x + 1], h[y : y + 1])[0]) <= max_hamming:
                pairs.add((min(ids[x], ids[y]), max(ids[x], ids[y])))
    return _pairs_table(pairs)


def expected_image_meta_audit() -> pa.Table:
    """Sequential replica of q_image_meta_audit: decode every image
    scalar, compare the DECODED pixel shape (not the header peek — an
    independent path) and recomputed phash against the planted-corrupt
    manifest columns."""
    from ..fixtures import codec
    from .queries import _meta_audit_store

    t = _meta_audit_store()
    rows = []
    for iid, buf, fmt, w, h, ph in zip(
        t["iid"].to_pylist(),
        t["bytes"].to_pylist(),
        t["fmt"].to_pylist(),
        t["w"].to_pylist(),
        t["h"].to_pylist(),
        t["phash"].to_pylist(),
    ):
        px = codec.decode(buf, fmt)
        rows.append(
            {
                "iid": iid,
                "dims_ok": (px.shape[1], px.shape[0]) == (w, h),
                "phash_ok": int(np.int64(codec.phash64(px))) == ph,
                "decode_ok": True,
            }
        )
    return pa.Table.from_pylist(rows)


def expected_canonical_images(max_hamming: int = 3) -> pa.Table:
    """Sequential replica of q_canonical_images: all-pairs phash hamming
    (no banding) → union-find components → double-loop Laplacian
    sharpness per image → keep the max-variance member per component
    (tie: min id). Shares only the codec/phash primitives."""
    from ..fixtures import codec

    ps = synth.make_neardup_pagestore(60, seed=42)
    ids = [
        int(i[3:]) + (1_000_000 if i.startswith("dup") else 0)
        for i in ps["image_id"].to_pylist()
    ]
    bufs = ps["bytes"].to_pylist()
    fmts = ps["fmt"].to_pylist()
    pixels = [codec.decode(b, f) for b, f in zip(bufs, fmts)]
    h = np.array(
        [np.uint64(np.int64(codec.phash64(px))) for px in pixels], dtype=np.uint64
    )
    parent = {i: i for i in ids}

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            if int(H.hamming_distance64(h[x : x + 1], h[y : y + 1])[0]) <= max_hamming:
                ra, rb = find(ids[x]), find(ids[y])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {i: find(i) for i in ids}

    keys: dict[int, float] = {}
    for iid, px in zip(ids, pixels):
        g = px.astype(np.int64)
        g = g[..., 0] + g[..., 1] + g[..., 2]
        hh, ww = g.shape
        s1 = s2 = cnt = 0
        for y in range(1, hh - 1):
            for x in range(1, ww - 1):
                lap = (
                    4 * g[y, x] - g[y - 1, x] - g[y + 1, x]
                    - g[y, x - 1] - g[y, x + 1]
                )
                s1 += int(lap)
                s2 += int(lap) * int(lap)
                cnt += 1
        keys[iid] = (cnt * s2 - s1 * s1) / max(cnt, 1) ** 2

    best: dict[int, int] = {}
    for i in ids:
        c = comp[i]
        if c not in best or (keys[i], -i) > (keys[best[c]], -best[c]):
            best[c] = i
    rows = sorted(best.items())
    return pa.table(
        {
            "component": pa.array([c for c, _ in rows], pa.int64()),
            "canonical_id": pa.array([i for _, i in rows], pa.int64()),
            "sharp_key": pa.array([keys[i] for _, i in rows], pa.float64()),
        }
    )


def expected_tile_dup_pairs(min_shared: int = 6) -> pa.Table:
    """Sequential all-pairs shared-tile counting over the planted
    crop-dup page-store — no bucketing, no exchange; shares only the
    codec decode and tile-hash primitives with the engine."""
    from ..fixtures import codec
    from .queries import TILE_DUP_N

    ps = synth.make_cropdup_pagestore(TILE_DUP_N, seed=42)
    bags: list[set[int]] = [
        set(int(x) for x in codec.tile_hashes64(codec.decode(buf, fmt)))
        for buf, fmt in zip(ps["bytes"].to_pylist(), ps["fmt"].to_pylist())
    ]
    ids = [
        int(i[3:]) + (1_000_000 if i.startswith("crp") else 0)
        for i in ps["image_id"].to_pylist()
    ]
    rows = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            n = len(bags[x] & bags[y])
            if n >= min_shared:
                a, b = sorted((ids[x], ids[y]))
                rows.append({"id_a": a, "id_b": b, "n_shared": n})
    if not rows:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
            }
        )
    return pa.Table.from_pylist(sorted(rows, key=lambda r: (r["id_a"], r["id_b"])))


def expected_image_knn(k: int = 5) -> pa.Table:
    """Sequential exact cosine top-k over the decoded 64-dim cell
    vectors — same codec.cell_vector64 kernel, same normalize, same
    (score desc, neighbor_id asc) tie order as the distributed op."""
    from ..fixtures import codec
    from ..ops.similarity import _normalize

    ps = synth.make_pagestore(80, seed=42)
    V = np.stack(
        [
            codec.cell_vector64(codec.decode(b, f))
            for b, f in zip(ps["bytes"].to_pylist(), ps["fmt"].to_pylist())
        ]
    ).astype(np.float64)
    Vn = _normalize(V)
    out_q, out_n = [], []
    for q in range(5):
        scores = Vn @ Vn[q]
        order = sorted(
            (i for i in range(len(V)) if i != q),
            key=lambda i: (-scores[i], i),
        )[:k]
        out_q.extend([q] * k)
        out_n.extend(order)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
        }
    )


def expected_hll_users(sf_dir: str, p: int = 12) -> pa.Table:
    """Sequential HLL register build: pure-python dict-max over
    int.bit_length ranks (the polars column hash is the shared pure
    primitive, as with H/codec elsewhere; the register/merge/estimate
    path — where the distributed complexity lives — is re-derived with
    plain loops). The estimate formula is the published constant
    arithmetic (hll_estimate) over the independently built registers."""
    import polars as pl

    from ..ops.agg import hll_estimate

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    h = pl.from_arrow(t["user_id"].combine_chunks()).hash(seed=0).to_list()
    m = 1 << p
    regs: dict[int, int] = {}
    for hv in h:
        idx = hv >> (64 - p)
        suffix = hv & ((1 << (64 - p)) - 1)
        rho = (64 - p) - suffix.bit_length() + 1
        if rho > regs.get(idx, 0):
            regs[idx] = rho
    arr = np.zeros(m, dtype=np.uint8)
    for i, r in regs.items():
        arr[i] = r
    return pa.table(
        {"n_distinct_est": pa.array([hll_estimate(arr)], pa.int64())}
    )


def expected_channel_histogram(bins: int = 16) -> pa.Table:
    """Sequential decode + per-channel bincount over the page-store."""
    from ..fixtures import codec

    ps = synth.make_pagestore(60, seed=42)
    width = 256 // bins
    counts = np.zeros((3, bins), dtype=np.int64)
    for buf, fmt in zip(ps["bytes"].to_pylist(), ps["fmt"].to_pylist()):
        px = codec.decode(buf, fmt)
        for c in range(3):
            counts[c] += np.bincount(px[:, :, c].ravel() // width, minlength=bins)[
                :bins
            ]
    return pa.table(
        {
            "channel": pa.array(np.repeat(np.arange(3, dtype=np.int64), bins)),
            "bin": pa.array(np.tile(np.arange(bins, dtype=np.int64), 3)),
            "n": pa.array(counts.ravel(), pa.int64()),
        }
    )


def expected_tensor_prep(out: int = 16) -> pa.Table:
    """Independent sequential crop/resize with plain Python loops over
    8x8-free indexing (no shared reshape kernel): center square crop,
    block SUM then floor-divide, per-channel uint8 sums."""
    from ..fixtures import codec

    ps = synth.make_pagestore(60, seed=42)
    ids, sums_rgb = [], []
    for iid, buf, fmt in zip(
        ps["image_id"].to_pylist(),
        ps["bytes"].to_pylist(),
        ps["fmt"].to_pylist(),
    ):
        px = codec.decode(buf, fmt)
        h, w, _ = px.shape
        s = min(h, w)
        y0, x0 = (h - s) // 2, (w - s) // 2
        b = max(s // out, 1)
        totals = [0, 0, 0]
        for oy in range(out):
            for ox in range(out):
                for ch in range(3):
                    blk = px[
                        y0 + oy * b : y0 + (oy + 1) * b,
                        x0 + ox * b : x0 + (ox + 1) * b,
                        ch,
                    ]
                    totals[ch] += int(blk.sum()) // (b * b)
        ids.append(iid)
        sums_rgb.append(totals)
    arr = np.array(sums_rgb, dtype=np.int64)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "sum_r": pa.array(arr[:, 0], pa.int64()),
            "sum_g": pa.array(arr[:, 1], pa.int64()),
            "sum_b": pa.array(arr[:, 2], pa.int64()),
        }
    )


def expected_pagerank(
    num_nodes: int = 80,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> pa.Table:
    """Sequential integer PageRank with plain dicts — identical integer
    formula, so it matches the distributed run bit-for-bit."""
    from .queries import _pagestore_edges

    edges_tbl = _pagestore_edges(synth.make_pagestore(80, seed=42))
    srcs = edges_tbl["src"].to_pylist()
    dsts = edges_tbl["dst"].to_pylist()
    deg: dict[int, int] = {}
    for s in srcs:
        deg[s] = deg.get(s, 0) + 1
    base = ((damping_den - damping_num) * (scale // num_nodes)) // damping_den
    rank = {n: scale // num_nodes for n in range(num_nodes)}
    for _ in range(iters):
        sums = {n: 0 for n in range(num_nodes)}
        for s, d in zip(srcs, dsts):
            sums[d] += rank[s] // max(deg[s], 1)
        rank = {n: base + (damping_num * sums[n]) // damping_den for n in range(num_nodes)}
    return pa.table(
        {
            "node": pa.array(sorted(rank), pa.int64()),
            "rank": pa.array([rank[n] for n in sorted(rank)], pa.int64()),
        }
    )


def expected_hll_by_type(sf_dir: str, p: int = 12) -> pa.Table:
    """Sequential per-group HLL registers (dict-of-dict max over exact
    int bit ops); same shared polars column hash as expected_hll_users."""
    import polars as pl

    from ..ops.agg import hll_estimate

    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    h = pl.from_arrow(t["user_id"].combine_chunks()).hash(seed=0).to_list()
    types = t["event_type"].to_pylist()
    m = 1 << p
    regs: dict[str, dict[int, int]] = {}
    for et, hv in zip(types, h):
        idx = hv >> (64 - p)
        rho = (64 - p) - (hv & ((1 << (64 - p)) - 1)).bit_length() + 1
        d = regs.setdefault(et, {})
        if rho > d.get(idx, 0):
            d[idx] = rho
    out_k, out_n = [], []
    for et in sorted(regs):
        arr = np.zeros(m, dtype=np.uint8)
        for i, r in regs[et].items():
            arr[i] = r
        out_k.append(et)
        out_n.append(hll_estimate(arr))
    return pa.table(
        {
            "event_type": pa.array(out_k, pa.string()),
            "n_distinct_est": pa.array(out_n, pa.int64()),
        }
    )


def expected_tfidf(sf_dir: str, k: int = 3) -> pa.Table:
    """Sequential tf-idf: Counter tf, set-based df, top-k by
    (score desc, term) — np.log is the shared constant arithmetic (as
    with hll_estimate); everything distributed is re-derived with plain
    dicts."""
    from collections import Counter

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = [
        (did, [w for w in (txt or "").split() if w])
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    ]
    df: Counter = Counter()
    for _, toks in docs:
        df.update(set(toks))
    n = len(docs)
    idf = {term: float(np.log(n / float(c))) for term, c in df.items()}
    out_id, out_term, out_rank = [], [], []
    for did, toks in docs:
        tf = Counter(toks)
        best = sorted(tf.items(), key=lambda kv: (-(kv[1] * idf[kv[0]]), kv[0]))[:k]
        for r, (term, _) in enumerate(best):
            out_id.append(did)
            out_term.append(term)
            out_rank.append(r)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "term": pa.array(out_term, pa.string()),
            "rank": pa.array(out_rank, pa.int64()),
        }
    )


def expected_resize() -> pa.Table:
    ps = synth.make_pagestore(40, seed=42)
    return pa.table(
        {
            "image_id": ps["image_id"],
            "w": pa.array([16] * ps.num_rows, pa.int32()),
            "h": pa.array([16] * ps.num_rows, pa.int32()),
            "fmt": ps["fmt"],
        }
    )


# ---------------------------------------------------------------- crawl


def expected_crawl_flagship() -> pa.Table:
    """Pure-Python sequential crawl (testing/oracle.py) over the flagship
    fixtures, projected to the query's output columns."""
    import re

    ps = synth.make_pagestore(80, seed=42)
    fr = synth.make_frontier(60, seed=42)
    robots = synth.make_robots(seed=42)
    res = crawl_oracle(
        fr.to_pylist(), ps.to_pylist(), robots.to_pylist(), max_waves=2
    )
    id_re = re.compile(r"/p/([^/?#]+)$")
    urls, hosts, waves, ranks, statuses, iids = [], [], [], [], [], []
    it = iter(res.fetched)
    for w, wave_urls in enumerate(res.crawl_order):
        for rank in range(len(wave_urls)):
            r = next(it)
            urls.append(r["url"])
            hosts.append(r["host"])
            waves.append(w)
            ranks.append(rank)
            statuses.append(r["fetch_status"])
            m = id_re.search(r["url"])
            iids.append(m.group(1) if m else None)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "wave": pa.array(waves, pa.int32()),
            "crawl_rank": pa.array(ranks, pa.int64()),
            "fetch_status": pa.array(statuses, pa.string()),
            "image_id": pa.array(iids, pa.string()),
        }
    )


def expected_caption_consistency() -> pa.Table:
    """Sequential caption↔image consistency: one-row-at-a-time decode +
    embed over the same fixture, same shared kernels — batching on the
    engine side must not change a single float64."""
    from .queries import CLIP_SCORE_N

    ps = synth.make_pagestore(CLIP_SCORE_N, seed=42)
    ids, scores = [], []
    for row in ps.select(["image_id", "bytes", "fmt", "caption"]).to_pylist():
        ids.append(row["image_id"])
        scores.append(_clip_score_row(row["bytes"], row["fmt"], row["caption"]))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "clip_score": pa.array(scores, pa.float64()),
        }
    )


def _clip_score_row(buf: bytes, fmt: str, caption: str) -> float:
    """One-row-at-a-time score through the SHARED batch kernel (n=1).

    The kernel is row-wise (per-row contiguous reductions along axis=1),
    so its output is batch-size invariant bit-for-bit; calling it with a
    single row still proves the engine's batching does not change any
    float64. A hand-unrolled 1-D replica is NOT bit-safe here:
    np.linalg.norm on a 1-D vector goes through BLAS dot (different
    summation order than the 2-D axis reduction) and drifts a ulp on
    ~25% of rows (measured at sf0.01)."""
    from ..ops.multimodal import caption_consistency_batch

    t = pa.table(
        {
            "image_id": pa.array(["x"], pa.string()),
            "bytes": pa.array([buf], pa.binary()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([caption], pa.string()),
        }
    )
    return float(caption_consistency_batch(t)["clip_score"][0].as_py())


def expected_curate_image_corpus() -> pa.Table:
    """Sequential curation: admission predicates, clip score, integer
    aspect argmin, score gate, keep-min-id per phash — one row at a
    time over the same pool-cycled fixture."""
    import re

    from ..ops.multimodal import ASPECT_BUCKETS
    from .queries import PHASH_DUP_N, PHASH_DUP_POOL

    ps = synth.make_pagestore(PHASH_DUP_N, seed=42, image_pool=PHASH_DUP_POOL)
    best: dict[int, dict] = {}
    tok_re = re.compile(r"\S+")
    for row in ps.to_pylist():
        w, h = row["w"], row["h"]
        ntok = len(tok_re.findall(row["caption"] or ""))
        if not (
            min(w, h) >= 64
            and max(w, h) <= 2 * min(w, h)
            and ntok >= 8
            and row["fmt"] in ("png", "jpeg")
        ):
            continue
        score = _clip_score_row(row["bytes"], row["fmt"], row["caption"])
        if score < 0.0:
            continue
        ratios = [
            (max(w * bh, h * bw) / min(w * bh, h * bw), i)
            for i, (bw, bh) in enumerate(ASPECT_BUCKETS)
        ]
        _, bi = min(ratios)
        rec = {
            "image_id": row["image_id"],
            "w": w,
            "h": h,
            "fmt": row["fmt"],
            "bucket": f"{ASPECT_BUCKETS[bi][0]}:{ASPECT_BUCKETS[bi][1]}",
            "clip_score": score,
            "phash": row["phash"],
        }
        cur = best.get(row["phash"])
        if cur is None or rec["image_id"] < cur["image_id"]:
            best[row["phash"]] = rec
    recs = sorted(best.values(), key=lambda r: r["image_id"])
    return pa.table(
        {
            "image_id": pa.array([r["image_id"] for r in recs], pa.string()),
            "w": pa.array([r["w"] for r in recs], pa.int32()),
            "h": pa.array([r["h"] for r in recs], pa.int32()),
            "fmt": pa.array([r["fmt"] for r in recs], pa.string()),
            "bucket": pa.array([r["bucket"] for r in recs], pa.string()),
            "clip_score": pa.array([r["clip_score"] for r in recs], pa.float64()),
            "phash": pa.array([r["phash"] for r in recs], pa.int64()),
        }
    )


def expected_payload_psnr() -> pa.Table:
    """Sequential roundtrip-PSNR audit, shared codec kernels."""
    from ..fixtures import codec
    from .queries import PSNR_AUDIT_N

    ps = synth.make_pagestore(PSNR_AUDIT_N, seed=42)
    ids, fmts, lossless, vals, oks = [], [], [], [], []
    for k, row in enumerate(ps.select(["image_id", "bytes", "fmt"]).to_pylist()):
        px = codec.decode(row["bytes"], row["fmt"])
        ref = synth.reference_pixels(k, seed=42)
        p = codec.psnr(ref, px)
        ids.append(row["image_id"])
        fmts.append(row["fmt"])
        lossless.append(p == float("inf"))
        vals.append(None if p == float("inf") else p)
        oks.append(p == float("inf") or p >= 40.0)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "fmt": pa.array(fmts, pa.string()),
            "lossless": pa.array(lossless, pa.bool_()),
            "psnr_db": pa.array(vals, pa.float64()),
            "psnr_ok": pa.array(oks, pa.bool_()),
        }
    )


def expected_politeness_audit() -> pa.Table:
    """Sequential per-(host, wave) schedule audit over the same crawl
    oracle: count + min adjacent gap of the virtual-clock fetch times,
    plus the host's delay — mirrors q_politeness_audit."""
    ps = synth.make_pagestore(80, seed=42)
    fr = synth.make_frontier(60, seed=42)
    robots = synth.make_robots(seed=42)
    res = crawl_oracle(
        fr.to_pylist(), ps.to_pylist(), robots.to_pylist(), max_waves=2
    )
    groups: dict = {}
    it = iter(res.fetched)
    for w, wave_urls in enumerate(res.crawl_order):
        for _ in wave_urls:
            r = next(it)
            groups.setdefault((r["host"], w), []).append(r)
    hosts, waves, ns, gaps, delays = [], [], [], [], []
    for (host, w), rows in sorted(groups.items()):
        ts = sorted(r["fetch_at_us"] for r in rows)
        hosts.append(host)
        waves.append(w)
        ns.append(len(rows))
        gaps.append(
            min(b - a for a, b in zip(ts, ts[1:])) if len(ts) >= 2 else None
        )
        delays.append(rows[0]["delay_ms"] * 1000)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "wave": pa.array(waves, pa.int32()),
            "n_fetches": pa.array(ns, pa.int64()),
            "min_gap_us": pa.array(gaps, pa.int64()),
            "delay_us": pa.array(delays, pa.int64()),
        }
    )


# ------------------------------------------------------------- assembly


@lru_cache(maxsize=4)
def expected_kmeans(sf_dir: str) -> pa.Table:
    """Sequential re-derivation of q_kmeans_clusters: the same pure
    per-block kernel (ops/similarity._kmeans_partial) over the same
    block plan, reduced in (block_min_id, cluster) order — so the
    distributed result must match bit-for-bit (float summation order is
    part of the contract)."""
    from ..ops import similarity as sim
    from .queries import KMEANS_BLOCKS, KMEANS_ITERS, KMEANS_K

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    n = t.num_rows
    raw = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    V = sim._normalize(raw)
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    step = max(256, -(-n // KMEANS_BLOCKS))  # _ds_from_table's slice plan
    # init = the corpus's first k raw vectors, normalized (as kmeans_fit does)
    C = sim._normalize(raw[:KMEANS_K])
    k, d = C.shape
    # reduce slices sorted by their minimum id — the same deterministic
    # order kmeans_fit imposes on its per-block partials (the streaming
    # executor returns blocks in completion order, so block position is
    # not a usable key on the distributed side)
    slices = sorted(range(0, n, step), key=lambda s: ids[s : s + step].min())
    for _ in range(KMEANS_ITERS):
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, d), dtype=np.float64)
        for s in slices:
            _, c, sm = sim._kmeans_partial(V[s : s + step], C)
            counts += c
            sums += sm
        C = sim._kmeans_step(C, counts, sums)
    assign = np.argmax(V @ C.T, axis=1).astype(np.int32)
    return pa.table(
        {"vec_id": t["vec_id"], "cluster": pa.array(assign, pa.int32())}
    )


@lru_cache(maxsize=4)
def expected_knn_recall(sf_dir: str) -> pa.Table:
    """Sequential recall@10 of the IVF path vs an exact scan: the IVF
    side reuses expected_knn_ivf (same centroids/probe pruning); the
    exact side is one dense matmul with the same (score desc, id) tie
    rule as knn_brute_force."""
    approx = expected_knn_ivf(sf_dir)
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    E = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)

    def norm(M):
        return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)

    En, Qn = norm(E), norm(E[:5])
    q_ids = ids[:5]
    ap: dict[int, set] = {}
    for q, nbr in zip(
        approx["query_id"].to_pylist(), approx["neighbor_id"].to_pylist()
    ):
        ap.setdefault(q, set()).add(nbr)
    rows = []
    for qi, qid in enumerate(q_ids):
        scores = En @ Qn[qi]
        order = sorted(
            range(len(E)), key=lambda r: (-scores[r], ids[r])
        )
        picked = [r for r in order if ids[r] != qid][:10]
        exact = {int(ids[r]) for r in picked}
        hits = len(exact & ap.get(int(qid), set()))
        rows.append(
            {
                "query_id": int(qid),
                "n_hits": hits,
                "recall": float(hits) / float(len(exact)),
            }
        )
    return pa.Table.from_pylist(rows)


def expected_audience_overlap(sf_dir: str) -> pa.Table:
    """Sequential KMV re-derivation: per-type DISTINCT user md5-64
    hashes via plain Python sets, k smallest by sorted(), the same
    θ-combine expression — shares only the md5 convention with the
    engine's np.unique/merge combiner."""
    import hashlib

    from .queries import KMV_K

    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    by_type: dict[str, set] = {}
    for ty, u in zip(
        t["event_type"].to_pylist(), t["user_id"].to_pylist()
    ):
        by_type.setdefault(ty, set()).add(
            int(hashlib.md5(str(u).encode()).hexdigest()[:16], 16)
        )
    sketches = {
        ty: np.array(sorted(hs)[:KMV_K], dtype=np.uint64)
        for ty, hs in by_type.items()
    }
    from ..ops.agg import kmv_estimate_intersections

    return kmv_estimate_intersections(sketches, k=KMV_K)


def expected_value_mean_ci(sf_dir: str) -> pa.Table:
    """Sequential Poisson-bootstrap re-derivation: the same splitmix64 /
    inverse-CDF kernels over the WHOLE column at once (no blocks), plain
    Python sums — partials being exact ints, the distributed combiner
    must reproduce these replicates exactly."""
    from ..ops.agg import _POIS1_CDF, _splitmix64

    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )
    ids = np.asarray(t["event_id"], dtype=np.int64).view(np.uint64)
    c = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(np.int64)
    base = _splitmix64(ids ^ np.uint64(7))
    means = []
    for r in range(50):
        h = _splitmix64(base + np.uint64(r + 1))
        u = (h >> np.uint64(11)).astype(np.float64) / np.float64(1 << 53)
        w = np.searchsorted(_POIS1_CDF, u).astype(np.int64)
        sw, swc = int(w.sum()), int((w * c).sum())
        if sw:
            means.append(float(np.float64(swc) / np.float64(sw)))
    means.sort()
    lo = means[int(np.floor(0.025 * len(means)))]
    hi = means[min(len(means) - 1, int(np.ceil(0.975 * len(means))) - 1)]
    mean = float(np.float64(int(c.sum())) / np.float64(len(c)))
    return pa.table(
        {
            "n_rows": pa.array([len(c)], pa.int64()),
            "mean_cents": pa.array([mean], pa.float64()),
            "ci_lo": pa.array([lo], pa.float64()),
            "ci_hi": pa.array([hi], pa.float64()),
            "reps": pa.array([50], pa.int64()),
        }
    )


def expected_embedding_pca_proj(sf_dir: str, scale_bits: int = 20) -> pa.Table:
    """Sequential fit→transform: components from
    expected_embedding_pca's path, then ONE whole-matrix INTEGER matmul
    (exact, so block layout cannot matter) and the same /2^(2k)
    down-scale."""
    from .queries import PCA_K

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    exp = expected_embedding_pca(sf_dir, scale_bits=scale_bits)
    d = int(np.asarray(exp["dim"]).max()) + 1
    comps = np.asarray(exp["loading"]).reshape(PCA_K, d)
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    s = np.float64(1 << scale_bits)
    Q = np.rint(X * s).astype(np.int64)
    Cq = np.rint(comps * s).astype(np.int64)
    P = (Q @ Cq.T).astype(np.float64) / (s * s)
    k = P.shape[1]
    return pa.table(
        {
            "vec_id": pa.array(np.repeat(ids, k), pa.int64()),
            "component": pa.array(np.tile(np.arange(k), len(ids)), pa.int64()),
            "coord": pa.array(P.ravel(), pa.float64()),
        }
    )


def expected_caption_pixel_corr() -> pa.Table:
    """Sequential big-int re-derivation of q_caption_pixel_corr: plain
    Python sums over the shared deterministic store fixture, the same
    one-cast-per-float Pearson formula as the SQL HUGEINT oracles."""
    import math

    from ..fixtures import synth
    from .queries import PHASH_DUP_N, PHASH_DUP_POOL

    t = synth.make_pagestore(PHASH_DUP_N, seed=42, image_pool=PHASH_DUP_POOL)
    agg: dict[str, list[int]] = {}
    for fmt, w, h, cap in zip(
        t["fmt"].to_pylist(),
        t["w"].to_pylist(),
        t["h"].to_pylist(),
        t["caption"].to_pylist(),
    ):
        x, y = len(cap), int(w) * int(h)
        a = agg.setdefault(fmt, [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += x
        a[2] += y
        a[3] += x * x
        a[4] += y * y
        a[5] += x * y
    rows = []
    for fmt in sorted(agg):
        n, sx, sy, sxx, syy, sxy = agg[fmt]
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        corr = (
            None
            if dx == 0 or dy == 0
            else float(n * sxy - sx * sy)
            / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
        )
        rows.append({"fmt": fmt, "n_values": n, "corr_xy": corr})
    return pa.Table.from_pylist(rows)


def expected_type_drift(sf_dir: str) -> pa.Table:
    """Sequential re-derivation of q_type_drift: one pass for the ts
    range, Counter per half, identical float expressions."""
    from collections import Counter

    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )
    us = np.asarray(t["ts"].cast(pa.int64()))
    mid = (int(us.min()) + int(us.max())) // 2
    types = t["event_type"].to_pylist()
    first: Counter = Counter()
    second: Counter = Counter()
    for u, ty in zip(us, types):
        (second if u >= mid else first)[ty] += 1
    ta, tb = sum(first.values()), sum(second.values())
    rows = []
    for ty in sorted(set(first) | set(second)):
        a, b = first.get(ty, 0), second.get(ty, 0)
        sa = float(np.float64(a) / np.float64(ta)) if ta else None
        sb = float(np.float64(b) / np.float64(tb)) if tb else None
        kl = (
            float(np.float64(sa) * np.log2(np.float64(sa) / np.float64(sb)))
            if a and b
            else None
        )
        rows.append(
            {
                "event_type": ty,
                "n_first": a,
                "n_second": b,
                "share_first": sa,
                "share_second": sb,
                "kl_term": kl,
            }
        )
    return pa.Table.from_pylist(rows)


def expected_user_entropy(sf_dir: str, scale_bits: int = 20) -> pa.Table:
    """Sequential re-derivation of ops/agg.group_entropy over events:
    plain dict-of-Counters, per-type fixed-point term sum in Python
    ints (order-free), the same final float expression. Shares only the
    elementary np.log2 kernel (bitwise position-independent) with the
    engine — counting and summation are structurally independent."""
    from collections import Counter

    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    cnt: dict[str, Counter] = {}
    for k, u in zip(t["event_type"].to_pylist(), t["user_id"].to_pylist()):
        cnt.setdefault(k, Counter())[u] += 1
    scale = np.float64(1 << scale_bits)
    rows = []
    for k in sorted(cnt):
        c = np.array(sorted(cnt[k].values()), dtype=np.int64)
        cf = c.astype(np.float64)
        terms = np.rint(cf * np.log2(cf) * scale).astype(np.int64)
        s = sum(int(x) for x in terms)
        n = int(c.sum())
        if len(c) == 1:
            h = 0.0
        else:
            nf = np.float64(n)
            h = float(np.log2(nf) - (np.float64(s) / scale) / nf)
        rows.append(
            {
                "event_type": k,
                "n_events": n,
                "n_values": len(c),
                "entropy_bits": h,
            }
        )
    return pa.Table.from_pylist(rows)


def expected_embedding_pca(sf_dir: str, scale_bits: int = 20) -> pa.Table:
    """Sequential re-derivation of ops/similarity.pca_fit: quantize the
    WHOLE embedding matrix at once, one exact int64 Gram matmul (no
    block partials), Python-int sums, the identical covariance
    expression and eigh + sign-pinning — the distributed integer
    combiner must reproduce these exact integers at any layout."""
    from .queries import PCA_K

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    n, d = X.shape
    scale = np.float64(1 << scale_bits)
    Q = np.rint(X * scale).astype(np.int64)
    assert float(np.abs(Q).max()) ** 2 * n < float(1 << 62)
    S = [int(x) for x in Q.sum(axis=0)]
    G = [int(x) for x in (Q.T @ Q).ravel()]
    Sf = np.array([float(x) for x in S], dtype=np.float64)
    Gf = np.array([float(x) for x in G], dtype=np.float64).reshape(d, d)
    Nf = np.float64(n)
    m = Sf / (Nf * scale)
    C = Gf / (Nf * scale * scale) - np.outer(m, m)
    eigvals, eigvecs = np.linalg.eigh(C)
    order = np.argsort(eigvals)[::-1][:PCA_K]
    vals = eigvals[order]
    comps = eigvecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ratio = vals / np.float64(np.trace(C))
    k = comps.shape[0]
    return pa.table(
        {
            "component": pa.array(np.repeat(np.arange(k), d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d), k), pa.int64()),
            "loading": pa.array(comps.ravel(), pa.float64()),
            "eigval": pa.array(np.repeat(vals, d), pa.float64()),
            "var_ratio": pa.array(np.repeat(ratio, d), pa.float64()),
        }
    )


def expected_evolving_ingest() -> pa.Table:
    """Independent recompute of the evolving_ingest aggregate straight
    from the shared generator — same generation split as the query's
    fixture writer (first 200 rows = gen-0 with n_tokens, rest = gen-1
    with lang), plain dict accumulation."""
    from ..fixtures.synth import make_jsonl_docs

    agg: dict[str, list[int]] = {}
    for i, r in enumerate(make_jsonl_docs()):
        a = agg.setdefault(r["kind"], [0, 0, 0])
        a[0] += 1
        if i < 200:
            a[1] += r["n_tokens"]
        else:
            a[2] += 1
    rows = [
        {
            "kind": k,
            "n_records": a[0],
            "sum_tokens": a[1],
            "n_lang_known": a[2],
        }
        for k, a in sorted(agg.items())
    ]
    return pa.Table.from_pylist(rows)


def expected_audio_features() -> pa.Table:
    """Sequential replica of q_audio_features: decode each WAV with
    stdlib ``wave`` (an independent reader of the RIFF container — NOT
    fixtures/codec.decode_wav) and accumulate per-sample moments with
    explicit Python loops."""
    import io
    import math
    import wave as wavmod

    from .queries import AUDIO_N

    t = synth.make_audiostore(AUDIO_N, seed=42)
    rows = []
    for aid, buf, sr in zip(
        t["audio_id"].to_pylist(),
        t["bytes"].to_pylist(),
        t["sample_rate"].to_pylist(),
    ):
        with wavmod.open(io.BytesIO(buf)) as w:
            assert w.getnchannels() == 1 and w.getsampwidth() == 2
            rate = w.getframerate()
            n = w.getnframes()
            pcm = w.readframes(n)
        assert rate == sr
        s_sq = peak = zc = 0
        prev_neg = None
        for i in range(n):
            s = int.from_bytes(pcm[2 * i : 2 * i + 2], "little", signed=True)
            s_sq += s * s
            if abs(s) > peak:
                peak = abs(s)
            neg = s < 0
            if prev_neg is not None and neg != prev_neg:
                zc += 1
            prev_neg = neg
        rows.append(
            {
                "audio_id": aid,
                "n_samples": n,
                "duration_us": n * 1_000_000 // rate,
                "sum_sq": s_sq,
                "peak": peak,
                "zero_cross": zc,
                "rms": math.sqrt(s_sq / n) if n else 0.0,
                "decode_ok": True,
            }
        )
    return pa.Table.from_pylist(rows)


def expected_video_frame_stats() -> pa.Table:
    """Sequential replica of q_video_frame_stats: walk the NCV1
    container with an explicit struct loop (independent of
    codec.video_frame_offsets), decode each sampled frame with the
    scalar image codec, and sum luma with a per-row Python loop. phash
    uses the shared pure kernel (codec.phash64), like the image-family
    oracles."""
    import struct as structmod

    from ..fixtures import codec
    from .queries import VIDEO_EVERY_N, VIDEO_N

    t = synth.make_videostore(VIDEO_N, seed=42)
    rows = []
    for vid, buf in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
        assert buf[:4] == b"NCV1"
        _fps, fmt_code, n_frames = structmod.unpack("<HBI", buf[4:11])
        fmt = {0: "png", 1: "jpeg"}[fmt_code]
        pos = 11
        for f in range(n_frames):
            (length,) = structmod.unpack("<I", buf[pos : pos + 4])
            if f % VIDEO_EVERY_N == 0:
                px = codec.decode(buf[pos + 4 : pos + 4 + length], fmt)
                h, w = px.shape[0], px.shape[1]
                luma = 0
                for y in range(h):
                    row = px[y]
                    for x in range(w):
                        luma += int(row[x][0]) + int(row[x][1]) + int(row[x][2])
                rows.append(
                    {
                        "video_id": vid,
                        "frame_idx": f,
                        "luma_sum": luma,
                        "n_px": h * w,
                        "phash": codec.phash64(px),
                    }
                )
            pos += 4 + length
    tbl = pa.Table.from_pylist(rows)
    return tbl.set_column(
        tbl.column_names.index("frame_idx"),
        "frame_idx",
        pa.array([r["frame_idx"] for r in rows], pa.int32()),
    )


def expected_audio_near_dup() -> pa.Table:
    """Sequential all-pairs replica of q_audio_near_dup: independent
    stdlib-wave decode, the shared envelope-hash kernel, NO banding —
    verifies the pigeonhole bucketing finds the exact pair set."""
    import io
    import wave as wavmod

    from ..ops.multimodal import audio_envelope_hash64
    from .queries import AUDIO_DUP_EVERY, AUDIO_DUP_HAMMING, AUDIO_DUP_N

    t = synth.make_audiostore(AUDIO_DUP_N, seed=42, dup_every=AUDIO_DUP_EVERY)
    hashes = []
    ids = []
    for aid, buf in zip(t["audio_id"].to_pylist(), t["bytes"].to_pylist()):
        with wavmod.open(io.BytesIO(buf)) as w:
            pcm = w.readframes(w.getnframes())
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.int16)
        hashes.append(np.uint64(np.int64(audio_envelope_hash64(samples))))
        ids.append(int(aid[2:]))
    h = np.array(hashes, dtype=np.uint64)
    pairs: set[tuple[int, int]] = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            if int(H.hamming_distance64(h[x : x + 1], h[y : y + 1])[0]) <= AUDIO_DUP_HAMMING:
                pairs.add((min(ids[x], ids[y]), max(ids[x], ids[y])))
    if not pairs:
        raise RuntimeError("audio_near_dup oracle found no planted pairs")
    return _pairs_table(pairs)


def expected_video_scene_cuts() -> pa.Table:
    """Sequential replica of q_video_scene_cuts: explicit struct walk +
    per-pixel luma loops re-derive every inter-frame delta."""
    import struct as structmod

    from ..fixtures import codec
    from .queries import SCENE_CUT_MILLI, VIDEO_CUT_EVERY, VIDEO_CUT_N

    t = synth.make_videostore(VIDEO_CUT_N, seed=42, cut_every=VIDEO_CUT_EVERY)
    rows = []
    for vid, buf in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
        assert buf[:4] == b"NCV1"
        _fps, fmt_code, n_frames = structmod.unpack("<HBI", buf[4:11])
        fmt = {0: "png", 1: "jpeg"}[fmt_code]
        pos = 11
        frames = []
        for _f in range(n_frames):
            (length,) = structmod.unpack("<I", buf[pos : pos + 4])
            frames.append(codec.decode(buf[pos + 4 : pos + 4 + length], fmt))
            pos += 4 + length
        h_, w_ = frames[0].shape[0], frames[0].shape[1]
        full = h_ * w_ * 3 * 255
        n_cuts = 0
        max_delta = 0
        for a, b in zip(frames, frames[1:]):
            sad = 0
            for y in range(h_):
                ra, rb = a[y], b[y]
                for x in range(w_):
                    sad += (
                        abs(int(ra[x][0]) - int(rb[x][0]))
                        + abs(int(ra[x][1]) - int(rb[x][1]))
                        + abs(int(ra[x][2]) - int(rb[x][2]))
                    )
            dm = sad * 1000 // full
            max_delta = max(max_delta, dm)
            if dm >= SCENE_CUT_MILLI:
                n_cuts += 1
        rows.append(
            {
                "video_id": vid,
                "n_frames": len(frames),
                "n_cuts": n_cuts,
                "max_delta_milli": max_delta,
            }
        )
    tbl = pa.Table.from_pylist(rows)
    return tbl.set_column(
        tbl.column_names.index("n_frames"),
        "n_frames",
        pa.array([r["n_frames"] for r in rows], pa.int32()),
    )


def expected_audio_spectral() -> pa.Table:
    """Sequential replica of q_audio_spectral: independent stdlib-wave
    decode, shared rfft kernel per clip."""
    import io
    import wave as wavmod

    from ..ops.multimodal import audio_spectral_kernel
    from .queries import AUDIO_N

    t = synth.make_audiostore(AUDIO_N, seed=42)
    rows = []
    for aid, buf in zip(t["audio_id"].to_pylist(), t["bytes"].to_pylist()):
        with wavmod.open(io.BytesIO(buf)) as w:
            rate = w.getframerate()
            pcm = w.readframes(w.getnframes())
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.int16)
        b, hz, nb = audio_spectral_kernel(samples, rate)
        rows.append(
            {"audio_id": aid, "dominant_bin": b, "dominant_hz": hz, "n_bins": nb}
        )
    return pa.Table.from_pylist(rows)


def expected_caption_retrieval() -> pa.Table:
    """Sequential full-matrix replica of q_caption_retrieval: shared
    quantized-int kernels, one whole-gallery loop per caption (no
    batching, no broadcast)."""
    from ..ops import hashing as oph
    from ..ops.multimodal import cell_vector64_f64, unit_q64
    from .queries import RETR_KS, RETR_N

    t = synth.make_pagestore(RETR_N, seed=42)
    n = t.num_rows
    G = np.stack(
        [
            unit_q64(cell_vector64_f64(b, f))
            for b, f in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist())
        ]
    )
    hashes, offsets = oph.tokenize_batch(t["caption"].combine_chunks())
    M = np.zeros((n, 64), dtype=np.int64)
    doc_idx = np.repeat(np.arange(n), np.diff(offsets))
    dims = (hashes % np.uint64(64)).astype(np.int64)
    signs = 1 - 2 * ((hashes >> np.uint64(6)) & np.uint64(1)).astype(np.int64)
    np.add.at(M, (doc_idx, dims), signs)
    hits = {k: 0 for k in RETR_KS}
    for i in range(n):
        q = unit_q64(M[i].astype(np.float64))
        scores = [int(q @ G[j]) for j in range(n)]
        s_true = scores[i]
        rank = sum(1 for j in range(n) if scores[j] > s_true) + sum(
            1 for j in range(i) if scores[j] == s_true
        )
        for k in RETR_KS:
            if rank < k:
                hits[k] += 1
    return pa.table(
        {
            "k": pa.array(sorted(RETR_KS), pa.int64()),
            "n_queries": pa.array([n] * len(RETR_KS), pa.int64()),
            "n_hits": pa.array([hits[k] for k in sorted(RETR_KS)], pa.int64()),
        }
    )


def expected_oracle_sql(sf_dir: str) -> dict[str, str]:
    """DuckDB oracle statements for the formerly rows-only queries.

    Expected-table queries inline their VALUES; langid / news_pipeline /
    ip_block_rules additionally express the operator's logic in real SQL
    on top of raw inputs.
    """
    from ..ops.text import LANG_MARKERS

    sql: dict[str, str] = {}
    sql["ioc_extract"] = values_sql(expected_iocs())
    sql["user_entropy_by_type"] = values_sql(expected_user_entropy(sf_dir))
    sql["embedding_pca"] = values_sql(expected_embedding_pca(sf_dir))
    sql["minhash_dedup_pairs"] = values_sql(expected_minhash_pairs(sf_dir))
    sql["ngram_jaccard_pairs"] = values_sql(expected_ngram_pairs(sf_dir))
    sql["simhash_pairs"] = values_sql(expected_simhash_pairs(sf_dir))
    sql["phash_near_dup"] = values_sql(expected_phash_pairs())
    sql["canonical_images"] = values_sql(expected_canonical_images())
    sql["image_meta_audit"] = values_sql(expected_image_meta_audit())
    sql["tile_dup_pairs"] = values_sql(expected_tile_dup_pairs())
    sql["image_knn"] = values_sql(expected_image_knn())
    sql["hll_users"] = values_sql(expected_hll_users(sf_dir))
    sql["tfidf_terms"] = values_sql(expected_tfidf(sf_dir))
    sql["hll_users_by_type"] = values_sql(expected_hll_by_type(sf_dir))
    sql["channel_histogram"] = values_sql(expected_channel_histogram())
    sql["pagerank"] = values_sql(expected_pagerank())
    sql["tensor_prep"] = values_sql(expected_tensor_prep())
    sql["embedding_dup_pairs"] = values_sql(expected_embedding_pairs(sf_dir))
    sql["semantic_dedup"] = values_sql(expected_semantic_dedup(sf_dir))
    sql["knn_ivf"] = values_sql(expected_knn_ivf(sf_dir))
    sql["kmeans_clusters"] = values_sql(expected_kmeans(sf_dir))
    sql["jsonl_ingest"] = values_sql(expected_jsonl_ingest())
    sql["csv_ingest"] = values_sql(expected_jsonl_ingest())
    sql["ipc_ingest"] = values_sql(expected_jsonl_ingest())
    sql["orc_ingest"] = values_sql(expected_jsonl_ingest())
    sql["evolving_ingest"] = values_sql(expected_evolving_ingest())
    sql["knn_recall"] = values_sql(expected_knn_recall(sf_dir))
    sql["type_drift"] = values_sql(expected_type_drift(sf_dir))
    sql["audience_overlap"] = values_sql(expected_audience_overlap(sf_dir))
    sql["value_mean_ci"] = values_sql(expected_value_mean_ci(sf_dir))
    sql["embedding_pca_proj"] = values_sql(expected_embedding_pca_proj(sf_dir))
    sql["caption_pixel_corr"] = values_sql(expected_caption_pixel_corr())
    sql["winnow_dup_pairs"] = values_sql(expected_winnow_pairs(sf_dir))
    sql["letterbox_stats"] = values_sql(expected_letterbox())
    sql["dedup_spans"] = values_sql(expected_span_removal(sf_dir))
    sql["dominant_color"] = values_sql(expected_dominant_color())
    sql["sharpness"] = values_sql(expected_sharpness())
    sql["audio_features"] = values_sql(expected_audio_features())
    sql["video_frame_stats"] = values_sql(expected_video_frame_stats())
    sql["audio_near_dup"] = values_sql(expected_audio_near_dup())
    sql["video_scene_cuts"] = values_sql(expected_video_scene_cuts())
    sql["audio_spectral"] = values_sql(expected_audio_spectral())
    sql["caption_retrieval"] = values_sql(expected_caption_retrieval())
    sql["augment_images"] = values_sql(expected_augment_images())
    sql["curate_audio_corpus"] = values_sql(expected_curate_audio())
    sql["curate_video_corpus"] = values_sql(expected_curate_video())
    sql["video_near_dup"] = values_sql(expected_video_near_dup())
    sql["pq_codes"] = values_sql(expected_pq_codes(sf_dir))
    sql["knn_pq"] = values_sql(expected_pq_knn(sf_dir))
    # dup_components: exact transitive closure (recursive CTE) over the
    # independently-derived minhash pair set
    sql["dup_components"] = (
        "WITH RECURSIVE pairs AS ("
        + values_sql(expected_minhash_pairs(sf_dir))
        + "), und AS ("
        "  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs"
        "  UNION SELECT id_a, id_a FROM pairs UNION SELECT id_b, id_b FROM pairs"
        "), reach(src, node) AS ("
        "  SELECT a, a FROM und"
        "  UNION SELECT r.src, u.b FROM reach r JOIN und u ON r.node = u.a"
        ") SELECT node, CAST(min(src) AS BIGINT) AS component FROM reach GROUP BY node"
    )
    # canonical_docs: same closure + a VALUES table of independently
    # counted tokens per planted doc; best-quality member per cluster
    def _planted_tokens() -> pa.Table:
        from .queries import _drop_word3

        t = _planted(sf_dir, _drop_word3)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(
                    [len([w for w in (x or "").split() if w])
                     for x in t["text"].to_pylist()],
                    pa.int64(),
                ),
            }
        )

    sql["canonical_docs"] = (
        "WITH RECURSIVE pairs AS ("
        + values_sql(expected_minhash_pairs(sf_dir))
        + "), und AS ("
        "  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs"
        "  UNION SELECT id_a, id_a FROM pairs UNION SELECT id_b, id_b FROM pairs"
        "), reach(src, node) AS ("
        "  SELECT a, a FROM und"
        "  UNION SELECT r.src, u.b FROM reach r JOIN und u ON r.node = u.a"
        "), comp AS (SELECT node, min(src) AS component FROM reach GROUP BY node), "
        "q AS (" + values_sql(_planted_tokens()) + "), "
        "f AS (SELECT coalesce(c.component, q.doc_id) AS component, q.doc_id, "
        "      q.n_tokens FROM q LEFT JOIN comp c ON c.node = q.doc_id) "
        "SELECT component, doc_id AS canonical_id, n_tokens FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY component "
        "    ORDER BY n_tokens DESC, doc_id) AS rn FROM f) WHERE rn = 1"
    )

    # leakage_safe_split: same closure; split assigned by the SHARED
    # md5 thresholds over the component id (split_case_sql)
    from ..ops.sampling import split_case_sql
    from .queries import _drop_word3 as _dw3

    _pids = pa.table({"doc_id": _planted(sf_dir, _dw3)["doc_id"]})
    sql["leakage_safe_split"] = (
        "WITH RECURSIVE pairs AS ("
        + values_sql(expected_minhash_pairs(sf_dir))
        + "), und AS ("
        "  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs"
        "  UNION SELECT id_a, id_a FROM pairs UNION SELECT id_b, id_b FROM pairs"
        "), reach(src, node) AS ("
        "  SELECT a, a FROM und"
        "  UNION SELECT r.src, u.b FROM reach r JOIN und u ON r.node = u.a"
        "), comp AS (SELECT node, min(src) AS component FROM reach GROUP BY node), "
        "q AS (" + values_sql(_pids) + "), "
        "f AS (SELECT q.doc_id, CAST(coalesce(c.component, q.doc_id) AS BIGINT) "
        "      AS component FROM q LEFT JOIN comp c ON c.node = q.doc_id) "
        "SELECT doc_id, component, "
        + split_case_sql("component", val_fraction=0.1, test_fraction=0.1)
        + " AS split FROM f"
    )

    # image_dup_clusters: same exact transitive closure, over the
    # independently-derived (all-pairs, no banding) phash pair set
    sql["image_dup_clusters"] = (
        "WITH RECURSIVE pairs AS ("
        + values_sql(expected_phash_pairs())
        + "), und AS ("
        "  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs"
        "  UNION SELECT id_a, id_a FROM pairs UNION SELECT id_b, id_b FROM pairs"
        "), reach(src, node) AS ("
        "  SELECT a, a FROM und"
        "  UNION SELECT r.src, u.b FROM reach r JOIN und u ON r.node = u.a"
        ") SELECT node, CAST(min(src) AS BIGINT) AS component FROM reach GROUP BY node"
    )
    # dedup_corpus: the planted-id universe MINUS every component member
    # that is not its cluster's min id (same independent pair set and
    # closure as dup_components)
    sql["dedup_corpus"] = (
        "WITH RECURSIVE pairs AS ("
        + values_sql(expected_minhash_pairs(sf_dir))
        + "), und AS ("
        "  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs"
        "  UNION SELECT id_a, id_a FROM pairs UNION SELECT id_b, id_b FROM pairs"
        "), reach(src, node) AS ("
        "  SELECT a, a FROM und"
        "  UNION SELECT r.src, u.b FROM reach r JOIN und u ON r.node = u.a"
        "), comp AS (SELECT node, min(src) AS component FROM reach GROUP BY node) "
        "SELECT doc_id FROM ("
        "  SELECT doc_id FROM documents "
        "  UNION ALL SELECT doc_id + 1000000 FROM documents) "
        "WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)"
    )
    # image_dedup_corpus: iid universe of the near-dup store MINUS every
    # phash-cluster member that is not its cluster's min iid
    sql["image_dedup_corpus"] = (
        "WITH RECURSIVE pairs AS ("
        + values_sql(expected_phash_pairs())
        + "), und AS ("
        "  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs"
        "  UNION SELECT id_a, id_a FROM pairs UNION SELECT id_b, id_b FROM pairs"
        "), reach(src, node) AS ("
        "  SELECT a, a FROM und"
        "  UNION SELECT r.src, u.b FROM reach r JOIN und u ON r.node = u.a"
        "), comp AS (SELECT node, min(src) AS component FROM reach GROUP BY node) "
        "SELECT CAST(iid AS BIGINT) AS iid FROM ("
        "  SELECT range AS iid FROM range(0, 60) "
        "  UNION ALL SELECT range + 1000000 FROM range(0, 60)) "
        "WHERE iid NOT IN (SELECT node FROM comp WHERE node <> component)"
    )
    sql["image_features"] = values_sql(expected_image_features())
    sql["resize_images"] = values_sql(expected_resize())
    sql["crawl_flagship"] = values_sql(expected_crawl_flagship())
    sql["politeness_audit"] = values_sql(expected_politeness_audit())
    sql["curate_image_corpus"] = values_sql(expected_curate_image_corpus())
    sql["payload_psnr"] = values_sql(expected_payload_psnr())

    # ip_block_rules: distinct IPs from the expected IOC table, then the
    # SID + rule-line logic in real SQL (ref suricata.py:60,182-189)
    ioc_values = values_sql(expected_iocs())
    sql["ip_block_rules"] = (
        "WITH ioc AS (" + ioc_values + "), "
        "ips AS (SELECT DISTINCT value FROM ioc WHERE kind = 'ip'), "
        "ranked AS (SELECT value, 7000000 + row_number() OVER (ORDER BY value) - 1 AS sid FROM ips) "
        "SELECT value, sid, 'drop ip ' || value || "
        "' any <> any any (msg:\"SecBot blocked IP\"; sid:' || sid || '; rev:1;)' AS rule "
        "FROM ranked"
    )

    # news_pipeline: ground-truth items + the whole filter/dedup/sort/
    # limit logic in real SQL (ref news.py:141-162)
    truth = values_sql(synth.make_html_listing_truth(6, 10, seed=42))
    kw_re = "|".join(synth.keywords())
    sql["news_pipeline"] = (
        "WITH items AS (" + truth + "), "
        f"kw AS (SELECT * FROM items WHERE regexp_matches(lower(title), '{kw_re}')), "
        "dedup AS (SELECT link, title, published FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY link ORDER BY published DESC, title) AS rn FROM kw"
        ") WHERE rn = 1) "
        "SELECT link, title, published FROM dedup ORDER BY published DESC, link LIMIT 20"
    )

    # rss_advisories: raw feed entries inlined, then the WHOLE operator
    # (head-limit, strip, summary coalesce, UTC→Seoul date shift, regex
    # + default-day fallbacks, today filter) in real SQL
    # (ref advisory.py:61-109)
    raw = values_sql(synth.make_rss_feed(40, seed=42, today="2025-06-20"))
    sql["rss_advisories"] = (
        "WITH raw AS (" + raw + "), "
        "lim AS (SELECT * FROM raw WHERE seq < 30), "
        "parsed AS (SELECT entry_id, trim(title) AS title, trim(link) AS link, "
        "COALESCE("
        "CAST(try_strptime(published, '%Y-%m-%dT%H:%M:%S') + INTERVAL 9 HOUR AS DATE), "
        r"CAST(try_strptime(NULLIF(regexp_extract(published, '\d{4}-\d{2}-\d{2}'), ''), '%Y-%m-%d') AS DATE), "
        "DATE '2025-06-20') AS published, "
        "COALESCE(summary, description, '') AS summary FROM lim) "
        "SELECT entry_id, title, link, published, summary FROM parsed "
        "WHERE published = DATE '2025-06-20'"
    )

    # mixture_sample: counts read at oracle-build time (one pruned
    # column), fractions from the SAME pure formula as the engine pass,
    # predicate from the SAME threshold renderer (sample_case_sql)
    from collections import Counter

    from ..ops.sampling import mixture_fractions, sample_case_sql
    from .queries import MIXTURE_BUDGET, MIXTURE_WEIGHTS

    lang_counts = Counter(
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
        )["lang"].to_pylist()
    )
    fr = mixture_fractions(dict(lang_counts), MIXTURE_WEIGHTS, MIXTURE_BUDGET)
    sql["mixture_sample"] = (
        "SELECT doc_id, lang FROM documents WHERE "
        + sample_case_sql("doc_id", "lang", fr, 0.0)
    )

    # image_corpus_filter: page-store METADATA inlined, the admission
    # predicates (min dim, aspect bound, caption token floor, fmt
    # allowlist) in real SQL — same fixture, same thresholds as
    # queries.q_image_corpus_filter
    from .queries import IMG_FILTER_N

    meta = values_sql(
        synth.make_pagestore(IMG_FILTER_N, seed=42).select(
            ["image_id", "w", "h", "fmt", "caption"]
        )
    )
    sql["image_corpus_filter"] = (
        "WITH meta AS (" + meta + ") "
        r"SELECT image_id, w, h, fmt, len(regexp_extract_all(caption, '\S+')) "
        "AS n_caption_tokens FROM meta "
        "WHERE least(w, h) >= 64 AND greatest(w, h) <= 2 * least(w, h) "
        r"AND len(regexp_extract_all(caption, '\S+')) >= 8 "
        "AND fmt IN ('png', 'jpeg')"
    )

    # caption_consistency: sequential oracle over the same fixture,
    # sharing the embed kernels (cell_vector64_f64 / tokenize_batch are
    # the conformance-anchored primitives, like the kNN image oracle)
    sql["caption_consistency"] = values_sql(expected_caption_consistency())

    # outlink_degrees: captions inlined, link harvest + host parse +
    # count re-expressed in real SQL regexps
    from .queries import OUTLINK_DEG_N

    caps = values_sql(
        synth.make_pagestore(OUTLINK_DEG_N, seed=42).select(["caption"])
    )
    sql["outlink_degrees"] = (
        "WITH meta AS (" + caps + "), "
        r"l AS (SELECT unnest(regexp_extract_all(caption, 'link:(\S+)', 1)) AS u "
        "FROM meta) "
        "SELECT regexp_extract(u, '^[a-z]+://([^/]+)', 1) AS host, "
        "count(*) AS n_links FROM l GROUP BY 1"
    )

    # reciprocal_links: same harvest with the page's own host attached
    caps_src = values_sql(
        synth.make_pagestore(OUTLINK_DEG_N, seed=42)
        .select(["caption"])
        .append_column(
            "src_host",
            pa.array([synth.host_of(k) for k in range(OUTLINK_DEG_N)], pa.string()),
        )
    )
    sql["reciprocal_links"] = (
        "WITH meta AS (" + caps_src + "), "
        r"e AS (SELECT src_host AS s, regexp_extract(u, '^[a-z]+://([^/]+)', 1) AS d "
        r"  FROM (SELECT src_host, unnest(regexp_extract_all(caption, 'link:(\S+)', 1)) AS u "
        "    FROM meta)), "
        "p AS (SELECT least(s, d) AS host_a, greatest(s, d) AS host_b, "
        "  CAST(s < d AS BIGINT) AS fwd, CAST(s > d AS BIGINT) AS rev "
        "  FROM e WHERE s <> d) "
        "SELECT host_a, host_b, CAST(SUM(fwd) AS BIGINT) AS n_ab, "
        "  CAST(SUM(rev) AS BIGINT) AS n_ba, "
        "  (SUM(fwd) > 0 AND SUM(rev) > 0) AS reciprocal "
        "FROM p GROUP BY host_a, host_b"
    )

    # exact_phash_dups: metadata inlined, the dup grouping in real SQL
    from .queries import PHASH_DUP_N, PHASH_DUP_POOL

    ph = values_sql(
        synth.make_pagestore(PHASH_DUP_N, seed=42, image_pool=PHASH_DUP_POOL).select(
            ["image_id", "phash"]
        )
    )
    sql["exact_phash_dups"] = (
        "WITH meta AS (" + ph + ") "
        "SELECT phash, count(*) AS n_copies, min(image_id) AS canonical_id "
        "FROM meta GROUP BY phash HAVING count(*) > 1"
    )

    # aspect_buckets: same fixture metadata, same integer-exact
    # distortion ranked in real SQL over a buckets VALUES table
    from ..ops.multimodal import ASPECT_BUCKETS

    bucket_rows = ", ".join(
        f"({i}, {a}, {b}, '{a}:{b}')" for i, (a, b) in enumerate(ASPECT_BUCKETS)
    )
    dims = values_sql(
        synth.make_pagestore(IMG_FILTER_N, seed=42).select(["image_id", "w", "h"])
    )
    sql["aspect_buckets"] = (
        "WITH meta AS (" + dims + "), "
        f"bk(idx, bw, bh, label) AS (VALUES {bucket_rows}), "
        "ranked AS (SELECT image_id, w, h, label, row_number() OVER ("
        "PARTITION BY image_id ORDER BY "
        "greatest(w * bh, h * bw) * 1.0 / least(w * bh, h * bw), idx) AS rn "
        "FROM meta CROSS JOIN bk) "
        "SELECT image_id, w, h, label AS bucket FROM ranked WHERE rn = 1"
    )

    # langid: the marker-vote heuristic in real SQL over documents
    def marker_count(lang: str) -> str:
        ms = LANG_MARKERS[lang]
        if lang == "zh":
            pat = "|".join(ms)
        else:
            pat = r"\b(" + "|".join(ms) + r")\b"
        return rf"len(regexp_extract_all(lower(text), '{pat}')) AS {lang}"

    langs = list(LANG_MARKERS)
    counts = ", ".join(marker_count(lang) for lang in langs)
    g = "greatest(" + ", ".join(langs) + ")"
    n_at_max = " + ".join(f"CAST({lang} = g AS INTEGER)" for lang in langs)
    pick = " ".join(f"WHEN {lang} = g THEN '{lang}'" for lang in langs)
    sql["langid"] = (
        f"WITH c AS (SELECT doc_id, {counts} FROM documents), "
        f"m AS (SELECT *, {g} AS g FROM c) "
        f"SELECT doc_id, CASE WHEN g = 0 OR ({n_at_max}) > 1 THEN 'und' "
        f"{pick} END AS lang_pred FROM m"
    )
    sql["langid_confusion"] = (
        f"WITH pred AS ({sql['langid']}) "
        "SELECT d.lang, pred.lang_pred, count(*) AS n "
        "FROM pred JOIN documents d USING (doc_id) GROUP BY d.lang, pred.lang_pred"
    )
    return sql


def expected_jsonl_ingest() -> pa.Table:
    """Independent recompute of the jsonl_ingest aggregate from the
    same deterministic record generator — never touches the .gz file
    or Ray, so the query's read→aggregate path is what's under test."""
    from collections import defaultdict

    from ..fixtures.synth import make_jsonl_docs

    n: dict = defaultdict(int)
    s: dict = defaultdict(int)
    for r in make_jsonl_docs():
        n[r["kind"]] += 1
        s[r["kind"]] += r["n_tokens"]
    kinds = sorted(n)
    return pa.table(
        {
            "kind": pa.array(kinds, pa.string()),
            "n_records": pa.array([n[k] for k in kinds], pa.int64()),
            "sum_tokens": pa.array([s[k] for k in kinds], pa.int64()),
        }
    )


def expected_augment_images() -> pa.Table:
    """Sequential replica of q_augment_images: same content-stable
    hash decisions, explicit flip/crop loops on independently decoded
    pixels, per-pixel integer sums."""
    from ..fixtures import codec
    from ..ops.multimodal import _stable_id64
    from .queries import AUG_N

    t = synth.make_pagestore(AUG_N, seed=42)
    rows = []
    for iid, buf, fmt in zip(
        t["image_id"].to_pylist(), t["bytes"].to_pylist(), t["fmt"].to_pylist()
    ):
        h64 = int(synth._splitmix64(np.array([_stable_id64(iid)], np.uint64))[0])
        flip = bool(h64 & 1)
        crop = ((h64 >> 1) & 3) * 2
        px = codec.decode(buf, fmt)
        if flip:
            px = px[:, ::-1]
        if crop and px.shape[0] > 2 * crop + 8 and px.shape[1] > 2 * crop + 8:
            px = px[crop:-crop, crop:-crop]
        # lossy formats round-trip through the codec exactly like the
        # stage (encode→decode is idempotent on already-quantized px)
        px2 = codec.decode(codec.encode(np.ascontiguousarray(px), fmt), fmt)
        luma = 0
        for y in range(px2.shape[0]):
            row = px2[y]
            for x in range(px2.shape[1]):
                luma += int(row[x][0]) + int(row[x][1]) + int(row[x][2])
        rows.append(
            {
                "image_id": iid,
                "aug_flip": flip,
                "aug_crop": crop,
                "w": px2.shape[1],
                "h": px2.shape[0],
                "luma_sum": luma,
            }
        )
    tbl = pa.Table.from_pylist(rows)
    for c in ("aug_crop", "w", "h"):
        tbl = tbl.set_column(
            tbl.column_names.index(c), c,
            pa.array([r[c] for r in rows], pa.int32()),
        )
    return tbl


def expected_curate_audio() -> pa.Table:
    """Sequential replica of q_curate_audio_corpus: stdlib-wave decode,
    identical integer admission predicates, shared envelope-hash
    kernel, keep-min-audio_id-per-hash dict dedup."""
    import io
    import wave as wavmod

    from ..ops.multimodal import audio_envelope_hash64
    from .queries import AUDIO_DUP_EVERY, AUDIO_DUP_N

    t = synth.make_audiostore(AUDIO_DUP_N, seed=42, dup_every=AUDIO_DUP_EVERY)
    best: dict = {}
    for aid, buf in zip(t["audio_id"].to_pylist(), t["bytes"].to_pylist()):
        with wavmod.open(io.BytesIO(buf)) as w:
            rate = w.getframerate()
            pcm = w.readframes(w.getnframes())
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.int16)
        n = len(samples)
        if n == 0:
            continue
        d_us = n * 1_000_000 // rate
        s_sq = 0
        for s in samples.tolist():
            s_sq += s * s
        if d_us < 40_000:
            continue
        if s_sq * 1_000_000 < n * 1_500_000 * 1_500_000:
            continue
        h = audio_envelope_hash64(samples)
        row = {"audio_id": aid, "n_samples": n, "duration_us": d_us,
               "sum_sq": s_sq, "ahash": h}
        if h not in best or aid < best[h]["audio_id"]:
            best[h] = row
    return pa.Table.from_pylist(sorted(best.values(), key=lambda r: r["audio_id"]))


def expected_curate_video() -> pa.Table:
    """Sequential replica of q_curate_video_corpus: explicit struct
    walk, per-pixel SAD loops, same integer gates, keep-min dict."""
    import struct as structmod

    from ..fixtures import codec
    from .queries import SCENE_CUT_MILLI, VIDEO_CUT_EVERY, VIDEO_CUT_N

    t = synth.make_videostore(VIDEO_CUT_N, seed=42, cut_every=VIDEO_CUT_EVERY)
    best: dict = {}
    for vid, buf in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
        _fps, fmt_code, n_frames = structmod.unpack("<HBI", buf[4:11])
        fmt = {0: "png", 1: "jpeg"}[fmt_code]
        if n_frames < 8:
            continue
        pos = 11
        frames = []
        for _f in range(n_frames):
            (length,) = structmod.unpack("<I", buf[pos : pos + 4])
            frames.append(codec.decode(buf[pos + 4 : pos + 4 + length], fmt))
            pos += 4 + length
        h_, w_ = frames[0].shape[0], frames[0].shape[1]
        full = h_ * w_ * 3 * 255
        n_cuts = 0
        for a, b in zip(frames, frames[1:]):
            sad = 0
            for y in range(h_):
                ra, rb = a[y], b[y]
                for x in range(w_):
                    sad += (
                        abs(int(ra[x][0]) - int(rb[x][0]))
                        + abs(int(ra[x][1]) - int(rb[x][1]))
                        + abs(int(ra[x][2]) - int(rb[x][2]))
                    )
            if sad * 1000 // full >= SCENE_CUT_MILLI:
                n_cuts += 1
        if n_cuts * 1000 > (n_frames - 1) * 400:
            continue
        ph = codec.phash64(frames[0])
        row = {"video_id": vid, "n_frames": n_frames, "n_cuts": n_cuts,
               "first_phash": ph}
        if ph not in best or vid < best[ph]["video_id"]:
            best[ph] = row
    tbl = pa.Table.from_pylist(sorted(best.values(), key=lambda r: r["video_id"]))
    return tbl.set_column(
        tbl.column_names.index("n_frames"), "n_frames",
        pa.array([r["n_frames"] for r in sorted(best.values(), key=lambda r: r["video_id"])], pa.int32()),
    )


def expected_video_near_dup() -> pa.Table:
    """Sequential all-pairs replica of q_video_near_dup: independent
    struct walk to frame 0, shared phash kernel, NO banding."""
    import struct as structmod

    from ..fixtures import codec
    from .queries import VIDEO_DUP_N

    t = synth.make_videostore(VIDEO_DUP_N, seed=42)
    ids, hs = [], []
    for vid, buf in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
        _fps, fmt_code, _n = structmod.unpack("<HBI", buf[4:11])
        fmt = {0: "png", 1: "jpeg"}[fmt_code]
        (length,) = structmod.unpack("<I", buf[11:15])
        px = codec.decode(buf[15 : 15 + length], fmt)
        ids.append(int(vid[3:]))
        hs.append(np.uint64(np.int64(codec.phash64(px))))
    h = np.array(hs, dtype=np.uint64)
    pairs: set[tuple[int, int]] = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            if int(H.hamming_distance64(h[x : x + 1], h[y : y + 1])[0]) <= 1:
                pairs.add((min(ids[x], ids[y]), max(ids[x], ids[y])))
    return _pairs_table(pairs)
