"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_brute_force` — exact cosine top-k: the query matrix is
  broadcast ONCE via ``ray.put``; each ``map_batches`` actor computes a
  (batch × queries) matmul and emits only its local top-k rows (partial
  top-k); the global top-k comes from one vectorized combiner merge of
  the O(num_queries × k × num_blocks)-bounded partials — no shuffle
  touches the corpus.
* :func:`knn_ivf` — the scale path: k-means-style coarse quantizer
  (trained on a sample, broadcast) assigns each vector to a centroid
  list; queries probe only the ``nprobe`` nearest lists. At 100 TB this
  turns a full scan into a ~nprobe/nlist fraction scan with the same
  map_batches shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _as_matrix(col: pa.ChunkedArray | pa.Array, n: int) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr.flatten(), dtype=np.float64).reshape(n, -1)


def _normalize(V: np.ndarray) -> np.ndarray:
    return V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)


class BruteForceScorer:
    """Cosine top-k against the broadcast queries.

    Runs as plain TASKS, not an actor pool: the only per-worker "state"
    is ``ray.get`` of the plasma-broadcast query matrix, which is a
    zero-copy read — while a ``map_batches(Cls, concurrency=...)`` pool
    pays a measured ~0.9 s spin-up PER CALL on this host (vs 0.05 s for
    the identical task plan). An actor pool earns its startup only when
    ``__init__`` does real work (model load, index build — see the
    multimodal stages); a ref deref does not."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str, exclude_self: bool):
        q = ray.get(queries_ref)  # dict: {"ids": (Q,), "matrix": (Q, d)}
        self.q_ids = np.asarray(q["ids"], dtype=np.int64)
        self.Q = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k, self.vec_col, self.id_col = k, vec_col, id_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _pairs_schema_table()
        V = _normalize(_as_matrix(batch[self.vec_col], n))
        ids = np.asarray(batch[self.id_col], dtype=np.int64)
        S = self.Q @ V.T  # (Q, n)
        if self.exclude_self:
            S[self.q_ids[:, None] == ids[None, :]] = -np.inf
        k = min(self.k, n)
        top = np.argpartition(-S, k - 1, axis=1)[:, :k]  # (Q, k) unordered
        rows_q = np.repeat(np.arange(len(self.q_ids)), k)
        rows_v = top.ravel()
        scores = S[rows_q, rows_v]
        fin = np.isfinite(scores)
        return pa.table(
            {
                "query_id": pa.array(self.q_ids[rows_q][fin], pa.int64()),
                "neighbor_id": pa.array(ids[rows_v][fin], pa.int64()),
                "score": pa.array(scores[fin], pa.float64()),
            }
        )


def _pairs_schema_table() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )


def knn_brute_force(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    concurrency: int | tuple = (1, 4),
):
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, score) — k rows per query, ties
    broken by smaller neighbor_id (deterministic at any parallelism).
    Scoring runs as plain tasks (see BruteForceScorer's pool note);
    ``concurrency`` is kept for API compatibility and ignored — tasks
    need no pool sizing and cannot deadlock chained plans the way
    minimum-actor pools could on a 4-CPU host.
    """
    ref = ray.put({"ids": np.asarray(query_ids), "matrix": np.asarray(query_matrix)})

    def score(batch: pa.Table) -> pa.Table:
        return BruteForceScorer(ref, k, vec_col, id_col, exclude_self)(batch)

    partial = ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_partial_topk(partial, k)


def _merge_partial_topk(partial, k: int):
    """Final top-k merge of per-block partials WITHOUT a shuffle.

    Partials are bounded at O(num_blocks × Q × k) rows by construction
    (each block emits at most k rows per query), so this is a combiner
    merge, not a dataset materialization: concat the partial blocks,
    one vectorized sort by (query_id, score desc, neighbor_id), take
    the first k of each query run. Deterministic at any parallelism."""
    tbls = [t for t in ray.get(partial.materialize().to_arrow_refs()) if t.num_rows]
    if not tbls:
        return partial.limit(0)
    tbl = pa.concat_tables(tbls)
    if tbl.num_rows > 5_000_000:
        raise ValueError(
            f"knn merge: {tbl.num_rows} partial rows — blocks*Q*k exceeds "
            "the combiner budget; reduce Q per call or raise the bound"
        )
    s = tbl.sort_by(
        [("query_id", "ascending"), ("score", "descending"), ("neighbor_id", "ascending")]
    )
    qids = s["query_id"].combine_chunks()
    n = len(qids)
    neq = pc.not_equal(qids.slice(1), qids.slice(0, n - 1)).to_numpy(
        zero_copy_only=False
    )
    starts = np.concatenate([[0], np.nonzero(neq)[0] + 1])
    run_ids = np.concatenate([[0], np.cumsum(neq)])
    rank_in_run = np.arange(n, dtype=np.int64) - starts[run_ids]
    out = s.filter(pa.array(rank_in_run < k))
    return ray.data.from_arrow(out)


# ----------------------------------------------------------- k-means


def _kmeans_partial(V: np.ndarray, C: np.ndarray):
    """Per-block Lloyd partial: (counts, per-cluster coordinate sums).

    Pure and shared with the sequential conformance oracle
    (pipelines/expected.expected_kmeans): both sides run THIS kernel over
    the same block plan and reduce in block order, so the distributed
    result is bit-identical to the sequential one (float summation order
    is part of the contract).
    """
    assign = np.argmax(V @ C.T, axis=1)
    k, d = C.shape
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    sums = np.zeros((k, d), dtype=np.float64)
    np.add.at(sums, assign, V)  # unbuffered: accumulates in row order
    return assign, counts, sums


def _kmeans_step(C: np.ndarray, counts: np.ndarray, sums: np.ndarray) -> np.ndarray:
    """New normalized centroids; empty clusters keep their old centroid."""
    C2 = C.copy()
    nz = counts > 0
    C2[nz] = sums[nz] / counts[nz, None]
    return _normalize(C2)


def kmeans_fit(
    ds,
    init: np.ndarray,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd): each iteration is ONE
    streaming ``map_batches`` pass emitting a k×(d+1) partial per block
    (counts + coordinate sums), reduced on the driver (k·d floats — not
    data-scale), and the refreshed centroids are re-broadcast. The
    corpus never moves: no shuffle, driver traffic is O(k·d·blocks) per
    iteration. ``init`` is the caller's deterministic seed matrix (e.g.
    the corpus's first k vectors).

    At 10^10 rows the per-iteration cost is exactly one pass over the
    corpus; iterate on a hash-sampled subset (ops/sampling.hash_sample)
    when full-pass training is not worth it — assignment afterwards is
    :func:`kmeans_assign` on everything.
    """
    C = _normalize(np.asarray(init, dtype=np.float64))
    k, d = C.shape

    def partial(batch: pa.Table, C_now: np.ndarray) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "block_min": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int32()),
                    "count": pa.array([], pa.int64()),
                    "psum": pa.array([], pa.list_(pa.float64())),
                }
            )
        V = _normalize(_as_matrix(batch[vec_col], n))
        _, counts, sums = _kmeans_partial(V, C_now)
        # block identity = the block's minimum row id: blocks partition
        # the rows, so mins are distinct, and sorting partials by
        # (block_min, cluster) fixes the reduce order NO MATTER what
        # completion order the streaming executor returns blocks in
        # (preserve_order is off in this engine's DataContext)
        bmin = int(pc.min(batch[id_col]).as_py())
        return pa.table(
            {
                "block_min": pa.array(np.full(k, bmin), pa.int64()),
                "cluster": pa.array(np.arange(k, dtype=np.int32)),
                "count": pa.array(counts, pa.int64()),
                "psum": pa.array(sums.tolist(), pa.list_(pa.float64())),
            }
        )

    for _ in range(iters):
        C_now = C
        rows = ds.map_batches(
            lambda b, C_now=C_now: partial(b, C_now),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,  # one partial per block
        ).take_all()
        rows.sort(key=lambda r: (r["block_min"], r["cluster"]))
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, d), dtype=np.float64)
        for r in rows:  # deterministic (block_min, cluster) order — the
            # sequential oracle reduces its slices sorted the same way
            c = r["cluster"]
            counts[c] += r["count"]
            sums[c] += np.asarray(r["psum"], dtype=np.float64)
        C = _kmeans_step(C, counts, sums)
    return C


def kmeans_assign(
    ds, centroids: np.ndarray, vec_col: str = "embedding", cluster_col: str = "cluster"
):
    """Append each row's nearest-centroid id (broadcast C, one pass)."""
    c_ref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(cluster_col, pa.array([], pa.int32()))
        C = ray.get(c_ref)
        V = _normalize(_as_matrix(batch[vec_col], n))
        a = np.argmax(V @ C.T, axis=1).astype(np.int32)
        return batch.append_column(cluster_col, pa.array(a, pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------- IVF


def train_centroids(sample: np.ndarray, nlist: int, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Plain k-means on a driver-side sample (Lloyd, fixed seed).

    The sample is small (e.g. 100k vectors) regardless of corpus size —
    training is a driver/single-node concern; assignment is distributed.
    """
    rng = np.random.default_rng(seed)
    X = _normalize(np.asarray(sample, dtype=np.float64))
    C = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


class IVFAssignStage:
    """Assign each vector to its nearest centroid list (broadcast C)."""

    def __init__(self, centroids_ref, vec_col: str):
        self.C = _normalize(np.asarray(ray.get(centroids_ref), dtype=np.float64))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("ivf_list", pa.array([], pa.int32()))
        V = _normalize(_as_matrix(batch[self.vec_col], n))
        assign = np.argmax(V @ self.C.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(assign, pa.int32()))


def knn_ivf(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
):
    """Approximate top-k: scan only the ``nprobe`` closest inverted lists.

    The corpus Dataset is filtered by list membership BEFORE scoring, so
    the matmul touches ~nprobe/nlist of the data. Centroids + queries are
    broadcast once. Recall depends on nprobe (exactness path:
    :func:`knn_brute_force`).
    """
    c_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        # tasks, not a pool: centroid deref is zero-copy (see
        # BruteForceScorer's pool note)
        return IVFAssignStage(c_ref, vec_col)(batch)

    assigned = ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
    Cn = _normalize(np.asarray(centroids, dtype=np.float64))
    Qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(Qn @ Cn.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    wanted = np.unique(probe.ravel()).astype(np.int32)
    wanted_set = pa.array(wanted, pa.int32())

    import pyarrow.compute as pc

    pruned = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_list"], value_set=wanted_set)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return knn_brute_force(
        pruned, query_ids, query_matrix, k=k, vec_col=vec_col,
        id_col=id_col, exclude_self=exclude_self,
    )


# ------------------------------------------------------------------ PCA


def pq_fit(
    ds,
    init: np.ndarray,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train the m per-subspace spherical codebooks for :func:`pq_encode`
    / :func:`pq_knn` — m streaming kmeans_fit passes over subvector
    views, no shuffle. Returns (m, k, d/m) float64."""
    if k > 16 or m > 16:
        raise ValueError("packed int64 codes need k <= 16 and m <= 16")
    init = np.asarray(init, dtype=np.float64)
    d = init.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m

    def slice_view(j: int):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {id_col: pa.array([], pa.int64()),
                     vec_col: pa.array([], pa.list_(pa.float64()))}
                )
            X = _as_matrix(t[vec_col], t.num_rows)[:, j * dsub : (j + 1) * dsub]
            return pa.table(
                {id_col: t[id_col],
                 vec_col: pa.array(X.tolist(), pa.list_(pa.float64()))}
            )

        return f

    codebooks = []
    for j in range(m):
        sub = ds.map_batches(
            slice_view(j), batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        codebooks.append(
            kmeans_fit(
                sub, init=init[:, j * dsub : (j + 1) * dsub], iters=iters,
                vec_col=vec_col, id_col=id_col,
            )
        )
    return np.stack(codebooks)


def pq_encode(
    ds,
    init: np.ndarray | None = None,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: np.ndarray | None = None,
):
    """Product quantization (Jégou, Douze & Schmid, TPAMI 2011) — the
    memory-compression step of billion-scale ANN: split each d-dim
    vector into ``m`` subvectors, train an independent ``k``-centroid
    spherical codebook per subspace with :func:`kmeans_fit` (the
    deterministic block-plan trainer, bit-reproducible by the
    sequential oracle), then encode every vector as m log2(k)-bit codes
    packed into ONE int64 (k ≤ 16 → 4 bits each, m ≤ 16). 64 float32
    dims (256 B) become 8 B per vector.

    Shape: m streaming training passes over subvector views (combiner
    partials, NO shuffle), then one broadcast-codebook assignment pass.
    ``init``: (k, d) raw corpus-head rows, like q_kmeans_clusters."""
    if codebooks is None:
        codebooks = pq_fit(
            ds, init, m=m, k=k, iters=iters, vec_col=vec_col, id_col=id_col
        )
    codebooks = np.asarray(codebooks, dtype=np.float64)
    cb_ref = ray.put(codebooks)
    dsub = codebooks.shape[2]
    m = codebooks.shape[0]

    def encode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "pq_code": pa.array([], pa.int64())}
            )
        C = ray.get(cb_ref)
        X = _as_matrix(t[vec_col], t.num_rows)
        code = np.zeros(t.num_rows, dtype=np.int64)
        for j in range(m):
            S = _normalize(X[:, j * dsub : (j + 1) * dsub])
            cj = np.argmax(S @ C[j].T, axis=1).astype(np.int64)
            code |= cj << (4 * j)
        return pa.table(
            {id_col: t[id_col], "pq_code": pa.array(code, pa.int64())}
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def pq_adc_lut(query_matrix: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """ADC lookup tables: LUT[q, j, c] = normalized query subvector j ·
    codebook[j][c]. Shared by the engine scan and the sequential
    oracle."""
    C = np.asarray(codebooks, dtype=np.float64)
    m, kc, dsub = C.shape
    Q = np.asarray(query_matrix, dtype=np.float64)
    lut = np.zeros((len(Q), m, kc), dtype=np.float64)
    for j in range(m):
        lut[:, j, :] = _normalize(Q[:, j * dsub : (j + 1) * dsub]) @ C[j].T
    return lut


def pq_adc_scores(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """(Q, n) ADC scores: per code, m nibble gathers summed in FIXED j
    order — layout-proof float sums. Shared engine/oracle kernel."""
    m = lut.shape[1]
    sub = (codes[:, None] >> (4 * np.arange(m, dtype=np.int64))[None, :]) & 0xF
    sc = np.zeros((lut.shape[0], len(codes)), dtype=np.float64)
    for j in range(m):
        sc += lut[:, j, sub[:, j]]
    return sc


def pq_knn(
    codes_ds,
    codebooks: np.ndarray,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    exclude_self: bool = True,
    id_col: str = "vec_id",
):
    """Approximate top-k search over PQ codes via asymmetric distance
    computation (Jégou et al. 2011): the scan reads 8-BYTE codes (not
    vectors) and scores each with m table gathers — the memory-bound
    path that makes billion-vector search fit a node. Broadcast LUT via
    ray.put; per-block partial top-k; the same combiner merge as
    knn_brute_force. Deterministic: fixed j-order float sums, ties
    (score desc, neighbor_id asc)."""
    lut = pq_adc_lut(query_matrix, codebooks)
    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64), "lut": lut})

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _pairs_schema_table()
        q = ray.get(ref)
        qids, lut_ = q["ids"], q["lut"]
        codes = np.asarray(t["pq_code"], dtype=np.int64)
        ids = np.asarray(t[id_col], dtype=np.int64)
        sc = pq_adc_scores(codes, lut_)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            row = sc[qi]
            if exclude_self:
                row = np.where(ids == qids[qi], -np.inf, row)
            order = np.lexsort((ids, -row))[:k]
            out_q.append(np.full(len(order), qids[qi], dtype=np.int64))
            out_n.append(ids[order])
            out_s.append(row[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partial = codes_ds.map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_partial_topk(partial, k)


def contrastive_negatives(
    ds,
    n_total: int,
    k_neg: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_scale: int = 1024,
):
    """Contrastive-training negative sampling over a dense-id embedding
    corpus (the pair-prep step of CLIP/SimCLR-style training): for each
    anchor, ``k_neg`` content-stable pseudo-random negatives via an
    integer map — ``neg = (id·2654435761 + (slot+1)·40503) mod n_total``
    with a +1 skip on self-collision — the very formula the SQL oracle
    evaluates, so the sample is exactly reproducible anywhere with no
    RNG state. Ids must be dense 0..n_total-1 (the export convention;
    re-key with stages/index.zip_with_index otherwise).

    Shape: each anchor row explodes to ``k_neg`` narrow rows carrying
    the anchor's QUANTIZED vector (floor(x·q+0.5) int64), then ONE
    neg_id-colocating sort-merge join gathers the negative's vector and
    a vectorized integer dot scores the pair — exact and layout-proof
    (a float dot depends on reduction order). Output
    (id, slot, neg_id, dot_q int64) with similarity dot_q/q²."""
    from .join import sort_merge_inner_join

    A, B = 2654435761, 40503
    qf = np.float64(q_scale)

    def quant(t: pa.Table) -> np.ndarray:
        X = _as_matrix(t[vec_col], t.num_rows)
        return np.floor(X * qf + 0.5).astype(np.int64)

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "slot": pa.array([], pa.int64()),
                    "neg_id": pa.array([], pa.int64()),
                    "qa": pa.array([], pa.list_(pa.int64())),
                }
            )
        ids = np.asarray(t[id_col], dtype=np.int64)
        rid = np.repeat(ids, k_neg)
        slot = np.tile(np.arange(k_neg, dtype=np.int64), t.num_rows)
        raw = (rid * A + (slot + 1) * B) % n_total
        neg = np.where(raw == rid, (raw + 1) % n_total, raw)
        qa = np.repeat(quant(t), k_neg, axis=0)
        return pa.table(
            {
                id_col: pa.array(rid, pa.int64()),
                "slot": pa.array(slot, pa.int64()),
                "neg_id": pa.array(neg, pa.int64()),
                "qa": pa.array(qa.tolist(), pa.list_(pa.int64())),
            }
        )

    def right(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "qb": pa.array([], pa.list_(pa.int64()))}
            )
        return pa.table(
            {id_col: t[id_col],
             "qb": pa.array(quant(t).tolist(), pa.list_(pa.int64()))}
        )

    pairs = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    negs = ds.map_batches(right, batch_format="pyarrow", zero_copy_batch=True)
    joined = sort_merge_inner_join(
        pairs, negs, "neg_id", [id_col, "slot", "qa"], ["qb"], right_key=id_col
    )

    def dot(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "qa" not in t.column_names:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "slot": pa.array([], pa.int64()),
                    "neg_id": pa.array([], pa.int64()),
                    "dot_q": pa.array([], pa.int64()),
                }
            )
        qa = np.asarray(
            t["qa"].combine_chunks().flatten(), dtype=np.int64
        ).reshape(t.num_rows, -1)
        qb = np.asarray(
            t["qb"].combine_chunks().flatten(), dtype=np.int64
        ).reshape(t.num_rows, -1)
        d = (qa * qb).sum(axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "slot": t["slot"],
                "neg_id": t["neg_id"],
                "dot_q": pa.array(d, pa.int64()),
            }
        )

    return joined.map_batches(dot, batch_format="pyarrow", zero_copy_batch=True)


def pca_fit(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    k: int = 4,
    scale_bits: int = 20,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Exact distributed PCA over an embedding column via an
    ORDER-INVARIANT integer combiner: each block quantizes its vectors
    to ``Q = rint(X·2^scale_bits)`` (quantization is part of the
    operator definition, like ops/agg.group_entropy) and emits the
    integer partials ``(n, ΣQ, QᵀQ)``; the driver merges them in
    arbitrary-precision Python ints, so the covariance matrix

        C = Gf/(N·2^(2·scale_bits)) − outer(m, m),  m = Sf/(N·2^scale_bits)

    is built from EXACT integers with one correctly-rounded cast each —
    bit-identical at any block layout — and ``np.linalg.eigh`` runs
    driver-side on the (d×d, config-scale) matrix. ONE streaming pass
    over the corpus, no shuffle; the d×d partial per block is the only
    thing that moves. Eigenvector signs are pinned (largest-|·| element
    positive). Per-block overflow is guarded loudly
    ((2^scale_bits·max|x|)²·rows ≤ 2⁶²).

    Returns (eigvals_desc[:k], components[k, d] rows=components,
    explained_variance_ratio[:k], n_rows).
    """
    scale = np.float64(1 << scale_bits)

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.int64())),
                    "g": pa.array([], pa.list_(pa.int64())),
                }
            )
        X = _as_matrix(t[vec_col], n)
        Qf = np.rint(X * scale)
        mq = float(np.abs(Qf).max())
        if mq * mq * n > float(1 << 62):
            raise ValueError(
                f"pca_fit: per-block Gram may overflow int64 "
                f"(max|q|={mq:.3g}, rows={n}); lower scale_bits or "
                "shrink the block size"
            )
        Q = Qf.astype(np.int64)
        g = Q.T @ Q  # (d, d) int64, exact under the guard
        s = Q.sum(axis=0)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([s.tolist()], pa.list_(pa.int64())),
                "g": pa.array([g.ravel().tolist()], pa.list_(pa.int64())),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not parts:
        raise ValueError("pca_fit: empty dataset")
    d = len(parts[0]["s"])
    N = 0
    S = [0] * d
    G = [0] * (d * d)
    for r in parts:  # arbitrary-precision, order-free integer merge
        N += r["n"]
        for i, v in enumerate(r["s"]):
            S[i] += v
        for i, v in enumerate(r["g"]):
            G[i] += v
    Sf = np.array([float(x) for x in S], dtype=np.float64)
    Gf = np.array([float(x) for x in G], dtype=np.float64).reshape(d, d)
    Nf = np.float64(N)
    m = Sf / (Nf * scale)
    C = Gf / (Nf * scale * scale) - np.outer(m, m)
    eigvals, eigvecs = np.linalg.eigh(C)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    vals = eigvals[order]
    comps = eigvecs[:, order].T  # (k, d)
    for i in range(comps.shape[0]):  # pin the sign convention
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ratio = vals / np.float64(np.trace(C))
    return vals, comps, ratio, N


def pca_transform(
    ds: "ray.data.Dataset",
    components: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "proj",
    scale_bits: int = 20,
) -> "ray.data.Dataset":
    """Project every vector onto fitted principal components (the apply
    half of :func:`pca_fit` — dimensionality reduction before ANN /
    clustering): the (k, d) component matrix broadcasts ONCE via
    ``ray.put``; both the vectors and the components are quantized to
    ints (rint(·2^scale_bits), pca_fit's convention) so the per-block
    matmul is EXACT INTEGER arithmetic — BLAS dgemm is measurably NOT
    row-slice deterministic in float64, an int matmul is, so the
    projection is bitwise layout-proof. Overflow is impossible under
    |x|,|c| ≤ 2^scale_bits·8 and d ≤ 2^(62-2·scale_bits-6). Output:
    (id, proj list<double>[k]) with proj = P_int/2^(2·scale_bits)."""
    Cq = np.rint(
        np.ascontiguousarray(components, dtype=np.float64)
        * np.float64(1 << scale_bits)
    ).astype(np.int64)
    comp_ref = ray.put(Cq)
    down = np.float64(1 << scale_bits) * np.float64(1 << scale_bits)

    def project(t: pa.Table) -> pa.Table:
        C = ray.get(comp_ref)
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: t[id_col],
                    out_col: pa.array([], pa.list_(pa.float64())),
                }
            )
        X = _as_matrix(t[vec_col], t.num_rows)
        Q = np.rint(X * np.float64(1 << scale_bits)).astype(np.int64)
        P = (Q @ C.T).astype(np.float64) / down
        return pa.table(
            {
                id_col: t[id_col],
                out_col: pa.array(P.tolist(), pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
