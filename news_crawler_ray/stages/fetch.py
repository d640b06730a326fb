"""Fetch stage: resolve scheduled URLs against the image+caption page-store.

The default "fetch" is a keyed lookup into the synthetic page-store
(SURVEY.md §2.1 S1/S4: the reference's cloudscraper/requests session
becomes a stateful lookup stage; the page-store stands in for the web).
Execution modes, chosen by page-store size/layout (``fetch_mode``):

* ``broadcast`` — page-store fits comfortably in the object store:
  ``ray.put`` the Arrow table once; each fetch actor builds an
  image_id -> row-index dict in ``__init__`` (once per actor, T1
  session analog) and serves batches zero-copy with ``Table.take``.
* sharded — the at-scale layout: the store is hash-partitioned on disk
  once (:func:`partition_pagestore`); waves co-locate NARROW frontier
  rows by shard and do per-shard keyed lookups (optionally fused with
  payload decode so bytes never enter the block stream).
* ``join`` — both sides large and unpartitioned: hash-partitioned
  ``Dataset.join`` on ``image_id`` (J3), left-outer so missing pages
  surface as ``fetch_status="missing"`` rows instead of failing the job
  (row-level error semantics, reference skips rows not jobs:
  news.py:136-138).
* ``http`` — live transport (stages/transport.py): real keyed GETs
  with per-host wall-clock politeness, same output schema.

Payload columns ride through as zero-copy Arrow ``binary``; nothing is
decoded here (except the opt-in fused fetch+decode kernel below).
"""

from __future__ import annotations

import numpy as np
import polars as pl  # module-level: lazy in-UDF imports race in fused
# parallel map threads (see ops/text.py note)
import pyarrow as pa
import pyarrow.compute as pc
import ray

_ID_RE = r"/p/(?P<image_id>[^/?#]+)$"

PAYLOAD_COLS = ["bytes", "w", "h", "fmt", "caption", "phash"]

PAYLOAD_SCHEMA = pa.schema(
    [
        ("bytes", pa.large_binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def broadcast_pagestore(store: pa.Table):
    """``ray.put`` the page-store for :class:`BroadcastFetcher` actors.

    Combines chunks first so all actors share one set of contiguous
    plasma buffers (fast ``take``) instead of each paying a combine copy.
    """
    return ray.put(store.combine_chunks())


def add_image_id(batch: pa.Table) -> pa.Table:
    """Derive the page-store key from the canonical URL path."""
    ids = pc.struct_field(pc.extract_regex(batch["url"], _ID_RE), "image_id")
    return batch.append_column("image_id", ids)


def _assemble_payload(
    cols: dict, payload: pa.Table, found: np.ndarray, num_rows: int
) -> pa.Table:
    """Attach gathered payload columns + fetch_status to ``cols``.

    Common case (every row found): reuse the payload columns zero-copy.
    Otherwise mask missing rows to null via if_else (the copy is paid
    only on batches that actually have misses).
    """
    if found.all():
        for name in PAYLOAD_COLS:
            cols[name] = payload[name]
        cols["fetch_status"] = pa.array(["ok"] * num_rows, pa.string())
        return pa.table(cols)
    mask = pa.array(found)
    for name in PAYLOAD_COLS:
        cols[name] = pc.if_else(
            mask,
            payload[name].combine_chunks(),
            pa.scalar(None, payload.schema.field(name).type),
        )
    cols["fetch_status"] = pc.if_else(mask, pa.scalar("ok"), pa.scalar("missing"))
    return pa.table(cols)


class BroadcastFetcher:
    """Actor-pool stage holding the broadcast page-store index."""

    def __init__(self, store_ref):
        store: pa.Table = ray.get(store_ref)  # plasma-shared, zero-copy
        # Table.take on chunked columns resolves chunks per index and is
        # ~100x slower than on contiguous arrays (measured 1.0s vs 8ms
        # per 4096-row batch on a 1.4GB store). The broadcaster combines
        # ONCE before ray.put (see broadcast_pagestore) so every actor
        # shares the contiguous buffers; combining here would copy the
        # store once per actor.
        if store["bytes"].num_chunks > 1:
            store = store.combine_chunks()
        self.store = store.select(PAYLOAD_COLS)
        self.ids = store["image_id"].combine_chunks()

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = add_image_id(batch)
        pos = pc.index_in(batch["image_id"].combine_chunks(), value_set=self.ids)
        rows = np.asarray(pc.fill_null(pos, -1), dtype=np.int64)
        found = rows >= 0
        payload = self.store.take(pa.array(np.where(found, rows, 0), pa.int64()))
        cols = dict(zip(batch.column_names, batch.columns))
        return _assemble_payload(cols, payload, found, batch.num_rows)


def fetch_broadcast(
    wave_ds: "ray.data.Dataset",
    store_ref,
    concurrency: int | tuple = 2,
    batch_size: int = 1024,
    num_cpus: float | None = None,
) -> "ray.data.Dataset":
    return wave_ds.map_batches(
        BroadcastFetcher,
        fn_constructor_kwargs={"store_ref": store_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def shard_of_image_id(ids: pa.Array | pa.ChunkedArray, num_shards: int) -> np.ndarray:
    """Deterministic store shard per image_id (stable across processes).

    Vectorized polars 64-bit hash — the SAME function partitions the
    store (prep) and routes fetch batches (query), which is the whole
    contract: one partitioning key, reused across stages.
    """
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    h = pl.from_arrow(ids).hash(seed=7).to_numpy()
    return (h % np.uint64(num_shards)).astype(np.int64)


STORE_MANIFEST = "store_manifest.json"

STORE_SCHEMA = pa.schema([("image_id", pa.string())] + list(PAYLOAD_SCHEMA))


def read_store_manifest(shard_dir: str) -> int:
    """Shard modulus of a partitioned store. The manifest is the source
    of truth (counting ``shard-*`` dirs breaks when a shard hashed empty:
    the inferred modulus would differ from partition time and every
    lookup would route wrong). Legacy dirs without a manifest fall back
    to the dir count."""
    import json
    import os

    p = os.path.join(shard_dir, STORE_MANIFEST)
    if os.path.exists(p):
        with open(p) as f:
            return int(json.load(f)["num_shards"])
    return len([d for d in os.listdir(shard_dir) if d.startswith("shard-")])


def partition_pagestore(
    pagestore_ds: "ray.data.Dataset", out_dir: str, num_shards: int = 32
) -> str:
    """One-time prep: hash-partition the page-store by image_id into
    ``out_dir/shard-{s}/``. At 100 TB the store lives like this on disk
    permanently; every crawl wave then ships only narrow frontier rows,
    never payload bytes (contrast: a Dataset.join re-shuffles the whole
    payload side per wave).

    Every shard dir is created (empty shards get an empty parquet) and
    ``num_shards`` is persisted in ``store_manifest.json`` so readers
    never have to infer the modulus from the directory listing.

    Idempotent: scatter tasks write uuid-named part files into a staging
    root that is wiped first and atomically published last — a re-run
    into the same ``out_dir`` (or a run killed mid-partition, e.g.
    before bench's ``_done`` marker lands) replaces the store instead of
    accumulating duplicate/stale rows beside the old part files.
    """
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    stage_root = out_dir.rstrip("/") + ".staging"
    shutil.rmtree(stage_root, ignore_errors=True)
    os.makedirs(stage_root, exist_ok=True)

    def scatter_block(t: pa.Table) -> pa.Table:
        # shuffle-free scatter: every input block writes its own rows
        # straight into per-shard part files (unique name per task), so
        # the multi-GB payload column never rides an all-to-all exchange
        # — readers pq.read_table the whole shard DIRECTORY, and keyed
        # lookup is order-independent, so multi-file shards are free
        import uuid

        shards = np.asarray(shard_of_image_id(t["image_id"], num_shards))
        order = np.argsort(shards, kind="stable")
        st = t.take(pa.array(order))
        ss = shards[order]
        starts = np.concatenate(
            [[0], np.nonzero(np.diff(ss))[0] + 1, [len(ss)]]
        ).astype(np.int64)
        fname = f"part-{uuid.uuid4().hex}.parquet"
        for i in range(len(starts) - 1):
            s = int(ss[starts[i]])
            d = os.path.join(stage_root, f"shard-{s}")
            os.makedirs(d, exist_ok=True)
            # plain-encoded, uncompressed: payload bytes are already
            # codec-compressed, and dictionary/zstd would make every
            # shard (re)load pay a full decode+expansion — measured as
            # the wave's dominant CPU. Uncompressed, a shard read is a
            # near-memcpy from the page cache.
            pq.write_table(
                st.slice(starts[i], starts[i + 1] - starts[i]),
                os.path.join(d, fname),
                row_group_size=100_000,
                compression="NONE",
                use_dictionary=False,
            )
        return pa.table({"written": pa.array([t.num_rows], pa.int64())})

    pagestore_ds.map_batches(
        scatter_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).count()
    for s in range(num_shards):
        d = os.path.join(stage_root, f"shard-{s}")
        if not os.path.isdir(d):
            os.makedirs(d, exist_ok=True)
            pq.write_table(STORE_SCHEMA.empty_table(), os.path.join(d, "part.parquet"))
    import uuid

    with open(os.path.join(stage_root, STORE_MANIFEST), "w") as f:
        # store_id: generation token — long-lived worker processes key
        # their shard-view caches on it, so rewriting a store at the
        # same path invalidates every cached view (see _store_token)
        json.dump({"num_shards": num_shards, "store_id": uuid.uuid4().hex}, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(stage_root, out_dir)  # atomic publish of the whole store
    return out_dir


@ray.remote(num_cpus=0.25)
def _load_shard(shard_dir: str, s: int) -> pa.Table:
    # fractional CPU: N full-CPU loads would occupy every scheduling slot
    # and starve the schedule sort they are meant to OVERLAP (measured:
    # 40.9 s vs 7.5 s schedule phase at 32 CPUs with/without staging
    # contention); the load is IO+memcpy, not compute
    import os

    import pyarrow.parquet as pq

    from ..functions.retry import with_retry

    path = os.path.join(shard_dir, f"shard-{s}")
    if not os.path.isdir(path):
        return STORE_SCHEMA.empty_table()
    read = with_retry(pq.read_table, attempts=3, initial_delay_s=0.05)
    return read(path).combine_chunks()


def stage_shards(shard_dir: str, num_shards: int) -> list:
    """Load every store shard into the shared object store ONCE (parallel
    remote reads, no driver serialization). Fetch actors then ``ray.get``
    shard tables zero-copy from plasma instead of each actor re-reading
    and re-materializing parquet — measured to be THE wave bottleneck
    (shard reloads cost ~30x the decode stage's CPU when pool actors see
    blocks from all over the key range). On a multi-node cluster the
    equivalent is per-node shard locality/page cache; here plasma IS the
    shared page cache.
    """
    return [_load_shard.remote(shard_dir, s) for s in range(num_shards)]


class ShardLookupFetcher:
    """Actor-pool stage for the sharded store: batches arrive co-located
    by ``_fetch_shard``; shard payloads come zero-copy from the object
    store (``shard_refs``, see :func:`stage_shards`) or, in the legacy
    disk mode, are read + LRU-cached per actor.
    """

    def __init__(
        self,
        shard_dir: str | None = None,
        shard_refs: list | None = None,
        max_cached: int = 4,
        read_attempts: int = 3,
    ):
        import collections

        import pyarrow.parquet as pq

        from ..functions.retry import with_retry

        self.shard_dir = shard_dir
        self.shard_refs = shard_refs
        self.cache: "collections.OrderedDict[int, tuple]" = collections.OrderedDict()
        # plasma-backed tables are shared memory: caching their (small)
        # column views costs nothing, so keep every shard's views
        self.max_cached = len(shard_refs) if shard_refs else max_cached
        # T5: transient shard-read failures are retried in-actor with
        # backoff (ref utils/retry.py:29-77 semantics) instead of
        # failing the batch; a persistent failure still raises.
        self._read = with_retry(
            pq.read_table, attempts=read_attempts, initial_delay_s=0.05
        )

    def _shard(self, s: int):
        import os

        hit = self.cache.get(s)
        if hit is not None:
            self.cache.move_to_end(s)
            return hit
        if self.shard_refs is not None:
            tbl = ray.get(self.shard_refs[s])  # zero-copy plasma view
        else:
            path = os.path.join(self.shard_dir, f"shard-{s}")
            if not os.path.isdir(path):
                # never-written shard (legacy layout without empty-shard
                # files): treat as empty so lookups yield "missing" rows
                # instead of crashing the actor
                tbl = STORE_SCHEMA.empty_table()
            else:
                tbl = self._read(path).combine_chunks()
        ids = tbl["image_id"].combine_chunks() if tbl.num_rows else tbl["image_id"]
        index = (ids, tbl.num_rows)
        self.cache[s] = (tbl.select(PAYLOAD_COLS), index)
        if len(self.cache) > self.max_cached:
            self.cache.popitem(last=False)
        return self.cache[s]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = dict(zip(batch.column_names, batch.columns))
            cols.pop("_fetch_shard", None)
            for f in PAYLOAD_SCHEMA:
                cols[f.name] = pa.array([], f.type)
            cols["fetch_status"] = pa.array([], pa.string())
            return pa.table(cols)
        shards = np.asarray(batch["_fetch_shard"], dtype=np.int64)
        batch_ids = batch["image_id"].combine_chunks()
        rows = np.empty(batch.num_rows, dtype=np.int64)
        stores: dict[int, pa.Table] = {}
        for s in np.unique(shards):
            tbl, (shard_ids, n_rows) = self._shard(int(s))
            stores[int(s)] = tbl
            sel = np.nonzero(shards == s)[0]
            # vectorized probe: position of each batch id in the shard's
            # id column (null → not present → -1)
            pos = pc.index_in(batch_ids.take(pa.array(sel)), value_set=shard_ids)
            rows[sel] = np.asarray(pc.fill_null(pos, -1), dtype=np.int64)
        found = rows >= 0
        # gather per shard, then re-interleave into batch order
        order = np.argsort(shards, kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        gathered = []
        for s in np.unique(shards):
            sel = order[shards[order] == s]
            tbl = stores[int(s)]
            if tbl.num_rows == 0:
                # legitimately-empty shard: all-null payload rows (the
                # placeholder index-0 trick needs ≥1 row to gather)
                gathered.append(
                    pa.table(
                        {f.name: pa.nulls(len(sel), f.type) for f in PAYLOAD_SCHEMA}
                    )
                )
                continue
            idx = pa.array(np.where(found[sel], rows[sel], 0), pa.int64())
            gathered.append(tbl.take(idx))
        payload = pa.concat_tables(gathered).combine_chunks()
        payload = payload.take(pa.array(inv, pa.int64()))
        cols = dict(zip(batch.column_names, batch.columns))
        cols.pop("_fetch_shard", None)
        return _assemble_payload(cols, payload, found, batch.num_rows)


def fetch_sharded(
    wave_ds: "ray.data.Dataset",
    shard_dir: str,
    num_shards: int = 32,
    concurrency: int | tuple = (1, 8),
    num_cpus: float | None = None,
    shard_refs: list | None = None,
) -> "ray.data.Dataset":
    """Keyed fetch against a hash-partitioned store: co-locate the
    NARROW wave rows by store shard, then per-shard keyed lookups.

    Co-location is a task-based range-partition SORT on
    ``_fetch_shard``: rows of a shard land mostly-adjacent, and because
    shards are written plain/uncompressed (see
    :func:`partition_pagestore`) an occasional extra shard (re)load is
    a near-memcpy, not a decompress+dictionary-expansion. Measured
    alternatives at 4 M rows: hash key-shuffle = exact one-read-per-
    shard alignment but a ~7 s fixed aggregator startup; compressed
    shards + sort = cache-thrash reloads at ~30x decode's CPU;
    plasma-staged shards = object-store spill.
    """

    def tag(t: pa.Table) -> pa.Table:
        t = add_image_id(t)
        return t.append_column(
            "_fetch_shard",
            pa.array(shard_of_image_id(t["image_id"], num_shards), pa.int64()),
        )

    keyed = wave_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    parts = keyed.sort("_fetch_shard")
    return parts.map_batches(
        ShardLookupFetcher,
        fn_constructor_kwargs={"shard_dir": shard_dir, "shard_refs": shard_refs},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,  # one batch per co-located partition
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


SMALL_PAYLOAD_COLS = ["w", "h", "fmt", "caption", "phash"]

# Per-WORKER-PROCESS shard-view cache for the fused task-form fetch+decode:
# Ray reuses worker processes, so views persist across tasks. Plasma-backed
# views are zero-copy (ray.get of a staged shard); disk views are LRU-capped.
_worker_shard_cache = None


def _store_token(shard_dir: str | None, shard_refs: list | None) -> str:
    """Cache key component identifying the store GENERATION, not just its
    path: worker processes outlive pipelines, so ``(shard_dir, s)`` alone
    would serve stale shard views after a store rewrite at the same path,
    and two plasma-staged stores would collide on a constant token. Disk
    stores use the manifest's ``store_id`` (fallback: manifest mtime);
    plasma stores use the first shard ref's hex (unique per staging)."""
    if shard_refs is not None and len(shard_refs):
        return "plasma@" + shard_refs[0].hex()
    if shard_dir is None:
        return "plasma"
    import json
    import os

    p = os.path.join(shard_dir, STORE_MANIFEST)
    try:
        with open(p) as f:
            sid = json.load(f).get("store_id")
        if sid:
            return f"{shard_dir}@{sid}"
        return f"{shard_dir}@{os.stat(p).st_mtime_ns}"
    except OSError:
        return shard_dir


def _fused_shard_view(token, s, shard_refs, shard_dir, max_cached: int):
    global _worker_shard_cache
    import collections
    import os

    import pyarrow.parquet as pq

    if _worker_shard_cache is None:
        _worker_shard_cache = collections.OrderedDict()
    cache = _worker_shard_cache
    key = (token, int(s))
    hit = cache.get(key)
    if hit is not None:
        cache.move_to_end(key)
        return hit
    if shard_refs is not None:
        tbl = ray.get(shard_refs[int(s)])  # zero-copy plasma view
    else:
        path = os.path.join(shard_dir, f"shard-{int(s)}")
        if not os.path.isdir(path):
            tbl = STORE_SCHEMA.empty_table()
        else:
            from ..functions.retry import with_retry

            tbl = with_retry(pq.read_table, attempts=3, initial_delay_s=0.05)(
                path
            ).combine_chunks()
    ids = tbl["image_id"].combine_chunks() if tbl.num_rows else tbl["image_id"]
    cache[key] = (tbl, ids)
    cap = len(shard_refs) if shard_refs is not None else max_cached
    while len(cache) > cap:
        cache.popitem(last=False)
    return cache[key]


def fetch_decode_batch(
    batch: pa.Table,
    shard_dir: str | None = None,
    shard_refs: list | None = None,
    num_shards: int = 32,
    token: str = "store",
    max_cached: int = 8,
) -> pa.Table:
    """Fused fetch+decode kernel (task form): keyed lookup into the
    sharded store AND payload decode/verify in ONE UDF.

    The round-1 plan ran these as separate operators, which materialized
    every payload into the inter-operator block stream (~6 GB per 2 M-row
    wave through the object store) plus two full gather/reorder copies —
    measured at ~87 CPU-s against decode's 291 CPU-s (BASELINE.md round-2
    notes). Here payload ``bytes`` never enter the block stream: rows are
    probed per shard (vectorized ``pc.index_in``), bytes are taken
    shard-group-wise straight out of the (plasma-staged or page-cached)
    shard table, decoded, and only fixed-width features are emitted.
    Output is identical to ``fetch_sharded`` → ``decode_features_batch``.
    """
    from ..ops.multimodal import append_feature_columns, decode_feature_arrays

    if batch.num_rows == 0:
        base = batch.drop_columns(
            [c for c in ("_fetch_shard",) if c in batch.column_names]
        )
        cols = dict(zip(base.column_names, base.columns))
        if "image_id" not in cols:
            cols["image_id"] = pa.array([], pa.string())
        for f in PAYLOAD_SCHEMA:
            if f.name != "bytes":
                cols[f.name] = pa.array([], f.type)
        cols["fetch_status"] = pa.array([], pa.string())
        return append_feature_columns(
            pa.table(cols),
            np.zeros((0, 3)), np.zeros(0), np.zeros(0, np.int64), np.zeros(0, bool),
        )
    if "image_id" not in batch.column_names:
        batch = add_image_id(batch)
    if "_fetch_shard" in batch.column_names:
        shards = np.asarray(batch["_fetch_shard"], dtype=np.int64)
        batch = batch.drop_columns(["_fetch_shard"])
    else:
        shards = shard_of_image_id(batch["image_id"], num_shards)
    n = batch.num_rows
    batch_ids = batch["image_id"].combine_chunks()
    rows = np.empty(n, dtype=np.int64)
    mean_rgb = np.zeros((n, 3), dtype=np.float64)
    std_gray = np.zeros(n, dtype=np.float64)
    phash_chk = np.zeros(n, dtype=np.int64)
    ok = np.ones(n, dtype=bool)
    small_parts: list[pa.Table] = []
    order_parts: list[np.ndarray] = []
    for s in np.unique(shards):
        tbl, ids = _fused_shard_view(token, s, shard_refs, shard_dir, max_cached)
        sel = np.nonzero(shards == s)[0]
        if tbl.num_rows == 0:
            rows[sel] = -1
        else:
            pos = pc.index_in(batch_ids.take(pa.array(sel)), value_set=ids)
            rows[sel] = np.asarray(pc.fill_null(pos, -1), dtype=np.int64)
        fsel = sel[rows[sel] >= 0]
        if fsel.size:
            idx = pa.array(rows[fsel], pa.int64())
            # decode straight from the shard table's buffers; features are
            # scattered to absolute batch positions (no reorder pass)
            decode_feature_arrays(
                tbl["bytes"].take(idx).to_pylist(),
                tbl["fmt"].take(idx).to_pylist(),
                out=(mean_rgb, std_gray, phash_chk, ok),
                positions=fsel,
                n=n,
            )
        miss = sel[rows[sel] < 0]
        ok[miss] = False
        if tbl.num_rows == 0:
            small_parts.append(
                pa.table(
                    {c: pa.nulls(sel.size, PAYLOAD_SCHEMA.field(c).type)
                     for c in SMALL_PAYLOAD_COLS}
                )
            )
        else:
            small_parts.append(
                tbl.select(SMALL_PAYLOAD_COLS).take(
                    pa.array(np.where(rows[sel] >= 0, rows[sel], 0), pa.int64())
                )
            )
        order_parts.append(sel)
    order = np.concatenate(order_parts)
    small = pa.concat_tables(small_parts)
    if len(order_parts) > 1 or not np.array_equal(order, np.arange(n)):
        small = small.take(pa.array(np.argsort(order), pa.int64()))
    found = rows >= 0
    cols = dict(zip(batch.column_names, batch.columns))
    if found.all():
        for name in SMALL_PAYLOAD_COLS:
            cols[name] = small[name]
        cols["fetch_status"] = pa.array(["ok"] * n, pa.string())
    else:
        mask = pa.array(found)
        for name in SMALL_PAYLOAD_COLS:
            cols[name] = pc.if_else(
                mask,
                small[name].combine_chunks(),
                pa.scalar(None, PAYLOAD_SCHEMA.field(name).type),
            )
        cols["fetch_status"] = pc.if_else(mask, pa.scalar("ok"), pa.scalar("missing"))
    return append_feature_columns(pa.table(cols), mean_rgb, std_gray, phash_chk, ok)


def fetch_decode_sharded(
    wave_ds: "ray.data.Dataset",
    shard_dir: str,
    num_shards: int = 32,
    shard_refs: list | None = None,
    batch_size: int | None = None,
    colocate: bool | None = None,
) -> "ray.data.Dataset":
    """Fused fetch+decode over the hash-partitioned store.

    TASK-based (the per-worker shard-view cache is the only state): the
    streaming executor soaks up every idle CPU elastically instead of a
    fixed actor reservation, and the decode-dominant stage scales at the
    box's CPU ceiling.

    ``colocate`` (default: only when reading shards from disk) inserts a
    range-partition sort on ``_fetch_shard`` so each task touches ~1
    shard — needed when a shard view costs a parquet read. With
    plasma-staged ``shard_refs`` every worker sees every shard
    zero-copy, probing all shards per block-sized batch costs ~7 µs/row
    (measured), and skipping the sort removes both a barrier and the
    skew of range-partitioning a 32-value key (task times measured
    8-18 s across sorted partitions vs uniform block sizes without).
    """
    if colocate is None:
        colocate = shard_refs is None

    def tag(t: pa.Table) -> pa.Table:
        t = add_image_id(t)
        return t.append_column(
            "_fetch_shard",
            pa.array(shard_of_image_id(t["image_id"], num_shards), pa.int64()),
        )

    keyed = wave_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    parts = keyed.sort("_fetch_shard") if colocate else keyed
    return parts.map_batches(
        fetch_decode_batch,
        fn_kwargs=dict(
            shard_dir=shard_dir,
            shard_refs=shard_refs,
            num_shards=num_shards,
            token=_store_token(shard_dir, shard_refs),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def fetch_join(
    wave_ds: "ray.data.Dataset",
    pagestore_ds: "ray.data.Dataset",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Hash-join mode for page-stores too large to broadcast."""
    keyed = wave_ds.map_batches(add_image_id, batch_format="pyarrow", zero_copy_batch=True)
    joined = keyed.join(
        pagestore_ds,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("image_id",),
    )

    def status(t: pa.Table) -> pa.Table:
        ok = pc.is_valid(t["bytes"])
        return t.append_column(
            "fetch_status", pc.if_else(ok, pa.scalar("ok"), pa.scalar("missing"))
        )

    return joined.map_batches(status, batch_format="pyarrow", zero_copy_batch=True)
