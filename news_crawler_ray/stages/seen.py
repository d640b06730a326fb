"""Sharded URL-seen set: counting-bloom + cuckoo prefilter, exact backing.

The reference keeps a daily seen-set of SHA-256 keys in a flat file and
rewrites it per run (/root/reference/src/secbot/scheduler.py:42-89). At
10^10 URLs that set cannot live in one process or be re-shuffled against
every candidate wave, so here it is P shard actors keyed by
``hash(url_sha1) % P``:

* approximate tier: counting bloom + cuckoo filter answer "definitely
  new" without touching the exact set (false-positive path falls through
  to the exact check, so final decisions are EXACT — the approximate
  structures are prefilters only, per SURVEY.md §7 step 4);
* exact tier: a per-shard key set, checkpointed to parquet
  (``seen_dir/part={i}/epoch-{e}.parquet``) so a killed run resumes with
  the same seen-set (reference analog: the day-scoped file).

At cluster scale each shard actor lives on some node and candidate
batches RPC only the shards their keys route to; no all-to-all shuffle
of the seen table per wave.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..functions import urlnorm
from ..state.bloom import CountingBloom, keys_to_matrix
from ..state.cuckoo import CuckooFilter


@ray.remote(num_cpus=0)
class SeenShard:
    # num_cpus=0: shards are memory-holding index actors serving O(batch)
    # set lookups; reserving CPU slots for them starves the map/task pools
    # that share the node (observed deadlock at num_cpus=4). At cluster
    # scale spread them with a placement strategy, not CPU reservations.
    """One partition of the seen-set. All methods take/return lists."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16, fp_rate: float = 0.01):
        self.shard_id = shard_id
        self.bloom = CountingBloom(capacity, fp_rate)
        self.cuckoo = CuckooFilter(capacity)
        # Exactness invariant: a prefilter may only say "definitely new"
        # if it contains EVERY key ever added. A cuckoo filter past
        # capacity drops inserts (evict-loop failure), so on the first
        # failed insert it is retired from the conjunction — the
        # counting bloom (saturating, never under-reports) + exact set
        # carry on. Retiring also skips the pathological O(MAX_KICKS)
        # insert loop that a saturated table hits on every key.
        self.cuckoo_live = True
        self.exact: set[bytes] = set()
        self.prefilter_hits = 0  # candidates short-circuited as definitely-new
        self.exact_checks = 0
        # net mutations since the last checkpoint: key -> "a" (added) or
        # "r" (removed), relative to the state AT the last checkpoint —
        # an add+remove of the same key inside one epoch cancels out.
        # Checkpoints write only this DELTA (O(epoch churn), not O(total
        # keys)) — at 10^10 keys a full rewrite per wave is the scale
        # killer; restore replays epoch deltas in order.
        self._net: dict[bytes, str] = {}

    def _note_add(self, k: bytes) -> None:
        if self._net.get(k) == "r":
            del self._net[k]  # present at last ckpt, removed, re-added: no-op
        else:
            self._net[k] = "a"

    def _note_remove(self, k: bytes) -> None:
        if self._net.get(k) == "a":
            del self._net[k]  # added this epoch, now gone: no-op
        else:
            self._net[k] = "r"

    def check_and_add(self, keys: list[bytes]) -> np.ndarray:
        """For each key: True if NEW (not seen); marks all keys seen."""
        if not keys:
            return np.zeros(0, dtype=bool)
        return self._check_and_add_matrix(keys_to_matrix(keys))

    def check_and_add_packed(self, blob: bytes) -> np.ndarray:
        """Packed form of :meth:`check_and_add`: ``blob`` is n
        concatenated 20-byte keys. One buffer crosses the RPC instead of
        a pickled list of n ``bytes`` objects — the list form measured
        as the seen stage's dominant cost at 2 M keys/wave."""
        km = np.frombuffer(blob, dtype=np.uint8).reshape(-1, 20)
        return self._check_and_add_matrix(km)

    def _check_and_add_matrix(self, km: np.ndarray) -> np.ndarray:
        maybe = self.bloom.maybe_contains(km)
        if self.cuckoo_live:
            maybe &= self.cuckoo.maybe_contains(km)
        is_new = ~maybe
        # only prefilter "maybe seen" rows fall through to the exact set
        unsure = np.flatnonzero(maybe)
        self.prefilter_hits += len(km) - unsure.size
        self.exact_checks += unsure.size
        for i in unsure:
            is_new[i] = km[i].tobytes() not in self.exact
        new_idx = np.nonzero(is_new)[0]
        if new_idx.size:
            newm = np.ascontiguousarray(km[new_idx])
            self.bloom.add(newm)
            if self.cuckoo_live and self.cuckoo.insert(newm) > 0:
                self.cuckoo_live = False
            flat = newm.tobytes()  # one C copy, then cheap slicing
            for j in range(new_idx.size):
                k = flat[j * 20 : (j + 1) * 20]
                self.exact.add(k)
                self._note_add(k)
        return is_new

    def contains(self, keys: list[bytes]) -> np.ndarray:
        if not keys:
            return np.zeros(0, dtype=bool)
        km = keys_to_matrix(keys)
        maybe = self.bloom.maybe_contains(km)
        if self.cuckoo_live:
            maybe &= self.cuckoo.maybe_contains(km)
        out = np.zeros(len(keys), dtype=bool)
        for i in np.nonzero(maybe)[0]:
            out[i] = keys[i] in self.exact
        return out

    def add(self, keys: list[bytes]) -> int:
        fresh = [k for k in keys if k not in self.exact]
        if fresh:
            km = keys_to_matrix(fresh)
            self.bloom.add(km)
            if self.cuckoo_live and self.cuckoo.insert(km) > 0:
                self.cuckoo_live = False
            self.exact.update(fresh)
            for k in fresh:
                self._note_add(k)
        return len(fresh)

    def remove(self, keys: list[bytes]) -> int:
        """Counting-bloom/cuckoo deletes (day-window expiry path).

        Keys are deduped first: a duplicated key would double-decrement
        bloom counters / double-delete a cuckoo fingerprint and could
        evict ANOTHER live key's entry, breaking the never-under-report
        prefilter invariant.
        """
        present = [k for k in dict.fromkeys(keys) if k in self.exact]
        if present:
            km = keys_to_matrix(present)
            self.bloom.remove(km)
            self.cuckoo.delete(km)
            self.exact.difference_update(present)
            for k in present:
                self._note_remove(k)
        return len(present)

    def size(self) -> int:
        return len(self.exact)

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "size": len(self.exact),
            "prefilter_hits": self.prefilter_hits,
            "exact_checks": self.exact_checks,
        }

    def checkpoint(self, seen_dir: str, epoch: int) -> str:
        """Write the DELTA since the last checkpoint (adds + removes),
        sorted for determinism. O(epoch churn), not O(total keys) — the
        only design that survives 10^10 cumulative keys with a
        checkpoint per wave. Idempotent per epoch (atomic overwrite)."""
        d = os.path.join(seen_dir, f"part={self.shard_id}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"epoch-{epoch:08d}.parquet")
        tmp = path + ".tmp"
        items = sorted(self._net.items())
        tbl = pa.table(
            {
                "url_sha1": pa.array([k for k, _ in items], pa.binary()),
                "op": pa.array([o for _, o in items], pa.string()),
            }
        )
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)  # atomic publish
        self._net = {}
        return path

    def restore(self, seen_dir: str, max_epoch: int | None = None) -> int:
        """Replay epoch deltas in order (up to ``max_epoch`` inclusive).

        Bounding by epoch matters for crash recovery: a run killed
        between the wave-w checkpoint (epoch w+1) and its manifest write
        leaves an orphan delta; replaying it would mark the about-to-be-
        re-run wave's URLs as seen and silently fetch nothing. The
        caller passes the manifest's completed epoch.
        """
        def _epoch_of(p: str) -> int:
            return int(os.path.basename(p)[len("epoch-") : -len(".parquet")])

        # numeric epoch order — lexicographic would misorder a mix of
        # zero-padded and legacy unpadded names (epoch-10 < epoch-2)
        paths = sorted(
            glob.glob(os.path.join(seen_dir, f"part={self.shard_id}", "epoch-*.parquet")),
            key=_epoch_of,
        )
        applied = 0
        for p in paths:
            if max_epoch is not None and _epoch_of(p) > max_epoch:
                continue
            t = pq.read_table(p)
            keys = t["url_sha1"].to_pylist()
            if "op" in t.column_names:
                ops = t["op"].to_pylist()
                adds = [k for k, o in zip(keys, ops) if o == "a"]
                rms = [k for k, o in zip(keys, ops) if o == "r"]
            else:
                # legacy full-snapshot file (pre-delta format): all adds
                adds, rms = keys, []
            applied += self.add(adds)
            if rms:
                self.remove(rms)
        # replayed state matches the checkpoint exactly; nothing pending
        self._net = {}
        return applied

    def keys(self) -> list[bytes]:
        """Full exact key list — test/conformance helper, small runs only."""
        return sorted(self.exact)


class SeenSet:
    """Driver-side handle to P SeenShard actors."""

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1 << 16):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(i, capacity=capacity_per_shard) for i in range(num_shards)
        ]

    def _route(self, keys: list[bytes]) -> list[list[int]]:
        by_shard: list[list[int]] = [[] for _ in range(self.num_shards)]
        if keys:
            shard_ids = urlnorm.shard_array(pa.array(keys, pa.binary()), self.num_shards)
            for i, s in enumerate(shard_ids):
                by_shard[int(s)].append(i)
        return by_shard

    def _scatter_gather(self, method: str, keys: list[bytes]) -> np.ndarray:
        by_shard = self._route(keys)
        futs, idxs = [], []
        for s, idx in enumerate(by_shard):
            if idx:
                futs.append(getattr(self.shards[s], method).remote([keys[i] for i in idx]))
                idxs.append(idx)
        out = np.zeros(len(keys), dtype=bool)
        for fut, idx in zip(futs, idxs):
            out[idx] = ray.get(fut)
        return out

    def check_and_add(self, keys: list[bytes]) -> np.ndarray:
        return self._scatter_gather("check_and_add", keys)

    def contains(self, keys: list[bytes]) -> np.ndarray:
        return self._scatter_gather("contains", keys)

    def add(self, keys: list[bytes]) -> None:
        by_shard = self._route(keys)
        ray.get(
            [
                self.shards[s].add.remote([keys[i] for i in idx])
                for s, idx in enumerate(by_shard)
                if idx
            ]
        )

    def remove(self, keys: list[bytes]) -> int:
        """Expire keys (day-window / frontier-eviction path): counting
        bloom decrements + cuckoo deletes + exact-set removal."""
        by_shard = self._route(keys)
        return sum(
            ray.get(
                [
                    self.shards[s].remove.remote([keys[i] for i in idx])
                    for s, idx in enumerate(by_shard)
                    if idx
                ]
            )
        )

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def all_keys(self) -> set[bytes]:
        """Test/conformance helper — materializes every shard. Small runs only."""
        keys: set[bytes] = set()
        for s in self.shards:
            keys.update(ray.get(s.keys.remote()))
        return keys

    def checkpoint(self, seen_dir: str, epoch: int) -> list[str]:
        return ray.get([s.checkpoint.remote(seen_dir, epoch) for s in self.shards])

    def restore(self, seen_dir: str, max_epoch: int | None = None) -> int:
        return sum(
            ray.get([s.restore.remote(seen_dir, max_epoch) for s in self.shards])
        )

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])


class SeenFilterStage:
    """``map_batches`` callable: drop rows whose ``url_sha1`` is already seen,
    marking survivors as seen (atomic check-and-add per shard).

    Constructed with the shard actor handles
    (``fn_constructor_kwargs={"shards": seen.shards}``) so every pool
    actor routes its batch's keys to the right shard — batch-level RPCs,
    no per-row calls, no shuffle of the seen table.
    """

    def __init__(self, shards: list):
        self.shards = shards
        self.num_shards = len(shards)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        km = urlnorm.binary20_matrix(batch["url_sha1"])
        shard_ids = urlnorm.shard_array(batch["url_sha1"], self.num_shards)
        futs, idxs = [], []
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if idx.size:
                # one packed buffer per shard RPC (vs a pickled list of
                # bytes objects — measured dominant at 2 M keys/wave)
                blob = np.ascontiguousarray(km[idx]).tobytes()
                futs.append(self.shards[s].check_and_add_packed.remote(blob))
                idxs.append(idx)
        keep = np.zeros(batch.num_rows, dtype=bool)
        for res, idx in zip(ray.get(futs), idxs):  # all shards in parallel
            keep[idx] = res
        return batch.filter(pa.array(keep))


def compact_checkpoints(
    seen_dir: str, shard_id: int, up_to_epoch: int | None = None
) -> int:
    """Fold a shard's epoch DELTA files into one consolidated delta at
    the highest epoch — bounding restore replay cost, which otherwise
    grows one file per wave forever (at 10^10 cumulative keys the
    replay chain, not the state, becomes the resume bottleneck).

    Crash-safe by idempotence: the consolidated file is written as the
    highest epoch (atomic tmp+rename) BEFORE the folded lower files are
    unlinked, and it carries an explicit op per key that ever appeared
    ('a' if net-present, 'r' if net-absent) — so a crash between the
    two steps leaves replay(old deltas + consolidated) ≡
    replay(consolidated): adds are set-idempotent and the explicit
    'r' rows cancel any replayed stale adds. Returns the number of
    files folded (0 = nothing to do)."""

    def _epoch_of(p: str) -> int:
        return int(os.path.basename(p)[len("epoch-") : -len(".parquet")])

    d = os.path.join(seen_dir, f"part={shard_id}")
    paths = sorted(glob.glob(os.path.join(d, "epoch-*.parquet")), key=_epoch_of)
    if up_to_epoch is not None:
        paths = [p for p in paths if _epoch_of(p) <= up_to_epoch]
    if len(paths) < 2:
        return 0
    net: dict = {}
    for p in paths:
        t = pq.read_table(p)
        keys = t["url_sha1"].to_pylist()
        ops = (
            t["op"].to_pylist()
            if "op" in t.column_names
            else ["a"] * len(keys)  # legacy full snapshot
        )
        for k, o in zip(keys, ops):
            net[k] = o
    items = sorted(net.items())
    tbl = pa.table(
        {
            "url_sha1": pa.array([k for k, _ in items], pa.binary()),
            "op": pa.array([o for _, o in items], pa.string()),
        }
    )
    top = paths[-1]
    tmp = top + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, top)  # atomic publish of the consolidated delta
    for p in paths[:-1]:
        os.unlink(p)
    return len(paths)


@ray.remote(num_cpus=0.25)
def compact_shard_task(seen_dir: str, shard_id: int, up_to_epoch: int | None) -> int:
    """Remote form of :func:`compact_checkpoints` — the wave loop folds
    all shards in parallel off the driver (fractional CPU: the fold is
    IO + a dict walk, and it overlaps the next wave's pipeline)."""
    return compact_checkpoints(seen_dir, shard_id, up_to_epoch)
