"""Cuckoo filter (partial-key cuckoo hashing) over SHA-1 keys.

Second prefilter tier for the seen-set (north rule: counting-bloom +
cuckoo-filter URL-seen set; public design per "A Learned Cuckoo Filter
for Approximate Membership Queries..." SIGMOD 2023 — plain, not learned).
16-bit fingerprints, 4-way buckets, standard evict-loop insert.
Lookups are numpy-vectorized (the hot path); inserts loop per key (the
scheduled-URL path, far smaller than the candidate stream).
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 200


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0x5EED):
        n_buckets = 1
        while n_buckets * _SLOTS < capacity * 1.3:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)  # 0 = empty
        self.rng = np.random.default_rng(seed)
        self.n_items = 0

    # -- hashing ----------------------------------------------------------
    @staticmethod
    def _fp(km: np.ndarray) -> np.ndarray:
        """16-bit fingerprint from digest bytes 16:18, never 0."""
        fp = km[:, 16].astype(np.uint16) << np.uint16(8) | km[:, 17].astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)

    def _i1(self, km: np.ndarray) -> np.ndarray:
        h = km[:, 0:8].copy().view(np.uint64).reshape(-1)
        return h & self.mask

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # i2 = i1 xor hash(fp); splatter fp with a 64-bit odd constant
        h = fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)
        return (i ^ (h >> np.uint64(16))) & self.mask

    # -- ops --------------------------------------------------------------
    def insert(self, km: np.ndarray) -> int:
        """Insert keys; returns how many failed (table full)."""
        fps = self._fp(km)
        i1s = self._i1(km)
        fails = 0
        for fp, i1 in zip(fps, i1s):
            if not self._insert_one(np.uint16(fp), np.uint64(i1)):
                fails += 1
            else:
                self.n_items += 1
        return fails

    def _insert_one(self, fp: np.uint16, i1: np.uint64) -> bool:
        i2 = self._alt(np.array([i1]), np.array([fp]))[0]
        for i in (i1, i2):
            row = self.table[int(i)]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                return True
        i = int(i1) if self.rng.random() < 0.5 else int(i2)
        for _ in range(_MAX_KICKS):
            s = int(self.rng.integers(0, _SLOTS))
            fp, self.table[i, s] = self.table[i, s], fp
            i = int(self._alt(np.array([np.uint64(i)]), np.array([fp]))[0])
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                return True
        return False

    def maybe_contains(self, km: np.ndarray) -> np.ndarray:
        fps = self._fp(km)
        i1 = self._i1(km)
        i2 = self._alt(i1, fps)
        t1 = self.table[i1.astype(np.int64)]  # (n, SLOTS)
        t2 = self.table[i2.astype(np.int64)]
        f = fps[:, None]
        return ((t1 == f) | (t2 == f)).any(axis=1)

    def delete(self, km: np.ndarray) -> int:
        """Best-effort delete; returns count removed."""
        fps = self._fp(km)
        i1s = self._i1(km)
        i2s = self._alt(i1s, fps)
        removed = 0
        for fp, i1, i2 in zip(fps, i1s, i2s):
            done = False
            for i in (int(i1), int(i2)):
                row = self.table[i]
                hit = np.nonzero(row == fp)[0]
                if hit.size:
                    row[hit[0]] = 0
                    removed += 1
                    done = True
                    break
            if done:
                self.n_items -= 1
        return removed
