"""Counting Bloom filter over 20-byte SHA-1 keys, numpy-vectorized.

Prefilter for the seen-set shards (SURVEY.md §2.3 T2): at 10^10 keys a
per-partition Python ``set`` lookup for every candidate is the hot path;
the counting bloom answers "definitely not seen" for the common case of
fresh URLs without touching the exact set, and supports deletes (counting,
not bit) so frontier eviction/day-window expiry can remove keys.

Keys are already uniform SHA-1 digests, so the k probe positions come
from double hashing the digest's two 8-byte halves (Kirsch–Mitzenmacher):
``pos_i = (h1 + i*h2) mod m`` — no extra hashing work per key.
"""

from __future__ import annotations

import numpy as np


def _halves(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """keys: (n, 20) uint8 → two uint64 hash values per key."""
    h1 = keys[:, 0:8].copy().view(np.uint64).reshape(-1)
    h2 = keys[:, 8:16].copy().view(np.uint64).reshape(-1)
    return h1, h2 | np.uint64(1)  # odd step so probes cycle the table


def keys_to_matrix(keys: list[bytes]) -> np.ndarray:
    return np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, 20)


class CountingBloom:
    """uint8 counters (saturating at 255), k probes, capacity-sized."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        # m = -n ln p / (ln 2)^2 ; k = (m/n) ln 2
        n = max(16, capacity)
        m = int(-n * np.log(fp_rate) / (np.log(2) ** 2))
        self.m = np.uint64(max(64, m))
        self.k = max(1, int(round(m / n * np.log(2))))
        self.counters = np.zeros(int(self.m), dtype=np.uint8)
        self.n_items = 0

    def _positions(self, km: np.ndarray) -> np.ndarray:
        h1, h2 = _halves(km)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % self.m  # (k, n)

    def add(self, km: np.ndarray) -> None:
        pos = self._positions(km)
        for row in pos:  # k rows; each is a vectorized counter bump
            vals = self.counters[row]
            np.add.at(self.counters, row[vals < 255], 1)
        self.n_items += km.shape[0]

    def remove(self, km: np.ndarray) -> None:
        pos = self._positions(km)
        for row in pos:
            vals = self.counters[row]
            np.subtract.at(self.counters, row[(vals > 0) & (vals < 255)], 1)
        self.n_items = max(0, self.n_items - km.shape[0])

    def maybe_contains(self, km: np.ndarray) -> np.ndarray:
        """(n,) bool — False is definite, True needs the exact check."""
        pos = self._positions(km)
        out = np.ones(km.shape[0], dtype=bool)
        for row in pos:
            out &= self.counters[row] > 0
        return out
