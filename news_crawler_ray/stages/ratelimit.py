"""Per-host politeness token buckets (stateful actors) — the wall-clock
enforcement path.

The engine's crawl ORDER is data (politeness.schedule's virtual clock:
``fetch_at_us`` ranks, conformance-checked against the oracle). When a
fetch stage talks to a real network, pacing must also happen in wall
time: these sharded token-bucket actors are that enforcement tier
(reference analog: the global ``time.sleep(1)`` between feed fetches,
/root/reference/src/secbot/fetchers/news.py:135, upgraded to per-host
budgets per the north rule).

Skew/salting contract: buckets are keyed by TRUE host. A hot host whose
queue is salted across many fetch tasks (``host#0``, ``host#1``...)
still draws from ONE bucket — the politeness budget is global per host
no matter how the work is partitioned (SURVEY.md §7 "hot-host skew").

Buckets are sharded across B actors by ``hash(host) % B`` so acquiring
tokens is never a single-actor bottleneck at cluster scale.
"""

from __future__ import annotations

import time
import zlib

import numpy as np
import ray


def true_host(salted: str) -> str:
    """Strip a ``#salt`` suffix: budget is per true host."""
    return salted.split("#", 1)[0]


def salt_hosts(hosts, num_salts: int, hot: set[str]):
    """Deterministic salting for hot hosts: ``host`` → ``host#k`` where k
    cycles per occurrence. Cold hosts pass through unchanged."""
    counters: dict[str, int] = {}
    out = []
    for h in hosts:
        if h in hot:
            k = counters.get(h, 0)
            counters[h] = k + 1
            out.append(f"{h}#{k % num_salts}")
        else:
            out.append(h)
    return out


@ray.remote(num_cpus=0)
class TokenBucketShard:
    """Token buckets for the hosts hashing to this shard.

    ``acquire(host, n, rate, burst)`` returns the wall-clock time (monotonic
    seconds) at which the caller may perform its n-th request — callers
    sleep locally, the actor never blocks, so one shard serves thousands
    of hosts without convoying.
    """

    def __init__(self):
        # host -> (tokens, last_refill_monotonic)
        self.buckets: dict[str, tuple[float, float]] = {}

    def acquire(self, host: str, n: int, rate_per_s: float, burst: float) -> float:
        """Reserve ``n`` tokens; returns the DELAY in seconds until the
        last of them becomes available (0 ⇒ go now). A relative delay —
        not a timestamp — so callers on other nodes (unsynchronized
        monotonic clocks) can simply sleep it."""
        host = true_host(host)
        now = time.monotonic()
        tokens, last = self.buckets.get(host, (burst, now))
        tokens = min(burst, tokens + (now - last) * rate_per_s)
        tokens -= n
        self.buckets[host] = (tokens, now)
        if tokens >= 0:
            return 0.0
        return (-tokens) / rate_per_s

    def state(self) -> dict:
        return {h: t for h, (t, _) in self.buckets.items()}


class RateLimiter:
    """Driver/worker-side handle to B TokenBucketShard actors.

    Use inside a fetch actor: ``limiter.wait_turn(host, n)`` before
    issuing n requests to ``host``. Construct once per process from the
    shared actor handles (pass them through ``fn_constructor_kwargs``).
    """

    def __init__(self, shards: list | None = None, num_shards: int = 4,
                 rate_per_s: float = 1.0, burst: float = 1.0):
        self.shards = shards or [TokenBucketShard.remote() for _ in range(num_shards)]
        self.rate, self.burst = rate_per_s, burst

    def _shard(self, host: str):
        return self.shards[zlib.crc32(true_host(host).encode()) % len(self.shards)]

    def reserve(self, host: str, n: int = 1) -> float:
        """Non-blocking: seconds until the reservation is usable (0 = now)."""
        return ray.get(self._shard(host).acquire.remote(host, n, self.rate, self.burst))

    def wait_turn(self, host: str, n: int = 1) -> float:
        """Blocking acquire; returns how long it slept."""
        delay = self.reserve(host, n)
        if delay > 0:
            time.sleep(delay)
        return delay


class PacedFetchWrapper:
    """Wrap a fetch ``map_batches`` callable with wall-clock pacing.

    For each batch, reserves tokens per host (vectorized count per host,
    ONE rpc per distinct host in the batch) and sleeps until the
    latest reservation is due, then delegates. Keeps schedule-order
    semantics untouched — this stage only converts the virtual clock
    into wall time when real fetching demands it.
    """

    def __init__(self, inner_factory, shards, rate_per_s: float = 10.0, burst: float = 10.0,
                 host_col: str = "host", **inner_kwargs):
        self.inner = inner_factory(**inner_kwargs)
        self.limiter = RateLimiter(shards=shards, rate_per_s=rate_per_s, burst=burst)
        self.host_col = host_col

    def __call__(self, batch):
        hosts = batch[self.host_col].to_pylist()
        uniq, counts = np.unique(np.array([true_host(h) for h in hosts]), return_counts=True)
        max_delay = 0.0
        for h, c in zip(uniq, counts):
            max_delay = max(max_delay, self.limiter.reserve(str(h), int(c)))
        if max_delay > 0:
            time.sleep(max_delay)
        return self.inner(batch)
