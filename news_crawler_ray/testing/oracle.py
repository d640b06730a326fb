"""Pure-Python sequential crawl oracle.

Reimplements the engine's crawl semantics the way the reference does it —
one process, plain loops, a ``set`` for the seen-keys
(/root/reference/src/secbot/scheduler.py:39-89) — so conformance tests
can assert that the distributed pipeline produces the SAME crawl order
and SAME final seen-set at any parallelism level (north rule).

No Ray, no Arrow batching: the point is an independent implementation.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from urllib.parse import unquote, urlsplit


def canonicalize_url(url: str) -> str:
    """Must agree with news_crawler_ray.functions.urlnorm exactly."""
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


@dataclass
class OracleResult:
    crawl_order: list[list[str]] = field(default_factory=list)  # per wave, urls in order
    seen_keys: set[bytes] = field(default_factory=set)
    fetched: list[dict] = field(default_factory=list)

    @property
    def flat_order(self) -> list[str]:
        return [u for wave in self.crawl_order for u in wave]


def crawl_oracle(
    seed_rows: list[dict],
    pagestore_rows: list[dict],
    robots_rows: list[dict],
    max_waves: int = 3,
    default_delay_ms: int = 1000,
    decay: float = 0.5,
) -> OracleResult:
    """Sequential crawl over plain dicts. Row fields follow FRONTIER_SCHEMA."""
    store = {r["image_id"]: r for r in pagestore_rows}
    robots = {
        r["host"]: (tuple(r["disallow_prefixes"] or ()), int(r["crawl_delay_ms"]))
        for r in robots_rows
    }
    res = OracleResult()
    candidates = [dict(r) for r in seed_rows]

    for _wave in range(max_waves):
        if not candidates:
            break
        # canonicalize + within-wave dedup: best = (-priority, discovered_at, url)
        best: dict[bytes, dict] = {}
        for r in candidates:
            canon = canonicalize_url(r["url"])
            key = hashlib.sha1(canon.encode()).digest()
            row = dict(r, url=canon, url_sha1=key)
            row["host"] = canon.split("://", 1)[1].split("/", 1)[0]
            cand_rank = (-row["priority"], row["discovered_at"], row["url"])
            if key not in best or cand_rank < (
                -best[key]["priority"],
                best[key]["discovered_at"],
                best[key]["url"],
            ):
                best[key] = row
        # seen filter (exact, insert-on-schedule)
        fresh = []
        for key, row in best.items():
            if key not in res.seen_keys:
                res.seen_keys.add(key)
                fresh.append(row)
        # robots filter + per-host politeness virtual clock
        allowed = []
        for row in fresh:
            prefixes, delay = robots.get(row["host"], ((), default_delay_ms))
            path = "/" + row["url"].split("://", 1)[1].split("/", 1)[1] if "/" in row["url"].split("://", 1)[1] else "/"
            if any(path.startswith(p) for p in prefixes):
                continue
            row["delay_ms"] = delay
            allowed.append(row)
        by_host: dict[str, list[dict]] = {}
        for row in allowed:
            by_host.setdefault(row["host"], []).append(row)
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (-r["priority"], r["url"]))
            for k, r in enumerate(rows):
                r["host_rank"] = k
                r["fetch_at_us"] = k * r["delay_ms"] * 1000
        ordered = sorted(allowed, key=lambda r: (r["fetch_at_us"], -r["priority"], r["url"]))
        res.crawl_order.append([r["url"] for r in ordered])
        # fetch + outlink expansion
        next_candidates: list[dict] = []
        for r in ordered:
            image_id = r["url"].rsplit("/p/", 1)[-1] if "/p/" in r["url"] else None
            page = store.get(image_id)
            if page is None:
                res.fetched.append(dict(r, fetch_status="missing"))
                continue
            res.fetched.append(dict(r, fetch_status="ok", caption=page["caption"]))
            for tok in (page["caption"] or "").split():
                if tok.startswith("link:"):
                    u = tok[len("link:"):]
                    next_candidates.append(
                        {
                            "url": u,
                            "host": u.split("://", 1)[1].split("/", 1)[0] if "://" in u else "",
                            "depth": (r.get("depth") or 0) + 1,
                            "discovered_at": r["discovered_at"],
                            "priority": (r["priority"] or 1.0) * decay,
                        }
                    )
        candidates = next_candidates
    return res
