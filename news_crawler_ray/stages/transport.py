"""Injectable fetch transport: real keyed GETs behind the fetch seam.

The reference's fetch tier is a live HTTP client — a cloudscraper
session built once and reused across requests, per-request timeouts,
and skip-on-error per feed (/root/reference/src/secbot/fetchers/
news.py:85-124, asec.py:56-61). The engine's default fetch is a keyed
page-store lookup (sandbox-mandated; stages/fetch.py), which left the
deployment story — "swap the store lookup for an HTTP session" —
asserted but never exercised. This module makes the seam real:

* :class:`HTTPTransport` — a persistent-connection HTTP client
  (one ``http.client.HTTPConnection`` per netloc, the session analog)
  with per-request timeouts. Built ONCE per fetch actor in
  ``__init__`` (T1), used per batch in ``__call__``.
* :class:`HTTPFetcher` — the actor-pool fetch stage over any
  transport: per-URL GETs in scheduled order, bounded retry with
  backoff on retryable statuses/socket errors (T5), WALL-CLOCK
  politeness via the shared :class:`~.ratelimit.RateLimiter` token
  buckets (one token per request attempt, budget per TRUE host), and
  row-level ``fetch_status`` errors — a dead host yields
  ``error:*`` rows, never a dead job.
* :func:`payload_to_body` / :func:`body_to_payload` — the wire codec:
  one page-store payload row as an Arrow IPC stream body, so the
  HTTP crawl's output schema is IDENTICAL to the store-lookup crawl's
  (tests assert exact fetched-order + seen-set parity between the two).

The loopback server that serves a synthetic page-store over this wire
format (with injectable 429/timeout/5xx faults) lives in
``news_crawler_ray.testing.httpstore``.

Status mapping (row-level, reference news.py:136-138 semantics):
200 → ``ok``; 404/410 → ``missing`` (byte-identical to a store miss);
retryable (429, 5xx, socket/timeout errors) retried with exponential
backoff, exhausted → ``error:http_<code>`` / ``error:timeout``; any
other status → ``error:http_<code>`` immediately.
"""

from __future__ import annotations

import http.client
import time
from typing import NamedTuple
from urllib.parse import urlsplit

import pyarrow as pa

from .fetch import PAYLOAD_COLS, PAYLOAD_SCHEMA, add_image_id

# statuses worth a retry: rate-limit + transient server errors
RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})
MISSING_STATUSES = frozenset({404, 410})
# transport-level errors surfaced as pseudo-statuses
_STATUS_SOCKET_ERROR = -1
_STATUS_REDIRECT_LOOP = -2


REDIRECT_STATUSES = frozenset({301, 302, 303, 307, 308})


class TransportResponse(NamedTuple):
    status: int
    body: bytes | None
    # Location header on 3xx; Retry-After seconds on 429/503 (None when
    # absent); ETag on 200s — the response headers a polite, efficient
    # crawler acts on
    location: "str | None" = None
    retry_after_s: "float | None" = None
    etag: "str | None" = None


def payload_to_body(row: pa.Table) -> bytes:
    """One payload row (PAYLOAD_SCHEMA columns) → Arrow IPC stream
    bytes — the loopback wire format. Shared by server and client so
    schema drift breaks loudly at decode, not silently downstream."""
    row = pa.table({f.name: row[f.name].cast(f.type) for f in PAYLOAD_SCHEMA})
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, row.schema) as w:
        w.write_table(row)
    return sink.getvalue().to_pybytes()


def body_to_payload(body: bytes) -> pa.Table:
    """Arrow IPC stream bytes → payload table (PAYLOAD_SCHEMA order)."""
    t = pa.ipc.open_stream(body).read_all()
    return pa.table({f.name: t[f.name].cast(f.type) for f in PAYLOAD_SCHEMA})


def _null_payload_row() -> pa.Table:
    return pa.table({f.name: pa.nulls(1, f.type) for f in PAYLOAD_SCHEMA})


class HTTPTransport:
    """Persistent-connection HTTP GET client (stdlib ``http.client``).

    One connection per netloc, kept alive across requests — the
    reference's single cloudscraper session generalized per host. A
    request failure closes and discards that host's connection so the
    next attempt reconnects cleanly (half-open sockets after a server
    restart otherwise poison every later request). Raises ``OSError`` /
    ``http.client.HTTPException`` on transport failures — the CALLER
    owns retry policy; this layer owns sockets only.
    """

    def __init__(self, timeout_s: float = 5.0):
        self.timeout_s = timeout_s
        self._conns: dict[str, http.client.HTTPConnection] = {}

    def get(
        self, url: str, headers: "dict[str, str] | None" = None
    ) -> TransportResponse:
        parts = urlsplit(url)
        # key by scheme too: the same netloc may be reached over both
        # in redirect chains, and the two need different socket types
        netloc = f"{parts.scheme}://{parts.netloc}"
        conn = self._conns.get(netloc)
        if conn is None:
            if parts.scheme == "https":
                conn = http.client.HTTPSConnection(
                    parts.hostname, parts.port or 443, timeout=self.timeout_s
                )
            else:
                conn = http.client.HTTPConnection(
                    parts.hostname, parts.port or 80, timeout=self.timeout_s
                )
            # disable Nagle: pipelined small request writes otherwise
            # serialize on the peer's delayed ACK (~40 ms per request)
            import socket as _socket

            conn.connect()
            conn.sock.setsockopt(
                _socket.IPPROTO_TCP, _socket.TCP_NODELAY, 1
            )
            self._conns[netloc] = conn
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        try:
            hdrs = {"Accept-Encoding": "gzip"}
            hdrs.update(headers or {})
            conn.request("GET", path, headers=hdrs)
            resp = conn.getresponse()
            body = resp.read()
            if body and resp.getheader("Content-Encoding") == "gzip":
                import gzip as _gzip

                # wire bandwidth saver (IPC payload bodies compress
                # ~2-4x); a corrupt stream falls through to the caller
                # as a bad body, not a dead transport
                try:
                    body = _gzip.decompress(body)
                except OSError:
                    pass
            ra = resp.getheader("Retry-After")
            try:
                ra_s = float(ra) if ra is not None else None
            except ValueError:
                ra_s = None  # HTTP-date form: treat as absent
            return TransportResponse(
                resp.status,
                body,
                resp.getheader("Location"),
                ra_s,
                resp.getheader("ETag"),
            )
        except Exception:
            conn.close()
            self._conns.pop(netloc, None)
            raise

    def close(self) -> None:
        for c in self._conns.values():
            c.close()
        self._conns.clear()


class StoreTransport:
    """Default transport: keyed lookup into an in-memory page-store
    table, speaking the SAME (status, body) wire contract as
    :class:`HTTPTransport` — 200 + IPC body on hit, 404 on miss. Lets
    :class:`HTTPFetcher` run store-backed with zero HTTP (useful for
    differential tests of the fetcher itself)."""

    def __init__(self, store: pa.Table):
        import pyarrow.compute as pc

        self._pc = pc
        self.store = store.combine_chunks()
        self.ids = self.store["image_id"].combine_chunks()

    def get(
        self, url: str, headers: "dict[str, str] | None" = None
    ) -> TransportResponse:
        import hashlib

        image_id = url.rsplit("/", 1)[-1]
        pos = self._pc.index_in(
            pa.array([image_id]), value_set=self.ids
        )[0].as_py()
        if pos is None:
            return TransportResponse(404, None)
        body = payload_to_body(self.store.slice(pos, 1))
        etag = '"' + hashlib.md5(body).hexdigest() + '"'
        inm = (headers or {}).get("If-None-Match")
        if inm is not None and inm == etag:
            return TransportResponse(304, None, None, None, etag)
        return TransportResponse(200, body, None, None, etag)

    def close(self) -> None:  # symmetry with HTTPTransport
        pass


class HTTPFetcher:
    """Actor-pool fetch stage over an injectable transport.

    ``__init__`` (once per actor): build the transport session and the
    RateLimiter handle from the shared token-bucket actor handles.
    ``__call__`` (per batch): sequential keyed GETs in batch order —
    the batch arrives in scheduled (``fetch_at_us``) order and network
    fetch is IO-bound; intra-actor parallelism would reorder requests
    under the politeness schedule. Concurrency comes from the pool.

    ``base_url`` routing: when set, a row's request URL is
    ``{base_url}/{host}{path}`` — the single loopback server plays
    every logical host, and per-host politeness stays meaningful
    because budgets key on the ROW's host column, not the socket
    endpoint. When ``base_url`` is None the row's own URL is requested
    directly (real deployment).
    """

    def __init__(
        self,
        base_url: str | None = None,
        timeout_s: float = 5.0,
        attempts: int = 3,
        initial_delay_s: float = 0.05,
        backoff: float = 2.0,
        limiter_shards: list | None = None,
        rate_per_s: float = 8.0,
        burst: float = 1.0,
        transport_factory=None,
        max_redirects: int = 5,
        max_retry_after_s: float = 30.0,
        prior_etags=None,
        emit_etag: bool = False,
    ):
        from .ratelimit import RateLimiter

        self.base_url = base_url.rstrip("/") if base_url else None
        self.attempts = attempts
        self.initial_delay_s = initial_delay_s
        self.backoff = backoff
        self.max_redirects = max_redirects
        self.max_retry_after_s = max_retry_after_s
        # recrawl economics: a url→etag map from a PRIOR crawl (plain
        # dict, or an ObjectRef broadcast once via ray.put — resolved
        # here, once per actor) makes every request conditional; an
        # unchanged page answers 304 with no payload bytes on the wire
        # (fetch_status="not_modified" — the prior content is already
        # durable). emit_etag=True appends an `etag` output column so
        # THIS crawl's output can seed the NEXT crawl's map.
        if prior_etags is not None and not isinstance(prior_etags, dict):
            import ray as _ray

            prior_etags = _ray.get(prior_etags)
        self.prior_etags: "dict[str, str] | None" = prior_etags
        self.emit_etag = emit_etag
        self.transport = (
            transport_factory() if transport_factory is not None
            else HTTPTransport(timeout_s=timeout_s)
        )
        self.limiter = (
            RateLimiter(
                shards=limiter_shards, rate_per_s=rate_per_s, burst=burst
            )
            if limiter_shards
            else None
        )

    def _request_url(self, url: str, host: str) -> str:
        if self.base_url is None:
            return url
        path = urlsplit(url).path or "/"
        return f"{self.base_url}/{host}{path}"

    def _logical_host(self, url: str, fallback: str) -> str:
        """Politeness host of a request URL: in base_url (loopback/
        proxy) mode the logical host is the first path segment — the
        socket endpoint is always the proxy and must not be the budget
        key; in direct mode it is the URL's own hostname."""
        if self.base_url is None:
            return urlsplit(url).hostname or fallback
        segs = [s for s in urlsplit(url).path.split("/") if s]
        return segs[0] if len(segs) >= 3 else fallback

    def _get_following(
        self, url: str, host: str, etag: "str | None" = None
    ) -> TransportResponse:
        """One GET, following up to ``max_redirects`` 3xx hops (what the
        reference's requests session does implicitly). Every hop draws a
        politeness token against the hop's OWN logical host — a
        cross-host redirect spends the target's budget, not the
        referrer's. A Location cycle or hop overrun returns the
        redirect-loop pseudo-status (row-level error downstream)."""
        from urllib.parse import urljoin

        seen: set[str] = set()
        for hop in range(self.max_redirects + 1):
            if self.limiter is not None:
                self.limiter.wait_turn(host)
            # conditional only on the FIRST hop: a redirect target is a
            # different resource than the one the etag described
            hdrs = (
                {"If-None-Match": etag} if (etag and hop == 0) else None
            )
            try:
                resp = self.transport.get(url, headers=hdrs)
            except (OSError, http.client.HTTPException):
                return TransportResponse(_STATUS_SOCKET_ERROR, None)
            if resp.status in REDIRECT_STATUSES and resp.location:
                target = urljoin(url, resp.location)
                if target == url or target in seen:
                    return TransportResponse(_STATUS_REDIRECT_LOOP, None)
                seen.add(url)
                url = target
                host = self._logical_host(target, host)
                continue
            return resp
        return TransportResponse(_STATUS_REDIRECT_LOOP, None)

    def _get_with_retry(
        self, url: str, host: str, etag: "str | None" = None
    ) -> TransportResponse:
        """Bounded retry (T5: reference utils/retry.py policy — here it
        guards a REAL socket). Every attempt draws a politeness token
        first (inside ``_get_following``): a retry is a request too, and
        hammering a 429ing host faster than its budget defeats the point
        of the 429. A server-sent ``Retry-After`` (capped at
        ``max_retry_after_s``) overrides our own backoff when longer."""
        delay = self.initial_delay_s
        resp = TransportResponse(_STATUS_SOCKET_ERROR, None)
        for attempt in range(self.attempts):
            resp = self._get_following(url, host, etag=etag)
            if (
                resp.status not in (_STATUS_SOCKET_ERROR,)
                and resp.status not in RETRYABLE_STATUSES
            ):
                return resp
            if attempt < self.attempts - 1:
                wait = delay
                if resp.retry_after_s is not None:
                    wait = max(
                        wait, min(resp.retry_after_s, self.max_retry_after_s)
                    )
                time.sleep(wait)
                delay *= self.backoff
        return resp

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "image_id" not in batch.column_names:
            batch = add_image_id(batch)
        rows: list[pa.Table] = []
        statuses: list[str] = []
        etags: list[str | None] = []
        for url, host in zip(
            batch["url"].to_pylist(), batch["host"].to_pylist()
        ):
            prior = (
                self.prior_etags.get(url)
                if self.prior_etags is not None
                else None
            )
            resp = self._get_with_retry(
                self._request_url(url, host), host, etag=prior
            )
            etags.append(resp.etag if resp.etag else prior)
            if resp.status == 200 and resp.body is not None:
                try:
                    rows.append(body_to_payload(resp.body))
                    statuses.append("ok")
                    continue
                except pa.ArrowInvalid:
                    rows.append(_null_payload_row())
                    statuses.append("error:bad_body")
                    continue
            rows.append(_null_payload_row())
            if resp.status == 304:
                # unchanged since the prior crawl: no payload crossed
                # the wire; the prior content is already durable
                statuses.append("not_modified")
            elif resp.status in MISSING_STATUSES:
                statuses.append("missing")
            elif resp.status == _STATUS_SOCKET_ERROR:
                statuses.append("error:timeout")
            elif resp.status == _STATUS_REDIRECT_LOOP:
                statuses.append("error:redirect_loop")
            else:
                statuses.append(f"error:http_{resp.status}")
        cols = dict(zip(batch.column_names, batch.columns))
        if rows:
            payload = pa.concat_tables(rows).combine_chunks()
            for name in PAYLOAD_COLS:
                cols[name] = payload[name]
        else:
            for f in PAYLOAD_SCHEMA:
                cols[f.name] = pa.array([], f.type)
        cols["fetch_status"] = pa.array(statuses, pa.string())
        if self.emit_etag:
            cols["etag"] = pa.array(etags, pa.string())
        return pa.table(cols)


def fetch_http(
    wave_ds: "ray.data.Dataset",
    base_url: str | None,
    limiter_shards: list | None = None,
    rate_per_s: float = 8.0,
    burst: float = 1.0,
    timeout_s: float = 5.0,
    attempts: int = 3,
    concurrency: int | tuple = (1, 8),
    batch_size: int = 256,
    num_cpus: float | None = None,
    prior_etags=None,
    emit_etag: bool = False,
) -> "ray.data.Dataset":
    """HTTP fetch over the scheduled wave — the live-transport analog
    of ``fetch_broadcast``/``fetch_sharded`` with an identical output
    schema. Fetch actors are IO-bound (sockets, not CPU), so the pool
    can oversubscribe CPUs; politeness budgets are enforced wall-clock
    by the shared token-bucket shards regardless of pool width."""
    return wave_ds.map_batches(
        HTTPFetcher,
        fn_constructor_kwargs=dict(
            base_url=base_url,
            timeout_s=timeout_s,
            attempts=attempts,
            limiter_shards=limiter_shards,
            rate_per_s=rate_per_s,
            burst=burst,
            # recrawl mode: ray.put the url→etag map once; every actor
            # resolves the ref zero-copy in __init__
            prior_etags=prior_etags,
            emit_etag=emit_etag,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
