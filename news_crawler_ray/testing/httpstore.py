"""Loopback HTTP page-store server: the fetch seam's test double.

Serves a synthetic page-store table over real sockets in the wire
format ``stages.transport`` speaks (Arrow IPC payload rows), so a crawl
run with ``fetch_mode="http"`` against this server exercises the ENTIRE
live-transport path — persistent connections, timeouts, retries,
wall-clock politeness — and must reproduce the store-lookup crawl's
exact output (tests/test_transport.py asserts it).

URL layout: ``GET /{host}/p/{image_id}`` — one server plays every
logical host (the crawl's politeness budgets key on the path's host
segment, carried by the fetcher from the row's ``host`` column).

Fault injection (per image_id, counted down under a lock so retries
observe the fault exactly N times):

* ``{"status": 429, "times": 1}`` — respond 429 once, then serve
  normally (a retrying fetcher recovers to ``ok``).
* ``{"status": 503, "times": 10**9}`` — persistent server error
  (retry-exhausted → ``error:http_503`` row).
* ``{"sleep": 2.0, "times": 1}`` — hold the response longer than the
  client timeout (socket timeout → retry → ``error:timeout`` when
  persistent).
* ``{"redirect": "/hostB/p/other", "times": 1[, "status": 301]}`` —
  3xx + Location (the fetcher follows up to ``max_redirects`` hops;
  cycles become ``error:redirect_loop`` rows).
* ``{"status": 429, "retry_after": 0.5, "times": 1}`` — rate-limit
  with a Retry-After header the fetcher must honor before retrying.

Every handled request is appended to ``request_log`` as
``(monotonic_s, host, image_id)`` — the wall-clock politeness test
reads real per-host request timestamps from here.
"""

from __future__ import annotations

import http.server
import threading
import time

import pyarrow as pa
import pyarrow.compute as pc


class LoopbackStoreServer:
    """In-process ``ThreadingHTTPServer`` over a page-store table."""

    def __init__(
        self,
        store: pa.Table,
        faults: "dict[str, dict] | None" = None,
        host: str = "127.0.0.1",
        robots: "pa.Table | None" = None,
        sitemaps: "dict[str, str] | None" = None,
        feeds: "dict[str, str] | None" = None,
        gzip_payloads: bool = False,
    ):
        self.store = store.combine_chunks()
        self.ids = self.store["image_id"].combine_chunks()
        self._lock = threading.Lock()
        self.faults = {k: dict(v) for k, v in (faults or {}).items()}
        self.request_log: list[tuple[float, str, str]] = []
        # optional robots table → served as /{host}/robots.txt (absent
        # hosts 404, the allow-all path)
        self.robots: dict[str, tuple] = {}
        if robots is not None:
            for h, d, ms in zip(
                robots["host"].to_pylist(),
                robots["disallow_prefixes"].to_pylist(),
                robots["crawl_delay_ms"].to_pylist(),
            ):
                self.robots[h] = (list(d or []), ms)
        # optional {host: sitemap-xml} → served as /{host}/sitemap.xml
        self.sitemaps: dict[str, str] = dict(sitemaps or {})
        # optional {host: rss-xml} → served as /{host}/feed.xml
        self.feeds: dict[str, str] = dict(feeds or {})
        # gzip page payloads for clients advertising Accept-Encoding
        self.gzip_payloads = gzip_payloads
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            # keep-alive so HTTPTransport's persistent connections are real
            protocol_version = "HTTP/1.1"
            # headers and body go out as separate writes; without
            # TCP_NODELAY the second write stalls on the client's
            # delayed ACK (~40 ms/request — measured 23 req/s!)
            disable_nagle_algorithm = True

            def log_message(self, *a):  # silence default stderr spam
                pass

            def do_GET(self):
                outer._serve(self)

        self._httpd = http.server.ThreadingHTTPServer((host, 0), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    # ------------------------------------------------------------- lifecycle
    def start(self) -> str:
        self._thread.start()
        h, p = self._httpd.server_address[:2]
        return f"http://{h}:{p}"

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> str:
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # ------------------------------------------------------------- handling
    def _take_fault(self, image_id: str) -> "dict | None":
        with self._lock:
            f = self.faults.get(image_id)
            if not f or f.get("times", 0) <= 0:
                return None
            f["times"] -= 1
            return f

    def _serve(self, handler: http.server.BaseHTTPRequestHandler) -> None:
        from ..stages.transport import payload_to_body

        path = handler.path.split("?", 1)[0]
        parts = [p for p in path.split("/") if p]
        # /{host}/robots.txt — per-host politeness rules, rendered from
        # the robots table (hosts without an entry 404 = allow-all)
        if len(parts) == 2 and parts[1] == "robots.txt":
            from ..sources.robotstxt import render_robots_txt

            with self._lock:
                self.request_log.append(
                    (time.monotonic(), parts[0], "robots.txt")
                )
            entry = self.robots.get(parts[0])
            if entry is None:
                handler.send_response(404)
                handler.send_header("Content-Length", "0")
                handler.end_headers()
                return
            body = render_robots_txt(entry[0], entry[1]).encode()
            handler.send_response(200)
            handler.send_header("Content-Type", "text/plain")
            handler.send_header("Content-Length", str(len(body)))
            handler.end_headers()
            handler.wfile.write(body)
            return
        # /{host}/feed.xml — RSS source (absent hosts 404)
        if len(parts) == 2 and parts[1] == "feed.xml":
            with self._lock:
                self.request_log.append(
                    (time.monotonic(), parts[0], "feed.xml")
                )
            xml = self.feeds.get(parts[0])
            if xml is None:
                handler.send_response(404)
                handler.send_header("Content-Length", "0")
                handler.end_headers()
                return
            body = xml.encode()
            handler.send_response(200)
            handler.send_header("Content-Type", "application/rss+xml")
            handler.send_header("Content-Length", str(len(body)))
            handler.end_headers()
            handler.wfile.write(body)
            return
        # /{host}/sitemap.xml — seed discovery (absent hosts 404)
        if len(parts) == 2 and parts[1] == "sitemap.xml":
            with self._lock:
                self.request_log.append(
                    (time.monotonic(), parts[0], "sitemap.xml")
                )
            xml = self.sitemaps.get(parts[0])
            if xml is None:
                handler.send_response(404)
                handler.send_header("Content-Length", "0")
                handler.end_headers()
                return
            body = xml.encode()
            handler.send_response(200)
            handler.send_header("Content-Type", "application/xml")
            handler.send_header("Content-Length", str(len(body)))
            handler.end_headers()
            handler.wfile.write(body)
            return
        # /{host}/p/{image_id}  (also accepts bare /p/{image_id});
        # any other path is an unknown resource → 404, the same
        # row-level "missing" a store lookup yields for an unkeyable URL
        if len(parts) >= 2 and parts[-2] == "p":
            image_id = parts[-1]
            host = parts[0] if len(parts) >= 3 else ""
        else:
            handler.send_response(404)
            handler.send_header("Content-Length", "0")
            handler.end_headers()
            return
        with self._lock:
            self.request_log.append((time.monotonic(), host, image_id))
        fault = self._take_fault(image_id)
        if fault is not None:
            if "sleep" in fault:
                time.sleep(fault["sleep"])
                # fall through and answer normally: the CLIENT timed out;
                # a server that also errors would mask the timeout path
            elif "redirect" in fault:
                # {"redirect": "/hostB/p/other", "times": N[, "status": 301]}
                handler.send_response(int(fault.get("status", 301)))
                handler.send_header("Location", fault["redirect"])
                handler.send_header("Content-Length", "0")
                handler.end_headers()
                return
            elif "status" in fault:
                handler.send_response(int(fault["status"]))
                if "retry_after" in fault:
                    handler.send_header(
                        "Retry-After", str(fault["retry_after"])
                    )
                handler.send_header("Content-Length", "0")
                handler.end_headers()
                return
        pos = pc.index_in(pa.array([image_id]), value_set=self.ids)[0].as_py()
        if pos is None:
            handler.send_response(404)
            handler.send_header("Content-Length", "0")
            handler.end_headers()
            return
        body = payload_to_body(self.store.slice(pos, 1))
        import hashlib

        etag = '"' + hashlib.md5(body).hexdigest() + '"'
        if handler.headers.get("If-None-Match") == etag:
            # conditional GET: unchanged content, zero payload bytes
            handler.send_response(304)
            handler.send_header("ETag", etag)
            handler.send_header("Content-Length", "0")
            handler.end_headers()
            return
        handler.send_response(200)
        handler.send_header("Content-Type", "application/vnd.apache.arrow.stream")
        handler.send_header("ETag", etag)
        if self.gzip_payloads and "gzip" in (
            handler.headers.get("Accept-Encoding") or ""
        ):
            import gzip as _gzip

            body = _gzip.compress(body, 1)
            handler.send_header("Content-Encoding", "gzip")
        handler.send_header("Content-Length", str(len(body)))
        handler.end_headers()
        handler.wfile.write(body)
