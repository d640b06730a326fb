"""Live-transport fetch seam (stages/transport.py + testing/httpstore):

the one reference behavior (S1/T1 session fetch, news.py:85-124) whose
engine counterpart had never touched a socket. These tests drive the
HTTP path over a REAL in-process loopback server and assert:

1. the wire basics (persistent connections, IPC payload round-trip,
   404 semantics);
2. row-level error semantics under injected 429 / 5xx / timeout faults
   (T5: error rows, never a dead job);
3. wall-clock per-host politeness observed from the SERVER's request
   timestamps (the token buckets honoring budgets against real sockets);
4. a full crawl over the loopback transport reproducing the page-store
   crawl's exact fetched output and seen-set.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from news_crawler_ray.fixtures import synth
from news_crawler_ray.stages.transport import (
    HTTPFetcher,
    HTTPTransport,
    StoreTransport,
    body_to_payload,
)
from news_crawler_ray.testing.httpstore import LoopbackStoreServer


def _mini_batch(store: pa.Table, ids: list[str], host: str = "h0.example") -> pa.Table:
    return pa.table(
        {
            "url": pa.array([f"https://{host}/p/{i}" for i in ids], pa.string()),
            "host": pa.array([host] * len(ids), pa.string()),
        }
    )


def test_http_transport_roundtrip_and_reuse():
    store = synth.make_pagestore(8, seed=3)
    srv = LoopbackStoreServer(store)
    with srv as base:
        tr = HTTPTransport(timeout_s=5.0)
        iid = store["image_id"][0].as_py()
        resp = tr.get(f"{base}/h0.example/p/{iid}")
        assert resp.status == 200
        row = body_to_payload(resp.body)
        assert row["bytes"][0].as_py() == store["bytes"][0].as_py()
        assert row["caption"][0].as_py() == store["caption"][0].as_py()
        # unknown id → 404; unparseable path → 404 (store-miss analog)
        assert tr.get(f"{base}/h0.example/p/nope").status == 404
        assert tr.get(f"{base}/h0.example/robots.txt").status == 404
        # session reuse: many GETs, ONE connection per netloc
        for _ in range(5):
            assert tr.get(f"{base}/h0.example/p/{iid}").status == 200
        assert len(tr._conns) == 1
        tr.close()
    # 8 requests logged: 7 keyed page lookups + the robots.txt probe
    assert len(srv.request_log) == 8


def test_store_transport_same_wire_contract():
    store = synth.make_pagestore(6, seed=3)
    tr = StoreTransport(store)
    iid = store["image_id"][2].as_py()
    resp = tr.get(f"https://h/p/{iid}")
    assert resp.status == 200
    assert body_to_payload(resp.body)["phash"][0].as_py() == store["phash"][2].as_py()
    assert tr.get("https://h/p/absent").status == 404


def test_http_fetcher_fault_injection_row_level():
    """Injected faults become row-level fetch_status values: a one-shot
    429 recovers via retry; persistent 503 exhausts retries to an
    error row; a response held past the client timeout becomes
    error:timeout; 404 is byte-identical to a store miss."""
    store = synth.make_pagestore(6, seed=5)
    ids = store["image_id"].to_pylist()
    faults = {
        ids[1]: {"status": 429, "times": 1},       # recovers on retry
        ids[2]: {"status": 503, "times": 10**9},   # persistent error
        ids[3]: {"sleep": 1.2, "times": 10**9},    # client times out
    }
    srv = LoopbackStoreServer(store, faults=faults)
    with srv as base:
        f = HTTPFetcher(
            base_url=base, timeout_s=0.3, attempts=2, initial_delay_s=0.01
        )
        batch = _mini_batch(store, [ids[0], ids[1], ids[2], ids[3], "ghost"])
        out = f.__call__(batch)
        assert out["fetch_status"].to_pylist() == [
            "ok", "ok", "error:http_503", "error:timeout", "missing"
        ]
        # ok rows carry real payload; error rows carry nulls
        vals = out["bytes"].to_pylist()
        assert vals[0] == store["bytes"][0].as_py()
        assert vals[1] == store["bytes"][1].as_py()
        assert vals[2] is None and vals[3] is None and vals[4] is None
        # the 429 id was requested exactly twice (fault once, then ok)
        n_req_1 = sum(1 for _, _, i in srv.request_log if i == ids[1])
        assert n_req_1 == 2
        # the 503 id burned every attempt
        n_req_2 = sum(1 for _, _, i in srv.request_log if i == ids[2])
        assert n_req_2 == 2
        f.transport.close()


def test_http_politeness_wall_clock(ray_session):
    """The token buckets honor per-TRUE-host budgets against REAL
    request timestamps: with rate R and burst 1, the server must see
    consecutive same-host requests ≥ ~1/R apart, while a second host
    proceeds on its own budget (per-host, not global)."""
    from news_crawler_ray.stages.ratelimit import TokenBucketShard

    store = synth.make_pagestore(12, seed=9)
    ids = store["image_id"].to_pylist()
    rate = 25.0
    srv = LoopbackStoreServer(store)
    with srv as base:
        shards = [TokenBucketShard.remote() for _ in range(2)]
        f = HTTPFetcher(
            base_url=base,
            timeout_s=5.0,
            limiter_shards=shards,
            rate_per_s=rate,
            burst=1.0,
        )
        a = _mini_batch(store, ids[:5], host="ha.example")
        b = _mini_batch(store, ids[5:10], host="hb.example")
        out = f.__call__(pa.concat_tables([a, b]))
        assert out["fetch_status"].to_pylist() == ["ok"] * 10
        f.transport.close()
    by_host: dict[str, list[float]] = {}
    for ts, host, _ in srv.request_log:
        by_host.setdefault(host, []).append(ts)
    assert set(by_host) == {"ha.example", "hb.example"}
    min_gap = 1.0 / rate
    for host, times in by_host.items():
        gaps = np.diff(sorted(times))
        assert len(gaps) == 4
        # real sockets + sleep granularity: allow 20% tolerance under
        assert gaps.min() >= min_gap * 0.8, (host, gaps.tolist())


def test_http_crawl_matches_store_crawl(ray_session, tmp_path):
    """A 2-wave crawl over the loopback HTTP transport reproduces the
    broadcast page-store crawl EXACTLY: same fetched rows in the same
    (wave, crawl_rank) order with identical payload bytes and statuses,
    and an identical final seen-set — the deployment story ('swap the
    store lookup for an HTTP session') exercised, not asserted."""
    from news_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl

    store = synth.make_pagestore(220, seed=42)
    frontier = synth.make_frontier(160, seed=42)
    robots = synth.make_robots(seed=42)

    base_cfg = dict(max_waves=2, num_seen_shards=2, dedup_partitions=2)
    res_store = run_crawl(
        frontier, store, robots, str(tmp_path / "store_run"),
        config=CrawlConfig(**base_cfg),
    )

    srv = LoopbackStoreServer(store)
    with srv as base:
        res_http = run_crawl(
            frontier, None, robots, str(tmp_path / "http_run"),
            config=CrawlConfig(
                **base_cfg,
                fetch_mode="http",
                http_base_url=base,
                # politeness budget high enough not to slow the test;
                # wall-clock enforcement itself is asserted above
                http_rate_per_s=10_000.0,
                http_burst=64.0,
            ),
        )

    t_store = pq.read_table(os.path.join(res_store.out_dir, "fetched"))
    t_http = pq.read_table(os.path.join(res_http.out_dir, "fetched"))
    assert t_store.num_rows == t_http.num_rows > 0
    order = [("wave", "ascending"), ("crawl_rank", "ascending")]
    t_store = t_store.sort_by(order)
    t_http = t_http.sort_by(order)
    for col in ("url", "host", "fetch_status", "bytes", "caption", "phash",
                "w", "h", "fmt", "wave", "crawl_rank"):
        assert t_http[col].to_pylist() == t_store[col].to_pylist(), col
    # both ok and missing rows actually occurred (miss path exercised)
    statuses = set(t_http["fetch_status"].to_pylist())
    assert "ok" in statuses
    # identical seen-set state after both runs
    assert res_http.seen.all_keys() == res_store.seen.all_keys()
    # identical wave funnels
    for ws, wh in zip(res_store.waves, res_http.waves):
        assert (ws.candidates, ws.scheduled, ws.fetched_ok, ws.missing,
                ws.outlinks) == (
            wh.candidates, wh.scheduled, wh.fetched_ok, wh.missing,
            wh.outlinks,
        )


def test_cli_http_crawl_via_env(ray_session, tmp_path, capsys, monkeypatch):
    """The full env-configured deployment shape: NC_FETCH_MODE=http +
    NC_HTTP_BASE_URL drive the CLI crawl over the loopback transport
    with no --store at all; omitting --store WITHOUT http mode fails
    loudly."""
    import json

    from news_crawler_ray.__main__ import main

    store = synth.make_pagestore(80, seed=11)
    frontier = synth.make_frontier(60, seed=11)
    robots = synth.make_robots(seed=11)
    fp = str(tmp_path / "frontier.parquet")
    rp = str(tmp_path / "robots.parquet")
    pq.write_table(frontier, fp)
    pq.write_table(robots, rp)

    base_args = ["crawl", "--frontier", fp, "--robots", rp,
                 "--out", str(tmp_path / "run"), "--max-waves", "1"]
    with pytest.raises(SystemExit, match="--store is required"):
        main(base_args)

    srv = LoopbackStoreServer(store)
    with srv as base:
        monkeypatch.setenv("NC_FETCH_MODE", "http")
        monkeypatch.setenv("NC_HTTP_BASE_URL", base)
        monkeypatch.setenv("NC_HTTP_RATE_PER_S", "10000")
        monkeypatch.setenv("NC_HTTP_BURST", "64")
        assert main(base_args) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert rows[-1]["total_fetched"] > 0
    assert len(srv.request_log) > 0


def test_http_crawl_with_faults_row_level(ray_session, tmp_path):
    """Injected faults surface as row-level fetch_status values in the
    CRAWL's durable output (partitioned parquet dirs handle the
    error:* status strings), and the wave completes instead of dying —
    T5 end-to-end over real sockets."""
    from news_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl

    store = synth.make_pagestore(120, seed=21)
    frontier = synth.make_frontier(90, seed=21)
    robots = synth.make_robots(seed=21)
    # fault targets must be URLs the crawl will actually schedule: in
    # the store, AND not robots-disallowed (the frontier carries rows
    # the politeness gate drops)
    store_ids = set(store["image_id"].to_pylist())
    rob = {
        h: list(p)
        for h, p in zip(
            robots["host"].to_pylist(),
            robots["disallow_prefixes"].to_pylist(),
        )
    }
    sched_ids = []
    for u, h in zip(frontier["url"].to_pylist(), frontier["host"].to_pylist()):
        iid = u.rsplit("/", 1)[-1]
        path = "/p/" + iid
        if iid in store_ids and not any(
            path.startswith(px) for px in rob.get(h, [])
        ):
            sched_ids.append(iid)
    ids = sorted(set(sched_ids))[:2]
    assert len(ids) == 2
    faults = {
        ids[0]: {"status": 429, "times": 1},      # retried → ok
        ids[1]: {"status": 503, "times": 10**9},  # error row
    }
    srv = LoopbackStoreServer(store, faults=faults)
    with srv as base:
        res = run_crawl(
            frontier, None, robots, str(tmp_path / "run"),
            config=CrawlConfig(
                max_waves=1, num_seen_shards=2, dedup_partitions=2,
                fetch_mode="http", http_base_url=base,
                http_rate_per_s=10_000.0, http_burst=64.0,
                http_attempts=2,
            ),
        )
    t = pq.read_table(os.path.join(res.out_dir, "fetched"))
    by_id = {}
    for url, st in zip(t["url"].to_pylist(), t["fetch_status"].to_pylist()):
        by_id[url.rsplit("/", 1)[-1]] = st
    assert by_id[ids[0]] == "ok"                # 429 recovered via retry
    assert by_id[ids[1]] == "error:http_503"    # persistent fault → row
    assert res.waves[0].fetched_ok > 0
    # error rows are excluded from fetched_ok but present in the output
    n_err = sum(1 for s in by_id.values() if s.startswith("error:"))
    assert n_err >= 1


def test_http_fetcher_follows_redirects_and_detects_loops():
    """3xx handling (the reference's requests session follows
    redirects implicitly): a 2-hop chain resolves to the terminal
    payload; a Location cycle becomes an error:redirect_loop row; every
    hop is a real request in the server log."""
    store = synth.make_pagestore(6, seed=31)
    ids = store["image_id"].to_pylist()
    faults = {
        # chain: ids[0] -> ids[1] -> ids[2] (terminal serves payload)
        ids[0]: {"redirect": f"/hb.example/p/{ids[1]}", "times": 10**9},
        ids[1]: {"redirect": f"/hc.example/p/{ids[2]}", "times": 10**9,
                 "status": 302},
        # cycle: ids[3] -> ids[4] -> ids[3]
        ids[3]: {"redirect": f"/ha.example/p/{ids[4]}", "times": 10**9},
        ids[4]: {"redirect": f"/ha.example/p/{ids[3]}", "times": 10**9},
    }
    srv = LoopbackStoreServer(store, faults=faults)
    with srv as base:
        f = HTTPFetcher(base_url=base, timeout_s=5.0, attempts=1)
        out = f.__call__(_mini_batch(store, [ids[0], ids[3], ids[5]],
                                     host="ha.example"))
        assert out["fetch_status"].to_pylist() == [
            "ok", "error:redirect_loop", "ok"
        ]
        # the chain row carries the TERMINAL page's payload
        assert out["bytes"][0].as_py() == store["bytes"][2].as_py()
        f.transport.close()
    hops = [i for _, _, i in srv.request_log]
    assert hops.count(ids[0]) == 1 and hops.count(ids[1]) == 1
    assert hops.count(ids[2]) == 1  # chain: exactly one request per hop


def test_http_fetcher_honors_retry_after(ray_session):
    """A 429 carrying Retry-After delays the retry by at least that
    long (server-timestamp evidence), then succeeds."""
    store = synth.make_pagestore(3, seed=33)
    ids = store["image_id"].to_pylist()
    ra = 0.6
    srv = LoopbackStoreServer(
        store, faults={ids[0]: {"status": 429, "retry_after": ra, "times": 1}}
    )
    with srv as base:
        f = HTTPFetcher(
            base_url=base, timeout_s=5.0, attempts=2, initial_delay_s=0.01
        )
        out = f.__call__(_mini_batch(store, [ids[0]]))
        assert out["fetch_status"].to_pylist() == ["ok"]
        f.transport.close()
    times = [t for t, _, i in srv.request_log if i == ids[0]]
    assert len(times) == 2
    gap = times[1] - times[0]
    assert gap >= ra * 0.9, gap          # honored the header...
    assert gap < ra * 3                  # ...and didn't oversleep wildly


def test_parse_robots_txt_groups_and_edge_cases():
    """Pure-parser conformance: UA group selection by longest matching
    token, * fallback, empty Disallow as allow-all no-op, fractional
    Crawl-delay, comments, case-insensitive keys."""
    from news_crawler_ray.sources.robotstxt import (
        parse_robots_txt,
        render_robots_txt,
    )

    txt = """
# global rules
User-Agent: *
Disallow: /private/
Crawl-Delay: 2

User-agent: newsbot
User-agent: otherbot
Disallow: /p/img000000   # inline comment is stripped
Disallow:
CRAWL-DELAY: 0.5

User-agent: news
Disallow: /only-for-news/
"""
    # generic agent → the * group
    dis, ms = parse_robots_txt(txt, "randombot/1.0")
    assert dis == ["/private/"] and ms == 2000
    # 'newsbot' matches BOTH 'newsbot' (len 7) and 'news' (len 4):
    # longest token wins; empty Disallow is a no-op; 0.5 s → 500 ms
    dis, ms = parse_robots_txt(txt, "NewsBot/2.1 (+crawler)")
    assert dis == ["/p/img000000"] and ms == 500
    # no groups at all → allow-all + default
    assert parse_robots_txt("", "x") == ([], 1000)
    assert parse_robots_txt("junk without colons\n", "x") == ([], 1000)
    # round-trip through the renderer
    dis2, ms2 = parse_robots_txt(render_robots_txt(["/a", "/b/c"], 750), "any")
    assert dis2 == ["/a", "/b/c"] and ms2 == 750


def test_fetch_robots_table_over_loopback(ray_session):
    """The robots HTTP source reproduces the fixture robots table
    exactly over real sockets — and hosts WITHOUT a robots.txt (404)
    become allow-all rows with the default delay instead of errors."""
    from news_crawler_ray.sources.robotstxt import fetch_robots_table

    store = synth.make_pagestore(4, seed=3)
    robots = synth.make_robots(seed=42)
    srv = LoopbackStoreServer(store, robots=robots)
    with srv as base:
        hosts = robots["host"].to_pylist() + ["norobots.example.com"]
        got = fetch_robots_table(
            hosts, base_url=base, default_delay_ms=1234, concurrency=1
        )
    want = {
        h: (list(d or []), ms)
        for h, d, ms in zip(
            robots["host"].to_pylist(),
            robots["disallow_prefixes"].to_pylist(),
            robots["crawl_delay_ms"].to_pylist(),
        )
    }
    got_map = {
        h: (list(d or []), ms)
        for h, d, ms in zip(
            got["host"].to_pylist(),
            got["disallow_prefixes"].to_pylist(),
            got["crawl_delay_ms"].to_pylist(),
        )
    }
    assert got_map.pop("norobots.example.com") == ([], 1234)
    assert got_map == want


def test_crawl_with_http_fetched_robots_matches_table(ray_session, tmp_path):
    """End-to-end: a crawl whose robots came over HTTP equals the crawl
    with the fixture robots table — discovery closes the loop."""
    from news_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from news_crawler_ray.sources.robotstxt import fetch_robots_table

    store = synth.make_pagestore(150, seed=42)
    frontier = synth.make_frontier(120, seed=42)
    robots = synth.make_robots(seed=42)
    cfg = dict(max_waves=1, num_seen_shards=2, dedup_partitions=2)
    res_table = run_crawl(
        frontier, store, robots, str(tmp_path / "t"),
        config=CrawlConfig(**cfg),
    )
    srv = LoopbackStoreServer(store, robots=robots)
    with srv as base:
        robots_http = fetch_robots_table(
            robots["host"].to_pylist(), base_url=base, concurrency=1
        )
        res_http = run_crawl(
            frontier, store, robots_http, str(tmp_path / "h"),
            config=CrawlConfig(**cfg),
        )
    a = pq.read_table(os.path.join(res_table.out_dir, "fetched"))
    b = pq.read_table(os.path.join(res_http.out_dir, "fetched"))
    order = [("crawl_rank", "ascending")]
    assert a.sort_by(order)["url"].to_pylist() == b.sort_by(order)["url"].to_pylist()
    assert a.num_rows == b.num_rows > 0


def test_cli_http_crawl_with_live_robots(ray_session, tmp_path, capsys, monkeypatch):
    """--robots http: the CLI discovers politeness rules from each
    frontier host's live /robots.txt over the same loopback transport
    that serves the pages — the fully self-configured deployment."""
    import json

    from news_crawler_ray.__main__ import main

    store = synth.make_pagestore(80, seed=11)
    frontier = synth.make_frontier(60, seed=11)
    robots = synth.make_robots(seed=11)
    fp = str(tmp_path / "frontier.parquet")
    pq.write_table(frontier, fp)

    srv = LoopbackStoreServer(store, robots=robots)
    with srv as base:
        monkeypatch.setenv("NC_FETCH_MODE", "http")
        monkeypatch.setenv("NC_HTTP_BASE_URL", base)
        monkeypatch.setenv("NC_HTTP_RATE_PER_S", "10000")
        monkeypatch.setenv("NC_HTTP_BURST", "64")
        assert main([
            "crawl", "--frontier", fp, "--robots", "http",
            "--out", str(tmp_path / "run"), "--max-waves", "1",
        ]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert rows[-1]["total_fetched"] > 0
    # the server really served robots.txt (one per frontier host)...
    n_robots = sum(1 for _, _, i in srv.request_log if i == "robots.txt")
    assert n_robots == len(set(frontier["host"].to_pylist()))
    # ...and page requests flowed after rule discovery
    assert sum(1 for _, _, i in srv.request_log if i.startswith("img")) > 0


def test_http_fetcher_conditional_get_recrawl():
    """Recrawl economics: pass 1 collects ETags (emit_etag); pass 2
    sends If-None-Match and every unchanged page answers 304 —
    fetch_status='not_modified', zero payload bytes on the wire. A page
    whose content CHANGED between passes re-downloads normally. The
    same contract holds for StoreTransport (full test double)."""
    from news_crawler_ray.stages.transport import StoreTransport

    store = synth.make_pagestore(5, seed=37)
    ids = store["image_id"].to_pylist()
    srv = LoopbackStoreServer(store)
    with srv as base:
        f1 = HTTPFetcher(base_url=base, timeout_s=5.0, emit_etag=True)
        out1 = f1.__call__(_mini_batch(store, ids))
        assert out1["fetch_status"].to_pylist() == ["ok"] * 5
        etag_map = dict(zip(
            out1["url"].to_pylist(), out1["etag"].to_pylist()
        ))
        assert all(etag_map.values())
        f1.transport.close()

        # mutate one page's payload between crawls
        mutated = store.set_column(
            store.column_names.index("caption"), "caption",
            pa.array(
                ["CHANGED"] + store["caption"].to_pylist()[1:], pa.string()
            ),
        )
        srv.store = mutated.combine_chunks()
        srv.ids = srv.store["image_id"].combine_chunks()

        f2 = HTTPFetcher(
            base_url=base, timeout_s=5.0, prior_etags=etag_map,
            emit_etag=True,
        )
        out2 = f2.__call__(_mini_batch(store, ids))
        st = out2["fetch_status"].to_pylist()
        assert st[0] == "ok"                      # changed → re-downloaded
        assert st[1:] == ["not_modified"] * 4     # unchanged → 304
        assert out2["caption"][0].as_py() == "CHANGED"
        assert out2["bytes"][1].as_py() is None   # no payload re-shipped
        # the changed page's NEW etag flows out for the next crawl
        assert out2["etag"][0].as_py() != etag_map[out2["url"][0].as_py()]
        assert out2["etag"][1].as_py() == etag_map[out2["url"][1].as_py()]
        f2.transport.close()

    # StoreTransport speaks the same conditional contract
    tr = StoreTransport(store)
    url = f"https://h/p/{ids[0]}"
    r1 = tr.get(url)
    assert r1.status == 200 and r1.etag
    assert tr.get(url, headers={"If-None-Match": r1.etag}).status == 304
    assert tr.get(url, headers={"If-None-Match": '"stale"'}).status == 200


def test_http_recrawl_via_run_crawl(ray_session, tmp_path):
    """Recrawl through the run surface: pass 1 (http_emit_etag) writes
    an etag column; pass 2 points http_prior_etags_path at pass 1's
    fetched/ dir and every previously-ok page comes back
    fetch_status='not_modified' with no payload re-shipped, while
    misses stay misses."""
    from news_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl

    store = synth.make_pagestore(150, seed=42)
    frontier = synth.make_frontier(120, seed=42)
    robots = synth.make_robots(seed=42)
    common = dict(
        max_waves=1, num_seen_shards=2, dedup_partitions=2,
        fetch_mode="http", http_rate_per_s=10_000.0, http_burst=64.0,
        http_emit_etag=True,
    )
    srv = LoopbackStoreServer(store)
    with srv as base:
        res1 = run_crawl(
            frontier, None, robots, str(tmp_path / "r1"),
            config=CrawlConfig(**common, http_base_url=base),
        )
        t1 = pq.read_table(os.path.join(res1.out_dir, "fetched"))
        assert "etag" in t1.column_names
        st1 = dict(zip(t1["url"].to_pylist(), t1["fetch_status"].to_pylist()))
        assert "ok" in set(st1.values())

        res2 = run_crawl(
            frontier, None, robots, str(tmp_path / "r2"),
            config=CrawlConfig(
                **common,
                http_base_url=base,
                http_prior_etags_path=os.path.join(res1.out_dir, "fetched"),
            ),
        )
    t2 = pq.read_table(os.path.join(res2.out_dir, "fetched"))
    st2 = dict(zip(t2["url"].to_pylist(), t2["fetch_status"].to_pylist()))
    assert set(st1) == set(st2)
    n_nm = 0
    for url, s1 in st1.items():
        if s1 == "ok":
            assert st2[url] == "not_modified", url
            n_nm += 1
        else:
            assert st2[url] == s1, url
    assert n_nm > 0
    # not_modified rows carry no payload bytes
    nm = t2.filter(
        pa.compute.equal(t2["fetch_status"], "not_modified")
    )
    assert all(b is None for b in nm["bytes"].to_pylist())
    # and the etag column survives for the NEXT recrawl's map
    assert all(e is not None for e in nm["etag"].to_pylist())


def test_fetch_sitemap_frontier_over_loopback(ray_session):
    """Live sitemap discovery: /sitemap.xml per host → frontier-schema
    seeds (host parsed from loc, lastmod → discovered_at, date-less
    entries at epoch); hosts without a sitemap contribute zero rows."""
    from news_crawler_ray.sources.discovery import fetch_sitemap_frontier

    store = synth.make_pagestore(4, seed=3)
    sm = synth.make_sitemaps(6, seed=42)
    sitemaps = dict(zip(sm["sitemap_id"].to_pylist(), sm["xml"].to_pylist()))
    # re-key by HOST (the discovery URL layout): sm{i} -> sm{i}.example.com
    sitemaps = {f"{k}.example.com": v for k, v in sitemaps.items()}
    srv = LoopbackStoreServer(store, sitemaps=sitemaps)
    with srv as base:
        hosts = sorted(sitemaps) + ["nositemap.example.com"]
        got = fetch_sitemap_frontier(hosts, base_url=base, concurrency=1)
    # expected: every <loc> across the served sitemaps
    import re

    exp = []
    for xml in sitemaps.values():
        exp.extend(re.findall(r"<loc>([^<]*)</loc>", xml))
    assert sorted(got["url"].to_pylist()) == sorted(exp)
    assert len(exp) > 0
    # schema + projections
    for u, h, d, ts, p in zip(
        got["url"].to_pylist(), got["host"].to_pylist(),
        got["depth"].to_pylist(), got["discovered_at"].to_pylist(),
        got["priority"].to_pylist(),
    ):
        assert h and u.startswith("http://" + h)
        assert d == 0 and p == 1.0
        assert ts is not None
    # lastmod-bearing entries got real dates; date-less ones epoch
    years = {t.year for t in got["discovered_at"].to_pylist()}
    assert 1970 in years and 2025 in years


def test_zero_local_input_discovery_crawl(ray_session, tmp_path):
    """The complete discovery deployment: a HOST LIST is the crawl's
    ONLY input — robots from live /robots.txt, seeds from live
    /sitemap.xml, pages over live GETs — and it fetches real payloads
    honoring the discovered disallow rules."""
    from news_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from news_crawler_ray.sources.discovery import fetch_sitemap_frontier
    from news_crawler_ray.sources.robotstxt import fetch_robots_table

    store = synth.make_pagestore(40, seed=51)
    ids = store["image_id"].to_pylist()
    hosts = ["ha.example.com", "hb.example.com"]
    # each host's sitemap lists 20 real store pages
    sitemaps = {}
    for k, h in enumerate(hosts):
        locs = "".join(
            f"<url><loc>https://{h}/p/{i}</loc></url>"
            for i in ids[k * 20:(k + 1) * 20]
        )
        sitemaps[h] = f'<?xml version="1.0"?><urlset>{locs}</urlset>'
    robots = pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            # hb disallows its first 10 page ids by prefix
            "disallow_prefixes": pa.array(
                [[], [f"/p/{i}" for i in ids[20:30]]],
                pa.list_(pa.string()),
            ),
            "crawl_delay_ms": pa.array([100, 100], pa.int32()),
        }
    )
    srv = LoopbackStoreServer(store, robots=robots, sitemaps=sitemaps)
    with srv as base:
        seeds = fetch_sitemap_frontier(hosts, base_url=base, concurrency=1)
        assert seeds.num_rows == 40
        rules = fetch_robots_table(hosts, base_url=base, concurrency=1)
        res = run_crawl(
            seeds, None, rules, str(tmp_path / "run"),
            config=CrawlConfig(
                max_waves=1, num_seen_shards=2, dedup_partitions=2,
                fetch_mode="http", http_base_url=base,
                http_rate_per_s=10_000.0, http_burst=64.0,
            ),
        )
    w = res.waves[0]
    # 40 seeds - 10 disallowed on hb = 30 scheduled, all present in store
    assert w.scheduled == 30
    assert w.fetched_ok == 30
    t = pq.read_table(os.path.join(res.out_dir, "fetched"))
    assert t.num_rows == 30
    assert not any(
        u.rsplit("/", 1)[-1] in set(ids[20:30]) for u in t["url"].to_pylist()
    )


def test_cli_discovery_crawl_hosts_only(ray_session, tmp_path, capsys, monkeypatch):
    """CLI zero-local-input deployment: `crawl --hosts hosts.txt
    --robots http` with NC_FETCH_MODE=http — no frontier file, no
    robots file, no store. Everything is discovered live."""
    import json

    from news_crawler_ray.__main__ import main

    store = synth.make_pagestore(20, seed=61)
    ids = store["image_id"].to_pylist()
    host = "hc.example.com"
    sitemaps = {
        host: '<?xml version="1.0"?><urlset>' + "".join(
            f"<url><loc>https://{host}/p/{i}</loc></url>" for i in ids[:10]
        ) + "</urlset>"
    }
    robots = pa.table(
        {
            "host": pa.array([host], pa.string()),
            "disallow_prefixes": pa.array([[]], pa.list_(pa.string())),
            "crawl_delay_ms": pa.array([100], pa.int32()),
        }
    )
    hosts_file = str(tmp_path / "hosts.txt")
    with open(hosts_file, "w") as f:
        f.write(host + "\n")

    srv = LoopbackStoreServer(store, robots=robots, sitemaps=sitemaps)
    with srv as base:
        monkeypatch.setenv("NC_FETCH_MODE", "http")
        monkeypatch.setenv("NC_HTTP_BASE_URL", base)
        monkeypatch.setenv("NC_HTTP_RATE_PER_S", "10000")
        monkeypatch.setenv("NC_HTTP_BURST", "64")
        assert main([
            "crawl", "--hosts", hosts_file, "--robots", "http",
            "--out", str(tmp_path / "run"), "--max-waves", "1",
        ]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert rows[-1]["total_fetched"] == 10
    served = {i for _, _, i in srv.request_log}
    assert "sitemap.xml" in served and "robots.txt" in served


def test_rss_xml_parse_roundtrip_oracle(ray_session):
    """The vectorized RSS-XML parser is exact against the row fixture:
    render make_rss_feed rows to XML, parse back, project through
    parse_rss_entries — identical output to projecting the ORIGINAL
    rows (titles/links trimmed, date fallbacks, null-summary coalesce,
    head-limit by seq). The channel-header <title> must not leak in as
    an entry."""
    import ray.data

    from news_crawler_ray.stages.rss import (
        extract_rss_entries_batch,
        parse_rss_entries,
    )

    rows = synth.make_rss_feed(24, seed=42)
    xml = synth.render_rss_xml(rows, feed_title="KISA-style feed")
    feed_tbl = pa.table(
        {"feed_id": pa.array(["kisa.example"], pa.string()),
         "xml": pa.array([xml], pa.string())}
    )
    parsed = extract_rss_entries_batch(feed_tbl)
    assert parsed.num_rows == 24
    assert parsed["seq"].to_pylist() == list(range(24))
    assert "KISA-style feed" not in parsed["title"].to_pylist()
    # nulls survived the wire: every 3rd summary absent → description
    n_null = sum(1 for s in parsed["summary"].to_pylist() if s is None)
    assert n_null == sum(1 for s in rows["summary"].to_pylist() if s is None)

    kw = dict(default_day="2025-06-20", limit=10, day_filter="2025-06-20")
    got = parse_rss_entries(ray.data.from_arrow(parsed), **kw).take_all()
    exp = parse_rss_entries(ray.data.from_arrow(rows), **kw).take_all()
    assert [
        (r["title"], r["link"], str(r["published"]), r["summary"])
        for r in sorted(got, key=lambda r: r["entry_id"])
    ] == [
        (r["title"], r["link"], str(r["published"]), r["summary"])
        for r in sorted(exp, key=lambda r: r["entry_id"])
    ]


def test_fetch_rss_entries_over_loopback(ray_session):
    """Live feed fetch: /feed.xml per host through the transport →
    entry rows; a host without a feed contributes nothing; entry_id
    carries the feed host."""
    from news_crawler_ray.sources.discovery import fetch_rss_entries

    store = synth.make_pagestore(4, seed=3)
    rows = synth.make_rss_feed(8, seed=7)
    xml = synth.render_rss_xml(rows)
    srv = LoopbackStoreServer(
        store, feeds={"feedhost.example": xml}
    )
    with srv as base:
        ds = fetch_rss_entries(
            ["feedhost.example", "nofeed.example"], base_url=base,
            concurrency=1,
        )
        got = ds.take_all()
    assert len(got) == 8
    assert all(r["entry_id"].startswith("feedhost.example#") for r in got)
    assert sorted(r["seq"] for r in got) == list(range(8))
    n_feed_reqs = sum(1 for _, _, i in srv.request_log if i == "feed.xml")
    assert n_feed_reqs == 2  # both hosts probed exactly once


def test_gzip_content_encoding_roundtrip():
    """Wire compression: the transport advertises Accept-Encoding: gzip
    and transparently decompresses Content-Encoding: gzip responses —
    payloads, etags and conditional GETs are identical to the plain
    wire, and the server really does compress (gzip magic on the raw
    socket) only when the client asks."""
    import gzip as _gzip
    import http.client as hc

    store = synth.make_pagestore(4, seed=71)
    ids = store["image_id"].to_pylist()
    srv = LoopbackStoreServer(store, gzip_payloads=True)
    with srv as base:
        f = HTTPFetcher(base_url=base, timeout_s=5.0, emit_etag=True)
        out = f.__call__(_mini_batch(store, ids))
        assert out["fetch_status"].to_pylist() == ["ok"] * 4
        assert out["bytes"].to_pylist() == store["bytes"].to_pylist()

        # conditional GET still 304s over the gzip wire
        etag_map = dict(zip(out["url"].to_pylist(), out["etag"].to_pylist()))
        f2 = HTTPFetcher(base_url=base, timeout_s=5.0, prior_etags=etag_map)
        out2 = f2.__call__(_mini_batch(store, ids))
        assert out2["fetch_status"].to_pylist() == ["not_modified"] * 4
        f.transport.close()
        f2.transport.close()

        # raw socket check: gzip only when advertised
        hostport = base.split("//", 1)[1]
        c = hc.HTTPConnection(hostport, timeout=5)
        c.request("GET", f"/h0.example/p/{ids[0]}",
                  headers={"Accept-Encoding": "gzip"})
        r = c.getresponse()
        assert r.getheader("Content-Encoding") == "gzip"
        assert _gzip.decompress(r.read())[:4]  # valid gzip stream
        c.request("GET", f"/h0.example/p/{ids[0]}")
        r2 = c.getresponse()
        body = r2.read()
        assert r2.getheader("Content-Encoding") is None
        assert body[:2] != b"\x1f\x8b"
        c.close()


def test_http_crawl_with_payload_verification(ray_session, tmp_path):
    """fetch_mode='http' composes with verify_payloads: wire-fetched
    bytes decode through the same feature/phash-check stage as
    store-fetched bytes, and the phash invariant holds for every ok
    row (the codec bytes crossed a real socket unchanged)."""
    from news_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl

    store = synth.make_pagestore(120, seed=42)
    frontier = synth.make_frontier(90, seed=42)
    robots = synth.make_robots(seed=42)
    srv = LoopbackStoreServer(store)
    with srv as base:
        res = run_crawl(
            frontier, None, robots, str(tmp_path / "run"),
            config=CrawlConfig(
                max_waves=1, num_seen_shards=2, dedup_partitions=2,
                fetch_mode="http", http_base_url=base,
                http_rate_per_s=10_000.0, http_burst=64.0,
                verify_payloads=True,
            ),
        )
    t = pq.read_table(os.path.join(res.out_dir, "fetched"))
    ok = t.filter(pa.compute.equal(t["fetch_status"], "ok"))
    assert ok.num_rows > 0
    assert "decode_ok" in t.column_names and "phash_check" in t.column_names
    assert all(ok["decode_ok"].to_pylist())
    # lossless rows: decoded phash equals the store's phash bit-exactly
    # (lossy QIM rows may differ by a few bits — that tolerance is the
    # decode_ok invariant's job, asserted above for every row)
    png = ok.filter(pa.compute.equal(ok["fmt"], "png"))
    assert png.num_rows > 0
    assert png["phash_check"].to_pylist() == png["phash"].to_pylist()
