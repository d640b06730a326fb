"""Tests for scalar function modules: dates, formatters."""

import datetime as dt

import pyarrow as pa

from news_crawler_ray.functions import dates, formatters


def test_parse_korean_dates():
    arr = pa.array(
        [
            "홍길동 기자 | 2025년 6월 20일 09:30",
            "2025년 12월 3일",
            "no date here",
            None,
            "| 2024년 1월 1일 00:00",
        ]
    )
    out = dates.parse_korean_dates(arr).to_pylist()
    assert out == [
        dt.date(2025, 6, 20),
        dt.date(2025, 12, 3),
        None,
        None,
        dt.date(2024, 1, 1),
    ]


def test_normalize_rss_dates():
    arr = pa.array(
        [
            "2025-06-20T08:15:00",
            "published 2025-06-19 somewhere",
            "garbage",
            None,
        ]
    )
    out = dates.normalize_rss_dates(arr, default_day="2025-06-21").to_pylist()
    assert out == [
        dt.date(2025, 6, 20),
        dt.date(2025, 6, 19),
        dt.date(2025, 6, 21),
        dt.date(2025, 6, 21),
    ]
    out2 = dates.normalize_rss_dates(arr).to_pylist()
    assert out2[2] is None and out2[3] is None


def test_validate_ips_and_hashes():
    ips = formatters.validate_ips(
        pa.array(["1.2.3.4", " 5[.]6[.]7[.]8 ", "999.1.1.1", "nope", None])
    ).to_pylist()
    assert ips == ["1.2.3.4", "5.6.7.8", None, None, None]
    hs = formatters.normalize_hashes(pa.array(["  ABCdef01 ", "", "ff"])).to_pylist()
    assert hs == ["abcdef01", None, "ff"]


def test_rule_formatters_and_parser():
    t = pa.table({"value": pa.array(["1.2.3.4", "5.6.7.8"]), "sid": pa.array([7000000, 7000001])})
    rules = formatters.ip_rule_lines(t)["rule"].to_pylist()
    assert rules[0] == (
        'drop ip 1.2.3.4 any <> any any (msg:"SecBot blocked IP"; sid:7000000; rev:1;)'
    )
    back = formatters.parse_ip_rule_lines(pa.array(rules + ["# comment"])).to_pylist()
    assert back == ["1.2.3.4", "5.6.7.8", None]

    u = pa.table(
        {
            "value": pa.array(["https[:]//bad[.]example[.]com/x%20y?q=1"]),
            "sid": pa.array([7100000]),
        }
    )
    rule = formatters.url_rule_lines(u)["rule"].to_pylist()[0]
    assert 'content:"bad.example.com"' in rule and 'content:"/x y?q=1"' in rule
    assert "sid:7100000" in rule


def test_markdown_renderer():
    t = pa.table({"title": pa.array(["Hello"]), "link": pa.array(["https://x.com/a"])})
    md = formatters.to_markdown_bullets(t)["md"].to_pylist()
    assert md == ["- [Hello](https://x.com/a)"]


def test_rss_tz_normalization():
    import pyarrow as pa

    from news_crawler_ray.functions.dates import normalize_rss_dates

    arr = pa.array(
        [
            "2025-06-19T23:30:00",  # UTC late evening → Seoul next day
            "2025-06-19T05:00:00",  # stays on the 19th
            "posted on 2025-06-18 KST",  # regex fallback, NO shift
            "garbage",  # default day
            None,
        ]
    )
    out = normalize_rss_dates(arr, default_day="2025-06-20", tz_offset_hours=9)
    import datetime as dt

    assert out.to_pylist() == [
        dt.date(2025, 6, 20),
        dt.date(2025, 6, 19),
        dt.date(2025, 6, 18),
        dt.date(2025, 6, 20),
        dt.date(2025, 6, 20),
    ]


def test_rss_projection(ray_session):
    import ray.data as rd

    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.stages.rss import parse_rss_entries

    feed = synth.make_rss_feed(40, seed=42, today="2025-06-20")
    out = parse_rss_entries(
        rd.from_arrow(feed), tz_offset_hours=9, default_day="2025-06-20",
        limit=30, day_filter="2025-06-20",
    ).take_all()
    assert out, "today-filter must keep the shifted + default rows"
    for r in out:
        assert r["title"] == r["title"].strip() and r["link"] == r["link"].strip()
        assert r["summary"]  # coalesce never leaves null/empty for this fixture
        assert str(r["published"]) == "2025-06-20"
    # entries past the head-limit never appear
    assert all(int(r["entry_id"][3:]) < 30 for r in out)


def test_values_sql_roundtrip():
    """values_sql must render types/quotes/nulls DuckDB-exactly."""
    import datetime as dt

    import duckdb
    import pyarrow as pa

    from news_crawler_ray.pipelines.expected import values_sql

    tbl = pa.table(
        {
            "s": pa.array(["plain", "it's quoted", None], pa.string()),
            "i": pa.array([1, -2, None], pa.int64()),
            "w": pa.array([3, None, 5], pa.int32()),
            "b": pa.array([True, False, None], pa.bool_()),
            "d": pa.array([dt.date(2025, 6, 20), None, dt.date(1999, 1, 2)], pa.date32()),
        }
    )
    out = duckdb.sql(values_sql(tbl)).arrow()
    assert out.schema.equals(tbl.schema), (out.schema, tbl.schema)
    assert out.to_pylist() == tbl.to_pylist()


def test_parse_robots_text_groups():
    from news_crawler_ray.functions.robots import (
        parse_robots_batch,
        parse_robots_text,
    )

    txt = (
        "User-agent: *\nDisallow: /a\nDisallow:\nCrawl-delay: 1\n\n"
        "User-agent: SecBot\nUser-agent: other\nDisallow: /b\nCrawl-delay: 0.25\n"
    )
    assert parse_robots_text(txt) == (["/a"], 1000)
    # most-specific agent group wins over *
    assert parse_robots_text(txt, agent="SecBot/1.0") == (["/b"], 250)
    # merged multi-agent group matches either agent
    assert parse_robots_text(txt, agent="other") == (["/b"], 250)
    # missing/None body or no matching group -> allow all, default delay
    assert parse_robots_text(None) == ([], 1000)
    assert parse_robots_text("User-agent: x\nDisallow: /z") == ([], 1000)
    import pyarrow as pa

    out = parse_robots_batch(
        pa.table(
            {
                "host": pa.array(["h1", "h2"]),
                "robots_txt": pa.array([txt, None]),
            }
        )
    )
    assert out["disallow_prefixes"].to_pylist() == [["/a"], []]
    assert out["crawl_delay_ms"].to_pylist() == [1000, 1000]
    # batch output feeds straight into the politeness config
    from news_crawler_ray.stages.politeness import robots_table_to_config

    cfg = robots_table_to_config(out)
    assert cfg["h1"] == (("/a",), 1000)


def test_robots_text_roundtrip_fixture():
    """Rendering the fixture robots table as robots.txt bodies and
    parsing them back must reproduce the politeness config exactly."""
    import pyarrow as pa

    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.functions.robots import parse_robots_batch

    tbl = synth.make_robots(seed=42)
    texts = []
    for d, ms in zip(
        tbl["disallow_prefixes"].to_pylist(), tbl["crawl_delay_ms"].to_pylist()
    ):
        lines = ["User-agent: *"]
        lines += [f"Disallow: {p}" for p in d]
        lines.append(f"Crawl-delay: {ms / 1000}")
        texts.append("\n".join(lines))
    parsed = parse_robots_batch(
        pa.table({"host": tbl["host"], "robots_txt": pa.array(texts)})
    )
    assert parsed["host"].to_pylist() == tbl["host"].to_pylist()
    assert parsed["disallow_prefixes"].to_pylist() == tbl["disallow_prefixes"].to_pylist()
    assert parsed["crawl_delay_ms"].to_pylist() == tbl["crawl_delay_ms"].to_pylist()
