"""K3 ipset payload sink, K4 rules-file merge, K1/K2 digests, T5 retry."""

import os

import pyarrow as pa
import pytest


def test_retry_transient_then_success():
    from news_crawler_ray.functions.retry import RetriesExhausted, with_retry

    calls = {"n": 0}
    delays = []

    @with_retry(attempts=5, initial_delay_s=1.0, backoff=2.0, jitter=0.2,
                retryable=(OSError,), sleep=delays.append)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3
    assert len(delays) == 2
    # exponential with ±20% jitter: 1s then 2s nominal
    assert 0.8 <= delays[0] <= 1.2 and 1.6 <= delays[1] <= 2.4

    @with_retry(attempts=3, initial_delay_s=0.0, retryable=(OSError,), sleep=lambda s: None)
    def always_fails():
        raise OSError("persistent")

    with pytest.raises(RetriesExhausted):
        always_fails()

    @with_retry(attempts=5, retryable=(OSError,), sleep=lambda s: None)
    def wrong_kind():
        raise ValueError("not retryable")

    with pytest.raises(ValueError):
        wrong_kind()


def test_fetch_shard_read_retries(tmp_path):
    """ShardLookupFetcher retries transient shard-read failures in-actor."""
    import pyarrow.parquet as pq

    from news_crawler_ray.functions.retry import with_retry
    from news_crawler_ray.stages.fetch import STORE_SCHEMA, ShardLookupFetcher

    d = tmp_path / "store"
    (d / "shard-0").mkdir(parents=True)
    pq.write_table(STORE_SCHEMA.empty_table(), str(d / "shard-0" / "part.parquet"))
    f = ShardLookupFetcher(str(d))
    fails = {"n": 0}
    real = pq.read_table

    def flaky_read(path, *a, **k):
        if fails["n"] < 2:
            fails["n"] += 1
            raise OSError("transient fs")
        return real(path, *a, **k)

    f._read = with_retry(flaky_read, attempts=3, initial_delay_s=0.0, sleep=lambda s: None)
    tbl, (ids, n) = f._shard(0)
    assert fails["n"] == 2 and n == 0


def test_ipset_payload_sink(ray_session, tmp_path):
    import ray.data as rd

    from news_crawler_ray.stages.sidefx import read_ipset_payload, write_ipset_payloads

    ds = rd.from_arrow(pa.table({"value": pa.array(["1.2.3.4", "5.6.7.8", None])}))
    out = str(tmp_path / "ipset")
    write_ipset_payloads(ds, out, set_name="secbot_bad_ips")
    payload = read_ipset_payload(out)
    assert payload.splitlines()[0] == "create secbot_bad_ips hash:ip timeout 0 -exist"
    assert "add secbot_bad_ips 1.2.3.4" in payload
    assert "add secbot_bad_ips 5.6.7.8" in payload
    assert "None" not in payload
    # idempotent: rewriting produces the same payload set
    write_ipset_payloads(ds, out, set_name="secbot_bad_ips")
    assert read_ipset_payload(out) == payload


def test_rules_file_merge_semantics(tmp_path):
    """Mirror of ref test_defense.py:57-98: exact lines, one reload,
    second merge preserves prior IPs and SIDs."""
    from news_crawler_ray.stages.sidefx import write_rules_file

    path = str(tmp_path / "secbot.rules")
    reloads = []
    n = write_rules_file(["1.2.3.4", "5.6.7.8", "1.2.3.4"], path, base_sid=7000000,
                         reload_hook=lambda: reloads.append(1))
    assert n == 2 and reloads == [1]
    lines = open(path).read().splitlines()
    assert lines == [
        'drop ip 1.2.3.4 any <> any any (msg:"SecBot malicious IP 1.2.3.4"; sid:7000001; rev:1;)',
        'drop ip 5.6.7.8 any <> any any (msg:"SecBot malicious IP 5.6.7.8"; sid:7000002; rev:1;)',
    ]
    # merge: prior lines verbatim, only the new IP appended, one more reload
    n = write_rules_file(["5.6.7.8", "9.9.9.9"], path, base_sid=7000000,
                         reload_hook=lambda: reloads.append(1))
    assert n == 3 and reloads == [1, 1]
    lines2 = open(path).read().splitlines()
    assert lines2[:2] == lines
    assert lines2[2].startswith('drop ip 9.9.9.9 ') and "sid:7000003" in lines2[2]
    # no new IPs → no reload, file untouched
    before = open(path).read()
    assert write_rules_file(["9.9.9.9"], path, reload_hook=lambda: reloads.append(1)) == 3
    assert reloads == [1, 1] and open(path).read() == before


def test_digest_renderers():
    from news_crawler_ray.stages.sidefx import render_digest_sections

    news = [{"title": "t1", "link": "l1"}]
    adv = [{"title": "a1", "link": "al1"}]
    iocs = [{"kind": "ip", "value": "1.2.3.4"}, {"kind": "url", "value": "http://x"}]
    msgs = render_digest_sections(news, adv, iocs, "2025-06-20")
    assert len(msgs) == 5  # news ×2, advisories ×2, ioc ×1 (team only)
    assert msgs[0]["subject"] == "[관제공화국] 보안정보뉴스 2025-06-20"
    assert "- [t1](l1)" in msgs[0]["body"]
    ioc_msg = msgs[-1]
    assert ioc_msg["to"] == ["team@example.com"]
    assert "- IP (1):" in ioc_msg["body"] and "    - 1.2.3.4" in ioc_msg["body"]
    assert "- HASH (0):" in ioc_msg["body"]
    # advisories skipped entirely when empty (gmail.py:216-219)
    msgs2 = render_digest_sections(news, [], iocs, "2025-06-20")
    assert len(msgs2) == 3
    # K2 naver variant body shape (naverMail.py:68)
    naver = render_digest_sections(news, adv, iocs, "2025-06-20", style="naver")
    assert naver[0]["body"] == "- t1: l1"


def test_hash_list_file(tmp_path):
    from news_crawler_ray.stages.sidefx import write_hash_list_file

    lp, rp = str(tmp_path / "hashes.txt"), str(tmp_path / "hash.rules")
    reloads = []
    n = write_hash_list_file(["ABCD ", "abcd", "ffff"], lp, rp,
                             reload_hook=lambda: reloads.append(1))
    assert n == 2
    assert open(lp).read() == "abcd\nffff\n"  # overwrite, sorted lowercase distinct
    rule = open(rp).read()
    assert rule.count("filemd5:hashes.txt") == 1 and "sid:7200000" in rule
    # second call: list overwritten, rule NOT duplicated
    write_hash_list_file(["abcd"], lp, rp, reload_hook=lambda: reloads.append(1))
    assert open(lp).read() == "abcd\n"
    assert open(rp).read().count("filemd5") == 1
    assert reloads == [1, 1]
