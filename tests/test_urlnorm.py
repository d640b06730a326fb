import hashlib

import pyarrow as pa

from news_crawler_ray.functions import urlnorm


def test_canonicalize_rules():
    cases = {
        "https://NEWS0.Example.COM/p/img00000001": "https://news0.example.com/p/img00000001",
        "https://news1.example.com:443/p/a": "https://news1.example.com/p/a",
        "http://news1.example.com:80/p/a": "http://news1.example.com/p/a",
        "http://news1.example.com:8080/p/a": "http://news1.example.com:8080/p/a",
        "https://news2.example.com/p/a?": "https://news2.example.com/p/a",
        "https://news3[.]example[.]com/p/a": "https://news3.example.com/p/a",
        "https[:]//news3[.]example[.]com/p/a": "https://news3.example.com/p/a",
        "https://news4.example.com": "https://news4.example.com/",
        "https://news5.example.com/p/%61%62": "https://news5.example.com/p/ab",
        "https://news6.example.com/p/a#frag": "https://news6.example.com/p/a",
        "https://news7.example.com/p/a?q=1": "https://news7.example.com/p/a?q=1",
        "  https://news8.example.com/p/a  ": "https://news8.example.com/p/a",
        "news9.example.com/p/a": "http://news9.example.com/p/a",
        "https://news0.example.com/p/img0": "https://news0.example.com/p/img0",
    }
    out = urlnorm.canonicalize_array(pa.array(list(cases))).to_pylist()
    for (raw, want), got in zip(cases.items(), out):
        assert got == want, f"{raw!r}: {got!r} != {want!r}"


def test_fast_path_is_identity():
    urls = [f"https://news{i}.example.com/p/img{i:08d}" for i in range(100)]
    assert urlnorm.canonicalize_array(pa.array(urls)).to_pylist() == urls


def test_sha1_matches_hashlib():
    urls = ["https://a.b/c", "https://d.e/f"]
    keys = urlnorm.sha1_array(pa.array(urls)).to_pylist()
    for u, k in zip(urls, keys):
        assert k == hashlib.sha1(u.encode()).digest()
        assert len(k) == 20


def test_host_and_shard():
    canon = pa.array(
        ["https://news0.example.com/p/a", "https://x.y:8080/p/b"]
    )
    assert urlnorm.host_array(canon).to_pylist() == [
        "news0.example.com",
        "x.y:8080",
    ]
    keys = urlnorm.sha1_array(canon)
    shards = urlnorm.shard_array(keys, 8)
    assert len(shards) == 2
    for key, s in zip(keys.to_pylist(), shards):
        assert urlnorm.shard_of(key, 8) == s


def test_refang():
    arr = pa.array(["1[.]2[.]3[.]4", "https[:]//a[.]b/c"])
    assert urlnorm.refang(arr).to_pylist() == ["1.2.3.4", "https://a.b/c"]


def test_url_trap_flags_signals():
    import pyarrow as pa

    from news_crawler_ray.functions.urlnorm import url_trap_flags

    t = pa.table(
        {
            "url": [
                "http://a.com/x/y/p.html",                          # clean
                "http://a.com/cal/cal/cal/p.html",                  # loop trap
                "http://a.com/" + "/".join(f"s{i}" for i in range(10)) + "/p.html",
                "http://a.com/x/p.html?session=" + "f" * 70,        # qs bloat
                "http://a.com",                                     # no path
            ]
        }
    )
    got = {r["url"]: r for r in url_trap_flags(t).to_pylist()}
    assert not got["http://a.com/x/y/p.html"]["is_trap"]
    assert got["http://a.com/cal/cal/cal/p.html"]["max_seg_repeat"] == 3
    assert got["http://a.com/cal/cal/cal/p.html"]["is_trap"]
    deep = [r for r in got.values() if r["depth"] == 11]
    assert deep and deep[0]["is_trap"]
    qs = got["http://a.com/x/p.html?session=" + "f" * 70]
    assert qs["qs_len"] == 78 and qs["is_trap"]
    bare = got["http://a.com"]
    assert bare["depth"] == 0 and bare["max_seg_repeat"] == 0 and not bare["is_trap"]
    # empty batch keeps the schema
    assert url_trap_flags(t.slice(0, 0)).num_rows == 0


def test_registrable_domain_suffix_handling():
    """Multi-label public suffixes keep three labels, plain TLDs keep
    two, bare hosts pass through."""
    import pyarrow as pa

    from news_crawler_ray.functions.urlnorm import registrable_domain

    hosts = pa.array(
        [
            "news.bbc.co.uk",
            "www.bbc.co.uk",
            "deep.sub.example.com.au",
            "www.example.com",
            "example.com",
            "localhost",
            "a.b.c.gov.uk",
        ],
        pa.string(),
    )
    assert registrable_domain(hosts).to_pylist() == [
        "bbc.co.uk",
        "bbc.co.uk",
        "example.com.au",
        "example.com",
        "example.com",
        "localhost",
        "c.gov.uk",
    ]
