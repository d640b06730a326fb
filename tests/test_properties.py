"""Property-based tests (hypothesis) over the PURE batch kernels.

These exercise the vectorized kernels directly — no Ray session needed —
so hypothesis can run many examples cheaply. Each property is an
invariant the distributed operators rely on.
"""

from __future__ import annotations

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from news_crawler_ray.functions import urlnorm
from news_crawler_ray.ops.sampling import fraction_threshold_hex, hash_sample_batch
from news_crawler_ray.ops.text import token_stats_batch
from news_crawler_ray.stages.dedup import keep_best_batch

url_text = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=40
)
urls = st.builds(
    lambda host, path: f"http://{host}.test/{path}",
    st.text(alphabet="abcdefXYZ", min_size=1, max_size=10),
    url_text,
)


@settings(max_examples=50, deadline=None)
@given(st.lists(urls, min_size=1, max_size=30))
def test_canonicalize_idempotent(us):
    """canonicalize(canonicalize(x)) == canonicalize(x) — the dedup
    identity must be a fixpoint or seen-keys would drift between waves."""
    once = urlnorm.canonicalize_array(pa.array(us, pa.string()))
    twice = urlnorm.canonicalize_array(once)
    assert once.equals(twice)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=30))
def test_token_stats_whitespace_exact(texts):
    """n_tokens == number of runs of non-[\\t\\n\\f\\r ] — RE2's exact
    \\s class, shared by pyarrow and the DuckDB oracle. Neither Python
    str.split() (splits on unicode spaces like \\xa0) nor re.ASCII \\s
    (includes \\x0b, which RE2 excludes) is the right reference —
    hypothesis found both divergences."""
    import re

    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = token_stats_batch(t)
    for s, n in zip(texts, out["n_tokens"].to_pylist()):
        assert n == len(re.findall(r"[^\t\n\f\r ]+", s))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_hash_sample_monotone_in_fraction(ids, f):
    """A smaller fraction's sample is a subset of a larger fraction's —
    the property that makes hash sampling resumable/incremental."""
    t = pa.table({"doc_id": pa.array(sorted(set(ids)), pa.int64())})
    small = set(hash_sample_batch(t, "doc_id", fraction=f / 2)["doc_id"].to_pylist())
    big = set(hash_sample_batch(t, "doc_id", fraction=f)["doc_id"].to_pylist())
    assert small <= big
    assert set(hash_sample_batch(t, "doc_id", fraction=1.0)["doc_id"].to_pylist()) == set(
        t["doc_id"].to_pylist()
    )
    assert fraction_threshold_hex(0.0) == "00000000"


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2", "u3"]),  # url (the dedup key)
            st.floats(min_value=0, max_value=5),  # priority
        ),
        min_size=1,
        max_size=50,
    )
)
def test_keep_best_batch_properties(rows):
    """keep_best: one row per key, it has the key's max priority, and
    output rows all come from the input."""
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "priority": pa.array([r[1] for r in rows], pa.float64()),
            "discovered_at": pa.array([0] * len(rows), pa.timestamp("us")),
        }
    )
    out = keep_best_batch(t, key="url")
    best: dict = {}
    for u, p in rows:
        best[u] = max(best.get(u, -1.0), p)
    got = dict(zip(out["url"].to_pylist(), out["priority"].to_pylist()))
    assert got == best


def test_wet_roundtrip_property(ray_session, tmp_path):
    """Property: ANY unicode payload (header-lookalikes, CRLF runs,
    blank, multibyte) survives the WET write→read cycle byte-exactly,
    at any shard count."""
    from hypothesis import given, settings, strategies as st

    import pyarrow as pa

    from news_crawler_ray.sources.wet import parse_wet_bytes, wet_record_bytes

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.text(max_size=200),
            min_size=1,
            max_size=8,
        )
    )
    def check(texts):
        data = b"".join(
            wet_record_bytes(i, f"https://h{i}.example/p{i}", t)
            for i, t in enumerate(texts)
        )
        out = parse_wet_bytes(data)
        assert out["text"].to_pylist() == texts
        assert out["rec_id"].to_pylist() == list(range(len(texts)))
        assert out["n_bytes"].to_pylist() == [
            len(t.encode("utf-8")) for t in texts
        ]

    check()


def test_wav_codec_roundtrip_property():
    """Property: ANY int16 sample array at any common rate round-trips
    the RIFF/WAVE encode→decode byte-exactly, and the envelope hash is
    invariant to container round-trips."""
    from hypothesis import given, settings, strategies as st

    import numpy as np

    from news_crawler_ray.fixtures.codec import decode_wav, encode_wav
    from news_crawler_ray.ops.multimodal import audio_envelope_hash64

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=0,
            max_size=400,
        ),
        st.sampled_from([8000, 16000, 22050, 44100]),
    )
    def check(vals, rate):
        samples = np.array(vals, dtype=np.int16)
        data = encode_wav(samples, rate)
        back, r2 = decode_wav(data)
        assert r2 == rate
        assert (back == samples).all()
        assert audio_envelope_hash64(back) == audio_envelope_hash64(samples)

    check()


def test_video_container_roundtrip_property():
    """Property: any list of PNG frames (arbitrary small dims per
    video) round-trips the NCV1 container byte-exactly, and sampled
    decode equals full decode at the sampled indices."""
    from hypothesis import given, settings, strategies as st

    import numpy as np

    from news_crawler_ray.fixtures.codec import (
        decode_video_frames,
        encode_video,
        video_info,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=2, max_value=12),
        st.integers(min_value=2, max_value=12),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.integers(min_value=1, max_value=3),
    )
    def check(n_frames, h, w, seed, every):
        rng = np.random.default_rng(seed)
        frames = [
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n_frames)
        ]
        data = encode_video(frames, 24, "png")
        assert video_info(data) == (24, "png", n_frames)
        full = decode_video_frames(data)
        for i, px in full:
            assert (px == frames[i]).all()
        want = list(range(0, n_frames, every))
        sampled = decode_video_frames(data, want)
        assert [i for i, _ in sampled] == want
        for i, px in sampled:
            assert (px == frames[i]).all()

    check()
