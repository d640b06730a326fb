"""Tests for training-data operators: dedup, similarity, text, multimodal."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def docs_tbl():
    return pq.read_table(DOCS)


@pytest.fixture(scope="module")
def emb_tbl():
    return pq.read_table(EMB)


def _planted_docs(docs_tbl, mutate):
    """Union docs with mutated copies at doc_id + 1_000_000."""
    texts = docs_tbl["text"].to_pylist()
    mut = [mutate(s) for s in texts]
    mt = docs_tbl.set_column(
        docs_tbl.schema.get_field_index("text"), "text", pa.array(mut, pa.string())
    )
    mt = mt.set_column(
        mt.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array(np.asarray(docs_tbl["doc_id"]) + 1_000_000, pa.int64()),
    )
    return pa.concat_tables([docs_tbl, mt])


# ----------------------------------------------------------- hashing


def test_hashing_primitives():
    from news_crawler_ray.ops import hashing as H

    texts = pa.array(["a b c d e f", "a b c d e f", "x y", "", "a  b  c d e f ", None])
    h, off = H.tokenize_batch(texts)
    assert off.tolist() == [0, 6, 12, 14, 14, 20, 20]
    sh, soff = H.shingle_hashes(h, off, 5)
    sig = H.minhash_signatures(sh, soff, 32)
    assert sig.shape == (6, 32)
    assert (sig[0] == sig[1]).all() and (sig[0] == sig[4]).all()
    assert (sig[3] == np.iinfo(np.uint64).max).all()
    s = H.simhash64(h, off)
    assert s[0] == s[1] == s[4]
    assert H.hamming_distance64(s[:1], s[1:2])[0] == 0


# ------------------------------------------------------------- dedup


def test_exact_dedup(ray_session, docs_tbl):
    import ray.data as rd

    from news_crawler_ray.ops.dedup import exact_dedup

    both = _planted_docs(docs_tbl, lambda s: s)  # verbatim copies
    kept = exact_dedup(rd.from_arrow(both)).take_all()
    assert len(kept) == docs_tbl.num_rows
    assert all(r["doc_id"] < 1_000_000 for r in kept)  # min-id wins


def test_minhash_lsh_and_verify(ray_session, docs_tbl):
    import ray.data as rd

    from news_crawler_ray.ops.dedup import minhash_lsh_pairs, ngram_jaccard_verify

    planted = rd.from_arrow(
        _planted_docs(docs_tbl, lambda s: " ".join(w for i, w in enumerate(s.split()) if i != 3))
    )
    pairs_ds = minhash_lsh_pairs(planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5)
    pairs = pairs_ds.take_all()
    found = sum(1 for r in pairs if r["id_b"] - r["id_a"] == 1_000_000)
    assert found > 0.85 * docs_tbl.num_rows  # recall on planted near-dups
    for r in pairs:
        assert r["id_a"] < r["id_b"] and 0.5 <= r["est_jaccard"] <= 1.0
    ver = ngram_jaccard_verify(pairs_ds, planted, threshold=0.0).take_all()
    assert len(ver) == len(pairs)
    planted_j = [r["jaccard"] for r in ver if r["id_b"] - r["id_a"] == 1_000_000]
    # one-word-drop keeps most shingles; short docs lose a larger share
    assert min(planted_j) > 0.3 and np.median(planted_j) > 0.7


def test_simhash_near_dup(ray_session, docs_tbl):
    import ray.data as rd

    from news_crawler_ray.ops.dedup import simhash_near_dup_pairs

    # swap two words: simhash is order-insensitive over tokens, so the
    # mutated copy has hamming 0 and MUST be found
    def swap(s):
        w = s.split()
        if len(w) >= 2:
            w[0], w[1] = w[1], w[0]
        return " ".join(w)

    planted = rd.from_arrow(_planted_docs(docs_tbl, swap))
    pairs = simhash_near_dup_pairs(planted, max_hamming=3).take_all()
    found = sum(1 for r in pairs if r["id_b"] - r["id_a"] == 1_000_000)
    assert found == docs_tbl.num_rows  # distance 0: always caught
    for r in pairs:
        assert r["hamming"] <= 3


def test_embedding_cosine_pairs(ray_session, emb_tbl):
    import ray.data as rd

    from news_crawler_ray.ops.dedup import embedding_cosine_pairs

    E = np.array(emb_tbl["embedding"].to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(3)
    E2 = E + rng.standard_normal(E.shape) * 0.01
    n = len(E)
    tab = pa.table(
        {
            "vec_id": pa.array(
                np.concatenate([np.arange(n), np.arange(n) + 1_000_000]), pa.int64()
            ),
            "embedding": pa.array(
                np.concatenate([E, E2]).tolist(), pa.list_(pa.float32())
            ),
        }
    )
    pairs = embedding_cosine_pairs(rd.from_arrow(tab), threshold=0.98).take_all()
    found = sum(1 for r in pairs if r["id_b"] - r["id_a"] == 1_000_000)
    assert found == n  # multi-table LSH recalls all near-identical pairs
    for r in pairs:
        assert r["cosine"] >= 0.98


# --------------------------------------------------------- similarity


def test_knn_brute_force_matches_numpy(ray_session, emb_tbl):
    import ray.data as rd

    from news_crawler_ray.ops.similarity import knn_brute_force

    E = np.array(emb_tbl["embedding"].to_pylist(), dtype=np.float64)
    q_ids = np.arange(7)
    out = knn_brute_force(rd.from_arrow(emb_tbl), q_ids, E[:7], k=10).take_all()
    assert len(out) == 70
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = En[:7] @ En.T
    for qi in range(7):
        S[qi, qi] = -np.inf
        want = set(np.argsort(-S[qi])[:10].tolist())
        got = {r["neighbor_id"] for r in out if r["query_id"] == qi}
        assert got == want


def test_knn_ivf_recall(ray_session, emb_tbl):
    import ray.data as rd

    from news_crawler_ray.ops.similarity import knn_brute_force, knn_ivf, train_centroids

    E = np.array(emb_tbl["embedding"].to_pylist(), dtype=np.float64)
    C = train_centroids(E, nlist=16)
    q_ids = np.arange(5)
    exact = knn_brute_force(rd.from_arrow(emb_tbl), q_ids, E[:5], k=10).take_all()
    approx = knn_ivf(rd.from_arrow(emb_tbl), q_ids, E[:5], C, k=10, nprobe=8).take_all()
    # IVF with nprobe=8/16 recalls most exact neighbors
    recall = 0
    for qi in range(5):
        want = {r["neighbor_id"] for r in exact if r["query_id"] == qi}
        got = {r["neighbor_id"] for r in approx if r["query_id"] == qi}
        recall += len(want & got) / len(want)
    assert recall / 5 >= 0.5


# --------------------------------------------------------------- text


def test_token_stats_exact(ray_session, docs_tbl):
    import ray.data as rd

    from news_crawler_ray.ops.text import token_stats

    out = {r["doc_id"]: r for r in token_stats(rd.from_arrow(docs_tbl)).take_all()}
    for did, txt in zip(docs_tbl["doc_id"].to_pylist()[:50], docs_tbl["text"].to_pylist()[:50]):
        assert out[did]["n_tokens"] == len(txt.split())
        assert out[did]["n_chars_measured"] == len(txt)


def test_quality_and_langid(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.text import detect_language, quality_score

    rows = [
        {"doc_id": 1, "text": "the cat and the dog of the house went to the market"},
        {"doc_id": 2, "text": "le chat et la maison dans les rues de paris"},
        {"doc_id": 3, "text": "der hund ist nicht mit das haus und ein garten"},
        {"doc_id": 4, "text": "el gato es una casa para los perros pero como"},
        {"doc_id": 5, "text": "zz"},
    ]
    ds = rd.from_items(rows)
    lang = {r["doc_id"]: r["lang_pred"] for r in detect_language(ds).take_all()}
    assert lang == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "und"}
    q = {r["doc_id"]: r for r in quality_score(ds).take_all()}
    assert q[1]["n_tokens"] == 12 and q[1]["n_stopwords"] >= 5
    assert 0 <= q[5]["quality_score"] < q[1]["quality_score"] <= 1


def test_fingerprint_md5(ray_session, docs_tbl):
    import ray.data as rd

    from news_crawler_ray.ops.text import fingerprint

    out = {r["doc_id"]: r for r in fingerprint(rd.from_arrow(docs_tbl)).take_all()}
    for did, txt in zip(docs_tbl["doc_id"].to_pylist()[:20], docs_tbl["text"].to_pylist()[:20]):
        assert out[did]["md5"] == hashlib.md5(txt.encode()).hexdigest()
    assert len({r["fingerprint64"] for r in out.values()}) == len(out)  # distinct texts


# ---------------------------------------------------------- multimodal


def test_image_features_and_resize(ray_session):
    import ray.data as rd

    from news_crawler_ray.fixtures import codec, synth
    from news_crawler_ray.ops.multimodal import image_features, resize_images

    ps = synth.make_pagestore(40, seed=42)
    feats = image_features(rd.from_arrow(ps), concurrency=1).take_all()
    assert len(feats) == 40
    stored = dict(zip(ps["image_id"].to_pylist(), ps["phash"].to_pylist()))
    fmts = dict(zip(ps["image_id"].to_pylist(), ps["fmt"].to_pylist()))
    for r in feats:
        assert r["decode_ok"]
        # pixel-level invariant: lossless roundtrip -> identical phash;
        # lossy -> perceptually identical (tiny hamming drift allowed)
        dist = bin(r["phash_check"] ^ stored[r["image_id"]]).count("1")
        assert dist == 0 if fmts[r["image_id"]] == "png" else dist <= 4
        assert 0 <= r["mean_r"] <= 255

    small = resize_images(rd.from_arrow(ps), 16, 16, concurrency=1).take_all()
    for r in small[:10]:
        px = codec.decode(r["bytes"], r["fmt"])
        assert px.shape == (16, 16, 3)
        assert r["w"] == 16 and r["h"] == 16


def test_audio_features_real_wav(ray_session):
    """Real WAV decode: features equal an explicit per-sample Python
    loop; corrupt payloads and metadata drift become decode_ok=False
    rows, not crashes."""
    import ray.data as rd

    from news_crawler_ray.fixtures import codec as fcodec
    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.ops.multimodal import audio_features

    store = synth.make_audiostore(12, seed=42)
    out = {
        r["audio_id"]: r
        for r in audio_features(rd.from_arrow(store), concurrency=1).take_all()
    }
    assert len(out) == 12
    for aid, buf, sr in zip(
        store["audio_id"].to_pylist(),
        store["bytes"].to_pylist(),
        store["sample_rate"].to_pylist(),
    ):
        samples, rate = fcodec.decode_wav(buf)
        assert rate == sr
        s_sq = peak = zc = 0
        prev_neg = None
        for s in samples.tolist():
            s_sq += s * s
            peak = max(peak, abs(s))
            neg = s < 0
            if prev_neg is not None and neg != prev_neg:
                zc += 1
            prev_neg = neg
        r = out[aid]
        assert r["decode_ok"]
        assert r["n_samples"] == len(samples)
        assert r["duration_us"] == len(samples) * 1_000_000 // rate
        assert r["sum_sq"] == s_sq
        assert r["peak"] == peak
        assert r["zero_cross"] == zc
        assert r["rms"] == pytest.approx((s_sq / len(samples)) ** 0.5)

    # row-level error semantics: corrupt bytes + rate drift
    from news_crawler_ray.ops.multimodal import AudioFeatureStage

    bad = pa.table(
        {
            "audio_id": pa.array(["x1", "x2"], pa.string()),
            "bytes": pa.array(
                [b"not a wav", store["bytes"][0].as_py()], pa.binary()
            ),
            "sample_rate": pa.array([8000, 44100], pa.int32()),  # x2: drift
            "fmt": pa.array(["wav", "wav"], pa.string()),
        }
    )
    rows = AudioFeatureStage()(bad).to_pylist()
    assert [r["decode_ok"] for r in rows] == [False, False]


def test_wav_codec_roundtrip():
    import numpy as np

    from news_crawler_ray.fixtures import codec as fcodec

    r = np.random.default_rng(7)
    samples = r.integers(-32768, 32768, size=1234, dtype=np.int64).astype("int16")
    data = fcodec.encode_wav(samples, 16000)
    back, rate = fcodec.decode_wav(data)
    assert rate == 16000
    assert (back == samples).all()
    # stdlib wave agrees the container is a real WAV
    import io
    import wave

    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == 1234
        assert w.readframes(1234) == samples.astype("<i2").tobytes()


def test_video_container_roundtrip_and_seek():
    import numpy as np

    from news_crawler_ray.fixtures import codec as fcodec

    r = np.random.default_rng(9)
    frames = [
        r.integers(0, 256, size=(24, 32, 3), dtype=np.uint8) for _ in range(7)
    ]
    data = fcodec.encode_video(frames, 24, "png")
    assert fcodec.video_info(data) == (24, "png", 7)
    # full decode round-trips byte-exactly (png lossless)
    for i, px in fcodec.decode_video_frames(data):
        assert (px == frames[i]).all()
    # sampled decode touches only requested frames
    got = fcodec.decode_video_frames(data, [0, 3, 6])
    assert [i for i, _ in got] == [0, 3, 6]
    # lossy fmt: PSNR >= 40 (input_hint invariant applies per frame)
    lossy = fcodec.encode_video(frames, 24, "jpeg")
    for i, px in fcodec.decode_video_frames(lossy):
        assert fcodec.psnr(px, frames[i]) >= 40


def test_video_frame_sample_stage(ray_session):
    """Sampled-frame features equal an explicit sequential decode of
    every wanted frame; sampling indices follow every_n."""
    import ray.data as rd

    from news_crawler_ray.fixtures import codec as fcodec
    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.ops.multimodal import sample_video_frames

    store = synth.make_videostore(8, seed=42)
    out = sample_video_frames(
        rd.from_arrow(store), every_n=5, concurrency=1
    ).take_all()
    by_vid: dict = {}
    for r in out:
        by_vid.setdefault(r["video_id"], []).append(r)
    for vid, buf in zip(store["video_id"].to_pylist(), store["bytes"].to_pylist()):
        _, fmt, n_frames = fcodec.video_info(buf)
        want = list(range(0, n_frames, 5))
        rows = sorted(by_vid[vid], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == want
        for r, (i, px) in zip(rows, fcodec.decode_video_frames(buf, want)):
            assert r["luma_sum"] == int(px.astype("int64").sum())
            assert r["n_px"] == px.shape[0] * px.shape[1]
            assert r["phash"] == fcodec.phash64(px)


def test_dedup_keep_min_id(ray_session, docs_tbl):
    import ray.data as rd

    from news_crawler_ray.ops.dedup import dedup_keep_min_id, minhash_lsh_pairs

    planted = rd.from_arrow(
        _planted_docs(docs_tbl, lambda s: " ".join(w for i, w in enumerate(s.split()) if i != 3))
    )
    pairs = minhash_lsh_pairs(planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5)
    ids = planted.select_columns(["doc_id"])
    kept = {r["doc_id"] for r in dedup_keep_min_id(pairs, ids).take_all()}
    # every pair's id_b is dropped; id_a side (min id) survives unless it
    # is itself some other pair's id_b
    dropped = {r["id_b"] for r in pairs.take_all()}
    all_ids = {r["doc_id"] for r in ids.take_all()}
    assert kept == all_ids - dropped
    assert kept and dropped


def test_modmul_add_matches_bigint():
    """_modmul_add must be the exact (a*x+b) mod 2^61-1 family it claims."""
    from news_crawler_ray.ops import hashing as H

    rng = np.random.default_rng(123)
    x = rng.integers(0, (1 << 61) - 1, size=64, dtype=np.uint64)
    x = np.concatenate([x, np.array([0, 1, (1 << 61) - 2], dtype=np.uint64)])
    a = rng.integers(1, 1 << 32, size=8, dtype=np.uint64)
    b = rng.integers(0, 1 << 32, size=8, dtype=np.uint64)
    got = H._modmul_add(x, a, b)
    M = (1 << 61) - 1
    for i, xi in enumerate(x.tolist()):
        for j, (aj, bj) in enumerate(zip(a.tolist(), b.tolist())):
            assert got[i, j] == (aj * xi + bj) % M


def test_lsh_bucket_cap_star_fallback(caplog):
    """An over-cap bucket emits a hub star (B-1 pairs, bucket stays
    connected for cluster resolution) and logs the dropped-pair count."""
    import logging

    from news_crawler_ray.ops.dedup import _bucket_pairs

    n = 300
    sig = pa.FixedSizeListArray.from_arrays(
        pa.array(np.zeros(n * 4, np.int64)), 4
    )
    g = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()), "sig": sig})
    with caplog.at_level(logging.WARNING, logger="news_crawler_ray.ops.dedup"):
        out = _bucket_pairs(g, "doc_id", 4, max_bucket=256)
    # star through the min-id hub: every other row paired with id 0
    assert out.num_rows == n - 1
    assert out["id_a"].to_pylist() == [0] * (n - 1)
    assert sorted(out["id_b"].to_pylist()) == list(range(1, n))
    assert any(
        "star-fallback" in r.message and "dropped_pairs" in r.message
        for r in caplog.records
    )


def test_token_stats_edge_whitespace(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.text import token_stats

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["a ", "  a  b ", "   ", "", None], pa.string()),
        }
    )
    out = {r["doc_id"]: r["n_tokens"] for r in token_stats(rd.from_arrow(tbl)).take_all()}
    assert out == {1: 1, 2: 2, 3: 0, 4: 0, 5: 0}


def test_partial_group_agg_matches_groupby(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.agg import partial_group_agg

    rows = [
        {"k": f"k{i % 3}", "j": i % 2, "v": float(i % 7)} for i in range(1000)
    ]
    ds = rd.from_items(rows).repartition(8)
    got = partial_group_agg(
        ds,
        ["k", "j"],
        [("sum_v", "sum", "v"), ("n", "count_all", None), ("max_v", "max", "v")],
    )
    # independent reference: plain python accumulation
    want: dict = {}
    for r in rows:
        s = want.setdefault((r["k"], r["j"]), [0.0, 0, float("-inf")])
        s[0] += r["v"]
        s[1] += 1
        s[2] = max(s[2], r["v"])
    assert got.num_rows == len(want)
    for row in got.to_pylist():
        s = want[(row["k"], row["j"])]
        assert row["sum_v"] == s[0] and row["n"] == s[1] and row["max_v"] == s[2]
    # empty input stays schema-stable
    empty = partial_group_agg(
        rd.from_arrow(pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.float64())})),
        ["k"],
        [("sum_v", "sum", "v")],
    )
    assert empty.num_rows == 0 and empty.column_names == ["k", "sum_v"]


def test_hash_sample_deterministic_and_stratified(ray_session):
    """Content-stable sampling: same rows kept across reruns and block
    layouts; per-stratum fractions land near their targets."""
    import hashlib

    import ray.data as rd

    from news_crawler_ray.ops import sampling as sp

    n = 4000
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(["en" if i % 2 else "de" for i in range(n)]),
        }
    )
    fr = {"en": 0.5, "de": 0.1}
    a = sp.hash_sample(rd.from_arrow(tbl), "doc_id", strata_col="lang", fractions=fr)
    b = sp.hash_sample(
        rd.from_arrow(tbl).repartition(7), "doc_id", strata_col="lang", fractions=fr
    )
    ids_a = sorted(r["doc_id"] for r in a.take_all())
    ids_b = sorted(r["doc_id"] for r in b.take_all())
    assert ids_a == ids_b  # layout-independent
    # independent reference: direct md5 threshold check
    for r in a.take_all():
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8]
        assert h < sp.fraction_threshold_hex(fr[r["lang"]])
    n_en = sum(1 for i in ids_a if i % 2)
    n_de = len(ids_a) - n_en
    assert abs(n_en / (n / 2) - 0.5) < 0.05
    assert abs(n_de / (n / 2) - 0.1) < 0.05
    # uniform mode: fraction 0 keeps nothing, 1.0 keeps ~all
    assert sp.hash_sample(rd.from_arrow(tbl), "doc_id", fraction=0.0).count() == 0


def test_flag_contaminated(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.text import flag_contaminated

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "clean document about nothing in particular",
                "prefix then the quick brown fox appears here",
            ],
        }
    )
    out = flag_contaminated(rd.from_arrow(docs), ["the quick brown fox"]).take_all()
    flags = {r["doc_id"]: r["contaminated"] for r in out}
    assert flags == {0: True, 1: False, 2: True}


def test_redact_pii_batch():
    from news_crawler_ray.ops.text import redact_pii_batch

    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": ["mail a.b+c@ex.co.uk tel 555-0142 or 555.9999 host 10.0.0.255 end"],
        }
    )
    out = redact_pii_batch(t)["text_redacted"][0].as_py()
    assert out == "mail [EMAIL] tel [PHONE] or [PHONE] host [IP] end"


def test_kmeans_distributed_matches_sequential(ray_session):
    """The distributed Lloyd pass (per-block partials, block-order
    reduce) must be bit-identical to the sequential oracle over the same
    block plan, and should separate the fixture's planted label space."""
    from news_crawler_ray.pipelines.expected import expected_kmeans
    from news_crawler_ray.pipelines.queries import q_kmeans_clusters

    sf = "/root/testdata/sf0.001"
    got = {r["vec_id"]: r["cluster"] for r in q_kmeans_clusters(sf).take_all()}
    want_tbl = expected_kmeans(sf)
    want = dict(zip(want_tbl["vec_id"].to_pylist(), want_tbl["cluster"].to_pylist()))
    assert got == want
    assert len(set(got.values())) > 1  # not a degenerate single cluster


def test_hash_sample_null_strata_and_keep_all(ray_session):
    """Null strata fall back to default_fraction (no crash); a 1.0
    fraction keeps the WHOLE stratum, including digests at ffffffff."""
    import ray.data as rd

    from news_crawler_ray.ops import sampling as sp

    tbl = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "lang": pa.array((["de", None, "en"] * 100)[:300]),
        }
    )
    out = sp.hash_sample(
        rd.from_arrow(tbl), "doc_id", strata_col="lang",
        fractions={"de": 1.0, "en": 0.0}, default_fraction=0.0,
    ).take_all()
    assert {r["lang"] for r in out} == {"de"}
    assert sum(1 for r in out) == 100  # de kept whole
    assert sp.fraction_threshold_hex(1.0) == "g"


def test_sessionize_matches_bruteforce(ray_session):
    """Gap sessions across block boundaries equal a plain-Python
    per-user scan, including users whose rows straddle sort blocks."""
    import ray.data as rd

    from news_crawler_ray.ops.window import sessionize

    rng_rows = []
    t = 0
    for i in range(600):
        t += (i * 7919) % 50 * 60_000_000  # deterministic 0..49 min gaps
        rng_rows.append({"event_id": i, "user_id": i % 7, "ts_us": t})
    tbl = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rng_rows], pa.int64()),
            "user_id": pa.array([r["user_id"] for r in rng_rows], pa.int64()),
            "ts": pa.array([r["ts_us"] for r in rng_rows], pa.timestamp("us")),
        }
    )
    got = sorted(
        (
            (r["user_id"], r["session_num"], r["n_events"], r["session_start_us"], r["session_end_us"])
            for r in sessionize(rd.from_arrow(tbl).repartition(8), gap_minutes=30).take_all()
        )
    )
    # brute force
    want = []
    by_user: dict = {}
    for r in sorted(rng_rows, key=lambda r: (r["user_id"], r["ts_us"], r["event_id"])):
        u = r["user_id"]
        s = by_user.get(u)
        if s is None or r["ts_us"] - s["end"] > 30 * 60_000_000:
            if s is not None:
                want.append((u, s["num"], s["n"], s["start"], s["end"]))
            num = 1 if s is None else s["num"] + 1
            by_user[u] = {"num": num, "n": 1, "start": r["ts_us"], "end": r["ts_us"]}
        else:
            s["n"] += 1
            s["end"] = r["ts_us"]
    for u, s in by_user.items():
        want.append((u, s["num"], s["n"], s["start"], s["end"]))
    assert got == sorted(want)


# --------------------------------------------------------------------------
# Corpus term statistics: top_terms / repetition_stats / term_search /
# tumbling windows — brute-force Python oracles
# --------------------------------------------------------------------------


def _term_docs():
    texts = [
        "a b b c c c",          # top token 'c' ×3
        "  a   a\tb\n",         # edge whitespace: 3 tokens, a×2
        "",                     # empty → zeros
        None,                   # null → zeros
        "x x x x x",            # single repeated token
        "a b c d e f",          # all unique
    ]
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


def _brute_counts(tbl):
    from collections import Counter

    per_doc, corpus = {}, Counter()
    for r in tbl.to_pylist():
        toks = (r["text"] or "").split()
        per_doc[r["doc_id"]] = Counter(toks)
        corpus.update(toks)
    return per_doc, corpus


def test_repetition_stats_matches_brute(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.text import repetition_stats

    tbl = _term_docs()
    per_doc, _ = _brute_counts(tbl)
    got = {r["doc_id"]: r for r in repetition_stats(rd.from_arrow(tbl).repartition(3)).take_all()}
    for did, cnt in per_doc.items():
        assert got[did]["n_tokens"] == sum(cnt.values())
        assert got[did]["n_unique_tokens"] == len(cnt)
        assert got[did]["top_token_count"] == (max(cnt.values()) if cnt else 0)


def test_top_terms_exact_with_ties(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.text import top_terms

    tbl = _term_docs()
    _, corpus = _brute_counts(tbl)
    want = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    out = top_terms(rd.from_arrow(tbl).repartition(3), k=4)
    got = [(r["term"], r["n"]) for r in out.to_pylist()]
    assert got == want


def test_term_search_topk_and_ties(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.text import term_search

    tbl = _term_docs()
    per_doc, _ = _brute_counts(tbl)
    terms = ["a", "x", "zzz"]  # zzz absent from the corpus
    out = term_search(rd.from_arrow(tbl).repartition(3), terms, k=2)
    got = sorted((r["term"], r["doc_id"], r["tf"]) for r in out.to_pylist())
    want = []
    for t in terms:
        ranked = sorted(
            ((d, c[t]) for d, c in per_doc.items() if c[t] > 0),
            key=lambda dc: (-dc[1], dc[0]),
        )[:2]
        want += [(t, d, n) for d, n in ranked]
    assert got == sorted(want)


@pytest.mark.parametrize("exchange", ["partial", "sorted"])
def test_tumbling_window_agg_matches_brute(ray_session, exchange):
    import ray.data as rd

    from news_crawler_ray.ops.window import tumbling_window_agg

    rng = np.random.default_rng(11)
    n = 500
    ts = np.sort(rng.integers(0, 6 * 3600, n)) * 1_000_000  # 6 hours in us
    kinds = rng.choice(["a", "b"], n)
    vals = rng.integers(1, 100, n).astype(np.float64)
    tbl = pa.table(
        {"ts": pa.array(ts, pa.timestamp("us")),
         "event_type": pa.array(kinds.tolist(), pa.string()),
         "value": pa.array(vals, pa.float64())}
    )
    out = tumbling_window_agg(
        rd.from_arrow(tbl).repartition(7),
        "ts", ["event_type"],
        [("n_events", "count_all", None), ("max_value", "max", "value")],
        unit="hour", exchange=exchange,
    )
    rows = out.to_pylist() if isinstance(out, pa.Table) else out.take_all()
    got = sorted((r["window_start"], r["event_type"], r["n_events"], r["max_value"]) for r in rows)
    brute = {}
    for t, k, v in zip(ts, kinds, vals):
        key = (int(t // 3_600_000_000) * 3_600_000_000, k)
        cur = brute.get(key, (0, -np.inf))
        brute[key] = (cur[0] + 1, max(cur[1], v))
    import datetime

    want = sorted(
        (datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=w), k, c, m)
        for (w, k), (c, m) in brute.items()
    )
    assert got == want


def test_group_quantiles_matches_duckdb_convention(ray_session):
    import math

    import ray.data as rd

    from news_crawler_ray.ops.agg import group_quantiles

    rng = np.random.default_rng(5)
    keys = rng.choice(["a", "b", "c"], 400).tolist() + ["solo"]
    vals = np.concatenate([rng.normal(0, 10, 400), [3.25]])
    tbl = pa.table(
        {"k": pa.array(keys, pa.string()), "v": pa.array(vals, pa.float64())}
    )
    out = group_quantiles(
        rd.from_arrow(tbl).repartition(9), "k", "v", percents=(25, 50, 75)
    ).take_all()
    got = {(r["k"], r["pct"]): r["v"] for r in out}
    assert len(out) == 4 * 3
    by_key: dict = {}
    for k, v in zip(keys, vals):
        by_key.setdefault(k, []).append(v)
    for k, vs in by_key.items():
        vs = sorted(vs)
        n = len(vs)
        for p in (25, 50, 75):
            want = vs[max(0, math.ceil(p * n / 100) - 1)]
            assert got[(k, p)] == want, (k, p)


def test_top_ngrams_exact_no_cross_doc(ray_session):
    from collections import Counter

    import ray.data as rd

    from news_crawler_ray.ops.text import top_ngrams

    tbl = _term_docs()
    corpus = Counter()
    for r in tbl.to_pylist():
        toks = (r["text"] or "").split()
        corpus.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    want = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    out = top_ngrams(rd.from_arrow(tbl).repartition(3), n=2, k=5)
    got = [(r["term"], r["n"]) for r in out.to_pylist()]
    assert got == want
    # doc boundary: 'c c' from doc0 ×2 but never 'c a' across docs 0→1
    assert "c a" not in corpus and all(t != "c a" for t, _ in got)


def test_normalize_text_kernel():
    from news_crawler_ray.ops.text import normalize_text_batch

    tbl = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": pa.array(["  A\t\nB  c ", None, "étude"], pa.string())}
    )
    out = normalize_text_batch(tbl)
    assert out["text_norm"].to_pylist() == ["a b c", "", "\u00e9tude"]


def test_neardup_pagestore_planted_hamming():
    from news_crawler_ray.fixtures import codec, synth
    from news_crawler_ray.ops import hashing as H

    ps = synth.make_neardup_pagestore(12, seed=42, flip_cells=2)
    ps2 = synth.make_neardup_pagestore(12, seed=42, flip_cells=2)
    assert ps.equals(ps2)  # deterministic
    by_id = {
        i: np.uint64(np.int64(codec.phash64(codec.decode(b, f))))
        for i, b, f in zip(
            ps["image_id"].to_pylist(),
            ps["bytes"].to_pylist(),
            ps["fmt"].to_pylist(),
        )
    }
    for k in range(12):
        a = by_id[f"img{k:08d}"]
        b = by_id[f"dup{k:08d}"]
        d = int(H.hamming_distance64(np.array([a]), np.array([b]))[0])
        assert d == 2  # block-pattern plant flips EXACTLY flip_cells bits


def test_image_near_dup_pairs(ray_session):
    import ray.data as rd

    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.ops.multimodal import image_near_dup_pairs
    from news_crawler_ray.pipelines.queries import _neardup_iid

    ps = synth.make_neardup_pagestore(20, seed=7)
    withid = rd.from_arrow(_neardup_iid(ps).select(["iid", "bytes", "fmt"]))
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in image_near_dup_pairs(withid, concurrency=2, batch_size=16).take_all()
    )
    assert len(got) >= 20  # every planted (k, k+1e6) pair found
    planted = {(k, k + 1_000_000) for k in range(20)}
    assert planted <= set(got)


def test_image_cell_vectors_and_knn(ray_session):
    import ray.data as rd

    from news_crawler_ray.fixtures import codec, synth
    from news_crawler_ray.ops.multimodal import image_cell_vectors

    ps = synth.make_pagestore(24, seed=9)
    ids = pa.array(np.arange(24, dtype=np.int64))
    withid = rd.from_arrow(
        pa.table({"iid": ids, "bytes": ps["bytes"], "fmt": ps["fmt"]})
    )
    out = {r["iid"]: r["embedding"] for r in image_cell_vectors(withid).take_all()}
    assert len(out) == 24 and all(len(v) == 64 for v in out.values())
    # bit-identical to the sequential kernel on the same decode
    for k in (0, 7, 23):
        want = codec.cell_vector64(
            codec.decode(ps["bytes"][k].as_py(), ps["fmt"][k].as_py())
        )
        assert np.array_equal(np.asarray(out[k], dtype=np.float32), want)


def test_hash64_banding_exact_vs_bruteforce(ray_session):
    """Pigeonhole banding must find EXACTLY the brute-force pair set."""
    import ray.data as rd

    from news_crawler_ray.ops import hashing as H
    from news_crawler_ray.ops.dedup import hash64_near_dup_pairs

    rng = np.random.default_rng(17)
    base = rng.integers(0, 2**63 - 1, size=120, dtype=np.int64)
    # plant near copies at controlled distances 0..4 (4 must NOT pair)
    planted = []
    for i, d in enumerate([0, 1, 2, 3, 4] * 8):
        h = np.uint64(base[i])
        for bit in rng.choice(64, d, replace=False):
            h ^= np.uint64(1) << np.uint64(bit)
        planted.append(np.int64(h))
    hashes = np.concatenate([base, np.array(planted, dtype=np.int64)])
    ids = np.arange(len(hashes), dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "h": pa.array(hashes, pa.int64())})
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in hash64_near_dup_pairs(ds, hash_col="h", max_hamming=3).take_all()
    }
    hu = hashes.view(np.uint64)
    want = set()
    for x in range(len(ids)):
        dist = H.hamming_distance64(np.repeat(hu[x], len(ids) - x - 1), hu[x + 1 :])
        for off in np.nonzero(dist <= 3)[0]:
            want.add((x, x + 1 + int(off)))
    assert got == want and len(want) >= 32  # 0..3-bit plants all found


def test_chunk_documents_edges():
    from news_crawler_ray.ops.text import chunk_documents_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b c d e f g", "", None, " lone "], pa.string()),
        }
    )
    out = chunk_documents_batch(t, size=3, stride=2).to_pylist()
    # 7 tokens -> starts 0,2,4,6; empty/None -> no chunks; edge ws dropped
    assert [r["chunk"] for r in out if r["doc_id"] == 1] == [
        "a b c", "c d e", "e f g", "g"
    ]
    assert all(r["doc_id"] not in (2, 3) for r in out)
    assert [r["chunk"] for r in out if r["doc_id"] == 4] == ["lone"]
    # reconstruction: stride-24/size-32 chunks cover every token in order
    txt = " ".join(f"t{i}" for i in range(100))
    t2 = pa.table({"doc_id": pa.array([9], pa.int64()), "text": pa.array([txt])})
    chunks = chunk_documents_batch(t2, size=32, stride=24).to_pylist()
    rebuilt = chunks[0]["chunk"].split()
    for c in chunks[1:]:
        toks = c["chunk"].split()
        rebuilt.extend(toks[len(rebuilt) - c["chunk_id"] * 24 :])
    assert rebuilt == txt.split()


def test_tfidf_top_terms(ray_session):
    import math

    import ray.data as rd

    from news_crawler_ray.ops.text import tfidf_top_terms

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["rare rare common", "common other", "common unique unique unique"],
                pa.string(),
            ),
        }
    )
    out = tfidf_top_terms(rd.from_arrow(t), k=2).take_all()
    got = {(r["doc_id"], r["rank"]): r["term"] for r in out}
    # 'common' has df=3 -> idf=ln(1)=0, so it never wins rank 0
    assert got[(1, 0)] == "rare" and got[(2, 0)] == "other"
    assert got[(3, 0)] == "unique"
    assert all(got[(d, 0)] != "common" for d in (1, 2, 3))


def test_image_features_corrupt_bytes(ray_session):
    """Corrupted payloads must degrade to decode_ok=False rows, not
    crash the stage (row-level error columns, VERDICT T5 analog)."""
    import ray.data as rd

    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.ops.multimodal import image_features

    ps = synth.make_pagestore(12, seed=3)
    data = ps["bytes"].to_pylist()
    data[2] = b"not an image"
    data[7] = data[7][: len(data[7]) // 2]  # truncated payload
    broken = ps.set_column(
        ps.schema.get_field_index("bytes"), "bytes",
        pa.array(data, pa.large_binary()),
    )
    out = {r["image_id"]: r for r in image_features(rd.from_arrow(broken)).take_all()}
    assert len(out) == 12
    bad = {i for i, r in out.items() if not r["decode_ok"]}
    assert bad == {synth.image_id(2), synth.image_id(7)}
    for i, r in out.items():
        if i not in bad:
            assert r["phash_check"] is not None


def test_tensor_prep_normalization(ray_session):
    import ray.data as rd

    from news_crawler_ray.fixtures import codec, synth
    from news_crawler_ray.ops.multimodal import tensor_prep

    ps = synth.make_pagestore(8, seed=4)
    out = {r["image_id"]: r for r in tensor_prep(rd.from_arrow(ps), out=16).take_all()}
    assert len(out) == 8
    for iid, r in out.items():
        t = np.asarray(r["tensor"], dtype=np.float32)
        assert t.shape == (16 * 16 * 3,)
        assert -1.0 <= t.min() and t.max() <= 1.0
        # tensor is the exact affine of the integer crop/resize: its
        # channel sums must reproduce the int verification columns
        chw = t.reshape(3, 16, 16)
        for ch, name in enumerate(("sum_r", "sum_g", "sum_b")):
            q = np.rint((chw[ch] * 0.5 + 0.5) * 255.0).astype(np.int64)
            assert int(q.sum()) == r[name]


def test_dataset_split_disjoint_exhaustive_stable(ray_session):
    """train/val/test assignment is a partition (every row exactly one
    split), reproduces across reruns and block layouts, and lands near
    the requested fractions."""
    import ray.data as rd

    from news_crawler_ray.ops import sampling as sp

    ids = pa.table({"doc_id": pa.array(np.arange(4000, dtype=np.int64))})
    a = sp.dataset_split(rd.from_arrow(ids), "doc_id", 0.1, 0.2).to_pandas()
    b = (
        sp.dataset_split(
            rd.from_arrow(ids).repartition(13), "doc_id", 0.1, 0.2
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    a = a.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # parallelism-independent
    assert len(a) == 4000 and set(a["split"]) == {"train", "val", "test"}
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["test"] - 0.2) < 0.03 and abs(frac["val"] - 0.1) < 0.03
    # keep-all edge: test_fraction=1.0 sends everything to 'test'
    allt = sp.dataset_split(rd.from_arrow(ids), "doc_id", 0.0, 1.0).to_pandas()
    assert (allt["split"] == "test").all()


def test_image_meta_filter_edges(ray_session):
    """Boundary aspect ratio is kept (<=), null captions drop, fmt
    allowlist enforced, and bytes never needs to be present."""
    import ray.data as rd

    from news_crawler_ray.ops.multimodal import image_meta_filter

    cap8 = "a b c d e f g h"
    t = pa.table(
        {
            "image_id": pa.array([f"i{k}" for k in range(6)]),
            "w": pa.array([64, 128, 63, 64, 64, 130], pa.int32()),
            "h": pa.array([128, 64, 64, 64, 64, 64], pa.int32()),
            "fmt": pa.array(["png", "jpeg", "png", "gif", "png", "png"]),
            "caption": pa.array([cap8, cap8, cap8, cap8, None, cap8]),
        }
    )
    out = image_meta_filter(rd.from_arrow(t)).to_pandas()
    # i0/i1: aspect exactly 2 → kept; i2 min dim 63 → drop; i3 gif →
    # drop; i4 null caption → drop; i5 aspect 130/64 > 2 → drop
    assert sorted(out["image_id"]) == ["i0", "i1"]
    assert (out["n_caption_tokens"] == 8).all()


def test_semantic_dedup_drops_planted_copies(ray_session):
    """Planted noisy copies resolve to their originals (rep = min id of
    the within-cluster component); result is identical across block
    layouts; clean corpus drops nothing."""
    import ray.data as rd

    from news_crawler_ray.ops.dedup import semantic_dedup_ids
    from news_crawler_ray.ops.similarity import train_centroids

    rng = np.random.default_rng(5)
    # 4 well-separated anchor directions; base points jitter tightly
    # around an anchor so a noisy copy can never cross a cluster
    # boundary (boundary-crossing pairs are missed BY DESIGN — that is
    # the recall/cost knob, not what this test pins down)
    anchors = np.eye(16)[:4] * 3.0
    base = anchors[np.arange(120) % 4] + rng.standard_normal((120, 16)) * 0.5
    noisy = base + rng.standard_normal(base.shape) * 0.005
    V = np.concatenate([base, noisy])
    ids = np.concatenate([np.arange(120), np.arange(120) + 10_000])
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(V.tolist(), pa.list_(pa.float32())),
        }
    )
    C = train_centroids(V[:100], nlist=4)
    got = (
        semantic_dedup_ids(rd.from_arrow(tbl).repartition(7), C, threshold=0.999)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # every planted copy dropped, its original is the representative
    assert (got["vec_id"].to_numpy() == np.arange(120) + 10_000).all()
    assert (got["rep_id"].to_numpy() == np.arange(120)).all()
    again = (
        semantic_dedup_ids(rd.from_arrow(tbl).repartition(2), C, threshold=0.999)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert got.equals(again)
    clean = pa.table(
        {
            "vec_id": pa.array(np.arange(120), pa.int64()),
            "embedding": pa.array(base.tolist(), pa.list_(pa.float32())),
        }
    )
    assert semantic_dedup_ids(rd.from_arrow(clean), C, threshold=0.9999).count() == 0


def test_mixture_sample_hits_recipe(ray_session):
    """Mixture sampling lands near budget·weight per stratum, caps rare
    strata at their full size (never upsamples), and zero-weight strata
    vanish."""
    import ray.data as rd

    from news_crawler_ray.ops.sampling import mixture_fractions, mixture_sample

    n = 3000
    langs = np.array(["en"] * 2000 + ["de"] * 900 + ["rare"] * 100)
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.int64)), "lang": pa.array(langs)}
    )
    weights = {"en": 0.5, "de": 0.25, "rare": 0.25}
    out = mixture_sample(rd.from_arrow(tbl), "doc_id", "lang", weights, 800).to_pandas()
    got = out["lang"].value_counts()
    assert got["rare"] == 100  # min(1, 200/100) → kept whole
    assert abs(got["en"] - 400) < 60 and abs(got["de"] - 200) < 45
    fr = mixture_fractions({"en": 2000, "de": 900, "rare": 100, "x": 50}, weights, 800)
    assert fr["rare"] == 1.0 and fr["x"] == 0.0 and 0 < fr["en"] < 1


def test_aspect_bucket_assignment_exact():
    from news_crawler_ray.ops.multimodal import aspect_bucket_batch

    t = pa.table(
        {
            "image_id": pa.array(["a", "b", "c", "d", "e"]),
            "w": pa.array([100, 160, 90, 512, 100], pa.int32()),
            "h": pa.array([100, 90, 160, 256, 75], pa.int32()),
        }
    )
    out = aspect_bucket_batch(t)
    got = dict(zip(out["image_id"].to_pylist(), out["bucket"].to_pylist()))
    assert got == {"a": "1:1", "b": "16:9", "c": "9:16", "d": "2:1", "e": "4:3"}


def test_group_gap_stats_and_politeness_compliance(ray_session):
    """group_gap_stats computes exact per-key min gaps across block
    layouts, and the flagship crawl's schedule is politeness-compliant:
    every multi-fetch (host, wave) has min_gap_us >= the host's delay."""
    import ray.data as rd

    from news_crawler_ray.ops.window import group_gap_stats
    from news_crawler_ray.pipelines.queries import q_politeness_audit

    t = pa.table(
        {
            "k": pa.array(["a"] * 4 + ["b"] * 2 + ["c"]),
            "ts": pa.array([0, 10, 13, 40, 100, 107, 5], pa.int64()),
            "tag": pa.array(["x"] * 7),
        }
    )
    out = (
        group_gap_stats(rd.from_arrow(t).repartition(5), "k", "ts", ("tag",))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["n_events"].tolist() == [4, 2, 1]
    assert out["min_gap"].tolist()[:2] == [3, 7]
    assert out["min_gap"].isna().tolist() == [False, False, True]

    audit = q_politeness_audit("/root/testdata/sf0.001").to_pandas()
    multi = audit[audit["n_fetches"] >= 2]
    assert len(multi) > 0
    assert (multi["min_gap_us"] >= multi["delay_us"]).all()


def test_exact_phash_dups_and_sampled_quantiles(ray_session):
    """Pool-cycled store: every phash group has ceil-or-floor(n/pool)
    copies and the canonical id is the group min; sampled quantiles sit
    within a tolerance of the exact full-data quantiles."""
    from news_crawler_ray.pipelines.queries import (
        q_exact_phash_dups,
        q_sampled_quantiles,
        q_value_quantiles,
    )

    dups = q_exact_phash_dups("/root/testdata/sf0.001").to_pandas()
    assert len(dups) == 60  # every pool image repeats (200 rows / 60 pool)
    assert set(dups["n_copies"]) == {3, 4} and (dups["n_copies"].sum() == 200)

    sq = q_sampled_quantiles("/root/testdata/sf0.001").to_pandas()
    ex = q_value_quantiles("/root/testdata/sf0.001").to_pandas()
    m = sq.merge(ex, on=["event_type", "pct"], suffixes=("_s", "_e"))
    assert len(m) == len(sq) > 0
    spread = ex["value"].max() - ex["value"].min()
    assert (abs(m["value_s"] - m["value_e"]) <= 0.25 * spread).all()


def test_caption_pixel_corr_bit_exact(ray_session):
    """Store-metadata correlation query matches the sequential big-int
    oracle bit-for-bit (integer cross moments → one float cast each)."""
    from news_crawler_ray.pipelines.expected import expected_caption_pixel_corr
    from news_crawler_ray.pipelines.queries import q_caption_pixel_corr

    got = (
        q_caption_pixel_corr("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("fmt", ignore_index=True)
    )
    exp = expected_caption_pixel_corr().to_pandas().sort_values("fmt", ignore_index=True)
    assert list(got["fmt"]) == list(exp["fmt"])
    assert list(got["n_values"]) == list(exp["n_values"])
    assert [
        (a, b) for a, b in zip(got["corr_xy"], exp["corr_xy"]) if a != b
    ] == []  # bit-exact float64, including any NULLs
    assert got["corr_xy"].abs().max() <= 1.0


def test_pq_encode(ray_session):
    """Codes are layout-stable for a FIXED block plan, pack m=4-bit
    nibbles, and identical subvectors get identical sub-codes."""
    import ray.data as rd

    from news_crawler_ray.ops.similarity import pq_encode

    rng = np.random.default_rng(3)
    n, d = 64, 16
    X = rng.normal(size=(n, d))
    X[1] = X[0]  # identical vectors → identical full codes
    tbl = pa.table(
        {"vec_id": pa.array(range(n), pa.int64()),
         "embedding": pa.array(X.tolist(), pa.list_(pa.float64()))}
    )
    ds = rd.from_arrow([tbl.slice(i, 16) for i in range(0, n, 16)])
    out = pq_encode(ds, init=X[:8], m=4, k=8, iters=2).to_pandas()
    out = out.sort_values("vec_id", ignore_index=True)
    codes = out["pq_code"].to_numpy()
    assert codes[0] == codes[1]
    assert (codes >= 0).all() and (codes < 1 << 16).all()  # 4 nibbles
    # re-run over the same block plan → bit-identical
    out2 = pq_encode(ds, init=X[:8], m=4, k=8, iters=2).to_pandas()
    assert (out2.sort_values("vec_id", ignore_index=True)["pq_code"].to_numpy() == codes).all()


def test_budget_sample(ray_session):
    """Rows are kept in the given order while cumulative weight stays
    within budget — per key, exactly, at any layout; a row that would
    cross the budget is dropped (and later rows too)."""
    import ray.data as rd

    from news_crawler_ray.ops.sampling import budget_sample

    rows = (
        [{"k": "a", "ord": i, "w": 10, "id": i} for i in range(10)]
        + [{"k": "b", "ord": i, "w": 7, "id": 100 + i} for i in range(10)]
    )
    tbl = pa.Table.from_pylist(rows).cast(
        pa.schema([("k", pa.string()), ("ord", pa.int64()),
                   ("w", pa.int64()), ("id", pa.int64())])
    )
    for nblocks in (1, 5):
        kept = budget_sample(
            rd.from_arrow(tbl).repartition(nblocks), "k", "w", ["ord"], budget=31
        ).to_pandas()
        by = {k: sorted(g["id"]) for k, g in kept.groupby("k")}
        assert by["a"] == [0, 1, 2]       # 10+10+10 <= 31, 4th crosses
        assert by["b"] == [100, 101, 102, 103]  # 7*4=28 <= 31


def test_pq_knn_recall(ray_session):
    """ADC search over PQ codes recovers a decent fraction of the exact
    cosine top-10 (clustered data compresses well), deterministically."""
    import ray.data as rd

    from news_crawler_ray.ops.similarity import (
        knn_brute_force, pq_encode, pq_fit, pq_knn,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 16)) * 4
    X = np.vstack([c + rng.normal(size=(40, 16)) for c in centers])
    tbl = pa.table(
        {"vec_id": pa.array(range(len(X)), pa.int64()),
         "embedding": pa.array(X.tolist(), pa.list_(pa.float64()))}
    )
    ds = rd.from_arrow([tbl.slice(i, 64) for i in range(0, len(X), 64)])
    cb = pq_fit(ds, X[:16], m=4, k=16, iters=2)
    codes = pq_encode(ds, codebooks=cb)
    qm, qid = X[:5], np.arange(5)
    approx = pq_knn(codes, cb, qid, qm, k=10).to_pandas()
    exact = knn_brute_force(ds, qid, qm, k=10).to_pandas()
    rec = []
    for q in range(5):
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        rec.append(len(a & e) / 10)
    assert sum(rec) / len(rec) >= 0.5  # clustered data: ADC finds most
    # determinism across reruns
    again = pq_knn(codes, cb, qid, qm, k=10).to_pandas()
    assert again.sort_values(["query_id", "neighbor_id"], ignore_index=True).equals(
        approx.sort_values(["query_id", "neighbor_id"], ignore_index=True)
    )


def test_sharpness_moments():
    """Uniform image → zero Laplacian; checkerboard → hand-computable
    maximal response; moments are exact ints."""
    from news_crawler_ray.fixtures import codec
    from news_crawler_ray.ops.multimodal import sharpness_batch

    flat = np.full((8, 8, 3), 100, np.uint8)
    checker = np.zeros((8, 8, 3), np.uint8)
    checker[::2, 1::2] = 255
    checker[1::2, ::2] = 255
    t = pa.table(
        {
            "iid": pa.array([0, 1], pa.int64()),
            "bytes": pa.array(
                [codec.encode(p, "png") for p in (flat, checker)], pa.large_binary()
            ),
            "fmt": pa.array(["png", "png"]),
        }
    )
    out = sharpness_batch(t).to_pylist()
    assert out[0]["lap_sum"] == 0 and out[0]["lap_sq_sum"] == 0
    assert out[0]["n_interior"] == 36
    # checkerboard interior: |lap| = |4c - 4·opposite| = 4·765 everywhere
    assert out[1]["lap_sq_sum"] == 36 * (4 * 765) ** 2
    assert abs(out[1]["lap_sum"]) == 0  # alternating signs cancel


def test_caption_junk_batch():
    """Each junk signal fires on its planted form and stays quiet on a
    clean caption."""
    from news_crawler_ray.ops.text import caption_junk_batch

    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(
                [
                    "IMG_0042.jpg",
                    "a cat see https://ex.example/p?id=7",
                    "Untitled photo of a dog",
                    "a clean descriptive caption",
                ]
            ),
        }
    )
    out = caption_junk_batch(t).to_pylist()
    assert [r["is_filename"] for r in out] == [True, False, False, False]
    assert [r["has_url"] for r in out] == [False, True, False, False]
    assert [r["has_placeholder"] for r in out] == [True, False, True, False]
    assert out[0]["n_digits"] == 4 and out[3]["n_digits"] == 0
    assert out[3]["n_chars"] == len("a clean descriptive caption")


def test_zorder_pruning_evidence(ray_session):
    """The scale claim behind zorder_layout: files written in zkey-rank
    order have tight per-file (user, value) bounding boxes, so a 2-D box
    predicate min/max-prunes most files — while an event_id-ordered
    layout leaves every file's bbox ≈ the full range (nothing prunes)."""
    import pandas as pd

    from news_crawler_ray.pipelines.queries import q_zorder_layout

    z = q_zorder_layout("/root/testdata/sf0.001").to_pandas()
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet", columns=["event_id", "user_id", "value"]
    )
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    df = z.merge(ev, on="event_id")

    def touched(order_col):
        s = df.sort_values(order_col, ignore_index=True)
        files = np.array_split(s, 16)
        u0, u1 = df["user_id"].quantile([0.4, 0.5])
        c0, c1 = df["cents"].quantile([0.4, 0.5])
        return sum(
            1
            for f in files
            if not (
                f["user_id"].max() < u0 or f["user_id"].min() > u1
                or f["cents"].max() < c0 or f["cents"].min() > c1
            )
        )

    t_z, t_id = touched("zrank"), touched("event_id")
    assert t_id >= 14  # id order: every file spans the whole 2-D range
    assert t_z <= t_id // 2  # zkey order prunes the majority


def test_char_entropy(ray_session):
    """Hand-checkable entropies (uniform 2-char doc → 1 bit/char,
    single-char doc → 0), sliced-batch offset safety, empty drop."""
    import ray.data as rd

    from news_crawler_ray.ops.text import char_entropy, char_entropy_batch

    t = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": pa.array(["abab", "aaaa", ""])}
    )
    out = char_entropy_batch(t).to_pylist()
    assert [r["doc_id"] for r in out] == [0, 1]  # empty doc dropped
    # 'abab': each char p=1/2 → entropy 1 bit/char → q = 4 * 2^20 / n? per
    # definition entropy_q = Σ c(log2 n − log2 c)·2^20 = 2·(2−1)·2^20·2
    assert out[0]["entropy_q"] == 4 * (1 << 20)
    assert out[1]["entropy_q"] == 0
    # sliced zero-copy batch gives identical results
    sl = char_entropy_batch(t.slice(1, 2)).to_pylist()
    assert sl[0]["entropy_q"] == 0 and sl[0]["doc_id"] == 1
    ds_out = char_entropy(rd.from_arrow(t).repartition(2)).to_pandas()
    assert sorted(ds_out["entropy_q"]) == [0, 4 * (1 << 20)]


def test_dominant_color(ray_session):
    """Solid-color and majority-color images report the right quantized
    bin; ties break to the smallest bin."""
    from news_crawler_ray.fixtures import codec
    from news_crawler_ray.ops.multimodal import dominant_color_batch

    solid = np.full((8, 8, 3), 0xAB, np.uint8)  # nibble 0xA → bin 0xAAA
    half = np.zeros((8, 8, 3), np.uint8)
    half[:, :5] = 0xFF  # 5/8 white → dominant 0xFFF
    tie = np.zeros((8, 8, 3), np.uint8)
    tie[:, :4] = 0xFF  # exact 50/50 → smallest bin (0) wins
    t = pa.table(
        {
            "iid": pa.array([0, 1, 2], pa.int64()),
            "bytes": pa.array(
                [codec.encode(p, "png") for p in (solid, half, tie)],
                pa.large_binary(),
            ),
            "fmt": pa.array(["png"] * 3),
        }
    )
    out = dominant_color_batch(t).to_pylist()
    assert [r["dominant_bin"] for r in out] == [0xAAA, 0xFFF, 0x000]
    assert all(r["decode_ok"] for r in out)


def test_dedup_span_removal(ray_session):
    """Duplicated 5-gram spans are cut from all non-owner occurrences
    (owner = global min (doc,pos)), overlaps merge, unique text
    survives, layout-invariant."""
    import ray.data as rd

    from news_crawler_ray.ops.dedup import dedup_span_removal

    shared = "one two three four five six"  # 6 tokens → two 5-gram windows
    docs = [
        {"doc_id": 0, "text": f"{shared} alpha beta"},
        {"doc_id": 1, "text": f"gamma {shared} delta"},
        {"doc_id": 2, "text": "totally unique words with no duplication here"},
    ]
    tbl = pa.Table.from_pylist(docs)

    def run(nblocks):
        out = dedup_span_removal(
            rd.from_arrow(tbl).repartition(nblocks), n=5
        ).to_pandas().sort_values("doc_id", ignore_index=True)
        return out

    a, b = run(1), run(3)
    assert a.equals(b)
    # doc 0 owns both shared windows (pos 0,1 < doc 1's pos 1,2) → intact
    assert a.loc[0, "clean_text"] == f"{shared} alpha beta"
    assert a.loc[0, "n_tokens_removed"] == 0
    # doc 1 loses the merged 6-token span, keeps its unique frame
    assert a.loc[1, "clean_text"] == "gamma delta"
    assert a.loc[1, "n_tokens_removed"] == 6
    assert a.loc[2, "n_tokens_removed"] == 0


def test_tokenize_with_vocab(ray_session):
    """Encoded id order matches token order, OOV maps to -1 and is
    counted, empty-token docs drop out, layout-invariant."""
    import ray.data as rd

    from news_crawler_ray.ops.text import tokenize_with_vocab, vocab_build

    docs = [{"doc_id": i, "text": "red blue red rare" + str(i)} for i in range(6)]
    docs.append({"doc_id": 99, "text": "   "})  # whitespace-only → dropped
    tbl = pa.Table.from_pylist(docs)

    def run(nblocks):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        out = tokenize_with_vocab(ds, vocab_build(ds, min_count=2)).to_pandas()
        return out.sort_values("doc_id", ignore_index=True)

    a, b = run(1), run(4)
    assert a.equals(b)
    assert list(a["doc_id"]) == list(range(6))  # doc 99 dropped
    # vocab: red (12x) id 0, blue (6x) id 1; rareN unique → OOV
    assert (a["token_ids"] == "0 1 0 -1").all()
    assert (a["n_oov"] == 1).all()


def test_contrastive_negatives(ray_session):
    """Negative ids follow the shared integer map (self-collisions skip
    +1), every anchor gets exactly k slots, dots are exact integer
    products, and output is block-layout invariant."""
    import ray.data as rd

    from news_crawler_ray.ops.similarity import contrastive_negatives

    n, d, k = 12, 4, 3
    vecs = [[float(i + 1)] * d for i in range(n)]
    tbl = pa.table(
        {"vec_id": pa.array(range(n), pa.int64()),
         "embedding": pa.array(vecs, pa.list_(pa.float32()))}
    )

    def run(nblocks):
        out = contrastive_negatives(
            rd.from_arrow(tbl).repartition(nblocks), n_total=n, k_neg=k, q_scale=8
        ).to_pandas().sort_values(["vec_id", "slot"], ignore_index=True)
        return out

    a, b = run(1), run(4)
    assert a.equals(b)
    assert len(a) == n * k
    for _, r in a.iterrows():
        raw = (r["vec_id"] * 2654435761 + (r["slot"] + 1) * 40503) % n
        assert r["neg_id"] == ((raw + 1) % n if raw == r["vec_id"] else raw)
        assert r["neg_id"] != r["vec_id"]
        # quantized dot of constant vectors: d * (8(i+1)) * (8(j+1))
        assert r["dot_q"] == d * 8 * (r["vec_id"] + 1) * 8 * (r["neg_id"] + 1)


def test_letterbox_detection(ray_session):
    """Planted bars are recovered exactly for both codecs; bar-free and
    fully-uniform images hit the documented edge conventions."""
    import ray.data as rd

    from news_crawler_ray.fixtures import codec, synth
    from news_crawler_ray.ops.multimodal import detect_letterbox, letterbox_stats_batch

    out = (
        detect_letterbox(rd.from_arrow(synth.make_letterbox_store(30, seed=1)))
        .to_pandas()
        .sort_values("iid", ignore_index=True)
    )
    assert out["decode_ok"].all()
    for i, row in out.iterrows():
        if i % 3 == 0:
            assert row["n_top"] >= 2 and row["n_bottom"] >= 2 and row["n_left"] == 0
        elif i % 3 == 1:
            assert row["n_left"] >= 2 and row["n_right"] >= 2 and row["n_top"] == 0
        else:
            assert (
                row[["n_top", "n_bottom", "n_left", "n_right"]].sum() == 0
            )
    # fully-uniform image → (h, 0) / (w, 0)
    px = np.full((8, 16, 3), 7, np.uint8)
    t = pa.table(
        {"iid": pa.array([0], pa.int64()),
         "bytes": pa.array([codec.encode(px, "png")], pa.large_binary()),
         "fmt": pa.array(["png"])}
    )
    r = letterbox_stats_batch(t).to_pylist()[0]
    assert (r["n_top"], r["n_bottom"], r["n_left"], r["n_right"]) == (8, 0, 16, 0)


def test_morton_interleave16():
    """Known interleavings, 16-bit masking, and the locality property
    (nearby 2-D points sort near each other)."""
    from news_crawler_ray.ops.hashing import morton_interleave16

    x = np.array([3, 0, 65535, 65536 + 3], dtype=np.int64)
    y = np.array([5, 1, 65535, 5], dtype=np.int64)
    z = morton_interleave16(x, y)
    assert z[0] == 39  # x=0b11 even bits, y=0b101 odd bits → 0b100111
    assert z[1] == 2
    assert z[2] == (1 << 32) - 1
    assert z[3] == 39  # low-16 masking wraps x
    # locality: points in the same 2x2 cell are adjacent in z order
    xs, ys = np.meshgrid(np.arange(16), np.arange(16))
    zz = morton_interleave16(xs.ravel(), ys.ravel())
    order = np.argsort(zz)
    first4 = {(int(xs.ravel()[i]), int(ys.ravel()[i])) for i in order[:4]}
    assert first4 == {(0, 0), (1, 0), (0, 1), (1, 1)}


def test_bpe_merge_candidates(ray_session):
    """Hand-checkable corpus: pair counts are weighted by token
    occurrences and layout-invariant."""
    import ray.data as rd

    from news_crawler_ray.ops.text import bpe_merge_candidates

    docs = [{"doc_id": i, "text": "aab aab ab xy"} for i in range(5)]
    tbl = pa.Table.from_pylist(docs)
    # per doc: 'aab'x2 → (a,a)x2 (a,b)x2; 'ab' → (a,b); 'xy' → (x,y)
    for nblocks in (1, 3):
        out = bpe_merge_candidates(
            rd.from_arrow(tbl).repartition(nblocks), k=10
        ).to_pylist()
        assert out[0] == {"l": "a", "r": "b", "n_pairs": 15}
        assert out[1] == {"l": "a", "r": "a", "n_pairs": 10}
        assert out[2] == {"l": "x", "r": "y", "n_pairs": 5}


def test_html_to_text_batch():
    """Script/style/comment blocks (multi-line) strip, tags become
    spaces, entities unescape, whitespace collapses, edges trim."""
    from news_crawler_ray.ops.text import html_to_text_batch

    html = (
        "<html><head><script>\nvar a = 1;\n</script><style>p{x:1}</style>"
        "</head><body><!-- note\n -->  <p>A &amp; B&nbsp;&lt;ok&gt;</p>"
        "<div>it&#39;s &quot;q\"</div>\n</body></html>"
    )
    out = html_to_text_batch(
        pa.table({"doc_id": [1], "text": [html]})
    )["text_extracted"][0].as_py()
    assert out == "A & B <ok> it's \"q\""


def test_winnow_select_and_dup_pairs(ray_session):
    """winnow_select follows the MOSS spec (min per window, RIGHTMOST on
    ties; sub-window docs contribute their min), and winnow_dup_pairs
    finds verbatim-overlap docs layout-independently."""
    import ray.data as rd

    from news_crawler_ray.ops import hashing as H
    from news_crawler_ray.ops.dedup import winnow_dup_pairs

    sh = np.array([5, 3, 3, 7, 2, 9, 4, 4], dtype=np.uint64)
    doc_of, fp = H.winnow_select(sh, np.array([0, 5, 8]), w=3)
    assert list(doc_of) == [0, 0, 1] and sorted(fp[:2]) == [2, 3] and fp[2] == 4
    # rightmost tie: window [3,3,7] selects position 2, not 1 — both map
    # to value 3, and the value set is what's fingerprinted
    short_doc, short_fp = H.winnow_select(
        np.array([9, 4, 4], dtype=np.uint64), np.array([0, 3]), w=4
    )
    assert list(short_doc) == [0] and list(short_fp) == [4]

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [{"doc_id": i, "text": f"{base} tail{i} end{i} x{i} y{i} z{i}"} for i in range(4)]
    docs += [
        {
            "doc_id": 10 + i,
            "text": " ".join(f"w{i}_{j}" for j in range(10)),  # fully disjoint
        }
        for i in range(3)
    ]
    tbl = pa.Table.from_pylist(docs)

    def run(nblocks):
        out = winnow_dup_pairs(
            rd.from_arrow(tbl).repartition(nblocks), k=3, w=2, min_shared=2
        ).to_pandas()
        return set(zip(out["id_a"], out["id_b"]))

    a, b = run(1), run(5)
    assert a == b
    # all docs sharing the 10-token verbatim prefix pair up; solo docs don't
    assert {(i, j) for i in range(4) for j in range(i + 1, 4)} <= a
    assert all(x < 10 and y < 10 for x, y in a)


def test_remove_boilerplate_lines(ray_session):
    """Hot lines (>= min_count occurrences, >= min_len chars) are
    stripped, short repeated lines survive the min_len gate, surviving
    line order is preserved, and output is block-layout invariant."""
    import ray.data as rd

    from news_crawler_ray.ops.text import remove_boilerplate_lines

    docs = [
        {"doc_id": i, "text": f"HEADER LINE\nbody {i} unique words\nok\nFOOT {i % 2}"}
        for i in range(30)
    ]
    tbl = pa.Table.from_pylist(docs)

    def run(nblocks):
        out = remove_boilerplate_lines(
            rd.from_arrow(tbl).repartition(nblocks), min_count=10, min_len=4
        ).to_pandas()
        return out.sort_values("doc_id", ignore_index=True)

    a, b = run(1), run(7)
    assert a.equals(b)  # layout-proof
    # header (30x) and FOOT 0/1 (15x each) are hot; 'ok' is short → kept
    assert list(a["n_removed"]) == [2] * 30
    assert a.loc[0, "clean_text"] == "body 0 unique words\nok"
    # doc whose every eligible line is hot but keeps the short line
    one = remove_boilerplate_lines(
        rd.from_arrow(
            pa.Table.from_pylist(
                docs + [{"doc_id": 99, "text": "HEADER LINE\nFOOT 0"}]
            )
        ),
        min_count=10,
        min_len=4,
    ).to_pandas()
    row = one[one["doc_id"] == 99].iloc[0]
    assert row["clean_text"] == "" and row["n_removed"] == 2


def test_caption_consistency_batching_invariant(ray_session):
    """clip_score is bit-identical across batch sizes (integer feature
    accumulation + shared float64 conversion point), scores are in
    [-1, 1], and an empty caption scores exactly 0."""
    import ray.data as rd

    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.ops.multimodal import caption_image_consistency

    ps = synth.make_pagestore(60, seed=9).select(
        ["image_id", "bytes", "fmt", "caption"]
    )
    a = (
        caption_image_consistency(rd.from_arrow(ps), batch_size=7)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    b = (
        caption_image_consistency(rd.from_arrow(ps), batch_size=64)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert a["clip_score"].between(-1.0, 1.0).all()
    blank = ps.set_column(
        ps.schema.get_field_index("caption"),
        "caption",
        pa.array([""] * ps.num_rows, pa.string()),
    )
    z = caption_image_consistency(rd.from_arrow(blank)).to_pandas()
    assert (z["clip_score"] == 0.0).all()


def test_curate_image_corpus_manifest(ray_session):
    """The curated manifest has one row per surviving phash (exact dups
    collapsed to the min admitted id), every row passed admission and
    the score gate, and results are block-layout invariant."""
    import ray.data as rd

    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.ops.multimodal import curate_image_corpus

    ps = synth.make_pagestore(150, seed=42, image_pool=40)
    out = (
        curate_image_corpus(rd.from_arrow(ps))
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert len(out) > 0
    assert out["phash"].is_unique
    assert (out["clip_score"] >= 0.0).all()
    assert (out[["w", "h"]].min(axis=1) >= 64).all()
    again = (
        curate_image_corpus(rd.from_arrow(ps).repartition(9))
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert out.equals(again)


def test_payload_psnr_invariant(ray_session):
    """PNG payloads roundtrip lossless; lossy payloads hold the 40 dB
    north-rule bound; a corrupted payload surfaces as decode failure
    rather than a silent pass."""
    import ray.data as rd

    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.ops.multimodal import payload_psnr_audit

    import pyarrow as _pa

    ps = synth.make_pagestore(80, seed=11).select(
        ["image_id", "bytes", "fmt", "w", "h"]
    )
    refs = [synth.reference_pixels(k, seed=11).tobytes() for k in range(80)]
    ps = ps.append_column("ref_px", _pa.array(refs, _pa.large_binary()))
    out = payload_psnr_audit(rd.from_arrow(ps)).to_pandas()
    assert len(out) == 80 and out["psnr_ok"].all()
    png = out[out["fmt"] == "png"]
    assert png["lossless"].all() and png["psnr_db"].isna().all()
    lossy = out[out["fmt"] == "jpeg"]
    assert (~lossy["lossless"]).all() and (lossy["psnr_db"] >= 40.0).all()


def _lev_ref(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_myers_distance_matches_dp():
    import random

    from news_crawler_ray.ops.text import myers_distance_batch

    rng = random.Random(5)
    alphabet = b"abcde "
    texts = [
        bytes(rng.choice(alphabet) for _ in range(rng.randrange(0, 33)))
        for _ in range(200)
    ]
    texts += [b"", b"kitten", b"sitting", b"a" * 32]
    L = 32
    mat = np.array([t.ljust(L, b"\x00") for t in texts], dtype=f"S{L}")
    mat = mat.view(np.uint8).reshape(len(texts), L)
    lens = np.array([len(t) for t in texts], np.int64)
    for pattern in (b"kitten", b"abcabcabc", b"x" * 64, b"e"):
        got = myers_distance_batch(mat, lens, pattern)
        for t, g in zip(texts, got):
            assert g == _lev_ref(pattern, t), (pattern, t)


def test_edit_distance_search_finds_planted(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.text import edit_distance_search

    docs = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": [
                "the quick brown fox jumps over",
                "the quikc brown fox jumps over",  # transposition: dist 2
                "completely unrelated content..",
                "the quick brown fox jumps over the lazy dog",  # same prefix
                "",
                None,
            ],
        }
    )
    ds = rd.from_arrow(docs)
    got = (
        edit_distance_search(
            ds, ["the quick brown fox jumps over"], prefix_len=30, max_dist=3
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["doc_id"].tolist() == [0, 1, 3]
    assert got["dist"].tolist() == [0, 2, 0]


def test_keyword_hit_counts(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.text import keyword_hit_counts

    docs = pa.table(
        {
            "text": [
                "Alpha BETA gamma",
                "beta beta beta",  # multiple hits count ONCE per doc
                None,
                "delta",
            ]
        }
    )
    got = (
        keyword_hit_counts(rd.from_arrow(docs), ["beta", "alpha", "zzz"])
        .to_pandas()
        .set_index("keyword")["n_docs"]
    )
    assert got["beta"] == 2  # case-insensitive, doc-level
    assert got["alpha"] == 1
    assert got["zzz"] == 0


def test_pca_fit_layout_invariant_and_recovers_direction(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.similarity import pca_fit

    rng = np.random.default_rng(9)
    d = 16
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    # dominant variance along u, small isotropic noise
    X = np.outer(rng.normal(scale=3.0, size=400), u) + rng.normal(
        scale=0.1, size=(400, d)
    )
    tbl = pa.table({"embedding": pa.array(X.tolist(), pa.list_(pa.float32()))})

    def run(nblocks):
        parts = [tbl.slice(i * 400 // nblocks, 400 // nblocks) for i in range(nblocks)]
        ds = rd.from_arrow_refs([__import__("ray").put(p) for p in parts])
        return pca_fit(ds, "embedding", k=2)

    v1, c1, r1, n1 = run(1)
    v5, c5, r5, n5 = run(5)
    assert n1 == n5 == 400
    # bit-exact at any layout (integer combiner)
    assert np.array_equal(v1, v5) and np.array_equal(c1, c5)
    assert np.array_equal(r1, r5)
    # top component aligns with the planted direction
    assert abs(float(np.dot(c1[0], u))) > 0.99
    # explained-variance ratios are sane and ordered
    assert r1[0] > 0.9 and v1[0] > v1[1] > 0


def test_posting_lists_sorted_and_distinct(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.text import posting_lists

    tbl = pa.table(
        {
            "doc_id": pa.array([3, 1, 2, 4], pa.int64()),
            "text": [
                "apple banana apple",  # tf>1 must still post once
                "banana cherry",
                "apple",
                "  ",  # whitespace-only doc posts nothing
            ],
        }
    )
    for nblocks in (1, 3):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        got = {
            r["term"]: (r["df"], r["postings"])
            for r in posting_lists(ds).take_all()
        }
        assert got == {
            "apple": (2, [2, 3]),
            "banana": (2, [1, 3]),
            "cherry": (1, [1]),
        }


def test_knn_recall_eval(ray_session):
    from news_crawler_ray.pipelines.queries import q_knn_recall

    rows = q_knn_recall("/root/testdata/sf0.001").to_pylist()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["recall"] == r["n_hits"] / 10
    # IVF with nprobe=8 of nlist=16 should find most true neighbors
    assert sum(r["recall"] for r in rows) / len(rows) >= 0.6


def test_weight_sample_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from news_crawler_ray.ops.sampling import weight_sample_batch, weight_sample_sql

    n = 2000
    ids = np.arange(n)
    w = (ids % 100).astype(np.float64) / 50.0  # p in [0, 2): exercises clamp
    tbl = pa.table({"k": pa.array(ids, pa.int64()), "w": pa.array(w, pa.float64())})

    def keep(t):
        return weight_sample_batch(t, "k", np.asarray(t["w"], np.float64))

    got = sorted(
        r["k"]
        for r in rd.from_arrow(tbl).repartition(4).map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    )
    pred = weight_sample_sql("k", "w")
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT k FROM tbl WHERE {pred}"
        ).fetchall()
    )
    assert got == want
    # p >= 1 rows (w in [1,2)) are ALL kept; p == 0 rows never
    kept = set(got)
    assert all(i in kept for i in ids if w[i] >= 1.0)
    assert all(i not in kept for i in ids if w[i] == 0.0)
    # keep rate tracks the mean probability
    exp = np.minimum(w, 1.0).mean()
    assert abs(len(got) / n - exp) < 0.05


def test_fuzzy_match_join_blocking_and_verify(ray_session):
    import ray.data as rd

    from news_crawler_ray.ops.text import fuzzy_match_join

    left = pa.Table.from_pylist(
        [
            {"id": 1, "s": "amber-cairn-0001"},   # exact -> dist 0
            {"id": 2, "s": "ambre-cairn-0001"},   # swap -> dist 2
            {"id": 3, "s": "Xmber-cairn-0001"},   # first byte differs: BLOCKED out
            {"id": 4, "s": "zzzzzz"},             # same block as nothing
        ]
    )
    right = pa.Table.from_pylist(
        [
            {"id": 100, "s": "amber-cairn-0001"},
            {"id": 101, "s": "amber-beacon-0002"},
        ]
    )
    for nblocks in (1, 2):
        got = sorted(
            (r["left_id"], r["right_id"], r["dist"])
            for r in fuzzy_match_join(
                rd.from_arrow(left).repartition(nblocks),
                rd.from_arrow(right),
                max_dist=2,
            ).take_all()
        )
        assert got == [(1, 100, 0), (2, 100, 2)]


def test_bigram_pmi_hand_corpus(ray_session, monkeypatch, tmp_path):
    import math

    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines import queries as Q

    # "new york" always collocated; "the cat"/"the dog" split "the"'s mass
    docs = ["new york " * 5, "the cat " * 5, "the dog " * 5]
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([0, 1, 2], pa.int64()), "text": docs}
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {r["bigram"]: r for r in Q.q_bigram_pmi(str(tmp_path)).to_pylist()}
    assert "new york" in got
    # hand PMI: c_xy=5, N_uni=30, N_bi=12(4 within-doc bigrams/doc... )
    ny = got["new york"]
    n_uni, n_bi = 30, 27  # 9 bigrams per 10-token doc
    want = math.log2((ny["c_xy"] * n_uni * n_uni) / (n_bi * 5 * 5))
    assert abs(ny["pmi"] - want) < 1e-12
    # "york new" (wrap inside repetition) is less collocated than pairs
    # that always co-occur exclusively
    assert got["new york"]["pmi"] > got["the cat"]["pmi"]


def test_doc_surprisal_properties(ray_session):
    import math

    import ray.data as rd

    from news_crawler_ray.ops.text import doc_surprisal

    # corpus: 'common' appears 9x, 'rare' once -> rare doc more surprising
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["common common common", "common common common", "common common common rare"],
        }
    )
    for nblocks in (1, 3):
        got = {
            r["doc_id"]: r
            for r in doc_surprisal(rd.from_arrow(tbl).repartition(nblocks)).take_all()
        }
        # doc 0 == doc 1 exactly (identical token multisets)
        assert got[0]["surprisal_bits"] == got[1]["surprisal_bits"]
        assert got[2]["bits_per_token"] > got[0]["bits_per_token"]
        # hand value: N=10, common 9x -> -log2(9/10) per token, doc0 = 3 tokens
        want = 3 * -(math.floor(math.log2(9 / 10) * (1 << 20) + 0.5) / (1 << 20))
        assert abs(got[0]["surprisal_bits"] - want) < 1e-9


def test_pca_transform_layout_proof(ray_session, emb_tbl):
    import ray.data as rd

    from news_crawler_ray.ops.similarity import pca_fit, pca_transform

    _v, comps, _r, _n = pca_fit(rd.from_arrow(emb_tbl), "embedding", k=3)
    p1 = {
        r["vec_id"]: r["proj"]
        for r in pca_transform(rd.from_arrow(emb_tbl).repartition(1), comps).take_all()
    }
    p7 = {
        r["vec_id"]: r["proj"]
        for r in pca_transform(rd.from_arrow(emb_tbl).repartition(7), comps).take_all()
    }
    assert p1 == p7  # integer matmul: bitwise layout-proof
    # projection approximates the float dot product
    E = np.array(emb_tbl["embedding"].to_pylist(), dtype=np.float64)
    ids = np.asarray(emb_tbl["vec_id"], dtype=np.int64)
    want = E @ comps.T
    got = np.array([p1[i] for i in ids])
    assert np.abs(got - want).max() < 1e-4  # 2^-20 quantization bound


def test_heldout_cross_entropy_oov(ray_session):
    import math

    import ray.data as rd

    from news_crawler_ray.ops.text import heldout_cross_entropy

    # train (even ids): "alpha beta" x2; held-out doc 1 has an OOV token
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 2, 1], pa.int64()),
            "text": ["alpha beta", "alpha beta", "alpha zulu"],
        }
    )
    for nblocks in (1, 3):
        got = heldout_cross_entropy(
            rd.from_arrow(tbl).repartition(nblocks)
        ).take_all()
        assert len(got) == 1 and got[0]["doc_id"] == 1
        r = got[0]
        # N=4 train tokens, V=2 -> denom 7; alpha c=2, zulu OOV c=0
        k = 1 << 20
        q_alpha = math.floor(math.log2(3 / 7) * k + 0.5)
        q_zulu = math.floor(math.log2(1 / 7) * k + 0.5)
        want = -((q_alpha + q_zulu) / k)
        assert abs(r["heldout_bits"] - want) < 1e-9
        assert r["n_tokens"] == 2


def test_script_profile_batch():
    """Exact per-script codepoint counts; dominant = first max in
    SCRIPT_CLASSES order; all-zero (empty / digits-only) → 'none'."""
    import pyarrow as pa

    from news_crawler_ray.ops.text import script_profile_batch

    t = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(
                [
                    "hello world",
                    "привет мир",
                    "数据 处理",
                    "ab мир",  # 2 latin vs 3 cyrillic → cyrillic
                    "1234 !?",  # no script chars at all
                ]
            ),
        }
    )
    out = script_profile_batch(t).to_pylist()
    assert out[0]["n_latin"] == 10 and out[0]["script_pred"] == "latin"
    assert out[1]["n_cyrillic"] == 9 and out[1]["script_pred"] == "cyrillic"
    assert out[2]["n_han"] == 4 and out[2]["script_pred"] == "han"
    assert out[3]["n_latin"] == 2 and out[3]["n_cyrillic"] == 3
    assert out[3]["script_pred"] == "cyrillic"
    assert out[4]["script_pred"] == "none"


def test_script_profile_first_max_tie():
    """Equal counts resolve to the earlier entry in SCRIPT_CLASSES
    (latin before cyrillic), matching the oracle's CASE chain."""
    import pyarrow as pa

    from news_crawler_ray.ops.text import script_profile_batch

    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["ab мы"])})
    (row,) = script_profile_batch(t).to_pylist()
    assert row["n_latin"] == row["n_cyrillic"] == 2
    assert row["script_pred"] == "latin"


def test_source_reputation_shrinkage(ray_session, tmp_path):
    """Small hosts shrink toward the corpus mean rate; big hosts keep
    their own rate. Hand numbers: big=10 docs @ 10 tok, tiny=1 doc @
    100 tok; global rate 200/11."""
    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines import queries as Q

    rows = [("big", "w " * 10)] * 10 + [("tiny", "w " * 100)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array([t for _, t in rows]),
                "source": pa.array([s for s, _ in rows]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {r["source"]: r for r in Q.q_source_reputation(str(tmp_path)).to_pylist()}
    m, g_num, g_den = Q.REP_SMOOTH_M, 200, 11
    for src, n, s in (("big", 10, 100), ("tiny", 1, 100)):
        want = float(s * g_den + m * g_num) / float((n + m) * g_den)
        assert got[src]["rep_score"] == want, src
    mean = g_num / g_den
    # tiny's raw rate is 100 tok/doc but its score sits near the mean
    assert abs(got["tiny"]["rep_score"] - mean) < abs(100 - mean) * 0.2
    assert got["big"]["n_docs"] == 10 and got["big"]["sum_tok"] == 100


def test_tile_dup_pairs_planted_recall(ray_session):
    """Every planted (base, crop) pair found with n_shared=9; zero
    cross-family pairs; and phash genuinely misses these crops (the
    gap this operator exists to close)."""
    import numpy as np
    import ray.data as rd

    from news_crawler_ray.fixtures import codec, synth
    from news_crawler_ray.ops import hashing as H
    from news_crawler_ray.ops.multimodal import tile_dup_pairs
    from news_crawler_ray.pipelines.queries import _cropdup_iid

    ps = synth.make_cropdup_pagestore(12, seed=42)
    withid = rd.from_arrow(ps).map_batches(
        lambda t: _cropdup_iid(t).select(["iid", "bytes", "fmt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).repartition(4)
    got = {(r["id_a"], r["id_b"]): r["n_shared"] for r in tile_dup_pairs(withid).take_all()}
    assert got == {(k, k + 1_000_000): 9 for k in range(12)}
    # phash misses: crop shifts every cell, so base-vs-crop hamming is large
    byid = {i: (b, f) for i, b, f in zip(ps["image_id"].to_pylist(), ps["bytes"].to_pylist(), ps["fmt"].to_pylist())}
    h0 = np.array([np.uint64(np.int64(codec.phash64(codec.decode(*byid["img00000000"]))))])
    h1 = np.array([np.uint64(np.int64(codec.phash64(codec.decode(*byid["crp00000000"]))))])
    assert int(H.hamming_distance64(h0, h1)[0]) > 3


def test_leakage_safe_split_property(ray_session, sf_dir):
    """The property the operator exists for: both ends of every MinHash
    near-dup pair land in the SAME split, and splits are exhaustive."""
    from news_crawler_ray.pipelines import queries as Q

    rows = Q.q_leakage_safe_split(sf_dir).take_all()
    split_of = {r["doc_id"]: r["split"] for r in rows}
    comp_of = {r["doc_id"]: r["component"] for r in rows}
    assert set(split_of.values()) <= {"train", "val", "test"}
    import news_crawler_ray.ops.dedup as dd

    pairs = dd.minhash_lsh_pairs(
        Q._ds_from_table(Q._planted_docs_tbl(sf_dir, Q._drop_word3)),
        num_perm=64, bands=16, shingle_k=5, threshold=0.5,
    ).take_all()
    assert pairs, "fixture must plant near-dups"
    for p in pairs:
        a, b = p["id_a"], p["id_b"]
        assert split_of[a] == split_of[b], (a, b)
        assert comp_of[a] == comp_of[b]


def test_kn_bigram_lm_hand_corpus(ray_session, tmp_path):
    """Hand-checked interpolated Kneser-Ney on 'a b a b a c':
    c(a,b)=2 c(b,a)=2 c(a,c)=1; c1(a)=3 n1f(a)=2; c1(b)=2 n1f(b)=1;
    every continuation has n1b=1; B=3 distinct bigrams; d=0.75."""
    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines import queries as Q

    pq.write_table(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["a b a b a c"]}),
        str(tmp_path / "documents.parquet"),
    )
    got = {(r["w1"], r["w2"]): r for r in Q.q_kn_bigram_lm(str(tmp_path)).take_all()}
    assert set(got) == {("a", "b"), ("b", "a"), ("a", "c")}
    assert got[("a", "b")]["n"] == 2
    assert got[("a", "b")]["p_kn"] == (max(2 - 0.75, 0.0) + ((0.75 * 2) * 1) / 3.0) / 3.0
    assert got[("a", "c")]["p_kn"] == (max(1 - 0.75, 0.0) + ((0.75 * 2) * 1) / 3.0) / 3.0
    assert got[("b", "a")]["p_kn"] == (max(2 - 0.75, 0.0) + ((0.75 * 1) * 1) / 3.0) / 2.0
    # discounted mass moved: higher-count continuation keeps more
    assert got[("a", "b")]["p_kn"] > got[("a", "c")]["p_kn"]


def test_og_metadata_batch():
    """Each head field extracts via its named group; a page missing a
    tag yields null for that field only."""
    from news_crawler_ray.ops.text import og_metadata_batch

    full = (
        '<html><head><title>Doc 7 - example</title>'
        '<meta property="og:title" content="Doc 7: cat">'
        '<meta property="og:image" content="https://img.example/i7.jpg">'
        '<link rel="canonical" href="https://docs.example/a/7">'
        "</head><body><p>x</p></body></html>"
    )
    bare = "<html><head><title>only title</title></head><body></body></html>"
    out = og_metadata_batch(
        pa.table({"doc_id": pa.array([7, 8], pa.int64()), "text": [full, bare]})
    ).to_pylist()
    assert out[0] == {
        "doc_id": 7,
        "page_title": "Doc 7 - example",
        "og_title": "Doc 7: cat",
        "og_image": "https://img.example/i7.jpg",
        "canonical_url": "https://docs.example/a/7",
    }
    assert out[1]["page_title"] == "only title"
    assert out[1]["og_image"] is None and out[1]["canonical_url"] is None


def test_es_weighted_keys_properties():
    """E-S keys are deterministic, in (-inf, 0], bit-equal to the SQL
    derivation, and heavier weights win selection in aggregate."""
    import duckdb

    from news_crawler_ray.ops.sampling import es_key_sql, es_weighted_keys

    ids = pa.array(list(range(2000)), pa.int64())
    w_hi = np.where(np.arange(2000) % 2 == 0, 50.0, 1.0)  # evens weighted 50x
    keys = es_weighted_keys(ids, w_hi)
    assert np.array_equal(keys, es_weighted_keys(ids, w_hi))  # content-stable
    assert (keys <= 0).all()
    top = np.argsort(-keys)[:200]
    assert (top % 2 == 0).mean() > 0.9  # 50x weight dominates the sample
    # bit-equality vs DuckDB on a spot sample
    rows = duckdb.sql(
        "SELECT " + es_key_sql("k", "w") + " FROM (VALUES (0, 50.0), (1, 1.0), "
        "(18, 50.0), (999, 1.0)) AS t(k, w)"
    ).fetchall()
    idx = [0, 1, 18, 999]
    assert np.array_equal(np.array([r[0] for r in rows]), keys[idx])


def test_naive_bayes_hand_corpus(ray_session, tmp_path):
    """Train on even ids (en vs fr), classify odd ids: token overlap
    decides; predictions match the obvious class on a hand corpus."""
    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines import queries as Q

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": [
                    "the cat sat on the mat",
                    "the cat purrs",
                    "le chat noir dort sur le tapis",
                    "le chat dort",
                ],
                "lang": ["en", "en", "fr", "fr"],
                "n_chars": pa.array([22, 13, 30, 12], pa.int64()),
                "source": ["s"] * 4,
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {r["doc_id"]: r for r in Q.q_nb_classify(str(tmp_path)).take_all()}
    assert set(got) == {1, 3}
    assert got[1]["pred_label"] == "en"
    assert got[3]["pred_label"] == "fr"
    assert got[1]["score_q"] > got[3]["score_q"] or got[1]["score_q"] < 0  # ints present


def test_dedup_canonical_batch():
    """Tracking params drop, survivors sort, no-query URLs pass through,
    nulls coalesce."""
    from news_crawler_ray.functions.urlnorm import dedup_canonical_batch

    t = pa.table(
        {
            "url": [
                "https://a.example/p?b=2&utm_source=x&a=1",
                "https://a.example/p?a=1&b=2&fbclid=zz",
                "https://a.example/p",
                "https://a.example/p?utm_campaign=only",
                None,
                # a '?' INSIDE the fragment is NOT a query: this page
                # must not collapse onto https://a.example/p?id=1
                "https://a.example/p#sec?id=1",
                "https://a.example/p?id=1",
                "https://a.example/p?id=1#frag",
            ]
        }
    )
    out = dedup_canonical_batch(t)["canon"].to_pylist()
    assert out == [
        "https://a.example/p?a=1&b=2",
        "https://a.example/p?a=1&b=2",
        "https://a.example/p",
        "https://a.example/p",
        "",
        "https://a.example/p",
        "https://a.example/p?id=1",
        "https://a.example/p?id=1",
    ]


def test_dsir_importance_hand_corpus(ray_session):
    """Docs sharing the target domain's vocabulary score higher than
    docs sharing the off-domain vocabulary."""
    import ray as _ray

    from news_crawler_ray.ops.text import dsir_importance

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [
                "alpha alpha beta",   # target docs use alpha/beta
                "alpha beta beta",
                "gamma gamma delta",  # off-domain uses gamma/delta
                "alpha beta gamma",   # mixed
            ],
            "is_target": [True, True, False, False],
        }
    )
    out = {
        r["doc_id"]: r["logratio_q"]
        for r in dsir_importance(_ray.data.from_arrow(tbl)).take_all()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[0] > out[2] and out[1] > out[2]  # on-domain beats off-domain
    assert out[2] < out[3] < out[0]  # mixed sits between


def test_image_meta_audit_flags_planted_corruption(ray_session):
    """Planted manifest corruption (w bump at iid%7==0, phash flip at
    iid%5==0) is flagged exactly; clean rows pass all checks."""
    from news_crawler_ray.pipelines.queries import q_image_meta_audit

    from news_crawler_ray.pipelines.expected import expected_image_meta_audit

    rows = {r["iid"]: r for r in q_image_meta_audit("unused").take_all()}
    assert len(rows) == 60
    exp = {r["iid"]: r for r in expected_image_meta_audit().to_pylist()}
    assert rows == exp  # engine == independent decode-path replica
    for iid, r in rows.items():
        assert r["decode_ok"] is True
        assert r["dims_ok"] == (iid % 7 != 0)
        if iid % 5 == 0:
            assert r["phash_ok"] is False  # planted flip always caught
    # lossy formats may legitimately drift the stored phash; at least the
    # unplanted LOSSLESS rows must verify clean
    assert any(r["phash_ok"] for iid, r in rows.items() if iid % 5 != 0)


def test_image_meta_audit_nulls_phash_on_decode_failure():
    """An undecodable payload must yield phash_ok=None (like dims_ok's
    unknown-layout null) — never a confident True/False computed from
    the garbage placeholder phash."""
    import numpy as np

    from news_crawler_ray.fixtures import codec
    from news_crawler_ray.ops.multimodal import image_meta_audit_batch

    px = np.zeros((8, 8, 3), np.uint8)
    px[::2, :, 0] = 255
    buf = codec.encode(px, "png")
    t = pa.table(
        {
            "iid": pa.array([0, 1], pa.int64()),
            "bytes": pa.array([buf, b"not an image"], pa.binary()),
            "w": pa.array([8, 8], pa.int32()),
            "h": pa.array([8, 8], pa.int32()),
            "fmt": ["png", "png"],
            "phash": pa.array(
                [int(np.int64(codec.phash64(px))), 123], pa.int64()
            ),
        }
    )
    out = image_meta_audit_batch(t).to_pylist()
    assert out[0] == {
        "iid": 0, "dims_ok": True, "phash_ok": True, "decode_ok": True
    }
    assert out[1] == {
        "iid": 1, "dims_ok": None, "phash_ok": None, "decode_ok": False
    }


def test_tokenizer_fertility_vs_duckdb(ray_session, sf_dir):
    """Per-lang fertility ratios match the DuckDB oracle bit-exactly
    (exact int sums -> one IEEE division on both sides)."""
    import duckdb

    from news_crawler_ray.pipelines.queries import (
        build_oracle_sql,
        q_tokenizer_fertility,
    )

    got = sorted(q_tokenizer_fertility(sf_dir).to_pylist(), key=lambda r: r["lang"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    sql = build_oracle_sql(sf_dir)["tokenizer_fertility"]
    want = sorted(con.execute(sql).arrow().to_pylist(), key=lambda r: r["lang"])
    assert got == want
    for r in got:
        assert r["chars_per_token"] >= 1.0  # a token is >=1 char
        assert r["bytes_per_token"] >= r["chars_per_token"]  # utf8 >= chars


def test_containment_pairs_finds_planted_halves(ray_session, sf_dir):
    """Every planted half-doc must pair with its source at containment
    1.0 (S(half) is a subset of S(orig) by construction) — the case the
    Jaccard families structurally miss at their thresholds."""
    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines.queries import q_containment_pairs

    got = q_containment_pairs(sf_dir).take_all()
    by_pair = {(r["id_a"], r["id_b"]): r for r in got}
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    missing = 0
    for did, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        ntok = len((txt or "").split())
        if ntok < 5:
            continue  # half == whole-doc-combine edge; skip trivial docs
        r = by_pair.get((did, did + 1_000_000))
        if r is None:
            missing += 1
        else:
            assert r["containment"] == 1.0
    assert missing == 0
    # symmetric sanity: no pair exceeds 1.0, all meet the threshold;
    # fixture buckets never exceed the cap, so no pair may claim capped
    for r in got:
        assert 0.9 <= r["containment"] <= 1.0
        assert r["id_a"] < r["id_b"]
        assert r["capped"] is False


def test_containment_capped_flag_fires_on_degenerate_bucket(ray_session):
    """A shingle shared by more docs than max_bucket star-truncates its
    pairing, so n_shared (and containment) become lower bounds — every
    surviving pair built from such a bucket must be flagged capped=True
    instead of silently reading as exact."""
    import ray as _ray

    from news_crawler_ray.ops.dedup import containment_dup_pairs

    # 6 identical docs sharing every shingle; cap of 4 forces the star
    text = "alpha beta gamma delta epsilon zeta eta theta"
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": [text] * 6,
        }
    )
    out = containment_dup_pairs(
        _ray.data.from_arrow(tbl), k=5, threshold=0.9, max_bucket=4
    ).take_all()
    assert out, "identical docs must still pair under the star fallback"
    for r in out:
        assert r["capped"] is True
        assert r["containment"] == 1.0  # identical docs: bound is tight


def test_dedup_lines_first_wins_hand_case(ray_session):
    """Cross-doc dup keeps the earliest doc's copy; within-doc dup keeps
    the first line_no; empty lines are structural and never removed."""
    import ray as _ray

    from news_crawler_ray.ops.text import dedup_lines_first_wins

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta\n\nshared line\nalpha beta",  # within-doc dup + empty
                    "shared line\nunique two",  # cross-doc dup (later doc)
                    "",  # empty doc
                ],
                pa.string(),
            ),
        }
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines_first_wins(
            _ray.data.from_arrow(tbl), min_len=1
        ).take_all()
    }
    assert out[1]["clean_text"] == "alpha beta\n\nshared line"
    assert out[1]["n_removed"] == 1  # the repeated 'alpha beta'
    assert out[2]["clean_text"] == "unique two"
    assert out[2]["n_removed"] == 1  # 'shared line' lost to doc 1
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 0


def test_gopher_quality_rule_bits(ray_session):
    """Each Gopher rule fires on a targeted document; the clean doc
    passes every rule."""
    import ray as _ray

    from news_crawler_ray.ops.text import gopher_quality_flags

    good = (
        "the quick brown fox and the lazy dog have fun with that be to of and "
        * 4
    ).strip()
    docs = {
        0: good,  # passes all seven rules
        1: "the quick brown fox and that have be with of",  # <50 words
        2: good + " " + "#tag " * 20,  # symbol ratio > 0.1
        3: good + "\n" + "\n".join("- item" for _ in range(30)),  # bullets
        4: good + "\n" + "\n".join("trailing off..." for _ in range(30)),
        5: good + " " + "123 456 " * 30,  # <80% alpha words
        6: "zzz www qqq rrr " * 16,  # no required stopwords
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
        }
    )
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(_ray.data.from_arrow(tbl)).take_all()
    }
    assert out[0]["keep"] is True and out[0]["reasons"] == 0
    assert out[1]["reasons"] & (1 << 0)
    assert out[2]["reasons"] & (1 << 2)
    assert out[3]["reasons"] & (1 << 3) and not out[3]["reasons"] & (1 << 0)
    assert out[4]["reasons"] & (1 << 4)
    assert out[5]["reasons"] & (1 << 5)
    assert out[6]["reasons"] & (1 << 6)


def test_ccnet_ppl_buckets_properties(ray_session, sf_dir):
    """Bucket sizes follow NTILE (bigger-first, differ by <=1), buckets
    are monotone in avg_bits, quantized bits are exact ints."""
    from news_crawler_ray.pipelines.queries import q_ccnet_ppl_buckets

    rows = q_ccnet_ppl_buckets(sf_dir).take_all()
    assert rows
    sizes = {}
    for r in rows:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
        assert r["n_bigrams"] >= 1 and r["bits_q"] >= 0
    assert set(sizes) == {1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sizes[1] >= sizes[2] >= sizes[3]  # NTILE: bigger buckets first
    b1 = max(r["avg_bits"] for r in rows if r["bucket"] == 1)
    b3 = min(r["avg_bits"] for r in rows if r["bucket"] == 3)
    assert b1 <= b3  # head (low perplexity) strictly before tail


def test_bm25_search_vs_duckdb(ray_session, sf_dir):
    """BM25 top-k matches the DuckDB oracle bit-exactly (quantized int
    contributions) and ranks multi-term matches sensibly."""
    import duckdb

    from news_crawler_ray.pipelines.queries import build_oracle_sql, q_bm25_search

    got = q_bm25_search(sf_dir).take_all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(build_oracle_sql(sf_dir)["bm25_search"]).arrow().to_pylist()
    assert got == want
    scores = [r["score_q"] for r in got]
    assert scores == sorted(scores, reverse=True)
    assert all(r["n_hits"] >= 1 for r in got)


def test_lexical_diversity_vs_duckdb(ray_session, sf_dir):
    """Per-lang vocab/hapax/TTR match DuckDB bit-exactly; invariants
    hold (hapax <= vocab <= tokens)."""
    import duckdb

    from news_crawler_ray.pipelines.queries import (
        build_oracle_sql,
        q_lexical_diversity,
    )

    got = sorted(q_lexical_diversity(sf_dir).take_all(), key=lambda r: r["lang"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        con.execute(build_oracle_sql(sf_dir)["lexical_diversity"])
        .arrow()
        .to_pylist(),
        key=lambda r: r["lang"],
    )
    assert got == want
    for r in got:
        assert r["hapax"] <= r["vocab"] <= r["n_tokens"]
        assert 0.0 < r["ttr"] <= 1.0


def test_doc_length_histogram_bucket_exactness(ray_session, sf_dir):
    """frexp bucket == bit_length(n_chars+1) for every doc; counts sum
    to the corpus size."""
    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines.queries import q_doc_length_histogram

    out = q_doc_length_histogram(sf_dir)
    rows = out.to_pylist() if hasattr(out, "to_pylist") else out.take_all()
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    assert sum(r["n_docs"] for r in rows) == docs.num_rows
    for r in rows:
        lo, hi = 2 ** (r["len_bucket"] - 1) - 1, 2 ** r["len_bucket"] - 2
        avg = r["sum_chars"] / r["n_docs"]
        assert lo <= avg <= hi  # bucket really bounds its members


def test_sorted_mat_heals_degenerate_layouts(ray_session):
    """A many-tiny-block input is coalesced below the cap before the
    sort (same rows, same order); a well-formed input is left alone."""
    import ray as _ray

    from news_crawler_ray.ops.exchange import sorted_mat

    t = pa.table(
        {
            "k": pa.array([i % 7 for i in range(5000)], pa.int64()),
            "v": pa.array(list(range(5000)), pa.int64()),
        }
    )
    shattered = _ray.data.from_arrow([t.slice(i * 10, 10) for i in range(500)])
    # Explicit cap: the default is max(64, 2*cluster CPUs), which on a
    # >64-CPU host exceeds the 128 this test asserts.
    healed = sorted_mat(shattered, ["k", "v"], max_blocks=64)
    assert healed.num_blocks() <= 128
    expected = t.sort_by([("k", "ascending"), ("v", "ascending")])
    got = pa.Table.from_pylist(healed.take_all(), schema=t.schema)
    assert got.equals(expected)
    whole = _ray.data.from_arrow([t.slice(i * 1250, 1250) for i in range(4)])
    kept = sorted_mat(whole, ["k", "v"])
    assert kept.num_blocks() <= 4
    assert pa.Table.from_pylist(kept.take_all(), schema=t.schema).equals(expected)


def test_pair_many_matches_per_run_path(ray_session):
    """The vectorized multi-run pairing must emit exactly the per-run
    path's pairs — counts, sizes, and capped flags — on a randomized
    exploded set including an over-cap bucket."""
    import numpy as np
    import ray as _ray

    from news_crawler_ray.ops.dedup import shared_fingerprint_pairs

    rng = np.random.default_rng(7)
    ids = rng.integers(0, 40, size=3000)
    fps = rng.integers(0, 150, size=3000)
    # ensure one boilerplate fp shared by every id (over-cap with cap=8)
    fps[:200] = 999
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "fp": pa.array(fps, pa.int64()),
            "n_set": pa.array(np.full(len(ids), 5), pa.int64()),
        }
    )
    # value-dedup per id as the contract requires
    tbl = tbl.group_by(["doc_id", "fp"]).aggregate([("n_set", "min")])
    tbl = pa.table(
        {"doc_id": tbl["doc_id"], "fp": tbl["fp"], "n_set": tbl["n_set_min"]}
    )

    def run(disable_vectorized: bool):
        import news_crawler_ray.ops.dedup as D

        ds = _ray.data.from_arrow(
            [tbl.slice(i, 500) for i in range(0, tbl.num_rows, 500)]
        )
        out = shared_fingerprint_pairs(
            ds, min_shared=1, max_bucket=8, emit_capped=True, size_col="n_set"
        )
        rows = sorted(
            (r["id_a"], r["id_b"], r["n_shared"], r["n_a"], r["n_b"], r["capped"])
            for r in out.take_all()
        )
        return rows

    vec = run(False)
    # disable pair_many by stripping the attribute mid-flight: re-run
    # with a monkeypatched _bucketed_pairs that hides it
    import news_crawler_ray.ops.dedup as D

    orig = D._bucketed_pairs

    def no_vec(ds, key_cols, pair_fn, **kw):
        class Hidden:
            def __call__(self, t, a, b):
                return pair_fn(t, a, b)

        return orig(ds, key_cols, Hidden(), **kw)

    D._bucketed_pairs = no_vec
    try:
        plain = run(True)
    finally:
        D._bucketed_pairs = orig
    assert vec == plain and len(vec) > 0


def test_attach_group_agg_matches_join_back_plan(ray_session):
    """attach_group_agg must equal the aggregate-then-join-back plan:
    per-key sum/count/min attached to every row, keys spanning blocks
    included."""
    import numpy as np
    import ray as _ray

    from news_crawler_ray.ops.window import attach_group_agg

    rng = np.random.default_rng(3)
    k = rng.integers(0, 9, size=1000)
    v = rng.integers(1, 100, size=1000)
    t = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(v, pa.int64())})
    ds = _ray.data.from_arrow([t.slice(i, 100) for i in range(0, 1000, 100)])
    out = attach_group_agg(
        ds, "k", [("s", "sum", "v"), ("n", "count_all", None), ("mn", "min", "v")]
    ).take_all()
    assert len(out) == 1000
    import collections

    sums = collections.Counter()
    cnts = collections.Counter()
    mins: dict = {}
    for kk, vv in zip(k.tolist(), v.tolist()):
        sums[kk] += vv
        cnts[kk] += 1
        mins[kk] = min(mins.get(kk, 10**9), vv)
    for r in out:
        assert r["s"] == sums[r["k"]]
        assert r["n"] == cnts[r["k"]]
        assert r["mn"] == mins[r["k"]]


def test_attach_group_agg_empty_input_keeps_schema(ray_session):
    """The empty path must carry the attached spec + mark_first columns
    so downstream drop/select logic sees one schema regardless of input
    row count."""
    import ray as _ray

    from news_crawler_ray.ops.window import attach_group_agg

    t = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    out = attach_group_agg(
        _ray.data.from_arrow(t),
        "k",
        [("s", "sum", "v"), ("n", "count_all", None)],
        mark_first="first",
    )
    schema = out.schema()
    assert schema.names == ["k", "v", "first", "s", "n"]
    assert out.count() == 0
    # and the columns are droppable exactly like the non-empty path
    # (arrow-level: downstream stages call Table.drop_columns on blocks)
    import ray as _ray2

    blocks = [_ray2.get(r) for r in out.to_arrow_refs()]
    assert blocks, "empty path must still emit one schema-bearing block"
    for b in blocks:
        assert b.drop_columns(["s", "n", "first"]).schema.names == ["k", "v"]


def test_audio_envelope_hash_noise_robust_and_exact():
    """Near-dup clips (tiny additive noise) hash within 6 bits; the
    bit rule is the exact integer cross-multiply."""
    import numpy as np

    from news_crawler_ray.ops.hashing import hamming_distance64
    from news_crawler_ray.ops.multimodal import audio_envelope_hash64

    r = np.random.default_rng(5)
    t = np.arange(2000) / 8000.0
    base = (6000 * np.sin(2 * np.pi * 440 * t)).astype(np.int64)
    a = np.clip(base + r.integers(-300, 300, 2000), -32768, 32767).astype("int16")
    b = np.clip(base + r.integers(-40, 40, 2000), -32768, 32767).astype("int16")
    c = (np.abs(base[::-1]) // 3 * np.sign(np.roll(base, 777))).astype("int16")
    ha, hb, hc = (audio_envelope_hash64(x) for x in (a, b, c))
    d_ab = int(hamming_distance64(
        np.array([ha], np.int64).astype(np.uint64),
        np.array([hb], np.int64).astype(np.uint64))[0])
    assert d_ab <= 6
    # manual replica of the bit rule on `a`
    s = np.abs(a.astype(np.int64)); n = len(s); total = int(s.sum())
    bits = []
    for k in range(64):
        lo, hi = k * n // 64, (k + 1) * n // 64
        bits.append(int(s[lo:hi].sum()) * n > total * (hi - lo))
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    assert np.int64(np.uint64(val)) == ha
    assert audio_envelope_hash64(np.array([], np.int16)) == 0


def test_audio_near_dup_pairs_planted(ray_session):
    """Planted near-dups are found via the banded exchange; the pair
    set equals the sequential all-pairs oracle (expected.py)."""
    from news_crawler_ray.pipelines.expected import expected_audio_near_dup
    from news_crawler_ray.pipelines.queries import q_audio_near_dup

    got = sorted(
        (r["id_a"], r["id_b"]) for r in q_audio_near_dup("unused").take_all()
    )
    exp_tbl = expected_audio_near_dup()
    exp = sorted(zip(exp_tbl["id_a"].to_pylist(), exp_tbl["id_b"].to_pylist()))
    assert got == exp
    # planted (i-1, i) dups at i % 4 == 0 are all present
    planted = {(i - 1, i) for i in range(4, 120, 4)}
    assert planted <= set(got)


def test_video_scene_cuts_planted(ray_session):
    """Planted scene cuts (fresh background every 6th frame) are
    counted exactly; clips with fewer frames than the cut interval have
    zero cuts; matches the sequential oracle."""
    from news_crawler_ray.pipelines.expected import expected_video_scene_cuts
    from news_crawler_ray.pipelines.queries import q_video_scene_cuts

    got = {r["video_id"]: r for r in q_video_scene_cuts("unused").take_all()}
    exp = expected_video_scene_cuts().to_pylist()
    assert len(got) == len(exp)
    any_cut = False
    for e in exp:
        g = got[e["video_id"]]
        assert (g["n_frames"], g["n_cuts"], g["max_delta_milli"]) == (
            e["n_frames"], e["n_cuts"], e["max_delta_milli"]
        )
        expected_cuts = (e["n_frames"] - 1) // 6
        assert g["n_cuts"] == expected_cuts
        any_cut |= g["n_cuts"] > 0
    assert any_cut


def test_media_stages_row_level_corrupt_payloads(ray_session):
    """ADVICE r4: corrupt/truncated media payloads must degrade
    row-locally in EVERY audio/video stage — skip the clip (or mark it
    failed), never abort the batch. Covers AudioHashStage,
    AudioSpectralStage, VideoSceneCutStage, VideoFrameSampleStage, and
    curate_video_manifest_batch, including the nasty case of a VALID
    NCV1 header over truncated frame data and a zero-frame container."""
    import struct as _struct

    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.ops.multimodal import (
        AudioHashStage,
        AudioSpectralStage,
        VideoFrameSampleStage,
        VideoSceneCutStage,
        curate_video_manifest_batch,
    )

    astore = synth.make_audiostore(2, seed=7)
    bad_audio = pa.table(
        {
            "audio_id": pa.array(["g0", "bad", "g1"], pa.string()),
            "bytes": pa.array(
                [
                    astore["bytes"][0].as_py(),
                    b"not a wav",
                    astore["bytes"][1].as_py(),
                ],
                pa.binary(),
            ),
        }
    )
    assert AudioHashStage()(bad_audio)["audio_id"].to_pylist() == ["g0", "g1"]
    assert AudioSpectralStage()(bad_audio)["audio_id"].to_pylist() == ["g0", "g1"]

    vstore = synth.make_videostore(1, seed=7)
    good = vstore["bytes"][0].as_py()
    truncated = good[: len(good) - max(64, len(good) // 3)]
    zero_frames = b"NCV1" + _struct.pack("<HBI", 10, 0, 0)
    bad_video = pa.table(
        {
            "video_id": pa.array(
                ["v_good", "v_trunc", "v_garbage", "v_zero"], pa.string()
            ),
            "bytes": pa.array(
                [good, truncated, b"garbage", zero_frames], pa.large_binary()
            ),
        }
    )
    assert VideoSceneCutStage()(bad_video)["video_id"].to_pylist() == ["v_good"]
    sampled = VideoFrameSampleStage(every_n=4)(bad_video)
    assert set(sampled["video_id"].to_pylist()) == {"v_good"}
    manifest = curate_video_manifest_batch(bad_video, min_frames=1)
    assert manifest["video_id"].to_pylist() == ["v_good"]
