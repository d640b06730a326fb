"""Image family: features, rules, resize, phash pairs, tile dups, image dedup/knn.

Split from pipelines/queries.py (registry unchanged — see
queries.build_queries); mechanical move, no semantic change.
"""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..ops import dedup as dd
from ..ops import multimodal as mm
from ..ops import sampling as sp
from ..ops import similarity as sim
from ..ops import text as tx
from ..stages.index import assign_stable_ids
from ..stages.parse import merged_distinct_iocs

from .queries_rel import (
    _ds_from_table,
    _read,
)

def q_image_features(sf_dir: str):
    """Image decode + feature extraction over the synthetic page-store."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(synth.make_pagestore(60, seed=42))
    feats = mm.image_features(ps, concurrency=2, batch_size=32)
    return feats.map_batches(
        lambda t: t.select(["image_id", "phash_check", "decode_ok"]),
        batch_format="pyarrow",
    )


def q_ip_block_rules(sf_dir: str):
    """A8+M16 sink path: distinct valid IPs → stable SIDs → rule lines
    (deterministic; non-SQL because the IOC source is the synth fixture)."""
    from ..fixtures import synth
    from ..functions.formatters import ip_rule_lines, validate_ips
    from ..stages.index import assign_stable_ids

    pages = ray.data.from_arrow(synth.make_ioc_pages(60, seed=42))
    iocs = merged_distinct_iocs(pages)

    def valid_ips(t: pa.Table) -> pa.Table:
        ips = t.filter(pc.equal(t["kind"], "ip"))
        v = validate_ips(ips["value"])
        return pa.table({"value": v}).filter(pc.is_valid(v))

    ips = iocs.map_batches(valid_ips, batch_format="pyarrow")
    with_ids = assign_stable_ids(ips, "value", base=7000000)
    return with_ids.map_batches(
        lambda t: ip_rule_lines(t, ip_col="value", sid_col="sid"),
        batch_format="pyarrow",
    )


def q_resize_images(sf_dir: str):
    """Multimodal resize pipeline over the synthetic page-store."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(synth.make_pagestore(40, seed=42))
    out = mm.resize_images(ps, 16, 16, concurrency=2, batch_size=16)
    return out.map_batches(
        lambda t: t.select(["image_id", "w", "h", "fmt"]), batch_format="pyarrow"
    )


def _neardup_iid(t: pa.Table) -> pa.Table:
    """image_id ('img{k:08d}' | 'dup{k:08d}') → int64 iid (dup = k+10^6);
    shared by the query and the sequential oracle so both derive the
    identical ordinal key (canonical a<b pair ordering needs ints)."""
    k = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 11), pa.int64())
    isdup = pc.cast(
        pc.equal(pc.utf8_slice_codeunits(t["image_id"], 0, 3), "dup"), pa.int64()
    )
    iid = pc.add(k, pc.multiply(isdup, pa.scalar(1_000_000, pa.int64())))
    out = t.append_column("iid", iid)
    return out


def q_phash_near_dup(sf_dir: str):
    """Image near-dup pairs over the planted block-pattern page-store:
    decode → recomputed pixel phash → banded hamming ≤ 3 pairing (the
    image-side analog of simhash_pairs; non-SQL, sequential oracle)."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(synth.make_neardup_pagestore(60, seed=42))
    withid = ps.map_batches(
        lambda t: _neardup_iid(t).select(["iid", "bytes", "fmt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = mm.image_near_dup_pairs(withid, concurrency=2, batch_size=32)
    return pairs.map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    )


TILE_DUP_N = 40


def _cropdup_iid(t: pa.Table) -> pa.Table:
    """image_id ('img{k:08d}' | 'crp{k:08d}') → int64 iid (crop = k+10^6);
    shared by the query and the sequential oracle."""
    k = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 11), pa.int64())
    iscrop = pc.cast(
        pc.equal(pc.utf8_slice_codeunits(t["image_id"], 0, 3), "crp"), pa.int64()
    )
    iid = pc.add(k, pc.multiply(iscrop, pa.scalar(1_000_000, pa.int64())))
    return t.append_column("iid", iid)


def q_tile_dup_pairs(sf_dir: str):
    """Crop-robust image near-dup pairs over planted grid-aligned crops
    (ops/multimodal.tile_dup_pairs): codec-invariant tile-hash explode →
    shared-fingerprint pairing — the case phash misses because a crop
    shifts every phash cell. Sequential all-pairs oracle."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(synth.make_cropdup_pagestore(TILE_DUP_N, seed=42))
    withid = ps.map_batches(
        lambda t: _cropdup_iid(t).select(["iid", "bytes", "fmt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return mm.tile_dup_pairs(withid)


def q_image_dedup_corpus(sf_dir: str):
    """END-TO-END image corpus curation (on-axis flagship composition):
    decode → pixel phash → banded hamming pairs → connected components
    → keep each cluster's min iid → anti join drops the other copies.
    Output: the surviving image iids — the 100 TB image-dedup pass as
    one streaming plan."""
    from ..fixtures import synth
    from ..ops.graph import connected_components
    from ..ops.join import sort_merge_anti_join

    ps_tbl = synth.make_neardup_pagestore(60, seed=42)
    withid = _ds_from_table(_neardup_iid(ps_tbl).select(["iid", "bytes", "fmt"]), 8)
    pairs = mm.image_near_dup_pairs(withid, concurrency=2, batch_size=32)
    comp = connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    )
    losers = comp.map_batches(
        lambda t: pa.table(
            {"iid": t.filter(pc.not_equal(t["node"], t["component"]))["node"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ids = _ds_from_table(_neardup_iid(ps_tbl).select(["iid"]), 8)
    return sort_merge_anti_join(ids, losers, key="iid")


def q_hll_users(sf_dir: str):
    """Approximate distinct users via HyperLogLog (4 KB register partials
    per block, max-merge — the at-scale distinct counter). Deterministic;
    verified against an independent sequential register build."""
    from ..ops.agg import hll_distinct

    return hll_distinct(_read(sf_dir, "events", ["user_id"]), "user_id", p=12)


def q_daily_digest(sf_dir: str):
    """K1 digest assembly: one markdown digest document per day over the
    events table, items in (ts, event_id) order (ordered string concat
    on the key-complete exchange; SQL string_agg oracle)."""
    from ..stages.sinks import daily_digest

    return daily_digest(_read(sf_dir, "events", ["event_id", "event_type", "ts"]))


def q_image_dup_clusters(sf_dir: str):
    """Image dedup CLUSTERS: decode → pixel phash → banded hamming pairs
    → exact connected components; every near-dup image mapped to its
    cluster's minimum iid (the canonical copy a 100 TB image-dedup pass
    would keep)."""
    from ..fixtures import synth
    from ..ops.graph import connected_components

    ps = ray.data.from_arrow(synth.make_neardup_pagestore(60, seed=42))
    withid = ps.map_batches(
        lambda t: _neardup_iid(t).select(["iid", "bytes", "fmt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = mm.image_near_dup_pairs(withid, concurrency=2, batch_size=32)
    return connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    )


def q_canonical_images(sf_dir: str):
    """Image near-dup cluster resolution by QUALITY — keep the SHARPEST
    member per phash cluster (the LAION-style keep-best policy; the
    image analog of canonical_docs). decode → banded phash pairs →
    connected components LEFT-joined onto every image (singletons
    self-cluster via coalesce), sharpness = Laplacian variance from the
    exact integer moments (ONE correctly-rounded float division per
    image — both operands < 2^53 so the replica's scalar division is
    bit-identical), then one key-complete group_top_k. Sequential
    oracle expected_canonical_images (all-pairs hamming + union-find +
    the double-loop Laplacian replica)."""
    from ..fixtures import synth
    from ..ops.agg import group_top_k
    from ..ops.graph import connected_components
    from ..ops.join import sort_merge_inner_join

    ps = ray.data.from_arrow(synth.make_neardup_pagestore(60, seed=42))
    withid = ps.map_batches(
        lambda t: _neardup_iid(t).select(["iid", "bytes", "fmt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = mm.image_near_dup_pairs(withid, concurrency=2, batch_size=32)
    comp = connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    ).map_batches(
        lambda t: pa.table({"iid": t["node"], "component": t["component"]})
        if t.num_rows
        else pa.table(
            {"iid": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def sharp_key(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_interior"], np.int64)
        s1 = np.asarray(t["lap_sum"], np.int64)
        s2 = np.asarray(t["lap_sq_sum"], np.int64)
        num = n * s2 - s1 * s1
        den = np.maximum(n, 1) * np.maximum(n, 1)
        return pa.table(
            {
                "iid": t["iid"],
                "sharp_key": pa.array(
                    num.astype(np.float64) / den.astype(np.float64), pa.float64()
                ),
            }
        )

    sharp = mm.sharpness_score(withid).map_batches(
        sharp_key, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = sort_merge_inner_join(
        sharp, comp, "iid", ["sharp_key"], ["component"], how="left"
    )

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "component" not in t.column_names:
            return pa.table(
                {"component": pa.array([], pa.int64()),
                 "iid": pa.array([], pa.int64()),
                 "sharp_key": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "component": pc.coalesce(t["component"], t["iid"]),
                "iid": t["iid"],
                "sharp_key": t["sharp_key"],
            }
        )

    full = joined.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
    top = group_top_k(full, "component", ["sharp_key", "iid"], [True, False], k=1)
    return top.map_batches(
        lambda t: pa.table(
            {"component": t["component"], "canonical_id": t["iid"],
             "sharp_key": t["sharp_key"]}
        ),
        batch_format="pyarrow",
    )


META_AUDIT_N = 60


def _meta_audit_store() -> pa.Table:
    """Pagestore with PLANTED manifest corruption: stored w bumped for
    iid%7==0 rows, stored phash bit-flipped for iid%5==0 rows — payload
    bytes untouched (the corruption an ingest actually sees: stale or
    miscopied manifest columns)."""
    from ..fixtures import synth

    t = synth.make_pagestore(META_AUDIT_N, seed=42)
    iid = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 11), pa.int64())
    ids = iid.to_numpy(zero_copy_only=False)
    w = pc.if_else(
        pa.array(ids % 7 == 0),
        pc.add(t["w"], pa.scalar(1, pa.int32())),
        t["w"],
    )
    ph = pc.if_else(
        pa.array(ids % 5 == 0),
        pc.bit_wise_xor(t["phash"], pa.scalar(1, pa.int64())),
        t["phash"],
    )
    return pa.table(
        {
            "iid": iid,
            "bytes": t["bytes"],
            "w": w,
            "h": t["h"],
            "fmt": t["fmt"],
            "phash": ph,
        }
    )


def q_image_meta_audit(sf_dir: str):
    """Manifest-consistency audit over the image store (ops/multimodal.
    image_meta_audit): header dims vs stored (w,h), pixel-recomputed
    phash vs the stored phash column, decode health — the gate that
    must pass before metadata-only ops (aspect_buckets,
    image_corpus_filter, exact_phash_dups) can trust the manifest.
    Corruption is planted in the METADATA only; sequential replica
    oracle expected_image_meta_audit decodes every image independently."""
    from ..ops.multimodal import image_meta_audit

    return image_meta_audit(_ds_from_table(_meta_audit_store(), 8))


def q_image_knn(sf_dir: str):
    """Image similarity search: decode → 64-dim block-mean embedding →
    exact cosine top-5 (broadcast queries, per-block partial top-k,
    combiner merge — the image analog of knn_cosine)."""
    from ..fixtures import codec, synth

    ps_tbl = synth.make_pagestore(80, seed=42)
    withid = _ds_from_table(ps_tbl, target_blocks=8).map_batches(
        lambda t: pa.table(
            {
                "iid": pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 11), pa.int64()),
                "bytes": t["bytes"],
                "fmt": t["fmt"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    vecs = mm.image_cell_vectors(withid, id_col="iid", batch_size=32)
    # query side: the first 5 images, decoded once on the driver (5 rows)
    qmat = np.stack(
        [
            codec.cell_vector64(codec.decode(b, f))
            for b, f in zip(
                ps_tbl["bytes"].to_pylist()[:5], ps_tbl["fmt"].to_pylist()[:5]
            )
        ]
    )
    out = sim.knn_brute_force(
        vecs, np.arange(5, dtype=np.int64), qmat, k=5, id_col="iid"
    )
    return out.map_batches(
        lambda t: t.select(["query_id", "neighbor_id"]), batch_format="pyarrow"
    )


