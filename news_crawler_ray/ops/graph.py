"""Connected components over an edge list — iterative hash-min.

Resolves near-duplicate PAIRS (minhash/simhash/cosine output) into
duplicate CLUSTERS: every node gets the minimum node id reachable from
it (the cluster representative a dedup pipeline keeps). The one-pass
pair resolution in ops/dedup is a transitive APPROXIMATION; this is the
exact closure.

Algorithm: hash-min label propagation. labels start as node ids; each
round every node takes the min of its own label and its neighbors'
labels; converged when no label changes. Rounds = graph diameter —
near-dup graphs are star/clique-shaped (diameter ≤ ~3), so 2-4 rounds
in practice; for long-chain graphs switch to large-star/small-star
contraction (same exchange shape, fewer rounds).

Each round is TWO task-based sort exchanges (stages/index.
key_complete_parts + ops/agg.sorted_group_agg) — no hash shuffle, no
actor pools, no driver row loops. Convergence detection is O(1) driver
work: labels only ever decrease, so sum(labels) is a fixpoint
fingerprint (equal sum ⇔ no change).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_SIDE = "_side"  # 0 = label row (sorts first within a node run), 1 = edge row


@ray.remote
def _propagate_block(node_col: str, label_col: str, *parts: pa.Table) -> pa.Table:
    """For ONE node-complete block: emit (node, label) for the node
    itself plus (neighbor, label) along every outgoing edge."""
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    idx = pc.sort_indices(
        tbl, sort_keys=[(node_col, "ascending"), (_SIDE, "ascending")]
    )
    s = tbl.take(idx)
    n = s.num_rows
    sides = np.asarray(s[_SIDE])
    is_label = sides == 0
    keys = s[node_col].combine_chunks()
    first = np.empty(n, dtype=bool)
    first[0] = True
    if n > 1:
        first[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    run_ids = np.cumsum(first) - 1
    starts = np.flatnonzero(first)
    labels = np.asarray(pc.fill_null(s[label_col], -1), dtype=np.int64)
    node_ids = np.asarray(keys, dtype=np.int64)
    # per-run label: the side-0 row sorts first in its run; a run with no
    # label row (shouldn't happen — labels cover all nodes) falls back to
    # the node id itself
    run_label = np.where(is_label[starts], labels[starts], node_ids[starts])
    out_label = run_label[run_ids]
    dsts = np.asarray(pc.fill_null(s["_dst"], -1), dtype=np.int64)
    out_node = np.where(is_label, node_ids, dsts)
    return pa.table(
        {
            node_col: pa.array(out_node, pa.int64()),
            label_col: pa.array(out_label, pa.int64()),
        }
    )


@ray.remote
def _union_find_task(node_col: str, label_col: str, *parts: pa.Table) -> pa.Table:
    """Exact single-task components (path-halving union-find by min id)."""
    tables = [p for p in parts if p.num_rows]
    if not tables:
        return pa.table(
            {node_col: pa.array([], pa.int64()), label_col: pa.array([], pa.int64())}
        )
    tbl = pa.concat_tables(tables)
    a = np.asarray(tbl[node_col], dtype=np.int64)
    b = np.asarray(tbl["_dst"], dtype=np.int64)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by MIN id so roots are the component representative
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    nodes = np.unique(np.concatenate([a, b]))
    labels = np.fromiter((find(int(v)) for v in nodes), dtype=np.int64, count=len(nodes))
    return pa.table(
        {
            node_col: pa.array(nodes, pa.int64()),
            label_col: pa.array(labels, pa.int64()),
        }
    )


def connected_components(
    edges,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    node_col: str = "node",
    label_col: str = "component",
    max_iters: int = 25,
    small_input_rows: int = 4_000_000,
):
    """Dataset[(src, dst)] → Dataset[(node, component)] with component =
    min reachable node id. Edges are treated as undirected; node ids
    must be int64."""
    from ..ops.agg import sorted_distinct, sorted_group_agg
    from ..stages.index import key_complete_parts

    def to_und(t: pa.Table) -> pa.Table:
        a = pc.cast(t[src_col], pa.int64())
        b = pc.cast(t[dst_col], pa.int64())
        return pa.table(
            {
                node_col: pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "_dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    und = edges.map_batches(to_und, batch_format="pyarrow", zero_copy_batch=True)
    und = und.materialize()  # reused every round; edges never change
    if und.count() <= small_input_rows:
        # small-graph fast path: each hash-min round costs two fixed-
        # overhead exchanges regardless of size — below the threshold a
        # single union-find task is exact and ~free. Same output.
        return ray.data.from_arrow_refs(
            [
                _union_find_task.remote(
                    node_col, label_col, *und.to_arrow_refs()
                )
            ]
        )
    labels = sorted_distinct(und, [node_col]).map_batches(
        lambda t: t.append_column(label_col, pc.cast(t[node_col], pa.int64())),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    prev_sum = None
    converged = False
    for _ in range(max_iters):

        def tag_edges(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    node_col: t[node_col],
                    "_dst": t["_dst"],
                    label_col: pa.nulls(t.num_rows, pa.int64()),
                    _SIDE: pa.array(np.ones(t.num_rows, np.int8)),
                }
            )

        def tag_labels(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    node_col: t[node_col],
                    "_dst": pa.nulls(t.num_rows, pa.int64()),
                    label_col: t[label_col],
                    _SIDE: pa.array(np.zeros(t.num_rows, np.int8)),
                }
            )

        tagged = und.map_batches(
            tag_edges, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            labels.map_batches(tag_labels, batch_format="pyarrow", zero_copy_batch=True)
        )
        groups = key_complete_parts(tagged, node_col, order=[_SIDE])
        if not groups:
            converged = True  # nothing to propagate — labels are final
            break
        messages = ray.data.from_arrow_refs(
            [_propagate_block.remote(node_col, label_col, *parts) for parts in groups]
        )
        labels = sorted_group_agg(
            messages, [node_col], [(label_col, "min", label_col)]
        ).materialize()
        # labels only decrease → equal sum ⇔ fixpoint
        cur_sum = labels.sum(label_col)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # a chain longer than max_iters hops exits here with PARTIAL
        # labels — surface it instead of returning them as if exact
        # (raise, not log: downstream dedup would silently keep wrong
        # cluster representatives)
        raise RuntimeError(
            f"connected_components did not converge in max_iters={max_iters} "
            "rounds (graph diameter exceeds it); raise max_iters or use "
            "large-star/small-star contraction for long-chain graphs"
        )
    return labels


# ------------------------------------------------------------------ pagerank


def pagerank_int(
    edges,
    num_nodes: int,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 8,
):
    """Distributed PageRank in EXACT integer arithmetic.

    Standard power iteration — contribution = rank // out_degree, new
    rank = base + damping * sum(contributions) // den, dangling mass
    dropped (both sides identically) — but entirely on int64, so the
    result is bit-identical at any parallelism and a sequential oracle
    can verify it exactly; a float PageRank would depend on per-key
    summation order. Per iteration: one hash join (edge src → current
    rank) and one sum-by-dst on the task-based sort exchange. Ranks are
    a Dataset, never a driver structure — at 10^10 nodes the rank table
    shuffles, it does not collect.

    Returns a Dataset (node:int64, rank:int64); rank ≈ probability ×
    ``scale``.
    """
    from .agg import sorted_group_agg

    base = ((damping_den - damping_num) * (scale // num_nodes)) // damping_den
    r0 = scale // num_nodes

    deg = sorted_group_agg(edges, [src_col], [("deg", "count_all", None)])
    edges_deg = edges.join(
        deg, join_type="inner", num_partitions=num_partitions, on=(src_col,)
    )

    nodes_zero = ray.data.range(num_nodes).map_batches(
        lambda b: pa.table(
            {
                dst_col: pa.array(np.asarray(b["id"], dtype=np.int64), pa.int64()),
                "contrib": pa.array(np.zeros(b.num_rows, np.int64()), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    ranks = ray.data.range(num_nodes).map_batches(
        lambda b: pa.table(
            {
                src_col: pa.array(np.asarray(b["id"], dtype=np.int64), pa.int64()),
                "rank": pa.array(np.full(b.num_rows, r0, np.int64()), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    for _ in range(iters):
        j = edges_deg.join(
            ranks, join_type="inner", num_partitions=num_partitions, on=(src_col,)
        )

        def contrib(t: pa.Table) -> pa.Table:
            r = np.asarray(t["rank"], dtype=np.int64)
            d = np.asarray(t["deg"], dtype=np.int64)
            return pa.table(
                {
                    dst_col: t[dst_col],
                    "contrib": pa.array(r // np.maximum(d, 1), pa.int64()),
                }
            )

        sums = sorted_group_agg(
            j.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True)
            .union(nodes_zero),
            [dst_col],
            [("s", "sum", "contrib")],
        )

        def renew(t: pa.Table) -> pa.Table:
            s = np.asarray(t["s"], dtype=np.int64)
            return pa.table(
                {
                    src_col: t[dst_col],
                    "rank": pa.array(
                        base + (damping_num * s) // damping_den, pa.int64()
                    ),
                }
            )

        ranks = sums.map_batches(
            renew, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"node": t[src_col], "rank": t["rank"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------- triangle count


@ray.remote
def _wedge_block(node_cap: int, max_adjacency: int, *parts: pa.Table) -> pa.Table:
    """Wedges for the a-complete exchange task: for each low endpoint
    ``a`` (its whole higher-adjacency is in this task post-exchange),
    emit every neighbor pair (b, c), b < c, packed as b·node_cap + c.
    Per-run np.triu_indices keeps the inner pair generation vectorized;
    the run loop is over DISTINCT a values only."""
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    s = tbl.take(
        pc.sort_indices(tbl, sort_keys=[("a", "ascending"), ("b", "ascending")])
    )
    a = np.asarray(s["a"], dtype=np.int64)
    b = np.asarray(s["b"], dtype=np.int64)
    n = len(a)
    new_a = np.empty(n, dtype=bool)
    new_a[0] = True
    new_a[1:] = a[1:] != a[:-1]
    starts = np.flatnonzero(new_a)
    lens = np.diff(np.concatenate([starts, [n]]))
    if lens.max(initial=0) > max_adjacency:
        raise ValueError(
            f"triangle_count: adjacency of {lens.max()} exceeds "
            f"max_adjacency={max_adjacency} — order edges by degree "
            "(degree-ordered canonicalization) to bound wedge blowup"
        )
    out = []
    for st, ln in zip(starts.tolist(), lens.tolist()):
        if ln < 2:
            continue
        nb = b[st : st + ln]
        i, j = np.triu_indices(ln, 1)
        out.append(nb[i] * node_cap + nb[j])
    keys = np.concatenate(out) if out else np.zeros(0, np.int64)
    return pa.table({"wk": pa.array(keys, pa.int64())})


def degree_ordered_relabel(edges) -> "tuple[object, int]":
    """Relabel an undirected canonical edge set (a < b) by DEGREE RANK:
    node → its dense index in ascending (degree, node) order, edges
    re-canonicalized as (min_rank, max_rank). In rank space the wedge
    pivot of every triangle is its lowest-DEGREE vertex, so per-pivot
    adjacency is bounded by O(sqrt(m)) — the classic hub fix for wedge
    blowup (a 10^6-degree hub relabels to the highest ranks and is
    never a pivot). Three narrow exchanges: degree combiner group-agg,
    the rank sort, and two relabel joins. Returns
    ``(relabeled_edges_dataset, n_nodes)``."""
    from ..stages.index import zip_with_index
    from .agg import sorted_group_agg
    from .join import sort_merge_inner_join

    def expl(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [np.asarray(t["a"], np.int64), np.asarray(t["b"], np.int64)]
        )
        u, c = np.unique(nodes, return_counts=True)  # per-block partial
        return pa.table(
            {"node": pa.array(u, pa.int64()), "d": pa.array(c, pa.int64())}
        )

    deg = sorted_group_agg(
        edges.map_batches(expl, batch_format="pyarrow", zero_copy_batch=True),
        ["node"],
        [("d", "sum", "d")],
    )
    ranked = zip_with_index(deg, ["d", "node"], [False, False], rank_col="rank")
    n_nodes = ranked.count()
    # endpoint a → rank, then endpoint b → rank, then re-canonicalize
    e1 = sort_merge_inner_join(
        edges, ranked, "a", ["b"], ["rank"], right_key="node"
    ).map_batches(
        lambda t: pa.table({"b": t["b"], "ra": t["rank"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    e2 = sort_merge_inner_join(e1, ranked, "b", ["ra"], ["rank"], right_key="node")

    def canon(t: pa.Table) -> pa.Table:
        ra = np.asarray(t["ra"], np.int64)
        rb = np.asarray(t["rank"], np.int64)
        return pa.table(
            {
                "a": pa.array(np.minimum(ra, rb), pa.int64()),
                "b": pa.array(np.maximum(ra, rb), pa.int64()),
            }
        )

    return (
        e2.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True),
        n_nodes,
    )


def triangle_count(
    edges, node_cap: int, max_adjacency: int = 65536, degree_ordered: bool = False
) -> pa.Table:
    """Exact triangle count of an undirected graph given CANONICAL
    distinct edges (a < b, both in [0, node_cap)). Two scale-safe legs:

    1. a-key-complete exchange → per-task vectorized wedge generation
       (all (b, c) neighbor pairs of each low endpoint, packed into one
       int64 key — O(Σ deg²) rows, the algorithm's inherent cost;
       ``max_adjacency`` raises loudly on hub blowup);
    2. sort-merge SEMI join of wedges against the packed edge set —
       each surviving wedge (a,b,c) is exactly one triangle, counted
       once (a < b < c by construction).

    ``degree_ordered=True`` applies :func:`degree_ordered_relabel`
    first — the hub-graph scale path: wedge pivots become lowest-degree
    vertices, bounding per-task wedge fan-out at O(sqrt(m)) instead of
    O(max_degree²). The count is identical (rank relabeling is a
    bijection; triangles are orientation-invariant).

    Returns a 1-row table (n_triangles:int64)."""
    from ..stages.index import key_complete_parts
    from .join import sort_merge_semi_join

    if degree_ordered:
        edges, node_cap = degree_ordered_relabel(edges)

    groups = key_complete_parts(edges, "a", order=["b"])
    if not groups:
        return pa.table({"n_triangles": pa.array([0], pa.int64())})
    wedges = ray.data.from_arrow_refs(
        [_wedge_block.remote(node_cap, max_adjacency, *parts) for parts in groups]
    )
    ekeys = edges.map_batches(
        lambda t: pa.table(
            {
                "wk": pc.add(
                    pc.multiply(pc.cast(t["a"], pa.int64()), node_cap),
                    pc.cast(t["b"], pa.int64()),
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    n = sort_merge_semi_join(wedges, ekeys, "wk").count()
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


# --------------------------------------------------------------------------
# redirect-chain resolution — pointer doubling over a functional mapping
# --------------------------------------------------------------------------


@ray.remote
def _count_unresolved(t: "pa.Table") -> int:
    if t.num_rows == 0:
        return 0
    return int(pc.sum(pc.invert(t["done"])).as_py() or 0)


def resolve_redirects(edges, src_col: str = "src", dst_col: str = "dst",
                      max_hops: int = 64):
    """Resolve every redirect chain to its terminal URL in
    O(log max_hops) rounds of pointer DOUBLING — the crawl-frontier
    canonicalization a fetch scheduler runs before keying the seen-set
    (a 3xx chain's members are one logical page). ``edges`` is a
    functional mapping (one dst per src); a URL that never appears as
    src is terminal. Chains longer than ``max_hops`` and true cycles
    both come back as loops.

    Each round self-joins the state on the task-based key-complete
    exchange (ops/join.sort_merge_inner_join, how='left'): an unmatched
    cur is terminal (done); a matched one jumps 2^k hops at once, so a
    length-L chain resolves in ceil(log2 L)+1 rounds — vs L rounds for
    the naive walk, the difference between 7 and 10^6 exchanges on
    pathological chains. Output (src_url, final_url, n_hops, is_loop)
    with final_url='' and n_hops=0 for loops (kept deliberately
    non-null so the SQL oracle's coalesce matches bit-for-bit).

    Rounds stop EARLY once every chain is resolved: a one-int-per-block
    count of unresolved rows between rounds (~0.1 s) skips the
    remaining join exchanges (~0.5 s each) — with the default
    ``max_hops=64`` budget (7 rounds) real redirect chains of 1–3 hops
    converge in 3.

    SQL equivalent: WITH RECURSIVE walk — the oracle in
    pipelines/queries.py re-derives the closure in DuckDB."""
    import math

    from .join import sort_merge_inner_join

    def init(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_url": t[src_col],
                "cur": t[dst_col],
                "hops": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                "done": pa.array(np.zeros(t.num_rows, bool), pa.bool_()),
            }
        )

    state = edges.map_batches(init, batch_format="pyarrow", zero_copy_batch=True)
    rounds = max(1, int(math.ceil(math.log2(max(2, max_hops))))) + 1

    for _ in range(rounds):
        def as_right(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "jkey": t["src_url"],
                    "nxt": t["cur"],
                    "hops2": t["hops"],
                    "done2": t["done"],
                }
            )

        right = state.map_batches(
            as_right, batch_format="pyarrow", zero_copy_batch=True
        )
        joined = sort_merge_inner_join(
            state,
            right,
            "cur",
            ["src_url", "hops", "done"],
            ["nxt", "hops2", "done2"],
            right_key="jkey",
            how="left",
        )

        def advance(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {
                        "src_url": pa.array([], pa.string()),
                        "cur": pa.array([], pa.string()),
                        "hops": pa.array([], pa.int64()),
                        "done": pa.array([], pa.bool_()),
                    }
                )
            matched = pc.and_(pc.is_valid(t["nxt"]), pc.invert(t["done"]))
            cur = pc.if_else(matched, t["nxt"], t["cur"])
            hops = pc.add(
                t["hops"],
                pc.if_else(matched, pc.fill_null(t["hops2"], 0), 0),
            )
            # a cur with no mapping entry is terminal; jumping onto a
            # resolved suffix (done2) finishes the whole chain at once
            done = pc.or_(
                t["done"],
                pc.or_(
                    pc.invert(pc.is_valid(t["nxt"])),
                    pc.and_(matched, pc.fill_null(t["done2"], False)),
                ),
            )
            return pa.table(
                {"src_url": t["src_url"], "cur": cur, "hops": hops, "done": done}
            )

        # materialize is NOT extra work: the next round's join
        # (ops/exchange.sorted_mat) would land these blocks anyway, and
        # it stops the advance maps re-executing once per consumer
        state = joined.map_batches(
            advance, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        rem_refs = [
            _count_unresolved.remote(r) for r in state.to_arrow_refs()
        ]
        if rem_refs and sum(ray.get(rem_refs)) == 0:
            break

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src_url": pa.array([], pa.string()),
                    "final_url": pa.array([], pa.string()),
                    "n_hops": pa.array([], pa.int64()),
                    "is_loop": pa.array([], pa.bool_()),
                }
            )
        loop = pc.invert(t["done"])
        return pa.table(
            {
                "src_url": t["src_url"],
                "final_url": pc.if_else(loop, "", t["cur"]),
                "n_hops": pc.if_else(loop, pa.scalar(0, pa.int64()), t["hops"]),
                "is_loop": loop,
            }
        )

    return state.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
