"""Link-graph analytics: a deterministic synthetic web graph over the
document corpus plus fixed-iteration integer PageRank.

The reference engine has no graph machinery — this is part of the
LLM-training-data brief (crawl-graph signals: PageRank-style centrality is
a standard crawl-quality prior, e.g. Common Crawl's harmonic-centrality
ranking). Everything is exact-integer so the DuckDB oracle replays the
power iteration bit-for-bit as chained CTEs (the same declared technique
as BPE/kmeans).

Arithmetic (all int64, all values positive so // is floor in numpy and
DuckDB alike):

    r0(v)   = SCALE // n
    BASE    = (15 * r0(v)) // 100                       (damping 0.85)
    r_{t+1} = BASE + (85 * sum_{u->v} (r_t(u) // deg(u))) // 100

Scale shape: ranks and edges are Datasets end-to-end — each iteration is
one bucketed big-big join (edges ⋈ ranks on src, the only pass over the
edge list) feeding a two-phase sum by dst, then a left join back to the
node table for dangling-inbound nodes; iterations are materialized
(the checkpoint barrier every distributed power iteration has). The
driver holds scalars only.
"""

from __future__ import annotations

import glob as globmod
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

PR_SCALE = 10**12
PR_ITERS = 3
GRAPH_VERSION = 1
GRAPH_MAX_OUT = 8


def link_graph_path(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Pure cache path (never builds) — safe to embed in oracle SQL."""
    from .planted import source_tag

    tag = source_tag(f"{sf_dir}/documents.parquet")
    return os.path.join(root, f"linkgraph_g{GRAPH_VERSION}_{tag}")


def ensure_link_graph(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Deterministic directed link graph over doc ids 0..n-1: each source
    doc links to ``1 + md5(i) % GRAPH_MAX_OUT`` targets ``md5(i->j) % n``,
    self-loops dropped and parallel edges deduped; every node keeps at
    least one out-edge (fallback to (i, (i+1) % n)). Pure function of the
    documents table, cached under its content fingerprint."""
    import hashlib

    out = link_graph_path(sf_dir, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    srcs, dsts = [], []
    for i in range(n):
        k = 1 + int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % GRAPH_MAX_OUT
        seen = set()
        for j in range(k):
            d = int(hashlib.md5(f"{i}->{j}".encode()).hexdigest()[:8], 16) % n
            if d != i and d not in seen:
                seen.add(d)
        if not seen:
            seen.add((i + 1) % n)
        for d in sorted(seen):
            srcs.append(i)
            dsts.append(d)
    t = pa.table({"src": pa.array(srcs, pa.int64()),
                  "dst": pa.array(dsts, pa.int64())})
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(t, os.path.join(tmp, "part-0000.parquet"),
                   row_group_size=65536)
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def pagerank_int(edges, n_nodes: int, *, iters: int = PR_ITERS,
                 scale: int = PR_SCALE, num_buckets: int = 32):
    """Fixed-iteration exact-integer PageRank (see module docstring for
    the recurrence). ``edges`` is a (src, dst) Dataset; returns a
    (node_id, pagerank_int) Dataset after ``iters`` power iterations."""
    import ray.data as rd

    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    r0 = scale // n_nodes
    base = (15 * r0) // 100

    deg = two_phase_aggregate(edges, ["src"], [("dst", "count", "d")],
                              num_buckets=num_buckets)
    # fold the static out-degree into the edge list once: each iteration
    # then needs exactly one edges ⋈ ranks join
    edges_d = bucket_hash_join(edges, deg, on="src",
                               num_buckets=num_buckets).materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        v = t.column("id").combine_chunks().cast(pa.int64())
        return pa.table({"v": v,
                         "r": pa.array(np.full(len(v), r0, np.int64))})

    # size-derived block count (the io.read_parquet rule): Ray's default
    # cpus*2 split puts 65 tasks under a 5k-row range at test scale
    nblocks = max(8, n_nodes // (1 << 20) + 1) if n_nodes < (1 << 26) else None
    kw = {"override_num_blocks": nblocks} if nblocks else {}
    nodes = rd.range(n_nodes, **kw).map_batches(
        lambda t: pa.table({"v": t.column("id").combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    ranks = rd.range(n_nodes, **kw).map_batches(init_ranks, batch_format="pyarrow",
                                                zero_copy_batch=True).materialize()

    for _ in range(iters):
        joined = bucket_hash_join(edges_d, ranks, on="src", right_on="v",
                                  num_buckets=num_buckets)

        def contrib(t: pa.Table) -> pa.Table:
            r = t.column("r").to_numpy(zero_copy_only=False)
            d = t.column("d").to_numpy(zero_copy_only=False)
            return pa.table({"dst": t.column("dst"),
                             "c": pa.array(r // d)})

        sums = two_phase_aggregate(
            joined.map_batches(contrib, batch_format="pyarrow",
                               zero_copy_batch=True),
            ["dst"], [("c", "sum", "s")], num_buckets=num_buckets)
        merged = bucket_hash_join(nodes, sums, on="v", right_on="dst",
                                  how="left", fill={"s": 0},
                                  num_buckets=num_buckets)

        def update(t: pa.Table) -> pa.Table:
            s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"v": t.column("v"),
                             "r": pa.array(base + (85 * s) // 100)})

        ranks = merged.map_batches(update, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"node_id": t.column("v"),
                            "pagerank_int": t.column("r")}),
        batch_format="pyarrow", zero_copy_batch=True)


def undirected_edges(edges, *, num_buckets: int = 32):
    """Canonical distinct undirected edge set (a < b): drop self-loops,
    orient min→max, dedup via one two-phase count — the shared first step
    of every undirected-graph stage here (triangles, k-core, clustering
    coefficient)."""
    from .aggregate import two_phase_aggregate

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        m = s != d
        return pa.table({"a": pa.array(np.minimum(s[m], d[m])),
                         "b": pa.array(np.maximum(s[m], d[m]))})

    return two_phase_aggregate(
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], [("a", "count", "_n")], num_buckets=num_buckets
    ).map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow",
                  zero_copy_batch=True)


def explode_halfedges(und):
    """Both directed half-edges (v, nbr) of the canonical edge set — the
    adjacency stream every degree/wedge pass consumes."""

    def adj(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks().cast(pa.int64())
        b = t.column("b").combine_chunks().cast(pa.int64())
        return pa.table({"v": pa.concat_arrays([a, b]),
                         "nbr": pa.concat_arrays([b, a])})

    return und.map_batches(adj, batch_format="pyarrow", zero_copy_batch=True)


def triangle_count(edges, n_nodes: int, *, num_buckets: int = 32):
    """Global triangle census over the undirected link graph: returns one
    row (n_edges, n_wedges, n_triangles) — the clustering-structure
    numbers a crawl-graph health check reports.

    Algorithm (the distributed wedge-check): canonicalize to undirected
    distinct edges (a < b); per center vertex, explode its neighbor set
    into sorted pairs (u < w) — the same vectorized repeat/arange pair
    algebra as pair_cooccurrence — emitting (packed u*n+w, multiplicity)
    partials; bucket-join the wedge keys against the edge-key set and sum
    matches. Every triangle closes exactly 3 wedges (one per center), so
    n_triangles = matches // 3 — an integer identity that doubles as a
    self-check (asserted).

    Scale shape: wedges are Σ_v deg(v)(deg(v))/2 rows of 2 ints each,
    pre-summed per bucket by key; the join is the bucketed big-big join.
    Packing needs n_nodes < 2^31 — for a larger graph swap the packed key
    for the two-column grouped join (documented bound)."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate
    from .join import bucket_hash_join

    if n_nodes >= 1 << 31:
        raise ValueError("triangle_count: packed u*n+w key needs n < 2^31")

    und = undirected_edges(edges, num_buckets=num_buckets)
    halfedges = explode_halfedges(und)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 "cnt": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["v", "nbr"], kind="mergesort")
        vv = g["v"].to_numpy()
        nb = g["nbr"].to_numpy()
        n = len(vv)
        seg_first = np.flatnonzero(np.r_[True, vv[1:] != vv[:-1]])
        k = np.diff(np.r_[seg_first, n])
        li = np.arange(n) - np.repeat(seg_first, k)
        right_rows = np.repeat(np.arange(n), li)
        grp_start = np.repeat(np.cumsum(li) - li, li)
        left_rows = np.repeat(np.repeat(seg_first, k), li) + (
            np.arange(int(li.sum())) - grp_start)
        key = nb[left_rows] * n_nodes + nb[right_rows]  # u < w by sort order
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"key": uk, "cnt": cnt.astype(np.int64)})

    wkeys = grouped_apply(halfedges, ["v"], wedges, num_buckets=num_buckets)
    wsum = two_phase_aggregate(wkeys, ["key"], [("cnt", "sum", "cnt")],
                               num_buckets=num_buckets)

    ekeys = und.map_batches(
        lambda t: pa.table({"key": pa.array(
            t.column("a").to_numpy(zero_copy_only=False) * n_nodes
            + t.column("b").to_numpy(zero_copy_only=False)),
            "is_edge": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)

    closed = bucket_hash_join(wsum, ekeys, on="key",
                              num_buckets=num_buckets)
    totals = two_phase_aggregate(
        closed.map_batches(lambda t: t.select(["key", "cnt"]),
                           batch_format="pyarrow", zero_copy_batch=True)
              .map_batches(lambda t: pa.table(
                  {"one": pa.array(np.zeros(t.num_rows, np.int64)),
                   "cnt": t.column("cnt")}),
                  batch_format="pyarrow", zero_copy_batch=True),
        ["one"], [("cnt", "sum", "closed_wedges")], num_buckets=2).take_all()
    closed_wedges = totals[0]["closed_wedges"] if totals else 0
    assert closed_wedges % 3 == 0, closed_wedges

    stats = two_phase_aggregate(
        halfedges.map_batches(lambda t: pa.table(
            {"one": pa.array(np.zeros(t.num_rows, np.int64)),
             "deg": t.column("v")}), batch_format="pyarrow",
            zero_copy_batch=True),
        ["one"], [("deg", "count", "n_half")], num_buckets=2).take_all()
    n_edges = (stats[0]["n_half"] // 2) if stats else 0
    wtot = two_phase_aggregate(
        wkeys.map_batches(lambda t: pa.table(
            {"one": pa.array(np.zeros(t.num_rows, np.int64)),
             "cnt": t.column("cnt")}), batch_format="pyarrow",
            zero_copy_batch=True),
        ["one"], [("cnt", "sum", "n_wedges")], num_buckets=2).take_all()
    n_wedges = wtot[0]["n_wedges"] if wtot else 0

    return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                     "n_wedges": pa.array([n_wedges], pa.int64()),
                     "n_triangles": pa.array([closed_wedges // 3], pa.int64())})


LP_ITERS = 2
LP_SEED_MOD = 5


def label_propagation(edges, seeds, *, iters: int = LP_ITERS,
                      num_buckets: int = 32):
    """Semi-supervised label propagation over the undirected link graph
    (Zhu & Ghahramani 2002 / community LP): seed nodes keep their label;
    each iteration, every still-unlabeled node adopts the MAJORITY label
    among its labeled neighbors (ties break by label ascending —
    deterministic); ``iters`` fixed rounds so the DuckDB oracle replays
    the schedule as chained CTEs. ``seeds`` is a (v, lab) Dataset;
    returns (node_id, label) for every node labeled after the rounds.

    Scale shape: per iteration one bucketed halfedge ⋈ labels join, a
    two-phase (v, lab) count, a per-bucket vectorized argmax
    (sort + first-of-segment, the topk_per_group shape), and a bucketed
    anti-join against the current label set; labels move as 2-column
    rows."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate
    from .join import bucket_anti_join, bucket_hash_join

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        m = s != d
        a = np.minimum(s[m], d[m])
        b = np.maximum(s[m], d[m])
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    und = two_phase_aggregate(
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], [("a", "count", "_n")], num_buckets=num_buckets)

    def adj(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks().cast(pa.int64())
        b = t.column("b").combine_chunks().cast(pa.int64())
        return pa.table({"v": pa.concat_arrays([a, b]),
                         "nbr": pa.concat_arrays([b, a])})

    halfedges = und.map_batches(adj, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    labels = seeds.materialize()
    for _ in range(iters):
        votes = bucket_hash_join(halfedges, labels, on="nbr", right_on="v",
                                 num_buckets=num_buckets)
        counts = two_phase_aggregate(
            votes.map_batches(lambda t: t.select(["v", "lab"]),
                              batch_format="pyarrow", zero_copy_batch=True),
            ["v", "lab"], [("lab", "count", "c")], num_buckets=num_buckets)

        def argmax(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g):
                return pd.DataFrame({"v": pd.Series([], dtype=np.int64),
                                     "lab": pd.Series([], dtype=str)})
            g = g.sort_values(["v", "c", "lab"],
                              ascending=[True, False, True],
                              kind="mergesort")
            return g.drop_duplicates("v")[["v", "lab"]]

        cand = grouped_apply(counts, ["v"], argmax, num_buckets=num_buckets)
        fresh = bucket_anti_join(cand, labels, on="v",
                                 num_buckets=num_buckets)
        labels = labels.union(fresh).materialize()

    return labels.map_batches(
        lambda t: pa.table({"node_id": t.column("v"),
                            "label": t.column("lab")}),
        batch_format="pyarrow", zero_copy_batch=True)


def two_hop_reach(edges, *, num_buckets: int = 32):
    """Per-node 2-hop reach: how many distinct nodes each node can reach in
    one or two directed hops (self excluded) — the neighborhood-size signal
    crawl frontier scheduling and influence ranking start from.

    Scale shape: the 2-hop pairs come from ONE bucketed self-join on the
    middle vertex (edges ⋈ edges, both sides pre-renamed to skinny 2-int
    rows); dedup and the final per-source count are two-phase aggregates.
    The intermediate is Σ_v in_deg(v)·out_deg(v) rows — bounded by the
    crawl's out-degree cap (GRAPH_MAX_OUT here); for an uncapped graph,
    cap or sample high-degree middles first (documented assumption, same
    bound as triangle_count's wedge space)."""
    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    def as_sm(t: pa.Table) -> pa.Table:
        return pa.table({"s": t.column("src"), "m": t.column("dst")})

    def as_mw(t: pa.Table) -> pa.Table:
        return pa.table({"m": t.column("src"), "w": t.column("dst")})

    h1 = edges.map_batches(as_sm, batch_format="pyarrow", zero_copy_batch=True)
    h2 = edges.map_batches(as_mw, batch_format="pyarrow", zero_copy_batch=True)
    hops = bucket_hash_join(h1, h2, on="m", num_buckets=num_buckets)

    def pairs2(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        keep = s != w
        return pa.table({"s": pa.array(s[keep]), "w": pa.array(w[keep])})

    two = hops.map_batches(pairs2, batch_format="pyarrow", zero_copy_batch=True)
    one = edges.map_batches(
        lambda t: pa.table({"s": t.column("src"), "w": t.column("dst")}),
        batch_format="pyarrow", zero_copy_batch=True)

    distinct = two_phase_aggregate(one.union(two), ["s", "w"],
                                   [("w", "count", "_n")],
                                   num_buckets=num_buckets)
    reach = two_phase_aggregate(distinct, ["s"], [("w", "count", "n_reach")],
                                num_buckets=num_buckets)
    return reach.map_batches(
        lambda t: pa.table({"node_id": t.column("s"),
                            "n_reach": t.column("n_reach")}),
        batch_format="pyarrow", zero_copy_batch=True)


def edge_reciprocity(edges, *, num_buckets: int = 32):
    """Directed-graph mutuality: the fraction of distinct edges (u→v)
    whose reverse (v→u) also exists — one exact-integer row (n_edges,
    n_reciprocal, mutuality_e6), the link-farm / citation-ring signal a
    crawl-graph audit reports next to triangle density.

    Scale shape: dedup the edge list (two-phase), then ONE bucketed join
    of the distinct edges against their own reversal on a packed key
    (n < 2³¹, the triangle_count bound); counts collapse to single-int
    partials."""
    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    dist = two_phase_aggregate(edges, ["src", "dst"],
                               [("dst", "count", "_n")],
                               num_buckets=num_buckets)

    # max node id via a tiny aggregate (drives the packing base)
    mx = two_phase_aggregate(
        edges.map_batches(
            lambda t: pa.table({"one": pa.array(np.zeros(t.num_rows, np.int64)),
                                "v": pc.max_element_wise(t.column("src"),
                                                         t.column("dst"))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["one"], [("v", "max", "mx")], num_buckets=2).take_all()
    n_nodes = (int(mx[0]["mx"]) + 1) if mx else 1
    if n_nodes >= 1 << 31:
        raise ValueError("edge_reciprocity: packed key needs n < 2^31")

    fwd = dist.map_batches(
        lambda t: pa.table({"key": pa.array(
            t.column("src").to_numpy(zero_copy_only=False) * n_nodes
            + t.column("dst").to_numpy(zero_copy_only=False))}),
        batch_format="pyarrow", zero_copy_batch=True)
    rev = dist.map_batches(
        lambda t: pa.table({"key": pa.array(
            t.column("dst").to_numpy(zero_copy_only=False) * n_nodes
            + t.column("src").to_numpy(zero_copy_only=False)),
            "r": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)
    matched = bucket_hash_join(fwd, rev, on="key", num_buckets=num_buckets)

    def count_all(ds_in):
        return two_phase_aggregate(
            ds_in.map_batches(
                lambda t: pa.table({"one": pa.array(np.zeros(t.num_rows, np.int64)),
                                    "c": pa.array(np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow", zero_copy_batch=True),
            ["one"], [("c", "sum", "n")], num_buckets=2).take_all()

    ne = count_all(dist)
    nr = count_all(matched)
    n_edges = int(ne[0]["n"]) if ne else 0
    n_recip = int(nr[0]["n"]) if nr else 0
    mut = 1_000_000 * n_recip // n_edges if n_edges else 0
    return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                     "n_reciprocal": pa.array([n_recip], pa.int64()),
                     "mutuality_e6": pa.array([mut], pa.int64())})


KCORE_K = 2
KCORE_ROUNDS = 3


def kcore_peel(edges, *, k: int = KCORE_K, rounds: int = KCORE_ROUNDS,
               num_buckets: int = 32):
    """Fixed-round k-core peeling over the undirected link graph: each
    round computes degrees, drops nodes with degree < ``k`` and removes
    their incident edges — after ``rounds`` rounds the survivors
    approximate the k-core (exact once a round removes nothing; a fixed
    schedule keeps the DuckDB oracle a chained-CTE replay, the
    pagerank/label-propagation convention). Returns (node_id, degree):
    the last round's keep set with its degree at that check — the
    link-farm-resistant "well-embedded pages" set a crawl curator keeps.

    Scale shape: per round one two-phase degree count plus two bucketed
    semi-joins (endpoint membership), materialized as the iteration
    barrier; shuffles move 2-int edge rows and (node, degree) pairs
    only."""
    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    cur = undirected_edges(edges, num_buckets=num_buckets).materialize()

    keep = None
    for r in range(rounds):
        deg = two_phase_aggregate(
            explode_halfedges(cur),
            ["v"], [("nbr", "count", "degree")], num_buckets=num_buckets)
        keep = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("degree"),
                                                pa.scalar(k, pa.int64()))),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        if r == rounds - 1:
            break
        ids = keep.map_batches(lambda t: t.select(["v"]),
                               batch_format="pyarrow", zero_copy_batch=True)
        cur = bucket_hash_join(cur, ids, on="a", right_on="v",
                               num_buckets=num_buckets)
        cur = bucket_hash_join(cur, ids, on="b", right_on="v",
                               num_buckets=num_buckets).materialize()
    return keep.map_batches(
        lambda t: pa.table({"node_id": t.column("v"),
                            "degree": t.column("degree")}),
        batch_format="pyarrow", zero_copy_batch=True)


def clustering_coefficient(edges, n_nodes: int, *, num_buckets: int = 32):
    """Per-node local clustering coefficient over the undirected link
    graph: cc(v) = triangles_through(v) / C(deg(v), 2), reported as exact
    integer fields (degree, n_tri, cc_e6 = floor(1e6·n_tri / C(deg,2)),
    0 when deg < 2) — the per-page link-farm signal: spam farms link as
    near-cliques (cc → 1e6) while organic hubs sit low.

    Same distributed wedge-check as ``triangle_count`` but keyed by the
    wedge CENTER: per-center neighbor pairs (u < w) bucket-join the
    edge-key set, and matches counted per center are exactly the
    triangles through that node. Zero-triangle nodes survive without an
    outer join: degree partials (from half-edges) and triangle partials
    (from closed wedges) are unioned and summed in ONE two-phase reduce.
    Packing needs n_nodes < 2^31 (the triangle_count bound)."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate
    from .join import bucket_hash_join

    if n_nodes >= 1 << 31:
        raise ValueError("clustering_coefficient: packed key needs n < 2^31")

    und = undirected_edges(edges, num_buckets=num_buckets).materialize()
    half = explode_halfedges(und)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # the triangle_count pair algebra, keeping the center column
        if not len(g):
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["v", "nbr"], kind="mergesort")
        vv = g["v"].to_numpy()
        nb = g["nbr"].to_numpy()
        n = len(vv)
        seg_first = np.flatnonzero(np.r_[True, vv[1:] != vv[:-1]])
        k = np.diff(np.r_[seg_first, n])
        li = np.arange(n) - np.repeat(seg_first, k)
        right_rows = np.repeat(np.arange(n), li)
        grp_start = np.repeat(np.cumsum(li) - li, li)
        left_rows = np.repeat(np.repeat(seg_first, k), li) + (
            np.arange(int(li.sum())) - grp_start)
        return pd.DataFrame({"key": nb[left_rows] * n_nodes + nb[right_rows],
                             "v": vv[right_rows]})

    wk = grouped_apply(half, ["v"], wedges, num_buckets=num_buckets)

    ekeys = und.map_batches(
        lambda t: pa.table({"key": pa.array(
            t.column("a").to_numpy(zero_copy_only=False) * n_nodes
            + t.column("b").to_numpy(zero_copy_only=False)),
            "is_edge": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)

    closed = bucket_hash_join(wk, ekeys, on="key", num_buckets=num_buckets)

    def tri_part(t: pa.Table) -> pa.Table:
        return pa.table({"v": t.column("v"),
                         "deg_part": pa.array(np.zeros(t.num_rows, np.int64)),
                         "tri_part": pa.array(np.ones(t.num_rows, np.int64))})

    def deg_part(t: pa.Table) -> pa.Table:
        return pa.table({"v": t.column("v"),
                         "deg_part": pa.array(np.ones(t.num_rows, np.int64)),
                         "tri_part": pa.array(np.zeros(t.num_rows, np.int64))})

    parts = half.map_batches(deg_part, batch_format="pyarrow",
                             zero_copy_batch=True).union(
        closed.map_batches(tri_part, batch_format="pyarrow",
                           zero_copy_batch=True))
    per_v = two_phase_aggregate(parts, ["v"],
                                [("deg_part", "sum", "degree"),
                                 ("tri_part", "sum", "n_tri")],
                                num_buckets=num_buckets)

    def final(t: pa.Table) -> pa.Table:
        deg = t.column("degree").to_numpy(zero_copy_only=False)
        tri = t.column("n_tri").to_numpy(zero_copy_only=False)
        w = deg * (deg - 1) // 2
        cc = np.where(w > 0, tri * 1_000_000 // np.maximum(w, 1), 0)
        return pa.table({"node_id": t.column("v"),
                         "degree": pa.array(deg.astype(np.int64)),
                         "n_tri": pa.array(tri.astype(np.int64)),
                         "cc_e6": pa.array(cc.astype(np.int64))})

    return per_v.map_batches(final, batch_format="pyarrow",
                             zero_copy_batch=True)


HITS_SCALE = 10**6
HITS_ITERS = 2


def hits_int(edges, n_nodes: int, *, iters: int = HITS_ITERS,
             scale: int = HITS_SCALE, num_buckets: int = 32):
    """Fixed-iteration exact-integer HITS (Kleinberg hubs/authorities)
    over the directed link graph — the directory-page vs content-page
    separator a crawl curator reads next to PageRank. Unnormalized
    integer recurrence (h0 = scale; a_t(v) = Σ_{u→v} h_{t-1}(u);
    h_t(u) = Σ_{u→v} a_t(v)) for ``iters`` rounds so the DuckDB oracle
    replays it as chained CTEs; magnitudes are bounded by
    maxdeg^(2·iters)·scale — int64-safe for iters=2 on any graph with
    max degree < ~2000 (documented bound; normalize downstream).

    Scale shape: the pagerank loop's exchange — per iteration one
    edges ⋈ scores bucketed join each direction, a two-phase sum, and a
    left join back to the node table for score-0 nodes (materialized as
    the iteration barrier). Output (node_id, auth_int, hub_int)."""
    import ray.data as rd

    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    nblocks = max(8, n_nodes // (1 << 20) + 1) if n_nodes < (1 << 26) else None
    kw = {"override_num_blocks": nblocks} if nblocks else {}
    nodes = rd.range(n_nodes, **kw).map_batches(
        lambda t: pa.table({"v": t.column("id").combine_chunks()
                            .cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    h = nodes.map_batches(
        lambda t: pa.table({"v": t.column("v"),
                            "h": pa.array(np.full(t.num_rows, scale,
                                                  np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    a = None

    for _ in range(iters):
        ja = bucket_hash_join(edges, h, on="src", right_on="v",
                              num_buckets=num_buckets)
        asum = two_phase_aggregate(
            ja.map_batches(lambda t: pa.table({"v": t.column("dst"),
                                               "s": t.column("h")}),
                           batch_format="pyarrow", zero_copy_batch=True),
            ["v"], [("s", "sum", "s")], num_buckets=num_buckets)
        a = bucket_hash_join(nodes, asum, on="v", how="left",
                             fill={"s": 0}, num_buckets=num_buckets
                             ).map_batches(
            lambda t: pa.table({"v": t.column("v"),
                                "a": pc.cast(t.column("s"), pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

        jh = bucket_hash_join(edges, a, on="dst", right_on="v",
                              num_buckets=num_buckets)
        hsum = two_phase_aggregate(
            jh.map_batches(lambda t: pa.table({"v": t.column("src"),
                                               "s": t.column("a")}),
                           batch_format="pyarrow", zero_copy_batch=True),
            ["v"], [("s", "sum", "s")], num_buckets=num_buckets)
        h = bucket_hash_join(nodes, hsum, on="v", how="left",
                             fill={"s": 0}, num_buckets=num_buckets
                             ).map_batches(
            lambda t: pa.table({"v": t.column("v"),
                                "h": pc.cast(t.column("s"), pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

    out = bucket_hash_join(a, h, on="v", num_buckets=num_buckets)
    return out.map_batches(
        lambda t: pa.table({"node_id": t.column("v"),
                            "auth_int": t.column("a"),
                            "hub_int": t.column("h")}),
        batch_format="pyarrow", zero_copy_batch=True)


def edge_overlap(edges, n_nodes: int, *, num_buckets: int = 32):
    """Per-edge neighborhood overlap over the undirected link graph:
    common-neighbor count (= triangles containing the edge) and the
    neighborhood Jaccard jac_e6 = floor(1e6·common /
    (deg_a + deg_b − 2 − common)) — the tie-strength / link-spam signal
    (Granovetter weak ties: low-overlap edges bridge communities,
    near-clique spam farms saturate at 1e6).

    The clustering_coefficient wedge-check regrouped by the WEDGE KEY
    instead of the center: each closed wedge (u<w) IS one common
    neighbor of edge (u,w). Zero-overlap edges survive via zero partials
    unioned from the edge set; degrees join back through two bucketed
    (node, deg) joins. Output (a, b, deg_a, deg_b, n_common, jac_e6)."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate
    from .join import bucket_hash_join

    if n_nodes >= 1 << 31:
        raise ValueError("edge_overlap: packed key needs n < 2^31")

    und = undirected_edges(edges, num_buckets=num_buckets).materialize()
    half = explode_halfedges(und)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["v", "nbr"], kind="mergesort")
        vv = g["v"].to_numpy()
        nb = g["nbr"].to_numpy()
        n = len(vv)
        seg_first = np.flatnonzero(np.r_[True, vv[1:] != vv[:-1]])
        k = np.diff(np.r_[seg_first, n])
        li = np.arange(n) - np.repeat(seg_first, k)
        right_rows = np.repeat(np.arange(n), li)
        grp_start = np.repeat(np.cumsum(li) - li, li)
        left_rows = np.repeat(np.repeat(seg_first, k), li) + (
            np.arange(int(li.sum())) - grp_start)
        key = nb[left_rows] * n_nodes + nb[right_rows]
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"key": uk, "c": cnt.astype(np.int64)})

    wk = grouped_apply(half, ["v"], wedges, num_buckets=num_buckets)

    ekeys = und.map_batches(
        lambda t: pa.table({"key": pa.array(
            t.column("a").to_numpy(zero_copy_only=False) * n_nodes
            + t.column("b").to_numpy(zero_copy_only=False)),
            "c": pa.array(np.zeros(t.num_rows, np.int64)),
            "is_edge": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)
    wk0 = wk.map_batches(
        lambda t: t.append_column("is_edge",
                                  pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow", zero_copy_batch=True)

    per_edge = two_phase_aggregate(
        ekeys.union(wk0), ["key"],
        [("c", "sum", "n_common"), ("is_edge", "sum", "is_edge")],
        num_buckets=num_buckets
    ).map_batches(
        # keep true edges only (wedge keys that never close an edge drop)
        lambda t: t.filter(pc.equal(t.column("is_edge"),
                                    pa.scalar(1, pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True)

    deg = two_phase_aggregate(half, ["v"], [("nbr", "count", "deg")],
                              num_buckets=num_buckets)

    def unpack(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(key // n_nodes),
                         "b": pa.array(key % n_nodes),
                         "n_common": t.column("n_common")})

    ab = per_edge.map_batches(unpack, batch_format="pyarrow",
                              zero_copy_batch=True)
    ab = bucket_hash_join(ab, deg.map_batches(
        lambda t: pa.table({"a": t.column("v"), "deg_a": t.column("deg")}),
        batch_format="pyarrow", zero_copy_batch=True), on="a",
        num_buckets=num_buckets)
    ab = bucket_hash_join(ab, deg.map_batches(
        lambda t: pa.table({"b": t.column("v"), "deg_b": t.column("deg")}),
        batch_format="pyarrow", zero_copy_batch=True), on="b",
        num_buckets=num_buckets)

    def final(t: pa.Table) -> pa.Table:
        c = t.column("n_common").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        den = da + db - 2 - c
        jac = np.where(den > 0, c * 1_000_000 // np.maximum(den, 1),
                       np.where(c > 0, 1_000_000, 0))
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "deg_a": pa.array(da.astype(np.int64)),
                         "deg_b": pa.array(db.astype(np.int64)),
                         "n_common": pa.array(c.astype(np.int64)),
                         "jac_e6": pa.array(jac.astype(np.int64))})

    return ab.map_batches(final, batch_format="pyarrow",
                          zero_copy_batch=True)


def assortativity_moments(edges, *, num_buckets: int = 32):
    """Degree-assortativity moments of the undirected link graph: the
    exact-integer pieces of Newman's degree-correlation r — numerator
    ``M·Σxy − Σx·Σy`` and the two variance factors ``M·Σx² − (Σx)²`` /
    ``M·Σy² − (Σy)²`` over both orientations of every edge (x = deg(u),
    y = deg(v)); r = num / sqrt(varx·vary) is left to the consumer so
    nothing stored is a float. Positive r = hub-to-hub linking (organic
    webs are slightly disassortative; link farms skew positive).

    Scale shape: one degree count, two bucketed (endpoint → degree)
    joins onto the edge list, one global moment reduce; the driver holds
    five integers. Output one row
    (m_halfedges, sxy_num, varx_num, vary_num)."""
    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    und = undirected_edges(edges, num_buckets=num_buckets).materialize()
    half = explode_halfedges(und)
    deg = two_phase_aggregate(half, ["v"], [("nbr", "count", "deg")],
                              num_buckets=num_buckets)

    j = bucket_hash_join(half, deg.map_batches(
        lambda t: pa.table({"v": t.column("v"), "dx": t.column("deg")}),
        batch_format="pyarrow", zero_copy_batch=True), on="v",
        num_buckets=num_buckets)
    j = bucket_hash_join(j, deg.map_batches(
        lambda t: pa.table({"nbr": t.column("v"), "dy": t.column("deg")}),
        batch_format="pyarrow", zero_copy_batch=True), on="nbr",
        num_buckets=num_buckets)

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("dx").to_numpy(zero_copy_only=False)
        y = t.column("dy").to_numpy(zero_copy_only=False)
        one = np.zeros(t.num_rows, np.int64)
        return pa.table({"g": pa.array(one),
                         "m": pa.array(np.ones(t.num_rows, np.int64)),
                         "sx": pa.array(x), "sy": pa.array(y),
                         "sxy": pa.array(x * y), "sxx": pa.array(x * x),
                         "syy": pa.array(y * y)})

    rows = two_phase_aggregate(
        j.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True),
        ["g"], [("m", "sum", "m"), ("sx", "sum", "sx"), ("sy", "sum", "sy"),
                ("sxy", "sum", "sxy"), ("sxx", "sum", "sxx"),
                ("syy", "sum", "syy")], num_buckets=2).take_all()
    r = rows[0] if rows else {"m": 0, "sx": 0, "sy": 0, "sxy": 0,
                              "sxx": 0, "syy": 0}
    m, sx, sy = int(r["m"]), int(r["sx"]), int(r["sy"])
    return pa.table({
        "m_halfedges": pa.array([m], pa.int64()),
        "sxy_num": pa.array([m * int(r["sxy"]) - sx * sy], pa.int64()),
        "varx_num": pa.array([m * int(r["sxx"]) - sx * sx], pa.int64()),
        "vary_num": pa.array([m * int(r["syy"]) - sy * sy], pa.int64())})
