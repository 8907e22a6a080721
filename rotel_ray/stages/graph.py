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

    nodes = rd.range(n_nodes).map_batches(
        lambda t: pa.table({"v": t.column("id").combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    ranks = rd.range(n_nodes).map_batches(init_ranks, batch_format="pyarrow",
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
