"""Scale probe: the dedup/clustering pipeline at 100x the test corpus.

The sf0.1 documents table is 5 000 docs — small enough that round 3's
small-exchange coalesce handles every shuffle in one task. This probe
synthesizes a 100x corpus (default 500 000 docs, ~40 tokens each, with a
seeded 2% planted near-dup mass) and runs the FULL minhash -> verify ->
connected-components -> keep-best chain ABOVE the coalesce threshold, so
every bucketed/distributed code path (band explode, pair join, grouped
verify, iterative label propagation, anti-join) executes in its real
multi-task shape.

Checks (deterministic, no oracle needed at this scale):
  - every planted clone pair is found (clone Jaccard >> threshold);
  - keep-best drops exactly one doc per planted pair (plus any organic
    collisions) and keeps the longer member;
  - wall time + docs/sec are printed for BASELINE.md.

Usage: python scripts/scale_probe.py [n_docs]   (default 500000)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [f"w{i:04d}" for i in range(10_000)]
CLONE_BASE = 50_000_000


def ensure_big_docs(n_docs: int, root: str = "/tmp/rotel_ray_data") -> str:
    out = os.path.join(root, f"bigdocs_{n_docs}")
    if os.path.isdir(out) and os.listdir(out):
        return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    vocab = np.array(VOCAB, dtype=object)
    per = 100_000
    for shard in range((n_docs + per - 1) // per):
        rng = np.random.default_rng(777 + shard)
        n = min(per, n_docs - shard * per)
        lens = rng.integers(20, 60, n)
        toks = vocab[rng.integers(0, len(vocab), int(lens.sum()))]
        bounds = np.r_[0, np.cumsum(lens)]
        texts = [" ".join(toks[bounds[i]:bounds[i + 1]]) for i in range(n)]
        ids = (shard * per + np.arange(n)).astype(np.int64)
        # plant near-dups: every 50th doc gets a clone with ONE token edited
        src = np.arange(0, n, 50)
        clone_texts = []
        for s in src:
            words = texts[s].split()
            words[len(words) // 2] = "EDITED"
            clone_texts.append(" ".join(words))
        tbl = pa.table({
            "doc_id": pa.array(np.r_[ids, CLONE_BASE + ids[src]]),
            "text": pa.array(texts + clone_texts),
        })
        pq.write_table(tbl, os.path.join(tmp, f"part-{shard:04d}.parquet"))
    os.replace(tmp, out)
    return out


EMB_DIM = 64
EMB_CLONE_STEP = 50


def ensure_big_embeddings(n_vecs: int, root: str = "/tmp/rotel_ray_data"
                          ) -> tuple[str, int, list[int]]:
    """n_vecs organic gaussian vectors (dim EMB_DIM) + verified-retrievable
    planted top-k rows (stages/planted.plant_topk_vectors — the same
    builder the sf fixture uses) + exact 2x-scaled clones of every
    EMB_CLONE_STEP-th row (IEEE-exact near-dups: identical normalized
    vector => identical LSH signature in every band => recall 1 by
    construction, no quadratic margin scan needed at this scale).

    Returns (path, n_clones, planted_topk_ids)."""
    out = os.path.join(root, f"bigembs_{n_vecs}_d{EMB_DIM}")
    meta = os.path.join(out, "_meta.txt")
    if os.path.isdir(out) and os.path.exists(meta):
        n_clones, *pids = [int(x) for x in open(meta).read().split()]
        return out, n_clones, pids
    from rotel_ray.stages.planted import plant_topk_vectors

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    per = 100_000
    shards = []  # (organic_ids, organic_m, clone_ids, clone_m) per shard
    for shard in range((n_vecs + per - 1) // per):
        rng = np.random.default_rng(4242 + shard)
        n = min(per, n_vecs - shard * per)
        m = rng.standard_normal((n, EMB_DIM)).astype(np.float32)
        ids = (shard * per + np.arange(n)).astype(np.int64)
        src = np.arange(0, n, EMB_CLONE_STEP)
        shards.append((ids, m, CLONE_BASE + ids[src], m[src] * np.float32(2.0)))
    org_ids = np.concatenate([s[0] for s in shards])
    org_m = np.concatenate([s[1] for s in shards])
    # plant against the ORGANIC corpus only: the clone of vec 0 has cosine
    # exactly 1.0 to the query and would trip the margin guard; its
    # retrievability is by construction (identical normalized vector).
    # IVF training-sample replication stays valid because shard 0's file
    # leads with its organic rows, so the first train_rows read are organic.
    plant_ids, vs = plant_topk_vectors(org_ids, org_m)
    n_clones = sum(len(s[2]) for s in shards)

    def write(shard: int, ids: np.ndarray, m: np.ndarray) -> None:
        tbl = pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), pa.float32()), EMB_DIM),
        })
        pq.write_table(tbl, os.path.join(tmp, f"part-{shard:04d}.parquet"))

    for i, (ids, m, cids, cm) in enumerate(shards):
        write(i, np.r_[ids, cids], np.concatenate([m, cm]))
    write(len(shards), plant_ids, vs)
    with open(os.path.join(tmp, "_meta.txt"), "w") as f:
        f.write(" ".join(map(str, [n_clones] + plant_ids.tolist())))
    os.replace(tmp, out)
    return out, n_clones, plant_ids.tolist()


def ann_probe(n_vecs: int) -> dict:
    """The ANN paths above the coalesce threshold: banded-LSH near-dup over
    500k+ vectors (16-band explode -> bucketed exact verify -> two-phase
    pair dedup) plus LSH- and IVF-probed top-k with planted ground truth."""
    import pyarrow.parquet as _pq

    from rotel_ray.io import read_parquet
    from rotel_ray.stages.dedup import embedding_neardup_lsh
    from rotel_ray.stages.similarity import ivf_topk, lsh_topk

    path, n_clones, plant_ids = ensure_big_embeddings(n_vecs)
    files = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.endswith(".parquet"))
    t0 = _pq.read_table(files[0], columns=["vec_id", "embedding"])
    q = np.array(t0.column("embedding")[0].as_py(), dtype=np.float64)

    # tau=0.99 corpus: wide bands (16 bits) keep buckets tiny (~n/2^16 rows)
    # so the in-bucket exact verify stays cheap; exact clones share every
    # band's signature, so planted recall is 1 by construction regardless
    t_start = time.time()
    ds = read_parquet(path, columns=["vec_id", "embedding"])
    pairs = embedding_neardup_lsh(ds, tau=0.99, num_bands=4,
                                  bits_per_band=16).materialize()
    t_nd = time.time()
    got = {(r["vec_a"], r["vec_b"])
           for r in pairs.select_columns(["vec_a", "vec_b"]).take_all()}
    # clone sources are every EMB_CLONE_STEP-th id within each 100k shard,
    # and 100k % step == 0, so globally: every id % step == 0
    planted_pairs = [(i, CLONE_BASE + i)
                     for i in range(0, n_vecs, EMB_CLONE_STEP)]
    found = sum(1 for p in planted_pairs if p in got)

    k = 10
    t1 = time.time()
    lsh = lsh_topk(read_parquet(path, columns=["vec_id", "embedding"]), q, k=k)
    lsh_ids = [r["vec_id"] for r in lsh.take_all()]
    t2 = time.time()
    ivf = ivf_topk(read_parquet(path, columns=["vec_id", "embedding"]), q, k=k)
    ivf_ids = [r["vec_id"] for r in ivf.take_all()]
    t3 = time.time()
    # ground truth: vec 0 and its exact clone (sim 1.0 both, retrievable by
    # construction) + the k-2 highest planted rows
    expect = {0, CLONE_BASE + 0} | set(plant_ids[:k - 2])

    # organic recall@10 (round-5): NO planting — organic query vectors
    # against brute-force engine ground truth, at the default probe width
    # and one wide setting (i.i.d. gaussian = ANN worst case, so this is
    # the honest floor; the multiprobe knob buys recall with scan fraction)
    from rotel_ray.stages.similarity import brute_force_topk

    org_q = [np.array(t0.column("embedding")[i].as_py(), dtype=np.float64)
             for i in (1, 333, 777)]
    t4 = time.time()
    org = {"lsh2": [], "lsh4": [], "ivf4": [], "ivf12": []}
    for qv in org_q:
        truth = {r["vec_id"] for r in brute_force_topk(
            read_parquet(path, columns=["vec_id", "embedding"]), qv, k=k
        ).take_all()}
        for tag, out in (
            ("lsh2", lsh_topk(read_parquet(path, columns=["vec_id", "embedding"]),
                              qv, k=k, probe_hamming=2)),
            ("lsh4", lsh_topk(read_parquet(path, columns=["vec_id", "embedding"]),
                              qv, k=k, probe_hamming=4)),
            ("ivf4", ivf_topk(read_parquet(path, columns=["vec_id", "embedding"]),
                              qv, k=k, n_probe=4)),
            ("ivf12", ivf_topk(read_parquet(path, columns=["vec_id", "embedding"]),
                               qv, k=k, n_probe=12)),
        ):
            got = {r["vec_id"] for r in out.take_all()}
            org[tag].append(len(got & truth) / k)
    t5 = time.time()

    return {
        "ann_n_vecs": n_vecs,
        "ann_n_clones": n_clones,
        "neardup_lsh_sec": round(t_nd - t_start, 1),
        "neardup_pairs": pairs.count(),
        "neardup_planted": len(planted_pairs),
        "neardup_planted_found": found,
        "neardup_planted_recall": round(found / max(len(planted_pairs), 1), 4),
        "vecs_per_sec_neardup": round(n_vecs / (t_nd - t_start), 1),
        "lsh_topk_sec": round(t2 - t1, 1),
        "lsh_topk_recall": round(len(set(lsh_ids) & expect) / k, 4),
        "ivf_topk_sec": round(t3 - t2, 1),
        "ivf_topk_recall": round(len(set(ivf_ids) & expect) / k, 4),
        "organic_recall_sec": round(t5 - t4, 1),
        "organic_lsh_recall_ph2": round(float(np.mean(org["lsh2"])), 4),
        "organic_lsh_recall_ph4": round(float(np.mean(org["lsh4"])), 4),
        "organic_ivf_recall_np4": round(float(np.mean(org["ivf4"])), 4),
        "organic_ivf_recall_np12": round(float(np.mean(org["ivf12"])), 4),
    }



def _h64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic vectorized integer hash."""
    M = np.uint64(0xFFFFFFFFFFFFFFFF)
    x = x.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & M
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & M
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & M
    return (x ^ (x >> np.uint64(31))).astype(np.int64) & np.int64(2**62 - 1)


def ensure_big_graph(n_nodes: int, root: str = "/tmp/rotel_ray_data") -> str:
    """Deterministic directed graph at probe scale: out-degree 1 + h(i)%8,
    targets h(i*8+j)%n, self-loops/parallels dropped, missing sources get
    a fallback edge — the same invariants as stages/graph.ensure_link_graph
    but fully vectorized (the md5-loop fixture is test-scale only)."""
    out = os.path.join(root, f"biggraph_{n_nodes}")
    if os.path.isdir(out) and os.listdir(out):
        return out
    i = np.arange(n_nodes, dtype=np.int64)
    k = 1 + (_h64(i) % 8)
    src = np.repeat(i, k)
    j = np.arange(len(src)) - np.repeat(np.cumsum(k) - k, k)
    dst = _h64(src * 8 + j) % n_nodes
    m = src != dst
    src, dst = src[m], dst[m]
    key = np.unique(src * n_nodes + dst)
    src, dst = key // n_nodes, key % n_nodes
    missing = np.setdiff1d(i, src, assume_unique=False)
    if len(missing):
        src = np.r_[src, missing]
        dst = np.r_[dst, (missing + 1) % n_nodes]
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(t, os.path.join(tmp, "part-0000.parquet"),
                   row_group_size=262144)
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def graph_probe(n_nodes: int) -> dict:
    """pagerank + triangle_count at probe scale, both checked against full
    sequential numpy replays (the distributed bucketed shapes must agree
    with the single-process semantics row-for-row)."""
    from rotel_ray.io import read_parquet
    from rotel_ray.stages.aggregate import auto_buckets
    from rotel_ray.stages.graph import PR_SCALE, pagerank_int, triangle_count

    path = ensure_big_graph(n_nodes)
    t = pq.read_table(os.path.join(path, "part-0000.parquet"))
    src = t.column("src").to_numpy()
    dst = t.column("dst").to_numpy()
    nb = auto_buckets(n_nodes)

    t0 = time.time()
    pr = pagerank_int(read_parquet(path), n_nodes,
                      num_buckets=nb).to_pandas()
    t1 = time.time()
    # full numpy replay (sums < 2^53 so bincount weights stay exact ints)
    deg = np.bincount(src, minlength=n_nodes).astype(np.int64)
    r0 = PR_SCALE // n_nodes
    base = (15 * r0) // 100
    r = np.full(n_nodes, r0, np.int64)
    for _ in range(3):
        s = np.bincount(dst, weights=(r[src] // deg[src]).astype(np.float64),
                        minlength=n_nodes).astype(np.int64)
        r = base + (85 * s) // 100
    got = pr.sort_values("node_id")["pagerank_int"].to_numpy()
    pr_match = bool((got == r).all()) and len(got) == n_nodes
    assert pr_match

    t2 = time.time()
    tri = triangle_count(read_parquet(path), n_nodes,
                         num_buckets=nb).to_pandas().iloc[0]
    t3 = time.time()
    # numpy wedge-check replay: sorted undirected edge keys + searchsorted
    a = np.minimum(src, dst); b = np.maximum(src, dst)
    ekey = np.unique(a * n_nodes + b)
    ua, ub = ekey // n_nodes, ekey % n_nodes
    hv = np.r_[ua, ub]; hn = np.r_[ub, ua]
    order = np.lexsort((hn, hv))
    hv, hn = hv[order], hn[order]
    seg_first = np.flatnonzero(np.r_[True, hv[1:] != hv[:-1]])
    k = np.diff(np.r_[seg_first, len(hv)])
    li = np.arange(len(hv)) - np.repeat(seg_first, k)
    right = np.repeat(np.arange(len(hv)), li)
    grp = np.repeat(np.cumsum(li) - li, li)
    left = np.repeat(np.repeat(seg_first, k), li) + (
        np.arange(int(li.sum())) - grp)
    wkey = hn[left] * n_nodes + hn[right]
    closed = int(np.isin(wkey, ekey).sum())
    tri_match = bool(int(tri.n_edges) == len(ekey)
                     and int(tri.n_wedges) == len(wkey)
                     and int(tri.n_triangles) == closed // 3)
    assert tri_match, (dict(tri), len(ekey), len(wkey), closed)

    return {"graph_nodes": n_nodes, "graph_edges": len(src),
            "pagerank_sec": round(t1 - t0, 1),
            "pagerank_match_numpy": pr_match,
            "triangle_sec": round(t3 - t2, 1),
            "n_triangles": int(tri.n_triangles),
            "triangle_match_numpy": tri_match}


def stitch_probe(n_parents: int) -> dict:
    """multiline_stitch at probe scale (above the coalesce threshold, so
    both text exchanges run bucketed), checked against a full pandas
    groupby replay — counts, line numbers AND joined text all equal."""
    import pandas as pd

    from rotel_ray.io import read_parquet
    from rotel_ray.sources.text_logs import stitch_multiline

    root = "/tmp/rotel_ray_data"
    path = os.path.join(root, f"biglines_{n_parents}")
    i = np.arange(n_parents, dtype=np.int64)
    conts = (_h64(i) % 4).astype(np.int64)
    rec_of = np.repeat(i, 1 + conts)          # record per line
    is_start = np.r_[True, rec_of[1:] != rec_of[:-1]]
    n_lines = len(rec_of)
    j = np.arange(n_lines) - np.repeat(np.flatnonzero(is_start), 1 + conts)
    texts = np.where(is_start,
                     np.char.add("ERROR boom r", rec_of.astype(str)),
                     np.char.add(np.char.add("    at f", j.astype(str)),
                                 np.char.add(" r", rec_of.astype(str))))
    if not (os.path.isdir(path) and os.listdir(path)):
        os.makedirs(path + ".tmp", exist_ok=True)
        pq.write_table(pa.table({
            "line_no": pa.array(np.arange(n_lines)),
            "text": pa.array(texts.astype(object), pa.string()),
        }), os.path.join(path + ".tmp", "part-0000.parquet"),
            row_group_size=262144)
        try:
            os.replace(path + ".tmp", path)
        except OSError:
            shutil.rmtree(path + ".tmp", ignore_errors=True)
    t0 = time.time()
    out = stitch_multiline(read_parquet(path), chunk=65_536,
                           num_buckets=32).to_pandas()
    t1 = time.time()
    rep = (pd.DataFrame({"rec": rec_of, "line_no": np.arange(n_lines),
                         "text": texts})
           .groupby("rec", sort=True)
           .agg(line_no=("line_no", "min"), n_lines=("line_no", "size"),
                record_text=("text", "\n".join)))
    out = out.sort_values("record_id").reset_index(drop=True)
    match = bool(
        len(out) == n_parents
        and (out["line_no"].to_numpy() == rep["line_no"].to_numpy()).all()
        and (out["n_lines"].to_numpy() == rep["n_lines"].to_numpy()).all()
        and (out["record_text"].to_numpy()
             == rep["record_text"].to_numpy()).all())
    assert match
    return {"stitch_lines": int(n_lines), "stitch_records": int(len(out)),
            "stitch_sec": round(t1 - t0, 1),
            "stitch_match_pandas": match,
            "stitch_lines_per_sec": round(n_lines / (t1 - t0), 1)}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 500_000
    if "--r5" in sys.argv:   # graph + stitch probes only (round-5 ops)
        import json
        import logging

        import ray

        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        logging.getLogger("ray.data").setLevel(logging.ERROR)
        res = {**graph_probe(n_docs), **stitch_probe(4 * n_docs)}
        print(json.dumps(res))
        ray.shutdown()
        return
    path = ensure_big_docs(n_docs)

    import logging

    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from rotel_ray.io import read_parquet
    from rotel_ray.stages.aggregate import LOCAL_COALESCE_ROWS, auto_buckets
    from rotel_ray.stages.dedup import (connected_components,
                                        minhash_dedup_keep_best,
                                        minhash_lsh_neardup)

    assert n_docs > LOCAL_COALESCE_ROWS, \
        "probe must run ABOVE the coalesce threshold to exercise the bucketed paths"
    nb = auto_buckets(n_docs)

    t0 = time.time()
    ds = read_parquet(path, columns=["doc_id", "text"])
    pairs = minhash_lsh_neardup(ds, threshold=0.5, num_buckets=nb).materialize()
    t1 = time.time()
    n_pairs = pairs.count()
    cc = connected_components(pairs, num_buckets=nb).materialize()
    t2 = time.time()

    kept = minhash_dedup_keep_best(
        read_parquet(path, columns=["doc_id", "text"]), threshold=0.5,
        keep_cols=["doc_id"], num_buckets=nb).materialize()
    t3 = time.time()

    # the distributed prefix-sum (auto-ranged) and the top-V vocabulary
    # selection, both above the coalesce threshold
    from rotel_ray.stages.pack import seq_pack
    from rotel_ray.stages.textstats import unigram_logprob

    packed = seq_pack(read_parquet(path, columns=["doc_id", "text"]),
                      seq_len=2048).materialize()
    t4 = time.time()
    scored = unigram_logprob(read_parquet(path, columns=["doc_id", "text"]),
                             top_v=4096).materialize()  # binding cap: vocab 10k+
    t5 = time.time()
    n_packed, n_scored = packed.count(), scored.count()

    # round-4 ops above the coalesce threshold: the Heaps-curve min-reduce
    # (vocab-bounded) and the bloom probe (constant 128 KiB broadcast)
    from rotel_ray.stages.dedup import decontaminate_bloom
    from rotel_ray.stages.textstats import vocab_growth

    vg = vocab_growth(read_parquet(path, columns=["doc_id", "text"])).take_all()
    t6 = time.time()
    docs = read_parquet(path, columns=["doc_id", "text"])
    def _split(keep_eval):
        def f(t):
            m = t.column("doc_id").to_numpy(zero_copy_only=False) % 97 == 0
            return t.filter(pa.array(m if keep_eval else ~m))
        return f

    ev = docs.map_batches(_split(True), batch_format="pyarrow")
    tr = docs.map_batches(_split(False), batch_format="pyarrow")
    # size the filter to the eval side: ~208k distinct grams here needs
    # 2^24 bits (2 MiB, load ~0.04) — the default 2^20 is benchmark-suite
    # sized and would saturate (load 0.62 -> ~every doc false-positives)
    n_contam = decontaminate_bloom(tr, ev, k=8, num_bits_log2=24).count()
    t7 = time.time()

    # round-5 ops: the map-only in-document span dedup (pure throughput —
    # no shuffle to stress) and the watermark late-data accounting at 2 M
    # events, checked against a FULL single-process numpy replay (the
    # chunked prefix-max must agree with the sequential semantics exactly)
    from rotel_ray.stages.dedup import span_dedup_indoc

    indoc = span_dedup_indoc(
        read_parquet(path, columns=["doc_id", "text"]), width=2).materialize()
    n_indoc = indoc.count()
    t8 = time.time()

    from rotel_ray.stages.window import late_events

    n_ev = 2_000_000
    ev_path = os.path.join("/tmp/rotel_ray_data", f"bigooo_{n_ev}")
    rng = np.random.default_rng(31337)
    us = np.sort(rng.integers(0, 30 * 86_400_000_000, n_ev))
    # at 2M events / 30 days the inter-arrival is ~1.3 s, so the
    # disorder window must be ~16k ranks (~6 h) for a 1 h allowed
    # lateness to actually bind — both late classes populate
    jit = rng.integers(0, 16384, n_ev)
    arrival = np.empty(n_ev, np.int64)
    arrival[np.argsort(np.arange(n_ev) + jit, kind="stable")] = \
        np.arange(n_ev)
    etype = np.array(["a", "b", "c"], object)[rng.integers(0, 3, n_ev)]
    if not (os.path.isdir(ev_path) and os.listdir(ev_path)):
        os.makedirs(ev_path + ".tmp", exist_ok=True)
        pq.write_table(pa.table({
            "arrival_seq": pa.array(arrival),
            "ts": pa.array(us, pa.timestamp("us")),
            "event_type": pa.array(etype.astype(str)),
        }), os.path.join(ev_path + ".tmp", "part-0000.parquet"),
            row_group_size=65536)
        try:
            os.replace(ev_path + ".tmp", ev_path)
        except OSError:
            shutil.rmtree(ev_path + ".tmp", ignore_errors=True)
    t9 = time.time()
    delay = 3_600_000_000
    got_late = late_events(
        read_parquet(ev_path), delay_us=delay,
        chunk=65_536, num_buckets=nb).take_all()
    t10 = time.time()
    # sequential numpy replay (the ground truth the distributed chunked
    # prefix-max must reproduce row-for-row)
    order = np.argsort(arrival, kind="stable")
    us_a, ty_a = us[order], etype[order]
    wm = np.r_[np.iinfo(np.int64).min // 4,
               np.maximum.accumulate(us_a)[:-1]]
    late_a = us_a < wm - delay
    exp = {}
    for t_, l_ in ((t_, l_) for t_ in ("a", "b", "c") for l_ in (False, True)):
        exp[(t_, l_)] = int(((ty_a == t_) & (late_a == l_)).sum())
    got_map = {(r["event_type"], bool(r["late"])): r["n_events"]
               for r in got_late}
    late_match = all(got_map.get(k1, 0) == v for k1, v in exp.items())
    assert late_match, f"late_events mismatch: {got_map} vs {exp}"

    # planted recall: every clone id's pair must be present
    got = set()
    for r in pairs.select_columns(["doc_a", "doc_b"]).take_all():
        got.add((r["doc_a"], r["doc_b"]))
    planted = [(i, CLONE_BASE + i) for i in range(0, n_docs, 50)]
    found = sum(1 for a, b in planted if (a, b) in got or (b, a) in got)
    n_kept = kept.count()

    ann = ann_probe(n_docs)  # same scale for the embedding paths

    import json

    print(json.dumps({
        **ann,
        "n_docs": n_docs,
        "pairs_sec": round(t1 - t0, 1),
        "cc_sec": round(t2 - t1, 1),
        "keep_best_sec": round(t3 - t2, 1),
        "n_pairs": n_pairs,
        "planted": len(planted),
        "planted_found": found,
        "planted_recall": round(found / max(len(planted), 1), 4),
        "n_kept": n_kept,
        "cc_rows": cc.count(),
        "docs_per_sec_pairs": round(n_docs / (t1 - t0), 1),
        "seq_pack_sec": round(t4 - t3, 1),
        "seq_pack_rows": n_packed,
        "unigram_topv_sec": round(t5 - t4, 1),
        "unigram_rows": n_scored,
        "vocab_growth_sec": round(t6 - t5, 1),
        "vocab_growth_rows": len(vg),
        "vocab_growth_final": max(r["vocab_size"] for r in vg),
        "bloom_decontam_sec": round(t7 - t6, 1),
        "bloom_contaminated_docs": n_contam,
        "span_indoc_sec": round(t8 - t7, 1),
        "span_indoc_rows": n_indoc,
        "late_events_n": n_ev,
        "late_events_sec": round(t10 - t9, 1),
        "late_events_match_numpy": late_match,
        "late_frac": round(sum(v for (t_, l_), v in exp.items() if l_)
                           / n_ev, 4),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
