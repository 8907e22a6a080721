"""Skew robustness: hot keys through every bucketed shuffle operator.

The north rule requires explicit skew handling: a Zipf-head key (here 60% of
all rows on ONE key) must neither break correctness nor concentrate raw rows
on a single reducer. two_phase_aggregate's per-batch combiner reduces the hot
key to one partial row per batch before any shuffle; grouped_apply dilutes
hot buckets across vectorized per-bucket work.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from rotel_ray.stages.aggregate import grouped_apply, two_phase_aggregate
from rotel_ray.stages.join import bucket_hash_join


def _skewed(n=100_000, seed=9):
    rng = np.random.default_rng(seed)
    keys = np.where(rng.random(n) < 0.6, 7, rng.integers(0, 1000, n)).astype(np.int64)
    return pd.DataFrame({"k": keys, "v": rng.integers(0, 100, n).astype(np.int64)})


def test_two_phase_aggregate_hot_key():
    df = _skewed()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(16)
    out = (
        two_phase_aggregate(ds, ["k"], [("v", "sum", "v_sum"), ("v", "count", "n")],
                            batch_size=4096)
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    ref = df.groupby("k").agg(v_sum=("v", "sum"), n=("v", "size"))
    assert out["v_sum"].to_dict() == ref["v_sum"].to_dict()
    assert out["n"].to_dict() == ref["n"].to_dict()
    assert out.loc[7, "n"] > 50_000  # the hot key really was hot


def test_grouped_apply_hot_key():
    df = _skewed(20_000)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False).agg(v_max=("v", "max"))

    out = grouped_apply(ds, ["k"], per_bucket).to_pandas().set_index("k").sort_index()
    ref = df.groupby("k").agg(v_max=("v", "max"))
    assert out["v_max"].to_dict() == ref["v_max"].to_dict()


def test_bucket_hash_join_hot_key():
    df = _skewed(20_000)
    right = pd.DataFrame({"rk": np.arange(1000, dtype=np.int64),
                          "name": [f"d{i}" for i in range(1000)]})
    l = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)
    r = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))
    out = bucket_hash_join(l, r, on="k", right_on="rk").to_pandas()
    ref = df.merge(right, left_on="k", right_on="rk")
    assert len(out) == len(ref)
    assert out[out.k == 7].shape[0] == ref[ref.k == 7].shape[0]


def test_simhash_degenerate_bucket_guard():
    """10k empty docs (all simhash 0) + 3k identical docs: the empty docs are
    excluded from banding (exact-dup territory) and the identical-doc bucket
    is pivot-truncated — bounded pair count instead of O(n^2) blowup."""
    from rotel_ray.stages.dedup import simhash_neardup

    n_empty, n_same = 10_000, 3_000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n_empty + n_same, dtype=np.int64)),
            "text": pa.array([""] * n_empty + ["same boilerplate text here"] * n_same),
        }
    )
    out = simhash_neardup(rd.from_arrow(t).repartition(4), max_hamming=3,
                          max_bucket=64).to_pandas()
    # no empty-doc pairs at all; identical docs stay connected via the pivot
    assert (out.doc_a >= n_empty).all()
    # bounded: full pairs among <=64 head members + pivot pairs, per band —
    # orders of magnitude below the 4.5M all-pairs count
    assert 0 < len(out) < 64 * 64 + n_same
    assert (out.hamming == 0).all()


def test_minhash_distributed_verify_no_driver_state():
    """minhash_lsh_neardup end-to-end on a corpus with planted dups, after the
    round-2 rewrite (candidate pairs stay a Dataset; bucket join + grouped
    verify). Results must match the brute-force shingle-Jaccard oracle."""
    from rotel_ray.stages.dedup import _shingle_hashes, minhash_lsh_neardup

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(words, 30)) for i in range(60)]
    texts += [texts[0], texts[1] + " tail", " ".join(texts[2].split()[:25])]
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    out = minhash_lsh_neardup(rd.from_arrow(t).repartition(4), threshold=0.5).to_pandas()
    got = set(zip(out.doc_a, out.doc_b))

    def jac(a, b):
        sa, sb = set(_shingle_hashes(a)), set(_shingle_hashes(b))
        return len(sa & sb) / len(sa | sb) if sa | sb else 0.0

    expected = {
        (i, j)
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if jac(texts[i], texts[j]) >= 0.5
    }
    assert (0, 60) in expected and got == expected


def test_two_phase_salted_equals_unsalted():
    """salt>1 shards a hot key's merge and re-combines exactly."""
    df = _skewed(50_000)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(16)
    base = (two_phase_aggregate(ds, ["k"], [("v", "sum", "v_sum"), ("v", "count", "n"),
                                            ("v", "min", "v_min"), ("v", "max", "v_max")],
                                batch_size=2048)
            .to_pandas().set_index("k").sort_index())
    ds2 = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(16)
    salted = (two_phase_aggregate(ds2, ["k"], [("v", "sum", "v_sum"), ("v", "count", "n"),
                                               ("v", "min", "v_min"), ("v", "max", "v_max")],
                                  batch_size=2048, salt=8)
              .to_pandas().set_index("k").sort_index())
    assert base.equals(salted)


def test_per_source_cap_mega_domain_bounded_shuffle():
    """One mega-domain holding 90% of the crawl: (a) results still match the
    brute-force (md5, id) head selection, and (b) the per-batch partial
    (_cap_select final=False) never lets more than cap rows per source out of
    a batch — the shuffle is bounded at batches x cap even for the hot
    domain, instead of its full row count."""
    import hashlib

    from rotel_ray.stages.mix import _cap_select, per_source_cap

    rng = np.random.default_rng(23)
    n, cap = 40_000, 10
    src = np.where(rng.random(n) < 0.9, "mega.example",
                   rng.choice([f"s{i}.org" for i in range(50)], n))
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": src,
        "text": [f"doc body {i} {rng.integers(1 << 30)}" for i in range(n)],
    })
    t = pa.Table.from_pandas(df, preserve_index=False)

    # (b) the bounding combiner: feed one 36k-row hot batch through the
    # partial and check it emits at most cap rows per source
    part = _cap_select(pa.table({
        "doc_id": t.column("doc_id"),
        "source": t.column("source"),
        "__h": pa.array([hashlib.md5(s.encode()).hexdigest()
                         for s in df.text]),
    }), cap, id_col="doc_id", source_col="source", final=False)
    per_src = pd.Series(part.column("source").to_pylist()).value_counts()
    assert per_src.max() <= cap
    assert part.num_rows <= cap * (per_src.size)

    # (a) end-to-end over many blocks (so the partial really runs per batch)
    out = per_source_cap(rd.from_arrow(t).repartition(16), cap=cap) \
        .to_pandas().sort_values(["source", "rank"]).reset_index(drop=True)
    ref = (df.assign(h=[hashlib.md5(s.encode()).hexdigest() for s in df.text])
           .sort_values(["source", "h", "doc_id"]))
    ref["rank"] = ref.groupby("source").cumcount()
    ref = (ref[ref["rank"] < cap][["doc_id", "source", "rank"]]
           .sort_values(["source", "rank"]).reset_index(drop=True))
    assert out.equals(ref)
    assert (out.source == "mega.example").sum() == cap


def test_flagship_hot_conversation_end_to_end(ray_session, tmp_path):
    """North-rule skew clause at the FLAGSHIP surface: one conversation
    holding 10% of the corpus must flow through parse -> enrich -> route ->
    aggregate with correct results, and the two-phase combiner must bound
    what the shuffle ever sees of the hot key."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray

    from rotel_ray.generator import generate_shard
    from rotel_ray.pipelines.flagship import run_flagship
    from rotel_ray.stages.aggregate import _conv_partial, conv_aggregate
    from rotel_ray.stages.parse import parse_stage

    n = 60_000
    t = generate_shard(0, n)
    # plant the hot conversation: 10% of all turns on one conv_id
    rng = np.random.default_rng(13)
    hot = rng.random(n) < 0.10
    conv = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
    conv[hot] = "conv-HOT"
    # hot conv turns get fresh turn_idx so (conv_id, turn_idx) stays unique
    turn = t.column("turn_idx").to_numpy(zero_copy_only=False).copy()
    turn[hot] = np.arange(int(hot.sum()), dtype=turn.dtype)
    t = t.set_column(t.column_names.index("conv_id"), "conv_id",
                     pa.array(conv.astype(str)))
    t = t.set_column(t.column_names.index("turn_idx"), "turn_idx",
                     pa.array(turn))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # several files so the flagship waves + multi-block shuffle are real
    per = n // 4
    for s in range(4):
        pq.write_table(t.slice(s * per, per), in_dir / f"part-{s}.parquet")

    out_dir = tmp_path / "out"
    res = run_flagship(str(in_dir), str(out_dir), waves=2,
                       enrich_concurrency=2, batch_size=8192)
    # every turn routes to exactly one data sink (aggregate sinks are extra)
    assert res["sink_counts"]["traces"] + res["sink_counts"]["logs"] == n

    # conv_agg correctness under the hot key, vs a pandas reference
    parsed = parse_stage(ray.data.read_parquet(str(in_dir)))
    got = conv_aggregate(parsed).to_pandas().set_index("conv_id")
    pdf = parsed.to_pandas()
    ref = pdf.groupby("conv_id").agg(
        n_turns=("turn_idx", "size"),
        n_tool_calls=("event_type", lambda s: (s == "tool_call").sum()),
        n_errors=("event_type", lambda s: (s == "error").sum()),
    )
    assert len(got) == len(ref)
    assert got["n_turns"].to_dict() == ref["n_turns"].to_dict()
    assert got["n_tool_calls"].to_dict() == ref["n_tool_calls"].to_dict()
    assert got.loc["conv-HOT", "n_turns"] == int(hot.sum())

    # the bounded-memory property: the per-batch combiner collapses the hot
    # conversation to ONE partial row per batch, so the shuffle moves
    # O(n_batches) rows for the hot key, never its raw turns
    hot_parsed = pa.Table.from_pandas(pdf[pdf.conv_id == "conv-HOT"],
                                      preserve_index=False)
    partial = _conv_partial(hot_parsed)
    assert hot_parsed.num_rows > 5_000 and partial.num_rows == 1


def test_fair_allocation_hamilton():
    """Quotas sum exactly to the budget; the leftover seat goes to the
    largest remainder (name-ascending tie-break)."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.mix import fair_allocation

    # token masses 5, 3, 1 over budget 10: base 5,3,1 with W=9 ->
    # base = [5,3,1], rem = [5,3,1] scaled... use budget=10, W=9:
    # 10*5//9=5 r5; 10*3//9=3 r3; 10*1//9=1 r1; leftover 1 -> to 'a'
    t = pa.table({"source": pa.array(["a"] * 1 + ["b"] * 1 + ["c"] * 1),
                  "text": pa.array(["w " * 5, "w " * 3, "w"])})
    out = fair_allocation(rd.from_arrow(t), budget=10,
                          num_buckets=2).to_pandas().set_index("source")
    assert out["alloc"].sum() == 10
    assert out.loc["a", "alloc"] == 6
    assert out.loc["b", "alloc"] == 3 and out.loc["c", "alloc"] == 1
