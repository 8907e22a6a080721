"""Misra–Gries heavy-hitters sketch: exactness guarantee + bounded state."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from rotel_ray.stages.sketch import _batch_token_counts, heavy_hitters, mg_compress


def test_batch_token_counts_exact():
    toks, counts = _batch_token_counts(pa.array(["a b a", "b  c", "", None]))
    got = dict(zip(toks.to_pylist(), counts.tolist()))
    assert got == {"a": 2, "b": 2, "c": 1}


def test_mg_compress_guarantee():
    """MG residual >= true - B/(k+1): every count > B/(k+1) survives."""
    rng = np.random.default_rng(4)
    counts = rng.integers(1, 50, 500).astype(np.int64)
    counts[7] = 10_000  # heavy hitter
    toks = pa.array([f"t{i}" for i in range(500)])
    k = 32
    ctoks, resid = mg_compress(toks, counts, k)
    assert len(resid) <= k
    assert "t7" in ctoks.to_pylist()
    B = counts.sum()
    for t, c in zip(toks.to_pylist(), counts.tolist()):
        if c > B / (k + 1):
            assert t in ctoks.to_pylist(), t


def test_heavy_hitters_exact_vs_bruteforce():
    """Zipf corpus: sketch + recount output equals the exact frequency table
    at threshold >= 2N/(k+1)."""
    rng = np.random.default_rng(8)
    vocab = np.array([f"w{i}" for i in range(2000)])
    # Zipf-ish: token i with weight 1/(i+1)
    w = 1.0 / np.arange(1, len(vocab) + 1)
    draws = rng.choice(vocab, 60_000, p=w / w.sum())
    texts = [" ".join(draws[i * 30 : (i + 1) * 30]) for i in range(2000)]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(8)

    k = 256
    N = len(draws)
    threshold = int(np.ceil(2 * N / (k + 1)))
    out = heavy_hitters(ds, text_col="text", k=k, threshold=threshold).to_pandas()

    uniq, cnt = np.unique(draws, return_counts=True)
    expected = {t: int(c) for t, c in zip(uniq, cnt) if c >= threshold}
    assert dict(zip(out.token, out.n)) == expected
    assert len(expected) > 5  # the test corpus actually has heavy hitters


def test_distinct_count_kmv():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.dedup import _batch_shingle_stream
    from rotel_ray.stages.sketch import distinct_count_kmv

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(500)]
    texts = [" ".join(rng.choice(words, size=60)) for _ in range(400)]
    tab = pa.table({"doc_id": pa.array(range(400), pa.int64()),
                    "text": pa.array(texts)})
    # exact ground truth via the same shingle stream
    stream, _ = _batch_shingle_stream(tab.column("text").combine_chunks(), 3)
    true_distinct = len(np.unique(stream))

    got = distinct_count_kmv(rd.from_arrow(tab), k=256).to_pandas()
    assert len(got) == 1
    est = int(got["n_distinct_est"].iloc[0])
    assert true_distinct > 256  # the estimation (not exact-count) regime
    assert abs(est - true_distinct) / true_distinct < 0.15  # KMV σ ≈ 1/√k ≈ 6%

    # below-k regime is exact
    small = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["a b c d e"])})
    got2 = distinct_count_kmv(rd.from_arrow(small), k=256).to_pandas()
    assert int(got2["n_distinct_est"].iloc[0]) == 3  # 3 shingles, all distinct

    # split into many blocks -> same sketch (mergeability / partial bound)
    got3 = distinct_count_kmv(rd.from_arrow(tab).repartition(16), k=256).to_pandas()
    assert int(got3["n_distinct_est"].iloc[0]) == est
    assert int(got3["kth_hash"].iloc[0]) == int(got["kth_hash"].iloc[0])


def test_grouped_kmv_estimate_and_exact_small_groups(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.sketch import KMV_MIX, grouped_kmv

    rng = np.random.default_rng(11)
    # group 'big': 5000 distinct ids (sketched); 'tiny': 7 ids (exact path)
    big = rng.choice(100000, 5000, replace=False)
    rows = [("big", int(u)) for u in np.repeat(big, 2)] + \
           [("tiny", i) for i in range(7)] * 3
    df = pd.DataFrame(rows, columns=["event_type", "user_id"])
    out = (grouped_kmv(rd.from_pandas(df).repartition(6), key="event_type",
                       id_col="user_id", k=64, num_buckets=4)
           .to_pandas().set_index("event_type"))
    assert out.loc["tiny", "n_distinct_est"] == 7
    assert out.loc["tiny", "k_used"] == 7
    # reference estimate from the same hash
    h = np.sort((big.astype(np.uint64) * np.uint64(KMV_MIX)))
    est_ref = 63 * (1 << 64) // int(h[63])
    assert out.loc["big", "k_used"] == 64
    assert out.loc["big", "n_distinct_est"] == est_ref
    # sketch accuracy sanity: within 25% of truth at k=64
    assert abs(est_ref - 5000) / 5000 < 0.25


def test_splitmix64_parity_and_bit_length():
    import duckdb
    import numpy as np

    from rotel_ray.stages.sketch import (_bit_length_u64, splitmix64,
                                         splitmix64_sql)

    ids = np.random.default_rng(3).integers(0, 1 << 62, 500, dtype=np.uint64)
    py = splitmix64(ids)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest($1::UBIGINT[]) AS x",
                [[int(i) for i in ids]])
    db = con.execute(
        f"SELECT CAST({splitmix64_sql('x')} AS VARCHAR) FROM t").fetchall()
    assert (py == np.array([int(v[0]) for v in db], dtype=np.uint64)).all()
    # exact bit length incl. power-of-two boundaries float log2 mis-rounds
    xs = np.array([0, 1, 2, 3, 4, (1 << 52) - 1, 1 << 52, (1 << 63)],
                  dtype=np.uint64)
    assert _bit_length_u64(xs).tolist() == [0, 1, 2, 2, 3, 52, 53, 64]


def test_hll_distinct_accuracy_and_fields(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.sketch import HLL_RMAX, hll_distinct, splitmix64

    u = np.random.default_rng(0).integers(0, 20_000, 100_000)
    ds = rd.from_arrow(pa.table({"user_id": u})).repartition(8)
    r = hll_distinct(ds).take_all()[0]
    true = len(np.unique(u))
    assert abs(r["est_e3"] / 1000 - true) / true < 0.05  # 3 sigma at m=4096
    # register/harmonic-sum fields match a single-process reference
    h = splitmix64(np.unique(u).astype(np.uint64))
    reg = (h >> np.uint64(52)).astype(np.int64)
    low = h & np.uint64((1 << 52) - 1)
    from rotel_ray.stages.sketch import _bit_length_u64
    rank = np.where(low == 0, HLL_RMAX, 52 - _bit_length_u64(low) + 1)
    regs = {}
    for g, rk in zip(reg, rank):
        regs[g] = max(regs.get(g, 0), int(rk))
    s = sum(1 << (HLL_RMAX - v) for v in regs.values()) \
        + (4096 - len(regs)) * (1 << HLL_RMAX)
    assert r["s_hi"] == s >> 32 and r["s_lo"] == s & 0xFFFFFFFF
    assert r["n_zero"] == 4096 - len(regs)


def test_grouped_hll_accuracy(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.sketch import grouped_hll

    rng = np.random.default_rng(9)
    n = 100_000
    df = pd.DataFrame({"event_type": rng.choice(["a", "b", "c"], n),
                       "user_id": rng.integers(0, 8000, n)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)
    out = grouped_hll(ds, key="event_type", id_col="user_id").to_pandas()
    truth = df.groupby("event_type")["user_id"].nunique()
    assert len(out) == 3
    for r in out.itertuples():
        t = truth[r.event_type]
        assert abs(r.est_e3 / 1000 - t) / t < 0.06


def test_weighted_sample_deterministic_and_biased(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.mix import weighted_sample
    from rotel_ray.stages.sketch import splitmix64

    n = 4000
    rng = np.random.default_rng(4)
    w = np.where(np.arange(n) < 200, 500, 1).astype(np.int64)  # heavy head
    t = pa.table({"doc_id": np.arange(n), "n_chars": w})

    def run():
        ds = rd.from_arrow(t).repartition(8)
        return [r["doc_id"] for r in
                weighted_sample(ds, 100, weight_col="n_chars").take_all()]

    a, b = run(), run()
    assert a == b  # pure function of content, no RNG state
    # brute-force reference: same key expression
    h = splitmix64(np.arange(n).astype(np.uint64))
    u = (h.astype(np.float64) + 1.0) / 2.0**64
    key = np.floor(np.log(u) / np.maximum(w.astype(np.float64), 1.0) * 1e9)
    order = np.lexsort((np.arange(n), -key))[:100]
    assert a == list(order)
    # weighting bites: heavy items (5% of rows, 500x weight) dominate
    assert sum(1 for d in a if d < 200) > 50


def test_quantile_sketch_brackets_exact_quantile():
    import ray.data as rd

    from rotel_ray.stages.sketch import quantile_sketch

    vals = [i / 100.0 for i in range(1, 1001)]  # cents 1..1000
    ds = rd.from_arrow(pa.table({"value": pa.array(vals, pa.float64())}))
    got = quantile_sketch(ds, bins=64, num_buckets=4)
    for r in got.itertuples():
        # the bucket's value range must contain the exact rank-r value
        exact = r.rank + 1  # cents are 1..1000, rank is 0-based
        span = 1000  # hi - lo + 1
        b_lo = 1 + r.bucket * span // 64
        b_hi = 1 + (r.bucket + 1) * span // 64 - 1
        assert b_lo <= exact <= b_hi
        assert r.est_lo_cents == b_lo
    assert got.perm.tolist() == [500, 900, 990]


def test_cms_overestimate_and_mirror_under_forced_collisions():
    """Width 4 forces collisions: the engine's estimates must equal a
    direct numpy CMS replay and satisfy est >= true everywhere, with at
    least one real overestimate."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.dedup import _bloom_hashes
    from rotel_ray.stages.sketch import cms_token_estimates

    docs = ["a b c d e f g h", "a a b b c d", "x y z a q w", "q w e r t y"]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(3)
    out = cms_token_estimates(ds, width_log2=2, depth=3, top_v=64).to_pandas()

    from collections import Counter
    true = Counter(" ".join(docs).split())
    toks = sorted(true)
    h1, h2 = _bloom_hashes(toks)
    mat = np.zeros((3, 4), np.int64)
    for i, t in enumerate(toks):
        for r in range(3):
            mat[r, (h1[i] + r * h2[i]) % 4] += true[t]
    mirror = {t: min(mat[r, (h1[i] + r * h2[i]) % 4] for r in range(3))
              for i, t in enumerate(toks)}

    got = out.set_index("token")
    assert len(got) == len(toks)
    for t in toks:
        assert got.loc[t, "true_count"] == true[t]
        assert got.loc[t, "cms_estimate"] == mirror[t]
        assert got.loc[t, "overestimate"] >= 0
    assert (got["overestimate"] > 0).any()  # width 4 must collide
