"""Dedup operator tests: planted duplicates + brute-force Python oracles."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rotel_ray.stages.dedup import (
    _shingle_hashes,
    _simhash64,
    _token_hashes,
    embedding_neardup_exact,
    embedding_neardup_lsh,
    exact_dedup,
    minhash_lsh_neardup,
    simhash_neardup,
    token_jaccard_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from the "
    "window and the birds sing in the morning light over the quiet garden path"
)


def _docs_with_dups():
    texts, ids = [], []
    rng = np.random.default_rng(3)
    words = BASE.split()
    for i in range(40):
        w = list(rng.permutation(words))
        texts.append(" ".join(w))
        ids.append(i)
    # planted near-dups: 100/101 differ by one token, 102/103 identical
    texts += [BASE, BASE.replace("garden", "hidden"), BASE + " end", BASE + " end"]
    ids += [100, 101, 102, 103]
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


def test_exact_dedup_finds_planted():
    t = _docs_with_dups()
    out = exact_dedup(rd.from_arrow(t)).to_pandas()
    dups = out[out.n_dups > 1]
    assert len(dups) == 1 and dups.iloc[0]["doc_id"] == 102 and dups.iloc[0]["n_dups"] == 2
    assert out.n_dups.sum() == t.num_rows


def _brute_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(_shingle_hashes(a, k)), set(_shingle_hashes(b, k))
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def test_minhash_lsh_neardup_planted():
    t = _docs_with_dups()
    out = minhash_lsh_neardup(rd.from_arrow(t), threshold=0.5).to_pandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (100, 101) in pairs and (102, 103) in pairs
    # reported jaccard equals the exact brute-force shingle jaccard
    for _, row in out.iterrows():
        texts = {i: x for i, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())}
        exact = _brute_jaccard(texts[row.doc_a], texts[row.doc_b])
        assert row.jaccard == pytest.approx(exact)
        assert row.jaccard >= 0.5


def test_simhash_full_recall_vs_bruteforce():
    t = _docs_with_dups()
    out = simhash_neardup(rd.from_arrow(t), max_hamming=3).to_pandas()
    got = {(a, b): h for a, b, h in zip(out.doc_a, out.doc_b, out.hamming)}
    # brute force all pairs
    ids = t.column("doc_id").to_pylist()
    sigs = {i: _simhash64(_token_hashes(x)) for i, x in zip(ids, t.column("text").to_pylist())}
    expected = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                expected[(min(a, b), max(a, b))] = h
    assert got == expected  # full recall by 4-band pigeonhole
    assert (102, 103) in got and got[(102, 103)] == 0


def test_token_jaccard_pairs_oracle():
    t = _docs_with_dups().filter(pa.compute.less(pa.compute.field("doc_id"), 40))
    out = token_jaccard_pairs(rd.from_arrow(t)).to_pandas().set_index("pair_key")
    texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    for pk in out.index:
        a, b = texts[2 * pk], texts[2 * pk + 1]
        sa, sb = set(a.split()), set(b.split())
        assert out.loc[pk, "jaccard"] == pytest.approx(len(sa & sb) / len(sa | sb))
    assert len(out) == 20


def _vecs_with_dups(n=60, d=16, seed=5):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    # planted: vec n-1 ≈ vec 0 (tiny perturbation), vec n-2 == vec 1
    m[n - 1] = m[0] + 0.01 * rng.standard_normal(d)
    m[n - 2] = m[1]
    ids = list(range(n))
    return pa.table(
        {"vec_id": pa.array(ids, pa.int64()),
         "embedding": pa.array([row.tolist() for row in m.astype(np.float32)], pa.list_(pa.float32()))}
    )


def test_embedding_neardup_exact_and_lsh():
    t = _vecs_with_dups()
    exact = embedding_neardup_exact(rd.from_arrow(t), tau=0.95).to_pandas()
    exact_pairs = set(zip(exact.vec_a, exact.vec_b))
    assert (0, 59) in exact_pairs and (1, 58) in exact_pairs
    lsh = embedding_neardup_lsh(rd.from_arrow(t), tau=0.95, num_bands=16,
                                bits_per_band=4).to_pandas()
    lsh_pairs = set(zip(lsh.vec_a, lsh.vec_b))
    assert lsh_pairs <= exact_pairs  # no false positives (exact verify in-bucket)
    # high recall on true near-dups (cos≈1 ⇒ same bucket in ≥1 of 16 bands)
    assert (0, 59) in lsh_pairs and (1, 58) in lsh_pairs


def test_embedding_neardup_exact_never_collects_via_to_pandas(monkeypatch):
    """The broadcast-side builder must stream blocks (iter_batches), never
    whole-table Dataset.to_pandas — the round-3 verdict's last driver-side
    full materialization."""
    import ray.data as ray_data

    def boom(self, *a, **k):
        raise AssertionError("Dataset.to_pandas called inside "
                             "embedding_neardup_exact's builder")

    t = _vecs_with_dups()
    ds = rd.from_arrow(t).repartition(4)
    monkeypatch.setattr(ray_data.Dataset, "to_pandas", boom)
    out = embedding_neardup_exact(ds, tau=0.95)
    pairs = {(r["vec_a"], r["vec_b"]) for r in out.take_all()}
    assert (0, 59) in pairs and (1, 58) in pairs


def test_embedding_neardup_exact_broadcast_size_gate():
    """Past broadcast_limit bytes the baseline aborts loudly and points at
    the LSH scale path instead of silently materializing the corpus."""
    t = _vecs_with_dups()
    with pytest.raises(ValueError, match="embedding_neardup_lsh"):
        embedding_neardup_exact(rd.from_arrow(t), tau=0.95,
                                broadcast_limit=128)


def test_minhash_dedup_keep_drops_higher_ids():
    from rotel_ray.stages.dedup import minhash_dedup_keep, minhash_lsh_neardup

    t = _docs_with_dups()
    ds = rd.from_arrow(t).repartition(4)
    pairs = minhash_lsh_neardup(ds, threshold=0.5).to_pandas()
    kept = minhash_dedup_keep(ds, threshold=0.5, keep_cols=["doc_id"]).to_pandas()
    dropped = set(pairs.doc_b)
    assert set(kept.doc_id) == set(t.column("doc_id").to_pylist()) - dropped
    # 101/102/103 are each the higher side of some verified pair (100 pairs
    # with 101, 102 AND 103 -- BASE vs BASE+" end" overlap is >= 0.5 too);
    # the lowest id of the cluster survives
    assert {101, 102, 103} & set(kept.doc_id) == set()
    assert 100 in set(kept.doc_id)


def test_anti_join_ids():
    from rotel_ray.stages.dedup import anti_join_ids

    left = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                                   "lang": pa.array(list("abcde"))}))
    drop = rd.from_arrow(pa.table({"doc_id": pa.array([2, 4, 9], pa.int64())}))
    out = anti_join_ids(left, drop).to_pandas().sort_values("doc_id")
    assert list(out.doc_id) == [1, 3, 5]
    assert list(out.lang) == ["a", "c", "e"]


def _brute_components(pairs):
    """Independent union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_paths_and_isolates():
    from rotel_ray.stages.dedup import connected_components

    # diameter-4 path (forces >1 propagation iteration), a 2-cycle, a triangle
    pairs = [("d1", "d0"), ("d2", "d1"), ("d3", "d2"), ("d4", "d3"),
             ("x2", "x1"), ("t1", "t2"), ("t2", "t3"), ("t3", "t1")]
    t = pa.table({"doc_a": [a for a, _ in pairs], "doc_b": [b for _, b in pairs]})
    out = connected_components(rd.from_arrow(t).repartition(3), num_buckets=8).to_pandas()
    got = dict(zip(out.doc_id, out.cluster_id))
    assert got == _brute_components(pairs)


def test_connected_components_int_ids_numeric_min():
    from rotel_ray.stages.dedup import connected_components

    # 10 < 2 lexicographically would be the bug; numeric min must win
    t = pa.table({"doc_a": pa.array([10, 2, 300], pa.int64()),
                  "doc_b": pa.array([2, 1, 10], pa.int64())})
    out = connected_components(rd.from_arrow(t)).to_pandas()
    assert dict(zip(out.doc_id, out.cluster_id)) == {1: 1, 2: 1, 10: 1, 300: 1}
    assert out.doc_id.dtype == "int64"


def test_connected_components_empty():
    from rotel_ray.stages.dedup import connected_components

    t = pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    out = connected_components(rd.from_arrow(t))
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "cluster_id"}


def test_connected_components_random_vs_union_find():
    from rotel_ray.stages.dedup import connected_components

    rng = np.random.default_rng(11)
    a = rng.integers(0, 120, 150)
    off = rng.integers(1, 8, 150)
    pairs = [(int(x), int(x + o)) for x, o in zip(a, off)]
    t = pa.table({"doc_a": pa.array([p[0] for p in pairs], pa.int64()),
                  "doc_b": pa.array([p[1] for p in pairs], pa.int64())})
    out = connected_components(rd.from_arrow(t).repartition(5), num_buckets=8).to_pandas()
    assert dict(zip(out.doc_id, out.cluster_id)) == _brute_components(pairs)


def test_clustered_keep_differs_from_per_pair_keep():
    from rotel_ray.stages.dedup import (minhash_dedup_keep,
                                        minhash_dedup_keep_clustered)

    # star over 3-token shingle sets: c = s1..s20, a = s1..s14, b = s7..s20
    # -> j(a,c) = j(b,c) = 0.7 (verified at tau 0.45, banding recall ~1),
    # j(a,b) = 8/20 = 0.4 (candidate pairs get exact-rejected). Per-pair
    # policy keeps BOTH a and b (only c is ever a doc_b); clustered policy
    # keeps only the component min a.
    toks = [f"tok{i:02d}" for i in range(22)]
    c_text = " ".join(toks)
    a_text = " ".join(toks[:16])
    b_text = " ".join(toks[6:])
    t = pa.table({
        "doc_id": pa.array([1, 2, 3] + list(range(10, 16)), pa.int64()),
        "text": pa.array([a_text, b_text, c_text] +
                         [f"unrelated filler document number {i} with words" * 2
                          for i in range(6)]),
    })
    ds = rd.from_arrow(t).repartition(3)
    pair_keep = set(minhash_dedup_keep(ds, threshold=0.45,
                                       keep_cols=["doc_id"]).to_pandas().doc_id)
    clus_keep = set(minhash_dedup_keep_clustered(ds, threshold=0.45,
                                                 keep_cols=["doc_id"], num_buckets=8).to_pandas().doc_id)
    others = set(range(10, 16))
    assert pair_keep == {1, 2} | others
    assert clus_keep == {1} | others


def test_decontaminate_planted_and_short_docs(ray_session):
    import ray

    from rotel_ray.stages.dedup import decontaminate

    ev_rows = {
        "doc_id": [100, 101],
        "text": ["q w e r t y u i o p extra tail here",  # 8-grams present
                 "tiny doc"],                             # <8 tokens: token fallback
    }
    tr_rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "prefix q w e r t y u i o p suffix",   # shares 8-grams with eval 100
            "a b c d e f g h i j k l",             # clean
            "tiny doc",                            # short doc sharing eval tokens
            "zz yy xx ww vv uu tt ss rr qq",       # clean
        ],
    }
    ev = ray.data.from_arrow(pa.table(ev_rows))
    tr = ray.data.from_arrow(pa.table(tr_rows))
    out = decontaminate(tr, ev, k=8).to_pandas().sort_values("doc_id")
    assert list(out.doc_id) == [1, 3]
    # doc 1: windows of "q w e r t y u i o p" inside it -> 3 distinct hits
    assert out.set_index("doc_id").loc[1, "n_overlap"] == 3
    # doc 3 (short): both tokens are in the eval token set
    assert out.set_index("doc_id").loc[3, "n_overlap"] == 2


def test_dup_ngram_stats_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.dedup import dup_ngram_stats

    boiler = "one two three four five six seven eight"      # exactly k=8 tokens
    texts = [
        boiler + " tail alpha",                             # shares boiler gram
        boiler + " tail beta",                              # with doc 0
        "unique words here nine ten eleven twelve thirteen fourteen",
        "short doc",                                        # <k fallback: raw tokens
        "short doc",                                        # duplicates doc 3's tokens
        "x x x x",                                          # within-doc repeats only
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(6)), "text": texts}))
    out = (dup_ngram_stats(ds, k=8, num_buckets=8)
           .to_pandas().set_index("doc_id").sort_index())

    # docs 0/1: 10 tokens -> 3 positional grams; the 3 grams fully inside
    # `boiler + tail`? grams are windows 0..2; window 0 = boiler (shared),
    # windows 1-2 include 'tail alpha'/'tail beta' (+ 'tail' gram differs at
    # last token) -> window 1 = tokens 1..8 ("two..tail") also shared!
    assert out.loc[0, "n_grams"] == 3 and out.loc[0, "n_dup"] == 2
    assert out.loc[1, "n_grams"] == 3 and out.loc[1, "n_dup"] == 2
    assert out.loc[2, "n_dup"] == 0
    # short-doc fallback: raw tokens, duplicated across docs 3/4
    assert out.loc[3, "n_grams"] == 2 and out.loc[3, "n_dup"] == 2
    assert out.loc[4, "n_dup"] == 2
    # within-doc multiplicity alone reaches min_count
    assert out.loc[5, "n_grams"] == 4 and out.loc[5, "n_dup"] == 4


def test_span_dedup_matches_bruteforce():
    from rotel_ray.stages.dedup import span_dedup

    texts = [
        "a b c d e f",            # spans (w=3): "a b c", "d e f"
        "a b c x y z",            # "a b c" repeats -> dropped here
        "d e f a b c",            # both spans seen -> doc vanishes
        "",                       # zero tokens -> absent from output
        "   ",                    # whitespace-only -> absent
        "q r",                    # short doc, one partial span
        "x y z q r",              # "x y z" is NOT a span elsewhere (x y z as
                                  # span_idx-1 of doc 1 IS "x y z") -> dropped
    ]
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    got = (span_dedup(ds, width=3, num_buckets=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # brute-force reference
    seen, keep = set(), {}
    for d, tx in zip(ids, texts):
        toks = tx.split()
        spans = [" ".join(toks[i:i + 3]) for i in range(0, len(toks), 3)]
        surv = []
        for s in spans:
            if s not in seen:
                seen.add(s)
                surv.append(s)
        if surv:
            keep[d] = (" ".join(surv), len(surv))

    assert list(got["doc_id"]) == sorted(keep)
    for _, row in got.iterrows():
        txt, n = keep[row["doc_id"]]
        assert row["text_dedup"] == txt
        assert row["n_kept"] == n
    assert 2 not in keep and 3 not in keep and 4 not in keep


def test_span_boilerplate_drops_all_occurrences():
    """The frequency rule differs from span_dedup: a span in >= min_docs
    DISTINCT docs drops EVERYWHERE (no first-occurrence survivor); a span
    repeated within ONE doc is not boilerplate."""
    from rotel_ray.stages.dedup import span_boilerplate

    texts = [
        "a b c d e f",       # "a b c" in docs 0,1,2 -> boilerplate
        "a b c x y z",
        "d e f a b c",       # "d e f" only in docs 0,2 -> boilerplate too
        "p q r p q r",       # repeated WITHIN one doc: nd=1 -> kept whole
        "u v w",             # unique -> kept
    ]
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    got = (span_boilerplate(ds, width=3, min_docs=2, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    out = {r["doc_id"]: (r["text_dedup"], r["n_kept"])
           for _, r in got.iterrows()}
    # docs 0 and 2 were pure boilerplate -> vanish; doc 1 keeps its tail
    assert set(out) == {1, 3, 4}
    assert out[1] == ("x y z", 1)
    assert out[3] == ("p q r p q r", 2)
    assert out[4] == ("u v w", 1)


def test_span_boilerplate_mega_span_stays_bucketed():
    """Skew probe: one span shared by EVERY doc lands in one bucket group
    and is dropped from all of them in a single sorted segment."""
    from rotel_ray.stages.dedup import span_boilerplate

    n = 200
    texts = [f"FOOTER COPYRIGHT BOILER unique{i} tail{i} tok{i}"
             for i in range(n)]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64()),
                                 "text": pa.array(texts)}))
    got = (span_boilerplate(ds, width=3, min_docs=2, num_buckets=8)
           .to_pandas())
    assert len(got) == n
    assert (got["n_kept"] == 1).all()
    assert got["text_dedup"].str.startswith("unique").all()


def test_mix_balance_equal_share():
    import hashlib

    from rotel_ray.stages.mix import mix_balance

    rng = np.random.default_rng(7)
    texts = [" ".join(rng.choice(list("abcdefgh"), size=int(n)))
             for n in rng.integers(5, 40, size=120)]
    # source 'big' holds ~2/3 of all tokens, 'small' the rest
    srcs = ["big" if i < 80 else "small" for i in range(120)]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(120), pa.int64()),
                                 "source": pa.array(srcs),
                                 "text": pa.array(texts)}))
    got = mix_balance(ds, num_buckets=4).to_pandas().sort_values("doc_id")

    tok = [len(t.split()) for t in texts]
    tot = {"big": sum(n for n, s in zip(tok, srcs) if s == "big"),
           "small": sum(n for n, s in zip(tok, srcs) if s == "small")}
    budget = sum(tot.values()) // (2 * 2)
    thr = {s: min(65536, budget * 65536 // t) for s, t in tot.items()}
    keep = [i for i in range(120)
            if int(hashlib.md5(texts[i].encode()).hexdigest()[:4], 16) < thr[srcs[i]]]
    assert list(got["doc_id"]) == keep
    # the dominant source must actually be down-sampled harder
    assert thr["big"] < thr["small"]


def test_mix_temperature_flattens_toward_uniform():
    """tau=1 reproduces the natural mix (target == share to quantization);
    tau<1 moves the target shares toward uniform — the dominant source's
    boost < 1, the tail source's boost > 1; boosts are monotone in share."""
    from rotel_ray.stages.mix import mix_temperature

    rng = np.random.default_rng(11)
    texts, srcs = [], []
    for s, n_docs, tok in [("big", 60, 40), ("mid", 30, 20), ("tiny", 10, 5)]:
        for _ in range(n_docs):
            texts.append(" ".join(rng.choice(list("abcdefgh"), size=tok)))
            srcs.append(s)
    ds = rd.from_arrow(pa.table({"source": pa.array(srcs),
                                 "text": pa.array(texts)}))
    t1 = mix_temperature(ds, tau=1.0, num_buckets=4).to_pandas() \
        .set_index("source")
    # tau=1: temperature weight IS the share -> target == share (both are
    # the same ratio floor-quantized at 1e9)
    assert (abs(t1["target_unat"] - t1["share_unat"]) <= 1).all()
    t = mix_temperature(ds, tau=0.5, num_buckets=4).to_pandas() \
        .set_index("source")
    assert t.loc["big", "boost_ppm"] < 1_000_000 < t.loc["tiny", "boost_ppm"]
    assert (t.loc["tiny", "target_unat"] > t.loc["tiny", "share_unat"]
            and t.loc["big", "target_unat"] < t.loc["big", "share_unat"])
    # shares still sum to ~1 after re-weighting
    assert abs(int(t["target_unat"].sum()) - 10**9) < 10


def test_shard_assign_deterministic_ranks():
    import hashlib

    from rotel_ray.stages.mix import shard_assign

    texts = [f"doc number {i} content" for i in range(50)] + ["doc number 7 content"]
    ids = list(range(51))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    got = shard_assign(ds, n_shards=4, num_buckets=4).to_pandas()

    rows = []
    for d, tx in zip(ids, texts):
        hh = hashlib.md5(tx.encode()).hexdigest()
        rows.append((int(hh[:4], 16) % 4, hh, d))
    expect = {}
    for shard in range(4):
        members = sorted((h, d) for s, h, d in rows if s == shard)
        for pos, (_, d) in enumerate(members):
            expect[d] = (shard, pos)
    assert len(got) == 51
    for _, r in got.iterrows():
        assert expect[r["doc_id"]] == (r["shard"], r["pos"])


def test_semi_join_ids(ray_session):
    import pyarrow as pa
    import ray

    from rotel_ray.stages.dedup import semi_join_ids

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4, 5], "text": list("abcde")}))
    keep = ray.data.from_arrow(pa.table({"doc_id": [2, 4, 9]}))
    out = semi_join_ids(ds, keep, num_buckets=4).to_pandas().sort_values("doc_id")
    assert list(out.doc_id) == [2, 4] and list(out.text) == ["b", "d"]


def test_dedup_keep_best_prefers_longest_member(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.dedup import minhash_dedup_keep_best

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,                              # 0: cluster A, 10 tokens
        base + " lambda mu",               # 1: cluster A, 12 tokens -> WINNER
        base + " lambda",                  # 2: cluster A, 11 tokens
        "totally different content here about ships and oceans and tides",  # 3
        "unrelated second loner document with its own words entirely",      # 4
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "lang": pa.array(["en"] * len(texts)),
        "text": pa.array(texts)}))
    out = (minhash_dedup_keep_best(ds, threshold=0.5,
                                   keep_cols=["doc_id", "lang"], num_buckets=8)
           .to_pandas())
    kept = set(out["doc_id"])
    assert 1 in kept                      # longest member survives
    assert 0 not in kept and 2 not in kept
    assert {3, 4} <= kept                 # non-clustered docs untouched


def test_dup_cluster_sizes_vs_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.dedup import dup_cluster_sizes

    # synthetic (doc_id, cluster_id): clusters of sizes 1,1,2,3,3
    cc = pa.table({"doc_id": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
                   "cluster_id": [0, 1, 2, 2, 5, 5, 5, 7, 7, 7]})
    out = dup_cluster_sizes(rd.from_arrow(cc).repartition(4)).to_pandas()
    got = dict(zip(out.cluster_size, out.n_clusters))
    assert got == {1: 2, 2: 1, 3: 2}


def test_source_overlap_vs_bruteforce(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.dedup import source_overlap

    texts = ["a b c d e f g h tail1", "A  b c d e f g h tail2",  # same fp, norm-insensitive
             "x y z", "x y z", "unique one here"]
    srcs = ["s1", "s2", "s1", "s3", "s2"]
    ds = rd.from_arrow(pa.table({"text": texts, "source": srcs})).repartition(3)
    out = source_overlap(ds).to_pandas()
    got = {(r.src_a, r.src_b): r.n_shared for r in out.itertuples()}
    assert got == {("s1", "s2"): 1, ("s1", "s3"): 1}


def test_lsh_params_optimal():
    """The banding search matches exhaustive evaluation and moves the right
    way with the threshold (higher tau -> more rows per band)."""
    import numpy as np

    from rotel_ray.stages.dedup import lsh_params

    def err(b, r, tau, w=0.5):
        xs = (np.arange(1000) + 0.5) / 1000.0
        prob = 1.0 - (1.0 - xs ** r) ** b
        return (w * prob[xs < tau].sum() / 1000.0
                + (1 - w) * (1.0 - prob[xs >= tau]).sum() / 1000.0)

    for tau in (0.3, 0.5, 0.7, 0.9):
        b, r = lsh_params(tau, 64)
        assert b * r <= 64
        best = min(err(bb, 64 // bb, tau) for bb in range(1, 65) if 64 // bb)
        assert abs(err(b, r, tau) - best) < 1e-12
    b_lo, r_lo = lsh_params(0.3, 64)
    b_hi, r_hi = lsh_params(0.9, 64)
    assert r_hi > r_lo  # tighter tau -> longer bands (better selectivity)


def test_decontaminate_bloom_superset_of_exact():
    """Bloom hits are a deterministic superset of the exact overlap (false
    positives only, never negatives), and per-doc hit counts are >= the
    exact distinct-gram overlap counts."""
    from rotel_ray.stages.dedup import decontaminate, decontaminate_bloom

    t = _docs_with_dups()
    ds = rd.from_arrow(t).repartition(3)

    def _is_ev(tb):
        d = tb.column("doc_id")
        return pa.compute.equal(pa.compute.bit_wise_and(d, 7), 0)

    ev = ds.map_batches(lambda tb: tb.filter(_is_ev(tb)),
                        batch_format="pyarrow")
    tr = ds.map_batches(lambda tb: tb.filter(pa.compute.invert(_is_ev(tb))),
                        batch_format="pyarrow")
    exact = {r["doc_id"]: r["n_overlap"]
             for r in decontaminate(tr, ev, k=5).take_all()}
    bloom = {r["doc_id"]: r["n_bloom_hits"]
             for r in decontaminate_bloom(tr, ev, k=5).take_all()}
    assert set(exact) <= set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n, d
    # determinism: same input -> identical result
    bloom2 = {r["doc_id"]: r["n_bloom_hits"]
              for r in decontaminate_bloom(tr, ev, k=5).take_all()}
    assert bloom == bloom2


def test_decontaminate_bloom_short_doc_fallback():
    """Docs with < k tokens probe their raw tokens (the shingle-stream
    fallback), so an exact short-doc duplicate across splits is caught."""
    from rotel_ray.stages.dedup import decontaminate_bloom

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["unique eval snippet", "unique eval other",
                          "completely different words here"]),
    })
    ds = rd.from_arrow(t)
    ev = ds.filter(expr="doc_id == 0")
    tr = ds.filter(expr="doc_id != 0")
    hits = {r["doc_id"]: r["n_bloom_hits"]
            for r in decontaminate_bloom(tr, ev, k=8).take_all()}
    assert hits.get(1, 0) >= 2  # shares 'unique' + 'eval' tokens
    assert 2 not in hits or hits[2] == 0


def test_contamination_overlap_exact_fractions():
    from rotel_ray.stages.dedup import contamination_overlap

    def mk(ids, texts):
        return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                       "text": pa.array(texts, pa.string())}))

    train = mk([10, 11], ["a b c d", "x y z w"])
    ev = mk([0, 1], ["a b c q", "p q r s"])
    out = (contamination_overlap(train, ev, k=2, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # eval doc 0: grams {a b, b c, c q}; train has {a b, b c} -> 2/3
    assert out.loc[0, ["n_grams", "n_hit"]].tolist() == [3, 2]
    assert out.loc[0, "overlap_ppm"] == 2 * 1_000_000 // 3
    # eval doc 1: grams {p q, q r, r s}; no hits
    assert out.loc[1, ["n_grams", "n_hit", "overlap_ppm"]].tolist() == [3, 0, 0]


def test_contamination_overlap_short_doc_fallback():
    from rotel_ray.stages.dedup import contamination_overlap

    def mk(ids, texts):
        return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                       "text": pa.array(texts, pa.string())}))

    # single-token eval doc falls back to its raw token; a single-token
    # train doc (also fallback) provides the hit, the long train doc can't
    train = mk([10, 11], ["a", "a b c"])
    ev = mk([0, 1], ["a", "b"])
    out = (contamination_overlap(train, ev, k=2, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, ["n_grams", "n_hit"]].tolist() == [1, 1]
    assert out.loc[1, ["n_grams", "n_hit"]].tolist() == [1, 0]


def test_span_dedup_indoc_keeps_cross_doc_copies():
    from rotel_ray.stages.dedup import span_dedup_indoc

    texts = [
        "a b a b c d",      # w=2 spans: "a b","a b","c d" -> "a b c d"
        "a b x y a b",      # first "a b" kept, trailing "a b" dropped
        "c d",              # single span, untouched (doc 0's copy is NOT
                            # deduped against it — in-doc only)
        "",                 # zero tokens -> absent from output
        "p q r",            # odd length: "p q","r" both unique -> intact
    ]
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    got = (span_dedup_indoc(ds, width=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1, 2, 4]
    assert got["text_dedup"].tolist() == ["a b c d", "a b x y", "c d", "p q r"]
    assert got["n_kept"].tolist() == [2, 2, 1, 2]


def test_conv_dedup_matches_turn_sequences():
    import hashlib

    from rotel_ray.stages.dedup import conv_dedup

    rows = [
        # conv a == conv c (same role/text sequence); conv b differs by role;
        # conv d differs only in turn ORDER (swapped) -> distinct
        ("a", 0, "user", "hi"), ("a", 1, "assistant", "yo"),
        ("b", 0, "tool", "hi"), ("b", 1, "assistant", "yo"),
        ("c", 0, "user", "hi"), ("c", 1, "assistant", "yo"),
        ("d", 0, "assistant", "yo"), ("d", 1, "user", "hi"),
    ]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
    }))
    got = (conv_dedup(ds, num_buckets=4).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    assert got.conv_id.tolist() == ["a", "b", "d"]
    assert got.set_index("conv_id").n_dups.to_dict() == {"a": 2, "b": 1, "d": 1}

    def h(role, text):
        return hashlib.md5(f"{role}\x1f{text}".encode()).hexdigest()

    exp_a = hashlib.md5((h("user", "hi") + h("assistant", "yo")).encode()).hexdigest()
    assert got.set_index("conv_id").conv_hash["a"] == exp_a


def test_dedup_rate_by_source():
    from rotel_ray.stages.dedup import dedup_rate_by_source

    ds = rd.from_arrow(pa.table({
        "source": pa.array(["a", "a", "a", "b", "b"]),
        "text": pa.array(["x", "x", "y", "z", "w"]),
    }))
    got = (dedup_rate_by_source(ds, num_buckets=4).to_pandas()
           .sort_values("source").reset_index(drop=True))
    assert got.source.tolist() == ["a", "b"]
    assert got.n_docs.tolist() == [3, 2]
    assert got.n_unique.tolist() == [2, 2]
    assert got.n_dup_docs.tolist() == [1, 0]
