import numpy as np
import pyarrow as pa
import pytest


def _brute_pack(texts, seq_len):
    """Reference: global concat in doc order, chunk into seq_len windows."""
    out, off = [], 0
    for t in texts:
        n = len(t.split())
        if n == 0:
            out.append((n, off, None, None, 0))
        else:
            out.append((n, off, off // seq_len, (off + n - 1) // seq_len,
                        (off + n - 1) // seq_len - off // seq_len + 1))
        off += n
    return out


def test_seq_pack_vs_bruteforce(ray_session):
    import ray

    from rotel_ray.stages.pack import seq_pack

    rng = np.random.default_rng(7)
    texts = []
    for i in range(200):
        n = int(rng.integers(0, 12))
        texts.append(" ".join(f"w{int(rng.integers(0, 9))}" for _ in range(n)))
    texts[13] = ""          # empty doc mid-corpus
    texts[199] = "   "      # whitespace-only doc at the end
    ids = list(range(200))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    # small seq_len/range_size force both boundary-straddling docs and
    # multiple prefix-sum ranges per bucket
    out = (seq_pack(ds, seq_len=7, range_size=16)
           .to_pandas().set_index("doc_id").sort_index())
    ref = _brute_pack(texts, 7)
    assert len(out) == 200
    for i, (n, off, sf, sl, ns) in enumerate(ref):
        row = out.loc[i]
        assert row.n_tokens == n and row.tok_start == off, i
        assert row.n_seqs == ns, i
        if n == 0:
            assert row.seq_first is None or np.isnan(row.seq_first)
        else:
            assert row.seq_first == sf and row.seq_last == sl, i


def test_tfidf_topk_vs_bruteforce(ray_session):
    import math

    import ray

    from rotel_ray.stages.textstats import tfidf_topk

    texts = ["a a a b c", "b b c d", "a d d d", "c c e", ""]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(5)), "text": texts}))
    out = tfidf_topk(ds, k=2).to_pandas()

    # brute force
    n_docs = 5
    docs = [t.split() for t in texts]
    df = {}
    for d in docs:
        for tok in set(d):
            df[tok] = df.get(tok, 0) + 1
    idf = {t: int(math.floor(math.log(n_docs / c) * 1e6)) for t, c in df.items()}
    expect = []
    for i, d in enumerate(docs):
        tf = {}
        for tok in d:
            tf[tok] = tf.get(tok, 0) + 1
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1] * idf[kv[0]], kv[0]))
        for tok, c in ranked[:2]:
            expect.append((i, tok, c, c * idf[tok]))
    got = sorted(map(tuple, out[["doc_id", "tok", "tf", "score"]].values))
    assert got == sorted(expect)


def test_pack_sequences_vs_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.dedup import _fnv1a
    from rotel_ray.stages.pack import pack_sequences

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "x", "longtokenword"]
    docs = [" ".join(rng.choice(words, rng.integers(0, 12))) for _ in range(57)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(57), pa.int64()), "text": pa.array(docs)}))
    out = (pack_sequences(ds, seq_len=16, range_size=8, num_buckets=4)
           .to_pandas().sort_values("seq_id").reset_index(drop=True))

    # brute force: concatenate in doc_id order, cut at 16
    stream, doc_of = [], []
    for i, d in enumerate(docs):
        for tok in d.split():
            stream.append(_fnv1a(tok) % (1 << 16))
            doc_of.append(i)
    n_seq = -(-len(stream) // 16)
    assert len(out) == n_seq
    for s in range(n_seq):
        seg = slice(s * 16, (s + 1) * 16)
        row = out.iloc[s]
        assert row.seq_id == s
        assert row.tok_sum == sum(stream[seg])
        assert row.n_tok == len(stream[seg])
        assert row.n_docs == len(set(doc_of[seg]))


def test_token_budget_sample_prefix_semantics(ray_session):
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.mix import token_budget_sample

    rng = np.random.default_rng(9)
    docs = [" ".join(rng.choice(["a", "bb", "ccc", "dd"], rng.integers(1, 9)))
            for _ in range(80)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(80), pa.int64()), "text": pa.array(docs)}))
    budget = 100
    out = (token_budget_sample(ds, budget, num_buckets=4)
           .to_pandas().sort_values("cum_before"))

    ordered = sorted(range(80), key=lambda i: (hashlib.md5(docs[i].encode()).hexdigest(), i))
    cum, expect = 0, []
    for i in ordered:
        n = len(docs[i].split())
        if cum >= budget:
            break
        expect.append((i, n, cum))
        cum += n
    assert [(int(r.doc_id), int(r.n_tokens), int(r.cum_before))
            for r in out.itertuples()] == expect
    # kept mass crosses the budget exactly once
    assert out.cum_before.iloc[-1] < budget <= out.cum_before.iloc[-1] + out.n_tokens.iloc[-1]


def test_pack_sequences_giant_doc_spans_many_sequences(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.pack import pack_sequences

    # one doc of 100 tokens among small docs, seq_len=8 -> spans ~13 seqs
    docs = ["a b", "x " * 100, "c d e"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(docs)}))
    out = (pack_sequences(ds, seq_len=8, range_size=2, num_buckets=2)
           .to_pandas().sort_values("seq_id").reset_index(drop=True))
    total = 2 + 100 + 3
    assert out.n_tok.sum() == total
    assert len(out) == -(-total // 8)
    # middle sequences are filled entirely by the giant doc
    assert (out.n_docs.iloc[2:11] == 1).all()
    # first sequence holds the tail of doc 0 and the head of doc 1
    assert out.n_docs.iloc[0] == 2


def test_token_budget_budget_exceeds_corpus_keeps_all(ray_session):
    import pyarrow as pa
    import ray

    from rotel_ray.stages.mix import token_budget_sample

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b", "c", "d e f"])}))
    out = token_budget_sample(ds, budget=10**9, num_buckets=2).to_pandas()
    assert len(out) == 3 and out.n_tokens.sum() == 6


def test_doc_chunks_vs_bruteforce(ray_session):
    import ray.data as rd

    from rotel_ray.stages.dedup import _fnv1a
    from rotel_ray.stages.pack import doc_chunks

    rng = np.random.default_rng(9)
    vocab = [f"t{i}" for i in range(40)]
    texts = ["", "one", " ".join(rng.choice(vocab, 7)),
             " ".join(rng.choice(vocab, 200)), "   ",
             " ".join(rng.choice(vocab, 64)), " ".join(rng.choice(vocab, 65))]
    cs, st = 16, 12
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    out = (doc_chunks(ds, chunk_size=cs, stride=st)
           .to_pandas().sort_values(["doc_id", "chunk_idx"]))

    ref = []
    for i, tx in enumerate(texts):
        tids = [_fnv1a(t) % 65536 for t in tx.split()]
        for ci, s in enumerate(range(0, len(tids), st)):
            w = tids[s:s + cs]
            ref.append((i, ci, len(w), sum(w)))
    got = [(int(r.doc_id), int(r.chunk_idx), int(r.n_tokens), int(r.tok_sum))
           for r in out.itertuples()]
    assert got == ref


def test_latest_per_key_compaction(ray_session):
    import pandas as pd
    import ray.data as rd

    from rotel_ray.stages.window import latest_per_key

    rng = np.random.default_rng(2)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 80, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
    })
    out = (latest_per_key(rd.from_pandas(df).repartition(6),
                          key="user_id", order_cols=["ts", "event_id"])
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    ref = (df.sort_values(["user_id", "ts", "event_id"],
                          ascending=[True, False, False])
           .drop_duplicates("user_id").sort_values("user_id")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(out[sorted(out.columns)], ref[sorted(ref.columns)])


def test_bm25_topk_vs_bruteforce(ray_session):
    import math

    import ray.data as rd

    from rotel_ray.stages.textstats import bm25_topk

    rng = np.random.default_rng(4)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 30))) for _ in range(60)]
    terms = ["alpha", "beta", "zz_absent"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    out = bm25_topk(ds, terms, k=10).to_pandas()

    N = len(texts)
    dls = [len(t.split()) for t in texts]
    avgdl = sum(dls) / N
    dfs = [sum(1 for t in texts if w in t.split()) for w in terms]
    idf = [math.log((N - d + 0.5) / (d + 0.5) + 1.0) for d in dfs]
    scores = []
    for i, tx in enumerate(texts):
        tk = tx.split()
        s = 0.0
        for j, w in enumerate(terms):
            tf = float(tk.count(w))
            s = s + idf[j] * ((tf * (1.2 + 1.0))
                              / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dls[i] / avgdl))))
        scores.append((math.floor(s * 1e6), i))
    scores.sort(key=lambda r: (-r[0], r[1]))
    assert [(int(r.score_unat), int(r.doc_id)) for r in out.itertuples()] \
        == [(s, i) for s, i in scores[:10]]


def test_auto_range_size_scaling():
    """Driver range-table rows stay O(sqrt(n_docs)) at simulated web scale."""
    from rotel_ray.stages.pack import auto_range_size

    assert auto_range_size(0) == 65536
    assert auto_range_size(10_000) == 65536          # floor
    assert auto_range_size(1 << 32) == 1 << 16       # sqrt exactly
    assert auto_range_size(10**9) == 1 << 15 or auto_range_size(10**9) == 65536
    rs9 = auto_range_size(10**9)
    assert 10**9 // rs9 <= 2 * int(10**4.5) + 1      # driver rows ~ sqrt(n)
    rs12 = auto_range_size(10**12)
    assert rs12 == 1 << 20
    assert 10**12 // rs12 <= 1_000_000               # ~1M rows, not 15M
    # power of two and monotone
    for n in (10**6, 10**9, 10**12, 10**15):
        rs = auto_range_size(n)
        assert rs & (rs - 1) == 0
        assert auto_range_size(n * 100) >= rs


def test_conv_examples_budget_semantics():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.pack import conv_examples

    t = pa.table({
        "conv_id": pa.array(["a"] * 4 + ["b"] * 3),
        "turn_idx": pa.array([0, 1, 2, 3, 0, 1, 2], pa.int64()),
        "text": pa.array(["one two three", "four five",
                          "six seven eight nine", "ten",
                          "a b c d e f g", "h i", "j"]),
    })
    out = conv_examples(rd.from_arrow(t).repartition(3), budget=5).to_pandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # conv a prefix-before: 0,3,5,9 -> // 5 = 0,0,1,1
    # conv b prefix-before: 0,7,9   -> // 5 = 0,1,1
    assert list(out.example_id) == [0, 0, 1, 1, 0, 1, 1]
    assert list(out.n_tokens) == [3, 2, 4, 1, 7, 2, 1]
    # boundaries never split a turn; examples are contiguous per conv
    for _, g in out.groupby("conv_id"):
        eids = list(g.example_id)
        assert eids == sorted(eids)


def test_conv_split_group_consistent_and_banded():
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.mix import conv_split

    t = pa.table({
        "conv_id": pa.array([f"conv-{i:03d}" for i in range(200)
                             for _ in range(3)]),
        "turn_idx": pa.array([j for _ in range(200) for j in range(3)],
                             pa.int64()),
    })
    out = conv_split(rd.from_arrow(t).repartition(4)).to_pandas()
    # every turn of a conv gets the same split
    assert (out.groupby("conv_id")["split"].nunique() == 1).all()
    frac = out.drop_duplicates("conv_id")["split"].value_counts(normalize=True)
    assert frac.get("train", 0) > 0.8  # ~90/5/5 bands
    assert set(out.split) <= {"train", "val", "test"}
