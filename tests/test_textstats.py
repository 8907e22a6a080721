"""Text-analysis tests: langid on handcrafted texts, BPE counts vs re,
fingerprint determinism."""

import re

import pytest

import pyarrow as pa

import ray.data as rd

from rotel_ray.stages.textstats import (
    BPE_PATTERN,
    _winnow_fingerprint,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count_bpe,
)


def _docs(texts):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    )


def test_lang_id_heuristic():
    texts = [
        "the cat and the dog sat in the garden of the house",
        "der hund und die katze, das ist gut und der tag ist lang",
        "le chat et le chien et les oiseaux des villes",
        "el gato y los perros y las casas, es una historia",
        "你好世界 这是中文",
        "zzz qqq xxx",
    ]
    out = lang_id(_docs(texts)).to_pandas().sort_values("doc_id")
    assert list(out.lang_pred) == ["en", "de", "fr", "es", "zh", "und"]
    assert out.iloc[0].score_en > 0 and out.iloc[5].score_en == 0


def test_token_count_bpe_matches_re():
    texts = ["hello, world! it's 42 degrees", "  spaced   out  ", ""]
    out = token_count_bpe(_docs(texts)).to_pandas().sort_values("doc_id")
    for i, x in enumerate(texts):
        assert out.iloc[i].n_bpe_tokens == len(re.findall(BPE_PATTERN, x))
        assert out.iloc[i].n_ws_tokens == len(x.split())
        assert out.iloc[i].n_chars == len(x)


def test_fingerprint_deterministic_and_discriminative():
    a = "the quick brown fox jumps over the lazy dog"
    b = "a completely different sentence with other words"
    assert _winnow_fingerprint(a) == _winnow_fingerprint(a)
    assert _winnow_fingerprint(a) != _winnow_fingerprint(b)
    out = doc_fingerprint(_docs([a, a, b])).to_pandas().sort_values("doc_id")
    fps = list(out.fingerprint)
    assert fps[0] == fps[1] != fps[2]
    assert all(f >= 0 for f in fps)


def test_quality_score_features():
    out = quality_score(_docs(["the cat!!", "abc"])).to_pandas().sort_values("doc_id")
    r0 = out.iloc[0]
    assert r0.n_chars == 9 and r0.n_tokens == 2
    assert r0.punct_ratio == 2 / 9
    assert r0.stopword_ratio == 1 / 2
    r1 = out.iloc[1]
    assert r1.punct_ratio == 0.0 and r1.stopword_ratio == 0.0


def test_repetition_stats_vs_bruteforce():
    from rotel_ray.stages.textstats import repetition_stats

    docs = [
        "a a a a a",                      # 3 identical 3-grams, 4 identical 2-grams
        "one two three four five",       # all distinct
        "x y x y x y x y",               # alternating
        "solo",                          # < 2 tokens
        "",                              # empty
        "pair pair",                     # exactly one 2-gram, no 3-gram
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    res = repetition_stats(rd.from_arrow(t)).to_pandas().sort_values("doc_id")

    def brute(text):
        tk = text.split()
        g3 = [" ".join(tk[i:i+3]) for i in range(len(tk) - 2)] if len(tk) >= 3 else []
        g2 = [" ".join(tk[i:i+2]) for i in range(len(tk) - 1)] if len(tk) >= 2 else []
        rep3 = 1.0 - len(set(g3)) / len(g3) if g3 else 0.0
        top2 = max(g2.count(x) for x in set(g2)) / len(g2) if g2 else 0.0
        return len(tk), rep3, top2

    for i, text in enumerate(docs):
        n, rep3, top2 = brute(text)
        row = res[res.doc_id == i].iloc[0]
        assert row.n_tokens == n
        assert row.rep_3gram == pytest.approx(rep3)
        assert row.top_2gram_frac == pytest.approx(top2), (i, text)


def test_unigram_logprob_top_v_oov(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.textstats import unigram_logprob

    # corpus: 'a' x7, 'b' x3, 'c' x1  (total 11)
    rows = {"doc_id": [1, 2, 3],
            "text": ["a a a b", "a a b b a", "a c"]}
    ds = ray.data.from_arrow(pa.table(rows))
    out = unigram_logprob(ds, top_v=2).to_pandas().set_index("doc_id")
    la = int(np.floor(np.log(7 / 11) * 1e6))
    lb = int(np.floor(np.log(3 / 11) * 1e6))
    oov = int(np.floor(np.log(1 / 11) * 1e6))  # 'c' evicted by top_v=2
    assert out.loc[1, "lp_sum_unat"] == 3 * la + lb and out.loc[1, "n_tokens"] == 4
    assert out.loc[2, "lp_sum_unat"] == 3 * la + 2 * lb
    assert out.loc[3, "lp_sum_unat"] == la + oov


def test_pii_scrub_batch_all_patterns():
    import pyarrow as pa

    from rotel_ray.stages.pii import scrub_batch

    text = pa.array([
        "contact Bob.Smith+x@ex-ample.co.uk or call +1 555 123 4567 now",
        "client 10.1.2.34 retried, peer 192.168.0.1; version 1.2.3 stays",
        "two mails a@b.io c@d.org",
        "",
    ])
    masked, counts = scrub_batch(text)
    assert counts["email"].to_pylist() == [1, 0, 2, 0]
    assert counts["ipv4"].to_pylist() == [0, 2, 0, 0]
    assert counts["phone"].to_pylist() == [1, 0, 0, 0]
    got = masked.to_pylist()
    assert got[0] == "contact [EMAIL] or call [PHONE] now"
    assert got[1] == "client [IP] retried, peer [IP]; version 1.2.3 stays"
    assert got[2] == "two mails [EMAIL] [EMAIL]"
    assert got[3] == ""


def test_pii_scrub_stage_counts_on_original_text(ray_session):
    import pyarrow as pa
    import ray

    from rotel_ray.stages.pii import pii_scrub_stage

    # counts are measured per pattern on the ORIGINAL text, independently:
    # the email's IP-shaped host counts as an ipv4 match too (2 total), even
    # though after email masking only one standalone IP remains to scrub
    ds = ray.data.from_arrow(pa.table({
        "id": [1], "text": ["a@10.0.0.9.net and 10.0.0.9"]}))
    out = pii_scrub_stage(ds, keep_cols=["id", "text"]).to_pandas()
    assert out.loc[0, "n_email"] == 1 and out.loc[0, "n_ipv4"] == 2
    assert out.loc[0, "text"] == "[EMAIL] and [IP]"


def test_dsir_weights_prefer_target_like_docs(ray_session):
    import pyarrow as pa
    import ray

    from rotel_ray.stages.textstats import dsir_weights

    target_texts = ["the quick brown fox jumps"] * 8
    noise_texts = ["zzz qqq kkk vvv www"] * 8
    rows = pa.table({
        "doc_id": list(range(18)),
        "text": target_texts[:1] + noise_texts[:1] + target_texts + noise_texts,
    })
    full = ray.data.from_arrow(rows)
    # target distribution: the fox docs
    tgt = ray.data.from_arrow(pa.table({"text": target_texts}))
    out = dsir_weights(full, tgt, shuffle_buckets=2).to_pandas().set_index("doc_id")
    # doc 0 (target-like) must weigh strictly more than doc 1 (noise)
    assert out.loc[0, "w_unat"] > out.loc[1, "w_unat"]
    assert (out.n_feats == 9).all()  # 5 unigrams + 4 bigrams each


def test_bigram_logprob_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.textstats import bigram_logprob

    # corpus: doc1 "a b a", doc2 "b a"
    # c1: a=3, b=2, total=5, V=2; c2: (a,b)=1, (b,a)=2
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["a b a", "b a"]}))
    out = bigram_logprob(ds, num_buckets=2).to_pandas().set_index("doc_id")

    def mn(x):
        return int(np.floor(np.log(x) * 1e6))

    lp1 = mn(3 / 5.0) + mn((1 + 1.0) / (3 + 2.0)) + mn((2 + 1.0) / (2 + 2.0))
    lp2 = mn(2 / 5.0) + mn((2 + 1.0) / (2 + 2.0))
    assert out.loc[1, "lp_unat"] == lp1 and out.loc[1, "n_tokens"] == 3
    assert out.loc[2, "lp_unat"] == lp2 and out.loc[2, "n_tokens"] == 2


def test_normalized_dedup_catches_case_and_whitespace_variants(ray_session):
    import pyarrow as pa
    import ray

    from rotel_ray.stages.textstats import normalized_dedup

    ds = ray.data.from_arrow(pa.table({
        "conv_id": ["c1", "c2", "c3", "c4"],
        "turn_idx": [0, 0, 0, 0],
        "text": ["Hello  World", "hello world", "  HELLO\tWORLD ", "other"]}))
    out = (normalized_dedup(ds, key_cols=["conv_id", "turn_idx"], num_buckets=4)
           .to_pandas().sort_values("n_dups", ascending=False))
    assert len(out) == 2
    assert out.iloc[0].n_dups == 3 and out.iloc[0].keep_key == "c1#0"
    assert out.iloc[1].n_dups == 1


def test_hashed_classifier_vs_bruteforce(ray_session):
    from rotel_ray.stages.dedup import _fnv1a
    from rotel_ray.stages.textstats import CLF_BIAS, CLF_DIM, _clf_weights, hashed_classifier

    texts = [
        "the quick brown fox the quick",   # repeated tokens accumulate
        "",                                 # zero tokens -> score = bias
        "   ",                              # whitespace-only -> zero tokens
        "naïve café über",                  # multi-byte UTF-8
        "a b c d e f g h i j k l m n o p",
    ]
    out = hashed_classifier(_docs(texts)).to_pandas().sort_values("doc_id")
    w = _clf_weights()
    for i, text in enumerate(texts):
        toks = text.split()
        want = CLF_BIAS + sum(int(w[_fnv1a(t) % CLF_DIM]) for t in toks)
        row = out.iloc[i]
        assert row.n_tokens == len(toks)
        assert row.score == want
        assert bool(row.keep) == (want > 0)


def test_collocations_vs_bruteforce(ray_session):
    import math
    from collections import Counter

    import numpy as np

    from rotel_ray.stages.textstats import collocations

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(2, 40)))
             for _ in range(120)] + ["", "solo"]
    out = collocations(_docs(texts), k=20, min_count=3).to_pandas()

    uni, big = Counter(), Counter()
    for tx in texts:
        tk = tx.split()
        uni.update(tk)
        big.update(zip(tk[:-1], tk[1:]))
    n1, n2 = sum(uni.values()), sum(big.values())
    ref = []
    for (a, b), c2 in big.items():
        if c2 >= 3:
            pmi = (math.log(c2 / n2) - math.log(uni[a] / n1)
                   - math.log(uni[b] / n1))
            ref.append((math.floor(pmi * 1e6), a, b, c2))
    ref.sort(key=lambda r: (-r[0], r[1], r[2]))
    ref = ref[:20]
    got = [(int(r.pmi_unat), r.w1, r.w2, int(r.n)) for r in out.itertuples()]
    assert got == [(p, a, b, c) for p, a, b, c in ref]


def test_top_v_counts_distributed_selection(ray_session):
    """>top_v distinct keys: the driver-visible result is exactly the
    brute-force top-V by (count desc, key asc) and never exceeds top_v."""
    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.textstats import top_v_counts

    rng = np.random.default_rng(11)
    keys = [f"t{i:04d}" for i in range(500)]
    cnts = rng.integers(1, 40, 500)  # many count ties -> key tie-break matters
    tbl = pa.table({"tok": keys, "c": cnts.astype("int64")})
    ds = ray.data.from_arrow(tbl).repartition(8)
    rows = top_v_counts(ds, key_col="tok", count_col="c", top_v=50).take_all()
    assert len(rows) == 50
    got = [(r["tok"], r["c"]) for r in rows]
    want = sorted(zip(keys, cnts.tolist()), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert sorted(got) == sorted(want)


def test_tfidf_topk_binding_top_v(ray_session):
    """top_v smaller than the vocab: only the top-V df terms are scored."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.textstats import tfidf_topk

    rng = np.random.default_rng(3)
    vocab = [f"w{i:03d}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
             for _ in range(80)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    out = tfidf_topk(ds, k=3, top_v=20).to_pandas()

    docs = [t.split() for t in texts]
    df = {}
    for d in docs:
        for tok in set(d):
            df[tok] = df.get(tok, 0) + 1
    keep = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    idf = {t: int(math.floor(math.log(len(docs) / c) * 1e6)) for t, c in keep}
    expect = []
    for i, d in enumerate(docs):
        tf = {}
        for tok in d:
            if tok in idf:
                tf[tok] = tf.get(tok, 0) + 1
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1] * idf[kv[0]], kv[0]))
        for tok, c in ranked[:3]:
            expect.append((i, tok, c, c * idf[tok]))
    got = sorted(map(tuple, out[["doc_id", "tok", "tf", "score"]].values))
    assert got == sorted(expect)


def test_collocations_join_path_matches_broadcast(ray_session):
    """broadcast_limit=0 forces the co-partitioned-join plan; results must
    be identical to the broadcast plan (same float expression both ways)."""
    import numpy as np

    from rotel_ray.stages.textstats import collocations

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(2, 40)))
             for _ in range(120)] + ["", "solo"]
    a = collocations(_docs(texts), k=20, min_count=3).to_pandas()
    b = collocations(_docs(texts), k=20, min_count=3,
                     broadcast_limit=0).to_pandas()
    va = [tuple(r) for r in a[["w1", "w2", "n", "pmi_unat"]].values]
    vb = [tuple(r) for r in b[["w1", "w2", "n", "pmi_unat"]].values]
    assert va == vb


def test_inverted_index_truncation_and_exact_df(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import inverted_index

    texts = ["hot common a", "hot common b", "hot c", "hot d", "rare e"]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(5)),
                                 "text": texts})).repartition(3)
    out = inverted_index(ds, max_postings=2).to_pandas().set_index("token")
    assert out.loc["hot", "df"] == 4            # df stays exact
    assert out.loc["hot", "postings"] == "0,1"  # first 2 ids ascending
    assert bool(out.loc["hot", "truncated"])
    assert out.loc["rare", "postings"] == "4"
    assert not bool(out.loc["rare", "truncated"])
    full = inverted_index(ds).to_pandas().set_index("token")
    assert full.loc["hot", "postings"] == "0,1,2,3"
    assert not full["truncated"].any()


def test_vocab_growth_matches_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import vocab_growth

    texts = ["a b c", "a d", "e", "f g a", "h", "i j", "k"]
    t = pa.table({"doc_id": pa.array(range(7), pa.int64()),
                  "text": pa.array(texts)})
    out = {r["prefix_docs"]: r["vocab_size"]
           for r in vocab_growth(rd.from_arrow(t).repartition(3)).take_all()}
    # brute force: distinct tokens among docs with doc_id < P
    for p in (1, 2, 4, 7):
        vocab = set()
        for i in range(p):
            vocab |= set(texts[i].split())
        assert out[p] == len(vocab), p
    assert set(out) == {1, 2, 4, 7}


def test_vocab_growth_empty_first_docs_match_oracle():
    """Zero-vocabulary prefixes (earliest docs empty) must agree between the
    engine (always emits every prefix row) and the oracle SQL (LEFT JOIN +
    null-safe count — a plain JOIN drops the zero rows)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.queries import oracle_sql
    from rotel_ray.stages.textstats import vocab_growth

    texts = ["", "  ", "a b", "c", "", "d e f", "g"]
    t = pa.table({"doc_id": pa.array(range(7), pa.int64()),
                  "text": pa.array(texts)})
    got = sorted((r["prefix_docs"], r["vocab_size"])
                 for r in vocab_growth(rd.from_arrow(t).repartition(2)).take_all())
    con = duckdb.connect()
    con.register("documents", t)
    sql = oracle_sql("/root/testdata/sf0.001")["vocab_growth"]
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
    assert got[0] == (1, 0) and got[1] == (2, 0)  # the zero rows exist


def test_vocab_growth_monotone_and_total():
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import vocab_growth

    # 8 docs: n_docs a power of two -> last prefix deduplicates
    t = pa.table({"doc_id": pa.array(range(8), pa.int64()),
                  "text": pa.array([f"w{i} shared" for i in range(8)])})
    rows = sorted((r["prefix_docs"], r["vocab_size"])
                  for r in vocab_growth(rd.from_arrow(t)).take_all())
    assert [p for p, _ in rows] == [1, 2, 4, 8]
    sizes = [v for _, v in rows]
    assert sizes == sorted(sizes) and sizes[-1] == 9  # 8 uniques + 'shared'


def test_char_entropy_bruteforce():
    import math

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import char_entropy

    texts = ["aab", "zzzz", "", "abcd", None]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = {r["doc_id"]: (r["n_chars"], r["ent_unat"])
           for r in char_entropy(rd.from_arrow(t)).take_all()}
    assert set(out) == {0, 1, 3}  # empty + null docs drop
    def brute(s):
        from collections import Counter
        n = len(s)
        return sum(c * math.floor(math.log(n / c) * 1e6)
                   for c in Counter(s).values())
    assert out[0] == (3, brute("aab"))
    assert out[1] == (4, 0)          # uniform single char -> zero entropy
    assert out[3] == (4, brute("abcd"))


def test_nfc_ascii_fast_path():
    """Pure-ASCII columns return unchanged (identity — zero per-row
    Python); mixed columns normalize only the non-ASCII rows."""
    import pyarrow as pa

    from rotel_ray.stages.clean import _nfc_column

    ascii_col = pa.array(["abc", "def", None])
    assert _nfc_column(ascii_col) is ascii_col
    mixed = pa.array(["plain", "Café", None, "ok"])
    out = _nfc_column(mixed).to_pylist()
    assert out == ["plain", "Café", None, "ok"]


def test_ppl_buckets_rank_semantics():
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import ppl_buckets

    # source A: 5 docs of clearly different unigram quality (common vs rare
    # tokens); source B: 2 docs. Rank tertiles: 5 -> [0,0,1,1,2], 2 -> [0,1].
    texts = ["c c c c", "c c c r1", "c c r2 r3", "c r4 r5 r6", "r7 r8 r9 r10",
             "c c c c", "r11 r12 r13 r14"]
    src = ["A"] * 5 + ["B"] * 2
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(7), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(src, pa.string())}))
    out = ppl_buckets(ds, num_buckets=4).to_pandas()
    a = out[out.source == "A"].sort_values("per_tok_unat", ascending=False)
    assert a.ppl_bucket.tolist() == [0, 0, 1, 1, 2]
    # best-scoring doc in A is the all-common one
    assert a.doc_id.tolist()[0] == 0
    b = out[out.source == "B"].sort_values("per_tok_unat", ascending=False)
    assert b.ppl_bucket.tolist() == [0, 1]
    assert b.doc_id.tolist() == [5, 6]


def test_zipf_slope_matches_reference():
    import math

    import ray.data as rd
    from rotel_ray.stages.textstats import zipf_slope

    # counts: a=6, b=3, c=2, d=1 -> pure-python reference regression over
    # milli-nat quantized (ln rank, ln freq)
    docs = ["a a a b b c", "a a a b c d"]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)}))
    got = zipf_slope(ds, top_n=256)
    cs = [6, 3, 2, 1]
    y = [math.floor(math.log(c) * 1e3) for c in cs]
    x = [math.floor(math.log(r) * 1e3) for r in range(1, 5)]
    n = 4
    sx, sy = sum(x), sum(y)
    sxy, sxx = sum(a * b for a, b in zip(x, y)), sum(a * a for a in x)
    exp = math.floor(1e6 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
    assert got.n_tokens.tolist() == [4]
    assert got.slope_micro.tolist() == [exp]
    assert -1_400_000 < exp < -800_000  # Zipf-ish: slope near -1


def test_oov_rate_counts_out_of_vocab_tokens():
    from rotel_ray.stages.textstats import oov_rate

    # corpus counts: a=5, b=3, c=2, z=1 -> top-2 vocab = {a, b}
    docs = ["a a a b b", "a a b c c z"]
    srcs = ["s1", "s2"]
    ds = rd.from_arrow(pa.table({"source": pa.array(srcs),
                                 "text": pa.array(docs)}))
    got = (oov_rate(ds, vocab_size=2, num_buckets=4).to_pandas()
           .sort_values("source").reset_index(drop=True))
    assert got.source.tolist() == ["s1", "s2"]
    assert got.n_tokens.tolist() == [5, 6]
    assert got.n_oov.tolist() == [0, 3]  # c c z


def test_typo_pairs_fastss_filter_is_complete():
    """Every pair within distance 2 is found (FastSS completeness) and no
    pair beyond 2 survives verification — checked against a brute-force
    DP over a vocabulary with planted typos, transpositions and an
    unrelated word."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import typo_pairs

    words = ["kitten", "sitten", "sitting", "mitten", "kitchen",
             "apple", "appel", "aple", "zebra"]
    docs = [" ".join(words), "kitten apple zebra"]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(2)
    out = (typo_pairs(ds, max_dist=2, min_len=3, num_buckets=4)
           .to_pandas())
    got = {(r.tok_a, r.tok_b): r.dist for r in out.itertuples()}

    def ed(x, y):
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i] + [0] * len(y)
            for j, cy in enumerate(y, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (cx != cy))
            prev = cur
        return prev[-1]

    want = {(a, b): ed(a, b) for a, b in
            itertools.combinations(sorted(set(words)), 2) if ed(a, b) <= 2}
    assert got == want
    assert ("appel", "apple") in got and got[("appel", "apple")] == 2
    assert all(v <= 2 for v in got.values())


def test_token_canonical_clusters(ray_session):
    """Typo clusters label every member with the lexicographically
    smallest token (appel < apple < apples)."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import token_canonical

    docs = ["apple appel apples banana bananna",
            "apple banana zebra unrelatedword"]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)}))
    out = (token_canonical(ds, num_buckets=4).to_pandas()
           .set_index("tok")["canonical"].sort_index())
    got = out.to_dict()
    assert got["apple"] == "appel" and got["appel"] == "appel"
    assert got["apples"] == "appel"
    assert got["banana"] == "banana" and got["bananna"] == "banana"
    assert "zebra" not in got  # no near-spelling partner -> not in the graph


def test_script_mix_width_classes(ray_session):
    """Mixed-width strings classify by UTF-8 lead byte: ASCII, 2-byte
    (é), 3-byte (zero-width + CJK), 4-byte (emoji)."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.clean import script_mix

    texts = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["abcé​\U0001F600", "xy中"])}))
    srcs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "source": pa.array(["s1", "s1"])}))
    out = (script_mix(texts, srcs, num_buckets=2).to_pandas()
           .set_index("source"))
    assert out.loc["s1", "n_docs"] == 2
    assert out.loc["s1", "n_ascii"] == 5   # abc + xy
    assert out.loc["s1", "n_w2"] == 1      # é
    assert out.loc["s1", "n_w3"] == 2      # zero-width space + CJK
    assert out.loc["s1", "n_w4"] == 1      # emoji


def test_fertility_by_lang_ratio(ray_session):
    """en: 2 docs, 3+1 tokens, 15+5 chars -> floor(20e6/4); empty-token
    lang reports ratio 0."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import fertility_by_lang

    t = pa.table({"lang": pa.array(["en", "en", "zz"]),
                  "text": pa.array(["hello big world", "hello", ""])})
    out = (fertility_by_lang(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("lang").sort_index())
    assert out.loc["en", "n_docs"] == 2
    assert out.loc["en", "n_tokens"] == 4
    assert out.loc["en", "n_chars"] == 20
    assert out.loc["en", "chars_per_tok_e6"] == 5_000_000
    assert out.loc["zz", "n_tokens"] == 0
    assert out.loc["zz", "chars_per_tok_e6"] == 0


def test_readability_exact_fields(ray_session):
    """'Hi there. Ok!' -> 3 words, 2 sentence runs, vowel groups i/e-e/o;
    ratios floor-quantized."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import readability

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["Hi there. Ok!", ""])})
    out = (readability(rd.from_arrow(t)).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[0, "n_words"] == 3
    assert out.loc[0, "n_sents"] == 2
    assert out.loc[0, "n_vgroups"] == 4  # i, e-e (2 groups: 'e','e'), o
    assert out.loc[0, "words_per_sent_e3"] == 1500
    assert out.loc[0, "syll_per_word_e3"] == 1333
    assert out.loc[1, "n_words"] == 0
    assert out.loc[1, "syll_per_word_e3"] == 0


def test_length_ks_exact(ray_session):
    """Two sources with disjoint length buckets: KS = max |cdf diff|.
    s1 = lengths 10,10 (bucket 0); s2 = 100,100 (bucket 1). At bucket 0:
    |1.0 - 0.5| = 0.5 for both."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import length_ks

    t = pa.table({"source": pa.array(["s1", "s1", "s2", "s2"]),
                  "n_chars": pa.array([10, 10, 100, 100], pa.int64())})
    out = (length_ks(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("source").sort_index())
    assert out.loc["s1", "n_docs"] == 2 and out.loc["s1", "ks_e6"] == 500_000
    assert out.loc["s2", "n_docs"] == 2 and out.loc["s2", "ks_e6"] == 500_000


def test_trending_tokens_burst(ray_session):
    """Token 'spike' appears 5x on day 1 out of 10 day-1 tokens (share
    0.5) vs 5/40 overall (0.125): 4x lift passes; uniform fillers don't."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import trending_tokens

    D = 86_400_000_000
    texts, ts = [], []
    for day in range(4):
        for _ in range(5):
            texts.append("base filler" if day != 1 else
                         "spike filler" if len(ts) % 5 < 5 else "")
            ts.append(day * D)
    # day 1: 5 docs of "spike filler" (10 tokens, 5 spike); other days:
    # 5 docs of "base filler"
    t = pa.table({"text": pa.array(texts),
                  "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))})
    out = trending_tokens(rd.from_arrow(t), num_buckets=4).to_pandas()
    assert set(out["tok"]) == {"spike"}
    r = out.iloc[0]
    assert r["day"] == 1 and r["n"] == 5
    assert r["share_day_e6"] == 500_000
    assert r["share_all_e6"] == 125_000


def test_hapax_rate_singletons(ray_session):
    """'unique1' appears once globally (hapax); 'common' twice across
    roles (not hapax even though once per role)."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import hapax_rate

    t = pa.table({"role": pa.array(["u", "a"]),
                  "text": pa.array(["common unique1", "common xx xx"])})
    out = (hapax_rate(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("role").sort_index())
    assert out.loc["u", "n_tokens"] == 2 and out.loc["u", "n_hapax"] == 1
    assert out.loc["u", "hapax_e6"] == 500_000
    assert out.loc["a", "n_tokens"] == 3 and out.loc["a", "n_hapax"] == 0


def test_lang_script_check_combos(ray_session):
    """CJK-bearing doc counts under has_cjk=1 regardless of the winning
    language; pure-ASCII English counts under (en, 0)."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import lang_script_check

    docs = ["the and of to in the",            # en, no CJK
            "中文中文中文",                      # zh, CJK
            "the and 中文"]                     # en markers beat 1 CJK? 2 vs 2 -> en (first max)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                                 "text": pa.array(docs)}))
    out = (lang_script_check(ds, num_buckets=2).to_pandas()
           .set_index(["lang_pred", "has_cjk"]).sort_index())
    assert out.loc[("en", 0), "n_docs"] == 1
    assert out.loc[("zh", 1), "n_docs"] == 1


def test_winnow_matches_planted_copy(ray_session):
    """Two near-identical long docs share winnow fingerprints; an
    unrelated doc pairs with neither; the boilerplate cap drops hashes
    shared by too many docs."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import winnow_matches

    base = "the quick brown fox jumps over the lazy dog " * 20
    docs = [base + "alpha ending one",
            base + "omega ending two",          # near-copy of doc 0
            "completely different content " * 25]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(docs)}))
    out = winnow_matches(ds, k=16, w=8, max_docs_per_hash=8,
                         min_shared=3, num_buckets=2).to_pandas()
    assert set(map(tuple, out[["doc_a", "doc_b"]].values)) == {(0, 1)}
    assert (out["n_shared"] >= 3).all()
    # cap=1 drops every shared hash -> no pairs survive
    out_cap = winnow_matches(ds, k=16, w=8, max_docs_per_hash=1,
                             min_shared=1, num_buckets=2).to_pandas()
    assert len(out_cap) == 0


def test_pii_density_rates(ray_session):
    """Role a: one email + one ip in 100 chars -> pii_e9 = 2e9/100;
    role b clean."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.pii import pii_density

    ta = ("contact bob@example.com from 10.0.0.1 " + "x" * 62)[:100]
    t = pa.table({"role": pa.array(["a", "b"]),
                  "text": pa.array([ta, "clean text here"])})
    out = (pii_density(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("role").sort_index())
    assert out.loc["a", "n_email"] == 1 and out.loc["a", "n_ipv4"] == 1
    assert out.loc["a", "n_chars"] == 100
    assert out.loc["a", "pii_e9"] == 2 * 1_000_000_000 // 100
    assert out.loc["b", "pii_e9"] == 0 and out.loc["b", "n_phone"] == 0


def test_doc_vectors_hashing(ray_session):
    """Repeated tokens sum into one dim; dims follow md5 % 32; empty
    docs emit nothing."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import doc_vectors

    h = lambda tok: int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % 32
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["foo bar foo", ""])}))
    out = doc_vectors(ds, dims=32).to_pandas()
    got = {(r.doc_id, r.dim): r.tf for r in out.itertuples()}
    assert got[(0, h("foo"))] == 2
    assert got[(0, h("bar"))] == 1
    assert len(out) == (1 if h("foo") == h("bar") else 2)


def test_length_gini_extremes(ray_session):
    """Uniform lengths -> gini 0; maximal concentration -> near 1e6."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.textstats import length_gini

    uni = ["a b c"] * 4                          # all length 3
    conc = ["w"] * 3 + ["x " * 500]              # one giant doc
    t = pa.table({"source": pa.array(["u"] * 4 + ["c"] * 4),
                  "text": pa.array(uni + conc)})
    out = (length_gini(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("source"))
    assert out.loc["u", "gini_e6"] == 0
    # concentrated: v = [1,1,1,500]; S1=1+2+3+2000; T=503; n=4
    s1, tt, n = 1 + 2 + 3 + 4 * 500, 503, 4
    assert out.loc["c", "gini_e6"] == (2 * s1 - (n + 1) * tt) * 10**6 // (n * tt)
