"""BPE kernels vs pure-Python references (incl. UTF-8 and a==b run greedy)."""
from collections import Counter

import numpy as np
import pyarrow as pa


def _ref_pair_counts(tokens):
    c = Counter()
    for w in tokens:
        bs = w.encode()
        for i in range(len(bs) - 1):
            c[(bs[i], bs[i + 1])] += 1
    return c


def _ref_merge(syms, a, b, nid):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(nid)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_pair_counts_batch_matches_reference_incl_utf8():
    from rotel_ray.stages.bpe import pair_counts_batch

    toks = ["hello", "aaaa", "ab", "x", "héllo", "banana", "日本"]
    counts = pair_counts_batch(pa.array(toks))
    got = {(k >> 8, k & 255): int(v) for k, v in enumerate(counts) if v}
    assert got == dict(_ref_pair_counts(toks))


def test_apply_merge_randomized_vs_greedy_reference():
    from rotel_ray.stages.bpe import _apply_merge_np

    rng = np.random.default_rng(7)
    for _ in range(300):
        words = [list(rng.integers(0, 4, rng.integers(1, 9)))
                 for _ in range(rng.integers(1, 6))]
        a, b = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        flat = np.array([s for w in words for s in w], dtype=np.int64)
        offs = np.cumsum([0] + [len(w) for w in words]).astype(np.int64)
        nf, no = _apply_merge_np(flat, offs, a, b, 99)
        ref_words = [_ref_merge(w, a, b, 99) for w in words]
        assert list(nf) == [s for w in ref_words for s in w]
        assert list(no) == list(np.cumsum([0] + [len(w) for w in ref_words]))


def _ref_bpe_train(texts, num_merges):
    """Sennrich-style reference: word freqs, overlap-counting get_stats,
    greedy leftmost merge application, (n desc, pair asc) tie-break."""
    words = Counter()
    for t in texts:
        for w in t.split():
            words[tuple(w.encode())] += 1
    merges = []
    for r in range(num_merges):
        stats = Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        (a, b), n = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        nid = 256 + r
        merges.append((r, a, b, n, nid))
        words = Counter({tuple(_ref_merge(list(s), a, b, nid)): f
                         for s, f in words.items()})
    return merges


def test_bpe_train_end_to_end_vs_reference(ray_session):
    import ray

    from rotel_ray.stages.bpe import bpe_train

    texts = ["the cat sat on the mat", "the cat ate", "aaaa aaaa banana",
             "mat the the", "banana band and sand"] * 3
    ds = ray.data.from_arrow(pa.table({"text": texts}))
    out = bpe_train(ds, num_merges=6).to_pandas().sort_values("rank")
    got = [tuple(int(x) for x in row)
           for row in out[["rank", "b1", "b2", "n", "new_id"]].itertuples(index=False)]
    assert got == _ref_bpe_train(texts, 6)


def test_bpe_encode_vs_reference(ray_session):
    import ray.data as rd

    from rotel_ray.stages.bpe import bpe_encode

    texts = [
        "aaaa aa aaa",                 # a==b run-parity merges
        "hello hello world",
        "",                            # empty doc mid-batch
        "naïve café",                  # multi-byte UTF-8
        "ab ab ab ab",
        "   ",                         # whitespace-only doc at batch END (reduceat trap)
    ]
    merges = [(97, 97, 256), (256, 256, 257), (104, 101, 258), (97, 98, 259)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    out = bpe_encode(ds, merges).to_pandas().sort_values("doc_id")

    for i, text in enumerate(texts):
        syms = []
        for w in text.split():
            s = list(w.encode())
            for a, b, nid in merges:
                s = _ref_merge(s, a, b, nid)
            syms.extend(s)
        row = out.iloc[i]
        assert row.n_tokens == len(syms)
        assert row.sym_sum == sum(syms)
        assert row.pos_weighted == sum((p + 1) * v for p, v in enumerate(syms))
