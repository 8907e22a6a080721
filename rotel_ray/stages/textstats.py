"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline text ops, all vectorized over Arrow string columns
(RE2 kernels via ``pyarrow.compute``; zero per-row Python in the hot path
except the winnowing fingerprint, which is numpy per doc):

- ``lang_id``          — marker-word n-gram heuristic: per-language match
                         counts -> argmax with a fixed tie order. The scoring
                         is deliberately RE2-expressible so the DuckDB oracle
                         mirrors it exactly.
- ``token_count_bpe``  — BPE-ish pre-tokenizer regex (GPT-2-style word /
                         number / punctuation / whitespace classes) +
                         whitespace token count + char count.
- ``doc_fingerprint``  — winnowing document fingerprint (Schleimer et al.,
                         SIGMOD'03): k-gram rolling hashes, min per sliding
                         window, FNV-combined to one 64-bit fingerprint.
- ``quality_score``    — length / punctuation / stopword-ratio features.

The reference has no text-analysis ops; these are additive (task brief).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .tokenize import split_tokens

# ---------------------------------------------------------------------------
# language ID
# ---------------------------------------------------------------------------

# fixed evaluation order = tie-break order (first max wins)
LANG_MARKERS: list[tuple[str, str]] = [
    ("en", r"\b(the|and|of|to|in)\b"),
    ("de", r"\b(der|die|und|das|ist)\b"),
    ("fr", r"\b(le|la|et|les|des)\b"),
    ("es", r"\b(el|los|las|es|una)\b"),
    ("zh", r"[\x{4e00}-\x{9fff}]"),
]


def lang_scores(text: pa.Array) -> dict[str, pa.Array]:
    return {
        lang: pc.cast(pc.count_substring_regex(text, pattern), pa.int64())
        for lang, pattern in LANG_MARKERS
    }


def lang_id_batch(t: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    text = t.column(text_col).combine_chunks()
    scores = lang_scores(text)
    mat = np.stack([scores[lang].to_numpy() for lang, _ in LANG_MARKERS])  # (L, n)
    best = mat.argmax(axis=0)  # first max wins (fixed order)
    langs = np.array([lang for lang, _ in LANG_MARKERS], dtype=object)[best]
    langs[mat.max(axis=0) == 0] = "und"
    out = {id_col: t.column(id_col), "lang_pred": pa.array(langs, pa.string())}
    for lang, _ in LANG_MARKERS:
        out[f"score_{lang}"] = scores[lang]
    return pa.table(out)


def lang_id(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda t: lang_id_batch(t, text_col, id_col), batch_format="pyarrow", zero_copy_batch=True
    )


def lang_id_oracle_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB SQL mirroring lang_id_batch exactly (same RE2 patterns, same
    first-max-wins tie order)."""
    score_exprs = {
        lang: f"CAST(len(regexp_extract_all({text_col}, '{pat}')) AS BIGINT)"
        for lang, pat in LANG_MARKERS
    }
    langs = [lang for lang, _ in LANG_MARKERS]
    case = "CASE WHEN " + " + ".join(f"s_{l}" for l in langs) + " = 0 THEN 'und'"
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= s_{other}" for other in langs[i + 1:]]
        prior = [f"s_{lang} > s_{other}" for other in langs[:i]]
        allc = prior + conds
        case += f" WHEN {' AND '.join(allc) if allc else 'TRUE'} THEN '{lang}'"
    case += " END"
    inner = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score_exprs.items())
    outer_scores = ", ".join(f"s_{l} AS score_{l}" for l in langs)
    return f"""
        SELECT {id_col}, {case} AS lang_pred, {outer_scores}
        FROM (SELECT {id_col}, {inner} FROM {table})"""


# ---------------------------------------------------------------------------
# BPE-ish token counting
# ---------------------------------------------------------------------------

# GPT-2-style pre-tokenizer classes, RE2-compatible (no lookahead):
# contractions | optional-space word | optional-space number |
# optional-space punctuation run | whitespace run
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"


def token_count_bpe(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    def f(t: pa.Table) -> pa.Table:
        text = t.column(text_col).combine_chunks()
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_bpe_tokens": pc.cast(pc.count_substring_regex(text, BPE_PATTERN), pa.int64()),
                "n_ws_tokens": pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# winnowing fingerprint
# ---------------------------------------------------------------------------


def _winnow_fingerprint(text: str, k: int = 5, w: int = 4) -> int:
    """Winnowing: rolling FNV hash of each k-char gram, min per w-window,
    distinct mins FNV-combined in order -> one int64 fingerprint."""
    data = text.encode()
    n = len(data)
    if n < k:
        grams = np.array([_fnv_bytes(data)], dtype=np.uint64)
    else:
        # vectorized k-gram hashing: polynomial over byte columns
        arr = np.frombuffer(data, dtype=np.uint8)
        P = np.uint64(1_099_511_628_211)
        acc = np.full(n - k + 1, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
        for j in range(k):
            acc = (acc ^ arr[j : n - k + 1 + j].astype(np.uint64)) * P
        grams = acc
    if len(grams) <= w:
        mins = np.array([grams.min()], dtype=np.uint64)
    else:
        from numpy.lib.stride_tricks import sliding_window_view

        wins = sliding_window_view(grams, w).min(axis=1)
        # keep positions where the window min changes (standard winnowing set)
        keep = np.ones(len(wins), dtype=bool)
        keep[1:] = wins[1:] != wins[:-1]
        mins = wins[keep]
    h = 0xCBF29CE484222325
    for m in mins:
        h = ((h ^ int(m)) * 1_099_511_628_211) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


def _fnv_bytes(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def doc_fingerprint(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 5, w: int = 4):
    """Per-doc winnowing fingerprint. Stateless (k/w live in the task
    closure), so it runs task-mode and fuses with the read — the round-3
    stateless-stage rule; the old actor-pool form also carried the
    ctor-args-in-object-store restart hazard (ray#53727)."""

    def fingerprint(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        fps = np.fromiter(
            (_winnow_fingerprint(x or "", k, w) for x in texts),
            dtype=np.int64,
            count=len(texts),
        )
        return pa.table({id_col: t.column(id_col), "fingerprint": pa.array(fps)})

    return ds.map_batches(fingerprint, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

STOPWORDS_PATTERN = r"\b(the|a|an|and|or|of|to|in|is|it)\b"


def quality_score(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Length / punctuation / stopword-ratio features (RE2-expressible so the
    oracle mirrors)."""

    def f(t: pa.Table) -> pa.Table:
        text = t.column(text_col).combine_chunks()
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        denom = pc.max_element_wise(n_chars, 1.0)
        toks = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.float64())
        tok_denom = pc.max_element_wise(toks, 1.0)
        punct = pc.cast(pc.count_substring_regex(text, r"[^\sA-Za-z0-9]"), pa.float64())
        stop = pc.cast(pc.count_substring_regex(text, STOPWORDS_PATTERN), pa.float64())
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_tokens": pc.cast(toks, pa.int64()),
                "punct_ratio": pc.divide(punct, denom),
                "stopword_ratio": pc.divide(stop, tok_denom),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def repetition_stats(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition quality signals per document (Rae et al. 2021
    §A1.1 repetition filters — public paper; the reference engine has no
    text-quality machinery):

    - ``rep_3gram``       = 1 - distinct 3-grams / total 3-grams (0 when the
                            doc has < 3 tokens),
    - ``top_2gram_frac``  = occurrences of the most frequent 2-gram / total
                            2-grams (0 when < 2 tokens).

    Fully vectorized per batch: one flat n-gram hash stream for the whole
    batch (shared rolling-poly kernel of the minhash path), lexsort by
    (doc, value), run-length segment scan — no per-row Python."""
    from .dedup import _batch_shingle_stream, _batch_token_hashes

    def per_k(text: pa.Array, tok_counts: np.ndarray, k: int):
        vals, cnts = _batch_shingle_stream(text, k)
        ndoc = len(cnts)
        seg = np.repeat(np.arange(ndoc), cnts)
        order = np.lexsort((vals, seg))
        sv, ss = vals[order], seg[order]
        if len(sv):
            newrun = np.r_[True, (sv[1:] != sv[:-1]) | (ss[1:] != ss[:-1])]
            distinct = np.bincount(ss[newrun], minlength=ndoc).astype(np.int64)
            run_starts = np.flatnonzero(newrun)
            run_lens = np.diff(np.r_[run_starts, len(sv)])
            run_seg = ss[run_starts]
            first_run = np.searchsorted(run_seg, np.arange(ndoc))
            has = distinct > 0
            mx = np.zeros(ndoc, np.int64)
            # reduceat only over docs that own >= 1 run (strictly increasing,
            # in-range starts -- the empty-segment clamping trap)
            mx[has] = np.maximum.reduceat(run_lens, first_run[has])
        else:
            distinct = np.zeros(ndoc, np.int64)
            mx = np.zeros(ndoc, np.int64)
        # stream counts for docs with < k tokens are the raw-token fallback
        # of the minhash path -- repetition treats those as "no n-grams"
        total = np.where(tok_counts >= k, cnts, 0).astype(np.float64)
        return distinct.astype(np.float64), mx.astype(np.float64), total

    def f(t: pa.Table) -> pa.Table:
        text = t.column(text_col).combine_chunks()
        _, tok_counts = _batch_token_hashes(text)
        d3, _, tot3 = per_k(text, tok_counts, 3)
        _, mx2, tot2 = per_k(text, tok_counts, 2)
        rep3 = np.where(tot3 > 0, 1.0 - d3 / np.maximum(tot3, 1), 0.0)
        top2 = np.where(tot2 > 0, mx2 / np.maximum(tot2, 1), 0.0)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(tok_counts, pa.int64()),
            "rep_3gram": pa.array(rep3),
            "top_2gram_frac": pa.array(top2),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# unigram-LM quality scoring (CCNet-style perplexity proxy)
# ---------------------------------------------------------------------------


def unigram_counts(ds, *, text_col: str = "text", num_buckets: int = 16):
    """Global token frequency table — phase 1 of the unigram-LM scorer.

    Per-batch combiner (dictionary-encode + bincount -> one (tok, c) row per
    DISTINCT token per batch) feeds the generic two-phase aggregate, so the
    shuffle moves vocab-bounded partials, never the token stream."""
    from .aggregate import two_phase_aggregate

    def partial(t: pa.Table) -> pa.Table:
        flat, _, _ = split_tokens(t.column(text_col))
        d = pc.dictionary_encode(flat)
        cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                          minlength=len(d.dictionary)).astype(np.int64)
        return pa.table({"tok": d.dictionary, "c": pa.array(cnt)})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return two_phase_aggregate(parts, ["tok"], [("c", "sum", "c")],
                               num_buckets=num_buckets)


def top_v_counts(counts, *, key_col: str, count_col: str, top_v: int,
                 batch_size: int | None = None):
    """Distributed top-``top_v`` selection by ``(count desc, key asc)`` over
    a (key, count) table whose keys are GLOBALLY DISTINCT (the output shape
    of :func:`two_phase_aggregate`).

    Scale shape: a stateless per-batch truncation prunes each block to its
    local top-V (the global top-V is contained in the union of per-block
    top-Vs because keys are distinct), then a distributed sort + ``limit``
    picks the winners — the driver never holds more than ``top_v`` rows and
    no task ever sees the full vocabulary.
    """
    def local_top(t: pa.Table) -> pa.Table:
        if t.num_rows <= top_v:
            return t
        idx = pc.sort_indices(t, sort_keys=[(count_col, "descending"),
                                            (key_col, "ascending")])[:top_v]
        return t.take(idx)

    cand = counts.map_batches(local_top, batch_format="pyarrow",
                              zero_copy_batch=True,
                              **({"batch_size": batch_size} if batch_size else {}))
    return cand.sort([count_col, key_col], descending=[True, False]).limit(top_v)


DEFAULT_TOP_V = 1 << 16


def unigram_logprob(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    top_v: int | None = DEFAULT_TOP_V):
    """Per-doc unigram log-probability — the CCNet/importance-sampling
    quality signal (Wenzek et al. 2020 use a KenLM 5-gram; the unigram model
    is its exactly-verifiable core; the reference engine has no corpus
    machinery).

    Scores are integer micro-nats: ``l(tok) = floor(ln(c/total) * 1e6)``
    computed once per vocab entry on the driver, so per-doc sums are exact
    int64 arithmetic — bit-stable across engines and summation orders (the
    float-sum ordering trap). Output: (id_col, n_tokens, lp_sum_unat) for
    every doc with >= 1 token.

    Scale shape: counts are vocab-bounded two-phase partials; ``top_v``
    (default 2^16) caps the broadcast vocabulary via the DISTRIBUTED
    :func:`top_v_counts` selection — kept-out tokens score as OOV =
    floor(ln(1/total) * 1e6) and the driver never materializes more than
    ``top_v`` (tok, c) rows even on an open-vocab corpus; the vocab +
    micro-nat table is broadcast once via ``ray.put``; scoring is one
    stateless map_batches with an Arrow ``index_in`` probe. No token-level
    shuffle anywhere."""
    import ray

    counts = unigram_counts(ds, text_col=text_col).materialize()
    total = int(counts.sum("c"))
    # top-V of a table with <= top_v rows is the identity — skip the extra
    # sort+limit exchange when the materialized vocab is already bounded
    # (count() is metadata-only on a materialized Dataset). Exact at every
    # scale: the truncation only changes results when vocab > top_v.
    if top_v is not None and counts.count() > top_v:
        counts = top_v_counts(counts, key_col="tok", count_col="c", top_v=top_v)
    vocab_rows = counts.take_all()
    toks = np.array([r["tok"] for r in vocab_rows], dtype=object)
    cnts = np.array([r["c"] for r in vocab_rows], dtype=np.int64)
    lp = np.floor(np.log(cnts.astype(np.float64) / total) * 1e6).astype(np.int64)
    oov = np.int64(np.floor(np.log(1.0 / total) * 1e6))
    vocab_arr = pa.array(toks.astype(str))
    ref = ray.put((vocab_arr, lp, oov))

    def score(t: pa.Table) -> pa.Table:
        vocab, lp_l, oov_l = ray.get(ref)
        flat, doc_of, n_tok = split_tokens(t.column(text_col))
        idx = pc.index_in(flat, vocab)
        valid = idx.is_valid().to_numpy(zero_copy_only=False)
        idx_np = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.where(valid, lp_l[idx_np], oov_l)
        sums = np.zeros(len(n_tok), np.int64)
        np.add.at(sums, doc_of, vals)
        m = n_tok > 0
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(ids[m]),
                         "n_tokens": pa.array(n_tok[m]),
                         "lp_sum_unat": pa.array(sums[m])})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# TF-IDF top-k terms per document
# ---------------------------------------------------------------------------


def doc_freq(ds, *, text_col: str = "text", num_buckets: int = 16):
    """Document-frequency table (tok, df) — phase 1 of the TF-IDF scorer.

    Per-batch combiner: dictionary-encode the token stream, collapse to
    DISTINCT (doc, token) pairs with one np.unique over composite keys, emit
    one (tok, df_partial) row per distinct token per batch. The shuffle moves
    vocab-bounded partials only."""
    from .aggregate import two_phase_aggregate

    def partial(t: pa.Table) -> pa.Table:
        flat, doc_of, _ = split_tokens(t.column(text_col))
        d = pc.dictionary_encode(flat)
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(d.dictionary)
        pairs = np.unique(doc_of * v + idx)
        df_cnt = np.bincount(pairs % v, minlength=v).astype(np.int64)
        return pa.table({"tok": d.dictionary, "df": pa.array(df_cnt)})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return two_phase_aggregate(parts, ["tok"], [("df", "sum", "df")],
                               num_buckets=num_buckets)


def tfidf_topk(ds, *, k: int = 5, text_col: str = "text",
               id_col: str = "doc_id", top_v: int | None = DEFAULT_TOP_V):
    """Top-k TF-IDF terms per document, exact-integer scored.

    ``idf(tok) = floor(ln(N / df) * 1e6)`` in micro-nats (int64), computed
    once per vocab entry on the driver; ``score = tf * idf`` is then exact
    int64 arithmetic — bit-stable across engines (same floor-absorbs-ulp
    argument as the unigram scorer). Ties broken by term ascending. Output:
    (id_col, tok, tf, score), k rows per doc (fewer if the doc has < k
    distinct in-vocab terms).

    Scale shape: df partials are vocab-bounded; the vocabulary is capped to
    the ``top_v`` (default 2^16) highest-df terms (ties: term ascending) via
    the DISTRIBUTED :func:`top_v_counts` selection — scikit-learn's
    ``max_features`` semantics — so the driver never holds more than
    ``top_v`` rows even on an open-vocab corpus; out-of-vocab terms are not
    scored. The (vocab, idf) table is broadcast once via ``ray.put``;
    scoring + per-doc top-k is one stateless map_batches with no shuffle."""
    import ray

    n_docs = ds.count()
    dfreq = doc_freq(ds, text_col=text_col).materialize()
    # same identity-skip as unigram_logprob: the top-V selection only
    # changes the vocabulary when vocab > top_v
    if top_v is not None and dfreq.count() > top_v:
        dfreq = top_v_counts(dfreq, key_col="tok", count_col="df", top_v=top_v)
    rows = dfreq.take_all()
    toks = np.array([r["tok"] for r in rows], dtype=str)
    dfs = np.array([r["df"] for r in rows], dtype=np.int64)
    # lexicographic vocab order => dictionary index IS the tie-break rank,
    # so the per-doc top-k sort below runs on integer keys only
    order = np.argsort(toks)
    toks, dfs = toks[order], dfs[order]
    idf = np.floor(np.log(float(n_docs) / dfs) * 1e6).astype(np.int64)
    vocab_ref = ray.put((pa.array(toks), idf))

    def score(t: pa.Table) -> pa.Table:
        vocab, idf_l = ray.get(vocab_ref)
        flat, doc_of, _ = split_tokens(t.column(text_col))
        vid = pc.index_in(flat, vocab)
        valid = vid.is_valid().to_numpy(zero_copy_only=False)
        vid_np = vid.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of, vid_np = doc_of[valid], vid_np[valid]
        v = len(vocab)
        pair, tf = np.unique(doc_of * v + vid_np, return_counts=True)
        p_doc, p_tok = pair // v, pair % v
        sc = tf.astype(np.int64) * idf_l[p_tok]
        order = np.lexsort((p_tok, -sc, p_doc))  # vocab is lex-sorted
        p_doc, p_tok, tf, sc = p_doc[order], p_tok[order], tf[order], sc[order]
        # rank within doc = position minus first-position-of-doc
        first = np.r_[True, p_doc[1:] != p_doc[:-1]]
        pos = np.arange(len(p_doc))
        rank = pos - np.repeat(pos[first], np.diff(np.r_[np.flatnonzero(first), len(p_doc)]))
        m = rank < k
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(ids[p_doc[m]]),
                         "tok": vocab.take(pa.array(p_tok[m])),
                         "tf": pa.array(tf[m].astype(np.int64)),
                         "score": pa.array(sc[m])})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# DSIR importance weighting (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling")
# ---------------------------------------------------------------------------


DSIR_BUCKETS = 1024


def _dsir_features(text: pa.Array | pa.ChunkedArray,
                   num_buckets: int = DSIR_BUCKETS):
    """Hashed unigram+bigram feature buckets per doc.

    Returns (bucket ids, doc index per feature, per-doc feature counts).
    Tokens and space-joined bigrams share one FNV-1a hash space mod
    ``num_buckets`` — the paper's hashed n-gram featurization. Hashing is
    per DISTINCT gram (dictionary-encode first), mapped back by index.
    """
    from .dedup import _fnv1a

    flat, doc_of, counts = split_tokens(text)
    grams = [flat]
    gram_docs = [doc_of]
    if len(flat) > 1:
        joined = pc.binary_join_element_wise(flat[:-1], flat[1:], " ")
        same_doc = doc_of[:-1] == doc_of[1:]
        grams.append(joined.filter(pa.array(same_doc)))
        gram_docs.append(doc_of[:-1][same_doc])
    allg = pa.concat_arrays([g.combine_chunks() if isinstance(g, pa.ChunkedArray)
                             else g for g in grams])
    gdoc = np.concatenate(gram_docs) if gram_docs else np.empty(0, np.int64)
    if len(allg) == 0:
        return np.empty(0, np.int64), gdoc, np.zeros(len(counts), np.int64)
    d = pc.dictionary_encode(allg)
    vocab = np.fromiter((_fnv1a(g) for g in d.dictionary.to_pylist()),
                        dtype=np.uint64, count=len(d.dictionary))
    buckets = (vocab % num_buckets).astype(np.int64)[
        d.indices.to_numpy(zero_copy_only=False)]
    n_feats = np.bincount(gdoc, minlength=len(counts)).astype(np.int64)
    return buckets, gdoc, n_feats


def dsir_weights(ds, target_ds, *, text_col: str = "text",
                 id_col: str = "doc_id", num_buckets: int = DSIR_BUCKETS,
                 shuffle_buckets: int = 8):
    """Per-doc DSIR importance weight in integer micro-nats.

    Pass 1 fits BOTH hashed-feature multinomials in one sweep: each batch
    emits (bucket, c_t, c_r) bincount partials (c_t counts only rows that
    pass the ``target_ds`` membership — here expressed as a second dataset
    sharing the schema), reduced two-phase. The per-bucket log-ratio table
    ``delta[f] = floor(ln((c_t+1)/(T+m))*1e6) - floor(ln((c_r+1)/(R+m))*1e6)``
    (Laplace-smoothed, integer micro-nats) is driver-built from m=1024 rows
    — bounded by the feature space, never the corpus — and broadcast in the
    scoring closure. Pass 2 streams: ``w = sum(delta[f])`` over the doc's
    feature occurrences, exact int64 arithmetic on both engines.

    ``target_ds`` must be a (possibly filtered) view of ``ds``'s rows.
    """
    from .aggregate import two_phase_aggregate

    def raw_partial(t: pa.Table) -> pa.Table:
        b, _, _ = _dsir_features(t.column(text_col), num_buckets)
        c = np.bincount(b, minlength=num_buckets).astype(np.int64)
        nz = np.flatnonzero(c)
        return pa.table({"f": pa.array(nz.astype(np.int32)), "c": pa.array(c[nz])})

    def count(dset):
        parts = dset.map_batches(raw_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
        agg = two_phase_aggregate(parts, ["f"], [("c", "sum", "c")],
                                  num_buckets=shuffle_buckets)
        out = np.zeros(num_buckets, np.int64)
        for r in agg.take_all():  # <= num_buckets rows
            out[r["f"]] = r["c"]
        return out

    c_r = count(ds)
    c_t = count(target_ds)
    m = float(num_buckets)
    lp_t = np.floor(np.log((c_t + 1.0) / (c_t.sum() + m)) * 1e6).astype(np.int64)
    lp_r = np.floor(np.log((c_r + 1.0) / (c_r.sum() + m)) * 1e6).astype(np.int64)
    delta = lp_t - lp_r

    def score(t: pa.Table) -> pa.Table:
        b, gdoc, n_feats = _dsir_features(t.column(text_col), num_buckets)
        w = np.zeros(len(n_feats), np.int64)
        np.add.at(w, gdoc, delta[b])
        keep = n_feats > 0
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(ids[keep]),
                         "n_feats": pa.array(n_feats[keep]),
                         "w_unat": pa.array(w[keep])})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def bigram_logprob(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   num_buckets: int = 16):
    """Per-doc BIGRAM log-probability in integer micro-nats — one rung above
    :func:`unigram_logprob` on the LM-quality ladder (KenLM-style scoring,
    exactly verifiable).

    Model: first token scores ``ln(c1(w)/total)``; every following position
    scores the add-one-smoothed conditional
    ``ln((c2(prev,w) + 1) / (c1(prev) + V))`` with ``V`` = distinct unigram
    count. Every term becomes ``floor(ln(p) * 1e6)`` int64 micro-nats via
    the SAME float expression the SQL mirror evaluates per position, so
    per-doc sums are exact integer arithmetic on both engines.

    Scale shape: unigram and bigram count tables are vocab-bounded two-phase
    partials (the bigram table is the standard LM-training state; prune like
    unigram's top_v for open-vocab corpora); both broadcast once via
    ``ray.put``; scoring is one stateless pass with two Arrow ``index_in``
    probes. Scoring the training corpus itself means no OOV path.
    """
    import ray

    from .aggregate import two_phase_aggregate

    from .aggregate import bounded_take_all

    c1_rows = bounded_take_all(
        unigram_counts(ds, text_col=text_col, num_buckets=num_buckets),
        1 << 22, "bigram_logprob unigram vocab")
    toks = pa.array([r["tok"] for r in c1_rows], pa.string())
    c1 = np.array([r["c"] for r in c1_rows], dtype=np.int64)
    total = float(c1.sum())
    v = len(c1)

    def bigram_partial(t: pa.Table) -> pa.Table:
        flat, doc_of, _ = split_tokens(t.column(text_col))
        if len(flat) < 2:
            return pa.table({"bg": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        joined = pc.binary_join_element_wise(flat[:-1], flat[1:], " ")
        same = doc_of[:-1] == doc_of[1:]
        d = pc.dictionary_encode(joined.filter(pa.array(same)))
        cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                          minlength=len(d.dictionary)).astype(np.int64)
        return pa.table({"bg": d.dictionary, "c": pa.array(cnt)})

    c2_rows = bounded_take_all(two_phase_aggregate(
        ds.map_batches(bigram_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["bg"], [("c", "sum", "c")], num_buckets=num_buckets),
        1 << 23, "bigram_logprob bigram vocab")
    bgs = pa.array([r["bg"] for r in c2_rows], pa.string())
    c2 = np.array([r["c"] for r in c2_rows], dtype=np.int64)

    # micro-nat tables, computed ONCE here (driver) with the same float
    # expressions the SQL mirror uses
    lp_uni = np.floor(np.log(c1.astype(np.float64) / total) * 1e6).astype(np.int64)
    ref = ray.put((toks, bgs, c1, c2))

    def score(t: pa.Table) -> pa.Table:
        vocab, bg_vocab, c1_l, c2_l = ray.get(ref)
        flat, doc_of, n_tok = split_tokens(t.column(text_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sums = np.zeros(len(n_tok), np.int64)
        if len(flat):
            uidx = pc.index_in(flat, vocab).to_numpy(zero_copy_only=False).astype(np.int64)
            first = np.r_[True, doc_of[1:] != doc_of[:-1]]
            sums_add = np.where(first, lp_uni[uidx], 0)
            if len(flat) > 1:
                joined = pc.binary_join_element_wise(flat[:-1], flat[1:], " ")
                bidx = pc.index_in(joined, bg_vocab)
                bvalid = bidx.is_valid().to_numpy(zero_copy_only=False)
                bnp = bidx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
                cb = np.where(bvalid, c2_l[bnp], 0)
                cprev = c1_l[uidx[:-1]]
                lp_bi = np.floor(np.log((cb + 1.0) / (cprev + float(len(c1_l))))
                                 * 1e6).astype(np.int64)
                cont = ~first[1:]
                sums_add[1:] = np.where(cont, lp_bi, sums_add[1:])
            np.add.at(sums, doc_of, sums_add)
        m = n_tok > 0
        return pa.table({id_col: pa.array(ids[m]),
                         "n_tokens": pa.array(n_tok[m]),
                         "lp_unat": pa.array(sums[m])})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text(text):
    """Canonical text normalization for dedup: lowercase, collapse ASCII
    whitespace runs to one space, trim. Same three kernels the DuckDB
    mirror applies (both sides RE2/utf8proc)."""
    x = pc.utf8_lower(text)
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(x)


def normalized_dedup(ds, *, text_col: str = "text", key_cols: list[str],
                     num_buckets: int = 64):
    """Exact dedup AFTER normalization — catches the case/whitespace
    variants plain content-hash dedup misses (the C4 'lowercased exact'
    convention). One row per normalized-content group:
    (norm_hash, keep_key, n_dups) with keep_key = lexicographic min of the
    joined key columns. Only (hash, key) rows shuffle."""
    from .aggregate import two_phase_aggregate
    from .enrich import _hash_values

    def prep(t: pa.Table) -> pa.Table:
        norm = normalize_text(t.column(text_col))
        key = t.column(key_cols[0])
        for c in key_cols[1:]:
            key = pc.binary_join_element_wise(
                pc.cast(key, pa.string()), pc.cast(t.column(c), pa.string()), "#")
        return pa.table({"norm_hash": _hash_values(norm, "md5"),
                         "keep_key": pc.cast(key, pa.string())})

    rows = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return two_phase_aggregate(
        rows, ["norm_hash"],
        [("keep_key", "min", "keep_key"), ("keep_key", "count", "n_dups")],
        num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# hashed linear quality classifier
# ---------------------------------------------------------------------------

CLF_DIM = 1024          # hashing-trick feature space (fastText default 2^21)
CLF_BIAS = 17           # integer bias term
CLF_MIX = 2654435761    # Knuth multiplicative constant -> weight table
CLF_WMOD = 1001         # weight range: (j*MIX) % WMOD - WOFF in [-500, 500]
CLF_WOFF = 500


def _clf_weights(dim: int = CLF_DIM) -> np.ndarray:
    """Deterministic integer weight vector w[j] in [-500, 500].

    Stand-in for a trained linear model's weights: what matters here is the
    serving plumbing (hashing trick, broadcast-free deterministic weight
    table, vectorized scoring), not the training run. Integer weights keep
    the per-doc score exact on both engines."""
    j = np.arange(dim, dtype=np.int64)
    return (j * CLF_MIX) % CLF_WMOD - CLF_WOFF


def hashed_classifier(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      dim: int = CLF_DIM):
    """fastText-style linear text classifier scoring (Joulin et al. 2016,
    'Bag of Tricks'): unigram bag-of-words -> hashing trick (FNV-1a mod
    ``dim``) -> summed integer weights + bias -> keep/drop gate. The shape
    of every learned quality filter (CCNet, DCLM, FineWeb-Edu): a tiny
    broadcast weight table and one stateless vectorized pass.

    Hashing is per DISTINCT token (the shared :func:`hashed_token_ids` id
    space); the weight table is built once here and captured in the closure
    (cheaper than shipping 8 KB per batch). Emits ALL docs, zero-token docs
    score = bias. Exact int64 arithmetic -> bit-exact DuckDB oracle.
    """
    from .tokenize import hashed_token_ids

    w = _clf_weights(dim)

    def score(t: pa.Table) -> pa.Table:
        flat, doc_of, n_tok = split_tokens(t.column(text_col))
        sums = np.zeros(t.num_rows, np.int64)
        if len(flat):
            j = hashed_token_ids(flat, dim)
            np.add.at(sums, doc_of, w[j])
        score_v = sums + CLF_BIAS
        return pa.table({id_col: t.column(id_col),
                         "n_tokens": pa.array(n_tok),
                         "score": pa.array(score_v),
                         "keep": pa.array(score_v > 0)})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def bigram_counts(ds, *, text_col: str = "text", num_buckets: int = 16):
    """Global within-doc adjacent-bigram frequency table (keys are the two
    tokens space-joined); same vocab-bounded two-phase shape as
    :func:`unigram_counts`."""
    from .aggregate import two_phase_aggregate

    def partial(t: pa.Table) -> pa.Table:
        flat, doc_of, _ = split_tokens(t.column(text_col))
        if len(flat) < 2:
            return pa.table({"bg": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        joined = pc.binary_join_element_wise(flat[:-1], flat[1:], " ")
        same = doc_of[:-1] == doc_of[1:]
        d = pc.dictionary_encode(joined.filter(pa.array(same)))
        cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                          minlength=len(d.dictionary)).astype(np.int64)
        return pa.table({"bg": d.dictionary, "c": pa.array(cnt)})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return two_phase_aggregate(parts, ["bg"], [("c", "sum", "c")],
                               num_buckets=num_buckets)


def collocations(ds, *, text_col: str = "text", k: int = 50,
                 min_count: int = 5, num_buckets: int = 16,
                 broadcast_limit: int = 1 << 20):
    """Top-k adjacent-token collocations by PMI (phrase mining — the
    word2vec-phrases / NPMI corpus statistic), integer micro-nats.

    ``pmi = ln(p(w1 w2)) - ln(p(w1)) - ln(p(w2))`` evaluated as the exact
    float expression ``ln(c2/n2) - ln(c1a/n1) - ln(c1b/n1)`` (one division
    per ln, fixed subtraction order) then ``floor(x * 1e6)`` — identical
    IEEE doubles on both engines, so ordering and values are bit-exact.

    Scale shape: ONE tokenize scan emits both gram tables (tagged
    ``kind`` 0 = unigram / 1 = bigram partials into one two-phase shuffle,
    materialized once — vocab-bounded); the bigram side stays a Dataset
    end-to-end and the global sort moves only rows surviving ``min_count``.
    The unigram side is resolved by the classic size-gated join decision:
    when the distinct-unigram count is <= ``broadcast_limit`` it broadcasts
    once via ``ray.put`` (stateless probe); above the limit it switches to
    two co-partitioned ``bucket_hash_join``s, so the driver NEVER holds an
    open-vocab table — both plans evaluate the identical float expression.
    """
    import ray

    from .aggregate import two_phase_aggregate

    def partial(t: pa.Table) -> pa.Table:
        flat, doc_of, _ = split_tokens(t.column(text_col))
        grams, kinds = [flat], [0]
        if len(flat) > 1:
            joined = pc.binary_join_element_wise(flat[:-1], flat[1:], " ")
            same = doc_of[:-1] == doc_of[1:]
            grams.append(joined.filter(pa.array(same)))
            kinds.append(1)
        keys, kind_col, cnts = [], [], []
        for g, kd in zip(grams, kinds):
            d = pc.dictionary_encode(g)
            keys.append(d.dictionary)
            cnts.append(np.bincount(d.indices.to_numpy(zero_copy_only=False),
                                    minlength=len(d.dictionary)).astype(np.int64))
            kind_col.append(np.full(len(d.dictionary), kd, np.int8))
        return pa.table({
            "kind": pa.array(np.concatenate(kind_col) if kind_col else
                             np.empty(0, np.int8)),
            "key": pa.concat_arrays([x.combine_chunks() if
                                     isinstance(x, pa.ChunkedArray) else x
                                     for x in keys]),
            "c": pa.array(np.concatenate(cnts) if cnts else
                          np.empty(0, np.int64)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    grams = two_phase_aggregate(parts, ["kind", "key"], [("c", "sum", "c")],
                                num_buckets=num_buckets).materialize()

    def only(kind: int, rename: str):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("kind"), kind))
            return pa.table({rename: t.column("key"), "c": t.column("c")})
        return f

    uni = grams.map_batches(only(0, "tok"), batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    n_uni = uni.count()  # metadata on a materialized dataset — no pass
    n1 = float(uni.sum("c") or 1.0)
    bg = grams.map_batches(only(1, "bg"), batch_format="pyarrow",
                           zero_copy_batch=True)
    n2 = float(bg.sum("c") or 1.0)  # 0-bigram corpus: result is empty anyway

    def finish(t: pa.Table, w1, w2, c2, c1a, c1b) -> pa.Table:
        pmi = (np.log(c2.astype(np.float64) / n2)
               - np.log(c1a.astype(np.float64) / n1)
               - np.log(c1b.astype(np.float64) / n1))
        return pa.table({"w1": w1, "w2": w2, "n": pa.array(c2),
                         "pmi_unat": pa.array(np.floor(pmi * 1e6).astype(np.int64))})

    if n_uni <= broadcast_limit:
        # small-vocab plan: one ray.put broadcast, stateless probe — the
        # classic broadcast-vs-shuffle join decision, driver state bounded
        # by broadcast_limit
        c1_rows = uni.take_all()
        toks = pa.array([r["tok"] for r in c1_rows], pa.string())
        c1 = np.array([r["c"] for r in c1_rows], dtype=np.int64)
        ref = ray.put((toks, c1))

        def score(t: pa.Table) -> pa.Table:
            vocab, c1_l = ray.get(ref)
            t = t.filter(pc.greater_equal(t.column("c"), min_count))
            if t.num_rows == 0:
                return pa.table({"w1": pa.array([], pa.string()),
                                 "w2": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64()),
                                 "pmi_unat": pa.array([], pa.int64())})
            parts = pc.split_pattern(t.column("bg").combine_chunks(), " ")
            w1 = pc.list_element(parts, 0)
            w2 = pc.list_element(parts, 1)
            c2 = t.column("c").to_numpy()
            ia = pc.index_in(w1, vocab).to_numpy(zero_copy_only=False).astype(np.int64)
            ib = pc.index_in(w2, vocab).to_numpy(zero_copy_only=False).astype(np.int64)
            return finish(t, w1, w2, c2, c1_l[ia], c1_l[ib])

        scored = bg.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    else:
        # open-vocab plan: NOTHING vocab-sized ever reaches the driver —
        # split the surviving bigrams and resolve c1(w1)/c1(w2) with two
        # co-partitioned bucket_hash_joins against the unigram Dataset
        from .join import bucket_hash_join

        def split_bg(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater_equal(t.column("c"), min_count))
            parts = pc.split_pattern(t.column("bg").combine_chunks(), " ")
            return pa.table({"w1": pc.list_element(parts, 0),
                             "w2": pc.list_element(parts, 1),
                             "c2": t.column("c")})

        def rename(new: str):
            def f(t: pa.Table) -> pa.Table:
                return pa.table({"tok": t.column("tok"), new: t.column("c")})
            return f

        bgs = bg.map_batches(split_bg, batch_format="pyarrow", zero_copy_batch=True)
        uni_a = uni.map_batches(rename("c1a"), batch_format="pyarrow",
                                zero_copy_batch=True)
        uni_b = uni.map_batches(rename("c1b"), batch_format="pyarrow",
                                zero_copy_batch=True)
        j1 = bucket_hash_join(bgs, uni_a, on="w1", right_on="tok",
                              num_buckets=num_buckets)
        j2 = bucket_hash_join(j1, uni_b, on="w2", right_on="tok",
                              num_buckets=num_buckets)

        def score_joined(t: pa.Table) -> pa.Table:
            c2 = t.column("c2").to_numpy(zero_copy_only=False).astype(np.int64)
            c1a = t.column("c1a").to_numpy(zero_copy_only=False).astype(np.int64)
            c1b = t.column("c1b").to_numpy(zero_copy_only=False).astype(np.int64)
            return finish(t, t.column("w1"), t.column("w2"), c2, c1a, c1b)

        scored = j2.map_batches(score_joined, batch_format="pyarrow",
                                zero_copy_batch=True)

    return scored.sort(["pmi_unat", "w1", "w2"],
                       descending=[True, False, False]).limit(k)


# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(ds, query_terms: list[str], *, k: int = 10,
              text_col: str = "text", id_col: str = "doc_id"):
    """Lucene-style BM25 top-k retrieval for a fixed term query — the
    lexical-search counterpart of sim_topk (Robertson/Okapi BM25 with the
    Lucene +1 idf form).

    Two streaming passes: (1) a stats combiner reduces the corpus to
    ``2 + |q|`` integers (doc count, token count, per-term doc frequency)
    via ``Dataset.sum`` over per-batch partials; (2) a stateless scoring
    pass — per-term tf by vectorized token equality, the BM25 expression
    evaluated in ONE fixed operation order so the DuckDB mirror produces
    identical IEEE doubles — then ``floor(x * 1e6)`` micro-nats, global
    sort, limit k. Only k rows ever leave the scoring stage per block.
    """
    import math

    terms = list(query_terms)

    def stats(t: pa.Table) -> pa.Table:
        flat, doc_of, n = split_tokens(t.column(text_col))
        out = {"n_docs": [t.num_rows], "n_toks": [int(n.sum())]}
        for i, term in enumerate(terms):
            if len(flat):
                eqv = pc.equal(flat, term).to_numpy(zero_copy_only=False)
                tf = np.bincount(doc_of[eqv], minlength=len(n))
                out[f"df_{i}"] = [int((tf > 0).sum())]
            else:
                out[f"df_{i}"] = [0]
        return pa.table({c: pa.array(v, pa.int64()) for c, v in out.items()})

    parts = ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
    cols = ["n_docs", "n_toks"] + [f"df_{i}" for i in range(len(terms))]
    tot = parts.sum(cols)
    n_docs = int(tot["sum(n_docs)"])
    avgdl = float(tot["sum(n_toks)"]) / n_docs
    idf = [math.log((n_docs - int(tot[f"sum(df_{i})"]) + 0.5)
                    / (int(tot[f"sum(df_{i})"]) + 0.5) + 1.0)
           for i in range(len(terms))]

    def score(t: pa.Table) -> pa.Table:
        flat, doc_of, n = split_tokens(t.column(text_col))
        ratio = n.astype(np.float64) / avgdl
        s = np.zeros(t.num_rows, np.float64)
        for i, term in enumerate(terms):
            if len(flat):
                eqv = pc.equal(flat, term).to_numpy(zero_copy_only=False)
                tf = np.bincount(doc_of[eqv], minlength=len(n)).astype(np.float64)
            else:
                tf = np.zeros(t.num_rows, np.float64)
            s = s + idf[i] * ((tf * (BM25_K1 + 1.0))
                              / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * ratio)))
        return pa.table({id_col: t.column(id_col),
                         "score_unat": pa.array(
                             np.floor(s * 1e6).astype(np.int64))})

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["score_unat", id_col],
                       descending=[True, False]).limit(k)


def kn_bigram_logprob(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      num_buckets: int = 16, discount: float = 0.75):
    """Per-doc interpolated Kneser–Ney bigram log-probability in integer
    micro-nats — the top rung of the LM-quality ladder (Kneser & Ney 1995 /
    Chen & Goodman 1999 interpolated form), exactly verifiable.

    Model: the first token scores ``ln(c1(w)/total)``; every continuation
    position scores ``ln(p)`` with

        p = max(c2 - d, 0)/c1(w1) + d*left(w1)/c1(w1) * (right(w2)/T)

    where ``left(w1)`` = distinct continuations of w1, ``right(w2)`` =
    distinct left-contexts of w2 (the continuation probability numerator),
    ``T`` = distinct bigram types and ``d`` the absolute discount. One fixed
    float expression -> ``floor(ln(p) * 1e6)`` int64, identical IEEE doubles
    on both engines, so per-doc sums are exact.

    Scale shape: identical to :func:`bigram_logprob` — vocab-bounded
    two-phase count tables broadcast once (left/right/T are derived from
    the bigram table on the driver), one stateless scoring pass with two
    Arrow ``index_in`` probes. Scoring the training corpus itself means
    every doc bigram exists in the tables (no OOV path); cap like
    unigram's ``top_v`` for open-vocab corpora."""
    import ray

    from .aggregate import two_phase_aggregate

    from .aggregate import bounded_take_all

    c1_rows = bounded_take_all(
        unigram_counts(ds, text_col=text_col, num_buckets=num_buckets),
        1 << 22, "kn_bigram_logprob unigram vocab")
    toks = pa.array([r["tok"] for r in c1_rows], pa.string())
    c1 = np.array([r["c"] for r in c1_rows], dtype=np.int64)
    total = float(c1.sum())

    def bigram_partial(t: pa.Table) -> pa.Table:
        flat, doc_of, _ = split_tokens(t.column(text_col))
        if len(flat) < 2:
            return pa.table({"bg": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        joined = pc.binary_join_element_wise(flat[:-1], flat[1:], " ")
        same = doc_of[:-1] == doc_of[1:]
        d = pc.dictionary_encode(joined.filter(pa.array(same)))
        cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                          minlength=len(d.dictionary)).astype(np.int64)
        return pa.table({"bg": d.dictionary, "c": pa.array(cnt)})

    c2_rows = bounded_take_all(two_phase_aggregate(
        ds.map_batches(bigram_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["bg"], [("c", "sum", "c")], num_buckets=num_buckets),
        1 << 23, "kn_bigram_logprob bigram vocab")
    bgs = pa.array([r["bg"] for r in c2_rows], pa.string())
    c2 = np.array([r["c"] for r in c2_rows], dtype=np.int64)

    # continuation stats, derived on the driver from the (tiny) bigram vocab
    parts = pc.split_pattern(bgs, " ")
    w1i = pc.index_in(pc.list_element(parts, 0), toks) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    w2i = pc.index_in(pc.list_element(parts, 1), toks) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    left = np.bincount(w1i, minlength=len(c1)).astype(np.int64)
    right = np.bincount(w2i, minlength=len(c1)).astype(np.int64)
    n_types = float(len(c2_rows))

    lp_uni = np.floor(np.log(c1.astype(np.float64) / total) * 1e6).astype(np.int64)
    ref = ray.put((toks, bgs, c1.astype(np.float64), c2, left, right))

    def score(t: pa.Table) -> pa.Table:
        vocab, bg_vocab, c1f, c2_l, left_l, right_l = ray.get(ref)
        flat, doc_of, n_tok = split_tokens(t.column(text_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sums = np.zeros(len(n_tok), np.int64)
        if len(flat):
            uidx = pc.index_in(flat, vocab).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            first = np.r_[True, doc_of[1:] != doc_of[:-1]]
            sums_add = np.where(first, lp_uni[uidx], 0)
            if len(flat) > 1:
                joined = pc.binary_join_element_wise(flat[:-1], flat[1:], " ")
                bidx = pc.index_in(joined, bg_vocab)
                bnp = bidx.fill_null(0).to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                bval = bidx.is_valid().to_numpy(zero_copy_only=False)
                cb = np.where(bval, c2_l[bnp], 0).astype(np.float64)
                i1, i2 = uidx[:-1], uidx[1:]
                cont = ~first[1:]
                p = (np.maximum(cb - discount, 0.0) / c1f[i1]
                     + discount * left_l[i1] / c1f[i1]
                     * (right_l[i2] / n_types))
                # masked cross-doc boundary pairs can have p == 0 (w1 never
                # a bigram-left, w2 never a bigram-right); their lp is
                # discarded by the cont mask, but log(0) -> -inf and the
                # int64 cast of -inf is undefined in numpy — clamp masked
                # positions to 1.0 (log 1 = 0) before the log. Within-doc
                # pairs always have p > 0 (their bigram is in c2, so
                # left[w1] >= 1 and right[w2] >= 1).
                p = np.where(cont, p, 1.0)
                lp_bi = np.floor(np.log(p) * 1e6).astype(np.int64)
                sums_add[1:] = np.where(cont, lp_bi, sums_add[1:])
            np.add.at(sums, doc_of, sums_add)
        m = n_tok > 0
        return pa.table({id_col: pa.array(ids[m]),
                         "n_tokens": pa.array(n_tok[m]),
                         "lp_unat": pa.array(sums[m])})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def vocab_kl(p_ds, q_ds, *, text_col: str = "text", num_buckets: int = 16,
             scale: int = 10**9):
    """Exact-integer KL divergence between two corpora's unigram
    distributions — the distribution-drift / domain-shift statistic
    (add-one smoothed over the UNION vocabulary so every term is finite):

        KL(P||Q) = sum_t p_t * ln(p_t / q_t),
        p_t = (c_p + 1) / (n_p + V),  q_t = (c_q + 1) / (n_q + V)

    evaluated per term as ONE fixed float expression then
    ``floor(x * scale)`` int64 nano-nats, so the final sum is exact integer
    arithmetic in any order (the usual float-sum-order trap).

    Scale shape: one tagged tokenize pass -> a vocab-bounded two-phase
    (tok, c_p, c_q) table; three scalars (n_p, n_q, V) from Dataset sums;
    the per-term scoring is a stateless map over the counts table and the
    result is a single-row integer reduce. Nothing vocab-sized reaches the
    driver. Output: (vocab_size, n_p, n_q, kl_nanonats)."""
    import ray

    from .aggregate import two_phase_aggregate

    def partial(side: str):
        def f(t: pa.Table) -> pa.Table:
            flat, _, _ = split_tokens(t.column(text_col))
            d = pc.dictionary_encode(flat)
            cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                              minlength=len(d.dictionary)).astype(np.int64)
            zero = np.zeros(len(cnt), np.int64)
            return pa.table({"tok": d.dictionary,
                             "c_p": pa.array(cnt if side == "p" else zero),
                             "c_q": pa.array(cnt if side == "q" else zero)})
        return f

    parts = p_ds.map_batches(partial("p"), batch_format="pyarrow",
                             zero_copy_batch=True).union(
        q_ds.map_batches(partial("q"), batch_format="pyarrow",
                         zero_copy_batch=True))
    counts = two_phase_aggregate(parts, ["tok"],
                                 [("c_p", "sum", "c_p"), ("c_q", "sum", "c_q")],
                                 num_buckets=num_buckets).materialize()
    v = counts.count()
    tot = counts.sum(["c_p", "c_q"])
    n_p, n_q = int(tot["sum(c_p)"]), int(tot["sum(c_q)"])

    def score(t: pa.Table) -> pa.Table:
        cp = t.column("c_p").to_numpy(zero_copy_only=False).astype(np.float64)
        cq = t.column("c_q").to_numpy(zero_copy_only=False).astype(np.float64)
        p = (cp + 1.0) / (n_p + v)
        q = (cq + 1.0) / (n_q + v)
        term = p * np.log(p / q)
        return pa.table({"kl": pa.array(
            np.floor(term * scale).astype(np.int64))})

    scored = counts.map_batches(score, batch_format="pyarrow",
                                zero_copy_batch=True)
    kl = int(scored.sum("kl"))
    return ray.data.from_arrow(pa.table({
        "vocab_size": pa.array([v], pa.int64()),
        "n_p": pa.array([n_p], pa.int64()),
        "n_q": pa.array([n_q], pa.int64()),
        "kl_nanonats": pa.array([kl], pa.int64()),
    }))


def inverted_index(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   num_buckets: int = 64, max_postings: int | None = None):
    """Inverted-index construction — the search/retrieval index build: one
    row per token with its document frequency and the ascending posting
    list (serialized canonically as a comma-joined id string, the MapOrJson
    convention).

    Scale shape: per-batch DISTINCT (token, doc) pairs (dictionary encode +
    one np.unique over composite keys — the same combiner as doc_freq),
    ONE hash-bucketed shuffle on the token, vectorized per-bucket assembly
    (sort + reduceat segment joins, no per-token Python). ``max_postings``
    truncates each list to its first N ids (df stays exact) — the
    posting-chunking guard for stopword-class tokens at corpus scale;
    truncation is logged in the ``truncated`` flag, never silent.
    """
    from .aggregate import grouped_apply

    def prep(t: pa.Table) -> pa.Table:
        flat, doc_of, _ = split_tokens(t.column(text_col))
        ids = pc.cast(t.column(id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d = pc.dictionary_encode(flat)
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = max(len(d.dictionary), 1)
        pairs = np.unique(doc_of * v + idx)
        return pa.table({"token": d.dictionary.take(pa.array(pairs % v)),
                         id_col: pa.array(ids[pairs // v])})

    pairs = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df) -> pa.Table:
        import pandas as pd

        df = df.drop_duplicates()  # cross-batch duplicates of (token, doc)
        df = df.sort_values(["token", id_col], kind="mergesort")
        toks = df["token"].to_numpy()
        ids = df[id_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, toks[1:] != toks[:-1]]) \
            if len(toks) else np.empty(0, np.int64)
        ends = np.r_[starts[1:], len(toks)]
        dfreq = (ends - starts).astype(np.int64)
        out_tok, out_post, out_trunc = [], [], []
        id_str = ids.astype(str)
        for s, e in zip(starts, ends):
            take = e if max_postings is None else min(e, s + max_postings)
            out_post.append(",".join(id_str[s:take]))
            out_trunc.append(take < e)
        return pa.table({
            "token": pa.array(toks[starts].astype(str) if len(starts) else [],
                              pa.string()),
            "df": pa.array(dfreq),
            "postings": pa.array(out_post, pa.string()),
            "truncated": pa.array(out_trunc, pa.bool_()),
        })

    return grouped_apply(pairs, ["token"], per_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# vocabulary growth (Heaps-law curve)
# ---------------------------------------------------------------------------


def vocab_growth(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 num_buckets: int = 16):
    """Vocabulary-growth curve (Heaps' law): distinct-token count of every
    power-of-two document prefix (prefix = docs with ``doc_id < P``), the
    corpus statistic behind vocabulary-size and tokenizer-budget planning.

    Exact and fully distributed: per-batch (token, min doc_id) partials
    (dictionary-encode + one minimum.reduceat over the sorted stream) feed
    a two-phase MIN aggregate; a stateless map buckets each token by
    ``bit_length(first_doc)`` (token first appears in prefix 2^j iff
    first_doc < 2^j); the final reduce is a <= 64-row histogram whose
    cumulative sum IS the curve. Nothing vocab-sized reaches the driver.

    Output: (prefix_docs, vocab_size) for P in {1, 2, 4, ..., n_docs}
    (deduplicated when n_docs is itself a power of two). Assumes the
    corpus tables' contiguous 0-based ``doc_id`` (prefix membership is
    ``doc_id < P``)."""
    from .aggregate import two_phase_aggregate

    n_docs = ds.count()

    def partial(t: pa.Table) -> pa.Table:
        flat, doc_of, _ = split_tokens(t.column(text_col))
        if not len(flat):
            return pa.table({"tok": pa.array([], pa.string()),
                             "fd": pa.array([], pa.int64())})
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = pc.dictionary_encode(flat)
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        docs = ids[doc_of]
        order = np.argsort(idx, kind="stable")
        si, sd = idx[order], docs[order]
        starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
        mins = np.minimum.reduceat(sd, starts)
        return pa.table({"tok": pc.take(d.dictionary, pa.array(si[starts])),
                         "fd": pa.array(mins)})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    firsts = two_phase_aggregate(parts, ["tok"], [("fd", "min", "fd")],
                                 num_buckets=num_buckets)

    def bucket(t: pa.Table) -> pa.Table:
        fd = t.column("fd").to_numpy(zero_copy_only=False).astype(np.int64)
        # vectorized bit_length: index of the first power of two > fd
        k = np.searchsorted(np.left_shift(np.int64(1), np.arange(63)), fd,
                            side="right").astype(np.int64)
        kk, cnt = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(kk), "c": pa.array(cnt.astype(np.int64))})

    hist_rows = two_phase_aggregate(
        firsts.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True),
        ["k"], [("c", "sum", "c")], num_buckets=4).take_all()
    hist = {r["k"]: r["c"] for r in hist_rows}
    n_j = max(int(np.ceil(np.log2(max(n_docs, 1)))), 0)
    out_p, out_v = [], []
    for j in range(n_j + 1):
        p = min(1 << j, n_docs)
        if out_p and p == out_p[-1]:
            continue
        out_p.append(p)
        out_v.append(sum(c for k, c in hist.items() if k <= j))
    if not out_p or out_p[-1] != n_docs:
        out_p.append(n_docs)
        out_v.append(sum(hist.values()))
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "prefix_docs": pa.array(out_p, pa.int64()),
        "vocab_size": pa.array(out_v, pa.int64()),
    }))


def length_buckets(ds, *, text_col: str = "text", num_buckets: int = 4):
    """Length-bucketed batching statistics — the pad-to-max inference/
    training batching planner: docs bucket by ``bit_length(n_tokens)``
    (power-of-two length bins); per bucket the doc count, token sum, max
    length and the padding waste ``n_docs * max_len - token_sum`` a
    pad-to-max batcher would burn. One stateless tokenize-and-bin pass
    into a <= 64-key two-phase reduce. Output: (len_bucket, n_docs,
    token_sum, max_len, pad_waste)."""
    from .aggregate import two_phase_aggregate

    powers = np.left_shift(np.int64(1), np.arange(63))

    def partial(t: pa.Table) -> pa.Table:
        _, _, counts = split_tokens(t.column(text_col))
        n = counts.astype(np.int64)
        k = np.searchsorted(powers, n, side="right").astype(np.int64)
        kk, idx = np.unique(k, return_inverse=True)
        return pa.table({
            "len_bucket": pa.array(kk),
            "n_docs": pa.array(np.bincount(idx).astype(np.int64)),
            "token_sum": pa.array(np.bincount(idx, weights=n).astype(np.int64)),
            "max_len": pa.array(
                np.maximum.reduceat(n[np.argsort(idx, kind="stable")],
                                    np.r_[0, np.cumsum(np.bincount(idx))[:-1]])
                .astype(np.int64)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = two_phase_aggregate(
        parts, ["len_bucket"],
        [("n_docs", "sum", "n_docs"), ("token_sum", "sum", "token_sum"),
         ("max_len", "max", "max_len")], num_buckets=num_buckets)

    def waste(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pad_waste",
            pc.subtract(pc.multiply(t.column("n_docs"), t.column("max_len")),
                        t.column("token_sum")))

    return agg.map_batches(waste, batch_format="pyarrow", zero_copy_batch=True)


def ppl_buckets(ds, *, text_col: str = "text", id_col: str = "doc_id",
                source_col: str = "source", n_buckets: int = 3,
                top_v: int | None = DEFAULT_TOP_V, num_buckets: int = 16):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.4): every
    document gets a per-source quality tertile — head / middle / tail — by
    ranking its per-token unigram LM score within its source. CCNet cuts on
    fixed perplexity thresholds derived from per-source quantiles; the
    rank-based tertile is the tie-stable, exactly-mirrorable form (rank
    ``r`` of ``n`` docs -> bucket ``r * n_buckets // n``, ordered by
    (score DESC, doc_id); 0 = head = best).

    Per-token score = mathematical FLOOR of lp_sum_unat / n_tokens
    (``np.floor_divide`` floors toward -inf on the negative micro-nat sums;
    the SQL mirror uses the floor-mod identity, as source_lm_score does).

    Scale shape: the unigram vocab broadcast of :func:`unigram_logprob`
    (top-V bounded), one stateless scoring pass, then ONE hash-bucketed
    shuffle carrying (doc_id, source, per_tok) ints only — ranks are
    computed vectorized across all sources in a bucket."""
    import ray

    counts = unigram_counts(ds, text_col=text_col).materialize()
    total = int(counts.sum("c"))
    if top_v is not None and counts.count() > top_v:
        counts = top_v_counts(counts, key_col="tok", count_col="c", top_v=top_v)
    vocab_rows = counts.take_all()
    toks = np.array([r["tok"] for r in vocab_rows], dtype=object)
    cnts = np.array([r["c"] for r in vocab_rows], dtype=np.int64)
    lp = np.floor(np.log(cnts.astype(np.float64) / total) * 1e6).astype(np.int64)
    oov = np.int64(np.floor(np.log(1.0 / total) * 1e6))
    ref = ray.put((pa.array(toks.astype(str)), lp, oov))

    def score(t: pa.Table) -> pa.Table:
        vocab, lp_l, oov_l = ray.get(ref)
        flat, doc_of, n_tok = split_tokens(t.column(text_col))
        idx = pc.index_in(flat, vocab)
        valid = idx.is_valid().to_numpy(zero_copy_only=False)
        idx_np = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.where(valid, lp_l[idx_np], oov_l)
        sums = np.zeros(len(n_tok), np.int64)
        np.add.at(sums, doc_of, vals)
        m = n_tok > 0
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        per_tok = np.floor_divide(sums[m], n_tok[m])
        return pa.table({
            id_col: pa.array(ids[m]),
            source_col: t.column(source_col).combine_chunks().filter(pa.array(m)),
            "per_tok_unat": pa.array(per_tok),
        })

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    from .aggregate import grouped_apply

    def rank_bucket(t: pa.Table) -> pa.Table:
        src = t.column(source_col).combine_chunks()
        codes = src.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        per = t.column("per_tok_unat").to_numpy(zero_copy_only=False)
        doc = t.column(id_col).to_numpy(zero_copy_only=False)
        # head (bucket 0) = BEST per-token logprob -> rank descending on
        # the score, doc_id ascending for tie stability
        order = np.lexsort((doc, -per, codes))
        c = codes[order]
        first = np.r_[True, c[1:] != c[:-1]] if len(c) else np.zeros(0, bool)
        gstart = np.flatnonzero(first)
        gid = np.cumsum(first) - 1
        rank = np.arange(len(c), dtype=np.int64) - gstart[gid]
        gsize = np.diff(np.r_[gstart, len(c)])
        bucket = rank * n_buckets // gsize[gid]
        oa = pa.array(order)
        return pa.table({
            id_col: pa.array(doc[order]),
            source_col: src.take(oa),
            "per_tok_unat": pa.array(per[order]),
            "ppl_bucket": pa.array(bucket.astype(np.int64)),
        })

    return grouped_apply(scored, [source_col], rank_bucket,
                         batch_format="pyarrow", num_buckets=num_buckets)


def char_entropy(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document byte-entropy quality score — the gibberish/binary-blob
    filter (low entropy = repeated filler, high entropy = random bytes):

        ent_unat = sum_b c_b * floor(ln(n / c_b) * 1e6)

    over the doc's byte histogram — exact int64 micro-nats, order-free
    (the same floor-absorbs-ulp argument as the unigram scorer; divide by
    n for nats/byte downstream). The byte stream is read zero-copy from
    the Arrow string buffers (offsets + data, no per-row Python); byte ==
    character on the ASCII corpus, which is what the char-level DuckDB
    oracle checks. Output: (id_col, n_chars, ent_unat)."""

    def f(t: pa.Table) -> pa.Table:
        s = t.column(text_col).combine_chunks()
        if pa.types.is_large_string(s.type):
            s = pc.cast(s, pa.string())
        n = len(s)
        offs = np.frombuffer(s.buffers()[1], np.int32)[s.offset: s.offset + n + 1]
        data = np.frombuffer(s.buffers()[2], np.uint8)
        lens = np.diff(offs).astype(np.int64)
        stream = data[offs[0]: offs[-1]]
        doc_of = np.repeat(np.arange(n), lens)
        keys, cnt = np.unique(doc_of * 256 + stream, return_counts=True)
        d = keys // 256
        terms = cnt * np.floor(
            np.log(lens[d].astype(np.float64) / cnt) * 1e6).astype(np.int64)
        ent = np.zeros(n, np.int64)
        np.add.at(ent, d, terms)
        m = lens > 0
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(ids[m]),
                         "n_chars": pa.array(lens[m]),
                         "ent_unat": pa.array(ent[m])})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def ngram_diversity(ds, *, text_col: str = "text", ns: tuple[int, ...] = (1, 2, 3),
                    num_buckets: int = 16):
    """Corpus n-gram diversity (the distinct-n generation-diversity /
    memorization-screen statistic): for each n, the number of DISTINCT
    token n-grams, the total n-gram count, and their ratio. Pure n-grams —
    docs shorter than n contribute nothing (unlike the minhash shingle
    fallback).

    Scale shape: per-batch (n, gram_hash, count) partials (rolling-poly
    over the batch token-hash stream, within-doc windows only) reduce
    two-phase over the gram keyspace; the final reduce is a |ns|-row
    count+sum. 64-bit gram hashing carries the dup_ngrams deterministic-
    collision caveat (~(grams^2)/2^65 — negligible and identical across
    runs). Output: (n, distinct_grams, total_grams, diversity)."""
    from .aggregate import two_phase_aggregate
    from .dedup import _batch_token_hashes

    P = np.uint64(1_000_003)

    def partial(t: pa.Table) -> pa.Table:
        th, counts = _batch_token_hashes(t.column(text_col).combine_chunks())
        ln = len(th)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        out_n, out_g, out_c = [], [], []
        for n in ns:
            if ln < n:
                continue
            acc = th[: ln - n + 1].copy()
            for j in range(1, n):
                acc = acc * P + th[j: ln - n + 1 + j]
            valid = doc_of[: ln - n + 1] == doc_of[n - 1:]
            g, c = np.unique(acc[valid], return_counts=True)
            out_n.append(np.full(len(g), n, np.int64))
            out_g.append(g)
            out_c.append(c.astype(np.int64))
        if not out_n:
            return pa.table({"n": pa.array([], pa.int64()),
                             "g": pa.array([], pa.uint64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"n": pa.array(np.concatenate(out_n)),
                         "g": pa.array(np.concatenate(out_g)),
                         "c": pa.array(np.concatenate(out_c))})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    counts = two_phase_aggregate(parts, ["n", "g"], [("c", "sum", "c")],
                                 num_buckets=num_buckets)

    def one(t: pa.Table) -> pa.Table:
        return pa.table({"n": t.column("n"),
                         "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
                         "c": t.column("c")})

    agg = two_phase_aggregate(
        counts.map_batches(one, batch_format="pyarrow", zero_copy_batch=True),
        ["n"], [("one", "sum", "distinct_grams"), ("c", "sum", "total_grams")],
        num_buckets=2)

    def ratio(t: pa.Table) -> pa.Table:
        return t.append_column(
            "diversity",
            pc.divide(pc.cast(t.column("distinct_grams"), pa.float64()),
                      pc.cast(t.column("total_grams"), pa.float64())))

    return agg.map_batches(ratio, batch_format="pyarrow", zero_copy_batch=True)


def zipf_slope(ds, *, text_col: str = "text", top_n: int = 256,
               num_buckets: int = 16):
    """Zipf rank-frequency fit over the corpus unigram distribution: the
    least-squares slope of ln(freq) vs ln(rank) across the top-``top_n``
    tokens (Zipf's law predicts ~ -1; corpus-quality profiling uses the
    deviation). Both axes quantize to floor(ln * 1e3) milli-nats so the four
    regression sums are EXACT int64 arithmetic; the slope is one float64
    division of exactly-representable integers (every sum < 2^53) and a
    floor(x * 1e6) — bit-stable against the SQL mirror, no float-summation
    order anywhere.

    Scale shape: counts are vocab-bounded two-phase partials
    (:func:`unigram_counts`), the top-N selection is the distributed
    :func:`top_v_counts` (per-block truncation before the sort), and only
    ``top_n`` (tok, c) rows ever reach the driver."""
    import pandas as pd

    counts = unigram_counts(ds, text_col=text_col, num_buckets=num_buckets)
    top = top_v_counts(counts, key_col="tok", count_col="c",
                       top_v=top_n).to_pandas()
    c = top["c"].to_numpy(dtype=np.int64)          # already (c desc, tok asc)
    n = len(c)
    r = np.arange(1, n + 1, dtype=np.float64)
    y = np.floor(np.log(c.astype(np.float64)) * 1e3).astype(np.int64)
    x = np.floor(np.log(r) * 1e3).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope_micro = int(np.floor(1e6 * float(num) / float(den)))
    return pd.DataFrame({"n_tokens": np.array([n], np.int64),
                         "slope_micro": np.array([slope_micro], np.int64)})


def oov_rate(ds, *, vocab_size: int = 16, text_col: str = "text",
             source_col: str = "source", num_buckets: int = 16):
    """Tokenizer-coverage audit: per source, how many tokens fall outside
    the corpus top-``vocab_size`` vocabulary — the signal that decides
    whether a tokenizer retrains before a new source joins the mix.
    Output: (source, n_tokens, n_oov) exact int64.

    Scale shape: the vocabulary is the distributed :func:`top_v_counts`
    selection over vocab-bounded count partials, broadcast once via
    ``ray.put``; the scoring pass is one stateless map with an Arrow
    ``index_in`` probe and per-(batch, source) combiners, so the final
    exchange is a few rows per source."""
    import ray

    from .aggregate import two_phase_aggregate

    top = top_v_counts(unigram_counts(ds, text_col=text_col,
                                      num_buckets=num_buckets),
                       key_col="tok", count_col="c", top_v=vocab_size)
    vocab = pa.array([r["tok"] for r in top.take_all()], pa.string())
    ref = ray.put(vocab)

    def score(t: pa.Table) -> pa.Table:
        vocab_l = ray.get(ref)
        flat, doc_of, n_tok = split_tokens(t.column(text_col))
        oov_flags = pc.index_in(flat, vocab_l).is_null().to_numpy(
            zero_copy_only=False).astype(np.int64)
        src = t.column(source_col).to_numpy(zero_copy_only=False)
        order = np.argsort(src, kind="stable")
        ss = src[order]
        starts = np.flatnonzero(np.r_[True, ss[1:] != ss[:-1]])
        n_docs_per = np.diff(np.r_[starts, len(ss)])
        # per-doc token counts -> per-source sums in the sorted order
        nt = n_tok.astype(np.int64)[order]
        per_doc_oov = (np.bincount(doc_of, weights=oov_flags,
                                   minlength=len(src)).astype(np.int64)
                       if len(flat) else np.zeros(len(src), np.int64))
        po = per_doc_oov[order]
        return pa.table({
            source_col: pa.array(ss[starts]),
            "n_tokens": pa.array(np.add.reduceat(nt, starts)
                                 if len(ss) else np.empty(0, np.int64)),
            "n_oov": pa.array(np.add.reduceat(po, starts)
                              if len(ss) else np.empty(0, np.int64)),
        })

    parts = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return two_phase_aggregate(parts, [source_col],
                               [("n_tokens", "sum", "n_tokens"),
                                ("n_oov", "sum", "n_oov")],
                               num_buckets=num_buckets)


def typo_pairs(ds, *, text_col: str = "text", max_dist: int = 2,
               min_len: int = 3, top_v: int = 1 << 16,
               num_buckets: int = 16):
    """Typo / near-spelling mining over the alphabetic token vocabulary
    (FastSS, Bocek et al. 2007): tokens within Levenshtein distance
    <= ``max_dist``. Candidate pairs come from shared deletion-variant
    buckets (delete up to ``max_dist`` chars — a COMPLETE filter: every
    pair within distance k shares a variant), then the exact distance is
    verified per candidate. Output (tok_a, tok_b, dist), tok_a < tok_b.

    Scale shape: the vocabulary is the vocab-bounded distinct-token
    two-phase (+ the distributed top-V cap used by unigram_logprob, so an
    open vocab can't blow the variant fan-out); variant generation fans
    out ~1 + L + L(L-1)/2 rows per token; pairs assemble per variant
    bucket with the vectorized pair algebra and dedup as 2-string rows;
    only the FEW verified candidates ever see the DP."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    counts = unigram_counts(ds, text_col=text_col).materialize()

    def alpha_only(t: pa.Table) -> pa.Table:
        keep = pc.match_substring_regex(t.column("tok"),
                                        rf"^[A-Za-z]{{{min_len},}}$")
        return t.filter(keep)

    vocab = counts.map_batches(alpha_only, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    if vocab.count() > top_v:
        vocab = top_v_counts(vocab, key_col="tok", count_col="c", top_v=top_v)

    def variants(t: pa.Table) -> pa.Table:
        toks = t.column("tok").to_pylist()
        vs, ts = [], []
        for tok in toks:  # bounded: distinct vocab rows, not the stream
            seen = {tok}
            frontier = {tok}
            for _ in range(max_dist):
                frontier = {s[:i] + s[i + 1:]
                            for s in frontier for i in range(len(s))}
                seen |= frontier
            vs.extend(seen)
            ts.extend([tok] * len(seen))
        return pa.table({"variant": pa.array(vs, pa.string()),
                         "tok": pa.array(ts, pa.string())})

    var_rows = vocab.map_batches(variants, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"tok_a": pd.Series([], dtype=str),
                                 "tok_b": pd.Series([], dtype=str)})
        g = g.drop_duplicates(["variant", "tok"]).sort_values(
            ["variant", "tok"], kind="mergesort")
        vv = g["variant"].to_numpy()
        tk = g["tok"].to_numpy()
        n = len(vv)
        seg_first = np.flatnonzero(np.r_[True, vv[1:] != vv[:-1]])
        k = np.diff(np.r_[seg_first, n])
        li = np.arange(n) - np.repeat(seg_first, k)
        right = np.repeat(np.arange(n), li)
        grp = np.repeat(np.cumsum(li) - li, li)
        left = np.repeat(np.repeat(seg_first, k), li) + (
            np.arange(int(li.sum())) - grp)
        out = pd.DataFrame({"tok_a": tk[left], "tok_b": tk[right]})
        return out.drop_duplicates()

    cand = grouped_apply(var_rows, ["variant"], pairs,
                         num_buckets=num_buckets)
    distinct = two_phase_aggregate(cand, ["tok_a", "tok_b"],
                                   [("tok_a", "count", "_n")],
                                   num_buckets=8)

    def verify(t: pa.Table) -> pa.Table:
        a = t.column("tok_a").to_pylist()
        b = t.column("tok_b").to_pylist()
        ds_ = []
        for x, y in zip(a, b):  # candidates only — few survive the filter
            prev = list(range(len(y) + 1))
            for i, cx in enumerate(x, 1):
                cur = [i] + [0] * len(y)
                for j, cy in enumerate(y, 1):
                    cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                                 prev[j - 1] + (cx != cy))
                prev = cur
            ds_.append(prev[-1])
        d = pa.array(ds_, pa.int64())
        out = pa.table({"tok_a": t.column("tok_a"),
                        "tok_b": t.column("tok_b"), "dist": d})
        return out.filter(pc.less_equal(out.column("dist"), max_dist))

    return distinct.map_batches(
        lambda t: t.select(["tok_a", "tok_b"]), batch_format="pyarrow",
        zero_copy_batch=True).map_batches(verify, batch_format="pyarrow",
                                          zero_copy_batch=True)


def token_canonical(ds, *, text_col: str = "text", max_dist: int = 2,
                    min_len: int = 3, num_buckets: int = 16):
    """Lexicon canonicalization: connected components over the typo-pair
    graph (FastSS candidates, exact Levenshtein verify), labeling every
    token in a cluster with its lexicographically smallest member — the
    spell-normalization map a corpus cleaner applies after typo mining.
    Output (tok, canonical).

    Scale shape: the pair graph is O(near-spelling mass), far smaller
    than the vocabulary; min-label CC runs the bucketed message-passing
    of dedup.connected_components (labels are the native string ids;
    Arrow's hash min on binary is bytewise-lexicographic, exactly
    DuckDB's default VARCHAR MIN)."""
    from .dedup import connected_components

    pairs = typo_pairs(ds, text_col=text_col, max_dist=max_dist,
                       min_len=min_len, num_buckets=num_buckets)
    return connected_components(pairs, a_col="tok_a", b_col="tok_b",
                                id_col="tok", label_col="canonical",
                                num_buckets=num_buckets)


def fertility_by_lang(ds, *, lang_col: str = "lang", text_col: str = "text",
                      num_buckets: int = 8):
    """Tokenizer-fertility proxy per language: whitespace tokens and
    codepoint chars summed per lang, with chars_per_tok_e6 = exact
    floor(1e6 · Σchars / Σtokens) — the per-language cost signal a
    multilingual tokenizer budget reads (CJK-heavy corpora run long
    chars-per-token under whitespace tokenization, agglutinative ones
    short). Output (lang, n_docs, n_tokens, n_chars, chars_per_tok_e6).

    Scale shape: stateless vectorized RE2 count per batch into a
    langs-bounded two-phase reduce; the ratio is computed on the final
    |langs| rows."""
    from .aggregate import two_phase_aggregate

    def counts(t: pa.Table) -> pa.Table:
        text = t.column(text_col).combine_chunks()
        return pa.table({
            lang_col: t.column(lang_col),
            "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
            "n_tokens": pc.cast(pc.count_substring_regex(text, r"\S+"),
                                pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })

    agg = two_phase_aggregate(
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True),
        [lang_col],
        [("n_docs", "sum", "n_docs"), ("n_tokens", "sum", "n_tokens"),
         ("n_chars", "sum", "n_chars")],
        num_buckets=num_buckets)

    def ratio(t: pa.Table) -> pa.Table:
        tok = t.column("n_tokens").to_numpy(zero_copy_only=False)
        ch = t.column("n_chars").to_numpy(zero_copy_only=False)
        r = np.where(tok > 0, ch * 1_000_000 // np.maximum(tok, 1), 0)
        return t.append_column("chars_per_tok_e6",
                               pa.array(r.astype(np.int64)))

    return agg.map_batches(ratio, batch_format="pyarrow",
                           zero_copy_batch=True)


def readability(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document readability raw fields (the Flesch/FK inputs) as
    exact integers: whitespace words, sentence-terminator runs, and
    vowel-group syllable proxy, plus the two floor-quantized ratios the
    grade formulas consume (words_per_sent_e3, syll_per_word_e3) — the
    corpus-quality lens that separates prose from code/logs/tables.
    Stateless vectorized RE2 counts; mirrored 1:1 by DuckDB
    regexp_extract_all lengths."""

    def f(t: pa.Table) -> pa.Table:
        text = t.column(text_col).combine_chunks()
        w = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        s = pc.cast(pc.count_substring_regex(text, r"[.!?]+"), pa.int64())
        v = pc.cast(pc.count_substring_regex(
            pc.utf8_lower(text), r"[aeiou]+"), pa.int64())
        wn = w.to_numpy(zero_copy_only=False)
        sn = s.to_numpy(zero_copy_only=False)
        vn = v.to_numpy(zero_copy_only=False)
        wps = wn * 1000 // np.maximum(sn, 1)
        spw = np.where(wn > 0, vn * 1000 // np.maximum(wn, 1), 0)
        return pa.table({id_col: t.column(id_col),
                         "n_words": w, "n_sents": s, "n_vgroups": v,
                         "words_per_sent_e3": pa.array(wps),
                         "syll_per_word_e3": pa.array(spw)})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


KS_BUCKET_CHARS = 64


def length_ks(ds, *, source_col: str = "source", len_col: str = "n_chars",
              bucket_chars: int = KS_BUCKET_CHARS, num_buckets: int = 8):
    """Per-source distribution drift on document length: the exact
    Kolmogorov–Smirnov statistic between each source's length CDF and
    the whole corpus, over ``bucket_chars``-wide length buckets —
    ks_e6 = floor(1e6 · max_b |cdf_s(b)·N − cdf_all(b)·n_s| / (n_s·N)),
    computed in arbitrary-precision ints. The drift gate a curation
    pipeline runs before mixing a new crawl snapshot in. Output
    (source, n_docs, ks_e6).

    Scale shape: one two-phase (source, bucket) count collapses the
    corpus to a grid bounded by |sources| × (max_len/bucket); the exact
    CDF comparison runs driver-side over that grid (the latency_trend
    convention — the grid is calendar/config-bounded, not data-bounded)."""
    from .aggregate import two_phase_aggregate

    def b(t: pa.Table) -> pa.Table:
        ln = t.column(len_col).to_numpy(zero_copy_only=False)
        return pa.table({source_col: t.column(source_col),
                         "bk": pa.array(ln // bucket_chars)})

    grid = two_phase_aggregate(
        ds.map_batches(b, batch_format="pyarrow", zero_copy_batch=True),
        [source_col, "bk"], [("bk", "count", "c")],
        num_buckets=num_buckets).take_all()

    by_src: dict[str, dict[int, int]] = {}
    for r in grid:
        by_src.setdefault(r[source_col], {})[int(r["bk"])] = int(r["c"])
    buckets = sorted({int(r["bk"]) for r in grid})
    gcum, acc = {}, 0
    for bk in buckets:
        acc += sum(d.get(bk, 0) for d in by_src.values())
        gcum[bk] = acc
    n_total = acc
    srcs, ns, kss = [], [], []
    for s in sorted(by_src):
        n_s = sum(by_src[s].values())
        cs, best = 0, 0
        for bk in buckets:
            cs += by_src[s].get(bk, 0)
            best = max(best, abs(cs * n_total - gcum[bk] * n_s))
        srcs.append(s)
        ns.append(n_s)
        kss.append(best * 1_000_000 // (n_s * n_total))
    return pa.table({source_col: pa.array(srcs, pa.string()),
                     "n_docs": pa.array(ns, pa.int64()),
                     "ks_e6": pa.array(kss, pa.int64())})


TREND_MIN_SUP = 5
TREND_LIFT_E6 = 1_500_000


def trending_tokens(ds, *, text_col: str = "text", ts_col: str = "ts",
                    min_sup: int = TREND_MIN_SUP,
                    lift_e6: int = TREND_LIFT_E6, num_buckets: int = 16):
    """Daily trending terms: tokens whose share of a day's token mass
    exceeds ``lift_e6``× their overall corpus share (with ``min_sup``
    occurrences that day) — the burst-detection view a topic monitor
    runs. Shares are floor-quantized to e6 FIRST, so every comparison is
    an int64-safe cross-multiplication of ≤1e6-scale ints regardless of
    corpus size:

        keep iff n >= min_sup and share_day_e6 · 1e6 > lift_e6 · share_all_e6

    Output (day, tok, n, share_day_e6, share_all_e6).

    Scale shape: one token explosion into a two-phase (tok, day) count —
    the gram-mass-bounded shuffle of the unigram ops; token and day
    totals derive from that table (days broadcast driver-side, the
    calendar-bounded map); one bucketed join carries the token total."""
    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    DAY_US = 86_400_000_000

    def explode(t: pa.Table) -> pa.Table:
        flat, doc_of, _ = split_tokens(t.column(text_col).combine_chunks())
        us = (t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        return pa.table({"tok": flat,
                         "day": pa.array(us[doc_of] // DAY_US)})

    cnt = two_phase_aggregate(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        ["tok", "day"], [("day", "count", "n")], num_buckets=num_buckets)
    tok_tot = two_phase_aggregate(cnt, ["tok"], [("n", "sum", "c_tok")],
                                  num_buckets=num_buckets)
    day_rows = two_phase_aggregate(cnt, ["day"], [("n", "sum", "c_day")],
                                   num_buckets=4).take_all()
    c_day = {int(r["day"]): int(r["c_day"]) for r in day_rows}
    total = sum(c_day.values())

    joined = bucket_hash_join(cnt, tok_tot, on="tok",
                              num_buckets=num_buckets)

    def final(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        ct = t.column("c_tok").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        cd = np.array([c_day[int(d)] for d in day], np.int64)
        sd = n * 1_000_000 // cd
        sa = ct * 1_000_000 // total
        keep = (n >= min_sup) & (sd * 1_000_000 > lift_e6 * sa)
        return pa.table({"day": pa.array(day[keep]),
                         "tok": t.column("tok").filter(pa.array(keep)),
                         "n": pa.array(n[keep]),
                         "share_day_e6": pa.array(sd[keep]),
                         "share_all_e6": pa.array(sa[keep])})

    return joined.map_batches(final, batch_format="pyarrow",
                              zero_copy_batch=True)


def hapax_rate(ds, *, group_col: str = "role", text_col: str = "text",
               num_buckets: int = 16):
    """Hapax-legomenon rate per group: the share of each group's token
    mass that consists of corpus-global singletons — the
    lexical-novelty / junk-id signal (hapax-heavy streams are serial
    numbers and hashes, hapax-free streams are templates). Output
    (group, n_tokens, n_hapax, hapax_e6 = floor(1e6·hapax/tokens)).

    Scale shape: one token explosion into a two-phase (group, token)
    count (the gram-mass shuffle); global counts derive from that table
    by a second vocab-bounded reduce; one bucketed join marks the
    singletons."""
    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    def explode(t: pa.Table) -> pa.Table:
        flat, doc_of, _ = split_tokens(t.column(text_col).combine_chunks())
        grp = t.column(group_col).to_numpy(zero_copy_only=False)
        return pa.table({"grp": pa.array(grp[doc_of]), "tok": flat})

    gt = two_phase_aggregate(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        ["grp", "tok"], [("tok", "count", "n")], num_buckets=num_buckets)
    glob = two_phase_aggregate(gt, ["tok"], [("n", "sum", "c_glob")],
                               num_buckets=num_buckets)
    j = bucket_hash_join(gt, glob, on="tok", num_buckets=num_buckets)

    def mark(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        cg = t.column("c_glob").to_numpy(zero_copy_only=False)
        return pa.table({"grp": t.column("grp"),
                         "n_tokens": pa.array(n),
                         "n_hapax": pa.array(np.where(cg == 1, n, 0))})

    agg = two_phase_aggregate(
        j.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True),
        ["grp"], [("n_tokens", "sum", "n_tokens"),
                  ("n_hapax", "sum", "n_hapax")], num_buckets=4)

    def final(t: pa.Table) -> pa.Table:
        nt = t.column("n_tokens").to_numpy(zero_copy_only=False)
        nh = t.column("n_hapax").to_numpy(zero_copy_only=False)
        return pa.table({"role": t.column("grp"),
                         "n_tokens": t.column("n_tokens"),
                         "n_hapax": t.column("n_hapax"),
                         "hapax_e6": pa.array(
                             nh * 1_000_000 // np.maximum(nt, 1))})

    return agg.map_batches(final, batch_format="pyarrow",
                           zero_copy_batch=True)


def lang_script_check(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      num_buckets: int = 4):
    """Language-ID vs script cross-audit: for every predicted language,
    how many docs do / don't contain a CJK codepoint — the consistency
    check that catches mislabeled or mojibake docs (a `zh` prediction
    without CJK, or CJK inside an `en` stream). Composes the lang_id
    kernel with one extra RE2 count. Output
    (lang_pred, has_cjk, n_docs)."""
    from .aggregate import two_phase_aggregate

    def f(t: pa.Table) -> pa.Table:
        scored = lang_id_batch(t, text_col, id_col)
        cjk = pc.count_substring_regex(
            t.column(text_col).combine_chunks(), r"[\x{4e00}-\x{9fff}]")
        return pa.table({
            "lang_pred": scored.column("lang_pred"),
            "has_cjk": pc.cast(pc.greater(cjk, 0), pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64))})

    return two_phase_aggregate(
        ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True),
        ["lang_pred", "has_cjk"], [("one", "sum", "n_docs")],
        num_buckets=num_buckets)


def winnow_matches(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   k: int = 16, w: int = 8, max_docs_per_hash: int = 8,
                   min_shared: int = 3, num_buckets: int = 32):
    """MOSS-style winnowing match detection: each doc's winnow SET (the
    distinct window-minima of its rolling FNV k-gram hashes — same
    polynomial as :func:`doc_fingerprint`, which keeps only the combined
    digest) is exploded to (hash, doc) rows; hashes shared by more than
    ``max_docs_per_hash`` docs are dropped as boilerplate (the MOSS
    common-code rule — decided on the globally co-located group, so the
    cut is exact); surviving hash groups explode into doc pairs and
    pairs sharing >= ``min_shared`` fingerprints emit
    (doc_a, doc_b, n_shared) — the plagiarism/near-copy candidate view
    that span_dedup's drop-everywhere rule doesn't give you.

    Scale shape: only (hash, doc_id) int rows ever shuffle; the pair
    fan-out per hash is capped at C(max_docs_per_hash, 2) and the final
    exchange is pre-aggregated pair counts."""
    import pandas as pd

    from numpy.lib.stride_tricks import sliding_window_view

    from .aggregate import grouped_apply, two_phase_aggregate

    MASK = (1 << 63) - 1
    P = np.uint64(1_099_511_628_211)
    BASIS = np.uint64(0xCBF29CE484222325)

    def winset(text: str) -> np.ndarray:
        data = (text or "").encode()
        n = len(data)
        if n < k:
            grams = np.array([_fnv_bytes(data)], dtype=np.uint64)
        else:
            arr = np.frombuffer(data, dtype=np.uint8)
            acc = np.full(n - k + 1, BASIS, dtype=np.uint64)
            for j in range(k):
                acc = (acc ^ arr[j:n - k + 1 + j].astype(np.uint64)) * P
            grams = acc
        if len(grams) <= w:
            mins = np.array([grams.min()], dtype=np.uint64)
        else:
            mins = sliding_window_view(grams, w).min(axis=1)
        # mask to 63 bits BEFORE the distinct so both engines dedup in
        # the same value space (the oracle masks with % 2^63 pre-DISTINCT)
        return np.unique(mins & np.uint64(MASK))

    def explode_fps(t: pa.Table) -> pa.Table:
        ids, hs = [], []
        for did, tx in zip(t.column(id_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            s = winset(tx)
            ids.append(np.full(len(s), did, np.int64))
            hs.append(s.astype(np.int64))
        return pa.table({
            "h": pa.array(np.concatenate(hs) if hs else
                          np.array([], np.int64)),
            id_col: pa.array(np.concatenate(ids) if ids else
                             np.array([], np.int64))})

    fps = ds.map_batches(explode_fps, batch_format="pyarrow",
                         zero_copy_batch=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                              "doc_b": pd.Series([], dtype=np.int64),
                              "n_shared": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        g = g.sort_values(["h", id_col], kind="mergesort")
        hv = g["h"].to_numpy()
        dv = g[id_col].to_numpy()
        seg_first = np.flatnonzero(np.r_[True, hv[1:] != hv[:-1]])
        sizes = np.diff(np.r_[seg_first, len(hv)])
        keep = np.repeat(sizes <= max_docs_per_hash, sizes)
        hv, dv = hv[keep], dv[keep]
        if not len(hv):
            return empty
        seg_first = np.flatnonzero(np.r_[True, hv[1:] != hv[:-1]])
        sizes = np.diff(np.r_[seg_first, len(hv)])
        row_seg_start = np.repeat(seg_first, sizes)
        li = np.arange(len(hv)) - row_seg_start
        right_rows = np.repeat(np.arange(len(hv)), li)
        grp_start = np.repeat(np.cumsum(li) - li, li)
        left_rows = np.repeat(row_seg_start, li) + (
            np.arange(int(li.sum())) - grp_start)
        out = (pd.DataFrame({"doc_a": dv[left_rows],
                             "doc_b": dv[right_rows]})
               .groupby(["doc_a", "doc_b"], sort=False).size()
               .rename("n_shared").reset_index())
        return out.astype({"doc_a": np.int64, "doc_b": np.int64,
                           "n_shared": np.int64})

    per_bucket = grouped_apply(fps, ["h"], pairs, num_buckets=num_buckets)
    agg = two_phase_aggregate(per_bucket, ["doc_a", "doc_b"],
                              [("n_shared", "sum", "n_shared")],
                              num_buckets=num_buckets)
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_shared"),
                                            min_shared)),
        batch_format="pyarrow", zero_copy_batch=True)


def doc_vectors(ds, *, dims: int = 32, text_col: str = "text",
                id_col: str = "doc_id"):
    """Feature-hashed bag-of-words document vectors — the text→vector
    bridge when no embedding model is in the loop: each whitespace token
    hashes to dim = (first 48 md5 bits) % dims and term frequencies sum
    per dim. Output EXPLODED (doc_id, dim, tf) sparse rows (only nonzero
    dims emit — the quantize_embeddings convention). Map-only, no
    shuffle; the per-batch md5 work runs once per DISTINCT token in the
    batch, not per occurrence."""
    import hashlib

    def f(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids_out, dims_out, tf_out = [], [], []
        memo: dict[str, int] = {}
        for did, tx in zip(t.column(id_col).to_pylist(), texts):
            toks = (tx or "").split()
            if not toks:
                continue
            utok, cnt = np.unique(np.asarray(toks, dtype=object),
                                  return_counts=True)
            d = np.empty(len(utok), np.int64)
            for i, tok in enumerate(utok):
                h = memo.get(tok)
                if h is None:
                    h = memo[tok] = int(
                        hashlib.md5(tok.encode()).hexdigest()[:12],
                        16) % dims
                d[i] = h
            tf = np.zeros(dims, np.int64)
            np.add.at(tf, d, cnt)
            nz = np.flatnonzero(tf)
            ids_out.append(np.full(len(nz), did, np.int64))
            dims_out.append(nz.astype(np.int64))
            tf_out.append(tf[nz])
        if not ids_out:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        return pa.table({id_col: pa.array(np.concatenate(ids_out)),
                         "dim": pa.array(np.concatenate(dims_out)),
                         "tf": pa.array(np.concatenate(tf_out))})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def length_gini(ds, *, text_col: str = "text", source_col: str = "source",
                num_buckets: int = 16):
    """Per-source length inequality: the exact-integer Gini coefficient
    of per-doc token counts (skew_report's rank formula, grouped) —
    a source whose mass hides in a few giant docs needs different
    chunking than a uniform one. Output
    (source, n_docs, token_sum, gini_e6) with
    gini_e6 = (2·S1 − (n+1)·T)·1e6 // (n·T), S1 = Σ i·v_(i) ascending.

    Scale shape: the map side reduces docs to (source, n_tokens) ints;
    per-source rank sums run vectorized across all sources in a
    bucket."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    def prep(t: pa.Table) -> pa.Table:
        toks = pc.cast(pc.count_substring_regex(t.column(text_col),
                                                pattern=r"\S+"), pa.int64())
        return pa.table({source_col: t.column(source_col), "v": toks})

    narrow = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({source_col: pd.Series([], dtype=str),
                                 "n_docs": pd.Series([], dtype=np.int64),
                                 "token_sum": pd.Series([], dtype=np.int64),
                                 "gini_e6": pd.Series([], dtype=np.int64)})
        g = g.sort_values([source_col, "v"], kind="mergesort")
        s = g[source_col].to_numpy()
        v = g["v"].to_numpy().astype(np.int64)
        seg = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        k = np.diff(np.r_[seg, len(s)])
        rank = np.arange(len(s)) - np.repeat(seg, k) + 1
        t_sum = np.add.reduceat(v, seg)
        s1 = np.add.reduceat(rank * v, seg)
        denom = np.maximum(k * t_sum, 1)
        gini = (2 * s1 - (k + 1) * t_sum) * 1_000_000 // denom
        return pd.DataFrame({source_col: s[seg],
                             "n_docs": k.astype(np.int64),
                             "token_sum": t_sum.astype(np.int64),
                             "gini_e6": gini.astype(np.int64)})

    return grouped_apply(narrow, [source_col], per_bucket,
                         num_buckets=num_buckets)
