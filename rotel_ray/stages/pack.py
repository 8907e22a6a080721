"""Sequence packing (concat-and-chunk) for LLM training-data prep.

The GPT-style pretraining layout: concatenate every document's token stream
in a deterministic global order (doc_id ascending) and cut the stream into
fixed-length training sequences of ``seq_len`` tokens.  The operator maps
each document to its position in that packed stream — which sequences it
lands in and at what offset — without ever materializing the stream itself.

Scale shape (a distributed exclusive prefix-sum):

1. one tokenize pass reduces the corpus to a ``(doc_id, n_tokens)`` table
   (two int64 columns — ~1/10^4 of the text bytes), materialized once so the
   two downstream consumers don't re-read the full text;
2. per-range totals (``range_key = doc_id // range_size``) via the generic
   two-phase aggregate — a vocab-free, bounded shuffle of partials;
3. the range-total table (``n_docs / range_size`` rows) is exclusive-cumsummed
   on the driver and broadcast via ``ray.put`` — at 10^11 docs and the default
   range size that is ~1.5M rows, a few MB;
4. a bucketed ``grouped_apply`` over ``range_key`` computes each doc's global
   token offset as ``range_base + within-range cumsum`` — every task handles
   O(range_size) docs, no task sees the global stream.

The reference engine (streamfold/rotel) has no corpus machinery; this is one
of the training-data operators layered on the same engine.  No floats
anywhere: output is exact int64, verified bit-for-bit against a DuckDB
window-function oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import grouped_apply, two_phase_aggregate
from .tokenize import split_tokens


def auto_range_size(n_docs: int, floor: int = 65536) -> int:
    """Prefix-sum range size balancing driver state against task size: the
    smallest power of two >= sqrt(n_docs) (floored at 64k), so BOTH the
    driver's range-total table (n_docs / range_size rows) and each bucket
    task's doc count (~range_size) stay O(sqrt(n_docs)). 10^12 docs ->
    2^20 ranges of 2^20 docs (~1M driver rows / ~16 MB, vs ~15M at the old
    fixed 64k)."""
    import math

    if n_docs <= 1:
        return floor
    return max(floor, 1 << math.ceil(math.log2(math.sqrt(n_docs))))


def token_counts(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 range_size: int | None = 65536):
    """``(id_col, n_tokens[, __range])`` table — whitespace token counts,
    optionally with the prefix-sum range key attached (``range_size=None``
    omits it so the caller can auto-size after counting). Same token
    definition as the other text operators (shared tokenizer)."""

    def f(t: pa.Table) -> pa.Table:
        _, _, n_tok = split_tokens(t.column(text_col))
        ids = pc.cast(t.column(id_col), pa.int64())
        cols = {id_col: ids, "n_tokens": pa.array(n_tok)}
        if range_size is not None:
            cols["__range"] = pc.divide(ids, range_size)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _attach_range(id_col: str, range_size: int):
    def f(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__range", pc.divide(pc.cast(t.column(id_col), pa.int64()),
                                 range_size)).replace_schema_metadata(None)
    return f


def seq_pack(ds, *, seq_len: int = 2048, text_col: str = "text",
             id_col: str = "doc_id", range_size: int | None = None,
             num_buckets: int = 64):
    """Map every document to its span in the packed training stream.

    Output (one row per doc): ``(id_col, n_tokens, tok_start, seq_first,
    seq_last, n_seqs)`` where ``tok_start`` is the doc's exclusive global
    token offset in doc_id order, ``seq_first/seq_last`` the first/last
    ``seq_len``-token sequence the doc touches (null for 0-token docs), and
    ``n_seqs`` how many sequences it spans (0 for 0-token docs).

    ``range_size=None`` (default) auto-sizes via :func:`auto_range_size` so
    the driver's range-total table stays O(sqrt(n_docs))."""
    import ray

    # Materializing here is deliberate: `counts` is two int64 columns per doc
    # (~0.01% of the corpus bytes) and feeds BOTH the range-total aggregate
    # and the final offset pass — without the checkpoint each consumer would
    # re-read and re-tokenize the full text.
    counts = token_counts(ds, text_col=text_col, id_col=id_col,
                          range_size=None).materialize()
    if range_size is None:
        range_size = auto_range_size(counts.count())
    counts = counts.map_batches(_attach_range(id_col, range_size),
                                batch_format="pyarrow", zero_copy_batch=True)

    totals = two_phase_aggregate(counts, ["__range"],
                                 [("n_tokens", "sum", "tot")],
                                 num_buckets=num_buckets)
    rows = totals.take_all()  # n_docs / range_size rows — driver-safe
    rng = np.array([r["__range"] for r in rows], dtype=np.int64)
    tot = np.array([r["tot"] for r in rows], dtype=np.int64)
    order = np.argsort(rng, kind="stable")
    rng, tot = rng[order], tot[order]
    base = np.concatenate(([0], np.cumsum(tot)[:-1]))
    base_ref = ray.put((rng, base))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rngs, bases = ray.get(base_ref)
        df = df.sort_values([id_col], kind="mergesort")
        n = df["n_tokens"].to_numpy(np.int64)
        rkey = df["__range"].to_numpy(np.int64)
        # within-range exclusive cumsum, restarting at each range boundary
        cs = np.cumsum(n) - n
        starts = np.flatnonzero(np.r_[True, rkey[1:] != rkey[:-1]])
        cs = cs - np.repeat(cs[starts], np.diff(np.r_[starts, len(n)]))
        pos = np.searchsorted(rngs, rkey)
        tok_start = bases[pos] + cs
        last = tok_start + np.maximum(n, 1) - 1
        seq_first = tok_start // seq_len
        seq_last = last // seq_len
        n_seqs = np.where(n > 0, seq_last - seq_first + 1, 0)
        out = pa.table({
            id_col: pa.array(df[id_col].to_numpy(np.int64)),
            "n_tokens": pa.array(n),
            "tok_start": pa.array(tok_start),
            "seq_first": pa.array(np.where(n > 0, seq_first, 0)).cast(pa.int64()),
            "seq_last": pa.array(np.where(n > 0, seq_last, 0)).cast(pa.int64()),
            "n_seqs": pa.array(n_seqs.astype(np.int64)),
        })
        mask = pa.array(n > 0)
        out = out.set_column(3, "seq_first",
                             pc.if_else(mask, out.column("seq_first"), None))
        out = out.set_column(4, "seq_last",
                             pc.if_else(mask, out.column("seq_last"), None))
        return out

    return grouped_apply(counts, ["__range"], per_bucket,
                         num_buckets=num_buckets, batch_format="pandas")


def pack_sequences(ds, *, seq_len: int = 2048, text_col: str = "text",
                   id_col: str = "doc_id", vocab_mod: int = 1 << 16,
                   range_size: int | None = None, num_buckets: int = 64):
    """Materialized view of the packed training stream, one row per
    ``seq_len``-token sequence: ``(seq_id, n_tok, n_docs, tok_sum)``.

    Completes :func:`seq_pack`: the same distributed prefix-sum gives every
    doc its global token offset, and here each doc SCATTERS its token ids
    (FNV-1a mod ``vocab_mod`` — the hash-vocab stand-in for a learned
    tokenizer) into the sequences it touches. Per-bucket partials are
    (seq_id, sums) rows — a sequence straddling a range boundary receives
    partials from two buckets and the generic two-phase aggregate merges
    them exactly (each doc lives in exactly one range, so ``n_docs`` sums
    are collision-free). ``tok_sum`` is the exact int64 checksum the DuckDB
    oracle reproduces; no stage ever holds the packed stream.
    """
    import ray

    from .tokenize import hashed_token_ids

    counts = token_counts(ds, text_col=text_col, id_col=id_col,
                          range_size=None).materialize()
    if range_size is None:
        range_size = auto_range_size(counts.count())
    counts = counts.map_batches(_attach_range(id_col, range_size),
                                batch_format="pyarrow", zero_copy_batch=True)
    totals = two_phase_aggregate(counts, ["__range"],
                                 [("n_tokens", "sum", "tot")],
                                 num_buckets=num_buckets)
    rows = totals.take_all()
    rng = np.array([r["__range"] for r in rows], dtype=np.int64)
    tot = np.array([r["tot"] for r in rows], dtype=np.int64)
    order = np.argsort(rng, kind="stable")
    rng, tot = rng[order], tot[order]
    base = np.concatenate(([0], np.cumsum(tot)[:-1]))
    base_ref = ray.put((rng, base))

    def add_range(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64())
        return pa.table({id_col: ids, text_col: t.column(text_col),
                         "__range": pc.divide(ids, range_size)})

    def per_bucket(t: pa.Table) -> pa.Table:
        rngs, bases = ray.get(base_ref)
        idx = pc.sort_indices(t, [(id_col, "ascending")])
        t = t.take(idx)
        flat, doc_of, n = split_tokens(t.column(text_col))
        tids = hashed_token_ids(flat, vocab_mod)
        rkey = t.column("__range").to_numpy(zero_copy_only=False)
        cs = np.cumsum(n) - n
        starts = np.flatnonzero(np.r_[True, rkey[1:] != rkey[:-1]])
        cs = cs - np.repeat(cs[starts], np.diff(np.r_[starts, len(n)]))
        tok_start = bases[np.searchsorted(rngs, rkey)] + cs
        # global position of every token: doc start + within-doc ordinal
        doc_ord = np.arange(len(tids)) - np.repeat(np.cumsum(n) - n, n)
        pos = np.repeat(tok_start, n) + doc_ord
        seq = pos // seq_len
        uk, inv = np.unique(seq, return_inverse=True)
        tok_sum = np.bincount(inv, weights=tids).astype(np.int64)
        n_tok = np.bincount(inv).astype(np.int64)
        # distinct docs per sequence: a doc's tokens are contiguous, so it
        # touches the contiguous seq span [first, last] — count via a
        # difference array over the bucket's present-seq index space
        nz = n > 0
        sf = tok_start[nz] // seq_len
        sl = (tok_start[nz] + n[nz] - 1) // seq_len
        delta = np.zeros(len(uk) + 1, np.int64)
        np.add.at(delta, np.searchsorted(uk, sf), 1)
        np.add.at(delta, np.searchsorted(uk, sl) + 1, -1)
        n_docs = np.cumsum(delta)[:len(uk)]
        return pa.table({"seq_id": pa.array(uk), "tok_sum": pa.array(tok_sum),
                         "n_tok": pa.array(n_tok), "n_docs": pa.array(n_docs)})

    ranged = ds.map_batches(add_range, batch_format="pyarrow", zero_copy_batch=True)
    parts = grouped_apply(ranged, ["__range"], per_bucket,
                          num_buckets=num_buckets, batch_format="pyarrow")
    return two_phase_aggregate(parts, ["seq_id"],
                               [("tok_sum", "sum", "tok_sum"),
                                ("n_tok", "sum", "n_tok"),
                                ("n_docs", "sum", "n_docs")],
                               num_buckets=num_buckets)


def doc_chunks(ds, *, chunk_size: int = 64, stride: int = 48,
               text_col: str = "text", id_col: str = "doc_id",
               vocab_mod: int = 65536):
    """RAG-style sliding-window chunking: each document yields token windows
    of ``chunk_size`` starting every ``stride`` tokens (overlap =
    chunk_size - stride), the unit an embedding-index build ingests.

    Entirely doc-local — one stateless fused pass, no shuffle: hashed token
    ids (FNV mod ``vocab_mod``, the same id space as pack_sequences) are
    prefix-summed once per batch and every chunk's checksum is a prefix
    difference, so per-chunk cost is O(1) regardless of overlap. Emits
    (doc_id, chunk_idx, n_tokens, tok_sum); zero-token docs yield no chunks.
    """
    def chunk(t: pa.Table) -> pa.Table:
        return chunk_batch(t, chunk_size=chunk_size, stride=stride,
                           text_col=text_col, id_col=id_col,
                           vocab_mod=vocab_mod)

    return ds.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)


def chunk_batch(t: pa.Table, *, chunk_size: int, stride: int,
                text_col: str = "text", id_col: str = "doc_id",
                vocab_mod: int = 65536) -> pa.Table:
    """The per-batch kernel of :func:`doc_chunks` (pure, Ray-free)."""
    from .tokenize import hashed_token_ids

    flat, doc_of, n = split_tokens(t.column(text_col))
    tids = hashed_token_ids(flat, vocab_mod)
    pref = np.r_[0, np.cumsum(tids)]
    doc_start = np.r_[0, np.cumsum(n)]
    n_chunks = -(-n // stride)  # ceil; 0 tokens -> 0 chunks
    total = int(n_chunks.sum())
    doc_idx = np.repeat(np.arange(t.num_rows), n_chunks)
    chunk_idx = (np.arange(total, dtype=np.int64)
                 - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
    start = chunk_idx * stride
    clen = np.minimum(chunk_size, n[doc_idx] - start)
    gs = doc_start[doc_idx] + start
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    return pa.table({id_col: pa.array(ids[doc_idx]),
                     "chunk_idx": pa.array(chunk_idx),
                     "n_tokens": pa.array(clen),
                     "tok_sum": pa.array(pref[gs + clen] - pref[gs])})


def conv_examples(ds, *, budget: int = 256, key: str = "conv_id",
                  order_col: str = "turn_idx", text_col: str = "text",
                  num_buckets: int = 64):
    """Turn-aligned SFT example packing: within each conversation (ordered
    by ``order_col``) turns chunk into training examples at cumulative
    whitespace-token budget boundaries — ``example_id = tokens_before_turn
    // budget`` — so an example boundary never splits a turn and each
    example overflows its budget only by the final turn that crosses it
    (the standard conversation-aware chunker for SFT data prep).

    Scale shape: token counts are computed by the vectorized Arrow split
    kernel BEFORE the shuffle, so the exchange moves (key, order, count)
    ints — never the text. Conversations then co-partition by key hash
    bucket (grouped_apply); within a bucket the per-conv prefix sums are
    one global cumsum corrected by per-group bases (vectorized across all
    conversations in the bucket — no per-row Python). Output:
    (key, order_col, n_tokens, example_id)."""

    def prep(t: pa.Table) -> pa.Table:
        _, _, counts = split_tokens(t.column(text_col))
        return pa.table({
            key: t.column(key),
            order_col: t.column(order_col),
            "n_tokens": pa.array(counts.astype(np.int64)),
        })

    counted = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort")
        tok = g["n_tokens"].to_numpy().astype(np.int64)
        kv = g[key].to_numpy()
        cum = np.cumsum(tok)
        first = np.r_[True, kv[1:] != kv[:-1]] if len(g) else np.zeros(0, bool)
        # tokens before the group start, broadcast to every row of the group
        base = np.repeat(np.r_[0, cum[:-1]][first],
                         np.diff(np.r_[np.flatnonzero(first), len(kv)]))
        prev_within = cum - tok - base
        return pd.DataFrame({
            key: kv,
            order_col: g[order_col].to_numpy(),
            "n_tokens": tok,
            "example_id": (prev_within // budget).astype(np.int64),
        })

    return grouped_apply(counted, [key], per_bucket,
                         num_buckets=num_buckets)
