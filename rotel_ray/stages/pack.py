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


def token_counts(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 range_size: int = 65536):
    """``(id_col, n_tokens, __range)`` table — whitespace token counts with
    the prefix-sum range key attached.  Same token definition as the other
    text operators (shared hardened tokenizer, see tokenize.py)."""

    def f(t: pa.Table) -> pa.Table:
        _, _, n_tok = split_tokens(t.column(text_col))
        ids = pc.cast(t.column(id_col), pa.int64())
        rng = pc.divide(ids, range_size)
        return pa.table({id_col: ids, "n_tokens": pa.array(n_tok),
                         "__range": rng})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def seq_pack(ds, *, seq_len: int = 2048, text_col: str = "text",
             id_col: str = "doc_id", range_size: int = 65536,
             num_buckets: int = 64):
    """Map every document to its span in the packed training stream.

    Output (one row per doc): ``(id_col, n_tokens, tok_start, seq_first,
    seq_last, n_seqs)`` where ``tok_start`` is the doc's exclusive global
    token offset in doc_id order, ``seq_first/seq_last`` the first/last
    ``seq_len``-token sequence the doc touches (null for 0-token docs), and
    ``n_seqs`` how many sequences it spans (0 for 0-token docs)."""
    import ray

    counts = token_counts(ds, text_col=text_col, id_col=id_col,
                          range_size=range_size)
    # Materializing here is deliberate: `counts` is two int64 columns per doc
    # (~0.01% of the corpus bytes) and feeds BOTH the range-total aggregate
    # and the final offset pass — without the checkpoint each consumer would
    # re-read and re-tokenize the full text.
    counts = counts.materialize()

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
