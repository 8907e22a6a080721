"""Distributed byte-level BPE tokenizer training.

The canonical tokenizer-training kernels (Sennrich et al. 2016; GPT-2-style
byte-level variant) restated as Ray Data stages:

- :func:`bpe_pair_counts` — weighted adjacent byte-pair frequencies across
  the whole corpus (the inner statistic of every BPE trainer): one fused
  map_batches combiner emitting per-batch ``bincount`` partials over the
  bounded 2^16 pair keyspace, then a tiny two-phase shuffle. Nothing
  row-wise, nothing driver-side.
- :func:`bpe_train` — the full iterative trainer: build the distinct-word
  frequency table once (one shuffle — the standard trainer state; its size
  is corpus VOCABULARY, not corpus size), then per merge round count symbol
  pairs weighted by word frequency, pick the global argmax (n desc, pair asc
  — a 1-row reduce), and apply the merge across the word table with the
  greedy leftmost rule, vectorized. The word table is ``materialize()``-d
  per round deliberately: it is the bounded iterative state (same pattern as
  the k-means centroid loop), re-executing the full lineage every round
  would be O(rounds^2).

Greedy merge semantics (matches the reference trainers): matches of pair
``(a, b)`` can only overlap when ``a == b`` (a match at ``i`` and ``i+1``
forces ``sym[i+1] = b = a``), so greedy leftmost = keep every other match
inside each run of consecutive match positions, all matches otherwise.
Pair COUNTING, per Sennrich's ``get_stats``, counts every adjacent
position, overlaps included.

Tokens are bytes of whitespace words (pre-tokenization = the shared
:mod:`tokenize` splitter; pairs never cross word boundaries). The DuckDB
oracles mirror byte values via ``ascii()`` on single-char substrings, exact
for this ASCII corpus; the unit tests additionally pin the kernels against
a per-word pure-Python reference including multi-byte UTF-8 input.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .aggregate import two_phase_aggregate
from .tokenize import split_tokens


def _string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (byte values, relative offsets) view of a StringArray.

    Arrow string values are stored back-to-back (value i ends exactly where
    i+1 begins), so the returned byte segment is the concatenation of the
    strings and ``offs`` delimits them.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], np.int32)[arr.offset:arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    seg = data[offs[0]:offs[-1]]
    return seg, (offs - offs[0]).astype(np.int64)


def pair_counts_batch(flat_tokens: pa.Array) -> np.ndarray:
    """Bincount (length 65536) of within-token adjacent byte pairs,
    key = first_byte << 8 | second_byte."""
    seg, offs = _string_bytes(flat_tokens)
    if len(seg) < 2:
        return np.zeros(65536, dtype=np.int64)
    keys = (seg[:-1].astype(np.uint16) << 8) | seg[1:]
    mask = np.ones(len(seg) - 1, dtype=bool)
    inner = offs[1:-1]  # token boundaries: pair starting at boundary-1 crosses
    mask[inner[(inner > 0) & (inner < len(seg))] - 1] = False
    return np.bincount(keys[mask], minlength=65536).astype(np.int64)


def bpe_pair_counts(ds, *, text_col: str = "text", top_k: int = 50,
                    num_buckets: int = 16):
    """Corpus-wide top-k adjacent byte pairs: (b1, b2, n) ordered by
    (n desc, b1, b2)."""

    def partial(t: pa.Table) -> pa.Table:
        counts = pair_counts_batch(split_tokens(t.column(text_col))[0])
        nz = np.flatnonzero(counts)
        return pa.table({
            "b1": pa.array((nz >> 8).astype(np.int32)),
            "b2": pa.array((nz & 255).astype(np.int32)),
            "n": pa.array(counts[nz]),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    total = two_phase_aggregate(partials, ["b1", "b2"], [("n", "sum", "n")],
                                num_buckets=num_buckets)
    return (total.sort(["n", "b1", "b2"], descending=[True, False, False])
            .limit(top_k))


# ---------------------------------------------------------------------------
# iterative trainer
# ---------------------------------------------------------------------------


def _greedy_match_starts(flat: np.ndarray, word_starts: np.ndarray,
                         a: int, b: int) -> np.ndarray:
    """Global positions p where flat[p:p+2] == (a, b), not crossing a word
    boundary, greedy-resolved leftmost (run parity for a == b)."""
    if len(flat) < 2:
        return np.empty(0, dtype=np.int64)
    m = (flat[:-1] == a) & (flat[1:] == b)
    inner = word_starts[(word_starts > 0) & (word_starts < len(flat))]
    m[inner - 1] = False
    p = np.flatnonzero(m)
    if a == b and len(p) > 1:
        new_run = np.r_[True, np.diff(p) != 1]
        run_first = p[new_run][np.cumsum(new_run) - 1]
        p = p[(p - run_first) % 2 == 0]
    return p


def _apply_merge_np(flat: np.ndarray, offs: np.ndarray, a: int, b: int,
                    new_id: int) -> tuple[np.ndarray, np.ndarray]:
    """Apply one merge over concatenated symbol arrays; returns the new
    (flat, offs)."""
    p = _greedy_match_starts(flat, offs[1:-1], a, b)
    if len(p) == 0:
        return flat, offs
    flat = flat.copy()
    flat[p] = new_id
    keep = np.ones(len(flat), dtype=bool)
    keep[p + 1] = False
    word_of = np.searchsorted(offs, p, side="right") - 1
    removed = np.bincount(word_of, minlength=len(offs) - 1)
    return flat[keep], offs - np.r_[0, np.cumsum(removed)]


def _word_table(ds, text_col: str, num_buckets: int) -> "ray.data.Dataset":  # noqa: F821
    def words(t: pa.Table) -> pa.Table:
        flat, _, _ = split_tokens(t.column(text_col))
        return pa.table({"word": flat, "freq": pa.array(np.ones(len(flat), dtype=np.int64))})

    w = ds.map_batches(words, batch_format="pyarrow", zero_copy_batch=True)
    return two_phase_aggregate(w, ["word"], [("freq", "sum", "freq")],
                               num_buckets=num_buckets)


def bpe_train(ds, num_merges: int = 8, *, text_col: str = "text",
              num_buckets: int = 16):
    """Learn ``num_merges`` BPE merges; returns a Dataset of
    (rank, b1, b2, n, new_id) — the learned merge table."""
    import ray

    def to_syms(t: pa.Table) -> pa.Table:
        seg, offs = _string_bytes(t.column("word"))
        syms = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()),
                                        pa.array(seg.astype(np.int32)))
        return pa.table({"syms": syms, "freq": t.column("freq")})

    words = (_word_table(ds, text_col, num_buckets)
             .map_batches(to_syms, batch_format="pyarrow", zero_copy_batch=True)
             .materialize())

    def count_pairs(t: pa.Table) -> pa.Table:
        syms = t.column("syms")
        if isinstance(syms, pa.ChunkedArray):
            syms = syms.combine_chunks()
        flat = syms.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = syms.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]  # rebase: flatten() slices values from offs[0]
        if len(flat) < 2:
            return pa.table({"b1": pa.array([], pa.int32()), "b2": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        freq = t.column("freq").to_numpy()
        word_of = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        valid = np.ones(len(flat) - 1, dtype=bool)
        inner = offs[1:-1]
        valid[inner[(inner > 0) & (inner < len(flat))] - 1] = False
        keys = flat[:-1][valid] << 21 | flat[1:][valid]  # ids < 2^21
        w = freq[word_of[:-1][valid]]
        uk, inv = np.unique(keys, return_inverse=True)
        n = np.bincount(inv, weights=w).astype(np.int64)
        return pa.table({"b1": pa.array((uk >> 21).astype(np.int32)),
                         "b2": pa.array((uk & ((1 << 21) - 1)).astype(np.int32)),
                         "n": pa.array(n)})

    merges = []
    for r in range(num_merges):
        pairs = words.map_batches(count_pairs, batch_format="pyarrow",
                                  zero_copy_batch=True)
        total = two_phase_aggregate(pairs, ["b1", "b2"], [("n", "sum", "n")],
                                    num_buckets=num_buckets)
        best = total.sort(["n", "b1", "b2"],
                          descending=[True, False, False]).limit(1).take(1)
        if not best:
            break
        a, b, n = int(best[0]["b1"]), int(best[0]["b2"]), int(best[0]["n"])
        new_id = 256 + r
        merges.append({"rank": r, "b1": a, "b2": b, "n": n, "new_id": new_id})

        def apply(t: pa.Table, a=a, b=b, new_id=new_id) -> pa.Table:
            syms = t.column("syms")
            if isinstance(syms, pa.ChunkedArray):
                syms = syms.combine_chunks()
            flat = syms.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            offs = syms.offsets.to_numpy().astype(np.int64)
            offs = offs - offs[0]
            nf, no = _apply_merge_np(flat, offs, a, b, new_id)
            out = pa.ListArray.from_arrays(pa.array(no, type=pa.int32()),
                                           pa.array(nf.astype(np.int32)))
            return pa.table({"syms": out, "freq": t.column("freq")})

        words = words.map_batches(apply, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

    tbl = pa.table({
        "rank": pa.array([m["rank"] for m in merges], pa.int32()),
        "b1": pa.array([m["b1"] for m in merges], pa.int32()),
        "b2": pa.array([m["b2"] for m in merges], pa.int32()),
        "n": pa.array([m["n"] for m in merges], pa.int64()),
        "new_id": pa.array([m["new_id"] for m in merges], pa.int32()),
    })
    return ray.data.from_arrow(tbl)


def bpe_encode(ds, merges, *, text_col: str = "text", id_col: str = "doc_id"):
    """Encode documents with a learned merge table (the tokenizer SERVING
    pass that follows :func:`bpe_train`): whitespace pre-tokenize, bytes ->
    symbols, apply every merge in rank order with the same greedy-leftmost
    rule, emit per-doc token stats.

    ``merges`` is the trained table as [(b1, b2, new_id), ...] in rank
    order — a few dozen constants captured in the closure (the broadcast
    side of a tokenizer apply); the pass itself is stateless and fused.
    Per-doc outputs are order-sensitive exact ints so the DuckDB oracle
    (the train oracle's final word table joined back to doc word positions)
    pins the full token SEQUENCE, not just counts: ``sym_sum`` = sum of
    symbol ids, ``pos_weighted`` = sum of (1-based token position) * id.
    """
    mseq = [(int(a), int(b), int(n)) for a, b, n in merges]

    def enc(t: pa.Table) -> pa.Table:
        return encode_batch(t, mseq, text_col=text_col, id_col=id_col)

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def encode_batch(t: pa.Table, mseq, *, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """The per-batch kernel of :func:`bpe_encode` (pure, Ray-free)."""
    n_docs = t.num_rows
    flat, doc_of, _ = split_tokens(t.column(text_col))
    seg, offs = _string_bytes(flat)
    sym = seg.astype(np.int64)
    offs = offs.astype(np.int64)
    for a, b, nid in mseq:
        sym, offs = _apply_merge_np(sym, offs, a, b, nid)
    wcounts = np.diff(offs)
    ntok = np.zeros(n_docs, np.int64)
    np.add.at(ntok, doc_of, wcounts)
    starts = np.r_[0, np.cumsum(ntok)]
    pos = np.arange(len(sym), dtype=np.int64) - np.repeat(starts[:-1], ntok) + 1
    ne = ntok > 0
    sym_sum = np.zeros(n_docs, np.int64)
    posw = np.zeros(n_docs, np.int64)
    if ne.any():
        # reduceat only over non-empty docs' starts (strictly increasing,
        # in-range); clamping empty-segment starts would truncate the
        # PREVIOUS doc's segment — see stages/dedup.py signature kernels
        sym_sum[ne] = np.add.reduceat(sym, starts[:-1][ne])
        posw[ne] = np.add.reduceat(sym * pos, starts[:-1][ne])
    return pa.table({id_col: t.column(id_col),
                     "n_tokens": pa.array(ntok),
                     "sym_sum": pa.array(sym_sum),
                     "pos_weighted": pa.array(posw)})
