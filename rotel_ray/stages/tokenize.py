"""Shared whitespace tokenizer for the text/dedup operators.

Every operator that tokenizes free text (minhash shingles, unigram LM,
TF-IDF, sequence packing, ...) goes through :func:`split_tokens` so they all
share ONE token definition: maximal runs of non-whitespace characters, i.e.
what ``regexp_matches(tok, '\\S')`` keeps and what the DuckDB oracles
express as splitting on ``\\s+`` and dropping empties.

Hardening note (the reason this module exists): pyarrow 16's
``utf8_split_whitespace`` kernel has a buffer-end edge case observed under
Ray Data's zero-copy shared-memory blocks — when the LAST string of a block
is pure whitespace whose bytes run to the exact end of the data buffer, the
kernel can emit a phantom ``' '`` token instead of only empty tokens. The
misbehavior is rare, persistent per worker process, and nondeterministic
across processes (it depends on the bytes mapped after the block buffer), so
an ``flat != ""`` filter is NOT enough to make results reproducible. A
whitespace-token filter (trim-then-compare) is: correct kernel output never
contains whitespace inside a token, so trimming is an identity on good
output, and both observed kernel behaviors converge to the same "\\S+ runs"
token stream. Found via a 1-in-30 flake in ``tests/test_pack.py`` (doc
``"   "`` at the end of the corpus counted as 1 token).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def keep_real_tokens(flat: pa.Array) -> pa.Array:
    """Boolean mask over a flattened token array: True for tokens that
    contain at least one non-whitespace character. Drops the '' artifacts of
    Arrow's split (leading/trailing/consecutive separators) AND the phantom
    whitespace-only tokens of the buffer-end kernel edge case above."""
    return pc.not_equal(pc.utf8_trim_whitespace(flat), "")


def split_tokens(text) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Whitespace-split a string column (Array or ChunkedArray).

    Returns ``(flat, doc_of, counts)``: the filtered flat token array, the
    int64 doc index of each kept token, and the per-doc kept-token counts
    (length = len(text)). Null strings count as 0 tokens.
    """
    toks = pc.utf8_split_whitespace(pc.fill_null(text, ""))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    n_docs = len(toks)
    counts_all = np.diff(toks.offsets.to_numpy())
    doc_of = np.repeat(np.arange(n_docs), counts_all)
    keep_arr = keep_real_tokens(flat)
    keep = keep_arr.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep_arr)
    doc_of = doc_of[keep]
    counts = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
    return flat, doc_of, counts


def hashed_token_ids(flat: pa.Array, mod: int) -> np.ndarray:
    """FNV-1a token ids mod ``mod`` for a flat token array — hash per
    DISTINCT token (dictionary-encode first), mapped back by index. The ONE
    token-id space shared by pack_sequences / doc_chunks / the hashed
    classifier (and mirrored by the oracles' _fnv_sql)."""
    from .dedup import _fnv1a

    if len(flat) == 0:
        return np.empty(0, np.int64)
    d = pc.dictionary_encode(flat)
    vocab = np.fromiter((_fnv1a(s) for s in d.dictionary.to_pylist()),
                        dtype=np.uint64, count=len(d.dictionary))
    return (vocab % mod).astype(np.int64)[
        d.indices.to_numpy(zero_copy_only=False)]
