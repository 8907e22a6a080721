"""Deduplication operators over the ``documents`` table.

Five first-class dedup strategies for a 100 TB training-data pipeline,
each expressed Ray-Data-first (map_batches partials + bucketed groupby;
no stage ever holds the full corpus):

- ``exact_dedup``          — content hash -> two-phase group (keep min id).
- ``minhash_lsh_neardup``  — shingle -> minhash signature -> banded LSH
                             buckets -> candidate pairs -> *distributed*
                             exact-Jaccard verification (shingle sets are
                             re-derived per candidate doc and routed to a
                             per-pair group; only the candidate-pair map is
                             broadcast).
- ``simhash_neardup``      — 64-bit simhash; 4×16-bit band buckets give
                             FULL recall for Hamming distance <= 3 by
                             pigeonhole (a pair differing in <=3 bits must
                             agree on >=1 of 4 bands).
- ``token_jaccard_pairs``  — exact token-set Jaccard for a deterministic
                             pairing (doc 2i vs 2i+1) — the SQL-verifiable
                             kernel of the shingle/set-intersection path.
- ``embedding_neardup``    — cosine >= tau pairs; ``exact`` mode broadcasts
                             the (id, vector) matrix once (baseline,
                             verifiable), ``lsh`` mode buckets by
                             random-hyperplane signature first (scale path).

The reference engine has no dedup machinery (SURVEY.md §2.9); shingling /
minhash / banding follow the standard MMDS construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .aggregate import grouped_apply, two_phase_aggregate
from .enrich import _hash_values
from .similarity import embedding_matrix, lsh_signatures, make_planes
from .tokenize import split_tokens

MERSENNE = (1 << 61) - 1
SEED = 7_654_321


# ---------------------------------------------------------------------------
# shingle / token hashing (shared kernels)
# ---------------------------------------------------------------------------


def _token_hashes(text: str) -> np.ndarray:
    """64-bit hashes of whitespace tokens (stable across processes)."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    # FNV-1a over each token, vectorized per doc via Python->np round trip
    out = np.fromiter((_fnv1a(t) for t in toks), dtype=np.uint64, count=len(toks))
    return out


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of k-token shingles: polynomial combination of token hashes
    over a sliding window (rolling combine, no string concatenation)."""
    th = _token_hashes(text).astype(np.uint64)
    if len(th) < k:
        return np.unique(th)
    P = np.uint64(1_000_003)
    acc = th[: len(th) - k + 1].copy()
    for j in range(1, k):
        acc = acc * P + th[j : len(th) - k + 1 + j]
    return np.unique(acc)


def _batch_token_hashes(text: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized token hashing for a whole batch.

    Tokenizes with the Arrow whitespace-split kernel, dictionary-encodes the
    flat token stream, FNV-hashes each DISTINCT token once (vocabularies are
    tiny relative to the stream), and maps back by index. Returns
    (flat token hashes, per-doc token counts) — identical values to
    ``_token_hashes`` per doc, ~50x less per-token Python.
    """
    # shared hardened tokenizer: drops '' split artifacts AND the phantom
    # whitespace-only tokens of the pyarrow buffer-end edge (see tokenize.py)
    flat, doc_of, counts = split_tokens(text)
    d = pc.dictionary_encode(flat)
    vocab = np.fromiter(
        (_fnv1a(t) for t in d.dictionary.to_pylist()), dtype=np.uint64,
        count=len(d.dictionary),
    )
    th = vocab[d.indices.to_numpy(zero_copy_only=False)] if len(flat) else np.empty(0, np.uint64)
    return th, counts


def _batch_shingle_stream(text: pa.Array, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Flat shingle-hash stream + per-doc counts for a whole batch.

    Docs with >= k tokens contribute their k-token rolling-poly shingles
    (same polynomial as ``_shingle_hashes``); shorter docs contribute their
    raw token hashes (the same fallback). Duplicates are kept — harmless for
    minhash (min ignores multiplicity) and for banding.
    """
    th, counts = _batch_token_hashes(text)
    n = len(th)
    starts = np.r_[0, np.cumsum(counts)[:-1]]
    doc_of = np.repeat(np.arange(len(counts)), counts)
    if n >= k:
        P = np.uint64(1_000_003)
        acc = th[: n - k + 1].copy()
        for j in range(1, k):
            acc = acc * P + th[j : n - k + 1 + j]
        # windows fully inside one doc
        valid = doc_of[: n - k + 1] == doc_of[k - 1 :]
    else:
        acc = np.empty(0, np.uint64)
        valid = np.zeros(0, bool)
    sh_counts = np.maximum(counts - (k - 1), 0)
    long_doc = counts >= k
    out_counts = np.where(long_doc, sh_counts, counts)
    total = int(out_counts.sum())
    out = np.empty(total, dtype=np.uint64)
    out_starts = np.r_[0, np.cumsum(out_counts)[:-1]]
    # long docs: their valid windows are contiguous starting at `starts[d]`
    if n >= k:
        win_doc = doc_of[: n - k + 1][valid]
        win_vals = acc[valid]
        win_pos = np.arange(len(win_doc)) - np.r_[0, np.cumsum(np.bincount(win_doc, minlength=len(counts)))[:-1]][win_doc]
        mask_long = long_doc[win_doc]
        out[out_starts[win_doc[mask_long]] + win_pos[mask_long]] = win_vals[mask_long]
    # short docs: copy raw token hashes
    for didx in np.flatnonzero(~long_doc):
        c = counts[didx]
        if c:
            out[out_starts[didx] : out_starts[didx] + c] = th[starts[didx] : starts[didx] + c]
    return out, out_counts


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                algo: str = "md5", num_buckets: int = 64):
    """Hash-partitioned exact dedup: only (hash, id) rows shuffle — raw text
    never leaves the map side. Returns (text_hash, doc_id=min, n_dups)."""
    ds = ds.map_batches(
        lambda t: pa.table(
            {"text_hash": _hash_values(t.column(text_col), algo), id_col: t.column(id_col)}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return two_phase_aggregate(
        ds, ["text_hash"], [(id_col, "min", id_col), (id_col, "count", "n_dups")],
        num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_params(num_perm: int, seed: int = SEED):
    rng = np.random.default_rng(seed)
    # odd multipliers => (a*x + b) mod 2^64 is a bijection of Z_2^64, so each
    # (a_i, b_i) is a genuine permutation for minhash; uint64 wraparound is
    # the mod — fully vectorized, no object-dtype bigint math
    a = (rng.integers(0, 1 << 62, num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 1 << 63, num_perm, dtype=np.uint64)
    return a, b


def _minhash_sig(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) signature = min over shingles of the permuted values."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # np.outer, NOT a[:, None] * shingles[None, :]: numpy 1.26's uint64
    # broadcast multiply over strided views falls off the SIMD path and runs
    # ~150x slower (14 s vs 0.05 s per 16M products measured); outer feeds
    # contiguous operands. uint64 wraparound is the mod. The in-place
    # broadcast ADD on the materialized contiguous result is fast.
    vals = np.outer(a, shingles)
    vals += b[:, None]
    return np.min(vals, axis=1)


class MinHashSignatures:
    """Actor-pool stage: shingle + minhash per doc. Permutation params are
    built once per actor in __init__ (stateful-setup pattern)."""

    # permutation-matrix chunk cap: num_perm x CHUNK_SHINGLES uint64 values
    # per transient matrix (64 perms x 2^16 -> 32 MiB) regardless of batch
    # size / doc length, so the signature stage's heap is bounded.
    CHUNK_SHINGLES = 1 << 16

    def __init__(self, num_perm: int = 64, k_shingle: int = 3, seed: int = SEED,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b = _minhash_params(num_perm, seed)
        self.k = k_shingle
        self.text_col, self.id_col = text_col, id_col
        # preallocated, pre-faulted permutation workspace: allocating the
        # (p, chunk) transient fresh per batch paid the page-fault cost every
        # time — measured SECONDS per first touch of a ~128 MiB mmap on an
        # overcommitted host. One per-worker buffer, faulted here (stateful
        # setup), reused by every batch.
        self._buf = np.zeros((num_perm, self.CHUNK_SHINGLES), np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        text = t.column(self.text_col)
        text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        n = len(text)
        if n == 0:
            sigs = np.empty((0, len(self.a)), dtype=np.uint64)
        else:
            stream, counts = _batch_shingle_stream(text, self.k)
            sigs = np.full((n, len(self.a)), np.iinfo(np.uint64).max, dtype=np.uint64)
            if len(stream):
                # reduceat only over NON-EMPTY docs' starts: those are strictly
                # increasing and < len(stream), so each segment runs exactly to
                # the next non-empty doc's start (empty docs contribute zero
                # elements; a trailing empty doc must not clamp the previous
                # segment — that truncated it by one shingle).
                starts = np.r_[0, np.cumsum(counts)[:-1]]
                ne_idx = np.flatnonzero(counts > 0)
                ne_starts = starts[ne_idx]
                ne_ends = ne_starts + counts[ne_idx]
                lo = 0
                while lo < len(ne_idx):
                    hi = int(np.searchsorted(ne_ends, ne_starts[lo] + self.CHUNK_SHINGLES,
                                             side="right"))
                    hi = max(hi, lo + 1)  # a single over-cap doc still gets one chunk
                    seg = stream[ne_starts[lo] : ne_ends[hi - 1]]
                    # a chunk can exceed CHUNK_SHINGLES only via one over-cap
                    # doc (hi == lo+1); fall back to a fresh transient there
                    if len(seg) <= self._buf.shape[1]:
                        vals = self._buf[:, : len(seg)]
                        np.multiply.outer(self.a, seg, out=vals)
                    else:
                        vals = np.multiply.outer(self.a, seg)
                    vals += self.b[:, None]
                    mins = np.minimum.reduceat(vals, ne_starts[lo:hi] - ne_starts[lo], axis=1)
                    sigs[ne_idx[lo:hi]] = mins.T
                    lo = hi
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1).astype(np.int64)), sigs.shape[1]
                ),
            }
        )


def _band_rows(t: pa.Table, bands: int, id_col: str = "doc_id") -> pa.Table:
    """Explode each signature into `bands` (band_key, doc_id) rows; band_key
    is a stable hash of (band index, band slice of the signature)."""
    sig = t.column("sig")
    if isinstance(sig, pa.ChunkedArray):
        sig = sig.combine_chunks()
    n = len(sig)
    num_perm = sig.type.list_size
    r = num_perm // bands
    m = sig.flatten().to_numpy(zero_copy_only=False).reshape(n, num_perm).astype(np.uint64)
    P = np.uint64(1_000_003)
    keys = np.empty((n, bands), dtype=np.uint64)
    for bidx in range(bands):
        acc = np.full(n, np.uint64(bidx + 17), dtype=np.uint64)
        for j in range(r):
            acc = acc * P + m[:, bidx * r + j]
        keys[:, bidx] = acc
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "band_key": pa.array(keys.reshape(-1).astype(np.int64)),
            id_col: pa.array(np.repeat(ids, bands)),
        }
    )


def _build_popcnt16() -> np.ndarray:
    v = np.arange(1 << 16, dtype=np.uint32)
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return ((v + (v >> 8)) & 0xFF).astype(np.uint8)


_POPCNT16 = _build_popcnt16()  # 64 KiB LUT, built vectorized at import


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via the 16-bit LUT (numpy<2 has no
    ``bitwise_count``)."""
    x = x.astype(np.uint64)
    M = np.uint64(0xFFFF)
    return (
        _POPCNT16[(x & M).astype(np.int64)]
        + _POPCNT16[((x >> np.uint64(16)) & M).astype(np.int64)]
        + _POPCNT16[((x >> np.uint64(32)) & M).astype(np.int64)]
        + _POPCNT16[((x >> np.uint64(48)) & M).astype(np.int64)]
    ).astype(np.int64)


_log = __import__("logging").getLogger(__name__)


def _bucket_segments(keys: np.ndarray, ids: np.ndarray, *extra: np.ndarray):
    """Sort by (key, id), drop duplicate (key, id) rows, and yield
    (start, size) segments of equal-key runs with >= 2 members. Returns the
    deduped sorted columns plus the segment list — shared by the LSH and
    simhash pair reducers (all segment math in numpy)."""
    order = np.lexsort((ids, keys))
    k, i = keys[order], ids[order]
    cols = [c[order] for c in extra]
    keep = np.r_[True, (k[1:] != k[:-1]) | (i[1:] != i[:-1])]
    k, i = k[keep], i[keep]
    cols = [c[keep] for c in cols]
    bounds = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1, len(k)]
    sizes = np.diff(bounds)
    segs = [(int(bounds[s]), int(sizes[s])) for s in np.flatnonzero(sizes >= 2)]
    return (i, *cols), segs


def _emit_segment_pairs(ids: np.ndarray, segs, max_bucket: int, *cols: np.ndarray):
    """All (a < b) index pairs within each segment, with the skew guard:
    the first `max_bucket` members pair all-vs-all; every overflow member
    pairs against the segment's first (pivot) member, keeping transitive dup
    clusters connected at O(m) instead of O(m^2) cost. Truncations are
    logged with their overflow counts. Returns (a_idx, b_idx) row indices."""
    out_a, out_b = [], []
    n_trunc = 0
    for lo, m in segs:
        head = min(m, max_bucket)
        ai, bj = np.triu_indices(head, k=1)
        out_a.append(lo + ai)
        out_b.append(lo + bj)
        if m > max_bucket:
            n_trunc += m - max_bucket
            over = np.arange(lo + max_bucket, lo + m)
            out_a.append(np.full(len(over), lo, dtype=np.int64))
            out_b.append(over)
    if n_trunc:
        _log.warning("bucket pair guard: %d overflow members pivot-paired "
                     "(max_bucket=%d)", n_trunc, max_bucket)
    if not out_a:
        z = np.empty(0, np.int64)
        return z, z
    return np.concatenate(out_a), np.concatenate(out_b)


def _pairs_in_buckets(t: pa.Table, id_col: str = "doc_id", max_bucket: int = 64) -> pa.Table:
    """Candidate pairs within LSH bucket groups — vectorized sort + segment
    scan (no per-row Python). Degenerate buckets are guarded by
    ``_emit_segment_pairs`` (pivot pairing + logged truncation count)."""
    keys = t.column("band_key").to_numpy(zero_copy_only=False)
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(keys):
        (i,), segs = _bucket_segments(keys, ids)
        ai, bi = _emit_segment_pairs(i, segs, max_bucket)
        if len(ai):
            return pa.table({"doc_a": pa.array(i[ai]), "doc_b": pa.array(i[bi])})
    return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})


_MINHASH_CACHE: dict = {}


def minhash_lsh_candidates(ds, *, num_perm: int = 64, bands: int = 16,
                           k_shingle: int = 3, concurrency=2,
                           text_col: str = "text", id_col: str = "doc_id",
                           distinct: bool = True, num_buckets: int = 64):
    """Candidate near-dup pairs via banded MinHash LSH (distinct pairs).

    The signature stage runs as fused tasks with per-worker cached
    permutation params (cheap state; an actor pool here would force the
    read output through the object store — see enrich.py)."""
    key = (num_perm, k_shingle, text_col, id_col)

    def sig_fn(t: pa.Table) -> pa.Table:
        inst = _MINHASH_CACHE.get(key)
        if inst is None:
            inst = _MINHASH_CACHE[key] = MinHashSignatures(
                num_perm=num_perm, k_shingle=k_shingle, text_col=text_col, id_col=id_col
            )
        return inst(t)

    sigs = ds.map_batches(sig_fn, batch_format="pyarrow", zero_copy_batch=True)
    band_ds = sigs.map_batches(
        lambda t: _band_rows(t, bands, id_col), batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = grouped_apply(
        band_ds, ["band_key"], lambda t: _pairs_in_buckets(t, id_col),
        batch_format="pyarrow", num_buckets=num_buckets,
    )
    if not distinct:
        return pairs
    # distinct pairs (a pair can collide in several bands)
    return two_phase_aggregate(pairs, ["doc_a", "doc_b"], [("doc_a", "count", "n_bands")],
                               num_buckets=num_buckets)


def minhash_lsh_neardup(ds, *, threshold: float = 0.7, num_perm: int = 64,
                        bands: int = 16, k_shingle: int = 3, concurrency=2,
                        text_col: str = "text", id_col: str = "doc_id",
                        num_buckets: int = 64):
    """Near-dup pairs with exact shingle-Jaccard >= threshold.

    Fully distributed — the candidate-pair set stays a Dataset end-to-end
    (never collected to the driver; at corpus scale it is O(dup-mass)):

    1. banded-LSH candidate pairs (doc_a, doc_b), possibly repeated across
       bands;
    2. each pair explodes to two (doc_id, doc_a, doc_b) rows;
    3. ``bucket_hash_join`` co-partitions those rows with the documents on
       doc_id (one int-column shuffle) to attach each doc's text;
    4. a grouped_apply on (doc_a, doc_b) re-derives the two shingle sets and
       keeps the pair iff exact Jaccard >= threshold (band-duplicate rows are
       deduped inside the group — no extra distinct shuffle needed).
    """
    from .join import bucket_hash_join

    cand = minhash_lsh_candidates(
        ds, num_perm=num_perm, bands=bands, k_shingle=k_shingle,
        concurrency=concurrency, text_col=text_col, id_col=id_col, distinct=False,
        num_buckets=num_buckets,
    )

    def explode(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").combine_chunks()
        b = t.column("doc_b").combine_chunks()
        return pa.table(
            {
                id_col: pa.concat_arrays([a, b]),
                "doc_a": pa.concat_arrays([a, a]),
                "doc_b": pa.concat_arrays([b, b]),
            }
        )

    pair_rows = cand.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    docs = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow", zero_copy_batch=True
    )
    joined = bucket_hash_join(pair_rows, docs, on=id_col, num_buckets=num_buckets)

    def verify(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        out_a, out_b, out_j = [], [], []
        if len(a):
            order = np.lexsort((d, b, a))
            a, b, d = a[order], b[order], d[order]
            keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (d[1:] != d[:-1])]
            a, b, d = a[keep], b[keep], d[keep]
            texts = pc.fill_null(t.column(text_col).combine_chunks(), "")
            texts = texts.take(pa.array(order[keep]))
            # shingle each DISTINCT text once per bucket (band dups + both-
            # side repeats collapse), then per-pair exact set intersection
            enc = pc.dictionary_encode(texts)
            stream, counts = _batch_shingle_stream(enc.dictionary, k_shingle)
            starts = np.r_[0, np.cumsum(counts)[:-1]]
            sets = [np.unique(stream[s : s + c]) for s, c in zip(starts, counts)]
            codes = enc.indices.to_numpy(zero_copy_only=False)
            bounds = np.r_[0, np.flatnonzero((a[1:] != a[:-1]) | (b[1:] != b[:-1])) + 1, len(a)]
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                if hi - lo != 2:
                    continue  # one side unmatched in the corpus — cannot verify
                sa, sb = sets[codes[lo]], sets[codes[lo + 1]]
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                j = inter / union if union else 0.0
                if j >= threshold:
                    out_a.append(int(a[lo]))
                    out_b.append(int(b[lo]))
                    out_j.append(j)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return grouped_apply(joined, ["doc_a", "doc_b"], verify, batch_format="pyarrow",
                         num_buckets=num_buckets)


def semi_join_ids(ds, keep_ids_ds, *, id_col: str = "doc_id", num_buckets: int = 64):
    """Distributed semi-join: rows of ``ds`` whose ``id_col`` DOES appear in
    ``keep_ids_ds`` — the 'apply a computed keep-set' counterpart of
    :func:`anti_join_ids`, same co-partitioned shape."""
    return _membership_join_ids(ds, keep_ids_ds, id_col=id_col,
                                num_buckets=num_buckets, keep_members=True)


def anti_join_ids(ds, drop_ids_ds, *, id_col: str = "doc_id", num_buckets: int = 64):
    """Distributed anti-join: rows of ``ds`` whose ``id_col`` does NOT appear
    in ``drop_ids_ds`` (a one-column Dataset of ids). Same co-partitioning
    shape as ``bucket_hash_join``: both sides tagged, unioned, bucketed on
    the id, each bucket filters vectorized — no driver-side id set."""
    return _membership_join_ids(ds, drop_ids_ds, id_col=id_col,
                                num_buckets=num_buckets, keep_members=False)


def _membership_join_ids(ds, ids_ds, *, id_col: str, num_buckets: int,
                         keep_members: bool):
    sch = ds.schema()
    cols = list(sch.names)
    col_type = dict(zip(sch.names, sch.types))

    def tag_keep(t: pa.Table) -> pa.Table:
        return t.append_column("__drop", pa.nulls(t.num_rows, pa.int8()).fill_null(0))

    def tag_drop(t: pa.Table) -> pa.Table:
        arrays = []
        for c in cols:
            if c == id_col:
                arrays.append(pc.cast(t.column(t.column_names[0]), col_type[id_col]))
            else:
                arrays.append(pa.nulls(t.num_rows, col_type[c]))
        return pa.table(dict(zip(cols, arrays))).append_column(
            "__drop", pa.nulls(t.num_rows, pa.int8()).fill_null(1)
        )

    both = ds.map_batches(tag_keep, batch_format="pyarrow", zero_copy_batch=True).union(
        ids_ds.map_batches(tag_drop, batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        members = np.unique(ids[t.column("__drop").to_numpy(zero_copy_only=False) == 1])
        keep_mask = np.isin(ids, members)
        if not keep_members:
            keep_mask = ~keep_mask
        keep_mask &= t.column("__drop").to_numpy(zero_copy_only=False) == 0
        return t.filter(pa.array(keep_mask)).drop_columns(["__drop"])

    from .aggregate import grouped_apply

    return grouped_apply(both, [id_col], per_bucket, batch_format="pyarrow",
                         num_buckets=num_buckets)


def minhash_dedup_keep(ds, *, threshold: float = 0.7, num_perm: int = 64,
                       bands: int = 16, k_shingle: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       keep_cols: list[str] | None = None, num_buckets: int = 64):
    """Near-dup REMOVAL (the standard corpus-dedup output): every verified
    pair (a < b) drops its higher id, keeping the lower as canonical — the
    match-drops-newer policy (pairs are exact-Jaccard >= threshold via
    ``minhash_lsh_neardup``). Returns the kept docs' rows. Note this is the
    per-pair policy, not transitive closure: in a cluster {a,b,c} where only
    (a,b) and (b,c) verify, c survives via b being dropped — the same
    behavior a streaming match-first dedup exhibits, and what the SQL oracle
    mirrors."""
    pairs = minhash_lsh_neardup(
        ds, threshold=threshold, num_perm=num_perm, bands=bands,
        k_shingle=k_shingle, text_col=text_col, id_col=id_col,
        num_buckets=num_buckets,
    )
    drop = pairs.map_batches(
        lambda t: pa.table({id_col: t.column("doc_b")}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    keep_side = ds.map_batches(
        lambda t: t.select(keep_cols or [id_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return anti_join_ids(keep_side, drop, id_col=id_col, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash64(token_hashes: np.ndarray) -> int:
    """Classic 64-bit simhash: per-bit vote over token hashes."""
    if len(token_hashes) == 0:
        return 0
    bits = np.unpackbits(token_hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = (bits.astype(np.int32) * 2 - 1).sum(axis=0)
    sig_bits = (votes > 0).astype(np.uint64)
    return int((sig_bits << np.arange(64, dtype=np.uint64)).sum())


def simhash_batch(text: pa.Array) -> np.ndarray:
    """Vectorized per-batch simhash: flat token-hash stream -> unpacked bits
    -> per-doc vote sums via ``np.add.reduceat`` over NON-EMPTY docs' starts
    (strictly increasing, in-range — clamping a trailing empty doc's start
    dropped the last token's vote from the previous doc). Value-identical to
    the per-doc ``_simhash64``."""
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    n = len(text)
    sigs = np.zeros(n, dtype=np.uint64)
    if n:
        th, counts = _batch_token_hashes(text)
        if len(th):
            bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1,
                                 bitorder="little").astype(np.int32) * 2 - 1
            starts = np.r_[0, np.cumsum(counts)[:-1]]
            ne = counts > 0
            votes = np.add.reduceat(bits, starts[ne], axis=0)  # (n_ne, 64)
            sig_bits = (votes > 0).astype(np.uint64)
            sigs[ne] = (sig_bits << np.arange(64, dtype=np.uint64)).sum(axis=1)
    return sigs


def simhash_stage(ds, *, text_col: str = "text", id_col: str = "doc_id", concurrency=2):
    """(doc_id, simhash) — one 64-bit signature per doc."""

    def f(t: pa.Table) -> pa.Table:
        sigs = simhash_batch(t.column(text_col))
        return pa.table({id_col: t.column(id_col), "simhash": pa.array(sigs.astype(np.int64))})

    return ds.map_batches(f, batch_format="pyarrow", concurrency=concurrency, zero_copy_batch=True)


def simhash_neardup(ds, *, max_hamming: int = 3, text_col: str = "text",
                    id_col: str = "doc_id", concurrency=2, max_bucket: int = 256,
                    num_buckets: int = 64):
    """Pairs with simhash Hamming distance <= max_hamming (<= 3 gives full
    recall with 4 x 16-bit bands by pigeonhole). Shuffle key = band value.

    Skew guards: empty docs (signature 0) are excluded from banding — they
    are trivially exact duplicates of each other (exact_dedup's job) and a
    boilerplate corpus would otherwise collapse all of them into one O(n^2)
    bucket in every band. Non-empty degenerate buckets are capped at
    `max_bucket` members with pivot pairing (logged), trading the full-recall
    guarantee for bounded work only when a bucket is pathological."""
    assert max_hamming <= 3, "4-band construction guarantees recall only to distance 3"
    sigs = simhash_stage(ds, text_col=text_col, id_col=id_col, concurrency=concurrency)

    def bands(t: pa.Table) -> pa.Table:
        s = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        ne = s != 0  # empty-doc signature guard
        s, ids = s[ne], ids[ne]
        n = len(s)
        keys = np.empty(n * 4, dtype=np.int64)
        for b in range(4):
            chunk = (s >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            keys[b::4] = (chunk.astype(np.int64) << 3) | b  # (value, band) composite
        return pa.table(
            {
                "band_key": pa.array(keys),
                id_col: pa.array(np.repeat(ids, 4)),
                "simhash": pa.array(np.repeat(s.astype(np.int64), 4)),
            }
        )

    band_ds = sigs.map_batches(bands, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(t: pa.Table) -> pa.Table:
        keys = t.column("band_key").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sg = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(keys):
            (i, s), segs = _bucket_segments(keys, ids, sg)
            ai, bi = _emit_segment_pairs(i, segs, max_bucket)
            if len(ai):
                h = _popcount64(s[ai] ^ s[bi])  # XOR + LUT popcount, no per-pair Python
                keep = h <= max_hamming
                return pa.table(
                    {
                        "doc_a": pa.array(i[ai][keep]),
                        "doc_b": pa.array(i[bi][keep]),
                        "hamming": pa.array(h[keep]),
                    }
                )
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )

    found = grouped_apply(band_ds, ["band_key"], pairs, batch_format="pyarrow",
                          num_buckets=num_buckets)
    # distinct (pairs can agree on multiple bands); keep the hamming distance
    return two_phase_aggregate(found, ["doc_a", "doc_b"], [("hamming", "min", "hamming")],
                               num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# exact token-set Jaccard on a deterministic pairing (SQL-verifiable kernel)
# ---------------------------------------------------------------------------


def token_jaccard_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Jaccard of distinct-token sets for the pairing (2i, 2i+1): each doc is
    routed to group doc_id//2, the group computes |A∩B|/|A∪B|. Pure
    map+groupby — at scale the pairing key is any co-partitioning key."""

    def prep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pair_key": pa.array((ids // 2).astype(np.int64)),
                id_col: t.column(id_col),
                text_col: t.column(text_col),
            }
        )

    # Tokenize on the EXACT whitespace class RE2's \s matches ([\t\n\f\r ]),
    # so the engine and the DuckDB oracle (regexp_split_to_array '\s+') agree
    # on documents containing exotic whitespace — Python str.split() would
    # also break on \v / \x85 / \xa0 and silently diverge. Fully vectorized:
    # Arrow regex split -> batch dictionary encode -> per-doc distinct codes
    # -> per-(pair, code) multiplicity counts give |A∩B| and |A∪B| with zero
    # per-pair Python.
    def jac(t: pa.Table) -> pa.Table:
        empty = pa.table({"pair_key": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        n = t.num_rows
        if n == 0:
            return empty
        pk = t.column("pair_key").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, pk))
        pk = pk[order]
        text = pc.fill_null(t.column(text_col).combine_chunks(), "").take(pa.array(order))
        bounds = np.r_[0, np.flatnonzero(pk[1:] != pk[:-1]) + 1, n]
        sizes = np.diff(bounds)
        ok = sizes == 2
        toks = pc.split_pattern_regex(text, pattern="[\t\n\f\r ]+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        counts = np.diff(toks.offsets.to_numpy())
        doc_of = np.repeat(np.arange(n), counts)
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        codes, doc_of = codes[keep], doc_of[keep]
        V = max(len(enc.dictionary), 1)
        per_doc = np.unique(doc_of * V + codes)  # distinct (doc, token)
        pair_of_row = np.repeat(np.arange(len(sizes)), sizes)
        pair_code = pair_of_row[per_doc // V] * V + per_doc % V
        k2, cnt = np.unique(pair_code, return_counts=True)
        p2 = k2 // V
        union = np.bincount(p2, minlength=len(sizes)).astype(np.float64)
        inter = np.bincount(p2[cnt == 2], minlength=len(sizes)).astype(np.float64)
        jacc = np.where(union > 0, inter / np.maximum(union, 1.0), 0.0)
        return pa.table({"pair_key": pa.array(pk[bounds[:-1]][ok]),
                         "jaccard": pa.array(jacc[ok])})

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_apply(prepped, ["pair_key"], jac, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding near-dup (cosine >= tau)
# ---------------------------------------------------------------------------


def embedding_neardup_exact(ds, *, tau: float = 0.9, id_col: str = "vec_id",
                            emb_col: str = "embedding", concurrency=2,
                            broadcast_limit: int = 1 << 30):
    """All pairs with cosine >= tau. Baseline: the normalized (id, vector)
    matrix is broadcast once (ray.put) and each batch does one GEMM against
    it, emitting only its (a < b) half. O(n^2/p) compute, O(n*d) broadcast —
    the verification baseline; use the LSH variant at corpus scale.

    The broadcast side is built by STREAMING blocks off the (column-pruned)
    dataset — per-block zero-copy packed arrays concatenated on the driver —
    never a whole-table ``to_pandas`` / Python-object materialization, and
    it is size-gated: past ``broadcast_limit`` bytes (default 1 GiB of f64)
    the build aborts loudly and points at :func:`embedding_neardup_lsh`
    (same contract as collocations' broadcast-vs-join gate)."""
    ids_parts: list[np.ndarray] = []
    m_parts: list[np.ndarray] = []
    nbytes = 0
    pruned = ds.select_columns([id_col, emb_col])
    for b in pruned.iter_batches(batch_format="pyarrow", batch_size=4096):
        ids_parts.append(
            b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64))
        mm = embedding_matrix(b.column(emb_col)).astype(np.float64)
        m_parts.append(mm)
        nbytes += mm.nbytes + ids_parts[-1].nbytes
        if nbytes > broadcast_limit:
            raise ValueError(
                f"embedding_neardup_exact: broadcast side exceeds "
                f"{broadcast_limit} bytes — this is the O(n*d)-broadcast "
                f"verification baseline; use embedding_neardup_lsh at "
                f"corpus scale (or raise broadcast_limit explicitly)")
    ids_all = (np.concatenate(ids_parts) if ids_parts
               else np.empty(0, np.int64))
    m_all = np.vstack(m_parts) if m_parts else np.empty((0, 1), np.float64)
    m_all /= np.maximum(np.linalg.norm(m_all, axis=1, keepdims=True), 1e-12)

    def find_pairs(t: pa.Table, ids_ref, m_ref) -> pa.Table:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sims = m @ m_ref.T  # (b, N)
        bi, aj = np.nonzero(sims >= tau)
        a = ids[bi]
        b = ids_ref[aj]
        keep = a < b
        return pa.table(
            {
                "vec_a": pa.array(a[keep]),
                "vec_b": pa.array(b[keep]),
                "cos_sim": pa.array(sims[bi[keep], aj[keep]]),
            }
        )

    if m_all.nbytes < (8 << 20):
        # small reference set: ship it in the task closure (cloudpickle-
        # cached once per task spec) — fuses with the upstream read and
        # skips actor-pool startup entirely
        def fused(t: pa.Table) -> pa.Table:
            return find_pairs(t, ids_all, m_all)

        return ds.map_batches(fused, batch_format="pyarrow", zero_copy_batch=True)

    ref = ray.put((ids_all, m_all))

    class PairFinder:
        def __init__(self):
            self.ids_all, self.m_all = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            return find_pairs(t, self.ids_all, self.m_all)

    # max_restarts=0: the broadcast ref lives in the closure; a restarted
    # actor could not refetch it if the driver-side ref went out of scope
    # (ray#53727). This is a declared verification baseline, so no restarts.
    return ds.map_batches(PairFinder, batch_format="pyarrow", concurrency=concurrency,
                          zero_copy_batch=True, max_restarts=0)


def embedding_neardup_lsh(ds, *, tau: float = 0.9, num_bands: int = 16,
                          bits_per_band: int = 3, id_col: str = "vec_id",
                          emb_col: str = "embedding", concurrency=2, seed: int = 99):
    """Scale path: banded random-hyperplane LSH. Each vector gets
    ``num_bands`` independent b-bit signatures; candidate pairs share a
    bucket in >=1 band; exact cosine runs within buckets only and pairs are
    deduped by a two-phase group.

    Recall for a pair at angle θ: 1 - (1 - (1-θ/π)^b)^bands — pick (b, bands)
    for the target tau (tighter tau ⇒ fewer/bigger bits per band ⇒ far
    better selectivity; defaults here suit a loose tau≈0.45 demo corpus).
    Measured against the exact variant in tests on planted near-dups.
    """

    def sig_stage(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        n = m.shape[0]
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = np.empty(n * num_bands, dtype=np.int64)
        for b in range(num_bands):
            planes = make_planes(m.shape[1], bits_per_band, seed + 7919 * b)
            sigs = lsh_signatures(m, planes)
            # composite key: (band, signature)
            buckets[b::num_bands] = (sigs << 5) | b
        flat = np.repeat(np.arange(n), num_bands)
        return pa.table(
            {
                "bucket": pa.array(buckets),
                id_col: pa.array(ids[flat]),
                emb_col: pc.take(t.column(emb_col).combine_chunks(), pa.array(flat)),
            }
        )

    bucketed = ds.map_batches(sig_stage, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        out_a, out_b, out_s = [], [], []
        for bkt in np.unique(buckets):
            sel = buckets == bkt
            mm, ii = m[sel], ids[sel]
            sims = mm @ mm.T
            ai, bj = np.nonzero(np.triu(sims >= tau, k=1))
            a, b = ii[ai], ii[bj]
            swap = a > b
            out_a.append(np.where(swap, b, a))
            out_b.append(np.where(swap, a, b))
            out_s.append(sims[ai, bj])
        if not out_a:
            return pa.table({"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(out_a)),
                "vec_b": pa.array(np.concatenate(out_b)),
                "cos_sim": pa.array(np.concatenate(out_s)),
            }
        )

    found = grouped_apply(bucketed, ["bucket"], pairs, batch_format="pyarrow")
    return two_phase_aggregate(found, ["vec_a", "vec_b"], [("cos_sim", "max", "cos_sim")])


# ---------------------------------------------------------------------------
# Connected components over the near-dup pair graph
# ---------------------------------------------------------------------------


def connected_components(pairs, *, a_col: str = "doc_a", b_col: str = "doc_b",
                         id_col: str = "doc_id", label_col: str = "cluster_id",
                         num_buckets: int = 64, max_iters: int = 32):
    """Distributed connected components by min-label propagation: every node
    of the pair graph is labeled with the minimum node id reachable from it
    (``cluster_id``), turning verified near-dup PAIRS into transitive dup
    CLUSTERS — the semantics a corpus dedup actually needs (keep ONE
    representative per cluster, not per-pair drops).

    Scale shape: the graph is O(dup mass), far smaller than the corpus, and
    it is materialized once up front (never the corpus itself). Each
    iteration is ONE bucketed shuffle: messages and edges are co-partitioned
    on the node id, the per-bucket task min-reduces the incoming messages
    with an Arrow hash aggregate (the bucket key IS the node id, so the
    reduce is complete), then emits both the new label rows and the
    propagated ``(dst, label[src])`` messages for the next round — the
    min-aggregate is fused into the propagate stage instead of being a
    second shuffle. Labels decrease monotonically; convergence (<= graph
    diameter iterations; near-dup clusters are shallow) is detected by an
    order-independent uint64 hash-sum of the label multiset going
    stationary — an O(1) driver scalar per iteration, no diff join. The
    reference has no graph machinery (SURVEY.md §2.9); this follows the
    standard iterative min-label CC construction (cf. Hash-to-Min / CC-MR).
    """
    from .aggregate import _vec_hash_strings, grouped_apply

    sch = pairs.schema()
    id_type = dict(zip(sch.names, sch.types))[a_col]  # labels keep the native id
    # type: min over int64 ids must be numeric, not lexicographic

    edges = pairs.map_batches(
        lambda t: pa.table({
            id_col: pa.concat_arrays([
                t.column(a_col).combine_chunks(), t.column(b_col).combine_chunks(),
            ]),
            "__dst": pa.concat_arrays([
                t.column(b_col).combine_chunks(), t.column(a_col).combine_chunks(),
            ]),
            label_col: pa.nulls(2 * t.num_rows, id_type),
            "__is_lbl": pa.nulls(2 * t.num_rows, pa.int8()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()  # O(dup mass); consumed once per iteration

    empty = pa.table({id_col: pa.array([], id_type),
                      label_col: pa.array([], id_type)})
    n_edge_rows = edges.count()
    if n_edge_rows == 0:
        return ray.data.from_arrow(empty)

    from .aggregate import LOCAL_COALESCE_ROWS

    if n_edge_rows <= LOCAL_COALESCE_ROWS:
        # measured-small graph (n_edge_rows is exact — the edges table is
        # already materialized): ONE task holding the whole graph runs the
        # min-label loop in-memory to convergence, replacing 3-5 distributed
        # rounds (2 executions each). Same semantics: label = min reachable
        # id; at corpus scale the distributed iteration below runs instead.
        def local_cc(t: pa.Table) -> pa.Table:
            src = t.column(id_col).to_numpy(zero_copy_only=False)
            dst = t.column("__dst").to_numpy(zero_copy_only=False)
            nodes, inv = np.unique(np.concatenate([src, dst]),
                                   return_inverse=True)
            si, di = inv[:len(src)], inv[len(src):]
            lab = nodes.copy()
            while True:
                new = lab.copy()
                np.minimum.at(new, di, lab[si])  # edges carry both directions
                if np.array_equal(new, lab):
                    break
                lab = new
            return pa.table({id_col: pa.array(nodes).cast(id_type),
                             label_col: pa.array(lab).cast(id_type)})

        return edges.repartition(1).map_batches(local_cc, batch_format="pyarrow",
                                                batch_size=None)

    # right-size the iteration: the pair graph is usually tiny relative to
    # the corpus, and a fixed 64-way bucket fan-out would make every
    # iteration pay ~100 near-empty tasks (measured 6 s/iteration at 1 k
    # edges). Scale buckets/blocks to the edge count; both grow with the
    # graph at corpus scale.
    num_buckets = min(num_buckets, max(1, n_edge_rows // 8192 + 1))
    edges = edges.repartition(num_buckets).materialize()

    # seed messages: (src, dst) and (src, src) — the first fused step
    # min-reduces them into the initial labels
    msgs = edges.map_batches(
        lambda t: pa.table({
            id_col: pa.concat_arrays([
                t.column(id_col).combine_chunks(), t.column(id_col).combine_chunks()]),
            "__dst": pa.nulls(2 * t.num_rows, id_type),
            label_col: pa.concat_arrays([
                t.column("__dst").combine_chunks(), t.column(id_col).combine_chunks()]),
            "__is_lbl": pa.nulls(2 * t.num_rows, pa.int8()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def step(t: pa.Table) -> pa.Table:
        # message rows have a label; edge rows have __dst. Min-reduce the
        # messages per id (complete: the bucket key is the id), then emit
        # label rows + propagated messages along the out-edges.
        is_msg = pc.is_valid(t.column(label_col))
        m = t.filter(is_msg)
        e = t.filter(pc.invert(is_msg))
        agg = (pa.table({id_col: m.column(id_col), label_col: m.column(label_col)})
               .group_by(id_col).aggregate([(label_col, "min")]))
        lbl_ids = agg.column(id_col).combine_chunks()
        lbl_vals = agg.column(f"{label_col}_min").combine_chunks()
        # every edge src has >= 1 message row in its bucket (self-message at
        # seed time, own label row afterwards), so the lookup is total
        pos = pc.index_in(e.column(id_col).combine_chunks(), value_set=lbl_ids)
        prop = pc.take(lbl_vals, pos)
        n_l, n_e = len(lbl_ids), e.num_rows
        return pa.table({
            id_col: pa.concat_arrays([lbl_ids, e.column("__dst").combine_chunks()]),
            "__dst": pa.nulls(n_l + n_e, id_type),
            label_col: pa.concat_arrays([lbl_vals, prop.combine_chunks()
                                         if isinstance(prop, pa.ChunkedArray) else prop]),
            "__is_lbl": pa.concat_arrays([
                pa.nulls(n_l, pa.int8()).fill_null(1), pa.nulls(n_e, pa.int8())]),
        }).replace_schema_metadata(None)

    def checksum(out_ds) -> int:
        def h(t: pa.Table) -> pa.Table:
            t = t.filter(pc.fill_null(pc.equal(t.column("__is_lbl"), 1), False))
            joined = pc.binary_join_element_wise(
                pc.cast(t.column(id_col), pa.string()).combine_chunks(),
                pc.cast(t.column(label_col), pa.string()).combine_chunks(), "\x1f")
            if isinstance(joined, pa.ChunkedArray):
                joined = joined.combine_chunks()
            s = _vec_hash_strings(joined).sum(dtype=np.uint64)
            # reinterpret as int64: keeps Arrow-native summing (wraparound is
            # fine — this is a fingerprint, not a count)
            return pa.table({"h": pa.array([int(s.astype(np.int64))], pa.int64())})
        # wraparound sum — order-independent; labels move monotonically down
        # so a stationary sum means a stationary label multiset
        # (up to a ~2^-64 per-step collision)
        return int(out_ds.map_batches(h, batch_format="pyarrow").sum("h")) & ((1 << 64) - 1)

    prev_sum = None
    for _ in range(max_iters):
        out = grouped_apply(msgs.union(edges), [id_col], step,
                            batch_format="pyarrow", num_buckets=num_buckets).materialize()
        cur = checksum(out)
        if cur == prev_sum:
            return out.map_batches(
                lambda t: t.filter(pc.fill_null(pc.equal(t.column("__is_lbl"), 1), False))
                           .select([id_col, label_col]),
                batch_format="pyarrow", zero_copy_batch=True)
        prev_sum = cur
        msgs = out
    raise RuntimeError(f"connected_components did not converge in {max_iters} iterations")


def minhash_dedup_keep_clustered(ds, *, threshold: float = 0.7, num_perm: int = 64,
                                 bands: int = 16, k_shingle: int = 3,
                                 text_col: str = "text", id_col: str = "doc_id",
                                 keep_cols: list[str] | None = None,
                                 num_buckets: int = 64):
    """Cluster-aware near-dup removal: verified pairs -> transitive
    components -> keep exactly ONE representative (the min id) per cluster.
    Unlike ``minhash_dedup_keep``'s per-pair match-drops-newer policy, a
    chain a~b~c keeps only a (c is dropped through transitivity even though
    (a,c) never verified directly) — the textbook corpus-dedup output.
    Everything is distributed: pairs stay a Dataset, components are
    min-label propagation, the drop side feeds the bucketed anti-join."""
    pairs = minhash_lsh_neardup(
        ds, threshold=threshold, num_perm=num_perm, bands=bands,
        k_shingle=k_shingle, text_col=text_col, id_col=id_col,
        num_buckets=num_buckets,
    )
    comp = connected_components(pairs, id_col=id_col, num_buckets=num_buckets)
    drop = comp.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column(id_col), t.column("cluster_id"))))
                   .select([id_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    keep_side = ds.map_batches(
        lambda t: t.select(keep_cols or [id_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return anti_join_ids(keep_side, drop, id_col=id_col)


# ---------------------------------------------------------------------------
# benchmark decontamination (train/eval n-gram overlap)
# ---------------------------------------------------------------------------


def decontaminate(train_ds, eval_ds, *, k: int = 8, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Flag training documents that share any token ``k``-gram with the eval
    corpus (train/test contamination check, the n-gram-overlap method of the
    GPT-3 appendix C / PaLM §C decontamination procedures — public papers;
    the reference engine has no corpus machinery).

    Output: one row per CONTAMINATED training doc — (id_col, n_overlap)
    where n_overlap counts the doc's DISTINCT k-grams that occur anywhere in
    the eval set. Docs with < k tokens fall back to their distinct tokens
    (same fallback as the minhash shingle stream, so both paths share one
    kernel).

    Scale shape: the eval side (a benchmark suite — MBs, not TBs) is reduced
    to a sorted unique ``uint64`` gram-hash array on the driver and broadcast
    once via ``ray.put``; the train side is one stateless ``map_batches``
    pass doing a vectorized ``np.isin`` membership probe per batch. No
    shuffle, no driver-side large state — the standard broadcast-small-side
    pattern."""
    import ray

    def eval_grams(t: pa.Table) -> pa.Table:
        vals, _ = _batch_shingle_stream(t.column(text_col).combine_chunks(), k)
        return pa.table({"g": pa.array(np.unique(vals), pa.uint64())})

    parts = eval_ds.map_batches(eval_grams, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
    ev = np.unique(np.array([r["g"] for r in parts], dtype=np.uint64))
    ref = ray.put(ev)

    def probe(t: pa.Table) -> pa.Table:
        # light broadcast state: plain function keeps the stage fusable with
        # the read/filter upstream; ray.get is a local-plasma hit after the
        # first batch on each worker
        ev_local = ray.get(ref)
        text = t.column(text_col).combine_chunks()
        vals, cnts = _batch_shingle_stream(text, k)
        seg = np.repeat(np.arange(len(cnts)), cnts)
        order = np.lexsort((vals, seg))
        sv, ss = vals[order], seg[order]
        if len(sv):
            first = np.r_[True, (sv[1:] != sv[:-1]) | (ss[1:] != ss[:-1])]
            dv, dseg = sv[first], ss[first]
            hit = np.isin(dv, ev_local, assume_unique=False)
            n_overlap = np.bincount(dseg[hit], minlength=len(cnts))
        else:
            n_overlap = np.zeros(len(cnts), np.int64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        m = n_overlap > 0
        return pa.table({id_col: pa.array(ids[m]),
                         "n_overlap": pa.array(n_overlap[m].astype(np.int64))})

    return train_ds.map_batches(probe, batch_format="pyarrow",
                                zero_copy_batch=True)


def contamination_overlap(train_ds, eval_ds, *, k: int = 8,
                          text_col: str = "text", id_col: str = "doc_id",
                          num_buckets: int = 64):
    """Per-EVAL-doc exact n-gram contamination fraction — the reporting
    inverse of :func:`decontaminate`: for every eval document, how many of
    its distinct ``k``-grams occur anywhere in the TRAIN corpus, and what
    fraction (ppm) of the doc that is. The GPT-3 appendix-C "dirtiness"
    measurement (public paper; the reference engine has no corpus
    machinery). Same ``< k``-token raw-token fallback / shared shingle
    kernel as the minhash path.

    Output: (id_col, n_grams, n_hit, overlap_ppm) for every eval doc.

    Scale shape: the eval side is small by definition (a benchmark suite),
    so its unique gram-hash array broadcasts once via ``ray.put`` exactly
    like :func:`decontaminate`; the TRAIN side (the 100 TB side) is one
    stateless probe pass that emits only the eval-gram values it HIT —
    each partial is bounded by the eval gram count, never by train size.
    Hit grams then meet the eval (doc, gram) pairs in ONE hash-bucketed
    shuffle whose rows are (uint64, int64) pairs bounded by
    |eval grams| x (1 + hit partials); per-doc totals finish in a
    two-phase integer aggregate. No unbounded state anywhere."""
    import ray

    from .aggregate import grouped_apply, two_phase_aggregate

    def eval_pairs(t: pa.Table) -> pa.Table:
        vals, cnts = _batch_shingle_stream(t.column(text_col).combine_chunks(), k)
        seg = np.repeat(np.arange(len(cnts)), cnts)
        order = np.lexsort((vals, seg))
        sv, ss = vals[order], seg[order]
        first = (np.r_[True, (sv[1:] != sv[:-1]) | (ss[1:] != ss[:-1])]
                 if len(sv) else np.zeros(0, bool))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids[ss[first]] if len(sv) else ids[:0]),
            # two's-complement int64 reinterpretation: uint64 gram hashes
            # above 2^63 overflow Arrow int coercion in the bucket exchange;
            # equality (all this operator needs) is bijection-preserved
            "g": pa.array((sv[first] if len(sv) else sv).view(np.int64)),
            "hit": pa.array(np.zeros(int(first.sum()), np.int64)),
        })

    pairs = eval_ds.map_batches(eval_pairs, batch_format="pyarrow",
                                zero_copy_batch=True)

    def eval_grams(t: pa.Table) -> pa.Table:
        vals, _ = _batch_shingle_stream(t.column(text_col).combine_chunks(), k)
        return pa.table({"g": pa.array(np.unique(vals), pa.uint64())})

    parts = eval_ds.map_batches(eval_grams, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
    ev = np.unique(np.array([r["g"] for r in parts], dtype=np.uint64))
    ref = ray.put(ev)

    def probe(t: pa.Table) -> pa.Table:
        ev_local = ray.get(ref)
        vals, _ = _batch_shingle_stream(t.column(text_col).combine_chunks(), k)
        u = np.unique(vals)
        hit = u[np.isin(u, ev_local)]
        return pa.table({
            id_col: pa.array(np.full(len(hit), -1, np.int64)),
            "g": pa.array(hit.view(np.int64)),
            "hit": pa.array(np.ones(len(hit), np.int64)),
        })

    tagged = pairs.union(train_ds.map_batches(probe, batch_format="pyarrow",
                                              zero_copy_batch=True))

    def mark(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False)
        side = t.column("hit").to_numpy(zero_copy_only=False)
        doc = t.column(id_col).to_numpy(zero_copy_only=False)
        hitset = np.unique(g[side == 1])
        m = side == 0
        return pa.table({
            id_col: pa.array(doc[m]),
            "hit": pa.array(np.isin(g[m], hitset).astype(np.int64)),
        })

    marked = grouped_apply(tagged, ["g"], mark, batch_format="pyarrow",
                           num_buckets=num_buckets)
    agg = two_phase_aggregate(
        marked, [id_col],
        [("hit", "sum", "n_hit"), ("hit", "count", "n_grams")],
        num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t.column(id_col),
            "n_grams": pc.cast(t.column("n_grams"), pa.int64()),
            "n_hit": pc.cast(t.column("n_hit"), pa.int64()),
            "overlap_ppm": pc.cast(pc.divide(
                pc.multiply(pc.cast(t.column("n_hit"), pa.int64()), 1_000_000),
                pc.cast(t.column("n_grams"), pa.int64())), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# intra-corpus duplicate k-gram statistics (exact-substring dedup signal)
# ---------------------------------------------------------------------------


def dup_ngram_stats(ds, *, k: int = 8, min_count: int = 2,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_buckets: int = 64):
    """Per-document duplicate k-gram statistics — the exact-substring
    duplication signal of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"), at token-k-gram granularity: a gram
    position is *duplicated* when its k-gram occurs >= ``min_count`` times
    corpus-wide (within-doc repeats count toward the total).

    Output: one row per doc with >= 1 token — (id_col, n_grams, n_dup)
    where n_grams is the doc's positional gram count (docs shorter than k
    tokens fall back to their raw token stream, same kernel as minhash) and
    n_dup the positions whose gram is duplicated.

    Scale shape: unlike ``decontaminate`` the duplicate-gram set is
    corpus-sized, so nothing is broadcast. One pass reduces each batch to
    distinct (doc, gram) rows with positional multiplicity, bucketed by the
    gram hash; ONE bucketed shuffle then suffices because every occurrence
    of a gram lands in the same bucket — corpus-wide totals are segment
    sums inside the bucket reduce, no separate counting phase or gram-set
    join. Per-doc partials from each bucket are summed by a final tiny
    two-phase aggregate keyed on doc_id. Shuffle volume is O(distinct grams
    per doc) rows of 3 ints — inherent to substring-level dedup. Gram
    identity is the 64-bit rolling-poly hash (collisions deterministic-
    negligible, same caveat as ``decontaminate``)."""
    from .aggregate import two_phase_aggregate

    mask = np.uint64(num_buckets - 1)

    def probe(t: pa.Table) -> pa.Table:
        text = t.column(text_col).combine_chunks()
        vals, cnts = _batch_shingle_stream(text, k)
        seg = np.repeat(np.arange(len(cnts)), cnts)
        order = np.lexsort((vals, seg))
        sv, ss = vals[order], seg[order]
        if len(sv):
            first = np.r_[True, (sv[1:] != sv[:-1]) | (ss[1:] != ss[:-1])]
            grp = np.cumsum(first) - 1
            n_pos = np.bincount(grp).astype(np.int64)
            dv, dseg = sv[first], ss[first]
        else:
            n_pos = np.zeros(0, np.int64)
            dv, dseg = sv, ss
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "__b": pa.array((dv & mask).astype(np.int64)),
            id_col: pa.array(ids[dseg]),
            "g": pa.array(dv, pa.uint64()),
            "n_pos": pa.array(n_pos),
        })

    pr = ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False)
        n_pos = t.column("n_pos").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g, n_pos, ids = g[order], n_pos[order], ids[order]
        first = np.r_[True, g[1:] != g[:-1]]
        grp = np.cumsum(first) - 1
        tot = np.zeros(grp[-1] + 1 if len(grp) else 0, np.int64)
        np.add.at(tot, grp, n_pos)
        dup = tot[grp] >= min_count
        # per-doc partials within this bucket
        uids, uinv = np.unique(ids, return_inverse=True)
        n_grams = np.zeros(len(uids), np.int64)
        np.add.at(n_grams, uinv, n_pos)
        n_dup = np.zeros(len(uids), np.int64)
        np.add.at(n_dup, uinv[dup], n_pos[dup])
        return pa.table({id_col: pa.array(uids), "n_grams": pa.array(n_grams),
                         "n_dup": pa.array(n_dup)})

    from .aggregate import grouped_apply

    partials = grouped_apply(pr, ["__b"], per_bucket,
                             num_buckets=num_buckets, batch_format="pyarrow")
    return two_phase_aggregate(partials, [id_col],
                               [("n_grams", "sum", "n_grams"),
                                ("n_dup", "sum", "n_dup")],
                               num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# span-level exact dedup (C4 / RefinedWeb line dedup restated for token spans)
# ---------------------------------------------------------------------------


def span_dedup(ds, *, width: int = 10, id_col: str = "doc_id",
               text_col: str = "text", num_buckets: int = 64):
    """Corpus-wide exact span dedup: every document is cut into fixed-width
    token spans (the tokenized-corpus restatement of C4/RefinedWeb *line*
    dedup — their unit is a text line / 3-sentence span; ours is a
    ``width``-token window since the corpus has no line structure), each
    distinct span survives only at its FIRST global occurrence (minimum
    ``(doc_id, span_idx)``), and documents are reassembled from their
    surviving spans in original order. Documents whose every span was seen
    earlier elsewhere vanish entirely — exactly the C4 semantics.

    Scale shape: two bucketed shuffles, both O(corpus tokens) — (1) spans
    hash-bucketed by span text, each bucket picks winners with one lexsort
    (complete: the bucket key is the span), (2) winners hash-bucketed by
    doc id for reassembly via offsets + ``binary_join``. No driver state,
    no per-row Python; skewed spans (boilerplate) dilute across buckets by
    span-hash and cost one sorted segment, not O(n^2).
    """

    def explode(t: pa.Table) -> pa.Table:
        return _explode_spans(t, width, id_col, text_col)

    def winners(t: pa.Table) -> pa.Table:
        # bucket key is the span text, so each distinct span's occurrences
        # are all here: min (doc_id, span_idx) per span via one lexsort
        enc = pc.dictionary_encode(t.column("span").combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        d = t.column(id_col).to_numpy(zero_copy_only=False)
        si = t.column("span_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((si, d, codes))
        first = np.r_[True, codes[order][1:] != codes[order][:-1]]
        keep = order[first]
        return pa.table({id_col: pa.array(d[keep]),
                         "span_idx": pa.array(si[keep]),
                         "span": t.column("span").combine_chunks().take(pa.array(keep))})

    rows = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    surv = grouped_apply(rows, ["span"], winners, batch_format="pyarrow",
                         num_buckets=num_buckets)
    return grouped_apply(surv, [id_col],
                         lambda t: _reassemble_spans(t, id_col),
                         batch_format="pyarrow", num_buckets=num_buckets)


def _explode_spans(t: pa.Table, width: int, id_col: str,
                   text_col: str) -> pa.Table:
    """Cut each document into fixed-width token spans — the shared explode
    kernel of span_dedup and span_boilerplate (vectorized: one offsets
    array over the flat token stream, no per-row Python)."""
    flat, _, counts = split_tokens(t.column(text_col))
    doc_ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    tok_starts = np.r_[0, np.cumsum(counts)]
    n_spans = (counts + width - 1) // width
    total = int(n_spans.sum())
    if total == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "span_idx": pa.array([], pa.int64()),
                         "span": pa.array([], pa.string())})
    span_doc = np.repeat(np.arange(len(counts)), n_spans)
    span_idx = np.arange(total) - np.repeat(np.r_[0, np.cumsum(n_spans)[:-1]], n_spans)
    # spans tile the flat token stream contiguously (within and across
    # docs), so start offsets alone define the list boundaries
    starts = (tok_starts[span_doc] + span_idx * width).astype(np.int32)
    offsets = pa.array(np.r_[starts, np.int32(len(flat))], pa.int32())
    spans = pc.binary_join(pa.ListArray.from_arrays(offsets, flat), " ")
    return pa.table({id_col: pa.array(doc_ids[span_doc]),
                     "span_idx": pa.array(span_idx.astype(np.int64)),
                     "span": spans})


def _reassemble_spans(t: pa.Table, id_col: str) -> pa.Table:
    """Rebuild documents from surviving (doc, span_idx, span) rows in
    original span order — the shared phase-2 kernel."""
    d = t.column(id_col).to_numpy(zero_copy_only=False)
    si = t.column("span_idx").to_numpy(zero_copy_only=False)
    order = np.lexsort((si, d))
    d = d[order]
    spans = t.column("span").combine_chunks().take(pa.array(order))
    firsts = np.r_[True, d[1:] != d[:-1]]
    offsets = pa.array(np.r_[np.flatnonzero(firsts), np.int32(len(d))].astype(np.int32))
    return pa.table({
        id_col: pa.array(d[firsts]),
        "text_dedup": pc.binary_join(pa.ListArray.from_arrays(offsets, spans), " "),
        "n_kept": pa.array(np.diff(offsets.to_numpy().astype(np.int64))),
    })


def span_boilerplate(ds, *, width: int = 10, min_docs: int = 2,
                     id_col: str = "doc_id", text_col: str = "text",
                     num_buckets: int = 64):
    """Cross-document boilerplate removal (the CCNet/RefinedWeb frequency
    rule, restated over fixed-width token spans since this corpus has no
    line structure): a span occurring in >= ``min_docs`` DISTINCT documents
    is boilerplate and EVERY occurrence drops — unlike :func:`span_dedup`,
    which keeps the first. Documents reassemble from surviving spans;
    documents that were pure boilerplate vanish.

    Scale shape: identical to span_dedup — two bucketed shuffles, both
    O(corpus tokens). Phase 1 buckets by span text, so each bucket holds
    ALL occurrences of its spans and computes the distinct-doc count with
    one lexsort + bincount (no global state); phase 2 buckets by doc for
    reassembly. A mega-boilerplate span (the skew case: a site footer on
    10^9 pages) costs one sorted segment in one bucket, not a broadcast."""

    def survivors(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t.column("span").combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        d = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((d, codes))
        c_s, d_s = codes[order], d[order]
        new_span = np.r_[True, c_s[1:] != c_s[:-1]]
        grp = np.cumsum(new_span) - 1
        new_doc = new_span | np.r_[True, d_s[1:] != d_s[:-1]]
        ndocs = np.bincount(grp[new_doc])  # distinct docs per span code
        keep = np.flatnonzero((ndocs < min_docs)[codes])
        return pa.table({
            id_col: pa.array(d[keep]),
            "span_idx": pa.array(
                t.column("span_idx").to_numpy(zero_copy_only=False)[keep]),
            "span": t.column("span").combine_chunks().take(pa.array(keep)),
        })

    rows = ds.map_batches(lambda t: _explode_spans(t, width, id_col, text_col),
                          batch_format="pyarrow", zero_copy_batch=True)
    surv = grouped_apply(rows, ["span"], survivors, batch_format="pyarrow",
                         num_buckets=num_buckets)
    return grouped_apply(surv, [id_col],
                         lambda t: _reassemble_spans(t, id_col),
                         batch_format="pyarrow", num_buckets=num_buckets)


def span_dedup_indoc(ds, *, width: int = 2, id_col: str = "doc_id",
                     text_col: str = "text"):
    """IN-DOCUMENT repetition removal (the Dolma/RefinedWeb within-page
    dedup rule, restated over fixed-width token spans like its corpus-wide
    siblings): a span that repeats WITHIN a document survives only at its
    first ``span_idx``; occurrences in other documents are untouched.
    Documents reassemble from surviving spans in original order; docs with
    no tokens vanish (same convention as :func:`span_dedup`).

    Scale shape: the unit of uniqueness is a single document, so this is a
    single stateless ``map_batches`` — NO shuffle at any corpus size
    (contrast span_dedup / span_boilerplate, which must exchange spans
    corpus-wide). Per batch: one explode, one lexsort over (doc, span
    code, span_idx), one reassemble."""

    def kernel(t: pa.Table) -> pa.Table:
        rows = _explode_spans(t, width, id_col, text_col)
        if rows.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "text_dedup": pa.array([], pa.string()),
                             "n_kept": pa.array([], pa.int64())})
        spans = rows.column("span").combine_chunks()
        codes = pc.dictionary_encode(spans).indices.to_numpy(zero_copy_only=False)
        d = rows.column(id_col).to_numpy(zero_copy_only=False)
        si = rows.column("span_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((si, codes, d))
        d_s, c_s = d[order], codes[order]
        first = np.r_[True, (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
        keep = order[first]
        sub = pa.table({id_col: pa.array(d[keep]),
                        "span_idx": pa.array(si[keep]),
                        "span": spans.take(pa.array(keep))})
        return _reassemble_spans(sub, id_col)

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def minhash_dedup_keep_best(ds, *, threshold: float = 0.7, num_perm: int = 64,
                            bands: int = 16, k_shingle: int = 3,
                            text_col: str = "text", id_col: str = "doc_id",
                            keep_cols: list[str] | None = None,
                            num_buckets: int = 64):
    """QUALITY-AWARE cluster dedup: per transitive near-dup cluster keep the
    member with the MOST tokens (tie -> lowest id) instead of blindly the
    min id — the curation policy that preserves the fullest copy of a
    duplicated document (truncated / clipped variants drop).

    Pipeline (all distributed): verified pairs -> min-label components ->
    co-partition members with their token counts (bucketed join on id) ->
    per-cluster argmax via grouped_apply -> bucketed anti-join of the
    losers against the corpus."""
    import pandas as pd

    from .aggregate import grouped_apply
    from .join import bucket_hash_join

    pairs = minhash_lsh_neardup(
        ds, threshold=threshold, num_perm=num_perm, bands=bands,
        k_shingle=k_shingle, text_col=text_col, id_col=id_col,
        num_buckets=num_buckets,
    )
    comp = connected_components(pairs, id_col=id_col, num_buckets=num_buckets)

    def tok_counts(t: pa.Table) -> pa.Table:
        _, _, n = split_tokens(t.column(text_col))
        return pa.table({id_col: t.column(id_col), "n_tokens": pa.array(n)})

    counts = ds.map_batches(tok_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
    members = bucket_hash_join(comp, counts, on=id_col,
                               num_buckets=num_buckets)

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster_id", "n_tokens", id_col],
                          ascending=[True, False, True], kind="mergesort")
        return g[g["cluster_id"].duplicated()][[id_col]].reset_index(drop=True)

    drop = grouped_apply(members, ["cluster_id"], losers,
                         num_buckets=num_buckets)
    keep_side = ds.map_batches(
        lambda t: t.select(keep_cols or [id_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return anti_join_ids(keep_side, drop, id_col=id_col)


def dup_cluster_sizes(cc, *, num_buckets: int = 16):
    """Duplicate-family size histogram — the corpus-forensics summary of a
    dedup run: for each transitive-cluster size, how many families have it.
    Input = the (doc_id, cluster_id) output of :func:`connected_components`;
    two vocab-free two-phase aggregates (by cluster, then by size), driver
    never sees per-doc rows."""
    from .aggregate import two_phase_aggregate

    sizes = two_phase_aggregate(cc, ["cluster_id"],
                                [("doc_id", "count", "cluster_size")],
                                num_buckets=num_buckets)

    def drop_key(t: pa.Table) -> pa.Table:
        return t.select(["cluster_size"]).append_column(
            "one", pa.nulls(t.num_rows, pa.int64()).fill_null(1))

    per_size = sizes.map_batches(drop_key, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return two_phase_aggregate(per_size, ["cluster_size"],
                               [("one", "sum", "n_clusters")],
                               num_buckets=num_buckets)


OVERLAP_FP_TOKENS = 8
_OVERLAP_SCHEMA = pa.schema([("src_a", pa.string()), ("src_b", pa.string()),
                             ("n_shared", pa.int64())])


def source_overlap(ds, *, text_col: str = "text", src_col: str = "source",
                   fp_tokens: int = OVERLAP_FP_TOKENS, num_buckets: int = 64):
    """Cross-source contamination matrix: for every source pair (a < b),
    the number of DISTINCT document fingerprints present in BOTH sources —
    the inter-snapshot leakage signal (e.g. web snapshot A re-crawled into
    snapshot B). The fingerprint is the first ``fp_tokens`` normalized
    tokens hashed (what contamination checks key on — exact-text equality
    misses trivially perturbed copies).

    Scale shape: (fp_hash, source) pairs deduped per batch, then ONE
    hash-bucketed shuffle; inside a bucket a self-merge on the hash emits
    (src_a, src_b, partial count) rows — exact per bucket because each hash
    lives in exactly one bucket — and a tiny two-phase sum folds buckets.
    Driver state = n_sources^2 rows."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate
    from .enrich import _hash_values
    from .textstats import normalize_text

    def prep(t: pa.Table) -> pa.Table:
        norm = normalize_text(t.column(text_col))
        toks = pc.split_pattern(norm.combine_chunks() if
                                isinstance(norm, pa.ChunkedArray) else norm, " ")
        fp = pc.binary_join(pc.list_slice(toks, 0, fp_tokens), " ")
        tbl = pa.table({"h": _hash_values(fp, "md5"),
                        "src": pc.cast(t.column(src_col), pa.string())})
        df = tbl.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False) \
                       .replace_schema_metadata(None)

    pairs = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates()
        m = df.merge(df, on="h")
        m = m[m.src_x < m.src_y]
        out = (m.groupby(["src_x", "src_y"], sort=False).size()
               .reset_index(name="n_shared")
               .rename(columns={"src_x": "src_a", "src_y": "src_b"}))
        # pinned schema so all-empty buckets still carry typed columns;
        # metadata stripped (b'pandas' blob breaks Ray's schema hashing)
        return pa.Table.from_pandas(out, schema=_OVERLAP_SCHEMA,
                                    preserve_index=False) \
                       .replace_schema_metadata(None)

    partials = grouped_apply(pairs, ["h"], per_bucket, num_buckets=num_buckets)
    return two_phase_aggregate(partials, ["src_a", "src_b"],
                               [("n_shared", "sum", "n_shared")],
                               num_buckets=8)


def lsh_params(threshold: float, num_perm: int = 64, *,
               fp_weight: float = 0.5) -> tuple[int, int]:
    """Optimal (bands, rows_per_band) for a MinHash LSH at ``threshold`` —
    the standard banding-parameter search (Leskovec/Rajaraman/Ullman ch.3;
    the same integral-minimization datasketch ships): over every (b, r)
    with b*r <= num_perm, numerically integrate the false-positive mass
    below the threshold and the false-negative mass above it of the
    S-curve ``1 - (1 - s^r)^b`` and pick the minimizer of
    ``fp_weight * FP + (1 - fp_weight) * FN``.

    Pure driver-side arithmetic (no floats cross an engine boundary);
    pinned by tests against exhaustive search."""
    xs = (np.arange(1000) + 0.5) / 1000.0
    best, best_err = (1, num_perm), float("inf")
    for b in range(1, num_perm + 1):
        r = num_perm // b
        if r == 0:
            break
        prob = 1.0 - (1.0 - xs ** r) ** b
        fp = prob[xs < threshold].sum() / 1000.0
        fn = (1.0 - prob[xs >= threshold]).sum() / 1000.0
        err = fp_weight * fp + (1.0 - fp_weight) * fn
        if err < best_err:
            best, best_err = (b, r), err
    return best


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (the compact-broadcast scale path)
# ---------------------------------------------------------------------------

BLOOM_BITS_LOG2 = 20
BLOOM_HASHES = 3


def _gram_strings(text: pa.Array, k: int) -> tuple[pa.Array, np.ndarray]:
    """k-token gram STRINGS + the doc index of each gram (same windows and
    <k-token raw-token fallback as ``_batch_shingle_stream``, but literal
    strings instead of rolling-poly hashes — needed when the downstream
    arithmetic must be mirrored in SQL via md5 of the gram text). The
    k-way join is the vectorized Arrow kernel, no per-row Python."""
    flat, doc_of, counts = split_tokens(text)
    n = len(flat)
    if n >= k:
        flat_c = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        joined = flat_c.slice(0, n - k + 1)
        for j in range(1, k):
            joined = pc.binary_join_element_wise(
                joined, flat_c.slice(j, n - k + 1), " ")
        valid = doc_of[: n - k + 1] == doc_of[k - 1:]
    else:
        joined = pa.array([], pa.string())
        valid = np.zeros(0, bool)
    short = counts < k
    short_tok = short[doc_of] if n else np.zeros(0, bool)
    grams = pa.concat_arrays([
        joined.filter(pa.array(valid)) if len(valid) else joined,
        (flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
         ).filter(pa.array(short_tok)) if n else pa.array([], pa.string()),
    ])
    gdoc = np.r_[doc_of[: max(n - k + 1, 0)][valid], doc_of[short_tok]] \
        if n else np.zeros(0, np.int64)
    return grams, gdoc.astype(np.int64)


def _bloom_hashes(grams: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) 48-bit md5 halves per gram — double hashing (Kirsch &
    Mitzenmacher 2006): position_j = (h1 + j*h2) mod m. md5 of the literal
    gram text keeps every bit position SQL-mirrorable (HUGEINT parse of
    hex substrings)."""
    import hashlib

    h1 = np.empty(len(grams), np.int64)
    h2 = np.empty(len(grams), np.int64)
    for i, g in enumerate(grams):
        d = hashlib.md5(g.encode()).digest()
        h1[i] = int.from_bytes(d[:6], "big")
        h2[i] = int.from_bytes(d[6:12], "big")
    return h1, h2


def decontaminate_bloom(train_ds, eval_ds, *, k: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        num_bits_log2: int = BLOOM_BITS_LOG2,
                        num_hashes: int = BLOOM_HASHES):
    """Bloom-filter benchmark decontamination — the 100 TB shape of
    :func:`decontaminate`: instead of broadcasting the eval side's full
    gram-hash array (grows with the benchmark suite), the eval grams are
    folded into a fixed ``2^num_bits_log2``-bit Bloom filter (128 KiB at
    the default) built from per-batch DISTINCT-position partials, so the
    broadcast is CONSTANT-SIZE regardless of eval-corpus size. Train-side
    probe is one stateless vectorized pass; hits are a deterministic
    superset of the exact overlap (Bloom false positives only — callers
    route flagged docs to the exact check or drop them conservatively).

    Output: (id_col, n_bloom_hits) per training doc with >= 1 hit, where
    n_bloom_hits counts the doc's DISTINCT k-grams whose ``num_hashes``
    bit positions are all set. Bit positions use md5 double hashing of the
    literal gram text, so the DuckDB oracle reproduces the filter (and its
    false positives) bit-for-bit.

    SIZING: keep the load factor (num_hashes * eval_grams / 2^num_bits_log2)
    under ~0.1 — per-gram FP = load^num_hashes. The default 2^20 bits suits
    a benchmark-suite eval side (~30k grams); a 200k-gram eval needs 2^24
    (2 MiB — still constant vs corpus size). Measured at 500k docs in
    scripts/scale_probe.py."""
    m = 1 << num_bits_log2

    def eval_positions(t: pa.Table) -> pa.Table:
        grams, _ = _gram_strings(t.column(text_col).combine_chunks(), k)
        uniq = pc.unique(grams).to_pylist()
        h1, h2 = _bloom_hashes(uniq)
        pos = np.unique(np.concatenate(
            [(h1 + j * h2) % m for j in range(num_hashes)])) \
            if len(uniq) else np.empty(0, np.int64)
        return pa.table({"p": pa.array(pos, pa.int64())})

    parts = eval_ds.map_batches(eval_positions, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
    bits = np.zeros(m, bool)
    if parts:
        bits[np.array([r["p"] for r in parts], dtype=np.int64)] = True
    ref = ray.put(bits)

    def probe(t: pa.Table) -> pa.Table:
        bits_l = ray.get(ref)
        grams, gdoc = _gram_strings(t.column(text_col).combine_chunks(), k)
        n_docs = t.num_rows
        if len(grams):
            d = pc.dictionary_encode(grams)
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            v = len(d.dictionary)
            h1, h2 = _bloom_hashes(d.dictionary.to_pylist())
            hit_dict = np.ones(v, bool)
            for j in range(num_hashes):
                hit_dict &= bits_l[(h1 + j * h2) % m]
            per_doc = np.unique(gdoc * v + codes)  # distinct (doc, gram)
            hits = np.bincount((per_doc // v)[hit_dict[per_doc % v]],
                               minlength=n_docs)
        else:
            hits = np.zeros(n_docs, np.int64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        mm = hits > 0
        return pa.table({id_col: pa.array(ids[mm]),
                         "n_bloom_hits": pa.array(hits[mm].astype(np.int64))})

    return train_ds.map_batches(probe, batch_format="pyarrow",
                                zero_copy_batch=True)


# ---------------------------------------------------------------------------
# duplicate-conversation detection (exact, over the transcripts table)
# ---------------------------------------------------------------------------

DUPCONVS_VERSION = 1


def dup_convs_path(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Pure cache path (never builds) — the oracle SQL embeds it without
    side effects; the query callable ensures the build first."""
    import os

    from ..generator import sf_from_dir

    return os.path.join(
        root, f"dupconvs_g{DUPCONVS_VERSION}_sf{sf_from_dir(sf_dir):g}")


def ensure_dup_convs(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Transcripts with PLANTED duplicate conversations: every conversation
    whose md5(conv_id) hex starts with '0'/'1'/'2' (~19%, deterministic,
    id-format-agnostic) is appended verbatim under ``conv_id || '-dup'``.
    Pure function of the transcripts fixture (itself a pure function of
    sf), cached like the other derived fixtures."""
    import glob
    import hashlib
    import os
    import shutil

    import pyarrow.parquet as pq

    from ..generator import ensure_transcripts

    out = dup_convs_path(sf_dir, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    tdir = ensure_transcripts(sf_dir)
    cols = ["conv_id", "turn_idx", "role", "text"]
    t = pa.concat_tables([pq.read_table(f, columns=cols)
                          for f in sorted(glob.glob(f"{tdir}/*.parquet"))])
    uniq = pc.unique(t.column("conv_id").combine_chunks()).to_pylist()
    dup_ids = sorted(c for c in uniq
                     if hashlib.md5(c.encode()).hexdigest()[0] in "012")
    dup = t.filter(pc.is_in(t.column("conv_id"),
                            value_set=pa.array(dup_ids, pa.string())))
    dup = dup.set_column(
        0, "conv_id",
        pc.binary_join_element_wise(dup.column("conv_id").combine_chunks(),
                                    pa.scalar("-dup"), ""))
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.concat_tables([t, dup]),
                   os.path.join(tmp, "part-0000.parquet"),
                   row_group_size=16384)
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def conv_dedup(ds, *, key: str = "conv_id", order_col: str = "turn_idx",
               role_col: str = "role", text_col: str = "text",
               num_buckets: int = 64):
    """Exact duplicate-CONVERSATION detection: two conversations are
    duplicates iff their full turn sequences match on (turn order, role,
    text). Returns (conv_hash, conv_id = lexicographic min, n_dups) — the
    conversation-level analogue of :func:`exact_dedup`.

    Scale shape: each turn hashes to md5(role || US || text) BEFORE any
    exchange, so text never moves; the bucketed shuffle carries (conv_id,
    turn_idx, 32-hex) rows; each bucket folds its conversations' turn
    hashes into one conversation hash with a single sorted scan; the final
    exchange groups 1-row-per-conv (hash, id) pairs. A 10^6-turn
    conversation costs one sorted segment in one bucket — never a broadcast
    or a driver collect."""
    import hashlib

    import pandas as pd

    def prep(t: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(
            t.column(role_col).combine_chunks(),
            t.column(text_col).combine_chunks(), "\x1f")
        return pa.table({key: t.column(key),
                         order_col: t.column(order_col),
                         "turn_h": _hash_values(joined, "md5")})

    hashed_turns = ds.map_batches(prep, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({key: pd.Series([], dtype=str),
                                 "conv_hash": pd.Series([], dtype=str)})
        g = g.sort_values([key, order_col], kind="mergesort")
        kv = g[key].to_numpy()
        hv = g["turn_h"].to_numpy()
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
        ends = np.r_[starts[1:], len(kv)]
        return pd.DataFrame({
            key: kv[starts],
            "conv_hash": [hashlib.md5("".join(hv[s:e]).encode()).hexdigest()
                          for s, e in zip(starts, ends)],
        })

    per_conv = grouped_apply(hashed_turns, [key], per_bucket,
                             num_buckets=num_buckets)
    return two_phase_aggregate(
        per_conv, ["conv_hash"],
        [(key, "min", key), (key, "count", "n_dups")],
        num_buckets=num_buckets)


def dedup_rate_by_source(ds, *, source_col: str = "source",
                         text_col: str = "text", id_col: str = "doc_id",
                         num_buckets: int = 64):
    """Per-source duplication rollup — the curation dashboard metric that
    decides which crawl sources get exact-dedup'd first. Returns one row
    per source: (source, n_docs, n_unique, n_dup_docs = n_docs - n_unique).

    Scale shape: text hashes on the map side (only (source, 32-hex) rows
    ever shuffle), one two-phase aggregate collapses duplicates per
    (source, hash), a per-batch combiner then reduces the hash table to
    per-source partials before the second (tiny, one-row-per-source)
    exchange — the corpus shuffles once, by hash."""
    hashed = ds.map_batches(
        lambda t: pa.table({source_col: t.column(source_col),
                            "text_hash": _hash_values(t.column(text_col),
                                                      "md5")}),
        batch_format="pyarrow", zero_copy_batch=True)
    groups = two_phase_aggregate(
        hashed, [source_col, "text_hash"],
        [("text_hash", "count", "c")], num_buckets=num_buckets)

    def to_partial(t: pa.Table) -> pa.Table:
        return pa.table({source_col: t.column(source_col),
                         "n_docs": t.column("c"),
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    per_hash = groups.map_batches(to_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
    rolled = two_phase_aggregate(
        per_hash, [source_col],
        [("n_docs", "sum", "n_docs"), ("one", "sum", "n_unique")],
        num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        nd = t.column("n_docs").to_numpy(zero_copy_only=False)
        nu = t.column("n_unique").to_numpy(zero_copy_only=False)
        return t.append_column("n_dup_docs", pa.array(nd - nu))

    return rolled.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def dup_rate_curve(ds, *, text_col: str = "text", ts_col: str = "ts",
                   num_buckets: int = 32):
    """Crawl-duplication growth curve over the TIME axis: a row is a
    duplicate when its content hash already appeared on ANY earlier day
    (first-day per hash, strictly-earlier rule — deterministic without a
    global sequence), and the per-day duplicate rate shows whether the
    ingest frontier is saturating. Output (day, n_rows, n_dups, dup_e6).

    Scale shape: content md5s reduce to (hash, min day); a bucketed hash
    join flags each row against its hash's first day; only
    (hash, day) rows shuffle — text never moves."""
    from .aggregate import two_phase_aggregate
    from .enrich import _hash_values
    from .join import bucket_hash_join

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        return pa.table({"h": _hash_values(t.column(text_col), "md5"),
                         "day": pc.divide(us, 86_400_000_000)})

    hashed = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
    firsts = two_phase_aggregate(hashed, ["h"],
                                 [("day", "min", "first_day")],
                                 num_buckets=num_buckets)
    j = bucket_hash_join(hashed, firsts, on="h", num_buckets=num_buckets)

    def flag(t: pa.Table) -> pa.Table:
        d = t.column("day").to_numpy(zero_copy_only=False)
        fd = t.column("first_day").to_numpy(zero_copy_only=False)
        return pa.table({
            "day": t.column("day"),
            "one": pa.nulls(len(d), pa.int64()).fill_null(1),
            "dup": pa.array((d > fd).astype(np.int64))})

    agg = two_phase_aggregate(
        j.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True),
        ["day"], [("one", "sum", "n_rows"), ("dup", "sum", "n_dups")],
        num_buckets=4)

    def rate(t: pa.Table) -> pa.Table:
        n = t.column("n_rows").to_numpy(zero_copy_only=False)
        d = t.column("n_dups").to_numpy(zero_copy_only=False)
        return t.append_column(
            "dup_e6", pa.array(d * 1_000_000 // np.maximum(n, 1)))

    return agg.map_batches(rate, batch_format="pyarrow",
                           zero_copy_batch=True)
