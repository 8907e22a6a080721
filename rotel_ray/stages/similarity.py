"""Similarity search over an embedding column (``list<float>``).

The ANN family, per the large-scale-training-pipeline operator set: exact
and approximate top-k (below), distributed k-means + SemDeDup, and the
quantization scale path (``quantize_embeddings`` scalar codes,
``pq_codes``/``pq_search`` product quantization with integer ADC). The two
search baselines:

- ``brute_force_topk`` — the exact baseline: numpy matmul per batch against a
  broadcast (``ray.put`` once) query matrix, global top-k via per-batch
  partial top-k + a tiny final reduce. O(n·d) work, fully streaming, no
  shuffle; this is the shape that holds at 10^9 vectors (each batch does one
  GEMM; the only global step reduces ``num_batches × k`` candidate rows).
- ``lsh_topk`` — the scale path: random-hyperplane LSH (seeded, deterministic)
  assigns each vector a b-bit signature; the query probes all buckets within
  Hamming distance ``probe_hamming`` of its own signature, and only candidate
  rows get the exact cosine. Recall < 1 by construction (verified ≥ threshold
  against the exact baseline in tests), cost drops by the bucket selectivity.

The reference has no vector ops (SURVEY.md §2.9); these are the additive
training-data operators the engine needs at 100 TB.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

LSH_SEED = 1234


def embedding_matrix(col) -> np.ndarray:
    """Zero-copy-ish list<float> column -> (n, d) float32 matrix.

    Uses the Arrow values buffer directly (one reshape, no per-row Python);
    requires uniform list widths (enforced).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        return col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), d)
    offs = col.offsets.to_numpy()
    widths = np.diff(offs)
    if len(widths) == 0:
        return np.empty((0, 0), dtype=np.float32)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged embedding column")
    return col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), d)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def cosine_scores_stage(ds, query_vec: np.ndarray, *, id_col: str = "vec_id",
                        emb_col: str = "embedding"):
    """Append an exact cosine ``sim`` column vs one broadcast query vector."""
    qn = np.asarray(query_vec, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)

    # a single d-dim query vector is LIGHT state: a plain task function with
    # the vector in its closure ships once per task spec (cloudpickle-cached
    # by Ray), fuses with the upstream read (an actor pool here forces an
    # object-store hop — see enrich.py), and avoids the actor-restart
    # object-store warning (ray#53727). The genuinely large broadcast sides
    # (IVF centroids, LSH planes) stay on ray.put + actor pools below.
    def cosine(t: pa.Table) -> pa.Table:
        m = _normalize(embedding_matrix(t.column(emb_col)).astype(np.float64))
        return pa.table({id_col: t.column(id_col), "sim": pa.array(m @ qn)})

    return ds.map_batches(cosine, batch_format="pyarrow", zero_copy_batch=True)


def brute_force_topk(ds, query_vec: np.ndarray, k: int = 10, *, id_col: str = "vec_id",
                     emb_col: str = "embedding"):
    """Exact top-k by cosine. Per-batch partial top-k (argpartition) bounds
    the reduce input to num_batches*k rows; the final sort+limit is over that
    tiny set only — never a full-dataset sort."""
    scored = cosine_scores_stage(ds, query_vec, id_col=id_col, emb_col=emb_col)

    def partial_topk(t: pa.Table) -> pa.Table:
        sims = t.column("sim").to_numpy()
        if len(sims) > k:
            idx = np.argpartition(-sims, k)[:k]
            t = t.take(pa.array(np.sort(idx)))
        return t

    return (
        scored.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort("sim", descending=True)
        .limit(k)
    )


def dim_range_stats(ds, *, emb_col: str = "embedding", num_buckets: int = 8):
    """Global per-dimension (lo, hi) of an embedding column — two-phase
    min/max, d partial rows per batch, d-row driver result."""
    from .aggregate import two_phase_aggregate

    def dim_stats(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        if m.size == 0:
            return pa.table({"dim": pa.array([], pa.int32()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"dim": pa.array(np.arange(m.shape[1], dtype=np.int32)),
                         "lo": pa.array(m.min(axis=0)), "hi": pa.array(m.max(axis=0))})

    stats = two_phase_aggregate(
        ds.map_batches(dim_stats, batch_format="pyarrow", zero_copy_batch=True),
        ["dim"], [("lo", "min", "lo"), ("hi", "max", "hi")], num_buckets=num_buckets)
    rows = sorted(stats.take_all(), key=lambda r: r["dim"])
    return (np.array([r["lo"] for r in rows]), np.array([r["hi"] for r in rows]))


def quant_scale(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    span = hi - lo
    return np.where(span > 0, 255.0 / np.where(span > 0, span, 1.0), 0.0)


def quantize_embeddings(ds, *, id_col: str = "vec_id", emb_col: str = "embedding",
                        num_buckets: int = 8):
    """Int8-style scalar quantization (the ANN memory-scale path: 4x smaller
    vectors than float32, distance tables computed on uint8 codes).

    Pass 1 computes GLOBAL per-dimension [lo, hi] via a two-phase min/max
    (one partial row per dim per batch; the reduce input is dims x batches —
    tiny). The d-row scale table is collected to the driver and broadcast in
    the closure, exactly like the k-means centroid loop: it is bounded by
    model dimensionality, never by corpus size. Pass 2 streams:
    ``q = floor((x - lo) * (255 / (hi - lo)) + 0.5)``, with the op order
    fixed so the DuckDB oracle computes bit-identical IEEE doubles.

    Output is EXPLODED (vec_id, dim, qv) rows rather than a list column —
    list cells hash unreliably in the driver compare (same lesson as the
    attrs overflow map).
    """
    lo, hi = dim_range_stats(ds, emb_col=emb_col, num_buckets=num_buckets)
    scale = quant_scale(lo, hi)

    def quant(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        n, d = m.shape if m.size else (len(t), len(lo))
        q = np.floor((m - lo) * scale + 0.5).astype(np.int32) if m.size else \
            np.empty((0, len(lo)), np.int32)
        ids = t.column(id_col).to_numpy()
        return pa.table({
            id_col: pa.array(np.repeat(ids, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int32), n)),
            "qv": pa.array(q.ravel()),
        })

    return ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


def lsh_signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """b-bit signature per row: sign bits of m @ planes packed into int64."""
    bits = (m @ planes) > 0  # (n, b)
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    return (bits.astype(np.int64) * weights).sum(axis=1)


def make_planes(dim: int, num_bits: int, seed: int = LSH_SEED) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, num_bits))


def _probe_buckets(sig: int, num_bits: int, probe_hamming: int) -> np.ndarray:
    """All bucket ids within Hamming distance <= probe_hamming of sig.

    Any probe_hamming in [0, num_bits] works — this is the multiprobe
    recall/cost knob (wider probe = larger candidate fraction = higher
    organic recall; see tests/test_similarity.py organic-recall curve)."""
    out = [sig]
    for h in range(1, min(probe_hamming, num_bits) + 1):
        for bits in combinations(range(num_bits), h):
            x = sig
            for b in bits:
                x ^= 1 << b
            out.append(x)
    return np.asarray(out, dtype=np.int64)


def _kmeans_lite(sample: np.ndarray, n_centroids: int, iters: int = 5,
                 seed: int = LSH_SEED) -> np.ndarray:
    """Seeded deterministic mini k-means on a normalized sample (driver
    side): seeded random init + a few Lloyd iterations with cosine metric."""
    rng = np.random.default_rng(seed)
    s = _normalize(sample.astype(np.float64))
    init = rng.choice(len(s), size=min(n_centroids, len(s)), replace=False)
    c = s[init].copy()
    for _ in range(iters):
        assign = np.argmax(s @ c.T, axis=1)
        for j in range(len(c)):
            members = s[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c = _normalize(c)
    return c


def ivf_topk(ds, query_vec: np.ndarray, k: int = 10, *, n_centroids: int = 16,
             n_probe: int = 4, train_rows: int = 2048, id_col: str = "vec_id",
             emb_col: str = "embedding", concurrency=2, seed: int = LSH_SEED):
    """IVF (inverted-file) approximate top-k: centroids trained on a small
    seeded sample (driver side), each batch assigns its vectors to the
    nearest centroid and keeps only rows in the query's ``n_probe`` closest
    lists; exact cosine + partial top-k on the survivors.

    At corpus scale the train sample stays tiny, centroids broadcast via
    ray.put, and the per-batch work is two GEMMs over the zero-copy matrix —
    cost drops by ~n_probe/n_centroids vs brute force."""
    sample_tbl = pa.Table.from_pandas(
        ds.limit(train_rows).to_pandas(), preserve_index=False
    )
    sample = np.stack(sample_tbl.column(emb_col).to_pylist()).astype(np.float64)
    centroids = _kmeans_lite(sample, n_centroids, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probes = np.argsort(-(centroids @ qn))[:n_probe]
    # centroid table is n_centroids x d floats (KBs): task-closure broadcast
    def probe(t: pa.Table) -> pa.Table:
        m = _normalize(embedding_matrix(t.column(emb_col)).astype(np.float64))
        assign = np.argmax(m @ centroids.T, axis=1)
        mask = np.isin(assign, probes)
        sims = m[mask] @ qn
        return pa.table(
            {id_col: t.column(id_col).filter(pa.array(mask)), "sim": pa.array(sims)}
        )

    cand = ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)

    def partial_topk(t: pa.Table) -> pa.Table:
        sims = t.column("sim").to_numpy()
        if len(sims) > k:
            idx = np.argpartition(-sims, k)[:k]
            t = t.take(pa.array(np.sort(idx)))
        return t

    return (
        cand.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort("sim", descending=True)
        .limit(k)
    )


def lsh_topk(ds, query_vec: np.ndarray, k: int = 10, *, num_bits: int = 8,
             probe_hamming: int = 2, id_col: str = "vec_id", emb_col: str = "embedding",
             concurrency=2, seed: int = LSH_SEED):
    """Approximate top-k: candidates = rows whose LSH bucket is within
    ``probe_hamming`` of the query's bucket; exact cosine on candidates only.

    Streaming shape: one map_batches computes signatures + filters (the
    selective step), then the exact path runs on the surviving fraction.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    dim = q.shape[0]
    planes = make_planes(dim, num_bits, seed)
    qsig = int(lsh_signatures(qn[None, :], planes)[0])
    probes = _probe_buckets(qsig, num_bits, probe_hamming)
    # planes + probes + query are a few KB: ship them in the task closure
    # (cloudpickle-cached per task spec) — fuses with the read, no actor
    # pool startup, no object-store ref to lose (ray#53727)
    def candidates(t: pa.Table) -> pa.Table:
        m = _normalize(embedding_matrix(t.column(emb_col)).astype(np.float64))
        sigs = lsh_signatures(m, planes)
        mask = np.isin(sigs, probes)
        sims = m[mask] @ qn
        return pa.table(
            {id_col: t.column(id_col).filter(pa.array(mask)), "sim": pa.array(sims)}
        )

    cand = ds.map_batches(candidates, batch_format="pyarrow", zero_copy_batch=True)

    def partial_topk(t: pa.Table) -> pa.Table:
        sims = t.column("sim").to_numpy()
        if len(sims) > k:
            idx = np.argpartition(-sims, k)[:k]
            t = t.take(pa.array(np.sort(idx)))
        return t

    return (
        cand.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort("sim", descending=True)
        .limit(k)
    )


# ---------------------------------------------------------------------------
# distributed k-means (SemDeDup-style embedding clustering)
# ---------------------------------------------------------------------------


def kmeans_assign(ds, centroids: np.ndarray, *, emb_col: str = "embedding",
                  id_col: str = "vec_id", out_col: str = "cluster"):
    """Assign every vector to its max-cosine centroid — one fused
    ``map_batches`` pass against a broadcast (``ray.put``) centroid matrix:
    per batch a single (n,d)@(d,K) GEMM + argmax (ties -> lowest cluster
    index). Centroids are L2-normalized here so the dot IS the cosine."""
    c = centroids.astype(np.float64)
    c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    ref = ray.put(c)

    def f(t: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(m @ cm.T, axis=1)
        return pa.table({id_col: t.column(id_col),
                         out_col: pa.array(assign.astype(np.int32))})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def kmeans_fit(ds, k: int = 8, *, iters: int = 10, tol: float = 1e-6,
               emb_col: str = "embedding", id_col: str = "vec_id",
               init: np.ndarray | None = None):
    """Distributed Lloyd k-means over an embedding Dataset (the clustering
    step of SemDeDup-style corpus curation — public method; the reference
    engine has no ML ops). Spherical variant: centroids live on the unit
    sphere, assignment is max cosine.

    Scale shape: per iteration ONE streaming pass — each batch computes a
    (K,d) partial sum + per-cluster counts against the broadcast centroids;
    partials are summed driver-side (K*d floats per BATCH reduce to one
    K*d accumulation — the only driver state is the K*d centroid matrix
    itself, never the vectors). Deterministic: init defaults to the first
    k vectors in id order; float accumulation order over batches is made
    order-independent by summing per-batch partials in batch-index order.

    Returns ``(centroids ndarray (k,d), n_iters_run)``.
    """
    if init is None:
        first = ds.sort(id_col).limit(k).to_pandas()
        init = np.stack(first[emb_col].to_numpy()).astype(np.float64)
    c = init.astype(np.float64)
    c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    kk, d = c.shape

    def partials(t: pa.Table, cm: np.ndarray) -> pa.Table:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(mn @ cm.T, axis=1)
        sums = np.zeros((kk, d))
        np.add.at(sums, assign, mn)
        counts = np.bincount(assign, minlength=kk).astype(np.int64)
        return pa.table({
            "cluster": pa.array(np.arange(kk, dtype=np.int32)),
            "vsum": pa.array(list(sums), pa.list_(pa.float64())),
            "n": pa.array(counts),
        })

    it = 0
    for it in range(1, iters + 1):
        ref_c = c
        part = ds.map_batches(lambda t, _c=ref_c: partials(t, _c),
                              batch_format="pyarrow", zero_copy_batch=True)
        rows = part.to_pandas()  # K rows per batch; K*d floats each — tiny
        sums = np.zeros((kk, d))
        counts = np.zeros(kk, np.int64)
        for cl, vs, n in zip(rows["cluster"], rows["vsum"], rows["n"]):
            sums[cl] += np.asarray(vs)
            counts[cl] += n
        new_c = np.where(counts[:, None] > 0,
                         sums / np.maximum(counts[:, None], 1), c)
        new_c /= np.maximum(np.linalg.norm(new_c, axis=1, keepdims=True), 1e-12)
        shift = float(np.abs(new_c - c).max())
        c = new_c
        if shift < tol:
            break
    return c, it


def semdedup(ds, centroids: np.ndarray, *, tau: float = 0.95,
             emb_col: str = "embedding", id_col: str = "vec_id",
             num_buckets: int = 64):
    """SemDeDup (Abbas et al. 2023 — public method): semantic dedup by
    clustering then WITHIN-CLUSTER pairwise cosine. Vectors route to their
    max-cosine centroid (broadcast GEMM), each cluster's members
    co-partition via the bucketed shuffle, and inside a cluster every pair
    with cosine >= tau drops its higher id (match-drops-newer). Returns the
    kept ids. Pairwise work is O(sum cluster_size^2) instead of O(n^2) —
    the whole point of clustering first; at corpus scale the cluster count
    grows with the data so cluster sizes stay bounded."""
    from .dedup import grouped_apply

    c = centroids.astype(np.float64)
    c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    ref = ray.put(c)

    def tag(t: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(mn @ cm.T, axis=1)
        return pa.table({id_col: t.column(id_col),
                         "cluster": pa.array(assign.astype(np.int32)),
                         emb_col: t.column(emb_col)})

    def per_cluster(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cl = t.column("cluster").to_numpy(zero_copy_only=False)
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        keep_mask = np.ones(len(ids), bool)
        for c_val in np.unique(cl):
            sel = np.flatnonzero(cl == c_val)
            if len(sel) < 2:
                continue
            order = sel[np.argsort(ids[sel])]
            sims = m[order] @ m[order].T
            ai, bj = np.nonzero(np.triu(sims >= tau, k=1))
            keep_mask[order[np.unique(bj)]] = False
        return pa.table({id_col: pa.array(ids[keep_mask])})

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_apply(tagged, ["cluster"], per_cluster,
                         batch_format="pyarrow", num_buckets=num_buckets)


def pq_codes(ds, *, id_col: str = "vec_id", emb_col: str = "embedding",
             m: int = 8, k: int = 8, num_buckets: int = 8):
    """Product-quantization codes over the INT scalar-quantized vectors —
    the PQ memory-scale path for ANN, made exactly verifiable: distances
    are integer squared-L2 between uint8 codes, so the argmin (ties ->
    lowest code id) is pure int64 arithmetic on both engines.

    Codebooks are deterministic: the ``k`` lowest-id vectors' quantized
    sub-vectors (the same convention as the k-means assignment kernel —
    the Lloyd-refined variant is pytest-verified in kmeans_fit). Each
    vector splits into ``m`` sub-spaces and gets the code of its nearest
    codebook entry per sub-space. Output: exploded (vec_id, sub, code).
    """
    import ray

    lo, hi = dim_range_stats(ds, emb_col=emb_col, num_buckets=num_buckets)
    scale = quant_scale(lo, hi)
    d = len(lo)
    assert d % m == 0, "dim must divide into m sub-spaces"
    dsub = d // m

    first = ds.sort(id_col).limit(k).take_all()
    cmat = np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in first])
    cq = np.floor((cmat - lo) * scale + 0.5).astype(np.int64)
    codebook = cq.reshape(k, m, dsub)
    cb_ref = ray.put(codebook)

    def encode(t: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref)
        e = embedding_matrix(t.column(emb_col)).astype(np.float64)
        n = len(t)
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sub": pa.array([], pa.int32()),
                             "code": pa.array([], pa.int32())})
        q = np.floor((e - lo) * scale + 0.5).astype(np.int64).reshape(n, 1, m, dsub)
        dist = ((q - cb.reshape(1, k, m, dsub)) ** 2).sum(axis=3)  # (n, k, m)
        code = dist.argmin(axis=1).astype(np.int32)  # first occurrence = lowest code
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, m)),
            "sub": pa.array(np.tile(np.arange(m, dtype=np.int32), n)),
            "code": pa.array(code.ravel()),
        })

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def pq_search(ds, query_vec: np.ndarray, k_top: int = 10, *,
              id_col: str = "vec_id", emb_col: str = "embedding",
              m: int = 8, k: int = 8, num_buckets: int = 8):
    """PQ asymmetric-distance (ADC) top-k: quantize the query with the same
    global scales, precompute the m x k integer distance table to the
    codebooks, score every vector as the SUM of its sub-space table entries,
    and reduce per-batch partial top-k rows (ties -> lowest id). The scan
    touches only codes-equivalent integers, exactly the PQ search memory
    story; everything stays int64 so the DuckDB mirror is bit-exact."""
    import ray

    lo, hi = dim_range_stats(ds, emb_col=emb_col, num_buckets=num_buckets)
    scale = quant_scale(lo, hi)
    d = len(lo)
    dsub = d // m

    first = ds.sort(id_col).limit(k).take_all()
    cmat = np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in first])
    cq = np.floor((cmat - lo) * scale + 0.5).astype(np.int64).reshape(k, m, dsub)
    qv = np.floor((np.asarray(query_vec, np.float64) - lo) * scale + 0.5) \
        .astype(np.int64).reshape(m, dsub)
    # dtab[s, c] = ||q_s - cb[c, s]||^2 (int64)
    dtab = ((qv[None, :, :] - cq) ** 2).sum(axis=2).T  # (m, k)
    cb_ref = ray.put((cq, dtab))

    def score(t: pa.Table) -> pa.Table:
        cb, tab = ray.get(cb_ref)
        e = embedding_matrix(t.column(emb_col)).astype(np.float64)
        n = len(t)
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "adc": pa.array([], pa.int64())})
        q = np.floor((e - lo) * scale + 0.5).astype(np.int64).reshape(n, 1, m, dsub)
        code = ((q - cb.reshape(1, k, m, dsub)) ** 2).sum(axis=3).argmin(axis=1)  # (n, m)
        adc = tab[np.arange(m), code].sum(axis=1)
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        out = pa.table({id_col: pa.array(ids), "adc": pa.array(adc)})
        if n > k_top:  # partial top-k: (adc asc, id asc)
            order = np.lexsort((ids, adc))[:k_top]
            out = out.take(pa.array(np.sort(order)))
        return out

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["adc", id_col]).limit(k_top)


def kmeans_fit_int(ds, *, k: int = 8, rounds: int = 3, scale: float = 1000.0,
                   emb_col: str = "embedding", id_col: str = "vec_id"):
    """Integer Lloyd k-means FIT with a bit-exact oracle (the exactly-
    verifiable counterpart of the float :func:`kmeans_fit` above, whose
    cross-batch float accumulation can't be SQL-mirrored).

    Arithmetic is exact end-to-end: vectors int-ize as
    ``floor(float64(x) * scale)``; assignment is argmin squared-L2 over
    int64 (ties -> lowest centroid id); the update is the elementwise
    FLOOR division ``sum // count`` so centroids stay integer; an empty
    cluster keeps its previous centroid. Deterministic init = the k
    lowest-id vectors.

    Scale shape: per round ONE streaming pass — each batch emits a (k*d)
    long-format partial (per-cluster dim sums + counts), reduced two-phase;
    the only driver state is the k*d centroid matrix (same bounded
    iterative-state pattern as bpe_train / the float fit). The final round
    emits per-vector (id, cluster, dist).
    """
    from .aggregate import two_phase_aggregate

    first = ds.sort(id_col).limit(k).to_pandas()
    c = np.floor(np.stack(first[emb_col].to_numpy()).astype(np.float64)
                 * scale).astype(np.int64)
    kk, d = c.shape

    def intmat(t: pa.Table) -> np.ndarray:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        return np.floor(m * scale).astype(np.int64)

    def dists(x: np.ndarray, cm: np.ndarray) -> np.ndarray:
        return ((x * x).sum(axis=1, keepdims=True) - 2 * (x @ cm.T)
                + (cm * cm).sum(axis=1)[None, :])

    for _ in range(rounds - 1):
        ref_c = c

        def partials(t: pa.Table, cm=ref_c) -> pa.Table:
            x = intmat(t)
            assign = np.argmin(dists(x, cm), axis=1)
            sums = np.zeros((kk, d), np.int64)
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=kk).astype(np.int64)
            n_col = np.zeros((kk, d), np.int64)
            n_col[:, 0] = counts
            return pa.table({
                "cid": pa.array(np.repeat(np.arange(kk, dtype=np.int32), d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int32), kk)),
                "s": pa.array(sums.ravel()),
                "n": pa.array(n_col.ravel()),
            })

        part = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        agg = two_phase_aggregate(part, ["cid", "dim"],
                                  [("s", "sum", "s"), ("n", "sum", "n")],
                                  num_buckets=8)
        sums = np.zeros((kk, d), np.int64)
        counts = np.zeros(kk, np.int64)
        for r in agg.take_all():  # k*d rows — bounded iterative state
            sums[r["cid"], r["dim"]] = r["s"]
            if r["dim"] == 0:
                counts[r["cid"]] = r["n"]
        nz = counts > 0
        c = c.copy()
        c[nz] = sums[nz] // counts[nz, None]  # numpy // floors — matches SQL CASE

    ref_final = c

    def assign_out(t: pa.Table, cm=ref_final) -> pa.Table:
        x = intmat(t)
        dm = dists(x, cm)
        a = np.argmin(dm, axis=1)
        return pa.table({id_col: t.column(id_col),
                         "cluster": pa.array(a.astype(np.int32)),
                         "dist": pa.array(dm[np.arange(len(a)), a])})

    return ds.map_batches(assign_out, batch_format="pyarrow", zero_copy_batch=True)


def embedding_covariance(ds, *, scale: float = 1000.0,
                         emb_col: str = "embedding"):
    """Distributed second-moment (Gram) accumulation — the reduce step of
    PCA / whitening / covariance estimation, exact-integer variant: vectors
    int-ize as ``floor(float64(x) * scale)`` and each batch contributes one
    (d, d) int64 GEMM partial plus per-dim sums and a count, all carried on
    every upper-triangle (i, j) row; partials reduce two-phase over the
    d*(d+1)/2 keyspace — the model state is dimension-bounded, never
    corpus-bounded.

    Emits one row per (i <= j): n, sum_i, sum_j, s_ij = Σ x_i·x_j, all
    exact int64; the covariance ``(s_ij - sum_i*sum_j/n) / n`` is left to
    the consumer so nothing stored is a float.
    """
    from .aggregate import two_phase_aggregate

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        x = np.floor(m * scale).astype(np.int64)
        n, d = x.shape
        g = x.T @ x
        iu, ju = np.triu_indices(d)
        sums = x.sum(axis=0)
        return pa.table({
            "i": pa.array(iu.astype(np.int32)),
            "j": pa.array(ju.astype(np.int32)),
            "n": pa.array(np.full(len(iu), n, np.int64)),
            "sum_i": pa.array(sums[iu]),
            "sum_j": pa.array(sums[ju]),
            "s_ij": pa.array(g[iu, ju]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return two_phase_aggregate(parts, ["i", "j"],
                               [("n", "sum", "n"), ("sum_i", "sum", "sum_i"),
                                ("sum_j", "sum", "sum_j"), ("s_ij", "sum", "s_ij")],
                               num_buckets=8)


def embedding_pca_project(ds, k: int = 8, *, scale: float = 1000.0,
                          id_col: str = "vec_id", emb_col: str = "embedding"):
    """Distributed PCA: exact-integer covariance accumulation
    (:func:`embedding_covariance` — the only corpus-sized pass) -> a (d, d)
    eigendecomposition on the driver (dimension-bounded, microseconds) ->
    one stateless projection pass onto the top-``k`` components.

    Sign convention: each component's largest-|coefficient| entry is made
    positive, so the output is deterministic across eigh implementations
    up to that convention. Returns (projected Dataset with ``proj``
    fixed-size-list column, components (k, d), explained_var (k,)).

    Not SQL-expressible (no eigensolver in DuckDB) — verified in pytest
    against direct numpy PCA on the collected matrix; every distributed
    piece it composes (covariance, the projection map) is itself
    oracle-checked elsewhere."""
    rows = embedding_covariance(ds, scale=scale, emb_col=emb_col).take_all()
    d = max(r["j"] for r in rows) + 1
    n = rows[0]["n"]
    cov = np.zeros((d, d), np.float64)
    for r in rows:
        c = (r["s_ij"] - r["sum_i"] * r["sum_j"] / n) / n
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = c
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T            # (k, d)
    expl = evals[order] / (scale * scale)  # back to input units
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    # per-dim means from the diagonal rows (sorted by dim for determinism)
    diag = sorted((r["i"], r["sum_i"]) for r in rows if r["i"] == r["j"])
    mean = np.array([s for _, s in diag], np.float64) / n / scale

    def project(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        p = (m - mean) @ comps.T
        return pa.table({
            id_col: t.column(id_col),
            "proj": pa.FixedSizeListArray.from_arrays(
                pa.array(p.reshape(-1), pa.float32()), k),
        })

    out = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return out, comps, expl


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of dense + lexical rankings
# ---------------------------------------------------------------------------


def int_dot_topk(ds, query_vec: np.ndarray, k: int = 50, *,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 scale: float = 1_000_000.0):
    """Integer-exact dense top-k: both the query and every corpus vector
    quantize to floor(x * 1e6) before the dot product, so every product and
    partial sum is an exactly-representable float64 integer (|x| <~ 5 ->
    terms < 2^53 / d) and the ranking is fully deterministic — no float-ulp
    ties between engine and oracle, unlike raw cosine. Per-batch partial
    top-k (lexsort keeps the tie-mates with the lowest ids, matching the
    global (ip DESC, id ASC) order), tiny final sort."""
    qi = np.floor(np.asarray(query_vec, np.float64) * scale)

    def score(t: pa.Table) -> pa.Table:
        X = embedding_matrix(t.column(emb_col)).astype(np.float64)
        ip = (np.floor(X * scale) @ qi).astype(np.int64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(ip) > k:
            keep = np.lexsort((ids, -ip))[:k]
            ip, ids = ip[keep], ids[keep]
        return pa.table({id_col: pa.array(ids), "ip": pa.array(ip)})

    return (ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
            .sort(["ip", id_col], descending=[True, False]).limit(k))


def hybrid_rrf(docs_ds, emb_ds, query_vec: np.ndarray,
               query_terms: list[str], *, k_each: int = 50, k_out: int = 20,
               rrf_k: int = 60, doc_id_col: str = "doc_id",
               vec_id_col: str = "vec_id"):
    """Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009):
    fuse the dense integer-dot-product ranking (:func:`int_dot_topk` over
    the doc-aligned embedding table) with the lexical BM25 ranking
    (``bm25_topk``) via rrf(d) = sum over lists of 1 / (rrf_k + rank_d).
    Docs absent from a list contribute 0 from it. Scores quantize to
    floor(x * 1e9) int64 nano-units (the two divisions and one add are the
    same IEEE ops on both engine and DuckDB sides).

    Scale shape: both source rankings are streaming top-k operators whose
    reduce input is bounded by batches x k; the fusion itself touches only
    2 x k_each rows, so the driver-side merge is O(k), never O(corpus)."""
    import pandas as pd

    from .textstats import bm25_topk

    dense = int_dot_topk(emb_ds, query_vec, k_each,
                         id_col=vec_id_col).to_pandas()
    dense = dense.rename(columns={vec_id_col: doc_id_col})
    dense["r_dense"] = np.arange(1, len(dense) + 1, dtype=np.int64)
    lex = bm25_topk(docs_ds, query_terms, k=k_each).to_pandas()
    lex["r_lex"] = np.arange(1, len(lex) + 1, dtype=np.int64)

    fused = dense[[doc_id_col, "r_dense"]].merge(
        lex[[doc_id_col, "r_lex"]], on=doc_id_col, how="outer")
    rd = fused["r_dense"].to_numpy(dtype=np.float64, na_value=np.nan)
    rl = fused["r_lex"].to_numpy(dtype=np.float64, na_value=np.nan)
    score = (np.where(np.isnan(rd), 0.0, 1.0 / (rrf_k + rd))
             + np.where(np.isnan(rl), 0.0, 1.0 / (rrf_k + rl)))
    out = pd.DataFrame({
        doc_id_col: fused[doc_id_col].to_numpy(dtype=np.int64),
        "rrf_nano": np.floor(score * 1e9).astype(np.int64),
    })
    return (out.sort_values(["rrf_nano", doc_id_col],
                            ascending=[False, True], kind="mergesort")
            .head(k_out).reset_index(drop=True))


def embedding_outliers(ds, k: int = 20, *, scale: float = 1000.0,
                       id_col: str = "vec_id", emb_col: str = "embedding",
                       label_col: str = "label", num_buckets: int = 8):
    """Per-class embedding outliers: the k vectors farthest from their own
    label's centroid — the embedding-space anomaly filter (mislabeled /
    off-distribution docs) of a curation pipeline.

    DIVISION-FREE exact-integer distance: with xi = floor(x * scale) and
    per-label (n, sum) from a two-phase pass, the squared distance to the
    centroid scales by n^2 into dist2 = Σ_dims (n·xi − sum_i)² — pure int64
    arithmetic on both engine and oracle (no centroid division, whose
    floor-vs-truncate semantics differ between numpy and SQL). Ranking by
    dist2 equals ranking by true distance WITHIN a label; the top-k here
    spans labels and is the deterministic (dist2 DESC, id ASC) order of the
    planted-scale fixture. int64 bound: |n·xi| < 2^31 keeps every square
    < 2^62 — holds to ~10^6 vectors/label at scale 1e3; beyond that the
    scale path divides once per label on the driver instead.

    Scale shape: pass 1 reduces to (labels × d) int rows two-phase; the
    (n, sum) table broadcasts once via ray.put; pass 2 is one stateless
    map with per-batch partial top-k, so the final sort sees batches × k
    rows."""
    import ray

    from .aggregate import two_phase_aggregate

    def part(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        x = np.floor(m * scale).astype(np.int64)
        lab = t.column(label_col).to_numpy(zero_copy_only=False)
        order = np.argsort(lab, kind="stable")
        ls, xs = lab[order], x[order]
        starts = np.flatnonzero(np.r_[True, ls[1:] != ls[:-1]])
        sums = np.add.reduceat(xs, starts, axis=0)
        ns = np.diff(np.r_[starts, len(ls)])
        g, d = sums.shape
        return pa.table({
            label_col: pa.array(np.repeat(ls[starts], d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int32), g)),
            "sum_i": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(ns.astype(np.int64), d)),
        })

    stats = two_phase_aggregate(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        [label_col, "dim"], [("sum_i", "sum", "sum_i"), ("n", "sum", "n")],
        num_buckets=num_buckets).take_all()  # labels x d rows — driver-safe
    labels = sorted({r[label_col] for r in stats})
    d = max(r["dim"] for r in stats) + 1
    lab_idx = {l: i for i, l in enumerate(labels)}
    sum_m = np.zeros((len(labels), d), np.int64)
    n_v = np.zeros(len(labels), np.int64)
    for r in stats:
        sum_m[lab_idx[r[label_col]], r["dim"]] = r["sum_i"]
        n_v[lab_idx[r[label_col]]] = r["n"]
    ref = ray.put((lab_idx, sum_m, n_v))

    def dist(t: pa.Table) -> pa.Table:
        lab_idx_l, sum_l, n_l = ray.get(ref)
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        x = np.floor(m * scale).astype(np.int64)
        lab = t.column(label_col).to_numpy(zero_copy_only=False)
        li = np.array([lab_idx_l[v] for v in lab], np.int64)
        diff = n_l[li, None] * x - sum_l[li]
        d2 = (diff * diff).sum(axis=1)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(d2) > k:
            keep = np.lexsort((ids, -d2))[:k]
            ids, lab, d2 = ids[keep], lab[keep], d2[keep]
        return pa.table({id_col: pa.array(ids), label_col: pa.array(lab),
                         "dist2": pa.array(d2)})

    return (ds.map_batches(dist, batch_format="pyarrow", zero_copy_batch=True)
            .sort(["dist2", id_col], descending=[True, False]).limit(k))


def label_scatter(ds, *, scale: float = 1000.0, emb_col: str = "embedding",
                  label_col: str = "label", num_buckets: int = 8):
    """Per-label Fisher separation diagnostics over int-quantized
    embeddings (floor(float64(x)·scale), the embedding_covariance
    convention): within-class scatter, centroid distance to the global
    centroid, and their ratio — the quick "are my labels separable"
    check before training a probe. Exact integers end to end:

        within_avg  = Σ_d (n·Q_d − S_d²)            // (n²·d)
        between_avg = Σ_d (S_d·N − G_d·n)²           // (n²·N²·d)
        fisher_e6   = between_avg · 1e6 // max(within_avg, 1)

    with S_d/Q_d the per-label per-dim sum and square-sum, G_d the
    global sum, N the corpus count (n·Q−S² ≥ 0 by Cauchy–Schwarz, so
    every // floors identically in numpy/Python and DuckDB HUGEINT).

    Scale shape: each batch reduces to (label, dim) partial rows
    (labels × d, model-state-bounded, never corpus-bounded); the big-int
    closed form runs driver-side over that grid."""
    from .aggregate import two_phase_aggregate

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        x = np.floor(m * scale).astype(np.int64)
        lab = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        x = x[order]
        lab = lab[order]
        n, d = x.shape
        seg = np.flatnonzero(np.r_[True, lab[1:] != lab[:-1]])
        k = np.diff(np.r_[seg, n])
        s = np.add.reduceat(x, seg, axis=0)
        q = np.add.reduceat(x * x, seg, axis=0)
        labs = lab[seg]
        return pa.table({
            label_col: pa.array(np.repeat(labs, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(labs))),
            "n": pa.array(np.repeat(k.astype(np.int64), d)),
            "s": pa.array(s.ravel()), "q": pa.array(q.ravel())})

    grid = two_phase_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [label_col, "dim"],
        [("n", "sum", "n"), ("s", "sum", "s"), ("q", "sum", "q")],
        num_buckets=num_buckets).take_all()

    g: dict[int, int] = {}
    per: dict[int, dict[int, tuple[int, int, int]]] = {}
    for r in grid:
        lb, dim = int(r[label_col]), int(r["dim"])
        per.setdefault(lb, {})[dim] = (int(r["n"]), int(r["s"]), int(r["q"]))
        g[dim] = g.get(dim, 0) + int(r["s"])
    d = len(g)
    big_n = sum(v[0][0] for v in (list(p.values()) for p in per.values()))
    labels = sorted(per)
    ns, wit, bet, fis = [], [], [], []
    for lb in labels:
        n = per[lb][0][0]
        w = sum(n * q - s * s for (_, s, q) in per[lb].values())
        b = sum((s * big_n - g[dim] * n) ** 2
                for dim, (_, s, _q) in per[lb].items())
        wa = w // (n * n * d)
        ba = b // (n * n * big_n * big_n * d)
        ns.append(n)
        wit.append(wa)
        bet.append(ba)
        fis.append(ba * 1_000_000 // max(wa, 1))
    return pa.table({label_col: pa.array(labels, pa.int64()),
                     "n": pa.array(ns, pa.int64()),
                     "within_avg": pa.array(wit, pa.int64()),
                     "between_avg": pa.array(bet, pa.int64()),
                     "fisher_e6": pa.array(fis, pa.int64())})


def embedding_norms(ds, *, scale: float = 1000.0, emb_col: str = "embedding",
                    label_col: str = "label", num_buckets: int = 4):
    """Embedding-norm health histogram per label: vectors int-quantize
    as floor(float64(x)·scale) and bucket by bit_length of the exact
    squared norm — the cheap detector for degenerate (near-zero) or
    exploding embeddings before any ANN index is built. Output
    (label, norm2_bucket, n_vecs, min_norm2, max_norm2).

    Scale shape: stateless per-batch quantize + row-sum into a
    (labels × ≤64 buckets) two-phase reduce."""
    from .aggregate import two_phase_aggregate

    powers = np.left_shift(np.int64(1), np.arange(63))

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column(emb_col)).astype(np.float64)
        x = np.floor(m * scale).astype(np.int64)
        n2 = (x * x).sum(axis=1)
        k = np.searchsorted(powers, n2, side="right").astype(np.int64)
        lab = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({label_col: pa.array(lab),
                         "norm2_bucket": pa.array(k),
                         "one": pa.array(np.ones(len(k), np.int64)),
                         "n2": pa.array(n2)})

    return two_phase_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [label_col, "norm2_bucket"],
        [("one", "sum", "n_vecs"), ("n2", "min", "min_norm2"),
         ("n2", "max", "max_norm2")], num_buckets=num_buckets)


def knn_classify(ds, *, k: int = 5, query_mod: int = 10,
                 scale: float = 1000.0, emb_col: str = "embedding",
                 id_col: str = "vec_id", label_col: str = "label",
                 num_buckets: int = 8):
    """Exact brute-force k-NN majority-vote classification: every vector
    whose id is divisible by ``query_mod`` is a query, classified by the
    majority label of its k nearest neighbors under the quantized-int
    dot product floor(float64(x)·scale). Fully deterministic: similarity
    ties break by neighbor id asc, vote ties by label asc. Output
    (vec_id, pred_label, n_votes).

    Scale shape: the query matrix (n/query_mod × d int64) is built by
    streaming blocks once and broadcast via one ray.put; each batch does
    a single integer GEMM against it and keeps only rows at-or-above the
    kth best dot per query (a superset of the true top-k, so the shuffle
    is ≤ batches × (k + boundary ties) rows per query); the per-query
    finisher re-ranks exactly and votes with rank-run algebra — no
    Python loop over queries anywhere."""
    import ray

    from .aggregate import grouped_apply

    def narrow(t: pa.Table) -> pa.Table:
        return t.select([id_col, emb_col, label_col])

    # query side: one streaming pass, ids % query_mod == 0 only
    qparts = []
    for b in ds.map_batches(narrow, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        keep = ids % query_mod == 0
        if keep.any():
            qparts.append((ids[keep],
                           np.floor(embedding_matrix(b.column(emb_col))
                                    .astype(np.float64)[keep] * scale)
                           .astype(np.int64)))
    qids = np.concatenate([p[0] for p in qparts])
    qmat = np.concatenate([p[1] for p in qparts])
    order = np.argsort(qids)
    qids, qmat = qids[order], qmat[order]
    qref = ray.put((qids, qmat.T.copy()))

    def partial(t: pa.Table) -> pa.Table:
        from .join import _fetch_broadcast

        qids_, qmat_t = _fetch_broadcast(qref)
        x = np.floor(embedding_matrix(t.column(emb_col))
                     .astype(np.float64) * scale).astype(np.int64)
        nids = t.column(id_col).to_numpy(zero_copy_only=False)
        labs = t.column(label_col).to_numpy(zero_copy_only=False)
        d = x @ qmat_t                       # (batch, nq) exact int64
        sentinel = np.int64(-(2 ** 62))
        d[nids[:, None] == qids_[None, :]] = sentinel  # exclude self pair
        if d.shape[0] > k:
            kth = np.partition(d, d.shape[0] - k, axis=0)[d.shape[0] - k]
            mask = d >= kth[None, :]
        else:
            mask = np.ones_like(d, bool)
        mask &= d > sentinel
        r, c = np.nonzero(mask)
        return pa.table({"qid": pa.array(qids_[c].astype(np.int64)),
                         "nid": pa.array(nids[r].astype(np.int64)),
                         "lab": pa.array(labs[r].astype(np.int64)),
                         "dot": pa.array(d[r, c])})

    cand = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)

    def _rank_within(keys: np.ndarray) -> np.ndarray:
        # position - first position of each run (keys pre-sorted)
        first = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        starts = np.repeat(first, np.diff(np.r_[first, len(keys)]))
        return np.arange(len(keys)) - starts

    def finish(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("qid", "ascending"),
                                            ("dot", "descending"),
                                            ("nid", "ascending")])
        t = t.take(idx)
        q = t.column("qid").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(_rank_within(q) < k))
        # vote: count per (qid, label), argmax by (count desc, label asc)
        q = t.column("qid").to_numpy(zero_copy_only=False)
        l = t.column("lab").to_numpy(zero_copy_only=False)
        o = np.lexsort((l, q))
        q, l = q[o], l[o]
        new = np.r_[True, (q[1:] != q[:-1]) | (l[1:] != l[:-1])]
        gq, gl = q[new], l[new]
        cnt = np.diff(np.r_[np.flatnonzero(new), len(q)])
        o2 = np.lexsort((gl, -cnt, gq))
        gq, gl, cnt = gq[o2], gl[o2], cnt[o2]
        win = _rank_within(gq) == 0
        return pa.table({"vec_id": pa.array(gq[win]),
                         "pred_label": pa.array(gl[win]),
                         "n_votes": pa.array(cnt[win])})

    return grouped_apply(cand, ["qid"], finish, num_buckets=num_buckets,
                         batch_format="pyarrow")


def mmr_select(ds, *, k: int = 5, lam_e3: int = 700, scale: float = 1000.0,
               query_id: int = 0, emb_col: str = "embedding",
               id_col: str = "vec_id"):
    """Maximal Marginal Relevance selection — the diversity-aware
    retrieval pass that keeps a result set from collapsing onto near
    duplicates: k greedy rounds, each picking the candidate maximizing
    lam_e3·rel − (1000−lam_e3)·max_sim_to_selected over quantized-int
    dot products (floor(float64(x)·scale)); round 1's penalty is 0 (max
    over the empty set). Fully deterministic: score ties break by
    smaller id. The query is the ``query_id`` vector, which is excluded
    from the candidates. Output (rank, vec_id, score).

    Scale shape: each round is ONE streaming pass — the selected set
    (≤ k vectors) rides the task closure, every batch does one integer
    GEMM against it and emits a single best row, and the driver reduces
    the ≤ #blocks partial winners (the kmeans_fit_int iterative-driver
    pattern). Nothing is materialized; k passes total."""
    def narrow(t: pa.Table) -> pa.Table:
        m = np.floor(embedding_matrix(t.column(emb_col))
                     .astype(np.float64) * scale).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "q": pa.array(list(m), pa.list_(pa.int64()))})

    cand = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    # one tiny pull: the query vector itself (vectorized batch filter +
    # limit pushdown — never a per-row Python filter)
    qrows = cand.map_batches(
        lambda t: t.filter(pc.equal(t.column(id_col), query_id)),
        batch_format="pyarrow", zero_copy_batch=True).take(1)
    if not qrows:
        raise ValueError(f"query vector {id_col}={query_id} not found")
    qv = np.asarray(qrows[0]["q"], dtype=np.int64)

    selected: list[tuple[int, int]] = []   # (vec_id, score)
    sel_vecs: list[np.ndarray] = []

    for _ in range(k):
        smat = np.stack(sel_vecs).T.copy() if sel_vecs else None
        taken = frozenset(i for i, _ in selected)

        def best(t: pa.Table, _smat=smat, _taken=taken) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            e = embedding_matrix(t.column("q")).astype(np.int64)
            rel = e @ qv
            pen = (e @ _smat).max(axis=1) if _smat is not None \
                else np.zeros(len(ids), np.int64)
            score = lam_e3 * rel - (1000 - lam_e3) * pen
            mask = ids != query_id
            if _taken:
                mask &= ~np.isin(ids, np.fromiter(_taken, np.int64))
            if not mask.any():
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "score": pa.array([], pa.int64()),
                                 "q": pa.array([], pa.list_(pa.int64()))})
            idx = np.flatnonzero(mask)
            # best under (score desc, id asc)
            o = idx[np.lexsort((ids[idx], -score[idx]))[0]]
            return pa.table({id_col: pa.array([ids[o]], pa.int64()),
                             "score": pa.array([score[o]], pa.int64()),
                             "q": pa.array([e[o]], pa.list_(pa.int64()))})

        part = cand.map_batches(best, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
        if not len(part):
            break
        part = part.sort_values(["score", id_col],
                                ascending=[False, True],
                                kind="mergesort").iloc[0]
        selected.append((int(part[id_col]), int(part["score"])))
        sel_vecs.append(np.asarray(part["q"], dtype=np.int64))

    return pa.table({
        "rank": pa.array(range(1, len(selected) + 1), pa.int64()),
        "vec_id": pa.array([i for i, _ in selected], pa.int64()),
        "score": pa.array([s for _, s in selected], pa.int64())})


def label_centroids(ds, *, scale: float = 1000.0, emb_col: str = "embedding",
                    label_col: str = "label", num_buckets: int = 8):
    """Pairwise label-centroid separation, division-free and exact: with
    per-label quantized sums s and counts c, the cross term
    (s_a·c_b − s_b·c_a) per dimension is (c_a·c_b)·(centroid_a −
    centroid_b), so dist2_q = Σ_d (s_a·c_b − s_b·c_a)² // (c_a·c_b)²
    is the floored squared centroid distance in quantized units — no
    intermediate float, the big squares run in Python arbitrary
    precision inside the tiny finisher. Output
    (label_a, label_b, n_a, n_b, dist2_q).

    Scale shape: one per-batch np.add.at reduction to (label, dim)
    partial sums, a bounded two-phase (labels × dims rows), and a
    single-task pairwise finisher."""
    from .aggregate import two_phase_aggregate

    def partial(t: pa.Table) -> pa.Table:
        m = np.floor(embedding_matrix(t.column(emb_col))
                     .astype(np.float64) * scale).astype(np.int64)
        labs = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ulab, inv = np.unique(labs, return_inverse=True)
        d = m.shape[1]
        sums = np.zeros((len(ulab), d), np.int64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({
            label_col: pa.array(np.repeat(ulab, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(ulab))),
            "s": pa.array(sums.ravel()),
            "c": pa.array(np.repeat(cnt, d))})

    agg = two_phase_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [label_col, "dim"], [("s", "sum", "s"), ("c", "sum", "c")],
        num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values([label_col, "dim"])
        labs = sorted(df[label_col].unique())
        vec = {l: df[df[label_col] == l].sort_values("dim")["s"]
               .astype(object).tolist() for l in labs}
        cnt = {l: int(df[df[label_col] == l]["c"].iloc[0]) for l in labs}
        rows = []
        for i, a in enumerate(labs):
            for b in labs[i + 1:]:
                na, nb = cnt[a], cnt[b]
                d2 = sum((int(sa) * nb - int(sb) * na) ** 2
                         for sa, sb in zip(vec[a], vec[b]))
                rows.append((int(a), int(b), na, nb,
                             d2 // (na * nb) ** 2))
        cols = list(zip(*rows)) if rows else [[]] * 5
        return pa.table({
            "label_a": pa.array(list(cols[0]), pa.int64()),
            "label_b": pa.array(list(cols[1]), pa.int64()),
            "n_a": pa.array(list(cols[2]), pa.int64()),
            "n_b": pa.array(list(cols[3]), pa.int64()),
            "dist2_q": pa.array(list(cols[4]), pa.int64())})

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow",
                                          zero_copy_batch=True)
