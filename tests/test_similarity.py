"""Similarity-search tests: exact top-k vs numpy; LSH recall."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from rotel_ray.stages.similarity import (
    brute_force_topk,
    embedding_matrix,
    lsh_topk,
)


def _emb_table(n=300, d=32, seed=11):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    return (
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
            }
        ),
        m,
    )


def test_embedding_matrix_zero_copy_roundtrip():
    t, m = _emb_table(50, 8)
    got = embedding_matrix(t.column("embedding"))
    np.testing.assert_allclose(got, m, rtol=1e-6)


def test_embedding_matrix_handles_slices():
    t, m = _emb_table(50, 8)
    sl = t.slice(10, 20)
    got = embedding_matrix(sl.column("embedding"))
    np.testing.assert_allclose(got, m[10:30], rtol=1e-6)


def _numpy_topk(m, q, k):
    mn = m.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = mn @ qn
    return set(np.argsort(-sims)[:k].tolist())


def test_brute_force_topk_matches_numpy():
    t, m = _emb_table()
    q = np.asarray(m[7], dtype=np.float64)
    out = brute_force_topk(rd.from_arrow(t), q, k=10).to_pandas()
    assert set(out.vec_id) == _numpy_topk(m, q, 10)
    assert list(out.sim) == sorted(out.sim, reverse=True)


def test_lsh_topk_recall():
    t, m = _emb_table()
    q = np.asarray(m[7], dtype=np.float64)
    expected = _numpy_topk(m, q, 10)
    out = lsh_topk(rd.from_arrow(t), q, k=10, num_bits=8, probe_hamming=2).to_pandas()
    # candidates are a subset; recall of the true top-10 must be meaningful
    assert len(set(out.vec_id) & expected) >= 5
    # the query vector itself (sim=1) always survives probing
    assert 7 in set(out.vec_id)


def test_ivf_topk_recall():
    from rotel_ray.stages.similarity import ivf_topk

    t, m = _emb_table()
    q = np.asarray(m[7], dtype=np.float64)
    expected = _numpy_topk(m, q, 10)
    out = ivf_topk(rd.from_arrow(t), q, k=10, n_centroids=8, n_probe=3).to_pandas()
    assert len(set(out.vec_id) & expected) >= 5
    assert 7 in set(out.vec_id)  # the query vector's own list is always probed


def test_kmeans_fit_recovers_separable_blobs():
    from rotel_ray.stages.similarity import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(9)
    d, per = 16, 40
    dirs = rng.standard_normal((3, d))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # make the 3 anchor directions near-orthogonal then jitter members
    vecs, truth = [], []
    for ci in range(3):
        for _ in range(per):
            v = dirs[ci] + 0.05 * rng.standard_normal(d)
            vecs.append(v.astype(np.float32))
            truth.append(ci)
    order = rng.permutation(len(vecs))
    t = pa.table({
        "vec_id": pa.array(order.astype(np.int64), pa.int64()),
        "embedding": pa.array([vecs[i].tolist() for i in order], pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t).repartition(4)
    centroids, iters = kmeans_fit(ds, k=3, iters=20)
    assert centroids.shape == (3, 16) and iters <= 20
    out = kmeans_assign(ds, centroids).to_pandas()
    # every true blob maps to exactly one fitted cluster (pure partition)
    truth_by_id = {int(i): truth[i] for i in range(len(vecs))}
    groups = {}
    for vid, cl in zip(out.vec_id, out.cluster):
        groups.setdefault(truth_by_id[int(vid)], set()).add(int(cl))
    assert all(len(s) == 1 for s in groups.values())
    assert len({next(iter(s)) for s in groups.values()}) == 3


def test_kmeans_fit_deterministic_across_runs():
    from rotel_ray.stages.similarity import kmeans_fit

    rng = np.random.default_rng(4)
    t = pa.table({
        "vec_id": pa.array(np.arange(60), pa.int64()),
        "embedding": pa.array([row.tolist() for row in
                               rng.standard_normal((60, 8)).astype(np.float32)],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t).repartition(3)
    c1, i1 = kmeans_fit(ds, k=4, iters=6)
    c2, i2 = kmeans_fit(ds, k=4, iters=6)
    assert i1 == i2
    np.testing.assert_array_equal(c1, c2)


def test_semdedup_drops_planted_duplicates():
    from rotel_ray.stages.similarity import semdedup

    rng = np.random.default_rng(12)
    n, d = 50, 16
    m = rng.standard_normal((n, d)).astype(np.float32)
    m[49] = m[3] + 0.001 * rng.standard_normal(d).astype(np.float32)  # near-dup of 3
    m[48] = m[7]                                                      # exact dup of 7
    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(4)
    centroids = m[:8].astype(np.float64)
    kept = set(semdedup(ds, centroids, tau=0.95, num_buckets=8).to_pandas().vec_id)
    assert 48 not in kept and 49 not in kept  # higher ids of the dup pairs
    assert 3 in kept and 7 in kept
    assert len(kept) >= n - 4  # only near-dup pairs dropped


def test_quantize_embeddings_reconstruction_and_constant_dim(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.similarity import quantize_embeddings

    rng = np.random.default_rng(3)
    m = rng.standard_normal((40, 5))
    m[:, 2] = 7.5  # constant dim -> qv must be 0 everywhere
    ds = ray.data.from_arrow(pa.table({
        "vec_id": list(range(40)),
        "embedding": [row.astype(np.float32).tolist() for row in m]}))
    out = quantize_embeddings(ds, num_buckets=2).to_pandas()
    assert len(out) == 40 * 5
    assert (out.loc[out.dim == 2, "qv"] == 0).all()
    assert out.qv.between(0, 255).all()
    # reconstruction error bounded by half a quantization step per dim
    m32 = m.astype(np.float32).astype(np.float64)
    lo, hi = m32.min(axis=0), m32.max(axis=0)
    q = out.sort_values(["vec_id", "dim"]).qv.to_numpy().reshape(40, 5)
    span = np.where(hi > lo, hi - lo, 1.0)
    recon = lo + q * (span / 255.0)
    err = np.abs(recon - m32)[:, [0, 1, 3, 4]]
    assert err.max() <= (span[[0, 1, 3, 4]] / 255.0).max() * 0.5 + 1e-12


def test_pq_codes_codebook_vectors_self_code(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.similarity import pq_codes

    rng = np.random.default_rng(4)
    emb = rng.standard_normal((40, 16)).astype(np.float32)
    # make the first 4 vectors well-separated so self-distance 0 is unique
    emb[:4] *= 10
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(40), pa.int64()),
        "embedding": [r.tolist() for r in emb]}))
    out = pq_codes(ds, m=4, k=4, num_buckets=2).to_pandas()
    assert len(out) == 40 * 4
    assert out["code"].between(0, 3).all() and out["sub"].between(0, 3).all()
    for vid in range(4):  # codebook vectors encode to themselves
        mine = out[out.vec_id == vid].sort_values("sub")
        assert list(mine["code"]) == [vid] * 4


def test_pq_search_recall_vs_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.similarity import pq_search

    rng = np.random.default_rng(8)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(200), pa.int64()),
        "embedding": [r.tolist() for r in emb]}))
    # plant near-duplicates of the query: ADC must surface them — PQ recall
    # on unstructured Gaussians is poor by construction (codebooks are the
    # deterministic first-k vectors, not Lloyd-refined), but planted dups
    # share the query's cells and must beat everything else
    q = emb[17].astype(np.float64)
    for vid in (60, 61, 62):
        emb[vid] = (q + 0.01 * rng.standard_normal(16)).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(200), pa.int64()),
        "embedding": [r.tolist() for r in emb]}))
    out = pq_search(ds, q, k_top=10, m=4, k=8, num_buckets=2).to_pandas()
    assert len(out) == 10
    assert {17, 60, 61, 62} <= set(out.vec_id)
    # ADC of the self-match is the global minimum
    assert out.sort_values(["adc", "vec_id"]).iloc[0].adc == out.adc.min()
    assert (out.adc >= 0).all()


def _ref_kmeans_int(m, k, rounds, scale=1000.0):
    x = np.floor(m.astype(np.float64) * scale).astype(np.int64)
    c = x[:k].copy()

    def dists(cm):
        return ((x * x).sum(1, keepdims=True) - 2 * (x @ cm.T)
                + (cm * cm).sum(1)[None, :])

    for _ in range(rounds - 1):
        a = np.argmin(dists(c), axis=1)
        for j in range(k):
            sel = x[a == j]
            if len(sel):
                c[j] = sel.sum(0) // len(sel)
    dm = dists(c)
    a = np.argmin(dm, axis=1)
    return a, dm[np.arange(len(a)), a]


def test_kmeans_fit_int_matches_reference(ray_session):
    from rotel_ray.stages.similarity import kmeans_fit_int

    t, m = _emb_table(n=200, d=16, seed=5)
    out = (kmeans_fit_int(rd.from_arrow(t).repartition(4), k=6, rounds=3)
           .to_pandas().sort_values("vec_id"))
    a_ref, d_ref = _ref_kmeans_int(m, k=6, rounds=3)
    assert (out.cluster.to_numpy() == a_ref).all()
    assert (out.dist.to_numpy() == d_ref).all()


def test_kmeans_fit_int_empty_cluster_keeps_centroid(ray_session):
    from rotel_ray.stages.similarity import kmeans_fit_int

    # two tight blobs far apart + k=3: the third centroid (init = vec 2,
    # inside blob A) empties after round 1 and must keep its coordinates
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.01, (20, 8)).astype(np.float32)
    b = rng.normal(100, 0.01, (20, 8)).astype(np.float32)
    m = np.vstack([a, b])
    t = pa.table({"vec_id": pa.array(range(len(m)), pa.int64()),
                  "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32()))})
    out = (kmeans_fit_int(rd.from_arrow(t).repartition(3), k=3, rounds=4)
           .to_pandas().sort_values("vec_id"))
    a_ref, d_ref = _ref_kmeans_int(m, k=3, rounds=4)
    assert (out.cluster.to_numpy() == a_ref).all()
    assert (out.dist.to_numpy() == d_ref).all()


def test_embedding_covariance_exact(ray_session):
    from rotel_ray.stages.similarity import embedding_covariance

    t, m = _emb_table(n=150, d=12, seed=8)
    out = (embedding_covariance(rd.from_arrow(t).repartition(4))
           .to_pandas().set_index(["i", "j"]).sort_index())
    x = np.floor(m.astype(np.float64) * 1000.0).astype(np.int64)
    g = x.T @ x
    s = x.sum(0)
    assert len(out) == 12 * 13 // 2
    for (i, j), row in out.iterrows():
        assert row.n == 150 and row.s_ij == g[i, j]
        assert row.sum_i == s[i] and row.sum_j == s[j]
    # covariance reconstruction sanity: matches numpy cov up to quantization
    cov_q = (g / 150 - np.outer(s, s) / 150**2) / 1000.0**2
    assert np.allclose(cov_q, np.cov(m.astype(np.float64).T, bias=True), atol=1e-4)


def test_planted_fixture_deterministic(tmp_path):
    """Rebuilding the planted fixtures in a fresh root is byte-identical."""
    import filecmp

    import pyarrow.parquet as pq

    from rotel_ray.stages.planted import (ensure_planted_neardup,
                                          ensure_planted_topk)

    sf = "/root/testdata/sf0.001"
    a1 = ensure_planted_topk(sf, root=str(tmp_path / "r1"))
    a2 = ensure_planted_topk(sf, root=str(tmp_path / "r2"))
    assert filecmp.cmp(a1 + "/part-0000.parquet", a2 + "/part-0000.parquet",
                       shallow=False)
    b1 = ensure_planted_neardup(sf, root=str(tmp_path / "r1"))
    b2 = ensure_planted_neardup(sf, root=str(tmp_path / "r2"))
    assert filecmp.cmp(b1 + "/part-0000.parquet", b2 + "/part-0000.parquet",
                       shallow=False)
    assert pq.read_table(a1).num_rows > pq.read_table(
        f"{sf}/embeddings.parquet").num_rows


def test_planted_topk_approx_equals_exact(ray_session):
    """Over the planted fixture the approximate paths provably return the
    exact top-k: LSH, IVF and brute force agree on ids."""
    import ray

    from rotel_ray.stages.planted import ensure_planted_topk
    from rotel_ray.stages.similarity import (brute_force_topk, ivf_topk,
                                             lsh_topk)

    sf = "/root/testdata/sf0.001"
    path = ensure_planted_topk(sf)
    import numpy as np
    import pyarrow.parquet as pq

    t0 = pq.read_table(f"{sf}/embeddings.parquet")
    q = np.asarray(
        t0.filter(__import__("pyarrow").compute.equal(
            __import__("pyarrow").compute.field("vec_id"), 0))
        .column("embedding").to_pylist()[0], dtype=np.float64)

    def ids(res):
        return [r["vec_id"] for r in res.select_columns(["vec_id"]).take_all()]

    ds = ray.data.read_parquet(path)
    exact = ids(brute_force_topk(ds, q, 10))
    assert ids(lsh_topk(ds, q, 10)) == exact
    assert ids(ivf_topk(ds, q, 10)) == exact
    # vec 0 itself leads; the rest are planted ids
    from rotel_ray.stages.planted import PLANT_BASE

    assert exact[0] == 0 and all(v >= PLANT_BASE for v in exact[1:])


def test_embedding_pca_project_matches_numpy():
    """Distributed exact-int covariance -> driver eigh -> projection equals
    direct numpy PCA on the same int-quantized matrix (same sign
    convention), and explained variances come out sorted."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.similarity import embedding_pca_project

    rng = np.random.default_rng(9)
    d, n, k, scale = 12, 400, 4, 1000.0
    # anisotropic cloud so the top components are well separated
    basis = rng.standard_normal((d, d))
    m = (rng.standard_normal((n, d)) * np.linspace(5, 0.1, d)) @ basis
    m = m.astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    })
    out, comps, expl = embedding_pca_project(
        rd.from_arrow(t).repartition(4), k=k, scale=scale)
    # reference: same quantization, numpy cov + eigh
    x = np.floor(m.astype(np.float64) * scale)
    mean = x.mean(axis=0)
    cov = ((x - mean).T @ (x - mean)) / n  # biased, matches s/n - μμ'
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    ref = evecs[:, order].T
    flip = np.sign(ref[np.arange(k), np.abs(ref).argmax(axis=1)])
    ref = ref * flip[:, None]
    assert np.allclose(comps, ref, atol=1e-9)
    assert np.all(np.diff(expl) <= 1e-12)  # descending variance
    # projection parity on a few rows
    proj = out.take_all()
    got0 = np.array(proj[0]["proj"])
    want0 = (m[0].astype(np.float64) - mean / scale) @ ref.T
    assert np.allclose(got0, want0, rtol=1e-5)
    # components orthonormal
    assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-9)


# ---------------------------------------------------------------------------
# organic recall@k (round-5): no planting — the ANN paths measured against
# brute-force ground truth on the REAL embeddings table. i.i.d. gaussian
# vectors are the adversarial case for ANN (cosines concentrate near 0, no
# cluster structure), so recall here is a floor, not a showcase; the curve
# must be monotone in the probe width (the multiprobe recall/cost knob).
# ---------------------------------------------------------------------------

ORGANIC_SF = "/root/testdata/sf0.001"


def _organic_mirror(num_bits=8):
    """Numpy mirror of lsh_topk/ivf_topk candidate selection — identical
    kernels (make_planes/lsh_signatures/_probe_buckets/_kmeans_lite), pinned
    to the engine by test_organic_engine_equals_mirror below."""
    import pyarrow.parquet as pq

    from rotel_ray.stages.similarity import (LSH_SEED, _kmeans_lite,
                                             _normalize, _probe_buckets,
                                             lsh_signatures, make_planes)

    t = pq.read_table(f"{ORGANIC_SF}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    m = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    mn = _normalize(m.astype(np.float64))
    planes = make_planes(m.shape[1], num_bits, LSH_SEED)
    sigs = lsh_signatures(mn, planes)
    cents = _kmeans_lite(m[:2048].astype(np.float64), 16, seed=LSH_SEED)
    assign = np.argmax(mn @ cents.T, axis=1)

    def lsh_ids(qi, ph, k=10):
        q = mn[qi]
        probes = _probe_buckets(int(lsh_signatures(q[None, :], planes)[0]),
                                num_bits, ph)
        cand = np.isin(sigs, probes)
        sims = mn @ q
        return ids[cand][np.argsort(-sims[cand])[:k]].tolist()

    def ivf_ids(qi, n_probe, k=10):
        q = mn[qi]
        cmask = np.isin(assign, np.argsort(-(cents @ q))[:n_probe])
        sims = mn @ q
        return ids[cmask][np.argsort(-sims[cmask])[:k]].tolist()

    def truth(qi, k=10):
        return set(ids[np.argsort(-(mn @ mn[qi]))[:k]].tolist())

    return ids, mn, lsh_ids, ivf_ids, truth


def test_probe_buckets_full_hamming_range():
    from math import comb

    from rotel_ray.stages.similarity import _probe_buckets

    for h in range(0, 9):
        got = _probe_buckets(0b10110100, 8, h)
        assert len(got) == sum(comb(8, i) for i in range(h + 1))
        assert len(set(got.tolist())) == len(got)
    # clamps beyond num_bits
    assert len(_probe_buckets(3, 8, 99)) == 256


def test_organic_recall_curve():
    ids, mn, lsh_ids, ivf_ids, truth = _organic_mirror()
    k = 10
    qis = list(range(0, len(ids), max(1, len(ids) // 20)))[:20]

    def mean_recall(fn, width):
        return float(np.mean([len(set(fn(qi, width)) & truth(qi)) / k
                              for qi in qis]))

    lsh = {ph: mean_recall(lsh_ids, ph) for ph in (2, 3, 4, 5)}
    ivf = {np_: mean_recall(ivf_ids, np_) for np_ in (4, 8, 12)}
    # monotone in probe width (the knob is real)
    assert lsh[2] <= lsh[3] <= lsh[4] <= lsh[5]
    assert ivf[4] <= ivf[8] <= ivf[12]
    # stated organic targets (measured 0.84/0.965 lsh, 0.835/0.925 ivf
    # with comfortable margins; gaussian data = worst case)
    assert lsh[4] >= 0.70 and lsh[5] >= 0.90
    assert ivf[8] >= 0.70 and ivf[12] >= 0.85


def test_organic_engine_equals_mirror(ray_session):
    """The real Ray lsh_topk/ivf_topk paths over the organic table return
    EXACTLY the mirror's ids — same candidate set, same exact-cosine order
    (pins the curve above to the engine)."""
    from rotel_ray.io import read_parquet
    from rotel_ray.stages.similarity import ivf_topk, lsh_topk

    ids, mn, lsh_ids, ivf_ids, truth = _organic_mirror()
    path = f"{ORGANIC_SF}/embeddings.parquet"
    for qi in (0, 250):
        q = mn[qi]
        got = lsh_topk(read_parquet(path), q, k=10, num_bits=8,
                       probe_hamming=4).to_pandas()
        assert got.vec_id.tolist() == lsh_ids(qi, 4)
        got = ivf_topk(read_parquet(path), q, k=10, n_centroids=16,
                       n_probe=8).to_pandas()
        assert got.vec_id.tolist() == ivf_ids(qi, 8)


def test_int_dot_topk_ties_break_to_lowest_id():
    from rotel_ray.stages.similarity import int_dot_topk

    # vecs 1 and 3 have IDENTICAL quantized dot products with q=[1,0]; the
    # tie must break to the lower vec_id both inside the per-batch partial
    # top-k and in the final sort
    vecs = [[1.0, 0.0], [0.5, 0.5], [0.0, 1.0], [0.5, 0.5], [0.9, 0.0]]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(5), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }))
    got = int_dot_topk(ds, np.array([1.0, 0.0]), k=3).to_pandas()
    # ip: v0=1e12, v4=899999e6 (0.9f32 = 0.89999997..., floor 899999),
    # v1=v3=5e11 (tie -> keep 1), v2=0
    assert got.vec_id.tolist() == [0, 4, 1]
    assert got.ip.tolist() == [10**12, 899999 * 10**6, 5 * 10**11]


def test_hybrid_rrf_fuses_both_rankings():
    import math

    from rotel_ray.stages.similarity import hybrid_rrf, int_dot_topk
    from rotel_ray.stages.textstats import bm25_topk

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(["data of the", "the the the", "x y z", "of data"]),
    }))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.8, 0.0], [0.0, 1.0], [0.9, 0.0]],
                              pa.list_(pa.float32())),
    }))
    q = np.array([1.0, 0.0])
    terms = ["the", "of", "data"]
    got = hybrid_rrf(docs, emb, q, terms, k_each=3, k_out=4, rrf_k=60)

    # expected fusion from the two (independently oracled) source rankings
    dr = {d: r + 1 for r, d in
          enumerate(int_dot_topk(emb, q, 3).to_pandas().vec_id)}
    lr = {d: r + 1 for r, d in
          enumerate(bm25_topk(docs, terms, k=3).to_pandas().doc_id)}
    exp = {d: math.floor((
        (1.0 / (60 + dr[d]) if d in dr else 0.0)
        + (1.0 / (60 + lr[d]) if d in lr else 0.0)) * 1e9)
        for d in set(dr) | set(lr)}
    assert dict(zip(got.doc_id, got.rrf_nano)) == exp
    assert got.rrf_nano.is_monotonic_decreasing


def test_embedding_outliers_exact_int_distance():
    from rotel_ray.stages.similarity import embedding_outliers

    # label 0: three vectors near [1,0] and one far at [9,0] -> the far one
    # must rank first; label 1 is tight around [0,1]
    vecs = [[1.0, 0.0], [1.2, 0.0], [0.8, 0.0], [9.0, 0.0],
            [0.0, 1.0], [0.0, 1.1]]
    labels = [0, 0, 0, 0, 1, 1]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))
    got = embedding_outliers(ds, k=3).to_pandas()
    assert got.vec_id.tolist()[0] == 3  # the planted outlier

    # replicate the division-free arithmetic for the winner
    x = np.floor(np.array(vecs, np.float64) * 1000.0).astype(np.int64)
    s0, n0 = x[:4].sum(axis=0), 4
    exp = int(((n0 * x[3] - s0) ** 2).sum())
    assert got.dist2.tolist()[0] == exp


def test_label_scatter_separable_labels(ray_session):
    """Two tight clusters far apart: within_avg small, between_avg large,
    fisher ratio high; exact values checked against the closed form."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.similarity import label_scatter

    vecs = [[0.0, 0.0], [0.002, 0.0],       # label 0 around origin
            [1.0, 1.0], [1.002, 1.0]]        # label 1 around (1,1)
    t = pa.table({"embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array([0, 0, 1, 1], pa.int32())})
    out = (label_scatter(rd.from_arrow(t).repartition(2), num_buckets=2)
           .to_pandas().set_index("label").sort_index())
    # label 0: q = [[0,0],[2,0]]: within = (2*4 - 4) + 0 = 4 -> //(4*2)=0
    assert out.loc[0, "n"] == 2
    assert out.loc[0, "within_avg"] == 0
    # quantized ints from float32 storage: label0 -> (0,0),(2,0);
    # label1 -> (1000,1000),(1001,1000)  (float32(1.002)*1000 floors to 1001)
    s0 = (2, 0)
    g = (2 + 1000 + 1001, 2000)
    b = sum((s * 4 - gd * 2) ** 2 for s, gd in zip(s0, g)) // (4 * 16 * 2)
    assert out.loc[0, "between_avg"] == b
    assert out.loc[0, "fisher_e6"] == b * 1_000_000


def test_embedding_norms_buckets(ray_session):
    """Quantized norms bucket by bit_length: [0.001,0]->n2=1 (bucket 1);
    [1,0]->n2=1e6 (bucket 20); zero vector -> bucket 0."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.similarity import embedding_norms

    vecs = [[0.001, 0.0], [1.0, 0.0], [0.0, 0.0]]
    t = pa.table({"embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array([0, 0, 1], pa.int32())})
    out = (embedding_norms(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index(["label", "norm2_bucket"]).sort_index())
    assert out.loc[(0, 1), "n_vecs"] == 1      # n2 = 1 -> bit_length 1
    assert out.loc[(0, 20), "n_vecs"] == 1     # n2 = 1e6 -> bit_length 20
    assert out.loc[(1, 0), "n_vecs"] == 1      # zero norm -> bucket 0
    assert out.loc[(0, 20), "max_norm2"] == 1_000_000


def test_knn_classify_majority_and_ties(ray_session):
    """Query 0 has 3 label-1 / 2 label-0 neighbors among its top-5 by
    quantized dot; vote tie at k=2 breaks toward the smaller label."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.similarity import knn_classify

    # query at e0; neighbors along e0 with decaying dot; labels planted
    vecs = [[1.0, 0.0]]                      # vec_id 0 = query
    labs = [9]
    for i, (s, l) in enumerate(zip([0.9, 0.8, 0.7, 0.6, 0.5, 0.4],
                                   [1, 1, 1, 0, 0, 0])):
        vecs.append([s, 0.1]); labs.append(l)
    t = pa.table({"vec_id": pa.array(range(7), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array(labs, pa.int32())})
    out = knn_classify(rd.from_arrow(t), k=5, query_mod=7,
                       num_buckets=2).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "vec_id"] == 0
    assert out.loc[0, "pred_label"] == 1 and out.loc[0, "n_votes"] == 3
    # k=2: top-2 are labels 1,1 -> still 1; k=4 -> 3x1+1x0 -> 1;
    # k=6 would tie 3-3 -> smaller label 0 wins
    out6 = knn_classify(rd.from_arrow(t), k=6, query_mod=7,
                        num_buckets=2).to_pandas()
    assert out6.loc[0, "pred_label"] == 0 and out6.loc[0, "n_votes"] == 3


def test_mmr_select_diversity(ray_session):
    """Pure relevance would pick the two near-identical top vectors;
    MMR's penalty forces the diverse orthogonal pick at rank 2."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.similarity import mmr_select

    vecs = [[1.0, 0.0],        # 0 = query
            [0.9, 0.3],        # 1: rel 899k (f32 0.9 floors to 899)
            [0.9, 0.31],       # 2: rel tied with 1 but sim(2,1) > rel
            [0.6, -0.6]]       # 3: lower rel, low sim to 1
    t = pa.table({"vec_id": pa.array(range(4), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    out = mmr_select(rd.from_arrow(t), k=3, lam_e3=500,
                     query_id=0).to_pandas()
    assert list(out["rank"]) == [1, 2, 3]
    # round 1: rel tie 899000 between 1 and 2 -> smaller id; round 2:
    # 2's penalty (899*899+310*300=901201) exceeds its rel, 3's doesn't
    assert list(out["vec_id"]) == [1, 3, 2]
    assert out.loc[0, "score"] == 500 * 899_000   # pure relevance round 1
    assert out.loc[1, "score"] == 500 * (600_000 - (600 * 899 - 601 * 300))
    assert out.loc[2, "score"] == 500 * (899_000 - 901_201)


def test_label_centroids_exact(ray_session):
    """Two labels with hand-computable centroids: a at (1,0)x2, b at
    (0,2)x1 -> dist2_q = ((2000*1-0)^2 + (0-2000*2)^2) // (2*1)^2."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.similarity import label_centroids

    t = pa.table({"embedding": pa.array([[1.0, 0.0], [1.0, 0.0],
                                         [0.0, 2.0]],
                                        pa.list_(pa.float32())),
                  "label": pa.array([0, 0, 1], pa.int32())})
    out = label_centroids(rd.from_arrow(t), num_buckets=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["label_a"], r["label_b"], r["n_a"], r["n_b"]) == (0, 1, 2, 1)
    assert r["dist2_q"] == ((2000 * 1) ** 2 + (2000 * 2) ** 2) // 4
