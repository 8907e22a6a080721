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
