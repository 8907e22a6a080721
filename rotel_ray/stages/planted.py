"""Planted-structure ANN fixtures: deterministic near-neighbor corpora that
make the approximate (recall < 1) search paths EXACTLY oracle-able.

The raw embeddings table gives LSH/IVF queries nothing deterministic to
retrieve: organic neighbors sit near the decision boundary, so recall is a
measured property, not an equality. These builders derive a fixture from
the sf embeddings table by appending planted rows whose retrieval is
GUARANTEED by construction, turning the approximate queries into exact,
SQL-checkable ones (the brute-force DuckDB ORDER BY / threshold join over
the fixture parquet IS the oracle):

- **top-k fixture**: planted vectors ``v_i = c_i*q̂ + sqrt(1-c_i²)*w_i`` at
  distinct target cosines (0.96 down in 0.005 steps) to the query vector
  (vec 0), with residuals ``w_i`` orthogonalized against q̂. The builder
  verifies — on the float32 values the engine will actually read — that
  every planted vector falls in an LSH-probed bucket (Hamming ≤ 2 of the
  query's signature) AND an IVF-probed cell (replicating ``ivf_topk``'s
  first-2048-row training sample on the final table), retrying seeds until
  all pass. Since every organic cosine is verifiably below the planted
  band, approximate top-k == exact top-k == the planted set + vec 0.
- **near-dup fixture**: power-of-two scaled clones ``2*v`` of seeded
  organic rows. Doubling is exact in IEEE-754 — elementwise 2x is exact,
  partial sums of ``(2x_i)^2`` round to exactly 4x the partials of
  ``x_i^2``, and sqrt/divide preserve the factor — so a clone's normalized
  vector, its LSH signature in EVERY band, and its centroid assignment are
  bit-identical to its source. At a tau above every organic pairwise
  cosine (verified blockwise at build time) the banded-LSH pair set is
  exactly the planted (source, clone) pairs.

Fixtures are pure functions of the sf table (atomic-rename cached under
/tmp like ensure_media); they are test/benchmark infrastructure — the
production entry points (lsh_topk / ivf_topk / embedding_neardup_lsh) are
unchanged and still run on arbitrary corpora.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .similarity import (
    LSH_SEED,
    _kmeans_lite,
    _normalize,
    _probe_buckets,
    embedding_matrix,
    lsh_signatures,
    make_planes,
)

PLANT_BASE = 10_000_000
PLANTED_NEARDUP_TAU = 0.99
N_PLANT_TOPK = 12

# bump when the fixture-generation code changes — the constant is part of
# the cache key so a stale /tmp fixture can never be silently reused
PLANTED_GEN_VERSION = 2


def source_tag(path: str) -> str:
    """Short content fingerprint of a source parquet (row count + byte size),
    baked into fixture cache keys: if the source table is ever regenerated
    with different contents, the key changes and the fixture (with its
    build-time retrievability/margin assertions) is rebuilt instead of a
    stale one being reused."""
    md = pq.ParquetFile(path).metadata
    return f"{md.num_rows}r{os.path.getsize(path):x}"


def _read_embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    m = embedding_matrix(t.column("embedding")).astype(np.float32)
    return ids, m


def _write_fixture(out: str, ids: np.ndarray, m: np.ndarray) -> str:
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float32()), m.shape[1]),
    })
    # ONE file: ivf_topk trains on limit(train_rows), whose row order is the
    # file order — a single file pins it
    pq.write_table(tbl, os.path.join(tmp, "part-0000.parquet"))
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def plant_topk_vectors(ids: np.ndarray, m: np.ndarray, *,
                       n_plant: int = N_PLANT_TOPK, num_bits: int = 8,
                       probe_hamming: int = 2, n_centroids: int = 16,
                       n_probe: int = 4, train_rows: int = 2048,
                       margin: float = 0.05
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Build ``n_plant`` float32 vectors at distinct target cosines to the
    query (row with id 0), VERIFIED retrievable by both lsh_topk (probed
    bucket within ``probe_hamming``) and ivf_topk (probed cell of centroids
    trained on the first ``train_rows`` rows of orig+planted, replicating
    the query's training sample). Returns (planted_ids, planted_vecs).
    Shared by the sf-scale fixture and the 500k-vector scale probe."""
    q = m[ids == 0][0].astype(np.float64)
    qn = q / np.linalg.norm(q)
    mn = _normalize(m.astype(np.float64))
    organic = mn @ qn
    organic_max = float(np.sort(organic)[-2])  # exclude vec 0 itself
    targets = 0.96 - 0.005 * np.arange(n_plant)
    if organic_max > targets.min() - margin:
        raise AssertionError(
            f"planted band too close to organic cosines ({organic_max:.3f})")

    planes = make_planes(m.shape[1], num_bits, LSH_SEED)
    qsig = int(lsh_signatures(qn[None, :], planes)[0])
    probes_lsh = set(_probe_buckets(qsig, num_bits, probe_hamming).tolist())

    seeds = np.arange(n_plant, dtype=np.int64)
    for _attempt in range(200):
        # build planted vectors (float32 — what the engine reads back)
        vs = np.empty((n_plant, m.shape[1]), np.float32)
        for i in range(n_plant):
            rng = np.random.default_rng(777_000 + 1009 * int(seeds[i]))
            w = rng.standard_normal(m.shape[1])
            w -= (w @ qn) * qn
            w /= np.linalg.norm(w)
            c = targets[i]
            vs[i] = (c * qn + np.sqrt(1.0 - c * c) * w).astype(np.float32)
        pn = _normalize(vs.astype(np.float64))
        # LSH membership on the exact stored values
        ok = np.array([int(s) in probes_lsh for s in lsh_signatures(pn, planes)])
        # IVF membership: replicate ivf_topk's training sample = first
        # train_rows rows of the final table (file order = orig then planted)
        sample = np.concatenate([m, vs])[:min(train_rows, len(m) + n_plant)] \
            .astype(np.float64)
        centroids = _kmeans_lite(sample, n_centroids, seed=LSH_SEED)
        cell_probes = set(np.argsort(-(centroids @ qn))[:n_probe].tolist())
        assign = np.argmax(pn @ centroids.T, axis=1)
        ok &= np.array([int(a) in cell_probes for a in assign])
        if ok.all():
            break
        seeds[~ok] += n_plant  # retry only the failing residuals
    else:
        raise AssertionError("planted top-k fixture failed to converge")

    # final sanity: planted sims distinct and dominating (float32 round-trip)
    sims = pn @ qn
    assert (np.diff(np.sort(sims)) > 1e-4).all()
    assert sims.min() > organic_max + margin
    return PLANT_BASE + np.arange(n_plant), vs


def planted_topk_path(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Deterministic cache path of the planted top-k fixture — pure (reads
    only the source parquet footer for the content fingerprint, never
    builds). ``oracle_sql()`` uses this so constructing the SQL dict has no
    fixture side effects; the query callables ensure_* themselves."""
    from ..generator import sf_from_dir

    tag = source_tag(f"{sf_dir}/embeddings.parquet")
    return os.path.join(
        root,
        f"planted_topk_g{PLANTED_GEN_VERSION}_sf{sf_from_dir(sf_dir):g}_{tag}")


def ensure_planted_topk(sf_dir: str, root: str = "/tmp/rotel_ray_data", *,
                        n_plant: int = N_PLANT_TOPK, num_bits: int = 8,
                        probe_hamming: int = 2, n_centroids: int = 16,
                        n_probe: int = 4, train_rows: int = 2048) -> str:
    """Original embeddings + ``n_plant`` verified-retrievable planted rows.

    The LSH/IVF parameters must match the query's (lsh_topk / ivf_topk
    defaults); membership is verified on the exact float32 values written.
    """
    out = planted_topk_path(sf_dir, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    ids, m = _read_embeddings(sf_dir)
    plant_ids, vs = plant_topk_vectors(
        ids, m, n_plant=n_plant, num_bits=num_bits,
        probe_hamming=probe_hamming, n_centroids=n_centroids,
        n_probe=n_probe, train_rows=train_rows)
    all_ids = np.concatenate([ids, plant_ids])
    return _write_fixture(out, all_ids, np.concatenate([m, vs]))


def planted_neardup_path(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Pure cache path of the planted near-dup fixture (see
    planted_topk_path)."""
    from ..generator import sf_from_dir

    tag = source_tag(f"{sf_dir}/embeddings.parquet")
    return os.path.join(
        root,
        f"planted_neardup_g{PLANTED_GEN_VERSION}_sf{sf_from_dir(sf_dir):g}_{tag}")


def ensure_planted_neardup(sf_dir: str, root: str = "/tmp/rotel_ray_data", *,
                           n_clones: int = 17, tau: float = PLANTED_NEARDUP_TAU
                           ) -> str:
    """Original embeddings + exact-scaled (2x) clones of seeded rows."""
    out = planted_neardup_path(sf_dir, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    ids, m = _read_embeddings(sf_dir)
    mn = _normalize(m.astype(np.float64))
    # blockwise max organic pairwise cosine — the tau margin guard
    mx = -1.0
    for i in range(0, len(mn), 1024):
        s = mn[i:i + 1024] @ mn.T
        for r in range(s.shape[0]):
            s[r, i + r] = -1.0
        mx = max(mx, float(s.max()))
    if mx > tau - 0.02:
        raise AssertionError(f"organic pairwise cosine {mx:.4f} too close to tau {tau}")
    order = np.argsort(ids)
    step = max(1, len(ids) // n_clones)
    src = order[::step][:n_clones]
    clones = m[src] * np.float32(2.0)  # power-of-two: exact in IEEE-754
    all_ids = np.concatenate([ids, PLANT_BASE + ids[src]])
    return _write_fixture(out, all_ids, np.concatenate([m, clones]))
