"""Join-operator tests: broadcast join vs pandas merge; hash-shuffle join."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from rotel_ray.stages.join import broadcast_join, hash_join


def _facts(n=1000, seed=2):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"k": rng.integers(0, 50, n), "x": rng.random(n).round(4)})


def _dims():
    return pa.table({"k": pa.array(range(0, 40), pa.int64()),
                     "name": pa.array([f"dim{i}" for i in range(40)])})


def test_broadcast_join_inner():
    fdf = _facts()
    ds = rd.from_arrow(pa.Table.from_pandas(fdf, preserve_index=False))
    out = broadcast_join(ds, _dims(), left_on="k", right_on="k", take_cols=["name"]).to_pandas()
    ref = fdf.merge(_dims().to_pandas(), on="k", how="inner")
    assert len(out) == len(ref)
    assert sorted(out.name) == sorted(ref.name)


def test_broadcast_join_left_keeps_unmatched():
    fdf = _facts()
    ds = rd.from_arrow(pa.Table.from_pandas(fdf, preserve_index=False))
    out = broadcast_join(ds, _dims(), left_on="k", right_on="k", take_cols=["name"],
                         how="left").to_pandas()
    assert len(out) == len(fdf)
    assert out[out.k >= 40].name.isna().all()


def test_hash_join_matches_pandas():
    fdf = _facts()
    right = pd.DataFrame({"rk": range(0, 40), "name": [f"dim{i}" for i in range(40)]})
    l = rd.from_arrow(pa.Table.from_pandas(fdf, preserve_index=False))
    r = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))
    out = hash_join(l, r, on="k", right_on="rk", num_partitions=4).to_pandas()
    ref = fdf.merge(right, left_on="k", right_on="rk", how="inner")
    assert len(out) == len(ref)
    assert out.groupby("k").size().to_dict() == ref.groupby("k").size().to_dict()


def test_bucket_left_join_requires_fill_for_int_cols(ray_session):
    import pytest as _pt
    import ray.data as rd

    import pyarrow as pa

    from rotel_ray.stages.join import bucket_hash_join

    left = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([2], pa.int64()),
                                    "m": pa.array([5], pa.int64())}))
    with _pt.raises(ValueError, match="need a fill value"):
        bucket_hash_join(left, right, on="k", how="left")
    with _pt.raises(ValueError, match="not in"):
        bucket_hash_join(left, right, on="k", how="outer")


def test_bucket_anti_join_drops_matched_keys():
    from rotel_ray.stages.join import bucket_anti_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(["a", "b", "c", "d"]),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 4, 9], pa.int64()),
    }))
    got = (bucket_anti_join(left, right, on="k", right_on="rk",
                            num_buckets=4).to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert got.k.tolist() == [1, 3]
    assert got.v.tolist() == ["a", "c"]
    assert str(got.k.dtype) == "int64"


def test_pagerank_numpy_mirror_and_mass():
    """3-iteration integer PageRank on a tiny hand graph equals a direct
    numpy replay; ranks are positive and the known hub outranks leaves."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.graph import pagerank_int

    # star: everyone links to node 0; node 0 links to 1
    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1), (2, 1)]
    n = 5
    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    out = (pagerank_int(rd.from_arrow(t), n, iters=3, num_buckets=4)
           .to_pandas().set_index("node_id")["pagerank_int"].sort_index())

    scale = 10**12
    r0 = scale // n
    base = (15 * r0) // 100
    deg = np.zeros(n, np.int64)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, r0, np.int64)
    for _ in range(3):
        s = np.zeros(n, np.int64)
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = base + (85 * s) // 100
    assert list(out.index) == list(range(n))
    assert (out.to_numpy() == r).all()
    assert out[0] == out.max() and out[0] > out[3]


def test_link_graph_fixture_invariants():
    """Every node has >= 1 out-edge, no self-loops, no parallel edges,
    targets in range."""
    import pyarrow.parquet as pq

    from rotel_ray.stages.graph import GRAPH_MAX_OUT, ensure_link_graph

    d = ensure_link_graph("/root/testdata/sf0.001")
    t = pq.read_table(f"{d}/part-0000.parquet").to_pandas()
    n = 500
    assert t.src.nunique() == n
    assert (t.src != t.dst).all()
    assert not t.duplicated(["src", "dst"]).any()
    assert t.dst.between(0, n - 1).all()
    assert t.groupby("src").size().max() <= GRAPH_MAX_OUT


def test_triangle_count_known_graph():
    """K4 plus a pendant edge: 4 triangles, wedge count matches the
    degree formula, and parallel/reversed/self edges are canonicalized
    away."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.graph import triangle_count

    # K4 on {0,1,2,3} (4 triangles), pendant 3-4, plus noise:
    # duplicates, a reversed edge, and a self-loop
    e = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4),
         (1, 0), (2, 0), (4, 4), (0, 1)]
    t = pa.table({"src": pa.array([x[0] for x in e], pa.int64()),
                  "dst": pa.array([x[1] for x in e], pa.int64())})
    out = (triangle_count(rd.from_arrow(t).repartition(3), 5, num_buckets=4)
           .to_pandas().iloc[0])
    assert out.n_edges == 7
    # degrees: 0:3, 1:3, 2:3, 3:4, 4:1 -> wedges = 3+3+3+6+0 = 15
    assert out.n_wedges == 15
    assert out.n_triangles == 4


def test_label_propagation_majority_and_ties():
    """Seeds stay fixed; unlabeled nodes adopt the neighbor majority with
    ties broken by label ascending; second round reaches 2-hop nodes."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.graph import label_propagation

    # seeds: 0='en', 1='de', 2='de'. node 3 ~ {0,1,2} -> majority de.
    # node 4 ~ {0,1} -> tie en/de -> 'de' (asc). node 5 ~ {4} only ->
    # labeled in round 2 from node 4's round-1 label. node 6 isolated-ish
    # ~ {5}: round 2 can't reach (5 labeled only after round 1... it can:
    # round 2 uses l1 which includes 4; 5 gets labeled in round 2; 6 stays
    # unlabeled after 2 rounds).
    edges = [(0, 3), (1, 3), (2, 3), (0, 4), (1, 4), (4, 5), (5, 6)]
    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    seeds = rd.from_arrow(pa.table({"v": pa.array([0, 1, 2], pa.int64()),
                                    "lab": pa.array(["en", "de", "de"])}))
    out = (label_propagation(rd.from_arrow(t), seeds, iters=2, num_buckets=4)
           .to_pandas().set_index("node_id")["label"].sort_index())
    assert out.to_dict() == {0: "en", 1: "de", 2: "de",
                             3: "de", 4: "de", 5: "de"}
    assert 6 not in out.index


def test_two_hop_reach_known_graph():
    """0->1->2->0 cycle plus 0->3: reach excludes self, dedups the union of
    direct and 2-hop targets; sink nodes (no out-edges) emit no row."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.graph import two_hop_reach

    t = pa.table({"src": pa.array([0, 1, 2, 0], pa.int64()),
                  "dst": pa.array([1, 2, 0, 3], pa.int64())})
    out = (two_hop_reach(rd.from_arrow(t).repartition(2), num_buckets=4)
           .to_pandas().set_index("node_id")["n_reach"].sort_index())
    # 0: direct {1,3}, via 1 -> {2}           => 3
    # 1: direct {2},   via 2 -> {0}           => 2
    # 2: direct {0},   via 0 -> {1,3}         => 3
    assert out.to_dict() == {0: 3, 1: 2, 2: 3}


def test_edge_reciprocity_known_graph():
    """Edges 0->1, 1->0 (mutual pair), 1->2, plus a duplicate 0->1 that
    must dedup before counting: 3 distinct edges, 2 reciprocal."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.graph import edge_reciprocity

    t = pa.table({"src": pa.array([0, 1, 1, 0], pa.int64()),
                  "dst": pa.array([1, 0, 2, 1], pa.int64())})
    out = edge_reciprocity(rd.from_arrow(t).repartition(2),
                           num_buckets=4).to_pandas()
    assert out.loc[0, "n_edges"] == 3
    assert out.loc[0, "n_reciprocal"] == 2
    assert out.loc[0, "mutuality_e6"] == 666_666


def test_kcore_peel_path_plus_triangle():
    """Path 0-1-2-3 hanging off nothing + triangle 4-5-6: rounds peel the
    path ends then its middle; only the triangle survives with degree 2."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.graph import kcore_peel

    t = pa.table({"src": pa.array([0, 1, 2, 4, 5, 6], pa.int64()),
                  "dst": pa.array([1, 2, 3, 5, 6, 4], pa.int64())})
    out = (kcore_peel(rd.from_arrow(t).repartition(2), k=2, rounds=3,
                      num_buckets=4).to_pandas()
           .set_index("node_id")["degree"].sort_index())
    assert out.to_dict() == {4: 2, 5: 2, 6: 2}


def test_clustering_coefficient_known_graph():
    """Triangle 0-1-2 plus pendant 3 attached to 0: cc(1)=cc(2)=1e6,
    cc(0)=1/3 of 1e6 (1 triangle of C(3,2)=3 wedges), cc(3)=0."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.graph import clustering_coefficient

    t = pa.table({"src": pa.array([0, 1, 2, 0], pa.int64()),
                  "dst": pa.array([1, 2, 0, 3], pa.int64())})
    out = (clustering_coefficient(rd.from_arrow(t).repartition(2), 4,
                                  num_buckets=4).to_pandas()
           .set_index("node_id").sort_index())
    assert out["degree"].to_dict() == {0: 3, 1: 2, 2: 2, 3: 1}
    assert out["n_tri"].to_dict() == {0: 1, 1: 1, 2: 1, 3: 0}
    assert out["cc_e6"].to_dict() == {0: 333_333, 1: 1_000_000,
                                      2: 1_000_000, 3: 0}


def test_hits_int_star_graph():
    """Star 1,2,3 -> 0: after round 1 a(0)=3M (others 0), hubs get a(0)
    each; round 2 a(0)=sum of hubs = 9M, hubs 9M each, node 0 hub 0."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.graph import hits_int

    t = pa.table({"src": pa.array([1, 2, 3], pa.int64()),
                  "dst": pa.array([0, 0, 0], pa.int64())})
    out = (hits_int(rd.from_arrow(t).repartition(2), 4, num_buckets=4)
           .to_pandas().set_index("node_id").sort_index())
    assert out["auth_int"].to_dict() == {0: 9_000_000, 1: 0, 2: 0, 3: 0}
    assert out["hub_int"].to_dict() == {0: 0, 1: 9_000_000, 2: 9_000_000,
                                        3: 9_000_000}


def test_edge_overlap_triangle_plus_pendant():
    """Triangle 0-1-2 + pendant 3 on 0: edge (0,1) shares neighbor 2
    (jac = 1/(3+2-2-1) = 1/2); edge (0,3) shares none."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.graph import edge_overlap

    t = pa.table({"src": pa.array([0, 1, 2, 0], pa.int64()),
                  "dst": pa.array([1, 2, 0, 3], pa.int64())})
    out = (edge_overlap(rd.from_arrow(t).repartition(2), 4, num_buckets=4)
           .to_pandas().set_index(["a", "b"]).sort_index())
    assert len(out) == 4
    assert out.loc[(0, 1), "n_common"] == 1
    assert out.loc[(0, 1), "jac_e6"] == 500_000
    assert out.loc[(1, 2), "n_common"] == 1
    assert out.loc[(1, 2), "jac_e6"] == 1_000_000  # 1/(2+2-2-1)
    assert out.loc[(0, 3), "n_common"] == 0
    assert out.loc[(0, 3), "jac_e6"] == 0


def test_supplier_rank_topk_ties():
    """4 suppliers in one nation, tie on acctbal broken by suppkey asc;
    k=3 keeps the deterministic top three."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import topk_per_group

    t = pa.table({"s_nationkey": pa.array([1, 1, 1, 1], pa.int64()),
                  "s_acctbal": pa.array([9.0, 9.0, 5.0, 1.0]),
                  "s_suppkey": pa.array([7, 3, 9, 2], pa.int64()),
                  "s_name": pa.array(["a", "b", "c", "d"])})
    out = (topk_per_group(rd.from_arrow(t).repartition(2),
                          key="s_nationkey", order_col="s_acctbal",
                          id_col="s_suppkey", k=3,
                          cols=["s_nationkey", "s_acctbal", "s_suppkey",
                                "s_name"]).to_pandas()
           .sort_values("s_suppkey"))
    assert sorted(out["s_suppkey"].tolist()) == [3, 7, 9]


def test_assortativity_star_vs_path():
    """Star 0-{1,2,3}: every edge joins deg 3 to deg 1 -> perfectly
    disassortative; exact moment check: M=6, sx=sy=12, sxy=18,
    sxx=syy=30 -> num = 6*18-144 = -36, var = 6*30-144 = 36."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.graph import assortativity_moments

    t = pa.table({"src": pa.array([0, 0, 0], pa.int64()),
                  "dst": pa.array([1, 2, 3], pa.int64())})
    out = (assortativity_moments(rd.from_arrow(t), num_buckets=4)
           .to_pandas().iloc[0])
    assert out["m_halfedges"] == 6
    assert out["sxy_num"] == -36
    assert out["varx_num"] == 36 and out["vary_num"] == 36
