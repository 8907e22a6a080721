"""Routed-row equality vs the DuckDB oracle at sf0.001 for every query with
an oracle (the in-repo mirror of the driver's correctness gate)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from rotel_ray.queries import QUERIES, oracle_sql

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def sqls():
    return oracle_sql(SF)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(oracle_sql.__wrapped__(SF) if hasattr(oracle_sql, "__wrapped__") else oracle_sql(SF)))
def test_query_matches_oracle(name, con, sqls):
    res = QUERIES[name](SF)
    ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    sql_df = con.execute(sqls[name]).fetchdf()
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} vs {len(sql_df)}"
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.allclose(av.astype(float), bv.astype(float), equal_nan=True), f"{name}.{c}"
        else:
            assert (pd.Series(av).fillna("∅").astype(str) == pd.Series(bv).fillna("∅").astype(str)).all(), f"{name}.{c}"


def test_registry_contract():
    """Driver-contract guard: every oracle key has a query; all callables
    and SQL strings are well-formed."""
    sqls = oracle_sql(SF)
    assert set(sqls) <= set(QUERIES)
    assert all(callable(f) for f in QUERIES.values())
    assert all(isinstance(s, str) and s.strip().upper().startswith("SELECT")
               or s.strip().upper().startswith("WITH") for s in sqls.values())
    rows_only = set(QUERIES) - set(sqls)
    # round 3: the approximate ANN paths run over planted fixtures and
    # carry full DuckDB oracles — every query is oracled
    assert rows_only == set()


def test_oracle_sql_has_no_fixture_side_effects(monkeypatch):
    """Round-5 advice: constructing the SQL dict must touch no fixture
    builder — on a cold /tmp the paths are computed purely (source parquet
    footers only) and the query callables own the builds."""
    import rotel_ray.generator as gen
    import rotel_ray.stages.clean as clean
    import rotel_ray.stages.jpeg as jpeg
    import rotel_ray.stages.mix as mix
    import rotel_ray.stages.multimodal as mm
    import rotel_ray.stages.planted as planted

    def _boom(*a, **k):
        raise AssertionError("oracle_sql() invoked a fixture builder")

    for mod, name in [(gen, "ensure_transcripts"),
                      (planted, "ensure_planted_topk"),
                      (planted, "ensure_planted_neardup"),
                      (mm, "ensure_media"),
                      (jpeg, "ensure_jpeg_media"),
                      (clean, "ensure_unicode_docs"),
                      (mix, "ensure_docs_v2")]:
        monkeypatch.setattr(mod, name, _boom)
    sqls = oracle_sql(SF)
    assert len(sqls) >= 153


def test_cross_table_overlap_hit_path(ray_session):
    """The leak audit's hit branch: a planted verbatim copy counts, a
    unique doc doesn't (the fixture corpora are disjoint, so the
    registry query legitimately reports zeros — this test proves the
    positive path)."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.aggregate import two_phase_aggregate
    from rotel_ray.stages.enrich import _hash_values
    from rotel_ray.stages.join import bucket_hash_join

    docs = rd.from_arrow(pa.table({
        "source": pa.array(["a", "a", "b"]),
        "text": pa.array(["leaked text", "unique one", "leaked text"])}))
    turns = rd.from_arrow(pa.table({
        "text": pa.array(["noise", "leaked text", "noise 2"])}))
    dh = docs.map_batches(
        lambda t: pa.table({"h": _hash_values(t.column("text"), "md5"),
                            "source": t.column("source")}),
        batch_format="pyarrow")
    th = two_phase_aggregate(
        turns.map_batches(
            lambda t: pa.table({
                "h": _hash_values(t.column("text"), "md5"),
                "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)}),
            batch_format="pyarrow"),
        ["h"], [("one", "max", "hit")], num_buckets=2)
    j = bucket_hash_join(dh, th, on="h", how="left", fill={"hit": 0},
                         num_buckets=2)
    out = two_phase_aggregate(
        j.map_batches(lambda t: t.append_column(
            "one", pa.nulls(t.num_rows, pa.int64()).fill_null(1)),
            batch_format="pyarrow"),
        ["source"], [("one", "sum", "n_docs"), ("hit", "sum", "n_leaked")],
        num_buckets=2).to_pandas().set_index("source")
    assert out.loc["a", "n_docs"] == 2 and out.loc["a", "n_leaked"] == 1
    assert out.loc["b", "n_leaked"] == 1
