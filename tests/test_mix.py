

def test_cdc_field_diff_text_only(ray_session):
    """v2 rewrites text of one common doc; lang/source/n_chars untouched."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.mix import cdc_field_diff

    def tbl(texts):
        return pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                         "text": pa.array(texts),
                         "lang": pa.array(["en", "en"]),
                         "source": pa.array(["s", "s"]),
                         "n_chars": pa.array([5, 5], pa.int64())})

    v1 = rd.from_arrow(tbl(["hello", "world"]))
    v2 = rd.from_arrow(tbl(["hello", "WORLD v2"]))
    out = (cdc_field_diff(v1, v2, num_buckets=2).to_pandas()
           .set_index("field"))
    assert (out["n_common"] == 2).all()
    assert out.loc["text", "n_changed"] == 1
    assert out.loc["lang", "n_changed"] == 0
    assert out.loc["n_chars", "n_changed"] == 0
