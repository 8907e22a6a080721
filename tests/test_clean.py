

def test_control_char_audit_attribution(ray_session):
    """Zap chars count per source through the doc_id join; clean docs
    raise n_docs but not affected counts."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.clean import control_char_audit

    docs = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                     "text": pa.array(["ok​ze​ro", "clean",
                                       "tab\x07bell"])})
    srcs = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                     "source": pa.array(["a", "a", "b"])})
    out = (control_char_audit(rd.from_arrow(docs), rd.from_arrow(srcs),
                              num_buckets=2)
           .to_pandas().set_index("source").sort_index())
    assert out.loc["a", "n_docs"] == 2
    assert out.loc["a", "n_docs_affected"] == 1
    assert out.loc["a", "n_zap_chars"] == 2
    assert out.loc["b", "n_zap_chars"] == 1 and out.loc["b", "n_docs"] == 1
