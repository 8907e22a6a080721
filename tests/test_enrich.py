"""Enrich-stage unit tests: attributes-processor actions (all seven),
redaction, broadcast lookup — semantics per
rotel_python_processor_sdk/processors/{attributes,redaction}_processor.py."""

import hashlib

import pyarrow as pa

from rotel_ray.stages.enrich import (
    AttrAction,
    AttributesProcessor,
    Enricher,
    RedactionConfig,
    RedactionProcessor,
)


def _t(**cols):
    return pa.table(cols)


def test_insert_only_where_absent():
    t = _t(k=pa.array(["a", None, "b"]))
    out = AttributesProcessor([AttrAction("insert", key="k", value="X")])(t)
    assert out.column("k").to_pylist() == ["a", "X", "b"]


def test_insert_new_column():
    out = AttributesProcessor([AttrAction("insert", key="env", value="prod")])(_t(x=[1]))
    assert out.column("env").to_pylist() == ["prod"]


def test_update_only_where_present():
    t = _t(k=pa.array(["a", None]))
    out = AttributesProcessor([AttrAction("update", key="k", value="X")])(t)
    assert out.column("k").to_pylist() == ["X", None]


def test_upsert_overwrites_all():
    t = _t(k=pa.array(["a", None]))
    out = AttributesProcessor([AttrAction("upsert", key="k", value="X")])(t)
    assert out.column("k").to_pylist() == ["X", "X"]


def test_delete_by_key_and_pattern():
    t = _t(a=[1], b_secret=[2], c_secret=[3])
    out = AttributesProcessor([AttrAction("delete", key="a"), AttrAction("delete", pattern=r".*_secret")])(t)
    assert out.column_names == []


def test_hash_action_sha256():
    t = _t(password=pa.array(["hunter2", None]))
    out = AttributesProcessor([AttrAction("hash", key="password")])(t)
    expect = hashlib.sha256(b"hunter2").hexdigest()
    assert out.column("password").to_pylist() == [expect, None]


def test_extract_named_groups():
    t = _t(req=pa.array(["GET /a HTTP/1.1", "POST /b HTTP/2"]))
    out = AttributesProcessor(
        [AttrAction("extract", from_attribute="req", pattern=r"^(?P<method>\w+) (?P<path>\S+)")]
    )(t)
    assert out.column("method").to_pylist() == ["GET", "POST"]
    assert out.column("path").to_pylist() == ["/a", "/b"]


def test_convert_casts():
    t = _t(s=pa.array(["1", "2"]), b=pa.array(["yes", "no"]))
    out = AttributesProcessor(
        [AttrAction("convert", key="s", converted_type="int"), AttrAction("convert", key="b", converted_type="bool")]
    )(t)
    assert out.column("s").to_pylist() == [1, 2]
    assert out.column("b").to_pylist() == [True, False]  # truthy strings


def test_from_attribute_value_sourcing():
    t = _t(src=pa.array(["v1", "v2"]), dst=pa.array([None, "old"], pa.string()))
    out = AttributesProcessor([AttrAction("upsert", key="dst", from_attribute="src")])(t)
    assert out.column("dst").to_pylist() == ["v1", "v2"]


def test_redaction_blocked_key_masks_whole_column():
    t = _t(user_password=pa.array(["abc", None]), other=pa.array(["keep", "keep"]))
    cfg = RedactionConfig(blocked_key_patterns=[".*password.*"])
    out = RedactionProcessor(cfg)(t)
    assert out.column("user_password").to_pylist() == ["[REDACTED]", None]
    assert out.column("other").to_pylist() == ["keep", "keep"]
    assert out.column("redaction_masked_count").to_pylist() == [1, 0]


def test_redaction_blocked_value_with_allowed_override():
    t = _t(v=pa.array(["card 4111111111111111", "safe 4111111111111111 ok", "clean"]))
    cfg = RedactionConfig(
        blocked_value_patterns=[r"\d{16}"],
        allowed_value_patterns=["safe"],
    )
    out = RedactionProcessor(cfg)(t)
    assert out.column("v").to_pylist() == ["[REDACTED]", "safe 4111111111111111 ok", "clean"]


def test_redaction_hash_mask():
    t = _t(v=pa.array(["secret1"]))
    cfg = RedactionConfig(blocked_key_patterns=["v"], mask="hash:sha256")
    out = RedactionProcessor(cfg)(t)
    assert out.column("v").to_pylist() == [hashlib.sha256(b"secret1").hexdigest()]


def test_redaction_allow_all_keys_false_deletes_unlisted():
    t = _t(keep=pa.array(["a"]), drop=pa.array(["b"]))
    cfg = RedactionConfig(allow_all_keys=False, allowed_keys=["keep"])
    out = RedactionProcessor(cfg)(t)
    assert "drop" not in out.column_names and "keep" in out.column_names


def test_enricher_lookup_and_resource_upsert():
    t = _t(role=pa.array(["user", "tool", "nobody"]), tool=pa.array(["bash", "search", ""]))
    e = Enricher(resource_attrs={"service.name": "rotel-ray"})
    out = e(t)
    assert out.column("role_side").to_pylist() == ["client", "tool", None]
    assert out.column("tool_kind").to_pylist() == ["process", "http", None]
    assert out.column("service.name").to_pylist() == ["rotel-ray"] * 3


def test_context_enrich_constant_columns(transcripts_dir):
    import ray.data as rd

    from rotel_ray.stages.enrich import context_enrich

    ds = rd.read_parquet(transcripts_dir).limit(100)
    out = context_enrich(ds, {"x-tenant": "acme", "user-agent": "cli"}).to_pandas()
    assert (out["http.request.header.x-tenant"] == "acme").all()
    assert (out["http.request.header.user-agent"] == "cli").all()
    assert len(out) == 100


def test_debug_inspector_summary(caplog):
    import logging

    import pyarrow as pa

    from rotel_ray.stages.debug import debug_batch, summarize_batch

    t = pa.table(
        {
            "sink": pa.array(["traces", "logs", "logs"]),
            "event_type": pa.array(["tool_call", "chat", "error"]),
            "x": pa.array([1, 2, 3]),
        }
    )
    s = summarize_batch(t, "logs")
    assert "records=3" in s and "logs=2" in s and "traces=1" in s
    assert "event_types=chat:1,error:1,tool_call:1" in s
    with caplog.at_level(logging.INFO, logger="rotel_ray.debug"):
        out = debug_batch(t, verbosity="detailed")
    assert out is t  # pass-through, zero-copy
    assert any("Received logs" in r.message for r in caplog.records)
    assert any("first_record" in r.message for r in caplog.records)


def test_redaction_debug_summary_names():
    """summary='debug' also emits per-row masked key NAMES (the
    redaction.<ctx>.masked_keys.names meta-attr analogue)."""
    import pyarrow as pa

    from rotel_ray.stages.enrich import RedactionConfig, RedactionProcessor

    proc = RedactionProcessor(RedactionConfig(
        blocked_value_patterns=[r"^10\."], summary="debug"))
    t = pa.table({
        "src": pa.array(["10.1.1.1", "8.8.8.8", "10.2.2.2"]),
        "dst": pa.array(["10.9.9.9", "10.8.8.8", "1.1.1.1"]),
    })
    out = proc(t)
    assert out.column("redaction_masked_count").to_pylist() == [2, 1, 1]
    assert out.column("redaction_masked_keys").to_pylist() == ["src,dst", "dst", "src"]
