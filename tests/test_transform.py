"""Exporter-transform operator tests: flatten depth caps, the full Datadog
cascade branch set, namespace fallback chain, EMF event shape, X-Ray blocks,
recursive body redaction, and the gzip source path."""

import gzip
import json

import pyarrow as pa
import pyarrow.compute as pc

from rotel_ray.stages.transform import (
    DB_TYPES,
    derive_namespace,
    emf_event_json,
    flatten_attrs_batch,
    flatten_json_obj,
    operation_name_cascade,
    span_type_cascade,
    xray_prefix_groups,
)


# ---------------------------------------------------------------------------
# flatten (clickhouse/transformer.rs:56-84 + tests 237-760)
# ---------------------------------------------------------------------------


def test_flatten_dotted_keys_and_leaf_stringify():
    obj = {"s": "x", "i": 7, "d": 1.5, "b": True, "f": False, "n": None,
           "arr": [1, "a", {"k": 2}], "o": {"p": {"q": "deep"}}}
    got = dict(flatten_json_obj(obj))
    assert got == {
        "s": "x", "i": "7", "d": "1.5", "b": "true", "f": "false",
        "arr": '[1,"a",{"k":2}]',  # arrays serialize as JSON
        "o.p.q": "deep",           # nested objects flatten unbounded by default
    }  # null value skipped entirely


def test_flatten_depth_cap_serializes_subtree():
    obj = {"a": {"b": {"c": 1}}}
    assert dict(flatten_json_obj(obj, max_depth=1)) == {"a.b": '{"c":1}'}
    assert dict(flatten_json_obj(obj, max_depth=0)) == {"a": '{"b":{"c":1}}'}
    assert dict(flatten_json_obj(obj, max_depth=5)) == {"a.b.c": "1"}


def test_flatten_batch_explodes_and_skips_non_objects():
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(['{"a":1,"b":{"c":"x"}}', "plain", "[1,2]"])})
    out = flatten_attrs_batch(t, json_col="text", id_cols=["id"])
    assert out.column("id").to_pylist() == [1, 1]
    assert dict(zip(out.column("attr_key").to_pylist(),
                    out.column("attr_value").to_pylist())) == {"a": "1", "b.c": "x"}


# ---------------------------------------------------------------------------
# Datadog cascade (otel_util.rs:64-175, 34-61)
# ---------------------------------------------------------------------------


def _span_table(rows):
    cols = {"span_kind": [], "op": [], "method": [], "db": [], "msys": [], "mop": [],
            "rpc": [], "rsvc": [], "fprov": [], "fname": [], "ftrig": [], "gql": [],
            "proto": [], "stype": []}
    for r in rows:
        for k in cols:
            cols[k].append(r.get(k))
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


ATTRS = {"operation.name": "op", "http.request.method": "method", "db.system": "db",
         "messaging.system": "msys", "messaging.operation.name": "mop",
         "rpc.system": "rpc", "rpc.service": "rsvc",
         "faas.invoked_provider": "fprov", "faas.invoked_name": "fname",
         "faas.trigger": "ftrig", "graphql.operation.type": "gql",
         "network.protocol.name": "proto", "span.type": "stype"}


def test_operation_name_cascade_branches():
    rows = [
        {"span_kind": "client", "op": "custom.op", "db": "mysql"},        # explicit wins
        {"span_kind": "server", "method": "GET"},                         # http server
        {"span_kind": "internal", "method": "PUT"},                       # http non-server
        {"span_kind": "client", "db": "postgresql"},                      # db.query
        {"span_kind": "producer", "msys": "kafka", "mop": "publish"},     # messaging
        {"span_kind": "client", "rpc": "aws-api", "rsvc": "s3"},          # aws + service
        {"span_kind": "client", "rpc": "aws-api"},                        # aws fallback
        {"span_kind": "client", "rpc": "grpc"},                           # rpc client
        {"span_kind": "server", "rpc": "grpc"},                           # rpc server
        {"span_kind": "client", "fprov": "gcp", "fname": "fn"},           # faas client
        {"span_kind": "server", "ftrig": "http"},                         # faas server
        {"span_kind": "internal", "gql": "query"},                        # graphql
        {"span_kind": "server", "proto": "amqp"},                         # proto server
        {"span_kind": "server"},                                          # server fallback
        {"span_kind": "client", "proto": "amqp"},                         # proto client
        {"span_kind": "client"},                                          # client fallback
        {"span_kind": "consumer"},                                        # kind enum name
        {"span_kind": "unspecified"},                                     # -> internal
    ]
    got = operation_name_cascade(_span_table(rows), attrs=ATTRS).to_pylist()
    assert got == [
        "custom.op", "http.server.request", "http.client.request",
        "postgresql.query", "kafka.publish", "aws.s3.request",
        "aws.client.request", "grpc.client.request", "grpc.server.request",
        "gcp.fn.invoke", "http.invoke", "graphql.server.request",
        "amqp.server.request", "server.request", "amqp.client.request",
        "client.request", "SPAN_KIND_CONSUMER", "SPAN_KIND_INTERNAL",
    ]


def test_span_type_cascade():
    rows = [
        {"span_kind": "client", "stype": "forced"},   # explicit span.type
        {"span_kind": "server"},                      # web
        {"span_kind": "client", "db": "redis"},       # DB_TYPES hit
        {"span_kind": "client", "db": "sqlite"},      # sql class
        {"span_kind": "client", "db": "weirddb"},     # unknown db -> "db"
        {"span_kind": "client"},                      # no db -> http
        {"span_kind": "internal"},                    # custom
    ]
    got = span_type_cascade(_span_table(rows), attrs=ATTRS).to_pylist()
    assert got == ["forced", "web", "redis", "sql", "db", "http", "custom"]
    assert DB_TYPES["cassandra"] == "cassandra" and DB_TYPES["hive"] == "db"


# ---------------------------------------------------------------------------
# EMF events + namespace (awsemf/transformer.rs:533-619, 746-766)
# ---------------------------------------------------------------------------


def test_derive_namespace_fallback_chain():
    def ns(**cols):
        n = 1
        t = pa.table({k: pa.array([v], pa.string()) for k, v in cols.items()} or
                     {"x": pa.array([None], pa.string())})
        return derive_namespace(t).to_pylist()[0]

    assert ns(service_namespace="svc", service_name="api") == "svc/api"
    assert ns(service_name="api") == "api"
    assert ns(service_namespace="svc") == "svc"
    assert ns() == "default"
    t = pa.table({"x": pa.array(["y"])})
    assert derive_namespace(t, namespace="forced").to_pylist() == ["forced"]


def test_emf_event_json_shape():
    t = pa.table({
        "namespace": pa.array(["svc/api"]),
        "name": pa.array(["tool_call"]),
        "role": pa.array(["user"]),
        "ts_minute": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
        "value_count": pa.array([3], pa.int64()),
        "value_sum": pa.array([6.0]), "value_min": pa.array([1.0]),
        "value_max": pa.array([3.0]),
    })
    out = emf_event_json(t, label_cols=["role"])
    ev = json.loads(out.column("event").to_pylist()[0])
    cw = ev["_aws"]["CloudWatchMetrics"][0]
    assert ev["_aws"]["Timestamp"] == 1_700_000_000_000
    assert cw["Namespace"] == "svc/api"
    assert cw["Dimensions"] == [["role"]]
    assert cw["Metrics"] == [{"Name": "tool_call", "Unit": "Count", "StorageResolution": 60}]
    assert ev["role"] == "user"
    assert ev["tool_call"] == {"Count": 3, "Sum": 6.0, "Min": 1.0, "Max": 3.0}


# ---------------------------------------------------------------------------
# X-Ray prefix groups (xray/transformer.rs:360-429)
# ---------------------------------------------------------------------------


def test_xray_prefix_groups_blocks():
    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "http.request.method": pa.array(["GET", None]),
        "http.response.status": pa.array(["200", "500"]),
        "annotation.user": pa.array(["u1", "u2"]),
        "metadata.region": pa.array(["eu", "us"]),
        "aws.request_id": pa.array(["r1", "r2"]),
        "exception.type": pa.array([None, "IOError"]),
        "unrelated": pa.array(["x", "y"]),
    })
    out = xray_prefix_groups(t, id_cols=("id",), environment="prod")
    rows = set(zip(out.column("id").to_pylist(), out.column("block").to_pylist(),
                   out.column("attr_key").to_pylist(), out.column("attr_value").to_pylist()))
    assert (1, "request", "method", "GET") in rows
    assert (2, "response", "status", "500") in rows
    assert (2, "annotations", "user", "u2") in rows
    assert (1, "metadata", "region", "eu") in rows
    assert (2, "aws", "request_id", "r2") in rows
    assert (2, "exception", "type", "IOError") in rows
    assert (1, "metadata", "environment", "prod") in rows and (2, "metadata", "environment", "prod") in rows
    # null cells and non-matching columns contribute nothing
    assert not any(k == "method" and i == 2 for i, _, k, _v in rows)
    assert not any(b not in {"request", "response", "annotations", "metadata", "aws", "exception"}
                   for _, b, _k, _v in rows)


# ---------------------------------------------------------------------------
# recursive body redaction (redaction_processor.py:318-397)
# ---------------------------------------------------------------------------


def test_body_redactor_nested_and_key_gates():
    from rotel_ray.stages.enrich import BodyRedactor, RedactionConfig

    cfg = RedactionConfig(blocked_value_patterns=[r"\d+\.\d+\.\d+\.\d+"],
                          ignored_keys=["keep_ip"])
    red = BodyRedactor(cfg, body_col="body")
    body = json.dumps({
        "ip": "10.1.2.3", "keep_ip": "10.9.9.9", "msg": "from 10.0.0.1 ok",
        "nested": {"peer": "10.4.4.4"}, "arr": ["10.5.5.5", 7], "n": 3,
    })
    t = pa.table({"body": pa.array([body])})
    out = red(t)
    got = json.loads(out.column("body").to_pylist()[0])
    assert got["ip"] == "[REDACTED]"
    assert got["keep_ip"] == "10.9.9.9"          # ignored key untouched
    assert got["msg"] == "from [REDACTED] ok"    # substring substitution
    assert got["nested"]["peer"] == "[REDACTED]"  # recursive descent
    assert got["arr"] == ["[REDACTED]", 7]       # arrays recurse (key=None)
    assert got["n"] == 3
    # masked KEYS only (array items have key=None, reference parity)
    assert out.column("body_masked_count").to_pylist() == [3]
    assert out.column("body_masked_keys").to_pylist() == ["ip,msg,peer"]


def test_body_redactor_allowed_values_and_hash_and_allowlist():
    from rotel_ray.stages.enrich import BodyRedactor, RedactionConfig

    cfg = RedactionConfig(
        blocked_value_patterns=[r"\d+\.\d+\.\d+\.\d+"],
        allowed_value_patterns=[r"^127\."],
        allow_all_keys=False, allowed_keys=["a"],
        mask="hash:md5",
    )
    red = BodyRedactor(cfg, body_col="body")
    body = json.dumps({"a": "10.1.2.3", "b": "10.2.2.2", "lo": "127.0.0.1"})
    out = red(pa.table({"body": pa.array([body])}))
    got = json.loads(out.column("body").to_pylist()[0])
    import hashlib

    assert got["a"] == hashlib.md5(b"10.1.2.3").hexdigest()  # hash mask
    assert got["b"] == "10.2.2.2"   # outside allowed_keys: not descended
    assert got["lo"] == "127.0.0.1"  # lo not in allowed_keys either
    # with allow_all_keys the allowed_value pattern spares loopback
    cfg2 = RedactionConfig(blocked_value_patterns=[r"\d+\.\d+\.\d+\.\d+"],
                           allowed_value_patterns=[r"^127\."])
    out2 = BodyRedactor(cfg2, body_col="body")(pa.table({"body": pa.array([body])}))
    got2 = json.loads(out2.column("body").to_pylist()[0])
    assert got2["lo"] == "127.0.0.1" and got2["b"] == "[REDACTED]"


# ---------------------------------------------------------------------------
# gzip source path
# ---------------------------------------------------------------------------


def test_gz_log_source_equals_plain(tmp_path, sf_dir):
    from rotel_ray.generator import ensure_transcripts
    from rotel_ray.sources.text_logs import (
        ensure_log_files,
        ensure_log_files_gz,
        parse_log_files,
    )

    tdir = ensure_transcripts(sf_dir)
    plain = parse_log_files(ensure_log_files(tdir)).to_pandas()
    gz = parse_log_files(ensure_log_files_gz(tdir)).to_pandas()
    a = plain.drop(columns=["source_file"]).sort_values(["text"]).reset_index(drop=True)
    b = gz.drop(columns=["source_file"]).sort_values(["text"]).reset_index(drop=True)
    assert a.equals(b)
    assert len(b) > 0


def test_attrs_overflow_map_column(tmp_path):
    """Overflow attrs land in a real map<string,string> column that survives
    a parquet round trip; fixed keys stay out; non-JSON rows get empty maps."""
    import pyarrow.parquet as pq

    from rotel_ray.stages.transform import attrs_overflow_map_batch

    t = pa.table({"text": pa.array([
        '{"remote_addr":"1.2.3.4","a":1,"n":{"b":"y"},"arr":[1,2]}',
        "not json",
        '{"remote_addr":"z"}',
        None,
    ])})
    out = attrs_overflow_map_batch(t, fixed=frozenset({"remote_addr"}))
    assert pa.types.is_map(out.schema.field("attrs").type)
    got = out.column("attrs").to_pylist()
    assert dict(got[0]) == {"a": "1", "n.b": "y", "arr": "[1,2]"}
    assert got[1] == [] and got[2] == [] and got[3] == []
    p = str(tmp_path / "m.parquet")
    pq.write_table(out, p)
    assert pq.read_table(p).column("attrs").to_pylist() == got


# ---------------------------------------------------------------------------
# resource-name / service / env / status-code cascades (otel_util.rs:176-345)
# ---------------------------------------------------------------------------


def _span_table(rows):
    cols = {}
    keys = set().union(*rows)
    for k in keys:
        cols[k] = pa.array([r.get(k) for r in rows], pa.string())
    return pa.table(cols)


_RES_ATTRS = {
    "resource.name": "resource_name", "http.request.method": "http_method",
    "http.method": "http_method_old", "http.route": "http_route",
    "messaging.operation.name": "msg_op", "messaging.destination": "msg_dest",
    "messaging.destination.name": "msg_dest_name", "rpc.method": "rpc_method",
    "rpc.service": "rpc_service", "graphql.operation.type": "gql_type",
    "graphql.operation.name": "gql_name", "db.system": "db_system",
    "db.query.text": "db_query", "db.statement": "db_stmt",
    "service.name": "svc", "deployment.environment.name": "env_name",
    "deployment.environment": "env_old",
    "http.response.status_code": "status_new", "http.status_code": "status_old",
}


def test_resource_name_cascade_branches():
    from rotel_ray.stages.transform import resource_name_cascade

    rows = [
        # explicit resource.name wins over everything
        {"span_kind": "server", "span_name": "n", "resource_name": "explicit",
         "http_method": "GET", "http_route": "/r"},
        # server + method + route
        {"span_kind": "server", "span_name": "n", "http_method": "GET", "http_route": "/api"},
        # _OTHER normalizes to HTTP (otel_util.rs:206-209)
        {"span_kind": "server", "span_name": "n", "http_method": "_OTHER", "http_route": "/x"},
        # client never appends route
        {"span_kind": "client", "span_name": "n", "http_method": "POST", "http_route": "/api"},
        # deprecated http.method fallback
        {"span_kind": "client", "span_name": "n", "http_method_old": "PUT"},
        # messaging with deprecated destination key preferred
        {"span_kind": "producer", "span_name": "n", "msg_op": "send",
         "msg_dest": "q1", "msg_dest_name": "q2"},
        {"span_kind": "producer", "span_name": "n", "msg_op": "send"},
        # rpc method +- service
        {"span_kind": "client", "span_name": "n", "rpc_method": "Get", "rpc_service": "S3"},
        {"span_kind": "client", "span_name": "n", "rpc_method": "Get"},
        # graphql
        {"span_kind": "server", "span_name": "n", "gql_type": "query", "gql_name": "Me"},
        # db.system present: query text, else statement, else FALL THROUGH to name
        {"span_kind": "client", "span_name": "n", "db_system": "postgresql", "db_query": "SELECT 1"},
        {"span_kind": "client", "span_name": "n", "db_system": "postgresql", "db_stmt": "SELECT 2"},
        {"span_kind": "client", "span_name": "fallthrough", "db_system": "postgresql"},
        # nothing: span name
        {"span_kind": "internal", "span_name": "plain"},
    ]
    out = resource_name_cascade(_span_table(rows), attrs=_RES_ATTRS).to_pylist()
    assert out == ["explicit", "GET /api", "HTTP /x", "POST", "PUT",
                   "send q1", "send", "Get S3", "Get", "query Me",
                   "SELECT 1", "SELECT 2", "fallthrough", "plain"]


def test_resource_name_truncated_to_max_len():
    from rotel_ray.stages.transform import MAX_RESOURCE_LEN, resource_name_cascade

    t = _span_table([{"span_kind": "internal", "span_name": "x" * 6000}])
    out = resource_name_cascade(t, attrs=_RES_ATTRS).to_pylist()
    assert len(out[0]) == MAX_RESOURCE_LEN


def test_service_env_status_cascades():
    from rotel_ray.stages.transform import (env_cascade, service_cascade,
                                            status_code_cascade)

    rows = [
        {"span_kind": "s", "svc": "api", "env_name": "prod-eu", "env_old": "ignored",
         "status_new": "200", "status_old": "500"},
        # parse failure on the new key falls through to the deprecated one
        # (otel_util.rs:287-303 str::parse fallthrough)
        {"span_kind": "s", "env_old": "legacy", "status_new": "abc", "status_old": "404"},
        {"span_kind": "s"},
    ]
    t = _span_table(rows)
    assert service_cascade(t, attrs=_RES_ATTRS).to_pylist() == [
        "api", "otlpresourcenoservicename", "otlpresourcenoservicename"]
    assert env_cascade(t, attrs=_RES_ATTRS).to_pylist() == ["prod-eu", "legacy", ""]
    assert status_code_cascade(t, attrs=_RES_ATTRS).to_pylist() == [200, 404, None]


# ---------------------------------------------------------------------------
# source detection (source.rs / cloud.rs / k8s.rs)
# ---------------------------------------------------------------------------

_SRC_ATTRS = {
    "aws.ecs.launchtype": "launchtype", "aws.ecs.task.arn": "task_arn",
    "host": "host", "datadog.host.name": "dd_host", "cloud.provider": "provider",
    "host.id": "host_id", "host.name": "host_name", "k8s.node.name": "k8s_node",
    "k8s.cluster.name": "k8s_cluster",
    "ec2.tag.kubernetes.io/cluster": "ec2_tag",
}


def test_source_cascade_branches():
    from rotel_ray.stages.transform import source_cascade

    rows = [
        # fargate + arn -> task_arn
        {"span_kind": "s", "launchtype": "fargate", "task_arn": "arn:x",
         "host": "h1"},
        # fargate WITHOUT arn: host attr still fires (source.rs:77-79 runs
        # before the fargate stop at :86-89)
        {"span_kind": "s", "launchtype": "fargate", "host": "h2"},
        # fargate without arn and without host/dd host -> nothing
        {"span_kind": "s", "launchtype": "fargate", "host_id": "ignored"},
        # host precedence over datadog.host.name
        {"span_kind": "s", "host": "h3", "dd_host": "d3"},
        {"span_kind": "s", "dd_host": "d4"},
        # provider aws -> host.id; provider stops the cascade EVEN when the
        # lookup finds nothing (unchecked_hostname returns the provider
        # result unconditionally, source.rs:91-93)
        {"span_kind": "s", "provider": "aws", "host_id": "i-1", "host_name": "hn"},
        {"span_kind": "s", "provider": "aws", "host_name": "unreachable",
         "k8s_node": "unreachable-node"},
        # azure: host.id else host.name
        {"span_kind": "s", "provider": "azure", "host_name": "vm-2"},
        # gcp unimplemented (todo!() cloud.rs:27) -> none
        {"span_kind": "s", "provider": "gcp", "host_id": "i-g"},
        # unknown provider string does NOT stop the cascade
        {"span_kind": "s", "provider": "ibm", "host_id": "i-2"},
        # k8s node +- cluster name
        {"span_kind": "s", "k8s_node": "n1", "k8s_cluster": "c1"},
        {"span_kind": "s", "k8s_node": "n2"},
        # host.id -> host.name fallbacks
        {"span_kind": "s", "host_id": "i-3"},
        {"span_kind": "s", "host_name": "hn-4"},
        # localhost variants discarded
        {"span_kind": "s", "host": "127.0.0.1"},
        {"span_kind": "s", "host": "localhost", "host_name": "shadowed"},
        {"span_kind": "s"},
    ]
    kind, ident = source_cascade(_span_table(rows), attrs=_SRC_ATTRS)
    assert list(zip(kind.to_pylist(), ident.to_pylist())) == [
        ("task_arn", "arn:x"), ("host", "h2"), (None, None),
        ("host", "h3"), ("host", "d4"),
        ("host", "i-1"), (None, None),
        ("host", "vm-2"), (None, None), ("host", "i-2"),
        ("host", "n1-c1"), ("host", "n2"),
        ("host", "i-3"), ("host", "hn-4"),
        (None, None), (None, None), (None, None),
    ]


def test_ec2_cluster_tag_split():
    from rotel_ray.stages.transform import _ec2_cluster_from_tag

    vals = pa.array(["kubernetes.io/cluster/my-cluster", "a/b", None], pa.string())
    assert _ec2_cluster_from_tag(vals).to_pylist() == ["my-cluster", None, None]


def test_xray_segment_json_flags_and_parent():
    from rotel_ray.stages.transform import xray_segment_json

    t = pa.table({
        "trace_id": pa.array(["1-0000000a-" + "a" * 24] * 4),
        "span_id": pa.array(["b" * 16] * 4),
        "parent_id": pa.array([None, "c" * 16, None, None], pa.string()),
        "name": pa.array(["nginx"] * 4),
        "start_s": pa.array([1.5] * 4), "end_s": pa.array([1.5] * 4),
        "method": pa.array(["GET"] * 4), "url": pa.array(["/x"] * 4),
        "status": pa.array(["200", "500", "429", "404"]),
        "conv_id": pa.array(["c1"] * 4), "request_id": pa.array(["c1:0"] * 4),
    })
    docs = [json.loads(s) for s in xray_segment_json(t).to_pylist()]
    assert docs[0]["type"] == "segment" and "parent_id" not in docs[0]
    assert docs[1]["type"] == "subsegment" and docs[1]["parent_id"] == "c" * 16
    # flag precedence: 5xx fault, 429 throttle (not error), other 4xx error
    assert "fault" not in docs[0] and "error" not in docs[0] and "throttle" not in docs[0]
    assert docs[1]["fault"] is True and "error" not in docs[1]
    assert docs[2]["throttle"] is True and "error" not in docs[2] and "fault" not in docs[2]
    assert docs[3]["error"] is True
    # keys sorted (serde_json BTreeMap ordering)
    for d, raw in zip(docs, xray_segment_json(t).to_pylist()):
        keys = list(d)
        assert keys == sorted(keys), raw
    assert docs[0]["http"]["request"] == {"method": "GET", "url": "/x"}
    assert docs[0]["start_time"] == 1.5


def test_container_tags_mapping_rules():
    from rotel_ray.stages.transform import container_tags

    def mk(entries):
        keys = [k for k, _ in entries]
        vals = [v for _, v in entries]
        offs = pa.array([0, len(entries)], pa.int32())
        return pa.MapArray.from_arrays(offs, pa.array(keys, pa.string()),
                                       pa.array(vals, pa.string()))

    rowmaps = [
        # mapped rename + custom strip + unmapped dropped + empty dropped
        [("container.id", "abc"), ("datadog.container.tag.team", "ml"),
         ("nope.key", "x"), ("k8s.pod.name", "")],
        # custom key colliding with a mapped tag: mapped wins
        [("cloud.region", "eu-1"), ("datadog.container.tag.region", "shadow")],
        # custom prefix with empty remainder is skipped
        [("datadog.container.tag.", "x"), ("k8s.job.name", "j1")],
    ]
    chunks = [mk(e) for e in rowmaps]
    m = pa.concat_arrays(chunks)
    t = pa.table({"conv_id": pa.array(["a", "b", "c"]),
                  "turn_idx": pa.array([0, 1, 2], pa.int32()),
                  "attrs_map": m})
    out = container_tags(t).to_pandas()
    got = sorted(zip(out.conv_id, out.tag_key, out.tag_value))
    assert got == [("a", "container_id", "abc"), ("a", "team", "ml"),
                   ("b", "region", "eu-1"), ("c", "kube_job", "j1")]


def test_span_meta_tags_branches():
    from rotel_ray.stages.transform import span_meta_tags

    entries = [
        ("http.route", "/x"),               # mapped (identity rename)
        ("http.response.status_code", ""),  # empty: falls through to passthrough
        ("http.request.header.auth", "t"),  # header prefix rewrite
        ("analytics.event", "true"),        # exact-lowercase bool -> metrics 1.0
        ("analytics.event", "True"),        # NOT a Rust bool literal -> dropped
        ("http.method", "GET"),             # APM convention key -> skipped
        ("my.custom", "v"),                 # passthrough
    ]
    offs = pa.array([0, len(entries)], pa.int32())
    m = pa.MapArray.from_arrays(offs, pa.array([k for k, _ in entries], pa.string()),
                                pa.array([v for _, v in entries], pa.string()))
    t = pa.table({"conv_id": pa.array(["c"]), "turn_idx": pa.array([0], pa.int32()),
                  "attrs_map": m})
    out = span_meta_tags(t).to_pandas()
    got = sorted(zip(out.target, out.tag_key, out.tag_value))
    assert got == [
        ("meta", "http.request.headers.auth", "t"),
        ("meta", "http.response.status_code", ""),
        ("meta", "http.route", "/x"),
        ("meta", "my.custom", "v"),
        ("metrics", "_dd1.sr.eausr", "1.0"),
    ]


def test_error_tagging_cascade():
    from rotel_ray.stages.transform import error_tagging

    attrs = {"exception.message": "em", "exception.type": "ety",
             "exception.stacktrace": "est", "status.message": "sm",
             "http.response.status_code": "code", "http.status_code": "code_old",
             "http.status_text": "stext"}
    rows = [
        # exception wins over everything; type/stack ride along
        {"span_kind": "s", "em": "boom", "ety": "IOError", "est": "tb",
         "sm": "ignored", "code": "500"},
        # status message next (empty = absent)
        {"span_kind": "s", "sm": "upstream fail", "code": "502"},
        {"span_kind": "s", "sm": "", "code": "503", "stext": "Service Unavailable"},
        # deprecated http.status_code fallback, bare code without text
        {"span_kind": "s", "code_old": "504"},
        {"span_kind": "s"},
    ]
    msg, typ, stack = error_tagging(_span_table(rows), attrs=attrs)
    assert msg.to_pylist() == ["boom", "upstream fail", "503 Service Unavailable",
                               "504", None]
    assert typ.to_pylist() == ["IOError", None, None, None, None]
    assert stack.to_pylist() == ["tb", None, None, None, None]
