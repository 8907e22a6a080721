"""Parse-stage unit tests on handcrafted lines — mirrors the reference's
parser tests (regex.rs:170-368, nginx.rs:262-278, kmsg parser tests)."""

import pyarrow as pa

from rotel_ray.stages.parse import parse_batch


def _table(lines):
    n = len(lines)
    return pa.table(
        {
            "conv_id": ["c"] * n,
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": ["user"] * n,
            "text": lines,
            "tool": [""] * n,
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)], pa.timestamp("us")),
        }
    )


def test_tool_call():
    out = parse_batch(_table(['TOOL_CALL tool=bash cmd="ls -la /tmp" exit=0 duration_ms=42'])).to_pylist()[0]
    assert out["event_type"] == "tool_call"
    assert out["tool_name"] == "bash"
    assert out["tool_cmd"] == "ls -la /tmp"
    assert out["tool_exit"] == 0
    assert out["duration_ms"] == 42
    assert out["severity_number"] == 9
    assert out["parse_ok"] is True


def test_error_line():
    out = parse_batch(_table(['ERROR code=E429 msg="rate limited" retryable=true'])).to_pylist()[0]
    assert out["event_type"] == "error"
    assert out["error_code"] == "E429"
    assert out["error_msg"] == "rate limited"
    assert out["retryable"] is True
    assert out["severity_number"] == 17 and out["severity_text"] == "ERROR"


def test_nginx_access():
    line = '192.168.1.1 - - [17/Dec/2025:10:15:32 +0000] "GET /api/users HTTP/1.1" 200 1234 "-" "curl/7.68.0"'
    out = parse_batch(_table([line])).to_pylist()[0]
    assert out["event_type"] == "nginx_access"
    assert out["remote_addr"] == "192.168.1.1"
    assert out["remote_user"] == "-"
    assert out["request"] == "GET /api/users HTTP/1.1"
    assert out["status"] == 200
    assert out["body_bytes_sent"] == 1234
    assert out["http_user_agent"] == "curl/7.68.0"
    assert str(out["log_ts"]) == "2025-12-17 10:15:32"
    assert out["severity_number"] == 9


def test_nginx_access_5xx_severity():
    line = '1.2.3.4 - alice [17/Dec/2025:10:15:32 +0000] "POST /x HTTP/1.1" 503 0 "-" "curl"'
    out = parse_batch(_table([line])).to_pylist()[0]
    assert out["severity_number"] == 17
    assert out["remote_user"] == "alice"


def test_nginx_error_with_and_without_cid():
    lines = [
        '2025/12/17 10:15:32 [error] 1234#5678: *9 open() failed, client: 192.168.1.1',
        "2025/12/17 10:15:34 [notice] 1234#0: signal process started",
    ]
    rows = parse_batch(_table(lines)).to_pylist()
    assert rows[0]["event_type"] == "nginx_error"
    assert rows[0]["ng_level"] == "error" and rows[0]["severity_number"] == 17
    assert rows[0]["ng_pid"] == 1234 and rows[0]["ng_tid"] == 5678 and rows[0]["ng_cid"] == 9
    assert rows[1]["ng_cid"] is None
    assert rows[1]["severity_number"] == 10  # notice
    assert str(rows[0]["log_ts"]) == "2025-12-17 10:15:32"


def test_json_line():
    line = '{"time_local":"17/Dec/2025:10:15:32 +0000","remote_addr":"10.1.2.3","request":"GET /x HTTP/1.1","status":404,"body_bytes_sent":512,"nested":{"a":1}}'
    out = parse_batch(_table([line])).to_pylist()[0]
    assert out["event_type"] == "json"
    assert out["remote_addr"] == "10.1.2.3"
    assert out["status"] == 404
    assert out["severity_number"] == 13  # 4xx -> WARN
    assert out["attrs"] == line  # raw JSON preserved (MapOrJson analogue)


def test_json_lenient_invalid():
    # invalid JSON -> fields null, still classified json (lenient mode,
    # json.rs:27-35: return empty instead of error)
    out = parse_batch(_table(['{not json'])).to_pylist()[0]
    assert out["event_type"] == "json"
    assert out["status"] is None
    assert out["severity_number"] == 9


def test_kmsg_priority_facility_and_severity():
    # priority = low 3 bits, facility = bits 3-7; severity map
    # {0,1,2->21, 3->17, 4->13, 5->10, 6->9, 7->5} (parser.rs:155-166)
    lines = ["6,1234,5678901;usb 1-1: new device", "3,1235,5678902,c;disk error on sda1", "30,1,2;daemon msg"]
    rows = parse_batch(_table(lines)).to_pylist()
    assert rows[0]["km_priority"] == 6 and rows[0]["km_facility"] == 0
    assert rows[0]["severity_number"] == 9 and rows[0]["km_seq"] == 1234
    assert rows[1]["severity_number"] == 17 and rows[1]["km_flags"] == "c"
    assert rows[1]["km_message"] == "disk error on sda1"
    assert rows[2]["km_priority"] == 6 and rows[2]["km_facility"] == 3  # 30 = fac 3, prio 6


def test_chat_fallthrough():
    out = parse_batch(_table(["please run the tests"])).to_pylist()[0]
    assert out["event_type"] == "chat"
    assert out["parse_ok"] is False
    assert out["severity_number"] == 9


def test_text_preserved_verbatim():
    lines = ['TOOL_CALL tool=bash cmd="x" exit=1 duration_ms=1', "free text", "6,1,2;m"]
    out = parse_batch(_table(lines))
    assert out.column("text").to_pylist() == lines
