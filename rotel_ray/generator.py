"""Deterministic synthetic transcript-table generator.

The driver's testdata (/root/testdata/sf*) has no transcripts table, so the
transcript corpus described by BASELINE.json's input_hint is synthesized here:
deterministically (fixed seed per shard), at a scale proportional to the
TPC-H-ish sf (6M turns per sf, matching lineitem's 6M rows/sf), with
Zipf-skewed conversation sizes so shuffle/skew handling is actually exercised.

Every turn's ``text`` embeds exactly one parseable grammar (FIXTURES.md §2),
mirroring the reference's parser fixtures:

- TOOL_CALL / ERROR lines (transcript-native; drives routing)
- nginx combined access + nginx error lines
  (reference: src/receivers/file/parser/nginx.rs:53,64)
- JSON log lines (src/receivers/file/parser/json.rs:38-105)
- kmsg lines ``prio,seq,ts_us[,flags];msg``
  (src/receivers/kmsg/parser.rs:226-272)
- plain chat text (unparsed fall-through)

Generation is per-shard (pure function of shard id) so at design scale it
could be produced by a distributed job; at sandbox scale shards are written
sequentially with an atomic directory rename for idempotency.
"""

from __future__ import annotations

import os
import re
import shutil
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import TRANSCRIPT_SCHEMA

SEED = 42
TURNS_PER_SF = 6_000_000  # parity with lineitem rows/sf
BASE_TS_US = int(datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)

TOOLS = ["bash", "search", "browser", "python"]
TOOL_CMDS = ["ls -la /tmp", "grep -r pattern src", "curl -s localhost:8080", "python run.py"]
ERROR_CODES = ["E400", "E429", "E500", "E503", "TIMEOUT"]
ERROR_MSGS = ["rate limited", "bad request", "internal error", "upstream unavailable", "deadline exceeded"]
HTTP_METHODS = ["GET", "POST", "PUT"]
HTTP_PATHS = ["/api/users", "/api/login", "/api/items", "/healthz", "/static/app.js"]
HTTP_STATUSES = [200, 200, 200, 200, 301, 404, 500]
USER_AGENTS = ["curl/7.68.0", "Mozilla/5.0 (X11; Linux x86_64)"]
NG_LEVELS = ["error", "notice", "warn", "crit"]
NG_MSGS = [
    'open() "/var/www/html/missing.html" failed (2: No such file or directory)',
    "signal process started",
    "worker process exited",
    "upstream timed out",
]
KMSG_MSGS = [
    "usb 1-1: new high-speed USB device",
    "disk error on sda1",
    "oom-killer invoked",
    "eth0: link up",
]
CHAT_WORDS = [
    "please", "run", "the", "tests", "and", "check", "output", "looks", "good",
    "now", "refactor", "that", "function", "thanks", "done", "next", "step",
]
MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

# grammar ids
G_TOOL, G_ERROR, G_ACCESS, G_NGERR, G_JSON, G_KMSG, G_CHAT = range(7)
GRAMMAR_P = [0.20, 0.10, 0.15, 0.05, 0.15, 0.10, 0.25]


def _fmt_time_local(ts_us: int) -> str:
    dt = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
    return f"{dt.day:02d}/{MONTHS[dt.month - 1]}/{dt.year}:{dt:%H:%M:%S} +0000"


def generate_shard(shard: int, turns: int, convs_prefix: str = "c") -> pa.Table:
    """Generate one shard: exactly ``turns`` rows, Zipf-skewed conv sizes."""
    rng = np.random.default_rng(SEED * 1_000_003 + shard)
    # conversation sizes: Zipf(1.5) clipped — some convs ~100x the median
    sizes = []
    total = 0
    while total < turns:
        n = int(min(rng.zipf(1.5), 2000))
        n = min(n, turns - total)
        sizes.append(n)
        total += n
    sizes = np.asarray(sizes, dtype=np.int64)
    n_convs = len(sizes)

    conv_ids = np.repeat(
        np.array([f"{convs_prefix}{shard:04d}-{i:06d}" for i in range(n_convs)], dtype=object),
        sizes,
    )
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in sizes])
    conv_start = np.repeat(
        BASE_TS_US + shard * 86_400_000_000 + rng.integers(0, 86_400, n_convs) * 1_000_000,
        sizes,
    )
    ts_us = conv_start + turn_idx.astype(np.int64) * 1_000_000  # monotone within conv

    grammar = rng.choice(7, size=turns, p=GRAMMAR_P)
    role = np.where(
        grammar == G_TOOL,
        "tool",
        rng.choice(np.array(["user", "assistant", "system"], dtype=object), size=turns, p=[0.45, 0.45, 0.10]),
    ).astype(object)

    tool_pick = rng.integers(0, len(TOOLS), turns)
    tool_col = np.where(grammar == G_TOOL, np.array(TOOLS, dtype=object)[tool_pick], "").astype(object)

    exit_code = rng.choice([0, 0, 0, 0, 0, 0, 0, 0, 0, 1], size=turns)
    dur_ms = rng.integers(1, 5001, turns)
    err_pick = rng.integers(0, len(ERROR_CODES), turns)
    retryable = rng.integers(0, 2, turns)
    meth = rng.integers(0, len(HTTP_METHODS), turns)
    path = rng.integers(0, len(HTTP_PATHS), turns)
    status = rng.choice(HTTP_STATUSES, size=turns)
    nbytes = rng.integers(0, 100_000, turns)
    ua = rng.integers(0, len(USER_AGENTS), turns)
    ip = rng.integers(1, 255, (turns, 3))
    nglvl = rng.integers(0, len(NG_LEVELS), turns)
    ngmsg = rng.integers(0, len(NG_MSGS), turns)
    ngpid = rng.integers(1, 10_000, turns)
    ngtid = rng.integers(0, 10_000, turns)
    ngcid = rng.integers(1, 1000, turns)
    kmprio = rng.integers(0, 8, turns)
    kmseq = rng.integers(1, 1_000_000, turns)
    kmflag = rng.integers(0, 10, turns)  # <2 => continuation flag
    kmmsg = rng.integers(0, len(KMSG_MSGS), turns)
    chat_w = rng.integers(0, len(CHAT_WORDS), (turns, 6))

    texts = np.empty(turns, dtype=object)
    for i in range(turns):
        g = grammar[i]
        if g == G_TOOL:
            texts[i] = (
                f"TOOL_CALL tool={TOOLS[tool_pick[i]]} cmd=\"{TOOL_CMDS[tool_pick[i]]}\" "
                f"exit={exit_code[i]} duration_ms={dur_ms[i]}"
            )
        elif g == G_ERROR:
            texts[i] = (
                f"ERROR code={ERROR_CODES[err_pick[i]]} msg=\"{ERROR_MSGS[err_pick[i]]}\" "
                f"retryable={'true' if retryable[i] else 'false'}"
            )
        elif g == G_ACCESS:
            user = "alice" if (i % 7) == 0 else "-"
            texts[i] = (
                f"10.{ip[i, 0]}.{ip[i, 1]}.{ip[i, 2]} - {user} [{_fmt_time_local(ts_us[i])}] "
                f"\"{HTTP_METHODS[meth[i]]} {HTTP_PATHS[path[i]]} HTTP/1.1\" {status[i]} {nbytes[i]} "
                f"\"-\" \"{USER_AGENTS[ua[i]]}\""
            )
        elif g == G_NGERR:
            dt = datetime.fromtimestamp(ts_us[i] / 1e6, tz=timezone.utc)
            cid = f" *{ngcid[i]}" if (i % 3) == 0 else ""
            texts[i] = (
                f"{dt:%Y/%m/%d %H:%M:%S} [{NG_LEVELS[nglvl[i]]}] {ngpid[i]}#{ngtid[i]}:{cid} "
                f"{NG_MSGS[ngmsg[i]]}, client: 10.{ip[i, 0]}.{ip[i, 1]}.{ip[i, 2]}"
            )
        elif g == G_JSON:
            texts[i] = (
                f'{{"time_local":"{_fmt_time_local(ts_us[i])}","remote_addr":"10.{ip[i, 0]}.{ip[i, 1]}.{ip[i, 2]}",'
                f'"request":"{HTTP_METHODS[meth[i]]} {HTTP_PATHS[path[i]]} HTTP/1.1",'
                f'"status":{status[i]},"body_bytes_sent":{nbytes[i]},"nested":{{"a":{i % 5}}}}}'
            )
        elif g == G_KMSG:
            flags = ",c" if kmflag[i] < 2 else ""
            texts[i] = f"{kmprio[i]},{kmseq[i]},{ts_us[i] % 10_000_000_000}{flags};{KMSG_MSGS[kmmsg[i]]}"
        else:
            texts[i] = " ".join(CHAT_WORDS[w] for w in chat_w[i])

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tool_col, type=pa.string()),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    if not m:
        raise ValueError(f"cannot infer sf from {sf_dir!r}")
    return float(m.group(1))


def transcripts_path(sf: float, root: str = "/tmp/rotel_ray_data") -> str:
    return os.path.join(root, f"transcripts_sf{sf:g}")


def ensure_transcripts(sf_dir_or_sf, root: str = "/tmp/rotel_ray_data") -> str:
    """Generate (once, atomically) and return the transcript parquet dir.

    Accepts an sf float or an sf_dir path like /root/testdata/sf0.01.
    """
    sf = sf_dir_or_sf if isinstance(sf_dir_or_sf, (int, float)) else sf_from_dir(sf_dir_or_sf)
    out = transcripts_path(sf, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    turns = max(1000, int(sf * TURNS_PER_SF))
    n_shards = int(min(64, max(8, turns // 20_000)))
    per_shard = turns // n_shards
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    for s in range(n_shards):
        n = per_shard + (turns % n_shards if s == n_shards - 1 else 0)
        tbl = generate_shard(s, n)
        pq.write_table(tbl, os.path.join(tmp, f"part-{s:04d}.parquet"), row_group_size=16384)
    try:
        os.replace(tmp, out)
    except OSError:
        # concurrent generator won the race; ours is equivalent (deterministic)
        shutil.rmtree(tmp, ignore_errors=True)
    return out
