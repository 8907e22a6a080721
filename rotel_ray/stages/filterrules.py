"""Document-level quality-filter rule sets from the public LLM-corpus
pipelines — Gopher (Rae et al. 2021, §A1.1) and C4 (Raffel et al. 2020,
§2.2). The reference engine has no corpus machinery; these extend the
LLM-data-pipeline surface next to textstats.quality_score (which covers
the character-ratio features) with the LINE-level rules both papers apply:
bullet-line / ellipsis-line fractions, alphabetic-word fraction, stop-word
presence (Gopher) and terminal-punctuation line filtering (C4).

Both operators are STATELESS single-pass ``map_batches`` — a document's
lines live inside its own row, so every rule is embarrassingly parallel:
no shuffle anywhere, the 100 TB shape is one streaming pass. All kernels
are Arrow RE2 (`pc.count_substring_regex` / `match_substring_regex`), so
the DuckDB oracle mirrors each count bit-for-bit (same RE2 syntax) and the
float ratios are IEEE-identical divisions of identical integer counts.

The source `documents` table is single-line (no ``\\n``); the line rules
get real signal from a derived multi-line fixture (``ensure_lines_docs``,
the unicode-docs pattern from clean.py): each doc is deterministically
reflowed into 2-8-token lines decorated per (doc_id, line_idx) with
bullets, ellipses, terminal punctuation, digit tokens, stop words and C4
drop-triggers — a pure content function, cached under the source table's
content fingerprint.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

LINES_FIXTURE_VERSION = 1

# Gopher's stop-word presence list (Rae et al. 2021 §A1.1: "contains at
# least 2 of the following English words").
GOPHER_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")


# ---------------------------------------------------------------------------
# derived multi-line fixture
# ---------------------------------------------------------------------------

def reflow_text(doc_id: int, text: str) -> str:
    """Deterministic reflow of a single-line doc into decorated lines.

    Line length cycles 2-8 tokens by (doc_id + line_idx); decoration class
    cycles by (doc_id*31 + line_idx) % 10:

    - 0: bullet line, NO terminal punctuation ("- ...")
    - 1: bullet line WITH terminal punctuation ("* ... .")
    - 2: ellipsis-terminated line ("... ...")
    - 3: line containing "javascript" (C4 drop-trigger)
    - 4: line ending in "{" (C4 drop-trigger)
    - 5-9: plain line ending in "."

    Every third line appends a rotating GOPHER_STOP word (stop-hit
    variance) and every fifth line appends a digit token (alphabetic-word
    fraction variance)."""
    toks = text.split()
    lines: list[str] = []
    i = 0
    li = 0
    while i < len(toks):
        w = (doc_id + li) % 7 + 2
        seg = toks[i:i + w]
        i += w
        if (doc_id + li) % 3 == 0:
            seg.append(GOPHER_STOP[(doc_id + li) % 8])
        if (doc_id + li) % 5 == 4:
            seg.append(str((doc_id * (li + 1)) % 1000))
        body = " ".join(seg)
        r = (doc_id * 31 + li) % 10
        if r == 0:
            line = "- " + body
        elif r == 1:
            line = "* " + body + "."
        elif r == 2:
            line = body + " ..."
        elif r == 3:
            line = body + " javascript"
        elif r == 4:
            line = body + " {"
        else:
            line = body + "."
        lines.append(line)
        li += 1
    return "\n".join(lines)


def lines_docs_path(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Pure cache path (reads only the source footer; never builds)."""
    from ..generator import sf_from_dir
    from .planted import source_tag

    tag = source_tag(f"{sf_dir}/documents.parquet")
    return os.path.join(
        root,
        f"linedocs_g{LINES_FIXTURE_VERSION}_sf{sf_from_dir(sf_dir):g}_{tag}")


def ensure_lines_docs(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Reflowed multi-line documents table (pure function of the source,
    cached with the content-fingerprint key like the other fixtures)."""
    out = lines_docs_path(sf_dir, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    flowed = [reflow_text(i, x) for i, x in zip(ids, texts)]
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(flowed, pa.string())}),
        os.path.join(tmp, "part-0000.parquet"))
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Gopher rule set
# ---------------------------------------------------------------------------

def _count(text: pa.Array, pattern: str) -> np.ndarray:
    return pc.count_substring_regex(text, pattern).to_numpy(
        zero_copy_only=False).astype(np.int64)


def gopher_rules(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 min_words: int = 30, max_words: int = 100_000,
                 min_mean_wl: float = 3.0, max_mean_wl: float = 10.0,
                 max_bullet_frac: float = 0.2, max_ellipsis_frac: float = 0.1,
                 min_alpha_frac: float = 0.85, min_stop_hits: int = 2):
    """Gopher §A1.1 rule-set evaluation per document: the word-count and
    mean-word-length bounds, bullet-line and ellipsis-line fraction caps,
    alphabetic-word-fraction floor and stop-word-presence floor, plus the
    conjunctive ``keep`` flag. Thresholds default to corpus-calibrated
    values (the paper's 90%/30% line caps never bind on the synthetic
    corpus); every rule shape is the paper's.

    One stateless vectorized pass; no shuffle."""

    def f(t: pa.Table) -> pa.Table:
        text = t.column(text_col).combine_chunks()
        n_words = _count(text, r"\S+")
        nonspace = (
            pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
            - _count(text, r"\s"))
        alpha_words = _count(text, r"\S*[A-Za-z]\S*")
        n_lines = _count(text, r"\n") + 1
        bullets = _count(text, r"(?m)^[-*] ")
        ellipsis = _count(text, r"(?m)\.\.\.$")
        stop_hits = np.zeros(len(text), np.int64)
        for w in GOPHER_STOP:
            stop_hits += pc.match_substring_regex(
                text, rf"\b{w}\b").to_numpy(zero_copy_only=False).astype(np.int64)
        wd = np.maximum(n_words, 1).astype(np.float64)
        mean_wl = nonspace / wd
        frac_alpha = alpha_words / wd
        ld = n_lines.astype(np.float64)
        frac_bullet = bullets / ld
        frac_ellipsis = ellipsis / ld
        keep = ((n_words >= min_words) & (n_words <= max_words)
                & (mean_wl >= min_mean_wl) & (mean_wl <= max_mean_wl)
                & (frac_bullet <= max_bullet_frac)
                & (frac_ellipsis <= max_ellipsis_frac)
                & (frac_alpha >= min_alpha_frac)
                & (stop_hits >= min_stop_hits))
        return pa.table({
            id_col: t.column(id_col),
            "n_words": pa.array(n_words),
            "n_lines": pa.array(n_lines),
            "mean_word_len": pa.array(mean_wl),
            "frac_alpha_words": pa.array(frac_alpha),
            "frac_bullet_lines": pa.array(frac_bullet),
            "frac_ellipsis_lines": pa.array(frac_ellipsis),
            "stop_hits": pa.array(stop_hits),
            "keep": pa.array(keep.astype(np.int64)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def gopher_rules_oracle_sql(table_path: str) -> str:
    """DuckDB mirror: identical RE2 patterns, identical integer counts,
    identical double divisions."""
    stop_sum = " + ".join(
        rf"CASE WHEN regexp_matches(text, '\b{w}\b') THEN 1 ELSE 0 END"
        for w in GOPHER_STOP)
    return rf"""
        WITH m AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
                 CAST(length(text) - len(regexp_extract_all(text, '\s'))
                      AS BIGINT) AS nonspace,
                 CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*'))
                      AS BIGINT) AS alpha_words,
                 CAST(len(regexp_extract_all(text, '\n')) + 1 AS BIGINT)
                      AS n_lines,
                 CAST(len(regexp_extract_all(text, '(?m)^[-*] ')) AS BIGINT)
                      AS bullets,
                 CAST(len(regexp_extract_all(text, '(?m)\.\.\.$')) AS BIGINT)
                      AS ellipsis,
                 CAST({stop_sum} AS BIGINT) AS stop_hits
          FROM read_parquet('{table_path}/*.parquet')),
        r AS (
          SELECT doc_id, n_words, n_lines, stop_hits,
                 nonspace / CAST(greatest(n_words, 1) AS DOUBLE) AS mean_word_len,
                 alpha_words / CAST(greatest(n_words, 1) AS DOUBLE)
                   AS frac_alpha_words,
                 bullets / CAST(n_lines AS DOUBLE) AS frac_bullet_lines,
                 ellipsis / CAST(n_lines AS DOUBLE) AS frac_ellipsis_lines
          FROM m)
        SELECT doc_id, n_words, n_lines, mean_word_len, frac_alpha_words,
               frac_bullet_lines, frac_ellipsis_lines, stop_hits,
               CAST(n_words >= 30 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND frac_bullet_lines <= 0.2
                    AND frac_ellipsis_lines <= 0.1
                    AND frac_alpha_words >= 0.85
                    AND stop_hits >= 2 AS BIGINT) AS keep
        FROM r"""


# ---------------------------------------------------------------------------
# C4 line filter
# ---------------------------------------------------------------------------

def c4_line_filter(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   min_words: int = 3):
    """C4's line-level cleaning (Raffel et al. 2020 §2.2): keep only lines
    that end in terminal punctuation (``. ! ? "``), have >= ``min_words``
    words, and contain neither a curly brace nor the word "javascript";
    documents are re-emitted from their surviving lines (docs with zero
    surviving lines are dropped, like C4 drops emptied pages).

    Vectorized line explode/filter/reassemble INSIDE each batch via the
    ListArray offsets of one ``split_pattern`` call — a doc's lines never
    leave its row's batch, so there is no shuffle at any scale."""

    def f(t: pa.Table) -> pa.Table:
        text = t.column(text_col).combine_chunks()
        lines = pc.split_pattern(text, "\n")
        flat = pc.list_flatten(lines)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        counts = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = pc.and_kleene(
            pc.and_kleene(
                pc.match_substring_regex(flat, r'[.!?"]$'),
                pc.greater_equal(
                    pc.count_substring_regex(flat, r"\S+"), min_words)),
            pc.and_kleene(
                pc.invert(pc.match_substring(flat, "javascript")),
                pc.invert(pc.match_substring(flat, "{"))))
        keep_np = keep.to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(counts)), counts)
        n_kept = np.bincount(seg[keep_np], minlength=len(counts)).astype(np.int64)
        kept_flat = flat.filter(keep)
        new_off = pa.array(np.r_[0, np.cumsum(n_kept)].astype(np.int32))
        clean = pc.binary_join(
            pa.ListArray.from_arrays(new_off, kept_flat), "\n")
        m = n_kept > 0
        mask = pa.array(m)
        return pa.table({
            id_col: t.column(id_col).filter(mask),
            "n_lines": pa.array(counts[m]),
            "n_kept": pa.array(n_kept[m]),
            "text_clean": clean.filter(mask),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def c4_line_filter_oracle_sql(table_path: str) -> str:
    """DuckDB mirror: literal \\n split, same RE2 line predicates, ordered
    string_agg reassembly."""
    return rf"""
        WITH ls AS (
          SELECT doc_id, string_split(text, chr(10)) AS arr
          FROM read_parquet('{table_path}/*.parquet')),
        lines AS (
          SELECT doc_id, CAST(i AS BIGINT) AS li, arr[i + 1] AS line,
                 CAST(len(arr) AS BIGINT) AS n_lines
          FROM ls, unnest(range(len(arr))) AS t(i)),
        kept AS (
          SELECT * FROM lines
          WHERE regexp_matches(line, '[.!?"]$')
            AND len(regexp_extract_all(line, '\S+')) >= 3
            AND NOT contains(line, 'javascript')
            AND NOT contains(line, '{{'))
        SELECT doc_id, n_lines, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(line, chr(10) ORDER BY li) AS text_clean
        FROM kept GROUP BY doc_id, n_lines"""
