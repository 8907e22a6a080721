"""PII substring scrubbing over free-text columns.

The reference's redaction processor masks whole attribute VALUES that match
``blocked_values`` patterns (rotel_python_processor_sdk/processors/
redaction_processor.py:23-31, 209-260); training-data pipelines need the
finer-grained variant: mask only the MATCHED SUBSTRINGS inside a text body
(emails, IPs, phone numbers) and keep the rest of the document. This stage
is that operator, vectorized end to end:

- counts per pattern via ``pc.count_substring_regex`` (RE2, non-overlapping
  leftmost matches — identical semantics to DuckDB's
  ``len(regexp_extract_all(...))``, which makes the op exactly SQL-oracleable)
- masking via chained ``pc.replace_substring_regex`` in declared pattern
  order (counts are always taken on the ORIGINAL text, before any mask
  could overlap a later pattern)

A plain task function (light state: a handful of pattern strings in the
closure) so the stage fuses with the upstream read — see the playbook note
in enrich.py about actor pools breaking fusion.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — order matters: masking is applied in
# sequence, counts are measured on the original text.
DEFAULT_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d{1,3}[ -]\d{3}[ -]\d{3,4}[ -]\d{4}\b", "[PHONE]"),
]


def scrub_batch(text: pa.ChunkedArray | pa.Array,
                patterns: list[tuple[str, str, str]] = DEFAULT_PII_PATTERNS):
    """Return (masked_text, {name: per-row match counts}) for one column."""
    counts = {name: pc.cast(pc.count_substring_regex(text, pattern=pat), pa.int64())
              for name, pat, _ in patterns}
    masked = text
    for _, pat, repl in patterns:
        masked = pc.replace_substring_regex(masked, pattern=pat, replacement=repl)
    return masked, counts


def pii_scrub_stage(ds, *, text_col: str = "text", keep_cols: list[str] | None = None,
                    patterns: list[tuple[str, str, str]] = DEFAULT_PII_PATTERNS):
    """Append ``n_<name>`` count columns and replace ``text_col`` with the
    masked text. ``keep_cols`` limits the output projection (id columns)."""

    def scrub(t: pa.Table) -> pa.Table:
        masked, counts = scrub_batch(t.column(text_col), patterns)
        cols = {c: t.column(c) for c in (keep_cols or t.column_names) if c != text_col}
        for name, arr in counts.items():
            cols[f"n_{name}"] = arr
        cols[text_col] = masked
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def pii_density(ds, *, text_col: str = "text", group_col: str = "role",
                patterns: list[tuple[str, str, str]] = DEFAULT_PII_PATTERNS,
                num_buckets: int = 4):
    """Per-group PII exposure rollup — the governance dashboard view over
    the same RE2 patterns pii_scrub masks: per ``group_col``, match
    counts per pattern, total characters, and the integer
    per-billion-chars rate pii_e9 = floor(1e9·total_matches/chars).
    Counts are taken per batch and pre-combined, so only one narrow row
    per (group, batch) ever shuffles."""
    from .aggregate import two_phase_aggregate

    names = [name for name, _, _ in patterns]

    def prep(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        cols = {group_col: t.column(group_col)}
        for name, pat, _ in patterns:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(text, pattern=pat), pa.int64())
        cols["n_chars"] = pc.cast(pc.utf8_length(text), pa.int64())
        return pa.table(cols)

    agg = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        [group_col],
        [(f"n_{n}", "sum", f"n_{n}") for n in names]
        + [("n_chars", "sum", "n_chars")], num_buckets=num_buckets)

    def rate(t: pa.Table) -> pa.Table:
        import numpy as np

        total = sum(t.column(f"n_{n}").to_numpy(zero_copy_only=False)
                    for n in names)
        ch = t.column("n_chars").to_numpy(zero_copy_only=False)
        return t.append_column(
            "pii_e9",
            pa.array(total * 1_000_000_000 // np.maximum(ch, 1)))

    return agg.map_batches(rate, batch_format="pyarrow",
                           zero_copy_batch=True)
