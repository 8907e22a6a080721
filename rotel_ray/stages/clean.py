"""Unicode text cleaning — the day-one corpus-ingest normalization pass.

Web-scale text arrives with decomposed accents (NFD), zero-width
characters, stray C0 controls and run-on whitespace; every training
pipeline normalizes these before tokenization (the ftfy/CCNet cleanup
step). ``text_normalize`` applies, in order:

1. Unicode NFC normalization (stdlib ``unicodedata`` — the per-string C
   call; DuckDB's ``nfc_normalize`` is the oracle mirror),
2. strip control + zero-width characters (one vectorized RE2 kernel;
   the same RE2 pattern runs in DuckDB's ``regexp_replace``),
3. collapse space/tab runs to a single space (vectorized RE2),
4. trim leading/trailing spaces.

The documents corpus is ASCII, so a deterministic UNICODE FIXTURE
(``ensure_unicode_docs``) derives a dirtied table from it — per
``doc_id % 5``: decomposed-accent prefix, zero-width insertion, doubled
whitespace + tab, control char + trailing spaces, or untouched — making
every branch of the cleaner oracle-checked against real unicode input.
"""

from __future__ import annotations

import os
import shutil
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# C0 controls (minus \t\n\r, which are whitespace), DEL, zero-widths, BOM —
# one RE2 class shared verbatim with the DuckDB oracle
ZAP_PATTERN = (r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F"
               r"\x{200B}-\x{200D}\x{FEFF}]")
WS_PATTERN = r"[ \t]+"


def normalize_strings(texts: list[str | None]) -> list[str | None]:
    """The scalar reference kernel (NFC only) — RE2 steps run vectorized
    in the batch function below."""
    return [None if t is None else unicodedata.normalize("NFC", t)
            for t in texts]


def _nfc_column(col: pa.Array) -> pa.Array:
    """NFC with an ASCII fast path: NFC is the identity on pure-ASCII
    strings, so only the non-ASCII minority pays the per-string
    ``unicodedata.normalize`` call (one vectorized Arrow mask decides).
    On the mostly-ASCII corpora of a web-scale pipeline this removes
    ~all of the only per-row Python in this stage."""
    ascii_mask = pc.fill_null(pc.string_is_ascii(col), True)
    if pc.all(ascii_mask).as_py():
        return col
    idx = np.flatnonzero(
        pc.invert(ascii_mask).to_numpy(zero_copy_only=False))
    subset = col.take(pa.array(idx))
    fixed = pa.array(normalize_strings(subset.to_pylist()), pa.string())
    # scatter the normalized minority back into the column
    out = col.to_pylist()
    for i, v in zip(idx, fixed.to_pylist()):
        out[i] = v
    return pa.array(out, pa.string())


def text_normalize(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Stateless normalization pass: (id_col, text_norm, changed)."""

    def f(t: pa.Table) -> pa.Table:
        col = t.column(text_col).combine_chunks()
        nfc = _nfc_column(col)
        zapped = pc.replace_substring_regex(nfc, pattern=ZAP_PATTERN,
                                            replacement="")
        collapsed = pc.replace_substring_regex(zapped, pattern=WS_PATTERN,
                                               replacement=" ")
        norm = pc.utf8_trim(collapsed, " ")
        return pa.table({
            id_col: t.column(id_col),
            "text_norm": norm,
            "changed": pc.not_equal(norm, col),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


UNICODE_FIXTURE_VERSION = 2


def dirty_text(doc_id: int, text: str) -> str:
    """Deterministic per-doc dirtying — one unicode hazard class each."""
    v = doc_id % 5
    if v == 0:  # DECOMPOSED accent (e + U+0301): NFC must recompose
        return "Cafe\u0301 " + text
    if v == 1:  # zero-width space mid-text + joiner/non-joiner at the end
        return text[:10] + "\u200b" + text[10:] + "\u200c\u200d"
    if v == 2:  # run-on whitespace + tabs
        return "  " + text.replace(" ", "  ", 3) + " \t"
    if v == 3:  # BOM + C0 control + trailing spaces
        return "\ufeff" + text[:5] + "\x01" + text[5:] + "   "
    if doc_id % 10 == 9:  # CJK + astral emoji: NFC-stable, widths 3 and 4
        return text + " \u4e2d\u6587\U0001F600"
    return text


def unicode_docs_path(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Pure cache path (reads only the source footer; never builds)."""
    from ..generator import sf_from_dir

    from .planted import source_tag

    tag = source_tag(f"{sf_dir}/documents.parquet")
    return os.path.join(
        root,
        f"unidocs_g{UNICODE_FIXTURE_VERSION}_sf{sf_from_dir(sf_dir):g}_{tag}")


def ensure_unicode_docs(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Dirtied documents table (pure function of the source, cached with
    the content-fingerprint key like the other fixtures)."""
    out = unicode_docs_path(sf_dir, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    dirty = [dirty_text(i, x) for i, x in zip(ids, texts)]
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(dirty, pa.string())}),
        os.path.join(tmp, "part-0000.parquet"))
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def script_mix(texts, sources, *, id_col: str = "doc_id",
               text_col: str = "text", source_col: str = "source",
               num_buckets: int = 16):
    """Per-source unicode composition by UTF-8 encoded width — the quick
    corpus health check for mojibake and script drift (ASCII / 2-byte
    Latin-ext+combining / 3-byte BMP incl. CJK and zero-widths / 4-byte
    astral incl. emoji). Output
    (source, n_docs, n_ascii, n_w2, n_w3, n_w4).

    Classification walks the raw Arrow string buffers once and counts
    LEAD bytes by range (<0x80, 0xC0-0xDF, 0xE0-0xEF, 0xF0-0xF7;
    continuation bytes 0x80-0xBF are skipped) — zero-copy, no decode, one
    codepoint per lead byte by UTF-8 construction. Narrow
    (doc_id, 4 counts) rows bucket-join the (doc_id, source) map; text
    never shuffles."""
    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    def widths(t: pa.Table) -> pa.Table:
        s = t.column(text_col).combine_chunks()
        if pa.types.is_large_string(s.type):
            s = pc.cast(s, pa.string())
        n = len(s)
        offs = np.frombuffer(s.buffers()[1], np.int32)[s.offset: s.offset + n + 1]
        data = np.frombuffer(s.buffers()[2], np.uint8)
        stream = data[offs[0]: offs[-1]]
        doc_of = np.repeat(np.arange(n), np.diff(offs).astype(np.int64))
        cols = {id_col: t.column(id_col)}
        for lo, hi, name in ((0x00, 0x80, "n_ascii"), (0xC0, 0xE0, "n_w2"),
                             (0xE0, 0xF0, "n_w3"), (0xF0, 0xF8, "n_w4")):
            m = (stream >= lo) & (stream < hi)
            cols[name] = pa.array(
                np.bincount(doc_of[m], minlength=n).astype(np.int64))
        cols["n_docs"] = pa.array(np.ones(n, np.int64))
        return pa.table(cols)

    per_doc = texts.map_batches(widths, batch_format="pyarrow",
                                zero_copy_batch=True)
    joined = bucket_hash_join(per_doc, sources, on=id_col,
                              num_buckets=num_buckets)
    return two_phase_aggregate(
        joined.map_batches(
            lambda t: t.select([source_col, "n_docs", "n_ascii", "n_w2",
                                "n_w3", "n_w4"]),
            batch_format="pyarrow", zero_copy_batch=True),
        [source_col],
        [("n_docs", "sum", "n_docs"), ("n_ascii", "sum", "n_ascii"),
         ("n_w2", "sum", "n_w2"), ("n_w3", "sum", "n_w3"),
         ("n_w4", "sum", "n_w4")],
        num_buckets=8)


def control_char_audit(ds, sources, *, text_col: str = "text",
                       id_col: str = "doc_id", source_col: str = "source",
                       num_buckets: int = 8):
    """Ingest hygiene audit: per source, how many control / zero-width
    characters (the ZAP_PATTERN set text_normalize strips) arrive, and
    how many docs carry any — the dashboard that catches a feed gone
    mojibake BEFORE normalization hides it. ``sources`` is the
    (doc_id, source) dataset to attribute against (the dirtied fixture
    itself carries no source column). Output
    (source, n_docs, n_docs_affected, n_zap_chars, n_chars).

    Scale shape: the regex count runs map-side; only (doc_id, 3 ints)
    join rows shuffle into the bucketed doc_id join, then a tiny
    per-source reduce."""
    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    def prep(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        zap = pc.cast(pc.count_substring_regex(text, pattern=ZAP_PATTERN),
                      pa.int64())
        return pa.table({
            id_col: t.column(id_col),
            "zap": zap,
            "affected": pc.cast(pc.greater(zap, 0), pa.int64()),
            "chars": pc.cast(pc.utf8_length(text), pa.int64())})

    narrow = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
    j = bucket_hash_join(narrow, sources, on=id_col,
                         num_buckets=num_buckets)

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.nulls(t.num_rows, pa.int64()).fill_null(1))

    return two_phase_aggregate(
        j.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        [source_col],
        [("one", "sum", "n_docs"), ("affected", "sum", "n_docs_affected"),
         ("zap", "sum", "n_zap_chars"), ("chars", "sum", "n_chars")],
        num_buckets=4)
