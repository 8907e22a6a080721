"""Gopher / C4 rule-set tests: edge cases the oracle sweep's fixture can't
exercise (empty docs, threshold boundaries, zero-survivor docs) plus fixture
determinism."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from rotel_ray.stages.filterrules import (
    GOPHER_STOP,
    c4_line_filter,
    ensure_lines_docs,
    gopher_rules,
    reflow_text,
)


def _ds(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": pa.array(texts, pa.string())}))


def test_reflow_deterministic_and_decorated():
    t = " ".join(["tok"] * 60)
    a, b = reflow_text(7, t), reflow_text(7, t)
    assert a == b
    lines = a.split("\n")
    assert len(lines) > 5
    # every decoration class appears over a long enough doc
    assert any(ln.startswith("- ") for ln in lines)
    assert any(ln.endswith("...") for ln in lines)
    assert any(ln.endswith("{") for ln in lines)
    assert any("javascript" in ln for ln in lines)
    # token stream (minus injected decorations) preserves the original words
    assert sum(ln.count("tok") for ln in lines) == 60


def test_gopher_rules_edges():
    stopful = ("the be to of and that have with word " * 8).strip()  # 72 words
    texts = [
        "",                                  # empty: n_words 0, keep 0
        "12 34 56",                          # all-digit words: alpha frac 0
        stopful + ".",                       # passes everything
        "\n".join(["- a b"] * 10),           # 100% bullet lines
    ]
    out = gopher_rules(_ds(texts)).to_pandas().sort_values("doc_id")
    assert out.n_words.tolist()[0] == 0 and out.keep.tolist()[0] == 0
    assert out.frac_alpha_words.tolist()[1] == 0.0
    assert out.stop_hits.tolist()[2] == 8 and out.keep.tolist()[2] == 1
    assert out.frac_bullet_lines.tolist()[3] == 1.0 and out.keep.tolist()[3] == 0
    # mean word length is nonspace chars / words
    assert out.mean_word_len.tolist()[1] == 2.0


def test_gopher_stop_hits_are_presence_not_counts():
    out = gopher_rules(_ds(["the the the the"])).to_pandas()
    assert out.stop_hits.tolist() == [1]
    assert len(GOPHER_STOP) == 8


def test_c4_line_filter_semantics():
    texts = [
        'good line one here.\nno terminal punct\nshort.\nbrace line {x}.\n'
        'has javascript inside.\nanother fine line!',
        "- bullet\n...",                      # zero survivors: doc dropped
    ]
    out = c4_line_filter(_ds(texts)).to_pandas()
    assert out.doc_id.tolist() == [0]
    r = out.iloc[0]
    assert r.n_lines == 6 and r.n_kept == 2
    # surviving lines keep original order
    assert r.text_clean == "good line one here.\nanother fine line!"


def test_c4_quote_terminal_and_min_words():
    out = c4_line_filter(_ds(['he said "stop right there"\nonly two.'])).to_pandas()
    # quote counts as terminal punctuation; "only two." fails min_words
    assert out.iloc[0].n_kept == 1
    assert out.iloc[0].text_clean == 'he said "stop right there"'


def test_lines_fixture_cached_and_multiline(sf_dir):
    p1 = ensure_lines_docs(sf_dir)
    p2 = ensure_lines_docs(sf_dir)
    assert p1 == p2
    import pyarrow.parquet as pq

    t = pq.read_table(p1)
    assert t.num_rows == 500
    nl = [s.count("\n") for s in t.column("text").to_pylist()[:50]]
    assert min(nl) >= 1
