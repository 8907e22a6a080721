"""Property-based tests (hypothesis) for the pure kernels: the parse stage
must never crash on arbitrary text, hex must round-trip, batch hashing must
equal per-doc hashing, sessionization counts must be conserved."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rotel_ray.functions.scalar import hex_decode, hex_encode
from rotel_ray.stages.dedup import (
    _batch_token_hashes,
    _shingle_hashes,
    _token_hashes,
)
from rotel_ray.stages.parse import parse_batch

text_lines = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=120
)


@settings(max_examples=60, deadline=None)
@given(st.lists(text_lines, min_size=1, max_size=40))
def test_parse_never_crashes_and_classifies(lines):
    """Any text is parseable: the cascade always assigns an event_type and
    unmatched lines fall through to 'chat' (regex.rs non-match contract)."""
    t = pa.table({"text": pa.array(lines, pa.string())})
    out = parse_batch(t)
    ets = out.column("event_type").to_pylist()
    assert len(ets) == len(lines)
    assert all(e in {"tool_call", "error", "json", "kmsg", "nginx_error",
                     "nginx_access", "chat"} for e in ets)
    # text is preserved verbatim (per-turn text equality invariant)
    assert out.column("text").to_pylist() == lines


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(min_size=8, max_size=8), min_size=1, max_size=50))
def test_hex_roundtrip_property(raws):
    arr = pa.array(raws, pa.binary(8))
    assert hex_decode(hex_encode(arr), 8).to_pylist() == raws


@settings(max_examples=40, deadline=None)
@given(st.lists(text_lines, min_size=1, max_size=25))
def test_batch_token_hashes_equal_per_doc(texts):
    """The vectorized batch kernel is value-identical to the per-doc one."""
    th, counts = _batch_token_hashes(pa.array(texts, pa.string()))
    starts = np.r_[0, np.cumsum(counts)[:-1]]
    for i, x in enumerate(texts):
        got = th[starts[i]: starts[i] + counts[i]]
        assert np.array_equal(got, _token_hashes(x)), repr(x)


@settings(max_examples=40, deadline=None)
@given(text_lines, text_lines)
def test_shingle_jaccard_bounds(a, b):
    sa, sb = set(_shingle_hashes(a)), set(_shingle_hashes(b))
    union = sa | sb
    j = len(sa & sb) / len(union) if union else 0.0
    assert 0.0 <= j <= 1.0
    if a == b:
        assert j == 1.0 or not union
