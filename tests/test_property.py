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


# ---------------------------------------------------------------------------
# batch-vs-per-doc signature kernels (regression: a trailing empty doc used to
# clamp the reduceat start and truncate the PREVIOUS doc's segment by one)
# ---------------------------------------------------------------------------

from rotel_ray.stages.dedup import (  # noqa: E402
    MinHashSignatures,
    _minhash_sig,
    _simhash64,
    simhash_batch,
)


def _minhash_rows(inst: MinHashSignatures, texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = inst(t)
    flat = np.array(out.column("sig").combine_chunks().flatten().to_pylist(),
                    dtype=np.int64).view(np.uint64)
    return flat.reshape(len(texts), len(inst.a))


def test_minhash_trailing_empty_doc_regression():
    """ADVICE repro: ['alpha beta gamma delta epsilon', ''] must give doc 0
    the same signature as the per-doc reference."""
    inst = MinHashSignatures(num_perm=8)
    sigs = _minhash_rows(inst, ["alpha beta gamma delta epsilon", ""])
    ref0 = _minhash_sig(_shingle_hashes("alpha beta gamma delta epsilon"), inst.a, inst.b)
    assert np.array_equal(sigs[0], ref0)
    assert (sigs[1] == np.iinfo(np.uint64).max).all()


def test_simhash_trailing_empty_doc_regression():
    sigs = simhash_batch(pa.array(["alpha beta gamma delta epsilon", ""], pa.string()))
    assert int(sigs[0]) == _simhash64(_token_hashes("alpha beta gamma delta epsilon"))
    assert int(sigs[1]) == 0


@settings(max_examples=40, deadline=None)
@given(st.lists(text_lines, min_size=1, max_size=15))
def test_batch_minhash_equals_per_doc(texts):
    inst = MinHashSignatures(num_perm=8)
    sigs = _minhash_rows(inst, texts)
    for i, x in enumerate(texts):
        ref = _minhash_sig(_shingle_hashes(x), inst.a, inst.b)
        assert np.array_equal(sigs[i], ref), repr(x)


@settings(max_examples=40, deadline=None)
@given(st.lists(text_lines, min_size=1, max_size=15))
def test_batch_simhash_equals_per_doc(texts):
    sigs = simhash_batch(pa.array(texts, pa.string()))
    for i, x in enumerate(texts):
        assert int(sigs[i]) == _simhash64(_token_hashes(x)), repr(x)


def test_minhash_chunked_reduceat_matches_unchunked():
    """The memory-capped chunked permutation path is value-identical."""
    texts = [f"tok{i} " * (i % 7 + 3) for i in range(50)] + ["", "one two three"]
    big = MinHashSignatures(num_perm=16)
    small = MinHashSignatures(num_perm=16)
    small.CHUNK_SHINGLES = 8  # force many chunks (class attr shadowed per inst)
    assert np.array_equal(_minhash_rows(big, texts), _minhash_rows(small, texts))


def test_hex_decode_uppercase_and_invalid():
    from rotel_ray.functions.scalar import hex_decode as hd

    assert hd(pa.array(["DEADBEEF", "deadbeef"]), 4).to_pylist() == [b"\xde\xad\xbe\xef"] * 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hd(pa.array(["zzzzzzzz"]), 4)
    with _pytest.raises(ValueError):
        hd(pa.array([":;<=>?@G"]), 4)  # chars adjacent to hex ranges


@settings(max_examples=40, deadline=None)
@given(st.lists(text_lines, min_size=1, max_size=30))
def test_vec_hash_strings_deterministic_and_total(texts):
    from rotel_ray.stages.aggregate import _vec_hash_strings

    a = _vec_hash_strings(pa.array(texts, pa.string()))
    b = _vec_hash_strings(pa.array(texts, pa.string()))
    assert np.array_equal(a, b)
    # equal strings hash equal; a sliced array hashes like a fresh one
    arr = pa.array(texts + texts, pa.string())
    h = _vec_hash_strings(arr)
    assert np.array_equal(h[: len(texts)], h[len(texts):])
    assert np.array_equal(_vec_hash_strings(arr.slice(len(texts))), a)


# ---------------------------------------------------------------------------
# flatten: random JSON trees vs an independent reference walker
# ---------------------------------------------------------------------------

from rotel_ray.stages.transform import _leaf_to_string, flatten_json_obj  # noqa: E402

_keys = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
_json_vals = st.recursive(
    st.one_of(st.text(max_size=12), st.integers(-10**6, 10**6), st.booleans(), st.none()),
    lambda ch: st.lists(ch, max_size=3) | st.dictionaries(_keys, ch, max_size=3),
    max_leaves=15,
)


def _reference_paths(obj, prefix=""):
    """Independent walker: expected (path, leaf) set for unbounded flatten."""
    out = []
    for k, v in obj.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out += _reference_paths(v, p)
        elif v is None:
            continue
        else:
            out.append((p, v))
    return out


@settings(max_examples=80, deadline=None)
@given(st.dictionaries(_keys, _json_vals, max_size=4))
def test_flatten_matches_reference_walker(obj):
    flat = flatten_json_obj(obj)
    expected = _reference_paths(obj)
    assert [k for k, _ in flat] == [k for k, _ in expected]  # order + coverage
    for (k, v), (_, leaf) in zip(flat, expected):
        assert v == _leaf_to_string(leaf)
        if isinstance(leaf, str):
            assert v == leaf


@settings(max_examples=40, deadline=None)
@given(st.lists(text_lines, min_size=1, max_size=20),
       st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                min_size=0, max_size=6))
def test_bpe_encode_batch_equals_per_doc(texts, raw_merges):
    """The batched encode kernel (shared byte stream + reduceat) is
    value-identical to per-doc greedy merge application, for ANY merge
    table — including a==b merges and merges of previously-created ids."""
    from rotel_ray.stages.bpe import encode_batch

    mseq = [(a, b, 256 + i) for i, (a, b) in enumerate(raw_merges)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = encode_batch(t, mseq)

    def ref_merge(syms, a, b, nid):
        res, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                res.append(nid); i += 2
            else:
                res.append(syms[i]); i += 1
        return res

    for i, tx in enumerate(texts):
        syms = []
        for w in tx.split():
            s = list(w.encode())
            for a, b, nid in mseq:
                s = ref_merge(s, a, b, nid)
            syms.extend(s)
        assert out.column("n_tokens")[i].as_py() == len(syms)
        assert out.column("sym_sum")[i].as_py() == sum(syms)
        assert out.column("pos_weighted")[i].as_py() == \
            sum((p + 1) * v for p, v in enumerate(syms))


@settings(max_examples=40, deadline=None)
@given(st.lists(text_lines, min_size=1, max_size=15),
       st.integers(1, 20), st.integers(1, 20))
def test_doc_chunks_tile_exactly(texts, chunk_size, stride):
    """Chunk windows tile each doc: starts every `stride`, length =
    min(chunk_size, n - start), checksums equal the per-doc slice sums —
    for ANY (chunk_size, stride) including overlap and gaps."""
    from rotel_ray.stages.dedup import _fnv1a
    from rotel_ray.stages.pack import chunk_batch

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = chunk_batch(t, chunk_size=chunk_size, stride=stride)
    rows = list(zip(out.column("doc_id").to_pylist(),
                    out.column("chunk_idx").to_pylist(),
                    out.column("n_tokens").to_pylist(),
                    out.column("tok_sum").to_pylist()))
    ref = []
    for i, tx in enumerate(texts):
        tids = [_fnv1a(w) % 65536 for w in tx.split()]
        for ci, s in enumerate(range(0, len(tids), stride)):
            w = tids[s:s + chunk_size]
            ref.append((i, ci, len(w), sum(w)))
    assert rows == ref


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2**32))
def test_png_roundtrip_property(h, w, seed):
    """Any 8-bit grayscale array round-trips through the stdlib PNG codec
    (every filter type is exercised for h >= 5)."""
    from rotel_ray.stages.multimodal import decode_png, encode_png

    a = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    assert (decode_png(encode_png(a)) == a).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=4096),
       st.integers(min_value=0, max_value=2**32),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_property(n, seed, rate):
    from rotel_ray.stages.multimodal import decode_wav, encode_wav

    s = np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8)
    got, r = decode_wav(encode_wav(s, rate=rate))
    assert r == rate and (got == s).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=200))
def test_splitmix64_is_injective_on_sample_and_matches_bit_length(xs):
    """splitmix64 is a permutation (no collisions on any sample) and the
    vectorized bit_length is exact."""
    from rotel_ray.stages.sketch import _bit_length_u64, splitmix64

    arr = np.array(sorted(set(xs)), dtype=np.uint64)
    out = splitmix64(arr)
    assert len(np.unique(out)) == len(arr)
    bl = _bit_length_u64(arr)
    assert bl.tolist() == [int(x).bit_length() for x in arr.tolist()]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10**6),
                min_size=1, max_size=300),
       st.integers(min_value=1, max_value=50))
def test_weighted_sample_keys_match_reference(weights, k):
    """The ES key computation matches an independent per-row evaluation
    (same fixed float expression), and higher weight can only improve a
    row's key for the same hash value."""
    from rotel_ray.stages.mix import weighted_sample  # noqa: F401
    from rotel_ray.stages.sketch import splitmix64

    ids = np.arange(len(weights), dtype=np.uint64)
    w = np.array(weights, dtype=np.float64)
    h = splitmix64(ids)
    u = (h.astype(np.float64) + 1.0) / 2.0**64
    key = np.log(u) / np.maximum(w, 1.0)
    ref = [np.log((float(splitmix64(np.array([i], np.uint64))[0]) + 1.0)
                  / 2.0**64) / max(float(wi), 1.0)
           for i, wi in enumerate(weights)]
    assert np.allclose(key, ref, rtol=0, atol=0)
    # monotonicity in w for fixed u: ln(u) < 0, dividing by larger w raises it
    assert (np.log(u) / np.maximum(w * 2, 1.0) >= key - 1e-18).all()
