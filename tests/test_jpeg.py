"""Baseline JPEG codec tests: bit-exact entropy-layer roundtrip, edge
symbols (ZRL/EOB), corruption rejection, PIL interop (skip-gated)."""

import numpy as np
import pytest

from rotel_ray.stages.jpeg import (
    _Z,
    coeffs_to_pixels,
    decode_jpeg,
    encode_jpeg,
    generate_jpeg_media,
)


def _rand_coeffs(rng, bw, bh, dense=False):
    coeffs = np.zeros((bw * bh, 64), np.int64)
    coeffs[:, 0] = rng.integers(-100, 101, bw * bh)
    for b in range(bw * bh):
        for k in rng.integers(1, 64, int(rng.integers(0, 40 if dense else 12))):
            coeffs[b, _Z[k]] = int(rng.integers(-60, 61))
    return coeffs.reshape(-1, 8, 8)


def test_roundtrip_bit_exact_various_shapes():
    rng = np.random.default_rng(1)
    for bw, bh in [(1, 1), (3, 2), (6, 6), (1, 5)]:
        coeffs = _rand_coeffs(rng, bw, bh)
        data = encode_jpeg(coeffs, bw * 8, bh * 8)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        img = decode_jpeg(data)
        assert (img == coeffs_to_pixels(coeffs, bw * 8, bh * 8)).all(), (bw, bh)


def test_entropy_edge_symbols():
    """ZRL (16-zero runs), EOB-less full blocks, max-magnitude DC diffs,
    and the 0xFF byte-stuffing path all roundtrip."""
    rng = np.random.default_rng(2)
    # dense blocks: many end without EOB; big DC swings stress diff coding
    coeffs = _rand_coeffs(rng, 4, 4, dense=True)
    coeffs[0, :, :] = 0
    coeffs[0, 0, 0] = 1000   # large DC
    z = np.zeros(64, np.int64)
    z[0], z[40], z[63] = -512, 1, -1   # two ZRLs needed mid-block
    coeffs[1] = z[np.argsort(np.arange(64))].reshape(8, 8)
    data = encode_jpeg(coeffs, 32, 32)
    assert (decode_jpeg(data) == coeffs_to_pixels(coeffs, 32, 32)).all()


def test_decoder_rejects_malformed():
    rng = np.random.default_rng(3)
    coeffs = _rand_coeffs(rng, 2, 2)
    data = encode_jpeg(coeffs, 16, 16)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + data)
    # a SEQUENTIAL scan header (Ss=0, Se=63) inside a frame that claims
    # SOF2 is malformed — rejected, not mis-decoded (progressive proper is
    # supported as of round 5; see the test_progressive_* suite)
    bad = bytearray(data)
    sof = data.find(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan must have Se=0"):
        decode_jpeg(bytes(bad))
    # truncated scan: missing SOS/EOI
    with pytest.raises(ValueError):
        decode_jpeg(data[: sof + 4])


def test_fixture_generator_ground_truth():
    t = generate_jpeg_media(30)
    assert sorted(set(t.column("channels").to_pylist())) == [1, 3]
    for i in range(30):
        img = decode_jpeg(t.column("payload")[i].as_py())
        assert img.tobytes().hex().upper() == t.column("body_hex")[i].as_py()
        ch = t.column("channels")[i].as_py()
        want = (t.column("height")[i].as_py(), t.column("width")[i].as_py())
        assert img.shape == (want if ch == 1 else (*want, 3))
    # determinism
    assert generate_jpeg_media(30).equals(t)


def test_color_roundtrip_bit_exact():
    from rotel_ray.stages.jpeg import coeffs_to_rgb, encode_jpeg_color

    rng = np.random.default_rng(6)
    c3 = np.stack([_rand_coeffs(rng, 2, 3) for _ in range(3)])
    data = encode_jpeg_color(c3, 16, 24)
    img = decode_jpeg(data)
    assert img.shape == (24, 16, 3)
    assert (img == coeffs_to_rgb(c3, 16, 24)).all()


def test_jpeg_against_pil_if_present():
    """Interop: a real libjpeg implementation must parse our bitstream and
    agree within the T.81 IDCT accuracy envelope (libjpeg's integer IDCT
    differs from the shared float kernel by at most ±1/pixel)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(4)
    coeffs = _rand_coeffs(rng, 3, 3)
    data = encode_jpeg(coeffs, 24, 24)
    img = PIL.open(io.BytesIO(data))
    got = np.asarray(img.convert("L"))
    ref = coeffs_to_pixels(coeffs, 24, 24)
    assert got.shape == ref.shape
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_420_roundtrip_bit_exact():
    from rotel_ray.stages.jpeg import coeffs_to_rgb_420, encode_jpeg_420

    rng = np.random.default_rng(8)
    w, h = 32, 48
    cy = _rand_coeffs(rng, w // 8, h // 8)
    cb = _rand_coeffs(rng, w // 16, h // 16)
    cr = _rand_coeffs(rng, w // 16, h // 16)
    img = decode_jpeg(encode_jpeg_420(cy, cb, cr, w, h))
    assert img.shape == (h, w, 3)
    assert (img == coeffs_to_rgb_420(cy, cb, cr, w, h)).all()


def test_420_against_pil_if_present():
    PIL = pytest.importorskip("PIL.Image")
    import io

    from rotel_ray.stages.jpeg import coeffs_to_rgb_420, encode_jpeg_420

    rng = np.random.default_rng(9)
    w, h = 32, 32
    cy = _rand_coeffs(rng, 4, 4)
    cb = _rand_coeffs(rng, 2, 2)
    cr = _rand_coeffs(rng, 2, 2)
    img = PIL.open(io.BytesIO(encode_jpeg_420(cy, cb, cr, w, h)))
    got = np.asarray(img.convert("RGB")).astype(int)
    ref = coeffs_to_rgb_420(cy, cb, cr, w, h).astype(int)
    # libjpeg uses fancy chroma upsampling + integer IDCT: allow a small
    # envelope; structural parse correctness is the real assertion
    assert got.shape == ref.shape
    assert np.abs(got - ref).mean() < 8


def test_entropy_layer_property_roundtrip():
    """Property: ANY in-range coefficient tensor roundtrips bit-exactly
    through encode->decode (the lossless layer), for all three variants."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rotel_ray.stages.jpeg import coeffs_to_rgb_420, encode_jpeg_420

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def run(seed):
        rng = np.random.default_rng(seed)
        # in-range baseline values: DC |v|<=1023 keeps diffs within 11 bits
        cy = rng.integers(-1023, 1024, (4, 64))
        cy[:, 1:] = np.where(rng.random((4, 63)) < 0.8, 0, cy[:, 1:])
        cy = cy.reshape(-1, 8, 8)
        c1 = rng.integers(-1023, 1024, (1, 64))
        c1[:, 1:] = np.where(rng.random((1, 63)) < 0.8, 0, c1[:, 1:])
        c1 = c1.reshape(-1, 8, 8)
        img = decode_jpeg(encode_jpeg_420(cy, c1, c1.copy(), 16, 16))
        assert (img == coeffs_to_rgb_420(cy, c1, c1.copy(), 16, 16)).all()

    run()


def test_422_roundtrip_bit_exact():
    from rotel_ray.stages.jpeg import coeffs_to_rgb_422, encode_jpeg_422

    rng = np.random.default_rng(10)
    w, h = 48, 40  # w 16-aligned, h 8-aligned (not 16): the 4:2:2-only shape
    cy = _rand_coeffs(rng, w // 8, h // 8)
    cb = _rand_coeffs(rng, w // 16, h // 8)
    cr = _rand_coeffs(rng, w // 16, h // 8)
    img = decode_jpeg(encode_jpeg_422(cy, cb, cr, w, h))
    assert img.shape == (h, w, 3)
    assert (img == coeffs_to_rgb_422(cy, cb, cr, w, h)).all()


def test_422_against_pil_if_present():
    PIL = pytest.importorskip("PIL.Image")
    import io

    from rotel_ray.stages.jpeg import coeffs_to_rgb_422, encode_jpeg_422

    rng = np.random.default_rng(11)
    w, h = 32, 24
    cy = _rand_coeffs(rng, 4, 3)
    cb = _rand_coeffs(rng, 2, 3)
    cr = _rand_coeffs(rng, 2, 3)
    img = PIL.open(io.BytesIO(encode_jpeg_422(cy, cb, cr, w, h)))
    got = np.asarray(img.convert("RGB")).astype(int)
    ref = coeffs_to_rgb_422(cy, cb, cr, w, h).astype(int)
    assert got.shape == ref.shape
    assert np.abs(got - ref).mean() < 8


def test_restart_interval_roundtrip_all_variants():
    """DRI + RSTn: byte-aligned restarts with DC-predictor resets must
    roundtrip bit-exactly for gray / 4:4:4 / 4:2:0 / 4:2:2, across
    intervals that do and do not divide the MCU count, including the
    RST-index wraparound past RST7."""
    from rotel_ray.stages.jpeg import (
        coeffs_to_rgb,
        coeffs_to_rgb_420,
        coeffs_to_rgb_422,
        encode_jpeg_420,
        encode_jpeg_422,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(12)
    # grayscale 6x6 = 36 MCUs: ri=2 -> 17 RST markers (wraps past RST7)
    for ri in (1, 2, 5, 36, 50):
        coeffs = _rand_coeffs(rng, 6, 6)
        data = encode_jpeg(coeffs, 48, 48, restart_interval=ri)
        assert (b"\xff\xdd" in data) and \
            (decode_jpeg(data) == coeffs_to_pixels(coeffs, 48, 48)).all(), ri
    c3 = np.stack([_rand_coeffs(rng, 4, 3) for _ in range(3)])
    d = encode_jpeg_color(c3, 32, 24, restart_interval=3)
    assert (decode_jpeg(d) == coeffs_to_rgb(c3, 32, 24)).all()
    cy, cb, cr = (_rand_coeffs(rng, 4, 4), _rand_coeffs(rng, 2, 2),
                  _rand_coeffs(rng, 2, 2))
    d = encode_jpeg_420(cy, cb, cr, 32, 32, restart_interval=1)
    assert (decode_jpeg(d) == coeffs_to_rgb_420(cy, cb, cr, 32, 32)).all()
    cy, cb, cr = (_rand_coeffs(rng, 4, 2), _rand_coeffs(rng, 2, 2),
                  _rand_coeffs(rng, 2, 2))
    d = encode_jpeg_422(cy, cb, cr, 32, 16, restart_interval=2)
    assert (decode_jpeg(d) == coeffs_to_rgb_422(cy, cb, cr, 32, 16)).all()


def test_restart_against_pil_if_present():
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(13)
    coeffs = _rand_coeffs(rng, 4, 4)
    data = encode_jpeg(coeffs, 32, 32, restart_interval=3)
    got = np.asarray(PIL.open(io.BytesIO(data)).convert("L"))
    ref = coeffs_to_pixels(coeffs, 32, 32)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_restart_corruption_rejected():
    """A wrong / missing RSTn index and a desynced stream must raise, not
    mis-decode."""
    rng = np.random.default_rng(14)
    coeffs = _rand_coeffs(rng, 4, 4)
    data = encode_jpeg(coeffs, 32, 32, restart_interval=2)
    sos = data.find(b"\xff\xda")
    rst0 = data.find(b"\xff\xd0", sos)
    assert rst0 > 0
    bad = bytearray(data)
    bad[rst0 + 1] = 0xD3  # out-of-sequence restart index
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg(bytes(bad))
    # dropping the marker desyncs the predictor chain/byte alignment
    with pytest.raises(ValueError):
        decode_jpeg(data[:rst0] + data[rst0 + 2:])


def test_malformed_zrl_and_segment_length_rejected():
    """Trailing ZRLs that overflow the block and marker segments with
    length < 2 must error instead of silently misparsing."""
    from rotel_ray.stages.jpeg import _AC_ENC, _BitWriter, _DC_ENC

    # hand-build a scan: DC size 0, then 4 ZRLs = k past 63
    bw = _BitWriter()
    bw.put(*_DC_ENC[0])
    for _ in range(4):
        bw.put(*_AC_ENC[0xF0])
    scan = bw.flush()
    good = encode_jpeg(np.zeros((1, 8, 8), np.int64), 8, 8)
    sos_end = good.find(b"\xff\xda") + 2 + 6 + 2  # marker+len+payload(6)
    bad = good[:sos_end] + scan + b"\xff\xd9"
    with pytest.raises(ValueError, match="AC run overflows"):
        decode_jpeg(bad)
    # corrupt a segment length to 1 (< 2 is impossible per B.1.1.4)
    dqt = good.find(b"\xff\xdb")
    broken = bytearray(good)
    broken[dqt + 2:dqt + 4] = (1).to_bytes(2, "big")
    with pytest.raises(ValueError, match="segment length"):
        decode_jpeg(bytes(broken))


def test_out_of_range_coefficients_rejected():
    z = np.zeros((1, 8, 8), np.int64)
    z[0, 0, 1] = 1024  # AC needs 11 bits
    with pytest.raises(ValueError, match="AC coefficient"):
        encode_jpeg(z, 8, 8)
    z = np.zeros((1, 8, 8), np.int64)
    z[0, 0, 0] = 2048  # DC diff needs 12 bits
    with pytest.raises(ValueError, match="DC difference"):
        encode_jpeg(z, 8, 8)


# ---------------------------------------------------------------------------
# progressive (SOF2) — round 5
# ---------------------------------------------------------------------------


def test_progressive_roundtrip_all_variants():
    """Progressive encode/decode is bit-exact through the entropy layer for
    gray / 4:4:4 / 4:2:0, with and without restart intervals — identical
    pixels to the sequential codec on the same coefficients."""
    from rotel_ray.stages.jpeg import (coeffs_to_rgb, coeffs_to_rgb_420,
                                       encode_jpeg_progressive,
                                       encode_jpeg_progressive_420,
                                       encode_jpeg_progressive_color)

    rng = np.random.default_rng(20)
    w, h = 32, 24
    c = _rand_coeffs(rng, w // 8, h // 8)
    want = coeffs_to_pixels(c, w, h)
    for ri in (0, 3):
        got = decode_jpeg(encode_jpeg_progressive(c, w, h,
                                                  restart_interval=ri))
        assert (got == want).all()
    # sequential and progressive agree exactly (same quantized coeffs)
    assert (decode_jpeg(encode_jpeg(c, w, h)) == want).all()

    c3 = np.stack([_rand_coeffs(rng, w // 8, h // 8) for _ in range(3)])
    got = decode_jpeg(encode_jpeg_progressive_color(c3, w, h))
    assert (got == coeffs_to_rgb(c3, w, h)).all()

    w, h = 48, 32
    cy = _rand_coeffs(rng, w // 8, h // 8)
    cb = _rand_coeffs(rng, w // 16, h // 16)
    cr = _rand_coeffs(rng, w // 16, h // 16)
    for ri in (0, 2):
        got = decode_jpeg(encode_jpeg_progressive_420(
            cy, cb, cr, w, h, restart_interval=ri))
        assert (got == coeffs_to_rgb_420(cy, cb, cr, w, h)).all()


def test_progressive_adversarial_coefficient_shapes():
    """Dense, all-zero, high-frequency-only and magnitude-1-heavy blocks
    hammer EOB runs, ZRL-in-refinement and buffered correction bits."""
    from rotel_ray.stages.jpeg import _Z, encode_jpeg_progressive

    for seed in range(12):
        rng = np.random.default_rng(seed)
        bw_, bh_ = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        w, h, n = bw_ * 8, bh_ * 8, bw_ * bh_
        style = seed % 4
        c = np.zeros((n, 64), np.int64)
        if style == 0:
            c = rng.integers(-30, 31, (n, 64))
        elif style == 2:
            for b in range(n):
                for k in rng.integers(40, 64, 3):
                    c[b, _Z[k]] = int(rng.integers(-5, 6))
        elif style == 3:
            c = rng.integers(-1, 2, (n, 64))
        c[:, 0] = rng.integers(-100, 101, n)
        c = c.reshape(n, 8, 8)
        ri = int(rng.integers(0, 4))
        got = decode_jpeg(encode_jpeg_progressive(c, w, h,
                                                  restart_interval=ri))
        assert (got == coeffs_to_pixels(c, w, h)).all(), (seed, style, ri)


def test_progressive_against_pil_if_present():
    PIL = pytest.importorskip("PIL.Image")
    import io

    from rotel_ray.stages.jpeg import (coeffs_to_rgb_420,
                                       encode_jpeg_progressive,
                                       encode_jpeg_progressive_420)

    rng = np.random.default_rng(21)
    c = _rand_coeffs(rng, 3, 3)
    img = PIL.open(io.BytesIO(encode_jpeg_progressive(c, 24, 24)))
    got = np.asarray(img.convert("L")).astype(int)
    ref = coeffs_to_pixels(c, 24, 24).astype(int)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() <= 1

    cy, cb, cr = (_rand_coeffs(rng, 4, 4), _rand_coeffs(rng, 2, 2),
                  _rand_coeffs(rng, 2, 2))
    img = PIL.open(io.BytesIO(encode_jpeg_progressive_420(cy, cb, cr, 32, 32)))
    got = np.asarray(img.convert("RGB")).astype(int)
    ref = coeffs_to_rgb_420(cy, cb, cr, 32, 32).astype(int)
    assert got.shape == ref.shape
    assert np.abs(got - ref).mean() < 8


def test_progressive_malformed_rejected():
    from rotel_ray.stages.jpeg import encode_jpeg_progressive

    c = np.zeros((1, 8, 8), np.int64)
    c[0, 0, 1] = 5
    good = encode_jpeg_progressive(c, 8, 8)
    # truncating mid-scan raises, not garbage
    with pytest.raises(ValueError):
        decode_jpeg(good[:len(good) - 6] + b"\xff\xd9")
    # SOF3 (lossless) stays rejected with a clear message
    bad = bytearray(good)
    sof = bad.find(b"\xff\xc2")
    bad[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF0.*SOF2|progressive"):
        decode_jpeg(bytes(bad))
