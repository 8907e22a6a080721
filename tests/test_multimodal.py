"""Multimodal plumbing tests: container format, decode, features, frame
sampling, resize stub."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rotel_ray.stages.multimodal import (
    HEADER,
    MediaDecoder,
    MediaFeatures,
    frame_sample_batch,
    generate_media,
    media_pipeline,
    resize_images,
)


def test_generate_media_deterministic():
    a, b = generate_media(30), generate_media(30)
    assert a.equals(b)
    assert set(a.column("kind").to_pylist()) == {"image", "audio", "video"}


def test_decoder_roundtrip():
    t = generate_media(30)
    out = MediaDecoder()(t)
    assert out.column("media_id").to_pylist() == t.column("media_id").to_pylist()
    for w, h, f, ch, nb in zip(out.column("width").to_pylist(), out.column("height").to_pylist(),
                               out.column("nframes").to_pylist(),
                               out.column("channels").to_pylist(),
                               out.column("n_bytes").to_pylist()):
        assert nb == w * h * f * ch
    # header fields round-trip against the generator's metadata columns
    assert out.column("width").to_pylist() == t.column("width").to_pylist()
    assert out.column("kind").to_pylist() == t.column("kind").to_pylist()
    assert out.column("channels").to_pylist() == t.column("channels").to_pylist()


def test_decoder_body_matches_generator_bytes_all_variants():
    """The decoded byte stream must equal the generator's pre-encode bytes
    for EVERY image variant (gray8 / RGB / RGBA / palette-expanded / 16-bit
    big-endian) plus audio and video — the in-repo mirror of the hex-replay
    oracles."""
    t = generate_media(45)  # 15 images -> all 5 variants x3
    out = MediaDecoder()(t)
    assert sorted(set(t.column("channels").to_pylist())) == [1, 2, 3, 4]
    for i in range(t.num_rows):
        assert out.column("body")[i].as_py() == bytes.fromhex(
            t.column("body_hex")[i].as_py()), i


def test_decoder_strict_rejects_corrupt():
    # truncation breaks each container differently: PNG loses IHDR/IDAT,
    # WAV loses fmt/data, FVID fails the strict body-size check
    t = generate_media(3)
    for i, msg in [(0, "truncated PNG"), (1, "truncated WAV"),
                   (2, "size mismatch")]:
        bad = t.slice(i, 1).set_column(
            t.column_names.index("payload"), "payload",
            pa.array([t.column("payload")[i].as_py()[: HEADER.size + 3]],
                     pa.binary()),
        )
        with pytest.raises(ValueError, match=msg):
            MediaDecoder(strict=True)(bad)


def test_png_codec_roundtrip_all_filters():
    """The encoder cycles filter types by row; ≥5-row images exercise all
    five PNG filters (None/Sub/Up/Average/Paeth) through the decoder."""
    import numpy as np

    from rotel_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(2)
    for h, w in [(1, 1), (5, 3), (8, 8), (64, 64), (7, 200), (200, 7)]:
        a = rng.integers(0, 256, (h, w), dtype=np.uint8)
        data = encode_png(a)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert (decode_png(data) == a).all(), (h, w)
    # gradient rows make Sub/Paeth filters produce long zero runs
    g = (np.arange(16)[:, None] + np.arange(32)[None, :]).astype(np.uint8)
    assert (decode_png(encode_png(g)) == g).all()


def test_png_codec_roundtrip_color_types():
    """RGB / RGBA / palette / 16-bit roundtrips, including >= 5-row images
    so every scanline filter runs at each color type's bpp offset."""
    import numpy as np

    from rotel_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for ct, c in [(2, 3), (6, 4)]:
        for h, w in [(1, 1), (6, 5), (40, 33)]:
            a = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
            assert (decode_png(encode_png(a, ctype=ct)) == a).all(), (ct, h, w)
    # palette: decode expands indices through PLTE to RGB
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 11), dtype=np.uint8)
    assert (decode_png(encode_png(idx, ctype=3, palette=pal)) == pal[idx]).all()
    # 16-bit: big-endian samples on the wire, dtype >u2 back
    for ct, c in [(0, 1), (2, 3), (6, 4)]:
        shape = (7, 6) if c == 1 else (7, 6, c)
        a = rng.integers(0, 65_536, shape, dtype=np.uint16)
        d = decode_png(encode_png(a, ctype=ct, depth=16))
        assert d.dtype == np.dtype(">u2") and (d == a).all(), ct
        assert d.tobytes() == a.astype(">u2").tobytes()


def test_png_decoder_rejects_unsupported():
    import struct
    import zlib

    import numpy as np

    from rotel_ray.stages.multimodal import _png_chunk, decode_png

    magic = b"\x89PNG\r\n\x1a\n"
    # sub-byte depth
    ihdr = struct.pack(">IIBBBBB", 2, 1, 4, 0, 0, 0, 0)
    bad = magic + _png_chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)
    # unknown interlace method (0=none and 1=Adam7 are the only ones)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 2)
    bad = magic + _png_chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="interlace method"):
        decode_png(bad)
    # wrong scanline byte count
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00" * 3)
    bad = magic + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat)
    with pytest.raises(ValueError, match="scanline"):
        decode_png(bad)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF0000")


def test_png_adam7_roundtrip_all_types():
    """Adam7 interlaced roundtrips byte-exactly across every supported
    color type/depth, including dims where several passes are empty (1x1:
    only pass 1; 3x2, 5x5: partial pass grid) and dims not multiples of 8."""
    import numpy as np

    from rotel_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(21)
    for h, w in [(1, 1), (2, 3), (5, 5), (8, 8), (13, 37), (64, 64), (7, 200)]:
        a = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert (decode_png(encode_png(a, interlace=1)) == a).all(), (h, w)
    for ct, c in [(2, 3), (6, 4)]:
        for h, w in [(1, 1), (6, 5), (23, 17)]:
            a = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
            assert (decode_png(encode_png(a, ctype=ct, interlace=1)) == a).all()
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 11), dtype=np.uint8)
    got = decode_png(encode_png(idx, ctype=3, palette=pal, interlace=1))
    assert (got == pal[idx]).all()
    for ct, c in [(0, 1), (2, 3), (6, 4)]:
        shape = (7, 6) if c == 1 else (7, 6, c)
        a = rng.integers(0, 65_536, shape, dtype=np.uint16)
        d = decode_png(encode_png(a, ctype=ct, depth=16, interlace=1))
        assert d.dtype == np.dtype(">u2") and (d == a).all(), ct
    # interlaced and sequential encodings of the same pixels decode equal
    a = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    assert (decode_png(encode_png(a, ctype=2, interlace=1))
            == decode_png(encode_png(a, ctype=2))).all()


def test_png_adam7_against_pil_if_present():
    PIL = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    from rotel_ray.stages.multimodal import encode_png

    rng = np.random.default_rng(22)
    for ct, shape in [(0, (13, 11)), (2, (13, 11, 3)), (6, (13, 11, 4))]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        img = PIL.open(io.BytesIO(encode_png(a, ctype=ct, interlace=1)))
        assert (np.asarray(img).reshape(shape) == a).all(), ct


def test_png_against_pil_if_present():
    """Cross-check the stdlib codec against PIL when available (the
    production decode seam) — skip-gated: PIL is not in this container."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    from rotel_ray.stages.multimodal import encode_png

    rng = np.random.default_rng(12)
    for ct, shape in [(0, (9, 7)), (2, (9, 7, 3)), (6, (9, 7, 4))]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        img = PIL.open(io.BytesIO(encode_png(a, ctype=ct)))
        assert (np.asarray(img).reshape(shape) == a).all(), ct
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (5, 8), dtype=np.uint8)
    img = PIL.open(io.BytesIO(encode_png(idx, ctype=3, palette=pal))).convert("RGB")
    assert (np.asarray(img) == pal[idx]).all()


def test_wav_codec_roundtrip_and_padding():
    import numpy as np

    from rotel_ray.stages.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(4)
    for n in (1, 2, 255, 256, 1001):  # odd n exercises the RIFF pad byte
        s = rng.integers(0, 256, n, dtype=np.uint8)
        data = encode_wav(s, rate=8000)
        got, rate = decode_wav(data)
        assert rate == 8000 and (got == s).all(), n
        # RIFF size field covers everything after the 8-byte header
        import struct
        assert struct.unpack_from("<I", data, 4)[0] == len(data) - 8
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"RIFX" + b"\x00" * 20)


def test_features_normalized_histogram():
    t = MediaDecoder()(generate_media(20))
    out = MediaFeatures()(t)
    feats = (
        out.column("features").combine_chunks().flatten().to_numpy(zero_copy_only=False).reshape(-1, 16)
    )
    np.testing.assert_allclose(feats.sum(axis=1), 1.0, rtol=1e-5)
    means = out.column("mean_byte").to_numpy()
    assert ((means > 64) & (means < 192)).all()  # uniform bytes -> mean ≈ 127.5


def test_frame_sampling_counts():
    t = MediaDecoder()(generate_media(60))
    out = frame_sample_batch(t, every=4)
    counts = {}
    for mid in out.column("media_id").to_pylist():
        counts[mid] = counts.get(mid, 0) + 1
    for mid, kind, nf in zip(t.column("media_id").to_pylist(), t.column("kind").to_pylist(),
                             t.column("nframes").to_pylist()):
        expected = math.ceil(nf / 4) if kind == "video" and nf > 1 else 1
        assert counts[mid] == expected
    # sampled frame payloads are exactly one frame long
    row = out.slice(0, 1).to_pylist()[0]
    assert isinstance(row["frame"], bytes)


def test_media_pipeline_end_to_end(tmp_path):
    import pyarrow.parquet as pq

    pq.write_table(generate_media(50), tmp_path / "m.parquet")
    out = media_pipeline(str(tmp_path)).to_pandas()
    assert len(out) == 50
    assert set(out.columns) == {"media_id", "kind", "mean_byte", "features"}


def test_resize_drops_non_images():
    # generate_media emits raw payloads (no decoded body); resize consumes
    # DECODED rows — build one directly
    import numpy as np
    import pyarrow as pa

    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["audio", "video"]),
        "body": pa.array([b"\x00" * 8, b"\x00" * 8], pa.binary()),
        "width": pa.array([8, 2], pa.int32()),
        "height": pa.array([1, 2], pa.int32()),
    })
    assert resize_images(t).num_rows == 0


def test_resize_images_nearest_neighbor_exact():
    import struct

    import numpy as np
    import pyarrow as pa

    from rotel_ray.stages.multimodal import resize_images

    rng = np.random.default_rng(3)
    rows = []
    for mid, (w, h) in enumerate([(16, 64), (64, 16), (32, 32), (100, 7), (1, 1)]):
        body = rng.integers(0, 256, w * h, dtype=np.uint8)
        rows.append((mid, "image", body.tobytes(), w, h))
    rows.append((99, "audio", b"\x01\x02\x03", 3, 1))  # dropped
    t = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows]),
        "body": pa.array([r[2] for r in rows], pa.binary()),
        "width": pa.array([r[3] for r in rows], pa.int32()),
        "height": pa.array([r[4] for r in rows], pa.int32()),
    })
    out = resize_images(t, size=(32, 32))
    assert out.num_rows == 5  # audio row dropped
    for i in range(5):
        mid, _, body, w, h = rows[i]
        arr = np.frombuffer(body, np.uint8).reshape(h, w)
        ref = np.empty((32, 32), np.uint8)
        for oi in range(32):
            for oj in range(32):
                ref[oi, oj] = arr[(oi * h) // 32, (oj * w) // 32]
        got = np.frombuffer(out.column("resized")[i].as_py(), np.uint8).reshape(32, 32)
        assert (got == ref).all()
        assert out.column("px_sum")[i].as_py() == int(ref.sum())
        assert out.column("first_px")[i].as_py() == int(ref[0, 0])
        assert out.column("last_px")[i].as_py() == int(ref[-1, -1])


def test_resize_images_multichannel_exact():
    """RGB/RGBA/16-bit bodies resize whole pixels (all channel bytes move
    together through the floor index map)."""
    import numpy as np
    import pyarrow as pa

    from rotel_ray.stages.multimodal import resize_images

    rng = np.random.default_rng(13)
    rows = []
    for mid, (w, h, ch) in enumerate([(16, 40, 3), (50, 9, 4), (20, 20, 2)]):
        body = rng.integers(0, 256, w * h * ch, dtype=np.uint8)
        rows.append((mid, body.tobytes(), w, h, ch))
    t = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array(["image"] * 3),
        "body": pa.array([r[1] for r in rows], pa.binary()),
        "width": pa.array([r[2] for r in rows], pa.int32()),
        "height": pa.array([r[3] for r in rows], pa.int32()),
        "channels": pa.array([r[4] for r in rows], pa.int32()),
    })
    out = resize_images(t, size=(32, 32))
    for i, (_, body, w, h, ch) in enumerate(rows):
        arr = np.frombuffer(body, np.uint8).reshape(h, w, ch)
        si = (np.arange(32) * h) // 32
        sj = (np.arange(32) * w) // 32
        ref = arr[si][:, sj]
        got = np.frombuffer(out.column("resized")[i].as_py(), np.uint8)
        assert (got == ref.reshape(-1)).all()
        assert out.column("n_px")[i].as_py() == 32 * 32 * ch
        assert out.column("px_sum")[i].as_py() == int(ref.sum(dtype=np.int64))
        assert out.column("first_px")[i].as_py() == int(ref[0, 0, 0])
        assert out.column("last_px")[i].as_py() == int(ref[-1, -1, -1])


def test_resample_audio_nearest_neighbor_exact():
    import numpy as np
    import pyarrow as pa

    from rotel_ray.stages.multimodal import resample_audio

    rng = np.random.default_rng(5)
    rows = []
    for mid, n in enumerate([256, 1024, 512, 3, 1]):
        body = rng.integers(0, 256, n, dtype=np.uint8)
        rows.append((mid, "audio", body.tobytes(), n))
    rows.append((99, "image", b"\x00" * 4, 2))  # dropped
    t = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows]),
        "body": pa.array([r[2] for r in rows], pa.binary()),
        "width": pa.array([r[3] for r in rows], pa.int32()),
    })
    out = resample_audio(t, out_samples=512)
    assert out.num_rows == 5
    for i in range(5):
        _, _, body, n = rows[i]
        arr = np.frombuffer(body, np.uint8)
        ref = arr[[(k * n) // 512 for k in range(512)]]
        got = np.frombuffer(out.column("resampled")[i].as_py(), np.uint8)
        assert (got == ref).all()
        assert out.column("sample_sum")[i].as_py() == int(ref.sum(dtype=np.int64))


def test_motion_energy_vs_bruteforce():
    from rotel_ray.stages.multimodal import motion_energy

    rng = np.random.default_rng(7)
    rows = []
    for mid, (w, h, nf) in enumerate([(4, 4, 5), (8, 2, 2), (3, 3, 10)]):
        body = rng.integers(0, 256, w * h * nf, dtype=np.uint8)
        rows.append((mid, "video", body.tobytes(), w, h, nf))
    rows.append((90, "video", b"\x00" * 6, 3, 2, 1))   # single frame -> drop
    rows.append((91, "image", b"\x00" * 6, 3, 2, 1))   # non-video -> drop
    t = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows]),
        "body": pa.array([r[2] for r in rows], pa.binary()),
        "width": pa.array([r[3] for r in rows], pa.int32()),
        "height": pa.array([r[4] for r in rows], pa.int32()),
        "nframes": pa.array([r[5] for r in rows], pa.int32()),
    })
    out = motion_energy(t)
    assert out.num_rows == 3
    for i in range(3):
        _, _, body, w, h, nf = rows[i]
        fr = np.frombuffer(body, np.uint8).reshape(nf, w * h).astype(int)
        diffs = [int(np.abs(fr[p + 1] - fr[p]).sum()) for p in range(nf - 1)]
        assert out.column("motion_total")[i].as_py() == sum(diffs)
        assert out.column("motion_peak")[i].as_py() == max(diffs)
        assert out.column("peak_pair")[i].as_py() == diffs.index(max(diffs))


def test_png_codec_large_image():
    """A 512x512 image (~262 KB body, 512 scanlines across all 5 filters)
    round-trips — the larger-payload regime the small-batch actor sizing is
    designed for."""
    import numpy as np

    from rotel_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(8)
    a = rng.integers(0, 256, (512, 512), dtype=np.uint8)
    data = encode_png(a)
    assert (decode_png(data) == a).all()
    # gradient image: zlib should compress the filtered stream well below raw
    g = (np.add.outer(np.arange(512), np.arange(512)) % 256).astype(np.uint8)
    assert len(encode_png(g)) < g.size // 4


def test_audio_frame_energy_exact_and_tail_drop():
    from rotel_ray.stages.multimodal import audio_frame_energy

    body = bytes(range(100, 240))  # 140 samples -> 2 frames of 64, tail 12 drops
    t = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "kind": pa.array(["audio"]),
        "body": pa.array([body], pa.binary()),
        "width": pa.array([140], pa.int64()),
    })
    got = audio_frame_energy(t).to_pandas()
    arr = np.frombuffer(body, np.uint8)[:128].astype(np.int64) - 128
    exp = (arr * arr).reshape(2, 64).sum(axis=1)
    assert got.frame_idx.tolist() == [0, 1]
    assert got.energy.tolist() == exp.tolist()

    # non-audio rows drop entirely
    t2 = t.set_column(1, "kind", pa.array(["image"]))
    assert audio_frame_energy(t2).num_rows == 0


def test_image_byte_histogram_bins(ray_session):
    """Known body: bytes 0,0,16,255 -> bins 0 (x2), 1, 15; audio rows
    drop."""
    import pyarrow as pa

    from rotel_ray.stages.multimodal import image_byte_histogram

    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "kind": pa.array(["image", "audio"]),
                  "body": pa.array([bytes([0, 0, 16, 255]), b"\x01"],
                                   pa.binary())})
    out = image_byte_histogram(t).to_pandas().set_index(["media_id", "bin"])
    assert out.loc[(1, 0), "n_bytes"] == 2
    assert out.loc[(1, 1), "n_bytes"] == 1
    assert out.loc[(1, 15), "n_bytes"] == 1
    assert len(out) == 3


def test_audio_zero_crossings_frames(ray_session):
    """Alternating 100/156 crosses at every pair (63/frame); constant
    body never crosses; pair 63->64 (cross-frame) is excluded."""
    import pyarrow as pa

    from rotel_ray.stages.multimodal import audio_zero_crossings

    alt = bytes([100, 156] * 64)          # 128 samples, 2 frames
    flat = bytes([128] * 64)              # 1 frame, no crossings
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "kind": pa.array(["audio", "audio"]),
                  "body": pa.array([alt, flat], pa.binary()),
                  "width": pa.array([128, 64], pa.int64())})
    out = (audio_zero_crossings(t).to_pandas()
           .set_index(["media_id", "frame_idx"]))
    assert out.loc[(1, 0), "n_cross"] == 63
    assert out.loc[(1, 1), "n_cross"] == 63
    assert out.loc[(2, 0), "n_cross"] == 0


def test_dhash_neardup_pairs_pigeonhole(ray_session):
    """Pairs at Hamming 0/3 are found even when the differing bits spread
    across 3 different bands (pigeonhole: one band stays equal); a pair
    at Hamming 4 with one bit per band is correctly invisible."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.multimodal import dhash_neardup_pairs

    base_hi, base_lo = 0x12345678, 0x0BCDEF01
    rows = [
        (0, base_hi, base_lo),                       # anchor
        (1, base_hi, base_lo),                       # ham 0
        (2, base_hi ^ 0x00010001, base_lo ^ 0x1),    # ham 3, 3 bands hit
        (3, base_hi ^ 0x00010001, base_lo ^ 0x00010001),  # ham 4, all bands
    ]
    t = pa.table({"media_id": pa.array([r[0] for r in rows], pa.int64()),
                  "dhash_hi": pa.array([r[1] for r in rows], pa.int64()),
                  "dhash_lo": pa.array([r[2] for r in rows], pa.int64())})
    out = dhash_neardup_pairs(rd.from_arrow(t), max_hamming=3,
                              num_buckets=2).to_pandas()
    got = {(a, b): h for a, b, h in
           out[["media_a", "media_b", "hamming"]].values}
    assert got[(0, 1)] == 0 and got[(1, 2)] == 3 and got[(0, 2)] == 3
    # media 3 differs from 0/1 in every band (ham 4): not a candidate
    assert (0, 3) not in got and (1, 3) not in got
    # 2 vs 3: identical hi perturbations cancel, lo XOR = 0x1^0x00010001
    # = one bit -> ham 1, found
    assert got[(2, 3)] == 1
    assert len(got) == 4


def test_audio_clipping_runs(ray_session):
    """Rail samples count; the longest consecutive run is measured, a
    clean clip reports zeros; image rows drop."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.multimodal import audio_clipping

    a = np.array([0, 255, 255, 255, 7, 0, 0, 9], np.uint8)   # runs 4, 2
    b = np.array([1, 2, 3, 4], np.uint8)                     # clean
    t = pa.table({"media_id": pa.array([1, 2, 3], pa.int64()),
                  "kind": pa.array(["audio", "audio", "image"]),
                  "body": pa.array([a.tobytes(), b.tobytes(), b"\x00"],
                                   pa.binary())})
    out = (rd.from_arrow(t)
           .map_batches(audio_clipping, batch_format="pyarrow")
           .to_pandas().set_index("media_id"))
    assert list(out.index) == [1, 2]
    assert out.loc[1, "n_clipped"] == 6 and out.loc[1, "max_clip_run"] == 4
    assert out.loc[1, "n_samples"] == 8
    assert out.loc[2, "n_clipped"] == 0 and out.loc[2, "max_clip_run"] == 0


def test_decode_audit_corruption(ray_session):
    """Truncated payloads of every container type report ok=0; intact
    ones decode; nothing raises."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.multimodal import decode_audit, generate_media

    t = generate_media(9)  # 3 images, 3 audio, 3 video
    pay = t.column("payload").to_pylist()
    ids = t.column("media_id").to_pylist()
    pay = [p[:20] if i % 3 == 0 else p for i, p in zip(ids, pay)]
    t = t.set_column(t.column_names.index("payload"), "payload",
                     pa.array(pay, pa.binary()))
    out = (rd.from_arrow(t.select(["media_id", "codec", "payload"]))
           .map_batches(decode_audit, batch_format="pyarrow")
           .to_pandas().set_index("media_id").sort_index())
    assert len(out) == 9
    for i in range(9):
        assert out.loc[i, "ok"] == (0 if i % 3 == 0 else 1), i
    assert set(out["codec"]) == {"png", "wav", "fvid"}


def test_audio_silence_threshold(ray_session):
    """A flat-128 clip is all-quiet; a loud square wave is not; the
    trailing partial frame drops."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.multimodal import audio_silence

    quiet = np.full(130, 128, np.uint8)            # 2 frames + partial
    loud = np.tile(np.array([0, 255], np.uint8), 64)  # energy 64*127.5^2ish
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "kind": pa.array(["audio", "audio"]),
                  "width": pa.array([130, 128], pa.int32()),
                  "body": pa.array([quiet.tobytes(), loud.tobytes()],
                                   pa.binary())})
    out = (rd.from_arrow(t)
           .map_batches(audio_silence, batch_format="pyarrow")
           .to_pandas().set_index("media_id"))
    assert out.loc[1, "n_frames"] == 2 and out.loc[1, "n_quiet"] == 2
    assert out.loc[1, "quiet_e6"] == 1_000_000
    assert out.loc[2, "n_quiet"] == 0


def test_image_sharpness_flat_vs_checker(ray_session):
    """A flat image has zero Laplacian mass; a checkerboard maximizes
    it; grayscale uses the first byte directly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.multimodal import image_sharpness

    flat = np.full((16, 16, 1), 100, np.uint8)
    checker = (np.indices((16, 16)).sum(axis=0) % 2 * 255).astype(np.uint8)
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "kind": pa.array(["image", "image"]),
                  "width": pa.array([16, 16], pa.int32()),
                  "height": pa.array([16, 16], pa.int32()),
                  "channels": pa.array([1, 1], pa.int32()),
                  "body": pa.array([flat.tobytes(), checker.tobytes()],
                                   pa.binary())})
    out = (rd.from_arrow(t)
           .map_batches(image_sharpness, batch_format="pyarrow")
           .to_pandas().set_index("media_id"))
    assert out.loc[1, "lap_sq_sum"] == 0
    assert out.loc[1, "n_interior"] == 14 * 14
    # checker: every interior cell is 4*c - 4*opposite = ±4*255 -> 1040400
    assert out.loc[2, "lap_sq_sum"] == 14 * 14 * (4 * 255) ** 2


def test_image_colorfulness_moments(ray_session):
    """Hand-checkable opponent moments; grayscale rows drop; alpha is
    ignored by the rg/yb math."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.multimodal import image_colorfulness

    px = np.array([[[200, 50, 10], [10, 10, 10]]], np.uint8)  # 1x2 RGB
    gray = np.full((2, 2, 1), 7, np.uint8)
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "kind": pa.array(["image", "image"]),
                  "width": pa.array([2, 2], pa.int32()),
                  "height": pa.array([1, 2], pa.int32()),
                  "channels": pa.array([3, 1], pa.int32()),
                  "body": pa.array([px.tobytes(), gray.tobytes()],
                                   pa.binary())})
    out = (rd.from_arrow(t)
           .map_batches(image_colorfulness, batch_format="pyarrow")
           .to_pandas())
    assert list(out["media_id"]) == [1]
    r = out.iloc[0]
    # rg = [150, 0], yb = [200+50-20=230, 10+10-20=0]
    assert r["rg_sum"] == 150 and r["rg_sq_sum"] == 150 * 150
    assert r["yb_sum"] == 230 and r["yb_sq_sum"] == 230 * 230
    assert r["n_pixels"] == 2
