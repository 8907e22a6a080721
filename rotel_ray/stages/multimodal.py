"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns with typed metadata, and
every transform is a ``map_batches`` stage sized for large payloads (small
``batch_size``, bounded per-task heap). The stdlib codecs are STATELESS,
so the default compute mode is plain tasks (fuses with the read); the
actor-pool mode remains one flag away for deployments whose decode loads
real codec state in ``__init__`` (see ``media_pipeline``).

Codec boundary (round 3): images and audio now use REAL container formats
decoded with stdlib-only codecs implemented in this module —

- **PNG** (8-bit grayscale, non-interlaced): full chunk parse, zlib inflate,
  and all five scanline filters (None/Sub/Up/Average/Paeth) un-applied; the
  sibling encoder cycles filter types per row so decode genuinely exercises
  the whole filter set (spec: RFC 2083 §6).
- **WAV** (RIFF PCM mono u8): chunk walk honouring the RIFF even-byte pad.
- **video** stays the declared synthetic ``FVID`` container (no video codec
  is expressible in the stdlib; the decode boundary for video is a header
  parse + ``np.frombuffer``, everything after it is real array math).

``MediaDecoder`` sniffs the payload magic, so one decode stage serves mixed
corpora. The fixture generator stores ``body_hex`` — the raw pre-encode
bytes — as a metadata column; the DuckDB oracles replay their position math
over ``body_hex`` while the engine must reproduce those bytes by actually
inflating the PNG/WAV payload, making the codec itself oracle-verified.
A PIL/opencv/torchaudio deployment swaps only the ``decode_png``/
``decode_wav`` calls; batch sizing, actor signature and output layout are
deployment-identical.
"""

from __future__ import annotations

import os
import shutil
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MAGIC = {"image": b"FIMG", "audio": b"FAUD", "video": b"FVID"}
KINDS = ["image", "audio", "video"]
HEADER = struct.Struct("<4sHHH")
SEED = 20_260_817

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_RATE = 16_000


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal REAL PNG encoder: 8-bit grayscale, one IDAT, stdlib zlib.
    Scanline filters cycle 0..4 by row so a decoder must implement the full
    filter set (all arithmetic mod 256 per the spec)."""
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w, np.int16)
    for y in range(h):
        row = arr[y].astype(np.int16)
        left = np.r_[np.int16(0), row[:-1]]
        ft = y % 5
        if ft == 0:
            f = row
        elif ft == 1:
            f = row - left
        elif ft == 2:
            f = row - prev
        elif ft == 3:
            f = row - (left + prev) // 2
        else:
            ul = np.r_[np.int16(0), prev[:-1]]
            p = left + prev - ul
            pa_, pb_, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                            np.where(pb_ <= pc_, prev, ul))
            f = row - pred
        raw.append(ft)
        raw.extend((f & 0xFF).astype(np.uint8).tobytes())
        prev = row
    return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (8-bit grayscale, non-interlaced): chunk walk,
    zlib inflate, un-filter. Sub uses the cumsum-mod identity (bpp=1);
    Average/Paeth carry a left dependency and run per pixel."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, w, h = 8, [], None, None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", chunk)
            if depth != 8 or ctype != 0 or interlace != 0:
                raise ValueError("only 8-bit grayscale non-interlaced PNG supported")
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w + 1
    if len(raw) != h * stride:
        raise ValueError("PNG scanline data size mismatch")
    out = np.empty((h, w), np.uint8)
    prev = np.zeros(w, np.int32)
    for y in range(h):
        ft = raw[y * stride]
        line = np.frombuffer(raw, np.uint8, w, y * stride + 1).astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 1:
            rec = np.cumsum(line) & 0xFF  # mod at the end == mod each step
        elif ft == 2:
            rec = (line + prev) & 0xFF
        elif ft == 3:
            # left-dependency is inherently sequential; plain-list scalar
            # ops are ~3x numpy scalar indexing in this loop
            lf, pv, rl = line.tolist(), prev.tolist(), [0] * w
            a = 0
            for x in range(w):
                a = (lf[x] + ((a + pv[x]) >> 1)) & 0xFF
                rl[x] = a
            rec = np.asarray(rl, np.int32)
        elif ft == 4:
            lf, pv, rl = line.tolist(), prev.tolist(), [0] * w
            a = c = 0
            for x in range(w):
                b = pv[x]
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                a = (lf[x] + pred) & 0xFF
                rl[x] = a
                c = b
            rec = np.asarray(rl, np.int32)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """Minimal REAL WAV encoder: RIFF/WAVE, PCM mono 8-bit."""
    data = samples.astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-stdlib WAV decode (RIFF chunk walk, PCM mono u8, even-byte pad
    honoured). Returns (samples, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        typ = data[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        chunk = data[pos + 8:pos + 8 + ln]
        if typ == b"fmt ":
            afmt, nch, rate, _, _, bits = struct.unpack_from("<HHIIHH", chunk)
            if afmt != 1 or nch != 1 or bits != 8:
                raise ValueError("only PCM mono u8 WAV supported")
        elif typ == b"data":
            samples = np.frombuffer(chunk, np.uint8)
        pos += 8 + ln + (ln & 1)  # RIFF chunks pad to even length
    if rate is None or samples is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    return samples, rate

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("codec", pa.string()),  # png | wav | fvid
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("nframes", pa.int32()),
        # generator-side metadata: deterministic functions of the raw
        # PRE-ENCODE bytes, written at generation time. body_hex lets the
        # DuckDB oracles replay byte-position math while the engine must
        # reproduce the same bytes by actually decoding the container —
        # so the codec path itself is oracle-checked.
        ("mean_byte", pa.float64()),
        ("body_hex", pa.string()),
    ]
)

CODEC_OF = {"image": "png", "audio": "wav", "video": "fvid"}


def make_payload(media_id: int, kind: str, rng: np.random.Generator) -> tuple[bytes, bytes, int, int, int]:
    """Returns (encoded payload, raw body bytes, width, height, nframes)."""
    if kind == "image":
        w, h, f = int(rng.integers(16, 65)), int(rng.integers(16, 65)), 1
    elif kind == "audio":
        w, h, f = int(rng.integers(256, 1025)), 1, 1  # w = samples
    else:
        w, h, f = int(rng.integers(8, 33)), int(rng.integers(8, 33)), int(rng.integers(2, 17))
    body = rng.integers(0, 256, w * h * f, dtype=np.uint8)
    if kind == "image":
        payload = encode_png(body.reshape(h, w))
    elif kind == "audio":
        payload = encode_wav(body)
    else:
        payload = HEADER.pack(MAGIC[kind], w, h, f) + body.tobytes()
    return payload, body.tobytes(), w, h, f


def generate_media(n: int, shard: int = 0) -> pa.Table:
    rng = np.random.default_rng(SEED + shard)
    kinds = [KINDS[i % 3] for i in range(n)]
    rows = [make_payload(i, k, rng) for i, k in enumerate(kinds)]
    means = [float(np.frombuffer(r[1], dtype=np.uint8).mean()) for r in rows]
    return pa.table(
        {
            "media_id": pa.array([shard * 10_000_000 + i for i in range(n)], pa.int64()),
            "kind": pa.array(kinds),
            "codec": pa.array([CODEC_OF[k] for k in kinds]),
            "payload": pa.array([r[0] for r in rows], pa.binary()),
            "width": pa.array([r[2] for r in rows], pa.int32()),
            "height": pa.array([r[3] for r in rows], pa.int32()),
            "nframes": pa.array([r[4] for r in rows], pa.int32()),
            "mean_byte": pa.array(means, pa.float64()),
            "body_hex": pa.array([r[1].hex().upper() for r in rows], pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )


def ensure_media(sf: float, root: str = "/tmp/rotel_ray_data") -> str:
    """Deterministic media parquet (one shard per 1k items, atomic rename)."""
    out = os.path.join(root, f"media_v3_sf{sf:g}")  # v3: real PNG/WAV payloads
    if os.path.isdir(out) and os.listdir(out):
        return out
    n = max(300, int(sf * 30_000))
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    per = 1000
    for s in range((n + per - 1) // per):
        tbl = generate_media(min(per, n - s * per), shard=s)
        pq.write_table(tbl, os.path.join(tmp, f"part-{s:04d}.parquet"))
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


class MediaDecoder:
    """Actor-pool decode stage with container sniffing: real stdlib PNG and
    WAV codecs for images/audio, header parse + body view for the synthetic
    FVID video container (no stdlib video codec exists — the one remaining
    declared boundary). A production deployment swaps the two decode calls
    for PIL/torchaudio/pyav; the actor/batch plumbing is identical."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def _decode_body(self, payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
        if payload[:8] == PNG_MAGIC:
            px = decode_png(payload)
            return "image", px.shape[1], px.shape[0], 1, px.reshape(-1)
        if payload[:4] == b"RIFF":
            samples, _rate = decode_wav(payload)
            return "audio", samples.size, 1, 1, samples
        magic, w, h, f = HEADER.unpack_from(payload)
        kind = {v: k for k, v in MAGIC.items()}[magic]
        body = np.frombuffer(payload, dtype=np.uint8, offset=HEADER.size)
        if self.strict and body.size != w * h * f:
            raise ValueError(f"payload size mismatch: {body.size} != {w}*{h}*{f}")
        return kind, w, h, f, body

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        decoded = [self._decode_body(p) for p in payloads]
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "kind": pa.array([d[0] for d in decoded]),
                "width": pa.array([d[1] for d in decoded], pa.int32()),
                "height": pa.array([d[2] for d in decoded], pa.int32()),
                "nframes": pa.array([d[3] for d in decoded], pa.int32()),
                "n_bytes": pa.array([d[4].size for d in decoded], pa.int64()),
                "body": pa.array([d[4].tobytes() for d in decoded], pa.binary()),
            }
        )


class MediaFeatures:
    """Feature extraction over decoded bodies: 16-bin byte histogram (L1-
    normalized) + mean byte value, emitted as a fixed-size-list column —
    the layout an embedding model would produce."""

    BINS = 16

    def __call__(self, t: pa.Table) -> pa.Table:
        bodies = t.column("body").to_pylist()
        feats = np.zeros((len(bodies), self.BINS), dtype=np.float32)
        means = np.zeros(len(bodies), dtype=np.float64)
        for i, b in enumerate(bodies):
            arr = np.frombuffer(b, dtype=np.uint8)
            if arr.size:
                hist = np.bincount(arr >> 4, minlength=self.BINS).astype(np.float32)
                feats[i] = hist / arr.size
                means[i] = arr.mean()
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "kind": t.column("kind"),
                "mean_byte": pa.array(means),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.BINS
                ),
            }
        )


def frame_sample_batch(t: pa.Table, every: int = 4) -> pa.Table:
    """Video frame sampling: each video row fans out to one row per sampled
    frame (every k-th). Non-video rows pass through as frame 0."""
    out_id, out_frame, out_bytes = [], [], []
    kinds = t.column("kind").to_pylist()
    ids = t.column("media_id").to_pylist()
    bodies = t.column("body").to_pylist()
    frames = t.column("nframes").to_pylist()
    widths = t.column("width").to_pylist()
    heights = t.column("height").to_pylist()
    for mid, kind, body, nf, w, h in zip(ids, kinds, bodies, frames, widths, heights):
        if kind != "video" or nf <= 1:
            out_id.append(mid)
            out_frame.append(0)
            out_bytes.append(body)
            continue
        fsize = w * h
        for fi in range(0, nf, every):
            out_id.append(mid)
            out_frame.append(fi)
            out_bytes.append(body[fi * fsize : (fi + 1) * fsize])
    return pa.table(
        {
            "media_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "frame": pa.array(out_bytes, pa.binary()),
        }
    )


def resize_images(t: pa.Table, size: tuple[int, int] = (32, 32)) -> pa.Table:
    """Nearest-neighbor image resize over decoded bodies — a REAL resize
    kernel in pure numpy (the codec boundary of this module ends at decode;
    resize itself is array indexing, so nothing here is stubbed). Index map
    is the classic floor grid ``src = (dst * src_dim) // dst_dim``; a
    PIL/opencv deployment swaps only the interpolation call.

    Non-image rows are dropped. Emits the resized payload plus exact-integer
    stats (pixel sum, corner pixels) that the DuckDB oracle reproduces
    byte-for-byte from the ORIGINAL payload blob via the same index map —
    so the resize arithmetic, not just the plumbing, is oracle-checked.
    Per-row iteration over binary blobs is inherent to codec-shaped work
    (same as the decode/frame stages above)."""
    out_w, out_h = size
    ids, blobs, sums, firsts, lasts = [], [], [], [], []
    si_cache: dict[tuple[int, int], np.ndarray] = {}
    for mid, kind, body, w, h in zip(
            t.column("media_id").to_pylist(), t.column("kind").to_pylist(),
            t.column("body").to_pylist(), t.column("width").to_pylist(),
            t.column("height").to_pylist()):
        if kind != "image":
            continue
        arr = np.frombuffer(body, np.uint8).reshape(h, w)
        si = si_cache.setdefault((h, out_h), (np.arange(out_h) * h) // out_h)
        sj = si_cache.setdefault((w, out_w), (np.arange(out_w) * w) // out_w)
        r = arr[si][:, sj]
        ids.append(mid)
        blobs.append(r.tobytes())
        sums.append(int(r.sum()))
        firsts.append(int(r[0, 0]))
        lasts.append(int(r[-1, -1]))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "resized": pa.array(blobs, pa.binary()),
        "n_px": pa.array([out_w * out_h] * len(ids), pa.int64()),
        "px_sum": pa.array(sums, pa.int64()),
        "first_px": pa.array(firsts, pa.int64()),
        "last_px": pa.array(lasts, pa.int64()),
    })


def resample_audio(t: pa.Table, out_samples: int = 512) -> pa.Table:
    """Nearest-neighbor audio resample over decoded bodies — the 1-D
    analogue of :func:`resize_images` (same floor index map
    ``src = (dst * n) // out``), pure numpy. Non-audio rows drop. Emits the
    resampled payload plus exact-integer stats for the byte-level oracle."""
    ids, blobs, sums, firsts, lasts = [], [], [], [], []
    for mid, kind, body, w in zip(
            t.column("media_id").to_pylist(), t.column("kind").to_pylist(),
            t.column("body").to_pylist(), t.column("width").to_pylist()):
        if kind != "audio":
            continue
        arr = np.frombuffer(body, np.uint8)  # audio: width = sample count
        si = (np.arange(out_samples) * w) // out_samples
        r = arr[si]
        ids.append(mid)
        blobs.append(r.tobytes())
        sums.append(int(r.sum(dtype=np.int64)))
        firsts.append(int(r[0]))
        lasts.append(int(r[-1]))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "resampled": pa.array(blobs, pa.binary()),
        "n_samples": pa.array([out_samples] * len(ids), pa.int64()),
        "sample_sum": pa.array(sums, pa.int64()),
        "first_sample": pa.array(firsts, pa.int64()),
        "last_sample": pa.array(lasts, pa.int64()),
    })


def motion_energy(t: pa.Table) -> pa.Table:
    """Frame-differencing motion energy per video — the scene-cut /
    shot-boundary primitive: for each consecutive frame pair the sum of
    absolute pixel differences, reduced to per-video total and peak (the
    peak pair is where a cut detector would split). Pure numpy over decoded
    bodies; non-video rows (and single-frame videos) drop."""
    ids, totals, peaks, peak_idx = [], [], [], []
    for mid, kind, body, w, h, nf in zip(
            t.column("media_id").to_pylist(), t.column("kind").to_pylist(),
            t.column("body").to_pylist(), t.column("width").to_pylist(),
            t.column("height").to_pylist(), t.column("nframes").to_pylist()):
        if kind != "video" or nf <= 1:
            continue
        arr = np.frombuffer(body, np.uint8).reshape(nf, h * w).astype(np.int64)
        d = np.abs(arr[1:] - arr[:-1]).sum(axis=1)
        ids.append(mid)
        totals.append(int(d.sum()))
        peaks.append(int(d.max()))
        peak_idx.append(int(d.argmax()))  # first max -> lowest pair index
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "motion_total": pa.array(totals, pa.int64()),
        "motion_peak": pa.array(peaks, pa.int64()),
        "peak_pair": pa.array(peak_idx, pa.int64()),
    })


def media_pipeline(media_dir: str, *, decode_concurrency=(1, 4), feature_concurrency=(1, 4),
                   batch_size: int = 256, compute: str = "tasks"):
    """read -> decode -> features over binary payload columns (small
    batches: payloads are large). Returns the lazy features Dataset.

    ``compute="tasks"`` (default): the stdlib codecs are STATELESS, so
    callable INSTANCES run as plain tasks that fuse with the read — no
    actor-pool startup, no object-store hop (see the enrich-stage fusion
    note in BASELINE.md). ``compute="actors"`` keeps the actor-pool shape
    for deployments whose decode loads real codec state (a model, a JIT'd
    library) in ``__init__``; max_restarts=0 there because Ray Data ships
    the fused ctor bundle by object-store ref (ray#53727)."""
    from ..io import read_parquet

    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    if compute == "tasks":
        ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow",
                            batch_size=batch_size, zero_copy_batch=True)
        return ds.map_batches(MediaFeatures(), batch_format="pyarrow",
                              batch_size=batch_size, zero_copy_batch=True)
    ds = ds.map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=decode_concurrency, zero_copy_batch=True, max_restarts=0,
    )
    return ds.map_batches(
        MediaFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=feature_concurrency, zero_copy_batch=True, max_restarts=0,
    )


def frame_sample_pipeline(media_dir: str, *, every: int = 4, concurrency=(1, 4),
                          batch_size: int = 256):
    from ..io import read_parquet

    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(
        MediaDecoder(), batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    return ds.map_batches(
        lambda t: frame_sample_batch(t, every), batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True,
    )
