"""Baseline JPEG codec (ITU-T T.81), stdlib+numpy only — grayscale,
sequential DCT, Huffman entropy coding with the Annex K tables.

Widens the real-codec boundary beyond PNG/WAV: JPEG is the day-one image
format of any web corpus. The ENTROPY + DEQUANT layer of JPEG is
lossless — a decoder must recover the quantized coefficient blocks
bit-exactly from the Huffman stream (marker walk, byte-stuffing removal,
DC prediction, AC run-length, zigzag) — so that whole layer is
oracle-checkable. The only lossy/float step is the IDCT; encoder and
decoder here share ONE documented float64 kernel (separable DCT-III,
fixed op order), so generated-at-encode pixel bytes reproduce bit-exactly
through a full parse of the actual bitstream (the same ln()/floor
bit-agreement argument the text oracles use).

Fixture protocol mirrors the PNG/WAV one (stages/multimodal.py): the
generator stores ``body_hex`` = the decoded pixel bytes it derived from
the coefficients it encoded; the engine must reproduce those bytes by
REALLY decoding the JPEG payload. A production deployment swaps
``decode_jpeg`` for PIL/libjpeg at the same seam.

Scope: baseline sequential (SOF0) AND progressive (SOF2, Annex G:
spectral selection, successive approximation with DC/AC refinement
passes, EOB runs — the libjpeg default scan script on the encode side),
8-bit, grayscale or YCbCr color with 4:4:4, 4:2:0 (2x2 luma sampling,
2x2 nearest upsample) or 4:2:2 (horizontal-only subsample/upsample)
chroma geometry, restart intervals (DRI + RST0-7: byte-aligned predictor
resets, F.2.1.3.1), dimensions MCU-aligned. 12-bit, arithmetic coding,
hierarchical (SOF3+) and exotic samplings (e.g. 4:4:0) stay behind the
PIL/libjpeg seam, rejected with clear errors.
"""

from __future__ import annotations

import os
import shutil
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# zigzag scan order (T.81 Figure 5): ZIGZAG[i] = (row, col) of the i-th
# coefficient in scan order
_Z = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

# Annex K.1 luminance quantization table. T.81 presents it as the 8x8
# matrix in natural (row-major) order; the DQT segment serializes it in
# zigzag order (handled at encode/decode).
_Q_NATURAL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], np.int64)

# Annex K.3.1 luminance DC Huffman table: BITS (codes per length 1..16)
# and HUFFVAL (symbols in code order)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# Annex K.3.2 luminance AC Huffman table
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# Progressive AC scans need EOBn symbols (run nibble r, size nibble 0 —
# "end-of-band run of 2^r..2^r+extra-1 blocks", G.1.2.2) which the Annex K
# baseline AC table does not define. This repo's progressive encoder uses a
# flat 8-bit canonical table carrying every symbol a progressive AC scan can
# emit: EOB0..EOB14, ZRL, and (run,size) for size 1..10. 176 symbols < 255,
# so the code is a valid incomplete canonical Huffman code (the all-ones
# 8-bit code stays unused, B.2.4.2). Tables travel in DHT, so any decoder
# reads them back; compression optimality is a non-goal for the fixture.
_PROG_AC_VALS = ([r << 4 for r in range(15)] + [0xF0]
                 + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_PROG_AC_BITS = [0] * 7 + [len(_PROG_AC_VALS)] + [0] * 8


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical Huffman (T.81 Annex C)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], vals: list[int]
                        ) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-lookahead Huffman LUT (the classic libjpeg-style fast path):
    LUT[peek16] -> (symbol, code length). One table-lookup per SYMBOL
    instead of a Python loop per BIT — ~6x on the decode hot path. Max
    JPEG code length is 16, so a 64 Ki table always resolves."""
    lut_sym = np.zeros(1 << 16, np.int16)
    lut_len = np.zeros(1 << 16, np.uint8)
    for s, (c, ln) in _build_codes(bits, vals).items():
        lo = c << (16 - ln)
        hi = lo + (1 << (16 - ln))
        lut_sym[lo:hi] = s
        lut_len[lo:hi] = ln
    return lut_sym, lut_len


_DC_ENC = _build_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _build_codes(_AC_BITS, _AC_VALS)
_PROG_AC_ENC = _build_codes(_PROG_AC_BITS, _PROG_AC_VALS)

# the shared float64 IDCT basis (separable DCT-III), fixed op order: both
# encoder (to derive the stored ground-truth pixels) and decoder use
# exactly pixels = clip(round(B.T @ block @ B) + 128, 0, 255)
_BASIS = np.empty((8, 8), np.float64)
for _k in range(8):
    for _n in range(8):
        c = np.sqrt(0.125) if _k == 0 else 0.5
        _BASIS[_k, _n] = c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def idct_block(coef: np.ndarray) -> np.ndarray:
    """The documented shared IDCT kernel: (8,8) dequantized int coefficients
    -> (8,8) uint8 pixels. One matmul per axis, round-half-to-even, +128,
    clip — identical arithmetic wherever it runs."""
    f = _BASIS.T @ coef.astype(np.float64) @ _BASIS
    return np.clip(np.round(f) + 128.0, 0.0, 255.0).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing (F.1.2.3)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def restart(self, m: int) -> None:
        """Byte-align with 1-padding, then emit RSTm RAW (markers are never
        byte-stuffed; B.2.1.2 / F.1.2.3)."""
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits (F.1.2.3)
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a DC diff / AC value (F.1.2.1.1): negatives
    encode as value-1 in `size` low bits."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_block(bw: _BitWriter, blk: np.ndarray, prev_dc: int) -> int:
    """Entropy-encode one quantized 8x8 block (F.1.2); returns its DC for
    the component's predictor chain. Baseline bounds (T.81 F.1.2.1.2/2.2.1):
    DC diff magnitude <= 11 bits, AC magnitude <= 10 bits — the Annex K
    tables define no larger size symbols."""
    zz = blk.reshape(-1)[_Z]
    if np.abs(zz[1:]).max(initial=0) > 1023:
        raise ValueError("baseline JPEG AC coefficient out of range (>10 bits)")
    diff = int(zz[0]) - prev_dc
    if not -2047 <= diff <= 2047:
        raise ValueError("baseline JPEG DC difference out of range (>11 bits)")
    s, raw = _magnitude(diff)
    c, ln = _DC_ENC[s]
    bw.put(c, ln)
    if s:
        bw.put(raw, s)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_ENC[0xF0]  # ZRL
            bw.put(c, ln)
            run -= 16
        s, raw = _magnitude(v)
        c, ln = _AC_ENC[(run << 4) | s]
        bw.put(c, ln)
        bw.put(raw, s)
        run = 0
    if last_nz < 63:
        c, ln = _AC_ENC[0x00]  # EOB
        bw.put(c, ln)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _encode_scan(planes: list[np.ndarray], samps: list[tuple[int, int]],
                 w: int, h: int, restart_interval: int) -> bytes:
    """Entropy-encode the interleaved scan (A.2.3 MCU order) for any
    component/sampling geometry; one DC predictor per component
    (F.1.1.5.1). With a restart interval, every ``restart_interval`` MCUs
    the stream byte-aligns, emits RST(m) (m cycling 0-7) and resets ALL
    DC predictors (F.2.1.3.1) — the hook real encoders use for error
    resilience and parallel entropy decode."""
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    bw = _BitWriter()
    prev = [0] * len(planes)
    m = count = 0
    for my in range(h // (8 * vmax)):
        for mx in range(w // (8 * hmax)):
            if restart_interval and count and count % restart_interval == 0:
                bw.restart(m)
                m = (m + 1) & 7
                prev = [0] * len(planes)
            for c, (hi, vi) in enumerate(samps):
                pbw = (w * hi // hmax) // 8
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * pbw + (mx * hi + bx)
                        prev[c] = _encode_block(bw, planes[c][bi], prev[c])
            count += 1
    return bw.flush()


def _assemble_jpeg(planes: list[np.ndarray], samps: list[tuple[int, int]],
                   w: int, h: int, restart_interval: int = 0) -> bytes:
    """DQT + SOF0 + DHT [+ DRI] + SOS + scan + EOI for any sampling
    geometry. All components share quant table 0 and the DC0/AC0 Huffman
    tables — a declared, standard-compliant choice (tables travel in the
    bitstream; per-component table ids in SOF/SOS say so)."""
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    assert w % (8 * hmax) == 0 and h % (8 * vmax) == 0
    for p, (hi, vi) in zip(planes, samps):
        assert p.shape[0] == (w * hi // hmax // 8) * (h * vi // vmax // 8)
    scan = _encode_scan(planes, samps, w, h, restart_interval)
    dqt = _seg(0xFFDB, bytes([0]) + bytes(int(_Q_NATURAL[_Z[i]]) for i in range(64)))
    comps = b"".join(bytes([ci + 1, (hi << 4) | vi, 0])
                     for ci, (hi, vi) in enumerate(samps))
    sof = _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, len(planes)) + comps)
    dht = (_seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
           + _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)))
    dri = _seg(0xFFDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    sos = _seg(0xFFDA, bytes([len(planes)])
               + b"".join(bytes([ci + 1, 0x00]) for ci in range(len(planes)))
               + bytes([0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + scan + b"\xff\xd9"


def encode_jpeg(coeffs: np.ndarray, w: int, h: int, *,
                restart_interval: int = 0) -> bytes:
    """Encode quantized coefficient blocks into a baseline grayscale JPEG.

    ``coeffs``: (n_blocks, 8, 8) QUANTIZED integer coefficients (natural
    order), blocks raster-ordered over a w x h image (w, h multiples of 8).
    The entropy layer is lossless, so a decoder must recover ``coeffs``
    exactly."""
    return _assemble_jpeg([coeffs], [(1, 1)], w, h, restart_interval)


def encode_jpeg_color(coeffs3: np.ndarray, w: int, h: int, *,
                      restart_interval: int = 0) -> bytes:
    """Baseline COLOR JPEG (YCbCr, 4:4:4 — no subsampling, so every MCU is
    one block per component). ``coeffs3``: (3, n_blocks, 8, 8) quantized
    coefficients for Y, Cb, Cr."""
    assert coeffs3.shape[0] == 3
    return _assemble_jpeg(list(coeffs3), [(1, 1)] * 3, w, h, restart_interval)


def encode_jpeg_420(coeffs_y: np.ndarray, coeffs_cb: np.ndarray,
                    coeffs_cr: np.ndarray, w: int, h: int, *,
                    restart_interval: int = 0) -> bytes:
    """Baseline COLOR JPEG with 4:2:0 chroma subsampling — the dominant
    wild-format: Y at full resolution (sampling 2x2), Cb/Cr at half
    resolution each (1x1). MCU = 4 Y blocks (2x2 raster) + 1 Cb + 1 Cr
    (A.2.3 interleave order); w, h multiples of 16.

    ``coeffs_y``: (w/8 * h/8, 8, 8) raster-ordered over the FULL image;
    ``coeffs_cb``/``coeffs_cr``: (w/16 * h/16, 8, 8) over the half-res
    chroma planes."""
    return _assemble_jpeg([coeffs_y, coeffs_cb, coeffs_cr],
                          [(2, 2), (1, 1), (1, 1)], w, h, restart_interval)


def encode_jpeg_422(coeffs_y: np.ndarray, coeffs_cb: np.ndarray,
                    coeffs_cr: np.ndarray, w: int, h: int, *,
                    restart_interval: int = 0) -> bytes:
    """Baseline COLOR JPEG with 4:2:2 chroma subsampling (the second-most
    common wild sampling): Y at full resolution (sampling 2x1), Cb/Cr
    halved HORIZONTALLY only. MCU = 2 Y blocks side by side + 1 Cb + 1 Cr;
    w multiple of 16, h multiple of 8.

    ``coeffs_cb``/``coeffs_cr``: (w/16 * h/8, 8, 8) over the
    half-width chroma planes."""
    return _assemble_jpeg([coeffs_y, coeffs_cb, coeffs_cr],
                          [(2, 1), (1, 1), (1, 1)], w, h, restart_interval)


# ---------------------------------------------------------------------------
# progressive (SOF2) encoder — T.81 Annex G.1, libjpeg's default scan script
# ---------------------------------------------------------------------------


class _ProgAcState:
    """Per-scan encoder state shared across blocks: the accumulated
    end-of-band run and (refinement only) the correction bits buffered
    until the next emitted symbol (G.1.2.2 / G.1.2.3)."""

    def __init__(self, bw: _BitWriter):
        self.bw = bw
        self.eobrun = 0
        self.be_bits: list[int] = []

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            c, ln = _PROG_AC_ENC[nbits << 4]
            self.bw.put(c, ln)
            if nbits:
                self.bw.put(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        self.flush_bits()

    def flush_bits(self) -> None:
        for b in self.be_bits:
            self.bw.put(b, 1)
        self.be_bits = []

    def bump_eobrun(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.emit_eobrun()


def _enc_dc_scan(zz: list[np.ndarray], samps, scomps: list[int],
                 w: int, h: int, Ah: int, Al: int, ri: int) -> bytes:
    """Progressive DC scan (interleaved MCU order when ns>1). First pass
    (Ah=0) diff-codes dc >> Al (arithmetic shift, G.1.2.1); refinement
    (Ah>0) emits one raw bit per block: (dc >> Al) & 1."""
    hmax = max(samps[c][0] for c in scomps)
    vmax = max(samps[c][1] for c in scomps)
    bw = _BitWriter()
    prev = {c: 0 for c in scomps}
    m = count = 0
    if len(scomps) > 1:
        mcus = []
        for my in range(h // (8 * vmax)):
            for mx in range(w // (8 * hmax)):
                blocks = []
                for c in scomps:
                    hi, vi = samps[c]
                    pbw = (w * hi // hmax) // 8
                    for by in range(vi):
                        for bx in range(hi):
                            blocks.append((c, (my * vi + by) * pbw
                                           + (mx * hi + bx)))
                mcus.append(blocks)
    else:  # non-interleaved: one block per MCU, raster order
        c = scomps[0]
        hi, vi = samps[c]
        nb = (w * hi // hmax // 8) * (h * vi // vmax // 8)
        mcus = [[(c, i)] for i in range(nb)]
    for blocks in mcus:
        if ri and count and count % ri == 0:
            bw.restart(m)
            m = (m + 1) & 7
            prev = {c: 0 for c in scomps}
        for c, bi in blocks:
            dc = int(zz[c][bi, 0])
            if Ah == 0:
                t = dc >> Al
                diff = t - prev[c]
                prev[c] = t
                s, raw = _magnitude(diff)
                code, ln = _DC_ENC[s]
                bw.put(code, ln)
                if s:
                    bw.put(raw, s)
            else:
                bw.put((dc >> Al) & 1, 1)
        count += 1
    return bw.flush()


def _pt_ac(v: int, Al: int) -> int:
    """AC point transform: divide by 2^Al truncating TOWARD ZERO
    (G.1.2.2 — NOT an arithmetic shift for negatives)."""
    return -((-v) >> Al) if v < 0 else v >> Al


def _enc_ac_first(zz: np.ndarray, Ss: int, Se: int, Al: int, ri: int) -> bytes:
    """Progressive AC first scan (Ah=0) for ONE component: run-length over
    the Ss..Se band of point-transformed values, EOBn run accumulation
    across blocks (G.1.2.2)."""
    bw = _BitWriter()
    st = _ProgAcState(bw)
    m = 0
    for bi in range(zz.shape[0]):
        if ri and bi and bi % ri == 0:
            st.emit_eobrun()
            bw.restart(m)
            m = (m + 1) & 7
        band = zz[bi]
        r = 0
        for k in range(Ss, Se + 1):
            t = _pt_ac(int(band[k]), Al)
            if t == 0:
                r += 1
                continue
            st.emit_eobrun()
            while r > 15:
                c, ln = _PROG_AC_ENC[0xF0]
                bw.put(c, ln)
                r -= 16
            s, raw = _magnitude(t)
            c, ln = _PROG_AC_ENC[(r << 4) | s]
            bw.put(c, ln)
            bw.put(raw, s)
            r = 0
        if r > 0:  # trailing zeros (or an all-zero band) fold into the EOB run
            st.bump_eobrun()
    st.emit_eobrun()
    return bw.flush()


def _enc_ac_refine(zz: np.ndarray, Ss: int, Se: int, Al: int, ri: int) -> bytes:
    """Progressive AC refinement scan (Ah = Al+1) for ONE component
    (G.1.2.3, the libjpeg encode_mcu_AC_refine structure): newly-nonzero
    coefficients emit (run,1)+sign; history-nonzero coefficients emit one
    buffered correction bit; trailing zeros fold into the EOB run."""
    bw = _BitWriter()
    st = _ProgAcState(bw)
    m = 0
    for bi in range(zz.shape[0]):
        if ri and bi and bi % ri == 0:
            st.emit_eobrun()
            bw.restart(m)
            m = (m + 1) & 7
        band = zz[bi]
        absv = np.abs(band[Ss:Se + 1].astype(np.int64)) >> Al
        eob_rel = int(np.nonzero(absv == 1)[0][-1]) if np.any(absv == 1) else -1
        eob = Ss + eob_rel  # index of last NEWLY-significant coef (or Ss-1)
        r = 0
        br_bits: list[int] = []
        for k in range(Ss, Se + 1):
            t = int(absv[k - Ss])
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                st.emit_eobrun()
                c, ln = _PROG_AC_ENC[0xF0]
                bw.put(c, ln)
                r -= 16
                for b in br_bits:
                    bw.put(b, 1)
                br_bits = []
            if t > 1:  # history-nonzero: correction bit only
                br_bits.append(t & 1)
                continue
            st.emit_eobrun()
            c, ln = _PROG_AC_ENC[(r << 4) | 1]
            bw.put(c, ln)
            bw.put(0 if int(band[k]) < 0 else 1, 1)
            for b in br_bits:
                bw.put(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            st.eobrun += 1
            st.be_bits += br_bits
            if st.eobrun == 0x7FFF or len(st.be_bits) > 930:
                st.emit_eobrun()  # libjpeg's buffered-bits safety valve
    st.emit_eobrun()
    return bw.flush()


def _sos_seg(scomps: list[int], Ss: int, Se: int, Ah: int, Al: int) -> bytes:
    return _seg(0xFFDA, bytes([len(scomps)])
                + b"".join(bytes([c + 1, 0x00]) for c in scomps)
                + bytes([Ss, Se, (Ah << 4) | Al]))


def _assemble_jpeg_progressive(planes: list[np.ndarray],
                               samps: list[tuple[int, int]],
                               w: int, h: int,
                               restart_interval: int = 0) -> bytes:
    """Progressive (SOF2) JPEG with libjpeg's default scan script:
    interleaved DC first pass at Al=1, spectral-selected AC first passes
    (Y split 1-5 / 6-63 at Al=2, chroma 1-63 at Al=1), then DC refinement
    and AC refinements down to Al=0. The script fully refines every
    coefficient, so the entropy layer stays lossless end-to-end — the
    decoder must recover the exact quantized coefficients, same as
    baseline."""
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    assert w % (8 * hmax) == 0 and h % (8 * vmax) == 0
    zz = [p.reshape(p.shape[0], 64)[:, _Z].astype(np.int64) for p in planes]
    nc = len(planes)
    allc = list(range(nc))
    if nc == 1:
        script = [("dc", allc, 0, 0, 0, 1), ("acf", 0, 1, 63, 0, 1),
                  ("dc", allc, 0, 0, 1, 0), ("acr", 0, 1, 63, 1, 0)]
    else:
        script = [
            ("dc", allc, 0, 0, 0, 1),
            ("acf", 0, 1, 5, 0, 2), ("acf", 1, 1, 63, 0, 1),
            ("acf", 2, 1, 63, 0, 1), ("acf", 0, 6, 63, 0, 2),
            ("dc", allc, 0, 0, 1, 0),
            ("acr", 0, 1, 63, 2, 1), ("acr", 1, 1, 63, 1, 0),
            ("acr", 2, 1, 63, 1, 0), ("acr", 0, 1, 63, 1, 0),
        ]
    body = bytearray()
    for kind, who, Ss, Se, Ah, Al in script:
        if kind == "dc":
            body += _sos_seg(who, Ss, Se, Ah, Al)
            body += _enc_dc_scan(zz, samps, who, w, h, Ah, Al,
                                 restart_interval)
        elif kind == "acf":
            body += _sos_seg([who], Ss, Se, Ah, Al)
            body += _enc_ac_first(zz[who], Ss, Se, Al, restart_interval)
        else:
            body += _sos_seg([who], Ss, Se, Ah, Al)
            body += _enc_ac_refine(zz[who], Ss, Se, Al, restart_interval)
    dqt = _seg(0xFFDB, bytes([0]) + bytes(int(_Q_NATURAL[_Z[i]])
                                          for i in range(64)))
    comps = b"".join(bytes([ci + 1, (hi << 4) | vi, 0])
                     for ci, (hi, vi) in enumerate(samps))
    sof = _seg(0xFFC2, struct.pack(">BHHB", 8, h, w, nc) + comps)
    dht = (_seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
           + _seg(0xFFC4, bytes([0x10]) + bytes(_PROG_AC_BITS)
                  + bytes(_PROG_AC_VALS)))
    dri = _seg(0xFFDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    return b"\xff\xd8" + dqt + sof + dht + dri + bytes(body) + b"\xff\xd9"


def encode_jpeg_progressive(coeffs: np.ndarray, w: int, h: int, *,
                            restart_interval: int = 0) -> bytes:
    """Progressive grayscale JPEG from quantized coefficient blocks (same
    contract as encode_jpeg; the scan script refines to Al=0, so decode
    recovers ``coeffs`` exactly)."""
    return _assemble_jpeg_progressive([coeffs], [(1, 1)], w, h,
                                      restart_interval)


def encode_jpeg_progressive_color(coeffs3: np.ndarray, w: int, h: int, *,
                                  restart_interval: int = 0) -> bytes:
    """Progressive YCbCr 4:4:4 JPEG ((3, n_blocks, 8, 8) coefficients)."""
    assert coeffs3.shape[0] == 3
    return _assemble_jpeg_progressive(list(coeffs3), [(1, 1)] * 3, w, h,
                                      restart_interval)


def encode_jpeg_progressive_420(coeffs_y: np.ndarray, coeffs_cb: np.ndarray,
                                coeffs_cr: np.ndarray, w: int, h: int, *,
                                restart_interval: int = 0) -> bytes:
    """Progressive YCbCr 4:2:0 JPEG (same plane contract as
    encode_jpeg_420)."""
    return _assemble_jpeg_progressive([coeffs_y, coeffs_cb, coeffs_cr],
                                      [(2, 2), (1, 1), (1, 1)], w, h,
                                      restart_interval)


def upsample(plane: np.ndarray, ry: int, rx: int) -> np.ndarray:
    """The shared chroma upsample kernel: nearest-neighbor replication —
    each low-res sample covers its ry x rx full-res cell (2x2 for 4:2:0,
    1x2 for 4:2:2)."""
    return np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)


def upsample_2x(plane: np.ndarray) -> np.ndarray:
    """4:2:0 case of the shared upsample kernel."""
    return upsample(plane, 2, 2)


def coeffs_to_rgb_420(coeffs_y: np.ndarray, coeffs_cb: np.ndarray,
                      coeffs_cr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Ground-truth RGB for 4:2:0 coefficients: full-res Y IDCT, half-res
    chroma IDCT, shared upsample, shared color kernel — the decoder's
    exact arithmetic."""
    y = coeffs_to_pixels(coeffs_y, w, h)
    cb = upsample_2x(coeffs_to_pixels(coeffs_cb, w // 2, h // 2))
    cr = upsample_2x(coeffs_to_pixels(coeffs_cr, w // 2, h // 2))
    return ycbcr_to_rgb(y, cb, cr)


def coeffs_to_rgb_422(coeffs_y: np.ndarray, coeffs_cb: np.ndarray,
                      coeffs_cr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Ground-truth RGB for 4:2:2 coefficients: half-WIDTH chroma planes,
    horizontal-only shared upsample, shared color kernel."""
    y = coeffs_to_pixels(coeffs_y, w, h)
    cb = upsample(coeffs_to_pixels(coeffs_cb, w // 2, h), 1, 2)
    cr = upsample(coeffs_to_pixels(coeffs_cr, w // 2, h), 1, 2)
    return ycbcr_to_rgb(y, cb, cr)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """The shared JFIF color kernel (fixed float64 op order, round, clip) —
    runs identically in the generator (ground truth) and the decoder."""
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = np.clip(np.round(yf + 1.402 * crf), 0.0, 255.0)
    g = np.clip(np.round(yf - 0.344136 * cbf - 0.714136 * crf), 0.0, 255.0)
    b = np.clip(np.round(yf + 1.772 * cbf), 0.0, 255.0)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def coeffs_to_pixels(coeffs: np.ndarray, w: int, h: int,
                     qtable: np.ndarray | None = None) -> np.ndarray:
    """Ground-truth pixels for a coefficient tensor via the shared IDCT
    kernel (what the generator stores as body_hex)."""
    q = _Q_NATURAL if qtable is None else qtable
    img = np.empty((h, w), np.uint8)
    bw = w // 8
    for i, blk in enumerate(coeffs):
        by, bx = divmod(i, bw)
        img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = \
            idct_block(blk * q.reshape(8, 8))
    return img


def coeffs_to_rgb(coeffs3: np.ndarray, w: int, h: int) -> np.ndarray:
    """Ground-truth RGB pixels for a (3, n_blocks, 8, 8) YCbCr coefficient
    tensor: per-plane shared IDCT, then the shared color kernel — exactly
    the decoder's arithmetic."""
    planes = [coeffs_to_pixels(coeffs3[c], w, h) for c in range(3)]
    return ycbcr_to_rgb(*planes)


class _BitReader:
    """Buffered MSB-first bit reader over an entropy-coded segment with
    0xFF00 byte-stuffing removal; keeps up to 56 bits in one int so both
    the 16-bit Huffman peek and the magnitude-bits read are O(1)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.buf = 0
        self.n = 0
        self.marker = None  # marker byte the fill is parked at, if any

    def _fill(self) -> None:
        while self.n <= 48 and self.pos < len(self.d):
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else -1
                if nxt != 0x00:
                    # a real marker (RSTn at a restart boundary, or a stray
                    # one): park here — expect_rst() consumes it; a data
                    # read that runs into it errors in bits()/drop()
                    self.marker = nxt
                    return
                self.pos += 2  # data 0xFF + stuffed zero (F.1.2.3)
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | b
            self.n += 8

    def expect_rst(self, m: int) -> None:
        """Consume the byte-align padding + the RST(m) marker at a restart
        boundary (F.2.1.3.1). At most 7 pad bits may remain buffered —
        more means the entropy stream and the MCU count disagree."""
        if self.n >= 8:
            raise ValueError("restart marker expected mid-segment")
        self.n = 0
        self.buf = 0
        if (self.pos + 2 > len(self.d) or self.d[self.pos] != 0xFF
                or self.d[self.pos + 1] != 0xD0 + (m & 7)):
            got = self.d[self.pos:self.pos + 2].hex() or "EOF"
            raise ValueError(f"expected RST{m & 7} marker, got {got}")
        self.pos += 2
        self.marker = None

    def peek16(self) -> int:
        if self.n < 16:
            self._fill()
        if self.n >= 16:
            return (self.buf >> (self.n - 16)) & 0xFFFF
        # stream tail: pad the LOOKAHEAD with 1-bits (the encoder's pad
        # convention) — only ever consumed as padding past the final code
        pad = 16 - self.n
        return ((self.buf << pad) | ((1 << pad) - 1)) & 0xFFFF

    def drop(self, k: int) -> None:
        if self.n < k:
            raise ValueError("truncated entropy-coded segment")
        self.n -= k
        self.buf &= (1 << self.n) - 1

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        if self.n < k:
            if self.marker is not None and self.marker >= 0:
                raise ValueError(
                    f"unexpected marker 0xFF{self.marker:02X} in scan")
            raise ValueError("truncated entropy-coded segment")
        v = (self.buf >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.buf &= (1 << self.n) - 1
        return v


def _extend(raw: int, s: int) -> int:
    """F.2.2.1 EXTEND: raw `s`-bit magnitude -> signed value."""
    if s == 0:
        return 0
    return raw if raw >= (1 << (s - 1)) else raw - (1 << s) + 1


import functools


@functools.lru_cache(maxsize=32)
def _cached_decode_table(bits: tuple, vals: tuple
                         ) -> tuple[np.ndarray, np.ndarray]:
    """LUT build is ~130 us of numpy slicing — cache per distinct table so
    a corpus decode builds each declared table once per worker."""
    return _build_decode_table(list(bits), list(vals))


def _read_huffman(br: _BitReader, table: tuple[np.ndarray, np.ndarray]) -> int:
    v = br.peek16()
    ln = int(table[1][v])
    if ln == 0:
        raise ValueError("invalid Huffman code in scan")
    br.drop(ln)
    return int(table[0][v])


def _decode_block(br: _BitReader, dc_tab, ac_tab, prev_dc: int
                  ) -> tuple[np.ndarray, int]:
    """Entropy-decode one block: (natural-order int coefficients, new DC)."""
    s = _read_huffman(br, dc_tab)
    dc = prev_dc + _extend(br.bits(s), s)
    zz_z = np.zeros(64, np.int64)
    zz_z[0] = dc
    k = 1
    while k < 64:
        sym = _read_huffman(br, ac_tab)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError("invalid AC symbol")
            k += 16  # ZRL — must leave room for the coefficient it precedes
            if k > 63:
                raise ValueError("AC run overflows block")
            continue
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        zz_z[k] = _extend(br.bits(size), size)
        k += 1
    nat = np.zeros(64, np.int64)
    nat[_Z] = zz_z  # de-zigzag into natural order
    return nat, dc


# ---------------------------------------------------------------------------
# progressive (SOF2) decoder — T.81 Annex G.2
# ---------------------------------------------------------------------------


def _scan_end(data: bytes, start: int) -> int:
    """End of an entropy-coded segment: the next 0xFF followed by anything
    but a stuffed zero, an RSTn, or a 0xFF fill byte (B.1.1.2)."""
    i = start
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= len(data):
            return len(data)
        nxt = data[j + 1]
        if nxt == 0xFF:
            i = j + 1
        elif nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i = j + 2
        else:
            return j


def _refine_ac(br: _BitReader, band: np.ndarray, k: int,
               p1: int, m1: int) -> None:
    """One correction bit for a history-nonzero coefficient (G.2)."""
    if br.bits(1) and (int(band[k]) & p1) == 0:
        band[k] += p1 if band[k] >= 0 else m1


def _dec_ac_scan(seg: bytes, zz: np.ndarray, Ss: int, Se: int,
                 Ah: int, Al: int, ac_tab, ri: int) -> None:
    """Entropy-decode one single-component progressive AC scan into the
    zigzag coefficient array (first pass G.2.2, refinement mirroring
    libjpeg's decode_mcu_AC_refine)."""
    br = _BitReader(seg)
    eobrun = 0
    m = 0
    p1, m1 = 1 << Al, -(1 << Al)
    for bi in range(zz.shape[0]):
        if ri and bi and bi % ri == 0:
            br.expect_rst(m)
            m = (m + 1) & 7
            eobrun = 0
        band = zz[bi]
        if Ah == 0:  # first pass for this band
            if eobrun:
                eobrun -= 1
                continue
            k = Ss
            while k <= Se:
                sym = _read_huffman(br, ac_tab)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1  # current block ends here
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += 16  # ZRL
                else:
                    k += r
                    if k > Se:
                        raise ValueError("AC run overflows spectral band")
                    band[k] = _extend(br.bits(s), s) * p1
                    k += 1
        else:  # refinement pass
            k = Ss
            if eobrun == 0:
                while k <= Se:
                    sym = _read_huffman(br, ac_tab)
                    r, s = sym >> 4, sym & 0x0F
                    newval = 0
                    if s:
                        if s != 1:
                            raise ValueError(
                                "invalid AC refinement symbol (size > 1)")
                        newval = p1 if br.bits(1) else m1
                    elif r != 15:
                        eobrun = 1 << r  # includes the current block's tail
                        if r:
                            eobrun += br.bits(r)
                        break
                    # advance over r zero-history coefficients, emitting a
                    # correction bit for every nonzero-history one passed
                    while k <= Se:
                        if band[k]:
                            _refine_ac(br, band, k, p1, m1)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if newval:
                        if k > Se:
                            raise ValueError(
                                "AC refinement run overflows spectral band")
                        band[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= Se:  # rest of the current block: corrections only
                    if band[k]:
                        _refine_ac(br, band, k, p1, m1)
                    k += 1
                eobrun -= 1


def _decode_progressive_scans(data: bytes, pos: int, qtables: dict,
                              huff: dict, comps: list, w: int, h: int,
                              restart_interval: int) -> list[np.ndarray]:
    """Walk every segment from the first SOS to EOI (DHT/DQT/DRI may appear
    between scans), entropy-decode each scan, and return per-component
    NATURAL-order (n_blocks, 64) coefficient arrays — the same layout the
    sequential path produces, feeding the shared dequant/IDCT tail."""
    ncomp = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    pdims = [(w * c[2] // hmax, h * c[3] // vmax) for c in comps]
    zz = [np.zeros(((pw // 8) * (ph // 8), 64), np.int64) for pw, ph in pdims]
    by_id = {c[0]: i for i, c in enumerate(comps)}
    seen_sos = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == 0xFFD9:
            break
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        if ln < 2:
            raise ValueError(f"invalid segment length {ln} for marker "
                             f"0x{marker:04X}")
        body = data[pos + 4:pos + 2 + ln]
        if len(body) < ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = tuple(body[off + 1:off + 17])
                nvals = sum(bits)
                vals = tuple(body[off + 17:off + 17 + nvals])
                huff[tc_th] = _cached_decode_table(bits, vals)
                off += 17 + nvals
        elif marker == 0xFFDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xFFDA:
            seen_sos = True
            ns = body[0]
            scomps = []
            for si in range(ns):
                cs, ts = body[1 + 2 * si], body[2 + 2 * si]
                if cs not in by_id:
                    raise ValueError("scan references unknown component")
                scomps.append((by_id[cs], ts >> 4, ts & 0x0F))
            Ss, Se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            Ah, Al = a >> 4, a & 0x0F
            start = pos + 2 + ln
            end = _scan_end(data, start)
            seg = data[start:end]
            if Ss == 0:  # DC scan (first or refinement)
                if Se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                _dec_dc_scan(seg, zz, comps, scomps, w, h, hmax, vmax,
                             Ah, Al, huff, restart_interval)
            else:  # AC scan: always single-component (G.1.1.1.1)
                if ns != 1:
                    raise ValueError(
                        "progressive AC scan must be single-component")
                ci, _, ta = scomps[0]
                ac_tab = huff.get(0x10 | ta)
                if ac_tab is None:
                    raise ValueError("scan references undeclared Huffman table")
                _dec_ac_scan(seg, zz[ci], Ss, Se, Ah, Al, ac_tab,
                             restart_interval)
            pos = end
            continue
        pos += 2 + ln
    if not seen_sos:
        raise ValueError("truncated JPEG: missing SOS")
    out = []
    for arr in zz:
        nat = np.zeros_like(arr)
        nat[:, _Z] = arr
        out.append(nat)
    return out


def _dec_dc_scan(seg: bytes, zz: list[np.ndarray], comps: list,
                 scomps: list, w: int, h: int, hmax: int, vmax: int,
                 Ah: int, Al: int, huff: dict, ri: int) -> None:
    """Progressive DC scan: interleaved MCU order when ns>1 (A.2.3), one
    raster block per MCU otherwise. First pass (Ah=0) diff-decodes into
    coef = dc << Al; refinement ORs in bit << Al (G.2.1)."""
    br = _BitReader(seg)
    tabs = []
    if Ah == 0:
        for _, td, _ta in scomps:
            t = huff.get(0x00 | td)
            if t is None:
                raise ValueError("scan references undeclared Huffman table")
            tabs.append(t)
    if len(scomps) > 1:
        mcus = []
        for my in range(h // (8 * vmax)):
            for mx in range(w // (8 * hmax)):
                blocks = []
                for si, (ci, _, _) in enumerate(scomps):
                    hi, vi = comps[ci][2], comps[ci][3]
                    pbw = (w * hi // hmax) // 8
                    for by in range(vi):
                        for bx in range(hi):
                            blocks.append((si, ci, (my * vi + by) * pbw
                                           + (mx * hi + bx)))
                mcus.append(blocks)
    else:
        ci = scomps[0][0]
        mcus = [[(0, ci, i)] for i in range(zz[ci].shape[0])]
    prev = [0] * len(scomps)
    m = 0
    for count, blocks in enumerate(mcus):
        if ri and count and count % ri == 0:
            br.expect_rst(m)
            m = (m + 1) & 7
            prev = [0] * len(scomps)
        for si, ci, bi in blocks:
            if Ah == 0:
                s = _read_huffman(br, tabs[si])
                prev[si] += _extend(br.bits(s), s)
                zz[ci][bi, 0] = prev[si] << Al
            else:
                if br.bits(1):
                    zz[ci][bi, 0] |= 1 << Al


def decode_jpeg(data: bytes) -> np.ndarray:
    """Full baseline JPEG decode: marker walk, DQT/DHT/SOF0/SOS parse,
    Huffman + DC-prediction + run-length entropy decode (lossless —
    recovers the encoder's quantized coefficients exactly), dequantize,
    shared IDCT kernel, and for 3-component scans the shared YCbCr->RGB
    kernel. Supports grayscale, YCbCr 4:4:4, 4:2:0 and 4:2:2 sampling,
    restart intervals (DRI + RST0-7 with DC-predictor resets), and
    PROGRESSIVE (SOF2) streams — multi-scan spectral selection and
    successive approximation per T.81 Annex G.2, including DC/AC
    refinement passes and EOB runs. 12-bit, arithmetic coding,
    hierarchical and other samplings are rejected with clear errors.
    Returns (h, w) uint8 or (h, w, 3) uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[int, tuple[np.ndarray, np.ndarray]] = {
        0x00: _cached_decode_table(tuple(_DC_BITS), tuple(_DC_VALS)),
        0x10: _cached_decode_table(tuple(_AC_BITS), tuple(_AC_VALS)),
    }
    w = h = None
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan_tabs: list[tuple[int, int]] = []  # (dc table id, ac table id)
    scan_start = None
    restart_interval = 0
    progressive = False
    sos_pos = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == 0xFFD9:
            break
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        if ln < 2:
            raise ValueError(f"invalid segment length {ln} for marker "
                             f"0x{marker:04X}")
        body = data[pos + 4:pos + 2 + ln]
        if len(body) < ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xFFDB:
            off = 0
            while off < len(body):
                pq_tq = body[off]
                if pq_tq & 0xF0:
                    raise ValueError("16-bit quant tables not supported")
                zz = np.frombuffer(body[off + 1:off + 65], np.uint8) \
                    .astype(np.int64)
                q = np.empty(64, np.int64)
                q[_Z] = zz
                qtables[pq_tq & 0x0F] = q
                off += 65
        elif marker in (0xFFC0, 0xFFC2):
            progressive = marker == 0xFFC2
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError("only 8-bit 1- or 3-component frames "
                                 "supported")
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, tq, samp >> 4, samp & 0x0F))
            samps = [(c[2], c[3]) for c in comps]
            if not (all(s == (1, 1) for s in samps)
                    or (ncomp == 3 and samps[0] in ((2, 2), (2, 1))
                        and samps[1] == samps[2] == (1, 1))):
                raise ValueError("unsupported sampling (grayscale, 4:4:4, "
                                 "4:2:0 or 4:2:2 only)")
        elif marker in (0xFFC1, 0xFFC3):
            raise ValueError("only baseline (SOF0) or progressive (SOF2) "
                             "supported")
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = tuple(body[off + 1:off + 17])
                nvals = sum(bits)
                vals = tuple(body[off + 17:off + 17 + nvals])
                huff[tc_th] = _cached_decode_table(bits, vals)
                off += 17 + nvals
        elif marker == 0xFFDA:
            if progressive:
                sos_pos = pos  # the progressive walker owns it from here
                break
            ns = body[0]
            if ns != len(comps):
                raise ValueError("partial scans require SOF2 (progressive)")
            for si in range(ns):
                ts = body[2 + 2 * si]
                scan_tabs.append((ts >> 4, ts & 0x0F))
            scan_start = pos + 2 + ln
            break
        elif marker == 0xFFDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        pos += 2 + ln
    if w is None or not qtables or (scan_start is None and sos_pos is None):
        raise ValueError("truncated JPEG: missing SOF/DQT/SOS")
    ncomp = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    if w % (8 * hmax) or h % (8 * vmax):
        raise ValueError("dimensions must be MCU-aligned")
    # per-component plane geometry and coefficient stores
    pdims = [(w * c[2] // hmax, h * c[3] // vmax) for c in comps]
    if progressive:
        coeffs = _decode_progressive_scans(data, sos_pos, qtables, huff,
                                           comps, w, h, restart_interval)
    else:
        eoi = data.rfind(b"\xff\xd9")
        br = _BitReader(data[scan_start:eoi if eoi > 0 else len(data)])
        mcux, mcuy = w // (8 * hmax), h // (8 * vmax)
        coeffs = [np.zeros(((pw // 8) * (ph // 8), 64), np.int64)
                  for pw, ph in pdims]
        prev = [0] * ncomp
        tabs = []
        for c in range(ncomp):
            dc_tab = huff.get(0x00 | scan_tabs[c][0])
            ac_tab = huff.get(0x10 | scan_tabs[c][1])
            if dc_tab is None or ac_tab is None:
                raise ValueError("scan references undeclared Huffman table")
            tabs.append((dc_tab, ac_tab))
        rst_m = count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and count \
                        and count % restart_interval == 0:
                    br.expect_rst(rst_m)  # byte-align + RSTn + pred reset
                    rst_m = (rst_m + 1) & 7
                    prev = [0] * ncomp
                for c in range(ncomp):
                    hi, vi = comps[c][2], comps[c][3]
                    pbw = pdims[c][0] // 8
                    for by in range(vi):
                        for bx in range(hi):
                            bi = (my * vi + by) * pbw + (mx * hi + bx)
                            coeffs[c][bi], prev[c] = _decode_block(
                                br, tabs[c][0], tabs[c][1], prev[c])
                count += 1
    planes = []
    for c in range(ncomp):
        q = qtables.get(comps[c][1])
        if q is None:
            raise ValueError("component references undeclared quant table")
        pw, ph = pdims[c]
        plane = np.empty((ph, pw), np.uint8)
        pbw = pw // 8
        for i in range(coeffs[c].shape[0]):
            by, bx = divmod(i, pbw)
            plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = \
                idct_block(coeffs[c][i].reshape(8, 8) * q.reshape(8, 8))
        if plane.shape != (h, w):  # subsampled chroma: shared upsample
            plane = upsample(plane, h // plane.shape[0], w // plane.shape[1])
        planes.append(plane)
    if ncomp == 1:
        return planes[0]
    return ycbcr_to_rgb(*planes)


# ---------------------------------------------------------------------------
# fixture: deterministic JPEG corpus with decoded-pixel ground truth
# ---------------------------------------------------------------------------

JPEG_SEED = 20_260_818


def _rand_block_coeffs(rng, n_blocks: int) -> np.ndarray:
    """Sparse integer coefficient blocks: DC in a photographic-ish range,
    a handful of low-frequency ACs (zigzag-early), occasional ZRL-forcing
    lone high-frequency coefficient."""
    coeffs = np.zeros((n_blocks, 64), np.int64)
    coeffs[:, 0] = rng.integers(-40, 41, n_blocks)
    for b in range(n_blocks):
        for k in rng.integers(1, 10, int(rng.integers(0, 6))):
            coeffs[b, _Z[k]] = int(rng.integers(-20, 21))
        if rng.random() < 0.3:  # exercise ZRL (16+ zero runs)
            coeffs[b, _Z[int(rng.integers(40, 64))]] = int(rng.integers(1, 4))
    return coeffs.reshape(-1, 8, 8)


def generate_jpeg_media(n: int, shard: int = 0) -> pa.Table:
    """Cycling grayscale / YCbCr-4:4:4 / 4:2:0 / 4:2:2 / 4:2:0-with-restart
    / PROGRESSIVE-4:2:0 / progressive-gray-with-restart JPEGs; ``channels``
    = decoded bytes per pixel (1 or 3), ``body_hex`` = the ground-truth
    decoded byte stream."""
    rng = np.random.default_rng(JPEG_SEED + shard)
    ids, payloads, ws, hs, chs, hexes, means = [], [], [], [], [], [], []
    for i in range(n):
        variant = i % 7
        if variant in (2, 4, 5):  # 4:2:0 needs 16-aligned dims
            mw, mh = int(rng.integers(1, 4)), int(rng.integers(1, 4))
            w, h = mw * 16, mh * 16
        elif variant == 3:  # 4:2:2: w 16-aligned, h 8-aligned
            w, h = int(rng.integers(1, 4)) * 16, int(rng.integers(2, 7)) * 8
        else:
            bw_, bh_ = int(rng.integers(2, 7)), int(rng.integers(2, 7))
            w, h = bw_ * 8, bh_ * 8
        if variant == 0:
            coeffs = _rand_block_coeffs(rng, (w // 8) * (h // 8))
            payload = encode_jpeg(coeffs, w, h)
            px = coeffs_to_pixels(coeffs, w, h)
            ch = 1
        elif variant == 1:
            coeffs3 = np.stack([_rand_block_coeffs(rng, (w // 8) * (h // 8))
                                for _ in range(3)])
            payload = encode_jpeg_color(coeffs3, w, h)
            px = coeffs_to_rgb(coeffs3, w, h)
            ch = 3
        elif variant == 3:
            cy = _rand_block_coeffs(rng, (w // 8) * (h // 8))
            cb = _rand_block_coeffs(rng, (w // 16) * (h // 8))
            cr = _rand_block_coeffs(rng, (w // 16) * (h // 8))
            payload = encode_jpeg_422(cy, cb, cr, w, h)
            px = coeffs_to_rgb_422(cy, cb, cr, w, h)
            ch = 3
        elif variant == 6:  # progressive grayscale with a restart interval
            coeffs = _rand_block_coeffs(rng, (w // 8) * (h // 8))
            ri = int(rng.integers(1, 5))
            payload = encode_jpeg_progressive(coeffs, w, h,
                                              restart_interval=ri)
            px = coeffs_to_pixels(coeffs, w, h)
            ch = 1
        else:
            cy = _rand_block_coeffs(rng, (w // 8) * (h // 8))
            cb = _rand_block_coeffs(rng, (w // 16) * (h // 16))
            cr = _rand_block_coeffs(rng, (w // 16) * (h // 16))
            ri = int(rng.integers(1, 5)) if variant == 4 else 0
            if variant == 5:  # progressive 4:2:0 (libjpeg default script)
                payload = encode_jpeg_progressive_420(cy, cb, cr, w, h)
            else:
                payload = encode_jpeg_420(cy, cb, cr, w, h,
                                          restart_interval=ri)
            px = coeffs_to_rgb_420(cy, cb, cr, w, h)
            ch = 3
        ids.append(shard * 10_000_000 + i)
        payloads.append(payload)
        ws.append(w)
        hs.append(h)
        chs.append(ch)
        hexes.append(px.tobytes().hex().upper())
        means.append(float(px.mean()))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "channels": pa.array(chs, pa.int32()),
        "mean_byte": pa.array(means, pa.float64()),
        "body_hex": pa.array(hexes, pa.string()),
    })


def jpeg_media_path(sf: float, root: str = "/tmp/rotel_ray_data") -> str:
    """Pure cache path (no build side effect; see multimodal.media_path)."""
    return os.path.join(root, f"jpeg_v5_sf{sf:g}")  # v5: + progressive rows


def ensure_jpeg_media(sf: float, root: str = "/tmp/rotel_ray_data") -> str:
    out = jpeg_media_path(sf, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    n = max(200, int(sf * 20_000))
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    per = 1000
    for s in range((n + per - 1) // per):
        tbl = generate_jpeg_media(min(per, n - s * per), shard=s)
        pq.write_table(tbl, os.path.join(tmp, f"part-{s:04d}.parquet"))
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def jpeg_decode_stage(ds, *, batch_size: int = 256):
    """Stateless decode map: payload -> (width, height, byte stats, body).
    Task mode — fuses with the read (the PNG/WAV decode convention)."""

    def f(t: pa.Table) -> pa.Table:
        outs = [decode_jpeg(p) for p in t.column("payload").to_pylist()]
        return pa.table({
            "media_id": t.column("media_id"),
            "width": pa.array([o.shape[1] for o in outs], pa.int32()),
            "height": pa.array([o.shape[0] for o in outs], pa.int32()),
            "channels": pa.array([o.shape[2] if o.ndim == 3 else 1
                                  for o in outs], pa.int32()),
            "n_bytes": pa.array([o.size for o in outs], pa.int64()),
            "byte_sum": pa.array([int(o.sum(dtype=np.int64)) for o in outs],
                                 pa.int64()),
            "first_byte": pa.array([int(o.reshape(-1)[0]) for o in outs],
                                   pa.int64()),
            "last_byte": pa.array([int(o.reshape(-1)[-1]) for o in outs],
                                  pa.int64()),
            "body": pa.array([o.tobytes() for o in outs], pa.binary()),
        })

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)
