"""Baseline sequential JPEG codec — pure Python/numpy, no imaging libs.

Retires the JPEG ``_require("PIL")`` stub for the baseline-sequential
profile (ITU-T T.81 Annex F) AND the progressive profile (Annex G:
spectral selection + successive approximation, see the progressive
section below): greyscale single-component and YCbCr 3-component
interleaved scans, 4:4:4 and 4:2:0 chroma subsampling, the Annex-K
standard Huffman and quantization tables, restart markers on decode.
Arithmetic-coded, lossless, and 12-bit JPEGs still raise the honest
stub error (real corpora with those need libjpeg).

Like the PNG codec (multimodal.py), the en/decoder pair exists so the
Spark-side decode plumbing (Arrow-batched ``mapInPandas`` over binary
payload columns) is testable end-to-end in this container: queries
render deterministic JPEGs on the executors, decode them back, and an
SQL oracle predicts the decoded profile. With quality=100 (all-ones
quantization tables) a constant-grey image round-trips EXACTLY (the
only nonzero coefficient is the DC term, which survives quantization
unchanged), which is what keeps the oracle closed-form; lossy paths
are covered by tolerance round-trip property tests instead.

Scale posture: both directions are per-row pure functions over a
binary column — embarrassingly parallel, no shuffle; the natural 100 TB
shape is a mapInPandas over a parquet scan with the payload column
pruned last (binary columns dominate scan bytes).
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# ---- constants: zigzag, Annex-K tables --------------------------------------

ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex-K base quantization tables (luminance, chrominance), raster order.
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex-K typical Huffman tables: (BITS[1..16], HUFFVAL).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
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
        0xF9, 0xFA,
    ],
)

# Orthonormal 8-point DCT-II basis: T @ block @ T.T == DCT coefficients
# with the JPEG scaling convention.
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(0.125) if _k == 0 else 0.5
        _T[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling; quality=100 → all ones."""
    if not 1 <= quality <= 100:
        raise ValueError("quality in [1, 100]")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255)


@functools.lru_cache(maxsize=64)
def _build_huffman_t(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical assignment.
    Cached on the (bits, vals) spec — streams overwhelmingly reuse a
    handful of tables (often the Annex K defaults), and rebuilding the
    canonical assignment per payload dominated small-image decode."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huffman(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    return _build_huffman_t(tuple(bits), tuple(vals))


@functools.lru_cache(maxsize=64)
def _build_decoder_t(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (ln, code): sym
        for sym, (code, ln) in _build_huffman_t(bits, vals).items()
    }


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return _build_decoder_t(tuple(bits), tuple(vals))


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
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    coef = _T @ (block.astype(np.float64) - 128.0) @ _T.T
    return np.round(coef / q).astype(np.int64)


def _fdct_quant_all(plane: np.ndarray, q: np.ndarray, zz: np.ndarray) -> np.ndarray:
    """All 8×8 blocks of a padded plane FDCT'd + quantized in ONE
    stacked matmul pair — returns ``(n_blocks, 64)`` zigzag-order
    int64 rows, raster block order. Same per-block pairwise products
    as :func:`_fdct_quant` (matmul broadcasting), so bit-identical."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coef = _T @ blks @ _T.T
    return np.round(coef / q).astype(np.int64).reshape(-1, 64)[:, zz]


def _idct_all(coef_zz: np.ndarray, q: np.ndarray, zz: np.ndarray,
              bh: int, bw: int) -> np.ndarray:
    """Inverse of :func:`_fdct_quant_all`: dequantize ``(n_blocks, 64)``
    zigzag rows and IDCT every block in one stacked matmul pair,
    returning the assembled ``(bh*8, bw*8)`` float plane (+128 level
    shift applied)."""
    raster = np.zeros((coef_zz.shape[0], 64), dtype=np.int64)
    raster[:, zz] = coef_zz
    blks = raster.reshape(-1, 8, 8) * q
    pix = _T.T @ blks.astype(np.float64) @ _T + 128.0
    return (
        pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )


def _pad_to_blocks(c: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = c.shape
    return np.pad(c, ((0, bh - h), (0, bw - w)), mode="edge")


def encode_jpeg_baseline(
    arr: np.ndarray, quality: int = 100, subsampling: str = "444"
) -> bytes:
    """Encode uint8 (h, w) grey or (h, w, 3) RGB as baseline JFIF.

    Greyscale emits a single-component scan; RGB converts to YCbCr
    (BT.601 full-range, rounded) with 4:4:4 or 4:2:0 (2×2 box mean)
    chroma. quality=100 zeroes no information beyond the
    rounding of DCT coefficients (all quant steps are 1).
    """
    if arr.dtype != np.uint8:
        raise ValueError("uint8 input required")
    grey = arr.ndim == 2
    if not grey and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("(h, w) grey or (h, w, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling in {'444','420'}")
    h, w = arr.shape[:2]

    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if grey:
        comps = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.round(-0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0)
        cr = np.round(0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0)
        cb = np.clip(cb, 0, 255)
        cr = np.clip(cr, 0, 255)
        if subsampling == "420":
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = np.round(
                (cbp[0::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 0::2] + cbp[1::2, 1::2])
                / 4.0
            )
            cr = np.round(
                (crp[0::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 0::2] + crp[1::2, 1::2])
                / 4.0
            )
        comps = [y, cb, cr]

    # sampling factors per component
    if grey:
        sampling = [(1, 1)]
    elif subsampling == "444":
        sampling = [(1, 1), (1, 1), (1, 1)]
    else:
        sampling = [(2, 2), (1, 1), (1, 1)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # Pad each component to its MCU-aligned size.
    padded = []
    for c, (sh, sv) in zip(comps, sampling):
        padded.append(_pad_to_blocks(c, mcuy * sv * 8, mcux * sh * 8))

    enc_dc = [_build_huffman(*HUFF_DC_LUMA), _build_huffman(*HUFF_DC_CHROMA)]
    enc_ac = [_build_huffman(*HUFF_AC_LUMA), _build_huffman(*HUFF_AC_CHROMA)]
    zz = ZIGZAG

    bw_ = _BitWriter()
    pred = [0] * len(comps)
    # All blocks of every component FDCT'd up front in stacked matmuls;
    # the MCU walk below only entropy-codes.
    coef_all = [
        _fdct_quant_all(c, ql if ci == 0 else qc, zz)
        for ci, c in enumerate(padded)
    ]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (c, (sh, sv)) in enumerate(zip(padded, sampling)):
                tdc = enc_dc[0 if ci == 0 else 1]
                tac = enc_ac[0 if ci == 0 else 1]
                blocks_per_row = mcux * sh
                for by in range(sv):
                    for bx in range(sh):
                        bidx = (my * sv + by) * blocks_per_row + (mx * sh + bx)
                        coefs = coef_all[ci][bidx].tolist()
                        diff = coefs[0] - pred[ci]
                        pred[ci] = coefs[0]
                        size, amp = _magnitude(diff)
                        code, ln = tdc[size]
                        bw_.write(code, ln)
                        if size:
                            bw_.write(amp, size)
                        run = 0
                        for k in range(1, 64):
                            v = coefs[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = tac[0xF0]
                                bw_.write(code, ln)
                                run -= 16
                            size, amp = _magnitude(v)
                            code, ln = tac[(run << 4) | size]
                            bw_.write(code, ln)
                            bw_.write(amp, size)
                            run = 0
                        if run:
                            code, ln = tac[0x00]  # EOB
                            bw_.write(code, ln)
    scan = bw_.flush()

    # ---- assemble segments ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return (
            b"\xff\xdb"
            + struct.pack(">H", 67)
            + bytes([tid])
            + bytes(int(x) for x in q.reshape(64)[zz])
        )

    out += dqt(0, ql)
    if not grey:
        out += dqt(1, qc)

    nc = len(comps)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci, (sh, sv) in enumerate(sampling):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls: int, tid: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, vals = table
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    if not grey:
        out += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)

    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ---------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed FF
                else:
                    # marker: unread it and pad
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop buffered bits and consume an RSTn marker at self.pos."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg_baseline(b: bytes) -> tuple[str, int, int, np.ndarray]:
    """Decode baseline-sequential JFIF → (mode, width, height, array).

    mode 'L' (grey, (h, w)) or 'RGB' ((h, w, 3)). Progressive (SOF2)
    streams dispatch to :func:`decode_jpeg_progressive`; arithmetic /
    lossless / hierarchical remain the honest stub surface."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None
    comps: list[dict] = []

    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", b[pos : pos + 2])
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:  # 16-bit table
                    vals = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(
                        np.int64
                    )
                    p += 128
                else:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.int64
                    )
                    p += 64
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = vals
                qt[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_ac if cls else huff_dc)[tid] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("STUB: only 8-bit baseline JPEG")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
            frame = (fh, fw, nc)
        elif marker == 0xC2:  # progressive — restart with that decoder
            return decode_jpeg_progressive(b)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "STUB: lossless/arithmetic/hierarchical JPEG profiles need libjpeg"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cid)
                comp["td"], comp["ta"] = tables >> 4, tables & 0xF
                scan_comps.append(comp)
            pos += seglen
            return _decode_scan(
                b, pos, frame, scan_comps, qt, huff_dc, huff_ac, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(b, pos, frame, comps, qt, huff_dc, huff_ac, restart_interval):
    fh, fw, nc = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    # Entropy-decode all coefficients first (sequential by nature),
    # then IDCT every block of each plane in one stacked matmul.
    coef_store = [
        np.zeros((mcuy * c["v"] * mcux * c["h"], 64), dtype=np.int64)
        for c in comps
    ]
    br = _BitReader(b[pos:])
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_to_marker()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                blocks_per_row = mcux * c["h"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = coef_store[ci][
                            (my * c["v"] + by) * blocks_per_row
                            + (mx * c["h"] + bx)
                        ]
                        size = _decode_huff(br, huff_dc[c["td"]])
                        diff = _extend(br.read_bits(size), size)
                        pred[ci] += diff
                        coefs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, huff_ac[c["ta"]])
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index out of range")
                            coefs[k] = _extend(br.read_bits(size), size)
                            k += 1

    planes = [
        _idct_all(coef_store[ci], qt[c["tq"]], ZIGZAG,
                  mcuy * c["v"], mcux * c["h"])
        for ci, c in enumerate(comps)
    ]

    if nc == 1:
        out = np.clip(np.round(planes[0][:fh, :fw]), 0, 255).astype(np.uint8)
        return "L", fw, fh, out

    # Upsample chroma to full resolution (nearest/box replicate).
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:fh, :fw])
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return "RGB", fw, fh, out


# ---- progressive JPEG (spectral selection) ----------------------------------
#
# Progressive mode splits the coefficients across multiple scans so a
# partial stream renders a coarse image: a DC scan first, then AC
# spectral bands per component, with EOB-run coding across blocks
# (ITU T.81 §G). This implementation covers spectral selection AND
# successive approximation for grey / 4:4:4 RGB, which is what
# `encode_jpeg_progressive` emits and what many progressive encoders
# produce for their first approximation level.


def _next_marker(b: bytes, pos: int) -> int:
    """Position of the next real marker at/after pos (skips stuffed
    0xFF00 and RST markers inside entropy data)."""
    while pos < len(b) - 1:
        if b[pos] == 0xFF and b[pos + 1] not in (0x00,) and not (
            0xD0 <= b[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return len(b)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 100) -> bytes:
    """Encode uint8 grey / RGB(4:4:4) as progressive JFIF: one
    interleaved DC scan, then per-component AC band scans (1-5, 6-63)
    with EOB-run coding. Round-trips bit-exactly against
    :func:`decode_jpeg` at quality=100 (quant steps of 1)."""
    if arr.dtype != np.uint8:
        raise ValueError("uint8 input required")
    grey = arr.ndim == 2
    if not grey and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("(h, w) grey or (h, w, 3) RGB")
    h, w = arr.shape[:2]
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if grey:
        comps = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.clip(
            np.round(-0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0), 0, 255
        )
        cr = np.clip(
            np.round(0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0), 0, 255
        )
        comps = [y, cb, cr]

    bh, bw = (h + 7) // 8, (w + 7) // 8
    zz = ZIGZAG
    # Quantized zigzag coefficient blocks per component, raster order
    # — all blocks of a plane in one stacked FDCT.
    blocks: list[np.ndarray] = []
    for ci, c in enumerate(comps):
        q = ql if ci == 0 else qc
        p = _pad_to_blocks(c, bh * 8, bw * 8)
        blocks.append(_fdct_quant_all(p, q, zz))

    enc_dc = [_build_huffman(*HUFF_DC_LUMA), _build_huffman(*HUFF_DC_CHROMA)]
    enc_ac = [_build_huffman(*HUFF_AC_LUMA), _build_huffman(*HUFF_AC_CHROMA)]

    # --- DC scan (interleaved; all sampling 1x1 so MCU == block) ---
    bw_ = _BitWriter()
    pred = [0] * len(comps)
    dc_cols = [blocks[ci][:, 0].tolist() for ci in range(len(comps))]
    for bi in range(bh * bw):
        for ci in range(len(comps)):
            t = enc_dc[0 if ci == 0 else 1]
            dc = dc_cols[ci][bi]
            size, amp = _magnitude(dc - pred[ci])
            pred[ci] = dc
            code, ln = t[size]
            bw_.write(code, ln)
            if size:
                bw_.write(amp, size)
    dc_scan = bw_.flush()

    # --- AC band scans, one component per scan ---
    def ac_scan(ci: int, ss: int, se: int) -> bytes:
        t = enc_ac[0 if ci == 0 else 1]
        out = _BitWriter()
        eobrun = 0

        def flush_eobrun() -> None:
            # Annex-K AC tables carry no EOBn (n>0) symbols, so runs
            # flush as single EOBs (EOB0 ≡ run of 1) — spec-valid,
            # slightly less compact; the decoder handles general EOBn
            # from foreign encoders.
            nonlocal eobrun
            while eobrun:
                code, ln = t[0x00]
                out.write(code, ln)
                eobrun -= 1

        for coefs in blocks[ci]:
            band = coefs[ss : se + 1].tolist()
            if not any(band):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun()
                continue
            flush_eobrun()
            run = 0
            last_nz = max(i for i, v in enumerate(band) if v)
            for i, v in enumerate(band):
                if i > last_nz:
                    eobrun += 1
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = t[0xF0]
                    out.write(code, ln)
                    run -= 16
                size, amp = _magnitude(v)
                code, ln = t[(run << 4) | size]
                out.write(code, ln)
                out.write(amp, size)
                run = 0
        flush_eobrun()
        return out.flush()

    bands = [(1, 5), (6, 63)]
    ac_scans = [
        (ci, ss, se, ac_scan(ci, ss, se))
        for ci in range(len(comps))
        for ss, se in bands
    ]

    # --- assemble ---
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )

    def dqt(tid: int, q: np.ndarray) -> bytes:
        zzvals = q.reshape(64)[zz].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zzvals

    out += dqt(0, ql)
    if not grey:
        out += dqt(1, qc)

    nc = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    def dht(cls: int, tid: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, vals = table
        payload = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    if not grey:
        out += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)

    # DC scan header: all components, Ss=Se=0
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, (0 if i == 0 else 1) << 4])
    sos += bytes([0, 0, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos + dc_scan

    for ci, ss, se, data in ac_scans:
        tid = 0 if ci == 0 else 1
        sos = bytes([1, ci + 1, tid, ss, se, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos + data
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_progressive(b: bytes) -> tuple[str, int, int, np.ndarray]:
    """Decode a progressive (SOF2) JFIF stream — spectral selection
    and successive approximation (first + refinement scans, T.81
    §G.1.2.3 correction-bit walk), 1x1 sampling: accumulate
    coefficients across all scans, then dequantize + IDCT once at
    EOI."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    comps: list[dict] = []
    coef: list[np.ndarray] = []  # per comp: (n_blocks, 64) zigzag-order

    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", b[pos : pos + 2])
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                p += 64
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = vals
                qt[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_ac if cls else huff_dc)[tid] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC2:
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("STUB: only 8-bit JPEG")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise NotImplementedError(
                        "STUB: progressive decode covers 1x1 sampling"
                    )
                comps.append({"id": cid, "tq": tq})
            frame = (fh, fw, nc)
            bh, bw2 = (fh + 7) // 8, (fw + 7) // 8
            coef = [np.zeros((bh * bw2, 64), dtype=np.int64) for _ in range(nc)]
        elif marker in (0xC0, 0xC1):
            raise ValueError("baseline frame — use decode_jpeg_baseline")
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                idx = next(j for j, c in enumerate(comps) if c["id"] == cid)
                scan_comps.append((idx, tables >> 4, tables & 0xF))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            data_start = pos + seglen
            data_end = _next_marker(b, data_start)
            br = _BitReader(b[data_start:data_end])
            if ss == 0 and ah == 0:
                # DC first scan (interleaved, MCU == block at 1x1):
                # point-transformed diffs, stored shifted back up.
                pred = [0] * len(scan_comps)
                n_blocks = coef[0].shape[0]
                for bi in range(n_blocks):
                    for si, (idx, td, _ta) in enumerate(scan_comps):
                        size = _decode_huff(br, huff_dc[td])
                        pred[si] += _extend(br.read_bits(size), size)
                        coef[idx][bi][0] = pred[si] << al
            elif ss == 0:
                # DC refinement: one raw bit per block sets bit ``al``
                # (two's-complement arithmetic: works for any sign).
                n_blocks = coef[0].shape[0]
                for bi in range(n_blocks):
                    for idx, _td, _ta in scan_comps:
                        if br.read_bits(1):
                            coef[idx][bi][0] |= 1 << al
            elif ah == 0:
                # AC band first scan, single component: magnitudes are
                # the point-transformed values, stored shifted up.
                (idx, _td, ta) = scan_comps[0]
                table = huff_ac[ta]
                eobrun = 0
                for bi in range(coef[idx].shape[0]):
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _decode_huff(br, table)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:
                                k += 16
                                continue
                            eobrun = (1 << run) - 1
                            if run:
                                eobrun += br.read_bits(run)
                            break
                        k += run
                        if k > se:
                            raise ValueError("AC index beyond band")
                        coef[idx][bi][k] = (
                            _extend(br.read_bits(size), size) << al
                        )
                        k += 1
            else:
                # AC refinement scan (ITU T.81 §G.1.2.3): newly
                # significant coefficients arrive as ±1<<al with a run
                # of ZERO-HISTORY positions; every already-nonzero
                # position passed on the way (and every nonzero
                # position of the rest of the band at EOB, and of
                # whole EOB-run blocks) consumes one correction bit.
                (idx, _td, ta) = scan_comps[0]
                table = huff_ac[ta]
                eobrun = 0

                def _refine(row, k, se, br, al):
                    while k <= se:
                        if row[k] != 0 and br.read_bits(1):
                            row[k] += (1 if row[k] > 0 else -1) << al
                        k += 1

                for bi in range(coef[idx].shape[0]):
                    row = coef[idx][bi]
                    if eobrun:
                        eobrun -= 1
                        _refine(row, ss, se, br, al)
                        continue
                    k = ss
                    while k <= se:
                        rs = _decode_huff(br, table)
                        run, size = rs >> 4, rs & 0xF
                        newval = 0
                        if size == 0:
                            if run != 15:  # EOBn
                                eobrun = (1 << run) - 1
                                if run:
                                    eobrun += br.read_bits(run)
                                _refine(row, k, se, br, al)
                                break
                            target = 16  # ZRL: skip 16 zero-history
                        else:
                            if size != 1:
                                raise ValueError(
                                    "refinement scan size must be 1"
                                )
                            newval = (1 << al) if br.read_bits(1) else -(1 << al)
                            target = run
                        while k <= se:
                            if row[k] != 0:
                                if br.read_bits(1):
                                    row[k] += (1 if row[k] > 0 else -1) << al
                            else:
                                if target == 0:
                                    break
                                target -= 1
                            k += 1
                        if newval:
                            if k > se:
                                raise ValueError("refinement overrun")
                            row[k] = newval
                            k += 1
            pos = data_end
            continue
        pos += seglen

    if frame is None:
        raise ValueError("no SOF2 frame found")
    fh, fw, nc = frame
    bh, bw2 = (fh + 7) // 8, (fw + 7) // 8
    planes = []
    for idx, c in enumerate(comps):
        q = qt[c["tq"]]
        plane = _idct_all(coef[idx], q, ZIGZAG, bh, bw2)
        planes.append(plane[:fh, :fw])

    if nc == 1:
        return "L", fw, fh, np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=-1)
    return "RGB", fw, fh, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def encode_jpeg_progressive_sa(arr: np.ndarray, quality: int = 100) -> bytes:
    """Progressive encoding with SUCCESSIVE APPROXIMATION (one
    refinement level, Al=1 → 0) on top of spectral selection: DC and
    AC band first-scans carry the point-transformed coefficients
    (÷2, truncated toward zero), then refinement scans deliver the low
    bit — DC as one raw bit per block, AC via the T.81 §G.1.2.3
    correction-bit walk (newly-significant ±1·2^Al with zero-history
    runs; every nonzero position passed consumes one correction bit).

    The AC refinement emitter SIMULATES the decoder's walk position by
    position, so the interleaving of codes, sign bits, and correction
    bits matches the read side by construction; correctness is then
    cross-checked against the independent baseline pipeline (identical
    quantized coefficients → identical pixels — see tests)."""
    if arr.dtype != np.uint8:
        raise ValueError("uint8 input required")
    grey = arr.ndim == 2
    if not grey and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("(h, w) grey or (h, w, 3) RGB")
    h, w = arr.shape[:2]
    al = 1
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if grey:
        comps = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.clip(
            np.round(-0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0), 0, 255
        )
        cr = np.clip(
            np.round(0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0), 0, 255
        )
        comps = [y, cb, cr]

    bh, bw = (h + 7) // 8, (w + 7) // 8
    zz = ZIGZAG
    blocks: list[list[np.ndarray]] = []
    for ci, c in enumerate(comps):
        q = ql if ci == 0 else qc
        p = _pad_to_blocks(c, bh * 8, bw * 8)
        rows = []
        for by in range(bh):
            for bx in range(bw):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                rows.append(
                    _fdct_quant(blk, q).reshape(64)[zz].astype(np.int64)
                )
        blocks.append(rows)

    enc_dc = [_build_huffman(*HUFF_DC_LUMA), _build_huffman(*HUFF_DC_CHROMA)]
    enc_ac = [_build_huffman(*HUFF_AC_LUMA), _build_huffman(*HUFF_AC_CHROMA)]

    def trunc2(v: int) -> int:  # toward-zero /2 (AC point transform)
        return -((-v) >> al) if v < 0 else v >> al

    # --- scan 1: DC first (arithmetic >> al), interleaved ---
    bw_ = _BitWriter()
    pred = [0] * len(comps)
    for bi in range(bh * bw):
        for ci in range(len(comps)):
            t = enc_dc[0 if ci == 0 else 1]
            dc = int(blocks[ci][bi][0]) >> al
            size, amp = _magnitude(dc - pred[ci])
            pred[ci] = dc
            code, ln = t[size]
            bw_.write(code, ln)
            if size:
                bw_.write(amp, size)
    dc_first = bw_.flush()

    # --- scan 2: DC refinement (1 raw bit per block per component) ---
    bw_ = _BitWriter()
    for bi in range(bh * bw):
        for ci in range(len(comps)):
            bw_.write(int(blocks[ci][bi][0]) & 1, 1)
    dc_refine = bw_.flush()

    # --- AC first scans (point-transformed band values) ---
    def ac_first(ci: int, ss: int, se: int) -> bytes:
        t = enc_ac[0 if ci == 0 else 1]
        out = _BitWriter()
        for coefs in blocks[ci]:
            band = [trunc2(int(coefs[k])) for k in range(ss, se + 1)]
            if not any(band):
                code, ln = t[0x00]
                out.write(code, ln)
                continue
            run = 0
            last_nz = max(i for i, v in enumerate(band) if v)
            for i, v in enumerate(band):
                if i > last_nz:
                    code, ln = t[0x00]
                    out.write(code, ln)
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = t[0xF0]
                    out.write(code, ln)
                    run -= 16
                size, amp = _magnitude(v)
                code, ln = t[(run << 4) | size]
                out.write(code, ln)
                out.write(amp, size)
                run = 0
        return out.flush()

    # --- AC refinement scans: simulate the decoder walk ---
    def ac_refine(ci: int, ss: int, se: int) -> bytes:
        t = enc_ac[0 if ci == 0 else 1]
        out = _BitWriter()
        for coefs in blocks[ci]:
            orig = [int(coefs[k]) for k in range(ss, se + 1)]
            # decoder-visible history after the first scan
            hist = [trunc2(v) << al for v in orig]
            n = len(orig)
            new_pos = [i for i in range(n) if hist[i] == 0 and orig[i] != 0]

            def corr_bit(i: int) -> int:
                return (abs(orig[i]) >> 0) & 1  # bit Al(=0 after shift)

            cursor = 0
            for p in new_pos:
                while True:
                    zcount = sum(
                        1 for i in range(cursor, p) if hist[i] == 0
                    )
                    if zcount <= 15:
                        break
                    # ZRL: walk consumes 16 zero-history positions,
                    # refining nonzero ones, stopping at the next zero.
                    code, ln = t[0xF0]
                    out.write(code, ln)
                    consumed = 0
                    i = cursor
                    while True:
                        if hist[i] == 0:
                            if consumed == 16:
                                break
                            consumed += 1
                        else:
                            out.write(corr_bit(i), 1)
                        i += 1
                    cursor = i
                zcount = sum(1 for i in range(cursor, p) if hist[i] == 0)
                code, ln = t[(zcount << 4) | 1]
                out.write(code, ln)
                out.write(1 if orig[p] > 0 else 0, 1)  # sign bit
                for i in range(cursor, p):
                    if hist[i] != 0:
                        out.write(corr_bit(i), 1)
                hist[p] = (1 << al) if orig[p] > 0 else -(1 << al)
                cursor = p + 1
            if cursor < n:  # EOB0 + correction bits for the tail
                code, ln = t[0x00]
                out.write(code, ln)
                for i in range(cursor, n):
                    if hist[i] != 0:
                        out.write(corr_bit(i), 1)
        return out.flush()

    bands = [(1, 5), (6, 63)]
    nc = len(comps)

    # --- assemble ---
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )

    def dqt(tid: int, q: np.ndarray) -> bytes:
        zzvals = q.reshape(64)[zz].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zzvals

    out += dqt(0, ql)
    if not grey:
        out += dqt(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls: int, tid: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, vals = table
        payload = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    if not grey:
        out += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)

    def sos(comps_tables, ss: int, se: int, ah: int, al_: int, data: bytes):
        hdr = bytes([len(comps_tables)])
        for cid, td, ta in comps_tables:
            hdr += bytes([cid, (td << 4) | ta])
        hdr += bytes([ss, se, (ah << 4) | al_])
        return b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr + data

    all_dc = [(i + 1, 0 if i == 0 else 1, 0) for i in range(nc)]
    out += sos(all_dc, 0, 0, 0, al, dc_first)
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        for ss_, se_ in bands:
            out += sos([(ci + 1, 0, tid)], ss_, se_, 0, al, ac_first(ci, ss_, se_))
    out += sos(all_dc, 0, 0, al, 0, dc_refine)
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        for ss_, se_ in bands:
            out += sos([(ci + 1, 0, tid)], ss_, se_, al, 0, ac_refine(ci, ss_, se_))
    out += b"\xff\xd9"
    return bytes(out)
