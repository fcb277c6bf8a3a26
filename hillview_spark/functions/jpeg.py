"""Baseline JPEG codec in pure numpy/stdlib — no third-party deps.

Implements the baseline sequential DCT process of ITU-T T.81 (the
public JPEG spec): 8x8 block DCT, Annex K quantization + Huffman
tables, zigzag run-length entropy coding, JFIF container. Supports
grayscale and YCbCr color with 4:4:4 or 4:2:0 subsampling, and
restart intervals on decode. Progressive/arithmetic/12-bit variants
raise cleanly.

Used by functions/multimodal.py as a real compressed-image codec in
the DECODERS registry (alongside PNG/PPM/WAV): probe, resize, and
feature stages run genuine decode work on JPEG payloads. The
per-coefficient Huffman loops are Python-speed — fine for the
test-scale payloads here; a production deployment swaps the 'real'
decoder seam for native codecs, keeping the same Spark plumbing.
"""

from __future__ import annotations

import struct as _struct

import numpy as np

# ---------------------------------------------------------- constants
# (all from ITU-T T.81 Annex K — public specification tables)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# (bits[1..16], values) per Annex K.3
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
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
AC_CHROMA_SPEC = (
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

# orthonormal 8x8 DCT-II matrix: coeffs = M @ block @ M.T
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8) if _u == 0 else np.sqrt(2.0 / 8)
    for _x in range(8):
        _DCT_M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-convention quality scaling of a base quant table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        # drop the drained high bits: without the mask the accumulator
        # grows to the whole stream length and every shift above turns
        # O(n) — encode was measured QUADRATIC (256x256 noise: 11.7s;
        # with the mask the arithmetic stays word-sized) (r10 review)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    cat = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qtab: np.ndarray,
    dc_codes, ac_codes, pred: int,
) -> int:
    coef = _DCT_M @ (block - 128.0) @ _DCT_M.T
    q = np.round(coef / qtab).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    cat, bits = _magnitude(dc - pred)
    code, length = dc_codes[cat]
    bw.write(code, length)
    if cat:
        bw.write(bits, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        if i > last_nz:
            code, length = ac_codes[0x00]  # EOB
            bw.write(code, length)
            break
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        cat, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | cat]
        bw.write(code, length)
        bw.write(bits, cat)
        run = 0
    return dc


def _blocks_of(plane: np.ndarray):
    """Yield 8x8 blocks in raster order, edge-padding to multiples."""
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            yield padded[by : by + 8, bx : bx + 8].astype(np.float64)


def encode_jpeg(
    w: int, h: int, ch: int, pixels: bytes,
    quality: int = 85, subsampling: str = "444",
) -> bytes:
    """Encode raw row-major 8-bit pixels (ch=1 gray, ch=3 RGB) as a
    baseline JFIF JPEG. subsampling: '444' or '420' (color only)."""
    if ch not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, ch).astype(np.float64)

    qluma = _quality_scale(QUANT_LUMA, quality)
    qchroma = _quality_scale(QUANT_CHROMA, quality)
    dcl = _canonical_codes(*DC_LUMA_SPEC)
    acl = _canonical_codes(*AC_LUMA_SPEC)
    dcc = _canonical_codes(*DC_CHROMA_SPEC)
    acc = _canonical_codes(*AC_CHROMA_SPEC)

    if ch == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            H2, W2 = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, H2 - h), (0, W2 - w)), mode="edge")
            crp = np.pad(cr, ((0, H2 - h), (0, W2 - w)), mode="edge")
            cb = cbp.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
    else:
        planes = [arr[..., 0]]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + _struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + _struct.pack(">HHBB", 1, 1, 0, 0)  # APP0, 1:1 aspect, no thumb

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        zz = tab.reshape(-1)[ZIGZAG].astype(np.uint8)
        return b"\xff\xdb" + _struct.pack(">HB", 67, tid) + zz.tobytes()

    out += dqt(0, qluma)
    if ch == 3:
        out += dqt(1, qchroma)

    # SOF0: baseline sequential
    if ch == 3 and subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * ch
    sof = _struct.pack(">BHHB", 8, h, w, ch)
    for i in range(ch):
        sof += _struct.pack(
            "BBB", i + 1, (samp[i][0] << 4) | samp[i][1], 0 if i == 0 else 1
        )
    out += b"\xff\xc0" + _struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        body = bytes([(cls << 4) | tid] + bits + vals)
        return b"\xff\xc4" + _struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, DC_LUMA_SPEC) + dht(1, 0, AC_LUMA_SPEC)
    if ch == 3:
        out += dht(0, 1, DC_CHROMA_SPEC) + dht(1, 1, AC_CHROMA_SPEC)

    sos = _struct.pack("B", ch)
    for i in range(ch):
        sos += _struct.pack("BB", i + 1, 0x00 if i == 0 else 0x11)
    sos += b"\x00\x3f\x00"  # Ss, Se, Ah/Al
    out += b"\xff\xda" + _struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    if ch == 1 or subsampling == "444":
        # MCU = one block per component
        iters = [_blocks_of(p) for p in planes]
        preds = [0] * ch
        tabs = [(qluma, dcl, acl)] + [(qchroma, dcc, acc)] * (ch - 1)
        n_mcus = ((h + 7) // 8) * ((w + 7) // 8)
        for _ in range(n_mcus):
            for ci in range(ch):
                qt, dct_, act_ = tabs[ci]
                preds[ci] = _encode_block(
                    bw, next(iters[ci]), qt, dct_, act_, preds[ci]
                )
    else:
        # 4:2:0: MCU = 2x2 luma blocks + 1 Cb + 1 Cr
        y, cb, cr = planes
        H16, W16 = (h + 15) // 16 * 16, (w + 15) // 16 * 16
        yp = np.pad(y, ((0, H16 - h), (0, W16 - w)), mode="edge")
        ch8, cw8 = H16 // 2, W16 // 2
        cbp = np.pad(cb, ((0, ch8 - cb.shape[0]), (0, cw8 - cb.shape[1])), mode="edge")
        crp = np.pad(cr, ((0, ch8 - cr.shape[0]), (0, cw8 - cr.shape[1])), mode="edge")
        preds = [0, 0, 0]
        for my in range(0, H16, 16):
            for mx in range(0, W16, 16):
                for sy in (0, 8):
                    for sx in (0, 8):
                        blk = yp[my + sy : my + sy + 8, mx + sx : mx + sx + 8]
                        preds[0] = _encode_block(bw, blk, qluma, dcl, acl, preds[0])
                cy, cx = my // 2, mx // 2
                preds[1] = _encode_block(
                    bw, cbp[cy : cy + 8, cx : cx + 8], qchroma, dcc, acc, preds[1]
                )
                preds[2] = _encode_block(
                    bw, crp[cy : cy + 8, cx : cx + 8], qchroma, dcc, acc, preds[2]
                )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------- decoder

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RST markers
    are surfaced to the caller via align_to_marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        # mask consumed high bits — same quadratic-growth fix as
        # _BitWriter.write (read_bit only decrements nbits; the bits
        # above nbits are dead but used to keep widening the shifts)
        self.acc &= (1 << self.nbits) - 1

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

    def sync_restart(self) -> None:
        """Byte-align and consume the 2-byte restart marker."""
        self.acc = 0
        self.nbits = 0
        if (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _build_decode_table(bits: list[int], values: list[int]):
    """(length, code) -> symbol lookup: the encoder's canonical table
    with key/value inverted (ONE canonical construction — a fix to
    the code assignment applies to both directions)."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, values).items()
    }


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def jpeg_dims(payload: bytes) -> tuple[int, int, int]:
    """Cheap probe: walk markers to SOF0/1, return (w, h, channels)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad marker stream")
        # T.81 B.1.1.2: any marker may be preceded by any number of
        # 0xFF fill bytes (real encoders emit them) — skip them, or a
        # spec-legal file misparses the next two bytes as a segment
        # length and gets falsely quarantined (r10 review)
        while i + 4 <= len(payload) and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        if marker in (0xC0, 0xC1):
            h, w = _struct.unpack(">HH", payload[i + 5 : i + 9])
            ncomp = payload[i + 9]
            return w, h, ncomp
        if marker in (0xC2, 0xC3, 0xC9, 0xCA):
            raise ValueError("only baseline JPEG supported")
        if marker == 0xD9:
            break
        (seg,) = _struct.unpack(">H", payload[i + 2 : i + 4])
        i += 2 + seg
    raise ValueError("JPEG missing SOF")


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to (width, height, channels, row-major
    8-bit pixel bytes). Channels: 1 (gray) or 3 (RGB).

    Error contract: ALL malformed input (truncated entropy data,
    lying segment lengths, bad markers) raises ValueError — a corpus
    job quarantining bad media with except-ValueError must not be
    broken by a raw IndexError escaping the bit reader. r10 review
    widened the net with three reproduced escapes: EOFError (entropy
    data truncated before EOI), KeyError (SOS referencing a Huffman
    table no DHT defined), ZeroDivisionError (fuzzed SOF sampling
    byte 0x00)."""
    try:
        return _decode_jpeg_unchecked(payload)
    except (
        IndexError, _struct.error, EOFError, KeyError, ZeroDivisionError,
    ) as e:
        raise ValueError(f"truncated or corrupt JPEG: {e!r}") from e


def _decode_jpeg_unchecked(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    comps = None  # list of dicts: id, h, v, tq
    w = h = None
    i = 2
    while True:
        if payload[i] != 0xFF:
            raise ValueError("bad marker stream")
        # skip T.81 fill bytes (see jpeg_dims)
        while payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:
            raise ValueError("no scan data")
        (seg,) = _struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + seg]
        if marker == 0xDB:  # DQT (may hold several tables)
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                tab = np.zeros(64)
                tab[ZIGZAG] = zz
                qtabs[tid] = tab.reshape(8, 8)
                j += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = _struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            # only grayscale / YCbCr baseline: a 4-component Adobe
            # CMYK file would otherwise silently decode YCCK planes
            # through YCbCr math, drop K, and return garbage claimed
            # as valid RGB; a 2-component file hit IndexError and was
            # mislabeled 'truncated' (r10 review)
            if ncomp not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG component count {ncomp} "
                    "(only 1=grayscale, 3=YCbCr baseline)"
                )
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC9, 0xCA):
            raise ValueError("only baseline JPEG supported")
        elif marker == 0xC4:  # DHT (may hold several tables)
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                vals = list(body[j + 17 : j + 17 + n])
                htabs[(cls, tid)] = _build_decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = _struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tabsel = body[1 + 2 * c : 3 + 2 * c]
                scan.append((cid, tabsel >> 4, tabsel & 0xF))
            data_start = i + 2 + seg
            break
        i += 2 + seg
    if comps is None or w is None:
        raise ValueError("JPEG missing SOF before SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    by_id = {c["id"]: k for k, c in enumerate(comps)}
    scan_tabs = []
    for cid, dc_id, ac_id in scan:
        scan_tabs.append(
            (by_id[cid], htabs[(0, dc_id)], htabs[(1, ac_id)])
        )

    br = _BitReader(payload, data_start)
    preds = [0] * len(comps)
    n_mcus = mcux * mcuy
    mcu = 0
    while mcu < n_mcus:
        if restart_interval and mcu and mcu % restart_interval == 0:
            br.sync_restart()
            preds = [0] * len(comps)
        try:
            my, mx = divmod(mcu, mcux)
            for ci, dct_, act_ in scan_tabs:
                c = comps[ci]
                qt = qtabs[c["tq"]]
                for sy in range(c["v"]):
                    for sx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        cat = _read_symbol(br, dct_)
                        diff = _extend(br.read_bits(cat), cat) if cat else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, act_)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            cat = rs & 0xF
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(cat), cat)
                            k += 1
                        coef = np.zeros(64)
                        coef[ZIGZAG] = zz
                        block = _DCT_M.T @ (coef.reshape(8, 8) * qt) @ _DCT_M
                        py = (my * c["v"] + sy) * 8
                        px = (mx * c["h"] + sx) * 8
                        planes[ci][py : py + 8, px : px + 8] = block + 128.0
            mcu += 1
        except _RestartMarker:
            # RST arrived earlier than the declared interval — resync,
            # reset predictors, and retry the current MCU
            br.sync_restart()
            preds = [0] * len(comps)

    # upsample to full resolution and convert color
    full = []
    for k, c in enumerate(comps):
        p = planes[k]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, out.tobytes()
