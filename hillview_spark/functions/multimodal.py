"""Multimodal (image/audio/video) column handling.
(Extension beyond the Hillview reference, SURVEY.md §2.4.)

Media payloads are opaque ``binary`` columns with a typed metadata
struct. Heavy per-item work (decode, resize, frame sampling,
feature extraction) runs in Arrow-batched ``mapInPandas`` — the
only sane shape at 100 TB: partitions stream through Python in
columnar batches, no per-row pickling, and the binary payload never
leaves the executor.

Decode goes through the pluggable ``DECODERS`` registry. The
'stdlib' decoder handles four REAL formats with no third-party deps:
PPM and WAV (header parsing), PNG (full zlib+filter codec), and
baseline JPEG (full DCT/Huffman codec, functions/jpeg.py). Remaining
codecs (MP3/H.264) stay behind the 'real' seam where a PIL/ffmpeg
deployment plugs in; a deterministic fake serves synthetic fixtures.
The Spark-side plumbing (schema, batching, partition flow) is
identical for all of them and is real and tested.
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("content", BinaryType()),   # opaque payload
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

_MAGIC = b"FAKE"


def make_fake_payload(media_id: int, kind: str) -> bytes:
    """Deterministic fake media payload: FAKE | kind[0] | width | height
    | nframes (little-endian u32s keyed off media_id)."""
    w = 64 + (media_id * 37) % 1920
    h = 64 + (media_id * 53) % 1080
    nf = 1 if kind == "image" else 1 + (media_id * 11) % 300
    return _MAGIC + kind[:1].encode() + _struct.pack("<III", w, h, nf)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    if payload is None or not payload.startswith(_MAGIC):
        raise ValueError("not a fake payload")
    w, h, nf = _struct.unpack("<III", payload[5:17])
    return w, h, nf


def _real_decode(payload: bytes):
    raise NotImplementedError(
        "native media decoders (MP3/H.264) are not available in this "
        "environment; register one in DECODERS (images: PNG/JPEG/PPM "
        "are real under the 'stdlib' decoder)"
    )


def _ppm_dims(payload: bytes) -> tuple[int, int, int]:
    """P6 PPM header: 'P6' then whitespace-separated width, height,
    maxval (with '#' comment lines allowed) — returns (w, h, 1)."""
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        c = payload[i : i + 1]
        if not c:
            raise ValueError("truncated PPM header")
        if c.isspace():
            i += 1
        elif c == b"#":
            i = payload.index(b"\n", i) + 1
        else:
            j = i
            while payload[j : j + 1] and not payload[j : j + 1].isspace():
                j += 1
            toks.append(int(payload[i:j]))
            i = j
    return toks[0], toks[1], 1


def _wav_dims(payload: bytes) -> tuple[int, int, int]:
    """RIFF/WAVE chunk walk: fmt chunk gives channels + sample rate +
    block align; data chunk gives payload size. Returns
    (sample_rate, n_channels, n_frames) mapped onto the probe's
    (width, height, n_frames) slots."""
    if payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    i = 12
    channels = rate = block_align = data_size = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (sz,) = _struct.unpack("<I", payload[i + 4 : i + 8])
        if cid == b"fmt ":
            (channels,) = _struct.unpack("<H", payload[i + 10 : i + 12])
            (rate,) = _struct.unpack("<I", payload[i + 12 : i + 16])
            (block_align,) = _struct.unpack("<H", payload[i + 20 : i + 22])
        elif cid == b"data":
            data_size = sz
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if None in (channels, rate, block_align, data_size):
        raise ValueError("missing fmt/data chunk")
    if block_align == 0:
        # presence-checked above, but a fuzzed fmt chunk can carry 0 —
        # keep the malformed-media contract at ValueError, not
        # ZeroDivisionError
        raise ValueError("WAVE fmt chunk has block_align=0")
    return rate, channels, data_size // block_align


# ------------------------------------------------------------- PNG
# Full PNG codec in pure stdlib (zlib + struct): chunk walk, IDAT
# inflate, per-scanline unfilter (all five filter types), and a
# filter-0 encoder — so a genuinely COMPRESSED format flows through
# probe -> resize -> features with real pixel work. 8-bit
# non-interlaced gray/gray+alpha/RGB/RGBA; exotic variants raise.
# The per-scanline Python loops are fine for test-scale payloads;
# at production scale the 'real' decoder seam plugs in native codecs.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    while i + 8 <= len(payload):
        (sz,) = _struct.unpack(">I", payload[i : i + 4])
        cid = payload[i + 4 : i + 8]
        yield cid, payload[i + 8 : i + 8 + sz]
        i += 12 + sz  # length + type + data + crc


def _png_dims(payload: bytes) -> tuple[int, int, int]:
    for cid, data in _png_chunks(payload):
        if cid == b"IHDR":
            w, h = _struct.unpack(">II", data[:8])
            return w, h, 1
    raise ValueError("PNG missing IHDR")


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode to raw pixels: (width, height, channels, row-major
    bytes). Implements the five scanline filters (None/Sub/Up/
    Average/Paeth) per the PNG spec."""
    import zlib

    w = h = color_type = None
    idat = bytearray()
    for cid, data in _png_chunks(payload):
        if cid == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = _struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    "unsupported PNG variant (8-bit non-interlaced only)"
                )
        elif cid == b"IDAT":
            idat += data
        elif cid == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        f = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if f == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG scanline filter {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)


def encode_png(w: int, h: int, ch: int, pixels: bytes) -> bytes:
    """Encode raw row-major pixels as a valid PNG (filter 0, one
    zlib-compressed IDAT, correct CRCs)."""
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(cid: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + cid
            + data
            + _struct.pack(">I", zlib.crc32(cid + data) & 0xFFFFFFFF)
        )

    stride = w * ch
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]
    return (
        _PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def encode_bmp(w: int, h: int, ch: int, pixels: bytes) -> bytes:
    """Encode raw row-major RGB pixels as a valid 24-bit Windows BMP
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding)."""
    assert ch == 3, "BMP encoder writes 24-bit RGB"
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up row order
        row = pixels[y * row_bytes : (y + 1) * row_bytes]
        # RGB -> BGR per-pixel (BMP stores little-endian channel order)
        for x in range(w):
            body += bytes((row[3 * x + 2], row[3 * x + 1], row[3 * x]))
        body += b"\x00" * pad
    dib = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    off = 14 + 40
    hdr = b"BM" + _struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + dib + bytes(body)


def encode_gif(w: int, h: int, frames: int, pixels: bytes) -> bytes:
    """Encode 8-bit indexed pixels as a valid GIF89a with a 256-entry
    grayscale global color table and `frames` full-size image
    descriptors, each carrying a spec-correct LZW stream (min code
    size 8: one CLEAR, then 9-bit literal codes, then END — the
    dictionary never reaches 512 for the tiny fixture frames, so the
    code width never grows). GIF spec §§17-22."""
    n_px = w * h
    assert len(pixels) >= n_px
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HH", w, h)
    out += bytes((0x80 | 0x07, 0, 0))  # GCT present, 2^8 entries
    for v in range(256):  # grayscale global color table
        out += bytes((v, v, v))
    clear, end = 256, 257
    for _ in range(frames):
        out += b"\x2c" + _struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(8)  # LZW minimum code size
        # bit-pack codes LSB-first at a fixed 9-bit width
        codes = [clear] + [pixels[i] for i in range(n_px)] + [end]
        assert len(codes) < 255  # width stays 9 bits
        acc = nbits = 0
        data = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += 9
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            data.append(acc & 0xFF)
        for i in range(0, len(data), 255):  # sub-block framing
            blk = data[i : i + 255]
            out.append(len(blk))
            out += blk
        out.append(0)  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def _nn_resize(payload, max_side, decode_fn, encode_fn):
    """Shared real-resize core: decode -> nearest-neighbor downsample
    -> re-encode. ONE copy of the scale / index arithmetic so a
    rounding or aspect-ratio fix applies to every codec. Returns
    (new_w, new_h, new_payload); payload unchanged when already
    within max_side."""
    import numpy as np

    w, h, ch, px = decode_fn(payload)
    scale = min(1.0, max_side / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    if (nw, nh) == (w, h):
        return w, h, payload
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
    ys = (np.arange(nh) * h) // nh
    xs = (np.arange(nw) * w) // nw
    small = arr[ys][:, xs]
    return nw, nh, encode_fn(nw, nh, ch, small.tobytes())


def resize_png(payload: bytes, max_side: int) -> tuple[int, int, bytes]:
    return _nn_resize(payload, max_side, decode_png, encode_png)


def resize_jpeg(payload: bytes, max_side: int) -> tuple[int, int, bytes]:
    from hillview_spark.functions.jpeg import decode_jpeg, encode_jpeg

    return _nn_resize(payload, max_side, decode_jpeg, encode_jpeg)


def _stdlib_resize(payload: bytes, max_side: int):
    """Registry resize capability for the stdlib decoder: real
    transform for PNG and baseline JPEG, None for containers this
    decoder can only probe (caller falls back to dims-only
    passthrough)."""
    if payload is not None and payload[:8] == _PNG_SIG:
        return resize_png(payload, max_side)
    if payload is not None and payload[:2] == b"\xff\xd8":
        return resize_jpeg(payload, max_side)
    return None


def _gif_dims(payload: bytes) -> tuple[int, int, int]:
    """GIF87a/GIF89a logical screen descriptor (GIF spec §18): width
    and height as little-endian u16 at offsets 6 and 8. Frame count
    = number of image descriptors (0x2C introducers at block level) —
    a block-level walk, not a byte scan, so 0x2C inside pixel data
    can't inflate the count."""
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    (w, h) = _struct.unpack("<HH", payload[6:10])
    i = 13
    flags = payload[10]
    if flags & 0x80:  # global color table present
        i += 3 * (2 << (flags & 0x07))
    frames = 0
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(payload) and payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            frames += 1
            if i + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            lflags = payload[i + 9]
            i += 10
            if lflags & 0x80:  # local color table
                i += 3 * (2 << (lflags & 0x07))
            i += 1  # LZW minimum code size
            while i < len(payload) and payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        else:
            raise ValueError("bad GIF block introducer")
    if frames == 0:
        raise ValueError("GIF has no image descriptor")
    return w, h, frames


def _bmp_dims(payload: bytes) -> tuple[int, int, int]:
    """BMP BITMAPINFOHEADER (Windows DIB): signed little-endian i32
    width/height at offset 18; a negative height means top-down row
    order (same pixels, |height| rows). The DIB header size at offset
    14 gates the parse: a BITMAPCOREHEADER (OS/2, size 12) stores u16
    dims at that offset instead — reading i32 there would yield large
    garbage dims that pass the sanity check, so anything below the
    40-byte BITMAPINFOHEADER quarantines as unparseable."""
    if len(payload) < 26:
        raise ValueError("truncated BMP header")
    (dib_size,) = _struct.unpack("<I", payload[14:18])
    if dib_size < 40:
        raise ValueError("unsupported BMP DIB header (BITMAPCOREHEADER)")
    (w, h) = _struct.unpack("<ii", payload[18:26])
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    return w, abs(h), 1


def _stdlib_decode(payload: bytes) -> tuple[int, int, int]:
    """Real-format decoder with no third-party deps: P6 PPM,
    RIFF/WAVE, GIF (with a block-level frame count), and BMP headers
    byte-for-byte, full PNG (zlib inflate + scanline unfilter), and
    baseline JPEG (full DCT/Huffman codec, functions/jpeg.py).
    Remaining codecs (MP3/H.264) belong to the 'real' slot."""
    if payload is None:
        raise ValueError("null payload")
    if payload[:2] == b"P6":
        return _ppm_dims(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_dims(payload)
    if payload[:2] == b"BM":
        return _bmp_dims(payload)
    if payload[:4] == b"RIFF":
        return _wav_dims(payload)
    if payload[:8] == _PNG_SIG:
        return _png_dims(payload)
    if payload[:2] == b"\xff\xd8":
        from hillview_spark.functions.jpeg import jpeg_dims

        w, h, _ch = jpeg_dims(payload)
        return w, h, 1
    raise ValueError("unrecognized media container")


# Pluggable decode registry — 'fake' for deterministic fixtures,
# 'stdlib' for real PPM/WAV bytes, 'real' as the seam where a
# PIL/ffmpeg-backed deployment plugs in.
DECODERS = {"fake": _fake_decode, "stdlib": _stdlib_decode, "real": _real_decode}
# Optional per-decoder resize capability: fn(payload, max_side) ->
# (w, h, payload) or None when the format is probe-only. Deployments
# registering a 'real' decoder register its resizer here too —
# otherwise resize_images falls back to dims-only passthrough for it.
RESIZERS = {"stdlib": _stdlib_resize}

PROBE_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, n_bytes long"
)


def probe_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode headers → dimensions/frame counts. mapInPandas streams
    Arrow batches; each batch is decoded vectorized in Python.

    A payload the decoder can't parse (NULL, truncated header, wrong
    magic, corrupt chunk) probes to NULL dims — quarantined, not
    job-fatal: at 100 TB a corpus WILL contain broken files, and the
    engine-wide missing-on-parse-failure convention applies (the
    reference accounts parse errors the same way, ParseErrorsSketch).
    NULL-dims rows stay in the output so dims_histogram and callers
    can COUNT the breakage instead of silently dropping it. Only
    parse-level errors are caught; a missing decoder (the declared
    'real' MP3/H.264 seam, NotImplementedError) still raises."""
    decode = DECODERS[decoder]

    def _safe(p):
        try:
            return decode(p)
        except NotImplementedError:
            raise
        except Exception:
            return (None, None, None)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_safe(p) for p in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    # na_action: a NULL payload has no byte length
                    # (len(None) would raise)
                    "n_bytes": pdf["content"].map(len, na_action="ignore"),
                }
            )

    # select the three read columns BEFORE the Arrow map —
    # mapInPandas is a column-pruning barrier, so a wider media
    # table (extra metadata columns) would otherwise ship every
    # column through the Python worker
    return df.select("media_id", "kind", "content").mapInPandas(
        run, PROBE_SCHEMA
    )


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media payloads derived from a key column —
    the driver-gate multimodal fixture (and a codec load generator):
    id % 4 picks the container — 0: real PNG (encode_png: zlib IDAT,
    CRCs), 1: real baseline JPEG (functions/jpeg.py: DCT + Huffman),
    2: real GIF89a (encode_gif: block-structured LZW, 1 + id % 3
    frames), 3: real 24-bit BMP (encode_bmp) — so the gate hash
    exercises all four header probes. Dimensions stay a CLOSED FORM
    of the key (w = 1 + abs(id) % 13, h = 1 + abs(id) % 7; abs folds
    SQL's sign-of-dividend modulo onto Python's) with a fixed
    per-id pixel pattern. An
    out-of-engine oracle re-derives the expected dims arithmetically,
    while the Spark side must round-trip real bytes — encode here,
    header-parse in probe_media — to agree, so a corrupted encoder or
    prober surfaces as a gate mismatch. Only the id column is read
    (column pruning reaches the scan); payload build is Arrow-batched
    mapInPandas, one row per input row, no shuffle."""
    from hillview_spark.functions.jpeg import encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            kinds, payloads = [], []
            for i in ids:
                # abs(): Python % returns non-negative values while
                # SQL % follows the dividend's sign — without the
                # fold a negative id would give the two engines
                # different closed-form dims (and a negative Python
                # modulo would crash the encoders)
                i = abs(int(i))
                w, h = 1 + i % 13, 1 + i % 7
                px = bytes((x * 31 + i) % 256 for x in range(w * h * 3))
                r = i % 4
                if r == 0:
                    kinds.append("png")
                    payloads.append(encode_png(w, h, 3, px))
                elif r == 1:
                    kinds.append("jpeg")
                    payloads.append(encode_jpeg(w, h, 3, px))
                elif r == 2:
                    kinds.append("gif")
                    payloads.append(encode_gif(w, h, 1 + i % 3, px))
                else:
                    kinds.append("bmp")
                    payloads.append(encode_bmp(w, h, 3, px))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "content": payloads}
            )

    return df.select(id_col).mapInPandas(
        run, "media_id long, kind string, content binary"
    )


def dims_histogram(media: DataFrame, decoder: str = "stdlib") -> DataFrame:
    """Resolution histogram over a media-payload table: probe every
    payload's container header, then count by (kind, width, height)
    — the 'what resolutions are in my corpus' sketch a multimodal
    training pipeline runs before bucketing resize work. One scan,
    Arrow-batched header decode, O(distinct dims) shuffle after
    map-side combine — the same sketch shape as histogram2d."""
    return (
        probe_media(media, decoder)
        .groupBy("kind", "width", "height")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _safe_decode(decode):
    """Wrap a decoder with the probe_media quarantine: parse-level
    failures (corrupt/truncated/NULL payloads) return NULL dims
    instead of killing the scan; a missing decoder (the declared
    native-codec seam) still raises."""

    def safe(p):
        try:
            return decode(p)
        except NotImplementedError:
            raise
        except Exception:
            return (None, None, None)

    return safe


RESIZE_SCHEMA = "media_id long, width int, height int, content binary"


def resize_images(df: DataFrame, max_side: int, decoder: str = "fake") -> DataFrame:
    """Resize images to fit max_side. PNG and JPEG payloads under the
    stdlib decoder get the REAL transform (decode ->
    nearest-neighbor downsample -> re-encode, pure stdlib/numpy);
    other containers compute target dims and pass the payload
    through (the stubbed seam where native codecs plug in).
    Partition/batch flow is identical either way: Arrow batches
    through mapInPandas."""
    decode = DECODERS[decoder]
    resizer = RESIZERS.get(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w, out_h, out_c = [], [], []
            for p in pdf["content"]:
                # registry seam: a decoder's resize capability (when
                # registered) handles the formats it can transform;
                # None means dims-only passthrough below. An
                # undecodable payload (corrupt/NULL) quarantines to
                # NULL dims with the payload passed through untouched
                # — callers see WHICH rows failed instead of losing
                # the whole 100-TB scan to one broken file.
                try:
                    r = (
                        resizer(p, max_side)
                        if resizer and p is not None
                        else None
                    )
                    if r is not None:
                        nw, nh, np_ = r
                        out_w.append(nw)
                        out_h.append(nh)
                        out_c.append(np_)
                        continue
                    w, h, _ = decode(p)
                except NotImplementedError:
                    raise
                except Exception:
                    out_w.append(None)
                    out_h.append(None)
                    out_c.append(p)
                    continue
                scale = min(1.0, max_side / max(w, h))
                # max(1, ...) like resize_png/resize_jpeg: an extreme
                # aspect ratio must not emit a zero dimension
                out_w.append(max(1, int(w * scale)))
                out_h.append(max(1, int(h * scale)))
                out_c.append(p)  # stub: payload passthrough
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "content": out_c,
                }
            )

    # pruning-barrier guard: only the id + payload cross into Python
    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(run, RESIZE_SCHEMA)
    )


FRAMES_SCHEMA = "media_id long, frame_idx int"


def sample_frames(df: DataFrame, every_n: int = 30, decoder: str = "fake") -> DataFrame:
    """Frame sampling plumbing for video: one output row per sampled
    frame index (frame extraction itself is the stubbed decode)."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            safe = _safe_decode(decode)
            for mid, p in zip(pdf["media_id"], pdf["content"]):
                _, _, nf = safe(p)
                if nf is None:
                    # undecodable video: one (id, NULL) marker row so
                    # the breakage is countable, not silently dropped
                    ids.append(mid)
                    idxs.append(None)
                    continue
                for i in range(0, nf, every_n):
                    ids.append(mid)
                    idxs.append(i)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs})

    # pruning-barrier guard: only the id + payload cross into Python
    return (
        df.where(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(run, FRAMES_SCHEMA)
    )


FEATURES_SCHEMA = "media_id long, kind string, features array<float>"


def extract_features(
    df: DataFrame, dim: int = 64, decoder: str = "fake"
) -> DataFrame:
    """Per-item feature embedding — the decode -> embed stage every
    multimodal training pipeline runs before similarity search /
    dedup. The Spark shape is the real thing: Arrow batches stream
    through mapInPandas, each batch is embedded vectorized, and the
    output array<float> column feeds directly into
    functions/similarity.py (knn_join, cosine_dup_pairs, ann_lsh).

    The embedding itself is decoder-dependent: with no ML runtime in
    this environment it is a deterministic projection of the decoded
    header fields plus a content-hash spread — a stand-in with the
    same schema/batch shape a CLIP/wav2vec encoder would have."""
    import hashlib

    import numpy as np

    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            safe = _safe_decode(decode)
            for p in pdf["content"]:
                w, h, nf = safe(p)
                if w is None:
                    # undecodable payload embeds to NULL — it drops
                    # out of downstream similarity exactly like a
                    # malformed vector (NULL cosine/bucket)
                    feats.append(None)
                    continue
                digest = hashlib.md5(p if p is not None else b"").digest()
                seed = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
                base = np.concatenate(
                    [[w, h, nf], np.tile(seed, (dim // 4) + 1)[: dim - 3]]
                )
                # fixed deterministic normalization, unit-norm output
                vec = np.cos(base * 0.1 + np.arange(dim) * 0.7)
                feats.append((vec / np.linalg.norm(vec)).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    # pruning-barrier guard (see probe_media)
    return df.select("media_id", "kind", "content").mapInPandas(
        run, FEATURES_SCHEMA
    )
