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

# Two `kind` vocabularies coexist: MEDIA_SCHEMA's coarse classes
# (image | audio | video) for real media tables, and
# synthesize_media's CONTAINER names (png/jpeg/gif/bmp/mp3/h264 — the
# per-container gate fixture, whose dims histogram is keyed by
# container). Kind-filtering consumers accept BOTH, otherwise
# composing the fixture with resize_images/sample_frames silently
# returned empty (r10 review).
_IMAGE_KINDS = ("image", "png", "jpeg", "gif", "bmp", "ppm")
_VIDEO_KINDS = ("video", "h264")


def make_fake_payload(media_id: int, kind: str) -> bytes:
    """Deterministic fake media payload: FAKE | kind[0] | width | height
    | nframes (little-endian u32s keyed off media_id)."""
    w = 64 + (media_id * 37) % 1920
    h = 64 + (media_id * 53) % 1080
    nf = 1 if kind == "image" else 1 + (media_id * 11) % 300
    return _MAGIC + kind[:1].encode() + _struct.pack("<III", w, h, nf)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    if payload is None or not payload.startswith(_MAGIC) or len(payload) < 17:
        # length-checked: a truncated FAKE payload must raise the
        # contract ValueError, not struct.error (r10 review)
        raise ValueError("not a fake payload")
    w, h, nf = _struct.unpack("<III", payload[5:17])
    return w, h, nf


def _real_decode(payload: bytes):
    raise NotImplementedError(
        "full-fidelity native decode (pixel/sample data for MP3 audio "
        "or H.264 video) is not available in this environment; "
        "register a PIL/ffmpeg-backed decoder in DECODERS. Header "
        "PROBES for every supported container — including MP3 frame "
        "walks and H.264 SPS parsing — are real under 'stdlib'."
    )


# ------------------------------------------------------------- MP3
# MPEG audio frame-header walk (ISO/IEC 11172-3 / 13818-3 public
# tables): no third-party deps — sync on 0xFFE, read version/layer/
# bitrate/samplerate/padding, hop frame to frame by the computed
# frame length. Probe slots mirror _wav_dims: (sample_rate,
# n_channels, n_frames).

_MP3_BITRATES = {
    # (version_group, layer) -> kbps table indexed by bitrate_index
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
}
_MP3_RATES = {  # version bits (00=2.5, 10=2, 11=1) -> Hz table
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}


def _mp3_frame(payload: bytes, i: int):
    """Parse one MPEG audio frame header at offset i; returns
    (rate, channels, frame_bytes) or raises ValueError."""
    if i + 4 > len(payload):
        raise ValueError("truncated MP3 frame header")
    b1, b2, b3 = payload[i + 1], payload[i + 2], payload[i + 3]
    if payload[i] != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError("lost MP3 frame sync")
    ver_bits = (b1 >> 3) & 0x03          # 00=MPEG2.5, 10=MPEG2, 11=MPEG1
    layer_bits = (b1 >> 1) & 0x03        # 01=III, 10=II, 11=I
    if ver_bits == 1 or layer_bits == 0:
        raise ValueError("reserved MPEG version/layer")
    layer = 4 - layer_bits               # 1, 2, or 3
    vgroup = 1 if ver_bits == 3 else 2
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("free/bad bitrate or reserved sample rate")
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx] * 1000
    rate = _MP3_RATES[ver_bits][sr_idx]
    padding = (b2 >> 1) & 0x01
    channels = 1 if ((b3 >> 6) & 0x03) == 3 else 2
    if layer == 1:
        frame_bytes = (12 * bitrate // rate + padding) * 4
    else:
        # layer III halves samples-per-frame under MPEG2/2.5
        factor = 144 if (layer == 2 or vgroup == 1) else 72
        frame_bytes = factor * bitrate // rate + padding
    return rate, channels, frame_bytes


def _mp3_dims(payload: bytes) -> tuple[int, int, int]:
    """MP3 probe: skip an optional ID3v2 tag (syncsafe length), then
    walk frame headers to a (sample_rate, n_channels, n_frames)
    triple, mapped onto the probe's (width, height, n_frames) slots
    like _wav_dims. A payload that loses sync mid-walk is malformed
    (ValueError -> the probe quarantine)."""
    i = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 tag")
        sz = 0
        for b in payload[6:10]:  # syncsafe: 7 bits per byte
            if b & 0x80:
                raise ValueError("bad ID3v2 syncsafe length")
            sz = (sz << 7) | b
        i = 10 + sz
        # footer flag (ID3v2.4 §3.1, header byte 5 bit 0x10): the tag
        # is followed by a 10-byte footer copy not counted in the
        # syncsafe size — without this adjustment a footered tag
        # quarantined the whole (valid) file as lost sync
        if payload[5] & 0x10:
            i += 10
    rate = channels = None
    frames = 0
    while i + 4 <= len(payload):
        # a trailing 128-byte ID3v1 'TAG' block after >=1 valid frame
        # is the classic real-world MP3 tail, not lost sync
        if frames and payload[i : i + 3] == b"TAG" and len(payload) - i == 128:
            break
        r, c, nbytes = _mp3_frame(payload, i)
        if i + nbytes > len(payload):
            # a frame header promising bytes past EOF is corruption,
            # not a shorter last frame — quarantine, don't count it
            raise ValueError("truncated final MP3 frame")
        if rate is None:
            rate, channels = r, c
        elif (r, c) != (rate, channels):
            raise ValueError("MP3 stream changes rate/channels mid-file")
        frames += 1
        i += nbytes
    if frames == 0:
        raise ValueError("no MP3 frames")
    return rate, channels, frames


# ------------------------------------------------------------ H.264
# Annex-B NAL walk + SPS parse (ITU-T H.264 §7.3.2.1): start-code
# scan, emulation-prevention removal, Exp-Golomb bit reader, and the
# SPS field sequence down to pic_width/height + cropping. Frame count
# = slice NALs (types 1/5) with first_mb_in_slice == 0.


class _BitReader:
    def __init__(self, data: bytes):
        self.d, self.pos = data, 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.d[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _h264_nals(payload: bytes):
    """Yield (nal_type, rbsp_bytes) for each Annex-B NAL unit, with
    emulation-prevention bytes (00 00 03) removed."""
    i, n = 0, len(payload)
    starts = []
    while i + 3 <= n:
        if payload[i : i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("no H.264 start codes")
    for s, e in zip(starts, starts[1:] + [n + 3]):
        # strip the next start code (and its 0-byte prefix) off the
        # end; the n+3 sentinel makes the final NAL end at n
        end = e - 3
        while end > s and payload[end - 1] == 0:
            end -= 1
        nal = payload[s:end]
        if not nal:
            continue
        rbsp = nal[1:].replace(b"\x00\x00\x03", b"\x00\x00")
        yield nal[0] & 0x1F, rbsp


def _h264_sps_dims(rbsp: bytes) -> tuple[int, int]:
    br = _BitReader(rbsp)
    profile = br.u(8)
    br.u(8)  # constraint flags + reserved
    br.u(8)  # level_idc
    br.ue()  # seq_parameter_set_id
    chroma = 1
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
                   134, 135):
        chroma = br.ue()
        if chroma == 3:
            br.u(1)  # separate_colour_plane_flag
        br.ue()  # bit_depth_luma_minus8
        br.ue()  # bit_depth_chroma_minus8
        br.u(1)  # qpprime_y_zero_transform_bypass_flag
        if br.u(1):  # seq_scaling_matrix_present_flag
            raise ValueError("SPS scaling matrices unsupported in probe")
    br.ue()  # log2_max_frame_num_minus4
    poc_type = br.ue()
    if poc_type == 0:
        br.ue()
    elif poc_type == 1:
        br.u(1)
        br.se()
        br.se()
        for _ in range(br.ue()):
            br.se()
    br.ue()  # max_num_ref_frames
    br.u(1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = br.ue() + 1
    h_units = br.ue() + 1
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        br.u(1)  # mb_adaptive_frame_field_flag
    br.u(1)  # direct_8x8_inference_flag
    width = w_mbs * 16
    height = (2 - frame_mbs_only) * h_units * 16
    if br.u(1):  # frame_cropping_flag
        cl, cr, ct, cb = br.ue(), br.ue(), br.ue(), br.ue()
        # 4:2:0 crop units: x2 horizontally, x2 (xframe factor) vert.
        cx = 2 if chroma in (1, 2) else 1
        cy = (2 if chroma == 1 else 1) * (2 - frame_mbs_only)
        width -= (cl + cr) * cx
        height -= (ct + cb) * cy
    return width, height


def _h264_dims(payload: bytes) -> tuple[int, int, int]:
    """H.264 Annex-B probe: (width, height) from the first SPS,
    n_frames = slice NALs (type 1/5) whose first_mb_in_slice is 0
    (one per picture)."""
    dims = None
    frames = 0
    for nal_type, rbsp in _h264_nals(payload):
        if nal_type == 7 and dims is None:
            dims = _h264_sps_dims(rbsp)
        elif nal_type in (1, 5) and rbsp:
            if _BitReader(rbsp).ue() == 0:  # first_mb_in_slice
                frames += 1
    if dims is None:
        raise ValueError("no SPS NAL in H.264 stream")
    if frames == 0:
        raise ValueError("no slice NALs in H.264 stream")
    return dims[0], dims[1], frames


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


def encode_mp3(n_frames: int, id3_pad: int = 0) -> bytes:
    """Emit a valid MPEG1 Layer III stream: an optional ID3v2.3 tag
    (`id3_pad` filler bytes, syncsafe length — exercises the probe's
    tag skip in-gate) followed by `n_frames` frames at 128 kbps /
    44100 Hz stereo, each a real 4-byte header (sync 0xFFFB, bitrate
    index 9, sample-rate index 0) plus zero side-info/main data —
    silence as far as any decoder cares, but every field the
    frame-walk probe reads (ISO/IEC 11172-3 header tables) is live.
    _mp3_dims maps it to (44100, 2, n_frames)."""
    assert n_frames >= 1 and 0 <= id3_pad < 128
    out = bytearray()
    if id3_pad:
        out += b"ID3\x03\x00\x00" + bytes((0, 0, 0, id3_pad))
        out += b"\x00" * id3_pad
    frame_bytes = 144 * 128000 // 44100  # 417
    for _ in range(n_frames):
        out += b"\xff\xfb\x90\x00" + b"\x00" * (frame_bytes - 4)
    return bytes(out)


class _BitWriter:
    """MSB-first bit packer with Exp-Golomb, the SPS-writing inverse
    of _BitReader (ITU-T H.264 §7.3/§9.1)."""

    def __init__(self):
        self.bits: list[int] = []

    def u(self, n: int, v: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def ue(self, v: int) -> None:
        n = (v + 1).bit_length()
        self.u(n - 1, 0)
        self.u(n, v + 1)

    def rbsp(self) -> bytes:
        # rbsp_stop_one_bit + byte alignment
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        return bytes(
            sum(b << (7 - j) for j, b in enumerate(bits[i : i + 8]))
            for i in range(0, len(bits), 8)
        )


def encode_h264(width: int, height: int, n_frames: int) -> bytes:
    """Emit a parseable H.264 Annex-B stream: one baseline-profile
    SPS NAL carrying the real Exp-Golomb field sequence down to
    pic_width/height (macroblock-aligned, no cropping) and `n_frames`
    IDR slice NALs with first_mb_in_slice == 0 — everything
    _h264_dims walks, nothing a full decoder would accept as coded
    picture data (the sample-decode seam stays 'real')."""
    assert width % 16 == 0 and height % 16 == 0 and n_frames >= 1
    bw = _BitWriter()
    bw.u(8, 66)   # profile_idc: Baseline (no chroma branch)
    bw.u(8, 0)    # constraint flags + reserved
    bw.u(8, 30)   # level_idc
    bw.ue(0)      # seq_parameter_set_id
    bw.ue(0)      # log2_max_frame_num_minus4
    bw.ue(0)      # pic_order_cnt_type -> log2_max_poc_lsb_minus4
    bw.ue(0)
    bw.ue(1)      # max_num_ref_frames
    bw.u(1, 0)    # gaps_in_frame_num_value_allowed_flag
    bw.ue(width // 16 - 1)    # pic_width_in_mbs_minus1
    bw.ue(height // 16 - 1)   # pic_height_in_map_units_minus1
    bw.u(1, 1)    # frame_mbs_only_flag
    bw.u(1, 1)    # direct_8x8_inference_flag
    bw.u(1, 0)    # frame_cropping_flag
    bw.u(1, 0)    # vui_parameters_present_flag
    sps = bw.rbsp()
    # the tiny field values above can't produce 16 consecutive zero
    # bits, so no emulation-prevention bytes are needed — assert it
    # rather than silently emitting a start-code collision
    assert b"\x00\x00" not in sps
    out = bytearray(b"\x00\x00\x01\x67") + sps
    for _ in range(n_frames):
        # 0x65: nal_ref_idc 3, type 5 (IDR); rbsp 0x88 leads with a
        # 1-bit -> first_mb_in_slice ue(0)
        out += b"\x00\x00\x01\x65\x88\x84"
    return bytes(out)


def _fit_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Target dims fitting max_side, aspect preserved — THE one copy
    of the scale arithmetic (resize_images' stub path uses it too).
    INTEGER math (r10 review): the old int(w * (max_side / w))
    float-truncated to max_side - 1 for many inputs (49 @ 32 -> 31),
    splitting one logical resolution bucket into two; the long side
    now lands exactly on max_side whenever downscaling happens."""
    long_side = max(w, h)
    if long_side <= max_side:
        return w, h
    return (
        max(1, (w * max_side) // long_side),
        max(1, (h * max_side) // long_side),
    )


def _nn_resize(payload, max_side, decode_fn, encode_fn):
    """Shared real-resize core: decode -> nearest-neighbor downsample
    -> re-encode. Scale/index arithmetic lives in _fit_dims. Returns
    (new_w, new_h, new_payload); payload unchanged when already
    within max_side."""
    import numpy as np

    w, h, ch, px = decode_fn(payload)
    nw, nh = _fit_dims(w, h, max_side)
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
    # header-probe FIRST (r10 review): an image already within
    # max_side needs no transform, and the full zlib/Huffman decode
    # just to discover that dominated resize CPU on corpora where
    # most images fit the target. Deliberate trade-off (r10 advice):
    # the short-circuit validates the HEADER only, so a small image
    # with corrupt entropy data passes through instead of
    # quarantining — resize_images documents probe-only validation
    # on this path.
    if payload is not None and payload[:8] == _PNG_SIG:
        w, h, _ = _png_dims(payload)
        if max(w, h) <= max_side:
            return w, h, payload
        return resize_png(payload, max_side)
    if payload is not None and payload[:2] == b"\xff\xd8":
        from hillview_spark.functions.jpeg import jpeg_dims

        w, h, _ch = jpeg_dims(payload)
        if max(w, h) <= max_side:
            return w, h, payload
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
    byte-for-byte, full PNG (zlib inflate + scanline unfilter),
    baseline JPEG (full DCT/Huffman codec, functions/jpeg.py), MP3
    frame-header walks, and H.264 Annex-B SPS parsing. Full-fidelity
    sample/pixel DECODE for MP3/H.264 belongs to the 'real' slot.

    Error contract: malformed media raises ValueError, uniformly —
    struct.error from a truncated header unpack is converted here so
    every prober honors the except-ValueError quarantine convention
    (r10 review reproduced escapes from a 4-byte WAVE fmt chunk and a
    truncated JPEG SOF body)."""
    if payload is None:
        raise ValueError("null payload")
    try:
        return _stdlib_decode_unchecked(payload)
    except _struct.error as e:
        raise ValueError(f"truncated media header: {e}") from e


def _stdlib_decode_unchecked(payload: bytes) -> tuple[int, int, int]:
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
    # MP3: ID3v2-tagged, or a bare 0xFFE frame sync (JPEG's FF D8
    # fails the sync mask, so the checks can't collide)
    if payload[:3] == b"ID3" or (
        len(payload) >= 2
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    ):
        return _mp3_dims(payload)
    if payload[:4] == b"\x00\x00\x00\x01" or payload[:3] == b"\x00\x00\x01":
        return _h264_dims(payload)
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
    _safe = _safe_decode(decode)  # the ONE quarantine wrapper (r10)

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
    id % 6 picks the container — 0: real PNG (encode_png: zlib IDAT,
    CRCs), 1: real baseline JPEG (functions/jpeg.py: DCT + Huffman),
    2: real GIF89a (encode_gif: block-structured LZW, 1 + id % 3
    frames), 3: real 24-bit BMP (encode_bmp), 4: real MPEG1-L3 MP3
    (encode_mp3: ID3v2 skip + frame walk, 1 + id % 5 frames), 5: real
    H.264 Annex-B (encode_h264: SPS Exp-Golomb + IDR slices,
    16·(1 + id % 8) × 16·(1 + id % 4), 1 + id % 3 frames) — so the
    gate hash exercises all six container probes (r9, VERDICT r8 #7).
    Image dimensions stay a CLOSED FORM of the key
    (w = 1 + abs(id) % 13, h = 1 + abs(id) % 7; abs folds
    SQL's sign-of-dividend modulo onto Python's) with a fixed
    per-id pixel pattern; MP3 probes to (44100, 2, frames). An
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
                r = i % 6
                if r == 0:
                    kinds.append("png")
                    payloads.append(encode_png(w, h, 3, px))
                elif r == 1:
                    kinds.append("jpeg")
                    payloads.append(encode_jpeg(w, h, 3, px))
                elif r == 2:
                    kinds.append("gif")
                    payloads.append(encode_gif(w, h, 1 + i % 3, px))
                elif r == 3:
                    kinds.append("bmp")
                    payloads.append(encode_bmp(w, h, 3, px))
                elif r == 4:
                    kinds.append("mp3")
                    payloads.append(encode_mp3(1 + i % 5, id3_pad=i % 17))
                else:
                    kinds.append("h264")
                    payloads.append(
                        encode_h264(
                            16 * (1 + i % 8), 16 * (1 + i % 4), 1 + i % 3
                        )
                    )
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
    through mapInPandas.

    Quarantine contract (r10 advice): images whose header dims
    already fit max_side short-circuit on the HEADER PROBE ALONE —
    a payload with a valid header but corrupt entropy data passes
    through unflagged when it is already small enough. resize only
    guarantees full-decode validation for images it actually
    transforms; use extract_image_features / decode paths when
    corruption detection itself is the goal."""
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
                nw, nh = _fit_dims(w, h, max_side)
                out_w.append(nw)
                out_h.append(nh)
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
        df.where(F.col("kind").isin(*_IMAGE_KINDS))
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
        df.where(F.col("kind").isin(*_VIDEO_KINDS))
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
