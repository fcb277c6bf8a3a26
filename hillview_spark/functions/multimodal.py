"""Multimodal (image/audio/video) column handling.
(Extension beyond the Hillview reference, SURVEY.md §2.4.)

Media payloads are opaque ``binary`` columns with a typed metadata
struct. Heavy per-item work (decode, resize, frame sampling,
feature extraction) runs in Arrow-batched ``mapInPandas`` — the
only sane shape at 100 TB: partitions stream through Python in
columnar batches, no per-row pickling, and the binary payload never
leaves the executor.

The actual codecs are NOT available in this environment, so decode
is stubbed behind ``DECODERS`` — a deterministic fake parses our
own fake header. The Spark-side plumbing (schema, batching,
partition flow) is real and tested.
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
        "real image/audio/video codecs are not available in this "
        "environment; register one in DECODERS"
    )


# Pluggable decode registry — swap in PIL/ffmpeg-backed decoders in a
# real deployment.
DECODERS = {"fake": _fake_decode, "real": _real_decode}

PROBE_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, n_bytes long"
)


def probe_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode headers → dimensions/frame counts. mapInPandas streams
    Arrow batches; each batch is decoded vectorized in Python."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode(p) for p in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    "n_bytes": pdf["content"].map(len),
                }
            )

    return df.mapInPandas(run, PROBE_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, content binary"


def resize_images(df: DataFrame, max_side: int, decoder: str = "fake") -> DataFrame:
    """Resize plumbing: computes target dims JVM-side-compatible and
    re-emits payloads. The pixel transform itself is the stubbed
    decode step; the partition/batch flow is the real thing."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w, out_h, out_c = [], [], []
            for p in pdf["content"]:
                w, h, _ = decode(p)
                scale = min(1.0, max_side / max(w, h))
                out_w.append(int(w * scale))
                out_h.append(int(h * scale))
                out_c.append(p)  # stub: payload passthrough
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "content": out_c,
                }
            )

    return df.where(F.col("kind") == "image").mapInPandas(run, RESIZE_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_idx int"


def sample_frames(df: DataFrame, every_n: int = 30, decoder: str = "fake") -> DataFrame:
    """Frame sampling plumbing for video: one output row per sampled
    frame index (frame extraction itself is the stubbed decode)."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for mid, p in zip(pdf["media_id"], pdf["content"]):
                _, _, nf = decode(p)
                for i in range(0, nf, every_n):
                    ids.append(mid)
                    idxs.append(i)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs})

    return df.where(F.col("kind") == "video").mapInPandas(run, FRAMES_SCHEMA)
