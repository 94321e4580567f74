"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing (schemas, batch iteration via
``mapInPandas``, partition sizing) is real and tested. ``DECODERS`` is
the codec registry: ``image`` is a real stdlib-only PNG structural
decoder (signature + IHDR dimensions + CRC) and ``audio`` a real WAV
RIFF-chunk decoder (fmt + data: rate/channels/frames); sample-level
work (IDAT unfiltering, resampling, PCM decode) is where an
imaging/audio library would slot in — swap the registry entry without
touching the pipeline.

Scale notes: binary blobs ride in the same parquet row groups as their
metadata; ``spark.sql.files.maxPartitionBytes`` bounds executor memory per
task. Decode runs in ``mapInPandas`` so bytes cross to Python once per
Arrow batch, not per row; metadata-only queries never touch the bytes
(column pruning drops the binary column at the scan).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("sha256", StringType(), True),
        StructField("feature_kind", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def _decode_image_png(payload: bytes) -> dict:
    """Real (stdlib-only) PNG structural decode: validates the 8-byte
    signature, parses the IHDR chunk for dimensions / bit depth / color
    type, and CRC-checks IHDR. No imaging library needed — this is the
    header layer every PNG tool agrees on; pixel decode (IDAT inflate +
    unfiltering) is where a real imaging dependency would slot in."""
    import struct
    import zlib

    b = bytes(payload or b"")
    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    (length,) = struct.unpack(">I", b[8:12])
    if b[12:16] != b"IHDR" or length != 13:
        raise ValueError("not a PNG: first chunk is not IHDR")
    w, h, bit_depth, color_type = struct.unpack(">IIBB", b[16:26])
    (crc,) = struct.unpack(">I", b[29:33])
    if zlib.crc32(b[12:29]) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    if w == 0 or h == 0:
        raise ValueError("PNG: zero dimension")
    return {
        "n_bytes": len(b),
        "feature_kind": "png",
        "width": w,
        "height": h,
        "bit_depth": bit_depth,
        "color_type": color_type,
    }


def _decode_audio_wav(payload: bytes) -> dict:
    """Real (stdlib-only) WAV structural decode: RIFF/WAVE container walk
    for the fmt chunk (PCM layout: channels, sample rate, block align)
    and the data chunk (frame count = data bytes / block align). Sample
    decode/resample is where an audio library would slot in; the header
    layer below is what every WAV tool agrees on."""
    import struct

    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(b):
        cid, csize = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and csize >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    _, n_channels, sample_rate, _, block_align, _ = fmt
    if n_channels == 0 or sample_rate == 0 or block_align == 0:
        raise ValueError("WAV: zero channels/rate/block align")
    return {
        "n_bytes": len(b),
        "feature_kind": "wav",
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_frames": data_size // block_align,
    }


def _fake_deterministic_decode(payload: bytes) -> dict:
    """Deterministic fake decoder for tests: derives 'features' from bytes."""
    return {"n_bytes": len(payload or b""), "feature_kind": "fake"}


DECODERS: dict[str, Callable[[bytes], Any]] = {
    "image": _decode_image_png,
    "audio": _decode_audio_wav,
    "fake": _fake_deterministic_decode,
}


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata pass that never leaves the JVM: size + digest per blob."""
    return df.select(
        "media_id",
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched decode via mapInPandas (one Python hop per batch)."""
    import pandas as pd  # local import: executor-side dependency
    import hashlib

    decode = DECODERS[decoder]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                feats = decode(payload)
                out.append(
                    {
                        "media_id": media_id,
                        "n_bytes": feats.get("n_bytes"),
                        "sha256": hashlib.sha256(payload or b"").hexdigest(),
                        "feature_kind": feats.get("feature_kind"),
                        "width": feats.get("width"),
                        "height": feats.get("height"),
                        "sample_rate": feats.get("sample_rate"),
                        "n_channels": feats.get("n_channels"),
                        "n_frames": feats.get("n_frames"),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame, *, width: int, height: int, decoder: str = "fake"
) -> DataFrame:
    """Resize plumbing: one Arrow hop, 1 row in -> 1 row out.

    With ``decoder='fake'`` the "resize" is a deterministic byte
    truncation/padding to width*height so shapes and partitioning are
    testable without an imaging library; a real decoder replaces only the
    inner function (decode -> resample -> re-encode), the Spark plumbing
    (schema, mapInPandas batching, binary transport) is final.
    """
    import pandas as pd

    if decoder != "fake":
        DECODERS[decoder]  # raise KeyError early; real impl goes here

    target = width * height

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                fake = (raw * (target // max(len(raw), 1) + 1))[:target]
                out.append(
                    {
                        "media_id": media_id,
                        "payload": fake,
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, *, every_nth: int = 10, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: 1 video row in -> N frame rows out.

    Row-expanding mapInPandas (the shape a real video decoder needs:
    output rows != input rows). The fake "frames" are deterministic byte
    slices keyed by frame index; ``n_frames`` metadata bounds the sample
    without touching payload bytes for skipped frames.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for media_id, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                raw = bytes(payload or b"")
                total = int(n_frames) if n_frames is not None and n_frames == n_frames else 0
                picked = list(range(0, total, every_nth))[:max_frames]
                for idx in picked:
                    lo = idx % max(len(raw), 1)
                    out.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "payload": raw[lo : lo + 16],
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select("media_id", "payload", "n_frames").mapInPandas(run, FRAME_SCHEMA)
