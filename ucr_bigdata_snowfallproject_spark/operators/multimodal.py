"""Multimodal binary columns (X5): images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side plumbing — schema, batch iteration, partition sizing — is
real and tested; the media decode itself is STUBBED behind
``_decode_image_stub`` (the container has no image/audio libs; a real
deployment swaps in PIL/libav inside the same ``mapInPandas`` contract,
nothing else changes).

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.files.maxPartitionBytes`` sized so a batch of payloads fits
executor memory, and never groupBy/shuffle on a binary column — shuffle the
narrow metadata, semi-join the payloads back.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal table schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", StringType()),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S3-adjacent binary source: ``binaryFile`` format → (path, modTime,
    length, content). The multimodal ingest entry point."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media fixture (no media libs in the container):
    payload bytes are seeded pseudo-random; metadata is consistent."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(128 + (i % 5) * 64))
        rows.append((i, kind, payload, f"application/x-fake-{kind}", len(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode (X5): deterministic fake width/height derived from the
    payload. Used when no real image library is importable — the
    surrounding mapInPandas plumbing is the tested, production-shaped
    part either way."""
    if len(payload) < 8:
        raise NotImplementedError("payload too short for stub decode")
    return (payload[0] % 64 + 1) * 16, (payload[1] % 64 + 1) * 16


def _decode_image_pil(payload: bytes) -> tuple[int, int]:
    """Real decode via PIL (when installed): width/height from the image
    header — PIL lazy-loads, so ``.size`` never decompresses pixel data."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        return img.size


def default_image_decoder():
    """Resolve the image decoder at call time: PIL when importable (real
    deployments), the deterministic stub otherwise (this container ships no
    media libs). Resolution is a function, not an import-time constant, so
    tests can monkeypatch either path through the same mapInPandas
    contract."""
    try:
        import PIL.Image  # noqa: F401

        return _decode_image_pil
    except ImportError:
        return _decode_image_stub


def extract_features(
    media: DataFrame,
    batch_hint: int = 256,
    decoder=None,
) -> DataFrame:
    """Feature extraction over media payloads via ``mapInPandas`` —
    Arrow-batched, one Python worker pass, narrow typed output (payloads do
    NOT flow to the result). ``decoder`` is any
    ``bytes -> (width, height)`` callable; default resolves PIL-or-stub via
    :func:`default_image_decoder` (resolved on the DRIVER so the chosen
    decoder ships in the serialized closure — executors don't re-probe)."""
    decode = decoder if decoder is not None else default_image_decoder()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            dims = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """Frame-sampling plumbing (video path): explode each payload into
    sampled "frame" offsets — demonstrates the 1→N mapInPandas shape with
    bounded output batches."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("offset", LongType()),
            StructField("frame_byte", IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_no": [], "offset": [], "frame_byte": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for fno, off in enumerate(range(0, len(payload), every_n_bytes)):
                    out["media_id"].append(mid)
                    out["frame_no"].append(fno)
                    out["offset"].append(off)
                    out["frame_byte"].append(payload[off])
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(batches, schema=schema)
