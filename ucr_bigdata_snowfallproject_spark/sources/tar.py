"""Tar archive source (S3; reference untitled.py:65-68) — the one source
Spark has no built-in reader for (SURVEY §7.3).

The reference opens one tar per year on the driver and loops members in
Python. Here each archive is ONE row of ``binaryFile``, and member
extraction + gunzip happens inside an Arrow-batched ``mapInPandas`` on the
executors — archives process in parallel, nothing funnels through the
driver.

Scale notes: parallelism is per-archive (a tar isn't splittable), so many
medium archives beat one giant one; memory is bounded by yielding one
member's lines per output batch rather than materializing a whole archive.
The station-dimension membership skip the reference does per-member
(untitled.py:72) is expressed afterwards as a semi join on (USAF, WBAN) —
see operators.relational.semi_join.
"""

from __future__ import annotations

import gzip
import io
import tarfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

#: member name → (USAF, WBAN) parse (reference untitled.py:69-71):
#: "./123456-78901-2020.op.gz" → usaf="123456", wban="78901"
MEMBER_LINES_SCHEMA = StructType(
    [
        StructField("archive", StringType()),
        StructField("member", StringType()),
        StructField("value", StringType()),
    ]
)


def _iter_member_lines(path_str: str, content: bytes) -> Iterator[tuple[str, str, list[str]]]:
    with tarfile.open(fileobj=io.BytesIO(content)) as tar:
        for member in tar.getmembers():
            if not member.isfile():
                continue
            f = tar.extractfile(member)
            if f is None:
                continue
            raw = f.read()
            if member.name.endswith(".gz"):
                raw = gzip.decompress(raw)
            lines = raw.decode("utf-8", errors="replace").splitlines()
            yield path_str, member.name, lines


def read_tar_members(spark: SparkSession, path: str, glob: str = "*.tar") -> DataFrame:
    """Explode tar archives into (archive, member, line) rows.

    Downstream: ``sources.gsod.parse_op_lines`` turns the line column into
    observation rows, and the member name carries the (USAF, WBAN) key
    (reference untitled.py:69-71) — see :func:`read_gsod_tar`.
    """
    binaries = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    ).select("path", "content")

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_str, content in zip(pdf["path"], pdf["content"]):
                for archive, member, lines in _iter_member_lines(path_str, bytes(content)):
                    yield pd.DataFrame(
                        {
                            "archive": archive,
                            "member": member,
                            "value": lines,
                        }
                    )

    return binaries.mapInPandas(expand, schema=MEMBER_LINES_SCHEMA)


def read_gsod_tar(spark: SparkSession, path: str, glob: str = "*.tar") -> DataFrame:
    """Full S3+S4+S5 chain: tar archives → member lines → parsed
    observation rows (OBSERVATIONS_RAW shape)."""
    from .gsod import parse_op_lines

    lines = read_tar_members(spark, path, glob)
    return parse_op_lines(lines, value_col="value")
