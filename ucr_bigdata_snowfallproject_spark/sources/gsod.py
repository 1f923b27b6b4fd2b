"""GSOD `.op(.gz)` text source (S4/S5/S6; reference untitled.py:42-60,75-77).

The reference reads each member file line-by-line in Python, collapses
space runs, splits, and keeps 9 of 22 positional fields. Here the same
parse is one declarative projection over ``spark.read.text`` — Spark
decompresses ``.gz`` transparently, the regex split and positional select
run in codegen, and the per-file Python loop disappears into the
multi-file scan (the S3 tar path reuses ``parse_op_lines`` on exploded
member lines).

GSOD raw header (22 cols):  STN--- WBAN YEARMODA TEMP ... MAX MIN PRCP ...
Kept positions (reference untitled.py:44-47):
    header indices [0,1,2,3,4,8,11,12,13] on the deduplicated header
    → row indices  [0,1,2,3,5,13,17,18,19] on the split data row
      (rows carry count fields after each measure, hence the offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: positional indices of the kept fields in a whitespace-split data row
#: (reference untitled.py:46-47): USAF WBAN YEARMODA TEMP DEWP WDSP MAX MIN PRCP
ROW_INDICES = [0, 1, 2, 3, 5, 13, 17, 18, 19]
COLUMN_NAMES = ["USAF", "WBAN", "YEARMODA", "TEMP", "DEWP", "WDSP", "MAX", "MIN", "PRCP"]

#: numeric measures parsed as double at ingest (MAX/MIN/PRCP keep their
#: quality-flag suffixes as strings; cleaning strips them later —
#: functions.scalars.clean_observations)
_DOUBLE_COLS = {"TEMP", "DEWP", "WDSP"}


def parse_op_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Whitespace-delimited positional parse of GSOD data lines →
    OBSERVATIONS_RAW-shaped frame. Header lines (starting 'STN') are
    dropped (S6)."""
    arr = F.split(F.regexp_replace(F.trim(F.col(value_col)), r" +", ","), ",")
    data = lines.filter(~F.col(value_col).startswith("STN")).filter(
        F.length(F.trim(F.col(value_col))) > 0
    )
    cols = []
    for name, idx in zip(COLUMN_NAMES, ROW_INDICES):
        c = arr.getItem(idx)
        if name in _DOUBLE_COLS:
            c = c.cast("double")
        elif name == "WBAN":
            c = c.cast("int")
        cols.append(c.alias(name))
    return data.select(*cols)


def read_op_files(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory/glob of `.op` / `.op.gz` files into the raw
    observation schema. gzip decompression is transparent under
    ``spark.read.text``; one file = one-or-more splits, no driver loop."""
    return parse_op_lines(spark.read.text(path))
