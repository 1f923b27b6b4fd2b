"""Explicit schemas for every canonical table.

The reference infers schema on every read (``inferschema='true'`` at
reference ``untitled.py:158``; ``pd.to_numeric``/``to_datetime`` coercion at
``untitled.py:55-56``).  At 100 TB, inference is a full extra scan — the
engine declares schemas and only falls back to inference on explicitly
ad-hoc ingest (see :mod:`.io`).

Two schema groups:

* the driver's star-schema fixtures (``TESTDATA.md``), and
* the GSOD-shaped weather tables mirroring the reference's real inputs
  (``FIXTURES.md §B``; reference ``untitled.py:25,44-48``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


# --- driver star-schema fixtures (verified against the parquet files) -----

REGION = _st(("r_regionkey", IntegerType()), ("r_name", StringType()))

NATION = _st(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)

CUSTOMER = _st(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)

SUPPLIER = _st(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)

PART = _st(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)

ORDERS = _st(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampType()),
    ("o_orderpriority", StringType()),
)

LINEITEM = _st(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampType()),
)

EVENTS = _st(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),  # JSON string
)

DOCUMENTS = _st(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)

EMBEDDINGS = _st(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}


# --- GSOD-shaped weather tables (FIXTURES.md §B) --------------------------

#: station dimension ≙ `isd-history.csv` (reference untitled.py:25)
STATIONS = _st(
    ("USAF", StringType()),
    ("WBAN", IntegerType()),
    ("STATION_NAME", StringType()),
    ("CTRY", StringType()),
    ("STATE", StringType()),
    ("ICAO", StringType()),
    ("LAT", DoubleType()),
    ("LON", DoubleType()),
    ("ELEV_M", DoubleType()),
    ("BEGIN", StringType()),
    ("END", StringType()),
)

#: daily observation fact ≙ parsed `.op` rows (reference untitled.py:44-59).
#: MAX/MIN/PRCP arrive as strings with quality flags; cleaning is in
#: functions.scalars.clean_observations.
OBSERVATIONS_RAW = _st(
    ("USAF", StringType()),
    ("WBAN", IntegerType()),
    ("YEARMODA", StringType()),
    ("TEMP", DoubleType()),
    ("DEWP", DoubleType()),
    ("WDSP", DoubleType()),
    ("MAX", StringType()),
    ("MIN", StringType()),
    ("PRCP", StringType()),
)
