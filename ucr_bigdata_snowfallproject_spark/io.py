"""Sources and sinks (SURVEY §2.1).

Covers the reference's ingest surface Spark-first:

- S2/S7 CSV source with header (reference ``untitled.py:25,158``) —
  :func:`read_csv` with an *explicit* schema by default (inference is a
  full-scan antipattern at 100 TB; ``infer=True`` kept as the ad-hoc path).
- S8/S9 CSV sink (``untitled.py:86,241``) — :func:`write_csv`; engine canon
  is parquet via :func:`write_parquet` (partitioned, for pruning).
- Parquet star-schema fixture loading — :func:`load_table`/:func:`load_tables`.
- S4/S5 gzip whitespace-delimited text (``untitled.py:75-77``) —
  :func:`read_gsod_text`: Spark decompresses ``.gz`` transparently under
  ``spark.read``; the whitespace tokenization happens columnar-side.
- S3 tar archive source (``untitled.py:65-68``) — :mod:`.sources.tar`
  (binaryFile + mapInPandas; the one non-built-in source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from . import schemas


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


#: path -> parquet time unit ('ns', 'us', ...) for events.ts, cached so the
#: footer probe runs once per path per process.
_TS_UNIT_CACHE: dict[str, str] = {}


def _events_ts_unit(path: str) -> str:
    """Time unit of the ``ts`` column as stored in the parquet footer.

    The fixture generator has shipped both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) encodings across rounds; Spark's TimestampType reads
    micros natively but needs the ``nanosAsLong`` long-read workaround for
    nanos — so the unit must be probed, not assumed. One local footer read
    (pyarrow), cached per path. The probe is LOCAL-FILESYSTEM only by
    design: for remote paths (s3://, hdfs://...) — which
    ``spark.read.parquet`` itself handles fine — it falls back to 'us',
    the encoding every fixture generation since r3 ships and the one
    Spark's TimestampType reads natively."""
    if path not in _TS_UNIT_CACHE:
        unit = "us"
        try:
            import os

            import pyarrow.parquet as pq

            probe = path
            if os.path.isdir(path):
                parts = sorted(
                    f for f in os.listdir(path) if f.endswith(".parquet")
                )
                probe = os.path.join(path, parts[0]) if parts else path
            if os.path.exists(probe):
                t = pq.ParquetFile(probe).schema_arrow.field("ts").type
                unit = getattr(t, "unit", "us")
        except Exception:
            unit = "us"  # unprobeable (remote FS, odd layout) → native µs
        _TS_UNIT_CACHE[path] = unit
    return _TS_UNIT_CACHE[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical fixture table with its declared schema.

    The explicit schema means the parquet footer read is the only metadata
    work; column pruning and filter pushdown then flow from whatever the
    caller selects/filters (verify with plans.checks.assert_pushed_filters).

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) across fixture generations; the footer is probed
    (:func:`_events_ts_unit`) and only the nanos encoding — which Spark's
    TimestampType (µs) cannot read directly — takes the workaround path:
    read as a nanosecond long (``nanosAsLong``) and convert with integer
    division (a double-based divide would lose precision: epoch-ns ≈
    1.7e18 > 2^53).
    """
    if name == "events" and _events_ts_unit(table_path(sf_dir, name)) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, StructField, StructType

        ns_schema = StructType(
            [
                StructField("ts", LongType()) if f.name == "ts" else f
                for f in schemas.EVENTS.fields
            ]
        )
        raw = spark.read.schema(ns_schema).parquet(table_path(sf_dir, name))
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if name == "events":
        # scope the legacy conf: a prior ns-encoded load in this session
        # must not leak long-typed ts reads into a µs-encoded load
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    schema = schemas.TABLES.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_temp_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for the Spark SQL surface."""
    for n in names or tuple(schemas.TABLES):
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    sep: str = ",",
    infer: bool = False,
) -> DataFrame:
    """CSV source (S2/S7; reference untitled.py:25 and the pre-2.0
    ``com.databricks.spark.csv`` spelling at untitled.py:158)."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_gsod_text(spark: SparkSession, path: str) -> DataFrame:
    """Whitespace-delimited GSOD `.op(.gz)` text as one `value` column
    (S4/S5; reference untitled.py:75-77). Spark handles the gzip codec
    transparently; parsing to columns is functions.scalars.parse_gsod_line.
    """
    return spark.read.text(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Canonical sink. ``partition_by`` (e.g. YEAR) buys partition pruning
    for the time-sliced reads the reference's map layer performs."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink (S8/S9; reference untitled.py:86,241). Distributed write —
    never collects to the driver (the reference's toPandas().to_csv at
    untitled.py:241 is exactly the 100 TB antipattern)."""
    df.write.mode(mode).option("header", header).csv(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: pre-shuffles ONCE at write time so every
    later equi-join/aggregation on ``bucket_cols`` between co-bucketed
    tables runs with ZERO exchanges (asserted in tests/test_plan_shapes).
    The 100 TB pattern for fact⋈fact joins that repeat across queries —
    pay the shuffle once, reuse the physical layout forever."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def zorder_key(cols: list, mins: list, maxs: list, bits: int = 10):
    """Morton (Z-order) key over numeric columns as a pure bitwise
    expression: each column min-max-scales to ``bits`` bits, then bits
    interleave (column j contributes bit i at position i·ncols+j). Rows
    close in the key are close in EVERY dimension — the multi-column
    data-skipping order that a plain sort only gives its leading column."""
    from pyspark.sql import functions as F

    n = len(cols)
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        c = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        frac = (c.cast("double") - float(lo)) / span if span > 0 else F.lit(0.0)
        q = F.least(
            F.greatest(F.floor(frac * ((1 << bits) - 1)), F.lit(0)),
            F.lit((1 << bits) - 1),
        ).cast("long")
        scaled.append(q)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(scaled):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftrightunsigned(q, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered parquet sink — the multi-column data-skipping
    layout (Delta OPTIMIZE ZORDER's core, on plain parquet): range-
    partition + sort by the Morton key of ``cols`` so every file covers a
    narrow range of EVERY z-column and parquet min/max stats prune files/
    row-groups for predicates on ANY of them. A plain sort gives that
    pruning only to its leading column; Z-ordering trades a little of the
    leading column's locality to buy it for all columns (file-stat
    tightness asserted in tests).

    Cost: one min/max aggregate (parquet aggregate pushdown makes it a
    footer read on DSv2) + one range shuffle — the same price as a sorted
    write. At 100 TB this is the layout pass run once per table, amortized
    over every later selective scan."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[m for c in cols for m in (F.min(c), F.max(c))]
    ).first()
    mins = [stats[2 * i] for i in range(len(cols))]
    maxs = [stats[2 * i + 1] for i in range(len(cols))]
    z = zorder_key(cols, mins, maxs, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """JSON-lines source with an explicit schema by default (schema
    inference on JSON is a full scan + sampling pass — the same 100 TB
    antipattern as CSV inference)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC source — the second columnar format beside parquet (vectorized
    reader, predicate pushdown, and column pruning all apply the same way;
    asserted in tests/test_sources_io.py). Explicit ``schema`` skips
    footer-sampling inference, same policy as :func:`read_csv`."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink, mirroring :func:`write_parquet` (zlib-by-default; Spark's
    native vectorized ORC writer)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: StructType | None = None,
) -> DataFrame:
    """XML source (built-in since Spark 4 — the spark-xml package folded
    into core): one row per ``row_tag`` element. Same explicit-schema
    discipline as every other source here; without one the reader infers
    by scanning, the 100 TB antipattern."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink — distributed, one file per partition like every Spark
    sink (interchange format for systems that still speak XML; parquet
    remains the engine canon)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-Lines source — the lingua franca of LLM training-data
    interchange (one JSON object per line, gzip-transparent). Explicit
    ``schema`` keeps the engine's declared-schema discipline and skips
    Spark's sampling inference pass (a full extra scan at 100 TB);
    omitted, inference is accepted for exploration."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None) -> None:
    """JSON-Lines sink — distributed, one file per partition; pair with
    ``curation.shard_assignments`` + ``repartition("shard")`` for
    deterministic training-shard exports. ``compression='gzip'`` for
    interchange, None for local speed."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[tuple[str, int, int, str]],
) -> DataFrame:
    """Fixed-width text source (the mainframe/NOAA archive staple — the
    reference's .op files are a fixed-layout report format that it
    happened to whitespace-split, untitled.py:44-48). ``colspecs`` is
    ``(name, start, length, type)`` with 1-based character starts;
    fields are substring-sliced, trimmed, and cast — empty slices become
    NULL.

    Scale shape: Spark's text source splits by line; the column carve-up
    is pure substring/trim/cast expressions — whole-stage-codegen'd scan
    work, splittable files, no Python. Declared types keep the explicit-
    schema discipline (no inference pass)."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    cols = []
    for name, start, length, dtype in colspecs:
        raw = F.trim(F.substring(F.col("value"), start, length))
        c = F.when(raw == "", None).otherwise(raw).cast(dtype)
        cols.append(c.alias(name))
    return lines.select(*cols)
