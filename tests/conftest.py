from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucr_bigdata_snowfallproject_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_ORACLE = f"{TESTDATA}/sf0.01"

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="snowfall-tests", extra_confs={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views at
    sf0.001 — mirrors the driver's oracle setup."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


def compare_with_oracle(spark_df, duck_con, sql: str, float_exact: bool = True):
    """Mirror of the driver's comparison: row count, column-name-sorted
    schema, and order-insensitive exact value match."""
    import math

    sdf = spark_df.toPandas()
    ddf = duck_con.sql(sql).df()
    assert len(sdf) == len(ddf), f"row count: spark={len(sdf)} duckdb={len(ddf)}"
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    assert scols == dcols, f"columns: spark={scols} duckdb={dcols}"
    sdf = sdf[scols]
    ddf = ddf[dcols]

    def canon(df):
        rows = []
        for row in df.itertuples(index=False):
            parts = []
            for v in row:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    parts.append("NULL")
                elif isinstance(v, float):
                    parts.append(repr(v) if float_exact else f"{v:.6g}")
                else:
                    parts.append(str(v))
            rows.append("|".join(parts))
        return sorted(rows)

    srows, drows = canon(sdf), canon(ddf)
    mismatches = [
        (a, b) for a, b in zip(srows, drows) if a != b
    ]
    assert srows == drows, (
        f"value mismatch ({len(mismatches)} rows differ); first: "
        f"{mismatches[0] if mismatches else '(length)'}"
    )
