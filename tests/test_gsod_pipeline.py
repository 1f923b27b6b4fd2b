"""End-to-end GSOD pipeline tests (SURVEY §5.2 golden pipeline + §5.3
known-bug-semantics pins), with a pandas re-derivation as the oracle —
the same math the reference's pandas phase performs, independently
computed.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from ucr_bigdata_snowfallproject_spark.pipeline import fixtures as fx
from ucr_bigdata_snowfallproject_spark.pipeline.gsod import (
    map_export,
    run_pipeline,
)
from ucr_bigdata_snowfallproject_spark.sources.gsod import read_op_files
from ucr_bigdata_snowfallproject_spark.sources.tar import read_gsod_tar
from ucr_bigdata_snowfallproject_spark.io import read_csv
from ucr_bigdata_snowfallproject_spark.schemas import STATIONS


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("gsod")
    return fx.write_gsod_tree(str(root))


@pytest.fixture(scope="module")
def pipeline_outputs(spark, tree):
    stations_raw = read_csv(spark, tree["stations_csv"], schema=STATIONS)
    obs_raw = spark.read.parquet(tree["obs_parquet"])
    return run_pipeline(
        stations_raw, obs_raw, min_year=fx.YEARS[0], max_year=fx.YEARS[-1]
    )


def _expected_clean_obs() -> pd.DataFrame:
    """Pandas re-derivation of the cleaning the engine must perform
    (reference untitled.py:48-59, *intent* semantics for the PRCP bug)."""
    obs = fx.make_observations()
    obs["MAX"] = obs["MAX"].str.replace(r"\*$", "", regex=True).astype(float)
    obs["MIN"] = obs["MIN"].str.replace(r"\*$", "", regex=True).astype(float)
    obs["PRCP"] = obs["PRCP"].str[:-1].astype(float)
    obs["YEARMODA"] = pd.to_datetime(obs["YEARMODA"], format="%Y%m%d")
    obs["YEAR"] = obs["YEARMODA"].dt.year
    obs["MONTH"] = obs["YEARMODA"].dt.month
    obs["DAY"] = obs["YEARMODA"].dt.day
    return obs


def _surviving_station_keys() -> set[tuple[str, int]]:
    """Stations surviving P1/P2/P3 (valid coords + full window coverage)."""
    st = fx.make_stations()
    st = st[st["LAT"].notna() & st["LON"].notna()]
    st = st[~((st["LAT"] == 0.0) | (st["LAT"] == -999.0) | (st["LAT"] == -999.9))]
    st = st[~((st["LON"] == 0.0) | (st["LON"] == -999.0) | (st["LON"] == -999.9))]
    st = st[st["END"].str[:4].astype(int) == fx.YEARS[-1]]
    st = st[st["BEGIN"].str[:4].astype(int) <= fx.YEARS[0]]
    return set(zip(st["USAF"], st["WBAN"]))


def test_station_cleaning_filters(pipeline_outputs):
    got = {
        (r["USAF"], r["WBAN"])
        for r in pipeline_outputs["stations"].collect()
    }
    assert got == _surviving_station_keys()
    assert len(got) > 0


def test_orphan_observations_dropped(pipeline_outputs):
    keys = {
        (r["USAF"], r["WBAN"])
        for r in pipeline_outputs["observations"].select("USAF", "WBAN").distinct().collect()
    }
    assert ("999999", 99999) not in keys
    assert keys <= _surviving_station_keys()


def test_monthly_medians_match_pandas(pipeline_outputs):
    """A1 golden: engine monthly medians == pandas groupby-median
    (reference untitled.py:81 semantics) for the surviving stations."""
    expected = _expected_clean_obs()
    keys = _surviving_station_keys()
    expected = expected[
        expected.apply(lambda r: (r["USAF"], r["WBAN"]) in keys, axis=1)
    ]
    exp = (
        expected.groupby(["USAF", "WBAN", "YEAR", "MONTH"])[
            ["TEMP", "DEWP", "WDSP", "MAX", "MIN", "PRCP"]
        ]
        .median()
        .reset_index()
    )
    got = pipeline_outputs["monthly_medians"].toPandas()
    exp = exp.sort_values(["USAF", "WBAN", "YEAR", "MONTH"]).reset_index(drop=True)
    got = got.sort_values(["USAF", "WBAN", "YEAR", "MONTH"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_latest_day_keeps_ties(pipeline_outputs):
    """P5 pin: the tie the fixture plants on station 0's max date yields
    two rows (reference untitled.py:80 keeps all rows of the max day)."""
    ld = pipeline_outputs["latest_day"]
    s8 = ld.filter((F.col("USAF") == "100008") & (F.col("WBAN") == 10008))
    rows = s8.collect()
    assert len(rows) == 2
    assert all(str(r["YEARMODA"]) == f"{fx.YEARS[-1]}-12-25" for r in rows)
    # every other station: exactly one latest row
    counts = (
        ld.groupBy("USAF", "WBAN").count().filter(F.col("count") > 1).collect()
    )
    assert len(counts) == 1


def test_join_and_label_semantics(pipeline_outputs):
    """J1 + F5/F6 pins: joined output carries station attrs; LBL skips
    null STATE/NAME (concat_ws) and elevation line is absent when ELEV_M
    is null (the reference's ~np.isnan bug, implemented as intent)."""
    joined = pipeline_outputs["monthly_with_station"]
    pdf = joined.toPandas()
    assert {"LAT", "LON", "LBL", "TEMP", "PRCP"} <= set(pdf.columns)
    st = fx.make_stations().set_index(["USAF", "WBAN"])
    for _, r in pdf.drop_duplicates(["USAF", "WBAN"]).iterrows():
        srow = st.loc[(r["USAF"], r["WBAN"])]
        if pd.isna(srow["ELEV_M"]):
            assert "Elevation" not in r["LBL"]
        else:
            assert f"Elevation: {srow['ELEV_M']} m" in r["LBL"]
        if srow["STATION_NAME"] is None and srow["STATE"] is None:
            assert not r["LBL"].split("<br>")[0].startswith(", ")


def test_op_text_source_matches_parquet(spark, tree, pipeline_outputs):
    """S4/S5/S6: reading the .op.gz text files yields the same cleaned
    observation set as the parquet path."""
    from ucr_bigdata_snowfallproject_spark.functions.scalars import clean_observations

    txt = clean_observations(read_op_files(spark, tree["op_dir"] + "/*.op.gz"))
    a = txt.select("USAF", "WBAN", "YEARMODA", "TEMP", "PRCP").toPandas()
    b = (
        pipeline_outputs["observations"]
        .select("USAF", "WBAN", "YEARMODA", "TEMP", "PRCP")
        .toPandas()
    )
    # text path has no semi-join applied; restrict to surviving keys
    keys = _surviving_station_keys()
    a = a[a.apply(lambda r: (r["USAF"], r["WBAN"]) in keys, axis=1)]
    a = a.sort_values(["USAF", "WBAN", "YEARMODA"]).reset_index(drop=True)
    b = b.sort_values(["USAF", "WBAN", "YEARMODA"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_tar_source_matches_flat_files(spark, tree):
    """S3: tar archive ingestion == flat .op.gz ingestion, row for row."""
    tar_rows = read_gsod_tar(spark, tree["tar_dir"]).toPandas()
    flat_rows = read_op_files(spark, tree["op_dir"] + "/*.op.gz").toPandas()
    key = ["USAF", "WBAN", "YEARMODA"]
    pd.testing.assert_frame_equal(
        tar_rows.sort_values(key).reset_index(drop=True),
        flat_rows.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_map_export_ordered(pipeline_outputs):
    exported = map_export(pipeline_outputs["monthly_with_station"]).toPandas()
    assert list(exported.columns) == ["LAT", "LON", "month_start", "PRCP", "TEMP", "LBL"]
    assert exported["month_start"].is_monotonic_increasing


def test_plan_quality(pipeline_outputs):
    """SURVEY §4: the pipeline's physical plan must broadcast the dim join
    and keep whole-stage codegen; the parquet scan prunes columns."""
    from ucr_bigdata_snowfallproject_spark.plans import (
        has_broadcast_join,
        has_whole_stage_codegen,
    )

    joined = pipeline_outputs["monthly_with_station"]
    assert has_broadcast_join(joined)
    assert has_whole_stage_codegen(joined)
