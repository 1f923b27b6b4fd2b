"""The reference's whole pipeline (untitled.py:19-86) as ONE lazy DataFrame
graph (SURVEY §3.1 redesign):

    read observations (S3/S4/S5) ──┐
    read + clean station dim ──────┤ semi join (J2, broadcast)
                                   ├─→ window arg-max latest day (P5)
                                   └─→ groupBy monthly medians (A1)
                                          └─→ broadcast join dim (J1) → sink

The reference executes this eagerly per file on the driver; here the
driver↔executor boundary appears only at the final action, and the only
shuffles are the median groupBy and the arg-max window (both keyed on
station — high cardinality, skew-safe). The dim joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import (
    clean_observations,
    extract_year,
    full_station_label,
)
from ..operators import aggregates, relational, windows

#: measures aggregated monthly (reference untitled.py:81 aggregates every
#: numeric column; these are the numerics after cleaning)
MEASURES = ["TEMP", "DEWP", "WDSP", "MAX", "MIN", "PRCP"]


def clean_stations(
    stations: DataFrame,
    min_year: int,
    max_year: int,
) -> DataFrame:
    """Station-dimension cleaning (reference untitled.py:26-36):

    - sentinel→NULL on LAT/LON/ELEV_M (P2, `[0.0,-999.0,-999.9]`)
    - drop stations without coordinates (P1)
    - keep stations active across the query window: END year == max_year
      and BEGIN year <= min_year (P3)
    - build the HTML label LBL (F5/F6 — null-skipping concat + conditional
      elevation line, implementing the reference's *intent*; its
      ``~np.isnan`` is buggy, SURVEY §7.4)
    - drop the staging columns (P6)
    """
    scrubbed = relational.scrub_sentinels(
        stations, cols=["LAT", "LON", "ELEV_M"]
    )
    filtered = (
        relational.filter_not_null(scrubbed, "LAT", "LON")
        .filter(extract_year("END") == F.lit(max_year))
        .filter(extract_year("BEGIN") <= F.lit(min_year))
    )
    labeled = filtered.withColumn(
        "LBL",
        full_station_label(
            F.col("STATION_NAME"), F.col("STATE"), F.col("CTRY"), F.col("ELEV_M")
        ),
    )
    return labeled.drop("STATION_NAME", "STATE", "ICAO", "BEGIN", "END")


def observed_stations_only(obs: DataFrame, stations: DataFrame) -> DataFrame:
    """J2: keep observations whose (USAF, WBAN) exists in the cleaned
    station dim — the reference's per-member probe (untitled.py:72) as a
    broadcast semi join."""
    return relational.semi_join(obs, stations.select("USAF", "WBAN"), ["USAF", "WBAN"])


def monthly_medians(obs_clean: DataFrame, approx: bool = False) -> DataFrame:
    """A1 (reference untitled.py:81): per-(station, year, month) median of
    every measure. ``approx=True`` switches to the mergeable
    percentile_approx sketch for cluster scale (SURVEY §7.4)."""
    return aggregates.group_median(
        obs_clean, ["USAF", "WBAN", "YEAR", "MONTH"], MEASURES, approx=approx
    )


def latest_day(obs_clean: DataFrame) -> DataFrame:
    """P5/A2 (reference untitled.py:80): all rows of each station's maximum
    observation date (ties kept — matches the reference, which keeps every
    row of the max day)."""
    return windows.latest_per_group(
        obs_clean, ["USAF", "WBAN"], "YEARMODA", keep_ties=True
    )


def join_stations(monthly: DataFrame, stations_clean: DataFrame) -> DataFrame:
    """J1 (reference untitled.py:85): monthly fact × station dimension,
    broadcast inner join on the compound key."""
    return relational.join_dim(monthly, stations_clean, on=["USAF", "WBAN"])


def run_pipeline(
    stations_raw: DataFrame,
    obs_raw: DataFrame,
    min_year: int,
    max_year: int,
    approx_median: bool = False,
) -> dict[str, DataFrame]:
    """The full untitled.py:19-86 flow; returns every intermediate the
    reference materializes (all lazy — callers pick their sinks)."""
    stations = clean_stations(stations_raw, min_year, max_year)
    obs = clean_observations(obs_raw)
    obs = observed_stations_only(obs, stations)
    monthly = monthly_medians(obs, approx=approx_median)
    return {
        "stations": stations,
        "observations": obs,
        "latest_day": latest_day(obs),
        "monthly_medians": monthly,
        "monthly_with_station": join_stations(monthly, stations),
    }


def map_export(monthly_with_station: DataFrame) -> DataFrame:
    """S11 engine-side equivalent: ordered (LAT, LON, ts, measure, LBL)
    export feeding a map/time-slider layer (reference map_tutorial.html's
    published layer). Deterministic ordering for reproducible files."""
    return monthly_with_station.select(
        "LAT",
        "LON",
        F.make_date("YEAR", "MONTH", F.lit(1)).alias("month_start"),
        "PRCP",
        "TEMP",
        "LBL",
    ).orderBy("month_start", "LAT", "LON")
