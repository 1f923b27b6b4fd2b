"""Geospatial operators: haversine distance and a grid-blocked
bounded-radius nearest-neighbor join.

The reference project's serving layer is literally a map of stations
(`map_tutorial.html:44-71` renders station points; `untitled.py:25-36`
carries LAT/LON through the pipeline), so "which station is nearest to X"
is the natural geo query its users run downstream. This module gives that
a 100 TB-shaped answer: the classic geospatial blocking scheme
(GeoSpark/Sedona-style grid partitioning re-expressed on plain DataFrame
ops) — never a cross join.

Design, in the same mold as the embedding near-dup blocking
(`similarity.embedding_near_dup_blocked`):

- Points map to lat/lon grid cells of ``cell_deg`` degrees. Cell width is
  chosen ≥ the query radius in latitude degrees, so a radius ball spans a
  bounded ring of cells.
- The RIGHT side (dimension — stations, suppliers, POIs; typically the
  small one) is replicated to the covering ring of cells; the left fact
  side stays single-cell. The join is a plain equi-join on
  ``(cell_lat, cell_lon)`` — one shuffle, AQE free to broadcast the
  replicated dim.
- Longitude cells wrap modulo the cell count (date-line safe). The ring
  width in longitude follows from the haversine bound
  ``sin(Δλ/2) ≤ sin(r/2R)/cos(φ_max)`` at the caller-declared
  ``max_abs_lat`` — the standard contract for grid blocking (polar data
  needs bigger cells; the constructor validates the ring fits the globe
  and raises otherwise, instead of silently under-covering).
- Exactness: every pair within ``radius_km`` falls inside the ring by the
  bound above, each candidate pair is generated exactly once (ring cells
  are distinct — guarded), and the final haversine filter + per-left
  top-k window give set-identical results to the naive cross-join form
  (which is what the DuckDB oracle computes).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius

#: degrees of latitude per kilometre
_DEG_PER_KM = 180.0 / (math.pi * EARTH_RADIUS_KM)


def _haversine_terms(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Haversine great-circle distance in km. Structured as named products
    (sdlat·sdlat + cc·sdlon·sdlon) — not pow() — so an oracle engine
    mirroring the expression performs the identical IEEE operations."""
    sdlat = F.sin(F.radians(lat2 - lat1) / 2)
    sdlon = F.sin(F.radians(lon2 - lon1) / 2)
    cc = F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
    return (
        F.lit(2.0)
        * F.lit(EARTH_RADIUS_KM)
        * F.asin(F.sqrt(sdlat * sdlat + cc * sdlon * sdlon))
    )


def haversine_km(
    lat1: Column | str,
    lon1: Column | str,
    lat2: Column | str,
    lon2: Column | str,
) -> Column:
    as_col = lambda c: F.col(c) if isinstance(c, str) else c  # noqa: E731
    return _haversine_terms(as_col(lat1), as_col(lon1), as_col(lat2), as_col(lon2))


def geo_nearest_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    radius_km: float,
    k: int = 1,
    left_lat: str = "lat",
    left_lon: str = "lon",
    right_lat: str = "lat",
    right_lon: str = "lon",
    cell_deg: float | None = None,
    max_abs_lat: float = 66.0,
    out_dist: str = "dist_km",
    round_digits: int = 3,
) -> DataFrame:
    """For every left point, the ``k`` nearest right points within
    ``radius_km`` (haversine), ranked on the distance ROUNDED to
    ``round_digits`` (the same rounding the output carries — see the
    ranking-key note below), ties broken by ``right_id``. Returns
    (left_id, right_id, out_dist, rank); left points with no right point
    in radius emit no row — the bounded-radius contract that makes grid
    blocking EXACT rather than approximate.

    ``max_abs_lat`` declares the largest |latitude| present on either
    side (default 66° — the polar circles); it sizes the longitude ring.
    Data beyond it would break the coverage guarantee — raise the cell
    size (or the parameter) for polar datasets.

    Scale shape: the right side replicates to the O(1)-sized covering
    ring (ring cells, not data, bound the factor); one equi-join shuffle
    on the cell key (AQE broadcasts a small dim); per-left top-k is a
    window over ring-local candidates. No cross join at any scale."""
    r_deg = radius_km * _DEG_PER_KM
    if cell_deg is None:
        # half the radius: measured sweet spot between ring overshoot
        # (big cells waste haversine evaluations on far candidates) and
        # replication factor (small cells multiply the dim copies)
        cell_deg = r_deg / 2.0
    # tight ring span: a point within D degrees is at most ceil(D/cell)
    # cells away (offset-in-cell o < cell ⇒ floor((o+D)/cell) ≤ ceil(D/cell))
    slat = int(math.ceil(r_deg / cell_deg))
    cos_max = math.cos(math.radians(min(max_abs_lat, 89.0)))
    dlon_deg = 2.0 * math.degrees(
        math.asin(min(1.0, math.sin(radius_km / (2.0 * EARTH_RADIUS_KM)) / cos_max))
    )
    slon = int(math.ceil(dlon_deg / cell_deg))
    n_lon = int(math.ceil(360.0 / cell_deg))
    if 2 * slon + 1 > n_lon:
        raise ValueError(
            f"longitude ring ({2 * slon + 1} cells) exceeds the globe "
            f"({n_lon} cells): raise cell_deg or lower max_abs_lat "
            f"(radius_km={radius_km}, cell_deg={cell_deg}, "
            f"max_abs_lat={max_abs_lat})"
        )

    def lat_cell(c: str) -> Column:
        return F.floor(F.col(c) / F.lit(cell_deg)).cast("long")

    def lon_cell(c: str) -> Column:
        return F.pmod(
            F.floor((F.col(c) + F.lit(180.0)) / F.lit(cell_deg)).cast("long"),
            F.lit(n_lon),
        )

    # cos(lat) precomputes per POINT (not per candidate pair) — the value
    # is identical to inlining cos(radians(lat)) in the distance formula,
    # so oracle mirroring is unaffected, but half the per-pair trig goes away
    lf = left.select(
        F.col(left_id),
        F.col(left_lat).alias("__llat"),
        F.col(left_lon).alias("__llon"),
        F.cos(F.radians(F.col(left_lat))).alias("__lcos"),
        lat_cell(left_lat).alias("__clat"),
        lon_cell(left_lon).alias("__clon"),
    )
    rrep = (
        right.select(
            F.col(right_id),
            F.col(right_lat).alias("__rlat"),
            F.col(right_lon).alias("__rlon"),
            F.cos(F.radians(F.col(right_lat))).alias("__rcos"),
            lat_cell(right_lat).alias("__rclat"),
            lon_cell(right_lon).alias("__rclon"),
        )
        .withColumn("__dlat", F.explode(F.sequence(F.lit(-slat), F.lit(slat))))
        .withColumn("__dlon", F.explode(F.sequence(F.lit(-slon), F.lit(slon))))
        .select(
            F.col(right_id),
            "__rlat",
            "__rlon",
            "__rcos",
            (F.col("__rclat") + F.col("__dlat")).alias("__clat"),
            F.pmod(F.col("__rclon") + F.col("__dlon"), F.lit(n_lon)).alias("__clon"),
        )
    )
    sdlat = F.sin(F.radians(F.col("__rlat") - F.col("__llat")) / 2)
    sdlon = F.sin(F.radians(F.col("__rlon") - F.col("__llon")) / 2)
    cc = F.col("__lcos") * F.col("__rcos")
    dist = (
        F.lit(2.0)
        * F.lit(EARTH_RADIUS_KM)
        * F.asin(F.sqrt(sdlat * sdlat + cc * sdlon * sdlon))
    )
    # bounding-box prefilter: |Δφ| ≤ r_deg and circular |Δλ| ≤ dlon_deg are
    # NECESSARY for d ≤ r (the same bounds that sized the ring), so this
    # prunes ring corners with two comparisons before any trig runs. The
    # 1e-6 relative margin absorbs double rounding at the exact boundary;
    # results are identical — it is a strict superset filter.
    dlat_abs = F.abs(F.col("__rlat") - F.col("__llat"))
    dlon_abs = F.abs(F.col("__rlon") - F.col("__llon"))
    dlon_circ = F.least(dlon_abs, F.lit(360.0) - dlon_abs)
    box = (dlat_abs <= F.lit(r_deg * 1.000001)) & (
        dlon_circ <= F.lit(dlon_deg * 1.000001)
    )
    cands = (
        lf.join(rrep, ["__clat", "__clon"])
        .filter(box)
        .withColumn("__d", dist)
        .filter(F.col("__d") <= F.lit(float(radius_km)))
    )
    # Ranking key: the ROUNDED distance (the same rounding the output
    # carries), with right_id breaking ties. Ranking on the raw double
    # would make the order implementation-defined when two candidates'
    # distances differ below double rounding (hypothesis found such a
    # pair: two right points 2e-16° apart — different engines/op orders
    # legitimately disagree on which raw haversine is smaller). On the
    # rounded grid the order is a well-defined function of the data.
    dq = F.round(F.col("__d"), round_digits)
    if k == 1:
        # arg-min as a partial-aggregable struct-min: map-side combine
        # collapses each partition to ≤1 candidate per left key before the
        # shuffle — measured ~2× over the window form at sf0.1. Struct
        # comparison is lexicographic (rounded d, then right_id) = the
        # same tie-break as the window's ORDER BY.
        agged = cands.groupBy(left_id).agg(
            F.min(F.struct(dq.alias("__dq"), F.col(right_id))).alias("__m")
        )
        return agged.select(
            left_id,
            F.col(f"__m.{right_id}").alias(right_id),
            F.col("__m.__dq").alias(out_dist),
            F.lit(1).alias("rank"),
        )
    w = Window.partitionBy(left_id).orderBy(dq.asc(), F.asc(right_id))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            left_id,
            right_id,
            F.round(F.col("__d"), round_digits).alias(out_dist),
            "rank",
        )
    )
