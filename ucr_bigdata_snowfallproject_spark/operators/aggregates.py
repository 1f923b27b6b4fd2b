"""Aggregation layer (SURVEY §2.4 + grouping sets + sketches X6).

Scale policy (SURVEY §7.4): exact ``median`` is not partial-aggregable —
Spark plans an ObjectHashAggregate buffering each group.  Fine at test
scale; at 100 TB use ``approx=True`` which switches to the mergeable
KLL-style ``percentile_approx`` sketch (map-side combine, bounded memory).
The switch is an explicit per-call policy, not a silent default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_median(
    df: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Multi-column group-by median (A1; reference untitled.py:81
    ``groupby([...]).agg('median')``). Output columns keep measure names,
    matching the reference's shape."""
    agg_fn = (
        (lambda c: F.percentile_approx(c, 0.5, accuracy))
        if approx
        else (lambda c: F.median(c))
    )
    return df.groupBy(*keys).agg(*[agg_fn(m).alias(m) for m in measures])


def group_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    measure: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Grouped quantiles at several probabilities — the distribution-shape
    twin of :func:`group_median`, same exact/approx policy: exact
    ``percentile`` (linear interpolation, ObjectHashAggregate buffering —
    test scale) vs the mergeable ``percentile_approx`` sketch (100 TB /
    streaming). Output columns ``q25, q50, ...`` named from the prob."""

    def name(p: float) -> str:
        return f"q{p * 100:g}".replace(".", "_")

    if approx:
        aggs = [
            F.percentile_approx(measure, p, accuracy).alias(name(p)) for p in probs
        ]
    else:
        aggs = [F.expr(f"percentile({measure}, {p!r})").alias(name(p)) for p in probs]
    return df.groupBy(*keys).agg(*aggs)


def group_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """General grouped aggregation; partial+final hash agg comes free."""
    return df.groupBy(*keys).agg(*aggs)


def scalar_agg(df: DataFrame, *aggs: Column) -> DataFrame:
    """Global scalar aggregate (A3; reference min/max over the year list at
    untitled.py:29-30). One row out; use as a broadcast scalar, never
    ``collect`` into driver-side loops."""
    return df.agg(*aggs)


def rollup_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Hierarchical rollup (SURVEY §2.4 extension, e.g. YEAR→MONTH)."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def correlation_matrix(df: DataFrame, target: str, cols: Sequence[str] | None = None) -> DataFrame:
    """Pearson correlation of ``target`` vs every numeric column — in ONE
    job (A4 redesign, SURVEY §3.2).

    The reference loops ``df.stat.corr`` per column (untitled.py:162-165),
    launching O(columns) full scans, and probes ``take(1)`` per column to
    find numeric types; here the numeric set comes from ``df.schema``
    (metadata, F10) and all ``corr`` aggregates run in a single pass.
    """
    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("double", "float", "integer", "long", "short")
            and f.name != target
        ]
    aggs = [F.corr(target, c).alias(f"corr_{c}") for c in cols]
    return df.agg(*aggs)


def rmse(predictions: DataFrame, label: str, prediction: str = "prediction") -> DataFrame:
    """RMSE as a plain aggregate (A5; reference untitled.py:238-240 uses the
    MLlib evaluator — same math, one row out)."""
    return predictions.agg(
        F.sqrt(F.avg(F.pow(F.col(prediction) - F.col(label), F.lit(2)))).alias("rmse")
    )


def approx_distinct(df: DataFrame, cols: Sequence[str], rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct-count sketch (X6). Mergeable → map-side
    partials, constant memory; the 100 TB answer to COUNT(DISTINCT)."""
    return df.agg(*[F.approx_count_distinct(c, rsd).alias(f"approx_distinct_{c}") for c in cols])


def distinct_count(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Exact distinct count (expands to a two-phase aggregate)."""
    return df.agg(*[F.countDistinct(c).alias(f"distinct_{c}") for c in cols])


def approx_quantiles(
    df: DataFrame, col: str, probabilities: Sequence[float], accuracy: int = 10000
) -> DataFrame:
    """Quantile sketch (X6): percentile_approx at the given probabilities."""
    return df.agg(
        F.percentile_approx(col, list(probabilities), accuracy).alias(f"quantiles_{col}")
    )


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx: bool = False,
    round_digits: int = 4,
) -> DataFrame:
    """Column-profiling report — the data-quality pass a curation pipeline
    runs before anything else: one row per column with row/null/distinct
    counts and (numeric columns) min/max/mean.

    ``approx=True`` is the 100 TB switch: HyperLogLog distinct sketches
    (mergeable, constant memory, ONE aggregation pass for every column)
    instead of exact COUNT(DISTINCT) — Spark plans the exact form as an
    Expand (one replica of the input per counted column), correct but
    ×columns shuffle volume; sketches profile arbitrarily wide tables in
    one scan.

    Output: (col_name, n_rows, n_nulls, n_distinct, min_d, max_d, mean) —
    numeric stats NULL for non-numeric columns.
    """
    if cols is None:
        cols = [f.name for f in df.schema.fields]
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("double", "float", "integer", "long", "short", "decimal")
    }
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(distinct(c).alias(f"__dist_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
            aggs.append(
                F.round(F.avg(F.col(c).cast("double")), round_digits).alias(f"__mean_{c}")
            )
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        if c in numeric:
            rows.append(
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__nulls_{c}").alias("n_nulls"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                    F.col(f"__min_{c}").alias("min_d"),
                    F.col(f"__max_{c}").alias("max_d"),
                    F.col(f"__mean_{c}").alias("mean"),
                )
            )
        else:
            rows.append(
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__nulls_{c}").alias("n_nulls"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                    F.lit(None).cast("double").alias("min_d"),
                    F.lit(None).cast("double").alias("max_d"),
                    F.lit(None).cast("double").alias("mean"),
                )
            )
    return wide.select(F.explode(F.array(*rows)).alias("__p")).select("__p.*")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Dataset drift report between two snapshots keyed by ``key``: one
    row per compare column (col_name) with added/removed/changed/unchanged counts —
    the regression check a curation pipeline runs between corpus versions
    ("how much did the rewrite touch?").

    One full outer join on the key (sort-merge at scale), column compares
    are null-safe (``<=>``), and the per-column report explodes from ONE
    joined pass — no per-column jobs."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c != key and c in old.columns]
    o = old.select(key, *[F.col(c).alias(f"__o_{c}") for c in compare_cols]).withColumn(
        "__in_o", F.lit(1)
    )
    n = new.select(key, *[F.col(c).alias(f"__n_{c}") for c in compare_cols]).withColumn(
        "__in_n", F.lit(1)
    )
    j = o.join(n, key, "full_outer")
    added = F.count(F.when(F.col("__in_o").isNull(), 1))
    removed = F.count(F.when(F.col("__in_n").isNull(), 1))
    both = F.col("__in_o").isNotNull() & F.col("__in_n").isNotNull()
    reports = [
        F.struct(
            F.lit(c).alias("col_name"),
            added.alias("n_added"),
            removed.alias("n_removed"),
            F.count(
                F.when(both & ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), 1)
            ).alias("n_changed"),
            F.count(
                F.when(both & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), 1)
            ).alias("n_unchanged"),
        )
        for c in compare_cols
    ]
    return j.agg(F.array(*reports).alias("__r")).select(
        F.explode("__r").alias("__p")
    ).select("__p.*")


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    bins: int = 10,
    smooth: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the distribution-drift twin of :func:`snapshot_diff`'s
    row-level report (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted
    — the standard monitoring thresholds).

    Bins are fixed-width over the OLD snapshot's [min, max] (the reference
    distribution defines the grid; new rows outside clamp into the edge
    bins), counts are add-``smooth`` smoothed so empty bins never produce
    infinities, and ``PSI = Σ (p_new - p_old)·ln(p_new/p_old)``.

    Scale: one min/max aggregate over old + one binned groupBy per side —
    three partial-aggregable passes, no joins wider than ``bins`` rows.
    Output: one row (psi, n_bins, n_old, n_new)."""
    lo, hi = old.agg(
        F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
    ).first()
    span = (hi - lo) or 1.0

    def binned(df: DataFrame) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor((F.col(col).cast("double") - lo) / span * bins), F.lit(0)
            ),
            F.lit(bins - 1),
        )
        return df.filter(F.col(col).isNotNull()).groupBy(b.alias("__b")).agg(
            F.count(F.lit(1)).alias("__n")
        )

    o, n = binned(old).alias("o"), binned(new).alias("n")
    grid = old.sparkSession.range(bins).select(F.col("id").alias("__b"))
    j = (
        grid.join(o.withColumnRenamed("__n", "__no"), "__b", "left")
        .join(n.withColumnRenamed("__n", "__nn"), "__b", "left")
        .select(
            F.coalesce("__no", F.lit(0)).alias("__no"),
            F.coalesce("__nn", F.lit(0)).alias("__nn"),
        )
    )
    tot = j.agg(
        F.sum("__no").alias("__to"), F.sum("__nn").alias("__tn")
    )
    p_old = (F.col("__no") + smooth) / (F.col("__to") + smooth * bins)
    p_new = (F.col("__nn") + smooth) / (F.col("__tn") + smooth * bins)
    return (
        j.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.sum((p_new - p_old) * F.log(p_new / p_old)), round_digits
            ).alias("psi"),
            F.lit(bins).alias("n_bins"),
            F.max("__to").cast("bigint").alias("n_old"),
            F.max("__tn").cast("bigint").alias("n_new"),
        )
    )


def winsorize(
    df: DataFrame,
    keys: Sequence[str],
    measure: str,
    lower: float = 0.01,
    upper: float = 0.99,
    approx: bool = False,
    out_col: str | None = None,
    round_digits: int | None = 4,
) -> DataFrame:
    """Per-group winsorization: clip ``measure`` into its group's
    [``lower``, ``upper``] quantile band — the outlier-taming step for
    numeric feature columns before training/statistics (keeps every row,
    unlike the drop-the-tails :func:`~.text.length_band_filter`).

    Same exact/approx policy as :func:`group_quantiles` (exact
    interpolated percentile at test scale, mergeable sketch at 100 TB);
    the clip bounds compute in one grouped pass and re-join by key (tiny,
    AQE-broadcast). Appends ``out_col`` (default ``<measure>_wins``)."""
    out_col = out_col or f"{measure}_wins"
    bounds = group_quantiles(
        df, keys, measure, probs=(lower, upper), approx=approx
    )
    lo_name = f"q{lower * 100:g}".replace(".", "_")
    hi_name = f"q{upper * 100:g}".replace(".", "_")
    clipped = F.least(
        F.greatest(F.col(measure).cast("double"), F.col(lo_name)), F.col(hi_name)
    )
    if round_digits is not None:
        clipped = F.round(clipped, round_digits)
    return (
        df.join(bounds, list(keys))
        .withColumn(out_col, clipped)
        .drop(lo_name, hi_name)
    )


def mad_outlier_stats(
    df: DataFrame,
    keys: Sequence[str],
    measure: str,
    k: float = 3.0,
    approx: bool = False,
    round_digits: int = 2,
) -> DataFrame:
    """Per-group robust outlier summary via median absolute deviation —
    the outlier detector that (unlike z-scores) isn't corrupted by the
    outliers it is hunting: med = median(x), mad = median(|x − med|),
    flag |x − med| > k·mad. Returns one row per group:
    (keys..., n, med, mad, n_outliers).

    Same exact/approx policy as :func:`group_quantiles`: exact
    interpolated ``percentile`` (DuckDB-oracle-matched) at test scale,
    mergeable ``percentile_approx`` sketch at 100 TB. Cost: two grouped
    median passes (the second over deviations) and a counting pass; the
    per-group stat frames are group-cardinality-sized and re-join by key
    (AQE-broadcast), so the fact table shuffles on the group key only."""
    pctl = "percentile_approx" if approx else "percentile"
    med = df.groupBy(*keys).agg(
        F.expr(f"{pctl}({measure}, 0.5)").alias("__med")
    )
    dev = df.join(med, list(keys))
    mad = dev.groupBy(*keys).agg(
        F.expr(f"{pctl}(abs({measure} - __med), 0.5)").alias("__mad")
    )
    flagged = dev.join(mad, list(keys))
    return flagged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first("__med"), round_digits).alias("med"),
        F.round(F.first("__mad"), round_digits).alias("mad"),
        F.sum(
            F.when(
                F.abs(F.col(measure) - F.col("__med")) > k * F.col("__mad"), 1
            ).otherwise(0)
        ).alias("n_outliers"),
    )


def group_ols(
    df: DataFrame,
    keys: Sequence[str],
    x: Column,
    y: Column,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group simple linear regression (y ~ x) in closed form from the
    five classical sufficient statistics — the scan-speed way to answer
    "what's the trend per group" without MLlib:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n
        r²        = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    Returns (keys..., n, slope, intercept, r2). Groups with a single
    distinct x (denominator 0) get NULL slope/intercept/r2; likewise r2
    when y is constant.

    Determinism contract: callers pass INTEGER-valued x/y expressions
    (day ordinals, cents, counts). Integer sums are associative and
    therefore partition-order-independent, so Σx/Σy/Σxy/Σx²/Σy² are
    bit-identical across engines and runs; only the final closed-form
    arithmetic is floating point, computed once per group from identical
    operands — the same exact-integer-sums rule as
    :func:`~..operators.windows.rolling_anomalies`. (At 100 TB, swap the
    x·y products to DECIMAL if magnitudes threaten Σ overflow of int64 —
    the plan shape is unchanged.)

    Scale shape: one partial-aggregable groupBy — five sums and a count
    ride a single shuffle on the group key; the derived columns are
    per-group scalar math on the (group-cardinality-sized) result."""
    xl = x.cast("long")
    yl = y.cast("long")
    agged = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xl).alias("__sx"),
        F.sum(yl).alias("__sy"),
        F.sum(xl * yl).alias("__sxy"),
        F.sum(xl * xl).alias("__sxx"),
        F.sum(yl * yl).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    cov_n = n * sxy - sx * sy  # n² · cov
    var_x = n * sxx - sx * sx  # n² · var(x)
    var_y = n * syy - sy * sy
    slope = F.when(var_x != 0, cov_n / var_x)
    intercept = F.when(var_x != 0, (sy - (cov_n / var_x) * sx) / n)
    r2 = F.when((var_x != 0) & (var_y != 0), (cov_n * cov_n) / (var_x * var_y))
    return agged.select(
        *keys,
        "n",
        F.round(slope, round_digits).alias("slope"),
        F.round(intercept, round_digits).alias("intercept"),
        F.round(r2, round_digits).alias("r2"),
    )


def histogram_fixed(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Per-group fixed-width histogram: ``n_bins`` equal bins over
    [``lo``, ``hi``), out-of-range values clamped into the edge bins
    (width_bucket semantics), EMPTY BINS EMITTED — every group yields
    exactly ``n_bins`` rows (keys…, bin, lo_edge, hi_edge, n), so
    downstream plotting/drift code never special-cases gaps.

    Why not ``histogram_numeric``: Spark's built-in picks data-dependent
    bin centers (a streaming heuristic) — non-deterministic across
    partition orders and unreproducible in any other engine. Fixed edges
    are the PSI/drift-monitoring contract (aggregates.psi_drift uses the
    same binning rule).

    Scale shape: ONE partial-aggregable groupBy on (keys…, bin) — the
    only corpus-sized pass; the empty-bin scaffold is |groups|·n_bins
    rows built from a distinct-keys pass and AQE-broadcast back. NULL
    values are excluded (they're a data-quality signal, not a bin).

    Determinism: bin index = clamped floor((v−lo)/width) and the edges
    lo + bin·width are plain IEEE-754 double ops — engine-bit-identical."""
    width = (hi - lo) / n_bins
    v = F.col(value_col)
    # bin index stays LONG until after the clamp: casting floor()'s
    # bigint to int FIRST would int32-wrap a value > ~2^31 widths out of
    # range and land it in the wrong edge bin (ADVICE r07) — the clamp
    # must see the true magnitude, the post-clamp value is provably small
    raw_bin = F.floor((v - F.lit(float(lo))) / F.lit(width))
    bin_col = F.least(
        F.greatest(raw_bin, F.lit(0).cast("long")), F.lit(n_bins - 1).cast("long")
    ).cast("int")
    counts = (
        df.filter(v.isNotNull())
        .groupBy(*keys, bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scaffold = (
        df.select(*keys)
        .distinct()
        .select(
            *keys, F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
        )
    )
    return scaffold.join(counts, [*keys, "bin"], "left").select(
        *keys,
        "bin",
        (F.lit(float(lo)) + F.col("bin") * F.lit(width)).alias("lo_edge"),
        (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width)).alias("hi_edge"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    )


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    round_digits: int = 6,
    quantize: tuple[float, float, int] | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic — the binning-free drift
    test completing the monitor trio (``psi_drift`` needs bin choices,
    ``text.term_distribution_jsd`` covers text): D = max|ECDF_a − ECDF_b|
    over the pooled values, tie-correct (the ECDFs step together at
    shared values). Returns ONE row (ks, n_a, n_b).

    Exactness: the supremum is found on the INTEGER lattice —
    ``|cum_a·n_b − cum_b·n_a|`` per distinct value (int64: needs
    n_a·n_b < 2⁶³, i.e. both sides < ~3·10⁹ rows; at larger scale sample
    first, as every KS user does) — and only the final max divides by
    n_a·n_b: one float division + floor-half-up rounding, engine-bit-
    identical. NULLs are excluded (not a distribution value).

    Scale shape: per-side (value) groupBys reduce to distinct-value
    counts; ONE window cumsum over the merged distinct-value table —
    vocabulary-sized, not row-sized — then a 1-row max. The global-order
    window is a single-partition sort over DISTINCT values only, so like
    ``group_median``'s exact/approx switch there are two modes:

    - ``quantize=None`` (exact): D over the raw distinct values — right
      whenever their cardinality is bounded (categorical codes, prices,
      integer grids).
    - ``quantize=(lo, hi, n_bins)``: values first snap to the lower edge
      of their bin under the SAME clamped width_bucket rule as
      :func:`histogram_fixed` (out-of-range clamps to the edge bins),
      bounding the window input to ≤ n_bins rows BY CONSTRUCTION — the
      100 TB default for high-cardinality doubles. Binned D is the
      standard lower bound on exact D (both ECDFs are evaluated on the
      same coarsened grid); edges are plain IEEE double ops, so the
      statistic stays engine-bit-identical."""
    from pyspark.sql import Window

    v_in = F.col(value_col)
    if quantize is not None:
        lo, hi, n_bins = quantize
        width = (hi - lo) / n_bins
        # long until clamped — same int32-wrap hazard as histogram_fixed
        raw_bin = F.floor((v_in - F.lit(float(lo))) / F.lit(width))
        clamped = F.least(
            F.greatest(raw_bin, F.lit(0).cast("long")),
            F.lit(n_bins - 1).cast("long"),
        )
        v_in = F.lit(float(lo)) + clamped.cast("double") * F.lit(width)

    a = (
        df_a.filter(F.col(value_col).isNotNull())
        .groupBy(v_in.alias("v"))
        .agg(F.count(F.lit(1)).alias("__a"))
    )
    b = (
        df_b.filter(F.col(value_col).isNotNull())
        .groupBy(v_in.alias("v"))
        .agg(F.count(F.lit(1)).alias("__b"))
    )
    merged = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("__a", F.lit(0)).alias("__a"),
        F.coalesce("__b", F.lit(0)).alias("__b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        F.sum("__a").over(w).alias("__ca"),
        F.sum("__b").over(w).alias("__cb"),
    )
    tot = merged.agg(
        F.sum("__a").alias("__na"), F.sum("__b").alias("__nb")
    )
    p = float(10**round_digits)
    d_int = F.max(
        F.abs(F.col("__ca") * F.col("__nb") - F.col("__cb") * F.col("__na"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            (
                F.floor(
                    d_int.cast("double")
                    / (F.first("__na") * F.first("__nb")).cast("double")
                    * p
                    + F.lit(0.5)
                )
                / p
            ).alias("ks"),
            F.first("__na").alias("n_a"),
            F.first("__nb").alias("n_b"),
        )
    )


def key_skew_stats(
    df: DataFrame,
    keys: Sequence[str],
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Shuffle-key skew diagnostic: the distribution of per-key row counts
    for a prospective join/groupBy key — THE question to ask before
    shuffling 100 TB on it ("is this key salted-join material?",
    SCALE.md's skew row). Returns ONE row:

    - ``n_keys``, ``n_rows``, ``max_count`` — cardinality & the hot key
    - ``p<P>_count`` per prob — count percentiles (exact interpolated
      ``percentile`` at test scale; mergeable ``percentile_approx`` at
      100 TB, same switch as :func:`group_quantiles`)
    - ``top_share`` — max_count / n_rows (the skew-join trigger: AQE's
      skew threshold is a per-partition analog of this)
    - ``cv_count`` — coefficient of variation of the counts, computed
      from INTEGER moments (√(n·Σc² − (Σc)²) / Σc — one sqrt + one
      division on exact decimal(38,0) sums/products, engine-bit-identical;
      the binding exactness bound is n_keys·Σc² < 10³⁸, and past it the
      decimal arithmetic yields NULL — a visible failure, never a
      plausible-but-wrong CV. For context: at 10¹⁵ rows (≈100 TB) with
      10⁹ keys, n_keys·Σc² ≤ n_keys·n_rows·max_count ≈ 10³⁹ only if ONE
      key holds ~all rows — real key spreads sit orders below the bound)

    Scale shape: one partial-aggregable (keys) groupBy count — the same
    shuffle the diagnosed join would pay, but with count-collapsed
    payload — then a 1-row aggregate over the key-count frame."""
    counts = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("__c")
    )

    def pname(p: float) -> str:
        return f"p{p * 100:g}_count".replace(".", "_")

    if approx:
        qaggs = [
            F.percentile_approx("__c", p, accuracy).cast("double").alias(pname(p))
            for p in probs
        ]
    else:
        qaggs = [F.expr(f"percentile(__c, {p!r})").alias(pname(p)) for p in probs]
    row = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__c").alias("n_rows"),
        F.max("__c").alias("max_count"),
        # decimal(19,0)·long → decimal(38,0) product/sum: exact past the
        # int64 range (long·long wraps silently with ANSI off — the
        # overflow would surface exactly at the huge-corpus scale this
        # diagnostic exists for)
        F.sum(F.col("__c").cast("decimal(19,0)") * F.col("__c")).alias("__sum2"),
        *qaggs,
    )
    return row.select(
        "n_keys",
        "n_rows",
        "max_count",
        *[F.round(F.col(pname(p)), 4).alias(pname(p)) for p in probs],
        F.round(F.col("max_count") / F.col("n_rows").cast("double"), 6).alias(
            "top_share"
        ),
        F.round(
            F.sqrt(
                (
                    # stays in decimal(38,0): exact up to n_keys·Σc² < 10³⁸,
                    # NULL (not wrapped) beyond — see docstring bound
                    F.col("n_keys").cast("decimal(19,0)") * F.col("__sum2")
                    - F.col("n_rows").cast("decimal(19,0)") * F.col("n_rows")
                ).cast("double")
            )
            / F.col("n_rows").cast("double"),
            6,
        ).alias("cv_count"),
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str] | None = None,
    top_keys: int = 5,
) -> DataFrame:
    """Pre-flight inner-join output-size diagnostic: the EXACT
    ``|A ⋈ B| = Σ_k cA(k)·cB(k)`` plus where it concentrates — THE
    question to answer before launching a 100 TB join whose output might
    be 100× its inputs (key_skew_stats answers "is ONE side skewed";
    this answers "does the PAIR multiply").

    Returns ONE row:

    - ``join_rows`` — exact inner-join cardinality (decimal(38,0) sum of
      per-key count products: exact to 10³⁸, NULL — never wrapped — past
      it)
    - ``n_join_keys`` — distinct keys present on BOTH sides
    - ``max_key_rows`` — the largest single key's contribution (the row
      count the hottest post-join partition must absorb: the AQE
      skew-join / salting trigger)
    - ``top_share`` — Σ(top ``top_keys`` contributions) / join_rows —
      how concentrated the blow-up is
    - ``amplification`` — join_rows / max(|A|, |B|) (>1 ⇒ the join
      EXPANDS its larger input; the "did you mean this" alarm)

    Cost shape: two count-collapsed groupBys (partial-aggregable — the
    shuffle carries one row per distinct key per side, never the fact
    rows) + one equi-join on the collapsed profiles + one scalar agg.
    Per-key contributions cA·cB are computed in decimal(19,0)·long →
    decimal(38,0): exact where int64 would silently wrap (cA, cB ~10⁹
    each already overflows long). Integer arithmetic end-to-end ⇒
    engine-bit-identical, DuckDB-oracle-able."""
    right_keys = list(right_keys or left_keys)
    left_keys = list(left_keys)
    a = left.groupBy(*[F.col(k).alias(f"__k{i}") for i, k in enumerate(left_keys)]).agg(
        F.count(F.lit(1)).alias("__ca")
    )
    b = right.groupBy(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(right_keys)]
    ).agg(F.count(F.lit(1)).alias("__cb"))
    keys = [f"__k{i}" for i in range(len(left_keys))]
    prod = a.join(b, keys).select(
        (F.col("__ca").cast("decimal(19,0)") * F.col("__cb")).alias("__p")
    )
    # everything below is 1-row frames — the crossJoins are scalar
    # broadcasts (the repo-wide bounded-crossJoin contract), no collect
    row = prod.agg(
        F.sum("__p").alias("join_rows"),
        F.count(F.lit(1)).alias("n_join_keys"),
        F.max("__p").alias("max_key_rows"),
    )
    # top-k contributions: TakeOrderedAndProject (bounded), then one sum
    topsum = (
        prod.orderBy(F.desc("__p"))
        .limit(top_keys)
        .agg(F.coalesce(F.sum("__p"), F.lit(0).cast("decimal(38,0)")).alias("__topsum"))
    )
    sizes = left.agg(F.count(F.lit(1)).alias("__na")).crossJoin(
        right.agg(F.count(F.lit(1)).alias("__nb"))
    )
    jr = F.coalesce(F.col("join_rows"), F.lit(0))  # empty intersection ⇒ 0
    return row.crossJoin(topsum).crossJoin(sizes).select(
        jr.cast("decimal(38,0)").alias("join_rows"),
        F.col("n_join_keys"),
        F.coalesce(F.col("max_key_rows"), F.lit(0))
        .cast("decimal(38,0)")
        .alias("max_key_rows"),
        F.when(
            jr > 0,
            F.round(F.col("__topsum").cast("double") / jr.cast("double"), 6),
        ).otherwise(F.lit(0.0)).alias("top_share"),
        F.round(
            jr.cast("double")
            / F.greatest(F.col("__na"), F.col("__nb"), F.lit(1)).cast("double"),
            6,
        ).alias("amplification"),
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_share: float = 0.01,
    counters: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters — every value of ``col`` whose frequency
    exceeds ``min_share`` of the (non-NULL) rows — via the two-phase
    Misra-Gries pattern, the standard way to get exact answers without
    ever shuffling the full distinct-value set:

    1. **Candidates**: each partition runs a Misra-Gries summary with
       ``k ≥ ceil(1/min_share)`` counters over Arrow batches (per-batch
       vectorized ``value_counts`` merged into the summary, then the
       standard decrement-and-clip compaction). MG guarantees any item
       with LOCAL frequency > n_p/(k+1) survives its partition's summary;
       an item with GLOBAL share > 1/(k+1) must exceed that bound in at
       least one partition, so the UNION of partition candidates is a
       superset of every true heavy hitter. ≤ k rows per partition leave
       the Python worker — the only Python stage, O(k) memory.
    2. **Verification**: one exact count restricted to the candidate set
       (broadcast semi-probe — candidates are O(k × partitions), bounded
       by construction, never corpus-sized), filtered to
       ``count > min_share · n``. No approximation survives to the
       output; MG only prunes what CANNOT qualify.

    Returns (item, cnt, share) — ``item`` keeps the source column's type
    via a final cast. NULLs are excluded (not a value). The full groupBy
    this replaces shuffles every distinct value; at 100 TB with 10⁹⁺
    distinct keys this shuffles only candidates.

    Supported item types: ATOMIC, string-round-trippable ones — string,
    integral/fractional numerics, decimal, boolean, date, timestamp (all
    of which survive ``cast(string)`` → ``cast(back)`` value-exact in
    Spark). Binary is REJECTED (invalid UTF-8 collapses under the string
    cast, silently merging distinct values), as are arrays/structs/maps
    (their string rendering is not injective)."""
    import math

    import pandas as pd
    from pyspark.sql import types as T

    # k = ceil(1/s) ⇒ 1/(k+1) < s, so the MG superset bound covers
    # min_share. A user-supplied ``counters`` can only RAISE k (a larger
    # summary admits more candidates, trading verification-join width for
    # compaction work) — lowering it below ceil(1/s) would void the
    # exactness guarantee, so it is clamped.
    k = max(counters or 0, math.ceil(1.0 / min_share))
    src = df.select(F.col(col).alias("item")).filter(F.col("item").isNotNull())
    dt = src.schema["item"].dataType
    if isinstance(dt, T.BinaryType) or not isinstance(dt, T.AtomicType):
        raise TypeError(
            f"heavy_hitters: column {col!r} has type {dt.simpleString()}; "
            "only atomic string-round-trippable types are supported "
            "(string/numeric/decimal/boolean/date/timestamp) — binary and "
            "complex types do not survive the internal string round-trip"
        )
    item_type = dt.simpleString()
    as_str = src.select(F.col("item").cast("string"))

    def mg_partition(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            for item, c in pdf["item"].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > k:
                # decrement-and-clip: subtract the (k+1)-th largest count
                # from everyone, drop non-positives (mergeable-summaries
                # compaction; preserves count lower bounds within n_p/(k+1))
                cut = sorted(counts.values(), reverse=True)[k]
                counts = {i: c - cut for i, c in counts.items() if c > cut}
        if counts:
            yield pd.DataFrame({"item": list(counts.keys())})

    candidates = as_str.mapInPandas(mg_partition, "item string").distinct()
    total = src.agg(F.count(F.lit(1)).alias("__n"))
    exact = (
        as_str.join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.lit(min_share) * F.col("__n"))
    )
    return exact.select(
        F.col("item").cast(item_type).alias("item"),
        "cnt",
        F.round(F.col("cnt") / F.col("__n").cast("double"), 6).alias("share"),
    )
