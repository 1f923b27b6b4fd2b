"""Skew mitigation (SURVEY S4), Pandas-UDF surface (X7), GSOD pipeline entry — query registrations.

Split from the flat ``queries.py`` in round 9 (VERDICT r08 #8): this
module exists for its ``@register`` side effects and is imported in a
fixed order by ``queries/__init__.py``; the registry order itself is
normalized afterwards by ``_reorder_registry`` (gated window first), so
module order never changes the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..io import load_table  # noqa: F401
from ..operators import aggregates, relational, windows  # noqa: F401
from ..operators import curation as curation_ops  # noqa: F401
from ..operators import dedup as dedup_ops  # noqa: F401
from ..operators import similarity as sim_ops  # noqa: F401
from ..operators import text as text_ops  # noqa: F401

from ._shared import REGISTRY, _scratch_dir, register  # noqa: F401

# =========================================================================
# Skew mitigation (SURVEY §4) and the Pandas-UDF surface (X7)
# =========================================================================


@register(
    "salted_group_agg_matches_plain",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice), 2) AS total_price,
           CAST(COUNT(l_quantity) AS BIGINT) AS n_items,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def salted_group_agg_matches_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-stage salted aggregation (operators.skew) — the
    oracle is the PLAIN GROUP BY, proving the salting rewrite is
    semantics-preserving. l_returnflag has 3 hot values over 600k rows: the
    exact shape where one reducer per group would bottleneck at 100 TB."""
    from ..operators import skew

    l = load_table(spark, sf_dir, "lineitem")
    out = skew.salted_group_agg(
        l,
        ["l_returnflag"],
        [
            ("l_extendedprice", "sum", "total_price"),
            ("l_quantity", "count", "n_items"),
            ("l_quantity", "avg", "avg_qty"),
            ("l_extendedprice", "max", "max_price"),
        ],
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        F.round("total_price", 2).alias("total_price"),
        "n_items",
        F.round("avg_qty", 4).alias("avg_qty"),
        F.round("max_price", 2).alias("max_price"),
    )


@register(
    "salted_join_matches_plain",
    """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def salted_join_matches_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted equi-join (operators.skew.salted_join): the
    small side replicates ×8, the big side salts deterministically, the
    shuffle key becomes (key, salt). Oracle = the plain join — the rewrite
    must be invisible in results."""
    from ..operators import skew

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = skew.salted_join(
        s.withColumnRenamed("s_nationkey", "n_nationkey"), n, ["n_nationkey"], n_salts=8
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "pandas_udf_vowel_ratio",
    """
    SELECT doc_id,
           ROUND(LEN(regexp_replace(lower(text), '[^aeiou]', '', 'g'))::DOUBLE
                 / LEN(text), 4) AS vowel_ratio
    FROM documents
    """,
)
def pandas_udf_vowel_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 scalar pandas_udf (Arrow-vectorized) with EXACT oracle parity —
    the sanctioned slow path when column expressions can't express the
    logic. One Python roundtrip per Arrow batch; never row-at-a-time."""
    from ..functions.pandas_udfs import vowel_ratio

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.round(vowel_ratio("text"), 4).alias("vowel_ratio"))


@register(
    "pandas_udf_geometric_mean",
    """
    SELECT o_orderpriority,
           ROUND(EXP(AVG(LN(o_totalprice))), 4) AS geo_mean_price
    FROM orders WHERE o_totalprice > 0
    GROUP BY o_orderpriority
    """,
)
def pandas_udf_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 grouped-agg pandas_udf (UDAF shape): per-group Series in, scalar
    out. Oracle: the closed-form EXP(AVG(LN)). Note a grouped-agg UDF
    buffers each group — at 100 TB prefer the closed form (which is
    partial-aggregable); this entry pins the UDAF plumbing."""
    from ..functions.pandas_udfs import geometric_mean

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    return o.groupBy("o_orderpriority").agg(
        F.round(geometric_mean("o_totalprice"), 4).alias("geo_mean_price")
    )


def _gsod_oracle_sql() -> str:
    """DuckDB twin of the full reference pipeline (untitled.py:19-86),
    re-derived from the fixture generator's ground-truth parquet — so it
    independently pins the tar→gunzip→parse path, not just the relational
    tail. `+ 0.0` normalizes IEEE -0.0 medians (fixture MIN can be the
    string '-0.0'; Spark ROUND folds the sign, DuckDB keeps it)."""
    from ..pipeline import fixtures as fx

    root = fx.DEFAULT_ROOT
    min_year, max_year = fx.YEARS[0], fx.YEARS[-1]
    med = ",\n         ".join(
        f"ROUND(median({m}), 4) + 0.0 AS {m}"
        for m in ("TEMP", "DEWP", "WDSP", "MAX", "MIN", "PRCP")
    )
    return rf"""
    WITH stations_scrub AS (
      SELECT USAF, CAST(WBAN AS INTEGER) AS WBAN, STATION_NAME, CTRY, STATE,
             CASE WHEN LAT IN (0.0, -999.0, -999.9) THEN NULL ELSE LAT END AS LAT,
             CASE WHEN LON IN (0.0, -999.0, -999.9) THEN NULL ELSE LON END AS LON,
             CASE WHEN ELEV_M IN (0.0, -999.0, -999.9) THEN NULL ELSE ELEV_M END AS ELEV_M,
             BEGIN, "END"
      FROM read_parquet('{root}/stations.parquet')
    ), stations AS (
      SELECT USAF, WBAN, CTRY, LAT, LON, ELEV_M,
             concat_ws('<br>',
               concat_ws(', ', STATION_NAME, STATE, CTRY),
               CASE WHEN ELEV_M IS NOT NULL
                    THEN 'Elevation: ' || CAST(ELEV_M AS VARCHAR) || ' m' END) AS LBL
      FROM stations_scrub
      WHERE LAT IS NOT NULL AND LON IS NOT NULL
        AND CAST(regexp_extract("END", '^(\d{{4}})', 1) AS INTEGER) = {max_year}
        AND CAST(regexp_extract(BEGIN, '^(\d{{4}})', 1) AS INTEGER) <= {min_year}
    ), obs AS (
      SELECT o.USAF, CAST(o.WBAN AS INTEGER) AS WBAN,
             o.TEMP, o.DEWP, o.WDSP,
             CAST(regexp_replace(o.MAX, '\*$', '') AS DOUBLE) AS MAX,
             CAST(regexp_replace(o.MIN, '\*$', '') AS DOUBLE) AS MIN,
             CAST(substr(o.PRCP, 1, LEN(o.PRCP) - 1) AS DOUBLE) AS PRCP,
             CAST(year(strptime(o.YEARMODA, '%Y%m%d')) AS INTEGER) AS YEAR,
             CAST(month(strptime(o.YEARMODA, '%Y%m%d')) AS INTEGER) AS MONTH
      FROM read_parquet('{root}/observations.parquet') o
      WHERE EXISTS (SELECT 1 FROM stations s
                    WHERE s.USAF = o.USAF AND s.WBAN = CAST(o.WBAN AS INTEGER))
    ), monthly AS (
      SELECT USAF, WBAN, YEAR, MONTH,
         {med}
      FROM obs GROUP BY USAF, WBAN, YEAR, MONTH
    )
    SELECT m.USAF, m.WBAN, m.YEAR, m.MONTH, m.TEMP, m.DEWP, m.WDSP, m.MAX, m.MIN,
           m.PRCP, s.CTRY, s.LAT, s.LON, s.ELEV_M, s.LBL
    FROM monthly m JOIN stations s ON m.USAF = s.USAF AND m.WBAN = s.WBAN
    """


@register("gsod_reference_pipeline", _gsod_oracle_sql())
def gsod_reference_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference end-to-end flow (untitled.py:19-86, SURVEY §3.1) as one
    lazy graph over a deterministic GSOD-shaped fixture tree (seed=42):
    tar → gunzip → parse → clean → semi-join stations → monthly medians →
    broadcast dim join. Oracle-backed: the DuckDB twin recomputes the whole
    pipeline from the generator's ground-truth parquet (`_gsod_oracle_sql`),
    independently checking the tar/parse stages against what the generator
    actually wrote. Also golden-tested step-by-step against pandas
    re-derivations in tests/test_gsod_pipeline.py."""
    from ..io import read_csv
    from ..pipeline import fixtures as fx
    from ..pipeline.gsod import MEASURES, run_pipeline
    from ..schemas import STATIONS
    from ..sources.tar import read_gsod_tar

    paths = fx.ensure_tree()
    stations_raw = read_csv(spark, paths["stations_csv"], schema=STATIONS)
    obs_raw = read_gsod_tar(spark, paths["tar_dir"])
    out = run_pipeline(
        stations_raw, obs_raw, min_year=fx.YEARS[0], max_year=fx.YEARS[-1]
    )
    return out["monthly_with_station"].select(
        "USAF", "WBAN", "YEAR", "MONTH",
        *[(F.round(m, 4) + F.lit(0.0)).alias(m) for m in MEASURES],
        "CTRY", "LAT", "LON", "ELEV_M", "LBL",
    )


@register(
    "apply_in_pandas_zscore",
    """
    SELECT o_orderkey, o_custkey,
           ROUND((o_totalprice - avg_p) / NULLIF(std_p, 0), 4) AS price_z
    FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                 AVG(o_totalprice)    OVER (PARTITION BY o_custkey) AS avg_p,
                 STDDEV(o_totalprice) OVER (PARTITION BY o_custkey) AS std_p
          FROM orders)
    """,
)
def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 grouped-map applyInPandas: per-customer z-score normalization —
    the UDTF-shaped group-in/frame-out contract (each group arrives as ONE
    pandas frame; sample stddev ddof=1 to match SQL STDDEV). The oracle is
    the pure-window formulation — at 100 TB prefer that plan (streaming
    window agg, no Python, no per-group buffering); this entry pins the
    applyInPandas plumbing against it.

    Measured cost of the anti-pattern it demonstrates (round-16
    non-headline sweep): 20.8 s warm at sf0.1 — the HEAVIEST registry
    query, and ~40× its own window-plan oracle. The wall is pure
    grouped-map machinery: ~15k tiny per-customer groups × (one Python
    call + one pandas frame build + one Arrow batch) each; the lambda
    body is irrelevant. That O(|groups|) Python overhead is exactly why
    the docstring says prefer the window plan — deliberately NOT benched
    per round (banding a documented anti-pattern demo would spend 80
    s/round institutionalizing it); this measured number is its cost
    pin."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["o_totalprice"].std(ddof=1)
        avg = pdf["o_totalprice"].mean()
        z = (pdf["o_totalprice"] - avg) / std if std and std > 0 else None
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_custkey": pdf["o_custkey"],
                "price_z": (z.round(4) if z is not None else pd.Series([None] * len(pdf))),
            }
        )

    return o.groupBy("o_custkey").applyInPandas(
        zscore, schema="o_orderkey long, o_custkey long, price_z double"
    )


@register(
    "udtf_sentence_split",
    r"""
    WITH p AS (
      SELECT doc_id,
             list_filter(
               string_split(
                 regexp_replace(text, '([.!?])\s+', '\1' || chr(1), 'g'),
                 chr(1)),
               x -> x <> '') AS parts
      FROM documents WHERE doc_id < 200 AND text IS NOT NULL
    ), u AS (
      SELECT doc_id,
             CAST(generate_subscripts(parts, 1) - 1 AS INTEGER) AS sent_no,
             unnest(parts) AS sentence
      FROM p
    )
    SELECT doc_id, sent_no, sentence, CAST(LEN(sentence) AS INTEGER) AS n_chars
    FROM u
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 Python UDTF (Spark ≥3.5 table function): one text row in → one
    row per sentence out, with position. Lateral-join shape. Segmentation
    convention: whitespace runs after sentence punctuation become breaks
    (punctuation stays attached). Implemented as mark-then-split — a
    lookaround-free form RE2 can express, so the DuckDB oracle replays the
    exact rule (`regexp_replace` + split on \\x01); empty segments are
    dropped on both sides before numbering."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sent_no int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            import re

            marked = re.sub(r"([.!?])\s+", lambda m: m.group(1) + "\x01", text)
            for i, s in enumerate(p for p in marked.split("\x01") if p):
                yield doc_id, i, s, len(s)

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    spark.udtf.register("sentence_split", SentenceSplit)
    d.createOrReplaceTempView("__docs_for_udtf")
    return spark.sql(
        "SELECT s.* FROM __docs_for_udtf d, "
        "LATERAL sentence_split(d.doc_id, d.text) s"
    )


@register(
    "wordcount_top20",
    """
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def wordcount_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE canonical big-data query: explode → count → top-k
    (posexplode/unnest surface, SURVEY §2.8 extension). Map-side partial
    count collapses the shuffle to (distinct words); top-k is
    TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return relational.top_k(counts, [F.desc("n"), F.asc("word")], 20)


@register(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, o_orderkey, ROUND(total_qty, 2) AS total_qty,
           ROUND(o_totalprice, 2) AS o_totalprice
    FROM (SELECT l_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 300) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped HAVING + join-on-aggregate: aggregate-below-join
    (the big side shrinks before joining), HAVING as a post-agg filter.
    At 100 TB the lineitem agg is the only fact shuffle; orders/customer
    joins ride broadcasts of the filtered (tiny) agg output."""
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        # big is a selective aggregate (forced broadcast OK);
        # customer is fact-scale — left to AQE
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("total_qty", 2).alias("total_qty"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


@register(
    "text_bpe_token_counts",
    """
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                AS INTEGER) AS bpe_tokens,
           CAST(LEN(regexp_split_to_array(lower(trim(text)), '\\s+')) AS INTEGER) AS ws_tokens
    FROM documents
    """,
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 BPE-ish token counting (word-piece-shaped regex runs) beside the
    whitespace baseline — the pattern is lookaround-free so the identical
    regex runs in both engines."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text_ops.bpe_ish_token_count("text").alias("bpe_tokens"),
        text_ops.token_count("text").alias("ws_tokens"),
    )


@register(
    "window_value_functions",
    """
    SELECT s_suppkey, s_nationkey,
           first_value(s_name) OVER w                     AS richest,
           nth_value(s_name, 2) OVER w                    AS second_richest,
           ROUND(cume_dist() OVER w, 6)                   AS cdist
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-window surface (SURVEY §2.5): first_value / nth_value /
    cume_dist under the default ORDER BY frame (range unbounded→current) —
    identical frame semantics in both engines."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.first("s_name").over(w).alias("richest"),
        F.nth_value("s_name", 2).over(w).alias("second_richest"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "scalar_string_functions_2",
    """
    SELECT p_partkey,
           lpad(p_brand, 12, '.')                  AS brand_padded,
           translate(p_type, 'aeiou', 'AEIOU')     AS type_voweled,
           reverse(p_name)                         AS name_rev,
           CAST(strpos(p_name, 'a') AS INTEGER)    AS first_a,
           left(p_name, 3)                         AS name3,
           repeat(p_brand, 2)                      AS brand2
    FROM part
    """,
)
def scalar_string_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-series breadth round 2: pad / translate / reverse / position /
    left / repeat — all codegen'd column expressions."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, ".").alias("brand_padded"),
        F.translate("p_type", "aeiou", "AEIOU").alias("type_voweled"),
        F.reverse("p_name").alias("name_rev"),
        F.instr("p_name", "a").alias("first_a"),
        F.substring("p_name", 1, 3).alias("name3"),
        F.repeat("p_brand", 2).alias("brand2"),
    )


@register(
    "scalar_math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_extendedprice - 30000), 2)        AS abs_dev,
           CAST(CEIL(l_quantity)  AS BIGINT)             AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT)             AS qty_floor,
           ROUND(SQRT(l_extendedprice), 4)               AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 6)             AS price_ln,
           ROUND(POW(1 + l_discount, 2), 6)              AS disc_sq,
           CAST(SIGN(l_extendedprice - 30000) AS DOUBLE) AS dev_sign,
           CAST(l_orderkey % 7 AS BIGINT)                AS key_mod7
    FROM lineitem
    """,
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface: abs/ceil/floor/sqrt/ln/pow/sign/mod — all
    whole-stage-codegen JVM intrinsics (types pinned cross-engine: ceil →
    BIGINT, sign → DOUBLE)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("abs_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.signum(F.col("l_extendedprice") - 30000).alias("dev_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@register(
    "from_json_events_props",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER)   AS k,
           json_extract_string(props, '$.s')                    AS s
    FROM events
    WHERE props IS NOT NULL
    """,
)
def from_json_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured parse (SURVEY §2.8 ext): from_json → typed struct,
    fields projected out — the schema-on-read path for the events props
    column (vs per-field get_json_object re-parsing in
    json_extract_events)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    parsed = e.withColumn("p", F.from_json("props", "k INT, s STRING"))
    return parsed.select("event_id", F.col("p.k").alias("k"), F.col("p.s").alias("s"))


@register(
    "array_agg_priorities_per_segment",
    """
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
               AS priorities,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def array_agg_priorities_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set aggregation (array_agg surface) — canonicalized by
    sorting + joining so the unordered collect compares cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        # customer is fact-scale: no forced broadcast (AQE decides)
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderpriority"))).alias(
                "priorities"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "unpivot_lineitem_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, ROUND(val, 2) AS val
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_tax
          FROM lineitem WHERE l_orderkey < 100)
    UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_tax))
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide→long; the inverse of pivot_status_by_segment) —
    Expand-based, no shuffle at all."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return (
        l.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_tax")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_tax"],
            "measure",
            "val",
        )
        .select("l_orderkey", "l_linenumber", "measure", F.round("val", 2).alias("val"))
    )


@register("sample_orders_seeded", None)  # sampling algorithm is engine-specific
def sample_orders_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (M2's cousin; reproducible within Spark —
    engines draw differently, so rows-only: no other engine can replay
    Spark's XORShift draw. The PORTABLE twin below,
    ``sample_orders_portable``, proves the sampling SEMANTICS externally
    via the md5-threshold rule; this entry stays as the engine-native
    face, determinism + keep-rate pinned in pytest). At 100 TB sampling
    is the first step of every profiling/stats job."""
    o = load_table(spark, sf_dir, "orders")
    return o.sample(fraction=0.1, seed=42).select("o_orderkey", "o_totalprice")


@register(
    "sample_orders_portable",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                                   || '#ordsample'), 1, 8))::BIGINT
               AS DOUBLE) / 4294967296.0 < 0.1
    """,
)
def sample_orders_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform 10% Bernoulli sample, ENGINE-PORTABLE (VERDICT r15
    next-round #3 — seeded sampling's externally-proven twin):
    ``curation.uniform_sample`` keeps a row iff
    ``md5-prefix(o_orderkey || '#ordsample') / 2^32 < 0.1``, and the
    DuckDB oracle recomputes the IDENTICAL kept set from the same md5
    rule — the sample is a pure function of (id, seed), independent of
    engine, partitioning, and corpus growth (the ``_HASH_SPACE`` idiom,
    ``curation.py``). Scan-shaped: one hash + one compare per row, no
    shuffle, fully pushdown-friendly at 100 TB."""
    from ..operators import curation as cur_ops

    o = load_table(spark, sf_dir, "orders")
    return cur_ops.uniform_sample(o, "o_orderkey", 0.1, seed="ordsample").select(
        "o_orderkey", "o_totalprice"
    )


