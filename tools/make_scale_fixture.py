#!/usr/bin/env python
"""Generate an sf~1 scale fixture (10x sf0.1) for the VERDICT r07 #4
scale measurement — documents/embeddings/lineitem only (the tables the
five most expensive bench queries read), written OUTSIDE the read-only
testdata tree (default /tmp/sfscale1).

Replication is deterministic and CONTENT-DECORRELATED so the scaled
corpus stresses the same plan shapes without degenerate structure:

- documents: copy k shifts doc_id by k*ID_SPAN and pseudo-shuffles the
  token order with a (doc, position, copy)-keyed md5 sort key — every
  copied doc gets its OWN random permutation, so shingle/n-gram
  adjacency is destroyed across docs and copies (cross-doc shingle
  collisions ~ random trigram collisions of a bag-of-words draw, so
  minhash bucket sizes scale ~linearly instead of quadratically), while
  token multisets, lengths, and lang/source marginals are preserved
  (BM25 df tables and DSIR hash features scale realistically). A
  copy-GLOBAL sort key (first attempt) is a trap: docs sharing
  vocabulary then share token ORDER, identical shingle runs appear
  corpus-wide, and the candidate-pair count explodes 20,000x.
- embeddings: copy k rotates the 64 components by k positions — norms
  and within-copy geometry preserved, cross-copy cosines decorrelated.
- lineitem: copy k shifts l_orderkey/l_partkey by k*spans — the
  co-purchase graph becomes 10 disjoint isomorphic components: node and
  edge counts scale 10x with identical degree distribution.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ucr_bigdata_snowfallproject_spark.io import load_table
from ucr_bigdata_snowfallproject_spark.session import get_spark

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# optional 4th arg: comma list of tables to emit (round 14 — the 100×
# documents-only ladder: embeddings' rotation decorrelation only spans
# 64 copies and lineitem/part at 100× are not what the X10 scan-shaped
# queries read, so `documents` alone buys the second decade cheaply)
_KNOWN_TABLES = {"documents", "embeddings", "part", "lineitem", "orders",
                 "events"}
TABLES = (
    set(sys.argv[4].split(","))
    if len(sys.argv) > 4
    else set(_KNOWN_TABLES)
)
# ADVICE r14: membership below is only ever tested with `in`, so a typo
# ('lineitems') used to silently produce a fixture MISSING the table with
# exit code 0 — fail loudly instead.
if TABLES - _KNOWN_TABLES:
    raise SystemExit(
        f"unknown table(s) {sorted(TABLES - _KNOWN_TABLES)}; "
        f"known: {sorted(_KNOWN_TABLES)}"
    )
if COPIES > 64 and "embeddings" in TABLES:
    raise SystemExit("embeddings rotation decorrelates <=64 copies")

spark = get_spark(app_name="make-scale-fixture")
os.makedirs(DST, exist_ok=True)
t0 = time.time()

# documents is the anchor table of the TEXT ladder; the round-16
# graph/lineitem ladder (VERDICT r15 next-round #1) scales only the
# relational tables, so an EXPLICIT table list may omit it — the
# historical guard stays for default (unlisted) invocations.
if "documents" not in TABLES and len(sys.argv) <= 4:
    raise SystemExit("documents is the anchor table; always include it")
ID_SPAN = 10_000_000
if "documents" in TABLES:
    docs = load_table(spark, SRC, "documents")
    toks = F.split(F.col("text"), r"\s+")
    shuffled = F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    toks,
                    lambda t, i: F.concat(
                        F.md5(
                            F.concat_ws(
                                "#",
                                t,
                                i.cast("string"),
                                F.col("doc_id").cast("string"),
                                F.col("__k").cast("string"),
                            )
                        ),
                        F.lit("\x00"),
                        t,
                    ),
                )
            ),
            lambda s: F.substring(s, 34, 1_000_000),
        ),
        " ",
    )
    out_docs = (
        docs.withColumn("__k", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))))
        .select(
            (F.col("doc_id") + F.col("__k") * ID_SPAN).alias("doc_id"),
            F.when(F.col("__k") == 0, F.col("text")).otherwise(shuffled).alias("text"),
            "lang",
            "source",
            "n_chars",
            "__k",
        )
        .drop("__k")
    )
    out_docs.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    print(f"documents: {time.time()-t0:.1f}s", flush=True)

if "embeddings" in TABLES:
    emb = load_table(spark, SRC, "embeddings")
    V_SPAN = 10_000_000
    rot = F.when(F.col("__k") == 0, F.col("embedding"))
    for k in range(1, COPIES):
        rot = rot.when(
            F.col("__k") == k,
            F.concat(
                F.slice(F.col("embedding"), k + 1, 64 - k),
                F.slice(F.col("embedding"), 1, k),
            ),
        )
    out_emb = (
        emb.withColumn(
            "__k", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
        )
        .select(
            (F.col("vec_id") + F.col("__k") * V_SPAN).alias("vec_id"),
            rot.alias("embedding"),
            "__k",
        )
        .drop("__k")
    )
    out_emb.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/embeddings.parquet"
    )
    print(f"embeddings: {time.time()-t0:.1f}s", flush=True)

# part (round 9, VERDICT r08 #3 — the fuzzy-join scale point): copy k
# shifts p_partkey and, for k>0, permutes the words of p_name with a
# (name, word, position, copy)-keyed md5 sort — the color-word
# VOCABULARY and name length distribution are preserved (q-gram block
# membership scales realistically with the 10x distinct-name growth)
# while exact name collisions across copies are avoided.
if "part" in TABLES:
    part = load_table(spark, SRC, "part")
    PK_SPAN = 10_000_000
    words = F.split(F.col("p_name"), " ")
    permuted = F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    words,
                    lambda t, i: F.concat(
                        F.md5(
                            F.concat_ws(
                                "#",
                                F.col("p_name"),
                                t,
                                i.cast("string"),
                                F.col("__k").cast("string"),
                            )
                        ),
                        F.lit("\x00"),
                        t,
                    ),
                )
            ),
            lambda s: F.substring(s, 34, 1_000_000),
        ),
        " ",
    )
    out_part = (
        part.withColumn(
            "__k", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
        )
        .select(
            (F.col("p_partkey") + F.col("__k") * PK_SPAN).alias("p_partkey"),
            F.when(F.col("__k") == 0, F.col("p_name"))
            .otherwise(permuted)
            .alias("p_name"),
            *[c for c in part.columns if c not in ("p_partkey", "p_name")],
        )
    )
    out_part.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/part.parquet"
    )
    print(f"part: {time.time()-t0:.1f}s", flush=True)

# lineitem (widened round 16, VERDICT r15 next-round #1 — the
# graph/lineitem ladder): copy k shifts l_orderkey/l_partkey (the
# co-purchase graph stays COPIES disjoint isomorphic components) and now
# CARRIES EVERY COLUMN — measures/flags/dates replicate verbatim and
# l_suppkey stays UNSHIFTED, so the unscaled supplier dim becomes a
# 100×-fan-in hot dimension (the realistic shape: facts outgrow dims).
# Column pruning means the 2-col graph readers scan exactly what they
# did before.
if "lineitem" in TABLES:
    li = load_table(spark, SRC, "lineitem")
    O_SPAN, P_SPAN = 100_000_000, 10_000_000
    out_li = (
        li.withColumn(
            "__k", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
        )
        .select(
            (F.col("l_orderkey") + F.col("__k").cast("long") * O_SPAN).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("__k").cast("long") * P_SPAN).alias("l_partkey"),
            *[c for c in li.columns if c not in ("l_orderkey", "l_partkey")],
        )
    )
    out_li.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/lineitem.parquet"
    )
    print(f"lineitem: {time.time()-t0:.1f}s", flush=True)

# orders (round 16): o_orderkey shifts with the SAME span as
# l_orderkey, so scaled lineitem⋈orders joins hit exactly one order per
# line (q9's shuffle join scales both sides together); o_custkey stays
# unshifted (customer dim unscaled, fan-in grows like supplier's).
if "orders" in TABLES:
    o = load_table(spark, SRC, "orders")
    O_SPAN = 100_000_000
    out_o = (
        o.withColumn(
            "__k", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
        )
        .select(
            (F.col("o_orderkey") + F.col("__k").cast("long") * O_SPAN).alias("o_orderkey"),
            *[c for c in o.columns if c != "o_orderkey"],
        )
    )
    out_o.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/orders.parquet"
    )
    print(f"orders: {time.time()-t0:.1f}s", flush=True)

# events (round 16): event_id shifts; user_id stays UNSHIFTED — the key
# POPULATION is fixed while rows per key grow ×COPIES, which is exactly
# how per-user event skew grows in production (more history per user,
# not more users). The skew family's hot keys get 100× hotter.
if "events" in TABLES:
    ev = load_table(spark, SRC, "events")
    E_SPAN = 1_000_000_000
    out_ev = (
        ev.withColumn(
            "__k", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
        )
        .select(
            (
                F.col("event_id").cast("long")
                + F.col("__k").cast("long") * E_SPAN
            ).alias("event_id"),
            *[c for c in ev.columns if c != "event_id"],
        )
    )
    out_ev.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/events.parquet"
    )
    print(f"events: {time.time()-t0:.1f}s", flush=True)
print(f"done -> {DST}", flush=True)
spark.stop()
