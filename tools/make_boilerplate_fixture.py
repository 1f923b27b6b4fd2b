#!/usr/bin/env python
"""Plant a shared boilerplate header in the sf~1 documents fixture
(VERDICT r09 #3): the substring-span family's one quadratic hazard is a
BOILERPLATE anchor — a fingerprint shared by k documents joins into
k·(k−1)/2 pairs before the run merge. The decorrelated 10× fixture
(tools/make_scale_fixture.py) deliberately produces no hot anchors, so
the `max_anchor_docs` knob's regime was only ever measured in the pytest
stop-fixture. This tool makes the sf≈1 regime measurable: it copies the
scaled documents table and PREPENDS one fixed ``header_tokens``-token
header to the ``k`` lowest doc_ids — k ~ 200 gives ~20k anchor pairs per
header window position, the k² shape at a size a measurement can bracket.

Usage: python tools/make_boilerplate_fixture.py [SRC] [DST] [K] [HEADER_TOKENS]
Defaults: /tmp/sfscale1 /tmp/sfscale1_boiler 200 60
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ucr_bigdata_snowfallproject_spark.io import load_table
from ucr_bigdata_snowfallproject_spark.session import get_spark

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale1_boiler"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 200
HEADER_TOKENS = int(sys.argv[4]) if len(sys.argv) > 4 else 60

spark = get_spark(app_name="make-boilerplate-fixture")
os.makedirs(DST, exist_ok=True)
t0 = time.time()

header = " ".join(f"boilertok{i}" for i in range(HEADER_TOKENS))
docs = load_table(spark, SRC, "documents")
# deterministic k-doc choice: the K lowest doc_ids (the fixture's ids are
# dense per copy, so this stays stable across regenerations)
cutoff = [r.doc_id for r in docs.select("doc_id").orderBy("doc_id").limit(K).collect()][-1]
out = docs.select(
    "doc_id",
    F.when(
        F.col("doc_id") <= cutoff, F.concat(F.lit(header + " "), F.col("text"))
    )
    .otherwise(F.col("text"))
    .alias("text"),
    "lang",
    "source",
    "n_chars",
)
out.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")
n = spark.read.parquet(f"{DST}/documents.parquet").count()
print(
    f"wrote {n} docs to {DST} (header={HEADER_TOKENS} tokens on the "
    f"{K} lowest ids, cutoff doc_id {cutoff}) in {time.time()-t0:.1f}s"
)
