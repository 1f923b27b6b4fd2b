"""Embedding similarity search (X3).

Two paths, one semantics:

- :func:`brute_force_topk` — exact cosine top-k of a (small, broadcast)
  query set against the corpus. The corpus NEVER shuffles: queries
  broadcast, per-row dot products run JVM-side (``zip_with`` +
  ``aggregate`` in double), and top-k is a per-group window. At 100 TB the
  cost is one full scan — the right baseline and the correctness oracle
  for approximate paths.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: corpus and queries
  hash to sign-pattern buckets; only same-bucket candidates are scored
  (multi-probe via several independent tables). Sub-scan cost at the price
  of recall; recall is testable against the brute-force oracle.

Embeddings stay ``array<float>`` (plain SQL type — DuckDB-oracle
expressible, SURVEY §7.4), computation in double.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, accumulated in double, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def matrix_dots_udf(matrix: list[list[float]]):
    """Arrow-vectorized matrix·vector products: one numpy matmul per batch.

    Spark's array HOFs (aggregate/zip_with) are interpreted per element —
    measured ~1 µs per multiply-add — so a k×dim literal-matrix product via
    HOFs is the slow path. This is the sanctioned pandas_udf case
    (SURVEY §2.12): vectorized numerics, Arrow batches, ~100× the HOF
    throughput. Returns array<double> of the k dot products per row.
    """
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(matrix, dtype=np.float64)

    @pandas_udf("array<double>")
    def dots(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        d = v @ mat.T
        return pd.Series(list(d))

    return dots


def matrix_buckets_udf(matrix: list[list[float]], planes: int):
    """Hyperplane LSH buckets in ONE Arrow pass: sign-pack the
    matrix·vector products to one bucket long per table, all in numpy.

    Same math as :func:`matrix_dots_udf` + :func:`pack_buckets`, but the
    packing happens inside the UDF — with many tables the generated
    when/bitwiseOR packing expression blows past janino's 64 KB method
    limit and the whole projection falls back to interpreted mode; a
    (n × planes) reshape-matmul never does.
    """
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(matrix, dtype=np.float64)
    if mat.shape[0] % planes:
        raise ValueError("matrix rows must be tables*planes")

    @pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        bits = (v @ mat.T > 0).astype(np.int64)
        weights = np.int64(1) << np.arange(planes, dtype=np.int64)
        b = bits.reshape(len(v), -1, planes) @ weights
        return pd.Series(list(b))

    return buckets


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    k: int = 10,
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast-cross-join queries × corpus,
    score, window top-k with (sim desc, id) total order.

    Output: (q_id, vec_id, sim) — ``sim`` rounded for cross-engine
    determinism when ``round_digits`` is set (ranking uses the rounded
    value plus the id tiebreaker, so top-k membership is well-defined).
    """
    # norms precomputed once per row (not per pair): the per-pair work is
    # ONE dot product — 3× fewer array folds in the O(n·q) hot loop
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("__cn"))
    sim = dot(F.col("__qvec"), F.col(vec_col)) / (F.col("__qn") * F.col("__cn"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = c.join(F.broadcast(q)).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        sim.alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _hyperplanes(dim: int, planes: int, table: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded per table) — plain
    Python floats baked into the plan as literals; no driver-side state."""
    import random

    rng = random.Random(42 + table)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def bucket_signature(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """Sign pattern of the vector against each hyperplane, packed to a long."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(hyperplanes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def hyperplane_dots(vec: Column, dim: int, planes: int, tables: int) -> Column:
    """All tables×planes hyperplane dot products in ONE pass: the matrix is
    a single parsed SQL literal, one ``transform`` computes every dot.
    Collapses tables×planes separate fold expressions (interpreted HOFs —
    measured pathological) into one. Materialize this as a column, THEN
    pack buckets with :func:`pack_buckets` — packing from a materialized
    array avoids re-evaluating the folds per bit."""
    matrix = [
        plane for t in range(tables) for plane in _hyperplanes(dim, planes, t)
    ]
    mat_sql = "array(" + ",".join(
        "array(" + ",".join(repr(x) for x in p) + ")" for p in matrix
    ) + ")"
    return F.transform(
        F.expr(mat_sql),
        lambda p: F.aggregate(
            F.zip_with(vec, p, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def pack_buckets(dots_col: Column, planes: int, tables: int) -> Column:
    """Sign-pack a materialized dots array into one bucket long per table."""
    def table_bucket(t: int) -> Column:
        out = F.lit(0).cast("long")
        for i in range(planes):
            out = out.bitwiseOR(
                F.when(dots_col.getItem(t * planes + i) > 0, F.lit(1 << i).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
        return out
    return F.array(*[table_bucket(t) for t in range(tables)])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    k: int = 10,
    planes: int = 8,
    tables: int = 4,
    round_digits: int | None = 4,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH, ``tables``
    independent hash tables of ``planes`` bits.

    Scale shape: corpus explodes ×tables into (table, bucket) keys — the
    join shuffles on bucket, average bucket size n/2^planes per table;
    scoring happens only inside buckets. Recall improves with more tables,
    cost with fewer — both are explicit knobs.
    """
    matrix = [plane for t in range(tables) for plane in _hyperplanes(dim, planes, t)]
    dots_udf = matrix_dots_udf(matrix)
    c_sigs = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("__cn"),
        dots_udf(F.col(vec_col)).alias("__dots"),
    ).select(
        id_col,
        vec_col,
        "__cn",
        pack_buckets(F.col("__dots"), planes, tables).alias("__buckets"),
    )
    q_sigs = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        dots_udf(F.col(vec_col)).alias("__dots"),
    ).select(
        "__qid",
        "__qvec",
        "__qn",
        pack_buckets(F.col("__dots"), planes, tables).alias("__buckets"),
    )
    # the bucket join + dedup stay NARROW (ids + bucket only) — the
    # 64-float vectors and norms never ride the dedup shuffle; they re-join
    # by id afterwards (queries broadcast both times). No checkpoint: the
    # vectorized signature pass is cheaper to recompute than to materialize
    c_exp = c_sigs.select(
        id_col,
        F.posexplode("__buckets").alias("__table", "__bucket"),
    )
    q_exp = q_sigs.select(
        "__qid",
        F.posexplode("__buckets").alias("__table", "__bucket"),
    )
    cand_ids = (
        c_exp.join(F.broadcast(q_exp), on=["__table", "__bucket"])
        .select(id_col, "__qid")
        .dropDuplicates(["__qid", id_col])
    )
    cand = cand_ids.join(
        c_sigs.select(id_col, vec_col, "__cn"), on=id_col
    ).join(
        F.broadcast(q_sigs.select("__qid", "__qvec", "__qn")), on="__qid"
    )
    # norms precomputed per row upstream of the bucket join — per-candidate
    # work is one dot product
    sim = dot(F.col("__qvec"), F.col(vec_col)) / (F.col("__qn") * F.col("__cn"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = cand.select(F.col("__qid").alias(query_id_col), F.col(id_col), sim.alias("sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def embedding_near_dup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (X2 flavor): all (id_a < id_b) pairs
    with rounded cosine ≥ threshold.

    This exact formulation is O(n²) — correct as the verify/oracle step on a
    bounded candidate set. The 100 TB path is
    :func:`embedding_near_dup_blocked`: the SAME scoring behind an LSH
    bucket self-join so only same-bucket pairs are scored; this function is
    the semantics contract both share (parity pinned in tests).
    """
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        l2_norm(F.col(vec_col)).alias("__na"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        l2_norm(F.col(vec_col)).alias("__nb"),
    )
    sim = F.round(
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), round_digits
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def embedding_near_dup_blocked(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    planes: int = 4,
    tables: int = 48,
    round_digits: int = 4,
    persist_sigs: bool = True,
) -> DataFrame:
    """Embedding-cosine near-dup pairs with an LSH blocker — the 100 TB
    path :func:`embedding_near_dup` promises.

    Same semantics contract as the exact form (pairs with rounded cosine ≥
    ``threshold``, id_a < id_b) but candidates come from a random-hyperplane
    bucket SELF-join (``tables`` independent tables of ``planes`` sign
    bits) instead of an all-pairs cross join: only same-bucket pairs are
    ever scored. The self-join shuffles narrow (id, table, bucket) rows;
    vectors re-join by id afterwards.

    Recall: a pair at cosine 0.3 shares one 4-bit bucket with p ≈ 0.127
    per table; missing all 48 tables happens with p ≈ 2e-3 — and falls
    fast above the threshold. Hyperplanes are seeded, so recall on a fixed
    corpus is deterministic; the defaults reproduce the exact form's output
    EXACTLY on the test fixtures (pinned in tests and by the driver
    oracle). More tables buy recall, more planes cut candidate volume —
    both explicit knobs; at higher thresholds (real near-dup work) grow
    ``planes`` and shrink ``tables`` for the same recall at a fraction of
    the candidate volume.
    """
    matrix = [plane for t in range(tables) for plane in _hyperplanes(dim, planes, t)]
    buckets_udf = matrix_buckets_udf(matrix, planes)
    sigs = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__n"),
        buckets_udf(F.col(vec_col)).alias("__buckets"),
    )
    if persist_sigs:
        # three consumers (bucket explode + both vector re-joins) would
        # each re-scan the corpus and re-run the interpreted l2_norm fold;
        # one materialization pays the scan once (same policy as
        # tfidf_top_terms' persist_tf — the 100 TB path AND the bench win)
        from pyspark import StorageLevel

        from ._util import track_persist

        sigs = track_persist(sigs.persist(StorageLevel.MEMORY_AND_DISK))
    exp = sigs.select("__id", F.posexplode("__buckets").alias("__table", "__bucket"))
    cand = (
        exp.alias("a")
        .join(
            exp.alias("b"),
            (F.col("a.__table") == F.col("b.__table"))
            & (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    paired = cand.join(
        sigs.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__na")),
        "id_a",
    ).join(
        sigs.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb")),
        "id_b",
    )
    sim = F.round(
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), round_digits
    )
    return (
        paired.select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def _train_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int,
    seed: int,
    sample_rows: int = 50_000,
    iters: int = 6,
) -> list[list[float]]:
    """Seeded Lloyd's k-means on a bounded driver-side sample — the coarse
    quantizer for :func:`ivf_topk`. The collect is capped at ``sample_rows``
    rows independent of corpus size (at 100 TB the sample is still ≤25 MB),
    matching how faiss/ScaNN train IVF quantizers: in memory, on a sample.
    Distances use the ‖x‖²−2x·c+‖c‖² expansion so the work is one
    (rows × k) GEMM per iteration, never a (rows × k × dim) broadcast.

    The sample is a seeded uniform ``sample(fraction)`` over the FULL
    corpus, not ``limit(n)`` — limit without ordering reads the first
    partitions only, so at scale the quantizer would train on one shard's
    distribution and recall silently degrades on the rest. The count that
    sizes the fraction only runs when the corpus exceeds ``sample_rows``:
    a ``limit(sample_rows+1)`` probe-collect first — if it comes back
    short, it IS the whole corpus (trivially unbiased) and no count job or
    second collect is needed.
    """
    import numpy as np

    probe = corpus.select(vec_col).limit(sample_rows + 1).collect()
    if len(probe) <= sample_rows:
        rows = probe
    else:
        n_total = corpus.count()
        # 1.2× oversample so the post-sample limit almost never undershoots
        frac = min(1.0, 1.2 * sample_rows / n_total)
        rows = (
            corpus.select(vec_col).sample(fraction=frac, seed=seed)
            .limit(sample_rows)
            .collect()
        )
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)].copy()
    xn = (X * X).sum(axis=1)[:, None]
    for _ in range(iters):
        d = xn - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return [[float(x) for x in c] for c in C]


def _ranked_cells(n_centroids: int, centroids: list[list[float]], dots_col: Column) -> Column:
    """(distance-expansion, cid) structs per centroid — shared by IVF cell
    assignment and query probing. Rank is (‖c‖² − 2 v·c, cid); ‖v‖² is
    constant per row, so omitted."""
    c_norm2_sql = "array(" + ",".join(
        repr(sum(x * x for x in c)) for c in centroids
    ) + ")"
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_centroids - 1)),
        lambda i: F.struct(
            (
                F.element_at(F.expr(c_norm2_sql), i + 1)
                - 2.0 * F.element_at(dots_col, i + 1)
            ).alias("d"),
            i.cast("int").alias("cid"),
        ),
    )


def _assign_cells(
    corpus: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Nearest-centroid assignment for every corpus vector: Arrow matmul
    for the centroid dots, argmin via array_min over (distance, cid)
    structs. Output keeps (id, vec, __cn norm, __cell) so IVF can score
    without recomputing norms."""
    n_centroids = len(centroids)
    dots_udf = matrix_dots_udf(centroids)
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("__cn"),
        dots_udf(F.col(vec_col)).alias("__cd"),
    ).select(
        id_col,
        vec_col,
        "__cn",
        F.array_min(_ranked_cells(n_centroids, centroids, F.col("__cd")))
        .getField("cid")
        .alias("__cell"),
    )


def cluster_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Seeded k-means cluster assignment over an embedding column —
    (id, cluster) out. The topic-balancing / mixture-diagnostic primitive
    for training-data curation: cluster sizes show distribution drift and
    over-represented modes before any expensive downstream pass.

    Same quantizer + assignment machinery as :func:`ivf_topk` (bounded
    seeded sample → driver k-means → Arrow-matmul argmin), so cost is one
    corpus scan, no shuffle at all for the assignment itself. Pass
    ``centroids`` to score against a fixed external codebook."""
    if centroids is None:
        centroids = _train_centroids(corpus, vec_col, n_centroids, seed)
    return _assign_cells(corpus, id_col, vec_col, centroids).select(
        id_col, F.col("__cell").alias("cluster")
    )


def cluster_sizes(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Per-cluster member counts (the mixture report): one tiny groupBy on
    the cluster id after the scan-side assignment."""
    return (
        cluster_assign(corpus, id_col, vec_col, n_centroids, seed)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    round_digits: int | None = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the scale path beside
    :func:`lsh_topk`:

    1. train ``n_centroids`` k-means centroids (MLlib, seeded);
    2. assign each corpus vector to its nearest centroid — a pure column
       expression over centroid literals (argmin via array_min on
       (distance, cid) structs), no second ML pass;
    3. each query probes its ``n_probe`` nearest centroids; only vectors in
       probed cells are cosine-scored.

    Scale shape: the corpus shuffles once on cell id (cells ≈ n/n_centroids
    rows); queries broadcast; cost is ~(n_probe/n_centroids) of a full scan.
    Recall vs :func:`brute_force_topk` is pinned in tests.

    Pass ``centroids`` to probe against a pre-trained coarse quantizer
    (train once with :func:`_train_centroids` or load a saved artifact via
    :func:`load_centroids`) — the production shape, where the index
    artifact outlives any one query job; train-once/query-many identity
    with per-call training is pinned in tests.
    """
    # coarse quantizer only needs approximate centroids: train on a bounded
    # driver-side sample (faiss trains IVF quantizers the same way — the
    # cells re-partition the FULL corpus regardless, so quantizer quality,
    # not coverage, is what the sample bounds). A 50k×dim float block is
    # ≤25 MB; seeded numpy Lloyd iterations beat a distributed k-means by
    # ~100× here because MLlib launches several jobs per iteration.
    if centroids is None:
        centroids = _train_centroids(corpus, vec_col, n_centroids, seed)
    n_centroids = len(centroids)

    # centroid dot products via the Arrow-vectorized matmul UDF (array HOFs
    # are interpreted per element — see matrix_dots_udf); cell assignment
    # shared with cluster_assign via _assign_cells
    dots_udf = matrix_dots_udf(centroids)
    cells = _assign_cells(corpus, id_col, vec_col, centroids)
    probes = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        dots_udf(F.col(vec_col)).alias("__qd"),
    ).select(
        "__qid",
        "__qvec",
        "__qn",
        F.explode(
            F.slice(
                F.transform(
                    F.array_sort(_ranked_cells(n_centroids, centroids, F.col("__qd"))),
                    lambda s: s.getField("cid"),
                ),
                1,
                n_probe,
            )
        ).alias("__cell"),
    )
    # norms precomputed per row; per-candidate work is one dot product
    sim = dot(F.col("__qvec"), F.col(vec_col)) / (F.col("__qn") * F.col("__cn"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = cells.join(F.broadcast(probes), on="__cell").select(
        F.col("__qid").alias(query_id_col), F.col(id_col), sim.alias("sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def build_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> tuple[list[list[float]], DataFrame]:
    """Build the IVF index as a FIRST-CLASS artifact: (centroids, cells).

    ``cells`` is the nearest-centroid assignment of every corpus vector —
    (id, vec, __cn norm, __cell) — the inverted file itself. Persist it
    partitioned by ``__cell`` (``index_store.save_ivf_cells``) and
    :func:`ivf_topk_indexed` probes it WITHOUT touching the corpus: the
    one corpus-sized pass (assignment) happens at build time, once, and
    every query job after that reads only the probed cell partitions.
    This is the faiss build/search split re-expressed as parquet layout +
    partition pruning."""
    if centroids is None:
        centroids = _train_centroids(corpus, vec_col, n_centroids, seed)
    return centroids, _assign_cells(corpus, id_col, vec_col, centroids)


def ivf_topk_indexed(
    cells: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    k: int = 10,
    n_probe: int = 4,
    round_digits: int | None = 4,
) -> DataFrame:
    """Probe-only IVF top-k over a prebuilt cell index
    (:func:`build_ivf_index`, optionally persisted/reloaded through
    ``index_store``). Identical results to :func:`ivf_topk` with the same
    centroids (pinned in tests) — the difference is pure cost shape:

    - no corpus scan, no assignment recompute — the index IS the data;
    - the probed cell ids collect to the driver (n_queries × n_probe
      small ints — queries are few by the same contract as
      :func:`pq_topk`) and become a static ``__cell IN (...)`` filter, so
      a ``__cell``-partitioned store serves the probe with partition
      pruning: the scan reads ~n_probe/n_centroids of the index files,
      nothing else. Plan-asserted in tests.
    """
    n_centroids = len(centroids)
    dots_udf = matrix_dots_udf(centroids)
    probes = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        dots_udf(F.col(vec_col)).alias("__qd"),
    ).select(
        "__qid",
        "__qvec",
        "__qn",
        F.explode(
            F.slice(
                F.transform(
                    F.array_sort(_ranked_cells(n_centroids, centroids, F.col("__qd"))),
                    lambda s: s.getField("cid"),
                ),
                1,
                n_probe,
            )
        ).alias("__cell"),
    )
    # tiny frame (n_queries × n_probe rows): materialize once so the
    # probed-cell collect and the scoring join don't recompute it
    from pyspark import StorageLevel

    from ._util import track_persist

    probes = track_persist(probes.persist(StorageLevel.MEMORY_AND_DISK))
    probed = sorted(r[0] for r in probes.select("__cell").distinct().collect())
    pruned = cells.filter(F.col("__cell").isin(probed))
    sim = dot(F.col("__qvec"), F.col(vec_col)) / (F.col("__qn") * F.col("__cn"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = pruned.join(F.broadcast(probes), on="__cell").select(
        F.col("__qid").alias(query_id_col), F.col(id_col), sim.alias("sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _train_pq(
    corpus: DataFrame,
    vec_col: str,
    m: int,
    ksub: int,
    seed: int,
    sample_rows: int = 50_000,
    iters: int = 8,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the vector into ``m``
    contiguous subspaces and run seeded Lloyd's k-means (``ksub``
    centroids) independently in each — on the same bounded driver-side
    sample discipline as :func:`_train_centroids` (faiss trains PQ the
    same way). Returns ``m × ksub × (dim/m)`` nested lists."""
    import numpy as np

    probe = corpus.select(vec_col).limit(sample_rows + 1).collect()
    if len(probe) <= sample_rows:
        rows = probe
    else:
        n_total = corpus.count()
        frac = min(1.0, 1.2 * sample_rows / n_total)
        rows = (
            corpus.select(vec_col).sample(fraction=frac, seed=seed)
            .limit(sample_rows)
            .collect()
        )
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=min(ksub, len(S)), replace=False)].copy()
        sn = (S * S).sum(axis=1)[:, None]
        for _ in range(iters):
            d = sn - 2.0 * (S @ C.T) + (C * C).sum(axis=1)[None, :]
            assign = d.argmin(axis=1)
            for c in range(len(C)):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode every vector: per subspace, the index of its nearest
    codebook centroid — output (id, code array<int>), ``m`` small ints per
    vector instead of ``dim`` floats (64-dim float32 → 8 bytes at m=8:
    32× compression; the representation that makes billion-vector indexes
    fit executor memory).

    One Arrow pass, no shuffle: per batch, each subspace runs one
    (rows × ksub) GEMM argmin in numpy."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]

    @pandas_udf("array<int>")
    def enc(vecs: pd.Series) -> pd.Series:
        V = np.stack(vecs.to_numpy()).astype(np.float64)
        codes = np.empty((len(V), m), dtype=np.int32)
        for j, C in enumerate(books):
            S = V[:, j * dsub : (j + 1) * dsub]
            d = (S * S).sum(axis=1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(axis=1)[None, :]
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return corpus.select(F.col(id_col), enc(F.col(vec_col)).alias("code"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    codebooks: list[list[list[float]]] | None = None,
    round_digits: int | None = 4,
) -> DataFrame:
    """Approximate cosine top-k over PQ codes with asymmetric distance
    computation (ADC): queries stay exact, corpus vectors are looked up
    through their codes — ``dot(q, x) ≈ Σ_j LUT_q[j][code_j(x)]`` where the
    per-query lookup table holds the query-subvector · centroid dots, and
    ``‖x‖² ≈ Σ_j ‖centroid_{j,code_j}‖²`` (both standard PQ estimators).

    Scale shape: the corpus is scanned as (id, m small ints) — the decoded
    vectors never exist; per batch the whole score matrix is one fancy-index
    + sum in numpy. Queries (assumed few: they ride the UDF closure as a
    LUT tensor) each add one (rows × m) gather. No shuffle except the final
    per-query top-k window. Recall vs :func:`brute_force_topk` is pinned in
    tests; ``codebooks`` accepts a pre-trained external codebook."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    if codebooks is None:
        codebooks = _train_pq(corpus, vec_col, m, ksub, seed)
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]
    cent_norm2 = np.stack([(C * C).sum(axis=1) for C in books])  # (m, ksub)

    q_rows = queries.select(query_id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    Q = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))  # (nq,)
    # LUT[qi, j, c] = dot(q_sub_j, centroid_{j,c})
    lut = np.stack(
        [np.stack([Q[:, j * dsub : (j + 1) * dsub] @ C.T for j, C in enumerate(books)], axis=1)]
    )[0]  # (nq, m, ksub)

    @pandas_udf("array<double>")
    def sims(codes: pd.Series) -> pd.Series:
        X = np.stack(codes.to_numpy()).astype(np.int64)  # (n, m)
        cols = np.arange(m)
        xnorm = np.sqrt(cent_norm2[cols, X].sum(axis=1))  # (n,)
        xnorm[xnorm == 0.0] = 1.0
        out = np.empty((len(X), len(lut)), dtype=np.float64)
        for qi in range(len(lut)):
            out[:, qi] = lut[qi][cols, X].sum(axis=1) / (qn[qi] * xnorm)
        return pd.Series(list(out))

    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    scored = codes.select(
        F.col(id_col), F.posexplode(sims(F.col("code"))).alias("__qi", "sim")
    )
    qid_map = F.array(*[F.lit(q) for q in q_ids])
    sim = F.col("sim")
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = scored.select(
        F.element_at(qid_map, F.col("__qi") + 1).alias(query_id_col),
        F.col(id_col),
        sim.alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def semdedup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023): cluster
    the embeddings (seeded k-means — the same coarse quantizer IVF uses),
    then score cosine ONLY within each cluster; pairs at/above ``threshold``
    are semantic duplicates.

    The cluster is the blocking key — cost drops from n² to Σ |cell|², and
    semantically-close pairs land in the same cell by construction (that
    is exactly what the quantizer optimizes, unlike data-independent
    hyperplane buckets). Cross-cell near-dups at the decision boundary are
    the known recall gap; mitigate with more probes upstream or a second
    pass at lower ``n_clusters``.

    Scale: cells shuffle once on cluster id; the within-cell self-join is
    distributed (cells ≈ n/n_clusters rows each); output is pairs + sim."""
    cells = _assign_cells(corpus, id_col, vec_col,
                          centroids if centroids is not None
                          else _train_centroids(corpus, vec_col, n_clusters, seed))
    a = cells.select(
        F.col("__cell"),
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        F.col("__cn").alias("__na"),
    )
    b = cells.select(
        F.col("__cell"),
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        F.col("__cn").alias("__nb"),
    )
    sim = F.round(
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
        round_digits,
    )
    return (
        a.join(b, ["__cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def semdedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup keep-set: drop every vector that is a semantic near-dup
    (within-cluster cosine ≥ threshold) of a lower-id vector — the
    min-id-survives rule shared with :func:`~.dedup.minhash_dedup`.
    ``centroids`` pins the quantizer to an external artifact (the
    :func:`semdedup_pairs` pass-through) — with the int8 codebook's
    float centroids the survivor set is pinned against the
    deterministic :func:`semdedup_int8` twin in tests (VERDICT r11 #8),
    tying this seeded path to the externally hash-proven family."""
    losers = (
        semdedup_pairs(
            corpus, id_col, vec_col, n_clusters, threshold, seed, centroids
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return corpus.join(losers, id_col, "left_anti")


def embedding_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    quantize: int = 10**6,
) -> DataFrame:
    """Per-group element-wise centroid of an embedding column, in exact
    fixed-point: components quantize to a 1/``quantize`` grid
    (``floor(v·q + 0.5)``), the per-(group, pos) reduction is an INTEGER
    sum (associative — partition-order-independent), and the centroid
    component is the integer mean ``sum DIV n``. Bit-identical across
    engines/reruns — the property that lets centroid analytics earn
    oracle hash rows (same exact-integer-sums rule as
    :func:`~.aggregates.group_ols`).

    Returns (group_col, pos, c_fix, n) with ``pos`` 0-based and ``c_fix``
    the quantized centroid component. int64 headroom: |c_fix| ≤ q·max|v|
    regardless of group size (the DIV happens per group), so downstream
    integer dot products over D dims stay ≤ D·(q·max|v|)² — safe for
    q=10⁶, |v|≤1, D≤10⁴.

    Integer-division portability: Spark's ``DIV`` truncates toward zero
    while DuckDB's ``//`` floors toward −∞ — they disagree on NEGATIVE
    dividends. The mean is therefore computed as
    ``(sum + 4q·n) DIV n − 4q`` (shift to non-negative, divide, shift
    back), which is exact floor division on both engines for any
    component magnitude ≤ 4 — ample for normalized embeddings (contract:
    max|v| ≤ 4; raise the shift for unnormalized spaces).

    Scale shape: posexplode → ONE partial-aggregable groupBy on
    (group, pos) — the classic tall-skinny layout that beats any
    array-typed aggregation UDF at scale (no per-executor state, perfect
    combiner locality)."""
    return centroid_finalize(
        embedding_centroid_partials(df, group_col, vec_col, quantize),
        group_col,
        quantize,
    )


def embedding_centroid_partials(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    quantize: int = 10**6,
) -> DataFrame:
    """The ADDITIVE partial state behind :func:`embedding_centroids`:
    (group, pos, s_fix, n) with ``s_fix`` the exact integer sum of
    quantized components. Because both columns are plain integer sums,
    partials from arbitrary data slices MERGE by addition — feed them to
    ``table.merge_additive_agg`` for incrementally-maintained centroids
    that replay bit-exactly equal to a full recompute."""
    q = float(quantize)
    exploded = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos", "__v")
    ).select(
        group_col,
        "pos",
        F.floor(F.col("__v").cast("double") * F.lit(q) + F.lit(0.5))
        .cast("long")
        .alias("__q"),
    )
    return exploded.groupBy(group_col, "pos").agg(
        F.sum("__q").alias("s_fix"), F.count(F.lit(1)).alias("n")
    )


def centroid_finalize(
    partials: DataFrame, group_col: str, quantize: int = 10**6
) -> DataFrame:
    """(group, pos, s_fix, n) → (group, pos, c_fix, n) via the
    engine-portable shifted floor division (see
    :func:`embedding_centroids`)."""
    shift = 4 * quantize
    return partials.select(
        group_col,
        "pos",
        (F.expr(f"(s_fix + {shift} * n) DIV n") - F.lit(shift)).alias("c_fix"),
        "n",
    )


def embedding_centroid_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    quantize: int = 10**6,
    round_digits: int = 9,
) -> DataFrame:
    """Per-group cosine similarity between two snapshots' centroids — the
    embedding-drift monitor for a continuously re-embedded corpus (model
    swap, encoder upgrade, distribution shift): cos near 1 = stable,
    falling cos = the group's mean representation moved.

    The dot/norm reduction runs over the exact fixed-point centroids from
    :func:`embedding_centroids` in int64 (exact), with one final float
    division per group — deterministic and oracle-hashable. Groups
    missing from either side, or with a zero centroid, emit NULL cosine.

    Scale shape: two centroid passes + a (group, pos)-keyed join of two
    group-cardinality-sized frames + one tiny groupBy — nothing
    corpus-sized after the first aggregation."""
    ca = embedding_centroids(df_a, group_col, vec_col, quantize).select(
        group_col, "pos", F.col("c_fix").alias("__ca"), F.col("n").alias("n_a")
    )
    cb = embedding_centroids(df_b, group_col, vec_col, quantize).select(
        group_col, "pos", F.col("c_fix").alias("__cb"), F.col("n").alias("n_b")
    )
    joined = ca.join(cb, [group_col, "pos"])
    agged = joined.groupBy(group_col).agg(
        F.sum(F.col("__ca") * F.col("__cb")).alias("__dot"),
        F.sum(F.col("__ca") * F.col("__ca")).alias("__na"),
        F.sum(F.col("__cb") * F.col("__cb")).alias("__nb"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )
    cos = F.when(
        (F.col("__na") > 0) & (F.col("__nb") > 0),
        F.col("__dot").cast("double")
        / (F.sqrt(F.col("__na").cast("double")) * F.sqrt(F.col("__nb").cast("double"))),
    )
    return agged.select(
        group_col,
        "n_a",
        "n_b",
        F.round(cos, round_digits).alias("centroid_cos"),
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    out_codes: str = "codes",
    out_scale: str = "q_scale",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column: per-vector
    ``scale = max|x| / 127``, ``code_i = round_half_up(x_i / max|x| · 127)``
    ∈ [−127, 127] — the standard 4× storage/shuffle-IO compression for
    embedding corpora (float32 → int8 + one float scale per vector).

    Why it matters at 100 TB: every shuffle the embedding column rides
    (LSH banding, IVF cell exchange, near-dup self-joins) moves 4× fewer
    bytes on int8 codes, and the dequantized error is bounded by scale/2
    per component (≤ 0.4% of max|x|) — negligible against cosine-top-k
    rankings. Pure column expressions (transform / array_max) — scan
    speed, zero shuffle, no Python.

    Determinism: the two float ops per component (÷ max|x|, × 127) and
    the floor-half-up rounding are plain IEEE-754 double arithmetic —
    bit-identical in any engine, so a DuckDB oracle hash-matches. Zero
    vectors (max|x| = 0) emit all-zero codes with scale 0.

    max|x| materializes as a real column BEFORE the codes lambda — an
    outer EXPRESSION referenced inside a lambda is inlined and
    re-evaluated per element (the O(len²) hazard text.bigram_lm
    documents), while a bound column attribute evaluates once per row."""
    tmp = df.withColumn(
        "__xs", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ).withColumn(
        "__maxabs", F.array_max(F.transform(F.col("__xs"), F.abs))
    )
    m = F.col("__maxabs")
    codes = F.when(
        m > 0,
        F.transform(
            F.col("__xs"),
            lambda x: F.floor(x / m * 127 + F.lit(0.5)).cast("int"),
        ),
    ).otherwise(F.transform(F.col("__xs"), lambda x: F.lit(0)))
    return tmp.select(
        F.col(id_col),
        codes.alias(out_codes),
        (m / 127).alias(out_scale),
    )


def dequantize_embeddings(
    df: DataFrame,
    codes_col: str = "codes",
    scale_col: str = "q_scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``x̂_i = code_i · scale``
    (float64 components; callers downstream treat it as any embedding).
    Max abs reconstruction error is scale/2 per component."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(codes_col),
            lambda c: c.cast("double") * F.col(scale_col),
        ),
    )


def int8_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    k: int = 10,
    refine: int = 4,
    round_digits: int = 4,
    corpus_codes: DataFrame | None = None,
) -> DataFrame:
    """Two-stage ANN: int8 coarse scan → exact float rerank — the
    scalar-quantization (SQ8) search shape production vector stores use
    (FAISS ``SQ8``, Milvus/pgvector quantized scans).

    ``corpus_codes`` (optional): a PREBUILT code table
    (:func:`quantize_embeddings` output, e.g. via
    ``index_store.save_sq8_codes``/``load_sq8_codes``) — the
    train-once/query-many path: the coarse stage then scans ONLY the 4×
    smaller code artifact, and the float corpus is touched exclusively by
    the candidate rerank join. Output is bit-identical to the inline
    build (quantization is deterministic), so the indexed path shares
    the inline path's oracle.

    Stage 1 (coarse): corpus and queries quantize to int8 codes
    (:func:`quantize_embeddings`). Cosine of the DEQUANTIZED vectors
    equals cosine of the raw code vectors — the per-vector scale cancels
    — so the coarse score is a pure INTEGER dot product over int8 codes
    (exact int64 arithmetic: ≤ 127²·dim per pair, dim 64 → ~10⁶),
    divided by integer-exact code norms. Top ``k·refine`` candidates per
    query survive, ranked by (rounded coarse sim desc, id).

    Stage 2 (rerank): only the candidates join back to the float
    embeddings for an exact cosine, and the final top ``k`` per query is
    ranked by (rounded exact sim desc, id).

    Why it matters at 100 TB: the coarse scan reads int8 codes — 4×
    fewer bytes than float32 off disk and through memory bandwidth — and
    the expensive float path touches only ``|Q|·k·refine`` rows instead
    of the whole corpus. With codes persisted as an index artifact
    (:mod:`..index_store` pattern), the float embedding column is never
    scanned at all outside the rerank join. Recall is tunable by
    ``refine`` and testable against :func:`brute_force_topk`.

    Determinism: integer dots are exact; the two divisions + sqrt are
    IEEE-754 double ops on exactly-representable integers, so a DuckDB
    oracle hash-matches. Zero vectors (code norm 0) score coarse 0.

    Output: (q_id, id, sim) — ``sim`` the EXACT cosine, rounded.
    """
    cq = quantize_embeddings(queries, query_id_col, vec_col).select(
        F.col(query_id_col).alias("__qid"), F.col("codes").alias("__qc")
    )
    cc = (
        corpus_codes.select(id_col, "codes")
        if corpus_codes is not None
        else quantize_embeddings(corpus, id_col, vec_col)
    )

    def int_dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # code norms once per row, not per pair (same 3×-fewer-folds shape as
    # brute_force_topk)
    cq = cq.withColumn("__qn", int_dot(F.col("__qc"), F.col("__qc")).cast("double"))
    cc = cc.withColumn("__cn", int_dot(F.col("codes"), F.col("codes")).cast("double"))
    coarse_sim = F.when(
        (F.col("__qn") > 0) & (F.col("__cn") > 0),
        F.round(
            int_dot(F.col("__qc"), F.col("codes")).cast("double")
            / (F.sqrt("__qn") * F.sqrt("__cn")),
            round_digits,
        ),
    ).otherwise(F.lit(0.0))
    scored = cc.join(F.broadcast(cq)).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        coarse_sim.alias("__csim"),
    )
    w1 = Window.partitionBy(query_id_col).orderBy(F.desc("__csim"), F.asc(id_col))
    cand = (
        scored.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k * refine)
        .select(query_id_col, id_col)
    )
    # rerank: candidates (|Q|·k·refine rows — broadcastable) probe the
    # float embeddings; the full corpus is scanned only for the semi-side
    # of this join, never cross-joined against queries in float
    qf = queries.select(
        F.col(query_id_col).alias("__qid2"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qfn"),
    )
    cf = corpus.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("__cfn")
    )
    exact = (
        # candidates are |Q|·k·refine rows — broadcast THEM so the float
        # corpus streams map-side and never shuffles for this probe
        F.broadcast(cand).join(cf, id_col)
        .join(F.broadcast(qf), F.col(query_id_col) == F.col("__qid2"))
        .select(
            query_id_col,
            id_col,
            F.round(
                dot(F.col("__qvec"), F.col(vec_col))
                / (F.col("__qfn") * F.col("__cfn")),
                round_digits,
            ).alias("sim"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        exact.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# Deterministic int8 IVF: the SQ8 trick (integer coarse arithmetic ⇒ full
# SQL oracle) applied to the inverted-file layout. Cell assignment and
# probing both run on int8 codes against an EXTERNAL centroid-code artifact
# (list of (cid, int8 code vector)), so — unlike the float k-means IVF
# above, whose trained centroids are numpy-seeded — the whole build→probe
# path is engine-reproducible and hash-checkable in DuckDB.
# --------------------------------------------------------------------------


def matrix_int_dots_udf(matrix: list[list[int]]):
    """Arrow-vectorized EXACT int64 matrix·vector products — the integer
    twin of :func:`matrix_dots_udf` for int8 code columns: one numpy
    int64 matmul per batch (no float anywhere, so the dots are the same
    exact integers an engine computing Σ code_i·c_i in int64 produces —
    the SQL-oracle-ability of the int8 IVF/SQ8 family is preserved).
    Bound: |dot| ≤ 127²·dim ≪ 2⁶³ at any sane dim. Returns array<long>
    of the k dot products per row."""
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(matrix, dtype=np.int64)

    @pandas_udf("array<long>")
    def dots(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.int64)
        d = v @ mat.T
        return pd.Series(list(d))

    return dots


def _int8_centroid_scores(
    dots_col: Column, centroid_codes: list[tuple[int, list[int]]]
) -> Column:
    """Array of (negated score, cid) structs per row from the
    :func:`matrix_int_dots_udf` dot array — one entry per centroid,
    score = int_dot(codes, c) / sqrt(‖c‖²). The row's own code norm is a
    positive constant inside its argmax/rank, so it is omitted (exactly
    as :func:`_ranked_cells` omits ‖v‖²). Integer dots are exact int64;
    the one division (NOT a reciprocal multiply — that would round
    differently) and the correctly-rounded IEEE sqrt are bit-identical
    in any engine. ``array_min`` over (−score, cid) ≙ argmax by score
    with min-cid tie-break."""
    import math

    for cid, code in centroid_codes:
        if sum(int(x) * int(x) for x in code) <= 0:
            raise ValueError(f"ivf_int8: centroid {cid} has zero code norm")
    sqrts = F.array(
        *[
            F.lit(math.sqrt(float(sum(int(x) * int(x) for x in code))))
            for _, code in centroid_codes
        ]
    )
    cids = F.array(*[F.lit(int(cid)).cast("int") for cid, _ in centroid_codes])
    n = len(centroid_codes)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.struct(
            (
                -(
                    F.element_at(dots_col, i + 1).cast("double")
                    / F.element_at(sqrts, i + 1)
                )
            ).alias("ns"),
            F.element_at(cids, i + 1).alias("cid"),
        ),
    )


def _inline_codes(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, __cfn, __xs, __codes) — int8 codes inline as sibling
    columns: same expressions as :func:`quantize_embeddings`, but NO
    self-join back to the corpus (a join on id would shuffle the corpus
    against itself for nothing). The shared first scan of
    :func:`ivf_int8_build`, :func:`semdedup_int8` and
    :func:`semantic_decontaminate_int8`."""
    return (
        corpus.select(
            F.col(id_col),
            F.col(vec_col),
            l2_norm(F.col(vec_col)).alias("__cfn"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__xs"),
        )
        .withColumn("__maxabs", F.array_max(F.transform(F.col("__xs"), F.abs)))
        .withColumn(
            "__codes",
            F.when(
                F.col("__maxabs") > 0,
                F.transform(
                    F.col("__xs"),
                    lambda x: F.floor(x / F.col("__maxabs") * 127 + F.lit(0.5)).cast(
                        "int"
                    ),
                ),
            ).otherwise(F.transform(F.col("__xs"), lambda x: F.lit(0))),
        )
    )


def ivf_int8_build(
    corpus: DataFrame,
    centroid_codes: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the int8-assigned IVF inverted file: every corpus vector
    quantizes (:func:`quantize_embeddings` — deterministic) and lands in
    the cell of its max-int8-cosine centroid (min cid on ties). Output
    (id, vec, __cfn float norm, __cell) — the exact frame
    ``index_store.save_ivf_cells`` persists partitioned by ``__cell``.

    Scale shape: pure column expressions — one corpus scan, ZERO shuffle
    (the write's repartition by cell is the only exchange, at build time,
    once). Assignment cost is |centroids| integer dots per row on 4×
    smaller int8 codes."""
    with_codes = _inline_codes(corpus, id_col, vec_col)
    dots_udf = matrix_int_dots_udf([code for _, code in centroid_codes])
    cell = (
        F.array_min(_int8_centroid_scores(F.col("__cd"), centroid_codes))
        .getField("cid")
        .alias("__cell")
    )
    return with_codes.withColumn("__cd", dots_udf(F.col("__codes"))).select(
        id_col, vec_col, "__cfn", cell
    )


def ivf_int8_topk_indexed(
    cells: DataFrame,
    queries: DataFrame,
    centroid_codes: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    k: int = 10,
    n_probe: int = 4,
    round_digits: int = 4,
) -> DataFrame:
    """Probe-only top-k over an int8-assigned inverted file
    (:func:`ivf_int8_build`, persisted/reloaded via
    ``index_store.save_ivf_cells``/``load_ivf_cells``): each query ranks
    the centroid codes by the SAME deterministic int8 score as the build,
    probes its ``n_probe`` best cells, and only vectors in probed cells
    are cosine-scored (exact float, rounded) for the final top-k.

    Every arithmetic step — integer centroid dots, one division, IEEE
    sqrt, exact-cosine rerank — is engine-reproducible, so the whole
    approximate search result (not just a recall bound) hash-checks
    against a DuckDB oracle; with identical ``centroid_codes`` the
    indexed path is bit-identical to :func:`ivf_int8_topk` (pinned in
    tests).

    Scale shape: the probed cell ids collect to the driver (n_queries ×
    n_probe small ints — bounded by the query-set contract) and become a
    static ``__cell IN (...)`` filter, so a cell-partitioned store serves
    the probe with partition pruning (~n_probe/n_centroids of the index
    read, corpus never touched); queries broadcast into the pruned
    cells."""
    qcodes = quantize_embeddings(queries, query_id_col, vec_col).select(
        F.col(query_id_col).alias("__qid"), F.col("codes").alias("__qc")
    )
    dots_udf = matrix_int_dots_udf([code for _, code in centroid_codes])
    probes = (
        queries.select(
            F.col(query_id_col).alias("__qid2"),
            F.col(vec_col).alias("__qvec"),
            l2_norm(F.col(vec_col)).alias("__qn"),
        )
        .join(qcodes, F.col("__qid2") == F.col("__qid"))
        .withColumn("__qd", dots_udf(F.col("__qc")))
        .select(
            "__qid",
            "__qvec",
            "__qn",
            F.explode(
                F.slice(
                    F.transform(
                        F.array_sort(
                            _int8_centroid_scores(F.col("__qd"), centroid_codes)
                        ),
                        lambda s: s.getField("cid"),
                    ),
                    1,
                    n_probe,
                )
            ).alias("__cell"),
        )
    )
    from pyspark import StorageLevel

    from ._util import track_persist

    probes = track_persist(probes.persist(StorageLevel.MEMORY_AND_DISK))
    probed = sorted(r[0] for r in probes.select("__cell").distinct().collect())
    pruned = cells.filter(F.col("__cell").isin(probed))
    sim = F.round(
        dot(F.col("__qvec"), F.col(vec_col)) / (F.col("__qn") * F.col("__cfn")),
        round_digits,
    )
    scored = pruned.join(F.broadcast(probes), on="__cell").select(
        F.col("__qid").alias(query_id_col), F.col(id_col), sim.alias("sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroid_codes: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    k: int = 10,
    n_probe: int = 4,
    round_digits: int = 4,
) -> DataFrame:
    """Inline build + probe (:func:`ivf_int8_build` →
    :func:`ivf_int8_topk_indexed` semantics in one plan) — for one-shot
    jobs; production persists the cells once and probes the artifact."""
    cells = ivf_int8_build(corpus, centroid_codes, id_col, vec_col)
    return ivf_int8_topk_indexed(
        cells,
        queries,
        centroid_codes,
        id_col,
        vec_col,
        query_id_col,
        k,
        n_probe,
        round_digits,
    )


def pq_int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook_codes: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    k: int = 10,
    refine: int = 4,
    round_digits: int = 4,
) -> DataFrame:
    """Integer-deterministic product quantization with exact rerank — the
    SQ8/IVF-int8 recipe (integer coarse math, IEEE-exact final steps)
    applied to PQ-ADC, so the last major ANN variant is fully
    engine-reproducible (VERDICT r07 #6) instead of seeded-k-means
    approximate-only.

    ``codebook_codes`` is an EXTERNAL integer artifact — ``m`` subspaces ×
    ``ksub`` entries × ``dim/m`` int8 components (e.g. the sub-slices of
    :func:`quantize_embeddings` codes of a fixed vector sample, the same
    bounded-sample discipline as ``ivf_int8_build``'s centroid codes).

    Stage 1 (encode, one Arrow pass over the 4×-smaller int8 codes): each
    corpus vector quantizes (deterministic) and every subvector takes the
    code of its nearest codebook entry by EXACT int64 L2 distance in code
    space (min code id on ties) — one (rows × ksub) integer GEMM per
    subspace per batch, no shuffle.

    Stage 2 (ADC coarse score, same pass): for each query,
    ``est = Σ_j dot_int(q_codes_subj, cb[j][code_j])`` — a pure int64
    lookup-table sum (the asymmetric-distance estimator on the integer
    lattice); the cosine-style normalizer divides by the IEEE sqrt of the
    query code norm² and the RECONSTRUCTED corpus code norm²
    (``Σ_j ‖cb[j][code_j]‖²`` — both exact integers). Division + sqrt +
    round happen JVM-side in plain IEEE double — bit-identical anywhere.

    Stage 3 (exact rerank): top ``k·refine`` per query by (rounded coarse
    sim desc, id) join back to the float embeddings for the exact cosine;
    final top ``k`` by (rounded exact sim desc, id) — identical to
    :func:`int8_rerank_topk` stage 2.

    Scale shape: the corpus is scanned once as int8 codes, scored as
    ``m`` small ints per row; candidates (|Q|·k·refine rows) broadcast
    into the float corpus; no shuffle except the two bounded top-k
    windows. Every arithmetic step is exact-int or IEEE-double ⇒ the
    whole approximate result hash-checks against a DuckDB oracle."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    CB = [np.asarray(b, dtype=np.int64) for b in codebook_codes]
    if not CB:
        raise ValueError("codebook_codes is empty — need >=1 subspace")
    m = len(CB)
    ksub, dsub = CB[0].shape
    for j, C in enumerate(CB):
        if C.shape != (ksub, dsub):
            raise ValueError(f"codebook subspace {j} shape {C.shape} != {(ksub, dsub)}")
    cn2 = np.stack([(C * C).sum(axis=1) for C in CB])  # (m, ksub) int64

    # bounded query collect — the queries-are-few contract every ANN
    # operator here shares (pq_topk, ivf probes, int8 broadcast side)
    q_rows = sorted(
        quantize_embeddings(queries, query_id_col, vec_col)
        .select(query_id_col, "codes")
        .collect(),
        key=lambda r: r[0],
    )
    q_ids = [r[0] for r in q_rows]
    QC = np.asarray([[int(x) for x in r[1]] for r in q_rows], dtype=np.int64)
    if QC.shape[1] != m * dsub:
        raise ValueError(f"dim {QC.shape[1]} != m*dsub = {m * dsub}")
    qn2 = (QC * QC).sum(axis=1)  # (nq,) int64
    # LUT[qi, j, c] = dot_int(q_sub_j, cb[j][c])
    lut = np.stack(
        [QC[:, j * dsub : (j + 1) * dsub] @ C.T for j, C in enumerate(CB)], axis=1
    )  # (nq, m, ksub) int64

    @pandas_udf("struct<ests: array<long>, xn2: long>")
    def adc(codes: pd.Series) -> pd.DataFrame:
        X = np.stack(codes.to_numpy()).astype(np.int64)  # (n, dim)
        n = len(X)
        asg = np.empty((n, m), dtype=np.int64)
        for j, C in enumerate(CB):
            S = X[:, j * dsub : (j + 1) * dsub]
            # exact int64 L2 in code space; argmin ties → first = min cid
            d = (S * S).sum(axis=1)[:, None] - 2 * (S @ C.T) + cn2[j][None, :]
            asg[:, j] = d.argmin(axis=1)
        cols = np.arange(m)
        xn2 = cn2[cols, asg].sum(axis=1)  # (n,)
        ests = lut[:, cols, asg].sum(axis=2)  # (nq, n, m) -> (nq, n)
        return pd.DataFrame(
            {"ests": list(ests.T), "xn2": xn2}
        )

    # inline quantization as sibling columns (no self-join back — the
    # ivf_int8_build rule)
    with_codes = (
        corpus.select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__xs"),
        )
        .withColumn("__maxabs", F.array_max(F.transform(F.col("__xs"), F.abs)))
        .withColumn(
            "__codes",
            F.when(
                F.col("__maxabs") > 0,
                F.transform(
                    F.col("__xs"),
                    lambda x: F.floor(x / F.col("__maxabs") * 127 + F.lit(0.5)).cast(
                        "int"
                    ),
                ),
            ).otherwise(F.transform(F.col("__xs"), lambda x: F.lit(0))),
        )
    )
    scored = (
        with_codes.withColumn("__adc", adc(F.col("__codes")))
        .select(
            F.col(id_col),
            F.col("__adc.xn2").alias("__xn2"),
            F.posexplode(F.col("__adc.ests")).alias("__qi", "__est"),
        )
    )
    qid_arr = F.array(*[F.lit(q) for q in q_ids])
    qn_arr = F.array(*[F.lit(float(v)) for v in qn2])
    qn_col = F.element_at(qn_arr, F.col("__qi") + 1)
    csim = F.when(
        (qn_col > 0) & (F.col("__xn2") > 0),
        F.round(
            F.col("__est").cast("double")
            / (F.sqrt(qn_col) * F.sqrt(F.col("__xn2").cast("double"))),
            round_digits,
        ),
    ).otherwise(F.lit(0.0))
    coarse = scored.select(
        F.element_at(qid_arr, F.col("__qi") + 1).alias(query_id_col),
        F.col(id_col),
        csim.alias("__csim"),
    )
    w1 = Window.partitionBy(query_id_col).orderBy(F.desc("__csim"), F.asc(id_col))
    cand = (
        coarse.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k * refine)
        .select(query_id_col, id_col)
    )
    qf = queries.select(
        F.col(query_id_col).alias("__qid2"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qfn"),
    )
    cf = corpus.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("__cfn")
    )
    exact = (
        F.broadcast(cand)
        .join(cf, id_col)
        .join(F.broadcast(qf), F.col(query_id_col) == F.col("__qid2"))
        .select(
            query_id_col,
            id_col,
            F.round(
                dot(F.col("__qvec"), F.col(vec_col))
                / (F.col("__qfn") * F.col("__cfn")),
                round_digits,
            ).alias("sim"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        exact.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _probe_cells(
    frame: DataFrame,
    centroid_codes: list[tuple[int, list[int]]],
    id_col: str,
    vec_col: str,
    n_probe: int,
) -> DataFrame:
    """(__qid, __qvec, __qn, __cell) — every row of ``frame`` exploded to
    its ``n_probe`` best cells under the deterministic int8 centroid
    ranking. Codes and the float norm are INLINE sibling expressions
    (:func:`_inline_codes`), replacing the round-16-and-earlier
    quantize-then-self-join-on-id build that shuffled the whole frame
    against itself just to attach columns derivable in the same scan
    (the `_inline_codes` rule; at cluster scale that join was two
    payload-carrying exchanges per graph build for zero information)."""
    dots_udf = matrix_int_dots_udf([code for _, code in centroid_codes])
    return (
        _inline_codes(frame, id_col, vec_col)
        .withColumn("__qd", dots_udf(F.col("__codes")))
        .select(
            F.col(id_col).alias("__qid"),
            F.col(vec_col).alias("__qvec"),
            F.col("__cfn").alias("__qn"),
            F.explode(
                F.slice(
                    F.transform(
                        F.array_sort(
                            _int8_centroid_scores(F.col("__qd"), centroid_codes)
                        ),
                        lambda s: s.getField("cid"),
                    ),
                    1,
                    n_probe,
                )
            ).alias("__cell"),
        )
    )


#: Prober rows scored per dense block inside :func:`_pair_dot_scores` —
#: bounds the per-step accumulator at block·|members|·8 bytes (4096 rows ×
#: a 50k-member hot cell = 1.6 GB acc worst case, vs 20 GB unchunked; at
#: the healthy C~√n cell sizing the whole prober side fits one block and
#: the loop degenerates to the unchunked form).
_PAIR_SCORE_BLOCK_ROWS = 4096


def _pair_dot_scores(members: DataFrame, probers: DataFrame) -> DataFrame:
    """Per-cell (prober × member) exact dot products as ONE cogrouped
    Arrow task per cell — (src_id, nbr_id, __dot, __qn, __cfn), self-pairs
    excluded.

    ``members`` is (__cell, __mid, __mvec, __mn); ``probers`` is
    (__cell, __qid, __qvec, __qn). Replaces the equi-join +
    interpreted-HOF :func:`dot` per pair (measured ~9 µs/pair at sf0.1 —
    the Σ|probers|·|cell| pair set is the kNN-graph hot loop) with a
    vectorized accumulation that is BIT-IDENTICAL to the fold: products
    are float64(x)·float64(y) (exact float32→float64 widening) and the
    accumulator adds dimension j for every pair before dimension j+1 —
    the same left-to-right IEEE add order as
    ``aggregate(zip_with(a, b, x·y), 0.0, acc+x)``, so the rounded
    cosines (and the DuckDB oracle hash) are unchanged. Division and
    HALF_UP rounding stay JVM-side in the caller. Cogroup shuffles both
    sides by __cell — the exact exchanges the old join paid.

    Contract (shared with the SQL oracle): vectors are non-null and of
    one fixed dimension (asserted — prober/member dimension mismatch
    raises a descriptive error instead of silently truncating the dot);
    a ragged corpus fails loudly here (np.stack) where the HOF form
    silently emitted null sims.

    Per-task memory bound (round 18, VERDICT r17 #3): the prober side is
    processed in fixed-size row blocks of ``_PAIR_SCORE_BLOCK_ROWS``, so
    one skewed/hot IVF cell never allocates a dense |probers|×|members|
    float64 accumulator in a single step (a 50k×50k cell's acc alone
    would be 20 GB). Per-block peak ≈ members·dim·8 (M) +
    block·dim·8 (Q) + block·members·8 (acc) + ~40·block·members for the
    block's emitted pair frame. The RESULT of the cogroup is still one
    pairs-sized frame per cell (~40 bytes/pair through one concat) —
    cogrouped applyInPandas has no streaming return — so the hard cap
    for adversarial cells is bounding the cell itself (grow C ~ √n, the
    measured SCALE.md rule; a planted mega-cell should be split/salted
    upstream like minhash's max_bucket). Accumulation is per-pair and
    the j-loop order is unchanged inside each block, so every pair's dot
    is the SAME IEEE add sequence as the unchunked form (and as the
    original interpreted fold) — bit-identical results, pinned by
    test_pair_dot_scores_bit_identical_to_hof_fold's chunked case."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField("src_id", probers.schema["__qid"].dataType),
            StructField("nbr_id", members.schema["__mid"].dataType),
            StructField("__dot", DoubleType()),
            StructField("__qn", DoubleType()),
            StructField("__cfn", DoubleType()),
        ]
    )
    empty = {f.name: [] for f in out_schema.fields}

    def score(mdf: pd.DataFrame, qdf: pd.DataFrame) -> pd.DataFrame:
        if not len(mdf) or not len(qdf):
            return pd.DataFrame(empty)
        M = np.stack(mdf["__mvec"].to_numpy()).astype(np.float64)
        mid = mdf["__mid"].to_numpy()
        mn = mdf["__mn"].to_numpy()
        nm = len(M)
        blocks = []
        for lo in range(0, len(qdf), _PAIR_SCORE_BLOCK_ROWS):
            qb = qdf.iloc[lo : lo + _PAIR_SCORE_BLOCK_ROWS]
            Q = np.stack(qb["__qvec"].to_numpy()).astype(np.float64)
            if Q.shape[1] != M.shape[1]:
                raise ValueError(
                    "_pair_dot_scores: prober dim "
                    f"{Q.shape[1]} != member dim {M.shape[1]} — mixed "
                    "embedding widths in one cell (corrupt corpus or "
                    "mismatched index artifact)"
                )
            nq = len(Q)
            acc = np.zeros((nq, nm), dtype=np.float64)
            for j in range(M.shape[1]):
                acc += Q[:, j, None] * M[None, :, j]
            src = np.repeat(qb["__qid"].to_numpy(), nm)
            nbr = np.tile(mid, nq)
            keep = src != nbr
            blocks.append(
                pd.DataFrame(
                    {
                        "src_id": src[keep],
                        "nbr_id": nbr[keep],
                        "__dot": acc.ravel()[keep],
                        "__qn": np.repeat(qb["__qn"].to_numpy(), nm)[keep],
                        "__cfn": np.tile(mn, nq)[keep],
                    }
                )
            )
        return blocks[0] if len(blocks) == 1 else pd.concat(
            blocks, ignore_index=True
        )

    return (
        members.groupBy("__cell")
        .cogroup(probers.groupBy("__cell"))
        .applyInPandas(score, out_schema)
    )


def ivf_int8_knn_graph(
    corpus: DataFrame,
    centroid_codes: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
    round_digits: int = 4,
    cells: DataFrame | None = None,
) -> DataFrame:
    """Corpus kNN-GRAPH construction — every vector's top-``k`` exact
    cosine neighbors among the vectors in its ``n_probe`` best IVF cells.
    The all-pairs analogue of the bounded-query ANN operators: the input
    to SemDeDup-style clustering, graph-based curation, and
    connected-component near-dedup over embeddings.

    Unlike the query-set probe (:func:`ivf_int8_topk_indexed`, which may
    collect the bounded probed-cell list to the driver), NOTHING here
    touches the driver: every vector ranks the centroid codes by the SAME
    deterministic int8 score as the build, its (vector, probe-cell) pairs
    explode map-side (×``n_probe``), and ONE equi-join on the cell id
    matches probers to members — the blocked self-join that replaces the
    O(n²) cross product. Cost is Σ_cell |probers(cell)|·|cell| ≈
    n²·n_probe/C — the standard IVF kNN-graph bound. Scale rule, MEASURED
    (SCALE.md round-8 table): grow C ~ √n and hold ``n_probe`` FIXED —
    the probed fraction then shrinks as 1/√n and pair work follows the
    n^1.5 law (10× rows measured 1.65× wall). Holding C fixed is the
    quadratic trap (10× rows → ~5× wall, worsening); holding the probed
    FRACTION constant by raising n_probe with C keeps the n² pair count
    and gains nothing. Recall per probed cell improves as cells shrink,
    which is what lets n_probe stay fixed.

    Determinism: int8 cell assignment and probe ranking are integer
    dots + one IEEE division (min-cid ties), the neighbor score is the
    exact float cosine (rounded), and the per-vector top-k orders by
    (sim desc, neighbor id) — every step engine-reproducible, so the
    whole GRAPH hash-checks against a DuckDB oracle. Self-pairs are
    excluded. ``cells=`` accepts a prebuilt/persisted inverted file
    (``index_store.save_ivf_cells``/``load_ivf_cells``) so the graph can
    be (re)built from the artifact without rescanning the corpus."""
    if cells is None:
        cells = ivf_int8_build(corpus, centroid_codes, id_col, vec_col)
    probes = _probe_cells(corpus, centroid_codes, id_col, vec_col, n_probe)
    members = cells.select(
        "__cell",
        F.col(id_col).alias("__mid"),
        F.col(vec_col).alias("__mvec"),
        F.col("__cfn").alias("__mn"),
    )
    # one cogrouped Arrow task per cell scores all (prober, member) pairs
    # bit-identically to the old join + interpreted dot fold (round 17 —
    # see _pair_dot_scores); division + HALF_UP round stay JVM-side
    scored = _pair_dot_scores(members, probes).select(
        "src_id",
        "nbr_id",
        F.round(
            F.col("__dot") / (F.col("__qn") * F.col("__cfn")), round_digits
        ).alias("sim"),
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("sim"), F.asc("nbr_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_int8_knn_graph_delta(
    old_graph: DataFrame,
    old_cells: DataFrame,
    delta: DataFrame,
    centroid_codes: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """Incremental kNN-graph maintenance — O(touched) instead of a full
    rebuild: given the exact graph over the indexed corpus
    (:func:`ivf_int8_knn_graph` output), its inverted file, and a batch
    of NEW vectors, return the exact graph over the UNION corpus.

    Why it is EXACT (the merge property): a source's rebuilt neighbor
    list is the top-k of (old candidates ∪ delta candidates) under the
    total order (sim desc, id) — and top-k(A ∪ B) = top-k(top-k(A) ∪ B),
    so the stored top-k rows plus the source's delta-candidate edges
    re-ranked per source reproduce the rebuild row-for-row. Probe sets
    never change (cell ranking depends only on the fixed centroid
    codes), so no stale-candidate hazard exists. Hence incremental ==
    full rebuild bit-for-bit and BOTH share one full-corpus SQL oracle —
    the BM25/IVF append==rebuild contract extended to a derived GRAPH
    artifact.

    Work: the delta assigns in one scan (O(batch)); new sources probe
    (old ∪ delta) cells; old sources gain candidate edges ONLY against
    delta members landing in their probed cells —
    O(n_old·|delta|·n_probe/C) pair work, vs the rebuild's
    n²·n_probe/C. Contract: delta ids must be NEW (the
    ``append_bm25_delta`` rule). Pair with
    ``index_store.append_ivf_cells`` to maintain the inverted file
    itself zero-copy."""
    delta_cells = ivf_int8_build(delta, centroid_codes, id_col, vec_col)
    all_cells = old_cells.unionByName(delta_cells)

    # new sources: the standard probe, against the UNION inverted file
    new_edges = ivf_int8_knn_graph(
        delta, centroid_codes, id_col, vec_col, k, n_probe, round_digits,
        cells=all_cells,
    )

    # old sources: candidate edges only vs delta members in their probed
    # cells (probe ranking recomputed from the fixed centroid codes —
    # identical to the build-time ranking by determinism; the probe norm
    # is re-derived inline from the same float vectors, bit-identical to
    # the artifact's __cfn). Pair scoring shares the cogrouped Arrow
    # kernel with the full build (round 17 — _pair_dot_scores).
    probes = _probe_cells(old_cells, centroid_codes, id_col, vec_col, n_probe)
    delta_members = delta_cells.select(
        "__cell",
        F.col(id_col).alias("__mid"),
        F.col(vec_col).alias("__mvec"),
        F.col("__cfn").alias("__mn"),
    )
    old_vs_delta = _pair_dot_scores(delta_members, probes).select(
        "src_id",
        "nbr_id",
        F.round(
            F.col("__dot") / (F.col("__qn") * F.col("__cfn")), round_digits
        ).alias("sim"),
    )
    merged = old_graph.select("src_id", "nbr_id", "sim").unionByName(old_vs_delta)
    w = Window.partitionBy("src_id").orderBy(F.desc("sim"), F.asc("nbr_id"))
    updated_old = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    return updated_old.unionByName(new_edges.select("src_id", "nbr_id", "sim"))


def _members_with_cent_sim(
    corpus: DataFrame,
    centroid_codes: list[tuple[int, list[int]]],
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """(id, vec, __cfn, __cell, cent_sim) — the member scan shared by
    :func:`semdedup_int8` and :func:`semdedup_int8_delta`: one
    :func:`_inline_codes` pass + Arrow int64 centroid dots, argmax cell
    (min-cid ties), and the full int8 cosine to the ASSIGNED centroid
    (exact int64 dot and norm², one IEEE division/sqrt, rounded) as the
    keep-rule key. Zero-code vectors get cent_sim = 0.0 so the frame
    stays total."""
    import math

    with_codes = _inline_codes(corpus, id_col, vec_col)
    dots_udf = matrix_int_dots_udf([code for _, code in centroid_codes])
    scored = with_codes.withColumn("__cd", dots_udf(F.col("__codes")))
    best = F.array_min(_int8_centroid_scores(F.col("__cd"), centroid_codes))
    cids_arr = F.array(*[F.lit(int(cid)).cast("int") for cid, _ in centroid_codes])
    cns_arr = F.array(
        *[
            F.lit(math.sqrt(float(sum(int(x) * int(x) for x in code))))
            for _, code in centroid_codes
        ]
    )
    # own int8 code norm² — exact int64 fold (≤ 127²·dim per component)
    cn2 = F.aggregate(
        F.col("__codes"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long") * x.cast("long"),
    )
    return (
        scored.withColumn("__cell", best.getField("cid"))
        .withColumn("__pos", F.array_position(cids_arr, F.col("__cell")).cast("int"))
        .withColumn("__cn2", cn2)
        .withColumn(
            "cent_sim",
            F.when(
                F.col("__cn2") > 0,
                F.round(
                    F.element_at(F.col("__cd"), F.col("__pos")).cast("double")
                    / (
                        F.sqrt(F.col("__cn2").cast("double"))
                        * F.element_at(cns_arr, F.col("__pos"))
                    ),
                    round_digits,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .select(id_col, vec_col, "__cfn", "__cell", "cent_sim")
    )


def semdedup_int8(
    corpus: DataFrame,
    centroid_codes: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 0.95,
    round_digits: int = 4,
    max_cell_rows: int | None = None,
    persist_members: bool = True,
    coarse_eps: float | None = None,
) -> DataFrame:
    """SemDeDup — semantic deduplication via cluster-then-prune (Abbas et
    al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication"): assign every embedding to a cluster, score
    pairwise cosine ONLY within clusters, and for each near-duplicate
    pair (rounded cosine ≥ ``eps``) drop the member CLOSER to its
    centroid — the paper's keep-rule (retain the "edge" example, prune
    the redundant interior one). The missing published training-data
    method beside the exact/minhash/simhash/embedding-LSH dedup family:
    it removes semantically redundant pairs that are not near-verbatim,
    which n-gram methods cannot see.

    Clustering reuses the int8 deterministic codebook discipline of
    :func:`ivf_int8_build` (``centroid_codes`` is an external integer
    artifact; assignment = max integer-cosine centroid, min-cid ties),
    so the WHOLE pipeline — assignment, centroid similarity, pair
    pruning — is exact-int64 or IEEE-double arithmetic and hash-checks
    against a DuckDB oracle, not just a recall bound. ``cent_sim`` (the
    keep-rule key) is the full int8 cosine
    ``dot_int(codes, cc) / (√‖codes‖² · √‖cc‖²)`` rounded to
    ``round_digits``; ties break toward keeping the smaller id.

    Returns one row per corpus vector: (id, cell, cell_n, cent_sim,
    is_dup) — survivors are ``is_dup = 0``; a curation pipeline
    semi-joins on them.

    Scale shape: one corpus scan computes codes + centroid dots (Arrow
    int64 matmul, no shuffle); the pair stage shuffles narrow
    (id, vec, cell) rows by cell and scores |cell|²/2 pairs per cell —
    the SemDeDup design point: k centroids bound pairwise work at
    Σ|cell|² ≈ n²/k, so k scales with n (the paper runs 50k clusters at
    web scale; pick k ≈ n / desired-cell-size). A degenerate direction
    cluster (every vector near-parallel → one giant cell) re-creates the
    quadratic the clustering was meant to bound —
    ``max_cell_rows`` is the degrade knob: cells larger than the cap
    SHORT-CIRCUIT to the keep-rule applied cell-wide (keep exactly the
    single member FARTHEST from the centroid — min (cent_sim, id) — and
    mark the rest duplicates, skipping their pairwise join entirely).
    That is the honest degrade for eps-dense blobs (an over-cap cell at
    dedup-grade eps is one semantic point); the default ``None`` stays
    exact, which the gated oracle pins. Mirrors ``max_anchor_docs`` /
    ``max_anchor_occurrences`` in the span family.

    ``coarse_eps`` (round 11, the production pair kernel): when set, the
    pair stage runs as ONE grouped Arrow task per cell
    (:func:`_losers_arrow`) — an exact integer-code GEMM scores every
    pair at ~0.01 µs (vs ~30 µs/pair for the interpreted HOF fold,
    measured), pairs below ``coarse_eps`` on the int8 cosine die
    coarse, and only survivors get the sequential exact-cosine rerank
    at ``eps``. Two-stage semantics (the SQ8/IVF coarse+refine
    discipline): a pair whose int8 cosine sits below ``coarse_eps`` is
    never exact-scored, so leave ~0.02 of margin under ``eps`` and pass
    the threshold as its own literal (eps − margin computed in FP is
    not the literal you think). Both stages are deterministic and the
    gated oracle replays them verbatim.
    """
    members = _members_with_cent_sim(
        corpus, centroid_codes, id_col, vec_col, round_digits
    )
    if persist_members:
        # three consumers (cell counts + both sides of the pair join)
        # would each re-run the codes scan and the Arrow matmul
        from pyspark import StorageLevel

        from ._util import track_persist

        members = track_persist(members.persist(StorageLevel.MEMORY_AND_DISK))
    counts = members.groupBy("__cell").agg(F.count(F.lit(1)).alias("cell_n"))
    members = members.join(F.broadcast(counts), "__cell")

    if max_cell_rows is not None:
        w = Window.partitionBy("__cell").orderBy(F.asc("cent_sim"), F.asc(id_col))
        over = members.filter(F.col("cell_n") > max_cell_rows)
        over_flagged = over.withColumn(
            "__dup", (F.row_number().over(w) > 1).cast("int")
        )
        pairable = members.filter(F.col("cell_n") <= max_cell_rows)
    else:
        over_flagged = None
        pairable = members

    if coarse_eps is not None:
        losers = _losers_arrow(
            pairable, id_col, vec_col, eps, coarse_eps, round_digits
        ).withColumn("__dup", F.lit(1))
    else:
        a = pairable.select(
            F.col("__cell"),
            F.col(id_col).alias("__ida"),
            F.col(vec_col).alias("__va"),
            F.col("__cfn").alias("__na"),
            F.col("cent_sim").alias("__ca"),
        )
        b = pairable.select(
            F.col("__cell"),
            F.col(id_col).alias("__idb"),
            F.col(vec_col).alias("__vb"),
            F.col("__cfn").alias("__nb"),
            F.col("cent_sim").alias("__cb"),
        )
        sim = F.round(
            dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
            round_digits,
        )
        losers = (
            a.join(
                b,
                (a["__cell"] == b["__cell"]) & (F.col("__ida") < F.col("__idb")),
            )
            .select(
                F.col("__ida"), F.col("__idb"), F.col("__ca"), F.col("__cb"),
                F.col("__na"), F.col("__nb"), sim.alias("__sim"),
            )
            # norm-0 guard BEFORE the threshold: a zero vector's pair sim
            # is 0/0 = NaN, and Spark orders NaN ABOVE every number
            # (DuckDB compares it false) — without this a zero vector
            # would "match" everything in its cell on the Spark side only
            .filter((F.col("__na") > 0) & (F.col("__nb") > 0))
            .filter(F.col("__sim") >= eps)
            .select(
                F.when(
                    (F.col("__ca") > F.col("__cb"))
                    | (
                        (F.col("__ca") == F.col("__cb"))
                        & (F.col("__ida") > F.col("__idb"))
                    ),
                    F.col("__ida"),
                )
                .otherwise(F.col("__idb"))
                .alias(id_col)
            )
            .distinct()
            .withColumn("__dup", F.lit(1))
        )
    flagged = pairable.join(losers, id_col, "left").withColumn(
        "__dup", F.coalesce(F.col("__dup"), F.lit(0))
    )
    if over_flagged is not None:
        flagged = flagged.unionByName(
            over_flagged.select(*flagged.columns), allowMissingColumns=False
        )
    return flagged.select(
        F.col(id_col),
        F.col("__cell").alias("cell"),
        F.col("cell_n").cast("long").alias("cell_n"),
        F.col("cent_sim"),
        F.col("__dup").alias("is_dup"),
    )


#: Eval-EMBEDDING broadcast budget for :func:`semantic_decontaminate_int8`
#: — the embedding-space mirror of ``curation._EVAL_BROADCAST_BUDGET_BYTES``
#: (VERDICT r09 #1 / r11 #2): an eval probe row carries a dim-sized float64
#: array (dim·8 bytes) plus id/cell/norm and broadcast hash-relation
#: overhead (~64 B). 128 MiB ≈ 21k rows at dim 768 — generous for a real
#: eval suite, while refusing the ~1.2 GB build side a 200k-row "eval"
#: corpus would create.
_EVAL_EMBED_BROADCAST_BUDGET_BYTES = 128 * 1024 * 1024
_EVAL_EMBED_ROW_OVERHEAD_BYTES = 64


def semantic_decontaminate_int8(
    train: DataFrame,
    eval_df: DataFrame,
    centroid_codes: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 0.95,
    round_digits: int = 4,
    broadcast_eval: bool | None = None,
) -> DataFrame:
    """SEMANTIC eval-set decontamination — the embedding-space sibling of
    ``curation.decontaminate`` (shingle fraction) and
    ``curation.decontaminate_spans`` (verbatim spans): a train example
    whose embedding lies within cosine ``eps`` of ANY eval example is
    contaminated even when no n-gram overlaps (paraphrased eval answers,
    translated questions, reworded benchmarks — the leakage n-gram
    methods cannot see; standard practice alongside SemDeDup in
    embedding-curated corpora).

    Both sides assign to cells of the deterministic int8 codebook
    (:func:`semdedup_int8`'s discipline) and only same-cell train×eval
    pairs are cosine-scored — at matched ``eps`` a contaminated pair is
    also a near-dup pair, so the cell blocker loses the same
    (boundary-straddling) pairs SemDeDup itself accepts losing; raise
    the probe count by replicating eval rows into their top-p cells if
    recall above one cell is needed (eval sets are small — the cheap
    side to replicate).

    Returns ONE row per train vector: (id, cell, n_eval_hits,
    max_eval_sim, contaminated) — ``max_eval_sim`` is NULL-safe 0.0 for
    clean rows so the frame is total and a pipeline can threshold or
    join without null handling.

    Scale shape: one scan per side for codes + centroid dots (Arrow
    int64 matmul); the probe is a cell equi-join where the eval side is
    usually tiny (an eval suite is thousands of rows against a 100 TB
    corpus); per-cell work is |train_cell|·|eval_cell|, and the one
    aggregation groups by train id. Zero-norm guard as in
    :func:`semdedup_int8` (Spark orders NaN above every number).

    Broadcast guard (VERDICT r11 #2, the sizing rule of
    ``curation._eval_anchor_matches`` applied to embedding rows):
    ``broadcast_eval=None`` SIZES the eval side first — one cheap
    aggregate estimates Σ (dim·8 + overhead) bytes over the eval
    vectors (exact by construction: the array dominates the row) — and
    the probe broadcasts only under
    ``_EVAL_EMBED_BROADCAST_BUDGET_BYTES``; above it the cell equi-join
    runs shuffled — identical output, no multi-GB build side (eval
    EMBEDDINGS are ~two orders heavier per row than the md5 anchors the
    span family guards). ``True``/``False`` force either plan."""
    t = _cells_with_norms(train, centroid_codes, id_col, vec_col)
    e = _cells_with_norms(eval_df, centroid_codes, id_col, vec_col)
    probe = e.select(
        F.col("__cell"),
        F.col(id_col).alias("__eid"),
        F.col(vec_col).alias("__ev"),
        F.col("__cfn").alias("__en"),
    )
    if broadcast_eval is None:
        est_bytes = eval_df.select(
            F.coalesce(
                F.sum(
                    (
                        F.size(F.col(vec_col)).cast("bigint") * F.lit(8)
                        + F.lit(_EVAL_EMBED_ROW_OVERHEAD_BYTES)
                    )
                ),
                F.lit(0).cast("bigint"),
            )
        ).first()[0]
        broadcast_eval = est_bytes <= _EVAL_EMBED_BROADCAST_BUDGET_BYTES
    probe_side = F.broadcast(probe) if broadcast_eval else probe
    sim = F.round(
        dot(F.col(vec_col), F.col("__ev")) / (F.col("__cfn") * F.col("__en")),
        round_digits,
    )
    hits = (
        t.join(probe_side, "__cell")
        .filter((F.col("__cfn") > 0) & (F.col("__en") > 0))
        .select(F.col(id_col), sim.alias("__sim"))
        .filter(F.col("__sim") >= eps)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_hits"),
            F.max("__sim").alias("max_eval_sim"),
        )
    )
    return (
        t.select(id_col, F.col("__cell").alias("cell"))
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.coalesce(F.col("n_eval_hits"), F.lit(0).cast("long")).alias(
                "n_eval_hits"
            ),
            F.coalesce(F.col("max_eval_sim"), F.lit(0.0)).alias("max_eval_sim"),
            (F.coalesce(F.col("n_eval_hits"), F.lit(0).cast("long")) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def _cells_with_norms(
    corpus: DataFrame,
    centroid_codes: list[tuple[int, list[int]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, vec, __cfn, __cell) — the shared assignment scan of
    :func:`semdedup_int8` / :func:`semantic_decontaminate_int8`: inline
    int8 codes (no join back to the corpus), Arrow int64 centroid dots,
    argmax cell with min-cid ties. Identical math to
    :func:`ivf_int8_build` (which additionally keeps the float norm for
    its probe stage — as this does)."""
    with_codes = _inline_codes(corpus, id_col, vec_col)
    dots_udf = matrix_int_dots_udf([code for _, code in centroid_codes])
    best = F.array_min(_int8_centroid_scores(F.col("__cd"), centroid_codes))
    return (
        with_codes.withColumn("__cd", dots_udf(F.col("__codes")))
        .withColumn("__cell", best.getField("cid"))
        .select(id_col, vec_col, "__cfn", "__cell")
    )


def semdedup_int8_delta(
    flagged_old: DataFrame,
    old_vectors: DataFrame,
    delta: DataFrame,
    centroid_codes: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 0.95,
    round_digits: int = 4,
    persist_members: bool = True,
    coarse_eps: float | None = None,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """Incremental SemDeDup — fold a ``delta`` of NEW vectors into an
    existing :func:`semdedup_int8` result WITHOUT rescoring old×old
    pairs, bit-identical to rerunning the batch on the union. The
    equality is exact, not approximate, because the keep-rule is
    pair-local and drops are MONOTONE under corpus growth: a vector is
    a duplicate iff SOME same-cell pair at rounded cosine ≥ ``eps``
    ranks it higher by (cent_sim, id) — adding vectors only ADDS pairs,
    never removes one, so previously-dropped vectors stay dropped and
    the only possible flips are old survivors beaten by a NEW pair.
    Hence: updated flags = old flags ∪ losers(delta×old ∪ delta×delta),
    and cell assignment / cent_sim are per-vector constants. (Same
    artifact-update contract as :func:`ivf_int8_knn_graph_delta`; the
    gated entry shares the BATCH oracle verbatim — the driver
    externally proves incremental == batch.)

    ``flagged_old`` is the saved batch output (id, cell, cell_n,
    cent_sim, is_dup); ``old_vectors`` re-supplies (id, vec) for pair
    scoring (the float corpus artifact — cell_n is recomputed on the
    union, so a stale count column in the artifact is ignored).
    ``delta`` ids must be disjoint from old ids (append-only contract,
    as in every incremental operator here).

    Scale shape: the delta scans once for codes/cells (Arrow int64
    matmul); the old corpus enters the PAIR stage only for cells the
    delta actually touches (a semi-join against the delta's cell set —
    at production k the delta hits a handful of the 50k cells, so the
    pair stage never shuffles the untouched bulk); old×delta pairs are
    ONE cell equi-join with the delta side broadcast (``F.broadcast`` —
    the delta is small by contract) — per-cell work is
    |cell_old|·|cell_Δ| + |cell_Δ|²/2, against the batch rerun's
    |cell_old ∪ cell_Δ|²/2: the incremental path does ~|Δ|/n of the
    batch pair work, and since round 12 the Arrow kernel's GEMM is
    likewise |Δcell|×|cell|, not |cell|². Zero-norm pairs guarded as in
    :func:`semdedup_int8`. ``coarse_eps`` engages the same
    grouped-Arrow coarse+refine pair kernel as the batch form
    (:func:`_losers_arrow`), restricted to pairs touching a NEW member —
    pass the SAME value to both forms or incremental == batch no longer
    holds (the coarse stage is part of the semantics).

    ``max_cell_rows`` (round 12 — ADVICE r11): the same degrade knob as
    the batch form, applied to the UNION cell count. An over-cap cell's
    flags depend only on per-vector constants (keep the single member
    with min (cent_sim, id), drop the rest — no pair work), so the
    delta form RECOMPUTES over-cap cells from the union members — which
    is exactly what the batch run on the union produces for them, saved
    flags or not: the keeper (global min by (cent_sim, id)) can never
    be a previously pair-dropped member (a pair loser always ranked
    ABOVE its winner, who is also in the union), so the recompute only
    ever flips old SURVIVORS to duplicates — monotone, like every other
    transition here. Pass the SAME value to both forms, as with
    ``coarse_eps``."""
    dm = _members_with_cent_sim(delta, centroid_codes, id_col, vec_col, round_digits)
    om = (
        flagged_old.select(
            F.col(id_col),
            F.col("cell").alias("__cell"),
            F.col("cent_sim"),
            F.col("is_dup").alias("__old_dup"),
        )
        .join(old_vectors.select(F.col(id_col), F.col(vec_col)), id_col)
        .withColumn("__cfn", l2_norm(F.col(vec_col)))
    )
    if persist_members:
        from pyspark import StorageLevel

        from ._util import track_persist

        dm = track_persist(dm.persist(StorageLevel.MEMORY_AND_DISK))
        om = track_persist(om.persist(StorageLevel.MEMORY_AND_DISK))

    counts = (
        om.select(id_col, "__cell")
        .unionByName(dm.select(id_col, "__cell"))
        .groupBy("__cell")
        .agg(F.count(F.lit(1)).alias("cell_n"))
    )
    # pair-stage pruning (ADVICE r11): the old corpus joins the pair
    # stage only for cells the delta touches — cells with zero delta
    # members have no scorable pair and must not be shuffled or GEMMed.
    # The delta's distinct cell set is ≤ k rows (cells ARE codebook
    # ids): broadcast the semi-join.
    delta_cells = dm.select("__cell").distinct()
    om_pair = om.join(F.broadcast(delta_cells), "__cell", "leftsemi")
    dm_pair = dm

    if max_cell_rows is not None:
        over_cells = counts.filter(
            F.col("cell_n") > max_cell_rows
        ).select("__cell")
        w = Window.partitionBy("__cell").orderBy(
            F.asc("cent_sim"), F.asc(id_col)
        )
        # batch-on-union semantics: over-cap flags are a pure function
        # of the union members' (cent_sim, id) — saved flags ignored
        over_out = (
            om.select(id_col, "__cell", "cent_sim")
            .unionByName(dm.select(id_col, "__cell", "cent_sim"))
            .join(F.broadcast(over_cells), "__cell", "leftsemi")
            .withColumn("is_dup", (F.row_number().over(w) > 1).cast("int"))
        )
        om_pair = om_pair.join(F.broadcast(over_cells), "__cell", "leftanti")
        dm_pair = dm_pair.join(F.broadcast(over_cells), "__cell", "leftanti")
    else:
        over_out = None

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col("__cell"),
            F.col(id_col).alias(f"__id{tag}"),
            F.col(vec_col).alias(f"__v{tag}"),
            F.col("__cfn").alias(f"__n{tag}"),
            F.col("cent_sim").alias(f"__c{tag}"),
        )

    def losers_of(pairs: DataFrame) -> DataFrame:
        sim = F.round(
            dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
            round_digits,
        )
        return (
            pairs.filter((F.col("__na") > 0) & (F.col("__nb") > 0))
            .select(
                F.col("__ida"), F.col("__idb"), F.col("__ca"), F.col("__cb"),
                sim.alias("__sim"),
            )
            .filter(F.col("__sim") >= eps)
            # loser = max by (cent_sim, id) — the batch rule expressed
            # pair-order-free
            .select(
                F.when(
                    (F.col("__ca") > F.col("__cb"))
                    | (
                        (F.col("__ca") == F.col("__cb"))
                        & (F.col("__ida") > F.col("__idb"))
                    ),
                    F.col("__ida"),
                )
                .otherwise(F.col("__idb"))
                .alias(id_col)
            )
        )

    if coarse_eps is not None:
        # ONE grouped Arrow pair stage over the tagged union — only
        # pairs touching a NEW member are scored (old×old is settled),
        # only delta-touched (and under-cap) cells enter, and the
        # kernel's GEMM is |Δcell|×|cell|
        tagged = (
            dm_pair.select(id_col, vec_col, "__cfn", "__cell", "cent_sim")
            .withColumn("__is_new", F.lit(True))
            .unionByName(
                om_pair.select(id_col, vec_col, "__cfn", "__cell", "cent_sim")
                .withColumn("__is_new", F.lit(False))
            )
        )
        losers = _losers_arrow(
            tagged, id_col, vec_col, eps, coarse_eps, round_digits,
            new_col="__is_new",
        ).withColumn("__new_dup", F.lit(1))
    else:
        da, db = side(dm_pair, "a"), side(dm_pair, "b")
        oa = side(om_pair, "b")  # old side plays "b" in delta×old pairs
        cross = losers_of(
            # delta is the small side by contract — broadcast it so the
            # old corpus streams through the join unshuffled
            F.broadcast(da).join(oa, (da["__cell"] == oa["__cell"]))
        )
        within = losers_of(
            F.broadcast(da).join(
                db,
                (da["__cell"] == db["__cell"]) & (F.col("__ida") < F.col("__idb")),
            )
        )
        losers = (
            cross.unionByName(within).distinct().withColumn("__new_dup", F.lit(1))
        )

    old_src = om.select(id_col, "__cell", "cent_sim", "__old_dup")
    new_src = dm.select(id_col, "__cell", "cent_sim")
    if over_out is not None:
        # over-cap rows are emitted by over_out (batch-on-union rule)
        old_src = old_src.join(F.broadcast(over_cells), "__cell", "leftanti")
        new_src = new_src.join(F.broadcast(over_cells), "__cell", "leftanti")
    old_out = (
        old_src.join(losers, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__cell"),
            F.col("cent_sim"),
            F.greatest(
                F.col("__old_dup"), F.coalesce(F.col("__new_dup"), F.lit(0))
            ).alias("is_dup"),
        )
    )
    new_out = (
        new_src.join(losers, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__cell"),
            F.col("cent_sim"),
            F.coalesce(F.col("__new_dup"), F.lit(0)).alias("is_dup"),
        )
    )
    flagged = old_out.unionByName(new_out)
    if over_out is not None:
        flagged = flagged.unionByName(over_out.select(*flagged.columns))
    return (
        flagged
        .join(F.broadcast(counts), "__cell")
        .select(
            F.col(id_col),
            F.col("__cell").alias("cell"),
            F.col("cell_n").cast("long").alias("cell_n"),
            F.col("cent_sim"),
            F.col("is_dup"),
        )
    )


def _losers_arrow(
    members: DataFrame,
    id_col: str,
    vec_col: str,
    eps: float,
    coarse_eps: float,
    round_digits: int,
    new_col: str | None = None,
) -> DataFrame:
    """Per-cell SemDeDup loser ids via the coarse+refine discipline the
    SQ8/IVF family uses, executed as ONE grouped Arrow stage instead of
    a row-per-pair join: within each cell, (a) re-derive the int8 codes
    in numpy (same per-element IEEE expressions as
    :func:`_inline_codes` — float64 elementwise, bit-identical), (b) one
    exact GEMM gives EVERY pair's integer code dot (integer-valued
    float64: |dot| ≤ dim·127² ≪ 2⁵³, so any summation order yields the
    same exact integer — no int64 needed), (c) coarse cosine =
    dot/(√‖ca‖²·√‖cb‖²) ≥ ``coarse_eps`` prunes the pair set, (d) only
    survivors get the exact float cosine — a SEQUENTIAL left-to-right
    double fold over the raw vectors (matching Spark's zip_with/
    aggregate and DuckDB's list_dot_product ordering exactly), rounded
    half-up, thresholded at ``eps`` — and (e) the pair loser is the
    member ranking higher by (cent_sim, id).

    Every step is engine-reproducible, so a DuckDB oracle replays the
    TWO-STAGE result verbatim (the coarse comparison uses the division
    form on both sides — ``a/b ≥ t`` and ``a ≥ t·b`` differ in IEEE).
    ``coarse_eps`` is an explicit literal, NOT computed as eps − margin
    (the subtraction itself rounds).

    Refine rounding (round 12 — ADVICE r11): Spark's ``F.round`` on a
    double rounds the SHORTEST-DECIMAL repr (``BigDecimal.valueOf`` goes
    through ``Double.toString``), not the exact binary expansion — for
    eps=0.95 the double nearest 0.94995 (exact binary
    0.94994999999999996…) rounds UP under Spark but DOWN under an
    exact-binary HALF_UP. The kernel therefore prefilters with a
    few-ulp-RELAXED raw threshold and applies the exact engine rounding
    per survivor via ``Decimal(repr(sim)).quantize(HALF_UP)`` — Python's
    ``repr`` is the same shortest-round-trip decimal as
    ``Double.toString``, so the predicate is bit-identical to
    ``F.round(sim, d) >= eps``. (Survivors after coarse are few; the
    Decimal work is off the hot path.) DuckDB's ROUND multiplies by
    10^d first and can in principle diverge from BOTH on a double whose
    ×10^d product crosses the half boundary — an engine-level
    F.round-vs-ROUND property every rounded oracle here shares, not a
    kernel artifact; no fixture pair lands on one.

    Why: the pair kernel is THE SemDeDup bottleneck — the HOF fold
    costs ~30 µs/pair (measured: 2.3 M pairs = 70 s in one cell), the
    GEMM ~0.01 µs/pair; at dedup-grade eps almost all pairs die coarse,
    so the exact fold runs only on true near-duplicates. Memory: the
    per-cell GEMM is |cell|² doubles — size k so cells stay ≤ ~4k rows
    (128 MB) or engage ``max_cell_rows``.

    ``new_col``: optional boolean column marking DELTA members — when
    set, only pairs touching at least one new member are scored (the
    :func:`semdedup_int8_delta` restriction; old×old pairs are already
    settled). The GEMM itself is restricted to new-rows × all-rows
    (|Δcell| × |cell|, not |cell|²) and a cell with NO new member
    returns before touching its vectors — the advertised ~|Δ|/n pair
    work holds on the production kernel, not just in the keep mask."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    id_type = dict(zip(members.schema.names, members.schema))[id_col]
    out_schema = f"{id_col} {id_type.dataType.simpleString()}"
    cols = [id_col, vec_col, "__cfn", "cent_sim"] + ([new_col] if new_col else [])

    # The refine predicate is "round(sim, d) >= eps" with Spark's
    # BigDecimal-HALF-UP rounding — monotone in sim, so it reduces to
    # ONE raw-double threshold computed up front: the smallest double
    # whose exact binary expansion reaches the decimal boundary
    # (level − 5·10^-(d+1)) of the smallest representable rounding level
    # ≥ eps. This keeps the hot loop free of per-candidate Decimal work
    # without giving up bit-parity with F.round/DuckDB ROUND.
    quantum = Decimal(1).scaleb(-round_digits)
    lvl = Decimal(eps).quantize(quantum, ROUND_HALF_UP)
    while float(lvl) < eps:
        lvl += quantum
    boundary = lvl - Decimal(5).scaleb(-(round_digits + 1))
    # RELAXED prefilter (not the decision): the engines round the
    # shortest-decimal repr of sim, which sits within half an ulp of
    # sim's binary value — so every double whose repr reaches the
    # boundary lies within 1 ulp below the boundary's double. 4 ulps of
    # slack is strictly conservative; the exact predicate runs per
    # prefilter survivor below.
    raw_pre = float(boundary)
    for _ in range(4):
        raw_pre = math.nextafter(raw_pre, -math.inf)

    def round_hits(sims):
        """Exact engine predicate: F.round(sim, d) >= eps under Spark's
        Double.toString/BigDecimal HALF_UP semantics (== Python repr).

        JDK dependency (ADVICE r12): the `== Python repr` equivalence
        relies on Double.toString being shortest-round-trip, guaranteed
        since JDK 19 (JDK-4511638); pre-19 JVMs have documented cases
        emitting LONGER decimals, where F.round and this kernel could
        diverge on a boundary double. The engine targets the bundled
        JDK 17+ Spark runtime where the pinned pytest suite
        (test_losers_arrow_* boundary cases) proves equivalence; on a
        JVM swap those pins — not a silent flag flip — surface any
        divergence."""
        import numpy as np

        return np.fromiter(
            (
                float(
                    Decimal(repr(float(x))).quantize(quantum, ROUND_HALF_UP)
                )
                >= eps
                for x in sims
            ),
            dtype=bool,
            count=len(sims),
        )

    CHUNK = 262_144  # candidate pairs per refine block (~128 MB of E)

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[(pdf["__cfn"] > 0)]
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({id_col: pdf[id_col][:0]})
        if new_col is not None:
            is_new = pdf[new_col].to_numpy()
            if not is_new.any():
                # settled cell: zero delta members — every pair is
                # old×old, already decided by the batch run. Return
                # BEFORE stacking vectors or running the GEMM.
                return pd.DataFrame({id_col: pdf[id_col][:0]})
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        maxabs = np.abs(V).max(axis=1)
        C = np.floor(V / maxabs[:, None] * 127 + 0.5)
        n2 = (C * C).sum(axis=1)
        sq = np.sqrt(n2)
        if new_col is None:
            G = C @ C.T
            coarse = G / (sq[:, None] * sq[None, :])
            ii, jj = np.triu_indices(n, k=1)
            keep = coarse[ii, jj] >= coarse_eps
        else:
            # new-rows × all-rows only: |Δcell| × |cell| GEMM. Each
            # kept pair's coarse value is the same three IEEE ops
            # (sqrt·sqrt product, divide) as the full-matrix layout,
            # so the value is bit-identical — only the enumeration
            # shrinks. new×new pairs appear twice in the grid; the
            # (gi < gj) mask keeps one.
            new_idx = np.flatnonzero(is_new)
            Gn = C[new_idx] @ C.T
            coarse = Gn / (sq[new_idx][:, None] * sq[None, :])
            gi = np.repeat(new_idx, n)
            gj = np.tile(np.arange(n), len(new_idx))
            keep = coarse.ravel() >= coarse_eps
            keep &= gi != gj
            keep &= ~is_new[gj] | (gi < gj)
            ii, jj = gi, gj
        ii, jj = ii[keep], jj[keep]
        ids = pdf[id_col].to_numpy()
        cents = pdf["cent_sim"].to_numpy()
        norms = pdf["__cfn"].to_numpy()
        loser_blocks = []
        for lo in range(0, len(ii), CHUNK):
            bi, bj = ii[lo : lo + CHUNK], jj[lo : lo + CHUNK]
            # left-to-right accumulation per pair, vectorized ACROSS
            # pairs — the same addition sequence as Spark's aggregate
            # fold and DuckDB's list_dot_product, so raw sims are
            # bit-identical to the engines'. Transposed layout: each
            # accumulation step reads a CONTIGUOUS row (the strided
            # E[:, k] walk was ~6 µs/pair, memory-bound)
            ET = np.ascontiguousarray((V[bi] * V[bj]).T)
            s = ET[0].copy()
            for k in range(1, ET.shape[0]):
                s += ET[k]
            sims = s / (norms[bi] * norms[bj])
            hit = sims >= raw_pre
            if hit.any():
                cand_idx = np.flatnonzero(hit)
                hit = np.zeros_like(hit)
                hit[cand_idx[round_hits(sims[cand_idx])]] = True
            hi, hj = bi[hit], bj[hit]
            loser_is_i = (cents[hi] > cents[hj]) | (
                (cents[hi] == cents[hj]) & (ids[hi] > ids[hj])
            )
            loser_blocks.append(np.where(loser_is_i, ids[hi], ids[hj]))
        losers = (
            np.unique(np.concatenate(loser_blocks)) if loser_blocks else []
        )
        return pd.DataFrame({id_col: losers})

    return members.select("__cell", *cols).groupBy("__cell").applyInPandas(
        per_cell, out_schema
    )
