"""Graph centrality: fixed-point PageRank on an edge DataFrame.

Why it's here: for a 100 TB web-crawl corpus, link-graph centrality is a
first-class curation signal (OpenWebText filtered by upvotes; modern
crawl pipelines weight documents by harmonic/PageRank centrality of their
host). The dedup module already covers the other graph workload
(connected components, `dedup.dup_components`); this adds the iterative
mass-propagation one.

Design — QUANTIZED, not floating:

Classic PageRank sums float contributions per target; the sum order
differs across engines/partitionings, so no two runs hash-identically.
Here ranks live on an integer grid (``scale`` units = rank 1.0, default
10¹²) and every step is integer arithmetic:

    contrib(u→v)  = (r_u · 85) DIV (100 · outdeg_u)          [d = 0.85]
    r'_v          = (scale·15) DIV (100·N)                    [base]
                  + (dangling_sum · 85) DIV (100·N)           [dangling]
                  + Σ contrib(·→v)

Integer sums are associative — partition-order-independent — so the
result is BIT-IDENTICAL across engines, cluster sizes, and reruns, which
is what lets an iterative graph algorithm earn a DuckDB-oracle hash row
(the oracle unrolls the same integer recurrence). The floors leak
≤ (N + |E|)/scale of total mass per iteration — at scale 10¹² that is
noise far below any ranking decision, and a documented contract rather
than a hidden numeric hazard.

Scale shape (per iteration): one equi-join ranks⋈edges on src + one
groupBy dst — two key-partitioned shuffles over the edge table; the rank
frame is node-sized. Ranks re-materialize each round through the same
``checkpoint_mode`` tiers as connected components (`dedup._materialize`:
persist/local/reliable/table) so lineage doesn't grow with iterations.
The source edge frame persists by default (``persist_edges=True``) so
the invariant builders share one scan — see :func:`pagerank`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _materialize


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    n_iter: int = 10,
    damping_pct: int = 85,
    scale: int = 10**12,
    checkpoint_mode: str = "auto",
    round_digits: int = 12,
    persist_edges: bool = True,
    release_caches: bool = False,
) -> DataFrame:
    """PageRank over ``edges`` (multi-edges count as parallel edges).
    Returns one row per node: (node, rank_fix, rank) where ``rank_fix``
    is the exact integer fixed-point mass (``scale`` = 1.0) and ``rank``
    its float rendering. ``damping_pct`` is the damping factor in percent
    (integer — part of the exactness contract).

    int64 headroom: r_u ≤ scale, so r_u·damping_pct ≤ 10¹⁴ ≪ 2⁶³; per-dst
    contribution sums are ≤ scale·damping_pct. Raise ``scale`` only with
    care, lower it for graphs with > 10⁶ average in-degree.

    ``checkpoint_mode`` governs the per-round rank materialization tier
    (see ``dedup._materialize``); loop INVARIANTS (node set,
    out-degree-annotated edges, dangling set) always persist — they are
    re-consumed every round regardless of tier. For the per-round ranks,
    materialization is pure overhead while the plan stays shallow:
    ``"unrolled"`` leaves rank lineage as one fused plan — no per-round
    block writes or stage breaks (A/B at sf0.1, 3 iterations, steady
    state: ~4.2-4.6s vs ~4.7-4.9s persist; up to 2× better in
    JIT-hot sessions) — but analyzer/optimizer time grows with the
    unrolled depth, so it is only right for FEW iterations. The default
    ``"auto"`` picks ``"unrolled"`` for n_iter ≤ 5 and ``"persist"``
    beyond (results are bit-identical in every mode — the recurrence is
    exact integer arithmetic). With a dangling set, unrolled's per-round
    ranks persist anyway (consumed twice per round).

    ``persist_edges=True`` (the default — VERDICT r08 #4) persists the
    projected edge frame itself, so the invariant-building consumers
    (node set, out-degrees, degree-annotated edges, dangling set) share
    ONE scan of the source instead of re-reading it ~4×; at 100 TB an
    unpersisted crawl-graph re-scan per consumer is the dominant setup
    cost. Pure materialization — results are bit-identical either way
    (pinned in tests). A/B at sf0.1 (3 iterations, warm median): ~4.8s
    vs ~4.4s — a slight LOSS at this SF, because the scan there is two
    dictionary-encoded int columns out of an OS-cached parquet file and
    the persist pays a memory-write; the win is proportional to true
    scan cost (wide tables, object storage), which is the 100 TB regime
    the default is chosen for. Set False for cheap re-scannable inputs
    or when the caller already persisted/bucketed the edge table.

    Cache lifetime (ADVICE r09 #2): every frame this function persists
    routes through ``_util.track_persist``, so the session-level ledger
    (``_util.release_tracked()`` / ``session.clear_session_state``)
    releases them — repeated pagerank calls in a long-lived session do
    NOT leak past the next ledger release (the bench harness clears
    between queries). The default leaves the persists alive after return
    because the RESULT is a lazy plan over them: unpersisting eagerly
    would silently recompute the whole iteration chain on the caller's
    first action. ``release_caches=True`` opts into self-contained
    cleanup: the final ranks are eagerly local-checkpointed (lineage
    truncated) and every frame THIS CALL persisted is unpersisted before
    returning — bit-identical result, one extra materialization pass,
    nothing left in the cache manager except the returned frame's own
    checkpoint storage (which the session ledger still releases)."""
    if not (0 < damping_pct < 100):
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    if checkpoint_mode == "auto":
        checkpoint_mode = "unrolled" if n_iter <= 5 else "persist"
    inv_mode = "persist" if checkpoint_mode == "unrolled" else checkpoint_mode

    scoped: list[DataFrame] = []  # frames THIS call persisted

    def _mat(df: DataFrame, mode: str) -> DataFrame:
        out = _materialize(df, mode)
        if mode == "persist":
            scoped.append(out)
        return out

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if persist_edges:
        e = _mat(e, "persist")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # co-partition the node frame too (round 16, same principle as the
    # edge cache below): every iteration left-joins nodes⋈contribs ON
    # node, and contribs exits its groupBy already hash-partitioned by
    # node — caching nodes in that partitioning elides the nodes-side
    # per-round exchange (node-sized, so a smaller win than the edge
    # one: in-session A/B at 100×, 2 passes each, 94-120 s → 85-96 s on
    # top of the edge fix). No sort: the step join is a hash join.
    if inv_mode in ("persist", "eager"):
        nodes = nodes.repartition(F.col("node"))
    nodes = _mat(nodes, inv_mode)
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # edges annotated with the sender's out-degree, reused every round.
    # CO-PARTITION the invariant side ONCE (round 16 — the second-decade
    # rung's catch): every iteration joins ed⋈ranks ON src, and a plainly
    # persisted ed pays a full |E|-row Exchange + Sort in EVERY round
    # (the 100× plan showed 3× 120M-row exchanges over the same
    # InMemoryTableScan, zero ReusedExchange). Persisting ed already
    # hash-partitioned AND sorted by src lets the SMJ consume the cache's
    # outputPartitioning/outputOrdering directly — per-iteration edge
    # work drops to a scan. A/B at the 100× rung (120M directed edges,
    # 3 iters, warm median of 2): 75.2 s → 51.6 s (1.46×),
    # top-100 bit-identical (integer recurrence — associativity makes
    # partitioning invisible in results). Only the persist tiers keep
    # planner-visible partitioning (localCheckpoint scans report
    # UnknownPartitioning), so the repartition+sort is gated on them —
    # other tiers would pay the build-time sort for zero reuse.
    ed = e.join(out_deg, "src")
    if inv_mode in ("persist", "eager"):
        ed = ed.repartition(F.col("src")).sortWithinPartitions("src")
    ed = _mat(ed, inv_mode)
    # Dangling MEMBERSHIP (nodes with no out-edges) is loop-invariant —
    # only the mass on it changes per round. Materialize the set once and,
    # when it's empty (every symmetric/undirected graph), skip the
    # per-round dangling aggregate entirely: that removes one anti-join +
    # full-ranks scan + 1-row agg per iteration from the plan.
    dang_nodes = _mat(
        nodes.join(out_deg.withColumnRenamed("src", "node"), "node", "left_anti"),
        inv_mode,
    )
    # ONE pre-loop job for both loop constants (round 18): |nodes| and
    # dangling-set presence come from a single aggregate over
    # nodes⟕out_deg — replacing the separate nodes.count() +
    # dang_nodes.limit(1).count() actions (two driver round-trips, and
    # limit(1) only part-populated the caches it touched). The aggregate
    # also eagerly populates the nodes (and e) persists before the loop
    # consumes them. outdeg is unique per src, so count(*) = |nodes| and
    # null-outdeg rows are exactly the anti-join's dangling set.
    _row = (
        nodes.join(
            out_deg.withColumnRenamed("src", "node"), "node", "left"
        )
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(F.col("outdeg").isNull(), 1)).alias("__nd"),
        )
        .first()
    )
    n_total, has_dangling = int(_row["__n"]), bool(_row["__nd"])
    if checkpoint_mode == "unrolled":
        # with a dangling set each round's ranks frame is consumed TWICE
        # (contribution join + dangling-mass agg) — lazy persist then
        # beats recompute; with none it is consumed once and pure
        # lineage is fastest
        rank_mode = "persist" if has_dangling else "none"
    else:
        rank_mode = checkpoint_mode

    base = (scale * (100 - damping_pct)) // (100 * n_total)
    init = F.floor(F.lit(float(scale)) / F.lit(n_total)).cast("long")
    ranks = _mat(
        nodes.select("node", init.alias("rank_fix")), rank_mode
    )
    for _ in range(n_iter):
        r_src = ranks.withColumnRenamed("node", "src")
        contribs = (
            ed.join(r_src, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank_fix * {damping_pct}) DIV (100 * outdeg)").alias(
                    "__c"
                ),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__sum"))
        )
        step = nodes.join(contribs, "node", "left")
        if has_dangling:
            # dangling mass: ranks of no-out-edge nodes, spread uniformly
            dangling = (
                ranks.join(dang_nodes.select("node"), "node", "left_semi")
                .agg(F.coalesce(F.sum("rank_fix"), F.lit(0)).alias("__dm"))
                .select(
                    F.expr(
                        f"(__dm * {damping_pct}) DIV (100 * {n_total})"
                    ).alias("__dshare")
                )
            )
            step = step.crossJoin(F.broadcast(dangling))
            rank_expr = (
                F.lit(base)
                + F.col("__dshare")
                + F.coalesce(F.col("__sum"), F.lit(0))
            )
        else:
            rank_expr = F.lit(base) + F.coalesce(F.col("__sum"), F.lit(0))
        ranks = _mat(
            step.select("node", rank_expr.alias("rank_fix")), rank_mode
        )
    result = ranks.select(
        "node",
        "rank_fix",
        F.round(F.col("rank_fix") / F.lit(float(scale)), round_digits).alias(
            "rank"
        ),
    )
    if release_caches:
        # truncate lineage FIRST (eager), then drop this call's persists —
        # the checkpointed result no longer references them
        result = _materialize(result, "local")
        for f in scoped:
            f.unpersist()
    return result


def triangle_counts(
    edges: DataFrame, src: str, dst: str, persist_oriented: bool = True
) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph induced
    by ``edges`` (self-loops dropped, directions/multi-edges collapsed) —
    the local-clustering signal (spam/link-farm detection scores hosts by
    triangle density; community cores have high counts).

    Algorithm — degree-ordered orientation + adjacency intersection (the
    edge-iterator form): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, build each node's
    oriented out-neighbor list, and for every oriented edge (s, t) the
    triangles through it are exactly ``adj(s) ∩ adj(t)`` — each triangle
    surfaces ONCE (at its lowest-keyed vertex's two out-edges), so there
    is no dedup and no count/3 correction. Orientation bounds every
    adjacency list at O(√m) regardless of raw hub skew (a hub's edges
    point INTO it).

    Why not the wedge self-join: materializing wedges shuffles
    Σ C(outdeg, 2) candidate rows into the closing join — superlinear in
    m on dense graphs. Here the wedge set NEVER exists: the intersection
    runs inside the row (codegen'd array_intersect over the two bounded
    lists), and total shuffle volume stays O(m) edge rows + O(m) list
    elements + O(m + T) narrow count rows. Measured 1.5× faster at sf0.1
    on the 1.2M-edge co-purchase graph, with the gap widening with
    density.

    Node ids keep their input type (long ids join markedly faster than
    their string forms); the (degree, id) tiebreak uses the column's
    natural ordering, which any SQL oracle reproduces. The oriented frame
    is consumed three times (adjacency build + two join sides) —
    ``persist_oriented`` (default) materializes it once (MEMORY_AND_DISK);
    at 100 TB swap for a table checkpoint via the dedup tier pattern.
    The degree and adjacency tables are node-sized: joined on node keys,
    NOT force-broadcast (AQE upgrades them at small scale; at web-graph
    scale they stay shuffle joins — same rule as text.py's vocabulary
    tables).

    Returns (node, n_triangles), nodes with ≥1 triangle only."""
    a, b = F.col(src), F.col(dst)
    und = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if persist_oriented:
        from pyspark import StorageLevel

        from ._util import track_persist

        # und feeds both the degree pass and the orientation join — without
        # this the whole upstream edge build runs twice
        und = track_persist(und.persist(StorageLevel.MEMORY_AND_DISK))
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    keyed = (
        und.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
        .select(
            "a", "b",
            F.struct(F.col("da").alias("d"), F.col("a").alias("v")).alias("ka"),
            F.struct(F.col("db").alias("d"), F.col("b").alias("v")).alias("kb"),
        )
    )
    fwd = F.col("ka") < F.col("kb")
    oriented = keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("t"),
    )
    if persist_oriented:
        from pyspark import StorageLevel

        from ._util import track_persist

        oriented = track_persist(oriented.persist(StorageLevel.MEMORY_AND_DISK))
    adj = oriented.groupBy("s").agg(F.sort_array(F.collect_list("t")).alias("nb"))
    e_adj = (
        oriented.join(adj.select("s", F.col("nb").alias("nb_s")), "s")
        .join(adj.select(F.col("s").alias("t"), F.col("nb").alias("nb_t")), "t")
        .select("s", "t", F.array_intersect("nb_s", "nb_t").alias("ws"))
        .filter(F.size("ws") > 0)
    )
    # ONE pass over e_adj (round 17): the old three-way unionAll re-ran the
    # whole intersection-join subtree per branch (8 SortMergeJoins / 4
    # collect_list aggregates in the final plan; measured 3× the subtree,
    # 52 s vs 12 s for the subtree itself at sf0.1). Each edge (s, t, ws)
    # contributes +1 to every wedge node and +|ws| to both endpoints —
    # emitted together from a single in-row concat, so the expensive join
    # runs once and the unions vanish. Same (node, c) multiset by
    # construction ⇒ identical counts.
    ws = F.col("ws")
    contribs = F.concat(
        F.transform(
            ws, lambda w: F.struct(w.alias("node"), F.lit(1).alias("c"))
        ),
        F.array(
            F.struct(F.col("s").alias("node"), F.size(ws).alias("c")),
            F.struct(F.col("t").alias("node"), F.size(ws).alias("c")),
        ),
    )
    return (
        e_adj.select(F.explode(contribs).alias("__ct"))
        .select("__ct.node", "__ct.c")
        .groupBy("node")
        .agg(F.sum("c").cast("long").alias("n_triangles"))
    )


def bipartite_project(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group: int = 256,
    min_weight: int = 1,
) -> DataFrame:
    """Project a bipartite (group, item) relation onto weighted item–item
    co-occurrence edges — the graph-construction step behind co-purchase /
    co-click / co-citation networks: ``weight(a, b)`` = number of groups
    containing BOTH items (each group counted once per pair regardless of
    row multiplicity). Returns (item_a, item_b, weight) with
    ``item_a < item_b``.

    The quadratic hazard: one group with k items emits C(k,2) pairs — a
    single 10⁶-item group is 5·10¹¹ rows from ONE key. Groups larger than
    ``max_group`` are EXCLUDED (not star-truncated like the LSH kernel:
    co-occurrence weights must stay exact for every emitted edge, and a
    hub group that big carries no signal — every pair in it co-occurs
    with everything). The caller sizes ``max_group`` to the largest
    meaningful basket; total pair work is then ≤ groups·max_group²/2.

    Scale shape: ONE groupBy shuffle on the group key (collect_set
    dedupes item multiplicity in the same exchange), pair expansion is
    JVM array lambdas inside the row (the bucket_pairs kernel shape),
    then one partial-aggregable (item_a, item_b) count. No self-join, no
    cross join; ``min_weight`` prunes the singleton-pair tail before it
    ever leaves the final aggregate."""
    grouped = (
        df.groupBy(F.col(group_col).alias("__g"))
        .agg(F.sort_array(F.collect_set(F.col(item_col))).alias("__ids"))
        .filter((F.size("__ids") >= 2) & (F.size("__ids") <= max_group))
    )
    ids = F.col("__ids")
    k = F.size(ids)
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), k - i - F.lit(1)),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pairs).alias("__p"))
        .select("__p.item_a", "__p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )
