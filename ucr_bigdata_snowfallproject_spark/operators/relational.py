"""Relational core: projections, filters, joins, set ops, sort/limit.

Maps SURVEY §2.2 (P1-P9), §2.3 (J1/J2), §2.6 (O1/O2), §2.7 (U1) onto
DataFrame built-ins.  Everything here stays inside whole-stage codegen —
no Python executes per-row.

Scale notes:
- dimension joins go through :func:`join_dim` which broadcasts explicitly;
  at 100 TB the fact side never shuffles for a dim join.
- semi/anti joins (the reference's hand-rolled per-row membership probe at
  ``untitled.py:72``) are real `left_semi`/`left_anti` joins, broadcastable
  the same way.
- top-k compiles to TakeOrderedAndProject — no global sort materialization.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Column-subset projection (P7; reference untitled.py:171)."""
    return df.select(*cols)


def project_positional(df: DataFrame, indices: Sequence[int]) -> DataFrame:
    """Positional projection (S6/P9; reference untitled.py:44-47,124-126)."""
    cols = df.columns
    return df.select(*[cols[i] for i in indices])


def rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Bulk rename (P8; reference untitled.py:48 `STN---`→`USAF`)."""
    return df.withColumnsRenamed(mapping)


def drop_columns(df: DataFrame, *cols: str) -> DataFrame:
    """Column drop (P6; reference untitled.py:36)."""
    return df.drop(*cols)


def filter_not_null(df: DataFrame, *cols: str) -> DataFrame:
    """Null-predicate filter (P1; reference untitled.py:27).

    Pushed to the source scan (IsNotNull shows in PushedFilters for
    parquet), so at scale this prunes before any compute.
    """
    pred = F.lit(True)
    for c in cols:
        pred = pred & F.col(c).isNotNull()
    return df.filter(pred)


def scrub_sentinels(
    df: DataFrame,
    sentinels: Iterable[float] = (0.0, -999.0, -999.9),
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """Sentinel→NULL rewrite (P2; reference untitled.py:26
    ``replace([0.0,-999.0,-999.9], np.nan)``)."""
    return df.na.replace(list(sentinels), None, subset=list(cols) if cols else None)


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Fact × small-dimension equi-join (J1; reference untitled.py:85).

    Broadcasts the dimension: a map-side hash join with zero shuffle of the
    fact table — the only join strategy that survives a 100 TB fact side
    against a ~10^4-row dimension.
    """
    return fact.join(F.broadcast(dim), on=list(on), how=how)


def join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """General join surface: inner/left/right/full/left_semi/left_anti/cross
    (SURVEY §2.3). Large⋈large shuffles on the key (sort-merge or, under
    AQE, shuffled-hash); skew handled by AQE skew-join splitting."""
    return left.join(right, on=on if isinstance(on, Column) else list(on), how=how)


_JOIN_HINTS = {"broadcast", "merge", "shuffle_hash", "shuffle_replicate_nl"}


def join_with_strategy(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | Column,
    strategy: str,
    how: str = "inner",
) -> DataFrame:
    """:func:`join` with an explicit physical-strategy hint on the RIGHT
    side (Spark join hints: ``broadcast`` / ``merge`` (sort-merge) /
    ``shuffle_hash`` / ``shuffle_replicate_nl``). Hints are the escape
    hatch when the planner's estimate is wrong at 100 TB — e.g. force
    ``shuffle_hash`` for a medium build side that sorts expensively, or
    ``merge`` when both sides arrive pre-sorted from bucketed layout.
    Prefer NO hint (AQE re-plans from runtime stats) unless a measured
    plan says otherwise — a wrong forced broadcast is the classic
    scale-killer (see the r4 vocabulary-broadcast lesson in text.py).
    Plan tests assert each hint actually flips the physical operator."""
    if strategy not in _JOIN_HINTS:
        raise ValueError(f"strategy must be one of {sorted(_JOIN_HINTS)}")
    return join(left, right.hint(strategy), on, how)


def semi_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    broadcast: bool = True,
) -> DataFrame:
    """Existence filter as a real semi join (J2 — the reference executes
    this row-at-a-time against a driver-side table, untitled.py:72).

    ``broadcast=True`` (default) is the DIMENSION-side contract — the
    reference's probe table is station-sized and must never shuffle the
    fact side. For a corpus-sized right side pass ``broadcast=False``
    (shuffle semi join, AQE upgrades if runtime stats allow) or reach for
    :func:`bloom_semi_join`, which cuts the fact side scan-side first —
    a forced broadcast of an unbounded table is the classic scale-killer
    (the r4 vocabulary-broadcast lesson, text.py)."""
    keys = right.select(*on).distinct()
    if broadcast:
        keys = F.broadcast(keys)
    return left.join(keys, on=list(on), how="left_semi")


def anti_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    broadcast: bool = True,
) -> DataFrame:
    """Complement of :func:`semi_join` (non-existence filter); same
    dimension-side broadcast contract and ``broadcast=False`` escape."""
    keys = right.select(*on).distinct()
    if broadcast:
        keys = F.broadcast(keys)
    return left.join(keys, on=list(on), how="left_anti")


def union_all(*dfs: DataFrame) -> DataFrame:
    """Union-by-name accumulate (U1; reference's append loop at
    untitled.py:80-82). In the engine the per-file loop disappears into the
    multi-file scan; this exists for heterogeneous sources."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def intersect(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.intersect(right)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.exceptAll(right)


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Top-k (O1; reference's sort + tail-20 at untitled.py:20-21).

    Plans as TakeOrderedAndProject: each partition keeps a k-row heap, the
    driver merges — O(k) memory regardless of input size. Callers should
    include a unique tiebreaker column for deterministic output.
    """
    return df.orderBy(*order_by).limit(k)


def limit(df: DataFrame, n: int) -> DataFrame:
    """Limit/peek (O2/S10; reference take/show at untitled.py:159,172,235)."""
    return df.limit(n)


#: Word count at which the array-LITERAL probe's plan/codegen cost is
#: measured clearly past the broadcast-join form's (round-13 sf0.1 curve,
#: SCALE.md § "Bloom-vs-exact crossover": literal warm 2.0 s at 512 words
#: → 2.6 s at 2,048 → 3.5-4.1 s at 4,096 → 14-16 s at 16,384 (r12), while
#: the JOIN form is FLAT 1.6-1.8 s from 2,048 through 131,072 words).
#: Auto mode therefore never picks the literal — the join form wins at
#: every measured size AND is the only one that scales num_bits past the
#: plan-literal regime; the literal remains for explicit ``mode=
#: "literal"`` callers and for the streaming scan-filter probe
#: (:func:`bloom_probe_filter`), which must stay a pure expression.
#: This constant documents the cliff and bounds the sizes the streaming
#: faces should load as literals.
_BLOOM_LITERAL_MAX_WORDS = 4096


def _bloom_positions(key: str, num_bits: int, num_hashes: int) -> list[Column]:
    """The ``num_hashes`` bit positions of ``key`` in a ``num_bits`` Bloom
    bitmap — shared by the build and probe sides (xxhash64 is
    input-type-sensitive, so the INT seed literal must match exactly)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), F.col(key)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom_words(
    build: DataFrame,
    build_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """Occupied Bloom words as a ``(__w int, __bits long)`` DataFrame —
    the unbounded-``num_bits`` half of :func:`build_bloom_bitmap`.

    Never collected and never densified: row count is bounded by
    ``min(num_bits/64, num_hashes × |distinct build keys|)`` REGARDLESS
    of ``num_bits``, so the bitmap can be sized purely for fp-rate
    (~10 bits/key) even when that means 10⁹-10¹⁰ bits — the regime the
    array-literal form cannot reach (VERDICT r12 Missing #2). Feed to
    :func:`bloom_semi_join` via ``mode="join"`` or let its auto mode
    build this frame itself."""
    one_shl = "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))"
    pos_build = _bloom_positions(build_key, num_bits, num_hashes)
    return (
        build.select(F.explode(F.array(*pos_build)).alias("__pos"))
        .distinct()
        .groupBy((F.col("__pos") / 64).cast("int").alias("__w"))
        .agg(F.bit_or(F.expr(one_shl)).alias("__bits"))
    )


def bloom_probe_filter(
    key: str, bitmap: list[int], num_bits: int, num_hashes: int
) -> Column:
    """The array-literal Bloom membership test as a standalone Column —
    ``num_hashes`` codegen'd xxhash64 probes + int64 bit tests against
    the bitmap literal, True iff ``key`` is a PROBABLE member (false
    positives possible, false negatives impossible).  Shared by
    :func:`bloom_semi_join`'s literal mode and the streaming faces
    (``streaming.documents.stream_contamination_flags``), where each
    micro-batch prefilters scan-side with exactly this expression before
    the stream-static verify join."""
    bitmap_lit = F.lit(bitmap)
    probe = F.lit(True)
    for i, pos in enumerate(_bloom_positions(key, num_bits, num_hashes)):
        word = F.element_at(bitmap_lit, (pos / 64).cast("int") + 1)
        # seed literal must stay INT to hash identically to the build
        # side (xxhash64 is input-type-sensitive; {i}L is a BIGINT seed)
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(xxhash64({i}, {key}), {num_bits}) % 64 AS INT))"
        )
        probe = probe & (word.bitwiseAND(bit) != 0)
    return probe


def bloom_semi_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
    bitmap: list[int] | None = None,
    mode: str | None = None,
    words: DataFrame | None = None,
) -> DataFrame:
    """Semi join with an explicit scan-side Bloom prefilter: keep the
    ``fact`` rows whose ``fact_key`` exists in ``build``'s ``build_key``
    set, but test every fact row against a bitmap of the build keys
    BEFORE it reaches the join shuffle.

    Result is EXACT (identical to a plain left-semi join): the Bloom test
    only admits a superset — false positives are removed by the final
    semi join over the survivors; false negatives are impossible.

    Why at 100 TB: a selective dimension predicate (say 0.1% of orders)
    still makes a plain sort-merge semi join shuffle the ENTIRE fact
    table on the key. Here the fat side is cut to ~matches ×
    (1 + fp_rate) while still in the scan stage (whole-stage-codegen'd
    xxhash64 probes + int64 bit tests, no Python), so the join exchange
    shrinks by the dimension's selectivity. Spark's own runtime Bloom
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) covers the
    single-query case; the explicit form composes — the bitmap is an
    index-artifact-style bounded collect (``num_bits/64`` int64 words,
    default 8 KiB) that callers can persist and reuse across queries and
    micro-batches (same contract as the PQ codebooks / IVF centroids).

    fp_rate ≈ (1 − e^(−k·n/m))^k — size ``num_bits`` ≥ ~10× the build
    cardinality for <1% with ``num_hashes=3``; an over-full bitmap only
    costs prefilter selectivity, never correctness.

    Pass a prebuilt ``bitmap`` (from :func:`build_bloom_bitmap`, possibly
    loaded via ``index_store.load_bloom_bitmap``) to skip the build job —
    num_bits/num_hashes must match the bitmap's build parameters (the
    index_store round-trips them alongside the words).

    Two probe forms, identical output (``mode``):

    - ``"literal"`` — the bitmap rides the plan as an int64 ARRAY LITERAL
      probed by ``element_at``; zero joins, pure codegen, but plan/codegen
      cost grows with the word count (see ``_BLOOM_LITERAL_MAX_WORDS``).
    - ``"join"`` — the OCCUPIED words (:func:`build_bloom_words`) become a
      broadcast ``(__w, __bits)`` frame; each probe position left-joins it
      and a missing word is a zero word (probe fails).  Plan size is
      ``num_bits``-independent and the broadcast is bounded by the build
      key cardinality, so ``num_bits`` can be sized for fp-rate alone
      (10⁹-10¹⁰ bits for a 10⁸-10⁹-key eval union ⇒ words frame ~12 bytes
      × occupied words; past ~10⁹ keys the words frame itself outgrows a
      sane broadcast — at that point use the plain shuffled semi join,
      whose exchange the prefilter could no longer undercut anyway).
    - ``None`` (default) — the JOIN form, always: the round-13 sf0.1
      curve measured it flat (~1.6-1.8 s warm) from 2,048 through
      131,072 words while the literal grows with word count and never
      wins (2.0 s at 512 words → 3.5-4.1 s at 4,096 → 14-16 s at
      16,384); the literal also cannot scale past the plan-literal
      regime at all.  ``mode="literal"`` remains for callers that need
      a single-stage scan-only plan (the streaming faces probe via
      :func:`bloom_probe_filter` for the same reason).

    ``words`` (join form only): a prebuilt occupied-words frame —
    :func:`build_bloom_words` output or ``index_store.load_bloom_words``
    — skipping the build job without ever collecting the words
    (the artifact path for bitmaps too large to densify).
    """
    annotated, hit = _bloom_annotate(
        fact, build, fact_key, build_key, num_bits, num_hashes, bitmap,
        mode, words,
    )
    keys = build.select(F.col(build_key).alias(fact_key)).distinct()
    return annotated.filter(hit).drop("__bloom_hit").join(
        keys, fact_key, "left_semi"
    )


def bloom_anti_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
    bitmap: list[int] | None = None,
    mode: str | None = None,
    words: DataFrame | None = None,
) -> DataFrame:
    """Anti join with a scan-side Bloom SHORT-CIRCUIT (round 13): keep
    the ``fact`` rows whose ``fact_key`` does NOT exist in ``build``'s
    ``build_key`` set — the complement of :func:`bloom_semi_join`, and
    the shape of every removal filter in a curation pipeline (drop
    contaminated docs, drop already-seen fingerprints, drop dup losers).

    The Bloom filter's asymmetry works FOR the anti join: a probe miss
    is a DEFINITE non-member, so bloom-no rows are kept immediately
    without ever reaching an exchange; only probable members (~true
    members × (1 + fp_rate)) pay the exact anti join that rescues the
    false positives. Result is EXACT (identical to a plain left-anti
    join) for the same reason the semi form is.

    Plan shape: a two-branch union — branch 1 is the bloom-no filter
    (scan-stage only, zero exchange), branch 2 is bloom-yes → exact
    anti join. That reads ``fact`` twice, which is the deliberate trade:
    at 100 TB a columnar re-scan with a pushed filter is cheap next to
    shuffling the full fact side on the key (the plain anti join's
    cost), and on a mostly-clean corpus branch 2 carries ~nothing.
    Same ``mode``/``bitmap``/``words`` contract as
    :func:`bloom_semi_join`."""
    annotated, hit = _bloom_annotate(
        fact, build, fact_key, build_key, num_bits, num_hashes, bitmap,
        mode, words,
    )
    keys = build.select(F.col(build_key).alias(fact_key)).distinct()
    definite_out = annotated.filter(~hit).drop("__bloom_hit")
    rescued = (
        annotated.filter(hit)
        .drop("__bloom_hit")
        .join(keys, fact_key, "left_anti")
    )
    return definite_out.unionByName(rescued)


def bloom_prefilter(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
    bitmap: list[int] | None = None,
    mode: str | None = None,
    words: DataFrame | None = None,
) -> DataFrame:
    """The raw prefilter half of :func:`bloom_semi_join` (round 13):
    ``fact`` rows whose ``fact_key`` is a PROBABLE member of ``build``'s
    key set — false positives included (the caller's downstream exact
    join must rescue them), false negatives impossible.

    Exists for operators whose verify step is NOT a semi join: the span
    decontamination family joins train anchors to eval anchors and
    keeps BOTH sides' payload columns (positions, ids), so the rescue
    is the equi-join itself — prefiltering the train side here cuts the
    join exchange to ~matching-fingerprint rows without changing one
    output row.  Same ``mode``/``bitmap``/``words`` contract as
    :func:`bloom_semi_join`."""
    annotated, hit = _bloom_annotate(
        fact, build, fact_key, build_key, num_bits, num_hashes, bitmap,
        mode, words,
    )
    return annotated.filter(hit).drop("__bloom_hit")


def _bloom_annotate(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    num_bits: int,
    num_hashes: int,
    bitmap: list[int] | None,
    mode: str | None,
    words: DataFrame | None,
) -> tuple[DataFrame, Column]:
    """Shared probe machinery of :func:`bloom_semi_join` /
    :func:`bloom_anti_join`: returns ``fact`` annotated with a boolean
    ``__bloom_hit`` column (probable member) and the column itself.
    Literal mode is a pure scan expression; join mode adds
    ``num_hashes`` broadcast left joins against the occupied-words
    frame (no exchange on the fact side either way)."""
    if mode is None:
        # measured round 13 (sf0.1 curve in SCALE.md): the join form is
        # flat ~1.6-1.8 s at every bitmap size while the literal grows
        # with the word count and never wins — auto always joins
        mode = "join"
    if mode not in ("literal", "join"):
        raise ValueError(f"unknown bloom probe mode: {mode!r}")
    if words is not None and mode != "join":
        raise ValueError("a prebuilt words frame requires mode='join'")
    if mode == "literal":
        if bitmap is None:
            bitmap = build_bloom_bitmap(build, build_key, num_bits, num_hashes)
        probe = bloom_probe_filter(fact_key, bitmap, num_bits, num_hashes)
        return fact.withColumn("__bloom_hit", probe), F.col("__bloom_hit")
    # join form: occupied words only. localCheckpoint the (tiny vs build
    # input) words frame so the num_hashes broadcast scans share ONE build
    # job instead of re-running the distinct+groupBy per join — the same
    # eager-barrier contract the literal form already has (its collect runs
    # at plan-construction time), and it truncates lineage (round-12 rule).
    if words is not None:
        pass  # prebuilt artifact frame (load_bloom_words) — used as-is
    elif bitmap is not None:
        spark = fact.sparkSession
        words = spark.createDataFrame(
            [(w, b) for w, b in enumerate(bitmap) if b != 0],
            "__w int, __bits long",
        )
    else:
        words = build_bloom_words(build, build_key, num_bits, num_hashes)
        words = words.localCheckpoint(eager=True)
    pos_probe = _bloom_positions(fact_key, num_bits, num_hashes)
    # seed literal must stay INT to hash identically to the build side
    # (xxhash64 is input-type-sensitive; {i}L would be a BIGINT seed)
    bits_probe = [
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(xxhash64({i}, {fact_key}), {num_bits}) % 64 AS INT))"
        )
        for i in range(num_hashes)
    ]
    out = fact
    probe = F.lit(True)
    for i, (pos, bit) in enumerate(zip(pos_probe, bits_probe)):
        w_i = words.select(
            F.col("__w").alias(f"__bw{i}"), F.col("__bits").alias(f"__bits{i}")
        )
        out = out.join(
            F.broadcast(w_i),
            (pos / 64).cast("int") == F.col(f"__bw{i}"),
            "left",
        )
        probe = probe & (
            F.coalesce(F.col(f"__bits{i}"), F.lit(0)).bitwiseAND(bit) != 0
        )
    out = out.withColumn("__bloom_hit", probe).drop(
        *[c for i in range(num_hashes) for c in (f"__bw{i}", f"__bits{i}")]
    )
    return out, F.col("__bloom_hit")


def build_bloom_bitmap(
    build: DataFrame,
    build_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> list[int]:
    """Build the int64-word Bloom bitmap of ``build``'s key set — the
    persistable half of :func:`bloom_semi_join` (save/load through
    ``index_store.save_bloom_bitmap`` to amortize the build job across
    queries and micro-batches). One distinct-positions aggregation
    (:func:`build_bloom_words` — SQL shiftleft takes a column shift
    amount, hence its F.expr bit masks); the collect is bounded at
    ``num_bits/64`` words by construction — for bitmaps too large to
    densify, stay on the words FRAME via ``bloom_semi_join(mode="join")``
    instead."""
    n_words = num_bits // 64
    words = build_bloom_words(build, build_key, num_bits, num_hashes).collect()
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["__w"]] = r["__bits"]
    return bitmap
