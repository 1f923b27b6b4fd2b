"""Training-data curation operators beyond dedup (X-surface): deterministic
train/val/test splitting, benchmark decontamination, and token-budget data
mixing — the three pipeline stages between "filtered+deduped corpus" and
"training shards".

Everything here is deterministic and engine-portable by construction: the
only source of randomness is :func:`portable_hash` (md5-prefix → bigint),
which any SQL engine reproduces bit-for-bit — so split assignments and
mixing decisions are stable across reruns, engines, and cluster sizes
(no seed-per-partition drift like ``rand()``).

Scale notes (100 TB):

- ``hash_split`` is a pure column expression — scan-speed, no shuffle.
- ``decontaminate`` is an inverted-index join on shingles: cost is
  Σ df(shingle), never |train|×|eval|. The eval side is distinct-reduced
  first and is typically tiny (benchmarks, not corpora) — broadcast.
- ``token_budget_mix`` windows per source. Source cardinality is usually
  small (tens-hundreds) ⇒ per-source partitions can be huge;
  ``prefilter=True`` bounds the exact window to a budget-sized candidate
  slice via a verified hash-threshold filter (:func:`_prefilter_candidates`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles


def portable_hash(col: str | F.Column, seed: str = "") -> F.Column:
    """Deterministic uniform hash in [0, 2^32): the first 8 hex digits of
    md5(value || '#' || seed) parsed as an integer. md5 — not xxhash64 —
    because every engine (DuckDB, Trino, Postgres) computes the identical
    digest, making downstream split/sample decisions reproducible outside
    Spark. Collision-adjacent bits of md5 are uniform; 2^32 buckets is
    plenty for percentage splits."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit("#" + seed))), 1, 8), 16, 10
    ).cast("bigint")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = hash(id) % 10000,
    cumulative weight thresholds carve the bucket space. A document's split
    depends only on (id, seed) — stable under re-runs, repartitioning, and
    incremental data arrival (new docs never move old ones, unlike
    ``randomSplit`` which reshuffles everything on every change)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {sum(weights.values())}")
    bucket = portable_hash(id_col, seed) % 10000
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * 10000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


#: Eval-anchor broadcast budget (bytes) for the span-decontamination pair.
#: One anchor row is ~96 bytes in the broadcast hash relation (32-char md5
#: hex + UTF8String overhead + bigint pos + id); 128 MiB ≈ 1.4M anchors ≈
#: a 1.4M-token eval suite — an order of magnitude past every published
#: decontamination benchmark set, while refusing the multi-GB broadcast an
#: adversarially large "eval" corpus would build (VERDICT r09 gap #1).
_EVAL_BROADCAST_BUDGET_BYTES = 128 * 1024 * 1024
_EVAL_ANCHOR_ROW_BYTES = 96


def _eval_anchor_matches(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int,
    broadcast_eval: bool | None,
    hash_mode: str = "md5",
    bloom_prefilter: bool = False,
    train_anchors: DataFrame | None = None,
) -> DataFrame:
    """Shared train⋈eval anchor-match builder behind
    :func:`decontaminate_spans` / :func:`excise_spans` — returns
    (doc_a=train id, doc_b=eval id, pos_a, pos_b) rows for every shared
    ``min_tokens``-window fingerprint. ``train_anchors=`` accepts a
    prebuilt train-side :func:`~..dedup.substring_anchor_index` frame
    (round 18 — width/mode-checked; a pipeline that already built the
    same-width anchor table for span coverage reuses it instead of
    re-hashing the corpus).

    Broadcast guard (VERDICT r09 #1): ``broadcast_eval=None`` (the
    default) SIZES the eval side before choosing the plan — one cheap
    aggregate over the eval text column estimates the anchor count
    (Σ max(0, tokens − W + 1), exact by construction), and the eval
    anchors broadcast only when the estimate fits
    ``_EVAL_BROADCAST_BUDGET_BYTES``; above it the join falls back to a
    plain shuffled equi-join on the fingerprint — identical output,
    different physical plan, no multi-GB build side. ``True``/``False``
    force either plan (True is the pre-r10 behavior; False lets AQE pick
    for unusual shapes).

    ``bloom_prefilter=True`` (round 13 — the span-granularity sibling of
    :func:`decontaminate_bloom`'s prefilter): the train anchor side is
    cut SCAN-SIDE to probable fingerprint matches
    (``relational.bloom_prefilter``, word-table join probe, auto-sized
    ~10 bits per eval anchor) before the equi-join, whose exact match
    then rescues Bloom false positives — output identical, but the
    shuffled-fallback exchange carries ~matching anchors instead of the
    corpus's FULL anchor stream (~n tokens × 44 bytes at 100 TB). With
    the broadcast plan the join is already exchange-free on the train
    side, so the prefilter merely cuts probe work; its regime is the
    same as the shingle form's (see SCALE.md crossover): an eval union
    past the broadcast budget over a mostly-clean corpus."""
    from .dedup import _check_anchor_width, substring_anchor_index
    from .relational import bloom_prefilter as _rel_bloom_prefilter

    if train_anchors is None:
        train = substring_anchor_index(
            df, id_col, text_col, min_tokens, hash_mode
        )
    else:
        _check_anchor_width(train_anchors, min_tokens, hash_mode)
        train = train_anchors
    ev = substring_anchor_index(eval_df, id_col, text_col, min_tokens, hash_mode)
    n_anchors = None
    if broadcast_eval is None or bloom_prefilter:
        toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        n_anchors = eval_df.select(
            F.coalesce(
                F.sum(
                    F.greatest(
                        F.size(toks) - F.lit(min_tokens - 1), F.lit(0)
                    ).cast("bigint")
                ),
                F.lit(0),
            )
        ).first()[0]
    if broadcast_eval is None:
        broadcast_eval = (
            n_anchors * _EVAL_ANCHOR_ROW_BYTES <= _EVAL_BROADCAST_BUDGET_BYTES
        )
    if bloom_prefilter:
        train = _rel_bloom_prefilter(
            train,
            ev.select("__fp"),
            "__fp",
            "__fp",
            num_bits=_bloom_auto_bits(n_anchors),
            mode="join",
        )
    ev_side = F.broadcast(ev.alias("e")) if broadcast_eval else ev.alias("e")
    return train.alias("t").join(
        ev_side, F.col("t.__fp") == F.col("e.__fp")
    ).select(
        F.col("t.__id").alias("doc_a"),
        F.col("e.__id").alias("doc_b"),
        F.col("t.__pos").alias("pos_a"),
        F.col("e.__pos").alias("pos_b"),
    )


def decontaminate_spans(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 13,
    threshold_tokens: int = 0,
    broadcast_eval: bool | None = None,
    hash_mode: str = "md5",
    bloom_prefilter: bool = False,
) -> DataFrame:
    """Substring-level benchmark decontamination — the exact-span
    strengthening of :func:`decontaminate`: for each training document,
    the MAXIMAL verbatim token spans (≥ ``min_tokens``) it shares with
    the eval corpus, reduced to the per-doc signal set a pipeline acts
    on. Where the shingle-fraction form answers "how much n-gram
    vocabulary overlaps", this answers "which exact passages leaked, how
    long, and how much of the document they cover" — the
    excise-don't-drop decision needs the positions (Lee et al. 2022);
    the default 13-token width is the GPT-3/PaLM decontamination
    convention.

    Returns one row per TRAINING doc (zero-contamination docs included):
    (id, n_tokens, n_spans, max_span_tokens, contaminated_tokens,
    contamination, contaminated) — ``contaminated_tokens`` is the
    double-counting-proof interval union of the train-side spans
    (``dedup.union_interval_lengths``), ``contaminated`` is
    ``contaminated_tokens > threshold_tokens``.

    Scale shape: both sides reduce to narrow anchor tables
    (``dedup.substring_anchor_index``); the only join keys on the
    fingerprint, and the eval side broadcasts only while it is provably
    benchmark-sized — ``broadcast_eval=None`` sizes it first and falls
    back to a plain shuffled join above the budget (see
    :func:`_eval_anchor_matches`); run merge + interval union are
    span-table-sized. All integer arithmetic ⇒ full SQL oracle."""
    from .dedup import _merge_anchor_runs, union_interval_lengths

    matches = _eval_anchor_matches(
        df, eval_df, id_col, text_col, min_tokens, broadcast_eval, hash_mode,
        bloom_prefilter,
    )
    spans = _merge_anchor_runs(matches, min_tokens)
    per_doc = spans.groupBy(F.col("doc_a").alias("__id")).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("span_tokens").alias("max_span_tokens"),
    )
    covered = union_interval_lengths(
        spans.select(
            F.col("doc_a").alias("__id"),
            F.col("start_a").alias("__s"),
            (F.col("start_a") + F.col("span_tokens") - 1).alias("__e"),
        ).distinct()
    )
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(
        F.col(id_col), F.size(toks).cast("bigint").alias("n_tokens")
    )
    return (
        base.join(per_doc.withColumnRenamed("__id", id_col), id_col, "left")
        .join(covered.withColumnRenamed("__id", id_col), id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("max_span_tokens", F.lit(0))
            .cast("bigint")
            .alias("max_span_tokens"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("bigint")
            .alias("contaminated_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 4
            ).alias("contamination"),
            (
                F.coalesce("dup_tokens", F.lit(0)) > threshold_tokens
            ).alias("contaminated"),
        )
    )


def excise_spans(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 13,
    broadcast_eval: bool | None = None,
    hash_mode: str = "md5",
    bloom_prefilter: bool = False,
    train_anchors: DataFrame | None = None,
) -> DataFrame:
    """The ACTION step after :func:`decontaminate_spans`: rebuild each
    training document with every token inside a shared ≥``min_tokens``
    verbatim span REMOVED (surgical excision keeps the clean majority of
    a lightly-contaminated doc instead of dropping it — the Lee et al.
    2022 recommendation). Returns one row per training doc:
    (id, n_tokens, kept_tokens, cleaned_text) — untouched docs pass
    through verbatim (cleaned_text == normalized original), fully
    contaminated docs emit cleaned_text=''.

    Exactness: the span table's train-side intervals explode to a
    DISTINCT (doc, pos) covered set (total size = Σ span lengths, ≪
    corpus positions); tokens anti-join it and reassemble in position
    order — all integer/string ops on the same lowercased
    whitespace-normalized tokenization the span detector uses, so the
    cleaned text replays verbatim in SQL (the gated oracle pins its
    md5). Scale shape: one token explode (the same move every text
    operator pays), a fingerprint join for spans, a (doc, pos)-keyed
    anti-join, one per-doc ordered re-aggregation — every key
    doc-grained and skew-free. The eval anchors broadcast only under the
    sized budget (``broadcast_eval=None`` — see
    :func:`_eval_anchor_matches`); above it the fingerprint join
    shuffles both sides, identical output. ``train_anchors=`` reuses a
    prebuilt same-width train-side anchor index (round 18 — see
    :func:`_eval_anchor_matches`)."""
    from .dedup import _merge_anchor_runs

    matches = _eval_anchor_matches(
        df, eval_df, id_col, text_col, min_tokens, broadcast_eval, hash_mode,
        bloom_prefilter, train_anchors=train_anchors,
    )
    spans = _merge_anchor_runs(matches, min_tokens)
    covered = (
        spans.select(
            F.col("doc_a").alias("__id"),
            F.explode(
                F.sequence(
                    F.col("start_a"),
                    F.col("start_a") + F.col("span_tokens") - 1,
                )
            ).alias("__pos"),
        )
        .distinct()
        .withColumn("__cut", F.lit(1))
    )
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok = df.select(
        F.col(id_col), F.posexplode(toks).alias("__p0", "__w")
    ).select(id_col, (F.col("__p0") + 1).alias("__pos"), "__w")
    kept = tok.join(
        covered.withColumnRenamed("__id", id_col), [id_col, "__pos"], "left"
    ).filter(F.col("__cut").isNull())
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__w")))
                ),
                lambda s: s.getField("__w"),
            ),
            " ",
        ).alias("cleaned_text"),
    )
    base = df.select(
        F.col(id_col), F.size(toks).cast("bigint").alias("n_tokens")
    )
    return base.join(
        rebuilt, id_col, "left"
    ).select(
        id_col,
        "n_tokens",
        F.coalesce("kept_tokens", F.lit(0)).cast("bigint").alias("kept_tokens"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


#: Per-shingle row estimate for :func:`decontaminate`'s broadcast guard:
#: an n-word shingle string (~8 bytes/word UTF8) + broadcast hash-relation
#: overhead. Shares ``_EVAL_BROADCAST_BUDGET_BYTES`` with the span pair.
def _eval_shingle_row_bytes(n: int) -> int:
    return 64 + 8 * n


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.1,
    broadcast_eval: bool | None = None,
) -> DataFrame:
    """Benchmark decontamination: for each training document, the fraction
    of its distinct word ``n``-gram shingles that appear anywhere in the
    eval corpus — the standard contamination signal (eval text leaked into
    pretraining data shows up as long-shingle overlap).

    Returns (id, n_shingles, n_hits, contamination, contaminated).

    Scale shape: explode distinct shingles per doc; the eval side reduces
    to a DISTINCT shingle set first; a left join + per-doc count gives the
    overlap — Σ df(shingle) work, no pairwise comparison, no text in the
    join key (the shingle string is the key; swap in a shingle HASH for
    100 TB to keep keys 8 bytes).

    Broadcast guard (VERDICT r10 #6, the same sizing rule as
    :func:`_eval_anchor_matches`): ``broadcast_eval=None`` estimates the
    eval shingle count with one cheap aggregate (Σ max(1, tokens−n+1) —
    an upper bound on the DISTINCT set; the floor is 1, not 0, because
    :func:`~..dedup.shingles` emits one whole-text shingle for a doc
    shorter than ``n`` tokens, so a sub-``n``-token-dominated eval set
    must still count one row each — ADVICE r11) and broadcasts only
    while it fits ``_EVAL_BROADCAST_BUDGET_BYTES``; above it the probe
    falls back to a shuffled equi-join — identical output, no unbounded
    build side. ``True``/``False`` force either plan. Prefer
    :func:`decontaminate_spans` (exact-span granularity) for new
    pipelines; this doc-level form remains for the shingle-fraction
    signal."""
    doc_sh = df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("__g")
    )
    eval_sh = (
        eval_df.select(F.explode(shingles(text_col, n)).alias("__g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_eval is None:
        toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        n_shingles = eval_df.select(
            F.coalesce(
                F.sum(
                    F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)).cast(
                        "bigint"
                    )
                ),
                F.lit(0),
            )
        ).first()[0]
        broadcast_eval = (
            n_shingles * _eval_shingle_row_bytes(n)
            <= _EVAL_BROADCAST_BUDGET_BYTES
        )
    ev_side = F.broadcast(eval_sh) if broadcast_eval else eval_sh
    joined = doc_sh.join(ev_side, "__g", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_hits"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_hits") / F.col("n_shingles").cast("double"), 4),
        )
        .withColumn("contaminated", F.col("contamination") > threshold)
    )


def decontaminate_multi(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    suite_col: str,
    n: int = 5,
    threshold: float = 0.1,
    broadcast_eval: bool | None = None,
) -> DataFrame:
    """Multi-suite benchmark decontamination — ALL eval suites checked in
    ONE corpus pass (round 13): real pipelines screen against dozens of
    benchmarks, and running :func:`decontaminate` per suite re-scans and
    re-explodes the 100 TB corpus k times. Here the eval shingle set
    keeps its ``suite_col`` tag, the corpus explodes ONCE, and a single
    inverted-index join yields per-(document, suite) contamination.

    Returns (id, suite, n_shingles, n_hits, contamination, contaminated)
    for pairs with ≥1 hit ONLY — unlike the row-preserving single-suite
    form, a k-suite row-preserving output would be |corpus|×k mostly-zero
    rows; absent pairs mean zero hits by contract (consumers needing the
    dense form cross-join suites and left-join this).

    Per-suite hit counts are bit-identical to running
    :func:`decontaminate` against that suite alone (same shingle
    semantics, same join — pytest-pinned): the fan-out join emits one row
    per (doc shingle, suite that contains it), so no double count and no
    cross-suite interference. Per-doc totals come from a SEPARATE
    ``size(shingles(text))`` scan joined on the id (the
    :func:`decontaminate_bloom` pattern) — NOT a rider column next to
    the explode: ``select(size(arr), explode(arr))`` re-evaluates the
    whole shingle-array build per EXPLODED row (measured 50 s vs 2.8 s
    on 5k docs at sf0.1 — the same lambda-inlining hazard
    ``text.raw_shingles`` documents), and the round-9 hollow-count
    guard is what surfaced it here.

    Scale shape: Σ_suites df(shingle) work — identical total to k
    single-suite runs' JOIN cost, but ONE corpus scan/explode/exchange
    instead of k. The eval side reduces to DISTINCT (suite, shingle)
    first and broadcasts under the same Σ-token budget estimate as
    :func:`decontaminate` (suite tags add a few bytes per row — inside
    the estimate's distinct-upper-bound slack); above budget it falls
    back to the shuffled equi-join, identical output."""
    doc_sh = df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("__g")
    )
    eval_sh = eval_df.select(
        F.col(suite_col).alias("suite"), F.explode(shingles(text_col, n)).alias("__g")
    ).distinct()
    if broadcast_eval is None:
        toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        n_ev = eval_df.select(
            F.coalesce(
                F.sum(
                    F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)).cast(
                        "bigint"
                    )
                ),
                F.lit(0),
            )
        ).first()[0]
        broadcast_eval = (
            n_ev * _eval_shingle_row_bytes(n) <= _EVAL_BROADCAST_BUDGET_BYTES
        )
    ev_side = F.broadcast(eval_sh) if broadcast_eval else eval_sh
    pairs = (
        doc_sh.join(ev_side, "__g")
        .groupBy(id_col, "suite")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    totals = df.select(
        F.col(id_col),
        F.size(shingles(text_col, n)).cast("long").alias("n_shingles"),
    )
    # inner join: hit-pairs-only contract; the pairs side is the small
    # one (contaminated doc-suite pairs) — AQE broadcasts it at runtime,
    # so the totals scan never shuffles on a clean corpus
    return (
        totals.join(pairs, id_col)
        .select(id_col, "suite", "n_shingles", "n_hits")
        .withColumn(
            "contamination",
            F.round(F.col("n_hits") / F.col("n_shingles").cast("double"), 4),
        )
        .withColumn("contaminated", F.col("contamination") > threshold)
    )


#: Auto-sizing bounds for the Bloom decontamination bitmap: ~10 bits per
#: eval shingle (<1% fp at 3 hashes), rounded up to a power of two, never
#: below 2¹⁴ bits (256 words).  No upper cap: the default broadcast
#: word-table JOIN probe's cost is num_bits-independent (measured flat,
#: SCALE.md § "Bloom-vs-exact crossover").
_BLOOM_BITS_PER_KEY = 10
_BLOOM_MIN_BITS = 1 << 14


def _bloom_auto_bits(n_eval_shingles: int) -> int:
    """num_bits for a given eval-shingle cardinality estimate: next power
    of two ≥ ``_BLOOM_BITS_PER_KEY ×`` the estimate, floored at
    ``_BLOOM_MIN_BITS``.  Pure so tests pin the rule without Spark."""
    target = _BLOOM_BITS_PER_KEY * max(int(n_eval_shingles), 1)
    return max(_BLOOM_MIN_BITS, 1 << (target - 1).bit_length())


def decontaminate_bloom(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.1,
    num_bits: int | None = None,
    num_hashes: int = 3,
    bitmap: list[int] | None = None,
    mode: str | None = None,
) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination (round 12) — the
    100 TB scale path for :func:`decontaminate`, output BIT-IDENTICAL
    by construction: the eval corpus's distinct shingle set compresses
    to a fixed-size Bloom bitmap (``num_bits/64`` int64 words — 16 KiB
    at the auto-sized sf0.1 2¹⁷ bits, vs the up-to-128 MiB exact-anchor
    broadcast the sized guard allows), every training shingle probes
    the bitmap SCAN-SIDE (whole-stage-codegen'd xxhash64 + bit tests —
    ``relational.bloom_semi_join``), and only probable hits reach the
    exact verify join that removes Bloom false positives. False
    negatives are impossible, so hit counts — and therefore every
    output row — equal the exact operator's; the registry entry shares
    :func:`decontaminate`'s DuckDB oracle VERBATIM.

    Why this beats both exact plans at scale: the broadcast plan is
    budget-capped (an oversized eval suite forces the shuffled
    fallback) and the shuffled plan moves EVERY training shingle
    (Σ tokens of the corpus) through the exchange; here the exchange
    carries only ~(true hits × (1 + fp_rate)) rows — on a clean corpus
    essentially nothing — while the bitmap is a reusable
    index-artifact (persist via ``index_store.save_bloom_bitmap``, pass
    as ``bitmap``; size ``num_bits`` ≥ ~10× the eval shingle
    cardinality for <1% fp with 3 hashes, and an over-full bitmap only
    costs prefilter selectivity, never correctness).

    Per-doc shingle totals come from the scan expression
    ``size(shingles(text))`` (the array is already distinct) instead of
    a count over exploded rows — same number, no second aggregate.

    Sizing (round 13 — auto by default): ``num_bits=None`` derives the
    size from the SAME one-aggregate eval-shingle estimate
    :func:`decontaminate` uses for its broadcast guard
    (Σ max(1, tokens−n+1), an upper bound on the distinct set — zero new
    jobs beyond the bitmap build that scans the eval side anyway):
    ~10 bits per shingle rounded up to a power of two, floor 2¹⁴
    (:func:`_bloom_auto_bits`).  The probe defaults to the broadcast
    (word_idx, word) JOIN form (round 13): the measured sf0.1 curve has
    it FLAT ~1.6-1.8 s warm from 2¹⁷ through 2²³ bits while the
    ARRAY-LITERAL probe grows with word count and never wins (2.0 s at
    2¹⁵ → 3.5-4.1 s at 2¹⁸ → the 14-16 s r12 cliff at 2²⁰ — the r12
    DEFAULT, VERDICT r12 What's-wrong #1), so auto-sizing is free:
    plan size is num_bits-independent and the broadcast carries only
    occupied words.  ``mode="literal"`` forces the scan-only probe
    (what the streaming face uses as a pure expression); see
    ``SCALE.md`` § "Bloom-vs-exact crossover" for when the prefilter
    beats the exact shuffled plan at all."""
    from .relational import bloom_semi_join

    if num_bits is None:
        if bitmap is not None:
            num_bits = 64 * len(bitmap)
        else:
            toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            est = eval_df.select(
                F.coalesce(
                    F.sum(
                        F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)).cast(
                            "bigint"
                        )
                    ),
                    F.lit(0),
                )
            ).first()[0]
            num_bits = _bloom_auto_bits(est)
    doc_sh = df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("__g")
    )
    eval_sh = eval_df.select(
        F.explode(shingles(text_col, n)).alias("__g")
    ).distinct()
    hits = (
        bloom_semi_join(
            doc_sh, eval_sh, "__g", "__g", num_bits, num_hashes, bitmap, mode
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        df.select(
            F.col(id_col),
            F.size(shingles(text_col, n)).cast("long").alias("n_shingles"),
        )
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_shingles"),
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_hits") / F.col("n_shingles").cast("double"), 4),
        )
        .withColumn("contaminated", F.col("contamination") > threshold)
    )


#: Java-regex-only constructs DuckDB's RE2 rejects (or silently treats
#: differently) — the PII_PATTERNS rule as code (ADVICE r13): lookarounds,
#: atomic groups, backreferences, possessive quantifiers. A conservative
#: SUBSTRING heuristic, not a parser: an escaped literal like ``\(\?=``
#: can false-positive, which errs on the safe (portable) side.
_NONPORTABLE_RE_CONSTRUCTS = (
    ("(?=", "lookahead"),
    ("(?!", "negative lookahead"),
    ("(?<", "lookbehind"),          # also catches (?<= and (?<!
    ("(?>", "atomic group"),
    ("*+", "possessive quantifier"),
    ("++", "possessive quantifier"),
    ("?+", "possessive quantifier"),
    ("}+", "possessive quantifier"),
)

import re as _re

_BACKREF_RE = _re.compile(r"(?<!\\)(?:\\\\)*\\(?:[1-9]|k<)")


def validate_portable_regex(pattern: str) -> None:
    """Raise ``ValueError`` if ``pattern`` uses a Java-only regex
    construct that RE2 engines (DuckDB, the oracle) reject — making the
    canary-scan portability contract a driver-side guard instead of a
    docstring convention (ADVICE r13). Named groups ``(?<name>…`` are
    exempted from the lookbehind check (both dialects share them)."""
    for needle, label in _NONPORTABLE_RE_CONSTRUCTS:
        at = pattern.find(needle)
        while at != -1:
            if needle == "(?<" and _re.match(
                r"\(\?<[A-Za-z]", pattern[at:]
            ):
                at = pattern.find(needle, at + 1)
                continue
            raise ValueError(
                f"non-portable regex (Java-only {label}) in canary "
                f"pattern {pattern!r} — oracle engines run RE2, which "
                "has no lookaround/backreference/possessive support; "
                "rewrite lookaround-free (the PII_PATTERNS rule)"
            )
    if _BACKREF_RE.search(pattern):
        raise ValueError(
            f"non-portable regex (backreference) in canary pattern "
            f"{pattern!r} — RE2 engines (the DuckDB oracle) have no "
            "backreferences; rewrite without them"
        )


def canary_scan(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: DataFrame,
    pat_id_col: str = "pat_id",
    pattern_col: str = "pattern",
    regex: bool = False,
    validate: bool = True,
) -> DataFrame:
    """Exact multi-pattern substring scan — the canary / secret / leaked
    eval-answer detector: for every (document, pattern) pair where the
    pattern occurs VERBATIM anywhere in the text (no token alignment —
    unlike the shingle-based :func:`decontaminate`, a match does not have
    to sit on word boundaries), emit the occurrence count. The standard
    sweep a training pipeline runs for planted canary strings, API-key
    shapes rendered as literals, and benchmark answer strings.

    ``patterns`` is a DataFrame ``(pat_id, pattern)`` — canary sets are
    small by nature (10²-10⁴ strings), so the operator broadcast-hints it
    into a nested-loop join whose predicate is a codegen'd ``contains``:
    one scan over the corpus, zero shuffle of corpus rows, output ~hits.
    Occurrence counts are exact-integer arithmetic
    (``(len - len(replace(text, p))) / len(p)`` — non-overlapping,
    left-to-right, the semantics every engine shares), so the result is
    engine-bit-identical and DuckDB-oracle-able. Empty patterns are
    dropped (a zero-length needle matches everywhere and divides by
    zero). For pattern sets too large for |patterns|-per-row contains,
    this is the wrong operator — :func:`canary_scan_automaton` scans
    every pattern in one pass (10⁴-10⁵ literals), and beyond that
    :func:`decontaminate` / :func:`decontaminate_bloom`'s
    inverted-index shingle path never materializes the cross product.

    ``regex=True`` (round 13) switches the patterns to REGULAR
    EXPRESSIONS — the secret-shape sweep (API-key prefixes, token
    formats, dotted-quad scans): the predicate becomes
    ``regexp_count(text, pattern) > 0`` and ``n_occurrences`` the exact
    non-overlapping match count. Patterns must stay in the
    RE2-compatible, lookaround-free dialect (the ``PII_PATTERNS`` rule
    — ``\\b``, non-capturing groups, and bounded repeats are all shared;
    Java-only lookarounds/backreferences are not) — ENFORCED
    driver-side by :func:`validate_portable_regex` over the collected
    pattern table (bounded by the same small-canary-set contract that
    makes the broadcast legal; ``validate=False`` opts out for
    Spark-only sweeps). The pattern rides as a JOIN column, so Spark
    compiles it per evaluation — irrelevant at canary-set sizes (the
    measured crossover vs the compile-once literal form is in SCALE.md
    "Round 14: the canary regex compile"), and the scan cost is
    |patterns| × corpus in either mode. For large pattern sets prefer
    :func:`canary_scan_literal` (compile-once, join-free) up to its
    plan-width ceiling, :func:`canary_scan_automaton` beyond it (exact
    literals, |patterns|-independent scan), or the inverted-index
    shingle path past the automaton's worker-memory cap."""
    pats = patterns.select(
        F.col(pat_id_col).alias("pat_id"),
        F.col(pattern_col).alias("pattern"),
    ).filter(F.length("pattern") > 0)
    if regex and validate:
        for row in pats.select("pattern").distinct().collect():
            validate_portable_regex(row["pattern"])
    c = F.col(text_col)
    p = F.col("pattern")
    if regex:
        n_occ = F.regexp_count(c, p).cast("long")
        cond = F.regexp_count(c, p) > 0
    else:
        cond = F.contains(c, p)
        n_occ = (
            (F.length(c) - F.length(F.replace(c, p))) / F.length(p)
        ).cast("long")
    return (
        df.join(F.broadcast(pats), cond)
        .select(
            F.col(id_col),
            F.col("pat_id"),
            p,
            n_occ.alias("n_occurrences"),
        )
    )


#: canary_scan_literal refuses pattern sets wider than this: each pattern
#: becomes one struct in a per-row array literal, so plan width (and
#: codegen'd method size) grows linearly with the set — past ~10³ use
#: canary_scan_automaton (exact literals, plan width constant) or the
#: join form for regexes. The measured crossover is in SCALE.md
#: "Round 14: the large-pattern-set canary path".
_CANARY_LITERAL_MAX_PATTERNS = 1024


def canary_scan_literal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: DataFrame,
    pat_id_col: str = "pat_id",
    pattern_col: str = "pattern",
    regex: bool = False,
    validate: bool = True,
) -> DataFrame:
    """:func:`canary_scan`'s compile-once twin (round 14 — the r13
    VERDICT wart closed as code): the pattern table is collected
    driver-side (legal under the same small-set contract that lets the
    join form broadcast it) and each pattern becomes a LITERAL column —
    ``regexp_count(text, lit(p))`` / exact replace-arithmetic — stacked
    into an array of ``(pat_id, pattern, n_occurrences)`` structs,
    exploded, and filtered to hits. Bit-identical output to the join
    form (pytest-pinned and oracle-shared VERBATIM by
    ``curation_canary_scan_regex_literal``).

    Why it exists: in the join form the pattern rides as a join COLUMN,
    so Spark's regex expressions can't cache the compiled ``Pattern``
    and recompile per (row × pattern) evaluation. As a foldable literal
    each regex compiles ONCE per task. The trade: every pattern is a
    plan node, so the plan (and generated code) widens linearly —
    ``_CANARY_LITERAL_MAX_PATTERNS`` caps it, and the operator raises
    past the cap rather than degrade. Same scan shape otherwise: ONE
    corpus pass, zero join, zero shuffle, output ~hits."""
    pats = [
        (r["pat_id"], r["pattern"])
        for r in patterns.select(
            F.col(pat_id_col).alias("pat_id"),
            F.col(pattern_col).alias("pattern"),
        )
        .filter(F.length("pattern") > 0)
        .limit(_CANARY_LITERAL_MAX_PATTERNS + 1)
        .collect()
    ]
    if len(pats) > _CANARY_LITERAL_MAX_PATTERNS:
        raise ValueError(
            f"canary_scan_literal caps at {_CANARY_LITERAL_MAX_PATTERNS} "
            "patterns (plan width grows per pattern) — use canary_scan "
            "(join form) or the inverted-index shingle path"
        )
    if not pats:  # empty set: the join form's (empty) schema, zero rows
        return canary_scan(
            df.limit(0), id_col, text_col, patterns,
            pat_id_col, pattern_col, regex, validate=False,
        )
    if regex and validate:
        for _pid, p in pats:
            validate_portable_regex(p)
    pat_id_type = patterns.schema[pat_id_col].dataType
    c = F.col(text_col)

    def n_occ(p: str) -> F.Column:
        if regex:
            return F.regexp_count(c, F.lit(p)).cast("long")
        return (
            (F.length(c) - F.length(F.replace(c, F.lit(p))))
            / F.length(F.lit(p))
        ).cast("long")

    hits = F.array(
        *[
            F.struct(
                F.lit(pid).cast(pat_id_type).alias("pat_id"),
                F.lit(p).alias("pattern"),
                n_occ(p).alias("n_occurrences"),
            )
            for pid, p in pats
        ]
    )
    return (
        df.select(F.col(id_col), F.explode(hits).alias("__h"))
        .filter(F.col("__h.n_occurrences") > 0)
        .select(
            F.col(id_col),
            F.col("__h.pat_id").alias("pat_id"),
            F.col("__h.pattern").alias("pattern"),
            F.col("__h.n_occurrences").alias("n_occurrences"),
        )
    )


#: canary_scan_automaton refuses pattern sets whose TOTAL character count
#: exceeds this. MEASURED at the cap (102k word-ish patterns, 4.19M
#: chars, SCALE.md "Round 14: the large-pattern-set canary path"): 3.45M
#: trie nodes ≈ 1.0 GB per Python worker (~300 B/dict-node), built in
#: ~38 s ONCE per worker (cached across tasks via worker reuse — an
#: executor-lifetime cost, like JVM codegen), scanning ~1M chars/s/worker
#: thereafter. MEMORY BUDGET WITH THE SLOT CACHE (review r15): the
#: 4-slot `_AC_CACHE` below pins up to min(k, _AC_CACHE_SLOTS) tries per
#: worker when k distinct pattern sets interleave — worst case ~4 GB at
#: 4 cap-sized sets, NOT the single-slot ~1 GB the pre-r15 cache
#: guaranteed. Deployments slicing a huge set into ≤cap chunks and
#: unioning k automaton passes (still k× cheaper than the join form's
#: |patterns|-per-row contains) must size chunks at cap/k for k ≤ 4
#: concurrent slices, shrink `_AC_CACHE_SLOTS`, or move to the shingle
#: inverted-index path (decontaminate / decontaminate_bloom).
_AUTOMATON_MAX_TOTAL_CHARS = 1 << 22

#: Per-worker automaton cache keyed by pattern-set content: Spark reuses
#: Python workers across tasks (spark.python.worker.reuse), so each
#: worker builds the trie ONCE per pattern set, not once per task.
#: BOUNDED at ``_AC_CACHE_SLOTS`` live sets per worker, FIFO-evicted
#: (ADVICE r14: the old single-slot clear-then-insert meant two automaton
#: scans with different pattern sets interleaving tasks on one reused
#: worker — two scans unioned in a query, concurrent batch+stream jobs —
#: rebuilt the trie EVERY task, up to ~38 s/task at the cap, silently
#: destroying the once-per-worker amortization the cap comment is
#: premised on). 4 slots × ≤1 GB worst-case cap-sized tries still bounds
#: worker memory; typical canary sets are orders of magnitude smaller.
_AC_CACHE_SLOTS = 4
_AC_CACHE: dict[int, tuple] = {}


def _ac_cache_get_or_build(cache_key: int, builder):
    """Bounded-FIFO worker cache lookup for the Aho-Corasick trie:
    return the cached value for ``cache_key`` or build-and-insert it,
    evicting oldest-inserted entries past ``_AC_CACHE_SLOTS``. Factored
    out of the mapInPandas closure so the ADVICE-r14 contract — k ≤
    slots distinct pattern sets interleaving on one worker build each
    trie exactly ONCE — is unit-testable without Spark."""
    cached = _AC_CACHE.get(cache_key)
    if cached is None:
        cached = builder()
        while len(_AC_CACHE) >= _AC_CACHE_SLOTS:  # bounded FIFO evict
            _AC_CACHE.pop(next(iter(_AC_CACHE)))
        _AC_CACHE[cache_key] = cached
    return cached


def _build_aho_corasick(patterns: list[str]):
    """Build a (goto, fail, out) Aho-Corasick automaton over ``patterns``
    (classic construction: trie + BFS failure links, output links
    flattened into ``out`` so a scan reports every pattern ending at a
    node, including proper-suffix patterns). Pure stdlib — dict-per-node
    goto, list fail/out — sized for canary sets (10^4-10^5 strings), not
    genomes."""
    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for idx, p in enumerate(patterns):
        node = 0
        for ch in p:
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        out[node].append(idx)
    from collections import deque

    fail = [0] * len(goto)
    q = deque(goto[0].values())
    while q:
        u = q.popleft()
        for ch, v in goto[u].items():
            q.append(v)
            f = fail[u]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[v] = goto[f].get(ch, 0)
            if out[fail[v]]:
                out[v].extend(out[fail[v]])
    return goto, fail, out


def canary_scan_automaton(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: DataFrame,
    pat_id_col: str = "pat_id",
    pattern_col: str = "pattern",
) -> DataFrame:
    """:func:`canary_scan`'s LARGE-pattern-set form (round 14 — the scale
    rung both canary docstrings deferred to): one Aho-Corasick automaton
    over the whole pattern set, scanned once per document in
    O(len(text) + hits) INDEPENDENT of |patterns| — where the join form
    pays |patterns| ``contains`` evaluations per row and the literal form
    caps at ~10^3 plan-width. Exact literals only (an automaton cannot
    ride regexes — ``regex`` sweeps stay on the join/literal forms).

    Semantics are bit-identical to the join form (shared-oracle-pinned):
    a (doc, pattern) row per pattern occurring VERBATIM anywhere in the
    text, ``n_occurrences`` the exact non-overlapping left-to-right count
    (the automaton detects WHICH patterns occur; the count is then
    ``str.count`` per hit — the same greedy semantics as the join form's
    replace-arithmetic, recomputed only on actual hits). Empty patterns
    are dropped; duplicate pattern strings each emit their own pat_id row.

    Plan/scale shape: patterns collect driver-side and ship as ONE
    broadcast of raw strings (automaton built lazily per Python worker,
    cached across tasks via worker reuse); the corpus side is a single
    ``mapInPandas`` pass — one scan, zero joins, zero corpus shuffle,
    output ~hits. The trade vs the join form is Python-side scanning
    (Arrow batches, ~1M chars/s/worker MEASURED at the cap — SCALE.md
    "Round 14: the large-pattern-set canary path"; same number as the
    cap comment above) against JVM codegen'd ``contains`` — the measured
    crossover is in that SCALE.md section. Worker memory is bounded by
    ``_AUTOMATON_MAX_TOTAL_CHARS`` (raises beyond — split the set or use
    the shingle inverted-index path)."""
    import pandas as pd

    pats = [
        (r["pat_id"], r["pattern"])
        for r in patterns.select(
            F.col(pat_id_col).alias("pat_id"),
            F.col(pattern_col).alias("pattern"),
        )
        .filter(F.length("pattern") > 0)
        .collect()
    ]
    total_chars = sum(len(p) for _pid, p in pats)
    if total_chars > _AUTOMATON_MAX_TOTAL_CHARS:
        raise ValueError(
            f"canary_scan_automaton caps at {_AUTOMATON_MAX_TOTAL_CHARS} "
            f"total pattern chars (got {total_chars}) — the pure-Python "
            "trie is worker-resident; split the pattern set into capped "
            "slices or use the shingle inverted-index path"
        )
    id_type = df.schema[id_col].dataType
    pat_id_type = patterns.schema[pat_id_col].dataType
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("pat_id", pat_id_type),
            StructField("pattern", StringType()),
            StructField("n_occurrences", LongType()),
        ]
    )
    if not pats:
        if df.isStreaming:
            raise ValueError(
                "canary_scan_automaton: empty pattern table on a STREAM — "
                "the batch empty-frame return cannot ride a streaming "
                "plan; fix the canary artifact or use the join form "
                "(whose empty join is streamable)"
            )
        return df.sparkSession.createDataFrame([], schema)
    bc = df.sparkSession.sparkContext.broadcast(pats)
    # Cache key travels in the closure (worker-side Broadcast objects
    # expose only .value): content-derived so distinct pattern sets never
    # collide in a reused worker.
    import hashlib

    cache_key = int(
        hashlib.md5(repr(pats).encode()).hexdigest()[:15], 16
    )

    def batches(it):
        def _build():
            plist = bc.value
            return (_build_aho_corasick([p for _pid, p in plist]), plist)

        (goto, fail, out), plist = _ac_cache_get_or_build(cache_key, _build)
        for pdf in it:
            ids, pids, pstrs, counts = [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                node = 0
                hits: set[int] = set()
                for ch in text:
                    nxt = goto[node].get(ch)
                    while nxt is None and node:
                        node = fail[node]
                        nxt = goto[node].get(ch)
                    node = nxt if nxt is not None else 0
                    o = out[node]
                    if o:
                        hits.update(o)
                for idx in hits:
                    pid, p = plist[idx]
                    ids.append(rid)
                    pids.append(pid)
                    pstrs.append(p)
                    counts.append(text.count(p))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "pat_id": pids,
                    "pattern": pstrs,
                    "n_occurrences": pd.Series(counts, dtype="int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema=schema)


#: canary_scan_auto's dispatch threshold: the measured join-vs-automaton
#: crossover sits at a few hundred patterns (SCALE.md "Round 14: the
#: large-pattern-set canary path" — join 0.69 s@52 / 1.73 s@455 vs
#: automaton 0.64 / 1.19 on sf0.1), so below 256 the codegen'd contains
#: join wins on fixed overhead, above it the |patterns|-independent
#: automaton wins and keeps widening (79× at 2×10⁴).
_CANARY_AUTO_THRESHOLD = 256


def canary_scan_auto(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: DataFrame,
    pat_id_col: str = "pat_id",
    pattern_col: str = "pattern",
) -> DataFrame:
    """Form-dispatching exact canary scan (round 14): count the pattern
    table (tiny by the canary contract — one driver-side job) and pick
    the join form below ``_CANARY_AUTO_THRESHOLD`` patterns, the
    Aho-Corasick automaton at or above it. Exists because the 100×
    documents ladder caught the composed cost the fixed-size forms hide:
    `curation_filter_decision_table` embeds a canary stage whose
    fixture-derived pattern set GROWS with the corpus, so the join
    form's |patterns| × |docs| term went quadratic (90.6 s at 100×, ~70 s
    of it the canary stage) while the automaton runs the same stage in
    ~2 s. Production canary sets are release-fixed, but any pipeline
    whose patterns derive from data (mined secrets, eval-answer dumps)
    hits exactly this — the dispatch makes the composed operator safe by
    default. Output is bit-identical either way (shared-oracle-pinned);
    exact literals only.

    The pattern side is collected ONCE (ADVICE r14: the old eager
    ``count()`` + downstream re-read ran the pattern pipeline twice, and
    a non-deterministic pattern source could make the dispatch decision
    diverge from the set actually scanned): both the branch predicate
    and the chosen form consume the same driver-side snapshot, re-lifted
    into a tiny local frame (canary sets are small by contract — the
    automaton form re-collects it for its broadcast at zero extra Spark
    work)."""
    from pyspark.sql.types import StringType, StructField, StructType

    rows = (
        patterns.select(
            F.col(pat_id_col).alias("pat_id"),
            F.col(pattern_col).alias("pattern"),
        )
        .filter(F.length("pattern") > 0)
        .collect()
    )
    snapshot = df.sparkSession.createDataFrame(
        rows,
        StructType(
            [
                StructField("pat_id", patterns.schema[pat_id_col].dataType),
                StructField("pattern", StringType()),
            ]
        ),
    )
    if len(rows) >= _CANARY_AUTO_THRESHOLD:
        return canary_scan_automaton(df, id_col, text_col, snapshot)
    return canary_scan(df, id_col, text_col, snapshot)


#: portable_hash's value space (md5-prefix parsed as 8 hex digits).
_HASH_SPACE = 1 << 32


def _prefilter_candidates(
    work: DataFrame,
    source_col: str,
    budget_tokens: int,
    slack: float,
) -> DataFrame:
    """Hash-threshold prefilter for :func:`token_budget_mix`: bound each
    source's window input to ~``slack × budget/tot`` of its rows with a
    pure priority filter, *provably* without changing the kept set.

    Phase 1: one partial-aggregable scan collects per-source token totals
    (source cardinality is tens-to-hundreds — a tiny driver list). A source
    whose total fits the budget keeps everything (threshold = 2^32); an
    oversized source keeps rows with ``priority < slack·budget/tot·2^32``
    — the kept prefix ends near the budget/tot quantile of the uniform
    hash, so ``slack`` (default 8×) leaves the boundary comfortably inside.

    Phase 2 (the identity guarantee): for every tightened source, the
    surviving token total must EXCEED the budget — then the budget boundary
    falls strictly inside the survivor set, every global row ordered before
    it has priority below the threshold (hence survived), and the greedy
    prefix over survivors is bit-identical to the prefix over all rows. Any
    source failing the check (pathological skew: the slack estimate was
    >8× off) gets its threshold widened ×8 and re-verified — so the fast
    path is probabilistic but the RESULT never is.

    Cost at 100 TB: two narrow aggregate scans + the exact window over a
    budget-sized slice, instead of one reducer per source sorting ~a whole
    source (the unfiltered window's failure mode)."""
    spark = work.sparkSession
    source_field = next(f for f in work.schema.fields if f.name == source_col)
    stats = work.groupBy(source_col).agg(F.sum("n_tokens").alias("__tot")).collect()
    thr = {
        r[source_col]: (
            _HASH_SPACE
            if r["__tot"] is None or r["__tot"] <= budget_tokens
            else min(_HASH_SPACE, int(slack * budget_tokens / r["__tot"] * _HASH_SPACE) + 1)
        )
        for r in stats
    }
    from pyspark.sql.types import LongType, StructField, StructType

    # threshold frame keys by a RENAMED source column joined null-safely:
    # NULL-source rows have a threshold entry too (groupBy kept the NULL
    # group) and must not be silently dropped by a plain equi-join
    schema = StructType(
        [
            StructField("__src_t", source_field.dataType),
            StructField("__thr", LongType()),
        ]
    )
    while True:
        thr_df = spark.createDataFrame(list(thr.items()), schema)
        surv = (
            work.join(
                F.broadcast(thr_df),
                F.col(source_col).eqNullSafe(F.col("__src_t")),
            )
            .filter(F.col("priority") < F.col("__thr"))
            .drop("__thr", "__src_t")
        )
        tight = [s for s, t in thr.items() if t < _HASH_SPACE]
        if not tight:
            return surv
        surv_tot = {
            r[source_col]: r["__stot"]
            for r in surv.groupBy(source_col).agg(F.sum("n_tokens").alias("__stot")).collect()
        }
        unsafe = [s for s in tight if (surv_tot.get(s) or 0) <= budget_tokens]
        if not unsafe:
            return surv
        for s in unsafe:
            thr[s] = min(_HASH_SPACE, thr[s] * 8)


def token_budget_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_count_col: F.Column,
    budget_tokens: int,
    seed: str = "mix",
    prefilter: bool = False,
    prefilter_slack: float = 8.0,
    n_buckets: int = 64,
) -> DataFrame:
    """Token-budget data mixing: keep a deterministic, uniformly-sampled
    subset of each source whose token sum stays within ``budget_tokens``
    (greedy take in hash order, inclusive while cumulative ≤ budget).
    Hash-ordering ≙ a uniform random sample, but reproducible and stable
    under data growth: a doc's priority never changes, so a bigger corpus
    only ever *displaces* docs, never reshuffles the kept set's order.

    Returns the kept rows with (priority, n_tokens, cum_tokens) attached.

    Scale: the per-source running sum is a DISTRIBUTED two-pass prefix
    sum, never a one-task-per-source window. The hash space is carved
    into ``n_buckets`` fixed priority ranges (order-preserving, so the
    prefix over (source, bucket) slices composes exactly): pass 1 windows
    within (source, bucket) — each task holds ~1/n_buckets of a source —
    and aggregates per-bucket token totals; pass 2 turns the totals into
    per-source prefix OFFSETS via a window over the tiny
    sources×n_buckets frame (≤ n_buckets rows per partition by
    construction) and broadcast-joins them back:
    ``cum = in_bucket_cum + offset``. Long addition is associative, so
    the result is bit-identical to the single-window form at any
    bucketing. ``prefilter=True`` additionally engages
    :func:`_prefilter_candidates`: a hash-threshold filter (from one
    per-source token-total scan) bounds the input to a budget-sized
    candidate slice first, with a verification pass that PROVES the kept
    set is unchanged (widening the threshold on the rare miss)."""
    pri = portable_hash(id_col, seed)
    work = df.withColumn("priority", pri).withColumn("n_tokens", token_count_col)
    if prefilter:
        work = _prefilter_candidates(work, source_col, budget_tokens, prefilter_slack)
    # bucket = fixed hash range ⇒ (bucket asc, priority asc) ≡ priority asc
    bucket_width = _HASH_SPACE // n_buckets + 1
    work = work.withColumn("__bkt", F.expr(f"priority DIV {bucket_width}"))
    w_in = (
        Window.partitionBy(source_col, "__bkt")
        .orderBy(F.asc("priority"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partials = work.groupBy(source_col, "__bkt").agg(
        F.sum("n_tokens").cast("long").alias("__bkt_tot")
    )
    w_off = (
        Window.partitionBy(source_col)
        .orderBy(F.asc("__bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        source_col,
        "__bkt",
        F.coalesce(F.sum("__bkt_tot").over(w_off), F.lit(0).cast("long")).alias(
            "__off"
        ),
    )
    # NULL-safe join on the source key (ADVICE r07): the window form
    # keeps a NULL source as its own partition, so a plain equi-join here
    # would silently DROP every NULL-source row from the kept set
    off_r = F.broadcast(
        offsets.withColumnRenamed(source_col, "__src_r").withColumnRenamed(
            "__bkt", "__bkt_r"
        )
    )
    return (
        work.withColumn("__cum_in", F.sum("n_tokens").over(w_in))
        .join(
            off_r,
            F.col(source_col).eqNullSafe(F.col("__src_r"))
            & (F.col("__bkt") == F.col("__bkt_r")),
        )
        .withColumn("cum_tokens", F.col("__cum_in") + F.col("__off"))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .drop("__bkt", "__bkt_r", "__src_r", "__cum_in", "__off")
    )


def sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    seed: str = "grpsample",
) -> DataFrame:
    """Deterministic uniform k-per-group sample: rank rows inside each
    group by their portable hash (md5-prefix — engine-reproducible, unlike
    ``rand()`` or reservoir order) and keep the first ``k``. The
    inspection/eval-slice primitive ("give me 100 random docs per source,
    the same 100 every run and on every engine").

    Stability: a row's hash never changes, so growing a group only ever
    displaces the k-th member; disjoint reruns agree row-for-row.

    Scale: one window per group ordered by hash. Group cardinality is the
    knob — for few huge groups this is the same giant-partition hazard as
    token_budget_mix; k·|groups| is tiny by construction, so a hash
    PREFILTER (keep priority < ~4k/|group|·2^32 before the exact window)
    bounds it the same way if a group outgrows one reducer."""
    pri = portable_hash(id_col, seed)
    w = Window.partitionBy(group_col).orderBy(F.asc("__pri"), F.asc(id_col))
    return (
        df.withColumn("__pri", pri)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__pri", "__rn")
    )


def mixture_weights(
    df: DataFrame,
    source_col: str,
    token_count_col: F.Column,
    alpha: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Temperature-based mixture weights per source — the sampling-ratio
    computation behind multi-corpus pretraining mixes (α=1 is proportional
    sampling, α→0 uniform; α≈0.5-0.7 is the usual up-weighting of small
    high-quality sources, as in the multilingual-BERT / XLM exponential
    smoothing scheme).

    Returns (source, n_docs, n_tokens, weight, epochs): ``weight`` is
    tokens^α normalized over sources; ``epochs`` is the relative
    over/under-sampling factor a sampler must apply to realize the weight
    (weight / token share — >1 means the source repeats).

    Scale: one partial-aggregable groupBy over a low-cardinality key, then
    a broadcast scalar for the normalizer — two tiny shuffle-free-ish jobs
    regardless of corpus size."""
    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_col).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias("__z"),
        F.sum("n_tokens").alias("__t"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(
            F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("__z"),
            round_digits,
        ).alias("weight"),
        F.round(
            (F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("__z"))
            / (F.col("n_tokens") / F.col("__t")),
            round_digits,
        ).alias("epochs"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: F.Column,
    context_len: int,
    shard_col: str = "source",
) -> DataFrame:
    """Sequence-packing placement — concat-then-chunk, the GPT-style
    pretraining layout: documents concatenate in a deterministic order
    (``id`` ascending within each shard) and the token stream slices into
    fixed ``context_len`` windows; a document may span a window boundary.

    Returns one row per document: (shard, id, n_tokens, start_token,
    seq_first, seq_last, offset_in_seq) — ``seq_first``/``seq_last`` are
    the first/last window indices the document lands in (0-based, per
    shard), ``offset_in_seq`` its position inside ``seq_first``. Downstream shard writers
    consume exactly this manifest; windows never need materializing here
    (the attention-mask / boundary handling is a training-side concern).

    Scale: placement is one running sum per shard. Shards are independent
    token streams (the standard per-worker layout), so the window
    partitions on ``shard_col``; a shard outgrowing one reducer is
    re-sharded upstream (e.g. ``shard = source || hash(id) % k`` — packing
    semantics are per-shard by definition, so adding shards is free)."""
    w = (
        Window.partitionBy("shard")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    work = df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        token_count_col.cast("long").alias("n_tokens"),
    ).withColumn("__cum", F.sum("n_tokens").over(w))
    start = F.col("__cum") - F.col("n_tokens")
    return work.select(
        "shard",
        id_col,
        "n_tokens",
        start.alias("start_token"),
        F.floor(start / context_len).alias("seq_first"),
        F.floor((F.col("__cum") - 1) / context_len).alias("seq_last"),
        (start % context_len).alias("offset_in_seq"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    seed: str = "strat",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``portable_hash(id) < rate(stratum) · 2^32`` — the rebalancing
    primitive for mixture curation (downsample the over-represented
    language/source, keep the rare one whole) when the decision must be
    REPRODUCIBLE: the md5 rule means any engine (DuckDB, Trino) recomputes
    the identical sample, and a row's fate never depends on partitioning,
    row order, or corpus size (unlike ``df.sample``). Strata missing from
    ``rates`` get ``default_rate``.

    Scan-speed: one hash + one CASE per row, no shuffle, fully
    pushdown-friendly. Subset-stability for free: raising a stratum's
    rate only ADDS rows (hash thresholds nest), so samples at different
    rates are nested — the property curriculum/ablation studies need."""
    u = portable_hash(id_col, seed).cast("double") / F.lit(float(2**32))
    thresh = F.lit(float(default_rate))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(float(rate))
        ).otherwise(thresh)
    return df.filter(u < thresh)


def uniform_sample(
    df: DataFrame,
    id_col: str,
    rate: float,
    seed: str = "sample",
) -> DataFrame:
    """Deterministic uniform Bernoulli sample: keep a row iff
    ``portable_hash(id) / 2^32 < rate`` — the engine-portable twin of
    ``df.sample(fraction, seed)`` (VERDICT r15 next-round #3). Spark's
    seeded sampler is reproducible only within Spark (XORShift draw per
    partition, so even a repartition changes the kept set); the md5 rule
    makes the sample a pure function of (id, seed): any engine recomputes
    the identical rows, reruns and incremental arrivals never move old
    decisions, and samples at different rates NEST (hash thresholds
    contain each other). One hash + one compare per row — scan-speed,
    no shuffle, pushdown-friendly; the division by 2^32 is exact in
    double (power-of-two denominator), so the < compare is bit-portable.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    u = portable_hash(id_col, seed).cast("double") / F.lit(float(2**32))
    return df.filter(u < F.lit(float(rate)))


def shard_assignments(
    df: DataFrame,
    id_col: str,
    n_shards: int = 16,
    seed: str = "shuffle",
) -> DataFrame:
    """Deterministic global pseudo-shuffle + sharding — the export layout
    step before training: every example gets a ``shard`` and a position
    ``pos`` within it, jointly equivalent to a seeded global shuffle
    (hash order is uncorrelated with any data order), but WITHOUT a
    global sort: shard = md5-hash % n_shards (uniform), and pos orders by
    the hash within each shard. Same ``portable_hash`` rule as
    :func:`hash_split`, so any engine reproduces the exact layout and a
    re-run after appending data leaves existing (shard, hash-order)
    stable.

    Scale shape: ONE shuffle keyed on shard + a per-shard sort — exactly
    the write-side work a sharded-file exporter does anyway. Size
    ``n_shards`` to the output file target (thousands at 100 TB) so a
    shard sorts within one task; a global ORDER BY rand() would be a
    full range-partitioned sort AND unreproducible."""
    h = portable_hash(id_col, seed)
    out = df.withColumn("shard", F.pmod(h, F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy(h.asc(), F.col(id_col).asc())
    return out.withColumn("pos", F.row_number().over(w))


def dsir_scores(
    df: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    seed: str = "dsir",
    round_digits: int = 6,
    persist_features: bool = True,
) -> DataFrame:
    """DSIR-style data-selection scores (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much more likely its hashed-n-gram bag is under a
    TARGET domain's distribution than under the RAW corpus's own —
    the standard cheap importance signal for steering a 100 TB crawl
    toward a curated domain (then resample ∝ exp(score), e.g. via
    :func:`stratified_sample` over score bands).

    Features are word unigrams + bigrams hashed into ``n_buckets`` via
    :func:`portable_hash` (engine-reproducible). Per-bucket log ratio
    λ(b) = ln p̂_target(b) − ln p̂_raw(b) with add-``alpha`` smoothing
    over the fixed bucket domain; a document's score is the MEAN λ over
    its feature occurrences. Documents with no tokens emit no row.

    Determinism contract (exact-integer-sums rule): λ is quantized to
    fixed point, ``floor(λ·10⁶ + 0.5)`` as int64, so the per-document
    reduction is an INTEGER sum — associative, partition-order-
    independent, bit-identical across engines; both engines then divide
    and round identical operands once per document.

    Scale shape: one explode→groupBy per side for bucket counts (bucket
    tables are ≤ ``n_buckets`` rows — bounded by the PARAMETER, not the
    corpus, so forcing the broadcast of the λ table is safe at any scale,
    unlike an unbounded vocabulary table); the raw feature frame is
    persisted (default) so the heavy explode runs once for counting and
    once-materialized for scoring; per-doc aggregation shuffles on the
    doc key. Totals ride 1-row broadcast scalars."""
    from .text import tokens as _tokens

    def feats(frame: DataFrame, cols: list[str]) -> DataFrame:
        ctoks = F.filter(_tokens(text_col), lambda t: t != "")
        k = F.greatest(F.size(ctoks) - F.lit(1), F.lit(0))
        bigrams = F.zip_with(
            F.slice(ctoks, 1, k),
            F.slice(ctoks, 2, k),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        return frame.select(
            *cols, F.explode(F.concat(ctoks, bigrams)).alias("__term")
        ).select(
            *cols, (portable_hash(F.col("__term"), seed) % n_buckets).alias("__b")
        )

    raw = feats(df, [id_col])
    if persist_features:
        from pyspark import StorageLevel

        raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
    raw_counts = raw.groupBy("__b").agg(F.count(F.lit(1)).alias("__cr"))
    tgt_counts = feats(target, []).groupBy("__b").agg(
        F.count(F.lit(1)).alias("__ct")
    )
    tot_r = raw_counts.agg(F.sum("__cr").alias("__tr"))
    tot_t = tgt_counts.agg(F.sum("__ct").alias("__tt"))
    aB = float(alpha) * n_buckets
    # docs come from the raw side, so every doc bucket appears in
    # raw_counts — a left join covers the needed λ domain exactly
    lam = (
        raw_counts.join(tgt_counts, "__b", "left")
        .crossJoin(F.broadcast(tot_r))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "__b",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(float(alpha)))
                        / (F.col("__tt") + F.lit(aB))
                    )
                    - F.log(
                        (F.col("__cr") + F.lit(float(alpha)))
                        / (F.col("__tr") + F.lit(aB))
                    )
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("__lam"),
        )
    )
    per_doc = (
        raw.join(F.broadcast(lam), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("__lam").alias("__sfix"),
        )
    )
    return per_doc.select(
        id_col,
        "n_feats",
        F.round(
            (F.col("__sfix").cast("double") / F.lit(1000000.0))
            / F.col("n_feats"),
            round_digits,
        ).alias("dsir_score"),
    )


def weighted_sample_per_group(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per group —
    Efraimidis-Spirakis: each row draws u = uniform(0,1] from the
    engine-portable md5 hash of its id and ranks by ``ln(u)/w`` (the
    order-equivalent log form of the classic ``u^(1/w)`` priority);
    the top-k per group is a weight-proportional sample. The curation
    workhorse for "sample documents ∝ quality/length" with reproducible,
    seed-switchable draws — no RNG state, no partition-order dependence.

    u is EXACT in float64: (hash+1)/2^32 is an integer divided by a power
    of two. ln() is the one libm call — Java's Math.log and C libm agree
    on these inputs (oracle-verified); ties are impossible short of an
    md5 collision, and (key desc, id) ordering makes rank total anyway.

    Rows with weight ≤ 0 or NULL are excluded (zero-weight items are
    unsampleable by definition). Scale shape: scan-side hash + one
    per-group top-k window (group-limit pushdown applies) — same cost as
    any top-k-per-group; groups are whatever ``keys`` is, so skew follows
    the caller's key choice."""
    from pyspark.sql import Window

    u = (portable_hash(id_col, seed) + 1) / F.lit(float(1 << 32))
    key = F.log(u) / F.col(weight_col)
    w = Window.partitionBy(*keys).orderBy(F.desc("__es_key"), F.asc(id_col))
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__es_key", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("__es_key")
    )


def proportional_interleave(
    df: DataFrame,
    source_col: str,
    id_col: str,
    seed: str = "il",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic proportional interleaving: a GLOBAL training order in
    which every source appears evenly throughout — position i of a
    source's (hash-shuffled) internal order maps to the global fraction
    ``(i − 1/2) / source_total``, and the global order sorts by that
    fraction. A 90/10 mix then alternates ~9:1 all the way down instead
    of concatenating corpora (the curriculum-smoothing step after
    token_budget_mix picks WHAT to train on; this decides WHEN).

    Determinism: within-source order is the portable md5 hash of the id
    (seed-switchable, partition-independent); the interleave key is a
    ratio of exact small integers — same IEEE double in any engine — with
    (source, id) as the total-order tiebreak. Returns the input plus
    ``interleave_rank`` (1-based global position).

    Scale shape: NO single-task stage anywhere — both ranks are two-pass
    distributed prefix counts over order-preserving bucketings (the
    repo-wide rule that a partition-less or whole-source window must
    never hold the corpus in one task):

    1. within-source position ``i``: the hash space is carved into
       ``n_buckets`` fixed priority ranges; row_number within
       (source, bucket) + per-source prefix offsets computed by a window
       over the tiny sources×n_buckets count frame (≤ n_buckets rows per
       partition), broadcast-joined back. Bit-identical to a whole-source
       window because buckets partition the order-key space monotonically.
    2. global ``interleave_rank``: bucket = ``floor(frac·n_buckets)``
       (monotone in the sort key, so bucket boundaries respect the global
       order); row_number within bucket + prefix offsets from the ≤
       n_buckets global bucket counts, collected to the driver (bounded
       by the constant ``n_buckets`` — the documented bounded-collect
       contract) and rejoined as a broadcast literal frame.

    The output is a global ordering; writers consume it through
    ``repartitionByRange(interleave_rank)`` to keep it distributed."""
    from pyspark.sql import Window

    spark = df.sparkSession
    bucket_width = _HASH_SPACE // n_buckets + 1
    work = df.withColumn("__pri", portable_hash(id_col, seed)).withColumn(
        "__pbkt", F.expr(f"__pri DIV {bucket_width}")
    )
    # pass 1a: rank within (source, hash-bucket)
    w_in = Window.partitionBy(source_col, "__pbkt").orderBy(
        F.asc("__pri"), F.asc(id_col)
    )
    counts = work.groupBy(source_col, "__pbkt").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    w_off = (
        Window.partitionBy(source_col)
        .orderBy(F.asc("__pbkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(source_col)
    offsets = counts.select(
        source_col,
        "__pbkt",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0).cast("long")).alias("__ioff"),
        F.sum("__c").over(w_tot).alias("__tot"),
    )
    # same NULL-safe rule as token_budget_mix: a plain equi-join would
    # silently drop NULL-source rows the window form interleaves
    off_r = F.broadcast(
        offsets.withColumnRenamed(source_col, "__src_r").withColumnRenamed(
            "__pbkt", "__pbkt_r"
        )
    )
    ranked = (
        work.withColumn("__irn", F.row_number().over(w_in).cast("long"))
        .join(
            off_r,
            F.col(source_col).eqNullSafe(F.col("__src_r"))
            & (F.col("__pbkt") == F.col("__pbkt_r")),
        )
        .drop("__src_r", "__pbkt_r")
        .withColumn("__i", F.col("__ioff") + F.col("__irn"))
    )
    frac = (F.col("__i") - F.lit(0.5)) / F.col("__tot")
    # pass 2: global rank via frac-range buckets (frac ∈ (0,1) strictly)
    ranked = ranked.withColumn(
        "__gbkt",
        F.least(
            F.floor(frac * F.lit(float(n_buckets))).cast("long"),
            F.lit(n_buckets - 1).cast("long"),
        ),
    )
    # consumed twice (bucket-count collect below + the final rank plan) —
    # persist so the window+join subplan computes once (tracked; released
    # by release_tracked/clear_session_state)
    from pyspark import StorageLevel

    from ._util import track_persist

    ranked = track_persist(ranked.persist(StorageLevel.MEMORY_AND_DISK))
    gcounts = {
        r["__gbkt"]: r["__c"]
        for r in ranked.groupBy("__gbkt").agg(F.count(F.lit(1)).alias("__c")).collect()
    }
    goff, acc = [], 0
    for b in sorted(gcounts):
        goff.append((b, acc))
        acc += gcounts[b]
    from pyspark.sql.types import LongType, StructField, StructType

    goff_df = spark.createDataFrame(
        goff,
        StructType(
            [StructField("__gbkt", LongType()), StructField("__goff", LongType())]
        ),
    )
    w_g = Window.partitionBy("__gbkt").orderBy(
        frac.asc(), F.col(source_col).asc(), F.col(id_col).asc()
    )
    return (
        ranked.withColumn("__grn", F.row_number().over(w_g).cast("long"))
        .join(F.broadcast(goff_df), "__gbkt")
        .withColumn("interleave_rank", (F.col("__goff") + F.col("__grn")).cast("int"))
        .drop("__pri", "__pbkt", "__irn", "__ioff", "__i", "__tot", "__gbkt", "__grn", "__goff")
    )


def epoch_upsample(
    df: DataFrame,
    id_col: str,
    epochs_col: F.Column | str,
    seed: str = "epoch",
    out_col: str = "copy_idx",
    null_epochs: float | None = None,
) -> DataFrame:
    """Realize FRACTIONAL per-row epoch factors as deterministic repeats —
    the materialization step after :func:`mixture_weights` decides a
    source should be seen e.g. 2.3 times per pass (the LLaMA/Pile-style
    "epochs per source" recipe): every row emits ``floor(e)`` copies plus
    one more with probability ``frac(e)``, decided by the portable md5
    uniform of its id (never an RNG), so the realized token count is
    within one doc of ``e × n`` per source and the SAME rows get the
    extra copy on every engine, retry, and backfill.

    Output: input columns + ``copy_idx`` (1-based); rows with a realized
    count of 0 (e < 1 and the hash draw fails) disappear — fractional
    DOWN-sampling falls out of the same rule.

    Scale shape: zero shuffle — the epoch factor arrives via whatever
    join produced it (broadcast source→epochs is the
    :func:`mixture_weights` pattern), the hash draw and the
    ``explode(sequence(...))`` are map-side row-local work, and the
    output streams straight to the shard writer. At 100 TB the cost is
    the scan plus output volume — the theoretical floor for upsampling.

    NULL epochs (e.g. a source that missed the epochs join) are NOT a
    silent drop: by default the job FAILS with the offending id (a
    mis-joined mixture table must not quietly shrink the corpus); pass
    ``null_epochs=<factor>`` (typically 1.0) to opt into an explicit
    fallback instead."""
    e = F.col(epochs_col) if isinstance(epochs_col, str) else epochs_col
    if null_epochs is None:
        e = F.when(e.isNotNull(), e).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "epoch_upsample: NULL epochs (mis-joined mixture "
                        "table?) for id "
                    ),
                    F.col(id_col).cast("string"),
                )
            )
        )
    else:
        e = F.coalesce(e, F.lit(float(null_epochs)))
    # u in [0,1): 2^32 exact in double; epochs rounded upstream ⇒ the
    # comparison is deterministic cross-engine
    u = portable_hash(id_col, seed).cast("double") / F.lit(4294967296.0)
    n_copies = (
        F.floor(e).cast("long")
        + (u < (e - F.floor(e))).cast("long")
    )
    return (
        df.withColumn("__nc", n_copies)
        .filter(F.col("__nc") >= 1)
        .withColumn(out_col, F.explode(F.sequence(F.lit(1).cast("long"), F.col("__nc"))))
        .drop("__nc")
    )


def negative_sample(
    pool: DataFrame,
    anchors: DataFrame,
    id_col: str,
    k: int = 4,
    seed: str = "neg",
    bucket_target: int = 64,
) -> DataFrame:
    """Deterministic random negatives for contrastive training: for every
    anchor id, ``k`` pseudo-random picks from ``pool`` (anchor itself
    excluded) — the in-batch/random-negative mining step of embedding
    and reranker training, made reproducible across engines and retries
    (hash draws, never an RNG).

    Mechanism (never a global index, never a cross join): pool ids hash
    into ``B ≈ |pool| / bucket_target`` buckets; each (anchor, slot j)
    hash-picks a bucket, and within it the pick is the argmin of a
    per-(anchor, slot) rehash of the member ids — one equi-join on the
    bucket key plus a partial-aggregable struct-min. A global
    ``row_number`` index would serialize 100 TB through one sort; this
    shape is one pool shuffle on the bucket key with per-slot work
    bounded by ``bucket_target``.

    Output: (anchor, slot, neg_id) — slot 1..k. Two slots of one anchor
    can land on the same bucket and (rarely) the same pick; consumers
    wanting distinct negatives dropDuplicates on (anchor, neg_id). A
    slot whose bucket holds only the anchor itself emits no row (bounded
    by 1/bucket_target probability per slot).

    Determinism: bucket assignment, bucket choice, and the within-bucket
    argmin all derive from :func:`portable_hash` (md5) of the ids — the
    SAME negatives on any engine, so a DuckDB oracle hash-matches."""
    cnt = pool.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.count(F.lit(1)) / F.lit(bucket_target)).cast("long"),
        ).alias("__B")
    )
    pb = (
        pool.select(F.col(id_col).alias("__pid"))
        .crossJoin(F.broadcast(cnt))
        .withColumn(
            "__bkt", F.pmod(portable_hash("__pid", seed + "-bucket"), F.col("__B"))
        )
        .select("__pid", "__bkt")
    )
    aj = (
        anchors.select(F.col(id_col).alias("anchor"))
        .crossJoin(F.broadcast(cnt))
        .select(
            "anchor",
            F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("slot"),
            F.col("__B"),
        )
        .withColumn(
            "__bkt",
            F.pmod(
                portable_hash(
                    F.concat(
                        F.col("anchor").cast("string"),
                        F.lit(":"),
                        F.col("slot").cast("string"),
                    ),
                    seed + "-pick",
                ),
                F.col("__B"),
            ),
        )
        .select("anchor", "slot", "__bkt")
    )
    cand = aj.join(pb, "__bkt").filter(F.col("__pid") != F.col("anchor"))
    rank = portable_hash(
        F.concat(
            F.col("__pid").cast("string"),
            F.lit("|"),
            F.col("anchor").cast("string"),
            F.lit(":"),
            F.col("slot").cast("string"),
        ),
        seed + "-rank",
    )
    return (
        cand.groupBy("anchor", "slot")
        .agg(F.min(F.struct(rank.alias("__r"), F.col("__pid"))).alias("__m"))
        .select("anchor", "slot", F.col("__m.__pid").alias("neg_id"))
    )
