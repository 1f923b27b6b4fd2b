"""Streaming curation: near-dup flagging of an arriving document stream
against a STATIC MinHash signature index (the streaming face of
``operators.dedup.incremental_minhash_dedup``).

The batch incremental form processes crawl batches; this is the same
index-probe shape as a continuous stream: per micro-batch, signatures
compute scan-side (Arrow UDF — streaming-safe, stateless), band hashes
explode, and a stream-static join probes the banded index. Corpus text is
never read; the only streamed state is Spark's file-source tracking.

Output contract: APPEND-mode, AT-LEAST-ONCE flags — a (doc, match) pair
that agrees in several bands emits once per agreeing band, and no
watermark/state is spent deduplicating them in-flight (a stateless
operator survives any stream volume). Consumers treat the flag stream as
a set: dedup downstream, or merge in ``foreachBatch`` where exactly-once
matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.dedup import (
    _check_anchor_width,
    band_signatures,
    minhash_signatures_arrow,
    substring_anchor_index,
)

#: file-source schema for the documents stream (mirrors the fixture table)
DOCUMENT_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based stream source over a directory of document parquet files
    (exactly-once file tracking; swap for Kafka at deploy)."""
    reader = spark.readStream.schema(DOCUMENT_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


#: shared with the batch incremental probe — the same banded layout is the
#: stored index format (operators.dedup.band_signatures)
_banded = band_signatures


def stream_near_dup_flags(
    doc_stream: DataFrame,
    seen_sigs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Flag streaming documents that are near-dups (MinHash Jaccard
    estimate ≥ ``threshold``) of the indexed corpus.

    Returns an append-mode stream of (doc_id, matched_id, jaccard_est) —
    at-least-once per matching pair (once per agreeing band; see module
    docstring). ``seen_sigs`` is the static (__id, __sig) index as
    produced by :func:`~..operators.dedup.minhash_signatures_arrow` and
    maintained by the batch pipeline; the stream side only ever computes
    O(batch) signature work and the join probes (band, bucket) — narrow
    keys, broadcast-able index shards."""
    sigs = minhash_signatures_arrow(
        doc_stream, "doc_id", "text", num_hashes, shingle_n
    )
    stream_b = _banded(sigs, "n", num_hashes, bands)
    static_b = _banded(seen_sigs, "s", num_hashes, bands)
    est = F.aggregate(
        F.zip_with("__sig_n", "__sig_s", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(num_hashes)
    return (
        stream_b.join(static_b, ["__band", "__bucket"])
        .withColumn("jaccard_est", est)
        .filter(F.col("jaccard_est") >= threshold)
        .select(
            F.col("__id_n").alias("doc_id"),
            F.col("__id_s").alias("matched_id"),
            "jaccard_est",
        )
    )


def stream_span_flags(
    doc_stream: DataFrame,
    seen_anchors: DataFrame,
    min_tokens: int = 50,
    hash_mode: str = "md5",
) -> DataFrame:
    """Flag streaming documents sharing a ≥``min_tokens``-token VERBATIM
    span with the indexed corpus — the streaming face of
    ``operators.dedup.substring_spans_incremental``.

    Every emitted row (doc_id, matched_id, pos_new, pos_seen) certifies a
    full ``min_tokens``-token verbatim window shared at those 1-based
    positions: a single anchor match IS a complete detection. For the
    maximal-extent form see :func:`stream_span_extents` (round 10) —
    raw flags remain the cheapest shape when downstream only needs the
    boolean/position signal. AT-LEAST-ONCE per shared window position,
    stateless, append-mode. ``seen_anchors`` is the static
    :func:`~..operators.dedup.substring_anchor_index` table the batch
    pipeline maintains — a width or hash-mode mismatch is REFUSED via
    the index's ``__fp`` metadata tag (+ dtype backstop) instead of
    silently matching nothing; stream-side work is O(batch tokens)
    anchor hashing plus a fingerprint-keyed stream-static join."""
    _check_anchor_width(seen_anchors, min_tokens, hash_mode)
    batch = substring_anchor_index(
        doc_stream, "doc_id", "text", min_tokens, hash_mode
    )
    return (
        batch.join(
            seen_anchors.select(
                F.col("__id").alias("matched_id"),
                F.col("__pos").alias("pos_seen"),
                "__fp",
            ),
            "__fp",
        )
        .filter(F.col("__id") != F.col("matched_id"))
        .select(
            F.col("__id").alias("doc_id"),
            "matched_id",
            F.col("__pos").alias("pos_new"),
            "pos_seen",
        )
    )


def stream_span_extents(
    doc_stream: DataFrame,
    seen_anchors: DataFrame,
    min_tokens: int = 50,
    hash_mode: str = "md5",
) -> DataFrame:
    """MAXIMAL verbatim spans between streaming documents and the indexed
    corpus (VERDICT r09 #5) — :func:`stream_span_flags` upgraded from raw
    anchor matches to merged extents: one row per maximal shared run,
    (doc_id, matched_id, start_new, start_seen, span_tokens), the exact
    schema/semantics of ``dedup.substring_spans_incremental`` restricted
    to new-vs-corpus pairs.

    Why this stays STATELESS and still emits GLOBALLY maximal spans: a
    (pair, diagonal) anchor run lives entirely inside ONE streaming
    document's anchor set, and a document's text arrives in one row —
    so every run is confined to a single micro-batch by construction.
    Within the batch, a non-time window is unsupported on streams, so
    the gaps-and-islands merge runs as: hash-repartition the flag rows
    by (doc_id, matched_id, diagonal) — a stateless exchange that
    colocates each run — then one Arrow ``mapInPandas`` pass per
    partition sorts its rows and merges step-1 position runs
    (span_tokens = run_len + W − 1, the batch operator's identity).
    The UDF concatenates its partition's Arrow batches before merging
    because Arrow may split a partition mid-group; partition payload is
    match-table-sized (≪ corpus — the same bound the batch run-merge
    window carries). Batch-sibling pairs (new-vs-new in the same
    micro-batch) are intentionally NOT probed — same contract as
    :func:`stream_span_flags`; run the batch incremental operator on
    accumulated batches when sibling pairs matter.

    Exactly-once per (pair, diagonal, start) within a file-source batch;
    append-mode; width/hash-mode mismatches with the index refuse as in
    the flag form. Parity with the batch operator is pinned in
    ``test_stream_span_extents_match_batch_incremental``."""
    W = min_tokens
    flags = stream_span_flags(doc_stream, seen_anchors, min_tokens, hash_mode)
    keyed = flags.withColumn("__diag", F.col("pos_new") - F.col("pos_seen"))
    # id types follow the inputs (ADVICE r10): the stream's doc_id and the
    # index's __id may be strings or ints — the merge below is id-type
    # agnostic (shift-compare, not numeric diff), so the output schema
    # must be too.
    schema = StructType(
        [
            StructField("doc_id", doc_stream.schema["doc_id"].dataType),
            StructField("matched_id", seen_anchors.schema["__id"].dataType),
            StructField("start_new", LongType()),
            StructField("start_seen", LongType()),
            StructField("span_tokens", LongType()),
        ]
    )

    def merge_runs(batches):
        import pandas as pd

        parts = list(batches)  # whole partition: Arrow may split a group
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if pdf.empty:
            return
        # at-least-once replay (or a duplicated index row) can deliver the
        # same flag twice; a duplicate (pos_new diff 0) would split a
        # maximal run at the repeat point — dedup first (ADVICE r10)
        pdf = pdf.drop_duplicates(
            ["doc_id", "matched_id", "__diag", "pos_new"]
        )
        pdf = pdf.sort_values(
            ["doc_id", "matched_id", "__diag", "pos_new"]
        ).reset_index(drop=True)
        # shift-compare, not .diff(): works for string ids too, and the
        # first row's NaN/None comparison is True as required; object
        # dtype keeps int64 ids exact (a float64 shift would collide
        # ids past 2^53)
        keys = pdf[["doc_id", "matched_id", "__diag"]].astype(object)
        key_change = keys.ne(keys.shift()).any(axis=1)
        gap = pdf["pos_new"].diff().ne(1)
        run_id = (key_change | gap).cumsum()
        g = pdf.groupby(run_id)
        yield pd.DataFrame(
            {
                "doc_id": g["doc_id"].first(),
                "matched_id": g["matched_id"].first(),
                "start_new": g["pos_new"].min(),
                "start_seen": g["pos_seen"].min(),
                "span_tokens": g["pos_new"].size() + (W - 1),
            }
        )

    return keyed.repartition("doc_id", "matched_id", "__diag").mapInPandas(
        merge_runs, schema
    )


def stream_self_repetition(
    doc_stream: DataFrame,
    min_tokens: int = 50,
    round_digits: int = 4,
    threshold: float | None = None,
    max_anchor_occurrences: int | None = None,
) -> DataFrame:
    """Per-document SELF-repetition coverage over a STREAM (round 10) —
    the online face of ``dedup.self_repetition_coverage``: for every
    arriving document, (doc_id, n_tokens, rep_tokens, rep_frac), the
    Gopher-style repetition quality signal. Self-repetition is
    DOC-LOCAL, so unlike the cross-doc span probes this needs no index,
    no state, and no shuffle: token hashes compute JVM-side (the same
    ``xxhash64`` transform as the poly anchor mode), and one stateless
    Arrow pass per micro-batch runs the Karp–Rabin window kernel
    (``dedup._poly_roll``), groups duplicate fingerprints, merges
    per-diagonal step-1 runs, and interval-unions both occurrence
    sides — BIT-IDENTICAL to the batch operator in poly mode (pinned in
    tests). ``threshold`` (e.g. 0.2) emits only docs above it — the
    drop-list face a streaming curation pipeline consumes.

    ``max_anchor_occurrences`` (VERDICT r10 #1 / ADVICE r10): the
    per-duplicate-fingerprint pair loop below is O(k²) in a group's
    occurrence count — a degenerate 1M-token one-token doc would stall
    its executor core on ~5·10¹¹ Python pairs. With the cap set, a doc
    whose any window fingerprint repeats more than m times
    SHORT-CIRCUITS to rep_tokens = n_tokens, rep_frac = 1.0 — the same
    rule (and so bit-identical output) as the batch operator's capped
    path; per-doc work is then bounded by O(n + groups·m²). Default
    ``None`` stays exact, matching the batch default the parity test
    pins."""
    import numpy as np
    import pandas as pd

    from ..operators.dedup import _poly_roll

    W = min_tokens
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    hashed = doc_stream.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("__h"),
    )
    schema = "doc_id long, n_tokens long, rep_tokens long, rep_frac double"

    def per_doc_rep(h: "np.ndarray") -> int:
        fps = _poly_roll(np.asarray(h, dtype=np.int64).view(np.uint64), W)
        m = fps.size
        if m == 0:
            return 0
        order = np.argsort(fps, kind="stable")
        sf = fps[order]
        covered: set[int] = set()
        # duplicate-fp groups -> per-diagonal step-1 runs -> intervals
        i = 0
        runs: dict[int, list[int]] = {}
        while i < m:
            j = i + 1
            while j < m and sf[j] == sf[i]:
                j += 1
            if j - i > 1:
                if (
                    max_anchor_occurrences is not None
                    and (j - i) > max_anchor_occurrences
                ):
                    return -1  # degenerate doc: short-circuit to rep=n
                pos = np.sort(order[i:j]) + 1  # 1-based window starts
                for a_i in range(len(pos)):
                    for b_i in range(a_i + 1, len(pos)):
                        d = int(pos[b_i] - pos[a_i])
                        runs.setdefault(d, []).append(int(pos[a_i]))
            i = j
        for d, plist in runs.items():
            plist.sort()
            run_start, prev = plist[0], plist[0]
            for p in plist[1:] + [None]:
                if p is not None and p == prev + 1:
                    prev = p
                    continue
                span = prev - run_start + W
                covered.update(range(run_start, run_start + span))
                covered.update(range(run_start + d, run_start + d + span))
                if p is not None:
                    run_start = prev = p
        return len(covered)

    def rep_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rep = pdf["__h"].map(per_doc_rep).astype("int64")
            # −1 = the capped degrade: whole doc counts as repetition
            rep = np.where(rep < 0, pdf["n_tokens"], rep)
            # Spark's round() is HALF_UP; pandas .round is HALF_EVEN —
            # a 32-token doc with rep=5 (0.15625) would diverge on the
            # tie, so replicate HALF_UP explicitly (ratios are >= 0)
            scale = float(10**round_digits)
            frac = np.floor(rep / pdf["n_tokens"] * scale + 0.5) / scale
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["n_tokens"],
                    "rep_tokens": rep,
                    "rep_frac": frac,
                }
            )
            yield out

    out = hashed.mapInPandas(rep_batches, schema)
    if threshold is not None:
        out = out.filter(F.col("rep_frac") > threshold)
    return out


def stream_merge_into_snapshot(
    doc_stream: DataFrame,
    root: str,
    key: str = "doc_id",
    delete_col: str | None = None,
    query_name: str = "merge_apply",
):
    """Streaming CDC apply: every micro-batch MERGEs into a snapshot-
    versioned parquet table (``..table.merge_upsert``) via ``foreachBatch``
    — the upsert-sink pattern Structured Streaming uses where a sink needs
    transactional semantics the file sink can't give. Each batch commits
    one immutable table version; the ``_latest`` marker flip is the commit
    point, so a crash between batches never exposes partial state (the
    stream's checkpoint replays the batch; re-merging the same rows is
    idempotent because MERGE is keyed).

    Create the target with ``table.create_partitioned_snapshot`` for the
    100 TB shape: each micro-batch then rewrites only the key-buckets it
    touches (partition-level MERGE) instead of copy-on-writing the whole
    table per batch — ``merge_upsert`` dispatches on the table's layout
    automatically.

    Returns the started StreamingQuery (caller awaits/stops)."""
    from .. import table as snapshot_table

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        snapshot_table.merge_upsert(
            batch_df.sparkSession, root, batch_df, key, delete_col=delete_col
        )

    return (
        doc_stream.writeStream.foreachBatch(apply_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


#: file-source schema for a retrieval QUERY stream: (ts, query_id, query)
QUERY_STREAM_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("query_id", LongType()),
        StructField("query", StringType()),
    ]
)


def read_query_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based stream of retrieval queries (exactly-once file tracking;
    swap for Kafka at deploy)."""
    reader = spark.readStream.schema(QUERY_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_bm25_scores(
    query_stream: DataFrame,
    corpus_stats,
    ts_col: str = "ts",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
    window: str = "1 minute",
    watermark: str = "0 seconds",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """Score a STREAM of search queries against a static, prebuilt BM25
    index (``index_store.load_bm25_stats`` output) — the online face of
    ``operators.retrieval.bm25_scores``, completing the streaming probe
    family (MinHash flags, ANN probe → lexical probe).

    Per micro-batch: each query row's DISTINCT terms come from a row-local
    ``array_distinct`` (no stateful streaming distinct needed — BM25's
    query-side dedup is within one query string); a stream-static join
    probes the term-clustered tf table; per-term partials quantize to the
    same 10¹² fixed-point grid as the batch scorer; the windowed
    (query, doc) sum is an event-time aggregation, so append mode emits
    exactly-once per window after the watermark. Corpus text is never
    read; N/avgdl are collected ONCE from the static lens table at plan
    time (the index is immutable by contract — time-travel to re-pin).

    Returns (window_start, query_id, id, score); batch-twin identity with
    ``bm25_scores`` is pinned in tests."""
    tf, lens, dfreq = corpus_stats
    from ..operators.text import tokens

    id_col = [c for c in tf.columns if c not in ("term", "tf")][0]
    n_row = lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_total, avgdl = int(n_row.n), float(n_row.avgdl)
    qterms = query_stream.withWatermark(ts_col, watermark).select(
        F.window(F.col(ts_col), window).alias("__w"),
        F.col(query_id_col),
        F.explode(F.array_distinct(tokens(query_text_col))).alias("term"),
    ).filter(F.col("term") != "")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_total)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    part = (
        F.col("__idf")
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    p = float(10**round_digits)
    return (
        qterms.join(dfreq.select("term", idf.alias("__idf")), "term")
        .join(tf, "term")
        .join(lens, id_col)
        .select(
            "__w",
            query_id_col,
            id_col,
            F.floor(part * F.lit(1e12) + F.lit(0.5)).cast("long").alias("__p"),
        )
        .groupBy("__w", query_id_col, id_col)
        .agg(
            (
                F.floor(
                    F.sum("__p").cast("double") / F.lit(1e12) * p + F.lit(0.5)
                )
                / p
            ).alias("score")
        )
        .select(
            F.col("__w.start").alias("window_start"),
            query_id_col,
            id_col,
            "score",
        )
    )


def stream_contamination_flags(
    doc_stream: DataFrame,
    eval_shingles: DataFrame,
    n: int = 5,
    bloom: tuple[list[int], int, int] | None = None,
) -> DataFrame:
    """Shingle-level eval-contamination flags for a document stream —
    the streaming face of ``operators.curation.decontaminate`` (round
    12, completing the decontamination symmetry: spans →
    :func:`stream_span_flags`, embeddings →
    ``embeddings.stream_semantic_contamination_flags``, shingles →
    here). Per micro-batch each arriving document's DISTINCT word
    ``n``-gram shingles compute scan-side (``dedup.shingles`` — pure
    column exprs), explode, and a stream-static equi-join probes
    ``eval_shingles`` (the batch pipeline's persisted DISTINCT eval
    shingle set, one column ``__g``).

    Output is an APPEND-mode, AT-LEAST-ONCE hit stream
    (doc_id, n_shingles, hit_shingle) — one row per (doc, leaked
    shingle), with the doc's total distinct shingle count riding every
    row scan-side so a ``foreachBatch`` consumer can aggregate the
    exact contamination fraction (COUNT(hits)/any(n_shingles)) without
    re-reading text: grouped per-doc aggregation is deliberately NOT
    done in-stream (it would need update-mode state for nothing —
    the stateless contract every flag face here keeps). The pytest pin
    proves per-doc hit counts == the batch operator's ``n_hits``
    bit-exactly.

    ``bloom`` (round 13 — the batch ``decontaminate_bloom``'s exact
    streaming sibling, VERDICT r12 Next #6): pass ``(bitmap, num_bits,
    num_hashes)`` — typically ``index_store.load_bloom_bitmap`` of the
    bitmap built once from the SAME eval shingle set — and every
    arriving shingle probes the array-literal bitmap SCAN-SIDE
    (``relational.bloom_probe_filter``) before the stream-static join,
    so each micro-batch's exchange carries ~true-hits × (1 + fp_rate)
    rows instead of Σ batch shingles.  False negatives are impossible
    and the equi-join removes false positives, so the output stream is
    BIT-IDENTICAL with or without the prefilter (pytest-pinned against
    the batch operator either way)."""
    from ..operators.dedup import shingles
    from ..operators.relational import bloom_probe_filter

    # materialize the shingle array ONCE per doc before exploding: the
    # one-projection form ``select(size(arr), explode(arr))`` re-inlines
    # the whole array build per EXPLODED row (measured ~18x on sf0.1 —
    # see decontaminate_multi's docstring; round-13 finding), and a
    # stream cannot take the batch fix (a second scan joined on the id),
    # so the array rides one Project as a column instead
    sh = doc_stream.withColumn("__arr", shingles("text", n)).select(
        F.col("doc_id"),
        F.size("__arr").cast("long").alias("n_shingles"),
        F.explode("__arr").alias("__g"),
    )
    if bloom is not None:
        bitmap, num_bits, num_hashes = bloom
        sh = sh.filter(bloom_probe_filter("__g", bitmap, num_bits, num_hashes))
    ev = eval_shingles.select(F.col("__g")).distinct()
    return sh.join(ev, "__g").select(
        "doc_id", "n_shingles", F.col("__g").alias("hit_shingle")
    )


def stream_canary_hits(
    doc_stream: DataFrame,
    patterns: DataFrame,
    pat_id_col: str = "pat_id",
    pattern_col: str = "pattern",
    regex: bool = False,
    form: str = "join",
) -> DataFrame:
    """Exact multi-pattern canary detection on a document stream — the
    streaming face of ``operators.curation.canary_scan`` (round 13).
    The canary table is STATIC (planted canaries / secret shapes / eval
    answer strings change per release, not per batch), so each micro
    batch pays one stream-static broadcast nested-loop ``contains``
    join: stateless, APPEND-mode, zero stream-side shuffle, output
    ~hits. Emits ``(doc_id, pat_id, pattern, n_occurrences)`` with the
    batch operator's exact-integer occurrence arithmetic — the pytest
    pin proves stream rows == the batch operator's rows bit-exactly on
    the same files. ``regex=True`` switches to the secret-shape sweep
    (``canary_scan(regex=True)`` — regexp_count predicate), still
    stateless. ``form="automaton"`` (round 14) swaps in the
    LARGE-pattern-set Aho-Corasick path
    (:func:`operators.curation.canary_scan_automaton`): the static
    pattern table collects once at plan-build time, the automaton rides
    a single broadcast and each micro-batch pays one stateless
    mapInPandas scan at O(len + hits)/doc independent of |patterns| —
    exact literals only (an automaton cannot ride regexes), stream ==
    batch stays the bit-exact pin. ``form="auto"`` (round 15) delegates
    to :func:`operators.curation.canary_scan_auto`: the STATIC pattern
    table collects once at plan-build time and the measured
    ``_CANARY_AUTO_THRESHOLD`` crossover picks join vs automaton — the
    same safe-by-default dispatch the composed batch pipelines use,
    legal on a stream because only the stream side is unbounded."""
    from ..operators.curation import (
        canary_scan,
        canary_scan_auto,
        canary_scan_automaton,
    )

    if form not in ("join", "automaton", "auto"):
        # ADVICE r15 #4: an unrecognized form (e.g. an 'automton' typo)
        # used to fall through silently to the join form
        raise ValueError(
            f"unknown form {form!r}: expected 'join', 'automaton', or 'auto'"
        )
    if form in ("automaton", "auto") and regex:
        raise ValueError(
            f"form='{form}' matches exact literals only — regex "
            "sweeps stay on the join/literal forms"
        )
    if form == "automaton":
        return canary_scan_automaton(
            doc_stream, "doc_id", "text", patterns,
            pat_id_col=pat_id_col, pattern_col=pattern_col,
        )
    if form == "auto":
        return canary_scan_auto(
            doc_stream, "doc_id", "text", patterns,
            pat_id_col=pat_id_col, pattern_col=pattern_col,
        )
    return canary_scan(
        doc_stream, "doc_id", "text", patterns,
        pat_id_col=pat_id_col, pattern_col=pattern_col, regex=regex,
    )


def stream_multisuite_contamination_flags(
    doc_stream: DataFrame,
    eval_suite_shingles: DataFrame,
    n: int = 5,
) -> DataFrame:
    """Multi-suite shingle contamination for a document stream — the
    streaming face of ``operators.curation.decontaminate_multi`` (round
    13): ``eval_suite_shingles`` is the batch pipeline's persisted
    DISTINCT ``(suite, __g)`` table (ALL benchmark suites, one
    artifact), each arriving document's distinct ``n``-gram shingles
    compute scan-side and ONE stream-static equi-join emits
    ``(doc_id, n_shingles, suite, hit_shingle)`` — one row per (doc,
    suite, leaked shingle), every suite screened per micro-batch
    without re-reading the batch corpus or running k per-suite streams.
    Stateless APPEND-mode at-least-once flags, same contract as
    :func:`stream_contamination_flags`; a ``foreachBatch`` consumer
    aggregates exact per-(doc, suite) fractions from the riding
    ``n_shingles``. The pytest pin proves per-(doc, suite) hit counts
    == the batch operator's ``n_hits`` bit-exactly."""
    from ..operators.dedup import shingles

    # materialize the shingle array ONCE per doc before exploding: the
    # one-projection form ``select(size(arr), explode(arr))`` re-inlines
    # the whole array build per EXPLODED row (measured ~18x on sf0.1 —
    # see decontaminate_multi's docstring; round-13 finding), and a
    # stream cannot take the batch fix (a second scan joined on the id),
    # so the array rides one Project as a column instead
    sh = doc_stream.withColumn("__arr", shingles("text", n)).select(
        F.col("doc_id"),
        F.size("__arr").cast("long").alias("n_shingles"),
        F.explode("__arr").alias("__g"),
    )
    ev = eval_suite_shingles.select("suite", "__g").distinct()
    return sh.join(ev, "__g").select(
        "doc_id", "n_shingles", "suite", F.col("__g").alias("hit_shingle")
    )
