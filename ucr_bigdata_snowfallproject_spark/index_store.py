"""Persisted ANN / near-dup index artifacts.

The quantizers (:func:`~.operators.similarity._train_centroids`,
:func:`~.operators.similarity._train_pq`) and the MinHash banded index
(:func:`~.operators.dedup.band_signatures`) are TRAIN-ONCE artifacts: at
100 TB an index is built by one job and probed by thousands, so retraining
per query call — fine for self-contained benchmarks — is the wrong
production shape. This module stores each artifact through the
snapshot-versioned table layer (:mod:`.table`), which buys the same
guarantees the corpus tables get: immutable versions, atomic ``_latest``
commit, time travel (probe yesterday's index to reproduce yesterday's
dedup decision).

Formats (plain parquet, engine-portable):

- centroids      → one row per centroid: ``(cid int, vec array<double>)``
- PQ codebooks   → one row per (subspace, centroid):
  ``(subspace int, cid int, vec array<double>)``
- IVF cells      → the inverted file partitioned by cell:
  ``v=N/__cell=K/`` with rows ``(id, vec, __cn, __cell)`` — the layout
  IS the index; probes prune to cell dirs (:func:`save_ivf_cells`)
- BM25 index     → three sibling snapshot tables ``tf/ lens/ dfreq/``
  (tf term-clustered so query probes read co-located postings) — feed to
  ``retrieval.bm25_topk(..., corpus_stats=load_bm25_stats(...))``
- MinHash index  → the banded frame as-is:
  ``(__id_s, __sig_s, __band, __bucket)`` — stored pre-banded so probes
  are pure equi-join lookups (``incremental_minhash_dedup(...,
  seen_banded=...)``); repartitioned on (__band, __bucket) at write so a
  probe join's shuffle is one-sided.

Driver-side artifacts (centroids/codebooks) are vocabulary-sized — k×dim
and m×ksub×dsub floats, a few MB at most — so collect-on-load is bounded
by construction, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import table as snapshot_table


def save_centroids(
    spark: SparkSession, centroids: list[list[float]], root: str
) -> int:
    """Persist a k-means coarse quantizer (``ivf_topk`` / ``cluster_assign``
    / ``semdedup`` all accept it via ``centroids=``). Returns the committed
    snapshot version."""
    rows = [(cid, [float(x) for x in vec]) for cid, vec in enumerate(centroids)]
    df = spark.createDataFrame(rows, "cid int, vec array<double>")
    return snapshot_table.create_snapshot(df, root, n_files=1)


def load_centroids(
    spark: SparkSession, root: str, version: int | None = None
) -> list[list[float]]:
    """Load a saved quantizer (latest committed, or ``version`` for time
    travel). cid order restored — bit-identical to what was saved."""
    rows = (
        snapshot_table.read_snapshot(spark, root, version)
        .orderBy("cid")
        .collect()
    )
    return [list(r.vec) for r in rows]


def save_pq_codebooks(
    spark: SparkSession, codebooks: list[list[list[float]]], root: str
) -> int:
    """Persist PQ codebooks (``m × ksub × dsub``) for ``pq_topk(...,
    codebooks=)`` / ``pq_encode``."""
    rows = [
        (j, cid, [float(x) for x in vec])
        for j, book in enumerate(codebooks)
        for cid, vec in enumerate(book)
    ]
    df = spark.createDataFrame(rows, "subspace int, cid int, vec array<double>")
    return snapshot_table.create_snapshot(df, root, n_files=1)


def load_pq_codebooks(
    spark: SparkSession, root: str, version: int | None = None
) -> list[list[list[float]]]:
    rows = (
        snapshot_table.read_snapshot(spark, root, version)
        .orderBy("subspace", "cid")
        .collect()
    )
    books: list[list[list[float]]] = []
    for r in rows:
        while len(books) <= r.subspace:
            books.append([])
        books[r.subspace].append(list(r.vec))
    return books


def save_ivf_cells(cells: DataFrame, root: str) -> int:
    """Persist the IVF inverted file (``build_ivf_index`` cells frame)
    PARTITIONED BY ``__cell``: one snapshot version whose directory layout
    is the index structure — ``v=N/__cell=K/``. A probe's static
    ``__cell IN (...)`` filter then prunes to the probed directories, so
    query jobs read ~n_probe/n_centroids of the index and none of the
    corpus (plan-asserted in tests). The repartition keys rows to their
    cell so each cell lands as O(1) files."""
    import os

    os.makedirs(root, exist_ok=True)
    versions = snapshot_table.snapshot_versions(root)
    v = (versions[-1] + 1) if versions else 0
    from pyspark.sql import functions as F

    (
        cells.repartition(F.col("__cell"))
        .write.mode("errorifexists")
        .partitionBy("__cell")
        .parquet(os.path.join(root, f"v={v}"))
    )
    snapshot_table._write_marker(root, v)
    return v


def append_ivf_cells(
    cells_delta: DataFrame, root: str
) -> int:
    """Incrementally extend a persisted inverted file with NEW vectors —
    O(batch), never O(corpus): the delta's cell assignments (from
    :func:`~.operators.similarity.ivf_int8_build` over the batch with the
    SAME centroid codes) land in a new version directory, and a compose
    manifest (``_compose.json``, underscore-hidden from parquet readers)
    re-references every earlier member directory — existing cell files
    are never rewritten or copied. Because int8 cell assignment is
    per-row deterministic, append == full rebuild row-for-row, so the
    incremental artifact shares the full build's SQL oracle.

    Contract: delta ids must be NEW (same rule as ``append_bm25_delta``).
    Compact a long compose chain via
    ``save_ivf_cells(load_ivf_cells(...), new_root)`` — and do NOT
    ``vacuum_snapshots`` a composed root directly: earlier versions are
    live members of the latest view, not superseded history."""
    import json
    import os

    versions = snapshot_table.snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshots under {root}")
    latest = snapshot_table.latest_version(root)
    prev = _read_ivf_compose(root, latest)
    v = versions[-1] + 1
    from pyspark.sql import functions as F

    (
        cells_delta.repartition(F.col("__cell"))
        .write.mode("errorifexists")
        .partitionBy("__cell")
        .parquet(os.path.join(root, f"v={v}"))
    )
    with open(os.path.join(root, f"v={v}", "_compose.json"), "w") as fh:
        json.dump({"includes": [*prev, v]}, fh)
    snapshot_table._write_marker(root, v)
    return v


def _read_ivf_compose(root: str, version: int) -> list[int]:
    """Member version dirs of an IVF view: the version's compose manifest,
    or just itself for plain :func:`save_ivf_cells` versions."""
    import json
    import os

    p = os.path.join(root, f"v={version}", "_compose.json")
    if os.path.exists(p):
        return list(json.load(open(p))["includes"])
    return [version]


def load_ivf_cells(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The stored inverted file as a DataFrame (``__cell`` recovered from
    the directory layout) — feed to :func:`~.operators.similarity.
    ivf_topk_indexed` together with the matching saved centroids. A
    version written by :func:`append_ivf_cells` resolves through its
    compose manifest to the UNION of its member directories (each member
    read keeps its own partition discovery, so ``__cell`` pruning pushes
    into every branch)."""
    v = snapshot_table.latest_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots under {root}")
    import os
    from functools import reduce

    parts = [
        spark.read.parquet(os.path.join(root, f"v={m}"))
        for m in _read_ivf_compose(root, v)
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def save_minhash_index(banded: DataFrame, root: str, n_files: int = 8) -> int:
    """Persist a banded MinHash index (``band_signatures(sigs, "s", ...)``
    output). Rows are hash-clustered on the probe key (__band, __bucket)
    so an incremental probe reads co-located buckets; at 100 TB raise
    ``n_files`` to the corpus's file-count discipline (or bucketBy through
    ``io.write_bucketed`` if the metastore path is in play)."""
    clustered = banded.repartition(n_files, "__band", "__bucket")
    # repartition already fixed the file count — don't let create_snapshot
    # re-shuffle it round-robin (which would undo the clustering)
    return snapshot_table.create_snapshot(clustered, root, n_files=None)


def load_minhash_index(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The stored banded index as a DataFrame — feed straight to
    ``incremental_minhash_dedup(..., seen_banded=...)`` or the streaming
    probe. Never collected: index size scales with the corpus."""
    return snapshot_table.read_snapshot(spark, root, version)


def save_bloom_bitmap(
    spark: SparkSession,
    bitmap: list[int],
    root: str,
    num_bits: int,
    num_hashes: int,
) -> int:
    """Persist a Bloom key bitmap (``relational.build_bloom_bitmap``) with
    its build parameters — probe-side correctness requires hashing with
    the SAME (num_bits, num_hashes), so they travel with the words.
    Returns the committed snapshot version. The artifact is
    ``num_bits/64`` int64 rows (8 KiB at the default size) — rebuildable
    from the key set at any time; persisting it amortizes the build job
    across queries and streaming micro-batches."""
    rows = [(w, bits, num_bits, num_hashes) for w, bits in enumerate(bitmap)]
    df = spark.createDataFrame(
        rows, "w int, bits long, num_bits int, num_hashes int"
    )
    return snapshot_table.create_snapshot(df, root, n_files=1)


def load_bloom_bitmap(
    spark: SparkSession, root: str, version: int | None = None
) -> tuple[list[int], int, int]:
    """Load a saved Bloom bitmap → (bitmap words, num_bits, num_hashes);
    pass straight into ``relational.bloom_semi_join(..., bitmap=...,
    num_bits=..., num_hashes=...)``."""
    rows = (
        snapshot_table.read_snapshot(spark, root, version).orderBy("w").collect()
    )
    bitmap = [r.bits for r in rows]
    return bitmap, rows[0].num_bits, rows[0].num_hashes


def save_bloom_words(
    words: DataFrame,
    root: str,
    num_bits: int,
    num_hashes: int,
    n_files: int = 1,
) -> int:
    """Persist an OCCUPIED-words Bloom frame
    (``relational.build_bloom_words``) — the join-form sibling of
    :func:`save_bloom_bitmap` for bitmaps too large to densify into a
    driver list (round 13): the artifact is SPARSE (row count bounded by
    the build key cardinality, never ``num_bits/64``) and NEVER
    collected, so ``num_bits`` can be 10⁹-10¹⁰ for fp-rate-correct
    sizing of a real eval union.  ``num_bits``/``num_hashes`` travel
    with the rows (probe-side hashing must match the build's) as BIGINT
    — the dense artifact's INT would overflow exactly in the regime
    this form exists for.  Returns the committed snapshot version."""
    from pyspark.sql import functions as F

    df = words.select(
        F.col("__w").cast("int").alias("w"),
        F.col("__bits").cast("long").alias("bits"),
        F.lit(int(num_bits)).cast("long").alias("num_bits"),
        F.lit(int(num_hashes)).cast("int").alias("num_hashes"),
    )
    return snapshot_table.create_snapshot(df, root, n_files=n_files)


def load_bloom_words(
    spark: SparkSession, root: str, version: int | None = None
) -> tuple[DataFrame, int, int]:
    """Load a saved occupied-words Bloom frame → (words DataFrame with
    columns ``(__w, __bits)``, num_bits, num_hashes); feed straight into
    ``relational.bloom_semi_join(..., words=..., num_bits=...,
    num_hashes=..., mode="join")``.  Only the one-row parameter read
    touches the driver — the words stay distributed."""
    from pyspark.sql import functions as F

    snap = snapshot_table.read_snapshot(spark, root, version)
    meta = snap.select("num_bits", "num_hashes").first()
    words = snap.select(
        F.col("w").alias("__w"), F.col("bits").alias("__bits")
    )
    return words, int(meta[0]), int(meta[1])


def save_bm25_stats(
    tf: DataFrame,
    lens: DataFrame,
    dfreq: DataFrame,
    root: str,
    n_files: int = 8,
    n_term_buckets: int = 16,
) -> tuple[int, int, int]:
    """Persist a BM25 corpus index (:func:`~.operators.retrieval.
    bm25_corpus_stats` output) as three sibling snapshot tables under
    ``root`` — tf/ and lens/ as APPEND-ONLY tables (term-clustered /
    doc-grained file sets new document batches extend zero-copy via
    :func:`append_bm25_delta`), dfreq/ as a term-bucketed
    ``carry='manifest'`` table so incremental document-frequency merges
    rewrite only the term buckets a batch touches. Never collected: tf
    scales with the corpus. Returns the three committed versions."""
    import os

    v_tf = snapshot_table.append_snapshot(
        tf.repartition(n_files, "term"), os.path.join(root, "tf")
    )
    v_lens = snapshot_table.append_snapshot(
        lens.repartition(max(1, n_files // 4)), os.path.join(root, "lens")
    )
    v_df = snapshot_table.create_partitioned_snapshot(
        dfreq,
        os.path.join(root, "dfreq"),
        "term",
        n_buckets=n_term_buckets,
        carry="manifest",
    )
    return v_tf, v_lens, v_df


def append_bm25_delta(
    spark: SparkSession,
    root: str,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    n_files: int = 2,
    commit_note: str | None = None,
) -> tuple[int, int, int]:
    """Incrementally extend a persisted BM25 index with a batch of NEW
    documents — O(batch), never O(corpus):

    - tf/lens rows of new docs are disjoint from existing ones (documents
      are the unit of ingestion), so both tables grow by zero-copy
      APPEND (:func:`~.table.append_snapshot` — the new version's
      manifest re-references every existing posting file, only the
      delta's files are written);
    - dfreq merges ADDITIVELY per term (``table.merge_additive_agg`` on
      the term-bucketed manifest table: only touched term-buckets
      rewrite) — document frequency is a count, exactly associative, so
      incremental == full rebuild BIT-for-bit (pinned by the
      retrieval_bm25_incremental oracle, which is the full-corpus SQL).

    Contract: ``new_docs`` ids must be NEW (re-ingesting an existing doc
    would double its postings — run exact dedup / an anti-join against
    lens first, the same rule every append-only corpus has). N and avgdl
    are derived from lens at query time, so they track the growth with
    no extra bookkeeping. Returns the three new committed versions."""
    import os

    from .operators.retrieval import bm25_corpus_stats

    tf_d, lens_d, dfreq_d = bm25_corpus_stats(
        new_docs, id_col, text_col, persist_tf=True
    )
    v_tf = snapshot_table.append_snapshot(
        tf_d.repartition(n_files, "term"),
        os.path.join(root, "tf"),
        note=commit_note,
    )
    v_lens = snapshot_table.append_snapshot(
        lens_d.coalesce(n_files), os.path.join(root, "lens"), note=commit_note
    )
    v_df = snapshot_table.merge_additive_agg(
        spark,
        os.path.join(root, "dfreq"),
        dfreq_d,
        "term",
        ["df"],
        commit_note=commit_note,
    )
    # the three committed snapshot versions ARE the materialization — drop
    # the delta tf cache now instead of leaving session-lifetime blocks
    # behind per ingest batch (the leak class clear_session_state targets)
    tf_d.unpersist()
    return v_tf, v_lens, v_df


def load_bm25_stats(
    spark: SparkSession,
    root: str,
    versions: tuple[int | None, int | None, int | None] = (None, None, None),
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Load a saved BM25 index → the (tf, lens, dfreq) triple for
    ``bm25_topk(..., corpus_stats=...)`` — the train-once/query-many
    production shape (the corpus text is never re-read at query time)."""
    import os

    return (
        snapshot_table.read_snapshot(spark, os.path.join(root, "tf"), versions[0]),
        snapshot_table.read_snapshot(spark, os.path.join(root, "lens"), versions[1]),
        snapshot_table.read_snapshot(spark, os.path.join(root, "dfreq"), versions[2]),
    )


def save_sq8_codes(codes: DataFrame, root: str, n_files: int = 8) -> int:
    """Persist an int8 scalar-quantization code table
    (:func:`~.operators.similarity.quantize_embeddings` output:
    ``(id, codes array<int>, q_scale double)``) as a snapshot version —
    the 4×-smaller scan surface :func:`~.operators.similarity.
    int8_rerank_topk`'s coarse stage reads INSTEAD of the float corpus
    when passed via ``corpus_codes=``. Same train-once/probe-many
    contract as the IVF cells: quantize 100 TB once, answer every query
    against the code table, touch float embeddings only for the
    candidate rerank join. Returns the committed snapshot version."""
    return snapshot_table.create_snapshot(codes, root, n_files=n_files)


def load_sq8_codes(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Load a saved SQ8 code table (latest, or ``version`` for time
    travel) — bit-identical to what :func:`save_sq8_codes` stored."""
    return snapshot_table.read_snapshot(spark, root, version)


def append_sq8_codes(
    codes_delta: DataFrame, root: str, n_files: int = 2
) -> int:
    """Incrementally extend a saved SQ8 code table with NEW vectors'
    codes — O(batch) via the snapshot layer's zero-copy APPEND (the new
    version's manifest re-references every existing code file; only the
    delta's files are written). Per-vector quantization is row-local, so
    append == full re-quantization row-for-row — the same maintenance
    contract as ``append_bm25_delta``/``append_ivf_cells``. Ids must be
    NEW (re-appending an id would duplicate its coarse-scan row)."""
    return snapshot_table.append_snapshot(
        codes_delta.coalesce(n_files), root
    )
