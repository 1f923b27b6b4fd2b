"""Deduplication operators (X1/X2 — the LLM-data-pipeline surface).

Exact dedup is a hash groupBy; near-dup comes in three flavors, all
shuffle-bounded:

- **MinHash + LSH banding**: shingle → 64 minhash values → band signatures →
  self-join on (band, signature) buckets. Candidate pairs are verified with
  the real Jaccard estimate. No pairwise O(n²) anywhere — the only shuffle
  keys are band signatures, and bucket skew (a degenerate signature shared
  by everything) is capped by ``max_bucket`` salting-style truncation.
- **SimHash**: 64-bit weighted-token fingerprint; near-dups have small
  Hamming distance. Banding over 4×16-bit chunks gives the same
  join-on-bucket scale shape.
- **n-gram Jaccard verify**: exact pairwise similarity, but only applied to
  LSH candidate pairs (never all pairs).

All hashing uses Spark built-ins (xxhash64/crc32) — JVM-side, no Python in
the hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import ensure_parallelism

#: Mersenne prime 2^31-1 for the h_i = (h1 + i·h2) mod p universal-hash
#: family — keeps every intermediate ≤ 64·2^31 ≈ 2^37, safe under Spark 4's
#: ANSI overflow checking.
_MERSENNE_P = 2147483647


def exact_dedup(
    df: DataFrame,
    keys: list[str],
    order_col: str,
) -> DataFrame:
    """X1 exact dedup, deterministic survivor: keep the row with the lowest
    ``order_col`` per key group (a ``dropDuplicates`` whose survivor is
    defined, so results are stable and oracle-checkable).

    Scale: one shuffle on the dedup key; row_number streams each sorted
    group — no buffering.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.asc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def shingles(col: str, n: int = 3) -> F.Column:
    """Word n-gram shingle set of a text column (distinct, JVM-side):
    lowercases, splits on whitespace, slides an n-window."""
    toks = F.split(F.lower(F.trim(F.col(col))), r"\s+")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.array_distinct(
        F.when(
            k > 0,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signature(shingle_col: F.Column, num_hashes: int = 64) -> F.Column:
    """Minhash signature as a single expression (streaming-friendly form):
    two base hashes per shingle, h_i = h1 + i·h2 (the standard
    two-hash construction), min over shingles per i — ONE pass over the
    shingle array producing all ``num_hashes`` values."""
    p = F.lit(_MERSENNE_P)
    pair = F.transform(
        shingle_col,
        lambda s: F.array(F.pmod(F.xxhash64(s), p), F.pmod(F.xxhash64(s, F.lit(1)), p)),
    )
    return F.array(
        *[
            F.array_min(
                F.transform(
                    pair, lambda pr: F.pmod(pr.getItem(0) + F.lit(i) * pr.getItem(1), p)
                )
            )
            for i in range(num_hashes)
        ]
    )


def minhash_signatures_agg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """Minhash signatures via explode + grouped min-aggregation — the
    batch-scale formulation: shingles explode to rows, each row computes
    two base hashes, and ``num_hashes`` partial-aggregable ``min``s reduce
    per document (map-side combine ⇒ the shuffle carries only
    (id, 64 longs), never shingle text)."""
    p = F.lit(_MERSENNE_P)
    df = ensure_parallelism(df, id_col)
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(text_col, shingle_n)).alias("__sh"),
    ).select(
        "__id",
        F.pmod(F.xxhash64("__sh"), p).alias("__h1"),
        F.pmod(F.xxhash64("__sh", F.lit(1)), p).alias("__h2"),
    )
    mins = exploded.groupBy("__id").agg(
        *[
            F.min(F.pmod(F.col("__h1") + F.lit(i) * F.col("__h2"), p)).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        "__id", F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("__sig")
    )


def minhash_signatures_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """Minhash signatures per-row in ONE Arrow pass — the default path.

    Shingling and the two base xxhash64 hashes stay JVM-side; the
    ``num_hashes`` (h1 + i·h2) mod p minima fold in numpy over the Arrow
    batch ((64, n_shingles) broadcast → row-min). Bit-identical to
    :func:`minhash_signatures_agg` (pinned in tests) but with ZERO shuffle:
    signatures materialize in the scan stage itself. Measured ~8× faster
    than the explode+min-agg form at sf0.1 (0.4s vs 3.0s), which remains
    available for pure-JVM deployments that can't run Python workers.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    p = F.lit(_MERSENNE_P)
    pair = F.transform(
        shingles(text_col, shingle_n),
        lambda s: F.array(F.pmod(F.xxhash64(s), p), F.pmod(F.xxhash64(s, F.lit(1)), p)),
    )

    @pandas_udf("array<long>")
    def mins(pairs: pd.Series) -> pd.Series:
        ii = np.arange(num_hashes, dtype=np.int64)[:, None]
        out = []
        for arr in pairs:
            if arr is None:
                out.append(None)
                continue
            a = np.stack(arr).astype(np.int64)  # (n_shingles, 2)
            # h1 + i·h2 ≤ 64·2^31 ≈ 2^37 — no int64 overflow
            h = (a[:, 0][None, :] + ii * a[:, 1][None, :]) % _MERSENNE_P
            out.append(h.min(axis=1))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("__id"), mins(pair).alias("__sig"))


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int = 256,
    log_truncated: bool = False,
) -> DataFrame:
    """X2 MinHash-LSH candidate pairs: documents sharing ≥1 LSH band.

    Returns (id_a, id_b, jaccard_est) with id_a < id_b; ``jaccard_est`` is
    the fraction of matching minhashes — an unbiased Jaccard estimate.

    Scale shape: signatures are narrow (id + 64 longs); the band explode is
    ×`bands`; the self-join shuffles on the band hash — never on text.

    Bucket-skew cap: a degenerate (band, bucket) group — thousands of
    empty or identical docs sharing one band signature — is a quadratic
    reducer (k members ⇒ k² pairs on ONE task). Buckets larger than
    ``max_bucket`` degrade to a star join against the bucket's min id:
    every member still pairs with the representative (so near-dedup /
    connected components keep the whole clique connected through it) but
    the pair count is O(k), not O(k²). ``log_truncated=True`` runs one
    extra small count job and logs how many buckets were truncated.
    """
    rows_per_band = num_hashes // bands
    # The signature subplan feeds three consumers (banding + the two
    # estimate joins). Materialize it once with an eager localCheckpoint:
    # even with the cheap Arrow signature pass, the checkpoint keeps the
    # shingling+UDF out of three separate stages and truncates lineage —
    # A/B at sf0.1 measured checkpointed ~2.1s vs ~2.6s warm. At cluster
    # scale swap localCheckpoint (lost on executor failure) for reliable
    # checkpoint or an intermediate table.
    sig = minhash_signatures_arrow(df, id_col, text_col, num_hashes, shingle_n)
    sig = sig.localCheckpoint(eager=True)
    # The banded self-join stays NARROW — (id, band, bucket) only, never
    # the 64-long signature. Measured 2.4× faster than carrying signatures
    # through the join, and the shuffle volume is O(rows×bands) longs
    # instead of O(rows×bands×num_hashes).
    banded = sig.select(
        "__id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("__sig", b * rows_per_band + 1, rows_per_band), F.lit(b))
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__bucket"),
    )
    # find oversized buckets with a partial-aggregable groupBy (map-side
    # combine ⇒ the shuffle carries one row per distinct bucket, no full
    # sort like a window would need). The oversized set is tiny by
    # construction (≤ rows×bands/max_bucket, and ~0 on healthy corpora),
    # so the exclusion/star joins against it are AQE-broadcast map-side
    # joins; buckets at or under the cap pay nothing but the probe.
    big = (
        banded.groupBy("__band", "__bucket")
        .agg(F.count(F.lit(1)).alias("__bsz"), F.min("__id").alias("__bmin"))
        .filter(F.col("__bsz") > max_bucket)
    )
    if log_truncated:
        n_trunc = big.count()
        if n_trunc:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_candidates: %d (band, bucket) groups exceed "
                "max_bucket=%d — truncated to star joins", n_trunc, max_bucket
            )
    normal = banded.join(
        big.select("__band", "__bucket"), ["__band", "__bucket"], "left_anti"
    )
    star = (
        banded.join(big.select("__band", "__bucket", "__bmin"), ["__band", "__bucket"])
        .filter(F.col("__id") != F.col("__bmin"))
        .select(F.col("__bmin").alias("id_a"), F.col("__id").alias("id_b"))
    )
    pairs = (
        normal.alias("a")
        .join(
            normal.alias("b"),
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .unionByName(star)
        .dropDuplicates(["id_a", "id_b"])
    )
    # candidate pairs are few (LSH's whole point) — the signature re-joins
    # are narrow equi-joins on id
    paired = pairs.join(
        sig.select(F.col("__id").alias("id_a"), F.col("__sig").alias("sig_a")), "id_a"
    ).join(sig.select(F.col("__id").alias("id_b"), F.col("__sig").alias("sig_b")), "id_b")
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(num_hashes)
    return paired.withColumn("jaccard_est", est).drop("sig_a", "sig_b")


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    **kwargs,
) -> DataFrame:
    """X2 near-dedup: drop every doc that is a near-dup (jaccard_est ≥
    threshold) of a lower-id doc. Single-hop survivor rule (min-id wins),
    which needs no iterative connected components — at 100 TB the full CC
    variant is :func:`dup_components`."""
    cand = minhash_candidates(df, id_col, text_col, **kwargs)
    losers = (
        cand.filter(F.col("jaccard_est") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(losers, on=id_col, how="left_anti")


def dup_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over a dup-pair graph (id_a, id_b) by iterative
    min-label propagation: each node adopts the min label among itself and
    its neighbors until fixpoint.

    Scale notes (SURVEY §7.4): O(diameter) joins — near-dup graphs are
    shallow (cliques/chains), so few iterations; label frame is
    checkpoint-truncated every iteration to stop lineage blowup.
    """
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    edges = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    spark = pairs.sparkSession
    spark.sparkContext.setCheckpointDir(
        spark.conf.get("spark.local.dir", "/tmp") + "/snowfall-cc-checkpoints"
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def simhash_expr(col: str, bits: int = 64) -> F.Column:
    """X2 SimHash as a pure array-lambda expression — the semantics
    contract for :func:`simhash` (same output, pinned by test). 64 separate
    interpreted ``aggregate`` folds over the token hashes make this the
    measured-pathological HOF path (~1 µs/element ×64 passes); keep it for
    oracles/tests, use :func:`simhash` in pipelines."""
    toks = F.split(F.lower(F.trim(F.col(col))), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def bit_sum_for(mask):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for b in range(bits):
        mask = F.lit(1 << b) if b < 63 else F.lit(-(2**63))
        out = out.bitwiseOR(
            F.when(bit_sum_for(mask) > 0, mask.cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return out


def _simhash_from_hashes_udf():
    """Arrow-vectorized SimHash fold: token hashes (computed JVM-side by
    xxhash64 — bit-identical to the expression form) arrive as one
    array<long> per row; numpy unpacks 64 bit-planes, sums ±1 per plane
    across tokens, and sign-packs in one batch. Same matrix-over-Arrow
    treatment as :func:`~.similarity.matrix_dots_udf` — replaces 64
    interpreted ``aggregate`` folds per row."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def fold(hashes: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        vals = np.zeros(len(hashes), dtype=np.uint64)
        nulls = np.zeros(len(hashes), dtype=bool)
        for i, arr in enumerate(hashes):
            if arr is None:
                nulls[i] = True
                continue
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            if h.size == 0:
                continue
            ones = ((h[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
            sums = 2 * ones.astype(np.int64) - np.int64(h.size)
            vals[i] = ((sums > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
        out = pd.Series(pd.array(vals.view(np.int64), dtype="Int64"))
        if nulls.any():
            out[nulls] = pd.NA
        return out

    return fold


def simhash(col: str, bits: int = 64) -> F.Column:
    """X2 SimHash 64-bit fingerprint: per token, xxhash64 (JVM-side) → for
    each bit position sum ±1 across tokens → sign bit. The per-bit fold
    runs in one Arrow-vectorized numpy pass (:func:`_simhash_from_hashes_udf`);
    output is bit-identical to :func:`simhash_expr` (pinned in tests)."""
    if bits != 64:
        raise ValueError("simhash is a 64-bit fingerprint")
    toks = F.split(F.lower(F.trim(F.col(col))), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return _simhash_from_hashes_udf()(hashes)


def simhash_candidates(
    df: DataFrame, id_col: str, text_col: str, band_bits: int = 8,
    max_hamming: int = 8,
) -> DataFrame:
    """SimHash near-dup candidates: band the 64-bit fingerprint into
    64/band_bits chunks; docs sharing any chunk are candidates, kept only
    when Hamming distance (bit_count of xor) ≤ ``max_hamming``.

    The Hamming cap matters at scale: a shared 16-bit chunk is a weak
    signal over large corpora with similar token distributions — without
    the cap the candidate set explodes quadratically (measured 232k pairs
    on 5k docs). True near-dups (trigram Jaccard ≥0.8) measure Hamming ≤5
    on the fixture; ≤6 keeps them all with margin (pinned in tests)."""
    sigs = ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("__id"), simhash(text_col).alias("__sh")
    )
    nbands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = sigs.select(
        "__id",
        "__sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("__sh", b * band_bits).bitwiseAND(F.lit(mask))
                    for b in range(nbands)
                ]
            )
        ).alias("__band", "__chunk"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__chunk") == F.col("b.__chunk"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard(pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs only (verify step after
    LSH): joins shingle sets onto (id_a, id_b) and computes
    |A∩B| / |A∪B| with array built-ins."""
    sh = docs.select(F.col(id_col).alias("__id"), shingles(text_col, n).alias("__sh"))
    return (
        pairs.join(sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .drop("sh_a", "sh_b")
    )


def ngram_jaccard_all_pairs(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3, min_jaccard: float = 0.0
) -> DataFrame:
    """Exact n-gram Jaccard over every overlapping pair — the
    inverted-index formulation: explode shingles (hashed to longs — the
    shuffle never carries shingle text), self-join on shingle to count
    co-occurrences, then |A∩B| / (|A|+|B|-|A∩B|).

    Unlike a pairwise array_intersect cross-join this only touches pairs
    sharing ≥1 shingle and its shuffle key is the shingle hash — cost is
    Σ df(shingle)² not n²; hot shingles (high document frequency) are the
    skew knob, handled upstream by stopword-shingle filtering if needed.
    Measured ~5× faster than the array cross-join at 500 docs.
    """
    sh = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(text_col, n)).alias("__s"),
    ).select("__id", F.xxhash64("__s").alias("__h"))
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    co = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.__h") == F.col("b.__h")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    out = (
        co.join(sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na")), "id_a")
        .join(sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb")), "id_b")
        .withColumn("jaccard", F.col("__c") / (F.col("__na") + F.col("__nb") - F.col("__c")))
        .select("id_a", "id_b", "jaccard")
    )
    if min_jaccard > 0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out
