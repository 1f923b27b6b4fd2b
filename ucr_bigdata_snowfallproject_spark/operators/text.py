"""Text analysis operators (X4): language-ID, quality scoring, token
counting, document fingerprinting.

All pure column expressions (codegen'd, zero per-row Python) so they run at
scan speed over 100 TB of documents — and stay DuckDB-oracle-expressible.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword-ratio
#: language-ID heuristic (public knowledge; any real deployment swaps in
#: fastText — behind the same column contract).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "ist"],
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (the X4 token-count baseline)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish token estimate: count word-piece-shaped units (letter runs,
    digit runs, punctuation singles) — a deterministic proxy for tokenizer
    counts, one regexp pass. The pattern avoids lookarounds so the SAME
    regex runs on RE2-based engines (DuckDB oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def stopword_ratio(col: str | Column, lang: str = "en") -> Column:
    sw = STOPWORDS[lang]
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return hits / F.size(toks)


def detect_language(col: str | Column, threshold: float = 0.05) -> Column:
    """Language-ID heuristic: best stopword-ratio wins if above threshold,
    else 'und'. greatest()-based argmax keeps it one expression."""
    ratios = {lang: stopword_ratio(col, lang) for lang in STOPWORDS}
    best = F.greatest(*ratios.values())
    out = F.lit("und")
    for lang, r in ratios.items():
        out = F.when((r == best) & (best >= threshold), F.lit(lang)).otherwise(out)
    return out


def quality_score(col: str | Column) -> Column:
    """Quality scoring (X4): composite of length, mean word length,
    punctuation density, stopword ratio — each squashed to [0,1] and
    averaged. Deterministic, documented weights."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_toks = token_count(c).cast("double")
    mean_word_len = (n_chars - n_toks + 1) / n_toks
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double")
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_len_score = F.when((mean_word_len >= 3) & (mean_word_len <= 10), 1.0).otherwise(0.3)
    punct_score = F.when(punct / n_chars < 0.1, 1.0).otherwise(0.5)
    sw_score = F.least(stopword_ratio(c) * 5, F.lit(1.0))
    return (length_score + word_len_score + punct_score + sw_score) / 4


def fingerprint(col: str | Column) -> Column:
    """Document fingerprint (X4): md5 of the normalized text (lowercase,
    collapsed whitespace) — the exact-dup key that survives formatting
    noise. md5 (not xxhash) so external oracles can reproduce it."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


#: Lookaround-free PII patterns (so the SAME regex runs on RE2-based
#: oracle engines): email, international-ish phone, dotted-quad IP.
#: Real deployments extend the list; the rewrite mechanics don't change.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IP before phone: the phone pattern admits dotted digit runs, so a
    # dotted-quad must be claimed by the more specific rule first.
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # ≥8 digits; between consecutive digits at most one punct, one space,
    # one punct (covers "+1 (415) 555-0199", "415.555.0199",
    # "020 7946 0958") — never a newline or a multi-space run, so matches
    # can't span lines or collapse table columns into one <PHONE>.
    (r"\+?[0-9]([()\-.]? ?[()\-.]?[0-9]){7,}", "<PHONE>"),
]


def redact_pii(col: str | Column) -> Column:
    """PII scrubbing (curation-pipeline staple): replace emails, phone-ish
    runs, and IPs with typed placeholder tokens. A chain of
    ``regexp_replace`` column expressions — codegen'd, scan-speed, and
    reproducible on any RE2-compatible engine (DuckDB oracle twin)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def raw_shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-grams WITHOUT dedup (unlike dedup.shingles) — repetition
    signals need the multiset. Shifted-slice zip_with build (split runs n
    times per ROW; the indexed transform form would re-run it per shingle
    via lambda inlining — see dedup.shingles)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    acc = F.slice(toks, 1, k)
    for j in range(1, n):
        acc = F.zip_with(
            acc, F.slice(toks, j + 1, k), lambda a, t: F.concat(a, F.lit(" "), t)
        )
    return F.when(k > 0, acc).otherwise(F.array(F.concat_ws(" ", toks)))


def repetition_stats(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``dup_line_frac`` — fraction of lines that are repeats of an earlier
      line (1 − distinct/total), the boilerplate/spam tell;
    - ``top_ngram_share`` — the most frequent word ``n``-gram's share of
      all ``n``-grams, the loop/keyword-stuffing tell.

    Shape: line stats are pure column expressions (scan-local); the n-gram
    mode goes explode → per-(doc, gram) count → per-doc max/sum — two
    narrow shuffles keyed by doc id, no text in the second. A per-row HOF
    mode (count each distinct gram via filter) would be O(len²)
    interpreted ops per row — measured pathological; the explode form is
    partial-aggregable and skew-free (doc id keys are unique)."""
    c = F.col(text_col)
    lines = F.split(c, r"\n")
    line_stats = df.select(
        F.col(id_col),
        F.round(
            (F.size(lines) - F.size(F.array_distinct(lines)))
            / F.size(lines).cast("double"),
            4,
        ).alias("dup_line_frac"),
    )
    grams = df.select(
        F.col(id_col), F.explode(raw_shingles(c, n)).alias("__g")
    )
    gram_counts = grams.groupBy(id_col, "__g").agg(F.count(F.lit(1)).alias("__c"))
    shares = gram_counts.groupBy(id_col).agg(
        F.round((F.max("__c") / F.sum("__c")).cast("double"), 4).alias("top_ngram_share")
    )
    return line_stats.join(shares, id_col)


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    round_digits: int = 6,
    persist_tf: bool = True,
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the keyword-extraction primitive
    of a curation pipeline (topic tagging, per-domain term drift, query
    mining over a crawl).

    Scale shape: one explode→groupBy for term frequencies (shuffle keyed on
    (doc, term) — high cardinality, skew-safe), one groupBy for document
    frequencies (keyed on term), then a per-doc window top-k. The DF table
    is vocabulary-sized — small at test scale, where AQE converts the
    scoring join to a broadcast on its own, but NOT forced: a 100 TB web
    corpus has 10⁸–10⁹ distinct whitespace tokens, past any broadcast
    threshold, so the join stays a plain shuffle join on ``term`` (both
    sides already reduced, and TF is term-partitioned from its own groupBy
    so the exchange is often reusable). Same rule as :func:`bigram_lm`.

    Because the DF table derives from the TF frame, a naive plan recomputes
    the corpus explode for that branch. ``persist_tf=True`` (default — it
    is both the 100 TB path and the measured bench win, 1.5s → 1.2s warm
    at sf0.1) caches the TF frame (MEMORY_AND_DISK) so the heavy
    explode+shuffle runs once and both the DF aggregation and the scoring
    join read the materialized result; the remaining corpus touch is a
    column-pruned doc-count scan. (A window-count over term instead of the
    groupBy+broadcast-join measured faster still at sf0.1 but puts every
    occurrence of a hot term in one window partition — a skew hazard the
    partial-aggregable groupBy doesn't have; rejected.)

    idf = ln((N + 1) / (df + 1)) — the smoothed form, so terms present in
    every document score 0 instead of dividing by zero. Deterministic
    tiebreak (score desc, term asc) keeps the top-k reproducible."""
    from pyspark.sql import Window

    n_docs = df.agg(F.countDistinct(id_col).alias("__n"))  # 1-row broadcast scalar
    terms = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    if persist_tf:
        from pyspark import StorageLevel

        from ._util import track_persist

        tf = track_persist(tf.persist(StorageLevel.MEMORY_AND_DISK))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log((F.col("__n") + 1) / (F.col("df") + 1)),
                round_digits,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "tfidf")
    )


def unigram_logppl(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document unigram log-perplexity — the classic cheap quality /
    outlier signal for corpus curation (CCNet-style: documents whose token
    distribution diverges from the corpus score high and get binned or
    dropped).

    score = mean over the doc's tokens of −ln p(t), with
    p(t) = count(t) / total_tokens over the whole corpus (the corpus is its
    own LM; swap the counts frame for a held-out LM table to score against
    an external model — the plan is identical).

    Scale shape: one explode → (term) groupBy for corpus counts (the
    vocabulary table — small at test scale so AQE broadcasts it on its
    own, but NOT forced: 10⁸+ distinct tokens at 100 TB stay a shuffle
    join on ``term``, same rule as :func:`bigram_lm`), the total-token
    scalar rides a 1-row crossJoin broadcast, and the per-doc mean is one
    (doc) groupBy. Same single-heavy-shuffle skeleton as
    :func:`tfidf_top_terms`."""
    terms = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    vocab = terms.groupBy("term").agg(F.count(F.lit(1)).alias("__cnt"))
    total = vocab.agg(F.sum("__cnt").alias("__total"))
    scored = (
        terms.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            (-F.log(F.col("__cnt") / F.col("__total"))).alias("__nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("__nll"), round_digits).alias("logppl"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def bigram_lm(
    df: DataFrame,
    text_col: str,
    add_k: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """Count-based bigram language model over the corpus — the classic
    MapReduce-era LM-training workload re-expressed: one table of
    (w1, w2, count, prob) with add-k smoothing,
    ``prob = (c(w1,w2) + k) / (c(w1,·) + k·V)`` where V is the number of
    distinct continuations observed corpus-wide.

    Scale shape: bigrams build JVM-side per row (an indexed ``transform``
    over the token array — no self-join, no Python), then ONE explode →
    (w1, w2) groupBy; the per-w1 continuation totals come from a second
    partial-aggregable groupBy on the (already reduced) bigram table —
    vocabulary-sized, not corpus-sized; V is a 1-row broadcast scalar.
    Swap the final table into :func:`unigram_logppl`'s scoring skeleton to
    score documents against this LM."""
    toks = tokens(text_col)
    k = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    # zip the array with its own shift — NOT transform(sequence(1,k),
    # i -> element_at(toks, i)): an outer expression referenced inside a
    # lambda is inlined into the lambda body and re-evaluated per element,
    # so the indexed form re-runs the regex split per bigram — O(len²) per
    # doc, measured 19× slower at sf0.1 (7.8s vs 0.4s for the pair build).
    # slice() takes toks as a direct argument → split evaluates once per
    # row; single-token docs slice to empty arrays and vanish in explode.
    grams = F.zip_with(
        F.slice(toks, 1, k),
        F.slice(toks, 2, k),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = (
        df.select(F.explode(grams).alias("__g"))
        .select(F.col("__g.w1"), F.col("__g.w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("count"))
    lefts = counts.groupBy("w1").agg(F.sum("count").alias("__c1"))
    vocab = counts.select("w2").distinct().agg(F.count(F.lit(1)).alias("__v"))
    # lefts is vocabulary-sized: small enough that AQE broadcasts it at
    # test scale, but NOT forced — at 100 TB a 10M-word vocab stays a
    # shuffle join on w1 (both sides already reduced, skew-free keys)
    return (
        counts.join(lefts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            "count",
            F.round(
                (F.col("count") + F.lit(add_k))
                / (F.col("__c1") + F.lit(add_k) * F.col("__v")),
                round_digits,
            ).alias("prob"),
        )
    )


def apply_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str, int]],
) -> DataFrame:
    """Encode documents with a learned BPE merge list — the apply half of
    :func:`learn_bpe_merges` (train once, encode the corpus: the
    tokenizer-application workload every training-data pipeline runs).

    Standard greedy decoding: per word (same whitespace+lowercase
    normalization as training), start from characters and repeatedly
    merge the LOWEST-RANK mergeable adjacent pair (all its occurrences)
    until none applies — the HuggingFace/GPT-2 application order, so a
    merge list learned anywhere encodes identically here.

    Scale shape: the merge table rides the UDF closure (vocabulary-sized
    by construction), encoding is one Arrow-batched scan-side pass — no
    shuffle, no driver involvement beyond the closure. Output:
    (id, bpe_tokens array<string>, n_bpe_tokens). Invariants pinned in
    tests: concatenating a word's tokens reproduces the word; zero merges
    → characters; encode is deterministic."""
    import re

    from pyspark.sql.functions import pandas_udf

    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}

    def encode_word(w: str) -> list[str]:
        syms = list(w)
        while len(syms) >= 2:
            best_rank, best_pair = None, None
            for a, b in zip(syms, syms[1:]):
                rk = ranks.get((a, b))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_rank, best_pair = rk, (a, b)
            if best_pair is None:
                break
            a, b = best_pair
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks: list[str] = []
            for w in re.split(r"\s+", ("" if t is None else t).strip().lower()):
                if w:
                    toks.extend(encode_word(w))
            out.append(toks)
        return pd.Series(out)

    return df.select(
        F.col(id_col),
        enc(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))


def length_band_filter(
    df: DataFrame,
    len_col: str,
    id_col: str,
    lower_frac: float = 0.05,
    upper_frac: float = 0.95,
    approx: bool = False,
) -> DataFrame:
    """Adaptive length filter: drop the shortest/longest tails by RANK
    fraction rather than fixed byte thresholds — corpus-relative cutoffs
    survive distribution drift between crawls.

    Exact mode ranks every row (two window passes over a single sort key) —
    the correctness contract, SQL-expressible, used by the oracle.
    ``approx=True`` is the 100 TB path: percentile_approx computes the two
    cutoffs as a mergeable sketch in one scan-side pass and the filter
    becomes a pure predicate — no global sort, no window."""
    if approx:
        cuts = df.select(
            F.percentile_approx(len_col, [lower_frac, upper_frac], 10000).alias("c")
        ).first()["c"]
        return df.filter(
            (F.col(len_col) >= cuts[0]) & (F.col(len_col) <= cuts[1])
        )
    from pyspark.sql import Window

    n = df.count()
    w = Window.orderBy(F.asc(len_col), F.asc(id_col))
    ranked = df.withColumn("__rn", F.row_number().over(w))
    lo = int(n * lower_frac) + 1
    hi = n - int(n * (1.0 - upper_frac))
    return ranked.filter(
        (F.col("__rn") >= lo) & (F.col("__rn") <= hi)
    ).drop("__rn")


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass per-document stats table: chars, tokens, mean token length,
    fingerprint, stopword ratio, quality."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("len_chars"),
        token_count(c).alias("n_tokens"),
        F.round(F.length(F.regexp_replace(c, r"\s+", "")) / token_count(c), 4).alias(
            "mean_token_len"
        ),
        fingerprint(c).alias("fingerprint"),
        F.round(stopword_ratio(c), 4).alias("en_stopword_ratio"),
        F.round(quality_score(c), 4).alias("quality"),
    )


#: The Gopher "required word" set (Rae et al. 2021 §A.2.3, public): a
#: document must contain at least ``min_required`` of these to pass the
#: rule battery's lexical-sanity check.
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    required_words: tuple[str, ...] = GOPHER_REQUIRED_WORDS,
    min_required: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021 — the published
    heuristic filter every large web-corpus pipeline runs a variant of):
    per-document PER-RULE pass flags plus the conjunction, so curation can
    both filter and DIAGNOSE which rule fired. Rules, with the published
    thresholds hard-coded as exact integer comparisons (no float ratios —
    ``10*sym <= n_words`` instead of ``sym/n_words <= 0.1`` — so every
    flag is bit-identical on any engine, DuckDB oracle included):

    - ``r_word_count``:   min_words <= n_words <= max_words (bounds are
      the corpus-fit knobs; Gopher used 50..100k)
    - ``r_mean_word_len``: mean word length in [3, 10] chars
    - ``r_symbol_ratio``:  ('#' + '...') occurrences <= 10% of words
    - ``r_bullet_lines``:  <= 90% of lines start with a bullet (-, *, •)
    - ``r_ellipsis_lines``: <= 30% of lines end with '...' or '…'
    - ``r_alpha_words``:   >= 80% of words contain an alphabetic char
    - ``r_required_words``: >= min_required of ``required_words`` present

    Scale shape: pure column expressions over one scan — zero shuffle,
    zero Python, whole-stage codegen; at 100 TB this runs at parquet read
    speed and the flags push down into any downstream filter. Flags emit
    as BIGINT 0/1 (portable hashing across engines). ``keep_cols``
    pass through untouched, so a composed pipeline stays ONE scan
    instead of re-joining the flags back on the id."""
    c = F.col(text_col)
    toks = F.filter(tokens(c), lambda t: t != "")
    n_words = F.size(toks).cast("long")
    total_chars = F.length(F.regexp_replace(c, r"\s+", "")).cast("long")
    hash_n = (F.length(c) - F.length(F.replace(c, F.lit("#")))).cast("long")
    ell_n = ((F.length(c) - F.length(F.replace(c, F.lit("...")))) / 3).cast(
        "long"
    )
    lines = F.split(c, r"\n")
    n_lines = F.size(lines).cast("long")
    bullet_n = F.size(
        F.filter(lines, lambda l: F.trim(l).substr(1, 1).isin("-", "*", "•"))
    ).cast("long")
    ell_lines = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).endswith("...") | F.trim(l).endswith("…"),
        )
    ).cast("long")
    alpha_n = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    req_n = sum(
        (F.array_contains(toks, w).cast("long") for w in required_words),
        F.lit(0).cast("long"),
    )

    def flag(cond) -> Column:
        return cond.cast("long")

    r_wc = flag((n_words >= min_words) & (n_words <= max_words))
    r_mwl = flag(
        (3 * n_words <= total_chars) & (total_chars <= 10 * n_words)
    )
    r_sym = flag(10 * (hash_n + ell_n) <= n_words)
    r_bullet = flag(10 * bullet_n <= 9 * n_lines)
    r_ell = flag(10 * ell_lines <= 3 * n_lines)
    r_alpha = flag(5 * alpha_n >= 4 * n_words)
    r_req = flag(req_n >= min_required)
    out = df.select(
        F.col(id_col),
        *[F.col(k) for k in keep_cols],
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_sym.alias("r_symbol_ratio"),
        r_bullet.alias("r_bullet_lines"),
        r_ell.alias("r_ellipsis_lines"),
        r_alpha.alias("r_alpha_words"),
        r_req.alias("r_required_words"),
    )
    return out.withColumn(
        "keep",
        (
            F.col("r_word_count")
            * F.col("r_mean_word_len")
            * F.col("r_symbol_ratio")
            * F.col("r_bullet_lines")
            * F.col("r_ellipsis_lines")
            * F.col("r_alpha_words")
            * F.col("r_required_words")
        ).cast("long"),
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 5,
    banned_line_words: tuple[str, ...] = ("javascript",),
    banned_doc_substrings: tuple[str, ...] = ("lorem ipsum", "{"),
    min_sentences: int = 3,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The C4 line-level cleaning recipe (Raffel et al. 2020 §2.2 — the
    published WITHIN-document counterpart of the cross-document
    ``remove_boilerplate_lines``): keep only lines that (a) end in a
    terminal punctuation mark (. ! ? \"), (b) have at least
    ``min_words_per_line`` words, and (c) contain none of
    ``banned_line_words`` (C4 dropped any line with "javascript"); flag
    the whole document for removal if it contains any of
    ``banned_doc_substrings`` ("lorem ipsum", code-brace pages) or fewer
    than ``min_sentences`` sentences survive the line cut.

    Returns one row per input document (row-preserving — composes with
    row-count-sensitive curation stages): ``(id, n_lines, n_kept,
    n_sentences, keep_doc, cleaned_text)``, surviving lines in original
    order.

    Scale shape: unlike ``remove_boilerplate_lines`` (whose line
    frequency is a corpus-global signal and NEEDS two shuffles), every C4
    predicate is doc-local, so the whole operator is array lambdas over
    one scan — zero shuffle, zero explode, zero Python; at 100 TB it runs
    at parquet read speed and AQE never sees an exchange."""
    c = F.col(text_col)
    lines = F.split(c, r"\n")

    def line_keep(l: Column) -> Column:
        t = F.trim(l)
        ok = t.substr(-1, 1).isin(".", "!", "?", '"')
        ok = ok & (F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
                   >= min_words_per_line)
        low = F.lower(l)
        for w in banned_line_words:
            ok = ok & ~low.contains(w)
        return ok

    kept = F.filter(lines, line_keep)
    cleaned = F.array_join(kept, "\n")
    n_sentences = (
        F.length(cleaned) - F.length(F.regexp_replace(cleaned, r"[.!?]", ""))
    ).cast("long")
    doc_ok = n_sentences >= min_sentences
    low_doc = F.lower(c)
    for s in banned_doc_substrings:
        doc_ok = doc_ok & ~low_doc.contains(s.lower())
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep_cols],
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        n_sentences.alias("n_sentences"),
        doc_ok.cast("long").alias("keep_doc"),
        cleaned.alias("cleaned_text"),
    )


def learn_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    min_count: int = 2,
    max_vocab_words: int = 200_000,
) -> list[tuple[str, str, int]]:
    """Byte-pair-encoding merge learning — the tokenizer-training
    workload: greedily merge the most frequent adjacent symbol pair (ties
    broken lexicographically, so the merge list is deterministic),
    ``n_merges`` times.

    The classic BPE structure keeps this cheap at 100 TB: the ONLY
    corpus-sized work is one distributed word-count pass; the greedy loop
    runs over the word-frequency table, which is vocabulary-bounded —
    collected driver-side (capped at ``max_vocab_words`` rows by count
    desc, word asc — a few MB at any corpus size) and iterated in memory,
    exactly how production BPE trainers (HuggingFace tokenizers,
    SentencePiece) structure it. A fully-distributed iteration was
    measured and rejected: each merge adds a freshly-codegen'd fold over
    a ~2k-row table — all Janino compile time, no data to amortize it
    (the same bounded-driver-work pattern as the IVF quantizer sample).

    Returns [(left, right, weighted_count), ...] in merge order."""
    rows = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_vocab_words)
        .collect()
    )
    wf = {r["w"]: int(r["n"]) for r in rows}
    vocab = {w: list(w) for w in wf}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            n = wf[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Fixed-token-window document chunking with overlap — the RAG /
    embedding-prep primitive: every document splits into windows of
    ``chunk_tokens`` whitespace tokens, consecutive windows sharing
    ``overlap`` tokens so no sentence is orphaned at a boundary. Output:
    (id, chunk_id, n_tokens, chunk_text), chunk_ids 0-based per doc.

    Pure column expressions — tokenization, the window index sequence,
    per-window slice+join — so chunking runs at scan speed with no
    shuffle and no Python (and stays DuckDB-oracle-expressible; contrast
    :func:`~.dedup.cdc_chunks`, which cuts content-defined boundaries for
    dedup rather than fixed windows for retrieval). Windows step by
    ``chunk_tokens − overlap``; the final window may be short; empty/
    whitespace-only documents produce no chunks."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(tokens(text_col), lambda t: t != "")
    n = F.size(toks)
    n_chunks = F.when(
        n <= 0, F.lit(0)
    ).otherwise(F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(step)))
    pieces = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.size(F.slice(toks, i * step + 1, chunk_tokens)).alias("n_tokens"),
            F.array_join(F.slice(toks, i * step + 1, chunk_tokens), " ").alias(
                "chunk_text"
            ),
        ),
    )
    return (
        df.filter(n > 0)
        .select(F.col(id_col), F.posexplode(pieces).alias("chunk_id", "__c"))
        .select(
            id_col,
            "chunk_id",
            F.col("__c.n_tokens").alias("n_tokens"),
            F.col("__c.chunk_text").alias("chunk_text"),
        )
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_doc_freq: int = 3,
    persist_lines: bool = True,
) -> DataFrame:
    """Line-level boilerplate removal (the C4/RefinedWeb cleaning step):
    any non-blank line whose trimmed form appears in ≥ ``min_doc_freq``
    DISTINCT documents is boilerplate (nav menus, cookie banners, footer
    legalese) and is dropped from every document; blank lines and
    document-unique lines survive, in their original order.

    Returns (id, n_lines, n_kept, cleaned_text) — one row per input
    document, including documents whose every line was boilerplate
    (``cleaned_text = ''``), so the operator is row-preserving.

    Scale shape: one posexplode → the line table shuffles twice — a
    (fingerprint) groupBy for the cross-document frequency (lines hash to
    16-byte md5 keys; the raw text never rides the frequency shuffle key)
    and a doc-grained re-aggregation that reassembles survivors with an
    in-group sort_array (line order restores without a global sort). The
    frequency table is corpus-vocabulary-sized — joined on fingerprint,
    NOT broadcast (same rule as tfidf's doc-freq table).

    Docs whose every line is kept/dropped still emit one row (the keep
    flag is aggregated, never pre-filtered), so the operator composes
    with row-count-sensitive curation stages.

    ``persist_lines`` (default) materializes the exploded line table once
    (MEMORY_AND_DISK) — it feeds both the frequency groupBy and the
    flagging join, and without it the corpus explode runs twice (the
    tfidf ``persist_tf`` pattern)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "__l"),
    ).withColumn("__fp", F.md5(F.trim(F.col("__l"))))
    if persist_lines:
        from pyspark import StorageLevel

        from ._util import track_persist

        lines = track_persist(lines.persist(StorageLevel.MEMORY_AND_DISK))
    freq = (
        lines.filter(F.trim(F.col("__l")) != "")
        .groupBy("__fp")
        .agg(F.countDistinct(id_col).alias("__df"))
        .filter(F.col("__df") >= min_doc_freq)
        .select("__fp", F.lit(True).alias("__boiler"))
    )
    flagged = lines.join(freq, "__fp", "left").withColumn(
        "__keep",
        (F.trim(F.col("__l")) == "") | F.col("__boiler").isNull(),
    )
    kept_sorted = F.transform(
        F.filter(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("__l"), F.col("__keep")))
            ),
            lambda s: s["__keep"],
        ),
        lambda s: s["__l"],
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("__keep").cast("long")).alias("n_kept"),
        F.array_join(kept_sorted, "\n").alias("cleaned_text"),
    )


def script_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document character-class composition — the standard cheap
    script/charset filter for web corpora (drop documents that are mostly
    digits/punctuation; route by dominant script before language-specific
    stages): counts per Unicode class as a fraction of total characters.

    Classes: ASCII letters, digits, whitespace, CJK unified ideographs,
    Cyrillic, and "other" (the remainder — punctuation, Latin-extended,
    emoji, ...). Counts come from length-after-strip regexes — pure
    whole-stage-codegen column expressions, scan speed, zero shuffle,
    identical regex semantics in any RE2/PCRE-class engine (plain
    character-class patterns only). Empty documents emit 0 ratios.

    Ratio arithmetic is int/int division + floor-half-up rounding —
    engine-bit-identical (exact-integer-sums rule). Caveat: Spark
    ``length`` counts UTF-16 code units while DuckDB counts code points —
    identical on BMP-only text (fixture contract, asserted in the oracle
    run); an emoji-heavy corpus shifts ``other_ratio`` by the astral
    surrogate count."""
    c = F.col(text_col)
    n = F.length(c)

    def cls_count(pattern: str) -> Column:
        return n - F.length(F.regexp_replace(c, pattern, ""))

    ascii_n = cls_count(r"[A-Za-z]")
    digit_n = cls_count(r"[0-9]")
    space_n = cls_count(r"[ \t\n\r]")
    cjk_n = cls_count(r"[一-鿿]")
    cyr_n = cls_count(r"[Ѐ-ӿ]")
    p = float(10**round_digits)

    def ratio(cnt: Column) -> Column:
        return F.when(n > 0, F.floor(cnt / n * p + F.lit(0.5)) / p).otherwise(
            F.lit(0.0)
        )

    return df.select(
        F.col(id_col),
        n.alias("n_chars"),
        ratio(ascii_n).alias("ascii_alpha_ratio"),
        ratio(digit_n).alias("digit_ratio"),
        ratio(space_n).alias("space_ratio"),
        ratio(cjk_n).alias("cjk_ratio"),
        ratio(cyr_n).alias("cyrillic_ratio"),
        ratio(n - ascii_n - digit_n - space_n - cjk_n - cyr_n).alias(
            "other_ratio"
        ),
    )


def char_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution —
    the classic gibberish/keyboard-mash/compression-artifact filter
    (English prose sits ~4.0-4.5 bits; base64 blobs and mashed keys run
    higher, single-char spam near 0).

    Scale shape: computed ENTIRELY inside the row — sort the char array,
    find run boundaries, run lengths, fold to the entropy sum — so it's
    a scan-speed column expression chain with ZERO shuffle; the naive
    per-CHARACTER explode→groupBy would shuffle one row per character
    (~n_chars ≫ n_docs rows) for a per-doc statistic. Every intermediate
    array binds as a real column first (the lambda-inlining O(len²)
    hazard — see bigram_lm).

    Determinism: each term (c/n)·log2(c/n) is the same IEEE double
    expression in any engine; terms quantize to a 10^12 fixed-point grid
    and integer-sum (order-free), so the DuckDB oracle — which counts
    chars via a plain unnest+groupBy — lands bit-identically. Empty
    documents emit entropy 0."""
    tmp = (
        df.withColumn("__srt", F.array_sort(F.split(F.col(text_col), "")))
        .withColumn("__n", F.size(F.col("__srt")))
        .withColumn(
            "__bnd",
            F.filter(
                F.sequence(F.lit(1), F.col("__n")),
                lambda i: (i == 1)
                | (F.get(F.col("__srt"), i - 1) != F.get(F.col("__srt"), i - 2)),
            ),
        )
        .withColumn(
            "__cnt",
            F.zip_with(
                F.col("__bnd"),
                F.concat(
                    F.slice(F.col("__bnd"), 2, F.size(F.col("__bnd")) - 1),
                    F.array(F.col("__n") + 1),
                ),
                lambda a, b: b - a,
            ),
        )
    )
    acc = F.aggregate(
        F.col("__cnt"),
        F.lit(0).cast("long"),
        lambda a, c: a
        + F.floor(
            (c / F.col("__n")) * F.log2(c / F.col("__n")) * F.lit(1e12)
            + F.lit(0.5)
        ).cast("long"),
    )
    p = float(10**round_digits)
    ent = F.floor((-acc).cast("double") / F.lit(1e12) * p + F.lit(0.5)) / p
    return tmp.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        ent.alias("char_entropy"),
    )


def bigram_logppl(
    df: DataFrame,
    id_col: str,
    text_col: str,
    add_k: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document bigram log-perplexity against the corpus's own add-k
    bigram LM — the contextual upgrade of :func:`unigram_logppl` (a doc
    full of common words in UNCOMMON orders scores high here but low
    there; the two together are the classic cheap fluency/quality pair).
    Completes the scoring skeleton :func:`bigram_lm`'s docstring names.

    score = mean over the doc's bigrams of −ln p(w2|w1), with
    ``p = (c(w1,w2) + k) / (c(w1,·) + k·V)`` from the corpus counts —
    self-scoring, so every doc bigram exists in the counts table and no
    backoff branch is needed (swap the counts/lefts frames for an
    external LM plus a held-out backoff to score against another corpus).

    Determinism: each −ln(p) term is the same IEEE double expression in
    any engine (exact integer counts in, one division, one ln) and
    quantizes to a 10^12 fixed-point grid before the order-free integer
    per-doc sum — bit-identical oracle (same rule as char_entropy).

    Scale shape: TWO bigram explodes (one keyed by doc for scoring, one
    keyless for counting — the counting one is :func:`bigram_lm`'s
    skeleton), a (w1,w2) shuffle join of doc-bigrams against the
    vocabulary²-bounded counts table (NOT broadcast — bigram_lm's rule),
    and a final (doc) groupBy."""
    toks = tokens(text_col)
    k = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, k),
        F.slice(toks, 2, k),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_pairs = (
        df.select(F.col(id_col), F.explode(grams).alias("__g"))
        .select(F.col(id_col), F.col("__g.w1"), F.col("__g.w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    counts = doc_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c"))
    lefts = counts.groupBy("w1").agg(F.sum("__c").alias("__c1"))
    vocab = counts.select("w2").distinct().agg(F.count(F.lit(1)).alias("__v"))
    prob = (F.col("__c") + F.lit(add_k)) / (
        F.col("__c1") + F.lit(add_k) * F.col("__v")
    )
    term_fix = F.floor(-F.log(prob) * F.lit(1e12) + F.lit(0.5)).cast("long")
    scored = (
        doc_pairs.join(counts, ["w1", "w2"])
        .join(lefts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), term_fix.alias("__tf"))
    )
    p = float(10**round_digits)
    return scored.groupBy(id_col).agg(
        (
            F.floor(
                F.sum("__tf").cast("double")
                / F.count(F.lit(1))
                / F.lit(1e12)
                * p
                + F.lit(0.5)
            )
            / p
        ).alias("bigram_logppl"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


def dedupe_doc_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """INTRA-document duplicate-line removal (the Dolma/Gopher "dedupe
    paragraphs" cleanup): within each document, repeated non-blank lines
    keep only their FIRST occurrence (trimmed-form comparison); blank
    lines are structure and always survive. The in-document complement of
    :func:`remove_boilerplate_lines` (which drops CROSS-document
    repeats) — chain both for the full repetition cleanup.

    Scale shape: computed ENTIRELY inside the row — bound line/trim
    arrays, a first-occurrence index filter, and an ordered rejoin — so
    it's a zero-shuffle scan-speed transform (no line table, no
    frequency join; nothing leaves the row). The first-occurrence test is
    array_position per line — O(lines²) per doc on the SMALL per-doc
    line count, the same in-row trade chunk_documents makes; the
    cross-doc operator keeps the explode+join shape because its
    frequency is corpus-global.

    Returns (id, n_lines, n_kept, cleaned_text) — row-preserving."""
    tmp = (
        df.withColumn("__ls", F.split(F.col(text_col), r"\n"))
        # NOT F.transform(col, F.trim): transform feeds (element, index)
        # to two-arg callables, and trim's second parameter is the
        # deprecated trimStr — the index would silently become the
        # character set to strip. The 1-arg lambda pins the right overload.
        .withColumn("__lt", F.transform(F.col("__ls"), lambda x: F.trim(x)))
        .withColumn("__n", F.size(F.col("__ls")))
    )
    keep_idx = F.filter(
        F.sequence(F.lit(1), F.col("__n")),
        lambda i: (F.get(F.col("__lt"), i - 1) == "")
        | (F.array_position(F.col("__lt"), F.get(F.col("__lt"), i - 1)) == i),
    )
    tmp = tmp.withColumn("__keep", keep_idx)
    cleaned = F.array_join(
        F.transform(F.col("__keep"), lambda i: F.get(F.col("__ls"), i - 1)),
        "\n",
    )
    return tmp.select(
        F.col(id_col),
        F.col("__n").alias("n_lines"),
        F.size(F.col("__keep")).cast("long").alias("n_kept"),
        cleaned.alias("cleaned_text"),
    )


def term_distribution_jsd(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Jensen-Shannon divergence between two corpora's unigram
    distributions — the TEXT drift monitor pairing aggregates.psi_drift's
    numeric binning: JSD(P‖Q) = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2, in
    bits ∈ [0, 1]; symmetric and finite even for vocabulary
    disappearances (unlike raw KL). Returns ONE row
    (jsd_bits, n_terms_a, n_terms_b, vocab) — run per (source, week,
    snapshot version…) by filtering the inputs.

    Scale shape: one explode→(term) groupBy per side, a full-outer
    vocabulary join on term (NOT broadcast — bigram_lm's rule), then a
    1-row aggregate. Totals ride 1-row broadcast scalars.

    Determinism: counts are exact ints; p, q, and the two log terms are
    the same IEEE expression per term in any engine and quantize to a
    10^12 fixed-point grid before the order-free integer sum (the
    char_entropy rule) — bit-identical oracle."""
    def counts(d: DataFrame, name: str) -> DataFrame:
        return (
            d.select(F.explode(tokens(text_col)).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca, cb = counts(df_a, "__ca"), counts(df_b, "__cb")
    joined = ca.join(cb, "term", "full_outer").select(
        "term",
        F.coalesce("__ca", F.lit(0)).alias("__ca"),
        F.coalesce("__cb", F.lit(0)).alias("__cb"),
    )
    tot = joined.agg(
        F.sum("__ca").alias("__ta"), F.sum("__cb").alias("__tb")
    )
    j = joined.crossJoin(F.broadcast(tot))
    p = F.col("__ca") / F.col("__ta")
    q = F.col("__cb") / F.col("__tb")
    m = (p + q) / 2
    term_bits = (
        F.when(F.col("__ca") > 0, p * F.log2(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("__cb") > 0, q * F.log2(q / m)).otherwise(F.lit(0.0))
    ) / 2
    tf = F.floor(term_bits * F.lit(1e12) + F.lit(0.5)).cast("long")
    p10 = float(10**round_digits)
    return j.agg(
        (
            F.floor(F.sum(tf).cast("double") / F.lit(1e12) * p10 + F.lit(0.5))
            / p10
        ).alias("jsd_bits"),
        F.first("__ta").alias("n_terms_a"),
        F.first("__tb").alias("n_terms_b"),
        F.count(F.lit(1)).alias("vocab"),
    )


def _fuzzy_blocks(
    df: DataFrame, col: str, max_dist: int, q: int
) -> DataFrame:
    """Shared blocking kernel for the fuzzy-join family: (``__k``,
    ``__block``) rows over the DISTINCT non-null values of ``col``.

    Lossless by construction (two strings within ``max_dist`` edits are
    guaranteed ≥1 shared block):

    - a string has ``len−q+1`` positional q-grams and one edit destroys
      at most ``q`` of them, so two strings within ``max_dist`` edits and
      length ≥ ``q·(max_dist+1)`` share at least one q-gram — those block
      on their DISTINCT q-grams (the ED-Join/Pass-Join count-filter
      bound);
    - any pair with a SHORTER member has both lengths
      < ``q·(max_dist+1)+max_dist`` (the length band transfers the
      bound). Short strings block BY LENGTH, not into one shared bucket:
      a string of length L emits tags ``§s{t}`` for t ∈ [L, L+max_dist],
      so a qualifying pair (len_a ≤ len_b ≤ len_a+max_dist) always shares
      the tag of the LONGER length — still lossless, but one block now
      holds only strings from a ``max_dist+1``-wide length window instead
      of every short value in the corpus (real short-string columns —
      codes, SKUs, usernames — can hold millions of distinct values; one
      shared block would be quadratic in all of them)."""
    short_bound = q * (max_dist + 1) + max_dist
    keys = df.select(F.col(col).cast("string").alias("__k")).filter(
        F.col("__k").isNotNull()
    ).distinct()
    grams = keys.select(
        "__k",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length(__k) - {q - 1}, 1)),"
                    f" i -> substring(__k, i, {q}))"
                )
            )
        ).alias("__block"),
    )
    short = keys.filter(F.length("__k") < short_bound).select(
        "__k",
        F.explode(
            F.expr(
                "transform(sequence(length(__k), "
                f"length(__k) + {max_dist}), t -> concat('§s', t))"
            )
        ).alias("__block"),
    )
    return grams.unionByName(short)


def _fuzzy_candidates(
    left_blocks: DataFrame,
    right_blocks: DataFrame,
    left_out: str,
    right_out: str,
    self_mode: bool,
    max_block: int | None,
    log_truncated: bool,
) -> DataFrame:
    """Candidate pairs from two block tables (the verify step — length
    band + levenshtein — is the caller's).

    ``max_block`` is the hot-block degrade knob, same territory as
    ``minhash_candidates.max_bucket`` (dedup.py): with the default
    ``None`` every block expands all its pairs and the output provably
    equals the naive all-pairs filter (the gated DuckDB oracles pin
    exactly that). With a cap, a block whose pair workload exceeds
    ``max_block`` (members for the self-join, left·right product for the
    two-sided join) degrades to a STAR join against the block's min key
    — every member still pairs with the representative, so O(k) pairs
    instead of O(k²), at the price of recall (output ⊆ naive; pinned in
    tests). One stop-gram over a 10⁸-distinct vocabulary is otherwise a
    single quadratic block no partitioning can save.
    ``log_truncated=True`` runs one extra small count job and logs how
    many blocks were degraded."""
    if max_block is not None:
        sizes = (
            left_blocks.groupBy("__block")
            .agg(
                F.count(F.lit(1)).alias("__nl"),
                F.min("__k").alias("__repl"),
            )
        )
        if self_mode:
            sizes = sizes.select(
                "__block",
                (F.col("__nl") * F.col("__nl")).alias("__work"),
                F.col("__repl").alias("__rep"),
            )
        else:
            right_sizes = (
                right_blocks.groupBy("__block")
                .agg(
                    F.count(F.lit(1)).alias("__nr"),
                    F.min("__k").alias("__repr"),
                )
            )
            sizes = sizes.join(right_sizes, "__block").select(
                "__block",
                (F.col("__nl") * F.col("__nr")).alias("__work"),
                "__repl",
                "__repr",
            )
        if log_truncated:
            n_trunc = sizes.filter(F.col("__work") > max_block).count()
            if n_trunc:
                import logging

                logging.getLogger(__name__).warning(
                    "fuzzy join: %d blocks exceed max_block=%d — "
                    "degraded to star pairs against the block min",
                    n_trunc, max_block,
                )
        hot = F.col("__work") > max_block
        lb = left_blocks.join(sizes, "__block")
        if self_mode:
            a = lb.alias("a")
            b = left_blocks.alias("b")
            small = (
                a.filter(~hot)
                .join(
                    b,
                    (F.col("a.__block") == F.col("b.__block"))
                    & (F.col("a.__k") < F.col("b.__k")),
                )
                .select(
                    F.col("a.__k").alias(left_out),
                    F.col("b.__k").alias(right_out),
                )
            )
            # Star degrade: each member of a hot block pairs with the
            # block min only (rep < k always, so ordering is free).
            big = (
                lb.filter(hot)
                .filter(F.col("__k") != F.col("__rep"))
                .select(
                    F.col("__rep").alias(left_out),
                    F.col("__k").alias(right_out),
                )
            )
        else:
            rb = right_blocks.withColumnRenamed("__k", "__kr")
            small = (
                lb.filter(~hot)
                .join(rb, "__block")
                .select(
                    F.col("__k").alias(left_out),
                    F.col("__kr").alias(right_out),
                )
            )
            # Star degrade, two-sided: every left member pairs with the
            # min right key and every right member with the min left key
            # — both are genuine (left, right) candidates, O(nl+nr).
            hot_sizes = sizes.filter(hot)
            big = (
                lb.filter(hot)
                .select(
                    F.col("__k").alias(left_out),
                    F.col("__repr").alias(right_out),
                )
                .unionByName(
                    rb.join(hot_sizes, "__block").select(
                        F.col("__repl").alias(left_out),
                        F.col("__kr").alias(right_out),
                    )
                )
            )
        cand = small.unionByName(big)
    else:
        if self_mode:
            a, b = left_blocks.alias("a"), left_blocks.alias("b")
            cand = a.join(
                b,
                (F.col("a.__block") == F.col("b.__block"))
                & (F.col("a.__k") < F.col("b.__k")),
            ).select(
                F.col("a.__k").alias(left_out),
                F.col("b.__k").alias(right_out),
            )
        else:
            cand = (
                left_blocks.withColumnRenamed("__k", left_out)
                .join(
                    right_blocks.withColumnRenamed("__k", right_out),
                    "__block",
                )
                .select(left_out, right_out)
            )
    return cand.dropDuplicates([left_out, right_out])


def fuzzy_self_join(
    df: DataFrame,
    key_col: str,
    max_dist: int = 2,
    q: int = 2,
    max_block: int | None = None,
    log_truncated: bool = False,
) -> DataFrame:
    """Entity-resolution fuzzy self-join: all DISTINCT value pairs of
    ``key_col`` within Levenshtein distance ``max_dist`` — (key_a, key_b,
    dist) with key_a < key_b — WITHOUT the O(n²) cross join.

    Blocking is LOSSLESS at the default ``max_block=None`` (the output
    provably equals the naive all-pairs filter, which is exactly what the
    DuckDB oracle computes) — see :func:`_fuzzy_blocks` for the q-gram +
    length-banded-short proof. ``max_block`` caps a hot block's pair
    workload (|block|² for the self-join): oversized blocks degrade to a
    star join against the block's min key (output ⊆ naive, clusters stay
    connected through the representative) — the skew knob a 100 TB corpus
    with one stop-gram needs; ``log_truncated=True`` logs how many blocks
    degraded. Verification: candidates dedupe, pass the ``|len_a−len_b| ≤
    max_dist`` band (free, before the DP), and only then pay
    ``levenshtein`` — the classic filter-verification shape. Scale: work
    is Σ_block |block|² over q-gram blocks of the DISTINCT value set
    (vocabulary-sized, not row-sized — dedupe first is the point)."""
    blocks = _fuzzy_blocks(df, key_col, max_dist, q)
    cand = _fuzzy_candidates(
        blocks, blocks, "key_a", "key_b", True, max_block, log_truncated
    )
    return (
        cand.filter(
            F.abs(F.length("key_a") - F.length("key_b")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("key_a", "key_b"))
        .filter(F.col("dist") <= max_dist)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 2,
    max_block: int | None = None,
    log_truncated: bool = False,
) -> DataFrame:
    """Two-sided record linkage: all (left value, right value) DISTINCT
    pairs within Levenshtein ``max_dist`` — (key_left, key_right, dist) —
    with the same LOSSLESS blocking as :func:`fuzzy_self_join` (shared
    q-gram blocks for long strings, length-banded blocks for short ones;
    length band before the DP verify — see :func:`_fuzzy_blocks`).
    ``max_block`` caps a hot block's pair workload (|left block| ×
    |right block| here): oversized blocks degrade to star pairs against
    each side's min key (output ⊆ naive; the default ``None`` stays
    exact, which is what the gated oracle pins). Use it to reconcile a
    column against a reference list (canonical vendor names, known
    titles) without the cross join; dedupe-within-one-table is the
    self-join variant."""
    lb = _fuzzy_blocks(left, left_col, max_dist, q)
    rb = _fuzzy_blocks(right, right_col, max_dist, q)
    cand = _fuzzy_candidates(
        lb, rb, "key_left", "key_right", False, max_block, log_truncated
    )
    return (
        cand.filter(
            F.abs(F.length("key_left") - F.length("key_right")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("key_left", "key_right"))
        .filter(F.col("dist") <= max_dist)
    )
