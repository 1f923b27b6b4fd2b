"""Skew mitigation (SURVEY §4 100 TB notes): salting rewrites for hot keys.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session defaults); these
operators are the explicit rewrites for the cases AQE can't fix:

- :func:`salted_group_agg` — two-stage aggregation: stage 1 aggregates on
  (key, salt) spreading a hot key over ``n_salts`` reducers, stage 2 merges
  per key. Works for any algebraic aggregate (sum/count/min/max/avg —
  avg decomposes to sum+count). The classic fix when ONE group holds 10% of
  100 TB and a single reducer would spill forever.
- :func:`salted_join` — replicate the small side ×n_salts, salt the big
  side deterministically; the shuffle key becomes (key, salt) so a hot key
  spreads over n_salts reducers.

Salts are deterministic (hash-derived, never rand()) so results are
reproducible and retried tasks are idempotent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate spec name -> (partial expr builder, merge expr builder)
_ALGEBRAIC = {"sum", "count", "min", "max", "avg"}


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation, semantically identical to
    ``df.groupBy(keys).agg(...)``.

    ``aggs`` is a list of (column, fn, alias) with fn in
    sum/count/min/max/avg. The salt is ``xxhash64(all columns) % n_salts``
    — deterministic, uniform, and independent of the group key.

    Plan shape: exchange on (keys, salt) → partial agg → exchange on (keys)
    → merge. Two narrow shuffles instead of one skewed one; stage-2 input
    is ≤ n_salts rows per group regardless of raw skew.
    """
    for _, fn, _ in aggs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).alias("__salt")

    partials, merges = [], []
    for col, fn, alias in aggs:
        if fn == "avg":
            partials += [
                F.sum(col).alias(f"__s_{alias}"),
                F.count(col).alias(f"__c_{alias}"),
            ]
            merges.append(
                (F.sum(f"__s_{alias}") / F.sum(f"__c_{alias}")).alias(alias)
            )
        elif fn == "count":
            partials.append(F.count(col).alias(f"__p_{alias}"))
            merges.append(F.sum(f"__p_{alias}").cast("long").alias(alias))
        else:
            partials.append(getattr(F, fn)(col).alias(f"__p_{alias}"))
            merge_fn = F.sum if fn == "sum" else getattr(F, fn)
            merges.append(merge_fn(f"__p_{alias}").alias(alias))

    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*merges)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: ``small`` is replicated ×``n_salts`` (one
    copy per salt value), ``big`` rows get a deterministic salt; joining on
    (keys, salt) spreads each hot key over ``n_salts`` reducers.

    Use when the small side is too big to broadcast but the big side has
    hot keys. Cost: small side shuffles ×n_salts — pick the smallest
    ``n_salts`` that flattens the skew.

    Only join types that never emit unmatched SMALL-side rows are allowed
    (inner/left/semi/anti): the small side is replicated ×``n_salts``, so a
    right/full outer join would emit every unmatched small-side row once
    per salt replica. Rewrite outer joins around an inner salted core.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only, not {how!r}: the "
            "replicated small side would duplicate unmatched rows ×n_salts"
        )
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [*keys, "__salt"], how).drop("__salt")
