"""Pandas-UDF surface (X7, SURVEY §2.12): the Arrow-vectorized slow path,
for when built-in column expressions genuinely can't express the logic.

Policy (SURVEY §2.12): the reference's row-wise ``.apply`` lambdas
(untitled.py:33-35,49-54) all map to built-ins in this engine — these UDFs
exist to expose the full Spark UDF surface with the right performance
shape: ``pandas_udf`` scalar (Arrow batches, ~10-100× faster than row
Python UDFs) and grouped-agg flavors. Anything expressible as a builtin
stays a builtin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def vowel_ratio(text: pd.Series) -> pd.Series:
    """Scalar pandas_udf: vowels / total chars (a stand-in for any
    per-string Python logic). Vectorized pandas string ops over Arrow
    batches — one Python roundtrip per batch, not per row."""
    return text.str.lower().str.count(r"[aeiou]") / text.str.len()


@pandas_udf("double")
def geometric_mean(values: pd.Series) -> float:
    """Grouped-agg pandas_udf: exp(mean(log x)) per group. The UDAF shape —
    Spark feeds each group's column as one Series; only the scalar result
    crosses back."""
    return float(np.exp(np.log(values[values > 0]).mean()))
