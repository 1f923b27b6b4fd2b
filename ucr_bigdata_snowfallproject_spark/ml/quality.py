"""Model-based quality classification for corpus curation.

The fastText-style filtering recipe (used by GPT-3/LLaMA-class pipelines):
train a cheap linear classifier to distinguish a REFERENCE slice of the
corpus (high-quality domain, curated source) from the rest, then keep
documents the model scores as reference-like. Features here are the
engine's own scan-speed text signals (no vocabulary explosion, no Python):
length, token stats, stopword ratio, punctuation/digit/upper densities —
the same family fastText's char-ngram averages approximate.

Everything is seeded and pipeline-shaped (SURVEY §2.9 conventions:
VectorUDT stays inside this layer, outputs are plain columns).

Scale: featurization is pure column expressions at scan speed; logistic
regression training is a handful of distributed LBFGS passes over the
(tiny) feature vectors; scoring is one scan. No shuffle anywhere but the
optimizer's tree aggregations.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import text as text_ops

#: the scan-speed feature columns :func:`featurize` emits.
QUALITY_FEATURES = [
    "f_len",
    "f_n_tokens",
    "f_mean_token_len",
    "f_stopword_ratio",
    "f_punct_density",
    "f_digit_density",
    "f_upper_density",
    "f_space_density",
]


def featurize(df: DataFrame, text_col: str) -> DataFrame:
    """Append the :data:`QUALITY_FEATURES` columns — all pure column
    expressions (X4 text signals), no UDFs, scan-speed at 100 TB.

    Every feature is total: NULL text coalesces to "" and the token-count
    divisor is floored at 1, so no row ever carries a null feature — and
    the assembler's ``handleInvalid='skip'`` safety net never silently
    drops a document (every input row gets scored downstream)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.greatest(F.length(c), F.lit(1)).cast("double")
    n_tokens = F.greatest(text_ops.token_count(c), F.lit(1))
    return (
        df.withColumn("f_len", F.length(c).cast("double"))
        .withColumn("f_n_tokens", text_ops.token_count(c).cast("double"))
        .withColumn(
            "f_mean_token_len",
            F.length(F.regexp_replace(c, r"\s+", "")) / n_tokens,
        )
        .withColumn("f_stopword_ratio", text_ops.stopword_ratio(c))
        .withColumn(
            "f_punct_density", F.length(F.regexp_replace(c, r"[^.,;:!?]", "")) / n_chars
        )
        .withColumn(
            "f_digit_density", F.length(F.regexp_replace(c, r"[^0-9]", "")) / n_chars
        )
        .withColumn(
            "f_upper_density", F.length(F.regexp_replace(c, r"[^A-Z]", "")) / n_chars
        )
        .withColumn(
            "f_space_density", F.length(F.regexp_replace(c, r"[^ ]", "")) / n_chars
        )
    )


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    seed: int = 42,
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> PipelineModel:
    """Fit the reference-vs-rest logistic regression: ``label_col`` is a
    0/1 column (1 = reference slice). Features are standardized so the
    LBFGS solution is scale-free; the whole thing is one MLlib Pipeline
    (assemble → scale → LR), seeded for reproducibility."""
    pipe = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=QUALITY_FEATURES, outputCol="__raw", handleInvalid="skip"
            ),
            StandardScaler(inputCol="__raw", outputCol="__features", withMean=True),
            LogisticRegression(
                featuresCol="__features",
                labelCol=label_col,
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return pipe.fit(featurize(df, text_col))


def score_quality(
    model: PipelineModel,
    df: DataFrame,
    text_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Score documents with the trained classifier: appends
    ``quality_prob`` (P(reference-like), rounded for determinism across
    partitionings). Input columns pass through untouched."""
    scored = model.transform(featurize(df, text_col))
    keep = [c for c in df.columns]
    return scored.select(
        *keep,
        F.round(
            vector_to_array(F.col("probability")).getItem(1), round_digits
        ).alias("quality_prob"),
    )


def quality_filter(
    model: PipelineModel,
    df: DataFrame,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Keep documents the classifier scores at/above ``threshold`` — the
    model-based keep/drop curation stage."""
    return score_quality(model, df, text_col).filter(
        F.col("quality_prob") >= threshold
    )


def export_linear_scorer(model: PipelineModel) -> dict[str, float]:
    """Export the trained classifier as a PLAIN weight dict over the raw
    :data:`QUALITY_FEATURES` (scaler folded in: ``w_i' = w_i/σ_i``,
    ``b' = b − Σ w_i·μ_i/σ_i``) plus ``__intercept`` — the shipped-config
    artifact of the fastText-filter recipe. Training stays an MLlib job;
    APPLYING the model needs none of MLlib: the exported weights drive
    :func:`score_quality_linear`'s pure column expressions, engine-
    portable and cheap enough to inline into any scan (the
    train-offline / score-as-config production split)."""
    scaler = model.stages[1]
    lr = model.stages[2]
    coef = lr.coefficients.toArray()
    mean = scaler.mean.toArray()
    std = scaler.std.toArray()
    out: dict[str, float] = {}
    b = float(lr.intercept)
    for i, name in enumerate(QUALITY_FEATURES):
        s = float(std[i]) if float(std[i]) != 0.0 else 1.0
        out[name] = float(coef[i]) / s
        b -= float(coef[i]) * float(mean[i]) / s
    out["__intercept"] = b
    return out


def score_quality_linear(
    df: DataFrame,
    text_col: str,
    weights: dict[str, float],
    out_col: str = "quality_logit",
    round_digits: int = 6,
) -> DataFrame:
    """Score documents with an EXPORTED weight artifact
    (:func:`export_linear_scorer`, or any fixed published weights): the
    raw-feature logit ``b + Σ w_i·f_i`` as one left-folded column
    expression — zero MLlib, zero UDFs, scan speed at 100 TB, and fully
    deterministic (each feature is a ratio of exact integers; the fold
    order is fixed by construction, so the double arithmetic is
    bit-identical in any engine — a DuckDB oracle hash-matches the
    ROUNDED logit). The sigmoid is intentionally NOT applied: exp() is
    only 1-ulp-accurate and libm-dependent, while thresholding is
    monotone in the logit anyway (prob ≥ p ⟺ logit ≥ ln(p/(1−p)))."""
    feats = featurize(df, text_col)
    logit: F.Column = F.lit(float(weights["__intercept"]))
    for name in QUALITY_FEATURES:
        logit = logit + F.lit(float(weights[name])) * F.col(name)
    keep = [c for c in df.columns]
    return feats.select(*keep, F.round(logit, round_digits).alias(out_col))
