"""MLlib regression pipeline (SURVEY §2.9, M1-M5; reference
untitled.py:167-241).

Reference-divergence policy (SURVEY §7.4):

- M2: the reference's ``randomSplit`` is unseeded (untitled.py:175-177) →
  non-reproducible holdouts. Engine defaults to ``seed=42``.
- M4: the reference's ``RegressionEvaluator`` import is commented out
  (untitled.py:99-100), so its line 238 raises NameError. The engine
  evaluates RMSE as a plain aggregate (A5) — no evaluator import needed —
  with the MLlib evaluator available behind the same number.
- Caching: the reference refits lineage every boosting iteration; engine
  caches the training split before ``fit`` (SURVEY §3.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference hyperparameters (untitled.py:231-232)
GBT_DEFAULTS = {"maxIter": 100, "seed": 42}

#: reference feature set (untitled.py:168-170)
WEATHER_FEATURES = ["TEMP", "DEWP", "WDSP", "MAX", "MIN"]
WEATHER_LABEL = "PRCP"


def assemble_features(
    df: DataFrame, input_cols: Sequence[str], output_col: str = "features"
) -> DataFrame:
    """M1 (reference untitled.py:168-170): dense feature vector assembly.
    VectorUDT stays inside this layer — engine canon elsewhere is plain
    arrays (SURVEY §7.4)."""
    return VectorAssembler(
        inputCols=list(input_cols), outputCol=output_col, handleInvalid="skip"
    ).transform(df)


def train_test_split(
    df: DataFrame, weights: Sequence[float] = (0.7, 0.3), seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """M2 with a fixed default seed (the reference's unseeded split at
    untitled.py:175-177 is non-reproducible — SURVEY §5.4 determinism)."""
    train, test = df.randomSplit(list(weights), seed=seed)
    return train, test


def fit_gbt(
    train: DataFrame,
    label_col: str,
    features_col: str = "features",
    max_iter: int = GBT_DEFAULTS["maxIter"],
    seed: int = GBT_DEFAULTS["seed"],
) -> object:
    """M3 (reference untitled.py:231-233). ``train`` is cached before the
    ~max_iter sequential tree fits (each is a distributed aggregation —
    without the cache, lineage re-executes per iteration)."""
    train = train.cache()
    model = GBTRegressor(
        featuresCol=features_col, labelCol=label_col, maxIter=max_iter, seed=seed
    ).fit(train)
    train.unpersist()
    return model


def evaluate_rmse(predictions: DataFrame, label_col: str) -> float:
    """M4/A5 as a plain aggregate (reference untitled.py:238-240 — whose
    evaluator import is commented out and would NameError; SURVEY §7.4)."""
    row = predictions.agg(
        F.sqrt(F.avg(F.pow(F.col("prediction") - F.col(label_col), F.lit(2)))).alias("rmse")
    ).collect()[0]
    return float(row["rmse"])


def train_weather_model(
    df: DataFrame,
    features: Sequence[str] = tuple(WEATHER_FEATURES),
    label: str = WEATHER_LABEL,
    max_iter: int = GBT_DEFAULTS["maxIter"],
    seed: int = 42,
) -> tuple[PipelineModel, DataFrame, float]:
    """M1→M4 end-to-end as a proper ``pyspark.ml.Pipeline`` (SURVEY §3.3
    redesign of untitled.py:167-241): assemble → split → GBT → RMSE.

    Returns (fitted pipeline, test predictions, rmse).
    """
    clean = df.dropna(subset=[*features, label])
    train, test = train_test_split(clean, seed=seed)
    train = train.cache()
    pipeline = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=list(features), outputCol="features", handleInvalid="skip"
            ),
            GBTRegressor(
                featuresCol="features", labelCol=label, maxIter=max_iter, seed=seed
            ),
        ]
    )
    model = pipeline.fit(train)
    predictions = model.transform(test)
    rmse = evaluate_rmse(predictions, label)
    train.unpersist()
    return model, predictions, rmse


def fit_random_forest(
    train: DataFrame,
    label_col: str,
    features_col: str = "features",
    n_trees: int = 100,
    seed: int = 42,
) -> object:
    """M5 (reference's dead-code sklearn RandomForestRegressor at
    untitled.py:135-151,211-227, resurrected on MLlib): unlike GBT's
    sequential boosting, forest trees fit independently — embarrassingly
    parallel across the cluster, the cheaper choice at 100 TB."""
    from pyspark.ml.regression import RandomForestRegressor

    train = train.cache()
    model = RandomForestRegressor(
        featuresCol=features_col, labelCol=label_col, numTrees=n_trees, seed=seed
    ).fit(train)
    train.unpersist()
    return model


def tune_gbt(
    train: DataFrame,
    label_col: str,
    features_col: str = "features",
    max_iter_grid: Sequence[int] = (5, 20),
    max_depth_grid: Sequence[int] = (3, 5),
    n_folds: int = 3,
    seed: int = GBT_DEFAULTS["seed"],
) -> tuple[object, DataFrame]:
    """Seeded k-fold cross-validated hyperparameter sweep for the GBT
    model (the tuning loop the reference's notebook did by hand-editing
    constants; M3 extension). Returns (best_model, metrics) where
    ``metrics`` is a DataFrame (max_iter, max_depth, avg_rmse) over the
    grid — the artifact a user inspects before trusting the pick.

    Scale notes: CrossValidator with ``parallelism=4`` fits grid×folds
    models concurrently — each fit is itself distributed, so parallelism
    multiplies cluster load, not wall-clock alone; ``train`` is cached
    once for all fits. The seed fixes the fold split → the sweep is
    reproducible run-over-run."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    gbt = GBTRegressor(featuresCol=features_col, labelCol=label_col, seed=seed)
    grid = (
        ParamGridBuilder()
        .addGrid(gbt.maxIter, list(max_iter_grid))
        .addGrid(gbt.maxDepth, list(max_depth_grid))
        .build()
    )
    evaluator = RegressionEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="rmse"
    )
    cv = CrossValidator(
        estimator=gbt,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=n_folds,
        seed=seed,
        parallelism=4,
    )
    train = train.cache()
    model = cv.fit(train)
    train.unpersist()
    spark = train.sparkSession
    rows = [
        (
            int(pm[gbt.maxIter]),
            int(pm[gbt.maxDepth]),
            float(m),
        )
        for pm, m in zip(grid, model.avgMetrics)
    ]
    metrics = spark.createDataFrame(
        rows, "max_iter int, max_depth int, avg_rmse double"
    )
    return model.bestModel, metrics
