"""ML / statistical layer (SURVEY §2.9)."""

from .regression import (  # noqa: F401
    GBT_DEFAULTS,
    assemble_features,
    evaluate_rmse,
    fit_gbt,
    train_test_split,
    train_weather_model,
)
