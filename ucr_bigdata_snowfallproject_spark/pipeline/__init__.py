"""The end-to-end GSOD weather pipeline (SURVEY §3.1 redesign)."""

from .gsod import (  # noqa: F401
    clean_stations,
    join_stations,
    latest_day,
    map_export,
    monthly_medians,
    run_pipeline,
)
