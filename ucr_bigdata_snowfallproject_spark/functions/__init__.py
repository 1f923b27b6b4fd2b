"""Scalar column expressions (SURVEY §2.8)."""

from .scalars import (  # noqa: F401
    clean_observations,
    elevation_label,
    extract_year,
    parse_gsod_line,
    station_label,
    strip_quality_flag,
    strip_trailing_char,
    to_yearmoda_date,
    with_date_parts,
)
