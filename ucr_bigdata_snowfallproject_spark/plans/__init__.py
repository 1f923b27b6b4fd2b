"""Plan-inspection helpers (SURVEY §4)."""

from .checks import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
)
