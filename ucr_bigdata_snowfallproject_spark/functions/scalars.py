"""Scalar functions F1-F10 (SURVEY §2.8) as pure Column expressions.

Everything here is built-in `pyspark.sql.functions` composition — JVM-side,
inside whole-stage codegen, zero Python per row.  The reference implements
each of these as an eager pandas ``.apply`` lambda (row-at-a-time Python);
that difference *is* the 10-100× hot-path win.

Reference-bug policy (SURVEY §7.4): where the reference's code is buggy,
the engine implements the evident intent and the tests pin the divergence:

- F3: ``re.sub(x, x[:-1], x)`` (untitled.py:54) treats the *value* as the
  regex — intent is "strip the trailing quality-flag char" →
  :func:`strip_trailing_char`.
- F6: ``~np.isnan(x)`` (untitled.py:34) is a bitwise-not on a scalar bool —
  intent is the null check → :func:`elevation_label` uses ``isNotNull``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_year(col: Column | str, anchored: bool = True) -> Column:
    """F1 regex year extraction (reference untitled.py:23,29-30): the
    ``^\\d{4}`` prefix of BEGIN/END, or the first digit run of a filename."""
    pattern = r"^(\d{4})" if anchored else r"(\d+)"
    return F.regexp_extract(F.col(col) if isinstance(col, str) else col, pattern, 1).cast("int")


def strip_quality_flag(col: Column | str) -> Column:
    """F2 (reference untitled.py:49-50): drop the trailing ``*`` quality
    flag from MAX/MIN and cast numeric."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"\*$", "").cast("double")


def strip_trailing_char(col: Column | str) -> Column:
    """F3 *intent* (reference untitled.py:54 is buggy — see module doc):
    drop the final quality-flag character of PRCP and cast numeric."""
    c = F.col(col) if isinstance(col, str) else col
    return c.substr(F.lit(1), F.length(c) - 1).cast("double")


def station_label(name: Column, state: Column, ctry: Column) -> Column:
    """F5 null-skipping comma concat (reference untitled.py:33
    ``str.cat(sep=', ')``): concat_ws drops NULLs, matching pandas
    ``str.cat`` over non-null members."""
    return F.concat_ws(", ", name, state, ctry)


def elevation_label(elev: Column) -> Column:
    """F6 conditional label (reference untitled.py:34, intent — the
    reference's ``~np.isnan`` is buggy, see module doc): NULL stays NULL."""
    return F.when(
        elev.isNotNull(), F.concat(F.lit("Elevation: "), elev.cast("string"), F.lit(" m"))
    )


def full_station_label(name: Column, state: Column, ctry: Column, elev: Column) -> Column:
    """LBL column (reference untitled.py:33-35): place line + elevation line
    joined by ``<br>``, null-skipping."""
    return F.concat_ws("<br>", station_label(name, state, ctry), elevation_label(elev))


def to_yearmoda_date(col: Column | str) -> Column:
    """F8 yyyyMMdd → date (reference untitled.py:56; its
    ``errors='ignore'`` silently keeps garbage — engine policy: invalid
    input becomes NULL, pinned by tests)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c.cast("string"), "yyyyMMdd")


def with_date_parts(df: DataFrame, date_col: str) -> DataFrame:
    """F9 date-part derivation (reference untitled.py:57-59)."""
    c = F.col(date_col)
    return df.withColumns(
        {"YEAR": F.year(c), "MONTH": F.month(c), "DAY": F.dayofmonth(c)}
    )


def parse_gsod_line(value: Column, indices: Sequence[int]) -> Column:
    """S5/S6: collapse whitespace runs and split (reference untitled.py:77),
    returning the positional fields kept by the reference (untitled.py:47).
    Produces an array column; callers project elements to named columns."""
    arr = F.split(F.regexp_replace(F.trim(value), r" +", ","), ",")
    return F.array(*[arr.getItem(i) for i in indices])


def clean_observations(df: DataFrame) -> DataFrame:
    """The observation-cleaning transform (reference untitled.py:48-59):

    - MAX/MIN: strip trailing ``*`` flag, cast double (F2/F7)
    - PRCP: strip trailing quality-flag char, cast double (F3 intent)
    - YEARMODA: parse yyyyMMdd → date, derive YEAR/MONTH/DAY (F8/F9)
    """
    out = df.withColumns(
        {
            "MAX": strip_quality_flag("MAX"),
            "MIN": strip_quality_flag("MIN"),
            "PRCP": strip_trailing_char("PRCP"),
            "YEARMODA": to_yearmoda_date("YEARMODA"),
        }
    )
    return with_date_parts(out, "YEARMODA")
