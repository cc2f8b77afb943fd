"""Display/formatting helpers — Column twins of the reference's shared
utilities (``shared/utils.py``): truncate_string (:54-57), format_number
(:50-51), format_percentage (:36-37), format_timestamp (:24-25),
calculate_percentage (:29-33), safe_divide (:41-44).

These are display-only (SURVEY F8/F9 — not correctness-bearing for the
keep/drop pipeline) but complete the operator inventory.  All native
expressions (whole-stage codegen), no Python.

One documented divergence: the reference formats floats with Python's
``f"{v:.1f}"`` (round-half-even on exact ties); Spark's ``format_string``
goes through java.util.Formatter (HALF_UP on ties).  Ties at the printed
precision (e.g. 0.25 → '0.2' vs '0.3') differ; every non-tie value agrees.
Where HALF_EVEN matters for a *numeric* result the engine uses ``bround``
(quirk 6) — this caveat is strictly about rendered strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def truncate_string(
    col: Column, max_length: int = 50, suffix: str = "..."
) -> Column:
    """shared/utils.py:54-57: text unchanged when it fits, else a
    hard-truncated prefix with the suffix appended (total == max_length)."""
    keep = max_length - len(suffix)
    return F.when(
        col.isNull() | (F.length(col) <= max_length), col
    ).otherwise(F.concat(F.substring(col, 1, keep), F.lit(suffix)))


def format_number(col: Column) -> Column:
    """shared/utils.py:50-51: thousands separators (f"{value:,}")."""
    return F.format_number(col, 0)


def format_percentage(col: Column, decimals: int = 1) -> Column:
    """shared/utils.py:36-37: f"{value:.1f}%" (see module docstring for the
    tie-rounding caveat)."""
    return F.format_string(f"%.{decimals}f%%", col)


def format_timestamp(col: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """shared/utils.py:24-25 (strftime → date_format pattern syntax)."""
    return F.date_format(col, fmt)


def calculate_percentage(part: Column, total: Column, decimals: int = 2) -> Column:
    """shared/utils.py:29-33: 0.0 when total == 0, else bround (the
    reference's round() is Python's HALF_EVEN — quirk 6)."""
    return F.bround(
        F.when(total > 0, part.cast("double") / total.cast("double") * 100)
        .otherwise(F.lit(0.0)),
        decimals,
    )


def safe_divide(num: Column, den: Column, default: float = 0.0) -> Column:
    """shared/utils.py:41-44."""
    return F.when(den != 0, num.cast("double") / den.cast("double")).otherwise(
        F.lit(default)
    )
