"""PII scrubbing (emails / phones / SSNs) + toxicity flagging.

North-star surface (BASELINE.json): "compiled-regex PII scrubbing (emails,
phones, SSNs) plus toxicity wordlist filtering".  The reference has no regex
anywhere (SURVEY §2.8) — this is new work, designed Spark-first:

* The scrub itself is **native `regexp_replace`** (JVM, whole-stage codegen)
  — strictly faster than any Python/pandas UDF because it never crosses the
  JVM/Python boundary.  A `pandas_udf` twin is provided for parity testing
  of the Arrow path and as the extension point for patterns that would need
  Python's `regex` module.
* Patterns are RE2-compatible (no lookarounds/backrefs) so the same pattern
  string runs identically under Java regex (Spark), RE2 (DuckDB oracle) and
  Python `re` (pandas oracle).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: email first (contains digits/dots), SSN before phone so the
# 3-2-4 digit shape is not half-eaten by the phone pattern.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    # word-boundary note: \b does not hold between ' ' and '(' so the
    # parenthesized area code is its own alternative.
    ("phone", r"(\([0-9]{3}\)[-. ]?|\b[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\b", "[PHONE]"),
)


def scrub(col: Column) -> Column:
    """caption → caption_scrubbed as a chain of native regexp_replace.

    Guarded by a single combined rlike: the overwhelmingly common PII-free
    row pays one scan and zero string allocations instead of three
    replace-and-copy passes."""
    any_pii = "|".join(f"(?:{pat})" for _n, pat, _r in PII_PATTERNS)
    out = col
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return F.when(col.rlike(any_pii), out).otherwise(col)


def pii_flags(col: Column) -> dict[str, Column]:
    """Per-kind boolean hit columns (metrics layer counts these)."""
    return {
        f"has_{name}": col.rlike(pat) for name, pat, _repl in PII_PATTERNS
    }


def scrub_sql(c: str) -> str:
    """DuckDB twin of :func:`scrub` (same pattern constants)."""
    out = c
    for _name, pat, repl in PII_PATTERNS:
        # DuckDB plain '...' strings pass backslashes through to RE2 verbatim
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def pii_flag_sql(c: str, name: str) -> str:
    for n, pat, _repl in PII_PATTERNS:
        if n == name:
            return f"regexp_matches({c}, '{pat}')"
    raise KeyError(name)


_COMPILED = [(re.compile(pat), repl) for _n, pat, repl in PII_PATTERNS]


def scrub_python(text: str | None) -> str | None:
    """Pure-Python twin used by the pandas oracle (tests/oracle only)."""
    if text is None:
        return None
    for rx, repl in _COMPILED:
        text = rx.sub(repl, text)
    return text


def scrub_pandas_udf():
    """Arrow-vectorized twin of :func:`scrub` (patterns compiled once per
    executor at module import; no per-row Python objects besides the str).

    Built lazily — `pandas_udf` needs an active SparkSession to parse the
    return type, so the decorator cannot run at import time.
    """

    @F.pandas_udf("string")
    def _scrub(s: pd.Series) -> pd.Series:
        for rx, repl in _COMPILED:
            s = s.str.replace(rx, repl, regex=True)
        return s

    return _scrub
