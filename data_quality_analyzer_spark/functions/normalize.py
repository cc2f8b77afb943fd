"""Unicode TEXT NORMALIZATION — the cleanup stage every crawl pipeline
runs before hashing/dedup (ftfy-lite): NFC composition and mojibake
repair.  Un-normalized text poisons every downstream fingerprint — the
SAME visible string in composed vs decomposed form hashes differently,
so exact dedup, line dedup, MinHash shingles and the decontamination
grams all silently miss matches until this stage runs.

* **NFC** (canonical composition): Spark has no built-in normalizer, so
  this is one of the few justified Python paths in the repo — an
  Arrow-batched pandas UDF over ``unicodedata.normalize`` (stdlib
  implements Unicode canonical composition; DuckDB ships the SAME
  algorithm as ``nfc_normalize``, which is what makes the q84 oracle a
  real value-hash check of a UDF-computed column across two independent
  NFC implementations).
* **Mojibake repair**: UTF-8 bytes mis-decoded as Latin-1/cp1252 ("Ã©"
  for "é") — detected by the classic artifact alphabet (Ã, Â, â€¦, …)
  and repaired by the inverse round-trip ``encode('cp1252') →
  decode('utf-8')``, applied ONLY when it round-trips cleanly AND
  strictly shrinks the text (the ftfy acceptance heuristic — repairing
  already-correct text is worse than leaving rare artifacts).  No SQL
  twin exists for codec round-trips, so the repair is pinned by
  Python-twin tests instead of a DuckDB oracle (the weaker tier,
  documented).

Scale shape: both are MAP-ONLY Arrow UDFs (one text column in, one
out); the mojibake detector pre-gates the repair with a pure-Catalyst
``contains`` check so clean corpora never pay the Python round-trip.
Reference ancestor: U1 row validator (additional_charge_checks.py:758)
as a repair, not just a verdict.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

#: artifact prefixes that only appear in mojibake (UTF-8 lead bytes
#: 0xC2-0xC3, 0xE2 seen through cp1252): the cheap JVM-side pre-gate.
MOJIBAKE_MARKERS = ("Ã", "Â", "â€")


def nfc(text: str | None) -> str | None:
    """Python twin of the UDF (and of DuckDB ``nfc_normalize``)."""
    if text is None:
        return None
    return unicodedata.normalize("NFC", text)


def repair_mojibake(text: str | None) -> str | None:
    """Inverse-round-trip repair, accepted only when it decodes cleanly
    and strictly shrinks (mojibake inflates byte length; a no-op or
    growth means the text was not mojibake)."""
    if text is None or not any(m in text for m in MOJIBAKE_MARKERS):
        return text
    try:
        fixed = text.encode("cp1252").decode("utf-8")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return text
    return fixed if len(fixed) < len(text) else text


def nfc_udf(spark):
    """Arrow-batched NFC normalizer: string -> string."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(nfc, na_action="ignore")

    return _nfc


def repair_mojibake_udf(spark):
    """Arrow-batched mojibake repair: string -> string."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _fix(s: pd.Series) -> pd.Series:
        return s.map(repair_mojibake, na_action="ignore")

    return _fix


def normalize_text(df, text_col: str = "text", out_col: str | None = None):
    """NFC + gated mojibake repair in one pass.  The repair UDF input is
    masked behind the pure-Catalyst marker pre-gate (the pipeline's
    critical-short-circuit pattern): rows without artifact markers never
    cross the Arrow channel twice."""
    from pyspark.sql import functions as F

    out_col = out_col or text_col
    spark = df.sparkSession
    has_marker = None
    for m in MOJIBAKE_MARKERS:
        c = F.col(text_col).contains(m)
        has_marker = c if has_marker is None else (has_marker | c)
    # mask the UDF INPUT, not the call: `when(gate, udf(col))` still
    # ships every row's text over the Arrow channel and discards the
    # output — the input-masked form sends NULL for gated-off rows
    # (the pipeline.py critical-short-circuit pattern)
    masked = F.when(F.col(text_col).isNotNull() & has_marker, F.col(text_col))
    repaired = F.coalesce(
        repair_mojibake_udf(spark)(masked), F.col(text_col)
    )
    return df.withColumn(out_col, nfc_udf(spark)(repaired))
