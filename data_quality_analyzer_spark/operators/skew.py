"""Explicit skew handling: salted joins and two-phase aggregation.

The north rule calls for "explicit salting for skewed language/format hot
spots" on top of AQE.  AQE's skew-join split (adaptive, runtime) is the
first line of defense; these operators are the *explicit* form for cases
AQE cannot rewrite — e.g. a shuffle whose hot key is known a priori
(language 'en' in a langid histogram, one hot phash bucket — the fixture
corpus plants exactly this, sources/fixtures.py), or a build side small
enough to replicate but too big to broadcast.

Patterns (SURVEY §7.3 "skew salting, two-phase agg — custom code, standard
pattern"):

* :func:`with_salt` — deterministic salt column (xxhash64 of stable cols,
  NOT rand(): re-execution of a failed task must land rows in the same
  salt bucket or resumed/retried stages double-count).
* :func:`salted_join` — hot-key equi-join: the big side salts each row,
  the small side replicates `n`× with an exploded salt, and the join key
  becomes (key, salt) — the hot key's rows spread over n reducers.
* :func:`two_phase_agg` — salt → partial aggregate on (key, salt) →
  final merge on key.  For algebraic aggregates Spark's map-side partial
  aggregation already does this implicitly; the explicit form matters
  when the partial state per key is huge (exact distinct sets, collect)
  and one reducer would hold the whole hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, n: int, cols: list[str] | None = None, salt_col: str = "_salt"
) -> DataFrame:
    """Deterministic salt in [0, n): xxhash64 over `cols` (default: all
    columns).  Deterministic by design — see module docstring."""
    src = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*src), F.lit(n)).cast("int"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: big side gets a deterministic salt, small side
    is replicated n× (explode over the salt domain), join on (key, salt).
    Row multiplicity is exactly that of the plain join; only the shuffle
    distribution changes (the hot key spreads over n partitions).

    ``salt_cols`` must carry per-row entropy BEYOND the join key: a salt
    that is a pure function of the key maps every row of the hot key to
    the same salt bucket, defeating the whole point while still paying the
    n× replication of the small side.  Default: ALL big-side columns
    (same default as :func:`with_salt`); passing exactly ``[key]`` raises.
    """
    if salt_cols is not None and set(salt_cols) == {key}:
        raise ValueError(
            "salt_cols must not be only the join key: the salt would be a "
            "pure function of the key and the hot key would still land on "
            "one reducer (pass row-identifying columns, or None for all)"
        )
    b = with_salt(big, n, salt_cols or list(big.columns))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = b.join(s, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Explicit salt → partial → merge aggregation.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` merge the partials
    per key (they see the partial column names).  Example — skew-safe exact
    distinct count of `v` per `k`:

        two_phase_agg(df, "k",
            [F.collect_set("v").alias("ps")],
            [F.size(F.array_distinct(F.flatten(F.collect_list("ps")))).alias("n_distinct")])
    """
    salted = with_salt(df, n, salt_cols or df.columns)
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)


def skew_safe_count_distinct(
    df: DataFrame, key: str, value: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact distinct-count per key without a hot-key reducer: dedupe on
    (key, value) first (the shuffle key includes the value, so a hot `key`
    spreads over every partition), then count per key.  The standard
    two-shuffle recast of ``groupBy(key).agg(countDistinct(value))`` whose
    single-shuffle form concentrates the hot key's whole value set in one
    task."""
    return (
        df.select(key, value)
        .filter(F.col(value).isNotNull())
        .distinct()
        .groupBy(key)
        .agg(F.count("*").alias(alias))
    )
