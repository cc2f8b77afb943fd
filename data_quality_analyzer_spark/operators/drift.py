"""Snapshot-over-snapshot STATS DRIFT — the "did this crawl change under
me" check every recurring pipeline needs: per-group keep-rate and volume
compared between the current corpus snapshot and a baseline, with
severity bands decided in EXACT integer arithmetic.

This is the closest living descendant of the reference's historical
stats check (``charge_analysis_checks.py:617-905`` — coverage/quality/
freshness of generated stats vs expectations, with ok/warning/critical
escalation): same contract, recast from "stats document vs config
thresholds" to "crawl N vs crawl N-1".

Float discipline: severity must never depend on a rounded double.  A
rate delta's band is decided by cross-multiplication —
``|kept_c·n_b − kept_b·n_c| · den  vs  num · n_c·n_b`` — and the volume
band by ``n_c · den vs n_b · num``: pure int64 (counts beyond ~10^9 per
group would need DECIMAL(38); the docstring of the caller pins that
swap).  The rounded rates in the output are display-only.

Scale shape: one aggregate per snapshot (partial-agg friendly), then a
per-group FULL OUTER join of two TINY frames (|groups| rows each; full
outer cannot use a broadcast hash join in Spark, and does not need to —
the heavy lifting is the two corpus aggregates, and the join input is
group-cardinality-sized).  The corpus is scanned once per snapshot;
nothing row-sized ever joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (severity, rate-delta num/den, volume-floor num/den) — first match
#: wins, scanned from most severe.  Volume floor: cur < floor·base.
DRIFT_BANDS = (
    ("critical", (2, 10), (5, 10)),   # Δrate > 0.2 or volume < 0.5×
    ("warning", (1, 10), (8, 10)),    # Δrate > 0.1 or volume < 0.8×
)


def _group_stats(df: DataFrame, group_col: str, keep: Column) -> DataFrame:
    return df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("kept"),
    )


def stats_drift(
    cur: DataFrame,
    base: DataFrame,
    keep_cur: Column,
    keep_base: Column,
    group_col: str = "lang",
) -> DataFrame:
    """Per-group drift report: counts, display rates, and the exact
    integer severity.  Groups present in only one snapshot are reported
    with severity 'critical' (appeared/vanished is the loudest drift).
    """
    c = _group_stats(cur, group_col, keep_cur)
    b = _group_stats(base, group_col, keep_base)
    j = (
        c.withColumnRenamed("n", "n_cur").withColumnRenamed("kept", "kept_cur")
        .join(
            b.withColumnRenamed("n", "n_base")
            .withColumnRenamed("kept", "kept_base"),
            group_col,
            "full_outer",
        )
    )
    return _drift_report(j, group_col)


def _drift_report(j: DataFrame, group_col: str) -> DataFrame:
    """Severity + display columns over a joined stats frame with
    (n_cur, kept_cur, n_base, kept_base) — shared by the two-snapshot
    form above and the committed-ledger form in plans/lineage.py."""
    delta = F.abs(
        F.col("kept_cur") * F.col("n_base") - F.col("kept_base") * F.col("n_cur")
    )
    nn = F.col("n_cur") * F.col("n_base")
    sev = F.lit("ok")
    for name, (rn, rd), (vn, vd) in reversed(DRIFT_BANDS):
        fired = (delta * rd > nn * rn) | (
            F.col("n_cur") * vd < F.col("n_base") * vn
        )
        sev = F.when(fired, name).otherwise(sev)
    sev = F.when(
        F.col("n_cur").isNull() | F.col("n_base").isNull(), "critical"
    ).otherwise(sev)
    return j.select(
        group_col,
        "n_base",
        "n_cur",
        F.round(F.col("kept_base") / F.col("n_base"), 6).alias("rate_base"),
        F.round(F.col("kept_cur") / F.col("n_cur"), 6).alias("rate_cur"),
        sev.alias("severity"),
    )


def stats_drift_duck_sql(
    cur_rel: str,
    base_rel: str,
    keep_cur: str,
    keep_base: str,
    group_col: str = "lang",
) -> str:
    """DuckDB twin of :func:`stats_drift` (same integer band rule)."""

    def stats(rel: str, keep: str) -> str:
        return (
            f"SELECT {group_col}, COUNT(*) AS n, "
            f"CAST(SUM(CASE WHEN {keep} THEN 1 ELSE 0 END) AS BIGINT) AS kept "
            f"FROM {rel} GROUP BY {group_col}"
        )

    arms = []
    for name, (rn, rd), (vn, vd) in DRIFT_BANDS:
        arms.append(
            f"WHEN abs(c.kept * b.n - b.kept * c.n) * {rd} "
            f"> c.n * b.n * {rn} "
            f"OR c.n * {vd} < b.n * {vn} THEN '{name}'"
        )
    case = (
        "CASE WHEN c.n IS NULL OR b.n IS NULL THEN 'critical' "
        + " ".join(arms)
        + " ELSE 'ok' END"
    )
    return f"""
    WITH c AS ({stats(cur_rel, keep_cur)}), b AS ({stats(base_rel, keep_base)})
    SELECT COALESCE(c.{group_col}, b.{group_col}) AS {group_col},
           b.n AS n_base, c.n AS n_cur,
           ROUND(CAST(b.kept AS DOUBLE) / b.n, 6) AS rate_base,
           ROUND(CAST(c.kept AS DOUBLE) / c.n, 6) AS rate_cur,
           {case} AS severity
    FROM c FULL OUTER JOIN b ON c.{group_col} = b.{group_col}
    """
