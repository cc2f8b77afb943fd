"""Gap-based SESSIONIZATION over an event stream — the classic
behavioral-analytics operator (a session = a maximal run of one user's
events with no gap exceeding ``gap_s``), expressed in the shape that
scales: per-user windows, exact integer time arithmetic, no global
ordering anywhere.

Scale shape (100 TB of events): both windows are PARTITIONED BY the
user key, so Spark distributes users across tasks and each task sorts
only its users' events — there is exactly ONE shuffle (hash by user),
reused by the lag-window, the cumulative-sum window, and the per-session
aggregate (same partitioning expression; Catalyst plans one Exchange).
A single pathological user concentrates on one task — the standard
mitigation (cap events per user per day upstream, or pre-split sessions
by day bucket) composes in front of this operator without changing it;
the skew.py salting helpers do NOT apply because an ordered window
cannot be salted without breaking run continuity.

Time arithmetic is ``unix_micros`` int64 end-to-end (the fixture's
timestamps are microsecond-grained; float epoch seconds would make the
gap comparison engine-dependent at the boundary).  Ordering within a
user is pinned to (ts, event_id) so timestamp ties cannot reorder
across engines, and the cumulative window frame is pinned to ROWS
UNBOUNDED PRECEDING (the q53 RANGE-frame lesson).

Reference ancestor: F10/F11 timestamp staleness checks
(``generate_stats_collection.py`` freshness windows) upgraded from a
single MAX(ts) to per-user run structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default session gap: 30 minutes, in microseconds
DEFAULT_GAP_US = 30 * 60 * 1_000_000


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Annotate every event with ``session_idx`` (1-based per user) via
    lag + cumulative sum over the user-partitioned window."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    # parquet timestamps arrive as TIMESTAMP_NTZ; the cast reads the wall
    # clock in the session tz (pinned to UTC in session.py), matching
    # DuckDB epoch_us on the same NTZ values.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    new_s = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us), 1
    ).otherwise(0)
    cum = Window.partitionBy(user_col).orderBy(ts_col, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(new_s).over(cum))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    **kw,
) -> DataFrame:
    """One row per (user, session): event count, exact integer duration
    in seconds, and the DECIMAL-summed value column."""
    s = sessionize(df, user_col=user_col, ts_col=ts_col, **kw)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count("*").alias("n_events"),
        (F.max(us) - F.min(us)).alias("_duration_us"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("session_value")
        )
    return (
        s.groupBy(user_col, "session_idx")
        .agg(*aggs)
        # integer div, not double `/`: the duration must floor exactly
        .withColumn("duration_s", F.expr("_duration_us div 1000000"))
        .drop("_duration_us")
    )


def sessionize_duck_sql(
    rel: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    gap_us: int = DEFAULT_GAP_US,
) -> str:
    """DuckDB twin of :func:`session_stats` (relation-level; same pinned
    ordering, integer micros, ROWS frame)."""
    rows = sessionize_rows_duck_sql(
        rel, user_col=user_col, ts_col=ts_col, order_col=order_col,
        extra_cols=value_col, gap_us=gap_us,
    )
    return f"""
    WITH _sess_rows AS ({rows})
    SELECT {user_col}, session_idx,
           COUNT(*) AS n_events,
           (epoch_us(MAX({ts_col})) - epoch_us(MIN({ts_col}))) // 1000000
             AS duration_s,
           SUM(CAST({value_col} AS DECIMAL(18,2))) AS session_value
    FROM _sess_rows GROUP BY {user_col}, session_idx
    """


def sessionize_rows_duck_sql(
    rel: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    extra_cols: str = "value",
    gap_us: int = DEFAULT_GAP_US,
) -> str:
    """Row-level DuckDB twin of :func:`sessionize` — every event with
    its ``session_idx`` (the building block session_stats and the q88
    funnel share)."""
    return f"""
    SELECT * FROM (
      SELECT *, SUM(new_s) OVER (
        PARTITION BY {user_col} ORDER BY {ts_col}, {order_col}
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS session_idx
      FROM (
        SELECT {user_col}, {order_col}, {ts_col}, {extra_cols},
               CASE WHEN lag(epoch_us({ts_col})) OVER w IS NULL
                      OR epoch_us({ts_col}) - lag(epoch_us({ts_col})) OVER w
                         > {gap_us}
                    THEN 1 ELSE 0 END AS new_s
        FROM {rel}
        WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col}, {order_col})
      )
    )"""
