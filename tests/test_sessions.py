"""Sessionization (operators/sessions.py): planted gap structure, tie
ordering, and partitioning invariance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import sessions as SN

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(eid, user, offset_s, value=1.0):
    return (eid, _T0 + dt.timedelta(seconds=offset_s), user, value)


def test_sessionize_planted_gaps(spark):
    rows = [
        # user 1: events at 0s, 60s, [31min gap] 1920s, 1980s → 2 sessions
        _ev(1, 1, 0), _ev(2, 1, 60), _ev(3, 1, 1920), _ev(4, 1, 1980),
        # user 2: exactly at the 30-min boundary (not > gap) → 1 session
        _ev(5, 2, 0), _ev(6, 2, 1800),
        # user 3: single event
        _ev(7, 3, 0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    got = {
        r["event_id"]: r["session_idx"]
        for r in SN.sessionize(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1, 7: 1}

    stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"])
        for r in SN.session_stats(df).collect()
    }
    assert stats[(1, 1)] == (2, 60)
    assert stats[(1, 2)] == (2, 60)
    assert stats[(2, 1)] == (2, 1800)
    assert stats[(3, 1)] == (1, 0)


def test_sessionize_tie_ordering_and_invariance(spark):
    # same-timestamp events: event_id pins the order; a later event_id at
    # the same ts must not start a new session
    rows = [_ev(10, 7, 0), _ev(11, 7, 0), _ev(12, 7, 2000)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    one = sorted(
        (r["event_id"], r["session_idx"]) for r in SN.sessionize(df).collect()
    )
    assert one == [(10, 1), (11, 1), (12, 2)]
    # partitioning invariance: same labels from any input layout
    other = sorted(
        (r["event_id"], r["session_idx"])
        for r in SN.sessionize(df.repartition(7)).collect()
    )
    assert other == one


def test_sessionize_incremental_matches_batch(spark, tmp_path):
    """Three time-ordered batches through the session ledger produce
    EXACTLY the labels of one batch sessionize over the union — stitch
    and non-stitch boundaries, users absent from middle batches, new
    users mid-stream; replay returns the stored annotation."""
    from data_quality_analyzer_spark.operators import sessions as SN
    from data_quality_analyzer_spark.plans import lineage as LN

    rows = []
    eid = 0
    # user 1: sessions straddle batch boundaries (stitch) and split
    # inside batches; user 2: skips batch 2; user 3 appears in batch 3
    for user, offsets in (
        (1, [0, 60, 120, 3600, 3660, 7300, 7350]),
        (2, [0, 30, 7200, 7230]),
        (3, [8000, 8050]),
    ):
        for off in offsets:
            rows.append((eid, _T0 + dt.timedelta(seconds=off), user, 1.0))
            eid += 1
    schema = "event_id long, ts timestamp_ntz, user_id long, value double"
    df = spark.createDataFrame(rows, schema)
    # batch split by time: [0, 3600), [3600, 7300), [7300, inf)
    cuts = [
        df.filter(F.unix_micros(F.col("ts").cast("timestamp"))
                  < F.unix_micros(F.lit(_T0 + dt.timedelta(seconds=3600)).cast("timestamp"))),
        df.filter(
            (F.unix_micros(F.col("ts").cast("timestamp"))
             >= F.unix_micros(F.lit(_T0 + dt.timedelta(seconds=3600)).cast("timestamp")))
            & (F.unix_micros(F.col("ts").cast("timestamp"))
               < F.unix_micros(F.lit(_T0 + dt.timedelta(seconds=7300)).cast("timestamp")))
        ),
        df.filter(F.unix_micros(F.col("ts").cast("timestamp"))
                  >= F.unix_micros(F.lit(_T0 + dt.timedelta(seconds=7300)).cast("timestamp"))),
    ]
    store = str(tmp_path / "sess_store")
    got = {}
    for i, b in enumerate(cuts):
        out = LN.sessionize_incremental(spark, b, store, f"batch-{i}")
        for r in out.collect():
            got[r["event_id"]] = (r["user_id"], r["session_idx"])
    want = {
        r["event_id"]: (r["user_id"], r["session_idx"])
        for r in SN.sessionize(df).collect()
    }
    assert got == want
    # replay: same annotation back, state untouched
    replay = {
        r["event_id"]: (r["user_id"], r["session_idx"])
        for r in LN.sessionize_incremental(
            spark, cuts[0], store, "batch-0"
        ).collect()
    }
    assert replay == {k: v for k, v in want.items() if k in replay}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pinned"):
        LN.sessionize_incremental(
            spark, cuts[0], store, "batch-9", gap_us=1
        )
