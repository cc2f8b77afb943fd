"""Structured Streaming layer: windowed metrics equal the batch computation
on the same input; the foreachBatch verdict sink reuses the batch pipeline."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.streaming import stream as ST

OUT = os.path.join(os.path.dirname(__file__), "..", ".fixtures", "stream")


@pytest.fixture(scope="module")
def events_dir(spark):
    """Split sf0.001 events into several files (one per micro-batch)."""
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = os.path.join(OUT, "events_in")
    shutil.rmtree(d, ignore_errors=True)
    src.repartition(4).write.parquet(d)
    return d


def test_stream_matches_batch(spark, events_dir):
    got = (
        ST.run_metrics_stream_once(spark, events_dir, "qm_test")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    # batch twin: same aggregation expressed statically
    e = spark.read.parquet(events_dir)
    want = (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("value") < 10.0, 1).otherwise(0)).cast("long").alias("low_value_fails"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).cast("long").alias("null_value_fails"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "low_value_fails", "null_value_fails", "avg_value",
        )
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["n"].values == want["n"].values).all()
    assert (got["low_value_fails"].values == want["low_value_fails"].values).all()


def test_stream_verdict_sink(spark, corpus_path):
    images_dir = os.path.join(OUT, "images_in")
    out_dir = os.path.join(OUT, "verdicts_out")
    ckpt = os.path.join(OUT, "ckpt")
    for d in (images_dir, out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    src = spark.read.parquet(corpus_path).limit(300)
    src.repartition(3).write.parquet(images_dir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(images_dir)
    )
    q = ST.stream_verdicts_foreach_batch(spark, stream, out_dir, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(out_dir)
    assert out.count() == 300
    assert "keep" in out.columns and "caption_scrubbed" in out.columns
    # multiple micro-batches actually happened
    assert out.select("epoch").distinct().count() >= 2


def test_streaming_dedup_stateful(spark):
    """applyInPandasWithState cross-batch exact dedup: a text seen in an
    earlier micro-batch is dropped in every later one; each distinct text
    survives exactly once."""
    import pandas as pd

    d = os.path.join(OUT, "dedup_in")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    schema = "doc_id long, text string"
    # batch 1 (file 0): two distinct texts + one in-batch duplicate
    b1 = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["alpha doc", "alpha doc", "bravo doc"]}
    )
    # batch 2 (file 1): a cross-batch duplicate of 'alpha doc' + one new text
    b2 = pd.DataFrame({"doc_id": [4, 5], "text": ["alpha doc", "charlie doc"]})
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(d, mode="append")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(d, mode="append")

    out = ST.run_streaming_dedup_once(spark, d, schema, "dedup_test").toPandas()
    # exactly one row per distinct text
    assert sorted(out["text"].tolist()) == ["alpha doc", "bravo doc", "charlie doc"]
    assert out["_fp"].nunique() == 3
    # the cross-batch duplicate (doc 4) never re-emits
    assert 4 not in set(out["doc_id"])
    # the in-batch duplicate kept exactly one of ids {1,2}
    kept_alpha = out[out["text"] == "alpha doc"]["doc_id"].iloc[0]
    assert kept_alpha in (1, 2)


class _FakeState:
    """Minimal GroupState double for unit-testing the timeout protocol."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set_ms = ms


def test_streaming_dedup_timeout_protocol():
    """The state-update function honors the GroupState timeout contract:
    a timed-out invocation removes the seen-set (and does NOT re-arm the
    timer), so a fingerprint arriving after expiry is re-emitted as new.
    (Driving a real ProcessingTimeTimeout in-test busy-loops empty
    micro-batches, so the protocol is pinned at the function level; the
    end-to-end stateful path is covered by test_streaming_dedup_stateful.)
    """
    import pandas as pd

    fn = ST.make_dedup_fn("text", "doc_id", timeout_minutes=5)
    batch = pd.DataFrame(
        {"doc_id": [1], "text": ["alpha doc"], "_fp": ["fp_alpha"]}
    )

    # 1. data invocation: emitted, state persisted, timeout armed
    st = _FakeState()
    out = list(fn((0,), iter([batch]), st))
    assert len(out) == 1 and out[0]["doc_id"].tolist() == [1]
    assert st.get == ("fp_alpha",)
    assert st.timeout_set_ms == 5 * 60 * 1000

    # 2. duplicate while state lives: dropped
    st2 = _FakeState(value=("fp_alpha",))
    assert list(fn((0,), iter([batch.assign(doc_id=4)]), st2)) == []

    # 3. timed-out invocation: state removed, nothing emitted, NOT re-armed
    st3 = _FakeState(value=("fp_alpha",), timed_out=True)
    assert list(fn((0,), iter([]), st3)) == []
    assert st3.removed and not st3.exists
    assert st3.timeout_set_ms is None  # re-arming here would defeat expiry

    # 4. post-expiry arrival: fresh state → re-emitted
    st4 = _FakeState()
    out4 = list(fn((0,), iter([batch.assign(doc_id=7)]), st4))
    assert len(out4) == 1 and out4[0]["doc_id"].tolist() == [7]


def test_streaming_near_dup_candidates(spark):
    """Cross-batch LSH: a near-dup twin arriving in a LATER micro-batch is
    flagged against the first-seen doc; unrelated docs never collide on
    any band.  In-batch exact twins are flagged too (min id first)."""
    import pandas as pd

    d = os.path.join(OUT, "near_dup_in")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    schema = "doc_id long, text string"
    base = (
        "the quick brown fox jumps over the lazy dog while the spark engine "
        "shuffles partitions across the cluster in broad daylight today"
    )
    other = (
        "completely different content about recursive cte oracles and "
        "connected component resolution in distributed dataframe joins"
    )
    b1 = pd.DataFrame({"doc_id": [1, 5, 9], "text": [base, base, other]})
    b2 = pd.DataFrame(
        {"doc_id": [12, 14], "text": [base + " twin", "fresh unrelated text about nothing seen before at all"]}
    )
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(d, mode="append")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(d, mode="append")

    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    cands = ST.streaming_near_dup_candidates(docs, num_hashes=16, bands=4, k=9)
    q = (
        cands.writeStream.outputMode("append")
        .format("memory")
        .queryName("near_dup_cands")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM near_dup_cands").toPandas()
    finally:
        q.stop()
    pairs = set(zip(out["id_first"], out["id_new"]))
    assert (1, 5) in pairs          # in-batch exact twin, min id first
    assert (1, 12) in pairs         # CROSS-BATCH near-dup twin
    flagged_with_9 = {p for p in pairs if 9 in p}
    assert not flagged_with_9, f"unrelated doc collided: {flagged_with_9}"
    assert not {p for p in pairs if 14 in p}


def test_streaming_near_dup_verified_end_to_end(spark):
    """Round-4 task 7: the composed candidates → foreachBatch verify
    recipe.  A cross-batch near-twin is CONFIRMED (jaccard ≥ 0.8); a
    planted band collision (1 shared band, true jaccard ≈ 0.30) is
    flagged as a candidate but REJECTED by the verify stage."""
    import pandas as pd

    base = (
        "the quick brown fox jumps over the lazy dog while the spark engine "
        "shuffles partitions across the cluster in broad daylight today"
    )
    # deterministic false candidate: shares exactly 1 of 4 minhash bands
    # with `base` (k=9, 16 poly hashes) at true 9-shingle jaccard 0.3027
    collide = (
        "the zeta brown zeta jumps over the kappa dog while the spark "
        "engine matrix partitions across the zeta lambda broad daylight today"
    )
    in_dir = os.path.join(OUT, "nd_ver_in")
    store_dir = os.path.join(OUT, "nd_ver_store")
    out_dir = os.path.join(OUT, "nd_ver_out")
    ckpt = os.path.join(OUT, "nd_ver_ckpt")
    for d in (in_dir, store_dir, out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(in_dir, exist_ok=True)
    schema = "doc_id long, text string"
    b1 = pd.DataFrame({"doc_id": [1], "text": [base]})
    b2 = pd.DataFrame({"doc_id": [12, 20], "text": [base + " twin", collide]})
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(in_dir, mode="append")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(in_dir, mode="append")
    # the ingest-side document store holds everything streamed
    spark.read.parquet(in_dir).write.parquet(store_dir)

    # 1) the collision IS a candidate (otherwise the rejection below is vacuous)
    docs = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    cands = ST.streaming_near_dup_candidates(docs, num_hashes=16, bands=4, k=9)
    q = (
        cands.writeStream.outputMode("append")
        .format("memory").queryName("nd_ver_cands").start()
    )
    try:
        q.processAllAvailable()
        cand_pairs = set(
            map(tuple, spark.sql(
                "SELECT id_first, id_new FROM nd_ver_cands"
            ).toPandas().itertuples(index=False))
        )
    finally:
        q.stop()
    assert (1, 20) in cand_pairs, "planted band collision was not flagged"
    assert (1, 12) in cand_pairs

    # 2) end-to-end: verify confirms the twin, rejects the collision
    docs2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q2 = ST.streaming_near_dup_verified(
        spark, docs2, store_dir, out_dir, ckpt,
        num_hashes=16, bands=4, k=9,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = spark.read.parquet(out_dir).toPandas()
    confirmed = set(zip(got["id_a"], got["id_b"]))
    assert (1, 12) in confirmed
    assert all(20 not in p for p in confirmed), f"collision not rejected: {confirmed}"
    assert (got.set_index(["id_a", "id_b"]).loc[(1, 12), "jaccard"] >= 0.8).all()


def test_streaming_verified_pending_retry(spark):
    """Round-4 ADVICE (medium): the doc store has no ordering guarantee
    vs the candidate stream.  (1) a missing store on the first batch must
    not kill the query; (2) a pair whose doc is not yet in the store is
    DIVERTED to the pending relation, not dropped; (3) once the store
    catches up, a later batch retries and CONFIRMS the pair."""
    import pandas as pd

    base = (
        "the quick brown fox jumps over the lazy dog while the spark engine "
        "shuffles partitions across the cluster in broad daylight today"
    )
    in_dir = os.path.join(OUT, "nd_pend_in")
    store_dir = os.path.join(OUT, "nd_pend_store")
    out_dir = os.path.join(OUT, "nd_pend_out")
    ckpt = os.path.join(OUT, "nd_pend_ckpt")
    for d in (in_dir, store_dir, out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(in_dir, exist_ok=True)
    schema = "doc_id long, text string"

    def run_once():
        docs = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(in_dir)
        )
        q = ST.streaming_near_dup_verified(
            spark, docs, store_dir, out_dir, ckpt,
            num_hashes=16, bands=4, k=9,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def confirmed():
        try:
            got = spark.read.parquet(out_dir).toPandas()
        except Exception:
            return set()
        return set(zip(got["id_a"], got["id_b"]))

    # batch 1: store does not even exist yet -> no crash
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [base]}), schema
    ).coalesce(1).write.parquet(in_dir, mode="append")
    run_once()

    # batch 2: twin arrives, but the store only holds doc 1 -> the pair
    # (1, 12) must divert to pending, not drop
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [base]}), schema
    ).write.parquet(store_dir, mode="append")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [12], "text": [base + " twin"]}), schema
    ).coalesce(1).write.parquet(in_dir, mode="append")
    run_once()
    assert (1, 12) not in confirmed()
    # read the pending relation via the pointer, like the sink does
    import json as _json

    with open(os.path.join(out_dir, "_pending_pairs", "_current.json")) as f:
        cur = _json.load(f)["dir"]
    pend = spark.read.parquet(
        os.path.join(out_dir, "_pending_pairs", cur)
    ).toPandas()
    assert (1, 12) in set(zip(pend["id_a"], pend["id_b"]))

    # store catches up; an unrelated batch 3 triggers the retry
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [12], "text": [base + " twin"]}), schema
    ).write.parquet(store_dir, mode="append")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [99], "text": ["completely different words "
                                               "about gardens and rivers flowing east"]}),
        schema,
    ).coalesce(1).write.parquet(in_dir, mode="append")
    run_once()
    assert (1, 12) in confirmed()


def test_streaming_session_stats_matches_batch(spark, tmp_path):
    """Native session_window streaming sessionization agrees with the
    batch operator (operators/sessions.py) on (user, n_events,
    session_value) for data with no exact-boundary gaps."""
    import datetime as dt

    from data_quality_analyzer_spark.operators import sessions as SN
    from data_quality_analyzer_spark.streaming import stream as ST

    t0 = dt.datetime(2024, 3, 1, 9, 0, 0)
    rows = []
    eid = 0
    for user in (1, 2, 3):
        offs = 0
        for burst in range(user + 1):          # user u has u+1 sessions
            for k in range(3):                  # 3 events per session
                rows.append((eid, t0 + dt.timedelta(seconds=offs), user,
                             "view", float(user * 10 + burst * 5 + k), "{}"))
                eid += 1
                offs += 60
            offs += 2000                        # 33-min gap closes session
    schema = ("event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    batch_df = spark.createDataFrame(rows, schema)
    in_dir = str(tmp_path / "sess_in")
    # two files → two micro-batches crossing session boundaries
    batch_df.filter("event_id % 2 = 0").write.parquet(in_dir)
    batch_df.filter("event_id % 2 = 1").write.mode("append").parquet(in_dir)

    src = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    agg = ST.streaming_session_stats(src, gap="30 minutes")
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("sess_stream").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["n_events"], str(r["session_value"]))
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    want = {
        (r["user_id"], r["n_events"], str(r["session_value"]))
        for r in SN.session_stats(batch_df).collect()
    }
    assert got == want
    assert len(got) == 2 + 3 + 4  # user u → u+1 sessions


def test_streaming_link_edges_matches_batch(spark, tmp_path):
    """Pages streamed one file per micro-batch must leave the edge
    ledger EXACTLY equal to one-shot extraction over all pages, and
    re-running the stream over the same input (fresh checkpoint, same
    store) must not double-count — the ledger's batch_id guard is the
    exactly-once mechanism."""
    from pyspark.sql import functions as F

    from data_quality_analyzer_spark.operators import linkgraph as LG
    from data_quality_analyzer_spark.plans import lineage as LN
    from data_quality_analyzer_spark.plans.entry_queries import _q89_pages
    from data_quality_analyzer_spark.streaming import stream as ST

    d = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    pages = _q89_pages(d)
    in_dir = str(tmp_path / "pages_in")
    for k in range(3):
        pages.filter(F.col("doc_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
    store = str(tmp_path / "edge_store")

    ST.run_streaming_link_edges_once(
        spark, in_dir, "src_domain string, html string",
        store, str(tmp_path / "ckpt1"),
    )
    got = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in LN.link_ledger_edges(spark, store).collect()
    }
    want = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in LG.domain_edges(pages, "src_domain", "html").collect()
    }
    assert got == want and len(got) > 0

    # replay the whole input against the same store: guarded no-op
    ST.run_streaming_link_edges_once(
        spark, in_dir, "src_domain string, html string",
        store, str(tmp_path / "ckpt2"),
    )
    again = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in LN.link_ledger_edges(spark, store).collect()
    }
    assert again == want
