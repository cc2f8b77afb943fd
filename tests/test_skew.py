"""Explicit skew handling: salted joins and two-phase aggregation must be
result-identical to their plain forms and must actually change the shuffle
key (the point of salting)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import skew as SK


@pytest.fixture(scope="module")
def hot(spark):
    """90% of rows share one key — the planted hot partition."""
    df = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("en")).otherwise(F.lit("de")).alias("lang"),
        F.col("id").alias("rid"),
        (F.col("id") % 37).alias("v"),
    )
    return df


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [("en", "english"), ("de", "german"), ("fr", "french")], "lang string, name string"
    )


def test_salt_is_deterministic_and_bounded(hot):
    a = SK.with_salt(hot, 8, ["rid"]).select("rid", "_salt").toPandas()
    b = SK.with_salt(hot, 8, ["rid"]).select("rid", "_salt").toPandas()
    assert a.sort_values("rid").reset_index(drop=True).equals(
        b.sort_values("rid").reset_index(drop=True)
    )
    assert a["_salt"].between(0, 7).all()
    assert a["_salt"].nunique() == 8  # spreads over the full salt domain


def test_salted_join_matches_plain_join(hot, dim):
    plain = hot.join(dim, "lang").groupBy("lang", "name").count()
    salted = SK.salted_join(hot, dim, "lang", n=8, salt_cols=["rid"]).groupBy(
        "lang", "name"
    ).count()
    a = plain.orderBy("lang").toPandas()
    b = salted.orderBy("lang").toPandas()
    assert a.equals(b)
    # the join key actually includes the salt (shuffle spreads the hot key)
    plan = SK.salted_join(hot, dim, "lang", n=8, salt_cols=["rid"])._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_salted_join_left_preserves_unmatched(spark, dim):
    big = spark.createDataFrame([("en", 1), ("xx", 2)], "lang string, rid int")
    out = SK.salted_join(big, dim, "lang", n=4, how="left", salt_cols=["rid"]).collect()
    by = {r["lang"]: r["name"] for r in out}
    assert by["en"] == "english" and by["xx"] is None
    assert len(out) == 2  # no duplication from the replicated small side


def test_two_phase_agg_matches_plain(hot):
    plain = (
        hot.groupBy("lang").agg(F.countDistinct("v").alias("n_distinct"))
        .orderBy("lang").toPandas()
    )
    two = SK.two_phase_agg(
        hot, "lang",
        [F.collect_set("v").alias("ps")],
        [F.size(F.array_distinct(F.flatten(F.collect_list("ps")))).alias("n_distinct")],
        n=16, salt_cols=["rid"],
    ).orderBy("lang").toPandas()
    dt = plain["n_distinct"].dtype
    assert plain.equals(two[["lang", "n_distinct"]].astype({"n_distinct": dt}))
    safe = SK.skew_safe_count_distinct(hot, "lang", "v").orderBy("lang").toPandas()
    assert plain.equals(safe.astype({"n_distinct": dt}))


def test_salted_join_default_salt_not_key_function(hot, dim):
    """Default salt_cols (all big-side columns) must actually spread the
    hot key over multiple salt buckets — a salt that is a pure function of
    the join key would leave the hot key on one reducer."""
    import pyspark.sql.functions as F

    from data_quality_analyzer_spark.operators import skew as SK

    n = 8
    salted = SK.with_salt(hot, n)  # default: all columns
    spread = (
        salted.filter(F.col("lang") == "en")
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread > 1, "hot key landed in a single salt bucket"
    # and the join result still matches the plain join (default salt_cols)
    plain = hot.join(dim, "lang").count()
    assert SK.salted_join(hot, dim, "lang", n=n).count() == plain
    # passing only the join key as the salt source is rejected
    with pytest.raises(ValueError, match="salt_cols"):
        SK.salted_join(hot, dim, "lang", n=n, salt_cols=["lang"])


# ---------------------------------------------------------------------------
# Adversarial hot BAND (round-4 VERDICT task 6): many DISTINCT fingerprints
# sharing one band value — the low-entropy-corpus failure mode the
# hot-FINGERPRINT collapse cannot see.
# ---------------------------------------------------------------------------


def _hot_band_fps(n: int):
    """n distinct 64-bit fingerprints whose LOW 16 bits are constant
    (band 0 of a 4x16 split is one bucket) and whose upper 46 bits are
    seeded-random — pairwise Hamming ≤ 3 has probability ~5e-6 across
    C(400,2) pairs, so verify rejects every hot-band pair."""
    import numpy as np

    rng = np.random.default_rng(424242)
    seen: set[int] = set()
    fps = []
    while len(fps) < n:
        hi = int(rng.integers(0, 1 << 46))
        if hi in seen:
            continue
        seen.add(hi)
        fps.append((hi << 16) | 0xBEEF)
    return fps


def test_hot_band_candidate_volume_and_cap(spark):
    from pyspark.sql import functions as F

    from data_quality_analyzer_spark.operators import dedup as DD

    n = 400
    rows = [(i, fp) for i, fp in enumerate(_hot_band_fps(n))]
    # plus one TRUE near-dup pair in a normal (non-hot) band neighborhood
    rows += [(9000, 0x0123_4567_89AB_0001), (9001, 0x0123_4567_89AB_0003)]
    df = spark.createDataFrame(rows, "vid long, fp long")

    # measured candidate volume without the guard: the hot band produces
    # C(400,2) = 79800 candidate pairs that verify then throws away
    band_rows = df.select(
        "vid", DD.int_band_explode("fp", 4, 16).alias("bf")
    ).select("vid", "bf.band", "bf.bb")
    a, b = band_rows.alias("a"), band_rows.alias("b")
    n_cand = (
        a.join(b, ["band", "bb"])
        .filter(F.col("a.vid") < F.col("b.vid"))
        .count()
    )
    assert n_cand >= n * (n - 1) // 2  # quadratic blowup is real

    # verify keeps only the planted pair — all hot-band pairs are junk
    pairs = DD.fingerprint_near_duplicates(df, "fp", "vid").collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(9000, 9001)}

    # with the cap: same OUTPUT (the planted pair's bands are small),
    # quadratic candidate work gone
    capped = DD.fingerprint_near_duplicates(
        df, "fp", "vid", max_band_size=50
    ).collect()
    assert {(p["id_a"], p["id_b"]) for p in capped} == {(9000, 9001)}


def test_hot_band_cap_logs_loudly(spark, caplog):
    import logging

    from data_quality_analyzer_spark.operators import dedup as DD

    rows = [(i, fp) for i, fp in enumerate(_hot_band_fps(100))]
    df = spark.createDataFrame(rows, "vid long, fp long")
    with caplog.at_level(logging.WARNING):
        DD.fingerprint_near_duplicates(
            df, "fp", "vid", max_band_size=10
        ).collect()
    msgs = [r.message for r in caplog.records]
    assert any("oversized" in m and "max_band_size=10" in m for m in msgs)


def test_hot_band_cap_recall_contract(spark):
    """The documented recall loss: a pair whose ONLY shared band is the
    oversized one IS missed with the cap — loudly, by contract."""
    from data_quality_analyzer_spark.operators import dedup as DD

    fps = _hot_band_fps(100)
    # twin of fps[0] at Hamming 1 (flip one bit in band 1's range):
    # shares band 0 (hot) AND bands 2,3 -> still found under the cap
    rows = [(i, fp) for i, fp in enumerate(fps)]
    rows.append((7000, fps[0] ^ (1 << 20)))
    df = spark.createDataFrame(rows, "vid long, fp long")
    got = DD.fingerprint_near_duplicates(
        df, "fp", "vid", max_band_size=50
    ).collect()
    assert any({p["id_a"], p["id_b"]} == {0, 7000} for p in got)


def test_ledger_hot_band_cap_default_on(spark, tmp_path, caplog, monkeypatch):
    """Round-4 VERDICT task 7: the cross-run ledgers run unattended, so
    their band joins carry the hot-band cap BY DEFAULT.  Plants a hot
    band across the archive (60 distinct phashes sharing band 0; the
    LEDGER_MAX_BAND_SIZE dial is lowered to 10 so the 60-row plant trips
    the DEFAULT code path, not an explicit argument), then a new batch
    where (a) a doc whose ONLY link to committed content is the hot band
    survives with the loud log (the documented recall contract), (b) a
    doc matching via healthy bands still drops, and (c) disabling the
    cap (max_band_size=0) restores the pigeonhole behavior and drops the
    hot-band-only doc too."""
    import logging

    from data_quality_analyzer_spark.operators import dedup as DD
    from data_quality_analyzer_spark.plans import lineage as LN

    monkeypatch.setattr(DD, "LEDGER_MAX_BAND_SIZE", 10)

    fps = _hot_band_fps(60)
    batch_a = spark.createDataFrame(
        [(i, fp) for i, fp in enumerate(fps)], "image_id long, phash long"
    )
    # only-hot-band doc: flip one bit in each NON-hot band of fps[0] ->
    # Hamming 3 (a true near-dup), but bands 1-3 all differ, so the only
    # shared band bucket is the oversized one
    q_only_hot = fps[0] ^ (1 << 20) ^ (1 << 36) ^ (1 << 52)
    r_exact = fps[1]  # shares healthy bands 1-3 -> must drop either way
    clean = 0x0123_4567_89AB_0001
    batch_b = spark.createDataFrame(
        [(1000, q_only_hot), (1001, r_exact), (1002, clean)],
        "image_id long, phash long",
    )

    for store, cap in ((str(tmp_path / "capped"), None),
                       (str(tmp_path / "uncapped"), 0)):
        kw = {} if cap is None else {"max_band_size": cap}
        LN.dedup_incremental_image(
            spark, batch_a, store, "a", max_hamming=3, **kw
        ).count()  # commit the archive
        with caplog.at_level(logging.WARNING):
            caplog.clear()
            kept = {
                r["image_id"]
                for r in LN.dedup_incremental_image(
                    spark, batch_b, store, "b", max_hamming=3, **kw
                ).collect()
            }
        if cap is None:  # default-on cap
            assert kept == {1000, 1002}  # recall loss on 1000, by contract
            assert any(
                "dedup_incremental_image" in r.message
                and "oversized" in r.message
                for r in caplog.records
            )
        else:  # cap disabled: pigeonhole recall, hot-band doc drops too
            assert kept == {1002}
