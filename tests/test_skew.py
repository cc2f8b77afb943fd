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
