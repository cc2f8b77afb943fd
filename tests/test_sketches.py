"""KMV bottom-k cardinality sketch: exact below k, bounded error above,
deterministic across partitionings, NULL convention, merge property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def values(spark):
    rows = [("small", f"v{i}") for i in range(30)]            # 30 < k
    rows += [("big", f"x{i}") for i in range(5000)]           # 5000 >> k
    rows += [("big", f"x{i}") for i in range(100)]            # duplicates
    rows += [("nulls", None)] * 5 + [("nulls", "only")]
    return spark.createDataFrame(rows, "grp string, v string")


def test_exact_below_k_and_bounded_above(values):
    got = {
        r["grp"]: r
        for r in SK.kmv_distinct(values, "v", ["grp"], k=256).collect()
    }
    assert got["small"]["n_exact"] == 30
    assert got["small"]["est_distinct"] == 30.0  # exact-path contract
    assert got["nulls"]["n_exact"] == 1          # NULLs ignored
    # KMV relative error ~ 1/sqrt(k) = 6.25%; allow 4 sigma
    est = got["big"]["est_distinct"]
    assert got["big"]["n_exact"] == 5000
    assert abs(est - 5000) / 5000 < 0.25
    assert est != 5000  # the estimator, not a hidden exact count


def test_deterministic_across_partitionings(values):
    a = sorted(
        map(tuple, SK.kmv_distinct(values, "v", ["grp"], k=64).collect())
    )
    b = sorted(
        map(
            tuple,
            SK.kmv_distinct(
                values.repartition(17), "v", ["grp"], k=64
            ).collect(),
        )
    )
    assert a == b


def test_merge_property(spark):
    """Union-then-sketch equals sketching the union of halves — the
    bottom-k of a union is the bottom-k of merged bottom-k sets, which
    is why cross-crawl sketch ledgers can merge without rescanning."""
    h1 = spark.createDataFrame(
        [("g", f"a{i}") for i in range(2000)], "grp string, v string"
    )
    h2 = spark.createDataFrame(
        [("g", f"a{i}") for i in range(1000, 3000)], "grp string, v string"
    )
    whole = SK.kmv_distinct(h1.union(h2), "v", ["grp"], k=128).collect()[0]
    assert whole["n_exact"] == 3000
    # simulate the merge: take each half's bottom-k hash sets and
    # re-estimate from the merged bottom-k
    import numpy as np
    from data_quality_analyzer_spark.functions import hashing as HH

    hs = set()
    for half in (h1, h2):
        hset = sorted(
            r["_h"]
            for r in half.select(
                F.expr(HH.h60_spark_sql("CAST(v AS STRING)")).alias("_h")
            )
            .distinct()
            .collect()
        )[:128]
        hs |= set(hset)
    merged = sorted(hs)[:128]
    est_merged = 127 * float(SK.H_SPACE) / merged[-1]
    assert round(est_merged, 2) == whole["est_distinct"]


def test_k_validation(values):
    with pytest.raises(ValueError, match="k must be"):
        SK.kmv_distinct(values, "v", ["grp"], k=1)


# ---------------------------------------------------------------------------
# Cross-run KMV sketch ledger (plans/lineage.py)
# ---------------------------------------------------------------------------


def test_kmv_ledger_merges_crawls(spark, tmp_path):
    from data_quality_analyzer_spark.plans import lineage as LN

    store = str(tmp_path / "kmv")
    crawl1 = spark.createDataFrame(
        [("g", f"a{i}") for i in range(2000)], "grp string, v string"
    )
    crawl2 = spark.createDataFrame(
        [("g", f"a{i}") for i in range(1000, 3000)]  # 1000 overlap
        + [("h", f"b{i}") for i in range(40)],       # new small group
        "grp string, v string",
    )
    LN.commit_kmv_sketch(spark, crawl1, store, "c1", "v", ["grp"], k=128)
    LN.commit_kmv_sketch(spark, crawl2, store, "c2", "v", ["grp"], k=128)
    got = {
        r["grp"]: r["est_distinct"]
        for r in LN.kmv_ledger_estimate(spark, store).collect()
    }
    # union is 3000 distinct; ledger estimate must equal the DIRECT
    # sketch of the union (merge-exactness), and be within KMV error
    direct = SK.kmv_distinct(
        crawl1.union(crawl2), "v", ["grp"], k=128
    ).collect()
    direct_g = {r["grp"]: r["est_distinct"] for r in direct}
    assert got["g"] == direct_g["g"]
    assert abs(got["g"] - 3000) / 3000 < 0.3
    assert got["h"] == 40.0  # below k -> exact union count

    # replaying a committed batch is a no-op (idempotent union)
    LN.commit_kmv_sketch(spark, crawl1, store, "c1", "v", ["grp"], k=128)
    again = {
        r["grp"]: r["est_distinct"]
        for r in LN.kmv_ledger_estimate(spark, store).collect()
    }
    assert again == got

    # k / group pinning
    with pytest.raises(ValueError, match="pinned"):
        LN.commit_kmv_sketch(spark, crawl1, store, "c3", "v", ["grp"], k=64)
    with pytest.raises(ValueError, match="no committed"):
        LN.kmv_ledger_estimate(spark, str(tmp_path / "empty"))


def test_count_min_one_sided_and_exact_when_sparse(spark):
    """CMS estimates are >= truth for EVERY item, and exact when the
    vocabulary is far smaller than the width (no collisions forced)."""
    from data_quality_analyzer_spark.operators import sketches as SK

    rows = [(f"tok{i % 7}",) for i in range(140)] + [("rare",)]
    df = spark.createDataFrame(rows, "tok string")
    cells = {
        (r["row_idx"], r["col"]): r["cnt"]
        for r in SK.count_min_sketch(df, "tok").collect()
    }
    est = SK.cms_estimate_expr(cells, "tok").cast("long")
    got = (
        df.groupBy("tok").agg(F.count("*").alias("n"))
        .select("tok", "n", est.alias("e"))
        .collect()
    )
    assert len(got) == 8
    for r in got:
        assert r["e"] >= r["n"], r          # one-sided error contract
        assert r["e"] == r["n"], r          # 8 items in 4x1024 cells: exact


def test_count_min_merges_cellwise(spark):
    """sketch(A ∪ B) == cell-wise sum of sketch(A) + sketch(B) — the
    property cross-crawl frequency ledgers would rely on."""
    from data_quality_analyzer_spark.operators import sketches as SK

    a = spark.createDataFrame([(f"w{i % 5}",) for i in range(50)], "tok string")
    b = spark.createDataFrame([(f"w{i % 9}",) for i in range(90)], "tok string")

    def cells(df):
        return {
            (r["row_idx"], r["col"]): r["cnt"]
            for r in SK.count_min_sketch(df, "tok").collect()
        }

    ca, cb, cu = cells(a), cells(b), cells(a.unionByName(b))
    merged = dict(ca)
    for k, v in cb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == cu


def test_count_min_contracts(spark):
    import pytest as _pytest

    from data_quality_analyzer_spark.operators import sketches as SK

    df = spark.createDataFrame([("x",)], "tok string")
    with _pytest.raises(ValueError, match="depth"):
        SK.count_min_sketch(df, "tok", depth=0)
    with _pytest.raises(ValueError, match="width"):
        SK.count_min_sketch(df, "tok", width=1)


def test_cms_ledger_merges_crawls(spark, tmp_path):
    """Ledger estimate over two committed crawls == direct sketch of the
    union; replaying a batch is a no-op (additive merge is guarded);
    geometry pin raises."""
    from data_quality_analyzer_spark.operators import sketches as SK
    from data_quality_analyzer_spark.plans import lineage as LN

    store = str(tmp_path / "cms_store")
    a = spark.createDataFrame([(f"w{i % 5}",) for i in range(50)], "tok string")
    b = spark.createDataFrame([(f"w{i % 9}",) for i in range(90)], "tok string")
    LN.commit_cms_sketch(spark, a, store, "crawl-a", "tok")
    LN.commit_cms_sketch(spark, b, store, "crawl-b", "tok")
    LN.commit_cms_sketch(spark, a, store, "crawl-a", "tok")  # replay no-op
    cells, depth, width = LN.cms_ledger_cells(spark, store)
    assert (depth, width) == (SK.CMS_DEPTH, SK.CMS_WIDTH)
    direct = {
        (r["row_idx"], r["col"]): r["cnt"]
        for r in SK.count_min_sketch(a.unionByName(b), "tok").collect()
    }
    assert cells == direct
    with pytest.raises(ValueError, match="pinned"):
        LN.commit_cms_sketch(spark, a, store, "crawl-c", "tok", width=256)


def test_bloom_no_false_negatives_and_ledger_union(spark, tmp_path):
    """Every built value probes TRUE (no false negatives — the bloom
    contract); the union ledger preserves it across crawls; replay is a
    no-op; geometry pin raises."""
    from data_quality_analyzer_spark.operators import sketches as SK
    from data_quality_analyzer_spark.plans import lineage as LN

    a = spark.createDataFrame(
        [(f"url-a-{i}",) for i in range(80)], "k string"
    )
    b = spark.createDataFrame(
        [(f"url-b-{i}",) for i in range(60)], "k string"
    )
    store = str(tmp_path / "bloom_store")
    LN.commit_bloom(spark, a, store, "crawl-a", "k", m=512)
    LN.commit_bloom(spark, b, store, "crawl-b", "k", m=512)
    LN.commit_bloom(spark, a, store, "crawl-a", "k", m=512)  # replay no-op
    words, k, m = LN.bloom_ledger_words(spark, store)
    assert (k, m) == (SK.BLOOM_K, 512)
    both = a.unionByName(b)
    probed = SK.bloom_probe(both, "k", words, k=k, m=m)
    assert probed.filter("NOT bloom_hit").count() == 0
    # a value never inserted CAN miss (not guaranteed, but at this load
    # most do) — and NULL probes false
    other = spark.createDataFrame(
        [(f"unseen-{i}",) for i in range(200)] + [(None,)], "k string"
    )
    res = SK.bloom_probe(other, "k", words, k=k, m=m)
    assert res.filter((F.col("k").isNull()) & F.col("bloom_hit")).count() == 0
    assert res.filter("NOT bloom_hit").count() > 0
    with pytest.raises(ValueError, match="pinned"):
        LN.commit_bloom(spark, a, store, "crawl-c", "k", m=256)
    # ledger words == direct union build
    direct = SK.bloom_words(
        (
            r["pos"]
            for r in SK.bloom_build(both, "k", m=512).collect()
        ),
        m=512,
    )
    assert words == direct


def test_cms_and_bloom_ledger_compaction(spark, tmp_path):
    """Compacting either additive ledger folds live segments into one
    base partition with an IDENTICAL merged read, keeps the replay-guard
    list intact (a compacted-away batch can never re-commit), and merges
    post-compaction commits correctly."""
    import os

    from data_quality_analyzer_spark.operators import sketches as SK
    from data_quality_analyzer_spark.plans import lineage as LN

    a = spark.createDataFrame([(f"w{i % 5}",) for i in range(50)], "tok string")
    b = spark.createDataFrame([(f"w{i % 9}",) for i in range(90)], "tok string")
    c = spark.createDataFrame([(f"w{i % 3}",) for i in range(30)], "tok string")

    cms = str(tmp_path / "cms_store")
    LN.commit_cms_sketch(spark, a, cms, "crawl-a", "tok")
    LN.commit_cms_sketch(spark, b, cms, "crawl-b", "tok")
    before = LN.cms_ledger_cells(spark, cms)
    LN.compact_cms_ledger(spark, cms)
    m = LN.read_cms_manifest(cms)
    assert m["segments"] == ["__base_2__"]
    assert m["batches"] == ["crawl-a", "crawl-b"]
    assert LN.cms_ledger_cells(spark, cms) == before
    assert set(os.listdir(os.path.join(cms, LN.CMS_DIR))) == {
        "batch_id=__base_2__"
    }
    LN.commit_cms_sketch(spark, a, cms, "crawl-a", "tok")  # replay: no-op
    assert LN.read_cms_manifest(cms)["segments"] == ["__base_2__"]
    LN.commit_cms_sketch(spark, c, cms, "crawl-c", "tok")
    cells, _, _ = LN.cms_ledger_cells(spark, cms)
    direct = {
        (r["row_idx"], r["col"]): r["cnt"]
        for r in SK.count_min_sketch(
            a.unionByName(b).unionByName(c), "tok"
        ).collect()
    }
    assert cells == direct

    bl = str(tmp_path / "bloom_store")
    ka = spark.createDataFrame([(f"u-{i}",) for i in range(80)], "k string")
    kb = spark.createDataFrame([(f"v-{i}",) for i in range(60)], "k string")
    LN.commit_bloom(spark, ka, bl, "crawl-a", "k", m=512)
    LN.commit_bloom(spark, kb, bl, "crawl-b", "k", m=512)
    w_before = LN.bloom_ledger_words(spark, bl)
    LN.compact_bloom_ledger(spark, bl)
    assert LN.read_bloom_manifest(bl)["segments"] == ["__base_2__"]
    assert LN.bloom_ledger_words(spark, bl) == w_before
    # no false negatives survive compaction
    words, k, mbits = LN.bloom_ledger_words(spark, bl)
    assert (
        SK.bloom_probe(ka.unionByName(kb), "k", words, k=k, m=mbits)
        .filter("NOT bloom_hit")
        .count()
        == 0
    )
