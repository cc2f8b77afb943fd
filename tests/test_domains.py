"""Domain/source blocklist operator: URL normalization, exact vs
subdomain matching, list vs DataFrame blocklists, allow mode, NULL
policy, audit stats, and the prep_text_corpus stage-0 wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import domains as DM


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "https://WWW.Spam.com:8080/page?q=1", "x"),
        (1, "http://user@sub.spam.com/path", "x"),
        (2, "good.org", "x"),
        (3, "https://news.good.org/a", "x"),
        (4, None, "x"),
        (5, "spam.com", "x"),
        (6, "notspam.com", "x"),  # suffix must NOT match '.spam.com'
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_extract_domain(spark, docs):
    got = {
        r["doc_id"]: r["d"]
        for r in docs.select(
            "doc_id", DM.extract_domain(F.col("url")).alias("d")
        ).collect()
    }
    assert got == {
        0: "spam.com",
        1: "sub.spam.com",
        2: "good.org",
        3: "news.good.org",
        4: None,
        5: "spam.com",
        6: "notspam.com",
    }
    # DuckDB twin agrees
    import duckdb
    import pandas as pd

    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("d", pdf)
    duck = dict(
        con.execute(
            f"SELECT doc_id, {DM.extract_domain_sql('url')} FROM d"
        ).fetchall()
    )
    assert duck == got


def test_blocklist_exact_and_subdomains(docs):
    # exact: only the bare spam.com rows drop
    kept = {
        r["doc_id"]
        for r in DM.apply_blocklist(
            docs, ["Spam.com"], "url", is_url=True
        ).collect()
    }
    assert kept == {1, 2, 3, 4, 6}
    # with subdomains: sub.spam.com drops too; notspam.com survives
    kept = {
        r["doc_id"]
        for r in DM.apply_blocklist(
            docs, ["spam.com"], "url", is_url=True, with_subdomains=True
        ).collect()
    }
    assert kept == {2, 3, 4, 6}


def test_blocklist_dataframe_side(spark, docs):
    bl = spark.createDataFrame([("spam.com",)], "domain string")
    kept = {
        r["doc_id"]
        for r in DM.apply_blocklist(docs, bl, "url", is_url=True).collect()
    }
    assert kept == {1, 2, 3, 4, 6}
    kept = {
        r["doc_id"]
        for r in DM.apply_blocklist(
            docs, bl, "url", is_url=True, with_subdomains=True
        ).collect()
    }
    assert kept == {2, 3, 4, 6}
    with pytest.raises(ValueError, match="one column"):
        DM.apply_blocklist(docs, docs, "url")


def test_allow_mode_null_policy(spark, docs):
    # allowlist: NULL domain rows cannot pass
    kept = {
        r["doc_id"]
        for r in DM.apply_blocklist(
            docs, ["good.org"], "url", mode="allow", is_url=True,
            with_subdomains=True,
        ).collect()
    }
    assert kept == {2, 3}
    bl = spark.createDataFrame([("good.org",)], "domain string")
    kept_df = {
        r["doc_id"]
        for r in DM.apply_blocklist(
            docs, bl, "url", mode="allow", is_url=True, with_subdomains=True
        ).collect()
    }
    assert kept_df == {2, 3}
    # blocklist mode keeps NULL-domain rows
    assert 4 in {
        r["doc_id"]
        for r in DM.apply_blocklist(
            docs, ["good.org"], "url", is_url=True
        ).collect()
    }
    with pytest.raises(ValueError, match="mode"):
        DM.apply_blocklist(docs, ["x"], "url", mode="drop")


def test_keep_stats(docs):
    stats = {
        r["domain"]: (r["n_docs"], r["n_blocked"], r["n_kept"])
        for r in DM.domain_keep_stats(
            docs, ["spam.com"], "url", is_url=True, with_subdomains=True
        ).collect()
    }
    assert stats["spam.com"] == (2, 2, 0)
    assert stats["sub.spam.com"] == (1, 1, 0)
    assert stats["good.org"] == (1, 0, 1)
    assert stats["notspam.com"] == (1, 0, 1)
    assert stats[None] == (1, 0, 1)


def test_blocklist_is_map_only(docs):
    """The literal path must stay a pure filter: no shuffle, no UDF."""
    plan = (
        DM.apply_blocklist(docs, ["spam.com"], "url", is_url=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_prep_text_corpus_stage0(spark):
    """Planted blocked domain: its docs never survive prep, and the stage
    runs before content heuristics (a PERFECT doc from a blocked source
    still drops)."""
    from data_quality_analyzer_spark.plans.prep import prep_text_corpus

    good = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps by the door while the cat watches the quiet garden path"
    )
    rows = [
        (1, good, "en", "goodsite"),
        (2, good + " again and again the story continues", "en", "badsite"),
        (3, good + " yet another fine sentence for the corpus", "en", "goodsite"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = prep_text_corpus(spark, docs, blocked_sources=["badsite"])
    ids = {r["doc_id"] for r in out.collect()}
    assert 2 not in ids
    assert ids == {1, 3}


def test_large_subdomain_blocklist_stays_flat(spark, docs):
    """A curated suffix blocklist with thousands of entries must not
    build a thousands-deep Or(endswith) tree (Catalyst stack overflow);
    the arrays_overlap form is flat and still correct (round-5 review
    finding)."""
    big = [f"blocked{i}.example" for i in range(5000)] + ["spam.com"]
    kept = {
        r["doc_id"]
        for r in DM.apply_blocklist(
            docs, big, "url", is_url=True, with_subdomains=True
        ).collect()
    }
    assert kept == {2, 3, 4, 6}  # sub.spam.com + spam.com drop
    stats = {
        r["domain"]: r["n_blocked"]
        for r in DM.domain_keep_stats(
            docs, big, "url", is_url=True, with_subdomains=True
        ).collect()
    }
    assert stats["sub.spam.com"] == 1 and stats["good.org"] == 0
    import pytest as _pt

    with _pt.raises(ValueError, match="entries"):
        DM.domain_keep_stats(
            docs, [f"x{i}.com" for i in range(10_001)], "url"
        )


def test_domain_reputation_shrinkage(spark):
    """Small domains shrink hard toward the global rate; large domains
    keep (approximately) their raw rate. Expected values computed by the
    Beta-binomial formula directly."""
    rows = (
        # big.com: 40 docs, 30 kept (raw 0.75)
        [(i, "big.com", i < 30) for i in range(40)]
        # tiny.com: 2 docs, 2 kept (raw 1.0 -- luck)
        + [(100 + i, "tiny.com", True) for i in range(2)]
        # null source bucket: 3 docs, 0 kept
        + [(200 + i, None, False) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, keep boolean")
    got = {
        r["domain"]: r
        for r in DM.domain_reputation(
            df, F.col("keep"), "source", prior_strength=20
        ).collect()
    }
    g = 32 / 45  # global keep rate
    assert got["big.com"]["n_docs"] == 40
    assert abs(got["big.com"]["reputation"] - round((30 + 20 * g) / 60, 4)) < 1e-9
    assert abs(got["tiny.com"]["reputation"] - round((2 + 20 * g) / 22, 4)) < 1e-9
    # tiny.com's raw 1.0 must be pulled well below big.com's shrunk 0.75-ish
    assert got["tiny.com"]["reputation"] < got["big.com"]["reputation"] + 0.1
    # NULL sources aggregate under a NULL domain and never crash
    assert None in got and got[None]["n_keep"] == 0


CANON_CASES = [
    ("https://WWW.Example.com:443/Page/3/", "example.com/Page/3"),
    ("HTTP://example.com/Page/3", "example.com/Page/3"),
    (
        "https://example.com/a?utm_source=x&b=2&a=1&fbclid=zz#frag",
        "example.com/a?a=1&b=2",
    ),
    ("example.com/a?ref=tw", "example.com/a"),
    ("https://user@sub.example.com:8080/x//", "sub.example.com/x"),
    ("https://example.com", "example.com"),
    ("https://example.com/?", "example.com"),
    ("", None),
    ("   ", None),
    (None, None),
    # param ORDER must not matter
    ("https://e.com/p?b=2&a=1", "e.com/p?a=1&b=2"),
    ("https://e.com/p?a=1&b=2", "e.com/p?a=1&b=2"),
    # utm_ prefix match but not a tracked exact key
    ("https://e.com/p?utm=keepme", "e.com/p?utm=keepme"),
]


def test_canonicalize_url_three_engines(spark):
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame({"u": [c for c, _ in CANON_CASES]})
    got_spark = (
        spark.createDataFrame(pdf)
        .select(DM.canonicalize_url(F.col("u")).alias("c"))
        .toPandas()["c"]
    )
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = con.sql(
        f"SELECT {DM.canonicalize_url_sql('u')} c FROM t"
    ).df()["c"]
    for (raw, want), a, b in zip(CANON_CASES, got_spark, got_duck):
        av = None if pd.isna(a) else a
        bv = None if pd.isna(b) else b
        assert av == want, (raw, "spark", av)
        assert bv == want, (raw, "duck", bv)
        assert DM.canonicalize_url_python(raw) == want, (raw, "python")
