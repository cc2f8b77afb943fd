"""Composed crawl planning: each stage's planted reject must fall at
exactly its own boundary, the funnel must attribute every drop, and the
final waves must respect the politeness cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.plans import crawl as CW


def _sitemap(urls):
    return "".join(f"<url><loc>{u}</loc></url>" for u in urls)


@pytest.fixture(scope="module")
def scenario(spark, tmp_path_factory):
    """a.com: a utm-variant pair (collapses), a robots-blocked path, a
    plain page.  b.org: one already-crawled page (in the Bloom ledger)
    plus three fresh ones; cap=2 forces two waves for b.org."""
    sitemaps = spark.createDataFrame(
        [
            (
                _sitemap(
                    [
                        "https://a.com/page1",
                        " https://a.com/page1?utm_source=map ",  # variant
                        "https://a.com/private/secret",  # robots-blocked
                        "https://a.com/page2",
                    ]
                ),
            ),
            (
                _sitemap(
                    [
                        "https://b.org/old",  # committed as seen
                        "https://b.org/new1",
                        "https://b.org/new2",
                        "https://b.org/new3",
                    ]
                ),
            ),
        ],
        "sitemap_xml string",
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n")],
        "domain string, robots_txt string",
    )
    store = str(tmp_path_factory.mktemp("crawl") / "seen_bloom")
    from data_quality_analyzer_spark.plans import lineage as L

    from data_quality_analyzer_spark.operators import domains as DM

    # the ledger stores CANONICAL urls — same normalization the planner
    # probes with
    seen = spark.createDataFrame(
        [("https://b.org/old",)], "raw string"
    ).select(DM.canonicalize_url(F.col("raw")).alias("url"))
    L.commit_bloom(spark, seen, store, "crawl-000", "url")
    return sitemaps, robots, store


def test_plan_crawl_funnel_and_waves(spark, scenario):
    sitemaps, robots, store = scenario
    funnel: list = []
    plan = CW.plan_crawl(
        spark,
        sitemaps,
        robots=robots,
        seen_store=store,
        per_domain_cap=2,
        funnel=funnel,
    )
    collected = plan.collect()
    rows = {r["url"]: (r["domain"], r["fetch_slot"]) for r in collected}
    # pacing: a.com's stated Crawl-delay: 2 vs b.org's default 1.0;
    # wave k starts at k * cap * delay
    pacing = {
        r["url"]: (r["crawl_delay_s"], r["wave_start_s"]) for r in collected
    }
    assert pacing["a.com/page1"] == (2.0, 0.0)
    assert pacing["b.org/new1"][0] == 1.0
    assert {
        pacing[u][1] for u in pacing if u.startswith("b.org")
    } == {0.0, 2.0}  # slot 1 starts after cap(2) * delay(1.0)
    # survivors in canonical (scheme-stripped) form: a.com page1
    # (variant collapsed) + page2; b.org new1..new3
    assert set(rows) == {
        "a.com/page1",
        "a.com/page2",
        "b.org/new1",
        "b.org/new2",
        "b.org/new3",
    }
    # politeness: cap=2 -> b.org spills into a second wave, a.com doesn't
    b_slots = sorted(s for u, (d, s) in rows.items() if d == "b.org")
    assert b_slots == [0, 0, 1]
    assert all(s == 0 for u, (d, s) in rows.items() if d == "a.com")

    stages = [(e["stage"], e["rows"], e["dropped"]) for e in funnel]
    assert stages == [
        ("discover", 8, None),
        ("canonical_distinct", 7, 1),  # the utm variant collapsed
        ("robots_gate", 6, 1),  # /private/ rejected
        ("seen_filter", 5, 1),  # /old already crawled
        ("trap_throttle", 5, 0),  # trap_cap unset: pass-through
        ("fetch_waves", 5, 0),
    ]


def test_plan_crawl_delay_join_never_fans_out(spark, scenario):
    """Two robots rows that NORMALIZE to the same domain (www. variant)
    must not duplicate plan rows — delays re-aggregate (MAX wins) after
    extract_domain, or every a.com URL would be scheduled twice."""
    sitemaps, _, _ = scenario
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nCrawl-delay: 2\n"),
            ("www.a.com", "User-agent: *\nCrawl-delay: 5\n"),
        ],
        "domain string, robots_txt string",
    )
    plan = CW.plan_crawl(spark, sitemaps, robots=robots, per_domain_cap=2)
    rows = plan.filter(plan.domain == "a.com").collect()
    urls = [r["url"] for r in rows]
    assert sorted(urls) == sorted(set(urls)) == [
        "a.com/page1",
        "a.com/page2",
        "a.com/private/secret",  # these robots have no Disallow
    ]
    assert {r["crawl_delay_s"] for r in rows} == {5.0}  # max wins


def test_plan_crawl_defaults_allow_everything(spark, scenario):
    """No robots, no seen ledger: every canonical URL is scheduled."""
    sitemaps, _, _ = scenario
    plan = CW.plan_crawl(spark, sitemaps, per_domain_cap=8)
    assert plan.count() == 7  # 8 locs minus the collapsed variant


def test_plan_crawl_priorities_reorder_waves(spark, scenario):
    """A (url, priority) frame — the q96 recrawl-tier feed — reorders a
    domain's waves: high-priority URLs fetch first, unprioritized URLs
    (first sightings) last."""
    sitemaps, _, _ = scenario
    prios = spark.createDataFrame(
        [("b.org/new2", 9)], "url string, priority int"
    )
    plan = CW.plan_crawl(
        spark, sitemaps, per_domain_cap=1, priorities=prios
    )
    b = {
        r["url"]: r["fetch_slot"]
        for r in plan.filter(plan.domain == "b.org").collect()
    }
    # cap=1: one URL per wave; the prioritized URL must take wave 0
    assert b["b.org/new2"] == 0
    assert set(b.values()) == {0, 1, 2, 3}  # old+new1..new3: 4 waves
    assert "priority" not in plan.columns


def test_plan_crawl_duplicate_priority_rows_never_fan_out(spark, scenario):
    """A url appearing twice in the priorities feed (two-crawl tier
    export) must not schedule the URL twice — priorities re-aggregate
    MAX per url before the join, like the delays join."""
    sitemaps, _, _ = scenario
    prios = spark.createDataFrame(
        [("b.org/new2", 2), ("b.org/new2", 9)], "url string, priority int"
    )
    plan = CW.plan_crawl(
        spark, sitemaps, per_domain_cap=1, priorities=prios
    )
    b = [r for r in plan.collect() if r["domain"] == "b.org"]
    urls = [r["url"] for r in b]
    assert sorted(urls) == sorted(set(urls))  # no duplicate plan rows
    assert {r["url"]: r["fetch_slot"] for r in b}["b.org/new2"] == 0
