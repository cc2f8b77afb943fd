"""Link-graph authority: href extraction, domain-edge construction,
planted-graph PageRank values, Spark-vs-DuckDB iteration parity on the
q89 synthesis, and the dangling/floor semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import linkgraph as LG


def _pr_py(edges, iters, damping=0.85):
    """Independent pure-Python PageRank twin (dict arithmetic, no Spark,
    no SQL) — the ground truth for the planted-graph tests."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out: dict[str, float] = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0.0) + w
    pr = {n: 1.0 for n in nodes}
    for _ in range(iters):
        mass = {n: 0.0 for n in nodes}
        for s, d, w in edges:
            mass[d] += pr[s] * w / out[s]
        pr = {n: (1.0 - damping) + damping * mass[n] for n in nodes}
    return pr


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # two parseable links (one of them a self-loop), one single-quoted
        # href that the double-quote pattern must NOT match
        (
            "a.com",
            '<a href="https://b.com/x">t</a>'
            '<a href="https://a.com/self">s</a>'
            "<a href='https://c.com/sq'>nope</a>",
        ),
        ("a.com", '<a href="http://b.com/y">t</a>'),  # a→b again: weight 2
        ("a.com", '<a href="c.com/bare">t</a>'),  # bare domain target
        ("b.com", '<a href="https://WWW.C.com:8080/p?q=1#f">t</a>'),
        ("c.com", '<a href="https://a.com/back">t</a>'),
        ("c.com", "no links here"),  # contributes nothing
        ("d.com", '<a href="   ">t</a>'),  # blank target → NULL → dropped
    ]
    return spark.createDataFrame(rows, "src_domain string, html string")


def test_extract_links(spark, pages):
    got = (
        LG.extract_links(pages, "html")
        .groupBy("src_domain")
        .count()
        .collect()
    )
    counts = {r["src_domain"]: r["count"] for r in got}
    # row 1 has 2 double-quoted hrefs (single-quoted one excluded);
    # c.com's linkless page and d.com's blank href still EXTRACT (the
    # blank is a real href attribute) — domain parsing drops it later.
    assert counts == {"a.com": 4, "b.com": 1, "c.com": 1, "d.com": 1}


def test_domain_edges(pages):
    got = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in LG.domain_edges(pages, "src_domain", "html").collect()
    }
    # self-loop a→a dropped; a→b weight summed across pages; b's messy
    # URL normalizes to c.com; d's blank target never becomes an edge
    assert got == {
        ("a.com", "b.com"): 2,
        ("a.com", "c.com"): 1,
        ("b.com", "c.com"): 1,
        ("c.com", "a.com"): 1,
    }


PLANTED = [
    ("a", "b", 2),
    ("a", "c", 1),
    ("c", "a", 1),
    ("b", "d", 1),  # d is dangling: receives mass, leaks its own
]


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_pagerank_planted(spark, iters):
    edges = spark.createDataFrame(
        PLANTED, "src_domain string, dst_domain string, weight long"
    )
    got = {
        r["domain"]: r["pr"]
        for r in LG.pagerank(edges, iters=iters).collect()
    }
    want = _pr_py(PLANTED, iters)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)
    if iters == 1:
        # hand-pinned: pr1(b) = 0.15 + 0.85 * (1.0 * 2/3)
        assert got["b"] == pytest.approx(0.15 + 0.85 * 2 / 3, abs=1e-12)


def test_pagerank_duck_parity_on_q89_pages(spark):
    """End-to-end parity at TWO iterations (the entry query certifies
    one): Spark edges+PageRank over the real q89 HTML synthesis must
    match the unrolled DuckDB CTE chain over the same pages."""
    from data_quality_analyzer_spark.plans.entry_queries import _q89_pages

    d = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    pages = _q89_pages(d)
    spark_pr = {
        r["domain"]: r["pr"]
        for r in LG.pagerank(
            LG.domain_edges(pages, "src_domain", "html"), iters=2
        ).collect()
    }

    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    sql = f"""
    WITH edges AS ({LG.domain_edges_duck_sql('pages')}),
    {LG.pagerank_duck_ctes('edges', iters=2)}
    SELECT domain, pr FROM pr2
    """
    duck_pr = {dom: pr for dom, pr in con.execute(sql).fetchall()}
    assert set(spark_pr) == set(duck_pr) and len(spark_pr) == 23
    for n, v in duck_pr.items():
        assert spark_pr[n] == pytest.approx(v, abs=1e-9)


def test_domain_authority_floor_and_degrees(spark):
    """A never-linked-to source keeps the (1 - damping) floor with zero
    inlinks; a dangling sink reports zero outlinks."""
    edges_rows = [("x.com", '<a href="https://y.com/p">t</a>')]
    pages = spark.createDataFrame(edges_rows, "src_domain string, html string")
    got = {
        r["domain"]: r
        for r in LG.domain_authority(pages, "src_domain", "html").collect()
    }
    assert got["x.com"]["n_inlinks"] == 0
    assert got["x.com"]["pr"] == pytest.approx(0.15)
    assert got["y.com"]["n_outlinks"] == 0
    assert got["y.com"]["n_src_domains"] == 1
    assert got["y.com"]["pr"] == pytest.approx(1.0)  # 0.15 + 0.85 * 1.0


def test_extract_anchors_pairs(spark):
    rows = [
        (
            "s.com",
            '<a href="https://a.com/1" class="x" rel=nofollow> One </a>'
            '<a href="https://b.com/2"></a>'  # image-only: empty text
            '<a href="https://c.com/3">Two</a>',
        )
    ]
    df = spark.createDataFrame(rows, "src_domain string, html string")
    got = [
        (r["link_url"], r["anchor_text"])
        for r in LG.extract_anchors(df, "html")
        .orderBy("link_url")
        .collect()
    ]
    # attributes between href and '>' must not break the pairing; text
    # is trimmed; empty anchors survive extraction (policy is downstream)
    assert got == [
        ("https://a.com/1", "One"),
        ("https://b.com/2", ""),
        ("https://c.com/3", "Two"),
    ]


def test_anchor_text_profile_election(spark):
    def page(src, url, text):
        return (src, f'<a href="{url}">{text}</a>')

    rows = [
        page("s1.com", "https://t.com/a", "beta"),
        page("s2.com", "https://t.com/b", "beta"),
        page("s3.com", "https://t.com/c", "alpha"),
        page("s4.com", "https://t.com/d", "alpha"),  # tie 2-2: alpha wins
        page("s5.com", "https://t.com/e", "gamma"),
        page("t.com", "https://t.com/self", "self"),  # self-link excluded
        page("s6.com", "https://u.org/x", ""),  # empty text excluded
        page("s7.com", "https://u.org/y", "only"),
    ]
    df = spark.createDataFrame(rows, "src_domain string, html string")
    got = {
        r["domain"]: r
        for r in LG.anchor_text_profile(df, "src_domain", "html").collect()
    }
    assert set(got) == {"t.com", "u.org"}
    t = got["t.com"]
    assert (t["n_anchors"], t["n_distinct_texts"]) == (5, 3)
    assert (t["top_text"], t["top_text_n"]) == ("alpha", 2)
    u = got["u.org"]
    assert (u["n_anchors"], u["top_text"], u["top_text_n"]) == (1, "only", 1)


def test_reciprocity_planted(spark):
    edges = spark.createDataFrame(
        [
            ("a", "b", 5),  # a<->b exchange ring
            ("b", "a", 1),
            ("a", "c", 2),  # one-way
            ("c", "d", 1),  # one-way; d never links out
        ],
        "src_domain string, dst_domain string, weight long",
    )
    got = {
        r["domain"]: (r["n_neighbors"], r["n_reciprocal"])
        for r in LG.reciprocity(edges).collect()
    }
    # sources only — d has no outbound edges, so it has no reciprocity row
    assert got == {"a": (2, 1), "b": (1, 1), "c": (1, 0)}


def test_link_edge_ledger_matches_one_shot(spark, tmp_path):
    """Three committed crawls must merge to EXACTLY the edges (and
    therefore the authority report) of one-shot extraction over the
    concatenated pages; replaying a batch must not double-count."""
    from data_quality_analyzer_spark.plans import lineage as L
    from data_quality_analyzer_spark.plans.entry_queries import _q89_pages

    store = str(tmp_path / "edges_ledger")
    d = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    all_pages = _q89_pages(d)
    batches = [
        _q89_pages(d.filter(F.col("doc_id") % 3 == k)) for k in range(3)
    ]
    for k, b in enumerate(batches):
        L.commit_link_edges(spark, b, store, f"crawl-{k}")
    L.commit_link_edges(spark, batches[1], store, "crawl-1")  # replay no-op

    merged = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in L.link_ledger_edges(spark, store).collect()
    }
    one_shot = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in LG.domain_edges(all_pages, "src_domain", "html").collect()
    }
    assert merged == one_shot and len(merged) > 0

    led = {
        r["domain"]: r
        for r in L.link_ledger_authority(spark, store, iters=2).collect()
    }
    direct = {
        r["domain"]: r
        for r in LG.domain_authority(
            all_pages, "src_domain", "html", iters=2
        ).collect()
    }
    assert set(led) == set(direct)
    for dom in direct:
        assert led[dom]["n_inlinks"] == direct[dom]["n_inlinks"]
        assert led[dom]["pr"] == pytest.approx(direct[dom]["pr"], abs=1e-9)


def test_link_ledger_compaction(spark, tmp_path):
    """Compaction must fold live segments into one base partition while
    (a) the merged result stays identical, (b) old segment dirs vanish,
    (c) replaying a pre-compaction batch stays a no-op (guard list
    survives), and (d) commits AFTER compaction merge correctly."""
    import os

    from data_quality_analyzer_spark.plans import lineage as L
    from data_quality_analyzer_spark.plans.entry_queries import _q89_pages

    store = str(tmp_path / "ledger")
    d = spark.range(0, 90).withColumnRenamed("id", "doc_id")
    batches = [
        _q89_pages(d.filter(F.col("doc_id") % 3 == k)) for k in range(3)
    ]
    for k in range(2):
        L.commit_link_edges(spark, batches[k], store, f"crawl-{k}")
    before = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in L.link_ledger_edges(spark, store).collect()
    }

    L.compact_link_ledger(spark, store)
    m = L.read_edges_manifest(store)
    assert m["segments"] == ["__base_2__"]
    assert m["batches"] == ["crawl-0", "crawl-1"]  # guard list intact
    after = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in L.link_ledger_edges(spark, store).collect()
    }
    assert after == before
    live = set(os.listdir(os.path.join(store, L.EDGES_DIR)))
    assert live == {"batch_id=__base_2__"}

    # replay of a compacted-away batch must STILL be a no-op
    L.commit_link_edges(spark, batches[0], store, "crawl-0")
    assert L.read_edges_manifest(store)["segments"] == ["__base_2__"]

    # a genuinely new commit merges on top of the base
    L.commit_link_edges(spark, batches[2], store, "crawl-2")
    full = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in L.link_ledger_edges(spark, store).collect()
    }
    one_shot = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in LG.domain_edges(
            _q89_pages(d), "src_domain", "html"
        ).collect()
    }
    assert full == one_shot

    # idempotence: compacting twice collapses base + crawl-2 again
    L.compact_link_ledger(spark, store)
    L.compact_link_ledger(spark, store)  # single segment: no-op
    assert {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in L.link_ledger_edges(spark, store).collect()
    } == one_shot


def test_link_ledger_empty_raises(spark, tmp_path):
    from data_quality_analyzer_spark.plans import lineage as L

    with pytest.raises(ValueError):
        L.link_ledger_edges(spark, str(tmp_path / "nope"))


def test_pagerank_rejects_bad_iters(spark):
    edges = spark.createDataFrame(
        PLANTED, "src_domain string, dst_domain string, weight long"
    )
    with pytest.raises(ValueError):
        LG.pagerank(edges, iters=0)
    with pytest.raises(ValueError):
        LG.pagerank_duck_ctes("edges", iters=0)
