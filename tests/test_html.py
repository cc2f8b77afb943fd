"""HTML → text extraction: three-engine agreement (Spark / DuckDB /
Python re) on adversarial pages, plus the derived title and
link-density signals."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import html as HT

PAGES: list[tuple[int, str | None]] = [
    (0, "<html><body><p>Hello  world</p><p>Second para</p></body></html>"),
    # script containing '<', style, comment spanning lines
    (1, "<head><script>if (1 < 2) { x(); }</script><style>p\n{color:red}\n"
        "</style></head><body>kept<!-- multi\nline\ncomment -->text</body>"),
    # entities incl. double-encoding, nbsp, quotes
    (2, "<p>&amp;lt; stays encoded, &lt;b&gt; is literal, "
        "&quot;q&quot; &#39;a&#39; &nbsp;end</p>"),
    # block structure: br/hr/li/h1 become line breaks
    (3, "<h1>Title</h1><ul><li>one</li><li>two</li></ul>a<br>b<hr>c"),
    # anchors with nested tags; uppercase tags; trailing slash br
    (4, "<DIV>Nav: <A HREF='/x'><B>home</B></A> <a href='/y'>away</a>"
        "</DIV><P>body text here</P><br/>tail"),
    # unclosed/stray tags and bare '<' left alone when not a tag...
    (5, "<p>alpha <beta gamma</p> delta"),
    (6, None),
    # whitespace soup: tabs, CRLF, leading/trailing blanks
    (7, "  <p>\t a \r\n b \t</p>\n\n<p>  c  </p>  "),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "doc_id long, html string")


@pytest.fixture(scope="module")
def spark_extracted(pages):
    rows = pages.select(
        "doc_id",
        HT.strip_html(F.col("html")).alias("text"),
        HT.extract_title(F.col("html")).alias("title"),
        HT.link_density(
            F.col("html"), HT.strip_html(F.col("html"))
        ).alias("ld"),
    ).collect()
    return {r["doc_id"]: r for r in rows}


def test_extraction_semantics(spark_extracted):
    got = {k: r["text"] for k, r in spark_extracted.items()}
    assert got[0] == "Hello world\nSecond para"
    assert got[1] == "kepttext"
    assert got[2] == '&lt; stays encoded, <b> is literal, "q" \'a\' end'
    assert got[3] == "Title\none\ntwo\na\nb\nc"
    assert got[4] == "Nav: home away\nbody text here\ntail"
    # the '</p>' became '\n' in the BLOCK step, so by the tag-strip step
    # the stray '<' has no '>' left to pair with and survives literally —
    # the content-preserving choice, identical in all three engines
    assert got[5] == "alpha <beta gamma\ndelta"
    assert got[6] is None
    assert got[7] == "a\nb\nc"


def test_three_engine_agreement(pages, spark_extracted):
    con = duckdb.connect()
    con.register("pages", pd.DataFrame(PAGES, columns=["doc_id", "html"]))
    duck = {
        r[0]: r
        for r in con.execute(
            f"SELECT doc_id, {HT.strip_html_sql('html')}, "
            f"{HT.extract_title_sql('html')}, "
            f"{HT.link_density_sql('html', HT.strip_html_sql('html'))} "
            f"FROM pages"
        ).fetchall()
    }
    for doc_id, html in PAGES:
        s = spark_extracted[doc_id]
        assert duck[doc_id][1] == s["text"], doc_id
        assert duck[doc_id][2] == s["title"], doc_id
        assert duck[doc_id][3] == pytest.approx(s["ld"], abs=0), doc_id
        assert HT.strip_html_py(html) == s["text"], doc_id


def test_title_extraction(spark):
    rows = spark.createDataFrame(
        [
            (0, "<title>Plain</title>"),
            (1, "<TITLE class=x>&amp; Upper  case\ntitle </TITLE>x"),
            (2, "<p>no title</p>"),
            (3, None),
        ],
        "doc_id long, html string",
    )
    got = {
        r["doc_id"]: r["t"]
        for r in rows.select(
            "doc_id", HT.extract_title(F.col("html")).alias("t")
        ).collect()
    }
    assert got == {0: "Plain", 1: "& Upper case title", 2: None, 3: None}


def test_link_density_math(spark_extracted):
    # page 4: anchor inner text 'home' + 'away' = 8 chars,
    # extracted = 'Nav: home away\nbody text here\ntail' = 34 chars
    assert spark_extracted[4]["ld"] == round(8 / 34, 4)
    # no anchors → 0.0; NULL html → NULL
    assert spark_extracted[0]["ld"] == 0.0
    assert spark_extracted[6]["ld"] is None


def test_prep_text_corpus_html_stage(spark):
    """Raw-crawl entry to prep_text_corpus: html_col extraction + the
    link-density boilerplate gate run as stage 0b, before any text
    stage."""
    from data_quality_analyzer_spark.plans.prep import prep_text_corpus
    from data_quality_analyzer_spark.sources import seed_corpus as SC

    sents = SC.sentences("en", 8, seed=11)
    good = " ".join(sents[0:4])
    good2 = " ".join(sents[4:8])
    wrap = lambda t: f"<html><body><p>{t}</p></body></html>"  # noqa: E731
    farm_links = "".join(
        f'<a href="/{i}">section link {i}</a> ' for i in range(30)
    )
    rows = [
        (1, wrap(good), "web"),                       # survives
        (2, wrap(good2) + f"<div>{farm_links}</div>", "web"),  # link farm
        (3, wrap(good2), "spam.example"),             # blocked source
        (4, None, "web"),                             # null page
    ]
    crawl = spark.createDataFrame(rows, "doc_id long, html string, source string")
    funnel: list = []
    out = prep_text_corpus(
        spark,
        crawl,
        html_col="html",
        max_link_density=0.3,
        blocked_sources=["spam.example"],
        funnel=funnel,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1}
    assert got[1]["text"] == HT.strip_html_py(wrap(good))
    assert "link_density" in out.columns and "title" in out.columns
    stages = [e["stage"] for e in funnel]
    assert stages[:3] == ["input", "blocklist", "html_extract"]
    by = {e["stage"]: e for e in funnel}
    assert by["blocklist"]["dropped"] == 1     # row 3
    assert by["html_extract"]["dropped"] == 1  # row 2 (farm), row 4 kept NULL
    assert by["heuristics"]["dropped"] == 1    # row 4 (NULL text)

    with pytest.raises(ValueError, match="requires html_col"):
        prep_text_corpus(spark, crawl, max_link_density=0.3)


def test_extract_pages_wiring(pages):
    out = HT.extract_pages(pages.filter(F.col("html").isNotNull()))
    assert {"doc_id", "html", "text", "title", "link_density"} <= set(
        out.columns
    )
    assert out.filter(F.col("text").isNull()).count() == 0


def test_map_only_plan(spark):
    """Extraction adds no exchange and no UDF: single-partition input ->
    pure codegen projection."""
    sdf = spark.createDataFrame(
        [(1, "<p>body</p>")], "doc_id long, html string"
    ).coalesce(1)
    plan = (
        HT.extract_pages(sdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan  # no Arrow/UDF node anywhere
