"""robots.txt layer (operators/robots.py): parse semantics (star groups,
consecutive UA headers, comments, wildcard conservatism) and the
longest-prefix / Allow-wins matching rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import robots as RB

_TXT = "\r\n".join(
    [
        "# global bot policy",
        "User-agent: evilbot",
        "Disallow: /",
        "",
        "User-agent: goodbot",
        "User-agent: *",          # consecutive UA lines share one group
        "Disallow: /private  # keep out",
        "Allow: /private/ok",
        "Disallow: /tmp*junk",    # wildcard Disallow: truncated (conservative)
        "Allow: /cgi*bin",        # wildcard Allow: dropped (conservative)
        "Allow: /exact$",         # anchored Allow: dropped (conservative)
        "Disallow: /search$",     # anchored Disallow: anchor stripped
        "Disallow: *.gif",        # leading wildcard: blocks EVERYTHING
        "Disallow:",              # empty Disallow = allow-all: dropped
        "",
        "User-agent: otherbot",
        "Disallow: /only-otherbot",
    ]
)


def test_parse_robots_star_groups(spark):
    df = spark.createDataFrame([("ex.com", _TXT)], "domain string, robots_txt string")
    rules = {
        (r["allow"], r["prefix"]) for r in RB.parse_robots(df).collect()
    }
    assert rules == {
        (False, "/private"),
        (True, "/private/ok"),
        (False, "/tmp"),          # truncated at '*'
        (False, "/search"),       # '$' anchor stripped (superset)
        (False, "/"),             # leading wildcard -> block-all prefix
    }


def test_apply_robots_matching(spark):
    rules = spark.createDataFrame(
        [
            ("ex.com", False, "/private"),
            ("ex.com", True, "/private/ok"),
            ("ex.com", False, "/p"),
            ("ex.com", True, "/p"),  # tie on length: Allow wins
        ],
        "domain string, allow boolean, prefix string",
    )
    urls = [
        (1, "https://ex.com/private/doc", False),   # blocked
        (2, "https://ex.com/private/ok/x", True),   # longer Allow wins
        (3, "https://ex.com/public", True),         # tie -> Allow... /p matches both
        (4, "https://ex.com/other", True),          # no match -> allowed
        (5, "https://ex.com", True),                # empty path -> '/'
        (6, "https://nowhere.net/private/doc", True),  # no rules domain
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in urls], "doc_id long, url string"
    )
    out = RB.apply_robots(df, rules)
    assert out.count() == len(urls)  # annotation never duplicates rows
    got = {r["doc_id"]: r["robots_allowed"] for r in out.collect()}
    assert got == {i: want for i, _u, want in urls}


def test_apply_robots_preserves_columns_and_bare_urls(spark):
    """Annotation keeps payload columns; scheme-less URLs and
    www./case-mismatched rule domains still match."""
    rules = spark.createDataFrame(
        [("www.Ex.com", False, "/priv")],
        "domain string, allow boolean, prefix string",
    )
    df = spark.createDataFrame(
        [(1, "ex.com/priv/x", "payload"), (2, "//ex.com/open", "p2")],
        "doc_id long, url string, text string",
    )
    out = {r["doc_id"]: r for r in RB.apply_robots(df, rules).collect()}
    assert out[1]["robots_allowed"] is False   # bare URL still blocked
    assert out[2]["robots_allowed"] is True
    assert out[1]["text"] == "payload"         # payload column preserved


def test_parse_crawl_delays(spark):
    """Star-group scoping, non-numeric/negative dropped, MAX on
    conflict, absent domains absent from the output."""
    from data_quality_analyzer_spark.operators import robots as RB

    rows = [
        ("a.com", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"),
        # delay inside a NON-star group must be ignored; the star group
        # states two delays -> max wins
        (
            "b.com",
            "User-agent: gptbot\nCrawl-delay: 30\n\n"
            "User-agent: *\nCrawl-delay: 1.5\nCrawl-delay: 4\n",
        ),
        ("c.com", "User-agent: *\nCrawl-delay: soon\n"),  # non-numeric
        ("d.com", "User-agent: *\nCrawl-delay: -3\n"),  # negative
        ("e.com", "User-agent: *\nDisallow: /\n"),  # no delay line
    ]
    df = spark.createDataFrame(rows, "domain string, robots_txt string")
    got = {
        r["domain"]: r["crawl_delay_s"]
        for r in RB.parse_crawl_delays(df).collect()
    }
    assert got == {"a.com": 2.0, "b.com": 4.0}
