"""robots.txt parsing + URL permission matching — the politeness/legal
layer of a crawl pipeline (RFC 9309): which of a domain's URLs may be
fetched/kept, decided from the domain's own robots.txt.

Scope (pinned, documented): the ``User-agent: *`` groups — the sections
that govern a generic bulk crawler.  Per-bot overrides ride the same
rules table with one more column; out of scope here.  Wildcard/anchor
rules are handled CONSERVATIVELY in both directions: a ``Disallow`` is
stripped of a trailing ``$`` anchor and truncated at the first ``*``
(blocks a superset — never fetches something the rule meant to block;
a LEADING wildcard truncates to the block-everything prefix ``/``),
while an ``Allow`` containing ``*`` or ``$`` is dropped (allows a
subset).  Production needs the RFC's full wildcard/``$`` matcher; the
conservative literal form is the defensible bulk-crawl default.

Parsing is PURE CATALYST (both engines replay it in the q85 oracle):
lines → (key, value) split → User-agent header-run blocks via the
lag+cumulative-sum window pattern (the q74 sessionization shape, per
domain) → directives joined to the blocks whose header set contains
``*``.  Matching: longest-prefix rule wins, Allow beats Disallow at
equal length (the de-facto Google rule), no match ⇒ allowed — decided
by one ``max(struct(prefix_len, allow))`` hash aggregate per URL after
a broadcast join against the rules table (rules ≪ corpus: a few rows
per domain).

Reference ancestor: P2 membership filter (claim_analysis.py:30-35) as a
per-domain POLICY rather than a global list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import domains as DM


def parse_robots(
    df: DataFrame, domain_col: str = "domain", txt_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt text → rules table ``(domain, allow boolean, prefix)``
    for the ``User-agent: *`` groups (see module docstring)."""
    blocked, star_blocks = _star_blocks(df, domain_col, txt_col)
    dirs = blocked.filter(F.col("key").isin("allow", "disallow")).join(
        star_blocks, ["domain", "block_id"]
    )
    allow = F.col("key") == "allow"
    # conservative wildcard/anchor handling (module docstring); empty
    # directives (Disallow: = allow-all) are dropped FIRST so that a
    # leading-wildcard Disallow truncating to '' maps to the
    # block-everything prefix '/' instead of vanishing
    dirs = dirs.filter(F.col("value") != "")
    trunc = F.substring_index(
        F.regexp_replace("value", r"\$$", ""), "*", 1
    )
    prefix = F.when(
        allow,
        F.when(
            ~F.col("value").contains("*") & ~F.col("value").contains("$"),
            F.col("value"),
        ),
    ).otherwise(F.when(trunc == "", F.lit("/")).otherwise(trunc))
    return (
        dirs.select("domain", allow.alias("allow"), prefix.alias("prefix"))
        .filter(F.col("prefix").isNotNull())
    )


def parse_crawl_delays(
    df: DataFrame, domain_col: str = "domain", txt_col: str = "robots_txt"
) -> DataFrame:
    """(domain, crawl_delay_s) from ``Crawl-delay:`` lines in the
    ``User-agent: *`` groups — the de-facto extension most large sites
    ship even though RFC 9309 left it out.  Conservative on every
    ambiguity: non-numeric or negative values are dropped, and when a
    domain states several delays the MAX wins (politeness errs slow).
    Same group-scoping machinery as :func:`parse_robots`, so a delay
    inside a non-star group is ignored exactly like its directives."""
    blocked, star_blocks = _star_blocks(df, domain_col, txt_col)
    delays = blocked.filter(F.col("key") == "crawl-delay").join(
        star_blocks, ["domain", "block_id"]
    )
    v = F.expr("try_cast(value AS DOUBLE)")
    return (
        delays.select("domain", v.alias("_d"))
        .filter(F.col("_d").isNotNull() & (F.col("_d") >= 0))
        .groupBy("domain")
        .agg(F.max("_d").alias("crawl_delay_s"))
    )


def _star_blocks(df: DataFrame, domain_col: str, txt_col: str):
    """Shared robots group scoping: the typed key/value lines annotated
    with UA header-run block ids, plus the block ids governed by
    ``User-agent: *``."""
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("idx", "raw"),
    ).select(
        "domain",
        "idx",
        # strip comments and CR, then whitespace
        F.trim(F.regexp_replace(F.regexp_replace("raw", "#.*$", ""), "\r", ""))
        .alias("line"),
    )
    key = F.lower(F.trim(F.substring_index("line", ":", 1)))
    # value = text after the FIRST colon (paths may contain colons)
    val = F.trim(F.expr("substring(line, instr(line, ':') + 1)"))
    typed = lines.filter(F.col("line").contains(":")).select(
        "domain",
        "idx",
        key.alias("key"),
        val.alias("value"),
    )
    is_ua = F.col("key") == "user-agent"
    w = Window.partitionBy("domain").orderBy("idx")
    cum = (
        Window.partitionBy("domain")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # a UA line opens a new header block unless the previous typed line
    # was also a UA line (consecutive UA lines share one group)
    new_block = F.when(
        is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False)), 1
    ).otherwise(0)
    blocked = typed.withColumn("block_id", F.sum(new_block).over(cum))
    star_blocks = (
        blocked.filter(is_ua & (F.col("value") == "*"))
        .select("domain", "block_id")
        .distinct()
    )
    return blocked, star_blocks


#: strips `scheme://host`, protocol-relative `//host`, or a bare host
#: (anything before the first '/') — extract_domain accepts all three
#: forms, so the path side must too or scheme-less URLs would join
#: their rules yet never match a '/'-prefix
_PATH_STRIP = "^([a-zA-Z][a-zA-Z0-9+.-]*://|//)?[^/]*"


def url_path(url_col: Column) -> Column:
    """Path component of a URL ('/' when absent)."""
    p = F.regexp_replace(F.trim(url_col), _PATH_STRIP, "")
    return F.when(p == "", "/").otherwise(p)


def url_path_sql(c: str) -> str:
    p = f"regexp_replace(trim({c}), '{_PATH_STRIP}', '')"
    return f"CASE WHEN {p} = '' THEN '/' ELSE {p} END"


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_cols: tuple[str, ...] = ("doc_id",),
    out_col: str = "robots_allowed",
) -> DataFrame:
    """Annotate each URL row with the robots verdict: longest matching
    prefix wins, Allow beats Disallow at equal length, no match ⇒
    allowed.  Plan: broadcast the (tiny) rules table, one equi-join on
    the domain + a per-URL ``max(struct)`` hash aggregate — map-side
    combining, no window, corpus scanned once."""
    u = urls.withColumn("_rb_dom", DM.extract_domain(F.col(url_col)))
    u = u.withColumn("_rb_path", url_path(F.col(url_col)))
    # normalize the RULES domain with the same extract_domain as the URL
    # side — a robots table keyed 'www.Ex.com' (the host it was fetched
    # from) must still govern 'ex.com' URLs
    norm_rules = rules.select(
        DM.extract_domain(F.col("domain")).alias("_rb_dom"),
        "allow",
        "prefix",
    )
    j = u.join(F.broadcast(norm_rules), "_rb_dom", "left")
    matched = F.col("prefix").isNotNull() & F.col("_rb_path").startswith(
        F.col("prefix")
    )
    verdict = F.max(
        F.when(
            matched,
            F.struct(
                F.length("prefix").alias("l"),
                F.col("allow").cast("int").alias("a"),
            ),
        )
    )
    # aggregate ONLY the verdict keyed by (id_cols, url), then join it
    # back — annotating must preserve every input column and every
    # duplicate row, which a groupBy over the full frame would destroy
    keys = [*id_cols, url_col]
    verdicts = (
        j.groupBy(*keys)
        .agg(verdict.alias("_rb_w"))
        .withColumn(out_col, F.coalesce(F.col("_rb_w.a") == 1, F.lit(True)))
        .drop("_rb_w")
    )
    return urls.join(verdicts, keys, "left")
