"""robots.txt parsing + URL permission matching — the politeness/legal
layer of a crawl pipeline (RFC 9309): which of a domain's URLs may be
fetched/kept, decided from the domain's own robots.txt.

Scope (pinned, documented): the ``User-agent: *`` groups — the sections
that govern a generic bulk crawler.  Per-bot overrides ride the same
rules table with one more column; out of scope here.  Wildcard rules
are handled CONSERVATIVELY in both directions: a ``Disallow`` containing
``*`` is truncated at the wildcard (blocks a superset — never fetches
something the rule meant to block), an ``Allow`` containing ``*`` is
dropped (allows a subset).  Production needs the RFC's full
wildcard/``$`` matcher; the conservative literal form is the defensible
bulk-crawl default.

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
    dirs = blocked.filter(F.col("key").isin("allow", "disallow")).join(
        star_blocks, ["domain", "block_id"]
    )
    allow = F.col("key") == "allow"
    # conservative wildcard handling (module docstring)
    prefix = F.when(
        allow,
        F.when(~F.col("value").contains("*"), F.col("value")),
    ).otherwise(F.substring_index("value", "*", 1))
    return (
        dirs.select("domain", allow.alias("allow"), prefix.alias("prefix"))
        .filter(F.col("prefix").isNotNull() & (F.col("prefix") != ""))
    )


def url_path(url_col: Column) -> Column:
    """Path component of a URL ('/' when absent)."""
    p = F.regexp_replace(url_col, "^[a-zA-Z]+://[^/]*", "")
    return F.when(p == "", "/").otherwise(p)


def url_path_sql(c: str) -> str:
    return (
        f"CASE WHEN regexp_replace({c}, '^[a-zA-Z]+://[^/]*', '') = '' "
        f"THEN '/' ELSE regexp_replace({c}, '^[a-zA-Z]+://[^/]*', '') END"
    )


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
    j = u.join(
        F.broadcast(rules.withColumnRenamed("domain", "_rb_dom")),
        "_rb_dom",
        "left",
    )
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
    keys = [*id_cols, url_col, "_rb_dom", "_rb_path"]
    out = (
        j.groupBy(*keys)
        .agg(verdict.alias("_rb_w"))
        .withColumn(
            out_col,
            F.coalesce(F.col("_rb_w.a") == 1, F.lit(True)),
        )
        .drop("_rb_w", "_rb_dom", "_rb_path")
    )
    return out
