"""Crawl-frontier politeness scheduling: per-domain fetch slots.

A polite crawler must never issue more than ``cap`` concurrent requests
to one domain, no matter how many of its URLs sit in the frontier.  The
standard construction assigns every URL a **fetch slot**: rank the
domain's URLs deterministically, then ``slot = (rank - 1) div cap`` —
slot k is the k-th politeness wave, each wave carrying at most ``cap``
URLs per domain.  Waves are dispatched in order; within a wave all
domains proceed in parallel, which is exactly the shuffle key a
distributed fetcher wants (partition by slot, then by domain).

Determinism: ranking orders by the portable 60-bit hash of the URL
(``functions/hashing.h60``) with the URL itself as tie-break, so the
same frontier produces the same waves on any cluster size, retry, or
engine — the q52 "deterministic, not per-partition RNG" rule applied to
scheduling.  Unparseable URLs (no domain) cannot be fetched and are
excluded; canonical-dedup (q61) is assumed to have run upstream.

Scale shape: ONE hash-partition-by-domain exchange feeds a per-domain
ordered window.  Window cost is bounded by the hot domain's URL count —
for a 10^9-URL domain use the q69 two-phase rank instead (bucket by
h60 prefix, rank within bucket, add broadcast bucket offsets); the
windowed form here is exact and right up to ~10^7 URLs/domain.
Ordered windows cannot be salted (q74's note) — the cap bounds fetch
concurrency, not window cost.  Reference ancestor: S7's sampling scan
(additional_charge_checks.py:741) as bounded-batch work dispatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60_spark_sql, h60_sql
from .domains import extract_domain, extract_domain_sql


def assign_fetch_slots(
    df: DataFrame,
    url_col: str,
    per_domain_cap: int,
    priority_col: str | None = None,
) -> DataFrame:
    """(domain, url, rank_in_domain, fetch_slot) for every parseable URL.

    ``rank_in_domain`` is 1-based within the domain under the
    deterministic (h60(url), url) order; ``fetch_slot`` is 0-based and
    holds at most ``per_domain_cap`` of the domain's URLs by
    construction.  ``priority_col`` (optional, numeric, higher = fetch
    sooner) prepends a DESC key to the order — e.g. a q96 recrawl-tier
    index, so fast-changing URLs land in the early waves — while the
    (h60, url) tail keeps the full order deterministic; NULL priority
    sorts last (nulls_last), the conservative default for unknowns.
    """
    return _slots_with_hash(
        df, url_col, per_domain_cap, priority_col=priority_col
    ).drop("_h")


def _slots_with_hash(
    df: DataFrame,
    url_col: str,
    per_domain_cap: int,
    priority_col: str | None = None,
) -> DataFrame:
    """assign_fetch_slots with the ordering hash kept as ``_h`` so
    downstream aggregates (fetch_plan's checksum) reuse it instead of
    recomputing md5+conv per URL."""
    if per_domain_cap < 1:
        raise ValueError(
            f"per_domain_cap must be >= 1, got {per_domain_cap}"
        )
    order = [F.col("_h").asc(), F.col(url_col).asc()]
    keep = [F.col(url_col)]
    if priority_col is not None:
        order.insert(0, F.col(priority_col).desc_nulls_last())
        keep.append(F.col(priority_col))
    w = Window.partitionBy("domain").orderBy(*order)
    return (
        df.select(
            extract_domain(F.col(url_col)).alias("domain"),
            *keep,
            F.expr(h60_spark_sql(url_col)).alias("_h"),
        )
        .filter(F.col("domain").isNotNull())
        .withColumn("rank_in_domain", F.row_number().over(w))
        .withColumn(
            "fetch_slot",
            F.floor((F.col("rank_in_domain") - 1) / per_domain_cap).cast(
                "long"
            ),
        )
    )


def fetch_plan(
    df: DataFrame, url_col: str, per_domain_cap: int
) -> DataFrame:
    """The dispatch report a crawler operator reviews: per wave, how many
    URLs and domains it carries and the largest per-domain load —
    ``max_per_domain <= cap`` on every row IS the politeness proof.  The
    per-wave URL-hash checksum value-pins exactly which URLs landed in
    which wave."""
    slots = _slots_with_hash(df, url_col, per_domain_cap)
    per_dom = slots.groupBy("fetch_slot", "domain").agg(
        F.count("*").alias("_n"),
        F.bit_xor("_h").alias("_ck"),
    )
    return per_dom.groupBy("fetch_slot").agg(
        F.sum("_n").cast("long").alias("n_urls"),
        F.count("*").cast("long").alias("n_domains"),
        F.max("_n").cast("long").alias("max_per_domain"),
        F.bit_xor("_ck").alias("url_checksum"),
    )


#: change-count → recrawl tier, for n snapshots the top tier is n−1
#: transitions (changed every time we looked).  Integer-exact: no rate
#: division ever happens, so the twins can never drift.
RECRAWL_TIERS = ("static", "slow", "medium", "fast")


def estimate_change_rates(
    snapshots: DataFrame,
    url_col: str = "url",
    order_col: str = "crawl_idx",
    fp_col: str = "content_fp",
) -> DataFrame:
    """Per-URL change statistics from consecutive crawl snapshots — the
    adaptive-recrawl signal (Cho & Garcia-Molina 2000: revisit pages at
    their observed change rate, not uniformly).  ``n_changes`` counts
    consecutive-snapshot fingerprint transitions; ``recrawl_tier`` maps
    the EXACT integer count onto :data:`RECRAWL_TIERS` by interval
    index (count · (tiers−1)) div (snapshots−1) — never a rounded rate,
    so the q76 integer-band rule holds.  One hash-by-URL exchange
    serves the lag window and the per-URL aggregate (the q74 shape);
    URLs seen once are 'static' by definition (no transition observed).
    """
    w = Window.partitionBy(url_col).orderBy(order_col)
    changed = (
        F.lag(fp_col).over(w).isNotNull()
        & (F.col(fp_col) != F.lag(fp_col).over(w))
    ).cast("int")
    per = (
        snapshots.withColumn("_chg", changed)
        .groupBy(url_col)
        .agg(
            F.count("*").cast("long").alias("n_snapshots"),
            F.sum("_chg").cast("long").alias("n_changes"),
        )
    )
    return per.withColumn("recrawl_tier", recrawl_tier_col())


def recrawl_tier_col():
    """The tier Column over (n_snapshots, n_changes) columns — shared by
    the batch estimator and the incremental ledger so the two can never
    disagree on a tier boundary.  tier_idx is never NULL (the
    when/otherwise is total) — element_at with a NULL index
    constant-folds to the LAST element (round-5 gotcha), so totality
    matters here."""
    t = len(RECRAWL_TIERS) - 1
    tier_idx = F.when(F.col("n_snapshots") <= 1, F.lit(0)).otherwise(
        F.expr(f"(n_changes * {t}) div (n_snapshots - 1)")
    )
    tiers = F.array(*[F.lit(x) for x in RECRAWL_TIERS])
    return F.element_at(tiers, tier_idx.cast("int") + 1)


def estimate_change_rates_duck_sql(
    snapshots_rel: str,
    url_col: str = "url",
    order_col: str = "crawl_idx",
    fp_col: str = "content_fp",
) -> str:
    """DuckDB twin of :func:`estimate_change_rates` (lag in its own CTE —
    DuckDB windows cannot nest inside aggregates)."""
    t = len(RECRAWL_TIERS) - 1
    tier_arms = " ".join(
        f"WHEN {i} THEN '{name}'" for i, name in enumerate(RECRAWL_TIERS)
    )
    return f"""
    SELECT {url_col}, n_snapshots, n_changes,
           CASE (CASE WHEN n_snapshots <= 1 THEN 0
                 ELSE (n_changes * {t}) // (n_snapshots - 1) END)
                {tier_arms} END AS recrawl_tier
    FROM (
      SELECT {url_col},
             CAST(COUNT(*) AS BIGINT) AS n_snapshots,
             CAST(SUM(chg) AS BIGINT) AS n_changes
      FROM (
        SELECT {url_col},
               CASE WHEN lag({fp_col}) OVER (
                      PARTITION BY {url_col} ORDER BY {order_col}
                    ) IS NOT NULL
                    AND {fp_col} <> lag({fp_col}) OVER (
                      PARTITION BY {url_col} ORDER BY {order_col}
                    )
                    THEN 1 ELSE 0 END AS chg
        FROM {snapshots_rel}
      )
      GROUP BY 1
    )
    """


def fetch_plan_duck_sql(
    urls_rel: str, url_col: str, per_domain_cap: int
) -> str:
    """DuckDB twin of :func:`fetch_plan` over a relation/CTE of URLs."""
    if per_domain_cap < 1:
        raise ValueError(
            f"per_domain_cap must be >= 1, got {per_domain_cap}"
        )
    return f"""
    SELECT fetch_slot,
           CAST(SUM(n) AS BIGINT) AS n_urls,
           CAST(COUNT(*) AS BIGINT) AS n_domains,
           CAST(MAX(n) AS BIGINT) AS max_per_domain,
           bit_xor(ck) AS url_checksum
    FROM (
      SELECT fetch_slot, domain, COUNT(*) AS n,
             bit_xor({h60_sql(url_col)}) AS ck
      FROM (
        SELECT domain, {url_col},
               CAST((ROW_NUMBER() OVER (
                 PARTITION BY domain
                 ORDER BY {h60_sql(url_col)}, {url_col}
               ) - 1) // {per_domain_cap} AS BIGINT) AS fetch_slot
        FROM (
          SELECT {extract_domain_sql(url_col)} AS domain, {url_col}
          FROM {urls_rel}
        )
        WHERE domain IS NOT NULL
      )
      GROUP BY 1, 2
    )
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# URL-template mining: crawler-trap detection.  Infinite URL spaces
# (calendars, session ids, faceted search) all collapse to a handful of
# path TEMPLATES once variable segments are normalized away; a template
# exploding into a disproportionate URL count is the classic spider-trap
# signal a frontier must throttle before it drowns the fetch budget.
# Rules are ordered (hex before digits — a hex run contains digit runs)
# and backslash-free (the SQL-literal rule).  DuckDB's regexp_replace
# needs the 'g' flag for global replacement; Spark's is global already.
# ---------------------------------------------------------------------------

#: a >=8-char [0-9a-f] run CONTAINING at least one letter — a pure-digit
#: run must fall through to the {d} rule or an 8+-digit page id would
#: split one logical template into /x/{d} and /x/{hex} halves, diluting
#: trap counts below the threshold (review finding).  Lookahead-free
#: (DuckDB is RE2): alternation over the first letter's position.
_HEX_RUN = "(?:" + "|".join(
    ["[0-9]{%d}[a-f][0-9a-f]{%d}[0-9a-f]*" % (k, 7 - k) for k in range(8)]
    + ["[0-9]{8,}[a-f][0-9a-f]*"]
) + ")"

#: ordered (pattern, placeholder) normalization rules — shared by twins
TEMPLATE_RULES = (
    (_HEX_RUN, "{hex}"),  # long hex ids (must contain a letter)
    ("[0-9]+", "{d}"),    # any digit run: dates, pages, offsets
)


def _template_expr(url_col: str):
    """The normalized path-template Column — the SINGLE source both
    detection (url_templates) and action (throttle_traps) render from,
    so the two can never drift."""
    from .robots import url_path

    tpl = F.lower(url_path(F.col(url_col)))
    for pat, rep in TEMPLATE_RULES:
        tpl = F.regexp_replace(tpl, pat, rep)
    return tpl

#: a template carrying at least this many URLs on one domain is a trap
TRAP_MIN_URLS = 50


def url_templates(
    df: DataFrame, url_col: str, trap_min_urls: int = TRAP_MIN_URLS
) -> DataFrame:
    """(domain, template, n_urls, is_trap) per distinct URL: the path is
    lowercased and variable segments are normalized by
    :data:`TEMPLATE_RULES`; ``is_trap`` flags templates whose URL count
    on one domain reaches ``trap_min_urls``.  One distinct + one hash
    aggregate, both map-side-combining; NULL-domain URLs are excluded
    as everywhere in the frontier stack."""
    return (
        df.select(
            extract_domain(F.col(url_col)).alias("domain"),
            F.col(url_col),
            _template_expr(url_col).alias("template"),
        )
        .filter(F.col("domain").isNotNull())
        .distinct()
        .groupBy("domain", "template")
        .agg(F.count("*").cast("long").alias("n_urls"))
        .withColumn("is_trap", F.col("n_urls") >= trap_min_urls)
    )


def url_templates_duck_sql(
    urls_rel: str, url_col: str, trap_min_urls: int = TRAP_MIN_URLS
) -> str:
    """DuckDB twin of :func:`url_templates` (regexp_replace needs the
    'g' flag there — single-replacement is the default, unlike Spark)."""
    from .robots import url_path_sql

    tpl = f"lower({url_path_sql(url_col)})"
    for pat, rep in TEMPLATE_RULES:
        tpl = f"regexp_replace({tpl}, '{pat}', '{rep}', 'g')"
    return f"""
    SELECT domain, template,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           (COUNT(*) >= {trap_min_urls}) AS is_trap
    FROM (
      SELECT DISTINCT {extract_domain_sql(url_col)} AS domain,
             {url_col}, {tpl} AS template
      FROM {urls_rel}
    )
    WHERE domain IS NOT NULL
    GROUP BY 1, 2
    """


def throttle_traps(
    df: DataFrame,
    url_col: str,
    trap_min_urls: int = TRAP_MIN_URLS,
    keep_per_template: int | None = None,
) -> DataFrame:
    """Trap ACTION for the frontier: URLs of a trap template (per
    :func:`url_templates` — detection is DERIVED from it, so the two can
    never drift) are capped to ``keep_per_template`` per
    (domain, template), deterministic keep set via the same (h60, url)
    order as the fetch waves.  Benign templates pass through untouched.
    Default keep = ``trap_min_urls`` (crawl AT the evidence threshold,
    never past it).  Output is DISTINCT parseable URLs — duplicates are
    collapsed before ranking (a duplicate must not consume a keep slot)
    and NULL-domain URLs are excluded, as everywhere in the frontier
    stack.  Plan: the input is scanned once for detection (url_templates
    aggregate) and once for the marked rank — the trap set rides back as
    a broadcast, and the rank window runs over every (domain, template)
    group in ONE pass (no semi/anti double-probe of the upstream
    lineage)."""
    keep = trap_min_urls if keep_per_template is None else keep_per_template
    if keep < 1:
        raise ValueError(f"keep_per_template must be >= 1, got {keep}")
    traps = (
        url_templates(df, url_col, trap_min_urls=trap_min_urls)
        .filter(F.col("is_trap"))
        .select(
            F.col("domain").alias("_dom"), F.col("template").alias("_tpl")
        )
        .withColumn("_trap", F.lit(True))
    )
    urls = (
        df.select(
            F.col(url_col),
            extract_domain(F.col(url_col)).alias("_dom"),
            _template_expr(url_col).alias("_tpl"),
        )
        .filter(F.col("_dom").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("_dom", "_tpl").orderBy("_h", url_col)
    return (
        urls.join(F.broadcast(traps), ["_dom", "_tpl"], "left")
        .withColumn("_h", F.expr(h60_spark_sql(url_col)))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_trap").isNull() | (F.col("_rk") <= keep))
        .select(url_col)
    )
