"""Composed crawl-frontier planning: discovery → dedup → policy → waves.

``plan_crawl`` chains the crawl-ops operators the same way
``prep_text_corpus`` chains the corpus ones, cheapest-reject-first:

  1. **Discover** — ``<loc>`` entries out of sitemap XML (q87's parse,
     promoted here), spec-permitted whitespace trimmed.
  2. **Canonical collapse** (q61) — tracking-param/www/fragment variants
     merge BEFORE any policy work; one distinct on the canonical form.
  3. **Robots gate** (q85) — parse each domain's robots.txt once
     (rules are domain-sized, broadcast), keep URLs whose longest
     matching rule allows fetching.
  4. **Seen filter** (q82's committed Bloom ledger) — URLs already
     fetched by ANY previous crawl drop out map-only against the packed
     words literal.  One-sided: a false positive SKIPS a URL, never
     fetches a dup — and because the probe is deterministic (h60) and
     the ledger append-only, an FP URL stays skipped on EVERY future
     refresh, a permanent blind spot.  Size m/k for the frontier's
     lifetime URL count (not one crawl's) with that cost in mind; the
     q82 oracle measures the real FP set at a given geometry.
  5. **Politeness waves** (q91) — deterministic per-domain fetch slots,
     at most ``per_domain_cap`` URLs per domain per wave.

Pass ``funnel=[]`` to collect per-stage (rows, dropped) audit entries
(same contract as prep_text_corpus; each boundary costs one count job).

Scale shape: stages 1–4 are map-only or broadcast-joined — the required
shuffles are the canonical distinct, the per-domain window of stage 5,
and (only when a ``priorities`` feed is supplied) one url-keyed join
against it, which is frontier-sized and NOT broadcastable.  Nothing
here reads page bodies; the whole plan runs on URL-sized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import domains as DM
from ..operators import frontier as FR
from ..operators import robots as RB
from ..operators import sketches as SK

#: q87's <loc> capture — backslash-free (Spark SQL-literal rule)
SITEMAP_LOC_PATTERN = "<loc>([^<]+)</loc>"


def discover_sitemap_urls(
    df: DataFrame, xml_col: str, out_col: str = "url"
) -> DataFrame:
    """One row per ``<loc>`` entry across the sitemap corpus, trimmed
    (the sitemap spec permits surrounding whitespace).  Projection
    before the explode; pure codegen."""
    locs = F.regexp_extract_all(
        F.col(xml_col), F.lit(SITEMAP_LOC_PATTERN), 1
    )
    return (
        df.select(F.explode(locs).alias(out_col))
        .select(F.trim(F.col(out_col)).alias(out_col))
        .filter(F.col(out_col) != "")
    )


def plan_crawl(
    spark: SparkSession,
    sitemaps: DataFrame,
    robots: DataFrame | None = None,
    seen_store: str | None = None,
    xml_col: str = "sitemap_xml",
    per_domain_cap: int = 8,
    default_delay_s: float = 1.0,
    trap_cap: int | None = None,
    trap_min_urls: int | None = None,
    priorities: DataFrame | None = None,
    funnel: list | None = None,
) -> DataFrame:
    """Sitemap corpus → politeness-scheduled fetch plan.

    ``sitemaps``: frame with ``xml_col`` holding sitemap XML documents.
    ``robots``: optional (domain, robots_txt) frame — omitted ⇒ every
    URL is allowed (RFC 9309's no-robots default).  ``seen_store``:
    optional q82 Bloom-ledger directory of previously fetched canonical
    URLs.  Returns (domain, url, rank_in_domain, fetch_slot) plus, when
    ``robots`` is given, pacing columns: ``crawl_delay_s`` (the domain's
    ``Crawl-delay`` from its star group, ``default_delay_s`` when
    unstated) and ``wave_start_s`` = slot · cap · delay — wave k of a
    domain cannot begin before its previous wave's cap sequential
    fetches, each ``delay`` apart, have had time to finish.
    ``trap_cap``: when set, q101-style crawler-trap templates are capped
    to that many URLs each before wave assignment; ``trap_min_urls``
    overrides the trap EVIDENCE threshold (default
    ``frontier.TRAP_MIN_URLS``) — without it a ``trap_cap`` above the
    default threshold would leave a dead zone of 50..cap-URL templates
    classified as traps but never actually capped.
    ``priorities``: optional (url, priority) frame — e.g. the q96
    recrawl ledger's tiers mapped to integers — left-joined on the
    CANONICAL url; higher priority lands in earlier waves, URLs without
    a row (first sighting) sort last, the conservative default.
    """

    def boundary(df: DataFrame, stage: str, prev_rows: int | None):
        if funnel is None:
            return df, None
        n = df.count()
        funnel.append(
            {
                "stage": stage,
                "rows": n,
                "dropped": None if prev_rows is None else prev_rows - n,
            }
        )
        return df, n

    urls = discover_sitemap_urls(sitemaps, xml_col)
    urls, n = boundary(urls, "discover", None)

    canon = urls.select(
        DM.canonicalize_url(F.col("url")).alias("url")
    ).filter(F.col("url").isNotNull()).distinct()
    canon, n = boundary(canon, "canonical_distinct", n)

    if robots is not None:
        rules = RB.parse_robots(robots)
        gated = (
            RB.apply_robots(canon, rules, url_col="url", id_cols=())
            .filter(F.col("robots_allowed"))
            .drop("robots_allowed")
        )
    else:
        gated = canon
    gated, n = boundary(gated, "robots_gate", n)

    if seen_store is not None:
        from . import lineage as LN

        words, k, m = LN.bloom_ledger_words(spark, seen_store)
        fresh = (
            SK.bloom_probe(gated, "url", words, k=k, m=m)
            .filter(~F.col("bloom_hit"))
            .drop("bloom_hit")
        )
    else:
        fresh = gated
    fresh, n = boundary(fresh, "seen_filter", n)

    if trap_cap is not None:
        # q101's trap ACTION: templates at/over the evidence threshold
        # are capped to trap_cap URLs each (deterministic keep set) —
        # calendars and session-id spaces stop eating the fetch budget
        fresh = FR.throttle_traps(
            fresh,
            "url",
            trap_min_urls=(
                FR.TRAP_MIN_URLS if trap_min_urls is None else trap_min_urls
            ),
            keep_per_template=trap_cap,
        )
    fresh, n = boundary(fresh, "trap_throttle", n)

    if priorities is not None:
        # re-aggregate per url (MAX wins) before joining — a duplicated
        # url key would fan URLs into multiple plan rows, the same
        # duplicate-fetch hazard the delays join guards against.  NOTE:
        # this join is a real shuffle when the feed is frontier-sized
        # (the module docstring's shuffle inventory includes it).
        dedup_prio = (
            priorities.select("url", "priority")
            .groupBy("url")
            .agg(F.max("priority").alias("priority"))
        )
        fresh = fresh.join(dedup_prio, "url", "left")
        plan = FR.assign_fetch_slots(
            fresh, "url", per_domain_cap, priority_col="priority"
        ).drop("priority")
    else:
        plan = FR.assign_fetch_slots(fresh, "url", per_domain_cap)
    if robots is not None:
        # robots is parsed again here (parse_crawl_delays shares
        # parse_robots' _star_blocks machinery); both relations are
        # domain-sized and lazy, so "parse once" would need a persist to
        # mean anything — not worth pinning executor memory for.
        # Re-aggregate AFTER extract_domain normalization: 'www.ex.com'
        # and 'ex.com' robots rows both govern 'ex.com', and a left join
        # on a duplicated key would fan every ex.com URL into two plan
        # rows (duplicate fetches — the exact thing the cap forbids);
        # MAX wins across the merged rows, same rule as within one file.
        delays = (
            RB.parse_crawl_delays(robots)
            .select(
                DM.extract_domain(F.col("domain")).alias("domain"),
                "crawl_delay_s",
            )
            .groupBy("domain")
            .agg(F.max("crawl_delay_s").alias("crawl_delay_s"))
        )
        plan = plan.join(F.broadcast(delays), "domain", "left").withColumns(
            {
                "crawl_delay_s": F.coalesce(
                    "crawl_delay_s", F.lit(float(default_delay_s))
                ),
                "wave_start_s": F.col("fetch_slot")
                * per_domain_cap
                * F.coalesce("crawl_delay_s", F.lit(float(default_delay_s))),
            }
        )
    plan, _ = boundary(plan, "fetch_waves", n)
    return plan
