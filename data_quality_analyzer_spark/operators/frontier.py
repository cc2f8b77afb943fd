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
    df: DataFrame, url_col: str, per_domain_cap: int
) -> DataFrame:
    """(domain, url, rank_in_domain, fetch_slot) for every parseable URL.

    ``rank_in_domain`` is 1-based within the domain under the
    deterministic (h60(url), url) order; ``fetch_slot`` is 0-based and
    holds at most ``per_domain_cap`` of the domain's URLs by
    construction.
    """
    return _slots_with_hash(df, url_col, per_domain_cap).drop("_h")


def _slots_with_hash(
    df: DataFrame, url_col: str, per_domain_cap: int
) -> DataFrame:
    """assign_fetch_slots with the ordering hash kept as ``_h`` so
    downstream aggregates (fetch_plan's checksum) reuse it instead of
    recomputing md5+conv per URL."""
    if per_domain_cap < 1:
        raise ValueError(
            f"per_domain_cap must be >= 1, got {per_domain_cap}"
        )
    w = Window.partitionBy("domain").orderBy("_h", url_col)
    return (
        df.select(
            extract_domain(F.col(url_col)).alias("domain"),
            F.col(url_col),
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
