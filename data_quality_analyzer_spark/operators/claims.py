"""Reference-parity analytics over the nested claims table.

Every public function here is the Spark recast of one analysis module of
``yamini1234567/data_quality_analyzer`` (file:line citations inline), with
the reference's ~60 sequential MongoDB pipelines fused into a handful of
one-pass conditional aggregations (SURVEY §4.2):

* blank = missing ∨ null ∨ '' everywhere (quirk 1 — the duplicate-``$ne``
  bug's *intent*, ``diagnosis_analysis.py:41-46``);
* half-open histogram buckets (quirk 2, fixtures are integer-safe);
* per-rule denominators reproduced exactly (quirk 3);
* duplicate counting counts rows, not groups (quirk 5,
  ``claim_analysis.py:225-247``);
* percentages via ``bround`` = HALF_EVEN like Python round / Mongo $round
  (quirk 6, ``shared/utils.py:29-33``).

Array rules use higher-order functions (``exists`` / ``filter`` / ``size``)
on the un-exploded table — the reference's unwind→match→group-by-_id→count
(A13) collapses to one predicate, no shuffle (SURVEY §2.4 A13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _blank(c: Column) -> Column:
    return c.isNull() | (c == "")


def _pct(part: Column, total: Column) -> Column:
    """percentage() of shared/utils.py:29-33 — 0 when total==0, HALF_EVEN."""
    return F.bround(
        F.when(total > 0, part.cast("double") / total.cast("double") * 100)
        .otherwise(F.lit(0.0)),
        2,
    )


# ---------------------------------------------------------------------------
# claim_analysis.py — claim-level checks, fused into TWO jobs
# ---------------------------------------------------------------------------

def claims_analysis(claims: DataFrame) -> DataFrame:
    """One-pass claim metrics (claim_analysis.py:9-292).

    The reference issues ~15 separate queries incl. count-by-collect
    anti-patterns (``find().to_list(None)`` + Python sums,
    claim_analysis.py:89-172); here: one scan, conditional aggregates.
    """
    paid_gt_amount = F.col("claim_amount_paid") > F.col("claim_amount")  # :179-181
    over_total = (
        F.coalesce(F.col("claim_amount_paid"), F.lit(0.0))
        + F.coalesce(F.col("claim_adj_amount"), F.lit(0.0))
        > F.col("claim_amount")
    )  # :252-264
    denied = F.col("claim_status") == "Denied"
    denied_paid = denied & (F.col("claim_amount_paid") > 0)  # :89-92
    pending = F.col("claim_status").isin("Open", "Sent to Payor")
    no_remit = F.col("charge_remittances").isNull() | (
        F.size("charge_remittances") == 0
    )
    agg = claims.agg(
        F.count("*").alias("total_claims"),
        F.sum(F.when(F.col("claim_status") == "Open", 1).otherwise(0))
        .cast("long")
        .alias("open_claims"),  # :14-17
        F.sum(F.when(pending, 1).otherwise(0))
        .cast("long")
        .alias("in_flight_claims"),  # :30-35 ($in)
        F.sum(F.when(pending, F.col("claim_amount")).otherwise(0.0)).alias(
            "pending_amount"
        ),  # :25-45 (pending-only $match before the $sum)
        F.avg("claim_amount").alias("avg_amount"),
        F.sum(F.when(denied_paid, 1).otherwise(0))
        .cast("long")
        .alias("denied_with_payment"),  # :89-95 (Denied AND paid > 0)
        F.sum(
            F.when(denied_paid, F.col("claim_amount_paid")).otherwise(0.0)
        ).alias("denied_paid_total"),  # :100-104 (Python sum → aggregate)
        F.sum(F.when(paid_gt_amount, 1).otherwise(0))
        .cast("long")
        .alias("overpaid_claims"),
        F.sum(
            F.when(paid_gt_amount, F.col("claim_amount_paid") - F.col("claim_amount"))
            .otherwise(0.0)
        ).alias("overpaid_excess"),  # :168-172
        F.sum(F.when(over_total, 1).otherwise(0))
        .cast("long")
        .alias("incorrect_payment_claims"),
        F.sum(F.when(denied & no_remit, 1).otherwise(0))
        .cast("long")
        .alias("claims_without_remittances"),  # :113-120 (Denied-only $or)
    )
    return agg.withColumns(
        {
            "open_pct": _pct(F.col("open_claims"), F.col("total_claims")),
            "denied_with_payment_pct": _pct(
                F.col("denied_with_payment"), F.col("total_claims")
            ),  # :95
            "avg_amount": F.bround("avg_amount", 2),  # round() quirk 6
        }
    )


def duplicate_claims(claims: DataFrame) -> DataFrame:
    """Duplicate metric with quirk-5 semantics: Σ(count) over claim_id
    groups with count>1 — total documents involved, NOT number of groups
    (claim_analysis.py:225-247)."""
    groups = (
        claims.groupBy("claim_id")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )
    return groups.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("duplicate_claims"),
        F.count("*").alias("duplicate_groups"),
    )


# ---------------------------------------------------------------------------
# payer_analysis.py — per-payer grouped conditional aggregation
# ---------------------------------------------------------------------------

def payer_analysis(claims: DataFrame) -> DataFrame:
    """payer_analysis.py:17-79: per-payer $group with $cond counts/sums and
    the avg_denied_amount safe-divide ($cond on denied>0, :64-74)."""
    denied = F.col("claim_status") == "Denied"
    n_denied = F.sum(F.when(denied, 1).otherwise(0)).cast("long")
    denied_amt = F.sum(F.when(denied, F.col("claim_amount")).otherwise(0.0))
    return (
        claims.groupBy("payer_mco")
        .agg(
            F.count("*").alias("total_claims"),
            n_denied.alias("denied_claims"),
            F.bround(denied_amt, 2).alias("total_denied_amount"),
            F.bround(F.avg("claim_amount"), 2).alias("avg_claim_amount"),
            F.bround(
                F.when(n_denied > 0, denied_amt / n_denied).otherwise(F.lit(0.0)), 2
            ).alias("avg_denied_amount"),
        )
        .orderBy(F.desc("total_claims"), F.asc_nulls_first("payer_mco"))  # :75 (T1)
    )


def payer_top_bottom(payers: DataFrame, k: int = 10) -> tuple[DataFrame, DataFrame]:
    """T3 head/tail slices (payer_analysis.py:115,124) — distributed
    TakeOrdered, never a driver-side list slice."""
    top = payers.orderBy(F.desc("total_claims"), F.asc_nulls_first("payer_mco")).limit(k)
    bottom = payers.orderBy(F.asc("total_claims"), F.asc_nulls_first("payer_mco")).limit(k)
    return top, bottom


# ---------------------------------------------------------------------------
# chargespattern_analysis.py — charge-level stats, histogram, issue rules
# ---------------------------------------------------------------------------

CHARGE_BUCKETS = ((0, 500), (500, 1000), (1000, 2000), (2000, 5000), (5000, 10000))


def charge_stats(claims: DataFrame) -> DataFrame:
    """A9 stats block over exploded charges (chargespattern_analysis.py:25-58)."""
    ch = claims.select(F.explode("charges").alias("c"))  # $unwind (P15)
    return ch.agg(
        F.count("*").alias("total_charges"),
        F.bround(F.sum("c.amount"), 2).alias("total_amount"),
        F.bround(F.avg("c.amount"), 2).alias("avg_amount"),
        F.min("c.amount").alias("min_amount"),
        F.max("c.amount").alias("max_amount"),
        F.bround(F.stddev_pop("c.amount"), 4).alias("std_amount"),
    )


def charge_histogram(claims: DataFrame) -> DataFrame:
    """ONE-pass half-open histogram replacing the reference's six separate
    scans with gapped integer bounds (chargespattern_analysis.py:60-97;
    quirk 2 documented divergence — fixtures are integer-safe so both
    agree)."""
    ch = claims.select(F.explode("charges").alias("c")).select(
        F.col("c.amount").alias("amount")
    )
    label = F.when(F.col("amount") < 0, F.lit("negative"))
    for lo, hi in CHARGE_BUCKETS:
        label = label.when(
            (F.col("amount") >= lo) & (F.col("amount") < hi), F.lit(f"[{lo},{hi})")
        )
    label = label.otherwise(F.lit(f"[{CHARGE_BUCKETS[-1][1]},inf)"))
    return ch.groupBy(label.alias("bucket")).agg(F.count("*").alias("n"))


def charge_issues(claims: DataFrame) -> DataFrame:
    """Distinct-claims-with-issue counts (A13): the reference unwinds, match-
    es, re-groups by _id and counts (chargespattern_analysis.py:164-271,
    8 rules); each collapses to ONE array-`exists` predicate on the
    un-exploded table — no explode, no shuffle.

    Quirk 3: issue percentages use the reference's denominator — claim-level
    counts divided by TOTAL CHARGES (chargespattern_analysis.py:16-17 vs
    :170-171)."""
    c = F.col("charges")
    rules = {
        "claims_with_blank_cpt": F.exists(
            c, lambda x: _blank(x["cpt_hcpcs"])
        ),  # :guard; charge_analysis_checks.py:410-422 ($elemMatch, P8)
        "claims_with_nonpositive_amount": F.exists(c, lambda x: x["amount"] <= 0),
        "claims_with_overpaid_charge": F.exists(
            c, lambda x: x["amount_paid"] > x["amount"]
        ),  # :166-172 (P6)
        "claims_with_excessive_adjustment": F.exists(
            c,
            lambda x: F.coalesce(x["adjustment_amount"], F.lit(0.0))
            > 0.5 * x["amount"],
        ),  # :175-192 (P7)
        "claims_with_unit_outlier": F.exists(c, lambda x: x["unit"] > 100),  # :226-236
        "claims_with_charge_missing_remit": F.exists(
            c,
            lambda x: x["charge_remittances"].isNull()
            | (F.size(x["charge_remittances"]) == 0),
        ),  # :213-218 (P5)
    }
    aggs = [F.count("*").alias("total_claims")]
    aggs.append(
        F.sum(F.coalesce(F.size("charges"), F.lit(0))).cast("long").alias("total_charges")
    )
    for name, pred in rules.items():
        aggs.append(
            F.sum(F.when(F.coalesce(pred, F.lit(False)), 1).otherwise(0))
            .cast("long")
            .alias(name)
        )
    wide = claims.agg(*aggs)
    pct_cols = {
        f"{name}_pct": _pct(F.col(name), F.col("total_charges")) for name in rules
    }
    return wide.withColumns(pct_cols)


# ---------------------------------------------------------------------------
# diagnosis_analysis.py — blank-field %s, primary-dx rules, duplicates
# ---------------------------------------------------------------------------

DX_FIELDS = ("code", "type", "status", "order", "occurrence_date", "present_on_admission")


def diagnosis_analysis(claims: DataFrame) -> DataFrame:
    """diagnosis_analysis.py:9-213 — ten unwound pipelines fused to one pass.

    * per-field "any diagnosis with blank <field>" (P4 tri-state blank,
      :41-46 and siblings :78-190), denominator = total claims (quirk 3);
    * no-primary-diagnosis via negated existential ($nor, :31-36, P9);
    * multiple-primary and duplicate-order re-aggregations (:68-76,143-160,
      A12) via size(filter(...)).
    """
    d = F.col("diagnoses")
    has_dx = d.isNotNull() & (F.size(d) > 0)
    # $nor semantics (:31-36): claims with NO primary diagnosis, INCLUDING
    # claims that have no diagnoses at all (no has_dx guard).
    no_primary = ~F.coalesce(
        F.exists(d, lambda x: x["is_primary_diagnosis"]), F.lit(False)
    )
    multi_primary = (
        F.size(
            F.filter(d, lambda x: F.coalesce(x["is_primary_diagnosis"], F.lit(False)))
        )
        > 1
    )
    orders = F.transform(d, lambda x: x["order"])
    dup_order = has_dx & (
        F.size(F.array_distinct(orders)) < F.size(orders)
    )
    aggs = [
        F.count("*").alias("total_claims"),
        F.sum(F.when(~has_dx, 1).otherwise(0)).cast("long").alias("claims_without_dx"),
        F.sum(F.when(no_primary, 1).otherwise(0)).cast("long").alias("claims_no_primary_dx"),
        F.sum(F.when(F.coalesce(multi_primary, F.lit(False)), 1).otherwise(0))
        .cast("long")
        .alias("claims_multi_primary_dx"),
        F.sum(F.when(dup_order, 1).otherwise(0)).cast("long").alias("claims_dup_dx_order"),
        F.sum(F.coalesce(F.size(d), F.lit(0))).cast("long").alias("total_diagnoses"),
        F.bround(
            F.avg(F.when(has_dx, F.size(d))), 2
        ).alias("avg_dx_per_claim"),  # additional_charge_checks.py:347-366 (A17)
    ]
    def _blank_field(f: str):
        # unary-lambda factory: a defaulted second parameter would make
        # Spark pass the element index into it (see verify SKILL gotchas)
        return lambda x: _blank(x[f])

    for field in DX_FIELDS:
        pred = F.coalesce(F.exists(d, _blank_field(field)), F.lit(False))
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"claims_blank_{field}")
        )
    wide = claims.agg(*aggs)
    pcts = {
        f"claims_blank_{f}_pct": _pct(
            F.col(f"claims_blank_{f}"), F.col("total_claims")
        )
        for f in DX_FIELDS
    }
    return wide.withColumns(pcts)


def distinct_dx_codes(claims: DataFrame) -> DataFrame:
    """A5 distinct-count via unwind→group→count (diagnosis_analysis.py:197-213)
    — non-blank codes only (quirk-1 intent)."""
    return claims.select(F.explode("diagnoses").alias("d")).filter(
        ~_blank(F.col("d.code"))
    ).agg(F.countDistinct("d.code").alias("distinct_dx_codes"))


# ---------------------------------------------------------------------------
# claimadjustments_analysis.py
# ---------------------------------------------------------------------------

def adjustments_analysis(claims: DataFrame) -> DataFrame:
    """claimadjustments_analysis.py:10-126 fused: adjustment-vs-amount
    θ-predicates (P6/P7) + empty-array checks (P5)."""
    adj_gt = F.col("claim_adj_amount") > F.col("claim_amount")  # :21-23
    adj_half = F.col("claim_adj_amount") > 0.5 * F.col("claim_amount")  # :32-45
    no_adj_array = F.col("claim_adjustments").isNull() | (
        F.size("claim_adjustments") == 0
    )  # :59-62
    over = (
        F.coalesce(F.col("claim_amount_paid"), F.lit(0.0))
        + F.coalesce(F.col("claim_adj_amount"), F.lit(0.0))
        > F.col("claim_amount")
    )  # :90-99
    return claims.agg(
        F.count("*").alias("total_claims"),
        F.sum(F.when(adj_gt, 1).otherwise(0)).cast("long").alias("adj_exceeds_amount"),
        F.sum(F.when(adj_half, 1).otherwise(0)).cast("long").alias("adj_exceeds_half"),
        F.sum(F.when(no_adj_array, 1).otherwise(0)).cast("long").alias("claims_without_adjustments"),
        F.sum(F.when(over, 1).otherwise(0)).cast("long").alias("paid_plus_adj_exceeds"),
    )


# ---------------------------------------------------------------------------
# generate_stats_collection.py / generate_diagnosis_stats.py — EP3 ETL
# ---------------------------------------------------------------------------

def generate_stats(claims: DataFrame) -> DataFrame:
    """EP3 materialized stats (generate_stats_collection.py:120-197):
    $unwind charges → $match valid cpt+payer (quirk-1 *intent*: NOT NULL AND
    <> '') → $group (payer,cpt) → mean/min/max/stddev_pop per measure.

    The reference $push-collects arrays then post-processes (:154-187);
    Spark's hash aggregate computes partial aggregates map-side directly
    (SURVEY §4.2 item 4). Spill (allowDiskUse, :208) is native.
    """
    ch = (
        claims.select(F.col("payer_mco"), F.explode("charges").alias("c"))
        .filter(~_blank(F.col("payer_mco")) & ~_blank(F.col("c.cpt_hcpcs")))
        .select(
            "payer_mco",
            F.col("c.cpt_hcpcs").alias("cpt_code"),
            F.col("c.amount").alias("billed"),
            F.col("c.amount_paid").alias("paid"),
            F.col("c.adjustment_amount").alias("adjusted"),
        )
    )
    return (
        ch.groupBy("payer_mco", "cpt_code")
        .agg(
            F.count("*").alias("record_count"),
            F.bround(F.avg("billed"), 2).alias("billed_avg"),
            F.min("billed").alias("billed_min"),
            F.max("billed").alias("billed_max"),
            F.bround(F.stddev_pop("billed"), 4).alias("billed_std"),
            F.bround(F.avg("paid"), 2).alias("paid_avg"),
            F.min("paid").alias("paid_min"),
            F.max("paid").alias("paid_max"),
            F.bround(F.stddev_pop("paid"), 4).alias("paid_std"),
            F.bround(F.avg("adjusted"), 2).alias("adj_avg"),
            F.min("adjusted").alias("adj_min"),
            F.max("adjusted").alias("adj_max"),
        )
        .orderBy("payer_mco", "cpt_code")  # :190-197
    )


def assert_stats_unique(stats: DataFrame) -> int:
    """The unique (payer, cpt_code) index (:257) becomes a post-write
    uniqueness assertion: returns the number of violating key groups (0 ⇒
    unique)."""
    return (
        stats.groupBy("payer_mco", "cpt_code")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )


def stats_quality_bands(stats: DataFrame) -> DataFrame:
    """Quality-band summary (generate_stats_collection.py:278-306;
    charge_analysis_checks.py:758-806): ≥10 high / 3-9 medium / <3 low, one
    pass (A15)."""
    rc = F.col("record_count")
    return stats.agg(
        F.count("*").alias("total_combinations"),
        F.sum(F.when(rc >= 10, 1).otherwise(0)).cast("long").alias("high_quality"),
        F.sum(F.when((rc >= 3) & (rc < 10), 1).otherwise(0)).cast("long").alias("medium_quality"),
        F.sum(F.when(rc < 3, 1).otherwise(0)).cast("long").alias("low_quality"),
    )


def stats_quality_bands_by_payer(
    stats: DataFrame, min_record_count: int = 3
) -> DataFrame:
    """Per-payer record_count distribution (charge_analysis_checks.py:
    758-806: the per-payer $match→$group pipeline of Check 3): quality bands
    grouped by payer plus the CPT count that clears the quality floor —
    one shuffle on the payer key."""
    rc = F.col("record_count")
    return (
        stats.groupBy("payer_mco")
        .agg(
            F.count("*").alias("total_combinations"),
            F.sum(F.when(rc >= 10, 1).otherwise(0)).cast("long").alias("high_quality"),
            F.sum(F.when((rc >= 3) & (rc < 10), 1).otherwise(0))
            .cast("long")
            .alias("medium_quality"),
            F.sum(F.when(rc < 3, 1).otherwise(0)).cast("long").alias("low_quality"),
            F.sum(F.when(rc >= min_record_count, 1).otherwise(0))
            .cast("long")
            .alias("cpts_with_sufficient_stats"),
        )
        .orderBy(F.desc("cpts_with_sufficient_stats"), F.asc_nulls_last("payer_mco"))
    )


def generate_dx_stats(claims: DataFrame) -> DataFrame:
    """generate_diagnosis_stats.py:75-118: the DOUBLE $unwind (diagnoses ×
    charges intra-row cross product, :80-81) with the 5-part composite key
    (:86-94)."""
    exploded = (
        claims.select(
            "payer_mco", F.explode("diagnoses").alias("d"), F.col("charges")
        )
        .select("payer_mco", "d", F.explode("charges").alias("c"))
        .filter(
            ~_blank(F.col("payer_mco"))
            & ~_blank(F.col("d.code"))
            & ~_blank(F.col("c.cpt_hcpcs"))
        )
    )
    return (
        exploded.groupBy(
            "payer_mco",
            F.col("d.code").alias("diagnosis_code"),
            F.col("c.cpt_hcpcs").alias("cpt_code"),
            F.col("c.modifier").alias("modifier"),
            F.col("c.rev_code").alias("rev_code"),
        )
        .agg(
            F.count("*").alias("record_count"),
            F.bround(F.avg("c.amount"), 2).alias("billed_avg"),
            F.min("c.amount").alias("billed_min"),
            F.max("c.amount").alias("billed_max"),
            F.bround(F.avg("c.amount_paid"), 2).alias("paid_avg"),
            F.bround(F.avg("c.adjustment_amount"), 2).alias("adj_avg"),
        )
    )


# ---------------------------------------------------------------------------
# charge_analysis_checks.py — readiness: coverage + freshness
# ---------------------------------------------------------------------------

def cpt_coverage(claims: DataFrame, stats: DataFrame) -> DataFrame:
    """J1 set-coverage semi join (charge_analysis_checks.py:666-699):
    distinct claim CPTs ∩ stats CPTs / distinct claim CPTs."""
    claim_cpts = (
        claims.select(F.explode("charges").alias("c"))
        .select(F.col("c.cpt_hcpcs").alias("cpt_code"))
        .filter(~_blank(F.col("cpt_code")))
        .distinct()
    )
    stat_cpts = stats.select("cpt_code").distinct().withColumn("m", F.lit(1))
    joined = claim_cpts.join(F.broadcast(stat_cpts), "cpt_code", "left")
    covered = F.sum(F.when(F.col("m").isNotNull(), 1).otherwise(0)).cast("long")
    return joined.agg(
        covered.alias("covered"),
        F.count("*").alias("total"),
        F.bround(covered.cast("double") / F.count("*") * 100, 2).alias("coverage_pct"),
    )
