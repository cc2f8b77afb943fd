"""Deterministic corpus sampling / mixing — the stage that turns a
filtered, deduplicated pool into a training mixture.

Why not ``df.sample()``/``sampleBy()``: Spark's samplers are seeded
per-partition, so the selected SET changes with partitioning, retries,
and cluster size — poison for exactly-once pipelines and for audits
("why is this doc in the corpus?").  Everything here selects by a
**content-independent deterministic hash of the row key** (the portable
60-bit md5 of ``functions/hashing.py``, so the DuckDB oracle reproduces
the exact selection):

* :func:`deterministic_sample` — keep iff ``h60(seed || key) mod D <
  fraction·D``.  Map-only, no shuffle, no RNG state; rerunning anywhere
  yields the same set, and different seeds give independent samples.
* :func:`stratified_sample` — per-stratum fractions (the corpus-mixing
  weights: "3% code, 60% web, …") via one CASE expression folded into the
  same map-only filter.  Unknown strata default to fraction 0 LOUDLY
  (listed in the plan, not silently kept).
* :func:`sample_token_budget` — "take documents until the token budget is
  met", the common mixture-building primitive.  The selection order is
  the deterministic hash order, so the result is a PREFIX of a global
  pseudo-random permutation.  Scalable two-phase plan: (1) one hash
  aggregate of token sums per hash bucket (B rows to the driver — B is a
  dial, not data-sized); the driver prefix-sums bucket totals to find the
  cutoff bucket; (2) full buckets pass with a plain filter, and ONLY the
  single cutoff bucket pays a within-bucket cumulative-sum window (its
  rows ≈ corpus/B).  No global sort, no corpus-sized window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as HH

SAMPLE_DENOM = 1_000_000  # fraction resolution: 1e-6


def seeded_key_hash(key_col: str, seed: int):
    """h60 of ``seed || key`` — THE key-selection hash shared by every
    sampler and the shard writer (one derivation; a drift here would
    silently desynchronize samplers from sharders).  NULL keys hash as
    the empty string — deterministic and never NULL, matching DuckDB's
    NULL-ignoring ``concat`` (Spark's concat would null the hash and
    silently drop the row from every filter)."""
    return F.expr(
        HH.h60_spark_sql(
            f"concat('{seed}:', coalesce(CAST({key_col} AS STRING), ''))"
        )
    )


# back-compat internal alias
_h60_key = seeded_key_hash


def _h60_key_sql(key_col: str, seed: int) -> str:
    # DuckDB concat ignores NULL args natively == the coalesce above
    return HH.h60_sql(f"concat('{seed}:', CAST({key_col} AS VARCHAR))")


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, seed: int = 0
) -> DataFrame:
    """Keep each row iff its key hashes under ``fraction`` — deterministic
    across runs, partitionings, and engines."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(round(fraction * SAMPLE_DENOM))
    return df.filter(
        F.pmod(_h60_key(key_col, seed), F.lit(SAMPLE_DENOM)) < F.lit(thr)
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — corpus-mixing weights.

    Strata absent from ``fractions`` get fraction 0 (dropped); that
    default is visible in the plan's CASE expression, not silent."""
    if not fractions:
        raise ValueError(
            "stratified_sample: empty fractions map (would drop every "
            "row); pass at least one stratum weight"
        )
    for s_name, frac in fractions.items():
        if not (0.0 <= frac <= 1.0):
            raise ValueError(
                f"fraction for stratum {s_name!r} must be in [0, 1], got {frac}"
            )
        if "'" in s_name or "\\" in s_name:
            # stratum names are folded into a CASE literal; quotes would
            # corrupt the expression (clear error beats a parse failure)
            raise ValueError(f"stratum name {s_name!r} contains a quote")
    arms = " ".join(
        f"WHEN {strata_col} = '{s_name}' THEN {int(round(frac * SAMPLE_DENOM))}"
        for s_name, frac in sorted(fractions.items())
    )
    thr = F.expr(f"CASE {arms} ELSE 0 END")
    return df.filter(
        F.pmod(_h60_key(key_col, seed), F.lit(SAMPLE_DENOM)) < thr
    )


def sample_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str,
    key_col: str,
    seed: int = 0,
    num_buckets: int = 1024,
) -> DataFrame:
    """Smallest deterministic-hash-order PREFIX of rows whose token sum
    reaches ``budget`` (i.e. every selected row except possibly the last
    fits; the first row crossing the budget is the last one included, so
    the sum is ≥ budget unless the corpus is smaller).

    Global order = (bucket, h60, key) — a pseudo-random permutation, so
    the prefix is an unbiased sample.  See module docstring for the
    two-phase scalable shape.

    NULL-cost semantics (pinned; mirrored by the q53 oracle's COALESCE):
    a row whose ``token_col`` is NULL counts as cost **0 and stays
    eligible** — it consumes no budget, so it is kept whenever its hash
    position falls inside the selected prefix.  Filter such rows upstream
    if "unknown cost" should mean "excluded"."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    h = F.pmod(seeded_key_hash(key_col, seed), F.lit(SAMPLE_DENOM))
    bucketed = df.withColumn("_tb_h", h).withColumn(
        "_tb_bkt", F.pmod(F.col("_tb_h"), F.lit(num_buckets))
    )
    totals = {
        r["_tb_bkt"]: r["_tok"]
        for r in bucketed.groupBy("_tb_bkt")
        .agg(F.sum(F.coalesce(F.col(token_col), F.lit(0))).alias("_tok"))
        .collect()
    }
    acc = 0
    cutoff = None
    for b in range(num_buckets):
        t = totals.get(b, 0)
        if acc + t < budget:
            acc += t
        else:
            cutoff = b
            break
    if cutoff is None:  # whole corpus fits inside the budget
        return df
    from pyspark.sql import Window

    remaining = budget - acc
    # full buckets are exactly the prefix below the cutoff
    full_part = (
        bucketed.filter(F.col("_tb_bkt") < cutoff) if cutoff > 0 else None
    )
    # ROWS frame, not the default RANGE: duplicate keys tie on
    # (_tb_h, key) and a RANGE frame would give every tied row the
    # COMBINED running sum, under-filling the budget and diverging from
    # the oracle's pinned ROWS UNBOUNDED PRECEDING rule.
    w = (
        Window.partitionBy("_tb_bkt")
        .orderBy("_tb_h", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cut_part = (
        bucketed.filter(F.col("_tb_bkt") == cutoff)
        .withColumn(
            "_tb_cum",
            F.sum(F.coalesce(F.col(token_col), F.lit(0))).over(w),
        )
        # prefix until the budget is crossed, INCLUDING the crossing row
        .filter(
            F.col("_tb_cum") - F.coalesce(F.col(token_col), F.lit(0))
            < F.lit(remaining)
        )
        .drop("_tb_cum")
    )
    out = (
        full_part.unionByName(cut_part) if full_part is not None else cut_part
    )
    return out.drop("_tb_h", "_tb_bkt")


def stratified_sample_duck_sql(
    fractions: dict[str, float], strata_col: str, key_col: str, seed: int = 0
) -> str:
    """DuckDB WHERE-clause twin of :func:`stratified_sample`."""
    arms = " ".join(
        f"WHEN {strata_col} = '{s_name}' THEN {int(round(frac * SAMPLE_DENOM))}"
        for s_name, frac in sorted(fractions.items())
    )
    return (
        f"({_h60_key_sql(key_col, seed)}) % {SAMPLE_DENOM} < "
        f"(CASE {arms} ELSE 0 END)"
    )
