"""Reference-parity layer over nested claims, cross-checked against DuckDB
(UNNEST oracle) on the deterministic claims fixture.  Exact-integer columns
compare bit-for-bit; banker's-rounding semantics (quirk 6) get a dedicated
test against Python's round()."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import claims as CL
from data_quality_analyzer_spark.sources.claims_fixture import write_claims

FIX = os.path.join(os.path.dirname(__file__), "..", ".fixtures", "claims")


@pytest.fixture(scope="module")
def claims(spark):
    path = write_claims(FIX, 1500, seed=42)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW claims AS SELECT * FROM read_parquet('{os.path.join(FIX, 'claims.parquet')}')"
    )
    return con


BLANK = "({c} IS NULL OR {c} = '')"


def test_claims_analysis(claims, duck):
    """Reference semantics (claim_analysis.py): denied_with_payment is
    Denied AND paid>0 (:89-95), pending_amount sums pending claims only
    (:25-45), claims_without_remittances is Denied-only (:113-120)."""
    got = CL.claims_analysis(claims).collect()[0]
    want = duck.sql(
        """
        SELECT COUNT(*) AS total_claims,
          SUM(CASE WHEN claim_status = 'Open' THEN 1 ELSE 0 END) AS open_claims,
          SUM(CASE WHEN claim_status IN ('Open','Sent to Payor') THEN 1 ELSE 0 END) AS in_flight,
          SUM(CASE WHEN claim_status = 'Denied' AND claim_amount_paid > 0 THEN 1 ELSE 0 END) AS denied_with_payment,
          SUM(CASE WHEN claim_amount_paid > claim_amount THEN 1 ELSE 0 END) AS overpaid,
          SUM(CASE WHEN coalesce(claim_amount_paid,0)+coalesce(claim_adj_amount,0) > claim_amount
              THEN 1 ELSE 0 END) AS incorrect,
          SUM(CASE WHEN claim_status = 'Denied'
              AND (charge_remittances IS NULL OR len(charge_remittances)=0)
              THEN 1 ELSE 0 END) AS no_remit,
          SUM(CASE WHEN claim_status IN ('Open','Sent to Payor') THEN claim_amount ELSE 0 END) AS pending_amount,
          SUM(CASE WHEN claim_status = 'Denied' AND claim_amount_paid > 0
              THEN claim_amount_paid ELSE 0 END) AS denied_paid_total
        FROM claims
        """
    ).fetchone()
    assert got["total_claims"] == want[0]
    assert got["open_claims"] == want[1]
    assert got["in_flight_claims"] == want[2]
    assert got["denied_with_payment"] == want[3]
    assert got["overpaid_claims"] == want[4]
    assert got["incorrect_payment_claims"] == want[5]
    assert got["claims_without_remittances"] == want[6]
    assert got["pending_amount"] == pytest.approx(want[7])
    assert got["denied_paid_total"] == pytest.approx(float(want[8]))
    # every cohort planted
    for k in (
        "overpaid_claims", "incorrect_payment_claims",
        "claims_without_remittances", "denied_with_payment",
    ):
        assert got[k] > 0, k


def test_duplicate_claims_quirk5(claims, duck):
    """Σ(count) over groups with count>1 — rows, not groups."""
    got = CL.duplicate_claims(claims).collect()[0]
    want = duck.sql(
        """
        SELECT coalesce(SUM(cnt), 0), COUNT(*) FROM (
          SELECT claim_id, COUNT(*) AS cnt FROM claims GROUP BY claim_id HAVING COUNT(*) > 1)
        """
    ).fetchone()
    assert got["duplicate_claims"] == want[0] > 0
    assert got["duplicate_groups"] == want[1]
    assert got["duplicate_claims"] > got["duplicate_groups"]  # rows ≥ 2×groups


def test_payer_analysis(claims, duck):
    got = {
        r["payer_mco"]: r
        for r in CL.payer_analysis(claims).collect()
    }
    want = duck.sql(
        """
        SELECT payer_mco, COUNT(*), SUM(CASE WHEN claim_status='Denied' THEN 1 ELSE 0 END),
               SUM(CASE WHEN claim_status='Denied' THEN claim_amount ELSE 0 END)
        FROM claims GROUP BY payer_mco
        """
    ).fetchall()
    assert len(got) == len(want)
    for payer, n, denied, denied_amt in want:
        g = got[payer]
        assert g["total_claims"] == n
        assert g["denied_claims"] == denied
        assert g["total_denied_amount"] == pytest.approx(float(denied_amt))
        if denied == 0:
            assert g["avg_denied_amount"] == 0.0  # safe-divide default


def test_charge_stats_and_histogram(claims, duck):
    got = CL.charge_stats(claims).collect()[0]
    want = duck.sql(
        """
        SELECT COUNT(*), SUM(c.amount), MIN(c.amount), MAX(c.amount)
        FROM (SELECT unnest(charges) AS c FROM claims)
        """
    ).fetchone()
    assert got["total_charges"] == want[0]
    assert got["total_amount"] == pytest.approx(float(want[1]))
    assert got["min_amount"] == want[2]
    assert got["max_amount"] == want[3]

    hist = {r["bucket"]: r["n"] for r in CL.charge_histogram(claims).collect()}
    for (lo, hi) in CL.CHARGE_BUCKETS:
        w = duck.sql(
            f"""SELECT COUNT(*) FROM (SELECT unnest(charges) AS c FROM claims)
            WHERE c.amount >= {lo} AND c.amount < {hi}"""
        ).fetchone()[0]
        assert hist.get(f"[{lo},{hi})", 0) == w
    assert sum(hist.values()) == want[0]  # every charge in exactly one bucket


def test_charge_issues_exists_predicates(claims, duck):
    got = CL.charge_issues(claims).collect()[0]
    checks = {
        "claims_with_blank_cpt": "x -> x.cpt_hcpcs IS NULL OR x.cpt_hcpcs = ''",
        "claims_with_nonpositive_amount": "x -> x.amount <= 0",
        "claims_with_overpaid_charge": "x -> x.amount_paid > x.amount",
        "claims_with_excessive_adjustment": "x -> coalesce(x.adjustment_amount, 0) > 0.5 * x.amount",
        "claims_with_unit_outlier": "x -> x.unit > 100",
        "claims_with_charge_missing_remit": "x -> x.charge_remittances IS NULL OR len(x.charge_remittances) = 0",
    }
    for name, lam in checks.items():
        w = duck.sql(
            f"SELECT COUNT(*) FROM claims WHERE len(list_filter(charges, {lam})) > 0"
        ).fetchone()[0]
        assert got[name] == w, name
        assert got[name] > 0, f"cohort {name} not planted"
    # quirk-3 denominator: percentage uses TOTAL CHARGES
    w_charges = duck.sql(
        "SELECT coalesce(SUM(len(charges)), 0) FROM claims"
    ).fetchone()[0]
    assert got["total_charges"] == w_charges


def test_diagnosis_analysis(claims, duck):
    got = CL.diagnosis_analysis(claims).collect()[0]
    no_dx = duck.sql(
        "SELECT COUNT(*) FROM claims WHERE diagnoses IS NULL OR len(diagnoses)=0"
    ).fetchone()[0]
    assert got["claims_without_dx"] == no_dx
    # $nor semantics: no-diagnosis claims count as missing-primary too
    no_primary = duck.sql(
        """SELECT COUNT(*) FROM claims WHERE diagnoses IS NULL OR
           len(list_filter(diagnoses, x -> coalesce(x.is_primary_diagnosis, FALSE))) = 0"""
    ).fetchone()[0]
    assert got["claims_no_primary_dx"] == no_primary > 0
    assert got["claims_no_primary_dx"] >= got["claims_without_dx"]
    multi = duck.sql(
        """SELECT COUNT(*) FROM claims
           WHERE len(list_filter(diagnoses, x -> coalesce(x.is_primary_diagnosis, FALSE))) > 1"""
    ).fetchone()[0]
    assert got["claims_multi_primary_dx"] == multi > 0
    dup_order = duck.sql(
        """SELECT COUNT(*) FROM claims WHERE len(diagnoses) > 0
           AND len(list_distinct(list_transform(diagnoses, x -> x."order")))
               < len(list_transform(diagnoses, x -> x."order"))"""
    ).fetchone()[0]
    assert got["claims_dup_dx_order"] == dup_order > 0
    for field in CL.DX_FIELDS:
        w = duck.sql(
            f"""SELECT COUNT(*) FROM claims
            WHERE len(list_filter(diagnoses, x -> x."{field}" IS NULL OR x."{field}" = '')) > 0"""
        ).fetchone()[0]
        assert got[f"claims_blank_{field}"] == w, field


def test_adjustments_analysis(claims, duck):
    got = CL.adjustments_analysis(claims).collect()[0]
    want = duck.sql(
        """
        SELECT SUM(CASE WHEN claim_adj_amount > claim_amount THEN 1 ELSE 0 END),
               SUM(CASE WHEN claim_adj_amount > 0.5*claim_amount THEN 1 ELSE 0 END),
               SUM(CASE WHEN claim_adjustments IS NULL OR len(claim_adjustments)=0 THEN 1 ELSE 0 END),
               SUM(CASE WHEN coalesce(claim_amount_paid,0)+coalesce(claim_adj_amount,0) > claim_amount THEN 1 ELSE 0 END)
        FROM claims
        """
    ).fetchone()
    assert got["adj_exceeds_amount"] == want[0]
    assert got["adj_exceeds_half"] == want[1] > 0
    assert got["claims_without_adjustments"] == want[2] > 0
    assert got["paid_plus_adj_exceeds"] == want[3] > 0


def test_generate_stats_ep3(claims, duck, spark):
    stats = CL.generate_stats(claims).cache()
    want = duck.sql(
        """
        SELECT payer_mco, c.cpt_hcpcs, COUNT(*), MIN(c.amount), MAX(c.amount)
        FROM (SELECT payer_mco, unnest(charges) AS c FROM claims)
        WHERE payer_mco IS NOT NULL AND payer_mco <> ''
          AND c.cpt_hcpcs IS NOT NULL AND c.cpt_hcpcs <> ''
        GROUP BY payer_mco, c.cpt_hcpcs
        """
    ).fetchall()
    got = {
        (r["payer_mco"], r["cpt_code"]): r for r in stats.collect()
    }
    assert len(got) == len(want)
    for payer, cpt, n, mn, mx in want:
        g = got[(payer, cpt)]
        assert g["record_count"] == n
        assert g["billed_min"] == mn and g["billed_max"] == mx
    # unique-key index replacement (S6): zero violations
    assert CL.assert_stats_unique(stats) == 0
    bands = CL.stats_quality_bands(stats).collect()[0]
    assert (
        bands["high_quality"] + bands["medium_quality"] + bands["low_quality"]
        == bands["total_combinations"]
    )


def test_generate_dx_stats_double_unwind(claims, duck):
    got_n = CL.generate_dx_stats(claims).count()
    want_n = duck.sql(
        """
        SELECT COUNT(*) FROM (
          SELECT payer_mco, d.code, c.cpt_hcpcs, c.modifier, c.rev_code
          FROM (SELECT payer_mco, unnest(diagnoses) AS d, charges FROM claims),
               UNNEST(charges) AS t(c)
          WHERE payer_mco IS NOT NULL AND payer_mco <> ''
            AND d.code IS NOT NULL AND d.code <> ''
            AND c.cpt_hcpcs IS NOT NULL AND c.cpt_hcpcs <> ''
          GROUP BY ALL)
        """
    ).fetchone()[0]
    assert got_n == want_n > 0


def test_cpt_coverage_j1(claims, spark):
    stats = CL.generate_stats(claims)
    cov = CL.cpt_coverage(claims, stats).collect()[0]
    # stats are derived from the same claims -> full coverage
    assert cov["covered"] == cov["total"] > 0
    assert cov["coverage_pct"] == 100.0
    # drop half the stats -> partial coverage
    partial = stats.filter(F.col("cpt_code") < "99220")
    cov2 = CL.cpt_coverage(claims, partial).collect()[0]
    assert 0 < cov2["covered"] < cov2["total"]


def test_bround_half_even_quirk6(spark):
    """Spark bround == Python round (banker's) on exactly-representable ties;
    Spark round (HALF_UP) differs — the reason the engine uses bround."""
    df = spark.createDataFrame([(0.125,), (0.375,), (2.5,)], "x double")
    rows = df.select(
        F.bround("x", 2).alias("b2"), F.round("x", 2).alias("r2"),
        F.bround("x", 0).alias("b0"),
    ).collect()
    assert [r["b2"] for r in rows] == [round(0.125, 2), round(0.375, 2), 2.5]
    assert rows[0]["b2"] == 0.12 and rows[0]["r2"] == 0.13
    assert rows[2]["b0"] == round(2.5, 0) == 2.0
