"""Nested claims fixture — the reference-schema parity table (FIXTURES.md F2).

Schema reconstructed from every field the reference queries (SURVEY §1.2):
nested ``charges`` / ``diagnoses`` / ``claim_adjustments`` /
``charge_remittances`` arrays, with one planted violation cohort per
reference rule so every check has nonzero hits.  Deterministic (seeded).

Canonicalizations applied at generation (ingest-time, SURVEY §1.3):
* mixed-type ``diagnoses[].order`` (int 1 vs "1" in the reference,
  ``diagnosis_analysis.py:113-116``) → string;
* missing ∨ null ∨ "" → empty string "" or NULL (both planted; every
  blank-predicate must treat them identically);
* money stays DoubleType (the reference uses binary float for money —
  ``claim_analysis.py:39``); amounts are integer-valued so the gapped
  histogram quirk (§1.3 item 2) cannot bite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PAYERS = [f"Payer{i:02d}" for i in range(20)]
CPTS = [f"{99200 + i}" for i in range(40)]  # long tail
MODIFIERS = ["", "25", "59", "LT", "RT"]
REV_CODES = ["", "0450", "0360", "0250"]
DX_CODES = [f"D{i:03d}" for i in range(30)]
STATUSES = ["Open", "Sent to Payor", "Closed", "Denied"]


def _maybe_blank(rng, val: str, p_null: float = 0.02, p_empty: float = 0.02):
    r = rng.random()
    if r < p_null:
        return None
    if r < p_null + p_empty:
        return ""
    return val


def generate_claims(n_claims: int = 1500, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_claims):
        claim_id = f"CLM{i:08d}"
        # ~1% duplicate claim ids (claim_analysis.py:225-247 cohort)
        if i > 20 and rng.random() < 0.01:
            claim_id = f"CLM{int(rng.integers(0, i)):08d}"
        # payer distribution: skewed (top payers get most claims)
        payer_idx = min(int(rng.exponential(4)), len(PAYERS) - 1)
        payer = _maybe_blank(rng, PAYERS[payer_idx], 0.01, 0.01)
        status = STATUSES[int(rng.integers(0, 4))]

        n_charges = int(rng.integers(0, 5))  # 0 => missing-charges cohort
        charges = []
        total_amount = 0.0
        for _ in range(n_charges):
            # long-tail CPT usage
            cpt_idx = min(int(rng.exponential(6)), len(CPTS) - 1)
            amount = float(int(rng.integers(1, 120)) * 50)  # integer-safe
            if rng.random() < 0.02:  # nonpositive-amount cohort (P3)
                amount = 0.0
            paid = float(int(amount * rng.choice([0.0, 0.5, 0.8, 1.0])))
            adj = float(int(rng.integers(0, 3)) * 25)
            unit = int(rng.integers(1, 4))
            if rng.random() < 0.02:  # overpaid cohort (P6)
                paid = amount + 100.0
            if rng.random() < 0.02:  # excessive adjustment cohort (P7)
                adj = amount * 0.75
            if rng.random() < 0.02:  # unit outlier (P3)
                unit = 150
            charges.append(
                {
                    "cpt_hcpcs": _maybe_blank(rng, CPTS[cpt_idx], 0.02, 0.02),
                    "modifier": MODIFIERS[int(rng.integers(0, 5))],
                    "rev_code": REV_CODES[int(rng.integers(0, 4))],
                    "amount": amount,
                    "amount_paid": paid,
                    "adjustment_amount": adj,
                    "unit": unit,
                    "unit_price": amount / unit,
                    "description": _maybe_blank(rng, f"svc {CPTS[cpt_idx]}", 0.03, 0.03),
                    "charge_remittances": (
                        [{"remit_id": f"R{i}"}] if rng.random() < 0.7 else []
                    ),
                    "charge_adjustments": (
                        [{"adj_id": f"A{i}"}] if rng.random() < 0.5 else []
                    ),
                }
            )
            total_amount += amount

        n_dx = int(rng.integers(0, 4))
        diagnoses = []
        primary_count = 1 if (n_dx > 0 and rng.random() > 0.15) else 0
        if n_dx > 0 and rng.random() < 0.05:
            primary_count = 2  # multi-primary cohort (A12)
        orders = [str(k + 1) for k in range(n_dx)]
        if n_dx >= 2 and rng.random() < 0.05:
            orders[1] = orders[0]  # duplicate order cohort
        for k in range(n_dx):
            diagnoses.append(
                {
                    "code": _maybe_blank(rng, DX_CODES[int(rng.integers(0, 30))], 0.03, 0.03),
                    "description": _maybe_blank(rng, "dx desc", 0.05, 0.05),
                    "is_primary_diagnosis": k < primary_count,
                    "type": _maybe_blank(rng, "ICD10", 0.04, 0.04),
                    "status": _maybe_blank(rng, "active", 0.04, 0.04),
                    "order": orders[k],
                    "occurrence_date": _maybe_blank(rng, "2025-06-01", 0.05, 0.05),
                    "present_on_admission": _maybe_blank(rng, "Y", 0.06, 0.06),
                }
            )

        claim_amount = total_amount if n_charges else float(int(rng.integers(1, 50)) * 100)
        claim_paid = float(int(claim_amount * rng.choice([0.0, 0.3, 0.7, 1.0])))
        claim_adj = float(int(rng.integers(0, 5)) * 50)
        if rng.random() < 0.02:  # paid > amount cohort (claim level, P6)
            claim_paid = claim_amount + 250.0
        if rng.random() < 0.02:  # coalesce(paid)+coalesce(adj) > amount (P7)
            claim_adj = claim_amount

        rows.append(
            {
                "claim_id": claim_id,
                "payer_mco": payer,
                "claim_status": status,
                "claim_amount": claim_amount,
                "claim_amount_paid": claim_paid,
                "claim_adj_amount": claim_adj,
                "charge_remittances": (
                    [{"remit_id": f"CR{i}"}] if rng.random() < 0.8 else []
                ),
                "claim_adjustments": (
                    [{"adj_id": f"CA{i}"}] if rng.random() < 0.6 else []
                ),
                "charges": charges,
                "diagnoses": diagnoses,
            }
        )
    return pd.DataFrame(rows)


CLAIMS_DDL = """
    claim_id string, payer_mco string, claim_status string,
    claim_amount double, claim_amount_paid double, claim_adj_amount double,
    charge_remittances array<struct<remit_id string>>,
    claim_adjustments array<struct<adj_id string>>,
    charges array<struct<
        cpt_hcpcs string, modifier string, rev_code string,
        amount double, amount_paid double, adjustment_amount double,
        unit int, unit_price double, description string,
        charge_remittances array<struct<remit_id string>>,
        charge_adjustments array<struct<adj_id string>>
    >>,
    diagnoses array<struct<
        code string, description string, is_primary_diagnosis boolean,
        type string, status string, order string,
        occurrence_date string, present_on_admission string
    >>
"""


def write_claims(out_dir: str, n_claims: int = 1500, seed: int = 42) -> str:
    """Write claims.parquet (nested) via Spark-compatible pyarrow schema."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "claims.parquet")
    pdf = generate_claims(n_claims, seed)
    # go through Spark's DDL-driven conversion on read; write via pyarrow
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(table, path)
    return path
