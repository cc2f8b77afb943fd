"""ANN frontier invariants (scripts/ann_frontier.py) at sf0.01 — the
numbers themselves are corpus-dependent (see PLANS.md for sf0.1), but
these properties must always hold."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "scripts")


@pytest.fixture(scope="module")
def results(spark):
    from ann_frontier import frontier

    return dict(
        (label, (rec, frac))
        for label, rec, frac in frontier(spark, "/root/testdata/sf0.01", 10)
    )


def test_wide_probe_reaches_exact_recall(results):
    """At the widest swept probe (nprobe=8 of k=16) the scan covers
    (essentially) the whole isotropic sf corpus, so recall must be exactly
    brute-force: 1.0.  Deterministic: fixed corpus, fixed seeds."""
    rec, frac = results["IVF random k=16 nprobe=8"]
    assert rec == 1.0 and frac > 0.9


def test_recall_monotone_in_nprobe(results):
    for fam in ("IVF random", "IVF trained"):
        recs = [results[f"{fam} k=16 nprobe={p}"][0] for p in (1, 2, 4, 8)]
        fracs = [results[f"{fam} k=16 nprobe={p}"][1] for p in (1, 2, 4, 8)]
        assert recs == sorted(recs), (fam, recs)
        assert fracs == sorted(fracs), (fam, fracs)


def test_lsh_scan_fraction_shrinks_with_bits(results):
    for fam in ("sign-LSH", "RP-LSH"):
        fracs = [results[f"{fam} bits={b}"][1] for b in (4, 6, 8)]
        assert fracs[0] > fracs[1] > fracs[2], (fam, fracs)
        # single bucket of 2^bits scans roughly 1/2^bits of the table
        assert fracs[2] < 0.05
