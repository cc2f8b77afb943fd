"""Frontier politeness scheduling: cap invariant, rank contiguity,
determinism under repartition/row order, unparseable-URL exclusion,
and contract errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import frontier as FR

URLS = (
    [(f"https://big.com/p{i}",) for i in range(23)]
    + [(f"https://mid.org/a{i}",) for i in range(8)]
    + [("https://one.net/x",), (None,), ("   ",)]
)


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(URLS, "url string")


def test_cap_invariant_and_rank_contiguity(urls):
    slots = FR.assign_fetch_slots(urls, "url", per_domain_cap=5).collect()
    by_dom: dict[str, list] = {}
    for r in slots:
        by_dom.setdefault(r["domain"], []).append(r)
    # unparseable URLs excluded entirely
    assert set(by_dom) == {"big.com", "mid.org", "one.net"}
    assert len(by_dom["big.com"]) == 23
    for dom, rows in by_dom.items():
        ranks = sorted(r["rank_in_domain"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        for r in rows:
            assert r["fetch_slot"] == (r["rank_in_domain"] - 1) // 5
    # wave loads: big.com fills waves 0-3 with 5,5,5,5,3
    big = by_dom["big.com"]
    per_slot = {}
    for r in big:
        per_slot[r["fetch_slot"]] = per_slot.get(r["fetch_slot"], 0) + 1
    assert per_slot == {0: 5, 1: 5, 2: 5, 3: 5, 4: 3}


def test_fetch_plan_politeness_proof(urls):
    plan = {
        r["fetch_slot"]: r
        for r in FR.fetch_plan(urls, "url", per_domain_cap=5).collect()
    }
    assert set(plan) == {0, 1, 2, 3, 4}
    for r in plan.values():
        assert r["max_per_domain"] <= 5
    # wave 0 carries all three domains; the tail waves only big.com
    assert plan[0]["n_domains"] == 3
    assert plan[0]["n_urls"] == 5 + 5 + 1
    assert plan[4] is not None and plan[4]["n_urls"] == 3


def test_assignment_invariant_to_layout_and_row_order(spark, urls):
    base = {
        r["url"]: (r["fetch_slot"], r["rank_in_domain"])
        for r in FR.assign_fetch_slots(urls, "url", 5).collect()
    }
    shuffled = spark.createDataFrame(
        list(reversed(URLS)), "url string"
    ).repartition(7)
    again = {
        r["url"]: (r["fetch_slot"], r["rank_in_domain"])
        for r in FR.assign_fetch_slots(shuffled, "url", 5).collect()
    }
    assert base == again


SNAPS = (
    [("A", k, 1) for k in range(4)]  # never changes -> static
    + [("B", 0, 1), ("B", 1, 1), ("B", 2, 2), ("B", 3, 2)]  # 1 chg -> slow
    + [("C", k, k) for k in range(4)]  # changes every crawl -> fast
    + [("D", 0, 9)]  # seen once -> static by definition
    + [("E", 0, 1), ("E", 1, 2), ("E", 2, 2), ("E", 3, 3)]  # 2 -> medium
)


def test_estimate_change_rates_planted(spark):
    import random

    rows = list(SNAPS)
    random.Random(7).shuffle(rows)  # snapshot arrival order must not matter
    snaps = spark.createDataFrame(
        rows, "url string, crawl_idx int, content_fp long"
    ).repartition(5)
    from data_quality_analyzer_spark.operators.frontier import (
        estimate_change_rates,
    )

    got = {
        r["url"]: (r["n_snapshots"], r["n_changes"], r["recrawl_tier"])
        for r in estimate_change_rates(snaps).collect()
    }
    assert got == {
        "A": (4, 0, "static"),
        "B": (4, 1, "slow"),
        "C": (4, 3, "fast"),
        "D": (1, 0, "static"),
        "E": (4, 2, "medium"),
    }


def test_estimate_change_rates_duck_twin(spark):
    import duckdb
    import pandas as pd

    from data_quality_analyzer_spark.operators import frontier as FR

    con = duckdb.connect()
    con.register(
        "snaps", pd.DataFrame(SNAPS, columns=["url", "crawl_idx", "content_fp"])
    )
    duck = {
        u: (int(n), int(c), t)
        for u, n, c, t in con.execute(
            FR.estimate_change_rates_duck_sql("snaps")
        ).fetchall()
    }
    snaps = spark.createDataFrame(
        SNAPS, "url string, crawl_idx int, content_fp long"
    )
    got = {
        r["url"]: (r["n_snapshots"], r["n_changes"], r["recrawl_tier"])
        for r in FR.estimate_change_rates(snaps).collect()
    }
    assert got == duck


def test_recrawl_ledger_matches_batch(spark, tmp_path):
    """Three committed crawls must yield EXACTLY the batch estimator's
    per-URL stats and tiers over the concatenated snapshots — including
    a URL that skips a crawl (carried forward, transition counted
    against the last OBSERVED fingerprint); replay is a no-op, a
    duplicate URL within one crawl is rejected loudly."""
    from data_quality_analyzer_spark.operators import frontier as FR
    from data_quality_analyzer_spark.plans import lineage as L

    # STRING fingerprints — the repo's standard (md5) form; a ledger
    # that only took int64 would crash on the first real commit
    crawls = [
        [("A", "fp1"), ("B", "fp1"), ("C", "fp1")],
        [("A", "fp1"), ("C", "fp2")],  # B skips this crawl
        [("A", "fp2"), ("B", "fp9"), ("C", "fp2")],  # B changes over gap
    ]
    store = str(tmp_path / "recrawl")
    for k, rows in enumerate(crawls):
        snap = spark.createDataFrame(rows, "url string, content_fp string")
        L.recrawl_incremental(spark, snap, store, f"crawl-{k}")
    # replay no-op
    L.recrawl_incremental(
        spark,
        spark.createDataFrame(crawls[0], "url string, content_fp string"),
        store,
        "crawl-0",
    )
    led = {
        r["url"]: (r["n_snapshots"], r["n_changes"], r["recrawl_tier"])
        for r in L.recrawl_ledger_rates(spark, store).collect()
    }
    flat = [
        (u, k, fp) for k, rows in enumerate(crawls) for u, fp in rows
    ]
    batch = {
        r["url"]: (r["n_snapshots"], r["n_changes"], r["recrawl_tier"])
        for r in FR.estimate_change_rates(
            spark.createDataFrame(
                flat, "url string, crawl_idx int, content_fp string"
            )
        ).collect()
    }
    assert led == batch
    assert led["B"] == (2, 1, "fast")  # gap-spanning transition counted

    # superseded state partitions are GC'd: only the newest survives
    import os

    live = set(os.listdir(os.path.join(store, L.RECRAWL_STATE_DIR)))
    assert live == {"state_batch=crawl-2"}

    with pytest.raises(ValueError, match="more than once"):
        L.recrawl_incremental(
            spark,
            spark.createDataFrame(
                [("A", "x"), ("A", "y")], "url string, content_fp string"
            ),
            store,
            "crawl-9",
        )
    # NULL fingerprint (failed refetch): loud reject — the batch lag
    # and carry-forward state would otherwise disagree on the tier
    with pytest.raises(ValueError, match="NULL content fingerprints"):
        L.recrawl_incremental(
            spark,
            spark.createDataFrame(
                [("A", None)], "url string, content_fp string"
            ),
            store,
            "crawl-9",
        )
    with pytest.raises(ValueError, match="no committed"):
        L.recrawl_ledger_rates(spark, str(tmp_path / "empty"))


def test_cap_contract(urls):
    with pytest.raises(ValueError):
        FR.assign_fetch_slots(urls, "url", 0)
    with pytest.raises(ValueError):
        FR.fetch_plan_duck_sql("urls", "url", 0)


def test_url_templates_planted(spark):
    from data_quality_analyzer_spark.operators import frontier as FR

    rows = (
        [(f"https://a.com/page/{i}",) for i in range(3)]
        + [("https://a.com/page/1",)]  # duplicate URL: counted once
        + [(f"https://a.com/s/cafe{i:028x}",) for i in range(2)]
        + [(f"https://trap.io/cal/20{i:02d}/{j}",) for i in range(2) for j in range(2)]
        + [(None,), ("   ",)]
    )
    got = {
        (r["domain"], r["template"]): (r["n_urls"], r["is_trap"])
        for r in FR.url_templates(
            spark.createDataFrame(rows, "url string"), "url",
            trap_min_urls=4,
        ).collect()
    }
    assert got == {
        ("a.com", "/page/{d}"): (3, False),
        ("a.com", "/s/{hex}"): (2, False),
        ("trap.io", "/cal/{d}/{d}"): (4, True),  # exactly AT threshold
    }


def test_url_templates_duck_twin(spark):
    import duckdb
    import pandas as pd

    from data_quality_analyzer_spark.operators import frontier as FR

    rows = [
        ("https://a.com/page/7",),
        ("https://a.com/page/8",),
        ("https://b.net/x/deadbeef01/y/3",),  # hex AND digit segments
        ("https://b.net/x/deadbeef01/y/3",),  # dup
    ]
    con = duckdb.connect()
    con.register("urls", pd.DataFrame(rows, columns=["url"]))
    duck = {
        (d, t): (int(n), bool(f))
        for d, t, n, f in con.execute(
            FR.url_templates_duck_sql("urls", "url", trap_min_urls=2)
        ).fetchall()
    }
    got = {
        (r["domain"], r["template"]): (r["n_urls"], r["is_trap"])
        for r in FR.url_templates(
            spark.createDataFrame(rows, "url string"), "url",
            trap_min_urls=2,
        ).collect()
    }
    assert got == duck
    assert got[("b.net", "/x/{hex}/y/{d}")] == (1, False)


def test_throttle_traps_action(spark):
    from data_quality_analyzer_spark.operators import frontier as FR

    rows = (
        [(f"https://trap.io/cal/{i}/x",) for i in range(6)]  # one template
        + [(f"https://ok.com/page/{i}",) for i in range(3)]  # under threshold
    )
    df = spark.createDataFrame(rows, "url string")
    kept = {
        r["url"]
        for r in FR.throttle_traps(
            df, "url", trap_min_urls=5, keep_per_template=2
        ).collect()
    }
    trap_kept = {u for u in kept if u.startswith("https://trap.io")}
    assert len(trap_kept) == 2
    # benign template untouched
    assert {u for u in kept if u.startswith("https://ok.com")} == {
        f"https://ok.com/page/{i}" for i in range(3)
    }
    # deterministic keep set: shuffled input yields the same survivors
    again = {
        r["url"]
        for r in FR.throttle_traps(
            spark.createDataFrame(list(reversed(rows)), "url string")
            .repartition(4),
            "url",
            trap_min_urls=5,
            keep_per_template=2,
        ).collect()
    }
    assert again == kept
    with pytest.raises(ValueError):
        FR.throttle_traps(df, "url", keep_per_template=0)


def test_priority_aware_fetch_slots(spark):
    """A numeric priority prepends a DESC key to the wave order: high-
    priority URLs land in the earliest waves, NULLs last, and the cap
    invariant is untouched."""
    from data_quality_analyzer_spark.operators import frontier as FR

    rows = (
        [(f"https://d.com/hot{i}", 3) for i in range(2)]
        + [(f"https://d.com/warm{i}", 2) for i in range(2)]
        + [(f"https://d.com/cold{i}", 1) for i in range(2)]
        + [("https://d.com/unk", None)]
    )
    df = spark.createDataFrame(rows, "url string, prio int")
    got = {
        r["url"]: r["fetch_slot"]
        for r in FR.assign_fetch_slots(
            df, "url", per_domain_cap=2, priority_col="prio"
        ).collect()
    }
    assert {got[f"https://d.com/hot{i}"] for i in range(2)} == {0}
    assert {got[f"https://d.com/warm{i}"] for i in range(2)} == {1}
    assert {got[f"https://d.com/cold{i}"] for i in range(2)} == {2}
    assert got["https://d.com/unk"] == 3  # NULL priority: last wave


def test_hex_rule_requires_a_letter(spark):
    """A >=8 char PURE-DIGIT run must stay {d} — otherwise one logical
    id space splits into /x/{d} and /x/{hex} halves and a trap's count
    dilutes below the threshold (review finding)."""
    from data_quality_analyzer_spark.operators import frontier as FR

    rows = [
        ("https://a.com/item/9999999",),    # 7 digits -> {d}
        ("https://a.com/item/10000000",),   # 8 digits, hex-charset -> {d}!
        ("https://a.com/cal/20260817",),    # 8-digit date -> {d}
        ("https://a.com/s/deadbeef01",),    # real hex (has letters) -> {hex}
        ("https://a.com/s/1234567a",),      # letter at the end -> {hex}
        ("https://a.com/s/a1234567",),      # letter first -> {hex}
    ]
    got = {
        r["template"]: r["n_urls"]
        for r in FR.url_templates(
            spark.createDataFrame(rows, "url string"), "url"
        ).collect()
    }
    assert got == {"/item/{d}": 2, "/cal/{d}": 1, "/s/{hex}": 3}


def test_throttle_traps_duplicates_and_nulls(spark):
    """Duplicate URLs must not consume keep slots (output is distinct),
    and unparseable URLs are excluded like everywhere in the stack."""
    from data_quality_analyzer_spark.operators import frontier as FR

    rows = (
        [(f"https://t.io/cal/{i}/x",) for i in range(5)]
        + [("https://t.io/cal/0/x",)] * 3  # duplicates of a trap URL
        + [(None,), ("   ",)]
    )
    kept = [
        r["url"]
        for r in FR.throttle_traps(
            spark.createDataFrame(rows, "url string"),
            "url",
            trap_min_urls=5,
            keep_per_template=2,
        ).collect()
    ]
    assert len(kept) == 2 and len(set(kept)) == 2  # two DISTINCT survivors
    assert all(u and u.startswith("https://t.io") for u in kept)
