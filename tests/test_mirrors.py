"""Site-mirror detection: containment scoring, boilerplate guard,
incidence-distinct semantics, and contracts."""

from __future__ import annotations

import pytest

from data_quality_analyzer_spark.operators import mirrors as MI

ROWS = (
    # portal carries pages p1..p4; mirror carries p1..p2 only ->
    # containment vs the SMALLER side = 2/2 = 1.0
    [("portal.com", f"p{i}") for i in range(1, 5)]
    + [("mirror.net", "p1"), ("mirror.net", "p2")]
    + [("mirror.net", "p1")]  # duplicate doc: incidence is DISTINCT
    # half.org shares one of its two pages with portal
    + [("half.org", "p1"), ("half.org", "own")]
    # boilerplate fingerprint on every domain incl. two otherwise-unrelated
    + [(d, "boiler") for d in ("portal.com", "mirror.net", "half.org", "x.io", "y.io")]
    + [("x.io", "ux"), ("y.io", "uy")]
    + [("z.dev", None)]  # NULL fp ignored
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "source string, fp string")


def test_mirror_pairs_containment_and_guard(docs):
    got = {
        (r["domain_a"], r["domain_b"]): (
            r["n_shared"],
            r["n_fps_a"],
            r["n_fps_b"],
            r["containment"],
        )
        for r in MI.mirror_pairs(docs, max_group=4).collect()
    }
    # boiler spans 5 domains > max_group=4: dropped, so x.io/y.io pair
    # with nothing else in common must NOT appear
    assert ("x.io", "y.io") not in got
    # guard-consistent denominators: boiler is out of n_fps too, so the
    # TRUE full mirror scores exactly 1.0 despite carrying boilerplate
    assert got[("mirror.net", "portal.com")] == (2, 2, 4, 1.0)
    assert got[("half.org", "portal.com")] == (1, 2, 4, 0.5)
    assert got[("half.org", "mirror.net")] == (1, 2, 2, 0.5)
    assert len(got) == 3


def test_mirror_pairs_guard_off_includes_boiler(docs):
    """Raising the cap readmits the boilerplate group: every domain pair
    it spans appears — C(5,2)=10 pairs at minimum."""
    got = MI.mirror_pairs(docs, max_group=50).collect()
    keys = {(r["domain_a"], r["domain_b"]) for r in got}
    assert ("x.io", "y.io") in keys and len(keys) == 10


def test_mirror_pairs_contract(docs):
    with pytest.raises(ValueError):
        MI.mirror_pairs_duck_sql("t", max_group=1)
    with pytest.raises(ValueError):
        MI.mirror_pairs(docs, max_group=1)  # Spark-side guard parity
    with pytest.raises(ValueError):
        MI.collapse_mirrors_duck_sql("t", max_group=0)


def test_collapse_mirrors_action(spark):
    rows = [
        (1, "portal.com", "p1"),
        (2, "portal.com", "p2"),
        (3, "portal.com", "p3"),
        (8, "portal.com", "p4"),
        (4, "mirror.net", "p1"),
        (4, "mirror.net", "p1"),  # duplicate ROW: doc 4 counts once
        (5, "mirror.net", "p2"),
        (5, "mirror.net", "own2"),  # multi-fp doc: one fp shared suffices
        (6, "mirror.net", "own"),
        (7, "solo.org", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, fp string")
    got = {
        r["domain"]: (r["n_docs"], r["n_dropped"], r["dropped_checksum"])
        for r in MI.collapse_mirrors(df, threshold=0.5).collect()
    }
    # containment(mirror, portal) = 2/min(4,4) = 0.5 >= 0.5; portal has
    # equal fps but the tie... portal has 4 vs mirror 4 -> tie ->
    # lexicographically smaller wins: 'mirror.net' < 'portal.com', so
    # MIRROR is canonical and PORTAL loses its shared pages p1, p2
    assert got["mirror.net"] == (3, 0, 0)
    assert got["portal.com"] == (4, 2, 1 ^ 2)
    assert got["solo.org"] == (1, 0, 0)
    # duplicate rows / multi-fp docs never double-fold the checksum:
    # dropped ids are {1, 2}, each exactly once
    # below-threshold: nothing drops anywhere
    none = MI.collapse_mirrors(df, threshold=0.7).collect()
    assert all(r["n_dropped"] == 0 for r in none)


def test_collapse_mirrors_tie_rule(spark):
    """Equal fingerprint counts: the lexicographically SMALLER name is
    canonical — deterministic on both engines."""
    rows = [
        (1, "a.com", "x"),
        (2, "a.com", "y"),
        (3, "b.com", "x"),
        (4, "b.com", "y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, fp string")
    got = {
        r["domain"]: r["n_dropped"]
        for r in MI.collapse_mirrors(df, threshold=0.9).collect()
    }
    assert got == {"a.com": 0, "b.com": 2}
