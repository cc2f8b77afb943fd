#!/usr/bin/env python
"""Time both connected-components paths on the q44 near-dup pair graph
at bench scale (sf0.1) — the PLANS.md evidence line for round-4 VERDICT
task 6 (the distributed loop must keep a pinned wall-time now that the
union-find fast path serves every test graph).

Interleaved best-of-N (this VM's noise protocol): the pair graph is
materialized ONCE, then each rep times driver union-find vs the
distributed min-label loop back-to-back.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_CC_REPS", "3"))


def main() -> None:
    from data_quality_analyzer_spark.exec_utils import materialize
    from data_quality_analyzer_spark.operators import dedup as DD
    from data_quality_analyzer_spark.plans import entry_queries as EQ
    from data_quality_analyzer_spark.session import get_spark

    spark = get_spark(app_name="cc_timing", cpus=32)
    pairs = DD.near_duplicates(
        EQ._q37_input(spark, SF_DIR), "text", "doc_id",
        jaccard_threshold=0.8, num_hashes=EQ._NUM_HASHES_37,
        bands=EQ._BANDS_37, k=EQ._K_37,
    ).transform(materialize)
    n_pairs = pairs.count()
    best = {"driver_union_find": None, "distributed_loop": None}
    counts = {}
    for _ in range(REPS):
        for name, kw in (
            ("driver_union_find", {}),
            ("distributed_loop", {"driver_max_edges": 0}),
        ):
            t0 = time.time()
            labels = DD.connected_components(pairs, **kw)
            counts[name] = labels.count()
            dt = time.time() - t0
            best[name] = dt if best[name] is None else min(best[name], dt)
    assert counts["driver_union_find"] == counts["distributed_loop"]
    print(
        json.dumps(
            {
                "sf": SF_DIR,
                "n_pairs": n_pairs,
                "n_labeled_nodes": counts["driver_union_find"],
                "best_sec": {k: round(v, 3) for k, v in best.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
