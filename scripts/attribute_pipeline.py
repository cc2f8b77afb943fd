#!/usr/bin/env python
"""Attribute the round-4 driver-bench pipeline delta (VERDICT round 4,
task 1): pipeline_filter_scrub inflated 1.98× vs round 3 while the pinned
interleaved scaling evidence showed no structural regression.  Two
confounds were mixed: co-tenant noise during the driver bench, and the
genuinely-added quality-classifier Arrow UDF.  This script separates them
with ONE interleaved session over three pipeline variants:

* ``noclf``   — three separate scorer UDFs, quality classifier OFF: the
  round-3 pipeline shape (langid + perplexity only);
* ``unfused`` — three separate scorer UDFs, classifier ON: the exact
  round-4 shape that produced the 5.79 s driver number;
* ``fused``   — the round-5 default: ONE struct-returning Arrow UDF for
  all three scores (one caption serialization).

Variants run round-robin (noclf, unfused, fused, noclf, …) so a
co-tenant burst lands on all variants equally; each sample is itself a
fresh-subprocess run whose pipeline execution is best-of-3 in-process
(the established bench protocol for this VM — identical back-to-back
runs have measured 2.7–41 s).  Reported per-variant number = min over
samples (the machine's capability for that variant); the RATIOS between
variants are the attribution.

Usage:
    python scripts/attribute_pipeline.py            # orchestrate (reps=4)
    python scripts/attribute_pipeline.py --one X    # internal: run variant X
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "60000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
VARIANTS = {
    "noclf": {"fuse_scores": False, "with_quality_clf": False},
    "unfused": {"fuse_scores": False, "with_quality_clf": True},
    "fused": {"fuse_scores": True, "with_quality_clf": True},
}


def run_one(variant: str) -> None:
    import shutil

    import bench as B
    from data_quality_analyzer_spark.plans.pipeline import run_pipeline
    from data_quality_analyzer_spark.session import get_spark

    images_path = B.ensure_bench_corpus()
    out_dir = os.path.join(REPO, ".fixtures", f"attr_out_{variant}")
    spark = get_spark(
        app_name=f"attr_{variant}",
        cpus=CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(6 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    kw = VARIANTS[variant]
    images = spark.read.parquet(images_path)
    shutil.rmtree(out_dir, ignore_errors=True)
    # warm-up (codegen + UDF worker fork + page cache), then best-of-3
    run_pipeline(spark, images.limit(2000), **kw).write.format("noop").mode(
        "overwrite"
    ).save()
    best = None
    for _ in range(3):
        t0 = time.time()
        run_pipeline(spark, images, **kw).drop("bytes").write.mode(
            "overwrite"
        ).parquet(out_dir)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    n = spark.read.parquet(out_dir).count()
    print(json.dumps({"variant": variant, "sec": best, "rows": n}))


def main() -> None:
    if "--one" in sys.argv:
        run_one(sys.argv[sys.argv.index("--one") + 1])
        return
    reps = int(os.environ.get("SPARK_GRAFT_ATTR_REPS", "4"))
    samples: dict[str, list[float]] = {v: [] for v in VARIANTS}
    rows = 0
    for rep in range(reps):
        for v in VARIANTS:  # round-robin: bursts hit all variants equally
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", v],
                capture_output=True, text=True, check=True,
                env=dict(os.environ),
            )
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            samples[v].append(rec["sec"])
            rows = rec["rows"]
            print(
                f"rep {rep + 1}/{reps} {v}: {rec['sec']:.2f}s",
                file=sys.stderr,
            )
    best = {v: min(s) for v, s in samples.items()}
    result = {
        "rows": rows,
        "cpus": CPUS,
        "samples": {v: [round(x, 3) for x in s] for v, s in samples.items()},
        "best_sec": {v: round(b, 3) for v, b in best.items()},
        "ips": {v: round(rows / b, 1) for v, b in best.items()},
        "clf_cost_pct_unfused": round(
            100.0 * (best["unfused"] / best["noclf"] - 1.0), 1
        ),
        "clf_cost_pct_fused": round(
            100.0 * (best["fused"] / best["noclf"] - 1.0), 1
        ),
        "fusion_gain_pct": round(
            100.0 * (1.0 - best["fused"] / best["unfused"]), 1
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
