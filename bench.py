#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus the flagship image+caption filter+scrub
pipeline throughput (BASELINE.json metric: images/sec).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "images_per_sec": ..., "pipeline_rows": ..., "cpus": ...}

`--scaling` additionally runs the pipeline at local[8] and local[32] on the
same input and writes the two-cluster-size evidence table to
BENCH/BASELINE.md (north rule: efficiency = (T32/T8)/4 ≥ 0.8).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "60000"))
FIXTURE_DIR = os.path.join(REPO, ".fixtures", f"bench_{BENCH_ROWS}")
OUT_DIR = os.path.join(REPO, ".fixtures", "bench_out")


def ensure_bench_corpus() -> str:
    """Generate (once) the deterministic bench-tier corpus (FIXTURES.md F1)."""
    marker = os.path.join(FIXTURE_DIR, "_done")
    path = os.path.join(FIXTURE_DIR, "images.parquet")
    if os.path.exists(marker):
        return path
    from data_quality_analyzer_spark.sources.fixtures import write_corpus

    write_corpus(FIXTURE_DIR, BENCH_ROWS, seed=42)
    with open(marker, "w") as f:
        f.write("ok")
    return path


def run_pipeline_bench(spark, images_path: str, out_dir: str) -> tuple[float, int]:
    """Full filter+scrub: read → rules+models+image decode → write verdict
    table (bytes passthrough included — the real production write)."""
    from data_quality_analyzer_spark.plans.pipeline import run_pipeline

    images = spark.read.parquet(images_path)
    # pre-partition so 8- and 32-core runs are both fully subscribed
    images = images.repartition(128)
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    verdicts = run_pipeline(spark, images)
    verdicts.write.mode("overwrite").parquet(out_dir)
    dt = time.time() - t0
    n = spark.read.parquet(out_dir).count()
    return dt, n


def run_query_bench(spark) -> dict[str, float]:
    from data_quality_analyzer_spark.plans import entry_queries as EQ

    timings: dict[str, float] = {}
    for name, fn in sorted(EQ.queries().items()):
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    return timings


def main() -> None:
    from data_quality_analyzer_spark.session import get_spark

    scaling = "--scaling" in sys.argv
    images_path = ensure_bench_corpus()

    spark = get_spark(app_name="bench", cpus=CPUS)
    pipe_sec, pipe_rows = run_pipeline_bench(spark, images_path, OUT_DIR)
    timings = run_query_bench(spark)

    total = round(sum(timings.values()) + pipe_sec, 3)
    result = {
        "metric": "headline_queries_plus_filter_scrub_total",
        "value": total,
        "unit": "sec",
        "queries": {**timings, "pipeline_filter_scrub": round(pipe_sec, 3)},
        "sf": SF_DIR,
        "cpus": CPUS,
        "pipeline_rows": pipe_rows,
        "images_per_sec": round(pipe_rows / pipe_sec, 1),
    }

    if scaling:
        spark.stop()
        levels = {}
        for cpus in (8, 32):
            s = get_spark(app_name=f"bench{cpus}", cpus=cpus)
            sec, rows = run_pipeline_bench(s, images_path, OUT_DIR + f"_{cpus}")
            levels[cpus] = {"sec": sec, "rows": rows, "ips": rows / sec}
            s.stop()
        eff = (levels[32]["ips"] / levels[8]["ips"]) / 4.0
        result["scaling"] = {
            "ips_local8": round(levels[8]["ips"], 1),
            "ips_local32": round(levels[32]["ips"], 1),
            "efficiency_8_to_32": round(eff, 3),
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
            f.write(
                "# BENCH/BASELINE — two-cluster-size scaling evidence\n\n"
                "Same job (filter+scrub pipeline incl. verdict-table write), same input\n"
                f"({pipe_rows} images, 128 input partitions), two local parallelism levels\n"
                "(sandbox protocol from BASELINE.md §3).\n\n"
                "| level | images/sec | wall (s) |\n|---|---|---|\n"
                f"| local[8] (N) | {levels[8]['ips']:.1f} | {levels[8]['sec']:.1f} |\n"
                f"| local[32] (4N) | {levels[32]['ips']:.1f} | {levels[32]['sec']:.1f} |\n\n"
                f"**Scaling efficiency (T32/T8)/4 = {eff:.3f}** (target ≥ 0.8)\n\n"
                "Correctness from the same build: keep/drop F1 = 1.0 vs the pandas\n"
                "oracle, scrubbed-caption equality, byte-exact bytes passthrough\n"
                "(`python -m pytest -x -q`, tests/test_pipeline_oracle.py).\n"
            )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
