#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): time individual declared
queries in isolation with the noop sink, capture .explain("formatted"),
and label jobs.  `bench.py` is FROZEN for driver measurement; this file
is the working instrument.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 q47_embedding_near_dup ...
  python bench_extra.py --sf ... --repeats 3 --explain plans/r06 --suffix before q67_semantic_dedup
  python bench_extra.py --sf ... --all            # every registered query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain", default=None, help="directory to write <q>_<suffix>.txt explain files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    from data_quality_analyzer_spark.plans import entry_queries as EQ
    from data_quality_analyzer_spark.session import get_spark

    spark = get_spark(app_name="bench_extra")
    reg = EQ.queries()
    names = sorted(reg) if args.all else args.queries
    unknown = [n for n in names if n not in reg]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    timings: dict[str, float] = {}
    for name in names:
        fn = reg[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
        timings[name] = 0.0 if best is None else best
        print(f"{name}: {best}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
