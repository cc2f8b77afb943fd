#!/usr/bin/env python
"""spark-submit entry point for END-TO-END corpus prep: quality filter +
scrub, then image near-dedup (optionally against a committed cross-run
phash ledger).

Cluster deployment:

    spark-submit --py-files dist/dqa_spark.zip scripts/run_prep.py \
        --input  s3://bucket/images_table \
        --output s3://bucket/prepped \
        --ledger s3://bucket/phash_ledger --batch-id crawl-2026-08

Local smoke (this sandbox):

    python scripts/run_prep.py --input .fixtures/t1/images.parquet \
        --output /tmp/prepped --cpus 8

Without --ledger/--batch-id the dedup is within-batch only; with them,
near-copies of previously committed batches are dropped and this batch's
surviving fingerprints are committed atomically (idempotent replay).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="images table (input_hint schema)")
    ap.add_argument("--output", required=True, help="prepped table directory")
    ap.add_argument("--ledger", default=None, help="cross-run phash ledger dir")
    ap.add_argument("--batch-id", default=None, help="ledger batch id")
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] override; omit under spark-submit")
    args = ap.parse_args()
    if (args.ledger is None) != (args.batch_id is None):
        ap.error("--ledger and --batch-id must be given together")

    from pyspark.sql import SparkSession

    if args.cpus:
        from data_quality_analyzer_spark.session import get_spark

        spark = get_spark(app_name="corpus_prep", cpus=args.cpus)
    else:
        spark = SparkSession.builder.appName("corpus_prep").getOrCreate()

    from data_quality_analyzer_spark.plans.prep import prep_corpus

    images = spark.read.parquet(args.input)
    prepped = prep_corpus(
        spark,
        images,
        store_dir=args.ledger,
        batch_id=args.batch_id,
        max_hamming=args.max_hamming,
    )
    prepped.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"prepped_rows": n, "output": args.output}))


if __name__ == "__main__":
    main()
