#!/usr/bin/env python
"""spark-submit entry point for the END-TO-END document-corpus pipeline
(`plans.prep.prep_text_corpus`): [blocklist → HTML extraction →]
heuristic filter → trained quality classifier → eval-set
decontamination → line dedup → exact dedup → near dedup → corpus
mixing → reproducible shards.

Cluster deployment:

    spark-submit --py-files dist/dqa_spark.zip scripts/run_prep_text.py \
        --input  s3://bucket/documents \
        --output s3://bucket/corpus_shards \
        --contamination s3://bucket/eval_gram_ledger \
        --min-quality 0.3 \
        --mixing '{"en": 0.6, "de": 0.2, "fr": 0.2}' \
        --num-shards 4096

Local smoke (this sandbox):

    python scripts/run_prep_text.py \
        --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/text_shards --cpus 8 --num-shards 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents table")
    ap.add_argument("--output", required=True, help="shard output directory")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--contamination", default=None,
                    help="committed eval gram-ledger dir (optional)")
    ap.add_argument("--min-quality", type=float, default=None,
                    help="trained-classifier gate (omit to skip the model)")
    ap.add_argument("--max-dup5", type=float, default=None,
                    help="Gopher duplicated-5-gram char-fraction gate "
                         "(omit to skip the phrase-repetition stage)")
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--mixing", default=None,
                    help='JSON stratum→fraction map, e.g. \'{"en": 0.6}\'')
    ap.add_argument("--strata-col", default="lang")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=64)
    ap.add_argument("--blocked-sources", default=None,
                    help="comma-separated domain/source blocklist (stage 0)")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--line-ledger", default=None,
                    help="cross-run line-fingerprint ledger dir (optional; "
                         "requires --batch-id)")
    ap.add_argument("--batch-id", default=None)
    ap.add_argument("--max-crossdoc-dup", type=float, default=None,
                    help="RefinedWeb cross-doc duplicated-5-gram "
                         "fraction gate (runs after near-dedup)")
    ap.add_argument("--html-col", default=None,
                    help="raw-crawl HTML column; derives --text-col via "
                         "map-only extraction (stage 0b)")
    ap.add_argument("--max-link-density", type=float, default=None,
                    help="boilerplate-page gate on anchor-text fraction "
                         "(requires --html-col)")
    ap.add_argument("--funnel", action="store_true",
                    help="print the per-stage drop funnel (one extra "
                         "count per stage)")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] override; omit under spark-submit")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    if args.cpus:
        from data_quality_analyzer_spark.session import get_spark

        spark = get_spark(app_name="text_corpus_prep", cpus=args.cpus)
    else:
        spark = SparkSession.builder.appName("text_corpus_prep").getOrCreate()

    from data_quality_analyzer_spark.plans.prep import prep_text_corpus

    docs = spark.read.parquet(args.input)
    funnel: list | None = [] if args.funnel else None
    out = prep_text_corpus(
        spark,
        docs,
        text_col=args.text_col,
        id_col=args.id_col,
        contamination_dir=args.contamination,
        min_quality_score=args.min_quality,
        max_dup5_frac=args.max_dup5,
        jaccard_threshold=args.jaccard,
        mixing=json.loads(args.mixing) if args.mixing else None,
        strata_col=args.strata_col,
        sample_seed=args.seed,
        shards_path=args.output,
        num_shards=args.num_shards,
        blocked_sources=(
            args.blocked_sources.split(",") if args.blocked_sources else None
        ),
        source_col=args.source_col,
        line_ledger_dir=args.line_ledger,
        batch_id=args.batch_id,
        funnel=funnel,
        html_col=args.html_col,
        max_link_density=args.max_link_density,
        max_crossdoc_dup_frac=args.max_crossdoc_dup,
    )
    n = spark.read.parquet(args.output).count()
    result = {
        "kept_rows": n,
        "output": args.output,
        "num_shards": args.num_shards,
    }
    if funnel is not None:
        result["funnel"] = funnel
    print(json.dumps(result))


if __name__ == "__main__":
    main()
