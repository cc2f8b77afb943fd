"""PySpark-native data-quality / quality-filter engine.

A from-scratch rebuild (NOT a port) of the capabilities of
``yamini1234567/data_quality_analyzer`` — a MongoDB aggregation-pipeline
data-quality analyzer (~60 rule-based completeness / validity / consistency /
uniqueness checks, materialized stats tables, threshold-gated readiness
scores) — recast as an idiomatic Spark DataFrame engine and extended into a
web-scale quality-filter stage over image+caption tables: language-ID,
perplexity scoring, Gopher/C4-style heuristics, PII scrubbing, toxicity
filtering, dedup (exact / MinHash-LSH / SimHash), and similarity search.

Subpackages
-----------
``sources``    table catalog, deterministic fixture corpus, pure-numpy codecs
``functions``  column-expression builders + vectorized pandas UDFs
``operators``  rule registry, dedup, similarity, image stage, readiness gates
``plans``      end-to-end pipeline assembly, lineage/checkpoint-resume
``streaming``  Structured Streaming variants of the metric layer
``oracle``     pure-pandas reference-semantics oracle used by the test gate
"""

__version__ = "0.1.0"
