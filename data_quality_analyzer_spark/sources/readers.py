"""Document-corpus source readers beyond parquet: JSONL, CSV, and
raw-text-file ingestion with EXPLICIT schemas.

Scale rule: never let Spark infer a schema from a 100 TB corpus — JSON/
CSV inference is an extra full scan (and for JSON, a full parse) before
the real job starts, and a sampled inference can silently mistype rare
columns.  Every reader here takes a DDL schema (defaulting to the
``documents`` table shape) and passes it to the source, so the scan
starts immediately and malformed rows land in a visible corrupt-record
column instead of poisoning types.

Reference ancestor: the JSON file loading path (S2,
``scripts/load_data.py`` reading seed JSON into collections), upgraded
from driver-side ``json.load`` to distributed schema'd sources.

All three sources are SPLITTABLE as used here (uncompressed JSONL/CSV
split by line; per-file parallelism for whole-file text).  Gzip is NOT
splittable — one .gz file = one task; prefer zstd/bzip2 or many smaller
files when compressing a corpus for ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
CORRUPT_COL = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """One JSON object per line → documents DataFrame.  Malformed lines
    are PERMISSIVE-parsed into ``_corrupt_record`` (dropped by default;
    ``keep_corrupt=True`` keeps the column for a quarantine sink — a
    web-scale ingest should count them, not crash)."""
    if keep_corrupt:
        return (
            spark.read.schema(f"{schema}, {CORRUPT_COL} string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    # clean path: DROPMALFORMED at the source — a corrupt-column filter
    # would crash any query that prunes every data column (bare count():
    # Spark refuses plans referencing ONLY the corrupt record column)
    return (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    header: bool = True,
    keep_corrupt: bool = False,
) -> DataFrame:
    """CSV → documents DataFrame (explicit schema, RFC-4180 quoting with
    embedded newlines DISABLED — multiLine=false keeps the file
    splittable; corpora with newlines in text belong in JSONL/parquet)."""
    if keep_corrupt:
        return (
            spark.read.schema(f"{schema}, {CORRUPT_COL} string")
            .option("header", str(header).lower())
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .option("multiLine", "false")
            .csv(path)
        )
    return (  # see read_documents_jsonl for why DROPMALFORMED, not filter
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "DROPMALFORMED")
        .option("multiLine", "false")
        .csv(path)
    )


def read_text_files(
    spark: SparkSession, path: str, id_from: str = "path"
) -> DataFrame:
    """One document per FILE (wholetext): (doc_id, text, source) where
    doc_id is a deterministic 60-bit hash of the file path (or the path
    itself when ``id_from='path_string'``).  Parallelism = one task per
    file — right for many medium files, wrong for one giant file."""
    from ..functions import hashing as HH

    if id_from not in ("path", "path_string"):
        raise ValueError(
            f"id_from must be 'path' or 'path_string', got {id_from!r}"
        )
    df = (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("source"),
            F.col("value").alias("text"),
        )
    )
    if id_from == "path_string":
        return df.select(
            F.col("source").alias("doc_id"), "text", "source"
        )
    return df.select(
        F.expr(HH.h60_spark_sql("source")).alias("doc_id"), "text", "source"
    )
