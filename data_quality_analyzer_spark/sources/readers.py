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


# ---------------------------------------------------------------------------
# WARC-lite: the web-crawl container format (ISO 28500 / WARC 1.0 —
# public spec), parsed with the stdlib only.  A crawl pipeline's first
# stage reads WARCs; everything downstream here (HTML extraction, the
# document prep funnel) composes on top of this reader.
#
# Format essentials handled: version line, CRLF header block,
# Content-Length-driven payload framing (binary-safe — payloads may
# contain anything), the two-CRLF record separator, and for
# response/resource records the HTTP-header/body split on the first
# blank line.
#
# Scale shape + honesty: `binaryFile` hands each WARC to ONE task —
# correct and parallel ACROSS files (CommonCrawl ships ~1 GB segments,
# thousands per crawl, so file-level parallelism is the real unit).
# Production WARCs are gzip-PER-RECORD precisely so readers can split
# INSIDE a file using CDX offset indexes; that path needs a gzip-member
# scanner and is out of scope here — the stage boundary (record schema,
# Arrow batching, downstream composition) is identical.  Parsing
# streams through mapInPandas, so one output batch never materializes a
# whole segment's records at once.
# ---------------------------------------------------------------------------

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, payload binary, http_body binary, n_bytes long"
)


def parse_warc_records(data: bytes, name: str) -> list[dict]:
    """Pure-python WARC parser (shared by the Spark reader and tests).
    Malformed trailing bytes end the scan (a truncated final record is
    dropped, never half-parsed)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break
        fields = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(":")
            if sep:
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break
        if length < 0:
            break  # malformed framing — never rewind into parsed bytes
        body_start = head_end + 4
        if body_start + length > n:
            break  # truncated record
        payload = data[body_start : body_start + length]
        wtype = fields.get("warc-type", "")
        http_body = None
        # only response records carry an HTTP message; a resource
        # record's payload IS the content (splitting it on an embedded
        # blank line would corrupt arbitrary binary resources)
        if wtype == "response" and b"\r\n\r\n" in payload:
            http_body = payload.split(b"\r\n\r\n", 1)[1]
        out.append(
            {
                "warc_file": name,
                "record_id": fields.get("warc-record-id", ""),
                "warc_type": wtype,
                "target_uri": fields.get("warc-target-uri"),
                "payload": payload,
                "http_body": http_body,
                "n_bytes": length,
            }
        )
        pos = body_start + length
    return out


def read_warc(spark, path: str):
    """WARC files → one row per record (schema: WARC_SCHEMA)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def _parse(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                recs = parse_warc_records(bytes(row["content"]), row["path"])
                if recs:
                    yield pd.DataFrame(recs)

    return files.select("path", "content").mapInPandas(
        _parse, schema=WARC_SCHEMA
    )


def write_warc(path: str, records: list[dict]) -> None:
    """Minimal WARC writer (fixtures/tests; also the round-trip proof
    for the parser).  Each record dict: warc_type, record_id,
    target_uri (optional), payload bytes."""
    with open(path, "wb") as f:
        for r in records:
            payload = r["payload"]
            head = [b"WARC/1.0"]
            head.append(b"WARC-Type: " + r["warc_type"].encode())
            head.append(b"WARC-Record-ID: " + r["record_id"].encode())
            if r.get("target_uri"):
                head.append(b"WARC-Target-URI: " + r["target_uri"].encode())
            head.append(b"Content-Length: " + str(len(payload)).encode())
            f.write(b"\r\n".join(head) + b"\r\n\r\n")
            f.write(payload)
            f.write(b"\r\n\r\n")
