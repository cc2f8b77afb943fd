"""JSONL / CSV / whole-file text sources: schema'd reads round-trip the
documents fixture, malformed rows quarantine instead of crashing."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.sources import readers as RD

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pdf(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .orderBy("doc_id")
        .toPandas()
    )


def test_jsonl_roundtrip(spark, docs_pdf, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as f:
        for _, r in docs_pdf.iterrows():
            f.write(json.dumps({
                "doc_id": int(r.doc_id),
                "text": r.text,
                "lang": r.lang,
                "source": r.source,
                "n_chars": int(r.n_chars),
            }) + "\n")
    got = RD.read_documents_jsonl(spark, p).orderBy("doc_id").toPandas()
    assert got.equals(docs_pdf)


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", '
                '"source": "s", "n_chars": 2}\n')
        f.write("this is not json at all\n")
        f.write('{"doc_id": 2, "text": "also ok", "lang": "en", '
                '"source": "s", "n_chars": 7}\n')
    clean = RD.read_documents_jsonl(spark, p)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    kept = RD.read_documents_jsonl(spark, p, keep_corrupt=True)
    bad = kept.filter(F.col(RD.CORRUPT_COL).isNotNull()).collect()
    assert len(bad) == 1 and "not json" in bad[0][RD.CORRUPT_COL]


def test_csv_roundtrip(spark, docs_pdf, tmp_path):
    # CSV cannot carry embedded newlines in splittable mode: use the
    # newline-free subset of the fixture
    flat = docs_pdf[
        docs_pdf.text.notna() & ~docs_pdf.text.str.contains("\n")
    ].reset_index(drop=True)
    p = str(tmp_path / "docs_csv")
    spark.createDataFrame(flat).coalesce(1).write.option(
        "header", "true"
    ).csv(p)
    got = (
        RD.read_documents_csv(spark, p)
        .orderBy("doc_id")
        .toPandas()
        .reset_index(drop=True)
    )
    assert got.equals(flat)


def test_text_files_one_doc_per_file(spark, tmp_path):
    d = tmp_path / "files"
    os.makedirs(d)
    (d / "a.txt").write_text("first document body")
    (d / "b.txt").write_text("second document\nwith two lines")
    got = RD.read_text_files(spark, str(d)).collect()
    by_src = {os.path.basename(r["source"]): r for r in got}
    assert by_src["a.txt"]["text"] == "first document body"
    assert by_src["b.txt"]["text"] == "second document\nwith two lines"
    # deterministic ids: re-read yields the same ids
    again = {
        os.path.basename(r["source"]): r["doc_id"]
        for r in RD.read_text_files(spark, str(d)).collect()
    }
    assert all(by_src[k]["doc_id"] == again[k] for k in again)


def test_jsonl_count_and_aggregates_work(spark, tmp_path):
    """Round-5 review: the clean-path reader must survive queries that
    prune every data column (bare count()) — a corrupt-column filter
    makes Spark refuse such plans; DROPMALFORMED does not."""
    p = str(tmp_path / "cnt.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", '
                '"source": "s", "n_chars": 2}\n')
        f.write("garbage line\n")
        f.write('{"doc_id": 2, "text": "ok2", "lang": "en", '
                '"source": "s", "n_chars": 3}\n')
    df = RD.read_documents_jsonl(spark, p)
    assert df.count() == 2
    assert df.agg(F.sum("n_chars")).collect()[0][0] == 5


def test_text_files_rejects_bad_id_mode(spark, tmp_path):
    d = tmp_path / "f"
    os.makedirs(d)
    (d / "a.txt").write_text("x")
    import pytest as _pt

    with _pt.raises(ValueError, match="id_from"):
        RD.read_text_files(spark, str(d), id_from="pathstring")


def test_warc_roundtrip_and_composition(spark, tmp_path):
    """write_warc → read_warc round-trips records byte-exactly (binary
    payloads incl. CRLF bytes), splits HTTP bodies only for
    response/resource records, drops a truncated trailer, and the HTTP
    body composes straight into the HTML extractor."""
    from data_quality_analyzer_spark.operators import html as HT
    from data_quality_analyzer_spark.sources import readers as RD

    html = b"<html><head><title>T1</title></head><body><p>Hello crawl</p></body></html>"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    binary_payload = bytes(range(256)) + b"\r\n\r\n" + bytes(range(256))
    recs = [
        {"warc_type": "warcinfo", "record_id": "<urn:uuid:0>",
         "payload": b"software: test\r\n"},
        {"warc_type": "response", "record_id": "<urn:uuid:1>",
         "target_uri": "http://ex.com/a", "payload": http},
        {"warc_type": "resource", "record_id": "<urn:uuid:2>",
         "target_uri": "http://ex.com/bin", "payload": binary_payload},
    ]
    p1 = tmp_path / "crawl-00000.warc"
    RD.write_warc(str(p1), recs)
    # truncated final record must be dropped, not half-parsed
    with open(p1, "ab") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Record-ID: <urn:uuid:3>\r\nContent-Length: 9999\r\n"
                b"\r\nshort")
    out = {r["record_id"]: r for r in RD.read_warc(spark, str(p1)).collect()}
    assert set(out) == {"<urn:uuid:0>", "<urn:uuid:1>", "<urn:uuid:2>"}
    assert bytes(out["<urn:uuid:1>"]["payload"]) == http
    assert bytes(out["<urn:uuid:1>"]["http_body"]) == html
    assert out["<urn:uuid:1>"]["target_uri"] == "http://ex.com/a"
    assert bytes(out["<urn:uuid:2>"]["payload"]) == binary_payload
    assert out["<urn:uuid:0>"]["http_body"] is None  # warcinfo: no split
    assert out["<urn:uuid:0>"]["warc_type"] == "warcinfo"

    # composition: WARC → HTML extraction
    docs = (
        RD.read_warc(spark, str(p1))
        .filter(F.col("warc_type") == "response")
        .select(
            F.col("record_id").alias("doc_id"),
            F.col("http_body").cast("string").alias("html"),
        )
    )
    page = HT.extract_pages(docs, html_col="html").collect()[0]
    assert page["title"] == "T1"
    assert "Hello crawl" in page["text"]
