"""Unicode normalization (functions/normalize.py): NFC equivalence with
the stdlib, mojibake repair acceptance rules, and the marker pre-gate."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from data_quality_analyzer_spark.functions import normalize as NZ


def test_nfc_and_mojibake_python_twins():
    decomposed = "résumé"
    assert NZ.nfc(decomposed) == unicodedata.normalize("NFC", decomposed)
    assert NZ.nfc(decomposed) == "résumé"
    assert NZ.nfc(None) is None
    # classic UTF-8-as-cp1252 mojibake repairs
    assert NZ.repair_mojibake("cafÃ©") == "café"
    assert NZ.repair_mojibake("ellipsis â€¦ here") == "ellipsis … here"
    # already-correct text with no markers: untouched
    assert NZ.repair_mojibake("plain café text") == "plain café text"
    # marker present but the round-trip fails (lone UTF-8 lead byte):
    # untouched, no exception
    assert NZ.repair_mojibake("Ã") == "Ã"
    assert NZ.repair_mojibake(None) is None


def test_normalize_text_end_to_end(spark):
    rows = [
        (1, "résumé writing"),       # decomposed -> composed
        (2, "cafÃ© menu"),             # mojibake -> repaired
        (3, "already clean text"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["clean"]
        for r in NZ.normalize_text(df, "text", out_col="clean").collect()
    }
    assert out[1] == "résumé writing"
    assert out[2] == "café menu"
    assert out[3] == "already clean text"
    assert out[4] is None
    # idempotent: a second pass changes nothing
    again = NZ.normalize_text(
        spark.createDataFrame(
            [(k, v) for k, v in out.items()], "doc_id long, text string"
        ),
        "text",
        out_col="clean",
    )
    assert {r["doc_id"]: r["clean"] for r in again.collect()} == out


def test_normalized_text_rescues_dedup(spark):
    """The reason the stage exists: composed and decomposed forms of the
    SAME visible text dedup together only after normalization."""
    from data_quality_analyzer_spark.operators import dedup as DD

    rows = [(1, "café story"), (2, "café story")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert DD.exact_duplicates(df, "text", "doc_id").count() == 0
    n = NZ.normalize_text(df, "text")
    assert DD.exact_duplicates(n, "text", "doc_id").count() > 0


def test_normalize_stage_in_prep(spark):
    """prep_text_corpus(normalize_unicode=True) emits NFC text (no
    combining marks survive) and the funnel reports the stage."""
    from data_quality_analyzer_spark.plans.prep import prep_text_corpus
    from data_quality_analyzer_spark.sources import seed_corpus as SC

    base = " ".join(SC.sentences("en", 4, seed=9)) + " cafe\u0301"
    docs = spark.createDataFrame(
        [(1, base, "en")], "doc_id long, text string, lang string"
    )
    plain = {
        r["doc_id"]: r["text"] for r in prep_text_corpus(spark, docs).collect()
    }
    assert "\u0301" in plain[1]  # decomposed form passes through untouched
    funnel: list = []
    normed = {
        r["doc_id"]: r["text"]
        for r in prep_text_corpus(
            spark, docs, normalize_unicode=True, funnel=funnel
        ).collect()
    }
    assert "\u0301" not in normed[1]
    assert normed[1].endswith("caf\u00e9")
    assert any(e["stage"] == "normalize_unicode" for e in funnel)
