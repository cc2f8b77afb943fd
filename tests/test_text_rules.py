"""Rule-expression unit tests on hand-built micro-DataFrames, covering the
reference's null/empty/blank quirks (SURVEY §1.3) plus the three-engine
agreement of the scrub (Java regex / RE2 / Python re)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.functions import scrub as SC
from data_quality_analyzer_spark.functions import text as TX

EDGE_TEXTS = [
    "Contact me at john.doe@example.com or (555) 123-4567 today",
    "SSN 123-45-6789 and phone 555-123-4567 plus 555.123.4567",
    "the quick brown fox and the lazy dog run over the hill",
    "",
    "   ",
    None,
    "aaa aaa aaa aaa aaa aaa",
    "@@@@ #### !!!! %%%%",
    "swearword1 in the middle of the text here",
    "x",
    "the  double   spaces \t tabs \n newlines here and there",
    "email@no-tld@double.at@x.com mixed 123-45-6789-extra",
]


@pytest.fixture(scope="module")
def frames(spark):
    pdf = pd.DataFrame({"text": EDGE_TEXTS})
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t", pdf)
    return sdf, con


def test_heuristics_match_duckdb(frames):
    sdf, con = frames
    c = F.col("text")
    got = sdf.select(
        TX.n_tokens(c).alias("nt"),
        F.round(TX.symbol_ratio(c), 6).alias("sr"),
        F.round(TX.stopword_ratio(c), 6).alias("swr"),
        F.round(TX.distinct_token_ratio(c), 6).alias("dtr"),
        F.round(TX.mean_word_len(c), 6).alias("mwl"),
        TX.has_toxicity(c).alias("tox"),
        TX.is_blank(c).alias("blank"),
        F.coalesce(TX.keep_verdict(c), F.lit(False)).alias("keep"),
    ).toPandas()
    want = con.sql(
        f"""SELECT {TX.n_tokens_sql('text')} nt,
        round({TX.symbol_ratio_sql('text')}, 6) sr,
        round({TX.stopword_ratio_sql('text')}, 6) swr,
        round({TX.distinct_token_ratio_sql('text')}, 6) dtr,
        round({TX.mean_word_len_sql('text')}, 6) mwl,
        {TX.has_toxicity_sql('text')} tox,
        {TX.is_blank_sql('text')} blank,
        coalesce({TX.keep_verdict_sql('text')}, FALSE) keep
        FROM t"""
    ).df()
    for col in want.columns:
        a = got[col].fillna(-999).tolist()
        b = want[col].fillna(-999).tolist()
        assert a == b, f"{col}: spark={a} duck={b}"


def test_scrub_three_engines(frames):
    sdf, con = frames
    spark_out = sdf.select(SC.scrub(F.col("text")).alias("s")).toPandas()["s"]
    duck_out = con.sql(f"SELECT {SC.scrub_sql('text')} s FROM t").df()["s"]
    py_out = [SC.scrub_python(t) for t in EDGE_TEXTS]
    for a, b, c_ in zip(spark_out, duck_out, py_out):
        av = None if pd.isna(a) else a
        bv = None if pd.isna(b) else b
        assert av == bv == c_, (av, bv, c_)


def test_blank_collapse_quirk():
    """SURVEY §1.3 quirk 1: missing ∨ null ∨ '' all count as blank."""
    assert SC.scrub_python(None) is None
    for t, expect in [(None, True), ("", True), ("  ", True), ("x", False)]:
        # python-side mirror of TX.is_blank
        blank = t is None or t.strip() == ""
        assert blank is expect


def test_pii_patterns_precise():
    cases = {
        "a@b.co": "[EMAIL]",
        "123-45-6789": "[SSN]",
        "(555) 123-4567": "[PHONE]",
        "555-123-4567": "[PHONE]",
        "555.123.4567": "[PHONE]",
        "12-34-5678": "12-34-5678",  # not an SSN shape
        "5551234567": "5551234567",  # no separators -> not scrubbed
    }
    for raw, want in cases.items():
        assert SC.scrub_python(raw) == want, raw
