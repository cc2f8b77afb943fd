"""F8/F9 display helpers vs the reference's Python semantics
(shared/utils.py:24-57) — expected values hand-computed from the reference
formulas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.functions import display as DSP


@pytest.fixture(scope="module")
def one(spark):
    return spark.range(1)


def _val(one, col):
    return one.select(col.alias("v")).collect()[0]["v"]


def test_truncate_string(one):
    long = "x" * 60
    # reference: text[:50-3] + '...' => 47 x's + '...'
    assert _val(one, DSP.truncate_string(F.lit(long))) == "x" * 47 + "..."
    assert _val(one, DSP.truncate_string(F.lit("short"))) == "short"
    exact = "y" * 50
    assert _val(one, DSP.truncate_string(F.lit(exact))) == exact  # <= max kept
    assert _val(one, DSP.truncate_string(F.lit(None).cast("string"))) is None
    assert _val(one, DSP.truncate_string(F.lit("abcdefgh"), 6, "..")) == "abcd.."


def test_format_number(one):
    # reference: f"{1234567:,}" == "1,234,567"
    assert _val(one, DSP.format_number(F.lit(1234567))) == "1,234,567"
    assert _val(one, DSP.format_number(F.lit(0))) == "0"


def test_format_percentage(one):
    # reference: f"{87.34:.1f}%" == "87.3%"
    assert _val(one, DSP.format_percentage(F.lit(87.34))) == "87.3%"
    assert _val(one, DSP.format_percentage(F.lit(100.0))) == "100.0%"
    assert _val(one, DSP.format_percentage(F.lit(12.345), 2)) == "12.35%"


def test_format_timestamp(one):
    ts = F.lit("2026-03-04 05:06:07").cast("timestamp")
    assert _val(one, DSP.format_timestamp(ts)) == "2026-03-04 05:06:07"
    assert _val(one, DSP.format_timestamp(ts, "yyyy-MM-dd")) == "2026-03-04"


def test_calculate_percentage_half_even(one):
    # reference: round((1/3)*100, 2) == 33.33; round(0.125*100, 0)? quirk-6:
    # Python round is banker's — 12.5 -> 12 at 0 decimals
    assert _val(one, DSP.calculate_percentage(F.lit(1), F.lit(3))) == 33.33
    assert _val(one, DSP.calculate_percentage(F.lit(1), F.lit(0))) == 0.0
    assert _val(one, DSP.calculate_percentage(F.lit(1), F.lit(8), 0)) == round(12.5, 0) == 12.0


def test_safe_divide(one):
    assert _val(one, DSP.safe_divide(F.lit(10), F.lit(4))) == 2.5
    assert _val(one, DSP.safe_divide(F.lit(10), F.lit(0))) == 0.0
    assert _val(one, DSP.safe_divide(F.lit(10), F.lit(0), default=-1.0)) == -1.0
