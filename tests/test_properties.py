"""Property-based invariants (SURVEY §5 item 3) via hypothesis:
codec roundtrips on arbitrary images, scrub idempotence on arbitrary text,
oracle rule invariants (driver-local — no Spark in the hot loop)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_analyzer_spark.functions import perplexity as PX
from data_quality_analyzer_spark.functions import scrub as SC
from data_quality_analyzer_spark.functions.langid import get_model, predict_batch
from data_quality_analyzer_spark.sources import codecs as C

images = st.tuples(
    st.integers(1, 24), st.integers(1, 24), st.booleans(), st.integers(0, 2**32 - 1)
)


@given(images)
@settings(max_examples=40, deadline=None)
def test_codec_roundtrip_any_image(params):
    h, w, gray, seed = params
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(C.decode_png(C.encode_png(img)), img)
    rgb = img if not gray else np.stack([img] * 3, axis=-1)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(img)), rgb)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), rgb)
    # sniffing is unambiguous
    assert C.sniff_format(C.encode_png(img)) == "png"


text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_scrub_idempotent(text):
    once = SC.scrub_python(text)
    assert SC.scrub_python(once) == once  # scrub(scrub(x)) == scrub(x)


@given(text_strategy)
@settings(max_examples=100, deadline=None)
def test_model_scores_total(text):
    import pandas as pd

    li = predict_batch(pd.Series([text]), get_model())
    assert li["lang_conf"].iloc[0] >= 0.0
    ppl = PX.score_batch(pd.Series([text]), PX.get_model()).iloc[0]
    assert ppl > 0.0  # perplexity is positive (inf for too-short)


@given(st.binary(max_size=200))
@settings(max_examples=100, deadline=None)
def test_decode_never_crashes_on_garbage(blob):
    """Corrupt bytes must raise CodecError, never segfault/ValueError leak."""
    try:
        C.decode(blob)
    except C.CodecError:
        pass
    except NotImplementedError:
        pass


@given(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), min_size=5, max_size=200),
    st.integers(2, 12),
)
@settings(max_examples=60, deadline=None)
def test_poly60_three_way_agreement(text, k):
    """Polynomial shingle hash: numpy fast path == pure-python reference ==
    DuckDB SQL twin, for arbitrary unicode text and shingle size."""
    import duckdb

    from data_quality_analyzer_spark.functions import hashing as HH

    if len(text) < k:
        return
    ref = HH.poly60_python(text, k)
    cps = np.fromiter(map(ord, text), dtype=np.int64, count=len(text))
    assert HH.poly60_np(cps, k).tolist() == ref
    q = f"""
    WITH c AS (SELECT length(?) AS n,
        list_transform(range(1, length(?)+1), i -> unicode(substr(?, i, 1))) AS cps)
    SELECT list_transform(range(1, n - {k - 1} + 1), i -> {HH.poly60_duck_sql(k)}) FROM c
    """
    duck = duckdb.connect().execute(q, [text, text, text]).fetchone()[0]
    assert list(duck) == ref
    # range and sign invariants (must fit the mix's 60-bit contract)
    assert all(0 <= h < 1 << 60 for h in ref)


@given(st.integers(0, (1 << 60) - 1), st.integers(0, 15))
@settings(max_examples=200, deadline=None)
def test_mersenne_mix_matches_bigint_math(h, seed):
    """The split mulmod is EXACTLY (a*h + b) mod 2^61-1 — the property the
    minhash-unbiasedness argument rests on."""
    from data_quality_analyzer_spark.functions import hashing as HH

    a, b = HH.MINHASH_PARAMS[seed]
    assert HH.mix_python(h, seed) == (a * h + b) % HH.MERSENNE_P


@given(images)
@settings(max_examples=30, deadline=None)
def test_dqj_lossy_roundtrip_meets_gate(params):
    """Arbitrary images (noise included — the DCT worst case) clear the
    north-rule PSNR ≥ 40 dB gate at the default DQJ quality."""
    h, w, gray, seed = params
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec = C.decode_dqj(C.encode_dqj(img))
    assert dec.shape == img.shape
    assert C.psnr(img, dec) >= 40.0
