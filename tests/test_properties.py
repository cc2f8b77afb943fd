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
