"""Eval-set decontamination: planted verbatim / near-verbatim eval
snippets inside larger training documents, containment semantics, and the
committed contamination ledger's atomic-manifest contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import decontam as DC
from data_quality_analyzer_spark.plans import lineage as LN

EVAL_A = "the quick brown fox jumps over the lazy dog tonight"
EVAL_B = "four score and seven years ago our fathers brought forth"
FILLER = (
    "completely unrelated filler words about spark shuffles and parquet "
    "row groups that share no trigram with any benchmark sentence"
)


def _eval_df(spark):
    return spark.createDataFrame(
        [(1, EVAL_A), (2, EVAL_B)], "doc_id long, text string"
    )


def _docs_df(spark):
    # near-verbatim: one word of EVAL_A changed mid-sentence — most of the
    # eval 3-grams still appear, so containment is high but < 1.0.
    near = EVAL_A.replace("jumps", "leaps")
    return spark.createDataFrame(
        [
            (10, f"intro text then {EVAL_A} and a long tail of other words"),
            (11, f"prefix {near} suffix words continue here"),
            (12, FILLER),
            (13, "two words"),          # < n words: no grams, passes through
            (14, None),                 # null text passes through
            (15, f"{EVAL_B}"),          # eval doc verbatim, nothing else
        ],
        "doc_id long, text string",
    )


def test_containment_flags_verbatim_and_near_verbatim(spark):
    grams = DC.eval_gram_table(_eval_df(spark))
    hits = DC.contamination_hits(_docs_df(spark), grams).collect()
    by_pair = {(r["doc_id"], r["eval_id"]): r for r in hits}
    # verbatim embedding: every eval gram appears -> containment 1.0
    assert by_pair[(10, 1)]["containment"] == 1.0
    assert by_pair[(15, 2)]["containment"] == 1.0
    # near-verbatim: EVAL_A has 10 words -> 8 distinct trigrams; one
    # substituted word kills exactly the 3 grams that cross it, 5 survive
    assert by_pair[(11, 1)]["containment"] == pytest.approx(5 / 8)
    # the filler doc shares nothing
    assert not any(d == 12 for (d, _e) in by_pair)


def test_decontaminate_drops_hits_and_passes_short_rows(spark):
    grams = DC.eval_gram_table(_eval_df(spark))
    kept = DC.decontaminate(
        _docs_df(spark), grams, threshold=0.6
    )
    ids = {r["doc_id"] for r in kept.collect()}
    # 10/15 verbatim and 11 near-verbatim (5/8=0.625>=0.6) dropped;
    # filler, short and null rows survive
    assert ids == {12, 13, 14}
    # at a stricter threshold the near-verbatim doc survives
    kept_strict = DC.decontaminate(_docs_df(spark), grams, threshold=0.9)
    assert {r["doc_id"] for r in kept_strict.collect()} == {11, 12, 13, 14}


def test_word_gram_hashes_tokenization(spark):
    df = spark.createDataFrame(
        [(1, "  A  b\tC  "), (2, "a b"), (3, None)], "i long, t string"
    )
    out = {
        r["i"]: r["g"]
        for r in df.select(
            "i", DC.word_gram_hashes("t", n=3).alias("g")
        ).collect()
    }
    assert len(out[1]) == 1          # 3 tokens after trim/split -> 1 gram
    assert out[2] == [] and out[3] == []
    # case/whitespace-insensitive: same tokens hash identically
    df2 = spark.createDataFrame([(9, "a B c")], "i long, t string")
    g2 = df2.select(DC.word_gram_hashes("t", n=3).alias("g")).head()["g"]
    assert g2 == out[1]


def test_contamination_ledger_commit_and_decontaminate(spark, tmp_path):
    store = str(tmp_path / "contam")
    LN.commit_contamination(spark, _eval_df(spark), store, batch_id="b1")
    kept = LN.decontaminate_committed(
        spark, _docs_df(spark), store, threshold=0.6
    )
    assert {r["doc_id"] for r in kept.collect()} == {12, 13, 14}
    # idempotent replay: re-committing the same batch is a no-op
    LN.commit_contamination(spark, _eval_df(spark), store, batch_id="b1")
    grams, n = LN.read_contamination(spark, store)
    assert n == 3
    n_grams = grams.count()
    LN.commit_contamination(spark, _eval_df(spark), store, batch_id="b1")
    assert LN.read_contamination(spark, store)[0].count() == n_grams
    # gram-size mismatch across batches fails fast
    with pytest.raises(ValueError, match="n=3"):
        LN.commit_contamination(
            spark, _eval_df(spark), store, batch_id="b2", n=5
        )


def test_contamination_ledger_empty_and_torn(spark, tmp_path):
    store = str(tmp_path / "contam2")
    # empty ledger: pass-through
    docs = _docs_df(spark)
    assert LN.decontaminate_committed(spark, docs, store).count() == docs.count()
    # torn write (parquet present, manifest absent) is invisible
    import os

    batch_dir = os.path.join(store, LN.CONTAM_DIR, "batch_id=torn")
    DC.eval_gram_table(_eval_df(spark)).write.parquet(batch_dir)
    assert LN.read_contamination(spark, store) is None
    assert LN.decontaminate_committed(spark, docs, store).count() == docs.count()
    # a later commit recovers: torn dir for the SAME batch id is cleaned
    LN.commit_contamination(spark, _eval_df(spark), store, batch_id="torn")
    kept = LN.decontaminate_committed(spark, docs, store, threshold=0.6)
    assert {r["doc_id"] for r in kept.collect()} == {12, 13, 14}


def test_broadcast_in_plan(spark):
    """The eval-gram side must broadcast: the overlap join shows
    BroadcastHashJoin, never SortMergeJoin on the gram key."""
    grams = DC.eval_gram_table(_eval_df(spark))
    plan = (
        DC.contamination_hits(_docs_df(spark), grams)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_gram_size_validation(spark):
    import pytest as _pt

    from data_quality_analyzer_spark.operators import decontam as DC

    with _pt.raises(ValueError, match="gram size"):
        DC.word_gram_hashes("text", n=0)
