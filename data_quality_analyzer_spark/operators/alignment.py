"""Image–caption ALIGNMENT gate — the DataComp/LAION "CLIP-score filter"
stage, built so the Spark plumbing is real and the scoring is exactly
reproducible across engines.

A production run scores alignment with a learned two-tower model (CLIP);
no ML runtime exists in this sandbox, so the EMBEDDERS here are
deterministic stand-ins — but honest ones, with the same shapes a real
deployment has:

* caption tower: hashed bag-of-words into D=60 signed buckets
  (feature-hashing a la Weinberger et al. 2009) — token → portable h60,
  bucket = h mod 60, sign = ±1 from bit 6; the caption vector is the
  signed bucket-count vector (integer!).
* image tower: the low 60 bits of a 64-bit perceptual hash (fixture
  `phash` / any int64 image fingerprint) read as a ±1 vector — every
  image vector has ‖u‖² = 60 exactly.
* score: cosine(v, u).  The keep decision `cos ≥ num/den` is evaluated
  in EXACT int64 arithmetic: keep ⟺ dot > 0 ∧ den²·dot² ≥ num²·60·‖v‖²
  — no float ever enters, so DuckDB and Spark agree to the bit.

Swapping in real CLIP means replacing the two towers with an Arrow UDF
over (bytes, caption) and a float threshold; every downstream piece
(gate, funnel, report) is unchanged.

Scale shape (100 TB): scoring is MAP-ONLY pure Catalyst — tokenize,
hash, sort the (bucket, sign) terms, and fold a run-length accumulator
over the sorted array (the repetition.py sorted-RLE pattern), picking up
the image bit inside the lambda from the row's own hash column.  Zero
UDF, zero join, zero shuffle; the q73 report's per-source agg is the
only exchange.  The DuckDB oracle deliberately uses a DIFFERENT
decomposition (unnest → per-bucket sums → per-doc dot/norm) so the fold
is proven against independent algebra, not itself.

Reference ancestor: F14 validity conjunction (`additional_charge_checks
.py:720-838`) as a cross-modal consistency rule; the reference's
claim-vs-stats consistency checks are the same "two sources must agree"
decision this gate makes per image+caption pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as HH
from ..functions import text as TXF

#: embedding dimensionality — one bucket per usable bit of the 60-bit
#: portable hash family.
ALIGN_DIM = 60
#: default keep threshold cos ≥ 1/5 (rational, so the decision is exact)
ALIGN_NUM, ALIGN_DEN = 1, 5

# the pinned tri-engine tokenizer lives in functions/text.py — shared
# with repetition.py so caption tokenization can never drift between
# the alignment gate and the repetition/dedup operators
_TOKS = TXF.WS_TOKENS_SPARK
_TOKS_DUCK = TXF.WS_TOKENS_DUCK


def _term_expr(tok: str) -> tuple[str, str]:
    """Spark-SQL (bucket, sign) pair for one token expression."""
    h = HH.h60_spark_sql(tok)
    return (
        f"CAST(pmod({h}, {ALIGN_DIM}) AS INT)",
        f"CAST(1 - 2 * pmod(shiftright({h}, 6), 2) AS BIGINT)",
    )


def _usign(p: str, b: str) -> str:
    """Spark-SQL ±1 image-vector component: bit ``b`` of hash ``p``."""
    return f"(1 - 2 * pmod(shiftright({p}, {b}), 2))"


def alignment_struct(caption_col: str, image_hash_col: str) -> Column:
    """Map-only alignment struct column ``(dot, nrm)``: ⟨v,u⟩ and ‖v‖²,
    both exact int64 (NULL for NULL captions — callers coalesce to 0).

    The fold walks the bucket-sorted (bucket, sign) terms once,
    accumulating the signed run per bucket and folding each finished run
    r into dot += r·u_bucket and ‖v‖² += r² — linear in tokens, constant
    memory, whole-stage codegen."""
    bucket, sign = _term_expr("t")
    terms = (
        f"array_sort(transform({_TOKS.format(c=caption_col)}, "
        f"t -> named_struct('b', {bucket}, 's', {sign})))"
    )
    zero = (
        "named_struct('prev', -1, 'run', CAST(0 AS BIGINT), "
        "'dot', CAST(0 AS BIGINT), 'nrm', CAST(0 AS BIGINT))"
    )
    u_prev = _usign(image_hash_col, "acc.prev")
    flush_dot = f"acc.dot + IF(acc.prev < 0, 0, acc.run * {u_prev})"
    flush_nrm = "acc.nrm + IF(acc.prev < 0, 0, acc.run * acc.run)"
    step = (
        "(acc, x) -> IF(acc.prev = x.b, "
        "named_struct('prev', acc.prev, 'run', acc.run + x.s, "
        "'dot', acc.dot, 'nrm', acc.nrm), "
        f"named_struct('prev', x.b, 'run', x.s, "
        f"'dot', {flush_dot}, 'nrm', {flush_nrm}))"
    )
    finish = (
        f"acc -> named_struct('dot', {flush_dot}, 'nrm', {flush_nrm})"
    )
    # ONE folded struct column — callers bind it once and extract fields,
    # never re-running the fold per output column (the q49 HOF lesson).
    return F.expr(f"aggregate({terms}, {zero}, {step}, {finish})")


def _check_threshold(num: int, den: int) -> None:
    # num ≥ 1: the `dot > 0` conjunct (which also rejects unscorable
    # rows) would silently tighten a cos ≥ 0 threshold at exactly-
    # orthogonal pairs; a strictly positive threshold keeps the rule
    # and the docstring identical.
    if num < 1 or den < 1:
        raise ValueError(
            f"alignment threshold must be a positive rational "
            f"(num ≥ 1, den ≥ 1); got {num}/{den}"
        )


def alignment_keep(
    dot: Column, nrm: Column, num: int = ALIGN_NUM, den: int = ALIGN_DEN
) -> Column:
    """Exact rational threshold: cos(v, u) ≥ num/den (num ≥ 1 — see
    :func:`_check_threshold`) and defined."""
    _check_threshold(num, den)
    return (
        (dot > 0)
        & (F.lit(den * den) * dot * dot >= F.lit(num * num * ALIGN_DIM) * nrm)
    )


def alignment_scores(
    df: DataFrame,
    caption_col: str = "caption",
    image_hash_col: str = "phash",
    num: int = ALIGN_NUM,
    den: int = ALIGN_DEN,
) -> DataFrame:
    """Annotate with ``align_dot``, ``align_nrm``, ``align_keep``
    (map-only; see module docstring).  Unscorable rows — empty/NULL
    caption, so ‖v‖ = 0 — get ``align_keep = false``: an alignment gate
    cannot vouch for a pair it cannot score (callers exempting
    caption-less rows should gate on n_tokens upstream)."""
    out = (
        df.withColumn(
            "_align", alignment_struct(caption_col, image_hash_col)
        )
        .withColumn(
            "align_dot",
            F.coalesce(F.col("_align.dot"), F.lit(0).cast("long")),
        )
        .withColumn(
            "align_nrm",
            F.coalesce(F.col("_align.nrm"), F.lit(0).cast("long")),
        )
        .drop("_align")
    )
    return out.withColumn(
        "align_keep",
        alignment_keep(F.col("align_dot"), F.col("align_nrm"), num, den),
    )


def alignment_report_duck_sql(
    rel: str,
    caption: str,
    image_hash: str,
    id_col: str,
    group_col: str,
    num: int = ALIGN_NUM,
    den: int = ALIGN_DEN,
) -> str:
    """DuckDB twin of the q73 per-group report — INDEPENDENT
    decomposition: unnest tokens → signed per-bucket sums → per-doc
    dot/‖v‖² → group rollup.  Exact int64 throughout."""
    _check_threshold(num, den)
    h = HH.h60_sql("tok")
    toks = _TOKS_DUCK.format(c="_cap")
    keep = (
        f"(dot > 0 AND {den * den} * dot * dot >= "
        f"{num * num * ALIGN_DIM} * nrm)"
    )
    return f"""
    WITH base AS (
      SELECT {id_col} AS _id, {group_col} AS _grp, {caption} AS _cap,
             {image_hash} AS _p
      FROM {rel}
    ), tok AS (
      SELECT _id, unnest({toks}) AS tok FROM base
    ), term AS (
      SELECT _id, CAST({h} % {ALIGN_DIM} AS INT) AS b,
             CAST(1 - 2 * (({h} >> 6) & 1) AS BIGINT) AS s
      FROM tok
    ), vb AS (
      SELECT _id, b, SUM(s) AS v FROM term GROUP BY _id, b
    ), doc AS (
      SELECT base._id, base._grp,
             COALESCE(SUM(v * (1 - 2 * ((base._p >> b) & 1))), 0) AS dot,
             COALESCE(SUM(v * v), 0) AS nrm
      FROM base LEFT JOIN vb ON base._id = vb._id
      GROUP BY base._id, base._grp
    )
    SELECT _grp AS {group_col},
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN nrm > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_scored,
           CAST(SUM(CASE WHEN {keep} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keep,
           CAST(SUM(dot) AS BIGINT) AS sum_dot,
           bit_xor(CASE WHEN {keep} THEN _id ELSE 0 END) AS id_checksum
    FROM doc GROUP BY _grp
    """
