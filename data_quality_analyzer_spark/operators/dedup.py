"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (10^12 rows):

* **exact** — fingerprint (md5) group-by; one shuffle on the fingerprint,
  AQE handles skew.  Quirk-5 semantics available (duplicate_rows counts
  rows, not groups — ``claim_analysis.py:225-247``).
* **MinHash+LSH** — signatures are computed per-row with higher-order
  functions (no explode, no shuffle); banding turns near-dup search into an
  equi-join on (band, band_signature) — the only shuffle, on a key whose
  cardinality we control via bands×rows-per-band.
* **SimHash** — per-row 60-bit fingerprint (HOF fold), near-dups = equal
  fingerprints (or banded Hamming buckets).
* **n-gram Jaccard** — exact verification for candidate pairs produced by
  LSH: computed only on the (tiny) candidate set, never all-pairs.

All hashing is md5-derived (deterministic, engine-independent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SHINGLE = 5
DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4  # 4 bands x 4 rows -> catches jaccard ≳ 0.7


def _h60(col: Column) -> Column:
    """60-bit hash via md5 (bit-identical across engines)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical texts: (fp, cnt, ids) for cnt > 1."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(F.md5(text_col).alias("fp"))
        .agg(
            F.count("*").alias("cnt"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .filter(F.col("cnt") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per distinct text — the dedup *action*."""
    w_min = (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(F.md5(text_col).alias("fp"))
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w_min, on=id_col, how="left_semi").unionByName(
        df.filter(F.col(text_col).isNull())
    )


def minhash_signature(
    text_col: str, num_hashes: int = DEFAULT_NUM_HASHES, k: int = DEFAULT_SHINGLE
) -> Column:
    """array<long> of minhashes computed entirely per-row.

    One md5 per shingle; per-seed permutations are the overflow-free affine
    mixes of functions/hashing.py (portable to the DuckDB oracle, and
    `num_hashes`× cheaper than hashing per seed)."""
    from ..functions import hashing as HH

    hs = (
        f"transform(transform(sequence(1, greatest(length({text_col}), {k}) - {k - 1}), "
        f"i -> substring({text_col}, i, {k})), x -> {HH.h60_spark_sql('x')})"
    )
    mins = ", ".join(
        f"array_min(transform(hs, h -> {HH.mix_spark_sql('h', seed)}))"
        for seed in range(num_hashes)
    )
    # HOF let-binding: evaluate the shingle-hash array ONCE, bind it as the
    # lambda variable `hs`, then derive all seeds from it.
    return F.expr(f"transform(array({hs}), hs -> array({mins}))[0]")


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """MinHash+LSH near-dup candidates: (id_a, id_b, n_bands_shared).

    Plan: per-row signature (map-only) → explode into `bands` rows →
    group-join on (band, band_fp).  The self-join is on the *bucket*, so
    shuffle volume is rows×bands, never rows².
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(text_col, num_hashes)
    with_sig = df.filter(
        F.col(text_col).isNotNull() & (F.length(text_col) >= DEFAULT_SHINGLE)
    ).select(F.col(id_col).alias("_id"), sig.alias("_sig"))
    band_rows = with_sig.select(
        "_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"named_struct('band', b, 'fp', md5(concat_ws(',', slice(_sig, b * {rows_per_band} + 1, {rows_per_band})))))"
            )
        ).alias("bf"),
    ).select("_id", F.col("bf.band").alias("band"), F.col("bf.fp").alias("fp"))
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.fp") == F.col("b.fp")))
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count("*").alias("n_bands_shared"))
    )


def simhash(text_col: str, bits: int = 60) -> Column:
    """60-bit SimHash over whitespace tokens, folded per-row (no shuffle).
    One md5 per token; bit-votes fold over the pre-hashed array."""
    from ..functions import hashing as HH

    th = (
        f"transform(split(lower(trim({text_col})), '\\\\s+'), "
        f"t -> {HH.h60_spark_sql('t')})"
    )
    return F.expr(
        f"""
        aggregate(
          zip_with(
            aggregate(
              {th},
              transform(sequence(0, {bits - 1}), j -> 0L),
              (acc, hv) -> zip_with(acc,
                transform(sequence(0, {bits - 1}), j ->
                  CASE WHEN (shiftright(hv, j) & 1L) = 1L THEN 1L ELSE -1L END),
                (a, b) -> a + b)
            ),
            sequence(0, {bits - 1}),
            (votes, j) -> CASE WHEN votes > 0 THEN shiftleft(1L, j) ELSE 0L END
          ),
          0L, (s, v) -> s + v
        )
        """
    )


def ngram_jaccard(a_col: str, b_col: str, k: int = DEFAULT_SHINGLE) -> Column:
    """Exact Jaccard of k-shingle sets of two text columns (verification
    stage for LSH candidates — runs on the candidate pairs only)."""

    def sh(c: str) -> str:
        return (
            f"array_distinct(transform(sequence(1, greatest(length({c}), {k}) - {k - 1}), "
            f"i -> substring({c}, i, {k})))"
        )

    inter = f"size(array_intersect({sh(a_col)}, {sh(b_col)}))"
    union = f"size(array_union({sh(a_col)}, {sh(b_col)}))"
    return F.expr(f"CAST({inter} AS DOUBLE) / {union}")


def near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.8,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Full MinHash-LSH → exact-Jaccard verification pipeline.

    Returns (id_a, id_b, jaccard ≥ threshold).  The expensive exact Jaccard
    runs only on LSH candidates (broadcast-join texts back by id).
    """
    cands = lsh_candidate_pairs(df, text_col, id_col, num_hashes, bands)
    texts = df.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_txt"))
    joined = (
        cands.join(texts.withColumnRenamed("_tid", "id_a").withColumnRenamed("_txt", "text_a"), "id_a")
        .join(texts.withColumnRenamed("_tid", "id_b").withColumnRenamed("_txt", "text_b"), "id_b")
    )
    return (
        joined.withColumn("jaccard", ngram_jaccard("text_a", "text_b"))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
