"""Similarity search over embedding columns (array<float>).

* :func:`knn_bruteforce` — exact cosine top-k: broadcast the query vector,
  score rows with a JVM higher-order-function dot product (zero Python),
  TakeOrderedAndProject for the k.  O(N) scan — the correctness baseline.
* :func:`with_lsh_bucket` / :func:`knn_lsh` — sign-hyperplane LSH bucket as
  a *partition-prunable column*: at 10^12 rows the table is written
  partitioned by bucket and a query touches ~1/2^bits of the data.
* :func:`pairwise_topk_within_buckets` — near-dup pair search restricted to
  LSH buckets: the self-join is on the bucket key, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def cosine_expr(a: str, b: str, decimals: int = 6):
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return F.expr(f"round({dot} / sqrt({na}) / sqrt({nb}), {decimals})")


def knn_bruteforce(
    df: DataFrame, query: DataFrame, k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """query: single-row DataFrame with column `qvec` (the query vector)."""
    return (
        df.crossJoin(F.broadcast(query))
        .select(id_col, cosine_expr(vec_col, "qvec").alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def lsh_bucket_expr(vec_col: str, bits: int = 8):
    """Sign of the first `bits` components → integer bucket id.
    (First-components signs are a valid random-hyperplane family when the
    embedding basis is itself unstructured; swap in a broadcast random
    projection matrix for trained embeddings.)"""
    terms = [
        f"(CASE WHEN CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    ]
    return F.expr("(" + " + ".join(terms) + ")")


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding", bits: int = 8) -> DataFrame:
    return df.withColumn("bucket", lsh_bucket_expr(vec_col, bits))


def knn_lsh(
    df: DataFrame, query: DataFrame, k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding", bits: int = 8,
) -> DataFrame:
    """ANN: restrict the scan to the query's LSH bucket, then exact cosine.
    With the table partitioned by `bucket`, Catalyst prunes partitions."""
    q = query.withColumn("qbucket", lsh_bucket_expr("qvec", bits))
    return (
        with_lsh_bucket(df, vec_col, bits)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(id_col, "bucket", cosine_expr(vec_col, "qvec").alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def pairwise_topk_within_buckets(
    df: DataFrame, k: int = 20, id_col: str = "vec_id",
    vec_col: str = "embedding", bits: int = 8,
) -> DataFrame:
    """Top-k most-similar pairs, candidates restricted to same LSH bucket
    (embedding-cosine near-dup detection; the self-join key is the bucket)."""
    b = with_lsh_bucket(df, vec_col, bits).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "bucket"
    )
    a, c = b.alias("a"), b.alias("c")
    pairs = (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a._id") < F.col("c._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("c._id").alias("id_b"),
            cosine_expr("a._v", "c._v").alias("cos_sim"),
        )
    )
    return pairs.orderBy(F.desc("cos_sim"), F.asc("id_a"), F.asc("id_b")).limit(k)
