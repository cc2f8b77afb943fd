"""Training-shard output: deterministic, reproducible shard layout.

The last stage of a corpus pipeline writes shards that training loaders
address by number ("shard 00042 of 4096").  Two properties matter and
neither comes from a plain ``df.write``:

* **Deterministic membership** — which shard a document lands in must be
  a pure function of the document key, not of the cluster's partitioning
  (speculative retries, AQE coalescing and executor counts all reshape
  default output files).  Shard id = ``h60(seed || key) mod num_shards``
  — the same portable hash family the sampling operators use, so a
  rewrite on any cluster produces byte-comparable shard contents.
* **Deterministic order within a shard** — rows are written sorted by
  (hash, key) inside each shard: a pseudo-random-but-reproducible
  shuffle of the corpus (what training wants).  The ON-DISK order is the
  contract — a loader streaming the shard's files in lexicographic name
  order sees exactly that order.  (A distributed re-READ of a multi-file
  shard may interleave files; order-sensitive consumers are sequential
  loaders, which don't.)

Plan shape: one ``repartition(num_shards, shard)`` shuffle +
``sortWithinPartitions`` (sort is per-shard, never global) + a
``partitionBy(shard)`` parquet write — shard dirs are the unit a loader
requests.  ``maxRecordsPerFile`` optionally splits giant shards into
multiple files without changing membership or order (files sort
lexicographically within the dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import seeded_key_hash

SHARD_COL = "shard"


def shard_id(key_col: str, num_shards: int, seed: int = 0):
    """Deterministic shard id column: h60(seed || key) mod num_shards.
    The hash is :func:`..operators.sampling.seeded_key_hash` — ONE
    derivation shared with every sampler, and NULL keys hash as the
    empty string, so a NULL-key row lands in a real numbered shard
    instead of the invisible __HIVE_DEFAULT_PARTITION__ directory that
    no ``read_shard`` call ever requests (silent loss)."""
    return F.pmod(seeded_key_hash(key_col, seed), F.lit(num_shards)).cast(
        "int"
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    key_col: str,
    seed: int = 0,
    max_records_per_file: int | None = None,
) -> None:
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    h = seeded_key_hash(key_col, seed)
    out = (
        df.withColumn("_sh_h", h)
        .withColumn(
            SHARD_COL, F.pmod(F.col("_sh_h"), F.lit(num_shards)).cast("int")
        )
        .repartition(num_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, "_sh_h", key_col)
        .drop("_sh_h")
    )
    writer = out.write.mode("overwrite").partitionBy(SHARD_COL)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """One shard, partition-pruned at the source (the loader's view)."""
    return spark.read.parquet(path).filter(F.col(SHARD_COL) == shard)
