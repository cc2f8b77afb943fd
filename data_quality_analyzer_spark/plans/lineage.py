"""Per-partition lineage + checkpoint/resume with atomic snapshot commits.

Iceberg-style transactional semantics without the Iceberg jar (absent in
this sandbox — SURVEY §7.0): a JSON *manifest* is the commit point; data
files are written first, then the manifest is atomically replaced
(``os.replace``).  A reader only trusts buckets listed in the manifest, so
a killed run leaves no torn state; restart recomputes only pending buckets
(anti-join against the ledger).  Swap this layer for a real Iceberg catalog
when the runtime jar exists — the pipeline code does not change (see
tests/test_resume.py::test_writer_seam_is_swappable).

Reference analogue: the clear-then-reload idempotence pattern
(``scripts/load_data.py:69-77``, ``generate_stats_collection.py:87-108``
delete-and-recreate) upgraded to partition-granular atomic commits
(SURVEY §2.9, §4.3 checkpoint/resume row).

Partitioning follows the north rule: **phash buckets** (`pmod(phash, NB)`),
the same key the 100 TB table would be bucket-partitioned by.

Scale design (the two round-1 scale-killers, now gone):

* **One input scan, one pipeline execution per run** in the default
  single-pass mode: all pending buckets are filtered in one pass, written
  with ``partitionBy("bucket")`` in one job, and only then committed.
  Per-bucket lineage stats are derived from the **just-written parquet**
  (columnar scan of bucket+keep only — no second UDF execution).
* The chunked mode (``chunk_size=k``) trades scans for commit granularity:
  k buckets commit per snapshot, so a crash loses at most one chunk of
  work.  Use it when the *input itself* is bucket-partitioned (then the
  per-chunk ``filter(bucket.isin(chunk))`` prunes at the source and each
  chunk reads only its own partitions, not the full table).  Its stats are
  also read back from the written parquet — the expensive UDF stages run
  exactly once per row in both modes.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineSettings
from ..exec_utils import materialize
from .pipeline import langid_histogram, pipeline_metrics, run_pipeline

# underscore prefix: Spark's parquet reader skips _-prefixed files, so the
# manifest can live inside the table directory.
MANIFEST = "_manifest.json"
# per-partition quality-metric tables (north rule: "per-partition lineage +
# quality-metric tables (pass/fail counts per rule, langid histogram)
# written transactionally"): they live NEXT TO the data table and follow
# the same commit rule — a reader trusts only manifest-committed buckets.
# underscore prefix again: the data-table reader must skip these subtrees
# (mixed partition layouts under one root break partition discovery).
RULE_METRICS_DIR = "_rule_metrics"
LANGID_HIST_DIR = "_langid_histogram"


def phash_bucket(num_buckets: int):
    return F.pmod(F.col("phash"), F.lit(num_buckets)).cast("int")


def read_manifest(out_dir: str) -> dict:
    path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(path):
        return {"run_id": None, "num_buckets": None, "committed": {}}
    with open(path) as f:
        return json.load(f)


def _commit_manifest(out_dir: str, manifest: dict) -> None:
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))  # atomic commit point


def _clear_bucket_dirs(out_dir: str, buckets: list[int]) -> None:
    """Idempotent re-execution: drop torn data AND metric files of
    uncommitted buckets before rewriting them."""
    for base in (out_dir,
                 os.path.join(out_dir, RULE_METRICS_DIR),
                 os.path.join(out_dir, LANGID_HIST_DIR)):
        for b in buckets:
            bucket_dir = os.path.join(base, f"bucket={b}")
            if os.path.exists(bucket_dir):
                shutil.rmtree(bucket_dir)


def _write_bucket_metrics(
    spark: SparkSession, out_dir: str, buckets: list[int]
) -> None:
    """Per-bucket quality-metric tables from the just-written verdict
    parquet (columnar scan of bucket + flags + lang_pred only — the UDF
    stages never re-run): per-rule pass/fail counts and the langid
    keep/drop histogram, partitioned by bucket so each bucket's metric
    rows commit (and are cleaned on re-execution) with its data."""
    try:
        df = spark.read.parquet(out_dir)
    except Exception:  # no data files (all pending buckets empty)
        return
    df = df.filter(F.col("bucket").isin(buckets))
    (
        pipeline_metrics(df, group_cols=["bucket"])
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(os.path.join(out_dir, RULE_METRICS_DIR))
    )
    (
        langid_histogram(df, group_cols=["bucket"])
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(os.path.join(out_dir, LANGID_HIST_DIR))
    )


def _written_bucket_stats(
    spark: SparkSession, out_dir: str, buckets: list[int]
) -> dict[str, dict[str, int]]:
    """Per-bucket lineage stats from the just-written parquet — a columnar
    scan of (bucket, keep) only.  This is what replaced the round-1
    double-compute: the UDF stages never run a second time."""
    try:
        df = spark.read.parquet(out_dir)
    except Exception:  # no data files yet (all pending buckets were empty)
        return {}
    df = df.filter(F.col("bucket").isin(buckets))
    return {
        str(r["bucket"]): {"rows": r["rows"], "n_keep": r["n_keep"]}
        for r in df.groupBy("bucket")
        .agg(
            F.count("*").alias("rows"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
        )
        .collect()
    }


def _write_buckets(verdicts: DataFrame, out_dir: str) -> None:
    # no repartition: every task writes its rows into per-bucket
    # subdirectories in parallel (hash-repartitioning to 1 file per
    # bucket would serialize the write and shuffle the whole chunk)
    verdicts.drop("bytes").write.mode("append").partitionBy("bucket").parquet(
        out_dir
    )


def run_with_checkpoints(
    spark: SparkSession,
    images: DataFrame,
    out_dir: str,
    run_id: str,
    num_buckets: int = 16,
    chunk_size: int | None = None,
    fail_after_chunks: int | None = None,
    commit_ts: str = "1970-01-01T00:00:00Z",
    settings: PipelineSettings | None = None,
) -> dict:
    """Run the filter+scrub pipeline with atomic per-bucket commits.

    ``chunk_size=None`` (default): single-pass mode — ONE input scan, ONE
    pipeline execution, one partitioned write, then every pending bucket
    commits from that write.  ``chunk_size=k``: chunked mode — k buckets
    per snapshot commit; requires bucket-partitioned input to avoid
    re-scanning (see module docstring).

    ``fail_after_chunks`` injects a crash for the resume test.
    Returns the final manifest.  Idempotent: re-invoking after a crash
    recomputes only pending buckets and converges to the same output.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = read_manifest(out_dir)
    if manifest["run_id"] not in (None, run_id):
        raise ValueError(f"out_dir holds run {manifest['run_id']!r}")
    # a resumed run MUST use the original bucket modulus: buckets committed
    # under a different num_buckets cover different row sets, so mixing
    # moduli would silently duplicate or drop rows.
    if manifest["num_buckets"] not in (None, num_buckets):
        raise ValueError(
            f"out_dir was bucketed with num_buckets={manifest['num_buckets']}, "
            f"got {num_buckets}; resume with the original value"
        )
    manifest["run_id"] = run_id
    manifest["num_buckets"] = num_buckets

    pending = [
        b for b in range(num_buckets) if str(b) not in manifest["committed"]
    ]
    if not pending:
        _commit_manifest(out_dir, manifest)
        return manifest
    bucketed = images.withColumn("bucket", phash_bucket(num_buckets))

    if chunk_size is None:
        chunks = [pending]  # single pass: one scan, one pipeline execution
    else:
        chunks = [
            pending[i : i + chunk_size]
            for i in range(0, len(pending), chunk_size)
        ]

    for ci, chunk in enumerate(chunks):
        if fail_after_chunks is not None and ci >= fail_after_chunks:
            raise RuntimeError("injected failure (resume test)")
        part = (
            bucketed.filter(F.col("bucket").isNotNull())
            if len(chunk) == num_buckets
            else bucketed.filter(F.col("bucket").isin(chunk))
        )
        verdicts = run_pipeline(spark, part, settings=settings)
        _clear_bucket_dirs(out_dir, chunk)
        _write_buckets(verdicts, out_dir)
        # per-bucket quality-metric tables + lineage rows, all derived from
        # the completed write (cheap columnar re-reads, no UDFs), then the
        # atomic manifest commit that makes data AND metrics visible
        _write_bucket_metrics(spark, out_dir, chunk)
        stats = _written_bucket_stats(spark, out_dir, chunk)
        for b in chunk:
            s = stats.get(str(b), {"rows": 0, "n_keep": 0})
            manifest["committed"][str(b)] = {
                "rows": int(s["rows"]),
                "n_keep": int(s["n_keep"]),
                "status": "committed",
                "committed_ts": commit_ts,
            }
        _commit_manifest(out_dir, manifest)
    return manifest


# ---------------------------------------------------------------------------
# Incremental cross-run dedup: a committed fingerprint store next to the
# verdict table.  Without it every run dedups only within itself — the first
# thing a user hits when a 100 TB corpus arrives in increments (round-2
# VERDICT, missing #3).
# ---------------------------------------------------------------------------

FINGERPRINT_DIR = "_fingerprints"
FP_MANIFEST = "_fp_manifest.json"


def read_fp_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, FP_MANIFEST)
    if not os.path.exists(path):
        return {"batches": []}
    with open(path) as f:
        return json.load(f)


def read_committed_fingerprints(
    spark: SparkSession, store_dir: str
) -> DataFrame | None:
    """Fingerprints of every COMMITTED batch (manifest rule: torn writes
    are invisible).  None when the store is empty."""
    manifest = read_fp_manifest(store_dir)
    if not manifest["batches"]:
        return None
    df = spark.read.parquet(os.path.join(store_dir, FINGERPRINT_DIR))
    return df.filter(F.col("batch_id").isin(manifest["batches"]))


def dedup_incremental(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    batch_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-run exact dedup with a persistent fingerprint ledger.

    1. anti-join the new batch's content fingerprints against every
       committed batch's fingerprints (the ledger side is (fp, batch_id)
       only — a few bytes per historic row, shuffled by fp; at 10^12 rows
       the store is bucketed by fp so this is a co-located join);
    2. dedup within the surviving batch (keep min id per fp);
    3. write the SURVIVORS' fingerprints partitioned by batch_id, then
       atomically commit the batch to the ledger manifest.

    Idempotent: re-ingesting an already-committed batch anti-joins against
    its own committed fingerprints and keeps NOTHING; a crash between the
    parquet write and the manifest commit leaves the batch uncommitted and
    the rewrite cleans its directory first (same rule as the verdict
    table).  Returns the kept rows."""
    manifest = read_fp_manifest(store_dir)
    if batch_id in manifest["batches"]:
        # replay of a committed batch: nothing new by definition
        return docs.filter(F.lit(False))
    os.makedirs(store_dir, exist_ok=True)
    fresh = docs.filter(F.col(text_col).isNotNull()).withColumn(
        "_fp", F.md5(text_col)
    )
    seen = read_committed_fingerprints(spark, store_dir)
    if seen is not None:
        fresh = fresh.join(
            seen.select(F.col("fp").alias("_fp")), on="_fp", how="left_anti"
        )
    # within-batch keep-one (min id per fingerprint): same recast as
    # dedup_exact — a hash aggregate then a semi join, no window sort
    keep_ids = fresh.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    kept = fresh.join(keep_ids, on=[id_col, "_fp"], how="left_semi")

    batch_dir = os.path.join(store_dir, FINGERPRINT_DIR, f"batch_id={batch_id}")
    if os.path.exists(batch_dir):  # torn previous attempt: clean re-write
        shutil.rmtree(batch_dir)
    kept.select("_fp").distinct().select(
        F.col("_fp").alias("fp")
    ).write.parquet(batch_dir)
    kept_rows = kept.drop("_fp")
    # ledger commit point (atomic manifest replace, same rule as data)
    manifest["batches"] = sorted(manifest["batches"] + [batch_id])
    tmp = os.path.join(store_dir, FP_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, FP_MANIFEST))
    return kept_rows


NEAR_SIG_DIR = "_near_sigs"
NEAR_MANIFEST = "_near_manifest.json"


def read_near_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, NEAR_MANIFEST)
    if not os.path.exists(path):
        return {"batches": []}
    with open(path) as f:
        return json.load(f)


def read_committed_signatures(
    spark: SparkSession, store_dir: str
) -> DataFrame | None:
    """(sid, sig) of every COMMITTED batch; None when the store is empty.
    Torn writes are invisible (manifest rule, same as the exact ledger)."""
    manifest = read_near_manifest(store_dir)
    if not manifest["batches"]:
        return None
    df = spark.read.parquet(os.path.join(store_dir, NEAR_SIG_DIR))
    return df.filter(F.col("batch_id").isin(manifest["batches"]))


def dedup_incremental_near(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    batch_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
    max_band_size: int | None = None,
) -> DataFrame:
    """Cross-run NEAR-dup dedup with a persistent minhash-SIGNATURE ledger
    (the near-dup sibling of :func:`dedup_incremental` — an incremental
    corpus must drop new documents that are near-copies of *previously
    committed* content, not just byte-identical ones).

    The ledger stores only (sid, sig): the signature array, never text —
    num_hashes×8 bytes per committed doc, proportional to the corpus and
    partitioned by batch.  A new batch:

    1. band-joins its LSH band fingerprints against the committed
       signatures' bands (identical band derivation on both sides —
       ``dedup.band_fp_explode``) → candidate (new doc, archived sig)
       pairs, shuffle = rows×bands, never rows×archive;
    2. verifies candidates with the UNBIASED minhash Jaccard estimate
       (fraction of agreeing signature components — the text is gone, so
       the exact-Jaccard verify of the within-batch path is impossible by
       design; the estimator's std is ≈ sqrt(J(1-J)/num_hashes), so size
       num_hashes to the tolerance you need) and drops new docs at or
       above the threshold;
    3. near-dedups WITHIN the surviving batch via :func:`dedup.dedup_near`
       (exact-Jaccard verify — the texts are present here);
    4. writes the survivors' distinct signatures partitioned by batch_id,
       then atomically commits the batch to the near manifest.

    Rows that cannot be fingerprinted (null / shorter than one shingle)
    pass through untouched, mirroring ``dedup_near``.  Idempotent replay
    and torn-write cleanup follow the exact ledger's rules.  At 10^12 rows
    a production deployment materializes the archive's band index as a
    table partitioned by (band, fp-prefix) instead of deriving it per run.

    **Hot-band cap is ON by default here** (``max_band_size=None`` →
    ``dedup.LEDGER_MAX_BAND_SIZE``): ledger joins run unattended across
    crawls, exactly where a degenerate band bucket accretes.  The census
    spans new batch + archive (a bucket small in the batch but huge in
    the archive still joins quadratically); oversized buckets are
    excluded LOUDLY (``dedup.exclude_hot_band_buckets``).  Pass
    ``max_band_size=0`` to disable (restores the unconditional pigeonhole
    recall guarantee)."""
    from ..operators import dedup as DD

    manifest = read_near_manifest(store_dir)
    if batch_id in manifest["batches"]:
        return docs.filter(F.lit(False))
    os.makedirs(store_dir, exist_ok=True)
    rows_per_band = num_hashes // bands
    eligible = docs.filter(
        F.col(text_col).isNotNull() & (F.length(text_col) >= k)
    )
    passthrough = docs.filter(
        F.col(text_col).isNull() | (F.length(text_col) < k)
    )
    sig_udf = DD.minhash_signature_poly_udf(num_hashes, k)
    # (id, sig) feeds the band join, the estimate join and the ledger
    # write — materialize once (same both-sides rule as lsh_candidate_pairs)
    sigs = (
        eligible.select(
            F.col(id_col).alias("_id"), sig_udf(F.col(text_col)).alias("_sig")
        )
        .transform(materialize)
    )
    archive = read_committed_signatures(spark, store_dir)
    drop_ids = None
    if archive is not None:
        if max_band_size is None:
            max_band_size = DD.LEDGER_MAX_BAND_SIZE
        new_bands = sigs.select(
            "_id", DD.band_fp_explode("_sig", bands, rows_per_band).alias("bf")
        ).select("_id", "bf.band", "bf.fp")
        old_bands = archive.select(
            "sid", DD.band_fp_explode("sig", bands, rows_per_band).alias("bf")
        ).select("sid", "bf.band", "bf.fp")
        if max_band_size:
            new_bands = DD.exclude_hot_band_buckets(
                new_bands, ["band", "fp"], max_band_size,
                what="dedup_incremental_near", extra_rows=old_bands,
            )
        cand = (
            new_bands.join(old_bands, ["band", "fp"])
            .select("_id", "sid")
            .distinct()
        )
        est = (
            cand.join(sigs, "_id")
            .join(archive.select("sid", "sig"), "sid")
            .withColumn(
                "_est_j",
                F.expr(
                    "aggregate(zip_with(_sig, sig, (a, b) -> "
                    "CASE WHEN a = b THEN 1 ELSE 0 END), 0, "
                    "(acc, x) -> acc + x)"
                )
                / F.lit(num_hashes),
            )
        )
        drop_ids = (
            est.filter(F.col("_est_j") >= jaccard_threshold)
            .select(F.col("_id").alias(id_col))
            .distinct()
        )
    survivors = eligible
    if drop_ids is not None:
        survivors = survivors.join(drop_ids, on=id_col, how="left_anti")
    survivors = DD.dedup_near(
        survivors, text_col, id_col, jaccard_threshold,
        num_hashes=num_hashes, bands=bands, k=k,
    )
    kept_sigs = (
        survivors.select(id_col)
        .join(sigs, F.col(id_col) == F.col("_id"))
        .select(
            F.md5(F.concat_ws(",", F.col("_sig"))).alias("sid"),
            F.col("_sig").alias("sig"),
        )
        .dropDuplicates(["sid"])
    )
    batch_dir = os.path.join(store_dir, NEAR_SIG_DIR, f"batch_id={batch_id}")
    if os.path.exists(batch_dir):  # torn previous attempt: clean re-write
        shutil.rmtree(batch_dir)
    kept_sigs.write.parquet(batch_dir)
    manifest["batches"] = sorted(manifest["batches"] + [batch_id])
    tmp = os.path.join(store_dir, NEAR_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, NEAR_MANIFEST))
    return survivors.unionByName(passthrough)


IMG_FP_DIR = "_image_fps"
IMG_MANIFEST = "_image_fp_manifest.json"


def read_img_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, IMG_MANIFEST)
    if not os.path.exists(path):
        return {"batches": []}
    with open(path) as f:
        return json.load(f)


def read_committed_phashes(
    spark: SparkSession, store_dir: str
) -> DataFrame | None:
    """(phash, batch_id) of every COMMITTED batch; None when empty."""
    manifest = read_img_manifest(store_dir)
    if not manifest["batches"]:
        return None
    df = spark.read.parquet(os.path.join(store_dir, IMG_FP_DIR))
    return df.filter(F.col("batch_id").isin(manifest["batches"]))


def dedup_incremental_image(
    spark: SparkSession,
    images: DataFrame,
    store_dir: str,
    batch_id: str,
    id_col: str = "image_id",
    fp_col: str = "phash",
    bands: int = 4,
    max_hamming: int = 3,
    bits: int = 64,
    max_band_size: int | None = None,
) -> DataFrame:
    """Cross-run IMAGE near-dup dedup with a persistent phash ledger — the
    image-payload sibling of :func:`dedup_incremental_near`.  The ledger
    stores only the committed survivors' distinct perceptual fingerprints
    (8 bytes per distinct image): a new batch

    1. collapses its own identical fingerprints (groupBy — the hot-crawl
       guard of ``dedup.image_near_duplicates``),
    2. band-joins its distinct fingerprints against the archive's on
       (band, band_bits) — identical banding on both sides via
       ``dedup.int_band_explode`` — and drops every fingerprint group
       within ``max_hamming`` (popcount verify) of committed content,
    3. near-dedups WITHIN the surviving batch (``dedup.dedup_image_near``),
    4. commits the survivors' fingerprints atomically (manifest rule;
       idempotent replay, torn writes cleaned).

    Pass rows pre-filtered to valid images (decodable, the pipeline's keep
    set) — fingerprints of undecodable rows are not meaningful.

    Hot-band cap ON by default (census = new ∪ archive, loud exclusion;
    ``max_band_size=0`` disables) — same rationale as
    :func:`dedup_incremental_near`.
    """
    from ..operators import dedup as DD

    manifest = read_img_manifest(store_dir)
    if batch_id in manifest["batches"]:
        return images.filter(F.lit(False))
    os.makedirs(store_dir, exist_ok=True)
    band_bits = bits // bands
    survivors = images
    archive = read_committed_phashes(spark, store_dir)
    if archive is not None:
        if max_band_size is None:
            max_band_size = DD.LEDGER_MAX_BAND_SIZE
        new_fps = images.select(F.col(fp_col).alias("_fp")).distinct()
        new_bands = new_fps.select(
            "_fp", DD.int_band_explode("_fp", bands, band_bits).alias("bf")
        ).select("_fp", "bf.band", "bf.bb")
        old_bands = archive.select(F.col(fp_col).alias("_ofp")).distinct().select(
            "_ofp", DD.int_band_explode("_ofp", bands, band_bits).alias("bf")
        ).select("_ofp", "bf.band", "bf.bb")
        if max_band_size:
            new_bands = DD.exclude_hot_band_buckets(
                new_bands, ["band", "bb"], max_band_size,
                what="dedup_incremental_image", extra_rows=old_bands,
            )
        hit = (
            new_bands.join(old_bands, ["band", "bb"])
            .filter(
                F.bit_count(F.col("_fp").bitwiseXOR(F.col("_ofp")))
                <= max_hamming
            )
            .select(F.col("_fp").alias(fp_col))
            .distinct()
        )
        survivors = images.join(hit, on=fp_col, how="left_anti")
    survivors = DD.dedup_image_near(
        survivors, id_col=id_col, fp_col=fp_col, bands=bands,
        max_hamming=max_hamming,
    )
    batch_dir = os.path.join(store_dir, IMG_FP_DIR, f"batch_id={batch_id}")
    if os.path.exists(batch_dir):  # torn previous attempt: clean re-write
        shutil.rmtree(batch_dir)
    survivors.select(fp_col).distinct().write.parquet(batch_dir)
    manifest["batches"] = sorted(manifest["batches"] + [batch_id])
    tmp = os.path.join(store_dir, IMG_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, IMG_MANIFEST))
    return survivors


def read_committed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read back only manifest-committed buckets (snapshot isolation)."""
    manifest = read_manifest(out_dir)
    committed = sorted(int(b) for b in manifest["committed"])
    df = spark.read.parquet(out_dir)
    return df.filter(F.col("bucket").isin(committed))


def read_committed_metrics(
    spark: SparkSession, out_dir: str, which: str = RULE_METRICS_DIR
) -> DataFrame:
    """Committed per-bucket quality-metric rows (same snapshot rule as the
    data: only manifest-listed buckets are trusted)."""
    manifest = read_manifest(out_dir)
    committed = sorted(int(b) for b in manifest["committed"])
    df = spark.read.parquet(os.path.join(out_dir, which))
    return df.filter(F.col("bucket").isin(committed))


# ---------------------------------------------------------------------------
# Incremental cross-run EMBEDDING near-dup dedup — fourth committed ledger.
# ---------------------------------------------------------------------------

EMB_DIR = "_embedding_ledger"
EMB_MANIFEST = "_embedding_manifest.json"


def read_emb_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, EMB_MANIFEST)
    if not os.path.exists(path):
        return {"batches": []}
    with open(path) as f:
        return json.load(f)


def read_committed_embeddings(
    spark: SparkSession, store_dir: str
) -> DataFrame | None:
    """(embedding, efp, batch_id) of every COMMITTED batch; None if empty."""
    manifest = read_emb_manifest(store_dir)
    if not manifest["batches"]:
        return None
    df = spark.read.parquet(os.path.join(store_dir, EMB_DIR))
    return df.filter(F.col("batch_id").isin(manifest["batches"]))


def dedup_incremental_embedding(
    spark: SparkSession,
    df: DataFrame,
    store_dir: str,
    batch_id: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    dim: int = 64,
    bands: int = 4,
    max_hamming: int = 2,
    min_cos: float = 0.995,
    max_band_size: int | None = None,
) -> DataFrame:
    """Cross-run EMBEDDING near-dup dedup with a persistent ledger — the
    embedding-payload sibling of :func:`dedup_incremental_image`.

    Unlike the phash ledger (8 B/row, Hamming IS the decision), the
    fingerprint here is only the CANDIDATE filter — the decision is exact
    cosine — so the ledger stores the committed survivors' distinct
    (embedding, fingerprint) pairs (dim×4 B + 8 B per distinct vector: at
    10^12 rows with ~10^9 distinct survivors and d=64 that is ~260 GB,
    partitioned by fingerprint so the candidate join co-locates).  A new
    batch:

    1. band-joins its distinct fingerprints against the archive's
       (identical banding both sides via ``dedup.int_band_explode``),
       popcount-verifies Hamming ≤ ``max_hamming``, then exact-cosine
       verifies against the ARCHIVED VECTOR — rows near-dup with committed
       content are dropped;
    2. near-dedups WITHIN the surviving batch
       (``similarity.dedup_embedding_near``);
    3. commits the survivors' (embedding, fingerprint) atomically under
       the manifest rule (idempotent replay, torn batches invisible).
    """
    from ..operators import dedup as DD
    from ..operators import similarity as SIM

    manifest = read_emb_manifest(store_dir)
    if batch_id in manifest["batches"]:
        return df.filter(F.lit(False))
    os.makedirs(store_dir, exist_ok=True)
    band_bits = bits // bands
    fp_expr = F.expr(SIM.rp_bucket_spark_sql(vec_col, bits, dim))
    survivors = df
    archive = read_committed_embeddings(spark, store_dir)
    if archive is not None:
        if max_band_size is None:
            max_band_size = DD.LEDGER_MAX_BAND_SIZE
        new_rows = (
            df.select(id_col, vec_col)
            .withColumn("_efp", fp_expr)
            .transform(materialize)
        )
        new_bands = new_rows.select(
            id_col,
            F.col(vec_col).alias("_v"),
            "_efp",
            DD.int_band_explode("_efp", bands, band_bits).alias("bf"),
        ).select(id_col, "_v", "_efp", "bf.band", "bf.bb")
        old_bands = archive.select(
            F.col(vec_col).alias("_ov"),
            "efp",
            DD.int_band_explode("efp", bands, band_bits).alias("bf"),
        ).select("_ov", "efp", "bf.band", "bf.bb")
        if max_band_size:
            new_bands = DD.exclude_hot_band_buckets(
                new_bands, ["band", "bb"], max_band_size,
                what="dedup_incremental_embedding", extra_rows=old_bands,
            )
        hit = (
            new_bands.join(old_bands, ["band", "bb"])
            .filter(
                F.bit_count(F.col("_efp").bitwiseXOR(F.col("efp")))
                <= max_hamming
            )
            .filter(SIM.cosine_expr("_v", "_ov") >= min_cos)
            .select(id_col)
            .distinct()
        )
        survivors = df.join(hit, on=id_col, how="left_anti")
    survivors = SIM.dedup_embedding_near(
        survivors,
        id_col=id_col,
        vec_col=vec_col,
        bits=bits,
        dim=dim,
        bands=bands,
        max_hamming=max_hamming,
        min_cos=min_cos,
    )
    batch_dir = os.path.join(store_dir, EMB_DIR, f"batch_id={batch_id}")
    if os.path.exists(batch_dir):  # torn previous attempt: clean re-write
        shutil.rmtree(batch_dir)
    survivors.select(F.col(vec_col), fp_expr.alias("efp")).distinct().write.parquet(
        batch_dir
    )
    manifest["batches"] = sorted(manifest["batches"] + [batch_id])
    tmp = os.path.join(store_dir, EMB_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, EMB_MANIFEST))
    return survivors


# ---------------------------------------------------------------------------
# Contamination ledger: committed eval/benchmark n-gram fingerprints.
# ---------------------------------------------------------------------------

CONTAM_DIR = "_contam_grams"
CONTAM_MANIFEST = "_contam_manifest.json"


def read_contam_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, CONTAM_MANIFEST)
    if not os.path.exists(path):
        return {"batches": [], "n": None}
    with open(path) as f:
        return json.load(f)


def commit_contamination(
    spark: SparkSession,
    eval_docs: DataFrame,
    store_dir: str,
    batch_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> None:
    """Commit an eval/benchmark corpus's word-n-gram fingerprints as a
    FIXED contamination ledger batch (atomic-manifest rule, idempotent
    replay, torn writes cleaned — same contract as the dedup ledgers).

    Stores only ``(eval_id, gram)`` hashed grams — never eval text, so the
    ledger can ship next to a training corpus without leaking benchmark
    content.  All batches must use one gram size ``n``; a mismatch raises
    (mixed gram sizes would silently under-count containment).
    """
    from ..operators import decontam as DC

    manifest = read_contam_manifest(store_dir)
    # gram-size check FIRST: a replayed batch_id with a DIFFERENT n must
    # raise, not silently no-op (the caller would believe an n-gram
    # ledger exists that does not)
    if manifest["n"] is not None and manifest["n"] != n:
        raise ValueError(
            f"contamination ledger at {store_dir!r} was built with n="
            f"{manifest['n']}, refusing to commit a batch with n={n}"
        )
    if batch_id in manifest["batches"]:
        return
    os.makedirs(store_dir, exist_ok=True)
    batch_dir = os.path.join(store_dir, CONTAM_DIR, f"batch_id={batch_id}")
    if os.path.exists(batch_dir):  # torn previous attempt: clean re-write
        shutil.rmtree(batch_dir)
    DC.eval_gram_table(eval_docs, text_col, id_col, n).write.parquet(
        batch_dir
    )
    manifest["batches"] = sorted(manifest["batches"] + [batch_id])
    manifest["n"] = n
    tmp = os.path.join(store_dir, CONTAM_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, CONTAM_MANIFEST))


def read_contamination(
    spark: SparkSession, store_dir: str
) -> tuple[DataFrame, int] | None:
    """((eval_id, gram) relation of every COMMITTED batch, gram size n);
    None when the ledger is empty.  Torn writes are invisible."""
    manifest = read_contam_manifest(store_dir)
    if not manifest["batches"]:
        return None
    df = spark.read.parquet(os.path.join(store_dir, CONTAM_DIR))
    grams = df.filter(
        F.col("batch_id").isin(manifest["batches"])
    ).select("eval_id", "gram")
    return grams, manifest["n"]


def decontaminate_committed(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Drop documents contaminated against the COMMITTED eval ledger at
    ``store_dir`` (gram size comes from the ledger manifest so the doc
    side always matches the committed derivation).  An empty ledger is a
    no-op — the corpus passes through unchanged."""
    from ..operators import decontam as DC

    loaded = read_contamination(spark, store_dir)
    if loaded is None:
        return docs
    grams, n = loaded
    return DC.decontaminate(
        docs, grams, text_col=text_col, id_col=id_col, n=n,
        threshold=threshold,
    )


# ---------------------------------------------------------------------------
# Line-fingerprint ledger: cross-run C4-style boilerplate removal.
# ---------------------------------------------------------------------------

LINE_FP_DIR = "_line_fps"
LINE_MANIFEST = "_line_fp_manifest.json"


def read_line_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, LINE_MANIFEST)
    if not os.path.exists(path):
        return {"batches": []}
    with open(path) as f:
        return json.load(f)


def read_committed_line_fps(
    spark: SparkSession, store_dir: str
) -> DataFrame | None:
    """(fp) of every COMMITTED batch's kept lines; None when empty."""
    manifest = read_line_manifest(store_dir)
    if not manifest["batches"]:
        return None
    df = spark.read.parquet(os.path.join(store_dir, LINE_FP_DIR))
    return df.filter(F.col("batch_id").isin(manifest["batches"])).select("fp")


def prepare_incremental_lines(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    batch_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    drop_blank_docs: bool = True,
) -> DataFrame:
    """PREPARE half of the cross-run line-level dedup: runs the dedup
    against the committed archive and writes this batch's surviving line
    fingerprints to the ledger's data directory — but does NOT commit the
    manifest.  Call :func:`finalize_incremental_lines` once the batch's
    downstream outputs (shards, verdict tables) are durable.

    Why the split (round-4 ADVICE): committing the ledger before the
    corpus output exists means a crash in between loses the batch — a
    retry with the same batch_id is refused (idempotence contract) and a
    retry with a new batch_id drops every line as 'already seen'.  With
    prepare/finalize, a crash before finalize leaves the batch
    UNCOMMITTED: the torn fingerprint parquet is invisible (manifest
    rule) and a clean retry re-prepares from scratch.

    Idempotent replay of a COMMITTED batch still returns the empty
    relation here."""
    from ..operators import dedup as DD

    manifest = read_line_manifest(store_dir)
    if batch_id in manifest["batches"]:
        return docs.filter(F.lit(False))
    os.makedirs(store_dir, exist_ok=True)
    archive = read_committed_line_fps(spark, store_dir)
    survivors = DD.dedup_lines(
        docs,
        text_col=text_col,
        id_col=id_col,
        drop_blank_docs=drop_blank_docs,
        archived_fps=archive,
    ).transform(materialize)
    kept_fps = (
        survivors.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(F.split(F.col(text_col), "\n")).alias("_line")
        )
        .filter(F.trim("_line") != "")
        .select(F.xxhash64("_line").alias("fp"))
        .distinct()
    )
    batch_dir = os.path.join(store_dir, LINE_FP_DIR, f"batch_id={batch_id}")
    if os.path.exists(batch_dir):  # torn previous attempt: clean re-write
        shutil.rmtree(batch_dir)
    kept_fps.write.parquet(batch_dir)
    return survivors


def finalize_incremental_lines(store_dir: str, batch_id: str) -> None:
    """FINALIZE half: atomically commit ``batch_id`` to the line-ledger
    manifest.  Refuses if the prepare phase's parquet is absent (nothing
    to commit); replaying an already-committed batch is a no-op."""
    manifest = read_line_manifest(store_dir)
    if batch_id in manifest["batches"]:
        return
    batch_dir = os.path.join(store_dir, LINE_FP_DIR, f"batch_id={batch_id}")
    if not os.path.exists(batch_dir):
        raise ValueError(
            f"finalize_incremental_lines: no prepared fingerprints at "
            f"{batch_dir!r} — run prepare_incremental_lines first"
        )
    manifest["batches"] = sorted(manifest["batches"] + [batch_id])
    tmp = os.path.join(store_dir, LINE_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, LINE_MANIFEST))


def dedup_incremental_lines(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    batch_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    drop_blank_docs: bool = True,
) -> DataFrame:
    """Cross-run LINE-level dedup with a persistent line-fingerprint
    ledger — the C4-boilerplate sibling of the document/image/embedding
    ledgers.  Boilerplate (navigation text, cookie banners) recurs across
    CRAWLS, not just within one: a line whose fingerprint any committed
    batch already kept is dropped OUTRIGHT from the new batch (its first
    occurrence happened in a previous run); the remaining lines then go
    through the within-batch first-occurrence dedup and documents are
    reassembled (``dedup.dedup_lines(archived_fps=...)``).

    The ledger stores 8 bytes per distinct kept line (xxhash64), never
    text, partitioned by batch under the atomic-manifest rule: idempotent
    replay, torn writes invisible.  Scale shape: the archive join is an
    equi-join on the line fingerprint (shuffle = new batch's distinct
    lines), and the commit writes only the SURVIVING lines' distinct
    fingerprints — the archive grows with unique content, not crawls.

    This convenience form commits IMMEDIATELY (prepare + finalize in one
    call) — correct when the survivors relation itself is the output.
    When downstream durable outputs follow (shard writes), use
    :func:`prepare_incremental_lines` + :func:`finalize_incremental_lines`
    around them instead (``prep_text_corpus`` does)."""
    survivors = prepare_incremental_lines(
        spark, docs, store_dir, batch_id,
        text_col=text_col, id_col=id_col, drop_blank_docs=drop_blank_docs,
    )
    finalize_incremental_lines(store_dir, batch_id)  # no-op on replay
    return survivors


# ---------------------------------------------------------------------------
# Cross-run KMV sketch ledger: distinct-cardinality tracking across crawls
# WITHOUT rescanning history.  The mergeability of bottom-k sketches
# (operators/sketches.py) is exactly what a ledger needs: each crawl
# commits only its per-group bottom-k hash sets (k · |groups| rows — KB,
# not corpus-sized), and the union's estimate is recomputed from the
# merged bottom-k sets alone.  Same atomic-manifest commit rule as every
# other ledger here; k is pinned in the manifest (sketches of different
# k do not merge at full precision — refuse loudly rather than silently
# degrade).
# ---------------------------------------------------------------------------

KMV_MANIFEST = "_kmv_manifest.json"
KMV_DIR = "kmv_sketches"


def read_kmv_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, KMV_MANIFEST)
    if not os.path.exists(path):
        return {"batches": [], "k": None, "group_cols": None}
    with open(path) as f:
        return json.load(f)


def commit_kmv_sketch(
    spark: SparkSession,
    df: DataFrame,
    store_dir: str,
    batch_id: str,
    value_col: str,
    group_cols: list[str],
    k: int = 256,
) -> None:
    """Commit one crawl's per-group bottom-k hash sketch to the ledger.
    Replaying a committed ``batch_id`` is a no-op (set union with itself
    — the sketch algebra makes replay naturally idempotent); committing
    with a different ``k`` or group columns than the ledger was created
    with raises."""
    from ..operators import sketches as SK
    from ..functions import hashing as HH
    from pyspark.sql import Window

    manifest = read_kmv_manifest(store_dir)
    if manifest["k"] is not None and (
        manifest["k"] != k or manifest["group_cols"] != group_cols
    ):
        raise ValueError(
            f"ledger at {store_dir!r} is pinned to k={manifest['k']} "
            f"group_cols={manifest['group_cols']}; got k={k} "
            f"group_cols={group_cols}"
        )
    if batch_id in manifest["batches"]:
        return  # sketch union is idempotent; nothing to add
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    os.makedirs(store_dir, exist_ok=True)
    h = F.expr(HH.h60_spark_sql(f"CAST({value_col} AS STRING)"))
    distinct = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    bottom = distinct.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    ).drop("_rn")
    batch_dir = os.path.join(store_dir, KMV_DIR, f"batch_id={batch_id}")
    if os.path.exists(batch_dir):  # torn previous attempt
        shutil.rmtree(batch_dir)
    bottom.write.parquet(batch_dir)
    manifest["batches"] = sorted(manifest["batches"] + [batch_id])
    manifest["k"] = k
    manifest["group_cols"] = list(group_cols)
    tmp = os.path.join(store_dir, KMV_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, KMV_MANIFEST))


def kmv_ledger_estimate(spark: SparkSession, store_dir: str) -> DataFrame:
    """Per-group distinct-cardinality estimate over the UNION of every
    committed crawl — computed from the merged bottom-k sketches alone
    (k · |groups| · |batches| rows read; the corpora themselves are
    never rescanned).  Groups whose merged sketch holds fewer than k
    hashes report the exact union count."""
    from ..operators import sketches as SK
    from pyspark.sql import Window

    manifest = read_kmv_manifest(store_dir)
    if not manifest["batches"]:
        raise ValueError(f"no committed sketches at {store_dir!r}")
    k, group_cols = manifest["k"], manifest["group_cols"]
    rel = (
        spark.read.parquet(os.path.join(store_dir, KMV_DIR))
        .filter(F.col("batch_id").isin(manifest["batches"]))
        .select(*group_cols, "h")
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    sk = (
        rel.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.count("*").alias("_cnt"), F.max("h").alias("_hk"))
    )
    est = F.when(
        F.col("_cnt") < k, F.col("_cnt").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(SK.H_SPACE)) / F.col("_hk")
    )
    return sk.select(
        *group_cols, F.round(est, 2).alias("est_distinct")
    )


# ---------------------------------------------------------------------------
# Cross-run COUNT-MIN frequency ledger (the 7th ledger): per-crawl CMS
# cell tables committed under the same atomic-manifest rule; the merged
# corpus-union sketch is the CELL-WISE SUM of committed sketches, so
# token-frequency estimates over every crawl ever seen cost depth·width
# rows per crawl — history is never rescanned.  Unlike the KMV ledger
# (set union — naturally idempotent), CMS merge is ADDITIVE: replaying a
# committed batch would double its counts, so the manifest guard is the
# correctness mechanism here, not just bookkeeping.
# ---------------------------------------------------------------------------

CMS_MANIFEST = "_cms_manifest.json"
CMS_DIR = "cms_sketches"


def read_cms_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, CMS_MANIFEST)
    if not os.path.exists(path):
        return {"batches": [], "segments": [], "depth": None, "width": None}
    with open(path) as f:
        m = json.load(f)
    m.setdefault("segments", list(m["batches"]))  # pre-compaction manifest
    return m


def commit_cms_sketch(
    spark: SparkSession,
    df: DataFrame,
    store_dir: str,
    batch_id: str,
    value_col: str,
    depth: int | None = None,
    width: int | None = None,
) -> None:
    """Commit one crawl's count-min cells.  Replaying a committed
    ``batch_id`` is a guarded no-op (additive merge — see module note);
    committing with different depth/width than the ledger pin raises
    (cells from different geometries cannot be summed)."""
    from ..operators import sketches as SK

    depth = SK.CMS_DEPTH if depth is None else depth
    width = SK.CMS_WIDTH if width is None else width
    manifest = read_cms_manifest(store_dir)
    if manifest["depth"] is not None and (
        manifest["depth"] != depth or manifest["width"] != width
    ):
        raise ValueError(
            f"ledger at {store_dir!r} is pinned to depth="
            f"{manifest['depth']} width={manifest['width']}; got "
            f"depth={depth} width={width}"
        )
    if batch_id in manifest["batches"]:
        return
    os.makedirs(store_dir, exist_ok=True)
    cells = SK.count_min_sketch(df, value_col, depth=depth, width=width)
    batch_dir = os.path.join(store_dir, CMS_DIR, f"batch_id={batch_id}")
    if os.path.exists(batch_dir):  # torn previous attempt
        shutil.rmtree(batch_dir)
    cells.write.parquet(batch_dir)
    manifest["batches"] = sorted(manifest["batches"] + [batch_id])
    manifest["segments"] = sorted(manifest["segments"] + [batch_id])
    manifest["depth"], manifest["width"] = depth, width
    tmp = os.path.join(store_dir, CMS_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, CMS_MANIFEST))


def cms_ledger_cells(
    spark: SparkSession, store_dir: str
) -> tuple[dict, int, int]:
    """The merged (cell-wise summed) sketch over every committed crawl:
    ``(cells, depth, width)`` — the LEDGER's pinned geometry rides along
    because estimating with mismatched defaults would probe cells that
    were never counted and silently UNDERestimate (breaking the
    one-sided contract); pass depth/width straight into
    :func:`..operators.sketches.cms_estimate_expr`."""
    manifest = read_cms_manifest(store_dir)
    if not manifest["batches"]:
        raise ValueError(f"no committed sketches at {store_dir!r}")
    merged = _cms_merged_df(spark, store_dir, manifest).collect()
    cells = {(r["row_idx"], r["col"]): r["cnt"] for r in merged}
    return cells, manifest["depth"], manifest["width"]


def _cms_merged_df(
    spark: SparkSession, store_dir: str, manifest: dict
) -> DataFrame:
    return (
        spark.read.parquet(os.path.join(store_dir, CMS_DIR))
        .filter(F.col("batch_id").isin(manifest["segments"]))
        .groupBy("row_idx", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def compact_cms_ledger(spark: SparkSession, store_dir: str) -> None:
    """Fold the CMS ledger's live segments into one base partition —
    cell counts are pure sums, so the additive-compaction discipline
    (see :func:`compact_link_ledger`) applies verbatim; geometry pins
    ride along untouched in the manifest."""
    manifest = read_cms_manifest(store_dir)
    if not manifest["batches"]:
        raise ValueError(f"no committed sketches at {store_dir!r}")
    _compact_additive_ledger(
        manifest,
        store_dir,
        CMS_MANIFEST,
        CMS_DIR,
        _cms_merged_df(spark, store_dir, manifest),
    )


# ---------------------------------------------------------------------------
# Committed CORPUS-STATS baseline (drift ledger): per-group (n, kept)
# stats of each crawl committed under the atomic-manifest rule, so the
# q76 drift check can run "this crawl vs the last COMMITTED one" without
# rescanning history — the operational form of the reference's
# historical-stats comparison (charge_analysis_checks.py:617-905, which
# reads a PERSISTED stats collection, exactly this).
# ---------------------------------------------------------------------------

STATS_MANIFEST = "_stats_manifest.json"
STATS_DIR = "corpus_stats"


def read_stats_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, STATS_MANIFEST)
    if not os.path.exists(path):
        return {"batches": [], "group_col": None}
    with open(path) as f:
        return json.load(f)


def commit_corpus_stats(
    spark: SparkSession,
    df: DataFrame,
    store_dir: str,
    batch_id: str,
    keep,
    group_col: str = "lang",
) -> None:
    """Commit one crawl's per-group (n, kept) stats (|groups| rows —
    bytes, not data).  Replay of a committed batch_id is a no-op; a
    different group column than the ledger pin raises."""
    from ..operators.drift import _group_stats

    manifest = read_stats_manifest(store_dir)
    if manifest["group_col"] is not None and manifest["group_col"] != group_col:
        raise ValueError(
            f"stats ledger at {store_dir!r} is pinned to "
            f"group_col={manifest['group_col']!r}; got {group_col!r}"
        )
    if batch_id in manifest["batches"]:
        return
    os.makedirs(store_dir, exist_ok=True)
    stats = _group_stats(df, group_col, keep)
    batch_dir = os.path.join(store_dir, STATS_DIR, f"batch_id={batch_id}")
    if os.path.exists(batch_dir):  # torn previous attempt
        shutil.rmtree(batch_dir)
    stats.write.parquet(batch_dir)
    manifest["batches"] = sorted(set(manifest["batches"]) | {batch_id})
    manifest["group_col"] = group_col
    tmp = os.path.join(store_dir, STATS_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, STATS_MANIFEST))


def drift_vs_committed(
    spark: SparkSession,
    cur: DataFrame,
    store_dir: str,
    keep,
    baseline_batch: str | None = None,
) -> DataFrame:
    """q76's drift report with the BASELINE side read from the committed
    stats ledger (default: the lexicographically last committed batch —
    crawl ids sort chronologically by convention; pass
    ``baseline_batch`` to compare against any earlier crawl).  The
    current corpus is scanned once; the baseline costs |groups| rows."""
    from ..operators import drift as DR

    manifest = read_stats_manifest(store_dir)
    if not manifest["batches"]:
        raise ValueError(f"no committed stats at {store_dir!r}")
    batch = baseline_batch or manifest["batches"][-1]
    if batch not in manifest["batches"]:
        raise ValueError(
            f"baseline batch {batch!r} not committed (have "
            f"{manifest['batches']})"
        )
    group_col = manifest["group_col"]
    base = (
        spark.read.parquet(os.path.join(store_dir, STATS_DIR))
        .filter(F.col("batch_id") == batch)
        .select(group_col, "n", "kept")
    )
    c = DR._group_stats(cur, group_col, keep)
    j = (
        c.withColumnRenamed("n", "n_cur")
        .withColumnRenamed("kept", "kept_cur")
        .join(
            base.withColumnRenamed("n", "n_base")
            .withColumnRenamed("kept", "kept_base"),
            group_col,
            "full_outer",
        )
    )
    return DR._drift_report(j, group_col)


# ---------------------------------------------------------------------------
# Cross-crawl BLOOM frontier ledger (9th ledger): each crawl commits the
# distinct bit POSITIONS its keys set; the merged frontier filter is the
# plain set union of committed positions — like the KMV ledger (and
# unlike the CMS), union is naturally idempotent, so replay is safe by
# algebra, and the merged filter keeps the no-false-negative guarantee
# over every crawl ever committed.  ≤ m ints per crawl.
# ---------------------------------------------------------------------------

BLOOM_MANIFEST = "_bloom_manifest.json"
BLOOM_DIR = "bloom_positions"


def read_bloom_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, BLOOM_MANIFEST)
    if not os.path.exists(path):
        return {"batches": [], "segments": [], "k": None, "m": None}
    with open(path) as f:
        m = json.load(f)
    m.setdefault("segments", list(m["batches"]))  # pre-compaction manifest
    return m


def commit_bloom(
    spark: SparkSession,
    df: DataFrame,
    store_dir: str,
    batch_id: str,
    value_col: str,
    k: int | None = None,
    m: int | None = None,
) -> None:
    """Commit one crawl's set positions (geometry pinned; replay no-op)."""
    from ..operators import sketches as SK

    k = SK.BLOOM_K if k is None else k
    m = SK.BLOOM_BITS if m is None else m
    manifest = read_bloom_manifest(store_dir)
    if manifest["k"] is not None and (
        manifest["k"] != k or manifest["m"] != m
    ):
        raise ValueError(
            f"bloom ledger at {store_dir!r} is pinned to k={manifest['k']} "
            f"m={manifest['m']}; got k={k} m={m}"
        )
    if batch_id in manifest["batches"]:
        return
    os.makedirs(store_dir, exist_ok=True)
    pos = SK.bloom_build(df, value_col, k=k, m=m)
    batch_dir = os.path.join(store_dir, BLOOM_DIR, f"batch_id={batch_id}")
    if os.path.exists(batch_dir):  # torn previous attempt
        shutil.rmtree(batch_dir)
    pos.write.parquet(batch_dir)
    manifest["batches"] = sorted(set(manifest["batches"]) | {batch_id})
    manifest["segments"] = sorted(set(manifest["segments"]) | {batch_id})
    manifest["k"], manifest["m"] = k, m
    tmp = os.path.join(store_dir, BLOOM_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, BLOOM_MANIFEST))


def bloom_ledger_words(
    spark: SparkSession, store_dir: str
) -> tuple[list[int], int, int]:
    """(packed words, k, m) of the UNION filter over every committed
    crawl — feed straight into sketches.bloom_probe."""
    from ..operators import sketches as SK

    manifest = read_bloom_manifest(store_dir)
    if not manifest["batches"]:
        raise ValueError(f"no committed bloom filters at {store_dir!r}")
    rows = _bloom_merged_df(spark, store_dir, manifest).collect()
    words = SK.bloom_words((r["pos"] for r in rows), m=manifest["m"])
    return words, manifest["k"], manifest["m"]


def _bloom_merged_df(
    spark: SparkSession, store_dir: str, manifest: dict
) -> DataFrame:
    return (
        spark.read.parquet(os.path.join(store_dir, BLOOM_DIR))
        .filter(F.col("batch_id").isin(manifest["segments"]))
        .select("pos")
        .distinct()
    )


def compact_bloom_ledger(spark: SparkSession, store_dir: str) -> None:
    """Fold the bloom ledger's live segments into one base partition —
    set positions are a pure union (≤ m rows after distinct), so the
    additive-compaction discipline (see :func:`compact_link_ledger`)
    applies verbatim; the k/m geometry pins ride along untouched."""
    manifest = read_bloom_manifest(store_dir)
    if not manifest["batches"]:
        raise ValueError(f"no committed bloom filters at {store_dir!r}")
    _compact_additive_ledger(
        manifest,
        store_dir,
        BLOOM_MANIFEST,
        BLOOM_DIR,
        _bloom_merged_df(spark, store_dir, manifest),
    )


# ---------------------------------------------------------------------------
# Cross-run SESSIONIZATION ledger (10th ledger): gap-based sessions over
# an append-only event log that arrives in daily/hourly batches — the
# batch operator (operators/sessions.py) needs a user's full history in
# one frame; this needs only |users| rows of committed state: each
# user's last event time and running session count.  A batch's first
# session STITCHES onto the archived tail when the cross-batch gap is
# within the threshold; everything else offsets by the archived count.
# State is per-user and bounded; events inside a batch may arrive in any
# order (the window sorts them), but BATCHES must be time-ordered per
# user (append-only log contract — a late batch would need reprocessing
# from its own time forward, exactly as in any event-time system).
# Atomic manifest rule as everywhere; replaying a committed batch
# returns its stored annotation without touching state.
# ---------------------------------------------------------------------------

SESS_MANIFEST = "_sessions_manifest.json"
SESS_STATE_DIR = "session_state"
SESS_OUT_DIR = "session_batches"


def read_sessions_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, SESS_MANIFEST)
    if not os.path.exists(path):
        return {"batches": [], "gap_us": None}
    with open(path) as f:
        return json.load(f)


def sessionize_incremental(
    spark: SparkSession,
    events: DataFrame,
    store_dir: str,
    batch_id: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_us: int | None = None,
) -> DataFrame:
    """Annotate this batch's events with GLOBAL ``session_idx`` values
    that continue across every previously committed batch, then commit
    the updated per-user state atomically.  Returns the annotated
    batch (read back from the committed parquet — what was durably
    written is what downstream sees)."""
    from ..operators import sessions as SN

    gap_us = SN.DEFAULT_GAP_US if gap_us is None else gap_us
    manifest = read_sessions_manifest(store_dir)
    if manifest["gap_us"] is not None and manifest["gap_us"] != gap_us:
        raise ValueError(
            f"session ledger at {store_dir!r} is pinned to gap_us="
            f"{manifest['gap_us']}; got {gap_us}"
        )
    out_dir = os.path.join(store_dir, SESS_OUT_DIR, f"batch_id={batch_id}")
    if batch_id in manifest["batches"]:
        return spark.read.parquet(out_dir)  # replay: stored annotation
    os.makedirs(store_dir, exist_ok=True)

    local = SN.sessionize(
        events, user_col=user_col, ts_col=ts_col,
        order_col=order_col, gap_us=gap_us,
    ).withColumn("_us", F.unix_micros(F.col(ts_col).cast("timestamp")))

    batches = manifest["batches"]
    if batches:
        prev_state = (
            spark.read.parquet(os.path.join(store_dir, SESS_STATE_DIR))
            .filter(F.col("state_batch") == batches[-1])
            .select(user_col, "last_ts_us", "n_sessions")
        )
    else:
        prev_state = spark.createDataFrame(
            [], f"{user_col} long, last_ts_us long, n_sessions long"
        )

    firsts = local.groupBy(user_col).agg(F.min("_us").alias("_first_us"))
    stitch = (
        firsts.join(prev_state, user_col, "left")
        .select(
            user_col,
            F.coalesce("n_sessions", F.lit(0)).alias("_base"),
            (
                F.col("last_ts_us").isNotNull()
                & (F.col("_first_us") - F.col("last_ts_us") <= gap_us)
            ).cast("int").alias("_stitched"),
        )
    )
    annotated = (
        local.join(F.broadcast(stitch), user_col)
        .withColumn(
            "session_idx",
            F.col("_base") + F.col("session_idx") - F.col("_stitched"),
        )
        .drop("_base", "_stitched")
    )
    # data first, manifest last (torn batches invisible)
    annotated.drop("_us").write.parquet(out_dir)

    new_state = (
        annotated.groupBy(user_col)
        .agg(
            F.max("_us").alias("last_ts_us"),
            F.max("session_idx").alias("n_sessions"),
        )
        # carry forward users absent from this batch
        .unionByName(
            prev_state.join(
                firsts.select(user_col), user_col, "left_anti"
            )
        )
        .withColumn("state_batch", F.lit(batch_id))
    )
    state_dir = os.path.join(
        store_dir, SESS_STATE_DIR, f"state_batch={batch_id}"
    )
    if os.path.exists(state_dir):  # torn previous attempt
        shutil.rmtree(state_dir)
    new_state.drop("state_batch").write.parquet(state_dir)
    manifest["batches"] = manifest["batches"] + [batch_id]
    manifest["gap_us"] = gap_us
    tmp = os.path.join(store_dir, SESS_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, SESS_MANIFEST))
    return spark.read.parquet(out_dir)


# ---------------------------------------------------------------------------
# Cross-crawl LINK-GRAPH edge ledger (11th ledger): each crawl's weighted
# domain→domain edge list committed under the atomic-manifest rule.  Edge
# weights are pure counts, so the merged graph is an ADDITIVE cell-wise
# sum over committed batches (the CMS-ledger property) — by construction
# identical to extracting edges from the concatenated crawls, which the
# equivalence test pins.  Authority (q89's degree/PageRank report) then
# recomputes over the merged graph without re-parsing a single page:
# storage and merge cost are GRAPH-sized (|domains|² bound), never
# corpus-sized.  Reference ancestor: the persisted historical-stats
# collection (charge_analysis_checks.py:617-905) as accumulating
# cross-run state under commit discipline.
# ---------------------------------------------------------------------------

EDGES_MANIFEST = "_edges_manifest.json"
EDGES_DIR = "link_edges"


def read_edges_manifest(store_dir: str) -> dict:
    """``batches`` is every batch_id EVER committed (the replay guard —
    it must survive compaction or a replayed old batch would re-commit
    and double-count); ``segments`` is the list of LIVE data partitions
    the merged read actually scans (compaction shrinks it to one)."""
    path = os.path.join(store_dir, EDGES_MANIFEST)
    if not os.path.exists(path):
        return {"batches": [], "segments": []}
    with open(path) as f:
        m = json.load(f)
    m.setdefault("segments", list(m["batches"]))
    return m


def commit_link_edges(
    spark: SparkSession,
    pages: DataFrame,
    store_dir: str,
    batch_id: str,
    src_domain_col: str = "src_domain",
    html_col: str = "html",
) -> None:
    """Extract this crawl's weighted domain edges and commit them.
    Replaying a committed ``batch_id`` is a guarded no-op (weights are
    summed at read time — a double commit would double-count, so the
    manifest guard IS the correctness mechanism, as in the CMS ledger).
    Data lands before the manifest references it (torn batches stay
    invisible)."""
    from ..operators import linkgraph as LG

    manifest = read_edges_manifest(store_dir)
    if batch_id in manifest["batches"]:
        return
    os.makedirs(store_dir, exist_ok=True)
    edges = LG.domain_edges(pages, src_domain_col, html_col)
    batch_dir = os.path.join(store_dir, EDGES_DIR, f"batch_id={batch_id}")
    if os.path.exists(batch_dir):  # torn previous attempt
        shutil.rmtree(batch_dir)
    edges.write.parquet(batch_dir)
    manifest["batches"] = sorted(manifest["batches"] + [batch_id])
    manifest["segments"] = sorted(manifest["segments"] + [batch_id])
    tmp = os.path.join(store_dir, EDGES_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, EDGES_MANIFEST))


def link_ledger_edges(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged (weight-summed) edge list over every committed crawl —
    one graph-sized hash aggregate over the LIVE segments (post-
    compaction: a single base partition)."""
    manifest = read_edges_manifest(store_dir)
    if not manifest["batches"]:
        raise ValueError(f"no committed link edges at {store_dir!r}")
    return (
        spark.read.parquet(os.path.join(store_dir, EDGES_DIR))
        .filter(F.col("batch_id").isin(manifest["segments"]))
        .groupBy("src_domain", "dst_domain")
        .agg(F.sum("weight").cast("long").alias("weight"))
    )


def compact_link_ledger(spark: SparkSession, store_dir: str) -> None:
    """Fold every live segment into ONE base partition — after N crawls
    the merged read otherwise lists/scans N directories for the same
    graph-sized result.  Correctness discipline:

    * the ``batches`` replay-guard list is UNTOUCHED — a replayed old
      batch_id stays a no-op forever, never a double count;
    * the base segment's data lands BEFORE the manifest points at it
      (data-then-manifest, as everywhere);
    * old segment directories are removed only AFTER the manifest swap —
      a crash in between leaves unreferenced orphan directories, which
      are harmless (no reader ever lists them again) and reclaimable by
      hand; a torn read is impossible.

    The base id derives from the guard-list length, so it is
    deterministic (no wall clock) and never collides with a SHA-named
    crawl id; re-running compaction at the same ledger state overwrites
    its own torn attempt."""
    manifest = read_edges_manifest(store_dir)
    if not manifest["batches"]:
        raise ValueError(f"no committed link edges at {store_dir!r}")
    if len(manifest["segments"]) <= 1:
        return  # already compact
    _compact_additive_ledger(
        manifest,
        store_dir,
        EDGES_MANIFEST,
        EDGES_DIR,
        link_ledger_edges(spark, store_dir),
    )


def _compact_additive_ledger(
    manifest: dict,
    store_dir: str,
    manifest_name: str,
    data_dir: str,
    merged: DataFrame,
) -> None:
    """Shared fold-to-one-base machinery for the additive ledgers (link
    edges / CMS cells / bloom positions — anywhere the merged read is a
    pure sum/union over batch partitions).  Guard-list preservation,
    data-then-manifest ordering, and post-swap cleanup as documented on
    :func:`compact_link_ledger`."""
    if len(manifest["segments"]) <= 1:
        return  # already compact
    # materialize BEFORE writing into the same directory tree the lazy
    # plan would otherwise scan mid-write
    merged = merged.localCheckpoint()
    base_id = f"__base_{len(manifest['batches'])}__"
    base_dir = os.path.join(store_dir, data_dir, f"batch_id={base_id}")
    if os.path.exists(base_dir):  # torn previous attempt
        shutil.rmtree(base_dir)
    merged.write.parquet(base_dir)
    old_segments = [s for s in manifest["segments"] if s != base_id]
    manifest["segments"] = [base_id]
    tmp = os.path.join(store_dir, manifest_name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, manifest_name))
    for seg in old_segments:
        seg_dir = os.path.join(store_dir, data_dir, f"batch_id={seg}")
        if os.path.exists(seg_dir):
            shutil.rmtree(seg_dir)


def link_ledger_authority(
    spark: SparkSession,
    store_dir: str,
    iters: int = 1,
    damping: float = 0.85,
) -> DataFrame:
    """q89's degree/PageRank authority report over the union of every
    committed crawl's edges — no page HTML is ever re-read."""
    from ..operators import linkgraph as LG

    return LG.authority_from_edges(
        link_ledger_edges(spark, store_dir), iters=iters, damping=damping
    )


# ---------------------------------------------------------------------------
# Cross-crawl RECRAWL-STATE ledger (12th ledger): the incremental form of
# operators/frontier.estimate_change_rates.  The batch operator needs a
# URL's full snapshot history in one frame; this needs only |urls| rows
# of committed state — (last_fp, n_snapshots, n_changes) per URL — and
# each crawl updates it with one broadcast-shaped join.  Batches must be
# time-ordered (append-only crawl log contract, as the session ledger)
# and each batch is ONE crawl: a URL may appear at most once per batch
# (enforced loudly — two fingerprints for one URL in one crawl is a
# corrupt feed, and silently picking one would corrupt change counts
# forever).  Atomic data-then-manifest rule as everywhere; replaying a
# committed batch is a no-op.
# ---------------------------------------------------------------------------

RECRAWL_MANIFEST = "_recrawl_manifest.json"
RECRAWL_STATE_DIR = "recrawl_state"


def read_recrawl_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, RECRAWL_MANIFEST)
    if not os.path.exists(path):
        return {"batches": []}
    with open(path) as f:
        return json.load(f)


def recrawl_incremental(
    spark: SparkSession,
    snapshot: DataFrame,
    store_dir: str,
    batch_id: str,
    url_col: str = "url",
    fp_col: str = "content_fp",
) -> None:
    """Fold one crawl's (url, content_fp) snapshot into the committed
    per-URL change state.  New URLs start at (1 snapshot, 0 changes);
    revisited URLs bump n_snapshots and bump n_changes iff the
    fingerprint moved; URLs absent from this crawl carry forward
    untouched."""
    manifest = read_recrawl_manifest(store_dir)
    if batch_id in manifest["batches"]:
        return
    os.makedirs(store_dir, exist_ok=True)

    snap = snapshot.select(
        F.col(url_col).alias("url"), F.col(fp_col).alias("last_fp")
    )
    dup = snap.groupBy("url").count().filter(F.col("count") > 1)
    if dup.limit(1).count():
        raise ValueError(
            f"batch {batch_id!r} contains a URL more than once — one "
            "crawl must carry one fingerprint per URL"
        )
    # a NULL fingerprint (failed refetch) is not a snapshot, and the
    # batch estimator and this ledger would DISAGREE about it (the lag
    # window counts the row; carry-forward state cannot) — reject loudly
    # rather than silently desynchronize the equivalence contract
    if snap.filter(F.col("last_fp").isNull()).limit(1).count():
        raise ValueError(
            f"batch {batch_id!r} contains NULL content fingerprints — "
            "drop failed fetches before committing a crawl snapshot"
        )

    batches = manifest["batches"]
    if batches:
        prev = (
            spark.read.parquet(os.path.join(store_dir, RECRAWL_STATE_DIR))
            .filter(F.col("state_batch") == batches[-1])
            .select("url", "last_fp", "n_snapshots", "n_changes")
        )
    else:
        # fingerprint type follows the CALLER's column (md5 strings are
        # the repo's standard fingerprint; int64 works too) — a
        # hard-coded type here would ANSI-cast-crash the first commit
        fp_t = snap.schema["last_fp"].dataType.simpleString()
        prev = spark.createDataFrame(
            [],
            f"url string, last_fp {fp_t}, n_snapshots long, n_changes long",
        )

    joined = snap.join(
        prev.withColumnsRenamed(
            {"last_fp": "_prev_fp", "n_snapshots": "_ns", "n_changes": "_nc"}
        ),
        "url",
        "full_outer",
    )
    new_state = joined.select(
        "url",
        F.coalesce("last_fp", "_prev_fp").alias("last_fp"),
        (
            F.coalesce("_ns", F.lit(0))
            + F.when(F.col("last_fp").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_snapshots"),
        (
            F.coalesce("_nc", F.lit(0))
            + F.when(
                F.col("last_fp").isNotNull()
                & F.col("_prev_fp").isNotNull()
                & (F.col("last_fp") != F.col("_prev_fp")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_changes"),
    )
    state_dir = os.path.join(
        store_dir, RECRAWL_STATE_DIR, f"state_batch={batch_id}"
    )
    if os.path.exists(state_dir):  # torn previous attempt
        shutil.rmtree(state_dir)
    new_state.write.parquet(state_dir)
    superseded = manifest["batches"]
    manifest["batches"] = manifest["batches"] + [batch_id]
    tmp = os.path.join(store_dir, RECRAWL_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(store_dir, RECRAWL_MANIFEST))
    # only batches[-1] is ever read — GC superseded state partitions
    # AFTER the swap (compaction's crash ordering), else the store holds
    # |urls| x N rows while claiming "|urls| rows of state"
    for old in superseded:
        old_dir = os.path.join(
            store_dir, RECRAWL_STATE_DIR, f"state_batch={old}"
        )
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir)


def recrawl_ledger_rates(spark: SparkSession, store_dir: str) -> DataFrame:
    """The committed per-URL state with the same recrawl tier the batch
    operator assigns — (url, n_snapshots, n_changes, recrawl_tier)."""
    from ..operators.frontier import recrawl_tier_col

    manifest = read_recrawl_manifest(store_dir)
    if not manifest["batches"]:
        raise ValueError(f"no committed recrawl state at {store_dir!r}")
    state = (
        spark.read.parquet(os.path.join(store_dir, RECRAWL_STATE_DIR))
        .filter(F.col("state_batch") == manifest["batches"][-1])
        .select("url", "n_snapshots", "n_changes")
    )
    # the SAME tier expression as the batch estimator — the two forms
    # can never disagree on a boundary
    return state.withColumn("recrawl_tier", recrawl_tier_col())
