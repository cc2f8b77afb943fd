"""ANN recall/cost frontier: recall@10 vs scanned fraction for every ANN
family (sign-LSH, random-projection LSH, IVF random-anchor, IVF trained)
against brute-force ground truth (q29's operator) on the sf embeddings
table.

Method: bucket assignments come from the REAL operators (the same plan
expressions / Arrow UDFs the queries run — no numpy re-implementation of
the bucketing), collected once per configuration; per-query recall is then
evaluated driver-side with exact cosine (the embeddings table is a few MB
at bench SF; the frontier is a measurement harness, not a production
operator).  Scanned fraction = probed-bucket rows / N — the cost a
partition-pruned scan would pay at 100 TB.

Usage:  python scripts/ann_frontier.py [sf_dir] [n_queries]
Prints a markdown table (PLANS.md carries the committed sf0.1 numbers).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_quality_analyzer_spark.operators import similarity as SIM  # noqa: E402
from data_quality_analyzer_spark.session import get_spark  # noqa: E402

DIM = 64
TOPK = 10


def frontier(spark, sf_dir: str, n_queries: int = 20):
    """Run the sweep; returns [(label, recall@10, scanned_fraction), ...]."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    rows = e.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    n = len(ids)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    q_ids = ids[:n_queries]

    # brute-force ground truth (exact cosine, excluding self)
    truth: dict[int, set] = {}
    for qi in q_ids:
        qrow = Xn[ids == qi][0]
        sims = Xn @ qrow
        order = np.argsort(-sims)
        top = [int(ids[j]) for j in order if ids[j] != qi][:TOPK]
        truth[int(qi)] = set(top)

    def eval_buckets(bucket_of: dict[int, int], probes_of) -> tuple[float, float]:
        """mean recall@10 and mean scanned fraction given each vector's
        bucket and a per-query iterable of probed buckets."""
        recalls, scanned = [], []
        buckets = np.array([bucket_of[int(i)] for i in ids])
        for qi in q_ids:
            probe = set(probes_of(int(qi)))
            mask = np.isin(buckets, list(probe))
            scanned.append(mask.sum() / n)
            qrow = Xn[ids == qi][0]
            sims = np.where(mask, Xn @ qrow, -np.inf)
            sims[ids == qi] = -np.inf
            top = {int(ids[j]) for j in np.argsort(-sims)[:TOPK] if sims[j] > -np.inf}
            recalls.append(len(top & truth[int(qi)]) / TOPK)
        return float(np.mean(recalls)), float(np.mean(scanned))

    results = []

    for bits in (4, 6, 8):
        b = {
            int(r["vec_id"]): int(r["bucket"])
            for r in SIM.with_lsh_bucket(e, bits=bits).select("vec_id", "bucket").collect()
        }
        rec, frac = eval_buckets(b, lambda qi: [b[qi]])
        results.append((f"sign-LSH bits={bits}", rec, frac))

    for bits in (4, 6, 8):
        b = {
            int(r["vec_id"]): int(r["bucket"])
            for r in SIM.with_rp_bucket(e, bits=bits, dim=DIM).select("vec_id", "bucket").collect()
        }
        rec, frac = eval_buckets(b, lambda qi: [b[qi]])
        results.append((f"RP-LSH bits={bits}", rec, frac))

    k = 16
    trained = SIM.train_ivf_kmeans(e, k=k, dim=DIM, iters=4)
    for label, anchors in (("IVF random", None), ("IVF trained", trained)):
        A = np.array(anchors if anchors is not None else SIM.ivf_anchors(k, DIM))
        b = {
            int(r["vec_id"]): int(r["ivf_list"])
            for r in SIM.with_ivf_bucket(e, k=k, dim=DIM, anchors=anchors)
            .select("vec_id", "ivf_list").collect()
        }

        def probes(qi, nprobe):
            q = X[ids == qi][0]
            d = ((A - q) ** 2).sum(axis=1)
            return (np.argsort(d)[:nprobe] + 1).tolist()

        for nprobe in (1, 2, 4, 8):
            rec, frac = eval_buckets(b, lambda qi: probes(qi, nprobe))
            results.append((f"{label} k={k} nprobe={nprobe}", rec, frac))

    return results


def main(sf_dir: str = "/root/testdata/sf0.1", n_queries: int = 20) -> None:
    spark = get_spark(app_name="ann_frontier", cpus=8)
    results = frontier(spark, sf_dir, n_queries)
    print(f"\n| family | recall@10 | scanned fraction |  ({sf_dir}, {n_queries} queries)")
    print("|---|---|---|")
    for label, rec, frac in results:
        print(f"| {label} | {rec:.3f} | {frac:.3f} |")


if __name__ == "__main__":
    main(*sys.argv[1:2], *(int(a) for a in sys.argv[2:3]))
