"""KMV (k-minimum-values) distinct-cardinality sketch — the classic
bottom-k estimator (Bar-Yossef et al. 2002; the theta/KMV family behind
Apache DataSketches): keep the k smallest hash values of a set; if the
k-th smallest is ``h_k`` over a hash space of size ``D``, the set's
cardinality ≈ ``(k-1) · D / h_k``.

Why this exists next to ``approx_count_distinct``: Spark's HLL sketch is
excellent but NOT reproducible across engines — its estimate cannot be
oracle-checked, only tolerance-tested.  KMV over the repo's portable
60-bit md5 hash is fully deterministic: both engines see the same hash
values, the same k-th minimum, and therefore the same estimate to the
last bit — a SKETCH with a value-hash oracle.  (It is also mergeable:
the union's bottom-k is the bottom-k of the merged bottom-k sets —
the property every cross-crawl ledger here relies on.)

Exactness contract: groups with fewer than k distinct values report the
EXACT count (the sketch holds every element); the estimator only engages
beyond k.  NULL values are ignored, the COUNT(DISTINCT ...) convention.

Scale shape: one ``groupBy(group, h)`` distinct (the only corpus-sized
shuffle), then a per-group rank filter over DISTINCT values only, then a
k-bounded aggregate.  Production note (docstring honesty): a dedicated
bottom-k accumulator (DataSketches-style partial aggregation) beats the
rank window when single groups hold billions of DISTINCT values; the
DataFrame form here keeps the exact cross-engine determinism that a
native sketch buffer cannot give, and the window input is already
distinct-reduced.

Reference ancestor: A4/A5 distinct counts (base_standalone.py), upgraded
from exact-only to a mergeable bounded-memory estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as HH

H_SPACE = 1 << 60  # h60 range: [0, 2^60)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Per-group KMV cardinality: ``(group..., n_exact, est_distinct)``
    where ``n_exact`` is the true distinct count (cheap here because the
    distinct relation is materialized anyway — production would drop it)
    and ``est_distinct`` the bottom-k estimate (= exact below k)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = F.expr(HH.h60_spark_sql(f"CAST({value_col} AS STRING)"))
    distinct = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("_h"))
        .distinct()
    )
    exact = distinct.groupBy(*group_cols).agg(
        F.count("*").alias("n_exact")
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    sk = (
        distinct.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.count("*").alias("_cnt"), F.max("_h").alias("_hk"))
    )
    est = F.when(F.col("_cnt") < k, F.col("_cnt").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(H_SPACE)) / F.col("_hk")
    )
    return (
        sk.join(exact, group_cols)
        .select(
            *group_cols,
            "n_exact",
            F.round(est, 2).alias("est_distinct"),
        )
    )


def kmv_distinct_sql(
    rel: str,
    value_sql: str,
    group_cols: list[str],
    k: int = 256,
) -> str:
    """DuckDB twin of :func:`kmv_distinct` over relation ``rel`` —
    ``value_sql`` is the value expression (hashed with the same h60)."""
    g = ", ".join(group_cols)
    h = HH.h60_sql(f"CAST({value_sql} AS VARCHAR)")
    return f"""
    WITH _kmv_d AS (
      SELECT DISTINCT {g}, {h} AS _h
      FROM {rel} WHERE {value_sql} IS NOT NULL
    ),
    _kmv_r AS (
      SELECT {g}, _h,
             row_number() OVER (PARTITION BY {g} ORDER BY _h) AS _rn
      FROM _kmv_d
    ),
    _kmv_s AS (
      SELECT {g}, COUNT(*) AS _cnt, MAX(_h) AS _hk
      FROM _kmv_r WHERE _rn <= {k} GROUP BY {g}
    ),
    _kmv_e AS (
      SELECT {g}, COUNT(*) AS n_exact FROM _kmv_d GROUP BY {g}
    )
    SELECT {g},
           e.n_exact,
           ROUND(CASE WHEN s._cnt < {k} THEN CAST(s._cnt AS DOUBLE)
                 ELSE {float(k - 1)} * {float(H_SPACE)} / s._hk END, 2)
             AS est_distinct
    FROM _kmv_s s JOIN _kmv_e e USING ({g})
    """


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — the FREQUENCY sibling
# of the KMV cardinality sketch above: estimate per-item counts in
# depth·width bounded memory, with one-sided error (estimate ≥ truth,
# overcount ≤ εN with probability 1−δ for width = e/ε, depth = ln 1/δ).
# Heavy-hitter detection at 10^12 tokens without a vocabulary-sized
# groupBy: the only corpus-sized operation is ONE hash aggregate whose
# key space is depth·width (4096 default — partial-agg friendly, bytes
# to the driver), after which any item's estimate is a map lookup.
#
# Determinism: row hashes are the repo's Carter-Wegman Mersenne mixes
# (``hashing.mix_spark_sql`` / ``mix_sql`` — the minhash seed family, so
# both engines compute identical (row, col) cells and identical
# estimates: a frequency sketch with a value-hash oracle, like the KMV).
# Mergeability: sketches add cell-wise across crawls.
# Reference ancestor: A14 group-count distribution (payer_analysis.py),
# upgraded to bounded memory.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_col_spark(value_sql: str, i: int, width: int) -> str:
    h = HH.h60_spark_sql(value_sql)
    return f"CAST(pmod({HH.mix_spark_sql(h, i)}, {width}) AS INT)"


def _cms_col_duck(value_sql: str, i: int, width: int) -> str:
    h = HH.h60_sql(value_sql)
    return f"CAST(({HH.mix_sql(h, i)}) % {width} AS INT)"


def count_min_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: one row per non-empty (row_idx, col) cell with
    its count.  Plan: a posexplode of ``depth`` plan-literal column ids
    per input row → ONE bounded hash aggregate (depth·width keys)."""
    if depth < 1 or depth > len(HH.MINHASH_PARAMS):
        raise ValueError(f"depth must be in [1, {len(HH.MINHASH_PARAMS)}]")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    # h60 is bound ONCE per value (one md5), then each row's column id
    # is a cheap Mersenne mix of that bound hash — inlining the hash
    # into every row expression would pay depth md5s per value
    # (measured 4.95 s → 3.4 s on the q78 sf0.1 sweep).
    h = HH.h60_spark_sql(f"CAST({value_col} AS STRING)")
    cols = ", ".join(
        f"CAST(pmod({HH.mix_spark_sql('_cms_h', i)}, {width}) AS INT)"
        for i in range(depth)
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.expr(h).alias("_cms_h"))
        .select(F.posexplode(F.expr(f"array({cols})")).alias("row_idx", "col"))
        .groupBy("row_idx", "col")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate_expr(
    cms_cells: dict[tuple[int, int], int],
    value_sql: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
):
    """Spark estimate Column for ``value_sql`` given the COLLECTED sketch
    cells (bounded: depth·width ints — a dial, not data; the same
    literal-map scoring shape as DSIR).  Items hashing into an all-empty
    cell estimate 0.  The probe hashes ``CAST(value AS STRING)`` —
    exactly the build side's derivation, so non-string columns probe the
    cells they were counted into."""
    value_sql = f"CAST({value_sql} AS STRING)"
    entries = []
    for (i, c), n in sorted(cms_cells.items()):
        entries += [F.lit(f"{i}:{c}"), F.lit(int(n))]
    m = F.create_map(*entries)
    per_row = [
        F.coalesce(
            F.element_at(
                m,
                F.expr(
                    f"concat('{i}', ':', {_cms_col_spark(value_sql, i, width)})"
                ),
            ),
            F.lit(0),
        )
        for i in range(depth)
    ]
    return F.least(*per_row) if len(per_row) > 1 else per_row[0]


def count_min_sketch_sql(
    rel: str,
    value_sql: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin of :func:`count_min_sketch` (relation ``(row_idx,
    col, cnt)``)."""
    arms = " UNION ALL ".join(
        f"SELECT {i} AS row_idx, "
        f"{_cms_col_duck(f'CAST({value_sql} AS VARCHAR)', i, width)} AS col "
        f"FROM {rel} WHERE {value_sql} IS NOT NULL"
        for i in range(depth)
    )
    return f"SELECT row_idx, col, COUNT(*) AS cnt FROM ({arms}) GROUP BY 1, 2"


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — the MEMBERSHIP sibling: "have we crawled
# this URL?" in m bits with NO false negatives (one-sided, like the CMS
# overcount).  Spark ships a native DataFrameStatFunctions bloom, but —
# as with HLL vs KMV — its bit layout is not reproducible across
# engines; this one derives every bit position from the repo's portable
# h60 + Mersenne-mix family, so both engines set and probe identical
# bits and the FALSE-POSITIVE SET ITSELF is oracle-checkable.
#
# Representation: the distinct SET POSITIONS (ints < m), not a packed
# bitmap — position sets are mergeable by plain set union (the KMV
# ledger property: replay-idempotent, unlike the CMS's additive cells),
# and ≤ m ints bound the driver copy.  The probe folds the positions
# into a words[m/64] int64 literal array: membership = k array lookups
# + bit tests, pure codegen, zero joins on the corpus side.
# Reference ancestor: P2 membership filter (claim_analysis.py:30-35),
# upgraded to bounded memory.
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16
BLOOM_K = 4


def bloom_build(
    df: DataFrame,
    value_col: str,
    k: int = BLOOM_K,
    m: int = BLOOM_BITS,
) -> DataFrame:
    """Distinct bit positions set by the values: one explode of ``k``
    plan-literal positions per row → ONE bounded distinct (≤ m keys)."""
    if k < 1 or k > len(HH.MINHASH_PARAMS):
        raise ValueError(f"k must be in [1, {len(HH.MINHASH_PARAMS)}]")
    if m < 64 or m % 64:
        raise ValueError(f"m must be a positive multiple of 64, got {m}")
    h = HH.h60_spark_sql(f"CAST({value_col} AS STRING)")
    pos = ", ".join(
        f"CAST(pmod({HH.mix_spark_sql('_bf_h', i)}, {m}) AS INT)"
        for i in range(k)
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.expr(h).alias("_bf_h"))
        .select(F.explode(F.expr(f"array({pos})")).alias("pos"))
        .distinct()
    )


def bloom_words(positions, m: int = BLOOM_BITS) -> list[int]:
    """Pack collected positions (iterable of ints) into m/64 int64
    words — the literal the probe expression folds into the plan."""
    words = [0] * (m // 64)
    for p in positions:
        words[p >> 6] |= 1 << (p & 63)
    # int64 two's complement for Spark literals
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_probe(
    df: DataFrame,
    value_col: str,
    words: list[int],
    k: int = BLOOM_K,
    m: int = BLOOM_BITS,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Annotate with ``out_col`` = all ``k`` positions of the value are
    set (NULL values probe false).  Same CAST + hash derivation as
    :func:`bloom_build`, and the h60 is bound ONCE per row (the q78
    bind-once lesson) with the k Mersenne mixes and bit tests riding on
    the bound column — map-only, zero joins."""
    if len(words) != m // 64:
        raise ValueError(
            f"words length {len(words)} does not match m={m} (need {m // 64})"
        )
    # ONE array literal and ONE mix expansion per position, each bound
    # to a temp column — inlining the words literal k times and the mix
    # polynomial 2k times blows past codegen limits at m = 2^16 (the
    # q78 bind-once lesson, applied to the probe)
    arr = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    h = HH.h60_spark_sql(f"CAST({value_col} AS STRING)")
    out = df.withColumn("_bf_ph", F.expr(h)).withColumn(
        "_bf_arr", F.expr(arr)
    )
    tests = []
    for i in range(k):
        out = out.withColumn(
            f"_bf_p{i}",
            F.expr(f"pmod({HH.mix_spark_sql('_bf_ph', i)}, {m})"),
        )
        tests.append(
            f"(shiftright(element_at(_bf_arr, "
            f"CAST(shiftright(_bf_p{i}, 6) AS INT) + 1), "
            f"CAST(pmod(_bf_p{i}, 64) AS INT)) & 1) = 1"
        )
    return (
        out.withColumn(
            out_col,
            F.when(
                F.col(value_col).isNotNull(), F.expr(" AND ".join(tests))
            ).otherwise(F.lit(False)),
        )
        .drop("_bf_ph", "_bf_arr", *[f"_bf_p{i}" for i in range(k)])
    )


def bloom_positions_duck_sql(
    rel: str, value_sql: str, k: int = BLOOM_K, m: int = BLOOM_BITS
) -> str:
    """DuckDB twin of :func:`bloom_build` (distinct positions)."""
    h = HH.h60_sql(f"CAST({value_sql} AS VARCHAR)")
    arms = " UNION ALL ".join(
        f"SELECT CAST(({HH.mix_sql(h, i)}) % {m} AS INT) AS pos "
        f"FROM {rel} WHERE {value_sql} IS NOT NULL"
        for i in range(k)
    )
    return f"SELECT DISTINCT pos FROM ({arms})"
