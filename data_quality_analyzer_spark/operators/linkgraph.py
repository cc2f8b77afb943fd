"""Hyperlink graph signals: href extraction, domain edges, PageRank.

Production crawl pipelines rank SOURCES, not just documents: a domain
that many independent domains link to is a better crawl/keep prior than
one nobody references.  This module turns raw page HTML into that
signal in three composable steps:

* :func:`extract_links` — pull ``href="…"`` targets out of an HTML
  column with one ``regexp_extract_all`` (pure Catalyst, no UDF) and
  explode them to one row per link.
* :func:`domain_edges` — collapse links to a weighted domain→domain
  edge list (self-loops dropped, NULL/unparseable targets dropped),
  reusing :func:`..operators.domains.extract_domain` so the graph and
  the q55/q59/q61 domain operators agree on what "a domain" is.
* :func:`pagerank` — damped PageRank over the weighted edge list:

      pr_{k+1}(d) = (1 - a) + a * sum_{s→d} pr_k(s) * w(s,d) / outdeg(s)

  with ``a = damping`` and every node started at 1.0 (the classic
  "sum preserving N" normalization, not the 1/N probability form —
  scores are comparable across corpora of different sizes).  Dangling
  domains (no outlinks) simply leak their mass, the standard
  simplification; they still RECEIVE mass and every node keeps the
  (1 - a) floor.

Scale shape (100 TB): link extraction is the heavy stage and it is
map-only — project (src_domain, html) BEFORE the explode so the
generator never carries document payloads (the round-5
generator-projection lesson).  The first groupBy collapses the graph
to |domains|² edges at most (real web graphs: ~10^8 edges for 10^8
domains — a small fraction of corpus size), and every PageRank
iteration after that is ONE join + ONE hash aggregate over that edge
list, never touching the corpus again.  The contribution relation is
cached across iterations; for deep iteration counts checkpoint scores
every ~5 rounds to cut lineage growth (documented, not needed at the
entry query's K=1).  Reference ancestor: the per-payer historical
stats tiers (charge_analysis_checks.py:758-806) — an upstream
REPUTATION prior over sources — lifted to the web's native citation
structure (Page et al. 1999).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .domains import extract_domain

#: href capture — double-quoted values only (the form our fixtures and
#: WARC-lite writer emit); deliberately backslash-free so the same text
#: works as a Spark *and* DuckDB regex literal (SQL-literal backslash
#: gotcha, PLANS.md round 5).
HREF_PATTERN = 'href="([^"]+)"'


def extract_links(
    df: DataFrame, html_col: str, out_col: str = "link_url"
) -> DataFrame:
    """One row per ``href="…"`` target in ``html_col``.

    Pure Catalyst: ``regexp_extract_all`` + ``explode`` — rows with no
    links vanish (edge semantics: a page with no outlinks contributes
    no edges).  Callers should project down to the columns they need
    BEFORE calling this: the explode generator copies every retained
    column once per link.
    """
    links = F.regexp_extract_all(F.col(html_col), F.lit(HREF_PATTERN), 1)
    return df.withColumn(out_col, F.explode(links)).drop(html_col)


def domain_edges(
    df: DataFrame, src_domain_col: str, html_col: str
) -> DataFrame:
    """Weighted domain→domain edge list from page HTML.

    Output: (src_domain, dst_domain, weight) — weight is the total link
    count between the pair across the corpus.  Self-loops (intra-domain
    navigation — the overwhelming majority of real hrefs and pure noise
    for authority) and unparseable targets are dropped.  ONE explode +
    ONE hash aggregate; the aggregate is the only shuffle and its
    output is graph-sized, not corpus-sized.
    """
    slim = df.select(
        F.col(src_domain_col).alias("src_domain"), F.col(html_col)
    )
    links = extract_links(slim, html_col)
    e = links.select(
        "src_domain", extract_domain(F.col("link_url")).alias("dst_domain")
    )
    return (
        e.filter(
            F.col("dst_domain").isNotNull()
            & (F.col("src_domain") != F.col("dst_domain"))
        )
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def pagerank(
    edges: DataFrame, iters: int = 1, damping: float = 0.85
) -> DataFrame:
    """Damped PageRank over a (src_domain, dst_domain, weight) edge list.

    Returns (domain, pr) for every node that appears as a source OR a
    target.  Each iteration is one equi-join (scores onto the
    outdeg-normalized contribution edges) + one hash aggregate keyed on
    the destination + one left join back onto the node universe to
    reinstate inlink-less nodes at the (1 - damping) floor.  The
    normalized edge relation is computed once and cached when more than
    one iteration will reuse it.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    nodes = (
        edges.select(F.col("src_domain").alias("domain"))
        .union(edges.select(F.col("dst_domain").alias("domain")))
        .distinct()
    )
    outdeg = edges.groupBy("src_domain").agg(
        F.sum("weight").cast("double").alias("_outdeg")
    )
    norm = edges.join(outdeg, "src_domain").select(
        "src_domain",
        "dst_domain",
        (F.col("weight") / F.col("_outdeg")).alias("frac"),
    )
    cached = norm.cache() if iters > 1 else None
    if cached is not None:
        norm = cached
    scores = nodes.withColumn("pr", F.lit(1.0))
    for _ in range(iters):
        contrib = (
            norm.join(
                scores.withColumnRenamed("domain", "src_domain"),
                "src_domain",
            )
            .groupBy("dst_domain")
            .agg(F.sum(F.col("frac") * F.col("pr")).alias("_mass"))
            .withColumnRenamed("dst_domain", "domain")
        )
        scores = nodes.join(contrib, "domain", "left").select(
            "domain",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("_mass"), F.lit(0.0))
            ).alias("pr"),
        )
    if cached is not None:
        # pin the (graph-sized) result eagerly so the cached contribution
        # relation can be released NOW — a per-crawl refresh loop must not
        # accrete one dead cached relation per call
        scores = scores.localCheckpoint()
        cached.unpersist()
    return scores


def domain_authority(
    df: DataFrame,
    src_domain_col: str,
    html_col: str,
    iters: int = 1,
    damping: float = 0.85,
) -> DataFrame:
    """End-to-end authority report: per domain, the inlink mass
    (n_inlinks = total inbound link weight, n_src_domains = distinct
    referring domains), the outbound weight, and the damped PageRank
    score after ``iters`` rounds.  Domains nobody links to keep the
    (1 - damping) floor and 0 inlinks — they still appear (a crawl
    frontier needs the full universe, not just the popular tail).
    """
    return authority_from_edges(
        domain_edges(df, src_domain_col, html_col),
        iters=iters,
        damping=damping,
    )


def authority_from_edges(
    edges: DataFrame, iters: int = 1, damping: float = 0.85
) -> DataFrame:
    """The degree/PageRank report over an already-built (src_domain,
    dst_domain, weight) edge list — the entry point the cross-crawl edge
    LEDGER uses, where edges arrive merged from committed batches rather
    than extracted from pages."""
    cached = edges.cache() if iters > 1 else None
    if cached is not None:
        edges = cached
    indeg = edges.groupBy(F.col("dst_domain").alias("domain")).agg(
        F.sum("weight").cast("long").alias("n_inlinks"),
        F.countDistinct("src_domain").cast("long").alias("n_src_domains"),
    )
    outdeg = edges.groupBy(F.col("src_domain").alias("domain")).agg(
        F.sum("weight").cast("long").alias("n_outlinks")
    )
    pr = pagerank(edges, iters=iters, damping=damping)
    out = (
        pr.join(indeg, "domain", "left")
        .join(outdeg, "domain", "left")
        .select(
            "domain",
            F.coalesce("n_inlinks", F.lit(0)).cast("long").alias("n_inlinks"),
            F.coalesce("n_src_domains", F.lit(0))
            .cast("long")
            .alias("n_src_domains"),
            F.coalesce("n_outlinks", F.lit(0))
            .cast("long")
            .alias("n_outlinks"),
            F.round("pr", 6).alias("pr"),
        )
    )
    if cached is not None:
        # same lifecycle rule as pagerank: pin the graph-sized report,
        # release the cached edges before returning
        out = out.localCheckpoint()
        cached.unpersist()
    return out


def reciprocity(edges: DataFrame) -> DataFrame:
    """Per-source reciprocity: of a domain's distinct outbound
    neighbors, how many link BACK — the classic link-farm signal
    (organic linking is largely asymmetric; paired exchange rings are
    not).  One self-join of the distinct edge list on the reversed key
    (graph-sized, weights irrelevant) + one hash aggregate.  Exact
    integers only — banding/thresholds are the caller's policy."""
    pairs = edges.select("src_domain", "dst_domain").distinct()
    rev = pairs.select(
        F.col("dst_domain").alias("src_domain"),
        F.col("src_domain").alias("dst_domain"),
        F.lit(1).alias("_back"),
    )
    return (
        pairs.join(rev, ["src_domain", "dst_domain"], "left")
        .groupBy(F.col("src_domain").alias("domain"))
        .agg(
            F.count("*").cast("long").alias("n_neighbors"),
            F.sum(F.coalesce("_back", F.lit(0)))
            .cast("long")
            .alias("n_reciprocal"),
        )
    )


#: anchor capture — href + inner text in ONE pattern so the two
#: regexp_extract_all calls (group 1, group 2) see the SAME match set
#: and zip positionally without drift; backslash-free (SQL-literal rule).
ANCHOR_PATTERN = 'href="([^"]+)"[^>]*>([^<]*)<'


def extract_anchors(
    df: DataFrame, html_col: str
) -> DataFrame:
    """One row per anchor: (link_url, anchor_text).  Two
    ``regexp_extract_all`` passes over the SAME pattern (group 1 = href,
    group 2 = inner text) — identical match sets, so ``arrays_zip`` is
    positionally exact; one explode.  Anchor text is trimmed; empty
    (image-only) anchors stay as '' rows — dropping them is the
    caller's policy."""
    pairs = F.arrays_zip(
        F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_PATTERN), 1).alias(
            "link_url"
        ),
        F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_PATTERN), 2).alias(
            "anchor_text"
        ),
    )
    out = df.withColumn("_a", F.explode(pairs)).drop(html_col)
    return out.select(
        *[c for c in out.columns if c != "_a"],
        F.col("_a.link_url").alias("link_url"),
        F.trim(F.col("_a.anchor_text")).alias("anchor_text"),
    )


def anchor_text_profile(
    df: DataFrame, src_domain_col: str, html_col: str
) -> DataFrame:
    """Per TARGET domain, the off-site anchor-text signal: how many
    inbound anchors, how many distinct texts, and the single most common
    text (count-then-lexicographic election via one max(struct) hash
    agg — the q80 winner shape, never a window).  Anchor text is what
    OTHER sites call a page — the classic relevance/quality signal that
    complements q89's structural authority.  Self-links and empty texts
    are excluded; two hash aggregates, both graph-sized."""
    slim = df.select(
        F.col(src_domain_col).alias("src_domain"), F.col(html_col)
    )
    a = extract_anchors(slim, html_col)
    a = a.select(
        "src_domain",
        extract_domain(F.col("link_url")).alias("domain"),
        F.col("anchor_text"),
    ).filter(
        F.col("domain").isNotNull()
        & (F.col("domain") != F.col("src_domain"))
        & (F.col("anchor_text") != "")
    )
    per_text = a.groupBy("domain", "anchor_text").agg(
        F.count("*").cast("long").alias("n")
    )
    # winner = most-frequent text, ties to the lexicographically smallest:
    # min(struct(-n, text)) — the q19 hash-agg election, never a window
    return per_text.groupBy("domain").agg(
        F.sum("n").cast("long").alias("n_anchors"),
        F.count("*").cast("long").alias("n_distinct_texts"),
        F.min(F.struct((-F.col("n")).alias("_neg"), "anchor_text")).alias(
            "_w"
        ),
    ).select(
        "domain",
        "n_anchors",
        "n_distinct_texts",
        F.col("_w.anchor_text").alias("top_text"),
        (-F.col("_w._neg")).cast("long").alias("top_text_n"),
    )


# ---------------------------------------------------------------------------
# DuckDB twins — used by the q89 oracle and the iteration-equivalence tests.
# ---------------------------------------------------------------------------


def domain_edges_duck_sql(
    pages_rel: str, src_domain: str = "src_domain", html: str = "html"
) -> str:
    """DuckDB twin of :func:`domain_edges` over a relation/CTE name.

    Reuses :func:`..operators.domains.extract_domain_sql` so both
    engines normalize link targets identically.
    """
    from .domains import extract_domain_sql

    return f"""
    SELECT src_domain, dst_domain,
           CAST(COUNT(*) AS BIGINT) AS weight
    FROM (
      SELECT l.src_domain,
             {extract_domain_sql('l.link_url')} AS dst_domain
      FROM (
        SELECT {src_domain} AS src_domain,
               UNNEST(regexp_extract_all({html}, '{HREF_PATTERN}', 1))
                 AS link_url
        FROM {pages_rel}
      ) l
    )
    WHERE dst_domain IS NOT NULL AND dst_domain <> src_domain
    GROUP BY 1, 2
    """


def pagerank_duck_ctes(
    edges_rel: str, iters: int = 1, damping: float = 0.85
) -> str:
    """The comma-joined CTE definitions (nodes, norm, pr0 … pr{iters})
    behind :func:`pagerank_duck_sql`, exposed separately so callers can
    splice them into a larger WITH block (the q89 oracle adds its own
    pages/edges/degree CTEs around them)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    a = damping
    ctes = [
        f"""nodes AS (
      SELECT src_domain AS domain FROM {edges_rel}
      UNION
      SELECT dst_domain FROM {edges_rel}
    ),
    norm AS (
      SELECT src_domain, dst_domain,
             CAST(weight AS DOUBLE)
               / SUM(weight) OVER (PARTITION BY src_domain) AS frac
      FROM {edges_rel}
    ),
    pr0 AS (SELECT domain, CAST(1.0 AS DOUBLE) AS pr FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""pr{k} AS (
      SELECT n.domain,
             {1.0 - a} + {a} * COALESCE(m.mass, 0.0) AS pr
      FROM nodes n LEFT JOIN (
        SELECT norm.dst_domain AS domain,
               SUM(norm.frac * p.pr) AS mass
        FROM norm JOIN pr{k - 1} p ON p.domain = norm.src_domain
        GROUP BY 1
      ) m USING (domain)
    )"""
        )
    return ",\n    ".join(ctes)


def pagerank_duck_sql(
    edges_rel: str, iters: int = 1, damping: float = 0.85
) -> str:
    """DuckDB twin of :func:`pagerank`: the iteration loop UNROLLED into
    one CTE per round (pr0, pr1, …) — an independent decomposition, not
    a transliteration, so it value-proves the Spark join/agg pipeline."""
    body = pagerank_duck_ctes(edges_rel, iters=iters, damping=damping)
    return f"WITH {body}\n    SELECT domain, pr FROM pr{iters}"
