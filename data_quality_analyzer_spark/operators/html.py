"""HTML → text extraction: the stage between the raw crawl and every
text-quality operator in this package (C4/CCNet pipelines run exactly
this before any filtering; trafilatura-class extraction needs a DOM —
this is the regex subset that covers the overwhelming bulk of pages and
stays inside whole-stage codegen).

The whole operator is MAP-ONLY string rewriting — zero UDF, zero
shuffle; at 10^12 pages it adds no exchange, and the regexes run inside
codegen on the JVM.

Extraction semantics (applied in this order; each step is one
``regexp_replace``/``replace``):

1. drop ``<script>``/``<style>`` elements INCLUDING their content;
2. drop HTML comments;
3. block-level closers + ``<br>``/``<hr>`` become newlines (line
   structure feeds the q58 line-quality filter and q50 line dedup);
4. every remaining tag is stripped;
5. the common entities decode (``&amp;`` LAST, so ``&amp;lt;``
   correctly yields the literal ``&lt;``);
6. horizontal whitespace collapses, line edges trim, blank lines
   collapse, document edges trim.

Also derived here, because they come for free from the same scan and are
the standard crawl-quality signals:

* :func:`extract_title` — ``<title>`` inner text, NULL when absent;
* :func:`link_density` — anchor-text chars / extracted-text chars, THE
  classic boilerplate-page discriminator (jusText, Kohlschütter et al.).

Regex portability contract (the reason every pattern below avoids
backreferences, lookaround, ``\\s`` and ``\\v``): the same literal
pattern must mean the same thing to Java regex (Spark codegen), RE2
(DuckDB oracle) and Python ``re`` (unit-test twin).  Inline ``(?is)``
flags, non-greedy ``.*?``, ``\\b`` and explicit ``[ \\t\\r\\n]`` classes
are the shared dialect.  Reference ancestor: P12 computed column
(`claim_analysis.py`) as a derived-text stage.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as HH  # noqa: F401  (re-exported for twins)

# shared Java/RE2/Python patterns — see portability contract above
P_SCRIPT = r"(?is)<script\b[^>]*>.*?</script[ \t\r\n]*>"
P_STYLE = r"(?is)<style\b[^>]*>.*?</style[ \t\r\n]*>"
P_COMMENT = r"(?s)<!--.*?-->"
P_BLOCK = (
    r"(?i)<(?:br|hr|/p|/div|/li|/ul|/ol|/h[1-6]|/tr|/table|/blockquote"
    r"|/section|/article|/header|/footer|/title)\b[^>]*>"
)
P_TAG = r"(?s)<[^>]*>"
P_HSPACE = r"[ \t\r]+"
P_LINE_EDGE = r"(?m)^ +| +$"
P_BLANKS = r"\n+"
P_DOC_EDGE = r"^[ \t\r\n]+|[ \t\r\n]+$"
P_TITLE = r"(?is)<title[^>]*>(.*?)</title[ \t\r\n]*>"
P_ANCHOR = r"(?is)<a\b[^>]*>(.*?)</a[ \t\r\n]*>"

# (entity, replacement) — ``&amp;`` deliberately last
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def strip_html(html: Column) -> Column:
    """Extracted plain text of one HTML page (NULL in → NULL out)."""
    x = F.regexp_replace(html, P_SCRIPT, "")
    x = F.regexp_replace(x, P_STYLE, "")
    x = F.regexp_replace(x, P_COMMENT, "")
    x = F.regexp_replace(x, P_BLOCK, "\n")
    x = F.regexp_replace(x, P_TAG, "")
    for ent, rep in ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(rep))
    x = F.regexp_replace(x, P_HSPACE, " ")
    x = F.regexp_replace(x, P_LINE_EDGE, "")
    x = F.regexp_replace(x, P_BLANKS, "\n")
    return F.regexp_replace(x, P_DOC_EDGE, "")


def extract_title(html: Column) -> Column:
    """Inner text of ``<title>`` (entity-decoded, whitespace-normalized);
    NULL when the page has no title element."""
    t = F.regexp_extract(html, P_TITLE, 1)
    for ent, rep in ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t\r\n]+", " ")
    t = F.regexp_replace(t, r"^ +| +$", "")
    return F.nullif(t, F.lit(""))


def link_density(html: Column, extracted: Column) -> Column:
    """Anchor-inner-text chars / extracted-text chars ∈ [0, ...] — the
    boilerplate-page signal (nav/footer link farms score high).  Both
    lengths are integers derived identically in every engine, so the
    4 dp rounding is bit-portable."""
    anchors = F.regexp_extract_all(html, F.lit(P_ANCHOR), 1)
    anchor_chars = F.aggregate(
        F.transform(
            anchors,
            lambda a: F.length(F.regexp_replace(a, P_TAG, "")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.round(
        anchor_chars.cast("double") / F.greatest(F.lit(1), F.length(extracted)),
        4,
    )


def extract_pages(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """Annotate a crawl frame with ``text``, ``title`` and
    ``link_density`` — one map-only projection, ready to feed
    ``prep_text_corpus``."""
    h = F.col(html_col)
    out = df.withColumn(text_col, strip_html(h)).withColumn(
        "title", extract_title(h)
    )
    return out.withColumn(
        "link_density", link_density(h, F.col(text_col))
    )


# ---------------------------------------------------------------------------
# DuckDB twins (rendered from the SAME pattern constants)
# ---------------------------------------------------------------------------


def _entities_sql(x: str) -> str:
    for ent, rep in ENTITIES:
        rep_sql = rep.replace("'", "''")
        x = f"replace({x}, '{ent}', '{rep_sql}')"
    return x


def strip_html_sql(c: str) -> str:
    x = f"regexp_replace({c}, '{P_SCRIPT}', '', 'g')"
    x = f"regexp_replace({x}, '{P_STYLE}', '', 'g')"
    x = f"regexp_replace({x}, '{P_COMMENT}', '', 'g')"
    x = f"regexp_replace({x}, '{P_BLOCK}', chr(10), 'g')"
    x = f"regexp_replace({x}, '{P_TAG}', '', 'g')"
    x = _entities_sql(x)
    x = f"regexp_replace({x}, '{P_HSPACE}', ' ', 'g')"
    x = f"regexp_replace({x}, '{P_LINE_EDGE}', '', 'g')"
    x = f"regexp_replace({x}, '{P_BLANKS}', chr(10), 'g')"
    return f"regexp_replace({x}, '{P_DOC_EDGE}', '', 'g')"


def extract_title_sql(c: str) -> str:
    t = f"regexp_extract({c}, '{P_TITLE}', 1)"
    t = _entities_sql(t)
    t = f"regexp_replace({t}, '[ \t\r\n]+', ' ', 'g')"
    t = f"regexp_replace({t}, '^ +| +$', '', 'g')"
    return f"NULLIF({t}, '')"


def link_density_sql(c: str, extracted: str) -> str:
    lens = (
        f"list_transform(regexp_extract_all({c}, '{P_ANCHOR}', 1), "
        f"a -> len(regexp_replace(a, '{P_TAG}', '', 'g')))"
    )
    # COALESCE covers the empty-anchor list (sum of [] is NULL in DuckDB,
    # 0 in Spark's fold); the outer CASE keeps NULL html → NULL density
    # like the Spark side
    return (
        f"CASE WHEN {c} IS NULL THEN NULL ELSE "
        f"ROUND(CAST(COALESCE(list_aggregate({lens}, 'sum'), 0) AS DOUBLE)"
        f" / GREATEST(1, len({extracted})), 4) END"
    )


# ---------------------------------------------------------------------------
# Pure-Python twin (unit tests pin three-engine agreement)
# ---------------------------------------------------------------------------


def strip_html_py(html: str | None) -> str | None:
    if html is None:
        return None
    x = re.sub(P_SCRIPT, "", html)
    x = re.sub(P_STYLE, "", x)
    x = re.sub(P_COMMENT, "", x)
    x = re.sub(P_BLOCK, "\n", x)
    x = re.sub(P_TAG, "", x)
    for ent, rep in ENTITIES:
        x = x.replace(ent, rep)
    x = re.sub(P_HSPACE, " ", x)
    x = re.sub(P_LINE_EDGE, "", x)
    x = re.sub(P_BLANKS, "\n", x)
    return re.sub(P_DOC_EDGE, "", x)
