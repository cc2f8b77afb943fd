"""Text-quality column expressions (Gopher/C4-style heuristics).

These are the Spark recast of the reference's validity predicates — the
"present AND non-null AND non-empty" family (``diagnosis_analysis.py:41-46``,
``cpt_code_analysis.py:14``; SURVEY §1.3 quirk 1) and the validity
conjunction ``_validate_stats`` (``additional_charge_checks.py:840-868``,
SURVEY F14) — extended with the north-star heuristic rules: token counts,
symbol/stopword ratios, repetition, length bounds.

Everything here is a **pure Column expression** (JVM-side, whole-stage
codegen; zero Python in the hot path).  For every expression there is a
``*_sql`` twin that renders the semantically identical DuckDB SQL, generated
from the same constants, so the correctness oracle cannot drift from the
engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# English stopwords used for the stopword-ratio rule. Small closed-class list
# (C4 uses a similar tiny list); order matters nowhere, membership only.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "were", "be", "on", "for", "with", "that", "this", "it", "as",
)

# Toxicity blocklist (placeholder tokens; real deployments swap the list —
# the mechanism, token-membership matching, is what is under test).
TOXICITY_WORDS: tuple[str, ...] = ("swearword1", "swearword2", "slur1", "slur2", "curse")

# Default keep/drop thresholds (analogue of MAppSettings defaults,
# ``ai_core/feature_readiness/appsettings.py:51-128``).
MIN_CHARS = 10
MAX_CHARS = 10_000
MIN_TOKENS = 3
MAX_TOKENS = 5_000
MAX_SYMBOL_RATIO = 0.30
MIN_STOPWORD_RATIO = 0.01
MIN_DISTINCT_RATIO = 0.20
MAX_MEAN_WORD_LEN = 15.0
MIN_MEAN_WORD_LEN = 2.0

_WS = r"\s+"
_NON_ALNUM_SPACE = "[^a-zA-Z0-9 ]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text ('' → empty array)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, _WS)
    )


def n_tokens(col: Column) -> Column:
    return F.size(tokens(col))


def n_chars(col: Column) -> Column:
    return F.coalesce(F.length(col), F.lit(0))


# BPE-ish subword tokenizer pattern (GPT-2 family, lookahead-free so the
# same pattern is valid in both Java regex and RE2): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
# This is THE token unit training pipelines budget with (q42 fertility, q54
# token-budget sampling).
BPE_PAT = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(col: Column) -> Column:
    """Subword token count via ``regexp_count`` — JVM-side codegen, no
    UDF; NULL text → 0 (the pinned NULL-cost rule of the samplers)."""
    return F.coalesce(
        F.regexp_count(col, F.lit(BPE_PAT)).cast("long"), F.lit(0)
    )


def bpe_token_count_sql(c: str) -> str:
    """DuckDB twin of :func:`bpe_token_count`."""
    pat = BPE_PAT.replace("'", "''")
    return (
        f"COALESCE(CAST(len(regexp_extract_all({c}, '{pat}')) AS BIGINT), 0)"
    )


_ALNUM_SPACE = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
)


def symbol_ratio(col: Column) -> Column:
    """Fraction of characters that are not [a-zA-Z0-9 ] (0.0 for empty).
    translate() deletes the allowed alphabet via table lookup — ~6x faster
    than a per-character regexp."""
    total = F.length(col)
    symbols = F.length(F.translate(col, _ALNUM_SPACE, ""))
    return F.when(
        total.isNull() | (total == 0), F.lit(0.0)
    ).otherwise(symbols.cast("double") / total.cast("double"))


def token_set_pattern(words: tuple[str, ...]) -> str:
    """Java-regex pattern matching a whole whitespace-token from `words`.
    Zero-width boundaries (lookaround) so consecutive stopword tokens are
    all counted.  Counting via regexp_count is whole-stage-codegen-friendly;
    the higher-order-function formulation (filter + isin) is a
    CodegenFallback expression that re-evaluates its split() child
    interpreted on every call — ~10× slower in the fused rule projection."""
    alternatives = "|".join(sorted(words))
    return rf"(?<=^|\s)({alternatives})(?=\s|$)"


def stopword_count(col: Column, words: tuple[str, ...] = STOPWORDS) -> Column:
    """Number of (lowercased) tokens that are in `words`."""
    return F.regexp_count(F.lower(F.trim(col)), F.lit(token_set_pattern(words)))


def stopword_ratio(col: Column) -> Column:
    """Fraction of (lowercased) tokens that are in STOPWORDS (0.0 for empty)."""
    n = n_tokens(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_count(col).cast("double") / n.cast("double")
    )


def distinct_token_ratio(col: Column) -> Column:
    """|distinct tokens| / |tokens| — repetition detector (1.0 for empty)."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    return F.when(n == 0, F.lit(1.0)).otherwise(
        F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    )


def mean_word_len(col: Column) -> Column:
    """Mean token length (0.0 for empty).  Σ|token| == |trimmed text| minus
    its whitespace chars — pure counting, no intermediate string."""
    n = n_tokens(col)
    t = F.trim(col)
    total = F.length(t) - F.regexp_count(t, F.lit(r"\s"))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        total.cast("double") / n.cast("double")
    )


def has_toxicity(col: Column) -> Column:
    return F.lower(col).rlike(token_set_pattern(TOXICITY_WORDS))


def is_blank(col: Column) -> Column:
    """The reference's tri-state missing/null/'' collapse (SURVEY §1.2):
    missing ∨ null ∨ '' → one predicate.  diagnosis_analysis.py:41-46."""
    return col.isNull() | (F.trim(col) == "")


def keep_verdict(col: Column) -> Column:
    """Gopher/C4-style keep/drop conjunction over a text column.

    The record-level analogue of the reference's CheckResult pass/fail
    (``base_standalone.py:44-66``): every sub-rule is a boolean column and
    keep = AND of all of them.
    """
    nc, nt = n_chars(col), n_tokens(col)
    mwl = mean_word_len(col)
    return (
        ~is_blank(col)
        & nc.between(MIN_CHARS, MAX_CHARS)
        & nt.between(MIN_TOKENS, MAX_TOKENS)
        & (symbol_ratio(col) <= MAX_SYMBOL_RATIO)
        & (stopword_ratio(col) >= MIN_STOPWORD_RATIO)
        & (distinct_token_ratio(col) >= MIN_DISTINCT_RATIO)
        & mwl.between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        & ~has_toxicity(col)
    )


# ---------------------------------------------------------------------------
# DuckDB SQL twins — rendered from the SAME constants.
# ---------------------------------------------------------------------------

def _sql_tokens(c: str) -> str:
    return (
        f"CASE WHEN length(trim({c})) = 0 THEN []::VARCHAR[] "
        f"ELSE string_split_regex(trim({c}), '\\s+') END"
    )


def n_tokens_sql(c: str) -> str:
    return f"len({_sql_tokens(c)})"


def symbol_ratio_sql(c: str) -> str:
    return (
        f"CASE WHEN {c} IS NULL OR length({c}) = 0 THEN 0.0 "
        f"ELSE (length({c}) - length(regexp_replace({c}, '{_NON_ALNUM_SPACE}', '', 'g')))"
        f"::DOUBLE / length({c}) END"
    )


def _sql_in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def stopword_ratio_sql(c: str) -> str:
    toks = _sql_tokens(f"lower({c})")
    return (
        f"CASE WHEN len({toks}) = 0 THEN 0.0 "
        f"ELSE len(list_filter({toks}, t -> t IN ({_sql_in_list(STOPWORDS)})))::DOUBLE"
        f" / len({toks}) END"
    )


def distinct_token_ratio_sql(c: str) -> str:
    toks = _sql_tokens(f"lower({c})")
    return (
        f"CASE WHEN len({toks}) = 0 THEN 1.0 "
        f"ELSE len(list_distinct({toks}))::DOUBLE / len({toks}) END"
    )


def mean_word_len_sql(c: str) -> str:
    toks = _sql_tokens(c)
    return (
        f"CASE WHEN len({toks}) = 0 THEN 0.0 "
        f"ELSE list_sum(list_transform({toks}, t -> length(t)))::DOUBLE / len({toks}) END"
    )


def has_toxicity_sql(c: str) -> str:
    toks = _sql_tokens(f"lower({c})")
    return f"len(list_filter({toks}, t -> t IN ({_sql_in_list(TOXICITY_WORDS)}))) > 0"


def is_blank_sql(c: str) -> str:
    return f"({c} IS NULL OR trim({c}) = '')"


def keep_verdict_sql(c: str) -> str:
    return (
        f"(NOT {is_blank_sql(c)} "
        f"AND coalesce(length({c}), 0) BETWEEN {MIN_CHARS} AND {MAX_CHARS} "
        f"AND {n_tokens_sql(c)} BETWEEN {MIN_TOKENS} AND {MAX_TOKENS} "
        f"AND {symbol_ratio_sql(c)} <= {MAX_SYMBOL_RATIO} "
        f"AND {stopword_ratio_sql(c)} >= {MIN_STOPWORD_RATIO} "
        f"AND {distinct_token_ratio_sql(c)} >= {MIN_DISTINCT_RATIO} "
        f"AND {mean_word_len_sql(c)} BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN} "
        f"AND NOT {has_toxicity_sql(c)})"
    )


# ---------------------------------------------------------------------------
# Pinned whitespace tokenizer — ONE definition per engine, shared by the
# repetition metrics and the caption-alignment gate (a drift here would
# silently desynchronize their token streams).  `\s` is ASCII-only in
# BOTH Java regex and DuckDB's RE2 (the U+00A0 lesson in repetition.py's
# kernel notes); empty tokens from leading/trailing/repeated whitespace
# are filtered on both sides.
# ---------------------------------------------------------------------------

WS_TOKENS_SPARK = "filter(split(lower(trim({c})), '\\\\s+'), t -> t != '')"
WS_TOKENS_DUCK = (
    "list_filter(string_split_regex(lower(trim({c})), '\\s+'), "
    "t -> t != '')"
)
