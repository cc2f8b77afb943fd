"""Centralized pipeline settings — the Spark recast of the reference's
app-settings singleton (``ai_core/feature_readiness/appsettings.py:14-160``:
``MAppSettings{stats_settings, readiness_settings}`` with per-threshold
defaults) and of Check 1, App Settings Validation
(``ai_core/feature_readiness/checks/charge_analysis_checks.py:135-350``:
document exists → sections present → required fields present → threshold
values valid → pass).

Spark-first design: thresholds become **plan literals**.  A frozen dataclass
is resolved driver-side once and every rule expression embeds the values as
constants, so Catalyst constant-folds them into whole-stage codegen — there
is nothing per-row to ship.  The only things broadcast to executors are the
*model weights* (langid / char-LM, see ``functions/langid.py``) and the
settings object captured by the image-validator UDF closure (a few ints).

``validate_settings`` mirrors Check 1's five steps over a raw settings
*document* (dict — the Mongo-document analogue), returning one CheckResult
row; ``settings_from_doc`` then materializes the typed object the rest of
the engine consumes.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

from .functions import langid as LI
from .functions import perplexity as PX
from .functions import quality_clf as QC
from .functions import text as TX
from .operators import images as IM


@dataclass(frozen=True)
class PipelineSettings:
    """Every keep/drop threshold the pipeline consumes (readiness_settings
    analogue, appsettings.py:51-128 — field-per-threshold with defaults)."""

    # caption heuristics (Gopher/C4 rules)
    min_chars: int = TX.MIN_CHARS
    max_chars: int = TX.MAX_CHARS
    min_tokens: int = TX.MIN_TOKENS
    max_tokens: int = TX.MAX_TOKENS
    max_symbol_ratio: float = TX.MAX_SYMBOL_RATIO
    min_stopword_ratio: float = TX.MIN_STOPWORD_RATIO
    min_distinct_ratio: float = TX.MIN_DISTINCT_RATIO
    min_mean_word_len: float = TX.MIN_MEAN_WORD_LEN
    max_mean_word_len: float = TX.MAX_MEAN_WORD_LEN
    # model-score gates
    min_lang_confidence: float = LI.MIN_CONFIDENCE
    max_perplexity: float = PX.MAX_PERPLEXITY
    min_quality_score: float = QC.MIN_QUALITY_SCORE
    # image bounds
    min_dim: int = IM.MIN_DIM
    max_dim: int = IM.MAX_DIM


DEFAULT_SETTINGS = PipelineSettings()

# (field, "must be > 0" | "ratio") — value validators, Check 1 step 4
# (charge_analysis_checks.py:279-318: positive thresholds, ratios in (0,1]).
_POSITIVE = (
    "min_chars", "max_chars", "min_tokens", "max_tokens",
    "min_mean_word_len", "max_mean_word_len", "max_perplexity",
    "min_dim", "max_dim",
)
_RATIO = ("max_symbol_ratio", "min_stopword_ratio", "min_distinct_ratio",
          "min_quality_score")

_REQUIRED_SECTIONS = ("stats_settings", "readiness_settings")
_REQUIRED_FIELDS = tuple(f.name for f in dataclasses.fields(PipelineSettings))


def default_doc() -> dict[str, Any]:
    """The settings *document* with all defaults (what Check 1 reads)."""
    return {
        "stats_settings": {"payer_field": "payer"},
        "readiness_settings": dataclasses.asdict(DEFAULT_SETTINGS),
    }


def validate_settings(doc: dict[str, Any] | None) -> dict[str, Any]:
    """Check 1: App Settings Validation (charge_analysis_checks.py:135-350).

    Five steps, first hard failure short-circuits exactly like the
    reference: [1] document exists, [2] required sections present,
    [3] required fields present, [4] threshold values valid, [5] pass.
    Always severity=critical on failure (the reference's only critical
    early-exit trigger, charge_analysis_checks.py:87-90).
    """
    def result(status: str, description: str, solution: str | None = None):
        return {
            "key": "app_settings_validation",
            "name": "App Settings Validation",
            "status": status,
            "severity": "critical" if status == "failed" else None,
            "description": description,
            "solution": solution,
        }

    # step 1: document exists
    if doc is None:
        return result(
            "failed", "app_settings document not found",
            "Create the app_settings document",
        )

    # step 2: required sections
    issues = [
        f"{s} missing" for s in _REQUIRED_SECTIONS if not doc.get(s)
    ]
    if issues:
        return result(
            "failed", "; ".join(issues), "Fix missing sections in app_settings"
        )
    rs = doc["readiness_settings"]

    # step 3: required fields
    if not doc["stats_settings"].get("payer_field"):
        issues.append("payer_field missing or empty")
    issues += [f"{f} missing" for f in _REQUIRED_FIELDS if f not in rs]

    # step 4: threshold values
    for f in _POSITIVE:
        if f in rs and rs[f] <= 0:
            issues.append(f"{f} must be > 0")
    for f in _RATIO:
        if f in rs and not (0 < rs[f] <= 1):
            issues.append(f"{f} must be between 0 and 1")
    if "min_chars" in rs and "max_chars" in rs and rs["min_chars"] > rs["max_chars"]:
        issues.append("min_chars must be <= max_chars")

    if issues:
        return result(
            "failed", "; ".join(issues), "Fix invalid values in app_settings"
        )

    # step 5: pass
    return result("passed", "All validations passed")


def settings_from_doc(doc: dict[str, Any]) -> PipelineSettings:
    """Materialize the typed settings the engine consumes.  Callers must
    run :func:`validate_settings` first (Check 1 gates the pipeline)."""
    check = validate_settings(doc)
    if check["status"] != "passed":
        raise ValueError(f"invalid app_settings: {check['description']}")
    rs = doc["readiness_settings"]
    return PipelineSettings(**{f: rs[f] for f in _REQUIRED_FIELDS})
