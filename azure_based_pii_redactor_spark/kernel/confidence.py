"""Weighted multi-signal confidence scoring.

Reference: ``redactify/backend/internal/pii/confidence_scoring.go``.
- Signal weights ``:67-73``: azure 0.4, gpt 0.3, pattern 0.15, context 0.1,
  historical 0.05; training feedback gets weight 0.4 when an exact match is
  found (``:160-173``).
- Pattern-match prior ``:239-263``.
- Contextual-keyword scoring ``:266-307``: base 0.5; -0.2 if business
  keyword hits exceed sensitive hits; +0.3 if sensitive exceed business;
  clamp [0,1].
- Historical accuracy ``:310-318``: TP/Total per type, default 0.5.
- Weighted average ``:321-335``: sum(v*w)/sum(w), default 0.5 on zero
  weight; final clamp [0,1] (``:189``).
- GPT signal inversion ``:110-115``: value = conf if (is_real_pii and
  should_redact) else 1-conf.  GPT stage is disabled by default in this
  engine (no external services); the signal slot is kept pluggable.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

from .entities import Entity
from .training import FeedbackRecord, get_training_feedback

SIGNAL_WEIGHTS: dict[str, float] = {
    "azure_confidence": 0.4,
    "gpt_validation": 0.3,
    "pattern_match": 0.15,
    "context_analysis": 0.1,
    "historical_accuracy": 0.05,
}
TRAINING_WEIGHT = 0.4  # confidence_scoring.go:166

# confidence_scoring.go:239-263.
_PATTERN_PRIORS: dict[str, float] = {
    "email": 0.95,
    "phone": 0.90,
    "phone_us": 0.90,
    "ssn": 0.98,
    "credit_card": 0.92,
    "ip_address": 0.85,
    "url": 0.80,
}
_DEFAULT_PRIOR = 0.70

# confidence_scoring.go:270-281.
BUSINESS_KEYWORDS: tuple[str, ...] = (
    "company", "business", "organization", "department",
    "contact", "support", "sales", "marketing", "hr",
    "example", "sample", "test", "demo", "placeholder",
)
SENSITIVE_KEYWORDS: tuple[str, ...] = (
    "customer", "client", "patient", "employee", "user",
    "personal", "private", "confidential", "ssn", "social",
)


class Signal(NamedTuple):
    name: str
    value: float
    weight: float
    source: str


def pattern_match_score(entity_type: str) -> float:
    """confidence_scoring.go:239-263."""
    return _PATTERN_PRIORS.get(entity_type, _DEFAULT_PRIOR)


def context_score(context: str) -> float:
    """confidence_scoring.go:266-307."""
    score = 0.5
    lower = context.lower()
    business = sum(1 for k in BUSINESS_KEYWORDS if k in lower)
    sensitive = sum(1 for k in SENSITIVE_KEYWORDS if k in lower)
    if business > sensitive:
        score -= 0.2
    elif sensitive > business:
        score += 0.3
    return max(0.0, min(1.0, score))


def weighted_average(signals: Sequence[Signal]) -> float:
    """confidence_scoring.go:321-335."""
    total_weight = sum(s.weight for s in signals)
    if total_weight == 0:
        return 0.5
    return sum(s.value * s.weight for s in signals) / total_weight


def calculate_confidence(
    entity: Entity,
    context: str,
    feedback_history: Sequence[FeedbackRecord] = (),
    historical_accuracy: float | None = None,
    gpt_validation: tuple[bool, bool, float] | None = None,
) -> tuple[float, list[Signal]]:
    """``CalculateConfidence`` -- confidence_scoring.go:90-203.

    ``gpt_validation`` is ``(is_real_pii, should_redact, confidence)`` when
    the (disabled-by-default) GPT stage supplies a verdict.
    Returns ``(adjusted_confidence, signals)``.
    """
    signals: list[Signal] = [
        Signal("azure_confidence", entity.confidence,
               SIGNAL_WEIGHTS["azure_confidence"], "azure"),
    ]
    if gpt_validation is not None:
        is_real, should_redact, conf = gpt_validation
        gpt_score = conf if (is_real and should_redact) else 1.0 - conf
        signals.append(
            Signal("gpt_validation", gpt_score,
                   SIGNAL_WEIGHTS["gpt_validation"], "gpt")
        )
    signals.append(
        Signal("pattern_match", pattern_match_score(entity.type),
               SIGNAL_WEIGHTS["pattern_match"], "pattern")
    )
    signals.append(
        Signal("context_analysis", context_score(context),
               SIGNAL_WEIGHTS["context_analysis"], "context")
    )
    training_score, found = get_training_feedback(
        entity.text, entity.type, feedback_history
    )
    if found:
        signals.append(
            Signal("training_feedback", training_score,
                   TRAINING_WEIGHT, "user_training")
        )
    hist = 0.5 if historical_accuracy is None else historical_accuracy
    signals.append(
        Signal("historical_accuracy", hist,
               SIGNAL_WEIGHTS["historical_accuracy"], "feedback")
    )
    adjusted = max(0.0, min(1.0, weighted_average(signals)))
    return adjusted, signals
