"""Training-feedback entity injection and exact-match confidence lookup.

Reference:
- ``applyTrainingFeedback`` at ``detector.go:319-389``: for every feedback
  record with ``UserDecision == "correct"``, find ALL case-insensitive
  occurrences of ``EntityText`` in the document; each occurrence becomes an
  entity ``{Type: feedback.EntityType, Confidence: 0.95,
  Category: feedback.EntityType}`` carrying the ORIGINAL-case matched text.
- ``getTrainingFeedback`` at ``confidence_scoring.go:211-236``: scan the
  feedback history newest-to-oldest; the first exact ``(EntityText,
  EntityType)`` match decides -- ``correct`` -> 0.95, anything else -> 0.05
  ("latest-feedback-wins", SURVEY.md W5).

Feedback records are plain dicts with keys mirroring ``FeedbackRecord``
(``confidence_scoring.go:36-45``): ``entity_text, entity_type,
original_score, user_decision, user_confidence, context, timestamp,
session_id``.  In Spark the (small) feedback list is broadcast into the
scrub kernel -- equivalent to a broadcast nested-loop join (SURVEY.md J5).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from .entities import Entity

FeedbackRecord = Mapping[str, object]


def apply_training_feedback(
    text: str, feedback_history: Sequence[FeedbackRecord]
) -> list[Entity]:
    """detector.go:319-389 -- inject entities for trained 'correct' texts.

    Offsets are found with a case-insensitive regex over the ORIGINAL
    text, so spans are always valid in original-offset space.  (The
    reference lowers both strings and reuses the lowered index against the
    original -- for codepoints whose lowercase expands, e.g. Turkish
    U+0130, that shifts every later offset and leaks/corrupts spans; Go
    has the same defect.  Documented resolution: match in original space.
    For ASCII text the two are identical.)"""
    import re

    training_entities: list[Entity] = []
    for feedback in feedback_history:
        if feedback.get("user_decision") != "correct":
            continue
        entity_text = str(feedback["entity_text"])
        entity_type = str(feedback["entity_type"])
        if not entity_text:
            continue
        pattern = re.compile(re.escape(entity_text), re.IGNORECASE)
        for m in pattern.finditer(text):
            training_entities.append(
                Entity(
                    type=entity_type,
                    text=m.group(0),  # original case (detector.go:371)
                    start=m.start(),
                    end=m.end(),
                    confidence=0.95,
                    category=entity_type,
                )
            )
    return training_entities


def get_training_feedback(
    entity_text: str,
    entity_type: str,
    feedback_history: Sequence[FeedbackRecord],
) -> tuple[float, bool]:
    """confidence_scoring.go:211-236 -- latest exact match wins."""
    for feedback in reversed(feedback_history):
        if (
            feedback.get("entity_text") == entity_text
            and feedback.get("entity_type") == entity_type
        ):
            if feedback.get("user_decision") == "correct":
                return 0.95, True
            return 0.05, True
    return 0.0, False
