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
    """detector.go:319-389 -- inject entities for trained 'correct' texts."""
    training_entities: list[Entity] = []
    lower_text = text.lower()
    for feedback in feedback_history:
        if feedback.get("user_decision") != "correct":
            continue
        entity_text = str(feedback["entity_text"])
        entity_type = str(feedback["entity_type"])
        lower_entity = entity_text.lower()
        if not lower_entity:
            continue
        start_index = 0
        while True:
            index = lower_text.find(lower_entity, start_index)
            if index == -1:
                break
            end = index + len(entity_text)
            training_entities.append(
                Entity(
                    type=entity_type,
                    text=text[index:end],  # original case (detector.go:371)
                    start=index,
                    end=end,
                    confidence=0.95,
                    category=entity_type,
                )
            )
            start_index = end
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
