"""Review/export redaction path: recompute scrubbed text from STORED
entities honoring human approvals (the reference's second query engine,
SURVEY.md section 3.3).

Reference: ``buildRowRedaction`` ``file.go:1071-1133`` (approval/skip
filter, reverse-start sort, dual bounds check against original AND current
string), ``resolveReplacement`` ``file.go:1145-1175`` (export-variant
fallback ``[REDACTED_<TYPE>]``; custom label must be non-empty), and the
per-cell containment join J4 ``file.go:1898-1916`` (entity relevant to a
cell iff ``cell contains entity.text``; row-level offsets then spliced
against the CELL string -- a reference quirk preserved only in
``compat`` mode, the canonical mode re-scrubs the cell directly).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from .entities import Entity
from .redact import DEFAULT_LABELS


def resolve_replacement_export(
    entity: Entity, redaction_mode: str, custom_labels: Mapping[str, str]
) -> str:
    """file.go:1145-1175 -- differs from the detector variant in (a) empty
    custom labels are ignored and (b) the final fallback is
    ``[REDACTED_<UPPER(TYPE)>]`` for non-empty types."""
    label = custom_labels.get(entity.type)
    if label:  # empty string does NOT override (file.go:1146)
        return label
    label = DEFAULT_LABELS.get(entity.type)
    if label is not None:
        return label
    if redaction_mode == "mask":
        return "*" * len(entity.text)
    if redaction_mode == "remove":
        return ""
    if entity.type:
        return f"[REDACTED_{entity.type.upper()}]"
    return "[REDACTED]"


def build_row_redaction(
    original: str,
    entities: Sequence[tuple[Entity, int, bool]],
    redaction_mode: str = "replace",
    custom_labels: Mapping[str, str] | None = None,
    skip_ids: frozenset[int] | None = None,
) -> tuple[str, int]:
    """file.go:1071-1133.  ``entities`` are ``(entity, entity_id,
    approved)`` triples; when ``skip_ids`` is given it OVERRIDES the stored
    approved flag (request-level override, file.go:1079-1082).  Returns
    ``(redacted, n_applied)``."""
    custom_labels = custom_labels or {}
    if not entities:
        return original, 0
    replacements: list[Entity] = []
    for entity, entity_id, approved in entities:
        if skip_ids is not None:
            approved = entity_id not in skip_ids
        if approved:
            replacements.append(entity)
    if not replacements:
        return original, 0
    # reverse-start with canonical tiebreak (reference sort.Slice is
    # unstable on equal starts -- SURVEY.md section 7 determinism note)
    replacements.sort(key=lambda e: (e.start, e.end, e.type), reverse=True)
    redacted = original
    for entity in replacements:
        if entity.start < 0 or entity.end > len(original) or entity.start >= entity.end:
            continue  # bounds vs ORIGINAL (file.go:1103)
        if entity.start >= len(redacted) or entity.end > len(redacted):
            continue  # bounds vs CURRENT (file.go:1115)
        replacement = resolve_replacement_export(
            entity, redaction_mode, custom_labels
        )
        redacted = redacted[: entity.start] + replacement + redacted[entity.end :]
    return redacted, len(replacements)


def redact_cell_value_anchored(
    cell: str,
    entities: Sequence[tuple[Entity, int, bool]],
    redaction_mode: str = "replace",
    custom_labels: Mapping[str, str] | None = None,
    skip_ids: frozenset[int] | None = None,
) -> str:
    """Canonical per-cell export: stored entities RE-ANCHORED to the cell.

    The reference's containment splice (below) applies ROW-level offsets to
    the cell string -- correct only for the first cell.  The canonical mode
    instead locates every occurrence of each approved entity's text within
    the cell (case-sensitive, like the J4 containment test) and splices at
    the CELL-local offsets -- so human approvals, training-injected
    entities, and custom labels are all honored with correct positions.
    """
    anchored: list[tuple[Entity, int, bool]] = []
    for entity, entity_id, approved in entities:
        if skip_ids is not None:
            approved = entity_id not in skip_ids
        if not approved or not entity.text:
            continue
        start = 0
        while True:
            idx = cell.find(entity.text, start)
            if idx == -1:
                break
            end = idx + len(entity.text)
            anchored.append(
                (entity._replace(start=idx, end=end), entity_id, True)
            )
            start = end
    if not anchored:
        return cell
    redacted, _ = build_row_redaction(
        cell, anchored, redaction_mode, custom_labels, None
    )
    return redacted


def redact_cell_value(
    cell: str,
    entities: Sequence[tuple[Entity, int, bool]],
    redaction_mode: str = "replace",
    custom_labels: Mapping[str, str] | None = None,
    skip_ids: frozenset[int] | None = None,
) -> str:
    """J4 containment redaction, compat mode (file.go:1898-1916): entities
    whose TEXT substring-matches the cell are spliced into the cell using
    their ROW-level offsets (bounds checks silently drop out-of-range ones
    -- reference quirk, preserved byte-for-byte)."""
    relevant = [
        (e, eid, ap) for (e, eid, ap) in entities if e.text in cell
    ]
    if not relevant:
        return cell
    redacted, _ = build_row_redaction(
        cell, relevant, redaction_mode, custom_labels, skip_ids
    )
    return redacted
