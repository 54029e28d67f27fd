"""Entity model and canonical ordering.

Reference: ``Entity`` struct at
``redactify/backend/internal/pii/detector.go:22-29`` -- a byte-offset span
annotation ``{Type, Text, Start, End, Confidence, Category}``.

Determinism resolution (SURVEY.md section 7 "hard parts"): the reference
iterates a Go map (random order, ``patterns.go:202``) and splices with an
unstable sort, so its output ordering is unspecified run-to-run.  We define
the canonical total order ``(start, end, type)`` applied identically in the
oracle and in the Spark kernel, which resolves that unspecified behavior
deterministically.

Offsets are Python codepoint offsets (the reference uses Go byte offsets;
for ASCII text they coincide -- documented divergence for non-ASCII, both
sides of our differential test use codepoints so the contract holds).
"""

from __future__ import annotations

from typing import NamedTuple


class Entity(NamedTuple):
    type: str
    text: str
    start: int
    end: int
    confidence: float
    category: str


def canonical_sort(entities: list[Entity]) -> list[Entity]:
    """Total order (start, end, type) -- see module docstring."""
    return sorted(entities, key=lambda e: (e.start, e.end, e.type))


def deduplicate(entities: list[Entity]) -> list[Entity]:
    """First-wins dedup on key ``(start, end, type)``.

    Mirrors ``detector.go:418-431`` (``"%d-%d-%s"`` key).  Two entities with
    the same span but different types BOTH survive -- that is reference
    behavior and is preserved.
    """
    seen: set[tuple[int, int, str]] = set()
    unique: list[Entity] = []
    for e in entities:
        key = (e.start, e.end, e.type)
        if key not in seen:
            seen.add(key)
            unique.append(e)
    return unique
