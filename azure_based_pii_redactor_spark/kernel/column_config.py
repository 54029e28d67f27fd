"""Column-level entity filtering: thresholds, modes, white/blacklists.

Reference: ``redactify/backend/internal/pii/column_config.go``.
- ``ColumnConfig`` struct ``:73-99`` (defaults ``:126-136``: mode balanced,
  min_confidence 0.7).
- ``ApplyColumnFiltering`` ``:142-196``: disabled short-circuit, confidence
  threshold, type exclusion, whitelist suppression, mode gate, per-type
  entity rules (custom replacement overwrites entity.text), then blacklist
  injection appended AFTER filtering (always redacted).
- Detection-mode gate ``:267-283``: aggressive conf>0.5, balanced conf>0.7,
  conservative conf>0.9, custom -> drop all, disabled -> drop all.
- Whitelist ``:244-264``: regex (``(?i)`` when case-insensitive) MatchString
  i.e. *search* semantics, or literal contains (case-folded when
  insensitive).
- Blacklist ``:286-329``: regex -> find ALL matches; literal -> FIRST
  occurrence only (reference uses strings.Index once).  Matches become
  ``Entity{type:"blacklisted", confidence:1.0, category:"custom"}``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .entities import Entity, canonical_sort


@dataclass(frozen=True)
class EntityRule:
    """column_config.go:64-71."""

    enabled: bool = True
    confidence_threshold: float = 0.0
    custom_replacement: str | None = None


@dataclass(frozen=True)
class ListPattern:
    """Whitelist/blacklist pattern -- column_config.go:44-58."""

    pattern: str
    is_regex: bool = False
    case_sensitive: bool = False


@dataclass
class ColumnConfig:
    """column_config.go:73-99 with defaults from :126-136."""

    column_name: str = ""
    detection_mode: str = "balanced"
    min_confidence: float = 0.7
    entity_rules: dict[str, EntityRule] = field(default_factory=dict)
    whitelist_patterns: list[ListPattern] = field(default_factory=list)
    blacklist_patterns: list[ListPattern] = field(default_factory=list)
    excluded_entity_types: frozenset[str] = frozenset()

    def __post_init__(self) -> None:
        # Compile once (column_config.go:199-230); per-process, not per-cell.
        self._wl_compiled = [
            re.compile(p.pattern if p.case_sensitive else "(?i)" + p.pattern)
            if p.is_regex
            else None
            for p in self.whitelist_patterns
        ]
        self._bl_compiled = [
            re.compile(p.pattern if p.case_sensitive else "(?i)" + p.pattern)
            if p.is_regex
            else None
            for p in self.blacklist_patterns
        ]

    # -- predicates -------------------------------------------------------

    def _is_whitelisted(self, text: str) -> bool:
        """column_config.go:244-264."""
        for pat, compiled in zip(self.whitelist_patterns, self._wl_compiled):
            if pat.is_regex:
                if compiled is not None and compiled.search(text):
                    return True
            elif pat.case_sensitive:
                if pat.pattern in text:
                    return True
            elif pat.pattern.lower() in text.lower():
                return True
        return False

    def _passes_mode(self, entity: Entity) -> bool:
        """column_config.go:267-283."""
        mode = self.detection_mode
        if mode == "aggressive":
            return entity.confidence > 0.5
        if mode == "conservative":
            return entity.confidence > 0.9
        if mode == "balanced":
            return entity.confidence > 0.7
        if mode in ("custom", "disabled"):
            return False
        return entity.confidence > 0.7

    def _blacklist_entities(self, text: str) -> list[Entity]:
        """column_config.go:286-329."""
        out: list[Entity] = []
        for pat, compiled in zip(self.blacklist_patterns, self._bl_compiled):
            if pat.is_regex:
                if compiled is None:
                    continue
                for m in compiled.finditer(text):
                    out.append(
                        Entity(
                            type="blacklisted",
                            text=text[m.start() : m.end()],
                            start=m.start(),
                            end=m.end(),
                            confidence=1.0,
                            category="custom",
                        )
                    )
            else:
                search_text = text if pat.case_sensitive else text.lower()
                needle = pat.pattern if pat.case_sensitive else pat.pattern.lower()
                index = search_text.find(needle)
                if index != -1:  # FIRST occurrence only (reference behavior)
                    out.append(
                        Entity(
                            type="blacklisted",
                            text=text[index : index + len(pat.pattern)],
                            start=index,
                            end=index + len(pat.pattern),
                            confidence=1.0,
                            category="custom",
                        )
                    )
        return out

    # -- main entry -------------------------------------------------------

    def apply_filtering(self, entities: list[Entity], text: str) -> list[Entity]:
        """column_config.go:142-196, preserving clause order exactly."""
        if self.detection_mode == "disabled":
            return []
        filtered: list[Entity] = []
        for entity in entities:
            if entity.confidence < self.min_confidence:
                continue
            if entity.type in self.excluded_entity_types:
                continue
            if self._is_whitelisted(entity.text):
                continue
            if not self._passes_mode(entity):
                continue
            rule = self.entity_rules.get(entity.type)
            if rule is not None:
                if not rule.enabled:
                    continue
                if entity.confidence < rule.confidence_threshold:
                    continue
                if rule.custom_replacement is not None:
                    # Reference overwrites entity.Text (column_config.go:184)
                    entity = entity._replace(text=rule.custom_replacement)
            filtered.append(entity)
        filtered.extend(self._blacklist_entities(text))
        return canonical_sort(filtered)


DEFAULT_COLUMN_CONFIG = ColumnConfig()
