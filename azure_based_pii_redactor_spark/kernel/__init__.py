"""Pure-Python PII detection/redaction kernel.

No Spark imports allowed in this subpackage: the same code is executed
(a) inside vectorized pandas UDFs on executors and (b) single-process as
the differential-test oracle. One source of truth, exercised two ways
(SURVEY.md section 5 item 1).
"""

from .entities import Entity, canonical_sort, deduplicate
from .patterns import PATTERNS, detect_pii
from .redact import RedactOptions, apply_redaction, resolve_replacement
from .scrub import scrub_text

__all__ = [
    "Entity",
    "PATTERNS",
    "RedactOptions",
    "apply_redaction",
    "canonical_sort",
    "deduplicate",
    "detect_pii",
    "resolve_replacement",
    "scrub_text",
]
