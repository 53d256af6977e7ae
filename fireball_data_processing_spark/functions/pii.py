"""PII detection and redaction — a standard pre-training scrub stage.

Training-data pipelines strip personally-identifiable strings (emails,
phone numbers, IP addresses) before corpora leave the ingest tier; the
reference repo's analog is its author-id anonymization pass
(``scripts/anonymize.py``), which this module generalizes from Discord
snowflakes to free-text PII.

Everything is pure JVM expressions (chained ``regexp_replace`` /
``regexp_extract_all``) — codegen-resident, no UDFs — and the patterns are
deliberately conservative regex syntax (no lookaround) so RE2-based
engines (DuckDB) produce byte-identical results, which makes the scrub
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pattern order matters for redaction: emails first (may contain digit
# runs), then phones (dot/dash separated), then bare IPv4s. The same
# three patterns, applied in the same order, reproduce in DuckDB with the
# 'g' flag.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PATTERNS = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ip", IPV4_RE, "[IP]"),
)


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-kind occurrence counts on the RAW text (before redaction):
    ``{"n_email": ..., "n_phone": ..., "n_ip": ...}``. Null text yields
    null counts (unscanned, not zero)."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("bigint")
        for name, pat, _ in _PATTERNS
    }


def redact_pii(c: Column) -> Column:
    """Replace every email/phone/IPv4 occurrence with its typed
    placeholder, in the fixed ``_PATTERNS`` order."""
    out = c
    for _, pat, token in _PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out
