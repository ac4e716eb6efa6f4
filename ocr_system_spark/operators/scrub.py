"""PII scrubbing — the redaction pass every training-data pipeline runs
before publishing text (emails, IPv4 addresses, phone-like numbers →
typed placeholder tokens).

Pure JVM execution: a chain of ``regexp_replace`` expressions — no Python
in the hot path, whole-stage-codegen friendly, and the patterns are
deliberately restricted to the regex subset on which Java's engine and
RE2 (the DuckDB oracle) agree byte-for-byte: character classes,
bounded/unbounded repetition, non-capturing groups, ``\\b`` word
boundaries. No backrefs, no lookaround.

Pattern notes (standard public shapes):
* email — local part ``[A-Za-z0-9._%+-]+`` @ dotted domain with a 2+ alpha
  TLD; anchored by ``\\b`` so punctuation stays outside the redaction;
* ipv4 — four 1-3 digit octets (syntactic scrub: over-matching versions
  like 999.1.1.1 is the safe direction for redaction);
* phone — international/us-ish shapes: optional +CC, separators -, space,
  ., optional (area); at least 7 digits total via the core groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters: emails before phones so a
# numeric local part is not half-eaten by the phone pattern
PII_PATTERNS = [
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "[EMAIL]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    # country code optional as ONE group (a leading \b cannot sit before
    # '+', which is a non-word char); over-matching digit runs is the safe
    # direction for a scrubber
    ("phone", r"(?:\+[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b",
     "[PHONE]"),
]


def scrub_expr(col: Column) -> Column:
    out = col
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def with_pii_scrubbed(df: DataFrame, text_col: str = "text",
                      out_col: str = "scrubbed") -> DataFrame:
    """Adds the redacted text plus per-kind hit counts (the counts are what
    a curation dashboard monitors; they are integers, so the cross-engine
    comparison is exact)."""
    out = df.withColumn(out_col, scrub_expr(F.col(text_col)))
    for name, pat, _repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))))
    return out
