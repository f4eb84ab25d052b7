"""PII detection / redaction for training-data curation.

A 100 TB web-text corpus is scrubbed for personally identifiable
information before training: e-mail addresses, international-format
phone numbers, IPv4 addresses. Everything here is pure Catalyst
(regexp_count / regexp_replace, whole-stage codegen) — this pass runs
over every byte of `documents.text`, a Python crossing is not
acceptable.

Pattern notes: the regexes are restricted to the syntax subset that
Java regex (Spark) and RE2 (DuckDB oracle) evaluate identically — no
backreferences, no lookaround, no possessive quantifiers — so the
DuckDB twin in __spark_entry__.oracle_sql() ("pii_scrub") replays the
exact counts and redacted text. Redaction order is fixed
(email -> phone -> ipv4) because the patterns can overlap.

The reference pipeline has no PII pass (it crawls scholarly PDFs); the
closest analog is its sanitize-before-publish step for dumps. This is
one of the beyond-reference training-data operators SURVEY.md §6
calls for.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# local-part @ domain . tld — the pragmatic subset (no quoted
# local-parts); identical match semantics in Java regex and RE2
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# international format only: + then 7-14 digits (E.164 shape).
# Deliberately NOT matching bare digit runs — those are usually ids,
# and a 100 TB pass that redacts every number destroys the corpus.
PHONE_RE = r"\+[0-9]{7,14}"
# dotted-quad with word boundaries; over-matches 999.1.1.1 (documented
# — range-checking octets needs alternation both engines share, cheap
# to add but noisy to read; callers filtering candidates re-verify)
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IPV4_TOKEN = "<IP>"


def pii_counts(text: Column) -> dict[str, Column]:
    """Non-overlapping leftmost match counts per PII class."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_phones": F.regexp_count(text, F.lit(PHONE_RE)),
        "n_ipv4": F.regexp_count(text, F.lit(IPV4_RE)),
    }


def redact_pii_col(text: Column) -> Column:
    """Replace each PII match with a typed placeholder token, in the
    fixed order email -> phone -> ipv4 (an email's digits must not be
    half-eaten by the phone pass first)."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(out, IPV4_RE, IPV4_TOKEN)
