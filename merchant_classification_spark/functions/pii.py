"""PII scrubbing — the redaction kernel an LLM training-data pipeline
runs over every document before the corpus ships.

Same engineering discipline as the date kernel (``patterns.py``): every
pattern is DIALECT-PORTABLE — plain character classes, alternation, and
bounded repetition only; no backreferences, no lookaround — so the
identical pattern string runs in Java regex (Spark, codegen hot path),
Python ``re`` (the parity oracle in tests) and RE2-class engines (DuckDB
oracle, Go). That keeps the whole scrub a single whole-stage-codegen'd
projection: zero shuffles, zero Python workers, linear in bytes.

Scrub order matters and is part of the contract:
  1. URL first (an email or IP inside a URL is part of the URL token),
  2. EMAIL (would otherwise be half-eaten by later digit patterns),
  3. IP (dotted quads would otherwise match the phone pattern),
  4. CARD (16-digit groups would otherwise match the phone pattern),
  5. PHONE last (the greediest digit pattern).

Beyond-reference surface: the reference scrubs dates/prices from payment
narratives (utils/regex_utils.py); redacting contact/identity tokens from
web-scale text is the same operator family at corpus scale.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

URL_PATTERN = r"(?:https?://|www\.)[A-Za-z0-9._~:/?#@!$&'*+,;=%()\[\]-]+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+"
IPV4_PATTERN = r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"
CARD_PATTERN = r"[0-9]{4}(?:[ -]?[0-9]{4}){3}"
PHONE_PATTERN = r"\+?[0-9]{1,3}[ -]?(?:\([0-9]{1,4}\)[ -]?)?[0-9]{2,4}(?:[ -]?[0-9]{2,4}){2,4}"

# (pattern, replacement token) in mandatory application order.
PII_STEPS: list[tuple[str, str]] = [
    (URL_PATTERN, "<URL>"),
    (EMAIL_PATTERN, "<EMAIL>"),
    (IPV4_PATTERN, "<IP>"),
    (CARD_PATTERN, "<CARD>"),
    (PHONE_PATTERN, "<PHONE>"),
]


def scrub_pii(col: Column | str) -> Column:
    """Native (JVM codegen) PII scrub. Returns the redacted string."""
    out = F.col(col) if isinstance(col, str) else col
    out = out.cast("string")
    for pattern, token in PII_STEPS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column | str) -> Column:
    """Struct of per-category match counts (url, email, ip, card, phone)
    BEFORE redaction — the corpus-audit metric. Counts are computed on
    the same progressively-scrubbed text as ``scrub_pii`` so categories
    don't double-count each other's spans."""
    out = F.col(col) if isinstance(col, str) else col
    out = out.cast("string")
    fields = []
    for (pattern, token), name in zip(
        PII_STEPS, ["url", "email", "ip", "card", "phone"]
    ):
        fields.append(
            F.size(F.regexp_extract_all(out, F.lit(pattern), F.lit(0))).alias(name)
        )
        out = F.regexp_replace(out, pattern, token)
    return F.struct(*fields)


# --- Python twin (tests' parity oracle) -----------------------------------

_COMPILED = [(re.compile(p), t) for p, t in PII_STEPS]


def scrub_pii_text(text: str) -> str:
    """Pure-Python reference implementation (same patterns, same order)."""
    out = str(text)
    for pattern, token in _COMPILED:
        out = pattern.sub(token, out)
    return out
