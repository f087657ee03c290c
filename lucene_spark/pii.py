"""PII detection + scrubbing for crawl text — the redaction pass a
training-data pipeline runs between dedup and tokenization (emails, IPv4
addresses, phone-like sequences → typed placeholders).

No reference-repo counterpart (the reference indexes text as given); the
pattern set is the conservative high-precision core every crawl cleaner
starts from. Everything is JVM-side regexp expressions — zero Python in
the row path, pure narrow projection at any scale.

Pattern notes (pinned by tests/test_pii.py, restated verbatim in the
DuckDB contract oracle — the patterns avoid constructs where Java regex
and RE2 diverge: no backrefs, no lookaround, no possessive quantifiers):

- EMAIL before IP before PHONE: the e-mail local part may contain digits
  and dots, and the phone class excludes dots so an already-redacted or
  still-raw IPv4 can never be half-eaten by the phone pass.
- PHONE requires ≥9 total chars of digits/separators starting at a digit
  or '+', so ordinary years / small integers never match.
- The scrub is IDEMPOTENT: placeholders contain no digits or '@', so a
  second pass is a no-op (tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\-\s]{7,13}\d"

# applied in this order — see the module docstring
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def scrub_pii(text: Column | str) -> Column:
    """Text with every PII match replaced by its typed placeholder.
    NULL in → NULL out."""
    c = F.col(text) if isinstance(text, str) else text
    for _name, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(text: Column | str) -> list[Column]:
    """One count column per PII type (n_email, n_ip, n_phone) with the same
    pass order/precedence as scrub_pii: each pattern counts on the text
    with the PREVIOUS types already redacted, so a span never
    double-counts under two types. NULL text counts 0 everywhere."""
    c = F.col(text) if isinstance(text, str) else text
    out = []
    for _name, pat, repl in PII_PATTERNS:
        out.append(F.size(F.coalesce(
            F.regexp_extract_all(c, F.lit(pat), F.lit(0)), F.array()))
            .alias(f"n_{_name}"))
        c = F.regexp_replace(c, pat, repl)
    return out


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """`text_col` scrubbed in place + per-type match counts — one narrow
    projection, no shuffle (a 100-TB corpus pass is map-only)."""
    others = [c for c in df.columns if c != text_col]
    return df.select(
        *others,
        scrub_pii(text_col).alias(text_col),
        *pii_counts(text_col),
    )
