"""contrib/misc odds and ends that are index utilities, not query shapes.

HighFreqTerms (contrib/misc/.../HighFreqTerms.java:33-70): walk the term
dictionary, keep the numTerms terms with the highest docFreq, optionally
restricted to one field. Here the term dictionary is already a parquet
table sorted by term, so the walk is a TakeOrdered over (df desc) — no
postings are touched, and the plan prunes to the (term, df) columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUM_TERMS = 100  # HighFreqTerms.java:33 numTerms


def high_freq_terms(reader, n: int = NUM_TERMS,
                    field: str | None = None) -> DataFrame:
    """Top-n terms by document frequency → DataFrame(term, df), df desc,
    ties term asc (the reference's priority queue is df-ordered; the term
    tiebreak makes the output deterministic). ``field``: restrict to one
    extra ANALYZED field's namespace (``field:term`` rows, prefix
    stripped); None = the default text field (un-namespaced terms), the
    common case. ``field="*"`` = every field, namespaces kept
    (HighFreqTerms' no-arg mode walks all fields)."""
    td = reader.term_dict().select("term", F.col("df").cast("long").alias("df"))
    if field == "*":
        pass
    elif field is None:
        # default-field terms carry no namespace; field terms are "f:term".
        # A ':' inside a default-field token is possible (whitespace chain),
        # so exclude only the REGISTERED field namespaces (analyzed AND
        # keyword fields).
        named = tuple(reader.analyzed_fields or ()) + tuple(
            getattr(reader, "keyword_fields", None) or ())
        for f in named:
            td = td.where(~F.col("term").startswith(f + ":"))
    else:
        pre = field + ":"
        td = (td.where(F.col("term").startswith(pre))
              .select(F.expr(f"substring(term, {len(pre) + 1})").alias("term"),
                      "df"))
    return td.orderBy(F.desc("df"), F.asc("term")).limit(n)
