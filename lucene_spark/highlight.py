"""Snippet highlighting — the reference contrib highlighter re-expressed.

Reference: contrib/highlighter/.../Highlighter.java (fragment the text,
score fragments by contained query terms, format matches),
SimpleFragmenter / SimpleHTMLFormatter / QueryScorer.

Spark-first restatement: highlighting is a pure column expression over the
hit rows — tokenize JVM-side (`split`), locate the first query-term
occurrence, slice a fixed window of tokens around it, and wrap matching
tokens with the pre/post tags via `transform`. The whole thing stays in
whole-stage codegen: no UDF, no Python, so it composes with the top-k join
at any scale (highlight a billion hits if you like).

Pinned rule (shared with the DuckDB oracle): window of `frag_tokens`
tokens starting at min(first match position, len − frag_tokens + 1),
floored at the start of the doc; every window token equal to a query term
is wrapped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _norm(tok: Column) -> Column:
    """Raw whitespace token → comparable form: strip leading/trailing
    punctuation, lowercase — so analyzed query terms ('data') locate their
    surface occurrences ('Data', 'data.') in the original text (the
    reference analyzes the fragment with offsets; for whitespace-tokenized
    prose this normalization is the offset-free equivalent)."""
    return F.lower(F.regexp_replace(
        tok, r"^[^0-9A-Za-z]+|[^0-9A-Za-z]+$", ""))


def snippet_col(text: Column, terms: list[str], frag_tokens: int = 8,
                pre: str = "<b>", post: str = "</b>") -> Column:
    """Column expression: highlighted best fragment of whitespace-tokenized
    `text` (NULL-safe: docs without a match highlight their head window)."""
    toks = F.split(text, " ")
    size = F.size(toks)
    first = F.array_min(F.filter(
        F.transform(F.sequence(F.lit(1), size),
                    lambda i: F.when(_norm(F.element_at(toks, i)).isin(terms), i)),
        lambda x: x.isNotNull()))
    start = F.greatest(
        F.lit(1),
        F.least(F.coalesce(first, F.lit(1)), size - frag_tokens + 1))
    frag = F.slice(toks, start, frag_tokens)
    wrapped = F.transform(
        frag,
        lambda t: F.when(_norm(t).isin(terms),
                         F.concat(F.lit(pre), t, F.lit(post)))
        .otherwise(t))
    return F.array_join(wrapped, " ")


def highlight(hits: DataFrame, docs: DataFrame, terms: list[str],
              on: str | list[str] = "url",
              text_col: str = "text", frag_tokens: int = 8,
              pre: str = "<b>", post: str = "</b>") -> DataFrame:
    """Join top-k `hits` (small — broadcast) back to the row store `docs`
    on the EXPLICIT key `on` and add a `snippet` column (the reference's
    stored-field fetch + Highlighter.getBestFragment pass, one codegen
    stage). The key is explicit because inferring it from shared column
    names silently turns shared non-key columns into join predicates."""
    joined = docs.join(F.broadcast(hits), on=on)
    return joined.withColumn(
        "snippet", snippet_col(F.col(text_col), terms, frag_tokens, pre, post))
