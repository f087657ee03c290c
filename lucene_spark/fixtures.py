"""Deterministic synthetic corpus of Common-Crawl-style pages (FIXTURES.md §1).

Schema per BASELINE input_hint: (url string, warc_ts timestamp, html binary,
text string, lang string). All generation is seeded (seed 42); no external
data. The vocabulary is English spellings of integers — the reference's
deterministic-corpus trick (util/English.java:25 longToEnglish) giving
predictable tf/df — drawn Zipfian so head-term salting is exercised at small
scale.

The ``text`` column is constructed from the template *independently* of
``extract_text`` so the byte-identity invariant ``extract_text(html) == text``
is a real check of the extractor, not a tautology.
"""

from __future__ import annotations

import bisect
import random
from datetime import datetime, timedelta, timezone

import pandas as pd

SEED = 42
VOCAB_SIZE = 800

_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]


def long_to_english(n: int) -> str:
    """Spell an integer in English words (reference util/English.java:25
    semantics, space-separated, no hyphens or 'and')."""
    if n < 0:
        return "minus " + long_to_english(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        return _TENS[n // 10] + ("" if n % 10 == 0 else " " + _ONES[n % 10])
    if n < 1000:
        s = _ONES[n // 100] + " hundred"
        return s if n % 100 == 0 else s + " " + long_to_english(n % 100)
    if n < 1_000_000:
        s = long_to_english(n // 1000) + " thousand"
        return s if n % 1000 == 0 else s + " " + long_to_english(n % 1000)
    s = long_to_english(n // 1_000_000) + " million"
    return s if n % 1_000_000 == 0 else s + " " + long_to_english(n % 1_000_000)


def _zipf_cum(v: int) -> list[float]:
    cum, tot = [], 0.0
    for r in range(1, v + 1):
        tot += 1.0 / r
        cum.append(tot)
    return cum


_CUM = _zipf_cum(VOCAB_SIZE)
_VOCAB = [long_to_english(i) for i in range(VOCAB_SIZE)]
_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def page_body(i: int) -> str:
    """Zipfian token stream for doc i (seeded per doc — FIXTURES.md §1).

    Number spellings < 1000 reuse only ~30 distinct words, so the Zipf draw
    alone yields no rare tail. Two extra tokens fix that: a serial token
    (the compound spelling of i, e.g. ``onehundredtwentyone``) and a
    mid-frequency bucket token (df ≈ N/50) — giving the term dictionary a
    head, a torso, and a tail for WAND/salting/prefix tests (FIXTURES.md §4).

    Caveat: the serial is df=1 only for MULTI-word spellings (i ≥ 21 and
    not a round ten/hundred); single-word spellings ("five", "forty")
    collide with ordinary vocabulary draws. Tests that need a guaranteed
    df=1 term must use a compound serial (the reference query set does).
    """
    rng = random.Random(SEED * 1_000_003 + i)
    n_tokens = 40 + (i * 7919) % 200
    total = _CUM[-1]
    words: list[str] = []
    while len(words) < n_tokens:
        r = bisect.bisect_left(_CUM, rng.random() * total)
        words.extend(_VOCAB[min(r, VOCAB_SIZE - 1)].split())
    serial = "".join(long_to_english(i).split())
    bucket = "bucket" + "".join(long_to_english(i % 50).split())
    return " ".join(words[:n_tokens] + [serial, bucket])


def page_row(i: int) -> dict:
    body = page_body(i)
    html = (
        f"<html><head><title>Doc {i}</title>"
        f"<script>var x = 1 < 2; if (x &amp;&amp; true) x = 0;</script></head>"
        f"<body><p>{body}</p>  &amp; trailing &lt;entity&gt;   test"
        f"<!-- hidden comment --></body></html>"
    ).encode("utf-8")
    # expected extraction, written out by hand from the template (title and
    # script excluded, entities decoded, whitespace runs collapsed):
    text = f"{body} & trailing <entity> test"
    return {
        "url": f"https://site{i % 97}.example/page/{i:09d}",
        "warc_ts": _EPOCH + timedelta(seconds=i),
        "html": html,
        "text": text,
        "lang": "de" if i % 10 == 7 else "en",
    }


def pages_pdf(n: int, start: int = 0) -> pd.DataFrame:
    """Pandas DataFrame of n pages [start, start+n) — for pytest fixtures."""
    return pd.DataFrame([page_row(i) for i in range(start, start + n)])


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_df(spark, n: int, partitions: int = 8):
    """Distributed generation: spark.range → mapInPandas(page_row batches).

    Generation is keyed on the absolute row id, so the output is identical
    for any partition count — the determinism the scaling benchmark needs.
    """
    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([page_row(int(i)) for i in pdf["id"]])

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def write_pages(spark, n: int, path: str, partitions: int = 8) -> None:
    pages_df(spark, n, partitions).write.mode("overwrite").parquet(path)
