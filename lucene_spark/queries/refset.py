"""The reference query set, adapted to the synthetic vocabulary.

Modeled on contrib/benchmark feeds/EnwikiQueryMaker.java:41 (~90 web-style
queries: single terms, conjunctions, disjunctions, quoted phrases, sloppy
phrases, negations, boosts) — 30 queries over the English-number vocabulary
of the fixture corpus (FIXTURES.md §4), spanning every operator the engine
claims plus head/tail df extremes for WAND + salting coverage.
"""

REFERENCE_QUERIES: list[str] = [
    # single terms: head, torso, tail
    "one",                       # max-df head term
    "seven",
    "forty",
    "ninety",
    "hundred",
    "seventeen",
    "bucketthree",               # mid-frequency bucket token
    "onehundredtwentyone",       # df=1 serial (rare tail)
    # conjunctions
    "seven AND forty",
    "one AND two AND three",
    "hundred AND ninety",
    "+seven +twenty",
    "seventeen AND bucketthree",
    # disjunctions
    "one two three",
    "seventy eighty ninety",
    "seven seventeen seventy",
    "nineteen ninety nine",
    # phrases (exact)
    '"twenty one"',
    '"one hundred"',
    '"seven hundred"',
    '"forty two"',
    # phrases (sloppy)
    '"one hundred"~2',
    '"twenty seven"~3',
    # negation
    "seven -forty",
    "one -two -three",
    "hundred AND NOT thousand",
    # boosts
    "seven^2 forty",
    "one^0.5 ninety^3",
    # multi-term rewrites
    "seven*",
    "s?xty",
    "fourty~1",                  # fuzzy: misspelling of forty
    # mixed: head + rare tail (WAND pruning stressor)
    "one onehundredtwentyone",
]
