"""PII scrub / counts (lucene_spark/pii.py): hand-pinned redactions,
idempotence, precedence between types, null handling, plan narrowness."""

import re

from lucene_spark.pii import (EMAIL_RE, IPV4_RE, PHONE_RE, PII_PATTERNS,
                              pii_scrub, scrub_pii)


def _scrub_py(s):
    """Independent restatement of the scrub with Python re — the pass
    order and patterns must behave identically (RE2/Java/Python agree on
    this construct subset)."""
    if s is None:
        return None
    for _n, pat, repl in PII_PATTERNS:
        s = re.sub(pat, repl, s)
    return s


CASES = [
    ("mail me at bob.smith+x@sub.example.co.uk today",
     "mail me at <EMAIL> today"),
    ("server 192.168.0.1 and 10.0.255.255 up", "server <IP> and <IP> up"),
    ("call +1 555-000-1234 now", "call <PHONE> now"),
    ("call 555 000 1234 now", "call <PHONE> now"),
    ("year 2024 and 12345 stay", "year 2024 and 12345 stay"),
    # precedence: the email's digits/dots never half-match as IP/phone,
    # and a redacted IP is not re-eaten by the phone pass
    ("a42.b@x.io from 10.0.42.5", "<EMAIL> from <IP>"),
    ("", ""),
    (None, None),
]


def test_scrub_values(spark):
    df = spark.createDataFrame([(s,) for s, _ in CASES], "text string")
    got = [r["c"] for r in df.select(scrub_pii("text").alias("c")).collect()]
    want = [w for _, w in CASES]
    assert got == want
    # the Python restatement agrees case-for-case
    assert [_scrub_py(s) for s, _ in CASES] == want


def test_scrub_idempotent(spark):
    once = [_scrub_py(s) for s, _ in CASES]
    assert [_scrub_py(s) for s in once] == once
    df = spark.createDataFrame([(s,) for s in once if s is not None],
                               "text string")
    again = [r["c"] for r in df.select(scrub_pii("text").alias("c")).collect()]
    assert again == [s for s in once if s is not None]


def test_pii_scrub_counts(spark):
    rows = [
        (1, "a@b.io c@d.io from 10.0.0.1"),
        (2, "call 555-000-1234 or 555 111 2222"),
        (3, "clean text"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_ip"] == 1
    assert out[1]["text"] == "<EMAIL> <EMAIL> from <IP>"
    assert out[2]["n_phone"] == 2
    assert out[3] == {"doc_id": 3, "text": "clean text", "n_email": 0,
                      "n_ip": 0, "n_phone": 0}
    assert out[4]["text"] is None and out[4]["n_email"] == 0
    assert list(pii_scrub(df).columns) == ["doc_id", "text", "n_email",
                                           "n_ip", "n_phone"]


def test_pii_scrub_is_narrow(spark):
    df = spark.createDataFrame([(i, f"t{i}") for i in range(20)],
                               "doc_id long, text string")
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_patterns_re2_safe():
    """The contract oracle runs these patterns under DuckDB's RE2: no
    backreferences, no lookaround, no possessive quantifiers."""
    for pat in (EMAIL_RE, IPV4_RE, PHONE_RE):
        assert not re.search(r"\\[0-9]|\(\?[=!<]|[+*}][+]", pat), pat
