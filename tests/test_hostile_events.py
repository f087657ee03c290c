"""Null-bearing EVENT logs, differentially: crawled clickstreams carry
null timestamps / user ids / types / values the fixed fixtures never do,
and the engines' null ORDERING rules differ (Spark window sorts ASC nulls
FIRST, DuckDB's LAG sorts them LAST) — so one null-ts event used to shift
every session boundary for its user, silently. The pinned contract is
"no event time → no window, no session" (explicit ts IS NOT NULL on both
sides); null user_id stays a groupable session key (both engines group
nulls together). This test runs the two event ops vs their oracle_sql()
on a seeded null-injected table — the same rows/cols/values compare the
driver's correctness gate uses."""

import datetime
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from tests.test_contract_extras import _norm_rows


@pytest.fixture(scope="module")
def hostile_events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hostile_events"))
    base = datetime.datetime(2025, 1, 1)
    rows = []
    for i in range(80):
        rows.append({
            "event_id": i,
            "ts": (None if i % 17 == 4
                   else base + datetime.timedelta(minutes=i * 11)),
            "user_id": None if i % 13 == 6 else i % 5,
            "event_type": (None if i % 19 == 8
                           else ["view", "click", "view", "purchase"][i % 4]),
            "value": None if i % 7 == 2 else float(i),
            "props": None,
        })
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pa.schema([
            ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()), ("event_type", pa.string()),
            ("value", pa.float64()), ("props", pa.string())])),
        os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize(
    "name", ["events_windowed", "events_sessionize", "events_funnel"])
def test_event_ops_match_oracle_with_nulls(spark, hostile_events_dir, name):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('"
        f"{os.path.join(hostile_events_dir, 'events.parquet')}')")
    fns = dict(entrymod.queries())
    fns.update(entrymod.extra_queries())
    sqls = dict(entrymod.oracle_sql())
    sqls.update(entrymod.extra_oracle_sql())
    sdf = fns[name](spark, hostile_events_dir)
    s_rows, s_cols = _norm_rows(sdf.columns,
                                [tuple(r) for r in sdf.collect()])
    res = con.execute(sqls[name])
    o_rows, o_cols = _norm_rows([d[0] for d in res.description],
                                res.fetchall())
    assert s_cols == o_cols
    assert s_rows == o_rows
    assert len(s_rows) > 0
