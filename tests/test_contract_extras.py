"""Driver-harness-equivalent verification for extra_queries() — the
operator variants consolidated out of the 50-entry contract registry.
Runs each Spark query and its DuckDB oracle at sf0.001 and applies the
same rows/schema/sorted-values compare the driver uses."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return (sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows),
            [cols[i] for i in order])


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("name", sorted(entrymod.extra_queries()))
def test_extra_entry_matches_oracle(spark, duck, name):
    fn = entrymod.extra_queries()[name]
    sql = entrymod.extra_oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    s_rows, s_cols = _norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = duck.execute(sql)
    o_rows, o_cols = _norm_rows([d[0] for d in res.description], res.fetchall())
    assert s_cols == o_cols
    assert len(s_rows) == len(o_rows)
    assert s_rows == o_rows


def test_registry_is_exactly_50():
    """Round 1's harness recorded only the first 50 dict entries — the
    registry is pinned there (see queries() docstring)."""
    qs = entrymod.queries()
    assert len(qs) == 50
    oracles = entrymod.oracle_sql()
    assert set(qs) == set(oracles), set(qs) ^ set(oracles)
    extras = entrymod.extra_queries()
    assert set(extras) == set(entrymod.extra_oracle_sql())
    assert not (set(extras) & set(qs))
