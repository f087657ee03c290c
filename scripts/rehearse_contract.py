"""Rehearse the driver's correctness gate locally: run every
__spark_entry__.queries() entry against its oracle_sql() via DuckDB and
compare row counts + (order-insensitive) values.

Usage: python scripts/rehearse_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from lucene_spark.session import get_spark

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)


def df_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("rehearse", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    # the consolidated variants + contrib parser entries ride along in
    # rehearsal (the driver only sees queries();
    # tests/test_contract_extras.py gates these in CI)
    qs.update(entrymod.extra_queries())
    oracles.update(entrymod.extra_oracle_sql())
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        s_n, o_n = df_rows(scols, srows), df_rows(ocols, orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        ok_vals = s_n[0] == o_n[0]
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        print(f"{status} {name}: spark {len(srows)}r cols={scols} vs oracle "
              f"{len(orows)}r cols={ocols} ({time.time()-t0:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            if not ok_vals:
                sset, oset = set(s_n[0]), set(o_n[0])
                for x in list(sset - oset)[:5]:
                    print(f"   spark-only: {x}")
                for x in list(oset - sset)[:5]:
                    print(f"   oracle-only: {x}")
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
