"""Build the persisted near-dup support artifacts for a documents table
(one-time, build-side): distinct shingles, capped shingles, per-doc hash
sets, minhash signatures + a validated manifest. Pipeline ops served via
__spark_entry__.register_dedup_artifacts then hydrate from parquet
instead of recomputing the corpus-scale distinct per session (measured at
the 500k-doc probe: 151 s one-time build; first dedup_minhash_lsh of a
fresh session 20.3 s vs ~330-580 s recomputing).

Usage: python scripts/build_dedup_artifacts.py DOCS_DIR OUT_DIR
  DOCS_DIR  directory containing documents.parquet
  OUT_DIR   artifact output directory (created/overwritten)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    docs_dir, out_dir = sys.argv[1], sys.argv[2]
    from lucene_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("build-dedup-artifacts",
                      cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    t0 = time.time()
    counts = entry.build_dedup_artifacts(spark, docs_dir, out_dir)
    print(json.dumps({"out_dir": out_dir, "counts": counts,
                      "build_sec": round(time.time() - t0, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
