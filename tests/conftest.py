import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.fixtures import pages_pdf  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from lucene_spark.session import get_spark

    s = get_spark("lucene_spark_tests", cores=8, shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "8g"})
    yield s


def write_pages_files(path: str, n: int, files: int) -> None:
    """Write n fixture pages as `files` parquet files (path-sorted order
    defines arrival-order docIDs)."""
    os.makedirs(path, exist_ok=True)
    per = (n + files - 1) // files
    for k in range(files):
        lo, hi = k * per, min((k + 1) * per, n)
        if lo >= hi:
            break
        pdf = pages_pdf(hi - lo, start=lo)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(path, f"part-{k:04d}.parquet"),
                       coerce_timestamps="us", allow_truncated_timestamps=True)


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages"))
    write_pages_files(d, 400, 4)
    return d


@pytest.fixture(scope="session")
def index_dir(spark, pages_dir, tmp_path_factory):
    """Index over 400 fixture pages, 4 segments (100 docs each)."""
    from lucene_spark.indexing import build_index, merge_index

    out = str(tmp_path_factory.mktemp("index"))
    build_index(spark, pages_dir, out, target_docs_per_seg=100)
    merge_index(spark, out)
    return out


@pytest.fixture(scope="session")
def oracle_index(pages_dir):
    """Oracle built over the same docs with the same docids (file order)."""
    import pyarrow.dataset as ds

    from lucene_spark.oracle import build_oracle_index

    table = ds.dataset(pages_dir).to_table(columns=["text"])
    texts = table["text"].to_pylist()
    return build_oracle_index(list(enumerate(texts)))
