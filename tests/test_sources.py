"""Source abstraction: parquet/Iceberg source strings, the Iceberg segment
planner, and the snapshot-pinned build path.

No Iceberg runtime jar ships in this sandbox, so the catalog read itself
(`spark.read.format("iceberg")`) is exercised only for its gating error; the
planner (plan_from_iceberg_listing) and the build-over-a-pinned-plan path are
tested for real — an Iceberg snapshot is a pinned list of parquet data
files, and the resume path consumes exactly the persisted listing, so
building from a written iceberg-sourced plan IS the production code path
minus the one metadata-table scan.
"""

import os

import pytest
from pyspark.sql.utils import AnalysisException

from lucene_spark.indexing.plan import (
    _norm,
    extend_plan_from_iceberg_listing,
    make_build_plan,
    make_build_plan_from_listing,
    plan_from_iceberg_listing,
    read_build_plan,
    write_build_plan,
)
from lucene_spark.sources import (
    SourceSpec,
    has_iceberg,
    parse_source,
    read_pages,
)


# ---------------------------------------------------------------- parsing

def test_parse_source_bare_path_is_parquet():
    assert parse_source("/data/pages") == SourceSpec("parquet", "/data/pages")
    assert parse_source("parquet:/data/p") == SourceSpec("parquet", "/data/p")


def test_parse_source_iceberg_table():
    assert parse_source("iceberg:wh.web.pages") == SourceSpec(
        "iceberg", "wh.web.pages")


def test_parse_source_iceberg_snapshot_pin():
    s = parse_source("iceberg:wh.web.pages@snapshot-id=123456789")
    assert s == SourceSpec("iceberg", "wh.web.pages", snapshot_id=123456789)


def test_parse_source_iceberg_as_of_pin():
    s = parse_source("iceberg:wh.web.pages@as-of=2026-01-01T00:00:00")
    assert s.kind == "iceberg" and s.as_of == "2026-01-01T00:00:00"
    assert s.snapshot_id is None


@pytest.mark.parametrize("bad", [
    "iceberg:",                       # no table
    "iceberg:/some/path",             # path, not a table name
    "iceberg:t@snapshot-id",          # pin without value
    "iceberg:t@frozen=1",             # unknown pin key
    "",
])
def test_parse_source_rejects_malformed(bad):
    with pytest.raises(ValueError):
        parse_source(bad)


def test_as_of_millis_accepts_epoch_and_iso():
    from lucene_spark.sources.pages import _as_of_millis

    assert _as_of_millis("1767225600000") == "1767225600000"
    # 2026-01-01T00:00:00 UTC
    assert _as_of_millis("2026-01-01T00:00:00") == "1767225600000"
    assert _as_of_millis("2026-01-01T00:00:00+00:00") == "1767225600000"


def test_norm_preserves_remote_uri_schemes():
    assert _norm("s3a://bucket/a//b.parquet") == "s3a://bucket/a//b.parquet"
    assert _norm("hdfs://nn:8020/p/f.parquet") == "hdfs://nn:8020/p/f.parquet"
    assert _norm("file:///tmp/x%20y.parquet") == "/tmp/x y.parquet"
    assert _norm("/tmp/a/../b.parquet") == "/tmp/b.parquet"


# ------------------------------------------------------------- read_pages

def test_read_pages_parquet_validates_and_projects(spark, pages_dir):
    df = read_pages(spark, pages_dir, columns=("url", "text"))
    assert df.columns == ["url", "text"]
    assert df.count() == 400


def test_read_pages_rejects_non_pages_table(spark, tmp_path):
    p = str(tmp_path / "notpages")
    spark.range(3).write.parquet(p)
    with pytest.raises(ValueError, match="not a pages table"):
        read_pages(spark, p)


def test_iceberg_read_gated_with_clear_error(spark):
    if has_iceberg(spark):
        pytest.skip("Iceberg runtime present; gating path not reachable")
    with pytest.raises(RuntimeError, match="Iceberg runtime jar"):
        read_pages(spark, "iceberg:wh.web.pages")


# ---------------------------------------------------------- plan packing

def test_listing_planner_matches_footer_planner(pages_dir):
    via_footers = make_build_plan(pages_dir, target_docs_per_seg=100)
    listing = [(f.path, f.rows) for f in via_footers.files]
    via_listing = make_build_plan_from_listing(
        listing, pages_dir, target_docs_per_seg=100)
    assert [vars(a) for a in via_listing.files] == \
           [vars(b) for b in via_footers.files]
    assert (via_listing.n_docs, via_listing.n_segments) == \
           (via_footers.n_docs, via_footers.n_segments)


def test_listing_planner_is_order_invariant(pages_dir):
    base = make_build_plan(pages_dir, target_docs_per_seg=100)
    listing = [(f.path, f.rows) for f in base.files]
    shuffled = make_build_plan_from_listing(
        list(reversed(listing)), pages_dir, target_docs_per_seg=100)
    assert [vars(a) for a in shuffled.files] == [vars(b) for b in base.files]


def _files_rows(pages_dir, content=0, fmt="PARQUET"):
    plan = make_build_plan(pages_dir, target_docs_per_seg=100)
    return [{"content": content, "file_path": "file://" + f.path,
             "record_count": f.rows, "file_format": fmt}
            for f in plan.files]


def test_iceberg_listing_plan_equals_parquet_plan(pages_dir):
    plan = plan_from_iceberg_listing(
        _files_rows(pages_dir), "iceberg:wh.web.pages",
        target_docs_per_seg=100, source_snapshot=42)
    base = make_build_plan(pages_dir, target_docs_per_seg=100)
    assert [vars(a) for a in plan.files] == [vars(b) for b in base.files]
    assert plan.source_snapshot == 42
    assert plan.input_path == "iceberg:wh.web.pages"


def test_iceberg_listing_refuses_delete_files(pages_dir):
    rows = _files_rows(pages_dir)
    rows[0]["content"] = 1  # a position-delete file
    with pytest.raises(ValueError, match="delete file"):
        plan_from_iceberg_listing(rows, "iceberg:t", target_docs_per_seg=100)


def test_iceberg_listing_refuses_non_parquet(pages_dir):
    rows = _files_rows(pages_dir, fmt="ORC")
    with pytest.raises(ValueError, match="non-parquet"):
        plan_from_iceberg_listing(rows, "iceberg:t", target_docs_per_seg=100)


def test_plan_snapshot_roundtrips(pages_dir, tmp_path):
    plan = plan_from_iceberg_listing(
        _files_rows(pages_dir), "iceberg:wh.web.pages",
        target_docs_per_seg=100, source_snapshot=987654321)
    write_build_plan(plan, str(tmp_path))
    back = read_build_plan(str(tmp_path))
    assert back.source_snapshot == 987654321
    assert [vars(a) for a in back.files] == [vars(b) for b in plan.files]


def test_extend_plan_from_iceberg_listing(pages_dir):
    rows = _files_rows(pages_dir)
    plan = plan_from_iceberg_listing(rows[:2], "iceberg:t",
                                     target_docs_per_seg=100,
                                     source_snapshot=1)
    before = [vars(f) for f in plan.files]
    new = extend_plan_from_iceberg_listing(plan, rows,
                                           target_docs_per_seg=100,
                                           new_snapshot=2)
    # new segments start after the existing ones; old entries untouched
    assert new and min(new) == max(f["seg"] for f in before) + 1
    assert [vars(f) for f in plan.files[:len(before)]] == before
    assert plan.source_snapshot == 2
    assert plan.n_docs == sum(r["record_count"] for r in rows)
    # idempotent re-run: same listing adds nothing, snapshot still advances
    assert extend_plan_from_iceberg_listing(
        plan, rows, target_docs_per_seg=100, new_snapshot=3) == []
    assert plan.source_snapshot == 3


def test_extend_refuses_delete_files(pages_dir):
    rows = _files_rows(pages_dir)
    plan = plan_from_iceberg_listing(rows[:2], "iceberg:t",
                                     target_docs_per_seg=100)
    rows[2]["content"] = 2  # an equality-delete file appeared
    with pytest.raises(ValueError, match="delete"):
        extend_plan_from_iceberg_listing(plan, rows, target_docs_per_seg=100)


# ------------------------------------- build over an iceberg-sourced plan

def test_build_from_iceberg_plan_matches_parquet_build(
        spark, pages_dir, index_dir, tmp_path):
    """Persist a plan as the Iceberg planner would emit it (same data files,
    file:// URIs from the metadata listing, snapshot recorded), then run the
    REAL build via the resume path — exactly what a cluster resume does —
    and require identical stats and identical top-k to the parquet build."""
    from lucene_spark.indexing import build_index, merge_index
    from lucene_spark.indexing.reader import IndexReader
    from lucene_spark.queries.planner import Searcher

    out = str(tmp_path / "iceidx")
    plan = plan_from_iceberg_listing(
        _files_rows(pages_dir), "iceberg:wh.web.pages",
        target_docs_per_seg=100, source_snapshot=42)
    os.makedirs(out, exist_ok=True)
    write_build_plan(plan, out)
    summary = build_index(spark, "iceberg:wh.web.pages", out,
                          target_docs_per_seg=100, resume=True)
    assert summary["built"] == plan.n_segments
    stats = merge_index(spark, out)

    base_stats = __import__("json").load(
        open(os.path.join(index_dir, "stats.json")))
    assert stats["N"] == base_stats["N"]
    assert stats["total_tokens"] == base_stats["total_tokens"]
    assert abs(stats["avgdl"] - base_stats["avgdl"]) < 1e-9

    got = Searcher(IndexReader(spark, out)).search("seven", k=10).collect()
    want = Searcher(IndexReader(spark, index_dir)).search(
        "seven", k=10).collect()
    assert [(r["docid"], round(r["score"], 9)) for r in got] == \
           [(r["docid"], round(r["score"], 9)) for r in want]


def test_incremental_iceberg_build_matches_full_build(
        spark, pages_dir, index_dir, tmp_path):
    """Two-commit simulation: build from a 2-file snapshot, then extend the
    plan with the 4-file snapshot's listing and build the diff — the final
    index must match the one-shot full build (same docIDs, stats, top-k)."""
    from lucene_spark.indexing import build_index, merge_index
    from lucene_spark.indexing.reader import IndexReader
    from lucene_spark.queries.planner import Searcher

    out = str(tmp_path / "inc")
    rows = _files_rows(pages_dir)
    plan = plan_from_iceberg_listing(rows[:2], "iceberg:wh.web.pages",
                                     target_docs_per_seg=100,
                                     source_snapshot=1)
    os.makedirs(out, exist_ok=True)
    write_build_plan(plan, out)
    build_index(spark, "iceberg:wh.web.pages", out,
                target_docs_per_seg=100, resume=True)

    extend_plan_from_iceberg_listing(plan, rows, target_docs_per_seg=100,
                                     new_snapshot=2)
    write_build_plan(plan, out)
    summary = build_index(spark, "iceberg:wh.web.pages", out,
                          target_docs_per_seg=100, resume=True)
    assert summary["skipped"] >= 2  # first commit's segments not rebuilt
    stats = merge_index(spark, out)
    assert read_build_plan(out).source_snapshot == 2

    base_stats = __import__("json").load(
        open(os.path.join(index_dir, "stats.json")))
    assert stats["N"] == base_stats["N"]
    assert abs(stats["avgdl"] - base_stats["avgdl"]) < 1e-9

    got = Searcher(IndexReader(spark, out)).search(
        "seven AND forty", k=10).collect()
    want = Searcher(IndexReader(spark, index_dir)).search(
        "seven AND forty", k=10).collect()
    assert [(r["docid"], round(r["score"], 9)) for r in got] == \
           [(r["docid"], round(r["score"], 9)) for r in want]


def test_build_index_unpinned_iceberg_needs_runtime(spark, tmp_path):
    """Without a persisted plan, an iceberg: input must reach the catalog —
    and in this jar-less sandbox that must fail loudly, not silently build
    an empty index."""
    from lucene_spark.indexing import build_index

    if has_iceberg(spark):
        pytest.skip("Iceberg runtime present")
    with pytest.raises((RuntimeError, AnalysisException),
                       match="Iceberg|iceberg"):
        build_index(spark, "iceberg:wh.web.pages", str(tmp_path / "o"),
                    target_docs_per_seg=100)
