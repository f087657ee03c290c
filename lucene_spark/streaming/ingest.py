"""Incremental / streaming ingest: new pages append as NEW segments.

The reference's incremental surface is NRT readers + buffered segment
appends (index/IndexWriter.java:386 getReader; DocumentsWriter flushing new
segments while existing ones stay immutable; SURVEY.md §2.6). Spark-first
restatement: Structured Streaming `readStream → foreachBatch`, where each
micro-batch lands as one or more fresh segments via the SAME build path as
the batch job — segments are immutable, the build plan is extended (docid
bases continue arrival-ordered), and `merge_index` refreshes the global
dictionary + stats (the periodic-compaction ≙ segment-merge analog).

Exactly-once: a retried batch re-stages the same files; files already in the
build plan are skipped (extend_build_plan is idempotent), and segments with
a committed manifest are never rebuilt — the same rename-commit resumability
the batch build has.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import BLOCK_SIZE
from ..indexing.build import _build_chunk, completed_segments
from ..indexing.merge import merge_index
from ..indexing.plan import extend_build_plan, read_build_plan, write_build_plan

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def append_to_index(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    *,
    target_docs_per_seg: int = 50_000,
    analyzer: str | None = None,
    store_positions: bool | None = None,
    keyword_fields: tuple | None = None,
    analyzed_fields: tuple | None = None,
    max_postings_per_row: int = 250_000,
    block_size: int | None = None,
    refresh_stats: bool = True,
    commit_points: bool = False,
) -> list[int]:
    """Append the parquet files under input_path to an existing index as new
    segments. Returns the segment ids built (empty if nothing new). A fresh
    index_dir (no build plan yet) bootstraps from an empty plan, so a
    streaming query can be the sole writer of an index."""
    from ..indexing.plan import BuildPlan

    from ..indexing.build import read_manifest_config

    from ..sources.pages import parse_source

    spec = parse_source(input_path)
    os.makedirs(index_dir, exist_ok=True)
    if os.path.exists(os.path.join(index_dir, "build_plan.json")):
        plan = read_build_plan(index_dir)
    else:
        src = (input_path if spec.kind == "iceberg"
               else os.path.abspath(spec.location))
        plan = BuildPlan(input_path=src, n_docs=0, n_segments=0, files=[])
    if spec.kind == "iceberg":
        # incremental crawl indexing: diff the current snapshot's data-file
        # listing against the plan — appends never rewrite files in an
        # append-only table, so the diff is exactly the new documents
        from dataclasses import replace

        from ..indexing.plan import extend_plan_from_iceberg_listing
        from ..sources.pages import (iceberg_current_snapshot_id,
                                     iceberg_data_files)

        snap = spec.snapshot_id
        if snap is None and spec.as_of is None:
            snap = iceberg_current_snapshot_id(spark, spec)
            if snap is not None:
                spec = replace(spec, snapshot_id=snap)
        rows = [r.asDict() for r in iceberg_data_files(spark, spec).collect()]
        snap_before = plan.source_snapshot
        new_segs = extend_plan_from_iceberg_listing(
            plan, rows, target_docs_per_seg, new_snapshot=snap)
        # persist snapshot-only advances too (new commits that added zero
        # data files, e.g. metadata/ops commits) so the plan records what
        # it has reconciled against
        if plan.source_snapshot != snap_before and not new_segs:
            write_build_plan(plan, index_dir)
    else:
        new_segs = extend_build_plan(plan, spec.location, target_docs_per_seg)
    if new_segs:
        write_build_plan(plan, index_dir)
    done = completed_segments(index_dir)
    # resume over the WHOLE plan, not just this call's additions: a crash
    # between write_build_plan and segment commit on a prior attempt leaves
    # planned-but-unbuilt segments that must be picked up here (the same
    # exactly-once rule as build_index's pending computation)
    pending = [s for s in plan.seg_ids() if s not in done]
    # unspecified config inherits the EXISTING index's build config so
    # appended segments are homogeneous (mixed configs corrupt maintenance
    # jobs and silently break keyword/field queries on streamed docs)
    cfg = read_manifest_config(index_dir)
    if analyzer is None:
        analyzer = cfg.get("analyzer", "standard")
    if store_positions is None:
        store_positions = bool(cfg.get("store_positions", True))
    if keyword_fields is None:
        keyword_fields = tuple(cfg.get("keyword_fields", ()))
    if analyzed_fields is None:
        analyzed_fields = tuple(cfg.get("analyzed_fields", ()))
    if block_size is None:
        block_size = int(cfg.get("block_size", BLOCK_SIZE))
    field_analyzers = cfg.get("field_analyzers") or None
    payload_analyzer = cfg.get("payload_analyzer")
    if pending:
        _build_chunk(spark, plan, pending, index_dir, analyzer,
                     store_positions, max_postings_per_row, block_size,
                     tuple(keyword_fields), tuple(analyzed_fields),
                     field_analyzers, None, payload_analyzer)
    if pending and refresh_stats:
        merge_index(spark, index_dir)
    if pending and commit_points:
        # one commit generation per increment (segments_N per NRT refresh,
        # index/SegmentInfos.java:668): readers can pin any past increment
        # until the deletion policy drops it (indexing/commits.py)
        from ..indexing.commits import commit_point

        commit_point(index_dir, source="ingest",
                     user_data={"segments_added": pending})
    return pending


class StreamIndexer:
    """foreachBatch sink: stage the micro-batch as parquet files, then append
    them as segments. One instance per streaming query."""

    def __init__(self, index_dir: str, **append_opts):
        self.index_dir = index_dir
        self.append_opts = append_opts

    def staging_dir(self, batch_id: int) -> str:
        return os.path.join(self.index_dir, "stream_batches", f"batch={batch_id}")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        staging = self.staging_dir(batch_id)
        if not os.path.exists(os.path.join(staging, "_SUCCESS")):
            batch_df.write.mode("overwrite").parquet(staging)
        append_to_index(batch_df.sparkSession, staging, self.index_dir,
                        **self.append_opts)


def stream_from_directory(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    *,
    schema: str = PAGES_DDL,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    **append_opts,
):
    """Watch a directory of page parquet files and index them incrementally.
    With available_now=True the query drains the current backlog and stops
    (run it again later for the next increment — NRT-style refresh)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = (
        stream.writeStream
        .foreachBatch(StreamIndexer(index_dir, **append_opts))
        .option("checkpointLocation", os.path.join(index_dir, "_stream_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
