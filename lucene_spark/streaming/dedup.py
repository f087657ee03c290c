"""Streaming exact deduplication — the ingest-side dedup a training-data
pipeline runs on a page stream BEFORE indexing (recrawls make the same
text arrive many times; the batch twin is __spark_entry__._q_dedup_exact,
and the in-engine analog is contrib DuplicateFilter,
contrib/queries/src/java/org/apache/lucene/search/DuplicateFilter.java:35).

Two variants, by how long duplicates must be remembered:

- `streaming_dedup_pages` — Spark's built-in bounded-state dedup
  (`dropDuplicatesWithinWatermark` on the content key): the right tool
  when the duplicate horizon fits the watermark. The state store evicts
  keys automatically as the watermark passes; state is O(keys inside the
  watermark window) per shard, sharded on the key.

- `streaming_dedup_pages_stateful` — `applyInPandasWithState` with an
  explicit per-key first-seen state and an event-time TTL, for when the
  duplicate horizon is much LONGER than the watermark you can afford
  (suppress recrawls for days while watermarking minutes). Emits only the
  first occurrence of each key; re-occurrences inside the TTL bump a dup
  counter in state and are suppressed; the TTL timeout evicts the key, so
  state is O(distinct keys inside the TTL) — bounded, never O(stream).
  After eviction a re-occurrence re-emits (at-most-once per TTL window):
  that is the documented contract, exactly what a bounded-memory dedup can
  promise at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# the north-rule page stream (url, warc_ts, html, text, lang); html is
# irrelevant to exact-text dedup and pruned at the scan
PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")
OUT_DDL = "key string, url string, first_ts timestamp"
# first/last are event-time MICROSECONDS (sub-second order matters for the
# first-occurrence tiebreak; whole seconds would collapse it)
STATE_DDL = "url string, first long, last long, n_dups long"


def _keyed(spark: SparkSession, input_dir: str, watermark: str) -> DataFrame:
    # pages with NULL text carry no dedup signal: excluded up front so both
    # variants (and the batch twin) agree instead of one fabricating a
    # null-key group
    return (
        spark.readStream.schema(PAGES_DDL).parquet(input_dir)
        .withWatermark("warc_ts", watermark)
        .where(F.col("text").isNotNull())
        .select(F.md5(F.col("text").cast("binary")).alias("key"),
                "url", "warc_ts")
    )


def streaming_dedup_pages(
    spark: SparkSession,
    input_dir: str,
    *,
    watermark: str = "30 minutes",
) -> DataFrame:
    """ONE representative per content key while the key is within the
    watermark window (built-in bounded-state dedup). Note Spark's contract:
    the survivor is whichever duplicate is PROCESSED first, which inside a
    single micro-batch is not necessarily the earliest warc_ts — use the
    stateful variant when the earliest-(ts, url) pick matters."""
    return (
        _keyed(spark, input_dir, watermark)
        .dropDuplicatesWithinWatermark(["key"])
        .select("key", "url", F.col("warc_ts").alias("first_ts"))
    )


def streaming_dedup_pages_stateful(
    spark: SparkSession,
    input_dir: str,
    *,
    ttl_s: int = 86_400,
    watermark: str = "30 minutes",
) -> DataFrame:
    """First occurrence (earliest event time, url tiebreak) per content key
    with a TTL decoupled from the watermark: duplicates are suppressed
    until no occurrence has been seen for `ttl_s` of EVENT time, then the
    key is evicted."""
    stream = _keyed(spark, input_dir, watermark)
    # Arrow hands the UDF session-timezone-naive timestamps; the state
    # timeout compares against the TRUE event-time watermark epoch, so the
    # naive values must be localized back through the session zone (a
    # non-UTC session would otherwise evict keys offset by the UTC gap)
    tz = spark.conf.get("spark.sql.session.timeZone")

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        out: list[tuple] = []
        k = str(key[0])
        if state.hasTimedOut:
            state.remove()
        else:
            rows: list[tuple[int, str]] = []
            for pdf in pdfs:
                for ts, url in zip(pdf["warc_ts"], pdf["url"]):
                    # NaT-safe: a null event time cannot order a first-seen
                    if ts is not None and ts == ts:
                        us = ts.tz_localize(tz).value // 1_000
                        rows.append((us, str(url)))
            rows.sort()
            if rows:
                if state.exists:
                    url0, first, last, n_dups = state.get
                    # max(): a LATE duplicate must not move the TTL horizon
                    # backwards and shorten the documented suppression window
                    last = max(last, rows[-1][0])
                    state.update((url0, first, last, n_dups + len(rows)))
                else:
                    first, url0 = rows[0]
                    last = rows[-1][0]
                    state.update((url0, first, last, len(rows) - 1))
                    out.append((k, url0,
                                pd.Timestamp(first * 1_000, unit="ns",
                                             tz="UTC").tz_convert(tz)
                                .tz_localize(None)))
                # evict when the watermark passes last occurrence + TTL;
                # clamp above the current watermark (Spark rejects a
                # timeout at/under it — see streaming/sessions.py)
                state.setTimeoutTimestamp(
                    max(last // 1_000 + ttl_s * 1_000,
                        state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(out, columns=["key", "url", "first_ts"])

    return stream.groupBy("key").applyInPandasWithState(
        fn, OUT_DDL, STATE_DDL, "append", GroupStateTimeout.EventTimeTimeout)


def run_dedup_to_memory(
    spark: SparkSession,
    input_dir: str,
    *,
    query_name: str = "dedup",
    stateful: bool = False,
    ttl_s: int = 86_400,
    watermark: str = "30 minutes",
):
    df = (streaming_dedup_pages_stateful(spark, input_dir, ttl_s=ttl_s,
                                         watermark=watermark)
          if stateful
          else streaming_dedup_pages(spark, input_dir, watermark=watermark))
    return (df.writeStream.outputMode("append").format("memory")
            .queryName(query_name).start())
