"""Custom stateful streaming operator: gap-based sessionization via
`applyInPandasWithState` — the arbitrary-stateful-processing escape hatch
the brief calls for when windowed aggregation can't express the semantics
(a session has no fixed window; it closes `gap_s` after its LAST event).

Per-user state = (session_start, last_ts, n_events). Each micro-batch
folds its (sorted) events into the open session, emitting a row whenever a
gap splits it; an event-time timeout (watermark passing last_ts + gap)
flushes sessions that receive no further events. State size is O(active
users), bounded by the timeout eviction — this is what a 100 TB/day event
stream needs: state never grows with event volume, only with concurrent
user cardinality, and the state store shards on the groupBy key.

Batch twin (same output contract): __spark_entry__._q_events_sessionize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import EVENTS_DDL

OUT_DDL = "user_id long, session_start long, duration_s long, n_events long"
STATE_DDL = "start long, last long, n long"


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    *,
    gap_s: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming DataFrame of CLOSED sessions (append): one row per session
    once its gap has elapsed in event time."""
    stream = (spark.readStream.schema(EVENTS_DDL).parquet(input_dir)
              .withWatermark("ts", watermark)
              .select("user_id", "ts"))
    # Arrow hands the UDF session-timezone-naive timestamps while the state
    # timeout compares against the TRUE event-time watermark epoch — localize
    # through the session zone or a non-UTC session flushes sessions offset
    # by the UTC gap (same contract as streaming/dedup.py)
    tz = spark.conf.get("spark.sql.session.timeZone")

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        closed: list[tuple] = []
        # a null user_id is a real group (the batch twin groups nulls
        # together, and Arrow hands it to the UDF as NaN) — int(NaN)
        # raised and failed the whole stateful stage on crawled logs
        raw = key[0]
        user = None if raw is None or raw != raw else int(raw)
        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                closed.append((user, s, last - s, n))
            state.remove()
        else:
            ts: list[int] = []
            for pdf in pdfs:
                # NaT-safe: null event times carry no session information
                ts.extend(int(v.tz_localize(tz).timestamp()) for v in pdf["ts"]
                          if v is not None and v == v)
            ts.sort()
            if state.exists:
                s, last, n = state.get
            else:
                s, last, n = None, None, 0
            for t in ts:
                if s is None:
                    s, last, n = t, t, 1
                elif t - last > gap_s:
                    closed.append((user, s, last - s, n))
                    s, last, n = t, t, 1
                elif t < s - gap_s:
                    # cross-batch straggler well BEFORE the open session:
                    # its own (already-closed) session. Approximation: any
                    # sibling stragglers landing in later batches would not
                    # merge with it — documented divergence from the batch
                    # twin, bounded by the watermark.
                    closed.append((user, t, 0, 1))
                elif t < s:
                    # straggler within the gap: extend the session backwards
                    # (the batch twin's global sort would have started here)
                    s, n = t, n + 1
                else:
                    last, n = max(last, t), n + 1
            if s is not None:
                state.update((s, last, n))
                # flush when the watermark passes last event + gap; clamp —
                # Spark rejects a timeout at/under the current watermark
                # (backlog drains can advance it past last + gap in one
                # batch) and an unclamped value kills the query
                state.setTimeoutTimestamp(
                    max((last + gap_s) * 1000,
                        state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start",
                             "duration_s", "n_events"])

    return stream.groupBy("user_id").applyInPandasWithState(
        fn, OUT_DDL, STATE_DDL, "append", GroupStateTimeout.EventTimeTimeout)


def run_sessionize_to_memory(
    spark: SparkSession,
    input_dir: str,
    *,
    query_name: str = "sessions",
    gap_s: int = 1800,
    watermark: str = "30 minutes",
):
    df = streaming_sessionize(spark, input_dir, gap_s=gap_s,
                              watermark=watermark)
    return (df.writeStream.outputMode("append").format("memory")
            .queryName(query_name).start())
