"""Streaming percolation — evaluate a registered query bank against a
PAGE STREAM and emit (url, warc_ts, query_id) alert rows as documents
arrive.

This is the deployment shape of the reference's percolation use case
(contrib/memory/.../MemoryIndex.java:177 — "a high-frequency news feed
is matched against personal subscription queries"): the bank is
long-lived, documents stream past it once. The batch evaluator
(queries/percolate.py) is a STATELESS NARROW PROJECTION — one JVM
column expression per bank query over the document's own token array,
zero shuffle, zero Python — so it lifts onto Structured Streaming
unchanged: per micro-batch the plan is a map-only scan, append-mode,
no watermark and no state store required. At 100 TB/day the cost is
O(pages × bank) executor CPU with nothing accumulated; for 10^5+ query
banks the scale extension is the same guard-term prefilter the batch
side ships (percolate_indexed), applied per micro-batch.

Streaming-vs-batch parity is pinned by tests/test_streaming_percolate:
the union of all micro-batch outputs equals the batch percolate() of
the union of the input files, row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..queries.ast import Query
from ..queries.parser import parse_query
from ..queries.percolate import percolate

# the north-rule page stream (url, warc_ts, html, text, lang); html is
# irrelevant to percolation and pruned at the scan
PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def _parse_bank(bank) -> list[tuple[str, Query]]:
    """Accept (query_id, Query-or-string) pairs; strings go through the
    standard QueryParser so a subscription service can register raw user
    syntax ("+alpha beta", phrases, prefixes, ...)."""
    out: list[tuple[str, Query]] = []
    for qid, q in bank:
        out.append((qid, parse_query(q) if isinstance(q, str) else q))
    return out


def streaming_percolate(spark: SparkSession, input_dir: str, bank,
                        text_col: str = "text",
                        id_col: str = "url") -> DataFrame:
    """Streaming (url, warc_ts, query_id) matches of `bank` over the page
    stream at `input_dir`. Pages with NULL text carry no terms and can
    only match a MatchAll-shaped query through an all-null token array;
    they are excluded up front so both engines (and the batch twin on the
    same pages) agree."""
    pages = (spark.readStream.schema(PAGES_DDL).parquet(input_dir)
             .where(F.col(text_col).isNotNull()))
    return percolate(pages, _parse_bank(bank), text_col=text_col,
                     id_col=id_col, passthrough=["warc_ts"])


def run_percolate_to_memory(spark: SparkSession, input_dir: str, bank,
                            query_name: str = "percolate_alerts"):
    """Drive streaming_percolate into an in-memory sink (tests/demos).
    Append-mode: a stateless projection emits each match exactly once,
    in the micro-batch its page arrives."""
    return (streaming_percolate(spark, input_dir, bank)
            .writeStream.format("memory").queryName(query_name)
            .outputMode("append").start())


def run_percolate_indexed_to_parquet(spark: SparkSession, input_dir: str,
                                     bank, out_dir: str,
                                     checkpoint_dir: str):
    """LARGE-BANK streaming percolation (10^4–10^6 registered queries):
    per micro-batch, the batch guard-index evaluator (percolate_indexed —
    broadcast guard-term join, exact CASE only on candidates) runs via
    ``foreachBatch`` and appends (url, query_id) alert rows to a parquet
    sink. foreachBatch is the right lift here, NOT a streaming plan: the
    indexed form's per-doc candidate groupBy would otherwise become a
    stateful streaming aggregation with watermark semantics the op does
    not need — each page's alerts depend only on its own micro-batch.
    Restart safety comes from the checkpoint (micro-batch replay appends
    again; downstream dedup on (url, query_id) if the sink must be
    exactly-once — stated, the parquet sink itself is at-least-once
    under foreachBatch)."""
    from ..queries.percolate import percolate_indexed

    parsed = _parse_bank(bank)
    pages = (spark.readStream.schema(PAGES_DDL).parquet(input_dir)
             .where(F.col("text").isNotNull()))

    def _batch(df: DataFrame, _epoch: int) -> None:
        (percolate_indexed(df, parsed, id_col="url")
         .write.mode("append").parquet(out_dir))

    return (pages.writeStream.foreachBatch(_batch)
            .option("checkpointLocation", checkpoint_dir).start())
