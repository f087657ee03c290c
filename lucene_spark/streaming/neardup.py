"""Streaming NEAR-duplicate detection — minhash-LSH over the north-rule
page stream, the ingest-side twin of the batch `dedup_minhash_lsh`
pipeline op (recrawls and boilerplate mirrors arrive as *near* copies;
exact-hash dedup in streaming/dedup.py cannot see them).

Same math as the batch op, end to end:

- per-page signature: 8 minhash components over distinct word-3-gram
  shingles, `mh_j = min over shingles of h60(concat(j, '|', shingle))` —
  computed as a NARROW per-row projection with higher-order array
  functions (split → transform/slice shingles → array_min of the hashed
  transform), no shuffle, no UDF, exactly the numbers the batch
  aggregation produces (pinned by tests/test_streaming_neardup.py);
- banding: 4 bands × 2 rows, band hash = md5 of the two components —
  identical to the batch `stack()` expression;
- detection: `applyInPandasWithState` keyed on (band, band-hash): each
  arriving page is compared against the bucket's retained members by
  full-signature match count, and every pair with ≥ EST_MIN matching
  components (estimated jaccard ≥ the batch threshold) is emitted as a
  detection — the signature-estimate form of the batch op's prefilter
  (a stream cannot keep full shingle sets for an exact verify; the
  estimate IS the standard streaming/industry contract).

Bounded state, the part that matters at 100 TB/day: a bucket retains at
most BUCKET_CAP members (the batch op's mega-bucket cap analog — later
arrivals in an over-cap boilerplate bucket still compare against the
retained head but are not added), and buckets are evicted by an
event-time TTL exactly like streaming/dedup.py, so state is
O(buckets inside the TTL × cap), never O(stream).

A page can collide with the same partner in several bands; detections
are therefore emitted per band. Downstream either tolerates the
redundancy (dedup is idempotent) or collapses it with
`dropDuplicatesWithinWatermark(["url", "dup_of"])`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .dedup import PAGES_DDL

N_MINHASH = 8
N_BANDS = 4
EST_MIN = 4        # ceil(N_MINHASH * 0.5) — the batch _MH_EST_MIN
BUCKET_CAP = 100   # retained members per band bucket (_LSH_BAND_CAP analog)

OUT_DDL = ("url string, dup_of string, band int, n_match int, "
           "ts timestamp")
# per-bucket retained members: event-time MICROSECONDS + flattened
# row-major n×N_MINHASH signature components
STATE_DDL = "urls array<string>, ts array<long>, sigs array<long>"

_H60 = ("cast(conv(substring(md5(cast({s} as binary)), 1, 15), 16, 10) "
        "as bigint)")


def _sig_exprs() -> list:
    """The 8 per-row minhash columns over `sh` (the distinct-shingle array
    column) — value-identical to the batch `_minhash_sigs` aggregation."""
    return [
        F.expr("array_min(transform(sh, s -> "
               + _H60.format(s=f"concat('{j}', '|', s)") + f")) as mh{j}")
        for j in range(N_MINHASH)
    ]


def signed_pages(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, mh0..mh7) — narrow projection, batch or streaming.

    Pages with <3 tokens have no shingles (array_min → null) and are
    dropped: they carry no near-dup signal, exactly as in the batch op
    where the shingle explode yields no rows for them."""
    return (
        pages
        .where(F.col("text").isNotNull())
        .select("url", "warc_ts", F.split("text", " ").alias("toks"))
        .select("url", "warc_ts", F.expr(
            "CASE WHEN size(toks) >= 3 THEN "
            "array_distinct(transform(sequence(0, size(toks)-3), "
            "i -> concat_ws(' ', slice(toks, i+1, 3)))) "
            "ELSE array() END").alias("sh"))
        .select("url", "warc_ts", *_sig_exprs())
        .where(F.col("mh0").isNotNull())
    )


def _banded(signed: DataFrame) -> DataFrame:
    stack_args = ", ".join(
        f"{b}, md5(cast(concat_ws('_', cast(mh{2*b} as string), "
        f"cast(mh{2*b+1} as string)) as binary))" for b in range(N_BANDS))
    return signed.selectExpr(
        "url", "warc_ts", f"stack({N_BANDS}, {stack_args}) as (band, bh)",
        f"array({', '.join(f'mh{j}' for j in range(N_MINHASH))}) as sig")


def streaming_neardup_pages(
    spark: SparkSession,
    input_dir: str,
    *,
    ttl_s: int = 86_400,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Near-dup detections (url, dup_of, band, n_match, ts): at detection
    time `ts` the arriving page matched a retained bucket member on
    `n_match` ≥ EST_MIN of 8 signature components in `band`'s bucket;
    the pair is oriented by EVENT time — `dup_of` is the (warc_ts, url)-
    earlier page, `url` the later — regardless of arrival order, so late
    data inside the watermark cannot flip which copy a
    keep-first/drop-rest consumer discards."""
    stream = (
        spark.readStream.schema(PAGES_DDL).parquet(input_dir)
        .withWatermark("warc_ts", watermark)
    )
    rows = _banded(signed_pages(stream))
    # Arrow hands the UDF session-timezone-naive timestamps; localize back
    # through the session zone (see streaming/dedup.py)
    tz = spark.conf.get("spark.sql.session.timeZone")

    def fn(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        out: list[tuple] = []
        band = int(key[0])
        if state.hasTimedOut:
            state.remove()
        else:
            incoming: list[tuple[int, str, list[int]]] = []
            for pdf in pdfs:
                for ts, url, sig in zip(pdf["warc_ts"], pdf["url"],
                                        pdf["sig"]):
                    if ts is not None and ts == ts:
                        us = ts.tz_localize(tz).value // 1_000
                        incoming.append((us, str(url),
                                         [int(x) for x in sig]))
            incoming.sort(key=lambda r: (r[0], r[1]))
            if incoming:
                if state.exists:
                    urls, tss, flat = state.get
                    urls = list(urls)
                    tss = list(tss)
                    flat = list(flat)
                else:
                    urls, tss, flat = [], [], []
                mem = (np.asarray(flat, dtype=np.int64)
                       .reshape(-1, N_MINHASH))
                for us, url, sig in incoming:
                    sv = np.asarray(sig, dtype=np.int64)
                    if len(urls):
                        nm = (mem == sv).sum(axis=1)
                        ts_out = (pd.Timestamp(us * 1_000, unit="ns",
                                               tz="UTC")
                                  .tz_convert(tz).tz_localize(None))
                        for i in np.flatnonzero(nm >= EST_MIN):
                            # orient by EVENT time, not arrival order: a
                            # late page (earlier warc_ts, inside the
                            # watermark) must come out as dup_of, or a
                            # keep-dup_of/drop-url consumer would keep
                            # the later copy
                            a, b = ((urls[i], url)
                                    if (tss[i], urls[i]) <= (us, url)
                                    else (url, urls[i]))
                            out.append((b, a, band, int(nm[i]), ts_out))
                    if len(urls) < BUCKET_CAP:
                        urls.append(url)
                        tss.append(us)
                        flat.extend(sig)
                        mem = np.vstack([mem, sv[None, :]])
                state.update((urls, tss, flat))
                # TTL horizon extends on ANY bucket activity: an over-cap
                # (boilerplate) bucket keeps matching against its retained
                # head as long as traffic flows, instead of evicting it
                # mid-stream because no new member was ADDED
                last = max(max(tss, default=0), incoming[-1][0])
                state.setTimeoutTimestamp(
                    max(last // 1_000 + ttl_s * 1_000,
                        state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            out, columns=["url", "dup_of", "band", "n_match", "ts"])

    return rows.groupBy("band", "bh").applyInPandasWithState(
        fn, OUT_DDL, STATE_DDL, "append", GroupStateTimeout.EventTimeTimeout)


def run_neardup_to_memory(
    spark: SparkSession,
    input_dir: str,
    *,
    query_name: str = "neardup",
    ttl_s: int = 86_400,
    watermark: str = "30 minutes",
):
    df = streaming_neardup_pages(spark, input_dir, ttl_s=ttl_s,
                                 watermark=watermark)
    return (df.writeStream.outputMode("append").format("memory")
            .queryName(query_name).start())
