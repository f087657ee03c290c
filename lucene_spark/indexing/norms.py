"""Index-time document boost — the norms side-car.

Reference semantics reproduced (cites /root/reference):
- ``Document.setBoost`` folds the per-doc boost into the stored norm at
  INDEX time (document/Document.java:88); NormsWriter multiplies it with
  the length norm and quantizes the product to ONE BYTE per doc-field via
  SmallFloat.floatToByte315 (index/NormsWriter.java:61, the ``.nrm`` file).
- Every term/phrase/span scorer multiplies its per-doc contribution by the
  decoded norm byte (search/TermScorer.java norms[doc]); constant-score
  queries ignore norms.

Spark-first restatement: BM25 keeps EXACT doclens inside the postings, so
only the boost factor needs storing. It lands as a per-segment side-car
``norms/seg=k/`` of POSTINGS_SCHEMA rows under the reserved term
``\\x00boost`` — docids in the VByte ids blob, the byte315-quantized boost
in the tfs slot — so it rides the identical IO path as postings and the
``.del`` tombstones, and the per-segment kernel applies it with one
searchsorted (no driver-side collection). Docs without a row default to
boost 1.0; only boost≠1.0 docs are written (sparse, like Lucene omitNorms
in spirit: the common unboosted corpus pays zero bytes and zero work).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


from .build import POSTINGS_SCHEMA, _encode_stream

BOOST_TERM = "\x00boost"


def norms_path(index_dir: str) -> str:
    return os.path.join(index_dir, "norms")


def norms_rows(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Norms side-car rows (POSTINGS_SCHEMA) or None if no boosts exist."""
    p = norms_path(index_dir)
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p)


def _b315_col():
    from pyspark.sql.functions import pandas_udf

    from ..scoring import float_to_byte315

    @pandas_udf("int")
    def b315(v: pd.Series) -> pd.Series:
        return pd.Series(
            float_to_byte315(v.to_numpy(dtype=np.float32)).astype(np.int32))

    return b315


def write_norms(spark: SparkSession, index_dir: str, docs: DataFrame,
                mode: str = "overwrite",
                block_size: int | None = None) -> None:
    """Write the norms side-car for DataFrame(seg, docid, boost). Rows with
    boost == 1.0 are dropped (the default needs no byte); the rest encode
    through the same streaming block encoder as postings/tombstones, with
    tf = byte315(boost) (index/NormsWriter.java:61's quantization).

    ``block_size``: the build's codec size. Callers INSIDE a fresh build
    (_build_chunk) must pass it explicitly — the chunk's manifests are
    written after the norms, so the manifest-config fallback would
    silently encode with the module default and scramble decodes for a
    non-default build. Maintenance callers (rebuild_norms_for_segs) may
    omit it; their manifests exist."""
    crafted = (
        docs.where(F.col("boost").isNotNull() & (F.col("boost") != 1.0))
        .select(
            F.col("seg").cast("int").alias("seg"),
            F.lit(BOOST_TERM).alias("term"),
            F.col("docid").cast("long").alias("docid"),
            _b315_col()(F.col("boost").cast("float")).alias("tf"),
            F.lit(0).alias("doclen"),
            F.array().cast("array<int>").alias("positions"),
        )
        .repartition("seg")
        .sortWithinPartitions("seg", "term", "docid")
    )
    if block_size is None:
        from .build import index_block_size

        block_size = index_block_size(index_dir)
    (crafted.mapInPandas(_encode_stream(1 << 62, block_size, False),
                         schema=POSTINGS_SCHEMA)
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic").partitionBy("seg")
        .parquet(norms_path(index_dir)))


def rebuild_norms_for_segs(spark: SparkSession, index_dir: str,
                           segs: list[int]) -> None:
    """Regenerate the norms partitions for `segs` from the (already
    rewritten) docmap — the merge/expunge maintenance hook: docmap carries
    the authoritative per-doc boost column, the side-car is derived state."""
    import shutil

    p = norms_path(index_dir)
    if not os.path.isdir(p):
        return
    for s in segs:
        shutil.rmtree(os.path.join(p, f"seg={s}"), ignore_errors=True)
    dm = (spark.read.parquet(os.path.join(index_dir, "docmap"))
          .where(F.col("seg").isin(segs)))
    if "boost" not in dm.columns:
        return
    write_norms(spark, index_dir, dm.select("seg", "docid", "boost"),
                mode="append")
