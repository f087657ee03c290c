"""Page-corpus source abstraction: parquet directories and Iceberg tables.

Reference parity: this is the engine's Directory abstraction analog
(reference src/java/org/apache/lucene/store/Directory.java:25 — "A
Directory is a flat list of files"; FSDirectory/RAMDirectory are its
storage bindings). Here the "directory" of the CORPUS is a flat list of
parquet data files resolved from either a filesystem path or an Iceberg
snapshot, and the index's own storage binding is Spark's Hadoop FS layer.

The north rule's corpus is "an Iceberg table of Common-Crawl-style web pages"
with columns (url string, warc_ts timestamp, html binary, text string,
lang string). This module is the single place that turns a *source string*
into a pages DataFrame, so every consumer (index build, pipeline ops,
spark-submit jobs) accepts either form:

  ``/data/pages`` or ``parquet:/data/pages``   — a parquet directory
  ``iceberg:warehouse.web.pages``              — an Iceberg catalog table
  ``iceberg:warehouse.web.pages@snapshot-id=123456789``
  ``iceberg:warehouse.web.pages@as-of=2026-01-01T00:00:00``  (time travel)

Iceberg reads go through the Spark DataSource V2 connector
(``spark.read.format("iceberg")``), which provides partition pruning,
column-stat file skipping, and snapshot isolation natively — the engine adds
nothing between Catalyst and the table format. The sandbox ships no Iceberg
runtime jar, so the Iceberg branch is gated: ``has_iceberg(spark)`` probes
the JVM classpath and callers (and tests) degrade with a clear error instead
of an opaque ClassNotFoundException.

Design note for the index build (see indexing/plan.py): an Iceberg snapshot
IS a pinned list of parquet data files, so the segment planner reads the
``<table>.files`` metadata table once (file_path + record_count, one row per
data file) instead of opening 10^6 parquet footers — and the heavy build
stage then scans those data files directly, catalog-free and point-in-time
consistent even while ingest keeps committing to the table.
"""

from __future__ import annotations

from dataclasses import dataclass

# Schema per BASELINE.json input_hint (shared with streaming/ingest.py).
PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")

# read_pages validates these exist; `html`/`text` presence varies by corpus
# stage (raw crawl vs extracted), so only the key + one content column are
# hard requirements.
REQUIRED_PAGE_COLS = ("url",)
CONTENT_PAGE_COLS = ("html", "text")


@dataclass(frozen=True)
class SourceSpec:
    """A parsed corpus source. ``kind`` is ``parquet`` or ``iceberg``;
    ``location`` is a filesystem path (parquet) or a catalog table name
    (iceberg). ``snapshot_id``/``as_of`` are Iceberg time-travel pins —
    mutually exclusive, both None means the table's current snapshot."""

    kind: str
    location: str
    snapshot_id: int | None = None
    as_of: str | None = None


def parse_source(src: str) -> SourceSpec:
    """Parse a source string into a SourceSpec. Bare strings (no scheme)
    are parquet paths — the historical calling convention of build_index."""
    if not isinstance(src, str) or not src:
        raise ValueError(f"empty corpus source: {src!r}")
    if src.startswith("parquet:"):
        return SourceSpec(kind="parquet", location=src[len("parquet:"):])
    if not src.startswith("iceberg:"):
        return SourceSpec(kind="parquet", location=src)

    body = src[len("iceberg:"):]
    snapshot_id: int | None = None
    as_of: str | None = None
    if "@" in body:
        table, _, pin = body.partition("@")
        key, _, val = pin.partition("=")
        if not val:
            raise ValueError(
                f"malformed Iceberg time-travel pin {pin!r} "
                f"(expected snapshot-id=<long> or as-of=<timestamp>)")
        if key == "snapshot-id":
            snapshot_id = int(val)
        elif key == "as-of":
            as_of = val
        else:
            raise ValueError(
                f"unknown Iceberg pin {key!r} (snapshot-id | as-of)")
    else:
        table = body
    if not table or "/" in table:
        raise ValueError(
            f"Iceberg source must be a catalog table name, got {table!r}")
    return SourceSpec(kind="iceberg", location=table,
                      snapshot_id=snapshot_id, as_of=as_of)


def has_iceberg(spark) -> bool:
    """True if the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def _iceberg_reader(spark, spec: SourceSpec):
    if not has_iceberg(spark):
        raise RuntimeError(
            "Iceberg source requested but no Iceberg runtime jar is on the "
            "Spark classpath; launch with --packages "
            "org.apache.iceberg:iceberg-spark-runtime-<spark_ver>_<scala_ver>"
            " and a configured catalog")
    reader = spark.read.format("iceberg")
    if spec.snapshot_id is not None:
        reader = reader.option("snapshot-id", str(spec.snapshot_id))
    elif spec.as_of is not None:
        reader = reader.option("as-of-timestamp", _as_of_millis(spec.as_of))
    return reader


def _as_of_millis(as_of: str) -> str:
    """Iceberg's as-of-timestamp option takes epoch millis; accept either
    that or an ISO timestamp (interpreted as UTC when naive)."""
    if as_of.isdigit():
        return as_of
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(as_of)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return str(int(dt.timestamp() * 1000))


def read_pages(spark, src: str | SourceSpec, columns: tuple = ()):
    """Load the pages corpus as a DataFrame and validate its shape.

    ``columns``, when given, is projected immediately so column pruning
    reaches the scan (parquet ReadSchema / Iceberg projected schema) no
    matter what the caller does next.
    """
    spec = parse_source(src) if isinstance(src, str) else src
    if spec.kind == "iceberg":
        df = _iceberg_reader(spark, spec).load(spec.location)
    else:
        df = spark.read.parquet(spec.location)
    names = set(df.columns)
    missing = [c for c in REQUIRED_PAGE_COLS if c not in names]
    if missing or not any(c in names for c in CONTENT_PAGE_COLS):
        raise ValueError(
            f"source {spec.location!r} is not a pages table: missing "
            f"{missing or list(CONTENT_PAGE_COLS)} (have {sorted(names)}; "
            f"expected shape: {PAGES_DDL})")
    if columns:
        df = df.select(*[c for c in columns if c in names])
    return df


def iceberg_data_files(spark, spec: SourceSpec):
    """List the snapshot's data files from the ``<table>.files`` metadata
    table: (file_path, record_count, content, file_format) — one row per
    data file, served from Iceberg manifests (no footer reads). The segment
    planner consumes this; see indexing/plan.py:make_build_plan_iceberg."""
    return (_iceberg_reader(spark, spec)
            .load(spec.location + ".files")
            .select("content", "file_path", "record_count", "file_format"))


def iceberg_current_snapshot_id(spark, spec: SourceSpec) -> int | None:
    """Resolve the table's current main-branch snapshot id (from the
    ``.refs`` metadata table) so an unpinned plan can be persisted PINNED —
    resume then replays the exact file list even after new commits."""
    rows = (_iceberg_reader(spark, spec)
            .load(spec.location + ".refs")
            .where("name = 'main'")
            .select("snapshot_id").collect())
    return int(rows[0]["snapshot_id"]) if rows else None
