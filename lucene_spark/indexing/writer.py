"""IndexWriter — the reference's top-level write API as one facade.

Reference surface reproduced (cites /root/reference):
- ``IndexWriter.addDocument`` / ``updateDocument`` / ``deleteDocuments``
  (index/IndexWriter.java:2008,2072,2118,2162): update = atomic
  delete-by-term + add; deletes buffer until flush.
- ``IndexWriter.commit`` (index/IndexWriter.java:3439) — durable commit
  point; ``maybeMerge`` cascades the merge policy;
  ``expungeDeletes`` (index/IndexWriter.java:2516) rewrites segments to
  drop tombstoned docs; ``getReader`` (index/IndexWriter.java:386) is the
  NRT reader over the current state.

Spark-first restatement: documents arrive as PARQUET BATCHES, not one at
a time — the driver of a 10^12-doc crawl hands whole file listings to the
planner, so every method here is batch-shaped and maps 1:1 onto the
existing distributed primitives (append_to_index, delete_by_*, commits,
merge). The facade adds exactly one new semantic, ``update_documents``:
the reference's updateDocument(Term("url", u), doc) generalized to a
batch — tombstone every live doc whose key matches a key in the incoming
batch, then append the batch as fresh segments. Re-crawled pages replace
their previous versions; the old versions stay readable from a reader
opened (or a commit pinned) before the update, exactly like Lucene's
point-in-time semantics over an update.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from .reader import IndexReader


class IndexWriter:
    """Batch-shaped writer facade over one index directory. Construction
    options mirror IndexWriterConfig and are forwarded to the append path
    (analyzer, positions, fields config inherit from the existing index
    when omitted — appended segments stay homogeneous)."""

    def __init__(self, spark: SparkSession, index_dir: str, **append_opts):
        self.spark = spark
        self.index_dir = index_dir
        self.append_opts = append_opts

    # --- add / update / delete (IndexWriter.java:2008,2072,2118,2162) ----
    def add_documents(self, input_path: str) -> list[int]:
        """Append the pages under input_path as new segments (batch
        addDocument). Idempotent per file — already-planned files skip."""
        from ..streaming.ingest import append_to_index

        return append_to_index(self.spark, input_path, self.index_dir,
                               **self.append_opts)

    def _segments_of(self, input_path: str) -> set[int]:
        """Segment ids whose plan files came from input_path — resolved from
        the persisted build plan, so a RETRIED call maps to the segments the
        original run created, not just this run's additions. Iceberg sources
        resolve their file set from the table's data-file listing (the same
        listing the append planner diffs against)."""
        from ..indexing.plan import _norm, read_build_plan
        from ..sources.pages import iceberg_data_files, parse_source

        spec = parse_source(input_path)
        if spec.kind == "iceberg":
            mine = {_norm(r["file_path"])
                    for r in iceberg_data_files(self.spark, spec).collect()}
        else:
            paths: list[str] = []
            if os.path.isdir(spec.location):
                for root, _dirs, names in os.walk(spec.location):
                    paths.extend(os.path.join(root, n) for n in names
                                 if n.endswith(".parquet"))
            else:
                paths.append(spec.location)
            mine = {_norm(os.path.abspath(p)) for p in paths}
        try:
            plan = read_build_plan(self.index_dir)
        except FileNotFoundError:
            return set()
        return {f.seg for f in plan.files if _norm(f.path) in mine}

    def update_documents(self, input_path: str,
                         key_field: str = "url") -> dict:
        """Batch updateDocument(Term(key_field, k), doc): append the batch,
        then tombstone every live doc whose key matches a key present in it.

        REPLAY-SAFE by construction (a retried crawl increment is the
        normal case, not the exception): the append runs FIRST and is
        idempotent per file; victims are restricted to segments OTHER than
        the ones holding this batch's files (resolved from the build plan,
        so a retry sees the original run's segments too) and anti-joined
        against existing tombstones. Re-running the same call is therefore
        a no-op that reports deleted=0 — the old ordering (delete before
        append) permanently lost the replacement docs on a retry, because
        the re-run tombstoned them and the file-idempotent append added
        nothing back. A reader opened AFTER this call returns sees exactly
        one live version per key; readers (or pinned commits) from before
        keep the old ones.

        Parquet directory inputs (the facade's primary shape — one batch
        per directory) get LAST-WRITE-WINS semantics even if a directory
        accumulates increment files over calls: among this path's own
        segments, the copy with the highest docid per key (docids are
        monotone with append order, so the latest crawl) survives and
        every other live copy — earlier increments in the same directory
        included — is tombstoned. A retry re-derives the same winners, so
        it stays a no-op.

        Iceberg inputs: "this batch" resolves to EVERY data file currently
        in the table, so the semantic is table-level sync — table versions
        replace matching docs indexed from OTHER sources; two versions of
        the same key BOTH inside the table are left alone (they are the
        table's own content — dedup within a source is delete_documents /
        the dedup ops' job)."""
        from .deletes import delete_by_docids, deleted_docids
        from ..sources.pages import parse_source, read_pages

        segs = self.add_documents(input_path)
        own = self._segments_of(input_path)
        try:
            reader = IndexReader(self.spark, self.index_dir)
        except FileNotFoundError:
            return {"deleted": 0, "segments_added": segs}

        keys = (read_pages(self.spark, input_path, columns=(key_field,))
                .select(key_field).distinct())
        # no forced broadcast of the key set: a "crawl increment" can be
        # a day of pages (10^9 keys at production scale), which would OOM
        # a broadcast hint — AQE broadcasts small increments on its own
        # and falls back to a key-shuffled join for huge ones; docmap
        # stays distributed (never collected)
        dd = deleted_docids(self.spark, self.index_dir)

        def _live(df):
            # already-tombstoned docs must not be re-counted or
            # re-tombstoned (a second update of the same keys would
            # otherwise double-report), nor win a last-write-wins race
            return (df if dd is None
                    else df.join(dd, ["seg", "docid"], "left_anti"))

        matching = _live(reader.docmap().join(keys, key_field)
                         .select(key_field, "seg", "docid"))
        if parse_source(input_path).kind == "iceberg" or not own:
            # table-level sync: the table's own rows are never victims
            victims = (matching
                       .where(~F.col("seg").isin(sorted(own))
                              if own else F.lit(True))
                       .select("seg", "docid"))
        else:
            # last-write-wins: per key, the live copy with the highest
            # docid among this path's OWN segments survives; every other
            # live copy (other sources AND earlier increments under the
            # same path) is a victim. One increment-sized groupBy + an
            # anti-join on (seg, docid) — docmap never collected.
            winners = (matching.where(F.col("seg").isin(sorted(own)))
                       .groupBy(key_field)
                       .agg(F.max_by(F.struct("seg", "docid"), F.col("docid"))
                            .alias("w"))
                       .select("w.seg", "w.docid"))
            victims = (matching.select("seg", "docid")
                       .join(winners, ["seg", "docid"], "left_anti"))
        n_del = victims.count()
        if n_del:
            delete_by_docids(self.spark, self.index_dir, victims)
        return {"deleted": int(n_del), "segments_added": segs}

    def delete_documents(self, query) -> int:
        """deleteDocuments(Term|Query): tombstone all docs matching a term
        string, query string, or AST. Visible to new readers immediately;
        physical removal waits for expunge_deletes (BufferedDeletes)."""
        from .deletes import delete_by_query

        return delete_by_query(self.spark, self.index_dir, query)

    # --- commit / merge / expunge ----------------------------------------
    def commit(self, user_data: dict | None = None) -> dict:
        """Durable commit point (IndexWriter.commit → segments_N): records
        the live segment set + corpus stats as a new generation readers
        can pin (commits.py)."""
        from .commits import commit_point

        return commit_point(self.index_dir, source="writer",
                            user_data=user_data)

    def maybe_merge(self, merge_factor: int = 10) -> list[list[int]]:
        """Run the LogMergePolicy cascade (ConcurrentMergeScheduler's job
        in the reference; here Spark stages ARE the scheduler)."""
        from .merge import maybe_merge, merge_index

        merged = maybe_merge(self.spark, self.index_dir,
                             merge_factor=merge_factor)
        if merged:
            merge_index(self.spark, self.index_dir)
        return merged

    def expunge_deletes(self) -> dict:
        """Physically drop tombstoned docs (IndexWriter.expungeDeletes)."""
        from .deletes import expunge_deletes

        return expunge_deletes(self.spark, self.index_dir)

    def add_indexes(self, source_dirs: list[str]) -> dict:
        """Merge whole foreign indexes into this one
        (IndexWriter.addIndexesNoOptimize, index/IndexWriter.java:3172):
        rebase-copy every live source segment; deletes travel along."""
        from .addindexes import add_indexes

        return add_indexes(self.spark, self.index_dir, source_dirs)

    # --- readers ----------------------------------------------------------
    def get_reader(self, commit: int | None = None) -> IndexReader:
        """NRT reader over the current state (IndexWriter.getReader), or a
        pinned reader over a retained commit generation."""
        return IndexReader(self.spark, self.index_dir, commit=commit)
