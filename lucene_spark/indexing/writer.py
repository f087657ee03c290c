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

    def update_documents(self, input_path: str,
                         key_field: str = "url") -> dict:
        """Batch updateDocument(Term(key_field, k), doc): tombstone every
        live doc whose key matches a key present in the incoming batch,
        then append the batch. The delete lands before the append, so a
        reader opened AFTER this call sees exactly one live version per
        key; readers (or pinned commits) from before keep the old ones."""
        from .deletes import delete_by_docids

        n_del = 0
        try:
            reader = IndexReader(self.spark, self.index_dir)
        except FileNotFoundError:
            reader = None  # empty index: a pure add
        if reader is not None:
            keys = (self.spark.read.parquet(input_path)
                    .select(key_field).distinct())
            victims = (reader.docmap()
                       .join(F.broadcast(keys), key_field)
                       .select("seg", "docid"))
            # the batch is one crawl increment — bounded, broadcastable;
            # docmap stays distributed (never collected)
            n_del = victims.count()
            if n_del:
                delete_by_docids(self.spark, self.index_dir, victims)
        segs = self.add_documents(input_path)
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

    # --- readers ----------------------------------------------------------
    def get_reader(self, commit: int | None = None) -> IndexReader:
        """NRT reader over the current state (IndexWriter.getReader), or a
        pinned reader over a retained commit generation."""
        return IndexReader(self.spark, self.index_dir, commit=commit)
