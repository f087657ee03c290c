"""lucene_spark — a PySpark-native fulltext indexing + BM25 query engine.

A from-scratch re-expression of the capabilities of the reference Lucene
build (Apache Lucene 3.1-dev, tokee/lucene fork) on idiomatic Spark:

- ``analysis``   — HTML text extraction + StandardAnalyzer-equivalent
  tokenization as pure functions, vectorized via pandas/Arrow UDFs.
- ``codec``      — numpy VByte delta codec for posting blocks with
  skip/block-max metadata (reference: FormatPostingsDocsWriter,
  DefaultSkipListWriter semantics).
- ``indexing``   — distributed segment build, checkpointed + resumable,
  LSM-style merge into a global term dictionary (reference: DocumentsWriter,
  SegmentMerger, TermInfosWriter semantics).
- ``queries``    — query AST + parser + DataFrame planner with a
  block-max-WAND scoring kernel (reference: BooleanScorer2, TermScorer,
  TopScoreDocCollector semantics, BM25 k1=1.2 b=0.75 per north rule).
- ``pipeline``   — large-scale training-data ops: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), similarity search, text stats, multimodal stubs.
- ``oracle``     — a single-node pure-Python reference implementation used by
  pytest for rank-identity checks (reference test pattern: TestBoolean2).
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
BLOCK_SIZE = 128  # postings block width (reference skipInterval=16; 128 for numpy batch width)
