"""IndexReader — handle to an on-disk index (reference IndexReader /
IndexSearcher split: stats + dictionary live on the driver side as cheap
lookups; postings stay distributed)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# RAM dictionary size guard (parquet bytes on disk). The reference holds the
# term-index (.tii — every 128th term + offsets) in RAM for exactly this
# reason: dictionary probes must not pay an IO round-trip per query
# (index/TermInfosReader.java:40 reads the whole index stream into arrays at
# open). Our term_dict parquet is small enough to hold WHOLE at any
# single-searcher-node scale (a 10M-term dictionary is ~100 MB of parquet);
# above the guard — the 10^12-doc global dictionary — probes fall back to
# the pushed-down distributed scan, which is the only honest option there.
RAM_DICT_MAX_BYTES = int(os.environ.get(
    "LUCENE_SPARK_RAM_DICT_MAX", str(256 * 1024 * 1024)))


class RamDict:
    """Driver-resident term dictionary snapshot: sorted terms + df.

    Loaded ONCE per reader straight from the term_dict parquet files with
    pyarrow (driver-side IO, no Spark job — the .tii-in-RAM analog). Serves
    the two planner needs that otherwise each cost a Spark job per query:

    - ``doc_freqs`` (Weight's global-stats bind, search/Weight.java:49)
    - MultiTermQuery enumeration (FilteredTermEnum over the in-RAM sorted
      term list: prefix/range via binary search, wildcard via the literal-
      prefix cut + anchored regex — search/WildcardTermEnum.java does the
      same constant-prefix optimization — fuzzy via the termCompare
      arithmetic of search/FuzzyTermEnum.java re-stated in Python).

    Enumeration order and arithmetic are pinned to the Spark scan path
    (term-asc, same float formulas); tests/test_ram_dict.py asserts
    RAM == Spark on every kind."""

    def __init__(self, terms: list[str], dfs: list[int]):
        import numpy as np

        order = np.argsort(np.asarray(terms, dtype=object), kind="stable")
        self.terms = [terms[i] for i in order]
        self.dfs = [int(dfs[i]) for i in order]
        self._idx = {t: i for i, t in enumerate(self.terms)}

    def __contains__(self, term: str) -> bool:
        return term in self._idx

    def df_of(self, term: str) -> int:
        i = self._idx.get(term)
        return 0 if i is None else self.dfs[i]

    def doc_freqs(self, terms) -> dict[str, int]:
        return {t: self.dfs[self._idx[t]] for t in terms if t in self._idx}

    # --- FilteredTermEnum analogs -----------------------------------------
    def _scan(self, start: int, keep, stop, limit: int,
              unfielded: bool) -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        for i in range(start, len(self.terms)):
            t = self.terms[i]
            if stop is not None and stop(t):
                break
            if unfielded and ":" in t:
                continue
            if keep(t):
                out.append((t, self.dfs[i]))
                if len(out) >= limit:
                    break
        return out

    def expand_prefix(self, prefix: str, limit: int,
                      unfielded: bool) -> list[tuple[str, int]]:
        from bisect import bisect_left

        return self._scan(bisect_left(self.terms, prefix),
                          lambda t: True,
                          lambda t: not t.startswith(prefix),
                          limit, unfielded)

    def expand_range(self, lo, hi, inc_lo: bool, inc_hi: bool, limit: int,
                     unfielded: bool) -> list[tuple[str, int]]:
        from bisect import bisect_left, bisect_right

        start = 0
        if lo is not None:
            start = bisect_left(self.terms, lo) if inc_lo \
                else bisect_right(self.terms, lo)

        def stop(t):
            if hi is None:
                return False
            return t > hi if inc_hi else t >= hi

        return self._scan(start, lambda t: True, stop, limit, unfielded)

    def expand_regex(self, pattern: str, limit: int,
                     unfielded: bool) -> list[tuple[str, int]]:
        """Anchored-regex enumeration for WILDCARD-derived patterns only
        (scoring.wildcard_to_regex emits the `^`, `\\`-escaped-literal, `.`,
        `.*` subset, on which Python and Java regex agree character for
        character). User-supplied Regexp queries stay on the Spark scan —
        the two regex dialects diverge outside this subset."""
        import re as _re
        from bisect import bisect_left

        rx = _re.compile(pattern)
        # constant-prefix cut (WildcardTermEnum.java): the pattern is
        # anchored, so everything up to the first metacharacter bounds the
        # scan range like a prefix query
        lit = []
        i = 1  # skip '^'
        while i < len(pattern):
            c = pattern[i]
            if c == "\\" and i + 1 < len(pattern):
                lit.append(pattern[i + 1])
                i += 2
                continue
            if c in ".$":
                break
            lit.append(c)
            i += 1
        prefix = "".join(lit)
        start = bisect_left(self.terms, prefix) if prefix else 0
        stop = ((lambda t: not t.startswith(prefix)) if prefix else None)
        return self._scan(start, lambda t: rx.search(t) is not None,
                          stop, limit, unfielded)

    def expand_fuzzy(self, term: str, prefix_length: int, max_edits: int,
                     min_similarity, limit: int) -> list[tuple[str, int]]:
        """FuzzyTermEnum termCompare (search/FuzzyTermEnum.java:95,129-136,
        185-216) — the same arithmetic as planner._fuzzy_cond's Column
        expression, float-for-float (both paths do exact int edit distance,
        then one double division)."""
        from bisect import bisect_left

        from ..scoring import levenshtein

        pre_len = min(prefix_length, len(term))
        fielded = ":" in term
        field_ns = term.split(":", 1)[0] + ":" if fielded else None
        pre = term[:pre_len]
        start = bisect_left(self.terms, pre) if pre_len else 0
        tsuf = term[pre_len:]
        n = len(tsuf)

        def keep(t: str) -> bool:
            if fielded:
                if not t.startswith(field_ns):
                    return False
            elif ":" in t:
                return False
            if min_similarity is None:
                if not (len(term) - max_edits <= len(t)
                        <= len(term) + max_edits):
                    return False
                return levenshtein(t, term) <= max_edits
            suf = t[pre_len:]
            m = len(suf)
            if n == 0:
                sim = (1.0 - m / float(pre_len)) if pre_len else 0.0
            elif m == 0:
                sim = (1.0 - n / float(pre_len)) if pre_len else 0.0
            else:
                sim = 1.0 - levenshtein(suf, tsuf) / (float(pre_len)
                                                      + float(min(m, n)))
            return sim > float(min_similarity)

        stop = ((lambda t: not t.startswith(pre)) if pre_len else None)
        # the unfielded/namespace rule lives in keep() — never skip via the
        # generic unfielded branch (fielded fuzzies DO match ':' terms)
        return self._scan(start, keep, stop, limit, unfielded=False)


def _load_ram_dict(term_dict_dir: str) -> RamDict | None:
    """Read term_dict parquet driver-side (pyarrow, no Spark job); None if
    missing or over the RAM_DICT_MAX_BYTES guard."""
    if not os.path.isdir(term_dict_dir):
        return None
    files = sorted(
        os.path.join(r, n)
        for r, _d, names in os.walk(term_dict_dir) for n in names
        if n.endswith(".parquet"))
    if not files:
        return None
    if sum(os.path.getsize(f) for f in files) > RAM_DICT_MAX_BYTES:
        return None
    import pyarrow.parquet as pq

    terms: list[str] = []
    dfs: list[int] = []
    for f in files:
        t = pq.read_table(f, columns=["term", "df"])
        terms.extend(t.column("term").to_pylist())
        dfs.extend(t.column("df").to_pylist())
    return RamDict(terms, dfs)


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str,
                 commit: int | None = None):
        """Open at the current commit, or — ``commit=generation`` — pinned
        to an older retained commit point (the reference's
        ``IndexReader.open(IndexCommit)``, index/IndexReader.java:350 /
        index/SegmentInfos.java:39): the segment set AND the corpus stats
        (N, avgdl — the BM25 inputs) come from that ``segments_N`` analog,
        so the pinned reader scores the point-in-time corpus. Requires the
        commit to be retained by the deletion policy (commits.py)."""
        self.spark = spark
        self.index_dir = index_dir
        self._commit = None
        if commit is not None:
            from .commits import read_commit

            self._commit = read_commit(index_dir, commit)
        if self._commit is not None and self._commit.get("stats"):
            self.stats = self._commit["stats"]
        else:
            with open(os.path.join(index_dir, "stats.json")) as f:
                self.stats = json.load(f)
        self.N: int = self.stats["N"]
        self.avgdl: float = self.stats["avgdl"]
        # the analyzer the index was built with — query text must run
        # through the SAME chain (reference QueryParser.java:513)
        self.analyzer: str = self.stats.get("analyzer", "standard")
        # extra ANALYZED fields (multi-field model): per-field avgdl for
        # BM25 length normalization (per-field norms)
        self.analyzed_fields: tuple = tuple(self.stats.get("analyzed_fields", []))
        self.avgdl_fields: dict = self.stats.get("avgdl_fields", {})
        self.keyword_fields: tuple = tuple(
            self.stats.get("keyword_fields", ["lang", "url"]))
        # PerFieldAnalyzerWrapper analog: per-field analyzer names for the
        # extra ANALYZED fields (analysis/PerFieldAnalyzerWrapper.java:47);
        # fields absent here use the index default
        self.field_analyzers: dict = self.stats.get("field_analyzers", {})
        # payload-producing chain name when the index stores payloads
        # (lucene_spark/payloads.py; None for plain indexes)
        self.payload_analyzer: str | None = self.stats.get("payload_analyzer")
        # stored term-vector offsets present in tokens/ (build option
        # store_offsets — index/TermVectorOffsetInfo.java): fvh serves
        # offsets from the forward index instead of re-analyzing
        self.store_offsets: bool = bool(self.stats.get("store_offsets",
                                                       False))
        # codec block size the postings were WRITTEN with — every kernel
        # decode must use it (a mismatch scrambles the delta-coded docids).
        # stats.json records it since round 5; older stats fall back to the
        # cross-validated manifest config, then the module default
        if "block_size" in self.stats:
            self.block_size: int = int(self.stats["block_size"])
        else:
            from .build import read_manifest_config
            from .. import BLOCK_SIZE

            self.block_size = int(
                read_manifest_config(index_dir).get("block_size",
                                                    BLOCK_SIZE))
        # point-in-time segment set (NRT reopen contract — see _snapshot);
        # None (no manifests dir: pre-manifest layouts) → read everything
        from .build import committed_segments

        if self._commit is not None:
            # pinned point-in-time set straight from the commit file —
            # manifests may already say "compacted" for these segments,
            # but retention kept their partitions on disk
            self._committed = sorted(
                int(s) for s in self._commit["segments"])
        else:
            committed = committed_segments(index_dir)
            self._committed: list[int] | None = (
                sorted(committed)
                if os.path.isdir(os.path.join(index_dir, "manifests"))
                else None)

    # --- distributed tables (DataFrame handles cached so repeated queries
    # reuse the same logical plan + file listing; the data itself stays on
    # disk — Parquet column pruning / predicate pushdown do the seeking) ----
    def _snapshot(self, df: DataFrame) -> DataFrame:
        """Pin the reader to the segments COMMITTED at open time — the
        reference's point-in-time reader semantics (segments_N snapshot,
        index/IndexWriter.java:386 getReader / IndexReader reopen): a
        segment directory written by a concurrent append is invisible until
        its manifest rename-commits, and segments committed AFTER this
        reader opened stay invisible until a reopen (a new IndexReader).
        seg is the partition column, so the filter is pure partition
        pruning."""
        if self._committed is None:
            return df
        return df.where(F.col("seg").isin(self._committed))

    def postings(self) -> DataFrame:
        if not hasattr(self, "_postings"):
            self._postings = self._snapshot(self.spark.read.parquet(
                os.path.join(self.index_dir, "postings")))
        return self._postings

    def docmap(self) -> DataFrame:
        if not hasattr(self, "_docmap"):
            self._docmap = self._snapshot(self.spark.read.parquet(
                os.path.join(self.index_dir, "docmap")))
        return self._docmap

    def term_dict(self) -> DataFrame:
        if not hasattr(self, "_term_dict"):
            if self._commit is not None:
                # pinned point-in-time dictionary: df/idf must come from the
                # PINNED segment set — the on-disk term_dict is the CURRENT
                # merged dictionary and drifts with later appends/expunges
                # (the reference's IndexReader.open(IndexCommit) pins term
                # stats with the commit, index/SegmentInfos.java:39).
                # postings() is already snapshot-filtered to the commit's
                # segments, and each (seg, term) row carries its df/cf, so
                # this is the same metadata-level aggregation merge_index
                # runs — paid once per pinned open, lazily.
                self._term_dict = (self.postings()
                                   .groupBy("term")
                                   .agg(F.sum("df").alias("df"),
                                        F.sum("cf").alias("cf")))
            else:
                self._term_dict = self.spark.read.parquet(
                    os.path.join(self.index_dir, "term_dict"))
        return self._term_dict

    def tokens(self) -> DataFrame:
        """Forward index (term vectors analog)."""
        return self._snapshot(self.spark.read.parquet(
            os.path.join(self.index_dir, "tokens")))

    # --- NRT reopen (index/IndexReader.java reopen: share unchanged state) ---
    def _dict_fingerprint(self) -> tuple:
        """(path, size, mtime_ns) of every term_dict parquet file — cheap
        driver-side identity of the dictionary generation."""
        d = os.path.join(self.index_dir, "term_dict")
        if not os.path.isdir(d):
            return ()
        out = []
        for r, _dirs, names in os.walk(d):
            for n in sorted(names):
                if n.endswith(".parquet"):
                    p = os.path.join(r, n)
                    st = os.stat(p)
                    out.append((p, st.st_size, st.st_mtime_ns))
        return tuple(out)

    def reopen(self) -> "IndexReader":
        """Incremental reopen (reference index/IndexReader.java reopen:
        returns a reader over the CURRENT commit point, sharing unchanged
        sub-reader state; the old reader keeps its snapshot). Here: a new
        reader re-reads stats.json and the committed-segment set (so
        freshly committed segments become visible), and the RAM term
        dictionary — the expensive driver-side state — is SHARED with this
        reader when the term_dict files are byte-identical (size+mtime
        fingerprint), instead of re-read from disk. self is untouched:
        its snapshot, stats, and dictionary keep serving the old point in
        time."""
        new = IndexReader(self.spark, self.index_dir)
        if (hasattr(self, "_ram") and self._ram is not None
                and getattr(self, "_ram_fp", None) == new._dict_fingerprint()):
            new._ram = self._ram
            new._ram_fp = self._ram_fp
        return new

    # cached-partition sizing for warm(): every query's scan stage launches
    # one task per cached partition, so partitions should track DATA volume,
    # not the (file-count-derived) parquet split count — a 50k-doc index
    # arrives as 26 file partitions of ~0.4 MB whose 26 per-query scan tasks
    # cost more than the scan itself
    WARM_TARGET_BYTES = 32 << 20

    def _dir_bytes(self, sub: str) -> int:
        total = 0
        for root, _, files in os.walk(os.path.join(self.index_dir, sub)):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total

    def warm(self, max_parts: int | None = None) -> "IndexReader":
        """Pin postings + docmap into Spark's in-memory columnar cache and
        materialize them — the serving-node analog of the reference holding
        its index in the OS page cache / RAMDirectory
        (store/RAMDirectory.java; search nodes always serve warm). Cached
        batches keep min/max stats, so the kernel's pushed-down
        ``term IN (...)`` and the snapshot's ``seg`` pruning still skip
        irrelevant data in memory. Each table is coalesced to
        ~WARM_TARGET_BYTES per cached partition first (never above its
        file-partition count): per-query scan-task count then tracks index
        SIZE, so a small index serves from a handful of tasks while a big
        one keeps its parallelism. Only sensible when the index fits this
        session's storage memory — at web scale you shard searchers and
        each shard warms its slice; a reader over a too-big index should
        simply not call warm() (MEMORY_AND_DISK degrades to disk rather
        than OOM). Measured ~2x off single-query latency at 50k docs
        (26-task scans -> 1, plus in-memory batches). Also pre-loads the
        RAM term dictionary so the first query pays no dict-load."""
        from pyspark import StorageLevel

        for attr, sub, src in (("_postings", "postings", self.postings()),
                               ("_docmap", "docmap", self.docmap())):
            parts = src.rdd.getNumPartitions()
            target = max(1, -(-self._dir_bytes(sub) // self.WARM_TARGET_BYTES))
            if max_parts is not None:
                target = min(target, max_parts)
            df = src.coalesce(min(parts, target)) if target < parts else src
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            df.count()
            setattr(self, attr, df)
        self.ram_dict()
        return self

    def close(self) -> None:
        """Release any caches pinned by warm(); the reader stays usable
        (subsequent reads go back to parquet)."""
        for attr in ("_postings", "_docmap"):
            df = getattr(self, attr, None)
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass
                delattr(self, attr)

    # --- driver-side lookups (query planning) --------------------------------
    def ram_dict(self) -> RamDict | None:
        """The in-RAM dictionary snapshot (.tii analog,
        index/TermInfosReader.java:40), loaded lazily once per reader.
        None when term_dict is missing (pre-merge index) or larger than
        RAM_DICT_MAX_BYTES — every caller falls back to the pushed-down
        distributed scan in that case."""
        if not hasattr(self, "_ram"):
            self._ram_fp = self._dict_fingerprint()
            if self._commit is not None:
                # pinned reader: the RAM snapshot must hold the pinned
                # dictionary (see term_dict), collected once if the commit's
                # recorded dictionary size fits the RAM guard (~10 bytes of
                # parquet per term calibrates the same threshold); a pinned
                # reader over a too-big dictionary keeps the distributed
                # probe path, like any other reader
                n_terms = (self.stats or {}).get("n_terms")
                if n_terms is not None and \
                        int(n_terms) * 10 <= RAM_DICT_MAX_BYTES:
                    rows = self.term_dict().select("term", "df").collect()
                    self._ram = RamDict([r["term"] for r in rows],
                                        [int(r["df"]) for r in rows])
                else:
                    self._ram = None
            else:
                self._ram = _load_ram_dict(
                    os.path.join(self.index_dir, "term_dict"))
        return self._ram

    def doc_freqs(self, terms: list[str]) -> dict[str, int]:
        """Global df per query term — the two-phase Weight stats binding
        (reference search/Weight.java:49-103: idf uses GLOBAL stats so every
        shard scores identically). Served from the RAM dictionary (zero
        Spark jobs — this ran as its own job per query and was half the
        per-query latency floor); falls back to one pushed-down dictionary
        probe when the dictionary exceeds the RAM guard."""
        if not terms:
            return {}
        ram = self.ram_dict()
        if ram is not None:
            return ram.doc_freqs(sorted(set(terms)))
        from ..queries.planner import _terms_pred

        rows = (self.term_dict()
                .where(_terms_pred(sorted(set(terms))))
                .select("term", "df").collect())
        return {r["term"]: int(r["df"]) for r in rows}

    def expand_terms(self, kind: str, arg, limit: int = 1024) -> list[str]:
        return [t for t, _df in self.expand_terms_with_df(kind, arg, limit)]

    def expand_terms_with_df(self, kind: str, arg,
                             limit: int = 1024) -> list[tuple[str, int]]:
        """MultiTermQuery enumeration against the dictionary
        (reference search/MultiTermQuery.java:98-146; FilteredTermEnum).
        kind: 'prefix' | 'wildcard' | 'wildcard_regex' | 'range'. Served
        from the RAM dictionary where loaded (binary-search cut + in-RAM
        scan, no Spark job); otherwise pushed down to the parquet
        dictionary scan. Returns (term, df) pairs — the SAME pass that
        enumerates also binds each term's global df, so the planner never
        re-probes the dictionary with a 1024-literal IN list.
        'wildcard' takes the RAW Lucene wildcard pattern (so the RAM path
        can apply the constant-prefix cut and the safe regex subset);
        'wildcard_regex' is a user regex and always scans distributed —
        Java and Python regex dialects only agree on the wildcard subset."""
        ram = self.ram_dict()
        if ram is not None and kind in ("prefix", "wildcard", "range"):
            if kind == "prefix":
                return ram.expand_prefix(arg, limit, ":" not in arg)
            if kind == "wildcard":
                from ..scoring import wildcard_to_regex

                return ram.expand_regex(wildcard_to_regex(arg), limit,
                                        ":" not in arg)
            lo, hi, inc_lo, inc_hi = arg
            unf = not any(b and ":" in b for b in (lo, hi))
            return ram.expand_range(lo, hi, inc_lo, inc_hi, limit, unf)
        td = self.term_dict()
        if kind == "prefix":
            df = td.where(F.col("term").startswith(arg))
            unfielded = ":" not in arg
        elif kind == "wildcard":
            from ..scoring import wildcard_to_regex

            df = td.where(F.col("term").rlike(wildcard_to_regex(arg)))
            unfielded = ":" not in arg
        elif kind == "wildcard_regex":
            df = td.where(F.col("term").rlike(arg))
            unfielded = ":" not in arg
        elif kind == "range":
            lo, hi, inc_lo, inc_hi = arg
            df = td
            if lo is not None:
                df = df.where(F.col("term") >= lo if inc_lo else F.col("term") > lo)
            if hi is not None:
                df = df.where(F.col("term") <= hi if inc_hi else F.col("term") < hi)
            unfielded = not any(b and ":" in b for b in (lo, hi))
        else:
            raise ValueError(kind)
        if unfielded:
            # default-field enumeration must not sweep up other fields'
            # namespaced "field:term" entries (e.g. prefix 'u*' matching
            # every df=1 'url:...' keyword term and dominating the top-k)
            df = df.where(~F.col("term").contains(":"))
        # reference caps BooleanQuery at 1024 clauses (search/BooleanQuery.java:34)
        return [(r["term"], int(r["df"])) for r in
                df.select("term", "df").orderBy("term").limit(limit).collect()]

    def all_terms(self) -> list[str]:
        return [r["term"] for r in self.term_dict().select("term").orderBy("term").collect()]
