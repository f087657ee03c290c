"""Driver-local serving for sub-RAM indexes — the contrib/instantiated
InstantiatedIndex analog (contrib/instantiated/src/java/.../
InstantiatedIndex.java:62: "a RAM-resident rewrite of the index for
maximum retrieval speed on small corpora").

Spark restatement: the distributed search plan's only per-query Spark
work is a pushed-down postings scan + the per-segment kernel UDF + a
TakeOrdered — all of which a sub-RAM index can run on the DRIVER with the
very same kernel code (queries/kernel.py segment_topk), eliminating the
~0.35-0.5 s/query local-mode job-scheduling floor. Results are
hash-identical by construction: same decoded blobs, same Ctx (RAM-dict
dfs, pinned N/avgdl), same float ops, same (score desc, docid asc)
tie-break — pinned by tests/test_instantiated.py against the distributed
path.

Scale note: this is a SERVING optimization for small indexes (the size
guard refuses anything over ``max_bytes``); the distributed path remains
the 100 TB plan. The guard mirrors ram_dict's (reader.py): cross the
boundary and construction raises, so callers fall back explicitly —
never silently load a TB into the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .planner import Searcher


def _read_hive_dir(path: str) -> pd.DataFrame | None:
    """Driver-local read of a seg=N hive-partitioned parquet dir (no
    Spark job)."""
    import os

    import pyarrow.dataset as pads

    if not os.path.isdir(path):
        return None
    if not any(n.startswith("seg=") for n in os.listdir(path)):
        return None
    return pads.dataset(path, partitioning="hive").to_table().to_pandas()


class IndexTooLargeError(ValueError):
    """The index exceeds the driver-serving size guard — use the
    distributed Searcher."""


class InstantiatedSearcher(Searcher):
    """Searcher whose ``search()`` runs driver-side with ZERO Spark jobs
    for the standard scoring path (term/bool/phrase/span/payload trees
    after MultiTerm rewrite). Exotic shapes (MatchAll, residual
    complement, constant-score filter rewrites) delegate to the
    distributed plan — rare, and still correct.

    ``search_local`` returns plain ``[(docid, score)]`` with no Spark
    touch at all; ``search`` wraps the same rows in a (lazy) DataFrame so
    the Searcher API contract holds.
    """

    DEFAULT_MAX_BYTES = 64 << 20  # same order as ram_dict's guard

    def __init__(self, reader, similarity=None,
                 max_bytes: int = DEFAULT_MAX_BYTES):
        import os

        super().__init__(reader, similarity)
        total = sum(reader._dir_bytes(sub)
                    for sub in ("postings", "deleted", "norms"))
        if total > max_bytes:
            raise IndexTooLargeError(
                f"index postings+side-cars are {total} bytes > guard "
                f"{max_bytes}; serve this index with the distributed "
                f"Searcher")
        if reader.ram_dict() is None:
            raise IndexTooLargeError(
                "term dictionary exceeds the RAM-dict guard; driver "
                "serving needs zero-job df lookups")
        # reader._committed is the SNAPSHOT semantics: a list (possibly
        # empty — nothing committed, serve nothing) or None (pre-manifest
        # layout — read everything). `if committed:` would wrongly skip the
        # filter for the empty-list case and score uncommitted partitions
        # the distributed reader hides.
        committed = reader._committed
        base = _read_hive_dir(os.path.join(reader.index_dir, "postings"))
        if base is None:
            base = pd.DataFrame()
        for sub in ("deleted", "norms"):
            side = _read_hive_dir(os.path.join(reader.index_dir, sub))
            if side is not None and len(side):
                base = pd.concat([base, side], ignore_index=True)
        if len(base) and committed is not None:
            base = base[base["seg"].isin([int(s) for s in committed])]
        # ONE persistent SegmentPostings per segment — the RAM-resident
        # rewrite the reference's InstantiatedIndex actually is: its decode
        # memos (_rowdec/_full) fill as queries touch terms and every later
        # query reuses them, where the distributed kernel (one UDF call per
        # query) re-decodes per query. This is what turns the per-query
        # cost into pure scorer math after warmup.
        from .kernel import SegmentPostings

        bs = int(reader.block_size)
        self._sp_by_seg: dict[int, SegmentPostings] = {
            int(s): SegmentPostings(g.reset_index(drop=True), bs)
            for s, g in base.groupby("seg")} if len(base) else {}
        # stored-field fetch for hydrate — docid → (url, lang). Scoped to
        # the committed snapshot like the postings: retained compacted
        # source partitions (commits.py) would otherwise duplicate docids
        # and break the per-docid lookup. Indexed ONCE here, not per call.
        dm = _read_hive_dir(os.path.join(reader.index_dir, "docmap"))
        if dm is not None and committed is not None:
            dm = dm[dm["seg"].isin([int(s) for s in committed])]
        self._docmap = (dm[["docid", "url", "lang"]].set_index("docid")
                        if dm is not None else None)

    # ------------------------------------------------------------------ #
    def search_local(self, query, k: int = 10,
                     lang: str | None = None) -> list[tuple[int, float]]:
        """[(docid, score)] — the zero-Spark path. Raises the internal
        _Delegate for shapes the local kernel doesn't serve; callers
        should use search(), which falls back transparently."""
        from .ast import ConstantScore, MatchAll, REWRITE_CONST_FILTER
        from .kernel import Ctx, eval_query
        from .planner import _MULTITERM, _residual_complement

        q = self.parse(query, lang=lang) if isinstance(query, str) else query
        if (isinstance(q, ConstantScore) and isinstance(q.query, _MULTITERM)) \
                or (isinstance(q, _MULTITERM)
                    and getattr(q, "rewrite_method", None)
                    == REWRITE_CONST_FILTER):
            raise _Delegate()
        q = self.rewrite(q)
        if isinstance(q, MatchAll) or _residual_complement(q) is not None:
            raise _Delegate()
        terms = sorted(set(q.terms()))
        if not terms:
            return []
        dfs = self._doc_freqs(terms)
        if not dfs:
            return []
        ctx = Ctx(self.reader.N, self.reader.avgdl, dfs, k,
                  avgdl_fields=self.reader.avgdl_fields,
                  sim=self.similarity)
        # same math as kernel.segment_topk per segment (eval → tombstone
        # subtract → per-seg bounded sort), then the global merge with the
        # identical (score desc, docid asc) tie-break — against the
        # PERSISTENT SegmentPostings, so decodes amortize across queries
        all_ids: list[np.ndarray] = []
        all_sc: list[np.ndarray] = []
        for seg, sp in self._sp_by_seg.items():
            ids, sc = eval_query(sp, ctx, q, top=True)
            if sp.deleted is not None and ids.size:
                keep = ~np.isin(ids, sp.deleted, assume_unique=False)
                ids, sc = ids[keep], sc[keep]
            if ids.size:
                kk = min(k, ids.size)
                order = np.lexsort((ids, -sc))[:kk]
                all_ids.append(ids[order])
                all_sc.append(sc[order])
        if not all_ids:
            return []
        ids = np.concatenate(all_ids)
        sc = np.concatenate(all_sc)
        order = np.lexsort((ids, -sc))[:k]
        return [(int(d), float(s)) for d, s in zip(ids[order], sc[order])]

    def search(self, query, k: int = 10, hydrate: bool = False,
               lang: str | None = None):
        try:
            rows = self.search_local(query, k, lang=lang)
        except _Delegate:
            return super().search(query, k, hydrate=hydrate, lang=lang)
        spark = self.reader.spark
        if hydrate and self._docmap is not None:
            dm = self._docmap
            data = [(d, s,
                     dm["url"].get(d), dm["lang"].get(d))
                    for d, s in rows]
            return spark.createDataFrame(
                data, "docid long, score double, url string, lang string")
        return spark.createDataFrame(rows or [],
                                     "docid long, score double")


class _Delegate(Exception):
    """Internal: this query shape is served by the distributed plan."""
