"""Stage A — distributed segment build: tokenize → forward index (term
vectors) → per-segment postings, checkpointed and resumable.

Spark restatement of the reference indexing chain (SURVEY.md §3.1):
``IndexWriter.addDocument → DocInverter → TermsHash → FreqProxTermsWriter →
FormatPostings*Writer`` becomes

    read parquet (+ _metadata.row_index for arrival-order docIDs)
    → mapInPandas [extract_text + tokenize + per-doc invert]   (DocInverter)
    → write tokens/seg=k   (forward index ≙ stored fields + term vectors)
    → groupBy(seg, term) applyInPandas [delta+VByte block encode]
                                                    (FormatPostingsDocsWriter)
    → write postings/seg=k + manifest JSON          (segment flush + commit)

Scale properties:
- The only corpus-sized shuffle is groupBy(seg, term). Group size is bounded
  by the segment's doc count regardless of term skew — the segment is the
  salt. Zipf-head terms additionally split into multiple rows within a
  segment (``salt`` column) when df exceeds max_postings_per_row, so no
  single Arrow row exceeds ~a few MB.
- Postings land partitioned by seg; dynamic partition overwrite makes
  re-running a failed segment idempotent (reference two-phase commit
  semantics, index/IndexWriter.java:3439 — the manifest written last is the
  commit point).
- Resume: segments with a valid manifest are skipped entirely
  (north rule: resumable per-partition checkpoints with lineage + metrics).
"""

from __future__ import annotations

import json
import os
import re
import threading as _threading
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from .. import BLOCK_SIZE
from ..analysis import analyze, extract_text
from ..codec import encode_postings, vbyte_encode
from .plan import BuildPlan, make_build_plan, read_build_plan, write_build_plan

TOKENS_SCHEMA = (
    "seg int, docid long, url string, lang string, doclen int, "
    "terms array<string>, tfs array<int>, positions array<array<int>>, "
    "dls array<int>, fdl map<string,int>, boost float"
)

POSTINGS_SCHEMA = (
    "seg int, term string, salt int, df long, cf long, "
    "ids_blob binary, tfs_blob binary, dls_blob binary, positions_blob binary, "
    "block_last_ids array<long>, block_offsets_ids array<int>, "
    "block_offsets_tfs array<int>, block_offsets_dls array<int>, "
    "block_max_tf array<int>, block_min_dl array<int>"
)


def tokens_schema(payloads: bool = False, offsets: bool = False) -> str:
    """TOKENS_SCHEMA, plus the per-position payload channel when the build
    runs a payload-producing chain (payloads array parallel to positions —
    the .prx payload stream of the reference,
    index/FormatPostingsPositionsWriter.java payload writes), plus the
    stored term-vector offsets channel when ``store_offsets`` is on
    (per (doc, term) an interleaved [s0,e0,...] char-offset array parallel
    to positions — index/TermVectorOffsetInfo.java). Plain builds keep the
    historical schema byte-identically."""
    return (TOKENS_SCHEMA
            + (", payloads array<array<float>>" if payloads else "")
            + (", offsets array<array<int>>" if offsets else ""))


def postings_schema(payloads: bool = False) -> str:
    """POSTINGS_SCHEMA plus payloads_blob (float32 per position, NaN = no
    payload; lucene_spark/payloads.py) for payload builds."""
    return POSTINGS_SCHEMA + (", payloads_blob binary" if payloads else "")


def _kw_value(v) -> str | None:
    """Normalize a keyword-field cell to its canonical term text: pandas
    promotes nullable int columns to float per batch, so 2020 must not
    index as '2020.0' in some batches and '2020' in others; NaN/None → no
    term."""
    if v is None:
        return None
    if isinstance(v, float):
        if v != v:  # NaN
            return None
        if v.is_integer():
            return str(int(v))
        return str(v)
    return str(v)


# analyzers whose tokenization is a plain split — invertible batch-at-a-time
# with numpy/pandas (no per-token Python); the JFlex-exact standard chain
# stays on the scalar path
_VECTOR_ANALYZERS = {"whitespace", "simple"}


_WS_TOKEN_RE = re.compile(r"\S+")
# MUST be the exact simple_tokenize pattern (analysis.py _RE_LETTER_RUN):
# an ASCII-only offset tokenizer would silently index different terms
# than the query-time analyzer for non-ASCII letters
_LETTER_TOKEN_RE = re.compile(r"[^\W\d_]+")


def _invert_batch_vectorized(texts, kind: str, with_offsets: bool = False):
    """Whole-batch document inversion for split-style analyzers: one
    factorize + one lexsort replace the per-doc dict-of-positions loop.
    → (doclens, per-doc term lists, per-doc tf lists, per-doc position-array
    lists[, per-doc offset-array lists]); positions ascending per
    (doc, term) by lexsort stability.

    ``with_offsets`` additionally returns, per (doc, term), an interleaved
    int array [s0,e0,s1,e1,...] of character start/end offsets parallel to
    that term's positions — the stored term-vector offsets of the
    reference (index/TermVectorsTermsWriter.java:30 storing
    TermVectorOffsetInfo per position). Offset tokenization is the same
    regex split the display-time tokenizer uses (fvh.py), so index-time
    and recompute-at-display offsets are byte-identical by construction."""
    from ..analysis import simple_tokenize

    n = len(texts)
    flat_se = None
    if with_offsets:
        rx = _WS_TOKEN_RE if kind == "whitespace" else _LETTER_TOKEN_RE
        token_lists = []
        se_lists = []
        for t in texts:
            ms = list(rx.finditer(t)) if t else []
            token_lists.append([m.group() if kind == "whitespace"
                                else m.group().lower() for m in ms])
            se_lists.append([(m.start(), m.end()) for m in ms])
    elif kind == "whitespace":
        token_lists = [t.split() if t else [] for t in texts]
    else:
        token_lists = [simple_tokenize(t) if t else [] for t in texts]
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    empty: list = [[] for _ in range(n)]
    if total == 0:
        out = (lens, empty, [list(e) for e in empty],
               [list(e) for e in empty])
        return out + ([list(e) for e in empty],) if with_offsets else out
    flat = np.empty(total, dtype=object)
    off = 0
    for tl in token_lists:
        flat[off:off + len(tl)] = tl
        off += len(tl)
    if with_offsets:
        flat_se = np.empty((total, 2), dtype=np.int64)
        off = 0
        for sl in se_lists:
            if sl:
                flat_se[off:off + len(sl)] = sl
                off += len(sl)
    codes, uniques = pd.factorize(flat, sort=False)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = np.arange(total, dtype=np.int64) - starts[doc_idx]
    order = np.lexsort((codes, doc_idx))  # stable → positions stay ascending
    d_s, c_s, p_s = doc_idx[order], codes[order], pos[order]
    grp = np.empty(total, dtype=bool)
    grp[0] = True
    grp[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    gstart = np.flatnonzero(grp)
    gcount = np.diff(np.append(gstart, total))
    gdoc = d_s[gstart]
    gterms = np.asarray(uniques, dtype=object)[c_s[gstart]]
    pos_groups = np.split(p_s, gstart[1:])
    if with_offsets:
        se_s = flat_se[order].reshape(-1, 2)
        off_groups = np.split(se_s.reshape(-1), 2 * gstart[1:])
    doc_grp_counts = np.bincount(gdoc, minlength=n)
    terms_out, tfs_out, pos_out, off_out = [], [], [], []
    gi = 0
    for d in range(n):
        cnt = int(doc_grp_counts[d])
        sl = slice(gi, gi + cnt)
        terms_out.append(gterms[sl].tolist())
        tfs_out.append(gcount[sl].tolist())
        pos_out.append(pos_groups[gi:gi + cnt])
        if with_offsets:
            off_out.append(off_groups[gi:gi + cnt])
        gi += cnt
    if with_offsets:
        return lens, terms_out, tfs_out, pos_out, off_out
    return lens, terms_out, tfs_out, pos_out


def _tokenize_iter(base_by_path: dict, analyzer: str, store_positions: bool,
                   keyword_fields: tuple = (), analyzed_fields: tuple = (),
                   field_analyzers: dict | None = None,
                   boost_col: str | None = None,
                   payload_fn=None, store_offsets: bool = False):
    """mapInPandas closure: pages batches → ONE row per doc with parallel
    term/tf/positions arrays (the term-vector forward index, reference
    TermVectorsTermsWriter .tvf — index/TermVectorsTermsWriter.java:30).

    Doc-major rows keep Python-side materialization O(docs), not
    O(doc×term): the per-(doc, term) flattening happens JVM-side via
    explode(arrays_zip(...)) in the postings job.

    `analyzed_fields`: extra ANALYZED source columns (the reference
    multi-field document model, document/Field.java:60 Index.ANALYZED per
    field) — terms namespaced ``field:term``, own position stream, own
    per-doc length (per-field norms, index/NormsWriter.java:61) carried in
    the per-term ``dls`` array and the per-doc ``fdl`` map.
    """
    from ..analysis import positional_pairs_fn as make_pairs_fn
    from .plan import _norm

    empty_pos: list[list[int]] = []

    # analyzer="by_lang": per-document routing through the lang column —
    # the multilingual-crawl shape (each page analyzed by its language's
    # contrib chain, fallback standard). Resolved here, not in the registry,
    # because the chain needs the row's lang value alongside its text.
    routed = analyzer == "by_lang"
    if routed:
        from ..lang import analyze_by_lang
        analyze_pairs = analyze_by_lang
    else:
        analyze_pairs = make_pairs_fn(analyzer)
    # PerFieldAnalyzerWrapper (analysis/PerFieldAnalyzerWrapper.java:47):
    # each extra ANALYZED field may run its own chain
    for af in analyzed_fields:
        if (field_analyzers or {}).get(af, analyzer) == "by_lang":
            raise ValueError(
                "by_lang routes the main text field; give extra analyzed "
                f"field {af!r} an explicit chain via field_analyzers")
    field_pairs = {
        af: make_pairs_fn((field_analyzers or {}).get(af, analyzer))
        for af in analyzed_fields
    }

    fast_ok = (payload_fn is None and analyzer in _VECTOR_ANALYZERS and all(
        (field_analyzers or {}).get(af, analyzer) in _VECTOR_ANALYZERS
        for af in analyzed_fields))

    def fn(batches):
        for pdf in batches:
            c_seg, c_docid, c_url, c_lang, c_dl = [], [], [], [], []
            c_terms, c_tfs, c_pos, c_dls, c_fdl = [], [], [], [], []
            c_pay: list = []
            c_off: list = []
            # index-time document boost (document/Document.java:88 setBoost):
            # carried per doc through the forward index; 1.0 when unset
            boosts = (pdf[boost_col] if boost_col and boost_col in pdf
                      else None)
            fps = pdf["fp"].map(lambda p: base_by_path[_norm(p)])
            texts = pdf["text"] if "text" in pdf else None
            htmls = pdf["html"] if "html" in pdf else None
            urls = pdf["url"]
            langs = pdf["lang"] if "lang" in pdf else None
            afields = {f: pdf[f] for f in analyzed_fields if f in pdf}
            kfields = {f: pdf[f] for f in keyword_fields
                       if f in pdf and f not in ("lang", "url")}
            ris = pdf["ri"]
            # batch-vectorized inversion for split-style analyzers (the hot
            # build path — round 1 spent per-token Python dict work here);
            # html extraction forces the scalar path
            # the vectorized path needs a complete text column; rows whose
            # text is NULL fall back to html extraction (scalar path). A
            # corpus carrying BOTH columns with text fully populated takes
            # the fast path — text is authoritative in the scalar path too
            fast = fast_ok and texts is not None and (
                htmls is None or not texts.isna().any())
            if store_offsets and not fast:
                # build_index validated the analyzer; html-only corpora
                # would need offset-preserving extraction, which the
                # forward index cannot promise — fail loudly, never store
                # wrong offsets
                raise ValueError(
                    "store_offsets requires a text column and a "
                    "split-style analyzer (whitespace/simple)")
            if fast:
                if store_offsets:
                    b_lens, b_terms, b_tfs, b_pos, b_off = \
                        _invert_batch_vectorized(texts.tolist(), analyzer,
                                                 with_offsets=True)
                else:
                    b_lens, b_terms, b_tfs, b_pos = _invert_batch_vectorized(
                        texts.tolist(), analyzer)
                f_inv = {
                    af: _invert_batch_vectorized(
                        col.tolist(),
                        (field_analyzers or {}).get(af, analyzer))
                    for af, col in afields.items()
                }
            for i in range(len(pdf)):
                base, seg = fps.iloc[i]
                fdl: dict[str, int] = {}
                offs: list | None = None
                if fast:
                    dl_i = int(b_lens[i])
                    terms = b_terms[i]
                    tfs = b_tfs[i]
                    pos = (list(b_pos[i]) if store_positions
                           else list(empty_pos))
                    dls = [dl_i] * len(terms)
                    if store_offsets:
                        offs = list(b_off[i])
                    for af in afields:
                        fl, ft, ftf, fp = f_inv[af]
                        fdl[af] = int(fl[i])
                        terms.extend(f"{af}:{t}" for t in ft[i])
                        tfs.extend(ftf[i])
                        dls.extend([int(fl[i])] * len(ft[i]))
                        if store_positions:
                            pos.extend(fp[i])
                        if offs is not None:
                            # offsets are a MAIN-field channel (fvh slices
                            # the main stored text); extra fields carry
                            # empty runs to keep the arrays parallel
                            offs.extend([] for _ in ft[i])
                else:
                    text = texts.iloc[i] if texts is not None else None
                    if text is None and htmls is not None:
                        text = extract_text(htmls.iloc[i])
                    pays: list[list[float]] = []
                    if payload_fn is not None:
                        # payload chain: (term, pos, payload) triples; the
                        # payload stream stays aligned one-to-one with the
                        # positions stream (None → NaN at encode)
                        triples = payload_fn(text or "")
                        agg: dict[str, list[int]] = {}
                        pagg: dict[str, list] = {}
                        for term, p, pay in triples:
                            agg.setdefault(term, []).append(p)
                            pagg.setdefault(term, []).append(pay)
                        dl_i = len(triples)
                        terms = list(agg.keys())
                        tfs = [len(v) for v in agg.values()]
                        pos = (list(agg.values()) if store_positions
                               else list(empty_pos))
                        pays = list(pagg.values())
                    else:
                        if routed:
                            pairs = analyze_pairs(
                                text,
                                langs.iloc[i] if langs is not None else None)
                        else:
                            pairs = analyze_pairs(text)
                        agg = {}
                        for term, p in pairs:
                            agg.setdefault(term, []).append(p)
                        dl_i = len(pairs)
                        terms = list(agg.keys())
                        tfs = [len(v) for v in agg.values()]
                        pos = (list(agg.values()) if store_positions
                               else list(empty_pos))
                    dls = [dl_i] * len(terms)
                    # extra ANALYZED fields: own term namespace, positions,
                    # and field length (per-field postings + norms)
                    for af, col in afields.items():
                        f_pairs = field_pairs[af](col.iloc[i])
                        f_agg: dict[str, list[int]] = {}
                        for term, p in f_pairs:
                            f_agg.setdefault(f"{af}:{term}", []).append(p)
                        fdl[af] = len(f_pairs)
                        terms.extend(f_agg.keys())
                        tfs.extend(len(v) for v in f_agg.values())
                        dls.extend([len(f_pairs)] * len(f_agg))
                        if store_positions:
                            pos.extend(f_agg.values())
                        if payload_fn is not None:
                            # extra ANALYZED fields carry no payloads (the
                            # payload chain is the MAIN field's); keep the
                            # per-term payload stream tf-aligned with NaNs
                            pays.extend([None] * len(v)
                                        for v in f_agg.values())
                c_seg.append(seg)
                c_docid.append(int(base) + int(ris.iloc[i]))
                url = urls.iloc[i]
                lang = langs.iloc[i] if langs is not None else None
                c_url.append(url)
                c_lang.append(lang)
                c_dl.append(dl_i)
                # NOT_ANALYZED keyword fields → namespaced single terms with
                # tf=1, no positions, excluded from doclen (reference
                # Field.Index.NOT_ANALYZED + omitNorms, document/Field.java:83)
                for kf in keyword_fields:
                    if kf in kfields:
                        val = _kw_value(kfields[kf].iloc[i])
                    else:
                        val = {"lang": lang, "url": url}.get(kf)
                    if val is not None:
                        terms.append(f"{kf}:{val}")
                        tfs.append(1)
                        dls.append(dl_i)
                        if store_positions:
                            pos.append([])
                        if payload_fn is not None:
                            pays.append([None])
                        if offs is not None:
                            offs.append([])
                c_terms.append(terms)
                c_tfs.append(tfs)
                c_pos.append(pos)
                c_dls.append(dls)
                c_fdl.append(fdl)
                if payload_fn is not None:
                    c_pay.append(pays)
                if store_offsets:
                    c_off.append(offs)
            if boosts is not None:
                c_boost = [1.0 if (b is None or b != b) else float(b)
                           for b in boosts]
            else:
                c_boost = [1.0] * len(c_seg)
            cols = {
                "seg": c_seg, "docid": c_docid, "url": c_url, "lang": c_lang,
                "doclen": c_dl, "terms": c_terms, "tfs": c_tfs,
                "positions": c_pos, "dls": c_dls, "fdl": c_fdl,
                "boost": c_boost,
            }
            if payload_fn is not None:
                cols["payloads"] = c_pay
            if store_offsets:
                cols["offsets"] = c_off
            yield pd.DataFrame(cols)

    return fn


def _encode_positions_blob(lists: list[np.ndarray], tfs: np.ndarray) -> bytes:
    """Per-doc position lists → delta+VByte blob (first position absolute
    per doc, then in-doc deltas), vectorized across the whole slice."""
    flat = np.concatenate(lists) if lists else np.empty(0, dtype=np.int64)
    if not flat.size:
        return b""
    deltas = np.diff(flat, prepend=np.int64(0))
    starts = np.zeros(len(lists), dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    firsts = np.array([p[0] for p in lists], dtype=np.int64)
    deltas[starts] = firsts
    return bytes(vbyte_encode(deltas.astype(np.uint64)))


def _encode_rows(seg: int, term: str, docids, tfs, dls, pos_lists,
                 max_postings_per_row: int, block_size: int,
                 pay_lists=None) -> list[dict]:
    """One term's sorted postings → one or more encoded rows (salt-split so
    no single Arrow row exceeds ~a few MB for Zipf-head terms)."""
    from ..payloads import encode_payloads_blob

    rows = []
    n = docids.size
    nsplits = (n + max_postings_per_row - 1) // max_postings_per_row
    for salt in range(nsplits):
        lo, hi = salt * max_postings_per_row, min((salt + 1) * max_postings_per_row, n)
        enc = encode_postings(docids[lo:hi], tfs[lo:hi], dls[lo:hi], block_size=block_size)
        pos_blob = (_encode_positions_blob(pos_lists[lo:hi], tfs[lo:hi])
                    if pos_lists is not None else b"")
        pay_blob = (encode_payloads_blob(pay_lists[lo:hi], tfs[lo:hi])
                    if pay_lists is not None else None)
        rows.append({
            **({"payloads_blob": pay_blob} if pay_lists is not None else {}),
            "seg": seg, "term": term, "salt": salt,
            "df": enc["df"], "cf": enc["cf"],
            "ids_blob": enc["ids_blob"], "tfs_blob": enc["tfs_blob"],
            "dls_blob": enc["dls_blob"], "positions_blob": pos_blob,
            "block_last_ids": enc["block_last_ids"],
            "block_offsets_ids": enc["block_offsets_ids"],
            "block_offsets_tfs": enc["block_offsets_tfs"],
            "block_offsets_dls": enc["block_offsets_dls"],
            "block_max_tf": enc["block_max_tf"],
            "block_min_dl": enc["block_min_dl"],
        })
    return rows


def _encode_stream(max_postings_per_row: int, block_size: int,
                   store_positions: bool, store_payloads: bool = False):
    """mapInPandas closure over token rows sorted by (seg, term, docid)
    within the partition (the reference FormatPostingsDocsWriter consuming a
    sorted term stream, index/FormatPostingsDocsWriter.java:71-97).

    A (seg, term) group may span Arrow batch boundaries — incomplete groups
    carry over in numpy buffers until the key changes. Group boundaries are
    found vectorized (np.flatnonzero on key changes); per-term work is a few
    numpy calls. This replaced a per-(seg,term) applyInPandas that spent
    ~2 ms/group of UDF dispatch on the Zipf tail of singleton terms, and it
    needs no collect_list buffering JVM-side.
    """

    def fn(batches):
        cur_key: tuple | None = None
        b_ids: list = []
        b_tfs: list = []
        b_dls: list = []
        b_pos: list = []
        b_pay: list = []
        out: list[dict] = []

        def flush():
            nonlocal cur_key
            if cur_key is None:
                return
            ids = np.concatenate(b_ids)
            tfs = np.concatenate(b_tfs)
            dls = np.concatenate(b_dls)
            pos = ([np.asarray(p, dtype=np.int64) for chunk in b_pos for p in chunk]
                   if store_positions else None)
            pay = ([p for chunk in b_pay for p in chunk]
                   if store_payloads else None)
            out.extend(_encode_rows(cur_key[0], cur_key[1], ids, tfs, dls, pos,
                                    max_postings_per_row, block_size,
                                    pay_lists=pay))
            b_ids.clear(); b_tfs.clear(); b_dls.clear(); b_pos.clear()
            b_pay.clear()

        for pdf in batches:
            if not len(pdf):
                continue
            segs = pdf["seg"].to_numpy()
            terms = pdf["term"].to_numpy(dtype=object)
            ids = pdf["docid"].to_numpy().astype(np.int64, copy=False)
            tfs = pdf["tf"].to_numpy().astype(np.int64, copy=False)
            dls = pdf["doclen"].to_numpy().astype(np.int64, copy=False)
            pos_col = pdf["positions"].to_numpy() if store_positions else None
            pay_col = pdf["payloads"].to_numpy() if store_payloads else None
            change = np.flatnonzero(
                (segs[1:] != segs[:-1]) | (terms[1:] != terms[:-1])) + 1
            bounds = [0, *change.tolist(), len(pdf)]
            for bi in range(len(bounds) - 1):
                lo, hi = bounds[bi], bounds[bi + 1]
                key = (int(segs[lo]), terms[lo])
                if key != cur_key:
                    flush()
                    cur_key = key
                b_ids.append(ids[lo:hi])
                b_tfs.append(tfs[lo:hi])
                b_dls.append(dls[lo:hi])
                if store_positions:
                    b_pos.append(pos_col[lo:hi])
                if store_payloads:
                    b_pay.append(pay_col[lo:hi])
            if len(out) >= 1024:  # only completed groups ever sit in `out`
                yield pd.DataFrame(out)
                out = []
        flush()
        if out:
            yield pd.DataFrame(out)

    return fn


def _postings_buckets(parallelism: int, n_segs: int) -> int:
    """Term-hash buckets per segment for the postings shuffle: 1 when
    segments already saturate the cluster, else enough to use ~2× cores."""
    if n_segs >= parallelism:
        return 1
    return max(1, -(-2 * parallelism // max(n_segs, 1)))  # ceil div


def _manifest_path(out_dir: str, seg: int) -> str:
    return os.path.join(out_dir, "manifests", f"seg_{seg:06d}.json")


def load_manifests(out_dir: str,
                   statuses: tuple | None = None) -> dict[int, dict]:
    """THE manifest-directory scan (seg id → manifest dict), optionally
    filtered by status. Every tool that walks manifests/ (resume gate,
    reader snapshot, splitter, addIndexes) goes through here so a change
    to the manifest protocol — a new status value, a renamed key — lands
    in exactly one place."""
    mdir = os.path.join(out_dir, "manifests")
    raw: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return raw
    for n in sorted(os.listdir(mdir)):
        if n.startswith("seg_") and n.endswith(".json"):
            try:
                with open(os.path.join(mdir, n)) as f:
                    m = json.load(f)
                raw[int(m["seg"])] = m
            except (ValueError, KeyError, json.JSONDecodeError):
                continue
    # Crash-window resolution for compact_segments' two-phase flip: the
    # destination manifest (carrying ``merged_from``) is rename-committed
    # FIRST, then each source flips to "compacted". A crash between the two
    # leaves dest AND some sources simultaneously committed — the dest
    # commit is authoritative (its data dirs hold every source's docs), so
    # any committed member of a committed dest's merged_from is viewed as
    # compacted here. Safe because segment ids are never reused
    # (_next_merge_seg / the build plan both allocate past the manifest
    # max). purge_unreferenced() completes the flip durably.
    superseded: set[int] = set()
    for seg, m in raw.items():
        if m.get("status") == "committed":
            for s in m.get("merged_from") or []:
                if s != seg:
                    superseded.add(int(s))
    out: dict[int, dict] = {}
    for seg, m in raw.items():
        if seg in superseded and m.get("status") == "committed":
            m = {**m, "status": "compacted"}
        if statuses is None or m.get("status") in statuses:
            out[seg] = m
    return out


def _manifest_segments(out_dir: str, statuses: tuple) -> set[int]:
    return set(load_manifests(out_dir, statuses))


def completed_segments(out_dir: str) -> set[int]:
    """Resume gate: "compacted" segments live on inside their destination —
    their input files must never be rebuilt on resume."""
    return _manifest_segments(out_dir, ("committed", "compacted"))


def committed_segments(out_dir: str) -> set[int]:
    """Reader snapshot set: segments whose data dirs are live right now
    (compacted sources are excluded — their dirs are gone)."""
    return _manifest_segments(out_dir, ("committed",))


def index_block_size(out_dir: str) -> int:
    """The codec block size this index's blobs are encoded with (manifest
    config; module default for config-less layouts). Every side-car that
    shares the postings codec — tombstones, norms — and every decode path
    must use it; a mismatch silently scrambles the delta-coded docids."""
    from .. import BLOCK_SIZE

    return int(read_manifest_config(out_dir).get("block_size", BLOCK_SIZE))


def read_manifest_config(out_dir: str) -> dict:
    """The per-build codec/analysis configuration, validated consistent
    across every committed segment manifest (maintenance jobs — expunge,
    compaction — must decode with the SAME block_size/positions the build
    used; silently mixing configurations corrupts postings)."""
    mdir = os.path.join(out_dir, "manifests")
    cfg: dict = {}
    if not os.path.isdir(mdir):
        return cfg
    keys = ("analyzer", "analyzed_fields", "keyword_fields",
            "store_positions", "store_offsets", "block_size",
            "field_analyzers", "payload_analyzer")
    for n in sorted(os.listdir(mdir)):
        if not (n.startswith("seg_") and n.endswith(".json")):
            continue
        with open(os.path.join(mdir, n)) as f:
            m = json.load(f)
        if m.get("status") == "compacted":
            continue
        this = {k: m[k] for k in keys if k in m}
        # normalize keys absent from pre-upgrade manifests to their empty
        # defaults: an old index appended to by newer code must not fail
        # validation over a key the old manifests never wrote (and the
        # check must not depend on which manifest happens to sort first)
        this.setdefault("field_analyzers", {})
        this.setdefault("analyzed_fields", [])
        this.setdefault("payload_analyzer", None)
        this.setdefault("store_offsets", False)
        if not cfg:
            cfg = this
        elif any(cfg.get(k) != v for k, v in this.items()):
            raise ValueError(
                f"inconsistent segment build configs in {out_dir}: "
                f"{cfg} vs {this} ({n})")
    return cfg


def build_index(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    *,
    target_docs_per_seg: int = 50_000,
    analyzer: str = "standard",
    store_positions: bool = True,
    max_postings_per_row: int = 250_000,
    block_size: int = BLOCK_SIZE,
    resume: bool = True,
    segs_per_job: int | None = None,
    keyword_fields: tuple = (),
    analyzed_fields: tuple = (),
    field_analyzers: dict | None = None,
    boost_col: str | None = None,
    payload_analyzer: str | None = None,
    store_offsets: bool = False,
) -> dict:
    """Build (or resume) the index for the pages corpus at input_path — a
    parquet directory or an Iceberg table source string
    (``iceberg:catalog.db.table[@snapshot-id=N|@as-of=TS]``, see
    lucene_spark/sources/pages.py; the Iceberg segment plan comes from one
    ``.files`` metadata scan and is snapshot-pinned for exact resume).

    Returns summary metrics. Layout under out_dir:
      build_plan.json, tokens/seg=k/, postings/seg=k/, docmap/seg=k/,
      manifests/seg_k.json, term_dict/ + stats.json (after merge_index).
    """
    if payload_analyzer is not None:
        # payload-producing chain (lucene_spark/payloads.py registry): the
        # registered base analyzer defines term+position semantics — the
        # query side (parser, oracle) analyzes with THAT name, so the
        # `analyzer` recorded in manifests is the base
        from ..payloads import PAYLOAD_ANALYZERS

        if payload_analyzer not in PAYLOAD_ANALYZERS:
            raise ValueError(f"unregistered payload analyzer: "
                             f"{payload_analyzer!r}")
        analyzer = PAYLOAD_ANALYZERS[payload_analyzer][0]
    if store_offsets:
        # stored term-vector offsets (index/TermVectorsTermsWriter.java:30
        # stores positions AND offsets; TermVectorOffsetInfo.java): only
        # offset-preserving split-style chains can promise index-time
        # offsets identical to display-time ones; other chains keep the
        # re-analysis fallback (fvh.py)
        if payload_analyzer is not None:
            raise ValueError("store_offsets: unsupported with a payload "
                             "analyzer (separate tokenize path)")
        bad = [a for a in {analyzer,
                           *(dict(field_analyzers or {}).values())}
               if a not in _VECTOR_ANALYZERS]
        if bad:
            raise ValueError(
                f"store_offsets requires split-style analyzers "
                f"(whitespace/simple); got {sorted(bad)}")
    os.makedirs(out_dir, exist_ok=True)
    plan_path = os.path.join(out_dir, "build_plan.json")
    if resume and os.path.exists(plan_path):
        plan = read_build_plan(out_dir)
    else:
        if os.path.exists(plan_path):
            # fresh build over a previously-built out_dir: clear every
            # derived table and manifest first — dynamic partition
            # overwrite only touches the NEW plan's segment ids, and stale
            # seg=k dirs from a differently-shaped old plan would otherwise
            # be unioned into every read (duplicated docs, corrupt stats)
            import shutil as _shutil
            # norms (per-doc boosts), spellgrams (suggest aux index), and
            # commits (generations pinning the OLD segment set) are derived
            # state of the old index too: leaving them unions stale boosts
            # into every new-index query / serves stale suggestions /
            # offers pinned generations whose segments are gone
            for sub in ("tokens", "docmap", "postings", "term_dict",
                        "manifests", "deleted", "norms", "spellgrams",
                        "commits"):
                _shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
            for fn in ("stats.json",):
                try:
                    os.remove(os.path.join(out_dir, fn))
                except FileNotFoundError:
                    pass
        from ..sources.pages import parse_source
        spec = parse_source(input_path)
        if spec.kind == "iceberg":
            from .plan import make_build_plan_iceberg
            plan = make_build_plan_iceberg(spark, spec, target_docs_per_seg)
        else:
            plan = make_build_plan(spec.location, target_docs_per_seg)
        write_build_plan(plan, out_dir)

    done = completed_segments(out_dir) if resume else set()
    pending = [s for s in plan.seg_ids() if s not in done]
    t0 = time.time()
    # skipped counts PLAN segments already complete — merge destinations
    # (reserved-namespace ids) also sit in `done` but were never planned
    summary = {"n_docs": plan.n_docs, "n_segments": plan.n_segments,
               "built": 0,
               "skipped": len(done & set(plan.seg_ids())), "wall_s": 0.0}
    if not pending:
        summary["wall_s"] = time.time() - t0
        return summary

    chunk = segs_per_job or len(pending)
    for ci in range(0, len(pending), chunk):
        segs = pending[ci : ci + chunk]
        _build_chunk(spark, plan, segs, out_dir, analyzer, store_positions,
                     max_postings_per_row, block_size, keyword_fields,
                     analyzed_fields, field_analyzers, boost_col,
                     payload_analyzer, store_offsets)
        summary["built"] += len(segs)
    summary["wall_s"] = time.time() - t0
    return summary


def _build_chunk(spark, plan: BuildPlan, segs: list[int], out_dir: str,
                 analyzer: str, store_positions: bool,
                 max_postings_per_row: int, block_size: int,
                 keyword_fields: tuple = (), analyzed_fields: tuple = (),
                 field_analyzers: dict | None = None,
                 boost_col: str | None = None,
                 payload_analyzer: str | None = None,
                 store_offsets: bool = False) -> None:
    import pyarrow.parquet as pq

    payload_fn = None
    if payload_analyzer is not None:
        from ..payloads import PAYLOAD_ANALYZERS

        payload_fn = PAYLOAD_ANALYZERS[payload_analyzer][1]

    t0 = time.time()
    seg_set = set(segs)
    chunk_files = [f for f in plan.files if f.seg in seg_set]
    paths = [f.path for f in chunk_files]
    cols = ["url", "lang",
            F.col("_metadata.file_path").alias("fp"),
            F.col("_metadata.row_index").alias("ri")]
    try:
        src_schema = pq.ParquetFile(paths[0]).schema_arrow.names  # footer only, no job
    except (OSError, FileNotFoundError):
        # non-local data files (s3a://, hdfs:// — the Iceberg plan path):
        # resolve the schema JVM-side; still footer-only, no Spark job
        src_schema = spark.read.parquet(paths[0]).schema.names
    if "text" in src_schema:
        cols.insert(1, F.col("text"))
    if "html" in src_schema:
        cols.insert(1, F.col("html"))
    for af in analyzed_fields:
        if af in src_schema:
            cols.insert(1, F.col(af))
    for kf in keyword_fields:
        if kf in src_schema and kf not in ("lang", "url"):
            cols.insert(1, F.col(kf))
    if boost_col and boost_col in src_schema:
        cols.insert(1, F.col(boost_col))
    pages = spark.read.parquet(*paths).select(*cols)

    # co-locate each segment's pages in one task BEFORE tokenizing, so the
    # partitionBy(seg) writes below emit one file per (task, seg) ≈ one file
    # per segment instead of tasks×segments small files — the file-commit
    # storm otherwise dominates wall clock (and would crush a real
    # object-store namespace at 10^12 docs)
    seg_map = F.create_map(
        *[lit for f in chunk_files for lit in (F.lit(f.path), F.lit(f.seg))])
    # _metadata.file_path is URL-encoded (Hadoop Path.toUri) while the plan
    # keys are raw filesystem paths: strip the scheme, then url_decode with
    # literal '+' pre-escaped (url_decode is form-decoding — '+' would turn
    # into a space, which plan._norm's unquote does NOT do). Without the
    # decode, paths with spaces/specials miss the map, _seg goes NULL, and
    # every row lands in ONE partition — the one-file-per-segment write
    # layout silently degrades (correctness survives: the tokenizer
    # recomputes seg from the same _norm'd path).
    fp_raw = F.expr(
        "url_decode(regexp_replace("
        "regexp_replace(fp, '^file:(//)?', ''), '\\\\+', '%2B'))")
    par = spark.sparkContext.defaultParallelism
    if len(segs) >= par:
        pages = (
            pages
            .withColumn("_seg", F.element_at(seg_map, fp_raw))
            .repartition(len(segs), "_seg")
            .drop("_seg")
        )
    else:
        # small builds (segments < cores): one-partition-per-segment would
        # idle cores. Co-locate by FILE instead — files never span segments
        # (plan.py packs whole files), so each task still writes into few
        # segment dirs and the per-segment file count stays ≤ files/segment.
        pages = pages.repartition(
            max(len(segs), min(len(chunk_files), par * 2)), "fp")

    phases: dict[str, float] = {}

    tokens = pages.mapInPandas(
        _tokenize_iter(plan.base_by_path(), analyzer, store_positions,
                       keyword_fields, analyzed_fields, field_analyzers,
                       boost_col, payload_fn, store_offsets),
        schema=tokens_schema(payload_fn is not None, store_offsets),
    )
    # forward index (≙ stored fields + term vectors): written once, consumed
    # twice (docmap + postings) without re-tokenizing
    tp = time.time()
    tokens.write.mode("overwrite").option("partitionOverwriteMode", "dynamic").partitionBy("seg").parquet(os.path.join(out_dir, "tokens"))
    phases["tokens_ms"] = int((time.time() - tp) * 1000)

    tok = spark.read.parquet(os.path.join(out_dir, "tokens")).where(F.col("seg").isin(segs))

    # docmap: one row per doc already — pure column projection, no shuffle.
    # It reads the just-written tokens files, same as the postings job, so
    # the two run CONCURRENTLY (helper thread): the tiny projection fills
    # scheduler gaps in the big shuffle instead of adding its own job
    # barrier to the chunk's critical path.
    tp = time.time()
    _dm_err: list[BaseException] = []

    def _write_docmap():
        try:
            (tok.select("seg", "docid", "url", "lang", "doclen", "fdl",
                        "boost")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic").partitionBy("seg")
                .parquet(os.path.join(out_dir, "docmap")))
        except BaseException as e:
            _dm_err.append(e)

    _dm_t = _threading.Thread(target=_write_docmap)
    _dm_t.start()
    # postings: ONE corpus shuffle (repartition by seg — bounded groups, the
    # segment is the salt), then a JVM Tungsten sort within each partition
    # by (seg, term, docid) feeding the streaming encoder. Output lands one
    # file per segment with row groups sorted by term, so query-time term
    # predicates prune via parquet min/max stats — the two-level term-index
    # seek of the reference (.tii/.tis, index/TermInfosWriter.java:59) falls
    # out of the storage layout.
    zip_cols = [F.col("terms").alias("term"),
                F.col("tfs").alias("tf"),
                F.col("positions").alias("positions"),
                F.col("dls").alias("dl")]
    proj = ["seg", F.col("z.term").alias("term"), "docid",
            F.col("z.tf").alias("tf"),
            F.col("z.dl").alias("doclen"),  # per-term FIELD length
            F.col("z.positions").alias("positions")]
    if payload_fn is not None:
        zip_cols.append(F.col("payloads").alias("payloads"))
        proj.append(F.col("z.payloads").alias("payloads"))
    (tok.select(
            "seg", "docid",
            F.explode(F.arrays_zip(*zip_cols)).alias("z"))
        .select(*proj)
        # partition by (seg, term-bucket): every (seg, term) group still
        # lands whole in ONE partition (the encoder's only requirement),
        # but small builds get bucket×segments partitions instead of idling
        # cores at one-per-segment; at scale (segments ≥ cores) nbuck=1 and
        # this is exactly the one-shuffle-per-corpus plan
        .repartition(len(segs) * _postings_buckets(par, len(segs)),
                     "seg", F.pmod(F.xxhash64("term"),
                                   F.lit(_postings_buckets(par, len(segs)))))
        .sortWithinPartitions("seg", "term", "docid")
        .mapInPandas(_encode_stream(max_postings_per_row, block_size,
                                    store_positions,
                                    store_payloads=payload_fn is not None),
                     schema=postings_schema(payload_fn is not None))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic").partitionBy("seg")
        .parquet(os.path.join(out_dir, "postings")))
    _dm_t.join()
    if _dm_err:
        raise _dm_err[0]
    # joint wall of the overlapped docmap+postings jobs (docmap_ms kept at 0
    # for schema continuity — its work is inside postings_ms now)
    phases["docmap_ms"] = 0
    phases["postings_ms"] = int((time.time() - tp) * 1000)

    if boost_col:
        # norms side-car: per-doc boost quantized to the reference norm
        # byte (index/NormsWriter.java:61 via util/SmallFloat.floatToByte315)
        # — written per segment like the .del tombstones; unboosted builds
        # skip this entirely (no dir, no kernel work)
        from .norms import write_norms

        tp = time.time()
        write_norms(spark, out_dir,
                    tok.select("seg", "docid", "boost"), mode="overwrite",
                    block_size=block_size)
        phases["norms_ms"] = int((time.time() - tp) * 1000)

    tp = time.time()
    # commit point: per-seg manifest with lineage + metrics (written last).
    # Two tiny stats jobs — postings counters (scan only the scalar
    # seg/salt/df columns; parquet pruning keeps the blobs on disk) and
    # per-seg doclen sums from the forward index (one row per doc). The
    # length sums let merge_index fold the corpus stats (N, avgdl,
    # total_tokens) from manifests on the driver with NO Spark job — at two
    # cores vs eight that job was pure serial floor. Both collects run
    # concurrently so the chunk pays one job-latency, not two.
    stats: dict = {}
    dstats: dict = {}
    _thread_err: list[BaseException] = []

    def _collect_postings_stats():
        try:
            for r in (spark.read.parquet(os.path.join(out_dir, "postings"))
                      .where(F.col("seg").isin(segs))
                      .groupBy("seg")
                      .agg(F.count("*").alias("posting_rows"),
                           F.sum((F.col("salt") == 0).cast("long")).alias("terms"),
                           F.sum("df").alias("postings"))
                      .collect()):
                stats[r["seg"]] = r
        except BaseException as e:  # re-raised on the caller thread
            _thread_err.append(e)

    _pt = _threading.Thread(target=_collect_postings_stats)
    _pt.start()
    for r in (tok.groupBy("seg").agg(
            F.sum("doclen").alias("sum_doclen")).collect()):
        dstats[r["seg"]] = {"sum_doclen": int(r["sum_doclen"] or 0)}
    if analyzed_fields:
        # per-field sums + doc counts: merge_index folds per-field avgdl
        # (the per-field norms stats, reference index/NormsWriter.java:61)
        for r in (tok.select("seg", F.explode("fdl").alias("field", "dl"))
                  .groupBy("seg", "field")
                  .agg(F.sum("dl").alias("s"), F.count("dl").alias("c"))
                  .collect()):
            d = dstats.setdefault(r["seg"], {})
            d.setdefault("sum_fdl", {})[r["field"]] = int(r["s"])
            d.setdefault("docs_fdl", {})[r["field"]] = int(r["c"])
    _pt.join()
    if _thread_err:
        raise _thread_err[0]
    # docs per segment come from the plan (docid ranges are assigned from
    # file row counts, so plan rows ≡ written docmap rows); counting the
    # docmap again was one more serial Spark job per chunk — deep
    # verification is validate_index's job (CheckIndex analog)
    docs = {seg: sum(f.rows for f in plan.seg_files(seg)) for seg in segs}

    def _seg_bytes(seg: int) -> int:
        d = os.path.join(out_dir, "postings", f"seg={seg}")
        if not os.path.isdir(d):
            return 0
        return sum(os.path.getsize(os.path.join(d, n))
                   for n in os.listdir(d) if n.endswith(".parquet"))
    os.makedirs(os.path.join(out_dir, "manifests"), exist_ok=True)
    phases["stats_ms"] = int((time.time() - tp) * 1000)
    wall = time.time() - t0
    for seg in segs:
        s = stats.get(seg)
        m = {
            "seg": seg,
            "status": "committed",
            "input_files": [f.path for f in plan.seg_files(seg)],
            "docid_range": [min(f.docid_base for f in plan.seg_files(seg)),
                            max(f.docid_base + f.rows for f in plan.seg_files(seg)) - 1],
            "docs": int(docs.get(seg, 0)),
            "terms": int(s["terms"]) if s else 0,
            "posting_rows": int(s["posting_rows"]) if s else 0,
            "postings": int(s["postings"]) if s else 0,
            "sum_doclen": int(dstats.get(seg, {}).get("sum_doclen", 0)),
            **({"sum_fdl": dstats.get(seg, {}).get("sum_fdl", {}),
                "docs_fdl": dstats.get(seg, {}).get("docs_fdl", {})}
               if analyzed_fields else {}),
            "postings_bytes": _seg_bytes(seg),
            "wall_ms": int(wall * 1000),
            # chunk-level phase walls (shared by every segment in this
            # chunk): where build time goes — tokenize+forward-index write,
            # docmap projection, the postings shuffle+encode, stats collects
            "phase_ms": dict(phases),
            "attempt": 1,
            "boost_col": boost_col,
            "payload_analyzer": payload_analyzer,
            "analyzer": analyzer,
            "analyzed_fields": list(analyzed_fields),
            "field_analyzers": dict(field_analyzers or {}),
            "keyword_fields": list(keyword_fields),
            "store_positions": store_positions,
            "store_offsets": store_offsets,
            "block_size": block_size,
        }
        mp = _manifest_path(out_dir, seg)
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, mp)  # rename-commit
