"""URL canonicalization + URL-level dedup + host statistics — the first
dedup pass of any web-crawl training-data pipeline (run BEFORE content
dedup: distinct URLs that alias the same resource inflate the corpus and
skew host mixes).

No reference-repo counterpart (the reference indexes documents it is
handed); the operator set follows standard crawl practice (Common-Crawl
style canonicalization: case-fold scheme/host, strip default ports and
fragments, drop tracking parameters, sort the surviving query).

Everything here is JVM-side Spark SQL expressions (`try_parse_url` + higher-
order array functions) — zero Python in the row path, so the ops are pure
narrow projections at any scale; only `host_stats`/`url_dedup` shuffle,
and only on their aggregation keys.

Canonicalization spec (pinned by tests/test_urls.py against an
independent urllib-based reference implementation):

- NULL url, or url with no parseable host → NULL canonical (a crawl row
  without a usable URL is routed to quarantine, not crashed on — the
  hostile-input contract).
- scheme and authority lowercased (documented deviation: userinfo, when
  present inside the authority, is lowercased too — case-significant
  userinfo is vanishingly rare in crawl URLs and folding it is
  dedup-friendly).
- default ports stripped (http://h:80/ ≡ http://h/, https://h:443/ ≡
  https://h/); NON-default ports kept (distinct origins stay distinct).
- fragment dropped.
- tracking query parameters dropped (utm_*, fbclid, gclid, msclkid,
  mc_cid, mc_eid, igshid, ref); surviving parameters SORTED bytewise and
  re-joined; an empty survivor set drops the '?' entirely.
- trailing slashes stripped from the path except the bare root '/'
  (an empty path canonicalizes to '/'); interior slashes untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# dropped query parameters: key match, case-insensitive
TRACKING_PARAM_RE = "(?i)^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref)$"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL column per the module spec — one nested JVM
    expression (try_parse_url + filter/array_sort higher-order functions), no
    UDF. NULL where no host parses."""
    u = F.col(url) if isinstance(url, str) else url
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.try_parse_url(u, F.lit("HOST"))
    auth = F.lower(F.try_parse_url(u, F.lit("AUTHORITY")))
    # default-port strip is scheme-conditional
    auth = F.when(proto == "http", F.regexp_replace(auth, ":80$", "")) \
        .when(proto == "https", F.regexp_replace(auth, ":443$", "")) \
        .otherwise(auth)
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.try_parse_url(u, F.lit("QUERY"))
    kept = F.array_join(
        F.array_sort(F.filter(
            F.split(F.coalesce(q, F.lit("")), "&"),
            lambda x: (x != "") & ~F.regexp_extract(
                x, "^([^=]*)", 1).rlike(TRACKING_PARAM_RE),
        )), "&")
    tail = F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept))
    return F.when(
        host.isNull() | proto.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(proto, F.lit("://"), auth, path, tail))


def canonical_host(url: Column | str) -> Column:
    """Lowercased registrable host of the URL (port excluded) — the
    grouping key for host-level corpus statistics. NULL where no host."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.try_parse_url(u, F.lit("HOST")))


def url_dedup(df: DataFrame, url_col: str = "url",
              order_col: str | None = None) -> DataFrame:
    """One row per canonical URL: the row with the smallest `order_col`
    (default: the raw url string — deterministic) wins. Rows whose URL
    cannot be canonicalized (NULL canonical) are all kept: an unusable URL
    is not evidence of duplication.

    Plan shape: one narrow projection + one hash-aggregation on the
    canonical key (min_by) — map-side combinable, no window, no sort of
    the full corpus. At 10¹² rows this is exactly one shuffle keyed on a
    near-unique column (no Zipf head: a canonical URL repeats only as
    often as it was re-crawled)."""
    oc = order_col or url_col
    canon = df.withColumn("_canon", canonical_url(url_col))
    bad = canon.where(F.col("_canon").isNull()).drop("_canon")
    keep_struct = F.struct(*[F.col(c) for c in df.columns])
    good = (
        canon.where(F.col("_canon").isNotNull())
        .groupBy("_canon")
        .agg(F.min_by(keep_struct, F.col(oc)).alias("_row"))
        .select("_row.*")
    )
    return good.unionByName(bad)


def host_stats(df: DataFrame, url_col: str = "url",
               text_col: str | None = "text") -> DataFrame:
    """Per-host corpus health: page count, distinct canonical URLs, the
    URL-alias rate (1 − distinct/total), and (when `text_col` given) the
    exact-content duplicate rate within the host — the table a crawl
    curator reads to decide per-host caps and re-crawl policy.

    One aggregation shuffle keyed on host; md5 keeps the content-distinct
    count exact without carrying document text through the shuffle
    (distinct over digests, the dedup_exact convention)."""
    base = df.select(
        canonical_host(url_col).alias("host"),
        canonical_url(url_col).alias("canon"),
        *([F.md5(F.coalesce(F.col(text_col), F.lit("\x00null"))).alias("h")]
          if text_col else []),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("canon").alias("n_urls"),
        F.round(1.0 - F.countDistinct("canon") / F.count(F.lit(1)), 4)
        .alias("url_alias_rate"),
    ]
    if text_col:
        aggs += [
            F.countDistinct("h").alias("n_distinct_texts"),
            F.round(1.0 - F.countDistinct("h") / F.count(F.lit(1)), 4)
            .alias("text_dup_rate"),
        ]
    return (base.where(F.col("host").isNotNull())
            .groupBy("host").agg(*aggs))


def canonical_url_py(url: str | None) -> str | None:
    """Single-node reference implementation of `canonical_url` (urllib) —
    the differential-test oracle; kept next to the Spark expression so the
    spec has exactly two independent statements and tests pin them equal."""
    import re
    from urllib.parse import urlsplit

    if url is None:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    if not parts.scheme or not parts.hostname:
        return None
    proto = parts.scheme.lower()
    auth = parts.netloc.lower()
    if proto == "http":
        auth = re.sub(r":80$", "", auth)
    elif proto == "https":
        auth = re.sub(r":443$", "", auth)
    path = re.sub(r"/+$", "", parts.path) or "/"
    kept = sorted(
        x for x in parts.query.split("&")
        if x != "" and not re.match(TRACKING_PARAM_RE.replace("(?i)", ""),
                                    x.split("=", 1)[0], re.IGNORECASE))
    tail = "?" + "&".join(kept) if kept else ""
    return f"{proto}://{auth}{path}{tail}"
