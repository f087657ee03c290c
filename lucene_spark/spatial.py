"""Geo-spatial search — the PySpark restatement of the reference's
contrib/spatial module.

Reference semantics (all paths under /root/reference/contrib/spatial/src/
java/org/apache/lucene/spatial/):

- **Arc distance**: spherical law of cosines over the 90°-colatitude form,
  earth radius 3963.205 miles, degree→radian constant 0.01745329251994
  (NOT math.radians — the reference hard-codes the truncated constant),
  with cosB clamped to [-1, 1] (`geometry/LatLng.java:107-138 arcDistance`).
- **Geohash**: standard base-32 interleaved bisection, 12 chars, bit set
  iff coordinate is STRICTLY greater than the interval midpoint
  (`geohash/GeoHashUtils.java:54-97 encode`, `:99-147 decode`).
- **Grid tiers**: level-L grid of 2^L boxes per 180 projected units,
  sinusoidal projection `(lng_rad*cos(lat_rad), lng_rad)`, box id =
  `floor(coord / (180 / 2^L))`, combined as `latBox + lngBox/10^ceil(
  log10(2^L))` (`tier/projections/CartesianTierPlotter.java:46-103`,
  `SinusoidalProjector.java:35-42`).
- **Distance query** = coarse shape filter over tier boxes, then the exact
  per-doc distance check, then optional distance sort
  (`tier/DistanceQueryBuilder.java`, `tier/LatLongDistanceFilter.java`,
  `tier/DistanceFieldComparatorSource.java`).

Spark-first restatement: the coarse stage is a *pushed-down* lat/lng
bounding-box predicate (Parquet min/max pruning does what tier-term
matching does for Lucene) or, for the pairwise join, a bounded grid-cell
equality join (the CartesianShapeFilter analog); the exact stage is the
arc-distance column expression; the sort is TakeOrderedAndProject. All
stages are JVM-side codegen — no Python in any hot path.

At 100 TB: `distance_search` is scan-pruned (the box predicate reaches
the Parquet reader) + one TakeOrderedAndProject; `distance_join` shuffles
each side once on its grid cell — candidates are bounded per row by the
3×(2m+1) neighbor fan-out (m from the exact same-latitude longitude
bound, full-ring-capped near the poles), never a cross join.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_MILES = 3963.205  # LatLng.java:127 MILERADIUSOFEARTH
EARTH_RADIUS_KM = 6378.160187  # LatLng.java:128 KMRADIUSOFEARTH
_DEG2RAD = 0.01745329251994    # LatLng.java:140-142 radians()
_MILES_PER_DEG_LAT = EARTH_RADIUS_MILES * _DEG2RAD  # arc miles per 1° lat

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"  # GeoHashUtils.java:29-31


# ---------------------------------------------------------------------------
# arc distance (LatLng.arcDistance)
# ---------------------------------------------------------------------------

def arc_distance_miles(lat1, lng1, lat2, lng2) -> Column:
    """Great-circle distance in miles as a single JVM column expression —
    the colatitude law-of-cosines form of LatLng.java:107-138, including
    its out-of-range cosB clamps."""
    lat1, lng1 = F.lit(lat1) * 1.0, F.lit(lng1) * 1.0
    lat2, lng2 = F.lit(lat2) * 1.0, F.lit(lng2) * 1.0
    a = (F.lit(90.0) - lat1) * _DEG2RAD
    c = (F.lit(90.0) - lat2) * _DEG2RAD
    cos_b = (F.cos(a) * F.cos(c)
             + F.sin(a) * F.sin(c) * F.cos((lng2 - lng1) * _DEG2RAD))
    return (F.when(cos_b < -1.0, math.pi * EARTH_RADIUS_MILES)
            .when(cos_b >= 1.0, F.lit(0.0))
            .otherwise(F.acos(cos_b) * EARTH_RADIUS_MILES))


def arc_distance_miles_py(lat1: float, lng1: float,
                          lat2: float, lng2: float) -> float:
    """Single-node twin of `arc_distance_miles` (the pytest reference)."""
    a = (90.0 - lat1) * _DEG2RAD
    c = (90.0 - lat2) * _DEG2RAD
    cos_b = (math.cos(a) * math.cos(c)
             + math.sin(a) * math.sin(c) * math.cos((lng2 - lng1) * _DEG2RAD))
    if cos_b < -1.0:
        return math.pi * EARTH_RADIUS_MILES
    if cos_b >= 1.0:
        return 0.0
    return math.acos(cos_b) * EARTH_RADIUS_MILES


# ---------------------------------------------------------------------------
# geohash (GeoHashUtils.encode/decode)
# ---------------------------------------------------------------------------

def geohash_py(lat: float, lng: float, precision: int = 12) -> str:
    """Pure-Python geohash — a behavioral twin of GeoHashUtils.encode
    (interval bisection, bit set iff coord > mid)."""
    lat_iv, lng_iv = [-90.0, 90.0], [-180.0, 180.0]
    out, even, bit, ch = [], True, 0, 0
    while len(out) < precision:
        iv, coord = (lng_iv, lng) if even else (lat_iv, lat)
        mid = (iv[0] + iv[1]) / 2.0
        if coord > mid:
            ch |= 16 >> bit
            iv[0] = mid
        else:
            iv[1] = mid
        even = not even
        if bit < 4:
            bit += 1
        else:
            out.append(_BASE32[ch])
            bit, ch = 0, 0
    return "".join(out)


def geohash_decode_py(h: str) -> tuple[float, float]:
    """GeoHashUtils.decode: interval-bisect by the hash bits, return the
    cell midpoint (lat, lng)."""
    lat_iv, lng_iv = [-90.0, 90.0], [-180.0, 180.0]
    even = True
    for c in h:
        cd = _BASE32.index(c)
        for mask in (16, 8, 4, 2, 1):
            iv = lng_iv if even else lat_iv
            iv[0 if (cd & mask) else 1] = (iv[0] + iv[1]) / 2.0
            even = not even
    return ((lat_iv[0] + lat_iv[1]) / 2.0, (lng_iv[0] + lng_iv[1]) / 2.0)


def _spread_bits_30(v: Column) -> Column:
    """Spread the low 30 bits of `v` so input bit i lands at output bit 2i
    (the standard Morton-interleave magic constants, JVM-side)."""
    v = v.bitwiseOR(F.shiftleft(v, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x3333333333333333))
    v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return v


def _quantize_strict_gt(coord, lo: float, hi: float, bits: int) -> Column:
    """30-bit cell index equivalent to `bits` rounds of the reference's
    strictly-greater-than bisection: a coordinate EXACTLY on a cell
    boundary belongs to the LOWER cell (GeoHashUtils.java:67-82 uses
    `coord > mid`, so ties go low — plain floor-quantization would send
    them high)."""
    n = float(1 << bits)
    scaled = (F.lit(coord) * 1.0 - lo) / (hi - lo) * n
    q = F.ceil(scaled).cast("long") - 1
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q))


def geohash_col(lat, lng, precision: int = 12) -> Column:
    """Geohash as a pure JVM column expression: quantize both axes to 30
    bits with the reference's tie-goes-low rule, Morton-interleave with
    shift/mask constants, emit base-32 — zero Python per row. Pinned equal
    to `geohash_py` (itself pinned to GeoHashUtils.encode's published test
    vectors) by tests/test_spatial.py."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    lat_q = _quantize_strict_gt(lat, -90.0, 90.0, 30)
    lng_q = _quantize_strict_gt(lng, -180.0, 180.0, 30)
    inter = (F.shiftleft(_spread_bits_30(lng_q), 1)
             .bitwiseOR(_spread_bits_30(lat_q)))
    b32 = F.lit(_BASE32)
    chars = [
        F.substring(b32,
                    (F.shiftright(inter, 55 - 5 * j).bitwiseAND(F.lit(31))
                     + 1).cast("int"),
                    1)
        for j in range(precision)
    ]
    return F.concat(*chars)


# ---------------------------------------------------------------------------
# grid tiers (CartesianTierPlotter over SinusoidalProjector)
# ---------------------------------------------------------------------------

def tier_box_id_py(lat: float, lng: float, level: int) -> float:
    """CartesianTierPlotter.getTierBoxId twin: sinusoidal-project, box per
    axis = floor(coord / (180/2^level)), combined lat + lng/10^d."""
    rlat, rlng = math.radians(lat), math.radians(lng)
    x, y = rlng * math.cos(rlat), rlng  # SinusoidalProjector.java:35-42
    tier_len = 1 << level
    divider = 10 ** math.ceil(math.log10(tier_len)) if tier_len > 1 else 10
    box = 180.0 / tier_len
    return math.floor(x / box) + math.floor(y / box) / divider


def tier_box_id(lat, lng, level: int) -> Column:
    """JVM-side twin of `tier_box_id_py` (parity surface for the tier
    field the reference indexes per document)."""
    tier_len = 1 << level
    divider = 10 ** math.ceil(math.log10(tier_len)) if tier_len > 1 else 10
    box = 180.0 / tier_len
    rlat = F.radians(F.lit(lat) * 1.0)
    rlng = F.radians(F.lit(lng) * 1.0)
    x, y = rlng * F.cos(rlat), rlng
    return F.floor(x / box) + F.floor(y / box) / F.lit(float(divider))


# ---------------------------------------------------------------------------
# bounding box (DistanceUtils.getBoundary / LLRect.createBox)
# ---------------------------------------------------------------------------

def bounding_box(lat0: float, lng0: float, radius_miles: float
                 ) -> tuple[float, float, float, float]:
    """(lat_min, lat_max, lng_min, lng_max) of the box that contains every
    point within `radius_miles` of the center — the coarse prefilter of
    DistanceQueryBuilder (DistanceUtils.java:50-59 getBoundary). Longitude
    width uses the exact same-latitude bound (see `_max_dlng_deg_py`), so
    the box is sound, not the flat-earth approximation."""
    dlat = radius_miles / _MILES_PER_DEG_LAT
    lat_min, lat_max = max(-90.0, lat0 - dlat), min(90.0, lat0 + dlat)
    phi = min(89.9, max(abs(lat_min), abs(lat_max)))
    dlng = _max_dlng_deg_py(radius_miles, phi)
    if dlng >= 180.0:
        return lat_min, lat_max, -180.0, 180.0
    return lat_min, lat_max, lng0 - dlng, lng0 + dlng


def _max_dlng_deg_py(radius_miles: float, abs_lat_deg: float) -> float:
    """Largest longitude separation (degrees) two points within
    `radius_miles` of each other can have when both sit at |lat| ≤
    `abs_lat_deg` — the exact spherical bound `acos((cos d/R − sin²φ) /
    cos²φ)` (law of cosines solved for Δλ at equal latitude φ, where the
    separation is maximal)."""
    dr = radius_miles / EARTH_RADIUS_MILES
    sphi = math.sin(abs_lat_deg * _DEG2RAD)
    cphi = math.cos(abs_lat_deg * _DEG2RAD)
    if cphi <= 1e-12:
        return 360.0
    x = (math.cos(dr) - sphi * sphi) / (cphi * cphi)
    if x <= -1.0:
        return 360.0
    if x >= 1.0:
        return 0.0
    return math.acos(x) / _DEG2RAD


# ---------------------------------------------------------------------------
# distance search (DistanceQueryBuilder + DistanceFieldComparatorSource)
# ---------------------------------------------------------------------------

def distance_search(df: DataFrame, lat0: float, lng0: float,
                    radius_miles: float, k: int | None = None,
                    lat_col: str = "lat", lng_col: str = "lng") -> DataFrame:
    """Docs within `radius_miles` of (lat0, lng0), nearest first — the
    DistanceQueryBuilder pipeline: coarse box predicate (pushes down to
    the Parquet scan, the tier-filter analog), exact arc distance, sort.
    Adds a `distance_miles` column; `k=None` keeps all matches."""
    verified = _boxed_with_distance(df, lat0, lng0, radius_miles,
                                    lat_col, lng_col)
    out = verified.orderBy(F.asc("distance_miles"), *[
        F.asc(c) for c in ("doc_id",) if c in df.columns])
    return out.limit(k) if k is not None else out


def _boxed_with_distance(df: DataFrame, lat0: float, lng0: float,
                         radius_miles: float, lat_col: str,
                         lng_col: str) -> DataFrame:
    """Rows within `radius_miles`, exact-verified, with a
    ``distance_miles`` column — unsorted. The coarse box predicate pushes
    down to the Parquet scan (the tier-filter analog); the arc distance is
    the fine verify."""
    lat_min, lat_max, lng_min, lng_max = bounding_box(lat0, lng0,
                                                      radius_miles)
    lat, lng = F.col(lat_col), F.col(lng_col)
    boxed = df.where(lat.between(lat_min, lat_max))
    if lng_min > -180.0 or lng_max < 180.0:
        if lng_min < -180.0:  # wrap west
            boxed = boxed.where((lng >= lng_min + 360.0)
                                | (lng <= lng_max))
        elif lng_max > 180.0:  # wrap east
            boxed = boxed.where((lng >= lng_min)
                                | (lng <= lng_max - 360.0))
        else:
            boxed = boxed.where(lng.between(lng_min, lng_max))
    return (boxed
            .withColumn("distance_miles",
                        arc_distance_miles(lat, lng, F.lit(lat0),
                                           F.lit(lng0)))
            .where(F.col("distance_miles") <= radius_miles))


# any radius past this covers the whole sphere (half the circumference)
_GLOBE_RADIUS_MILES = math.pi * EARTH_RADIUS_MILES


def knn_search(df: DataFrame, lat0: float, lng0: float, k: int,
               lat_col: str = "lat", lng_col: str = "lng",
               seed_radius_miles: float = 50.0) -> DataFrame:
    """k nearest docs to the point, no radius bound in the API — but never
    an unpruned corpus scan: an expanding bounding-box probe (the
    reference's tier-filter-then-sort pipeline,
    contrib/spatial/.../tier/DistanceQueryBuilder.java +
    DistanceFieldComparatorSource.java) finds a radius that provably
    contains ≥ k exact-verified hits, then one TakeOrderedAndProject runs
    INSIDE that box. Correctness: if ≥ k docs lie within radius r, the
    k nearest overall all lie within r, so top-k inside the box IS the
    global top-k.

    Cost: each probe is a COUNT over the boxed scan (lat/lng range
    predicates pushed to Parquet, so row groups outside the box are never
    read). The radius grows by doubling, accelerated by the observed hit
    density (r × sqrt(k/n) when the probe found n>0 docs) — O(log) probes
    worst case, 1-2 typically; a radius past half the circumference falls
    back to the exhaustive scan, which is then genuinely necessary."""
    r = max(float(seed_radius_miles), 1e-3)
    while r < _GLOBE_RADIUS_MILES:
        n = _boxed_with_distance(df, lat0, lng0, r, lat_col,
                                 lng_col).count()
        if n >= k:
            return distance_search(df, lat0, lng0, r, k=k,
                                   lat_col=lat_col, lng_col=lng_col)
        grow = 2.0 if n == 0 else max(2.0, 1.5 * math.sqrt(k / n))
        r = min(r * grow, _GLOBE_RADIUS_MILES)
    # sparse corpus (fewer than k docs on the whole sphere, or nearly):
    # the full scan is unavoidable and correct
    tie = [F.asc("doc_id")] if "doc_id" in df.columns else []
    return (df.withColumn("distance_miles",
                          arc_distance_miles(F.col(lat_col), F.col(lng_col),
                                             F.lit(lat0), F.lit(lng0)))
            .orderBy(F.asc("distance_miles"), *tie)
            .limit(k))


# ---------------------------------------------------------------------------
# distance join (CartesianShapeFilter as a bounded grid-cell equality join)
# ---------------------------------------------------------------------------

def distance_join(left: DataFrame, right: DataFrame, radius_miles: float,
                  lat_col: str = "lat", lng_col: str = "lng",
                  id_col: str = "doc_id") -> DataFrame:
    """All (left, right) pairs within `radius_miles` — the pairwise form
    of the reference's tier filtering (CartesianShapeFilter.java matches a
    precomputed box-id set; here each side shuffles ONCE on its grid cell
    and candidates meet in an equality join).

    Grid: square cells of `radius_miles`-in-latitude degrees. The right
    side keeps its single home cell; each left row fans out to lat cells
    {c-1, c, c+1} × the lng cells within the EXACT same-latitude longitude
    bound for its band (`_max_dlng_deg_py`, +1 guard cell, full-ring
    capped near the poles, modular wrap at ±180°). Survivors are verified
    with the exact arc distance, so the fan-out only bounds work, never
    changes results. Returns (left_id, right_id, distance_miles) with
    left_id aliased `a`, right_id aliased `b`.

    Scale: one shuffle per side on (lat_cell, lng_cell); per-left-row
    fan-out is 3×(2m+1) cells where m is latitude-dependent (≈2-4 at mid
    latitudes for city-scale radii) — candidate volume is linear in rows ×
    local density, never O(n²)."""
    cell = radius_miles / _MILES_PER_DEG_LAT  # degrees per cell
    n_lng = max(1, math.ceil(360.0 / cell))
    half_ring = n_lng // 2 + 1

    def cells(df: DataFrame, fan_out: bool) -> DataFrame:
        lat, lng = F.col(lat_col) * 1.0, F.col(lng_col) * 1.0
        lat_c = F.floor((lat + 90.0) / cell)
        lng_c = F.floor((lng + 180.0) / cell) % n_lng
        base = df.select(F.col(id_col), lat.alias("_lat"), lng.alias("_lng"),
                         lat_c.alias("_latc"), lng_c.alias("_lngc"))
        if not fan_out:
            return base.withColumnRenamed("_latc", "_jlat") \
                       .withColumnRenamed("_lngc", "_jlng")
        # exact same-latitude Δλ bound at the worst |lat| reachable by a
        # partner (own |lat| + one radius + one guard cell)
        phi = F.least(F.lit(89.9999),
                      F.abs(F.col("_lat")) + F.lit(2.0 * cell))
        sphi, cphi = F.sin(phi * _DEG2RAD), F.cos(phi * _DEG2RAD)
        x = (F.lit(math.cos(radius_miles / EARTH_RADIUS_MILES))
             - sphi * sphi) / (cphi * cphi)
        dlng_deg = (F.when(x <= -1.0, F.lit(360.0))
                    .when(x >= 1.0, F.lit(0.0))
                    .otherwise(F.acos(F.greatest(F.lit(-1.0),
                                                 F.least(F.lit(1.0), x)))
                               / _DEG2RAD))
        m = F.least(F.lit(half_ring),
                    F.ceil(dlng_deg / cell).cast("int") + 1)
        return (base
                .withColumn("_dlat", F.explode(F.sequence(F.lit(-1),
                                                          F.lit(1))))
                .withColumn("_dlng", F.explode(F.sequence(-m, m)))
                .select(F.col(id_col), "_lat", "_lng",
                        (F.col("_latc") + F.col("_dlat")).alias("_jlat"),
                        (((F.col("_lngc") + F.col("_dlng")) % n_lng + n_lng)
                         % n_lng).alias("_jlng")))

    lf = cells(left, fan_out=True).alias("l")
    rf = cells(right, fan_out=False).alias("r")
    dist = arc_distance_miles(F.col("l._lat"), F.col("l._lng"),
                              F.col("r._lat"), F.col("r._lng"))
    return (lf.join(rf, on=[F.col("l._jlat") == F.col("r._jlat"),
                            F.col("l._jlng") == F.col("r._jlng")])
            .select(F.col(f"l.{id_col}").alias("a"),
                    F.col(f"r.{id_col}").alias("b"),
                    dist.alias("distance_miles"))
            .where(F.col("distance_miles") <= radius_miles)
            .dropDuplicates(["a", "b"]))
