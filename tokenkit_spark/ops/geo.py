"""Geo aggregations and queries (ES geo surface) over point columns.

The sandbox tables carry no geo columns, so callers derive deterministic
coordinates from stable ids (both engines — Spark and the DuckDB oracle —
apply the same arithmetic; see __spark_entry__.GEO_* ). The operators
themselves take plain lat/lon double columns:

* ``geotile_grid``  — ES geotile_grid agg: slippy-map tile keys
                      "z/x/y" at a zoom level (Web-Mercator tiling,
                      the ES contract: lat clamped to +-85.0511).
* ``geo_distance``  — ES geo_distance filter + sort: haversine
                      distance (R = 6371 km) to an origin, filter by
                      radius.
* ``geo_bounds``    — ES geo_bounds agg: min/max bounding box per group.

Everything is pure Catalyst arithmetic (single map-side pass + one
aggregate shuffle); no UDFs, so the plans stay in whole-stage codegen at
any corpus size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
MAX_MERCATOR_LAT = 85.05112878


def geotile_key(lat: Column, lon: Column, zoom: int) -> Column:
    """Web-Mercator tile key "z/x/y" for a point at ``zoom`` — the ES
    geotile_grid bucket key. x = floor((lon+180)/360 * 2^z);
    y = floor((1 - asinh(tan(lat))/pi) / 2 * 2^z); lat clamped to the
    Mercator domain like ES."""
    n = float(2**zoom)
    clat = F.greatest(
        F.lit(-MAX_MERCATOR_LAT), F.least(F.lit(MAX_MERCATOR_LAT), lat)
    )
    rad = F.radians(clat)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    y = F.floor(
        (F.lit(1.0) - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad)) / F.lit(math.pi))
        / F.lit(2.0)
        * F.lit(n)
    )
    # edge clamp (lon=180 / lat at the domain edge lands exactly on 2^z)
    x = F.least(F.greatest(x, F.lit(0)), F.lit(int(n) - 1))
    y = F.least(F.greatest(y, F.lit(0)), F.lit(int(n) - 1))
    return F.concat_ws("/", F.lit(str(zoom)), x.cast("string"), y.cast("string"))


def geotile_grid(
    points: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    zoom: int = 6,
    size: int = 100,
) -> DataFrame:
    """ES geotile_grid agg: doc counts per tile, largest first (tiebreak
    key asc), top ``size`` buckets."""
    return (
        points.select(
            geotile_key(F.col(lat_col), F.col(lon_col), zoom).alias("tile")
        )
        .groupBy("tile")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("tile").asc())
        .limit(size)
    )


def haversine_km(
    lat: Column, lon: Column, origin_lat: float, origin_lon: float
) -> Column:
    """Great-circle distance in km to a fixed origin (haversine,
    R = 6371 km — the ES/Lucene arc approximation)."""
    la1, lo1 = F.radians(lat), F.radians(lon)
    la2, lo2 = math.radians(origin_lat), math.radians(origin_lon)
    dlat = la1 - F.lit(la2)
    dlon = lo1 - F.lit(lo2)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(la1) * F.lit(math.cos(la2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_distance(
    points: DataFrame,
    origin_lat: float,
    origin_lon: float,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES geo_distance filter: rows within ``radius_km`` of the origin,
    with the distance attached (km). The filter is a plain Catalyst
    predicate — at scale it pushes below joins and into partition
    pruning when the table is geo-partitioned."""
    d = haversine_km(F.col(lat_col), F.col(lon_col), origin_lat, origin_lon)
    return points.withColumn("distance_km", d).filter(
        F.col("distance_km") <= radius_km
    )


def geo_bounds(
    points: DataFrame,
    group_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES geo_bounds agg per group: (top, left, bottom, right) of the
    non-wrapped bounding box."""
    return points.groupBy(group_col).agg(
        F.max(lat_col).alias("top"),
        F.min(lon_col).alias("left"),
        F.min(lat_col).alias("bottom"),
        F.max(lon_col).alias("right"),
    )


def geo_centroid(
    points: DataFrame,
    group_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    round_digits: int = 4,
) -> DataFrame:
    """ES geo_centroid agg per group: arithmetic mean of lat/lon (the
    ES contract for non-wrapping data) plus the point count. One hash
    aggregate with map-side partials — scale-free."""
    return points.groupBy(group_col).agg(
        F.round(F.avg(lat_col), round_digits).alias("centroid_lat"),
        F.round(F.avg(lon_col), round_digits).alias("centroid_lon"),
        F.count(F.lit(1)).alias("count"),
    )


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_key(lat: Column, lon: Column, precision: int = 5) -> Column:
    """Geohash cell key (Niemeyer encoding, the ES geohash_grid bucket
    key) at ``precision`` chars, pure Catalyst.

    Rather than the textbook per-bit bisection loop, both halves are
    computed CLOSED-FORM: the lon/lat cell indices are single floor
    multiplications (lon gets ceil(5p/2) bits, lat the rest), the
    interleave is an unrolled sum of (bit >> j & 1) << k terms, and the
    base32 chars are substring lookups — one flat codegen-friendly
    expression, no UDF, identical arithmetic restated in the SQL oracle
    (__spark_entry__._geohash_sql)."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    lon_idx = F.least(
        F.lit((1 << lon_bits) - 1),
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))),
    ).cast("long")
    lat_idx = F.least(
        F.lit((1 << lat_bits) - 1),
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))),
    ).cast("long")
    combined = F.lit(0).cast("long")
    li = lj = 0
    for i in range(total):
        if i % 2 == 0:  # even interleave slots take longitude (MSB first)
            bit = F.shiftright(lon_idx, lon_bits - 1 - li).bitwiseAND(F.lit(1))
            li += 1
        else:
            bit = F.shiftright(lat_idx, lat_bits - 1 - lj).bitwiseAND(F.lit(1))
            lj += 1
        combined = combined + F.shiftleft(bit, total - 1 - i)
    chars = [
        F.substring(
            F.lit(GEOHASH_BASE32),
            (F.shiftright(combined, 5 * (precision - 1 - c)).bitwiseAND(F.lit(31)) + 1).cast("int"),
            1,
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_grid(
    points: DataFrame,
    precision: int = 5,
    lat_col: str = "lat",
    lon_col: str = "lon",
    min_doc_count: int = 1,
) -> DataFrame:
    """ES geohash_grid agg: bucket doc counts per geohash cell —
    (geohash, doc_count). One map-side key projection + one aggregate
    shuffle."""
    return (
        points.select(
            geohash_key(F.col(lat_col), F.col(lon_col), precision).alias("geohash")
        )
        .groupBy("geohash")
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") >= min_doc_count)
    )


def geo_line(
    df: DataFrame,
    group_col: str,
    lat_col: str,
    lon_col: str,
    sort_col: str,
    size: int = 10,
    scale: int = 100,
) -> DataFrame:
    """ES ``geo_line`` agg: per group, the track of points ordered by
    the sort field, truncated to the first ``size`` points in sort
    order (the ES contract: when a bucket holds more than ``size``
    points the line keeps the points with the SMALLEST sort values and
    reports ``complete: false``). The line is serialized as
    ``"lonE:latE"`` integer pairs joined by ``;`` — coordinates are
    fixed-point scaled by ``scale`` so the string is bit-identical
    across engines (no printf/round float-formatting divergence).

    Shape: one hash-aggregate shuffle on the group key; the per-group
    state is ``collect_list`` capped by ``size`` AFTER an array_sort —
    per-bucket memory is O(points-in-bucket) at the aggregate, which is
    the same bound ES's aggregator carries (its docs cap size at 10k).
    Returns (group, n_points, complete, line) ordered by group."""
    pt = F.struct(
        F.col(sort_col).alias("s"),
        F.round(F.col(lon_col) * scale).cast("long").alias("x"),
        F.round(F.col(lat_col) * scale).cast("long").alias("y"),
    )
    agg = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.array_sort(F.collect_list(pt)).alias("__pts"),
    )
    line = F.array_join(
        F.transform(
            F.slice(F.col("__pts"), 1, size),
            lambda p: F.concat_ws(":", p["x"].cast("string"), p["y"].cast("string")),
        ),
        ";",
    )
    return agg.select(
        "group",
        "n_points",
        (F.col("n_points") <= F.lit(size)).alias("complete"),
        line.alias("line"),
    ).orderBy("group")


def geo_polygon(
    points: DataFrame,
    polygon: list,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES ``geo_polygon`` query: keep points inside a polygon given as
    [(lat, lon), ...] vertices (implicitly closed), by even-odd ray
    casting — a horizontal ray east of the point crosses edge
    (y1,x1)-(y2,x2) iff the edge straddles the point's latitude
    (half-open: y1 > py XOR y2 > py, which makes vertex hits count
    once) and the crossing longitude lies east of the point.  Odd
    crossing count = inside (Shimrat, "Algorithm 112: Position of
    point relative to polygon", CACM 1962 — the textbook PNPOLY rule).

    The polygon is a query constant, so the crossing count folds over
    a LITERAL edge array with ``F.aggregate`` — per-row arithmetic in
    whole-stage codegen, no join, no UDF; 10^12 points stay a map-only
    scan with full filter pushdown below it.
    """
    edges = F.array(
        *[
            F.struct(
                F.lit(float(polygon[i][0])).alias("y1"),
                F.lit(float(polygon[i][1])).alias("x1"),
                F.lit(float(polygon[(i + 1) % len(polygon)][0])).alias("y2"),
                F.lit(float(polygon[(i + 1) % len(polygon)][1])).alias("x2"),
            )
            for i in range(len(polygon))
        ]
    )
    py, px = F.col(lat_col), F.col(lon_col)
    crossings = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e["y1"] > py) != (e["y2"] > py))
            & (
                px
                < (e["x2"] - e["x1"]) * (py - e["y1"]) / (e["y2"] - e["y1"])
                + e["x1"]
            ),
            1,
        ).otherwise(0),
    )
    return points.withColumn("inside", crossings % 2 == 1)
