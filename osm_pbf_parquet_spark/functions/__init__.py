"""Engine column functions: OSM tag/coordinate helpers.

All built on ``pyspark.sql.functions`` (JVM-side, codegen'd) — no Python
UDFs. These close the scalar-function gap the reference delegates to
external engines (SURVEY §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NANO_PER_DEGREE = 1_000_000_000


def tag(col: Column | str, key: str) -> Column:
    """``tags['key']`` — null-safe map access."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(c, key)


def has_tag(col: Column | str, key: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.map_contains_key(c, key)


def degrees_to_nano(deg: Column) -> Column:
    """Degrees → nanodegrees (the PBF storage unit; osmformat.proto:46-55)."""
    return F.round(deg * F.lit(NANO_PER_DEGREE)).cast("long")


def nano_to_degrees(nano: Column) -> Column:
    return nano.cast("double") / F.lit(NANO_PER_DEGREE)


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (WGS84 mean radius)."""
    r = 6_371_008.8
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * r) * F.asin(F.sqrt(a))


def bbox_contains(lat: Column, lon: Column, south: float, west: float,
                  north: float, east: float) -> Column:
    """Bounding-box predicate (pushes down to Parquet row-group stats when
    output is sorted/clustered spatially)."""
    return (lat >= south) & (lat <= north) & (lon >= west) & (lon <= east)


# --- Z-order spatial clustering ---------------------------------------------------
#
# The reference's output preserves no ordering (README.md:88); our sink
# already offers id-clustering for id zone maps. Z-ORDER clustering is the
# spatial analog: interleaving the bits of quantized lat/lon gives a sort
# key under which every parquet row group covers a small bounding box, so
# a lat/lon range predicate prunes row groups via min/max stats — the
# scan shape a 100 TB planet-scale spatial query needs. Pure integer
# Catalyst arithmetic (codegen'd, no UDF), bit-reproducible in ANSI SQL.

ZORDER_BITS = 16


def _quant_expr(col: str, lo: float, span: float, bits: int) -> str:
    m = (1 << bits) - 1
    q = f"cast(floor(({col} - {lo}d) / {span}d * {m}) AS BIGINT)"
    return f"greatest(0L, least({m}L, {q}))"


def zorder_interleave_expr(u: str, v: str, bits: int = ZORDER_BITS) -> str:
    """Bit-interleave two ``bits``-wide non-negative BIGINT expressions:
    u's bit i lands at position 2i, v's at 2i+1 (Morton code)."""
    return (
        f"aggregate(sequence(0, {bits - 1}), cast(0 AS BIGINT), (acc, i) -> "
        f"acc + shiftleft(shiftright({u}, i) & 1L, 2 * i)"
        f" + shiftleft(shiftright({v}, i) & 1L, 2 * i + 1))"
    )


def with_zorder(df, lat_col: str = "lat", lon_col: str = "lon",
                bits: int = ZORDER_BITS):
    """Add ``zu``/``zv`` (quantized coords) and ``zkey`` (Morton code).
    Sort/repartitionByRange by ``zkey`` before writing to get spatially
    clustered row groups; drop the helper columns afterwards."""
    d = df.withColumn(
        "zu", F.expr(_quant_expr(lat_col, -90.0, 180.0, bits))
    ).withColumn("zv", F.expr(_quant_expr(lon_col, -180.0, 360.0, bits)))
    return d.withColumn(
        "zkey", F.expr(zorder_interleave_expr("zu", "zv", bits))
    )
