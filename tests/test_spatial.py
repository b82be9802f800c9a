"""Z-order spatial clustering: Morton-code correctness + the row-group
pruning property it exists for (each row group of a z-sorted write covers
a small bounding box, so lat/lon range scans prune on min/max stats)."""

from __future__ import annotations

import pytest

import glob
import os

from pyspark.sql import functions as F

from osm_pbf_parquet_spark import functions as fn


def test_zorder_interleave_known_values(spark):
    # u=0b11, v=0b01 -> bit layout (v1 u1 v0 u0) = 0 1 1 1 = 7
    df = spark.range(1).select(
        F.lit(3).cast("long").alias("u"), F.lit(1).cast("long").alias("v")
    )
    out = df.select(
        F.expr(fn.zorder_interleave_expr("u", "v", bits=2)).alias("z")
    ).collect()
    assert out[0]["z"] == 7
    # axis order matters: swapping u/v gives 0b1011 = 11
    out2 = df.select(
        F.expr(fn.zorder_interleave_expr("v", "u", bits=2)).alias("z")
    ).collect()
    assert out2[0]["z"] == 11


def test_zorder_quantization_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(1, 95.0, 185.0), (2, -95.0, -185.0)], ["id", "lat", "lon"]
    )
    rows = {r["id"]: r for r in fn.with_zorder(df).collect()}
    m = (1 << fn.ZORDER_BITS) - 1
    assert rows[1]["zu"] == m and rows[1]["zv"] == m
    assert rows[2]["zu"] == 0 and rows[2]["zv"] == 0


def _row_group_lat_extents(path: str) -> list[float]:
    import pyarrow.parquet as pq

    extents = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        lat_idx = schema_names.index("lat")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(lat_idx).statistics
            extents.append(st.max - st.min)
    return extents


def test_zorder_write_clusters_row_groups(spark, tmp_path):
    """The point of z-ordering: after repartitionByRange+sort on zkey,
    each row group's lat extent is a small slice of the globe; a random
    layout leaves every row group covering ~the full range."""
    pts = spark.range(20_000).select(
        F.col("id"),
        ((F.pmod(F.col("id") * 7919, F.lit(18000)) / 100.0) - 90.0).alias("lat"),
        ((F.pmod(F.col("id") * 104729, F.lit(36000)) / 100.0) - 180.0).alias("lon"),
    )
    z = fn.with_zorder(pts)
    zdir, rdir = str(tmp_path / "z"), str(tmp_path / "r")
    # 64 range partitions ~ 6 Morton prefix bits: each row group sits in
    # a handful of cells of the 8x8 lat/lon grid (quantile boundaries
    # straddle cells, so extents are a few cells, not one)
    (
        z.repartitionByRange(64, "zkey")
        .sortWithinPartitions("zkey")
        .write.parquet(zdir)
    )
    z.repartition(64).write.parquet(rdir)
    z_ext = _row_group_lat_extents(zdir)
    r_ext = _row_group_lat_extents(rdir)
    avg = lambda xs: sum(xs) / len(xs)
    # z-sorted row groups cover far less latitude than random ones
    assert avg(z_ext) < 0.5 * avg(r_ext), (avg(z_ext), avg(r_ext))
    assert avg(r_ext) > 150  # sanity: random layout spans ~the globe


def test_zorder_ranges_disjoint_sorted_merged(spark):
    rngs = fn.zorder_ranges(10.0, 20.0, 30.0, 50.0)
    assert rngs and rngs == sorted(rngs)
    assert all(lo <= hi for lo, hi in rngs)
    # strictly disjoint AND non-adjacent (adjacent ranges must merge)
    assert all(l2 > h1 + 1 for (_, h1), (l2, _) in zip(rngs, rngs[1:]))


@pytest.mark.slow  # r13 driver tier: operator keeps oracle-parity coverage; full tier runs this each round
def test_zorder_bbox_filter_equals_naive_filter(spark):
    pts = spark.range(30_000).select(
        F.col("id"),
        ((F.pmod(F.col("id") * 7919, F.lit(18000)) / 100.0) - 90.0).alias("lat"),
        ((F.pmod(F.col("id") * 104729, F.lit(36000)) / 100.0) - 180.0).alias("lon"),
    )
    z = fn.with_zorder(pts)
    bbox = (-10.0, 35.5, 20.0, 99.25)
    got = sorted(
        r["id"]
        for r in fn.zorder_bbox_filter(z, *bbox).select("id").collect()
    )
    want = sorted(
        r["id"]
        for r in z.filter(
            F.col("lat").between(bbox[0], bbox[1])
            & F.col("lon").between(bbox[2], bbox[3])
        ).select("id").collect()
    )
    assert got == want and len(want) > 100


def test_zorder_bbox_filter_pushes_zkey_ranges_to_scan(spark, tmp_path):
    pts = spark.range(5_000).select(
        F.col("id"),
        ((F.pmod(F.col("id") * 7919, F.lit(18000)) / 100.0) - 90.0).alias("lat"),
        ((F.pmod(F.col("id") * 104729, F.lit(36000)) / 100.0) - 180.0).alias("lon"),
    )
    out = str(tmp_path / "zsorted")
    (
        fn.with_zorder(pts)
        .repartitionByRange(16, "zkey")
        .sortWithinPartitions("zkey")
        .write.parquet(out)
    )
    df = spark.read.parquet(out)
    q = fn.zorder_bbox_filter(df, 0.0, 10.0, 0.0, 10.0)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    # the z-range OR-of-BETWEENs must reach the parquet scan so row-group
    # stats of the z-sorted files prune
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "zkey" in pushed


def test_zorder_ranges_superset_property_fuzz():
    """Pure-Python fuzz (no Spark): every point inside a random bbox must
    quantize to a z-key covered by some range of the quadtree cover —
    the superset guarantee zorder_bbox_filter's correctness rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    bits = 16
    m = (1 << bits) - 1

    def quant(x, lo, span):
        return max(0, min(m, int(((x - lo) / span) * m)))

    @settings(max_examples=200, deadline=None)
    @given(
        lat0=st.floats(-90, 89), dlat=st.floats(0.001, 40),
        lon0=st.floats(-180, 179), dlon=st.floats(0.001, 40),
        fx=st.floats(0, 1), fy=st.floats(0, 1),
    )
    def check(lat0, dlat, lon0, dlon, fx, fy):
        lat1 = min(90.0, lat0 + dlat)
        lon1 = min(180.0, lon0 + dlon)
        ranges = fn.zorder_ranges(lat0, lat1, lon0, lon1, bits=bits)
        # a random interior point
        lat = lat0 + fx * (lat1 - lat0)
        lon = lon0 + fy * (lon1 - lon0)
        z = fn._interleave_py(
            quant(lat, -90.0, 180.0), quant(lon, -180.0, 360.0), bits
        )
        assert any(lo <= z <= hi for lo, hi in ranges), (
            f"point ({lat},{lon}) z={z} escaped the cover"
        )

    check()


from hypothesis import given, settings
from hypothesis import strategies as st


def _geohash_reference(lat: float, lon: float, precision: int = 8) -> str:
    """Classic binary-subdivision geohash (independent of the engine's
    quantize+interleave formulation)."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    latr, lonr = [-90.0, 90.0], [-180.0, 180.0]
    bits = []
    even = True
    while len(bits) < precision * 5:
        rng = lonr if even else latr
        val = lon if even else lat
        mid = (rng[0] + rng[1]) / 2
        if val >= mid:
            bits.append(1)
            rng[0] = mid
        else:
            bits.append(0)
            rng[1] = mid
        even = not even
    out = []
    for j in range(precision):
        v = 0
        for b in bits[j * 5:(j + 1) * 5]:
            v = (v << 1) | b
        out.append(alpha[v])
    return "".join(out)


def _geohash_quantized(lat: float, lon: float, precision: int = 8) -> str:
    """The engine's formulation (functions.geohash_expr), re-stated in
    Python: per-axis quantization + lon-leading interleave + base32."""
    import math

    nbits = precision * 5
    half = nbits // 2
    m = (1 << half) - 1
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    qlat = max(0, min(m, math.floor((lat + 90.0) / 180.0 * (1 << half))))
    qlon = max(0, min(m, math.floor((lon + 180.0) / 360.0 * (1 << half))))
    z = 0
    for i in range(half):
        z |= ((qlat >> i) & 1) << (2 * i)
        z |= ((qlon >> i) & 1) << (2 * i + 1)
    return "".join(
        alpha[(z >> (nbits - 5 - 5 * j)) & 31] for j in range(precision)
    )


@given(
    st.floats(min_value=-89.999, max_value=89.999,
              allow_nan=False, allow_infinity=False),
    st.floats(min_value=-179.999, max_value=179.999,
              allow_nan=False, allow_infinity=False),
)
@settings(max_examples=300, deadline=None)
def test_geohash_quantized_equals_subdivision(lat, lon):
    """The quantize→interleave→base32 formulation (what geohash_expr /
    with_geohash emit as Catalyst arithmetic — the Spark round-trip of
    the same formula is pinned by the osm_geohash VALUES gate and the
    u4pruydq test vector) must equal the classic binary-subdivision
    algorithm everywhere EXCEPT within ~1 double-ulp of a cell
    boundary: there ``(x + 90.0)`` can absorb the sub-ulp offset and
    the two formulations pick adjacent cells (both self-consistent;
    hypothesis found lon = -1.5e-227). Exclude that measure-zero band
    rather than pretend it away."""
    from hypothesis import assume
    import math

    for scaled in (
        (lat + 90.0) / 180.0 * (1 << 20),
        (lon + 180.0) / 360.0 * (1 << 20),
    ):
        frac = scaled - math.floor(scaled)
        assume(1e-9 < frac < 1.0 - 1e-9)
    assert _geohash_quantized(lat, lon) == _geohash_reference(lat, lon)
