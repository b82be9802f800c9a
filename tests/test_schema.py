"""Schema-contract tests (parity: reference osm_arrow.rs:37-108 fixed schema)."""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from osm_pbf_parquet_spark import schema as S


def test_column_order_matches_reference_contract():
    # reference column order (osm_arrow.rs:37-108) with `type` injected
    # after id (partition column surfaced as a regular column)
    assert S.OSM_COLUMNS == [
        "id", "type", "tags", "lat", "lon", "nds", "members",
        "changeset", "timestamp", "uid", "user", "version", "visible",
    ]


def test_types_match_reference():
    f = {field.name: field for field in S.OSM_SCHEMA.fields}
    assert f["id"].dataType == T.LongType() and not f["id"].nullable
    assert f["tags"].dataType == T.MapType(T.StringType(), T.StringType(), True)
    assert f["lat"].dataType == T.DoubleType()
    assert f["nds"].dataType.elementType["ref"].dataType == T.LongType()
    member_struct = f["members"].dataType.elementType
    assert [x.name for x in member_struct.fields] == ["type", "ref", "role"]
    assert f["timestamp"].dataType == T.TimestampNTZType()  # ms-precision naive
    assert f["uid"].dataType == T.IntegerType()  # Int32 like Arrow, not DDL BIGINT
    assert f["version"].dataType == T.IntegerType()
    assert f["visible"].dataType == T.BooleanType()


def test_arrow_schema_alignment():
    arrow = S.osm_arrow_schema()
    assert arrow.names == S.OSM_COLUMNS
    assert arrow.field("timestamp").type == pa.timestamp("us")
    assert arrow.field("tags").type == pa.map_(pa.string(), pa.string())


def test_pruned_schema():
    sub = S.pruned_schema(["id", "lat", "type"])
    assert [f.name for f in sub.fields] == ["id", "type", "lat"]  # canonical order
    with pytest.raises(ValueError):
        S.pruned_schema(["nope"])
    assert S.pruned_arrow_schema(["id", "tags"]).names == ["id", "tags"]
