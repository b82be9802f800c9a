"""Golden-fixture decoder tests.

Mirrors the reference's decoder test suite (``osmpbf/tests/read.rs``) over
the same five fixture files, asserting the same hard-coded expected values
(ids, degree coordinates, tags, refs, member roles, history visibility,
locations-on-ways)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from osm_pbf_parquet_spark.pbf import blob as B
from osm_pbf_parquet_spark.pbf import decode as D
from osm_pbf_parquet_spark.pbf import proto as P

FIXDIR = "/root/reference/osmpbf/tests"
TEST_FILES = [
    f"{FIXDIR}/test.osm.pbf",
    f"{FIXDIR}/test_nozlib.osm.pbf",
    f"{FIXDIR}/test_nozlib_nodense.osm.pbf",
]
HISTORY_FILE = f"{FIXDIR}/deleted_nodes.osh.pbf"
LOC_ON_WAYS_FILE = f"{FIXDIR}/loc_on_ways.osm.pbf"


# --- proto primitives --------------------------------------------------------


def test_varint_roundtrip():
    buf = bytes([0x96, 0x01])  # 150
    assert P.read_varint(buf, 0) == (150, 2)


def test_packed_varints_vectorized():
    import random

    rng = random.Random(7)
    values = [rng.randrange(0, 2**60) for _ in range(1000)] + [0, 1, 127, 128, 2**63]
    encoded = bytearray()
    for v in values:
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                encoded.append(b | 0x80)
            else:
                encoded.append(b)
                break
    out = P.decode_packed_uvarints([memoryview(bytes(encoded))])
    assert [int(x) for x in out] == [v for v in values]


def test_zigzag():
    enc = np.array([0, 1, 2, 3, 4, 4294967294], dtype=np.uint64)
    dec = P.zigzag_decode(enc)
    assert list(dec) == [0, -1, 1, -2, 2, 2147483647]


# --- blob framing ------------------------------------------------------------


def test_index_blobs_matches_reference_layout():
    # read.rs:215-221: test files have [OSMHeader, OSMData]
    for path in TEST_FILES:
        infos = B.index_blobs(path)
        assert [i.blob_type for i in infos] == [B.TYPE_HEADER, B.TYPE_DATA]
    assert [i.blob_type for i in B.index_blobs(HISTORY_FILE)] == [
        B.TYPE_HEADER, B.TYPE_DATA,
    ]
    # read.rs:379: loc_on_ways has 3 blobs
    assert [i.blob_type for i in B.index_blobs(LOC_ON_WAYS_FILE)] == [
        B.TYPE_HEADER, B.TYPE_DATA, B.TYPE_DATA,
    ]


def test_random_access_matches_sequential():
    path = TEST_FILES[0]
    seq = list(B.iter_blobs(path))
    with open(path, "rb") as f:
        for info, payload in seq:
            assert B.read_blob_at(f, info.offset, info.size) == payload


# --- full decode: the golden micro-fixture -----------------------------------


def _decode_file(path, **kw):
    batches = []
    header = None
    for info, raw in B.iter_blobs(path):
        payload = B.decompress_blob(raw)
        if info.blob_type == B.TYPE_HEADER:
            header = D.parse_header_block(payload)
        else:
            batch = D.parse_block_to_batch(payload, **kw)
            if batch is not None:
                batches.append(batch)
    import pyarrow as pa

    table = pa.Table.from_batches(batches) if batches else None
    return header, table


@pytest.mark.parametrize("path", TEST_FILES)
def test_golden_content(path):
    header, table = _decode_file(path)
    rows = {(r["type"], r["id"]): r for r in table.to_pylist()}
    assert len(rows) == 5  # 3 nodes, 1 way, 1 relation (read.rs:309,322)

    n105 = rows[("node", 105)]
    n106 = rows[("node", 106)]
    n108 = rows[("node", 108)]
    assert n105["lat"] == pytest.approx(52.12240315616, abs=1e-7)
    assert n105["lon"] == pytest.approx(11.62840177902, abs=1e-7)
    assert n106["lat"] == pytest.approx(52.11992359584, abs=1e-7)
    assert n106["lon"] == pytest.approx(11.62564468943, abs=1e-7)
    assert n108["lat"] == pytest.approx(52.11989910567, abs=1e-7)
    assert n108["lon"] == pytest.approx(11.63101926915, abs=1e-7)
    for n in (n105, n106, n108):
        assert n["uid"] == 17
        assert n["user"] == "testuser"
        assert n["version"] == 1
        assert n["visible"] is True
        assert n["nds"] == []
        assert n["members"] == []
    # timestamp: 2003-04-05T06:07:08Z (test.osm)
    assert n105["timestamp"] == dt.datetime(2003, 4, 5, 6, 7, 8)

    way = rows[("way", 107)]
    assert [nd["ref"] for nd in way["nds"]] == [105, 106, 108, 105]  # read.rs:192
    assert dict(way["tags"]) == {"building": "yes", "name": "triangle"}
    assert way["lat"] is None and way["lon"] is None

    rel = rows[("relation", 120)]
    assert rel["members"] == [{"type": "way", "ref": 107, "role": "test_role"}]
    assert dict(rel["tags"]) == {"rel_key": "rel_value"}


def test_history_visible_flags():
    # read.rs:354-372: 2 dense nodes, first deleted
    header, table = _decode_file(HISTORY_FILE)
    assert "HistoricalInformation" in header["required_features"]
    rows = table.to_pylist()
    assert len(rows) == 2
    assert rows[0]["visible"] is False
    assert rows[1]["visible"] is True


def test_loc_on_ways():
    # read.rs:375-452
    header, table = _decode_file(LOC_ON_WAYS_FILE)
    assert "LocationsOnWays" in header["optional_features"]
    rows = {(r["type"], r["id"]): r for r in table.to_pylist()}
    way = rows[("way", 107)]
    assert [nd["ref"] for nd in way["nds"]] == [105, 106, 108, 105]
    assert dict(way["tags"]) == {"building": "yes", "name": "triangle"}
    rel = rows[("relation", 120)]
    assert rel["members"] == [{"type": "way", "ref": 107, "role": "test_role"}]

    # per-way locations decode (D5)
    for info, raw in B.iter_blobs(LOC_ON_WAYS_FILE):
        if info.blob_type != B.TYPE_DATA:
            continue
        payload = B.decompress_blob(raw)
        fields = P.message_fields(payload)
        gran = fields.get(17, [100])[0]
        lat_off = fields.get(19, [0])[0]
        lon_off = fields.get(20, [0])[0]
        for group in fields.get(2, []):
            g = P.message_fields(group)
            for wp in g.get(3, []):
                refs, lat, lon = D.decode_way_locations(wp, gran, lat_off, lon_off)
                assert list(refs) == [105, 106, 108, 105]
                np.testing.assert_allclose(
                    lat, [52.1224031, 52.11992359584, 52.11989910567, 52.1224031],
                    atol=1e-7,
                )
                np.testing.assert_allclose(
                    lon, [11.6284017, 11.62564468943, 11.63101926915, 11.6284017],
                    atol=1e-7,
                )


def test_encoding_variants_identical():
    # the three test files hold the same logical rows in different physical
    # encodings (zlib/raw, dense/plain) — decoded output must be identical
    # (read.rs:210-299 asserts the same across readers)
    tables = []
    for path in TEST_FILES:
        _, table = _decode_file(path)
        tables.append(table.sort_by([("type", "ascending"), ("id", "ascending")]))
    base = tables[0].to_pylist()
    for other in tables[1:]:
        assert other.to_pylist() == base


def test_kind_pushdown():
    _, table = _decode_file(TEST_FILES[0], kinds={"way"})
    assert table.column("type").to_pylist() == ["way"]
    _, table = _decode_file(TEST_FILES[0], kinds={"node"})
    assert table.num_rows == 3


def test_column_pruning():
    cols = ["id", "type", "lat", "lon"]
    _, table = _decode_file(TEST_FILES[0], columns=cols)
    assert table.column_names == cols
    assert table.num_rows == 5


def test_header_decode():
    # read.rs:13-51: required/optional feature expectations per fixture
    header, _ = _decode_file(TEST_FILES[0])
    assert sorted(header["required_features"]) == ["DenseNodes", "OsmSchema-V0.6"]
    header, _ = _decode_file(TEST_FILES[2])
    assert header["required_features"] == ["OsmSchema-V0.6"]
    header, _ = _decode_file(LOC_ON_WAYS_FILE)
    assert header["optional_features"] == ["LocationsOnWays"]


def test_corrupt_input_raises():
    with pytest.raises((B.BlobError, P.ProtoDecodeError)):
        list(B.iter_blobs("/dev/null") if False else iter(()))  # placeholder
        raise B.BlobError("x")
    # truncated varint
    with pytest.raises(P.ProtoDecodeError):
        P.read_varint(b"\x80", 0)
    # oversized header guard
    import io, struct

    bad = struct.pack(">I", B.MAX_BLOB_HEADER_SIZE + 1) + b"\x00" * 10
    import tempfile, os

    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(bad)
        name = f.name
    try:
        with pytest.raises(B.BlobError):
            B.index_blobs(name)
    finally:
        os.unlink(name)


def _enc_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_info_batch_matches_scalar_decoder():
    """_InfoBatch's vectorized mass-varint path must agree with
    _info_scalars field-for-field, including int32 sign handling, missing
    fields, visible=false, and absent Info defaults."""
    infos = [
        # version=3, ts=1000, changeset=77, uid=42, user_sid=5, visible=1
        b"\x08\x03\x10" + _enc_varint(1000) + b"\x18\x4d\x20\x2a\x28\x05\x30\x01",
        # minimal: version only
        b"\x08\x01",
        None,  # no Info at all
        # visible=0 (deleted), negative uid as 32-bit two's complement varint
        b"\x08\x02\x20" + _enc_varint((1 << 32) - 7) + b"\x30\x00",
        b"",  # empty Info payload
    ]
    batch = D._InfoBatch(len(infos))
    for i, p in enumerate(infos):
        batch.add(i, p)
    got = batch.finish(1000)
    for i, p in enumerate(infos):
        expected = D._info_scalars(p if p else None, 1000)
        actual = tuple(int(a[i]) if a.dtype != bool else bool(a[i]) for a in got)
        assert actual == tuple(
            int(x) if not isinstance(x, bool) else x for x in expected
        ), f"row {i}: {actual} != {expected}"


def test_info_batch_fallback_on_non_varint_field():
    """An unknown wire-2 field inside Info breaks tag/value alternation;
    the batch decoder must detect it and fall back to the scalar skip
    path rather than mis-route values."""
    # version=9 then an unknown length-delimited field no. 7, then uid=13
    weird = b"\x08\x09\x3a\x03abc\x20\x0d"
    batch = D._InfoBatch(2)
    batch.add(0, weird)
    batch.add(1, b"\x08\x04")
    got = batch.finish(1000)
    exp0 = D._info_scalars(weird, 1000)
    actual0 = tuple(int(a[0]) if a.dtype != bool else bool(a[0]) for a in got)
    assert actual0 == tuple(int(x) if not isinstance(x, bool) else x for x in exp0)
    assert int(got[7][1]) == 4 and bool(got[8][1])  # row 1 version intact


def _data_group_payloads(path, field_no):
    """Collect (payload_list, date_granularity) for each group carrying
    repeated field ``field_no`` (3=ways, 4=relations) in a file."""
    out = []
    for info, raw in B.iter_blobs(path):
        if info.blob_type != B.TYPE_DATA:
            continue
        fields = P.message_fields(B.decompress_blob(raw))
        dg = fields.get(18, [1000])[0] or 1000
        for group_payload in fields.get(2, []):
            group = P.message_fields(group_payload)
            if field_no in group:
                out.append((group[field_no], dg))
    return out


def _cols_snapshot(c):
    cat = lambda chunks: np.concatenate([np.asarray(x) for x in chunks]) if chunks else np.empty(0)
    return {
        name: cat(getattr(c, name))
        for name in ("ids", "tag_counts", "tag_keys", "tag_vals", "nd_counts",
                     "nd_refs", "mem_counts", "mem_refs", "mem_roles",
                     "mem_types", "changeset", "ts_ms", "uid", "user_sid",
                     "version", "visible")
    }


def test_vectorized_way_decode_matches_scalar():
    """The lane-frontier way decoder must agree field-for-field with the
    row-at-a-time fallback on real multi-way groups."""
    import sys, os, tempfile
    sys.path.insert(0, os.path.dirname(__file__))
    from pbf_encoder import write_synthetic_pbf

    path = tempfile.mktemp(suffix=".osm.pbf")
    write_synthetic_pbf(path, n_nodes=300, n_ways=200, n_rels=40,
                        nodes_per_block=64)
    try:
        groups = _data_group_payloads(path, 3)
        assert groups, "synthetic file must contain way groups"
        want = lambda col: True
        for payloads, dg in groups:
            cv, cs = D._Columns(), D._Columns()
            D._decode_ways(payloads, cv, 100, 0, 0, dg, want)
            D._decode_ways_scalar(payloads, cs, 100, 0, 0, dg, want)
            a, b = _cols_snapshot(cv), _cols_snapshot(cs)
            for name in a:
                assert np.array_equal(a[name], b[name]), f"way field {name}"
        for payloads, dg in _data_group_payloads(path, 4):
            cv, cs = D._Columns(), D._Columns()
            D._decode_relations(payloads, cv, dg, want)
            D._decode_relations_scalar(payloads, cs, dg, want)
            a, b = _cols_snapshot(cv), _cols_snapshot(cs)
            for name in a:
                assert np.array_equal(a[name], b[name]), f"rel field {name}"
    finally:
        import os as _os
        _os.unlink(path)


def test_unpacked_repeated_fields_fall_back():
    """proto2 allows repeated numeric fields to arrive unpacked (one
    wire-0 entry per value); the vectorized scan must detect this and
    route the group to the scalar decoder, producing identical refs."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from pbf_encoder import _key, _varint, _zigzag, _len_field, encode_info, StringTable

    st = StringTable()
    refs = [105, 106, 108, 105]
    deltas = [refs[0]] + [b - a for a, b in zip(refs, refs[1:])]
    body = _key(1, 0) + _varint(7)
    for d in deltas:  # unpacked: each ref its own wire-0 field
        body += _key(8, 0) + _varint(_zigzag(d))
    body += _len_field(4, encode_info(st, {"version": 2, "uid": 9, "user": "u"}))
    c = D._Columns()
    c._stringtable = D._StringTable(st.encode())
    D._decode_ways([body], c, 100, 0, 0, 1000, lambda col: True)
    assert np.concatenate(c.nd_refs).tolist() == refs
    assert np.concatenate(c.ids).tolist() == [7]
    assert np.concatenate(c.version).tolist() == [2]


# --- regression tests for review findings ------------------------------------


def test_negative_lat_lon_offset_decodes_signed():
    """lat/lon_offset are int64 and may be negative; granularity is int32.
    A raw-unsigned read would turn lat_offset=-1e9 into +1.8e10 degrees."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from pbf_encoder import (_key, _varint, _len_field, _packed_svarints,
                             StringTable)

    st = StringTable()
    # one dense node: raw lat/lon = 2e9 with offset -1e9, gran 100
    # → degrees = (-1e9 + 100 * 2e7) * 1e-9 = 1.0
    body = bytearray()
    body += _len_field(1, st.encode())
    dense = _packed_svarints(1, [7], delta=True)  # id
    dense += _packed_svarints(8, [20_000_000], delta=True)
    dense += _packed_svarints(9, [20_000_000], delta=True)
    group = _len_field(2, bytes(dense))
    body += _len_field(2, group)
    neg = (1 << 64) - 1_000_000_000  # -1e9 as unsigned varint bits
    body += _key(19, 0) + _varint(neg)
    body += _key(20, 0) + _varint(neg)
    batch = D.parse_block_to_batch(bytes(body))
    row = batch.to_pylist()[0]
    assert row["lat"] == pytest.approx(1.0, abs=1e-9)
    assert row["lon"] == pytest.approx(1.0, abs=1e-9)


def test_decompress_guard_orders_and_bombs():
    """The 32MB guard must hold regardless of raw_size field position or
    absence (zlib bombs expand ~1000:1)."""
    import zlib as _z
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from pbf_encoder import _key, _varint, _len_field

    big = b"\x00" * (B.MAX_BLOB_SIZE + 100)
    comp = _z.compress(big)
    # raw_size AFTER the data field
    blob1 = _len_field(3, comp) + _key(2, 0) + _varint(len(big))
    with pytest.raises(B.BlobError):
        B.decompress_blob(blob1)
    # raw_size absent entirely
    blob2 = _len_field(3, comp)
    with pytest.raises(B.BlobError):
        B.decompress_blob(blob2)
    # well-formed small blob still works with raw_size after data
    ok = _len_field(3, _z.compress(b"hi")) + _key(2, 0) + _varint(2)
    assert B.decompress_blob(ok) == b"hi"


def test_packed_run_must_end_on_element_boundary():
    """A packed payload ending mid-varint must error, not bleed its bytes
    into the next element's values."""
    pb = P.PackedBatch(2)
    pb.add(0, memoryview(b"\x80"))  # dangling continuation byte
    pb.add(1, memoryview(b"\x01\x02"))
    with pytest.raises(P.ProtoDecodeError):
        pb.finish()


def test_dense_info_length_mismatch_errors():
    """DenseInfo parallel arrays shorter than the node count must raise,
    not fabricate version=0 rows marked valid."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from pbf_encoder import (_len_field, _packed_svarints, _packed_uvarints,
                             StringTable)

    st = StringTable()
    dense = _packed_svarints(1, [1, 2, 3], delta=True)
    di = _packed_uvarints(1, [5])  # 1 version for 3 nodes
    dense += _len_field(5, bytes(di))
    dense += _packed_svarints(8, [0, 0, 0], delta=True)
    dense += _packed_svarints(9, [0, 0, 0], delta=True)
    block = _len_field(1, st.encode()) + _len_field(2, _len_field(2, bytes(dense)))
    with pytest.raises(P.ProtoDecodeError):
        D.parse_block_to_batch(bytes(block))


def test_overlong_varint_consistent_mask():
    """Scalar and vectorized varint decoders must agree (mod 2^64) on
    over-long 10-byte encodings."""
    buf = bytes([0xFF] * 9 + [0x7F])
    scalar, _ = P.read_varint(buf, 0)
    vec = int(P.uvarints_from_raw(np.frombuffer(buf, dtype=np.uint8))[0])
    assert scalar == vec == (1 << 64) - 1


def test_repeated_numeric_preserves_interleaved_order():
    """Unpacked scalars interleaved with packed chunks must decode in
    occurrence order (delta decoding depends on it)."""
    packed = memoryview(bytes([0x04, 0x06]))  # zigzag 2, 3
    vals = P.repeated_numeric([2, packed, 8], signed_zigzag=True, delta=True)
    # zigzag: 2→1, then 2,3 ; 8→4 — cumsum: 1, 3, 6, 10
    assert vals.tolist() == [1, 3, 6, 10]


def test_truncated_messages_raise_decode_error():
    """Truncated fast-path reads surface as ProtoDecodeError, never bare
    IndexError."""
    with pytest.raises(P.ProtoDecodeError):
        P.message_fields(b"\x08")  # wire-0 key, no value
    with pytest.raises(P.ProtoDecodeError):
        P.message_fields(b"\x0a\x80")  # 2-byte length fast path at EOF
    with pytest.raises(P.ProtoDecodeError):
        P.message_fields(b"\x09\x01")  # fixed64 with 1 byte left


def test_lzma_blob_decode(tmp_path):
    """D1: lzma-compressed blobs (Blob field 4) decode identically to
    zlib — the spec alternative the golden fixtures don't exercise."""
    import pbf_encoder as E
    from osm_pbf_parquet_spark.pbf import blob as B
    from osm_pbf_parquet_spark.pbf.decode import parse_block_to_batch

    st = E.StringTable()
    nodes = [{"id": i, "lat_raw": i * 10, "lon_raw": -i * 10,
              "tags": {"k": f"v{i}"}, "version": 1, "timestamp_s": i,
              "changeset": i, "uid": 1, "user": "u", "visible": True}
             for i in range(1, 8)]
    payload = E.encode_primitive_block([E.encode_dense_nodes(st, nodes)], st=st)
    p = str(tmp_path / "lzma.osm.pbf")
    with open(p, "wb") as f:
        E.write_blob(f, "OSMHeader", E.encode_header_block(), compress="lzma")
        E.write_blob(f, "OSMData", payload, compress="lzma")
    batches = []
    for info, raw in B.iter_blobs(p):
        out = B.decompress_blob(raw)
        if info.blob_type == B.TYPE_DATA:
            batches.append(parse_block_to_batch(out))
    [batch] = batches
    got = batch.to_pydict()
    assert got["id"] == [n["id"] for n in nodes]
    assert got["lat"][2] == nodes[2]["lat_raw"] * 100 * 1e-9


def test_lzma_bomb_capped(tmp_path):
    """A small lzma payload expanding past 32MB must raise BlobError
    without materializing the full expansion (bomb guard, D1 parity with
    the zlib branch)."""
    import lzma as L
    import struct
    import pbf_encoder as E
    from osm_pbf_parquet_spark.pbf import blob as B

    bomb_payload = L.compress(b"\x00" * (64 * 1024 * 1024))  # 64MB zeros
    blob_msg = E._len_field(4, bomb_payload)  # raw_size omitted deliberately
    with pytest.raises(B.BlobError, match="too big"):
        B.decompress_blob(blob_msg)


def test_lzma_truncated_raises(tmp_path):
    """A truncated lzma stream must raise even when raw_size is absent —
    the incremental decompressor returns partial output with eof=False and
    needs_input=True, which a size-only guard would silently accept."""
    import lzma as L
    import pbf_encoder as E
    from osm_pbf_parquet_spark.pbf import blob as B

    full = L.compress(b"payload bytes " * 4096)
    truncated = full[: len(full) // 2]
    blob_msg = E._len_field(4, truncated)  # no raw_size field
    with pytest.raises(B.BlobError, match="truncated"):
        B.decompress_blob(blob_msg)
