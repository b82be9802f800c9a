"""Minimal proto2 wire-format decoding, vectorized with numpy.

Implements exactly enough of the protobuf wire format (varint, zigzag,
length-delimited, packed repeated) to decode the OSM PBF messages defined
by the public spec (https://wiki.openstreetmap.org/wiki/PBF_Format;
fileformat.proto / osmformat.proto). The protobuf python package is not a
dependency — the wire format is tiny and hand-decoding lets the hot packed
arrays (delta-coded ids/coords/timestamps) be decoded in bulk with numpy
instead of element-at-a-time (the reference decodes these with scalar
loops: ``osmpbf/src/dense.rs:86-183``; our ``cumsum`` path is the
vectorized equivalent).

Wire types used by OSM PBF: 0 (varint), 2 (length-delimited). Types 1/5
(fixed 64/32) are skipped structurally if ever present.
"""

from __future__ import annotations

import numpy as np

_U64_1 = np.uint64(1)
_U64_7 = np.uint64(7)


class ProtoDecodeError(ValueError):
    """Malformed protobuf payload (parity: reference error taxonomy
    ``osmpbf/src/error.rs:44-82``)."""


def read_varint(buf, pos: int) -> tuple[int, int]:
    """Read one varint starting at ``pos``; returns (value, next_pos)."""
    result = 0
    shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise ProtoDecodeError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ProtoDecodeError("varint too long")


def zigzag_i64(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def iter_fields(buf):
    """Yield ``(field_no, wire_type, value)`` over a message payload.

    ``value`` is an int for wire type 0, a memoryview for wire type 2,
    raw bytes slices for 1/5.
    """
    view = memoryview(buf)
    pos = 0
    n = len(view)
    while pos < n:
        key, pos = read_varint(view, pos)
        field_no = key >> 3
        wire = key & 7
        if wire == 0:
            val, pos = read_varint(view, pos)
        elif wire == 2:
            length, pos = read_varint(view, pos)
            if pos + length > n:
                raise ProtoDecodeError("truncated length-delimited field")
            val = view[pos : pos + length]
            pos += length
        elif wire == 1:
            val = view[pos : pos + 8]
            pos += 8
        elif wire == 5:
            val = view[pos : pos + 4]
            pos += 4
        else:
            raise ProtoDecodeError(f"unsupported wire type {wire}")
        yield field_no, wire, val


def message_fields(buf) -> dict[int, list]:
    """Scan a message into ``{field_no: [values...]}`` preserving order."""
    out: dict[int, list] = {}
    for field_no, _wire, val in iter_fields(buf):
        out.setdefault(field_no, []).append(val)
    return out


# --- packed repeated decoding (the hot path) --------------------------------


def decode_packed_uvarints(chunks) -> np.ndarray:
    """Decode one or more packed-varint payloads into a uint64 array.

    Fully vectorized: classify terminator bytes (high bit clear), group
    bytes by value, shift-and-sum with ``np.add.reduceat``. This replaces
    per-value scalar decoding and is the foundation of the cumsum delta
    decode (reference scalar equivalent ``osmpbf/src/dense.rs:148-152``).
    """
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    if len(chunks) == 1:
        raw = np.frombuffer(chunks[0], dtype=np.uint8)
    else:
        raw = np.frombuffer(b"".join(bytes(c) for c in chunks), dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_term = raw < 0x80
    if not is_term[-1]:
        raise ProtoDecodeError("truncated packed varint run")
    ends = np.flatnonzero(is_term)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # byte position within its own varint
    gid = np.cumsum(is_term) - is_term  # group index per byte
    offsets = np.arange(raw.size, dtype=np.int64) - starts[gid]
    if offsets.max(initial=0) > 9:
        raise ProtoDecodeError("varint too long")
    contrib = (raw & 0x7F).astype(np.uint64) << (offsets.astype(np.uint64) * _U64_7)
    return np.add.reduceat(contrib, starts)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """Vectorized zigzag decode uint64 → int64."""
    return ((values >> _U64_1).astype(np.int64)) ^ -((values & _U64_1).astype(np.int64))


def packed_svarints(chunks) -> np.ndarray:
    """Packed ``sint64``/``sint32`` (zigzag) → int64 array."""
    return zigzag_decode(decode_packed_uvarints(chunks))


def packed_varints_signed(chunks) -> np.ndarray:
    """Packed two's-complement varint ``int32``/``int64`` (no zigzag) → int64."""
    return decode_packed_uvarints(chunks).astype(np.int64)


def packed_delta(chunks) -> np.ndarray:
    """Packed zigzag varints with running-sum (DELTA) decoding."""
    return np.cumsum(packed_svarints(chunks))


def encode_varint(v: int) -> bytes:
    """Encode a non-negative int as a varint (used to normalize rare
    unpacked wire-0 values into the batched packed decode path)."""
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class PackedBatch:
    """Cross-element batcher for ONE packed field of a message group.

    The per-element decode of packed arrays (way refs, relation memids,
    tag key/val indexes) is the Python hot spot — thousands of small
    numpy calls. This class instead accumulates every element's payload
    bytes and decodes the WHOLE group with one vectorized pass, tracking
    per-element value counts via byte-offset boundaries and applying the
    per-element delta reset (reference semantics: delta chains restart at
    each way/relation, ``osmpbf/src/elements.rs:327-350``) with a
    segmented cumsum.
    """

    __slots__ = ("parts", "nbytes")

    def __init__(self, n0: int) -> None:
        self.parts: list = []
        self.nbytes = np.zeros(n0, dtype=np.int64)

    def add(self, i: int, chunk) -> None:
        """Append a wire-2 packed payload for element ``i``."""
        self.parts.append(chunk)
        self.nbytes[i] += len(chunk)

    def add_scalar(self, i: int, value: int) -> None:
        """Rare unpacked wire-0 occurrence — normalize by re-encoding."""
        b = encode_varint(value)
        self.parts.append(b)
        self.nbytes[i] += len(b)

    def finish(self, zigzag: bool = False, delta: bool = False):
        """→ (values int64, per-element counts). One vectorized decode."""
        n0 = self.nbytes.size
        if not self.parts:
            return np.empty(0, dtype=np.int64), np.zeros(n0, dtype=np.int64)
        blob = b"".join(self.parts)
        raw = np.frombuffer(blob, dtype=np.uint8)
        u = decode_packed_uvarints([blob])
        vals = zigzag_decode(u) if zigzag else u.astype(np.int64)
        term_cs = np.concatenate([[0], np.cumsum(raw < 0x80)])
        byte_bounds = np.concatenate([[0], np.cumsum(self.nbytes)])
        counts = term_cs[byte_bounds[1:]] - term_cs[byte_bounds[:-1]]
        if delta and vals.size:
            cs = np.cumsum(vals)
            elem_starts = np.cumsum(counts) - counts
            base = np.where(
                elem_starts > 0, cs[np.maximum(elem_starts - 1, 0)], 0
            )
            vals = cs - np.repeat(base, counts)
        return vals, counts


def repeated_numeric(values, signed_zigzag: bool, delta: bool = False) -> np.ndarray:
    """Decode a repeated numeric field that may arrive packed (wire 2 →
    memoryview chunks) or unpacked (wire 0 → ints) — proto2 readers must
    accept both encodings."""
    chunks = [v for v in values if isinstance(v, memoryview)]
    scalars = [v for v in values if not isinstance(v, memoryview)]
    if chunks:
        arr = decode_packed_uvarints(chunks)
        if scalars:
            arr = np.concatenate([arr, np.array(scalars, dtype=np.uint64)])
    else:
        arr = np.array(scalars, dtype=np.uint64)
    out = zigzag_decode(arr) if signed_zigzag else arr.astype(np.int64)
    return np.cumsum(out) if delta else out
