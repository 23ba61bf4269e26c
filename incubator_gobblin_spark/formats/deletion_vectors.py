"""Delta Lake deletion vectors: the pure-Python codec.

Spec (delta-io PROTOCOL.md §Deletion Vectors + §Deletion Vector
Format): a ``deletionVector`` descriptor on an ``add`` action marks a
set of row indexes of that data file as deleted without rewriting the
file. The descriptor is

    {"storageType": "u"|"i"|"p", "pathOrInlineDv": ...,
     "offset": int?, "sizeInBytes": int, "cardinality": long}

- ``u``: the DV lives in a file named
  ``deletion_vector_<uuid>.bin`` under the table root (an optional
  random prefix precedes the Z85-encoded 16-byte UUID in
  ``pathOrInlineDv``);
- ``p``: ``pathOrInlineDv`` is an absolute path to the DV file;
- ``i``: ``pathOrInlineDv`` IS the serialized bitmap, Z85-encoded.

On-disk DV files start with a 1-byte format version (=1); at
``offset`` sits a 4-byte big-endian length (== sizeInBytes), the
serialized bitmap, then a 4-byte big-endian CRC-32 of the bitmap
bytes. One file may hold many DVs at different offsets.

The bitmap itself is a *RoaringBitmapArray* in the "portable" format
(delta-storage ``RoaringBitmapArray``; 32-bit container spec at
github.com/RoaringBitmap/RoaringFormatSpec): little-endian 4-byte
magic ``1681511377``, 8-byte bitmap count, then one standard 32-bit
roaring bitmap per 2^32 range — each with the 12346 (no runs) or
12347 (runs) cookie, descriptive header of (key, cardinality-1)
pairs, optional offset header, and array (<=4096 values) / bitset
(8192 bytes) / run containers.

The serializer here always emits the no-run-container form (cookie
12346, array or bitset containers) — the subset every roaring reader
accepts; the deserializer reads all three container kinds and both
cookies, so DVs from real Delta writers decode.

Z85 note: Z85 encodes 4-byte groups. Serialized bitmaps are 2-byte
aligned, not 4 — inline encoding pads with zero bytes and relies on
``sizeInBytes`` to recover the true length, matching the descriptor's
contract that ``sizeInBytes`` is the DATA size.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

MAGIC = 1681511377
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"z85 input must be 4-byte aligned ({len(data)})")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 text must be 5-char aligned ({len(text)})")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            v = v * 85 + _Z85_INDEX[c]
        out.extend(v.to_bytes(4, "big"))
    return bytes(out)


# ---------------------------------------------------------------------------
# RoaringBitmapArray (portable)
# ---------------------------------------------------------------------------


def serialize_roaring64(positions) -> bytes:
    """Serialize sorted-or-not 64-bit row indexes as a portable
    RoaringBitmapArray (no run containers; array container <=4096
    values per 16-bit key, bitset past that)."""
    by_bitmap: dict[int, dict[int, list[int]]] = {}
    for p in positions:
        p = int(p)
        if p < 0:
            raise ValueError(f"negative row index {p}")
        hi32, lo32 = p >> 32, p & 0xFFFFFFFF
        by_bitmap.setdefault(hi32, {}).setdefault(lo32 >> 16, []).append(
            lo32 & 0xFFFF
        )
    n_bitmaps = (max(by_bitmap) + 1) if by_bitmap else 0
    out = bytearray()
    out += struct.pack("<i", MAGIC)
    out += struct.pack("<q", n_bitmaps)
    for b in range(n_bitmaps):
        containers = by_bitmap.get(b, {})
        keys = sorted(containers)
        body = bytearray()
        body += struct.pack("<I", _COOKIE_NO_RUN)
        body += struct.pack("<i", len(keys))
        blobs = []
        for k in keys:
            vals = sorted(set(containers[k]))
            body += struct.pack("<HH", k, len(vals) - 1)
            if len(vals) <= 4096:
                blobs.append(struct.pack(f"<{len(vals)}H", *vals))
            else:
                bits = bytearray(8192)
                for v in vals:
                    bits[v >> 3] |= 1 << (v & 7)
                blobs.append(bytes(bits))
        # offset header (mandatory without run containers): containers
        # start after cookie(4) + size(4) + descriptive header (4 bytes
        # per container: key u16 + cardinality-1 u16) + the offset
        # header itself (4 bytes per container) = 8 + 8*n.
        off = 4 + 4 + 4 * len(keys) + 4 * len(keys)
        for blob in blobs:
            body += struct.pack("<I", off)
            off += len(blob)
        for blob in blobs:
            body += blob
        out += body
    return bytes(out)


def deserialize_roaring64(data: bytes) -> list[int]:
    """Decode a portable RoaringBitmapArray into sorted 64-bit row
    indexes. Reads both cookies and all three container kinds."""
    if len(data) < 12:
        raise ValueError("deletion vector bitmap too short")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} (want {MAGIC})"
        )
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for b in range(n_bitmaps):
        base = b << 32
        (cookie32,) = struct.unpack_from("<I", data, pos)
        if (cookie32 & 0xFFFF) == _COOKIE_RUN:
            size = (cookie32 >> 16) + 1
            pos += 4
            nrun_bytes = (size + 7) // 8
            run_bits = data[pos : pos + nrun_bytes]
            pos += nrun_bytes
            has_run = True
        elif cookie32 == _COOKIE_NO_RUN:
            pos += 4
            (size,) = struct.unpack_from("<i", data, pos)
            pos += 4
            run_bits = b""
            has_run = False
        else:
            raise ValueError(f"bad roaring cookie {cookie32}")
        keys_cards = []
        for i in range(size):
            k, cm1 = struct.unpack_from("<HH", data, pos)
            pos += 4
            keys_cards.append((k, cm1 + 1))
        if (not has_run) or size >= _NO_OFFSET_THRESHOLD:
            pos += 4 * size  # offset header (containers are sequential)
        for i, (k, card) in enumerate(keys_cards):
            kbase = base | (k << 16)
            is_run = has_run and bool(run_bits[i >> 3] & (1 << (i & 7)))
            if is_run:
                (n_runs,) = struct.unpack_from("<H", data, pos)
                pos += 2
                for _ in range(n_runs):
                    start, lm1 = struct.unpack_from("<HH", data, pos)
                    pos += 4
                    out.extend(kbase | v for v in range(start, start + lm1 + 1))
            elif card <= 4096:
                vals = struct.unpack_from(f"<{card}H", data, pos)
                pos += 2 * card
                out.extend(kbase | v for v in vals)
            else:
                bits = data[pos : pos + 8192]
                pos += 8192
                for byte_i, byte in enumerate(bits):
                    if byte:
                        for bit in range(8):
                            if byte & (1 << bit):
                                out.append(kbase | (byte_i << 3) | bit)
    return sorted(out)


# ---------------------------------------------------------------------------
# descriptor <-> bytes
# ---------------------------------------------------------------------------


def dv_file_path(table_root: str, descriptor: dict) -> str | None:
    """Absolute path of the on-disk file a descriptor references, or
    None for an inline ('i') vector. Shared by the reader and by
    ``vacuum_delta`` (which must know which bitmap files the current
    snapshot still references before deleting anything)."""
    st = descriptor.get("storageType")
    if st == "i":
        return None
    if st == "u":
        tail = descriptor["pathOrInlineDv"]
        # optional random prefix before the 20-char z85 UUID
        prefix, enc = tail[:-20], tail[-20:]
        u = _uuid.UUID(bytes=z85_decode(enc))
        fname = f"deletion_vector_{u}.bin"
        return (
            os.path.join(table_root, prefix, fname)
            if prefix
            else os.path.join(table_root, fname)
        )
    if st == "p":
        path = descriptor["pathOrInlineDv"]
        if path.startswith("file:"):
            path = "/" + path.split(":", 1)[1].lstrip("/")
        return path
    raise ValueError(f"unknown deletionVector storageType {st!r}")


def read_dv_bytes(table_root: str, descriptor: dict) -> bytes:
    """The serialized bitmap bytes of one descriptor (framing + CRC
    verified for on-disk storage)."""
    size = int(descriptor["sizeInBytes"])
    if descriptor.get("storageType") == "i":
        raw = z85_decode(descriptor["pathOrInlineDv"])
        if len(raw) < size:
            raise ValueError("inline deletion vector shorter than sizeInBytes")
        return raw[:size]
    path = dv_file_path(table_root, descriptor)
    with open(path, "rb") as fh:
        blob = fh.read()
    if not blob or blob[0] != 1:
        raise ValueError(
            f"unsupported deletion-vector file version {blob[:1]!r} in {path}"
        )
    off = int(descriptor.get("offset") or 1)
    (length,) = struct.unpack_from(">i", blob, off)
    if length != size:
        raise ValueError(
            f"deletion vector length {length} != descriptor sizeInBytes "
            f"{size} in {path}@{off}"
        )
    data = blob[off + 4 : off + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
    if (zlib.crc32(data) & 0xFFFFFFFF) != (crc & 0xFFFFFFFF):
        raise ValueError(f"deletion vector CRC mismatch in {path}@{off}")
    return data


def read_dv_positions(table_root: str, descriptor: dict) -> list[int]:
    """Deleted row indexes of one descriptor, cardinality-checked."""
    out = deserialize_roaring64(read_dv_bytes(table_root, descriptor))
    card = int(descriptor.get("cardinality", len(out)))
    if card != len(out):
        raise ValueError(
            f"deletion vector cardinality {card} != decoded {len(out)}"
        )
    return out


def write_dv_file(
    table_root: str, positions, storage: str = "u"
) -> dict:
    """Author a deletion vector the way a foreign Delta writer would;
    returns the ``deletionVector`` descriptor to splice into an ``add``
    action. ``storage`` 'u' writes ``deletion_vector_<uuid>.bin`` under
    the table root, 'p' the same but referenced absolutely, 'i' inlines
    the z85 bitmap (zero-padded to the 4-byte z85 alignment;
    sizeInBytes recovers the true length)."""
    positions = sorted(int(p) for p in positions)
    data = serialize_roaring64(positions)
    desc = {"sizeInBytes": len(data), "cardinality": len(positions)}
    if storage == "i":
        padded = data + b"\x00" * (-len(data) % 4)
        return {
            **desc,
            "storageType": "i",
            "pathOrInlineDv": z85_encode(padded),
        }
    u = _uuid.uuid4()
    path = os.path.join(table_root, f"deletion_vector_{u}.bin")
    blob = bytearray(b"\x01")
    offset = len(blob)
    blob += struct.pack(">i", len(data))
    blob += data
    blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    with open(path, "wb") as fh:
        fh.write(blob)
    if storage == "u":
        return {
            **desc,
            "storageType": "u",
            "pathOrInlineDv": z85_encode(u.bytes),
            "offset": offset,
        }
    if storage == "p":
        return {
            **desc,
            "storageType": "p",
            "pathOrInlineDv": path,
            "offset": offset,
        }
    raise ValueError(f"unknown storage {storage!r}")
