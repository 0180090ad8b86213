"""Deletion-vector READ support for the Delta log reader
(delta-io/delta PROTOCOL.md — reader version 3, the
``deletionVectors`` reader feature).

Modern Delta writers (delta-spark 2.4+, Databricks DML) often commit
DELETE/UPDATE/MERGE as *deletion vectors*: the data file stays, and its
``add`` action carries a ``deletionVector`` descriptor naming a roaring
bitmap of the ROW INDEXES that are logically deleted. A reader that
ignores the descriptor resurrects deleted rows — so DV support is a
hard interop requirement for READING tables produced by current
writers, and the protocol gates it behind
``minReaderVersion >= 3 + readerFeatures: ["deletionVectors"]``.

Scope (deliberate, documented):

- **Read-only.** This engine's own DML stays copy-on-write
  (``delete_where`` / ``merge_delta_scd1`` rewrite files), so every
  table it WRITES remains readable by protocol v1 readers. DVs are
  honored when reading tables other writers produced. Checkpoints this
  engine writes are only ever written for its own (DV-free) tables.
- **Formats implemented** (PROTOCOL.md "Deletion Vector Descriptor
  Schema" + "Deletion Vector Format"):

  - storage types ``i`` (inline: ``pathOrInlineDv`` is the
    Z85-encoded bitmap), ``u`` (``pathOrInlineDv`` is
    ``[<prefix>/]<20-char Z85 uuid>`` naming
    ``deletion_vector_<uuid>.bin`` under the table root) and ``p``
    (absolute path);
  - the on-disk DV file layout: 1-byte format version, then per DV a
    4-byte BIG-endian length, the bitmap bytes, and a 4-byte
    BIG-endian CRC-32 of the bitmap bytes (``offset`` points at the
    length field);
  - the 64-bit ``RoaringBitmapArray`` *portable* serialization: 4-byte
    little-endian magic ``1681511377``, 8-byte LE count of 32-bit
    bitmaps, then per bitmap a 4-byte LE key (high 32 bits, ascending)
    followed by the standard 32-bit roaring *portable* format (cookies
    12346/12347; array, bitmap and run containers).

The bitmap decoder is pure Python on the DRIVER — a DV's cardinality
is bounded by rows-deleted-per-file, and descriptors are per-add-action
metadata, so this is file-count/deleted-row-bounded work, never table
scans. The row filter itself runs in Spark: files with a DV are read
with ``_metadata.row_index`` and anti-joined against their deleted
positions (broadcast — again bounded by deleted rows per file).
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# Z85 (ZeroMQ base-85 — NOT Python's b85/a85 alphabets)
# ---------------------------------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_decode(text: str) -> bytes:
    """Z85-decode (5 chars -> 4 bytes, big-endian base 85)."""
    if len(text) % 5 != 0:
        raise ValueError(f"Z85 length {len(text)} is not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for c in text[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}")
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    """Z85-encode (4 bytes -> 5 chars); used by the test fixtures that
    fabricate external-writer tables."""
    if len(data) % 4 != 0:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


# ---------------------------------------------------------------------------
# RoaringBitmapArray (64-bit) portable deserialization
# ---------------------------------------------------------------------------

MAGIC = 1681511377  # RoaringBitmapArray portable-format magic number

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4  # cookie-12347 bitmaps <4 containers omit offsets


def _decode_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One 32-bit roaring bitmap (portable format) starting at ``pos``;
    returns (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    low_cookie = cookie & 0xFFFF
    if low_cookie == _SERIAL_COOKIE:
        n_containers = (cookie >> 16) + 1
        pos += 4
        n_run_bytes = (n_containers + 7) // 8
        run_flags = buf[pos : pos + n_run_bytes]
        pos += n_run_bytes
        has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
    elif low_cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n_containers + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    headers = []
    for i in range(n_containers):
        key, card_minus_1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((key, card_minus_1 + 1))
    if has_offsets:
        pos += 4 * n_containers  # offsets are redundant for linear reads
    values: list[int] = []
    for i, (key, card) in enumerate(headers):
        base = key << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_minus_1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(
                    base + v for v in range(start, start + length_minus_1 + 1)
                )
        elif card > 4096:
            # bitmap container: 1024 x 64-bit words
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for w_i, word in enumerate(words):
                while word:
                    b = word & -word
                    values.append(base + (w_i << 6) + b.bit_length() - 1)
                    word ^= b
        else:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
    return values, pos


def decode_bitmap(data: bytes) -> list[int]:
    """Decode a serialized 64-bit RoaringBitmapArray into sorted row
    indexes."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic} != {MAGIC}")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for _ in range(n_bitmaps):
        (high,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, pos = _decode_rb32(data, pos)
        out.extend((high << 32) | v for v in vals)
    if pos != len(data):
        raise ValueError(
            f"RoaringBitmapArray trailing bytes: consumed {pos} of {len(data)}"
        )
    return out


def encode_bitmap(values: list[int]) -> bytes:
    """Serialize sorted row indexes as a 64-bit RoaringBitmapArray
    (array containers only — fixtures never need 4096+ per container).
    Exists so tests can FABRICATE external-writer DVs and prove the
    decode path against a real byte-level roundtrip."""
    values = sorted(set(values))
    by_high: dict[int, list[int]] = {}
    for v in values:
        if v < 0:
            raise ValueError("row indexes are non-negative")
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", MAGIC, len(by_high)))
    for high in sorted(by_high):
        out += struct.pack("<I", high)
        by_key: dict[int, list[int]] = {}
        for v in by_high[high]:
            by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
        n = len(by_key)
        out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
        for key in sorted(by_key):
            if len(by_key[key]) > 4096:
                raise ValueError("fixture encoder: array containers only")
            out += struct.pack("<HH", key, len(by_key[key]) - 1)
        # offsets: from bitmap start to each container's data
        offset = 4 + 4 + 4 * n + 4 * n
        for key in sorted(by_key):
            out += struct.pack("<I", offset)
            offset += 2 * len(by_key[key])
        for key in sorted(by_key):
            out += struct.pack(f"<{len(by_key[key])}H", *sorted(by_key[key]))
    return bytes(out)


# ---------------------------------------------------------------------------
# Descriptor resolution
# ---------------------------------------------------------------------------


def dv_file_name(uuid_z85: str, prefix: str = "") -> str:
    """Table-relative DV file name for a ``u`` descriptor."""
    import uuid as _uuid

    raw = z85_decode(uuid_z85)
    if len(raw) != 16:
        raise ValueError(f"u-descriptor uuid is {len(raw)} bytes, want 16")
    name = f"deletion_vector_{_uuid.UUID(bytes=raw)}.bin"
    prefix = prefix.rstrip("/")
    return f"{prefix}/{name}" if prefix else name


def deleted_positions(descriptor: dict, table_dir: str) -> list[int]:
    """Resolve a ``deletionVector`` descriptor to its sorted deleted
    row indexes. Driver-side; bounded by the DV's cardinality."""
    import os

    storage = descriptor["storageType"]
    if storage == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])
        # inline payloads may be Z85-padded to a multiple of 4; trust
        # sizeInBytes for the true length
        data = data[: descriptor["sizeInBytes"]]
        positions = decode_bitmap(data)
    elif storage in ("u", "p"):
        if storage == "u":
            raw = descriptor["pathOrInlineDv"]
            # the uuid is the LAST 20 characters (16 bytes in Z85);
            # everything before is the optional random path prefix.
            # NEVER split on "/": it is a valid Z85 alphabet character
            # and can appear inside the encoded uuid itself.
            if len(raw) < 20:
                raise ValueError(
                    f"u-descriptor pathOrInlineDv too short: {raw!r}"
                )
            prefix, enc = raw[:-20], raw[-20:]
            path = os.path.join(table_dir, dv_file_name(enc, prefix))
        else:
            path = descriptor["pathOrInlineDv"]
        offset = descriptor.get("offset", 1)
        size = descriptor["sizeInBytes"]
        with open(path, "rb") as f:
            version = f.read(1)[0]
            if version != 1:
                raise ValueError(f"unsupported DV file format version {version}")
            f.seek(offset)
            (length,) = struct.unpack(">I", f.read(4))
            if length != size:
                raise ValueError(
                    f"DV length field {length} != descriptor sizeInBytes {size}"
                )
            data = f.read(size)
            (crc,) = struct.unpack(">I", f.read(4))
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"DV checksum mismatch in {path}")
        positions = decode_bitmap(data)
    else:
        raise ValueError(f"unknown DV storageType {storage!r}")
    card = descriptor.get("cardinality")
    if card is not None and card != len(positions):
        raise ValueError(
            f"DV cardinality {card} != decoded {len(positions)} positions"
        )
    return positions


def write_dv_file(path: str, bitmaps: list[list[int]]) -> list[dict]:
    """Write an on-disk DV file holding one serialized bitmap per entry
    and return partial ``u``/``p`` descriptor fields
    (offset/sizeInBytes/cardinality) per entry, in order. Test-fixture
    helper: this engine never writes DVs into its own log."""
    entries = []
    with open(path, "wb") as f:
        f.write(bytes([1]))  # format version
        for values in bitmaps:
            data = encode_bitmap(values)
            offset = f.tell()
            f.write(struct.pack(">I", len(data)))
            f.write(data)
            f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            entries.append(
                {
                    "offset": offset,
                    "sizeInBytes": len(data),
                    "cardinality": len(values),
                }
            )
    return entries
