"""ULEB128 varint encode/decode.

Semantics match the reference decoder/encoder pair
(/root/reference/src/Parquet/Decoder.hs:138-163): little-endian base-128,
continuation bit 0x80, byte limit 32 (`cLeb128ByteLimit`,
Decoder.hs:31-32). Used for page/run headers only (not a hot path).
"""

from __future__ import annotations

BYTE_LIMIT = 32  # mirrors cLeb128ByteLimit (Decoder.hs:31-32)


def encode(n: int) -> bytes:
    """ULEB128-encode a non-negative integer."""
    if n < 0:
        raise ValueError("varint must be non-negative")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode(buf: bytes | memoryview, pos: int = 0) -> tuple[int, int]:
    """Decode one ULEB128 value at ``pos``; returns (value, next_pos)."""
    result = 0
    shift = 0
    start = pos
    while True:
        if pos - start >= BYTE_LIMIT:
            raise ValueError("varint exceeds 32-byte limit")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
