"""Byte-level golden tests ported from the reference decoder suite
(/root/reference/tests/unit/Parquet/Decoder/Spec.hs:15-68, via
FIXTURES.md §F3). These pin our numpy codecs to the exact byte
semantics of parquet-hs's decoders."""

import numpy as np
import pytest

from tokencodec.codecs import bitpack, rle, varint


def test_bple_golden():
    # Spec.hs:17-19 — [136,198,250] @ bw=3 -> [0..7]
    out = bitpack.unpack_le(bytes([136, 198, 250]), 3, 8)
    assert out.tolist() == [0, 1, 2, 3, 4, 5, 6, 7]


def test_bple_roundtrip_golden():
    packed = bitpack.pack_le(np.arange(8, dtype=np.uint64), 3)
    assert packed == bytes([136, 198, 250])


def test_bple_padding_golden():
    # Spec.hs:21-34 — 5 logical values still consume a full 8-group;
    # pad zeros are kept by the raw group decode, truncation is the
    # caller's job (our unpack_le takes n_values and truncates).
    buf = bytes([0x88, 0x46, 0x00])
    assert bitpack.unpack_le(buf, 3, 8).tolist() == [0, 1, 2, 3, 4, 0, 0, 0]
    assert bitpack.unpack_le(buf, 3, 5).tolist() == [0, 1, 2, 3, 4]


def test_bpbe_golden():
    # Spec.hs:36-40 — varint(3) ++ [5,57,119] @ bw=3 -> [0..7]
    # decodeBPBE header semantics: run_len = header >> 1 (Decoder.hs:59)
    buf = varint.encode(1 << 1) + bytes([5, 57, 119])
    out, leftover = bitpack.decode_be(buf, 3)
    assert out.tolist() == [0, 1, 2, 3, 4, 5, 6, 7]
    assert leftover == b""


def test_rle_run_golden():
    # Spec.hs:42-44 — bw=3, run_len=4 over [1,2,3,4,5] -> [1,1,1,1], leftovers
    # via the hybrid framing: header = run_len<<1 (LSB 0), 1 value byte
    buf = varint.encode(4 << 1) + bytes([1, 2, 3, 4, 5])
    out = rle.decode(buf, 3, 4)
    assert out.tolist() == [1, 1, 1, 1]


def test_take_bytes_le_golden():
    # Spec.hs:46-52 — [136,198,250] as 3-byte LE int = 16434824
    assert int.from_bytes(bytes([136, 198, 250]), "little") == 16434824


def test_uleb128_golden():
    # Spec.hs:54-68 — 624485 <-> [0xE5, 0x8E, 0x26]
    assert varint.encode(624485) == bytes([0xE5, 0x8E, 0x26])
    val, pos = varint.decode(bytes([0xE5, 0x8E, 0x26, 0xFF]), 0)
    assert (val, pos) == (624485, 3)


def test_uleb128_byte_limit():
    with pytest.raises(ValueError):
        varint.decode(b"\x80" * 33, 0)


def test_hybrid_mixed_stream():
    # hand-built hybrid stream: RLE run of 9 sevens, then 1 bp group [0..7]
    buf = (varint.encode(9 << 1) + bytes([7])
           + varint.encode((1 << 1) | 1) + bytes([136, 198, 250]))
    out = rle.decode(buf, 3, 17)
    assert out.tolist() == [7] * 9 + [0, 1, 2, 3, 4, 5, 6, 7]
