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


def test_deflated_page_wrapper_roundtrip():
    """Round-5 second-order wrap: DEFLATED envelopes decode through
    every page decoder transparently, keep the inner header's
    kind/count/raw_size visible, refuse corruption, and are only
    applied when they actually win."""
    import zlib

    import numpy as np

    from tokencodec import codecs, pageformat

    # skewed ints: bitpack leaves distribution slack -> deflate wins
    rng = np.random.default_rng(5)
    v = rng.zipf(1.6, 20000).astype(np.int64) % 50021
    page = pageformat.encode_int_page(v, pageformat.KIND_INT32)
    wrapped = pageformat.maybe_deflate(page)
    h = pageformat.read_header(wrapped)
    assert h["codec"] == codecs.DEFLATED and len(wrapped) < len(page)
    assert h["n_values"] == len(v)
    assert h["raw_size"] == pageformat.read_header(page)["raw_size"]
    assert np.array_equal(pageformat.decode_int_page(wrapped), v)

    # incompressible page passes through unwrapped
    rnd = rng.integers(0, 1 << 31, 4096, dtype=np.int64)
    p2 = pageformat.encode_int_page(rnd, pageformat.KIND_INT32)
    assert pageformat.maybe_deflate(p2) is p2

    # string pages unwrap through decode_string_page
    words = [f"token-{i % 97:05d}" for i in range(5000)]
    data = "".join(words).encode()
    off = np.zeros(len(words) + 1, dtype=np.int64)
    np.cumsum([len(w) for w in words], out=off[1:])
    sp = pageformat.maybe_deflate(pageformat.encode_string_page(
        off, np.frombuffer(data, np.uint8)))
    assert pageformat.read_header(sp)["codec"] == codecs.DEFLATED
    o2, d2 = pageformat.decode_string_page(sp)
    assert np.array_equal(o2, off) and bytes(d2) == data

    # float pages unwrap through decode_float_page
    f = (rng.integers(0, 1000, 8192).astype(np.float32) / 128).astype(np.float32)
    fp = pageformat.maybe_deflate(pageformat.encode_float_page(f))
    assert np.array_equal(
        pageformat.decode_float_page(fp).view(np.uint32), f.view(np.uint32))

    # corruption inside the compressed payload is caught by the CRC
    bad = bytearray(wrapped)
    bad[pageformat.HEADER_SIZE + 7] ^= 0xFF
    try:
        pageformat.decode_int_page(bytes(bad))
        raise AssertionError("corrupt deflated page decoded")
    except ValueError as e:
        assert "crc" in str(e)

    # grouped pages wrapped at chunk assembly decode transparently
    from tokencodec import grouped
    lens = np.full(50, 400, dtype=np.int64)
    gv = np.concatenate([np.arange(400) + i * 7 for i in range(50)])
    gp = grouped.encode_tokens_column(gv, lens)
    gw = pageformat.maybe_deflate(gp)
    assert np.array_equal(grouped.decode_tokens_column(gw), gv)
