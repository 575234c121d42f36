"""Float pages: bit-exact round-trip under ALP decimal packing,
byte-plane shuffle, and constant pages — flat and as nested leaves
(embedding columns are list<float32>). The reference's flat decoder
stops at INT32/INT64/BYTE_ARRAY (/root/reference/src/Parquet/Stream/
Reader.hs errors on other types); float coverage is engine-added for
the training-data table's embedding columns."""

import numpy as np
import pyarrow as pa
import pytest

from tokencodec import codecs, nested, pageformat


def _bits(a):
    return a.view(np.uint32 if a.dtype == np.float32 else np.uint64)


def _roundtrip_bitexact(v, expect_codec=None):
    page = pageformat.encode_float_page(v)
    h = pageformat.read_header(page)
    if expect_codec is not None:
        assert h["codec"] == expect_codec, codecs.CODEC_NAMES[h["codec"]]
    out = pageformat.decode_float_page(page)
    assert out.dtype == v.dtype
    assert np.array_equal(_bits(out), _bits(v))
    return page, h


def test_constant_page_f32_and_f64():
    for dt in (np.float32, np.float64):
        v = np.full(100, -3.25, dtype=dt)
        page, h = _roundtrip_bitexact(v, codecs.CONSTANT)
        assert h["payload_len"] == 0  # header-only


def test_alp_decimal_pages():
    rng = np.random.default_rng(7)
    # 3-decimal quantized f32 (the quantized-embedding shape)
    v32 = (rng.integers(-50_000, 50_000, 5000) / 1000.0).astype(np.float32)
    _, h = _roundtrip_bitexact(v32, codecs.ALP)
    assert h["ref"] == 3  # smallest exponent found
    # 2-decimal f64 telemetry
    v64 = rng.integers(0, 10_000, 5000) / 100.0
    _, h = _roundtrip_bitexact(v64, codecs.ALP)
    assert h["ref"] == 2
    # integers stored as floats: exponent 0
    _, h = _roundtrip_bitexact(rng.integers(0, 1000, 500).astype(np.float64),
                               codecs.ALP)
    assert h["ref"] == 0


def test_alp_is_smaller_than_shuffle_on_quantized_data():
    rng = np.random.default_rng(8)
    v = (rng.integers(-1000, 1000, 10_000) / 100.0).astype(np.float32)
    alp = pageformat.encode_float_page(v)
    shuf = pageformat.encode_float_page(v, codec=codecs.FPSHUF)
    assert pageformat.read_header(alp)["codec"] == codecs.ALP
    assert len(alp) < len(shuf)


def test_shuffle_handles_full_float_space():
    rng = np.random.default_rng(9)
    # raw bit patterns: every NaN payload, denormals, infs, -0.0
    for dt, bt in ((np.float32, np.uint32), (np.float64, np.uint64)):
        v = rng.integers(0, np.iinfo(bt).max, 4097, dtype=bt).view(dt)
        v = np.concatenate([v, np.array(
            [0.0, -0.0, np.inf, -np.inf, np.nan], dtype=dt)])
        page, _ = _roundtrip_bitexact(v, codecs.FPSHUF)
    # random normals also shuffle (not ALP-representable)
    v = rng.standard_normal(1000).astype(np.float32)
    _roundtrip_bitexact(v, codecs.FPSHUF)


def test_forced_codecs_and_errors():
    v = np.array([1.5, 2.5, 3.5], dtype=np.float32)
    for c in (codecs.PLAIN, codecs.FPSHUF, codecs.ALP):
        page = pageformat.encode_float_page(v, codec=c)
        out = pageformat.decode_float_page(page)
        assert np.array_equal(_bits(out), _bits(v))
    with pytest.raises(ValueError, match="ALP"):
        pageformat.encode_float_page(
            np.array([np.nan, 1.0], dtype=np.float32), codec=codecs.ALP)
    # corrupt payload byte -> crc
    page = bytearray(pageformat.encode_float_page(
        np.arange(64, dtype=np.float64) + 0.5))
    page[-1] ^= 0xFF
    with pytest.raises(ValueError, match="crc"):
        pageformat.decode_float_page(bytes(page))


def test_empty_and_single():
    for dt in (np.float32, np.float64):
        for v in (np.zeros(0, dt), np.array([np.pi], dtype=dt)):
            _roundtrip_bitexact(v)


def test_mixed_scale_page_falls_back_cleanly():
    """A page whose sample suggests an exponent the full page rejects
    must fall back to shuffle, still bit-exact."""
    v = np.concatenate([np.full(200, 0.5, np.float32),
                        np.array([1 / 3], dtype=np.float32),
                        np.full(200, 0.25, np.float32)])
    _roundtrip_bitexact(v)  # codec is whatever survived; bits must match


def test_nested_float_leaves_roundtrip():
    rng = np.random.default_rng(11)
    emb = pa.array([rng.standard_normal(8).astype(np.float32).tolist(),
                    None,
                    [],
                    rng.standard_normal(3).astype(np.float32).tolist()],
                   type=pa.list_(pa.float32()))
    page = nested.encode_nested_page(emb)
    out = nested.decode_nested_page(page)
    assert out.type == emb.type
    assert out.equals(emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb)
    # f64 leaf inside a struct, with a null value
    arr = pa.array([{"x": 1.25, "w": [0.1, 0.2]},
                    {"x": None, "w": None}],
                   type=pa.struct([("x", pa.float64()),
                                   ("w", pa.large_list(pa.float64()))]))
    out2 = nested.decode_nested_page(nested.encode_nested_page(arr))
    assert out2.equals(arr)


@pytest.mark.parametrize("seed", range(5))
def test_float_property_sweep(seed):
    """Random mixtures: quantized, normal, special values, random bits —
    every page decodes bit-identically whatever codec was selected."""
    rng = np.random.default_rng(seed)
    for dt, bt in ((np.float32, np.uint32), (np.float64, np.uint64)):
        pick = rng.integers(0, 4)
        n = int(rng.integers(1, 3000))
        if pick == 0:
            v = (rng.integers(-10**6, 10**6, n) / 10.0 ** rng.integers(0, 5)).astype(dt)
        elif pick == 1:
            v = rng.standard_normal(n).astype(dt)
        elif pick == 2:
            v = rng.integers(0, np.iinfo(bt).max, n, dtype=bt).view(dt)
        else:
            v = np.full(n, rng.standard_normal(), dtype=dt)
        _roundtrip_bitexact(v)


# ------------------------------------------------------- hypothesis sweeps

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(width=32, allow_nan=True, allow_infinity=True),
                min_size=0, max_size=300))
def test_hypothesis_float32_page_roundtrip(xs):
    v = np.array(xs, dtype=np.float32)
    out = pageformat.decode_float_page(pageformat.encode_float_page(v))
    assert out.dtype == v.dtype
    assert np.array_equal(_bits(out), _bits(v))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True),
                min_size=0, max_size=300))
def test_hypothesis_float64_page_roundtrip(xs):
    v = np.array(xs, dtype=np.float64)
    out = pageformat.decode_float_page(pageformat.encode_float_page(v))
    assert out.dtype == v.dtype
    assert np.array_equal(_bits(out), _bits(v))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=300),
       st.integers(0, 4))
def test_hypothesis_decimal_floats_alp_or_exact(ints, e):
    """Decimal-quantized values: whatever codec wins, bits round-trip;
    when the whole page is exactly representable the selector should
    find ALP (it may legitimately fall back when float64 division makes
    a value inexact)."""
    v = (np.array(ints, dtype=np.float64) / (10.0 ** e)).astype(np.float32)
    page = pageformat.encode_float_page(v)
    out = pageformat.decode_float_page(page)
    assert np.array_equal(_bits(out), _bits(v))
