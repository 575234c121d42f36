"""decode(encode(x)) == x bit-identical, every codec x every data
profile (SURVEY.md §5.3.2 / FIXTURES.md §F1a), seeded and deterministic."""

import numpy as np
import pytest

from tokencodec import codecs, pageformat
from tokencodec.codecs import bitpack, delta, dictionary, for_, fsst, rle

RNG = np.random.default_rng(42)

PROFILES = {
    "uniform": lambda n: RNG.integers(0, 50257, n),
    "lowcard": lambda n: RNG.integers(0, 200, n) * 251 % 50021,
    "runs": lambda n: np.repeat(RNG.integers(0, 1000, max(n // 12, 1) + 1),
                                RNG.geometric(1 / 12, max(n // 12, 1) + 1))[:n],
    "narrow": lambda n: RNG.integers(10000, 10000 + 128, n),
    "constant": lambda n: np.full(n, 777),
    "sorted": lambda n: np.sort(RNG.integers(0, 1 << 30, n)),
    "tiny_runs": lambda n: np.repeat(RNG.integers(0, 8, max(n // 3, 1) + 1), 3)[:n],
    "alternating": lambda n: np.tile([5, 9], (n + 1) // 2)[:n],
    "negatives": lambda n: RNG.integers(-(1 << 20), 1 << 20, n),
    "single": lambda n: np.array([123]),
    "empty": lambda n: np.array([], dtype=np.int64),
}

SIZES = [1, 7, 8, 9, 100, 4096, 10007]


@pytest.mark.parametrize("profile", PROFILES)
@pytest.mark.parametrize("n", [100, 10007])
def test_auto_page_roundtrip(profile, n):
    vals = PROFILES[profile](n).astype(np.int64)
    kind = (pageformat.KIND_INT64 if profile in ("sorted", "negatives")
            else pageformat.KIND_INT32)
    page = pageformat.encode_int_page(vals, kind)
    out = pageformat.decode_int_page(page)
    np.testing.assert_array_equal(out.astype(np.int64), vals)


@pytest.mark.parametrize("codec", [codecs.PLAIN, codecs.BITPACK, codecs.RLE,
                                   codecs.FOR, codecs.DELTA, codecs.DICT])
@pytest.mark.parametrize("profile", ["uniform", "lowcard", "runs", "narrow",
                                     "constant", "tiny_runs", "alternating"])
def test_forced_codec_roundtrip(codec, profile):
    vals = PROFILES[profile](5000).astype(np.int64)
    page = pageformat.encode_int_page(vals, pageformat.KIND_INT32, codec=codec)
    out = pageformat.decode_int_page(page)
    np.testing.assert_array_equal(out.astype(np.int64), vals)


@pytest.mark.parametrize("n", SIZES)
def test_hybrid_boundary_sizes(n):
    vals = (RNG.integers(0, 50, n) // 7 * 7).astype(np.uint64)  # mixed runs
    bw = 6
    buf = rle.encode(vals, bw)
    np.testing.assert_array_equal(rle.decode(buf, bw, n), vals)


@pytest.mark.parametrize("bw", [0, 1, 2, 3, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63])
def test_bitpack_widths(bw):
    n = 1000
    hi = (1 << bw) if bw < 63 else (1 << 62)
    vals = RNG.integers(0, max(hi, 1), n, dtype=np.uint64)
    out = bitpack.unpack_le(bitpack.pack_le(vals, bw), bw, n)
    np.testing.assert_array_equal(out, vals if bw else np.zeros(n, np.uint64))


def test_delta_monotone_and_negative_steps():
    vals = np.array([100, 50, 50, 51, -3, 1 << 40, 7], dtype=np.int64)
    payload, first, bw = delta.encode(vals)
    np.testing.assert_array_equal(delta.decode(payload, first, bw, len(vals)), vals)


def test_dictionary_string_like_ids():
    vals = RNG.integers(0, 64, 100000)
    payload, size = dictionary.encode(vals)
    assert size <= 64
    np.testing.assert_array_equal(dictionary.decode(payload, len(vals)), vals)


# ------------------------------------------------------------------ strings

def _str_col(strings):
    data = b"".join(strings)
    lens = np.array([len(s) for s in strings], dtype=np.int64)
    offsets = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    return offsets, data


@pytest.mark.parametrize("profile", ["lowcard", "doc_ids", "random", "empty_strings"])
def test_string_page_roundtrip(profile):
    if profile == "lowcard":
        strings = [RNG.choice(["web", "code", "books", "wiki", "chat"]).encode() for _ in range(2000)]
    elif profile == "doc_ids":
        strings = [f"doc-{i:012d}".encode() for i in range(3000)]
    elif profile == "random":
        strings = [RNG.bytes(int(RNG.integers(0, 20))) for _ in range(500)]
    else:
        strings = [b"", b"", b"x", b""]
    offsets, data = _str_col(strings)
    page = pageformat.encode_string_page(offsets, data)
    oo, dd = pageformat.decode_string_page(page)
    np.testing.assert_array_equal(oo, offsets)
    assert dd == data


def test_string_page_fsst_forced():
    strings = [f"http://example.com/page/{i % 50}".encode() for i in range(1000)]
    offsets, data = _str_col(strings)
    page = pageformat.encode_string_page(offsets, data, codec=codecs.FSST, _allow_dict=False)
    oo, dd = pageformat.decode_string_page(page)
    assert dd == data
    assert pageformat.read_header(page)["codec"] == codecs.FSST


def test_fsst_raw_roundtrip():
    data = (b"the quick brown fox " * 200) + bytes(range(256)) + b"\xff\xff\xff\xff"
    table = fsst.train(data)
    enc = fsst.encode(data, table)
    assert fsst.decode(enc[0:], len(data)) == data


def test_fsst_compresses_repetitive():
    data = b"doc-000000000" * 500
    table = fsst.train(data)
    enc = fsst.encode(data, table)
    assert len(enc) < len(data) * 0.5


def test_compression_beats_plain_per_profile():
    """Selector must never pick something bigger than PLAIN by much, and
    must win clearly on compressible profiles."""
    for profile, expect_ratio in [("lowcard", 0.5), ("runs", 0.5), ("narrow", 0.3),
                                  ("constant", 0.01), ("sorted", 0.7)]:
        vals = PROFILES[profile](50000).astype(np.int64)
        kind = pageformat.KIND_INT64 if profile == "sorted" else pageformat.KIND_INT32
        page = pageformat.encode_int_page(vals, kind)
        raw = len(vals) * (8 if kind else 4)
        assert len(page) <= raw * expect_ratio + 64, (profile, len(page), raw)


def test_edge_values_roundtrip(spark, tmp_path):
    """Full engine path on adversarial values: int32 extremes and
    negatives (zigzag/FOR/bitpack paths), unicode and empty strings,
    an empty doc_id, and duplicate rows (multiset semantics)."""
    from tokencodec.spark import decode_job, encode_job

    rows = [
        ("doc-ünïcode-0", [-1, -2147483648, 2147483647, 0], 4, "wëb"),
        ("doc-empty-src", [5, 5, 5], 3, ""),
        ("", [1], 1, "books"),
        ("doc-dup", [-7] * 100, 100, "code"),
        ("doc-dup", [-7] * 100, 100, "code"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    root = str(tmp_path / "edge")
    encode_job.encode(spark, df, root, commit_groups=1, n_salts=2)
    res = decode_job.audit(df, decode_job.decode(spark, root), strict=True)
    assert res == {"missing": 0, "extra": 0, "ok": True}
