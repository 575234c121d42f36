"""Grouped token-column codec: per-doc class grouping + DELTA_DOC."""

import numpy as np
import pytest

from tokencodec import grouped, pageformat
from tokencodec.spark import synth


def _mixed_chunk(n_docs=600, seed=42):
    ids = np.arange(n_docs)
    lengths = synth._row_lengths(seed, ids)
    profiles = synth._row_profile(seed, ids)
    values, offsets = synth._gen_tokens(seed, ids, lengths, profiles)
    return values.astype(np.int64), lengths


def test_grouped_roundtrip_mixed():
    values, lens = _mixed_chunk()
    page = grouped.encode_tokens_column(values, lens)
    assert pageformat.read_header(page)["codec"] == pageformat.GROUPED_CODEC
    np.testing.assert_array_equal(grouped.decode_tokens_column(page), values)


def test_grouped_beats_single_on_mixed():
    values, lens = _mixed_chunk()
    single = pageformat.encode_int_page(values, pageformat.KIND_INT32)
    page = grouped.encode_tokens_column(values, lens)
    assert len(page) < 0.75 * len(single), (len(page), len(single))


def test_grouped_falls_back_when_homogeneous():
    # all-constant docs -> one class -> plain page, no grouping overhead
    lens = np.full(50, 100, dtype=np.int64)
    values = np.repeat(np.arange(50) % 3, 100).astype(np.int64)
    page = grouped.encode_tokens_column(values, lens)
    assert pageformat.read_header(page)["codec"] != pageformat.GROUPED_CODEC
    np.testing.assert_array_equal(pageformat.decode_int_page(page), values)


def test_grouped_few_docs_fallback():
    values = np.arange(100, dtype=np.int64)
    page = grouped.encode_tokens_column(values, np.array([50, 50]))
    np.testing.assert_array_equal(pageformat.decode_int_page(page), values)


def test_delta_doc_restarts_at_boundaries():
    # two sorted docs; cross-doc jump must not inflate the diff width
    a = np.arange(0, 5000, 3, dtype=np.int64)
    b = np.arange(7, 2000, 2, dtype=np.int64)
    values = np.concatenate([a, b])
    lens = np.array([len(a), len(b)], dtype=np.int64)
    sub = grouped.encode_delta_doc(values, lens)
    np.testing.assert_array_equal(grouped.decode_delta_doc(sub, lens), values)
    assert len(sub) < len(values)  # < 1 byte/value


def test_delta_doc_single_and_empty_docs():
    values = np.array([5, 6, 7, 100], dtype=np.int64)
    lens = np.array([3, 0, 1], dtype=np.int64)
    sub = grouped.encode_delta_doc(values, lens)
    np.testing.assert_array_equal(grouped.decode_delta_doc(sub, lens), values)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_grouped_property_sweep(seed):
    values, lens = _mixed_chunk(n_docs=200, seed=seed)
    page = grouped.encode_tokens_column(values, lens)
    np.testing.assert_array_equal(grouped.decode_tokens_column(page), values)


def test_decode_int_page_delegates_grouped():
    values, lens = _mixed_chunk(n_docs=300)
    page = grouped.encode_tokens_column(values, lens)
    np.testing.assert_array_equal(pageformat.decode_int_page(page).astype(np.int64), values)


def test_doc_stats_brute_force():
    """_doc_stats (reduceat formulation) vs per-doc brute force across
    random shapes incl. empty docs and monotone stretches."""
    rng = np.random.default_rng(123)
    for trial in range(200):
        n_docs = int(rng.integers(1, 40))
        lens = rng.integers(0, 30, n_docs).astype(np.int64)
        if trial % 5 == 0:
            lens[rng.integers(0, n_docs)] = 0
        vals = rng.integers(-5, 50, int(lens.sum())).astype(np.int64)
        if trial % 7 == 0:
            vals = np.sort(vals)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        glens, gmin, gmax, gchanges, gnondecr, _, _ = grouped._doc_stats(vals, offsets)
        for i in range(n_docs):
            d = vals[offsets[i]:offsets[i + 1]]
            assert glens[i] == len(d)
            if len(d):
                assert gmin[i] == d.min() and gmax[i] == d.max()
                assert gchanges[i] == int(np.count_nonzero(d[1:] != d[:-1]))
                assert gnondecr[i] == bool(np.all(d[1:] >= d[:-1]))
            else:
                assert gchanges[i] == 0 and gnondecr[i]


def test_int32_page_rejects_out_of_range():
    """INT32 pages must fail fast on out-of-range input instead of
    silently truncating (PLAIN stores raw 4-byte values)."""
    for bad in ([2 ** 40, 1, 5], [-(2 ** 35), 0, 7], [2 ** 31], [-(2 ** 31) - 1]):
        with pytest.raises(ValueError, match="INT32"):
            pageformat.encode_int_page(np.array(bad, dtype=np.int64),
                                       pageformat.KIND_INT32)
    # boundary values are fine
    edge = np.array([-(2 ** 31), 2 ** 31 - 1, 0], dtype=np.int64)
    p = pageformat.encode_int_page(edge, pageformat.KIND_INT32)
    assert np.array_equal(pageformat.decode_int_page(p).astype(np.int64), edge)
    # and the grouped tokens codec inherits the guard
    with pytest.raises(ValueError, match="INT32"):
        grouped.encode_tokens_column(
            np.tile(np.array([2 ** 40, 2 ** 40 + 1, 5], dtype=np.int64), 40),
            np.full(40, 3, dtype=np.int64))
