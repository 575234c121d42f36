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
