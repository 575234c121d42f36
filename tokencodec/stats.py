"""Per-chunk statistics driving codec auto-selection.

The reference *parses* per-chunk Statistics (min/max/null_count/
distinct_count, /root/reference/src/Parquet/Types/Primitives.hs:79-87)
and PageEncodingStats (/root/reference/src/Parquet/Types/ColumnChunk.hs:52-57)
but never consults them; per BASELINE.json north_star we make them
load-bearing: sampled cardinality / run-length / entropy / min-max feed
the deterministic cost model in select.py.

Exact O(n) vectorized stats (min, max, run count, max |delta|) are
computed on the full chunk; cardinality is estimated from a fixed
deterministic sample so the choice is a pure function of chunk content
(resume/determinism requirement, SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_SAMPLE = 8192


@dataclass(frozen=True)
class IntStats:
    n: int
    vmin: int
    vmax: int
    n_runs: int               # exact number of equal-value runs
    run_coverage: int         # values inside runs >= rle.MIN_RLE_RUN
    zz_delta_bits: int        # exact bit width of zigzag(diff) stream
    card_est: int             # estimated distinct count
    card_exact: bool
    entropy_bits: float       # sampled Shannon entropy of values (bits/value)
    run_len_bits: int = 0     # exact bit width of the longest run (0 =
                              # not computed: data is not run-shaped)


def int_stats(values: np.ndarray) -> IntStats:
    n = len(values)
    v = values.astype(np.int64, copy=False)
    if n == 0:
        return IntStats(0, 0, 0, 0, 0, 0, 0, True, 0.0)
    vmin = int(v.min())
    vmax = int(v.max())
    if vmin == vmax:
        return IntStats(n, vmin, vmax, 1, n, 0, 1, True, 0.0)

    neq = v[1:] != v[:-1]
    n_runs = int(neq.sum()) + 1
    # run coverage (values inside runs >= 8) matters only when runs are
    # plausible winners; for run-free data skip the O(n_runs) arrays
    if n_runs * 4 <= n:
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        lengths = np.diff(np.concatenate((starts, [n])))
        run_coverage = int(lengths[lengths >= 8].sum())
        run_len_bits = int(lengths.max()).bit_length()
    else:
        run_coverage = 0
        run_len_bits = 0

    # width of the zigzag(diff) stream from the diff's scalar min/max
    # alone (zigzag is monotone on each sign: max over the stream is
    # max(2*dmax, -2*dmin - 1)) — no zigzag array materialization, and
    # the Python-int arithmetic cannot overflow where an int64 negation
    # of INT64_MIN would
    d = np.diff(v)
    dmin, dmax = int(d.min()), int(d.max())
    zz_max = max(2 * dmax if dmax > 0 else 0,
                 -2 * dmin - 1 if dmin < 0 else 0)
    zz_delta_bits = zz_max.bit_length() if zz_max else 1

    if n <= _SAMPLE:
        sample = v
        exact = True
    else:
        # four contiguous stripes at fixed fractions — deterministic
        k = _SAMPLE // 4
        qs = [0, n // 3, (2 * n) // 3, n - k]
        sample = np.concatenate([v[q:q + k] for q in qs])
        exact = False
    # distinct/counts over the sample: O(sample + R) bincount when the
    # value range is small (token vocabularies are ~2^16) instead of
    # the sort inside np.unique — identical uniq/count results
    R = vmax - vmin + 1
    if R <= 2 * len(sample):
        bc = np.bincount((sample - vmin).astype(np.int64), minlength=R)
        cnt = bc[bc > 0]
    else:
        _, cnt = np.unique(sample, return_counts=True)
    d_s = len(cnt)
    s = len(sample)
    if exact:
        card = d_s
    elif d_s >= s // 2:
        card = n  # high-cardinality: assume ~all distinct
    else:
        # birthday-style correction is overkill; linear scale capped by value range
        card = min(int(d_s * (1 + np.log2(max(n / s, 1)))), vmax - vmin + 1, n)
    p = cnt / s
    entropy = float(-(p * np.log2(p)).sum())
    return IntStats(n, vmin, vmax, n_runs, run_coverage, zz_delta_bits,
                    max(card, d_s), exact, entropy, run_len_bits)
