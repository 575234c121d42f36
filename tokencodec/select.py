"""Deterministic cost model: chunk stats -> codec choice.

A pure function of (IntStats, value_kind) so that re-runs and resumed
jobs pick identical codecs regardless of partition count (SURVEY.md
§7.4 determinism requirement). Estimates are in bytes; ties break by
fixed codec priority so the choice is total-ordered.
"""

from __future__ import annotations

from tokencodec import codecs
from tokencodec.codecs import basepack, bitpack, rle
from tokencodec.stats import IntStats

_HEADER = 32  # page envelope bytes (pageformat.HEADER_SIZE)
_PLAIN_WIDTH = {0: 4, 1: 8}


def estimate_sizes(st: IntStats, value_kind: int = 0) -> dict[int, float]:
    """Estimated payload bytes per eligible codec."""
    n = st.n
    w = _PLAIN_WIDTH[value_kind]
    est: dict[int, float] = {codecs.PLAIN: n * w}
    if n == 0:
        return est
    if st.vmin == st.vmax:
        est[codecs.CONSTANT] = 0
        return est

    if st.vmin >= 0:
        bw = bitpack.width_for(st.vmax)
        if bw <= 64:
            est[codecs.BITPACK] = bitpack.packed_nbytes(n, bw) + 2
            est[codecs.RLE] = rle.estimate_nbytes(n, st.n_runs, st.run_coverage, bw)

    for_bw = (st.vmax - st.vmin).bit_length()
    est[codecs.FOR] = bitpack.packed_nbytes(n, for_bw) + 2

    # delta payload = hybrid over zigzag diffs; runs in the diff stream
    # mirror runs in the value stream only for constant-step data, so be
    # conservative: assume pure bit-packing of diffs
    est[codecs.DELTA] = bitpack.packed_nbytes(n - 1, st.zz_delta_bits) + 4

    card = st.card_est
    if card <= max(n // 4, 1) and card <= (1 << 22):
        ibw = bitpack.width_for(max(card - 1, 0))
        dict_bytes = card * 3  # delta-encoded sorted uniques: ~3B/entry upper-ish bound
        idx_bytes = bitpack.packed_nbytes(n, ibw)
        penalty = 1.0 if st.card_exact else 1.15  # distrust sampled cardinality a bit
        est[codecs.DICT] = (dict_bytes + idx_bytes) * penalty + 16

    # base-R group packing: recovers the fractional bit FOR/bitpack
    # round up (exact payload size, so it wins only when the range is
    # genuinely off a power of two)
    R = st.vmax - st.vmin + 1
    k, _ = basepack.plan(R)
    if k >= 2:
        est[codecs.BASEPACK] = basepack.payload_nbytes(n, R)

    # split-stream RLE: per-run values + per-run lengths, each its own
    # recursively auto-selected page. Beats the inline hybrid when runs
    # dominate (values and lengths streams each pack near their own
    # entropy instead of paying interleaved headers). Only offered when
    # the run arrays were actually computed (n_runs * 4 <= n).
    if st.run_len_bits > 0 and st.n_runs >= 2:
        vk, _ = basepack.plan(R)
        v_per = (basepack.payload_nbytes(st.n_runs, R) * 8 / st.n_runs
                 if vk >= 2 else (R - 1).bit_length())
        est[codecs.SRLE] = (4 + 2 * _HEADER
                            + st.n_runs * v_per / 8
                            + st.n_runs * st.run_len_bits / 8)
    return est


# fixed priority for ties: cheaper decode first
_PRIORITY = [codecs.CONSTANT, codecs.BITPACK, codecs.FOR, codecs.RLE,
             codecs.SRLE, codecs.DELTA, codecs.BASEPACK, codecs.DICT,
             codecs.PLAIN]


def choose_int_codec(st: IntStats, value_kind: int = 0,
                     allow_srle: bool = True) -> int:
    est = estimate_sizes(st, value_kind)
    if not allow_srle:
        est.pop(codecs.SRLE, None)
    best = min(est.values())
    for c in _PRIORITY:
        if c in est and est[c] <= best:
            return c
    return codecs.PLAIN
