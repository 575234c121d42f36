"""Deterministic cost model: chunk stats -> codec choice.

A pure function of (IntStats, value_kind) so that re-runs and resumed
jobs pick identical codecs regardless of partition count (SURVEY.md
§7.4 determinism requirement). Estimates are in bytes; ties break by
fixed codec priority so the choice is total-ordered.
"""

from __future__ import annotations

from tokencodec import codecs
from tokencodec.codecs import bitpack, rle
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
    return est


# fixed priority for ties: cheaper decode first
_PRIORITY = [codecs.CONSTANT, codecs.BITPACK, codecs.FOR, codecs.RLE,
             codecs.DELTA, codecs.DICT, codecs.PLAIN]


def choose_int_codec(st: IntStats, value_kind: int = 0) -> int:
    est = estimate_sizes(st, value_kind)
    best = min(est.values())
    for c in _PRIORITY:
        if c in est and est[c] <= best:
            return c
    return codecs.PLAIN
