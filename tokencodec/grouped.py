"""Grouped token-column codec: per-document class assignment + one
auto-selected sub-page per class.

Why: a chunk holds many documents with heterogeneous token
distributions (code vs prose vs tables; in FIXTURES.md terms the F1a
profiles). A single codec per chunk is forced to the worst-case bit
width — e.g. one monotone document with values up to 2^20 drags an
otherwise 16-bit-packable chunk to 21 bits. Grouping documents by a
cheap vectorized signature and encoding each group with its own
auto-selected page recovers per-profile-optimal sizes while keeping
pages big enough to amortize headers.

All per-doc statistics are computed with reduceat/cumsum tricks — no
per-row Python (BASELINE.json input_hint).

Page layout (codec id GROUPED, kind INT32) — self-contained:
    u32 ids_len   | ids page   (group id per document, int page)
    u32 lens_len  | lens page  (n_tok per document, int page)
    u16 n_groups
    per group: u8 model (0 = plain int page, 1 = delta_doc,
               2 = linear_doc, 3 = zlib-deflated delta_doc)
               | u32 sub_len | sub page

DELTA_DOC sub pages restart the delta chain at every document boundary
(doc-first values in their own small page) so cross-document jumps
never inflate the diff bit width:
    u32 firsts_len | firsts page (int page) | u8 bw | hybrid(zigzag in-doc diffs)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from tokencodec import pageformat
from tokencodec.codecs import delta as delta_codec
from tokencodec.codecs import rle

MIN_DOCS_FOR_GROUPING = 4

# second-order gain gate for sub-pages: the zlib trial is already paid
# inside the grouped encode, so any >=2% win is kept (the page-level
# 0.95 gate exists to avoid decode-side inflates for trivial wins; a
# 2-3.5% win on a 16%-of-bytes dict class is not trivial)
_SUB_GAIN = 0.98

# class keys (sorted tuples -> deterministic group ids)
_CLS_RUNS = (0, 0)
_CLS_DELTA = (1, 0)
_CLS_LOWCARD = (2, 0)


def _doc_stats(values: np.ndarray, offsets: np.ndarray):
    """Vectorized per-document stats. offsets: int64[n_docs+1]."""
    starts = offsets[:-1]
    ends = offsets[1:]
    lens = ends - starts
    nz = lens > 0
    dmax = np.zeros(len(lens), dtype=np.int64)
    dmin = np.zeros(len(lens), dtype=np.int64)
    if nz.any():
        dmax[nz] = np.maximum.reduceat(values, starts[nz])
        dmin[nz] = np.minimum.reduceat(values, starts[nz])
    # changes + sortedness inside each doc: pairwise flags summed per
    # doc with add.reduceat — no full-length cumsum materialization
    # (int32 accumulators: chunk sizes are budget-bounded << 2^31).
    # Flags at doc-start positions are zeroed so cross-doc pairs never
    # count; empty docs share their start with the next doc, so the
    # nonempty-doc segments [start_i, start_{i+1}) tile values exactly.
    if len(values) > 1:
        n = len(values)
        neq = np.zeros(n, dtype=np.int32)
        le = np.zeros(n, dtype=np.int32)
        neq[1:] = values[1:] != values[:-1]
        le[1:] = values[1:] >= values[:-1]
        inb = starts[nz]  # starts of nonempty docs, all < n
        neq[inb] = 0
        le[inb] = 0
        changes = np.zeros(len(lens), dtype=np.int64)
        changes[nz] = np.add.reduceat(neq, inb)
        nondecr = np.ones(len(lens), dtype=bool)
        nondecr[nz] = np.add.reduceat(le, inb) == (lens[nz] - 1)
    else:
        changes = np.zeros(len(lens), dtype=np.int64)
        nondecr = np.ones(len(lens), dtype=bool)
    # distinct among first <=64 tokens: windowed sort (cardinality
    # proxy; 64 draws separate a ~200-symbol vocabulary (E[distinct]
    # ~55) from a large one (E ~64))
    k = 64
    # sort a 32-bit window when every value fits (tokens are int32 by
    # contract): same comparisons, same card, half the sort traffic
    small = (not nz.any()) or (dmin[nz].min() >= -(1 << 31)
                               and dmax[nz].max() < (1 << 31))
    win = np.full((len(lens), k), -1, dtype=np.int32 if small else np.int64)
    take = np.minimum(lens, k)
    prefix = np.concatenate(([0], np.cumsum(take)[:-1]))
    intra = np.arange(int(take.sum())) - np.repeat(prefix, take)
    flat_idx = np.repeat(starts, take) + intra
    rows = np.repeat(np.arange(len(lens)), take)
    win[rows, intra] = values[flat_idx]
    sw = np.sort(win, axis=1)
    card = (sw[:, 1:] != sw[:, :-1]).sum(axis=1) + 1 - (take < k)  # approx
    return lens, dmin, dmax, changes, nondecr, np.maximum(card, 1), take


def _doc_classes(values: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, int, int]:
    """-> (int64[n_docs] group key encoded as cls*64 + param,
    global vmin, global vmax) — the min/max ride along so the caller
    never needs another full-column pass for size bounds."""
    lens, dmin, dmax, changes, nondecr, card, take = _doc_stats(values, offsets)
    range_bits = np.zeros(len(lens), dtype=np.int64)
    rng = dmax - dmin
    m = rng > 0
    range_bits[m] = np.floor(np.log2(rng[m])).astype(np.int64) + 1

    keys = 3 * 64 + range_bits  # default: range class (FOR/bitpack)
    # small-vocabulary docs: clearly fewer distincts in the sample
    # window than a large vocabulary would produce; sub-keyed by range
    # so narrow-range and wide-range vocabularies don't share one dict
    lc = (card.astype(np.float64) <= 0.9 * take) & (take >= 32)
    keys[lc] = _CLS_LOWCARD[0] * 64 + range_bits[lc]
    keys[nondecr & (lens >= 16) & (changes > 0)] = _CLS_DELTA[0] * 64
    # runs class sub-keyed by per-doc range width: constant docs
    # (range 0, values anywhere in the vocab) must not share a group
    # with bounded-run docs, or the shared run-values stream pays the
    # vocab-wide width for every narrow run value
    rmask = (changes * 3 < np.maximum(lens - 1, 1)) | (changes == 0)
    keys[rmask] = _CLS_RUNS[0] * 64 + range_bits[rmask]
    nz = lens > 0
    vmin = int(dmin[nz].min()) if nz.any() else 0
    vmax = int(dmax[nz].max()) if nz.any() else 0
    return keys, vmin, vmax


def _gather_positions(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    total = int(lens.sum())
    prefix = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return np.repeat(starts - prefix, lens) + np.arange(total, dtype=np.int64)


def encode_delta_doc(values: np.ndarray, doc_lengths: np.ndarray) -> bytes:
    offsets = np.concatenate(([0], np.cumsum(doc_lengths)))
    starts = offsets[:-1][doc_lengths > 0]
    firsts = values[starts]
    t = np.diff(values, prepend=np.int64(0))
    t[starts] = 0  # doc firsts carried separately
    zz = delta_codec.zigzag(t)
    bw = int(zz.max(initial=0)).bit_length()
    firsts_page = pageformat.encode_int_page(firsts, pageformat.KIND_INT32)
    body = rle.encode(zz, bw)
    return struct.pack("<I", len(firsts_page)) + firsts_page + bytes([bw]) + body


def decode_delta_doc(buf: bytes | memoryview, doc_lengths: np.ndarray) -> np.ndarray:
    mv = memoryview(buf)
    (flen,) = struct.unpack_from("<I", mv, 0)
    firsts = pageformat.decode_int_page(mv[4:4 + flen]).astype(np.int64)
    bw = mv[4 + flen]
    n = int(doc_lengths.sum())
    zz = rle.decode(mv[5 + flen:], bw, n)
    t = delta_codec.unzigzag(zz)
    offsets = np.concatenate(([0], np.cumsum(doc_lengths)))
    starts = offsets[:-1][doc_lengths > 0]
    t[starts] = firsts
    # segmented cumsum: cumsum(t) minus the prefix accumulated before
    # each document's start — every doc restarts at its own first value
    c = np.cumsum(t)
    seg = np.zeros(len(t), dtype=np.int64)
    seg[starts] = 1
    grp = np.cumsum(seg) - 1
    base = np.concatenate(([0], c))[starts]  # c[start-1], 0 for start==0
    return c - base[grp]


def encode_linear_doc(values: np.ndarray, doc_lengths: np.ndarray) -> bytes:
    """Per-doc linear model (intercept + integer slope) + residual page.

    Monotone documents are often near-linear (positions, offsets,
    timestamps): the in-doc diffs hover around one step, so storing
    (first, step) per doc and a low-range residual stream beats
    delta-of-diffs, whose zigzag stream still pays the step's bit width
    on every value. Slope = round((last - first) / (len - 1)) — exact
    for constant-step data, and residuals stay small for anything
    near-linear. (Model-based columnar coding per ModelarDB/plaintext
    LINEAR literature; selection between this and delta_doc is an
    exact-size trial in encode_tokens_column.)

    Layout: u32 firsts_len | firsts page | u32 steps_len | steps page
            | residual int64 page (all values, doc-major order)
    """
    offsets = np.concatenate(([0], np.cumsum(doc_lengths)))
    nz = doc_lengths > 0
    starts = offsets[:-1][nz]
    lens = doc_lengths[nz]
    firsts = values[starts]
    lasts = values[starts + lens - 1]
    steps = np.rint((lasts - firsts) / np.maximum(lens - 1, 1)).astype(np.int64)
    pos = np.arange(len(values), dtype=np.int64) - np.repeat(starts, lens)
    pred = np.repeat(firsts, lens) + pos * np.repeat(steps, lens)
    resid = values - pred
    # fold the per-doc residual minimum into the intercept (decode needs
    # no extra page: v = (first+min) + t*step + (r-min)): every doc's
    # residual stream becomes zero-based, so the GLOBAL residual range
    # is the max per-doc jitter range (e.g. 3) instead of the union of
    # per-doc offsets (e.g. 5) — basepack then packs residuals at
    # ~log2(jitter range) bits/value, the per-symbol entropy floor
    if len(lens):
        seg = np.concatenate(([0], np.cumsum(lens)[:-1]))
        mins = np.minimum.reduceat(resid, seg)
    else:
        mins = np.zeros(0, dtype=np.int64)
    resid = resid - np.repeat(mins, lens)
    firsts_page = pageformat.maybe_deflate(
        pageformat.encode_int_page(firsts + mins, pageformat.KIND_INT64),
        gain=_SUB_GAIN)
    steps_page = pageformat.maybe_deflate(
        pageformat.encode_int_page(steps, pageformat.KIND_INT64), gain=_SUB_GAIN)
    resid_page = pageformat.maybe_deflate(
        pageformat.encode_int_page(resid, pageformat.KIND_INT64), gain=_SUB_GAIN)
    return b"".join([struct.pack("<I", len(firsts_page)), firsts_page,
                     struct.pack("<I", len(steps_page)), steps_page,
                     resid_page])


def decode_linear_doc(buf: bytes | memoryview, doc_lengths: np.ndarray) -> np.ndarray:
    mv = memoryview(buf)
    (flen,) = struct.unpack_from("<I", mv, 0)
    firsts = pageformat.decode_int_page(mv[4:4 + flen]).astype(np.int64)
    p = 4 + flen
    (slen,) = struct.unpack_from("<I", mv, p)
    steps = pageformat.decode_int_page(mv[p + 4:p + 4 + slen]).astype(np.int64)
    resid = pageformat.decode_int_page(mv[p + 4 + slen:]).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(doc_lengths)))
    nz = doc_lengths > 0
    starts = offsets[:-1][nz]
    lens = doc_lengths[nz]
    pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
    return np.repeat(firsts, lens) + pos * np.repeat(steps, lens) + resid


def encode_tokens_column(values: np.ndarray, doc_lengths: np.ndarray) -> bytes:
    """Auto: single page when homogeneous, grouped page when mixed."""
    values = values.astype(np.int64, copy=False)
    n_docs = len(doc_lengths)
    if n_docs < MIN_DOCS_FOR_GROUPING:
        return pageformat.encode_int_page(values, pageformat.KIND_INT32)
    offsets = np.concatenate(([0], np.cumsum(doc_lengths.astype(np.int64))))
    keys, vmin, vmax = _doc_classes(values, offsets)
    uniq = np.unique(keys)
    if len(uniq) == 1 and uniq[0] != _CLS_DELTA[0] * 64:
        return pageformat.encode_int_page(values, pageformat.KIND_INT32)

    gids = np.searchsorted(uniq, keys)
    ids_page = pageformat.encode_int_page(gids, pageformat.KIND_INT32)
    lens_page = pageformat.encode_int_page(doc_lengths.astype(np.int64), pageformat.KIND_INT32)
    parts = [struct.pack("<I", len(ids_page)), ids_page,
             struct.pack("<I", len(lens_page)), lens_page,
             struct.pack("<H", len(uniq))]
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    for g, key in enumerate(uniq):
        d = np.flatnonzero(gids == g)
        pos = _gather_positions(starts[d], lens[d])
        sub_vals = values[pos]
        if key == _CLS_DELTA[0] * 64:
            # exact-size trial between the two monotone models (both
            # O(group) encodes; deterministic — function of content).
            # delta_doc's rle body has no page envelope, so its
            # second-order wrap is the model-3 flag (zlib over the
            # whole sub) rather than the transparent page wrap.
            sub = encode_delta_doc(sub_vals, lens[d])
            is_dd = 1
            if pageformat.deflate_enabled() and len(sub) >= 128:
                z = zlib.compress(sub, pageformat.DEFLATE_LEVEL)
                if len(z) <= _SUB_GAIN * len(sub):
                    sub, is_dd = z, 3
            sub_lin = encode_linear_doc(sub_vals, lens[d])
            if len(sub_lin) < len(sub):
                sub, is_dd = sub_lin, 2
        else:
            # per-sub-page second-order wrap: each class pays/skips the
            # inflate on its own merits (a whole-grouped-page wrap is
            # all-or-nothing and goes dark once the incompressible
            # basepack class dominates the page). BASEPACK subs skip
            # the trial: a class group is distribution-homogeneous by
            # construction, so its fractional-bit packing leaves no
            # byte-level skew for zlib (measured ratios 0.99-1.00) —
            # unlike MIXED single-page basepack, which maybe_deflate
            # still trials at the chunk level.
            sub = pageformat.encode_int_page(sub_vals, pageformat.KIND_INT32)
            if pageformat.read_header(sub)["codec"] != pageformat.codecs.BASEPACK:
                sub = pageformat.maybe_deflate(sub, gain=_SUB_GAIN)
            is_dd = 0
        parts.append(bytes([is_dd]))
        parts.append(struct.pack("<I", len(sub)))
        parts.append(sub)
    payload = b"".join(parts)
    # cheap single-page bound first (bitpack of the global range,
    # min/max already known from _doc_classes): the full stats-model
    # estimate — another O(n) pass — runs only when grouping isn't an
    # obvious win. The bound ignores single-page RLE/delta/dict wins,
    # but globally run-/delta-/dict-shaped chunks classify into a single
    # doc class and take the uniq==1 early return above, so the shortcut
    # only fires on genuinely mixed chunks (measured: identical output
    # bytes on the bench corpus, 1.4x faster)
    bits = max(int(vmax - vmin).bit_length(), 1)
    bitpack_bound = pageformat.HEADER_SIZE + (len(values) * bits + 7) // 8
    if len(payload) + pageformat.HEADER_SIZE < 0.9 * bitpack_bound:
        # the bitpack bound ignores single-page dict wins: a mixed chunk
        # (several doc classes) whose GLOBAL stream has low cardinality
        # could still be smaller as one dict page. Guard with a strided
        # 4k-value sample — only commit to grouped without the full
        # estimate when the sample looks high-cardinality (dict
        # implausible). Residual caveat: a strided sample cannot see
        # run structure, so a globally RLE-shaped mixed chunk may still
        # take a (correct but larger) grouped encoding.
        sample = values[::max(1, len(values) // 4096)]
        if len(np.unique(sample)) > len(sample) // 4:
            return pageformat.wrap_grouped(payload, len(values))
    single_est = pageformat.HEADER_SIZE + _single_page_estimate(values)
    if len(payload) + pageformat.HEADER_SIZE >= single_est:
        return pageformat.encode_int_page(values, pageformat.KIND_INT32)
    return pageformat.wrap_grouped(payload, len(values))


def _single_page_estimate(values: np.ndarray) -> float:
    from tokencodec import select, stats
    st = stats.int_stats(values)
    return min(select.estimate_sizes(st, pageformat.KIND_INT32).values())


def decode_tokens_column(buf: bytes | memoryview) -> np.ndarray:
    """Decode either a plain int page or a grouped page to flat values."""
    h = pageformat.read_header(buf)
    if h["codec"] != pageformat.GROUPED_CODEC:
        return pageformat.decode_int_page(buf).astype(np.int64)
    mv = memoryview(buf)[pageformat.HEADER_SIZE:]
    (ids_len,) = struct.unpack_from("<I", mv, 0)
    gids = pageformat.decode_int_page(mv[4:4 + ids_len]).astype(np.int64)
    p = 4 + ids_len
    (lens_len,) = struct.unpack_from("<I", mv, p)
    doc_lens = pageformat.decode_int_page(mv[p + 4:p + 4 + lens_len]).astype(np.int64)
    p += 4 + lens_len
    (n_groups,) = struct.unpack_from("<H", mv, p)
    p += 2
    offsets = np.concatenate(([0], np.cumsum(doc_lens)))
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    out = np.empty(int(doc_lens.sum()), dtype=np.int64)
    for g in range(n_groups):
        is_dd = mv[p]
        (sub_len,) = struct.unpack_from("<I", mv, p + 1)
        sub = mv[p + 5:p + 5 + sub_len]
        p += 5 + sub_len
        d = np.flatnonzero(gids == g)
        if is_dd == 1:
            vals = decode_delta_doc(sub, lens[d])
        elif is_dd == 2:
            vals = decode_linear_doc(sub, lens[d])
        elif is_dd == 3:
            vals = decode_delta_doc(zlib.decompress(sub), lens[d])
        else:
            vals = pageformat.decode_int_page(sub).astype(np.int64)
        pos = _gather_positions(starts[d], lens[d])
        out[pos] = vals
    return out
