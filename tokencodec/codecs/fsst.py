"""FSST-style symbol-table string compression (from-scratch design).

Not in the reference (delta/byte-array encodings are declared but never
implemented, /root/reference/src/Parquet/Types/Enums.hs:75-78); required
by BASELINE.json north_rule. Public-knowledge basis: the FSST paper
(Boncz, Neumann, Leis — "FSST: Fast Random Access String Compression",
VLDB 2020): a table of up to 255 symbols of 1..8 bytes, one output code
per symbol, code 255 = escape + literal byte.

This implementation deliberately simplifies training (single-pass
substring frequency sample, greedy pick by saved-bytes gain) — the
format, not the trainer, defines correctness, and decode(encode(x)) is
bit-identical for any table.

Format:
    u8  n_symbols (<= 255)
    n_symbols * (u8 length)
    concatenated symbol bytes
    code stream: one byte per code; 255 = escape, next byte is literal

Encode: vectorized longest-match table via numpy sliding windows +
searchsorted per symbol length; the emit walk batches no-match stretches
so Python-level steps ~ number of emitted symbol codes.
Decode: fully vectorized gather (np.repeat offset trick).
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_LEN = 8
_SAMPLE_CAP = 1 << 16


def _window_keys(buf: np.ndarray, L: int) -> np.ndarray:
    """uint64 key per length-L window, bytes packed BIG-endian so the
    integer sort order equals lexicographic byte order — np.unique /
    searchsorted over these keys behave exactly like the former
    void-dtype views (structured-compare sorts are several times
    slower), so training and matching stay byte-identical."""
    n = len(buf)
    acc = np.zeros(n - L + 1, dtype=np.uint64)
    for i in range(L):
        acc <<= np.uint64(8)
        acc |= buf[i:n - L + 1 + i]
    return acc


def train(data: bytes | np.ndarray, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Deterministic greedy symbol selection from a sample of ``data``."""
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, memoryview)) else data
    if len(buf) > _SAMPLE_CAP:
        step = len(buf) // _SAMPLE_CAP + 1
        # sample contiguous stripes (keeps local substrings intact)
        buf = np.concatenate([buf[i:i + 256] for i in range(0, len(buf), 256 * step)])
    counts: dict[bytes, int] = {}
    n = len(buf)
    for L in (2, 3, 4, 6, 8):
        if n < L:
            continue
        uniq, cnt = np.unique(_window_keys(buf, L), return_counts=True)
        keep = cnt >= 4
        for u, c in zip(uniq[keep], cnt[keep]):
            counts[int(u).to_bytes(L, "big")] = int(c)
    # gain = bytes saved if every (overlap-counted) occurrence matched
    scored = sorted(counts.items(), key=lambda kv: (-(len(kv[0]) - 1) * kv[1], kv[0]))
    return [s for s, _ in scored[:max_symbols]]


def encode(data: bytes | np.ndarray, symbols: list[bytes]) -> bytes:
    """Greedy longest-match encode of ``data`` with ``symbols``."""
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, memoryview)) else data
    n = len(buf)
    header = bytes([len(symbols)]) + bytes(len(s) for s in symbols) + b"".join(symbols)
    if n == 0:
        return header
    match_len = np.zeros(n, dtype=np.int64)
    match_id = np.zeros(n, dtype=np.int64)
    by_len: dict[int, list[tuple[bytes, int]]] = {}
    for i, s in enumerate(symbols):
        by_len.setdefault(len(s), []).append((s, i))
    for L in sorted(by_len, reverse=True):  # longest first wins
        if L > n:
            continue
        syms = sorted(by_len[L])
        # big-endian uint64 keys: integer order == byte order (see
        # _window_keys), so searchsorted matches the former void view
        sym_keys = np.array([int.from_bytes(s, "big") for s, _ in syms],
                            dtype=np.uint64)
        ids = np.array([i for _, i in syms], dtype=np.int64)
        view = _window_keys(buf, L)
        pos = np.searchsorted(sym_keys, view)
        pos[pos == len(sym_keys)] = 0
        hit = sym_keys[pos] == view
        hit &= match_len[: n - L + 1] == 0
        idx = np.flatnonzero(hit)
        match_len[idx] = L
        match_id[idx] = ids[pos[idx]]
    # emit walk — batch literal stretches so steps ~ emitted symbol codes
    ml = match_len.tolist()
    mi = match_id.tolist()
    out = bytearray()
    p = 0
    while p < n:
        L = ml[p]
        if L:
            out.append(mi[p])
            p += L
        else:
            q = p
            while q < n and ml[q] == 0:
                q += 1
            chunk = buf[p:q]
            lits = np.empty(2 * (q - p), dtype=np.uint8)
            lits[0::2] = ESCAPE
            lits[1::2] = chunk
            out += lits.tobytes()
            p = q
    return header + bytes(out)


def decode(payload: bytes | memoryview, out_nbytes: int) -> bytes:
    mv = memoryview(payload)
    n_symbols = mv[0]
    lens = np.frombuffer(mv[1:1 + n_symbols], dtype=np.uint8).astype(np.int64)
    pos = 1 + n_symbols
    total_sym = int(lens.sum())
    sym_bytes = np.frombuffer(mv[pos:pos + total_sym], dtype=np.uint8)
    pos += total_sym
    codes = np.frombuffer(mv[pos:], dtype=np.uint8)

    # extend table with 256 virtual single-byte symbols for escaped literals
    sym_starts = np.zeros(n_symbols + 256, dtype=np.int64)
    sym_lens = np.zeros(n_symbols + 256, dtype=np.int64)
    if n_symbols:
        sym_starts[:n_symbols] = np.concatenate(([0], np.cumsum(lens)[:-1]))
        sym_lens[:n_symbols] = lens
    all_bytes = np.concatenate([sym_bytes, np.arange(256, dtype=np.uint8)])
    sym_starts[n_symbols:] = total_sym + np.arange(256)
    sym_lens[n_symbols:] = 1

    esc = codes == ESCAPE
    # an escape consumes the following byte; walk batches plain-code
    # stretches so Python-level steps ~ number of escapes
    if esc.any():
        esc_idx = np.flatnonzero(esc)
        token_ids: list[np.ndarray | int] = []
        i = 0
        while i < len(codes):
            if codes[i] == ESCAPE:
                token_ids.append(n_symbols + int(codes[i + 1]))
                i += 2
            else:
                k = np.searchsorted(esc_idx, i)
                j = int(esc_idx[k]) if k < len(esc_idx) else len(codes)
                token_ids.append(codes[i:j].astype(np.int64))
                i = j
        tok_arr = np.concatenate([np.atleast_1d(t) for t in token_ids]).astype(np.int64)
    else:
        tok_arr = codes.astype(np.int64)

    out_lens = sym_lens[tok_arr]
    out_starts = sym_starts[tok_arr]
    total = int(out_lens.sum())
    # gather: positions = repeat(starts, lens) + (arange - repeat(prefix, lens))
    prefix = np.zeros(len(out_lens), dtype=np.int64)
    np.cumsum(out_lens[:-1], out=prefix[1:])
    flat = np.repeat(out_starts - prefix, out_lens) + np.arange(total, dtype=np.int64)
    out = all_bytes[flat]
    if total != out_nbytes:
        raise ValueError(f"fsst decode length mismatch: {total} != {out_nbytes}")
    return out.tobytes()
