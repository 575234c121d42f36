"""Base-R group packing: k values packed as k digits base R into one
<=63-bit integer, the group stream bit-packed at the group width.

Why: bit-packing rounds each value up to an integer bit width, wasting
up to one bit per value (a vocabulary of 50257 token ids costs 16 bits
bit-packed but only log2(50257) = 15.62 bits of information). Packing
k values as digits of one base-R number amortizes the round-up across
the group: ceil(k * log2(R)) / k bits per value (k=3 at R=50257 ->
15.67). This matters precisely on the pages nothing else can shrink —
high-entropy near-uniform distributions are immune to RLE, DELTA, DICT
and the second-order DEFLATE wrap alike, so the fractional-bit saving
is the only recoverable redundancy left. (Same arithmetic as parquet's
DECIMAL fixed-len byte packing and the "bit fraction" trick in
FastLanes-style layouts; reference scope stops at whole-bit packing,
/root/reference/src/Parquet/Decoder.hs:83-99.)

Values are FOR-referenced first (caller passes vmin as the page ref),
so the digit range is R = vmax - vmin + 1.

Payload layout:
    u64 R | u8 k | packed groups (n // k groups at group_bits each)
         | u64-LE tail group (present iff n % k > 0: the last n % k
           values as one base-R integer, big-digit-first like the
           full groups)
"""

from __future__ import annotations

import struct

import numpy as np

from tokencodec.codecs import bitpack

_MAX_GROUP_BITS = 63  # group accumulator stays clear of uint64 overflow


def plan(R: int) -> tuple[int, int]:
    """-> (k, group_bits): the densest k with R**k <= 2**63.

    k = 1 means base packing degenerates to plain FOR/bitpack (no gain).
    Pure function of R — selection stays deterministic.
    """
    if R < 2:
        return 1, max(R - 1, 0).bit_length()
    best_k, best_bits = 1, (R - 1).bit_length()
    best_per = float(best_bits)
    k, prod = 2, R * R
    while prod <= (1 << _MAX_GROUP_BITS):
        bits = (prod - 1).bit_length()
        per = bits / k
        if per < best_per:
            best_k, best_bits, best_per = k, bits, per
        k += 1
        prod *= R
    return best_k, best_bits


def payload_nbytes(n: int, R: int) -> int:
    """Exact encoded payload size for n values of range R."""
    k, bits = plan(R)
    return 9 + bitpack.packed_nbytes(n // k, bits) + (8 if n % k else 0)


def encode(values: np.ndarray, vmin: int, R: int) -> bytes:
    """values: int64 array with vmin <= v < vmin + R."""
    k, bits = plan(R)
    d = (values.astype(np.int64, copy=False) - vmin).astype(np.uint64)
    n = len(d)
    nfull = n // k
    acc = np.zeros(nfull, dtype=np.uint64)
    g = d[: nfull * k].reshape(nfull, k)
    uR = np.uint64(R)
    for i in range(k):
        acc = acc * uR + g[:, i]
    parts = [struct.pack("<QB", R, k), bitpack.pack_le(acc, bits)]
    t = n - nfull * k
    if t:
        tail = 0
        for x in d[nfull * k:]:
            tail = tail * R + int(x)
        parts.append(struct.pack("<Q", tail))
    return b"".join(parts)


def decode(buf: bytes | memoryview, vmin: int, n: int) -> np.ndarray:
    mv = memoryview(buf)
    R, k = struct.unpack_from("<QB", mv, 0)
    _, bits = plan(R)
    nfull = n // k
    t = n - nfull * k
    body_len = bitpack.packed_nbytes(nfull, bits)
    acc = bitpack.unpack_le(mv[9:9 + body_len], bits, nfull).astype(np.uint64)
    out = np.empty(n, dtype=np.int64)
    grp = np.empty((nfull, k), dtype=np.uint64)
    uR = np.uint64(R)
    for i in range(k - 1, -1, -1):
        grp[:, i] = acc % uR
        acc //= uR
    out[: nfull * k] = grp.reshape(-1).astype(np.int64)
    if t:
        (tail,) = struct.unpack_from("<Q", mv, 9 + body_len)
        for i in range(t - 1, -1, -1):
            out[nfull * k + i] = tail % R
            tail //= R
    return out + vmin
