"""Pure-numpy codec kernels. No Spark imports allowed in this package."""

from tokencodec.codecs import basepack, bitpack, dictionary, delta, for_, plain, rle, varint  # noqa: F401

# Codec ids used in page headers (stable — persisted on disk).
PLAIN = 0
BITPACK = 1
RLE = 2  # parquet-style RLE / bit-packed hybrid
DICT = 3
FOR = 4
DELTA = 5
FSST = 6
CONSTANT = 7  # degenerate single-value page (header-only)
GROUPED = 8  # per-document class groups, one sub-page each (grouped.py)
DEFLATED = 9  # second-order wrapper: zlib over a complete inner page
# 10 is NESTED (registered by tokencodec/nested.py to keep this package
# Spark/pyarrow-free)
FPSHUF = 11  # float byte-plane shuffle (Blosc-style transpose)
ALP = 12  # float decimal packing as int64 page + power-of-ten exponent
NULLABLE = 13  # validity-bitmap wrapper: bitmap + inner page of non-nulls
BASEPACK = 14  # base-R k-digit group packing (fractional-bit widths)
SRLE = 15  # split-stream RLE: run-values page + run-lengths page

CODEC_NAMES = {
    PLAIN: "plain",
    BITPACK: "bitpack",
    RLE: "rle",
    DICT: "dict",
    FOR: "for",
    DELTA: "delta",
    FSST: "fsst",
    CONSTANT: "constant",
    GROUPED: "grouped",
    DEFLATED: "deflated",
    FPSHUF: "fpshuf",
    ALP: "alp",
    NULLABLE: "nullable",
    BASEPACK: "basepack",
    SRLE: "srle",
}
NAME_TO_CODEC = {v: k for k, v in CODEC_NAMES.items()}
