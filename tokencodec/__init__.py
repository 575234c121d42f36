"""tokencodec — a PySpark-native per-column lightweight-compression engine.

Built from scratch (NOT a port) with the query/data-processing
capabilities of the reference `yigitozkavci/parquet-hs` (a Haskell
streaming Parquet decoder, see SURVEY.md): columnar encode *and*
decode for dictionary, RLE/bit-packed hybrid, bit-packing,
frame-of-reference, delta and FSST codecs, with per-chunk codec
auto-selection from sampled statistics.

Layout:
  codecs/      pure-numpy codec kernels (no Spark imports)
  pageformat   binary page envelope (header + payload), int/string/float
               column codecs (floats: ALP decimal packing, byte-shuffle)
  nested       recursive list/struct/string/bool/float leaf codec
  grouped      per-document token classes, doc-restart delta
  stats        sampled per-chunk statistics
  select       deterministic cost model: stats -> codec choice
  spark/       synth data gen, partitioning, encode/decode jobs,
               snapshot commits (sequential-claim protocol), streaming,
               maintenance (compact/expire/GC), vector tables,
               object-store + HTTP IO, fsck
"""

__version__ = "0.1.0"
