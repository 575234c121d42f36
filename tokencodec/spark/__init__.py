"""Spark-side orchestration: synth data, partitioning, encode/decode jobs,
snapshot table with resume. All heavy lifting is vectorized Arrow/numpy
inside mapInArrow — no per-row Python anywhere (BASELINE.json input_hint)."""
