"""Driver-contract parity harness: runs every `queries()` entry on Spark
and its `oracle_sql()` twin on DuckDB at sf0.01, then compares row
count, column names, and order-insensitive values — mimicking the
driver's CORRECTNESS check (column sort by name + value hash)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df):
    """pandas frame -> sorted list of row tuples, columns sorted by name."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(round(v, 9) if not math.isnan(v) else "nan")
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(map(repr, rows))


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, ddb, name):
    ours = QUERIES[name](spark, SF_DIR).toPandas()
    theirs = ddb.sql(ORACLES[name]).df()
    assert sorted(ours.columns) == sorted(theirs.columns), (
        f"{name}: columns {sorted(ours.columns)} != {sorted(theirs.columns)}")
    dt_ours = {c: str(ours[c].dtype) for c in ours.columns}
    dt_theirs = {c: str(theirs[c].dtype) for c in theirs.columns}
    assert dt_ours == dt_theirs, (
        f"{name}: dtype mismatch "
        + str({c: (dt_ours[c], dt_theirs[c]) for c in dt_ours if dt_ours[c] != dt_theirs.get(c)}))
    assert len(ours) == len(theirs), f"{name}: rows {len(ours)} != {len(theirs)}"
    a, b = _canon(ours), _canon(theirs)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"{name}: first value mismatches at {mism}: " + \
        "; ".join(f"{a[i]} != {b[i]}" for i in mism)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
