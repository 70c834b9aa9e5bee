"""Type-drift canary: the driver regenerates /root/testdata between rounds
and has already changed ``events.ts``'s physical parquet type once
(INT64 TIMESTAMP(NANOS) → ``timestamp[us]``), which broke every query that
casted ``ts`` (round 3: 2 crashed correctness rows + the whole bench).

This test pins BOTH layers so a regeneration fails fast locally instead of
in the driver's gate:

1. the physical parquet schema of each testdata table (via pyarrow, no
   Spark involved) — if this assertion fails, the DATA changed: re-check
   every query that touches the drifted column;
2. the post-``load_table`` Spark dtypes — ``load_table`` must canonicalize
   whatever the physical layout is to the types every query assumes
   (most importantly ``events.ts`` → ``timestamp_ntz``).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from flink_invoice_processor_spark.tables import TABLES, load_table

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]

# Spark dtypes every query in plans/queries.py assumes after load_table.
EXPECTED_SPARK_DTYPES = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp_ntz",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
    # date-ish columns are physically timestamp[us]; queries rely on the
    # NTZ read (comparisons against date literals coerce correctly)
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_shipdate": "timestamp_ntz",
        "l_returnflag": "string",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
    },
    "customer": {"c_custkey": "bigint", "c_acctbal": "double"},
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
}

# Physical parquet types we KNOW queries are sensitive to.  ``ts`` is the
# column that already drifted once; accept only layouts load_table handles.
# NOTE: pyarrow reads the INT64 TIMESTAMP(NANOS) layout as timestamp[ns] —
# a BARE int64 would mean an epoch integer of unknowable unit (load_table's
# bigint branch assumes nanos), so it is deliberately NOT accepted.
TS_ACCEPTED_PHYSICAL = {"timestamp[ns]", "timestamp[us]"}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_physical_layout_is_known(sf_dir):
    schema = pq.read_schema(f"{sf_dir}/events.parquet")
    ts_type = str(schema.field("ts").type)
    assert ts_type in TS_ACCEPTED_PHYSICAL, (
        f"events.ts physical type drifted to {ts_type!r} — extend "
        f"tables.load_table's canonicalization before trusting any events query"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_tables_exist(sf_dir):
    for name in TABLES:
        assert os.path.exists(f"{sf_dir}/{name}.parquet"), name


@pytest.mark.parametrize("table", sorted(EXPECTED_SPARK_DTYPES))
def test_load_table_canonical_dtypes(spark, table):
    if not SF_DIRS:
        pytest.skip("no testdata dirs present")
    df = load_table(spark, SF_DIRS[0], table)
    got = dict(df.dtypes)
    for col, want in EXPECTED_SPARK_DTYPES[table].items():
        assert got.get(col) == want, (
            f"{table}.{col}: expected {want}, got {got.get(col)} — testdata "
            f"type drift; fix load_table, then re-verify dependent queries"
        )
