"""Property-based checks of the late-round-6 operators against
pure-Python models: CDC merge apply, the bucketized interval-overlap
join, and bloom probe membership.  Hypothesis generates small inputs, a
reference model computes the exact expected result, one Spark job per
example compares — pinning semantics the DuckDB oracles only sample at
one dataset."""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import cdc as CDC
from flink_invoice_processor_spark.functions import sketches as SK

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- CDC apply ------------------------------------------------------------

_base_rows = st.dictionaries(
    st.integers(0, 15), st.text("abc", min_size=0, max_size=3),
    min_size=0, max_size=8,
)
# one change per key (the operator's contract); payload for U/I
_changes = st.dictionaries(
    st.integers(0, 20),
    st.tuples(st.sampled_from(["D", "U", "I"]),
              st.text("xyz", min_size=1, max_size=3)),
    min_size=0, max_size=8,
)


@given(base=_base_rows, changes=_changes)
@settings(**_SETTINGS)
def test_cdc_apply_matches_dict_model(spark, base, changes):
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()], "k long, v string"
    )
    ch_df = spark.createDataFrame(
        [(op, k, v) for k, (op, v) in changes.items()],
        "op string, k long, v string",
    )
    got = {
        r["k"]: (r["v"], r["src"])
        for r in CDC.apply_changes(base_df, ch_df, ["k"]).collect()
    }

    model = {k: (v, "kept") for k, v in base.items()}
    for k, (op, v) in changes.items():
        if op == "D":
            model.pop(k, None)
        elif op == "U":
            # U of an absent key deletes nothing from base but emits the
            # payload (MERGE WHEN MATCHED UPDATE + our union emits the U
            # payload unconditionally — upsert semantics)
            model[k] = (v, "updated")
        else:
            model[k] = (v, "inserted")
    assert got == model


# --- interval overlap -----------------------------------------------------

_EPOCH = datetime(2024, 1, 1)
_intervals = st.lists(
    st.tuples(st.integers(0, 5000), st.integers(1, 1500)),  # (start_s, len_s)
    min_size=0, max_size=8,
)


@given(a=_intervals, b=_intervals)
@settings(**_SETTINGS)
def test_bucketized_overlap_equals_cartesian_model(spark, a, b):
    """The 10-minute-bucket blocking + exact filter (the registered
    query's shape, re-built here over arbitrary intervals) finds exactly
    the overlapping pairs a brute-force model finds."""
    A = [(i, _EPOCH + timedelta(seconds=s), _EPOCH + timedelta(seconds=s + l))
         for i, (s, l) in enumerate(a)]
    B = [(j, _EPOCH + timedelta(seconds=s), _EPOCH + timedelta(seconds=s + l))
         for j, (s, l) in enumerate(b)]
    expected = {
        (i, j)
        for i, a0, a1 in A
        for j, b0, b1 in B
        if a0 < b1 and b0 < a1
    }

    adf = spark.createDataFrame(A, "aid long, a0 timestamp, a1 timestamp")
    bdf = spark.createDataFrame(B, "bid long, b0 timestamp, b1 timestamp")

    def ep(c):
        return F.expr(
            f"timestampdiff(SECOND, TIMESTAMP '1970-01-01 00:00:00', {c})"
        )

    ab = adf.select(
        "*", F.explode(F.sequence(
            (ep("a0") / 600).cast("long"), (ep("a1") / 600).cast("long")
        )).alias("bucket")
    )
    bb = bdf.select(
        "*", F.explode(F.sequence(
            (ep("b0") / 600).cast("long"), (ep("b1") / 600).cast("long")
        )).alias("bucket")
    )
    got = {
        (r["aid"], r["bid"])
        for r in ab.join(bb, "bucket")
        .select("aid", "a0", "a1", "bid", "b0", "b1").distinct()
        .where((F.col("a0") < F.col("b1")) & (F.col("b0") < F.col("a1")))
        .collect()
    }
    assert got == expected


# --- bloom membership -----------------------------------------------------

def _py_bloom_hit(member_set, v, m_bits, k):
    words: dict[int, int] = {}
    for m in member_set:
        for i in range(k):
            h = int(hashlib.md5(f"{i}:{m}".encode()).hexdigest()[:15], 16)
            pos = h % m_bits
            words[pos // 60] = words.get(pos // 60, 0) | (1 << (pos % 60))
    for i in range(k):
        h = int(hashlib.md5(f"{i}:{v}".encode()).hexdigest()[:15], 16)
        pos = h % m_bits
        if not words.get(pos // 60, 0) & (1 << (pos % 60)):
            return False
    return True


@given(
    members=st.sets(st.integers(0, 500), min_size=0, max_size=20),
    cands=st.sets(st.integers(0, 500), min_size=1, max_size=20),
)
@settings(**_SETTINGS)
def test_bloom_matches_python_model(spark, members, cands):
    m_bits, k = 300, 3
    mdf = spark.createDataFrame([(m,) for m in members] or [(None,)], "v long")
    mdf = mdf.where(F.col("v").isNotNull())
    words = SK.bloom_words(mdf, F.col("v"), m_bits=m_bits, k=k)
    cdf = spark.createDataFrame([(c,) for c in cands], "v long")
    got = {
        int(r["value"]): r["bloom_hit"]
        for r in SK.bloom_probe(cdf, F.col("v"), words, m_bits, k).collect()
    }
    assert got == {
        c: _py_bloom_hit(members, c, m_bits, k) for c in cands
    }
