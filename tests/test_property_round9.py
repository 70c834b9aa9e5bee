"""Property-based checks of the round-9 operators against pure-Python
models: hypothesis generates small snapshots/corpora/vector tables, a
reference model computes the exact expected result, one Spark job per
example compares.  Pins the semantics the DuckDB oracles only sample at
one dataset."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import cdc as CDC
from flink_invoice_processor_spark.functions import similarity as SIM

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --------------------------------------------------------------------------
# snapshot_diff == dict-diff of two keyed maps (null-safe per column)
# --------------------------------------------------------------------------

_snapshot = st.dictionaries(
    st.integers(0, 8),
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["p", "q"])),
        st.integers(0, 3),
    ),
    max_size=8,
)


def _py_diff(old: dict, new: dict):
    out = {}
    for k in old.keys() | new.keys():
        if k not in old:
            out[k] = ("added", "")
        elif k not in new:
            out[k] = ("removed", "")
        else:
            cols = [
                name
                for name, i in (("a", 0), ("b", 1))
                if old[k][i] != new[k][i]
            ]
            if cols:
                out[k] = ("changed", ",".join(cols))
    return out


@given(old=_snapshot, new=_snapshot)
@settings(**_SETTINGS)
def test_snapshot_diff_matches_dict_diff(spark, old, new):
    schema = "k: long, a: string, b: long"
    old_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in old.items()], schema
    )
    new_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in new.items()], schema
    )
    got = {
        r.k: (r.change_type, r.changed_cols)
        for r in CDC.snapshot_diff(old_df, new_df, ["k"], ["a", "b"]).collect()
    }
    assert got == _py_diff(old, new)


# --------------------------------------------------------------------------
# snapshot_diff ∘ apply_changes is the identity on the change classes:
# applying a random D/U/I batch then diffing recovers exactly the batch
# --------------------------------------------------------------------------

_batch = st.lists(
    st.tuples(st.sampled_from(["D", "U", "I"]), st.integers(0, 9)),
    max_size=6,
    unique_by=lambda t: t[1],
)


@given(batch=_batch)
@settings(**_SETTINGS)
def test_diff_inverts_apply_changes(spark, batch):
    schema = "k: long, a: string, b: long"
    base_keys = set(range(6))
    base = spark.createDataFrame(
        [(k, f"v{k}", k * 10) for k in base_keys], schema
    )
    # keep the batch coherent: D/U need an existing key, I a fresh one
    rows, expected = [], {}
    for op, k in batch:
        if op in ("D", "U") and k not in base_keys:
            continue
        if op == "I" and k in base_keys:
            continue
        if op == "D":
            rows.append(("D", k, f"v{k}", k * 10))
            expected[k] = "removed"
        elif op == "U":
            rows.append(("U", k, f"v{k}", k * 10 + 1))  # change column b
            expected[k] = "changed"
        else:
            rows.append(("I", k, "new", 1))
            expected[k] = "added"
    changes = spark.createDataFrame(
        rows, "op: string, k: long, a: string, b: long"
    )
    new = CDC.apply_changes(base, changes, ["k"]).drop("src")
    got = {
        r.k: r.change_type
        for r in CDC.snapshot_diff(base, new, ["k"], ["a", "b"]).collect()
    }
    assert got == expected


# --------------------------------------------------------------------------
# covariance_matrix == integer-exact numpy model (truncating DIV included)
# --------------------------------------------------------------------------

#: a loaded native library flushes subnormals (FTZ), which hypothesis's
#: float strategy detects and refuses — tiny denormals are irrelevant to
#: these micro-unit-quantized operators anyway
_floats = dict(allow_nan=False, allow_subnormal=False, width=32)

_vec_tables = st.lists(
    st.lists(
        st.floats(-0.5, 0.5, **_floats),
        min_size=3,
        max_size=3,
    ),
    min_size=2,
    max_size=12,
)


def _trunc_div(num: int, den: int) -> int:
    q = abs(num) // den
    return q if num >= 0 else -q


@given(vecs=_vec_tables)
@settings(**_SETTINGS)
def test_covariance_matches_integer_model(spark, vecs):
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id: long, embedding: array<float>",
    )
    q = np.round(np.array(vecs, dtype=np.float32).astype(np.float64) * 1e6)
    n = q.shape[0]
    got = {
        (r.i, r.j): (r.n_vecs, r.cov_e12)
        for r in SIM.covariance_matrix(emb).collect()
    }
    for i in range(3):
        for j in range(i, 3):
            num = int(n * np.dot(q[:, i], q[:, j])) - int(q[:, i].sum()) * int(
                q[:, j].sum()
            )
            assert got[(i, j)] == (n, _trunc_div(num, n * n))


# --------------------------------------------------------------------------
# distribution_drift: TVD properties — symmetric, bounded, zero iff the
# binned counts coincide, and exact vs the python model
# --------------------------------------------------------------------------


def _py_bins(vals):
    c = [0] * 12
    for x in vals:
        qv = round(float(np.float32(x)) * 1_000_000)
        c[min(max((qv + 600_000) // 100_000, 0), 11)] += 1
    return c


def _py_tvd(ca, cb):
    na, nb = sum(ca), sum(cb)
    return (
        sum(
            abs(
                (ca[i] + 1) * 1_000_000 // (na + 12)
                - (cb[i] + 1) * 1_000_000 // (nb + 12)
            )
            for i in range(12)
        )
        // 2
    )


_sides = st.tuples(
    st.lists(st.floats(-0.75, 0.75, **_floats), min_size=1, max_size=15),
    st.lists(st.floats(-0.75, 0.75, **_floats), min_size=1, max_size=15),
)


@given(sides=_sides)
@settings(**_SETTINGS)
def test_drift_tvd_properties(spark, sides):
    xa, xb = sides
    a = spark.createDataFrame(
        [(i, [v]) for i, v in enumerate(xa)],
        "vec_id: long, embedding: array<float>",
    )
    b = spark.createDataFrame(
        [(i, [v]) for i, v in enumerate(xb)],
        "vec_id: long, embedding: array<float>",
    )
    fwd = SIM.distribution_drift(a, b).collect()[0]
    rev = SIM.distribution_drift(b, a).collect()[0]
    expect = _py_tvd(_py_bins(xa), _py_bins(xb))
    assert fwd.tvd6 == expect
    assert rev.tvd6 == expect  # symmetric
    assert 0 <= fwd.tvd6 <= 1_000_000  # bounded fixed-point TVD
    if _py_bins(xa) == _py_bins(xb) and len(xa) == len(xb):
        assert fwd.tvd6 == 0


# --------------------------------------------------------------------------
# kmv_join_size_estimate: exact columns always exact; the estimate and
# common-key count are exact whenever the union sketch is unsaturated
# --------------------------------------------------------------------------

_key_lists = st.tuples(
    st.lists(st.integers(0, 20), min_size=0, max_size=25),
    st.lists(st.integers(0, 20), min_size=0, max_size=25),
)


@given(keys=_key_lists)
@settings(**_SETTINGS)
def test_join_size_exact_when_unsaturated(spark, keys):
    from flink_invoice_processor_spark.functions.sketches import (
        kmv_join_size_estimate,
    )

    ka, kb = keys
    a = spark.createDataFrame([(k,) for k in ka] or [(None,)], "k: long").where(
        "k IS NOT NULL"
    )
    b = spark.createDataFrame([(k,) for k in kb] or [(None,)], "k: long").where(
        "k IS NOT NULL"
    )
    row = kmv_join_size_estimate(a, b, F.col("k"), k=64).first()
    from collections import Counter

    ca, cb = Counter(ka), Counter(kb)
    exact = sum(ca[k] * cb[k] for k in ca.keys() & cb.keys())
    assert row.exact_join_size == exact
    assert row.n_a == len(ka) and row.n_b == len(kb)
    # ≤21 distinct keys per side -> every sketch unsaturated -> exact
    da, db = len(set(ka)), len(set(kb))
    common = len(set(ka) & set(kb))
    assert row.est_distinct_a == da and row.est_distinct_b == db
    assert row.est_common_keys == common
    if da and db:
        assert row.est_join_size == (common * len(ka) * len(kb)) // (da * db)
    else:
        assert row.est_join_size == 0
