"""Property-based checks of the round-5 operators against pure-Python
models: hypothesis generates small corpora/streams, a reference model
computes the exact expected result, one Spark job per example compares.
Pins the semantics the DuckDB oracles only sample at one dataset."""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import sketches as SK

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _md5_44(v: str) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:11], 16)


@settings(**_SETTINGS)
@given(
    keys=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=60
    ),
    threshold=st.integers(min_value=1, max_value=10),
)
def test_cms_heavy_hitters_equals_exact_model(spark, keys, threshold):
    expected = {
        (k, n) for k, n in Counter(keys).items() if n >= threshold
    }
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        (r.hh_key, r.n_events)
        for r in SK.cms_heavy_hitters(
            df, F.col("k"), threshold=threshold, depth=2, width=8
        ).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    vals_a=st.lists(st.integers(0, 50), min_size=0, max_size=40),
    vals_b=st.lists(st.integers(0, 50), min_size=0, max_size=40),
    k=st.sampled_from([4, 8]),
)
def test_kmv_merge_law_matches_python_model(spark, vals_a, vals_b, k):
    # model: sketch(X) = k smallest distinct hashes; merge = k smallest
    # of the union of sketches; law: merge == sketch of union
    def sketch(vals):
        return sorted({_md5_44(v) for v in vals})[:k]

    model_merge = sorted(set(sketch(vals_a)) | set(sketch(vals_b)))[:k]
    assert model_merge == sketch(vals_a + vals_b)  # the law, in the model

    rows = [("s", v) for v in vals_a + vals_b]
    if not rows:
        return
    df = spark.createDataFrame(rows, "seg string, v long")
    got = sorted(
        r.h
        for r in SK.kmv_sketch(
            df, F.col("seg"), F.col("v"), k=k, n_salts=4
        ).collect()
    )
    assert got == model_merge


@settings(**_SETTINGS)
@given(
    weights=st.lists(st.integers(0, 20), min_size=1, max_size=50),
    n_samples=st.sampled_from([3, 7]),
)
def test_pps_sample_matches_python_model(spark, weights, n_samples):
    total = sum(weights)
    stride = max(total // n_samples, 1)
    cum = 0
    expected = set()
    for i, w in enumerate(weights):
        prev, cum = cum, cum + w
        if cum // stride > prev // stride:
            expected.add((i, w, cum))
    df = spark.createDataFrame(
        list(enumerate(weights)), "doc_id long, w long"
    )
    got = {
        (r.doc_id, r.w, r.cum_w)
        for r in CUR.pps_systematic_sample(
            df, F.col("w"), n_samples=n_samples, order_col="doc_id"
        ).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="xy z", min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    ),
    min_df=st.sampled_from([2, 3]),
)
def test_boilerplate_strip_matches_python_model(spark, texts, min_df):
    w = 2  # passage words
    docs = [(i, t) for i, t in enumerate(texts)]

    def passages(t):
        toks = t.strip().lower().split()
        return [
            " ".join(toks[j : j + w]) for j in range(0, len(toks), w)
        ]

    dfreq = Counter()
    for _, t in docs:
        for p in set(passages(t)):
            dfreq[p] += 1
    expected = {}
    for i, t in docs:
        ps = passages(t)
        kept = [p for p in ps if dfreq[p] < min_df]
        expected[i] = (
            len(ps),
            len(ps) - len(kept),
            " ".join(kept),
        )
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_passages, r.n_removed, r.clean_text)
        for r in CUR.boilerplate_strip(
            sdf, passage_words=w, min_df=min_df
        ).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-5, 60)), min_size=1, max_size=30
    ),
    lo=st.integers(0, 10),
    hi=st.integers(20, 50),
)
def test_dq_checks_match_python_model(spark, vals, lo, hi):
    from flink_invoice_processor_spark.functions import quality as DQ

    df = spark.createDataFrame([(v,) for v in vals], "x int")
    out = {
        r.check_name: r.violations
        for r in DQ.run_checks(
            df, [DQ.not_null("x"), DQ.in_range("x", lo, hi), DQ.unique("x")]
        ).collect()
    }
    nn = sum(1 for v in vals if v is None)
    rng = sum(1 for v in vals if v is None or v < lo or v > hi)
    uni = len(vals) - len({v for v in vals if v is not None})
    # count_distinct ignores NULLs, so every NULL row counts as a dup
    assert out["not_null(x)"] == nn
    assert out["range(x)"] == rng
    assert out["unique(x)"] == uni


@settings(**_SETTINGS)
@given(
    ranks_a=st.lists(st.integers(1, 8), min_size=0, max_size=6, unique=True),
    ranks_b=st.lists(st.integers(1, 8), min_size=0, max_size=6, unique=True),
)
def test_rrf_matches_python_model(spark, ranks_a, ranks_b):
    from flink_invoice_processor_spark.functions import retrieval as RET

    # doc_id == 10*rank so both lists rank disjoint-ish doc sets with
    # deterministic overlap on equal ranks
    a = [("q", 10 * r, i + 1) for i, r in enumerate(sorted(ranks_a))]
    b = [("q", 10 * r, i + 1) for i, r in enumerate(sorted(ranks_b))]
    docs = {d for _, d, _ in a} | {d for _, d, _ in b}
    if not docs:
        return
    ra = {d: r for _, d, r in a}
    rb = {d: r for _, d, r in b}
    model = {
        d: round(
            (1 / (60 + ra[d]) if d in ra else 0.0)
            + (1 / (60 + rb[d]) if d in rb else 0.0),
            6,
        )
        for d in docs
    }
    order = sorted(docs, key=lambda d: (-model[d], d))[:10]
    schema = "term string, doc_id long, rank int"
    got = RET.rrf_fuse(
        spark.createDataFrame(a or [("_", -1, 1)], schema).where("doc_id >= 0"),
        spark.createDataFrame(b or [("_", -1, 1)], schema).where("doc_id >= 0"),
        k=10,
    ).collect()
    assert {r.doc_id: r.rrf_score for r in got} == {d: model[d] for d in order}
    assert [r.doc_id for r in sorted(got, key=lambda r: r.fused_rank)] == order
