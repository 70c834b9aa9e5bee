"""Property-based checks of the round-4 operators against pure-Python
models (same style as test_property_curation): hypothesis generates small
corpora/graphs, a reference model computes the exact expected result, and
one Spark job per example compares.  These pin semantics the DuckDB
oracles only sample at one dataset."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import retrieval as RET
from flink_invoice_processor_spark.functions.graph import SCALE, pagerank_integer

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small alphabet so the search phrase actually occurs and trigram
# collisions (index false positives) happen
_TXT = st.text(alphabet="ab c", min_size=0, max_size=40)
_CORPUS = st.lists(_TXT, min_size=1, max_size=10)


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


@settings(**_SETTINGS)
@given(texts=_CORPUS, query=st.sampled_from(["ab c", "c ab", "aba", "b ca"]))
def test_substring_search_matches_python_count(spark, texts, query):
    expected = {
        (i, t.lower().count(query.lower()))
        for i, t in enumerate(texts)
        if t.lower().count(query.lower()) > 0
    }
    got = {
        (r["doc_id"], r["n_occurrences"])
        for r in RET.substring_search(_df(spark, texts), query).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(texts=_CORPUS)
def test_bigram_familiarity_matches_python_model(spark, texts):
    docs = {i: t.split() for i, t in enumerate(texts)}
    per_doc = {
        i: Counter(zip(ts, ts[1:])) for i, ts in docs.items()
    }
    corpus = Counter()
    for c in per_doc.values():
        corpus.update(c)
    expected = {
        (
            i,
            sum(c.values()),
            sum(n * corpus[p] for p, n in c.items()),
            sum(1 for p, n in c.items() if corpus[p] == 1),
        )
        for i, c in per_doc.items()
    }
    got = {
        (r["doc_id"], r["n_bigrams"], r["sum_pair_freq"], r["n_singleton"])
        for r in CUR.bigram_familiarity(_df(spark, texts)).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=500),
                    min_size=1, max_size=6),
    budget=st.integers(min_value=0, max_value=2000),
)
def test_domain_mix_allocation_bounds(spark, counts, budget):
    rows = [
        (i * 1000 + j, f"s{i}")
        for i, n in enumerate(counts)
        for j in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = CUR.domain_mix_weights(df, total_budget=budget).collect()
    assert {r["source"] for r in out} == {f"s{i}" for i in range(len(counts))}
    total_alloc = 0
    for r in out:
        assert 0 <= r["alloc_docs"] <= r["n_docs"]
        total_alloc += r["alloc_docs"]
    # truncating division can only under-fill, never overshoot the budget
    assert total_alloc <= budget


@settings(**_SETTINGS)
@given(
    lengths=st.lists(st.integers(min_value=0, max_value=50),
                     min_size=1, max_size=30),
)
def test_length_buckets_partition_correctly(spark, lengths):
    texts = [" ".join(["w"] * n) for n in lengths]
    out = CUR.length_bucket_batches(
        _df(spark, texts), bucket_width=8, batch_size=3
    ).collect()
    assert len(out) == len(lengths)
    per_batch = Counter((r["bucket"], r["batch_in_bucket"]) for r in out)
    for r in out:
        assert r["bucket"] == r["n_tokens"] // 8
    for (bucket, _), n in per_batch.items():
        assert n <= 3
    # within a bucket, batch indices are dense 0..max with only the last
    # batch partial
    by_bucket = Counter(r["bucket"] for r in out)
    for bucket, n in by_bucket.items():
        batches = sorted(
            b for (bk, b), _ in per_batch.items() if bk == bucket
        )
        assert batches == list(range((n + 2) // 3))


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=15,
        unique=True,
    ),
)
def test_pagerank_matches_python_model(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    outdeg = Counter(s for s, _ in edges)
    ranks = {v: SCALE // n for v in nodes}
    base = 15 * (SCALE // n) // 100
    for _ in range(2):
        mass = Counter()
        for s, d in edges:
            mass[d] += ranks[s] // outdeg[s]
        ranks = {v: base + 85 * mass[v] // 100 for v in nodes}
    got = {
        r["id"]: r["rank_1e12"]
        for r in pagerank_integer(df, iters=2).collect()
    }
    assert got == ranks
