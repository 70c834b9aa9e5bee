"""Property-based checks of the round-9 part-3/part-4 operators against
pure-Python models: hypothesis generates small corpora / key
distributions, a reference model computes the exact expected integers,
one Spark job per example compares bit for bit.  Pins the semantics the
DuckDB oracles only sample at one dataset."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from flink_invoice_processor_spark.functions import skew as SKEW
from flink_invoice_processor_spark.functions import text as TX

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["ada", "bo", "cyr", "dee", "eph", "fay"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _r6(x: float) -> int:
    return round(x * 1_000_000)


# --------------------------------------------------------------------------
# word_entropy == the exact integer pipeline over Counter frequencies
# --------------------------------------------------------------------------

def _py_entropy(doc: list[str]):
    if not doc:
        return None
    c = Counter(doc)
    n = sum(c.values())
    s6 = sum(round(v * math.log2(v) * 1_000_000) for v in c.values())
    return (n, len(c), _r6(math.log2(n)) - s6 // n)


@given(corpus=_corpus)
@settings(**_SETTINGS)
def test_word_entropy_matches_python_model(spark, corpus):
    df = spark.createDataFrame(
        [(i, " ".join(doc)) for i, doc in enumerate(corpus)],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.entropy6)
        for r in TX.word_entropy(df).collect()
    }
    want = {
        i: _py_entropy(doc)
        for i, doc in enumerate(corpus)
        if doc
    }
    assert got == want
    # bounds: 0 <= H <= log2(n_distinct) (+1 micro-bit of rounding slack)
    for n, d, e6 in got.values():
        assert -1 <= e6 <= _r6(math.log2(d)) + 1


# --------------------------------------------------------------------------
# key_skew_profile == brute-force sorted-rank Gini
# --------------------------------------------------------------------------

_keys = st.lists(st.integers(0, 6), min_size=1, max_size=40)


def _py_profile(keys: list[int]):
    c = sorted(Counter(keys).values())
    n, k, mx = sum(c), len(c), max(c)
    t = sum((i + 1) * v for i, v in enumerate(c))
    return (
        n, k, mx,
        round(mx * 1_000_000 / n),
        round((2 * t - (k + 1) * n) * 1_000_000 / (k * n)),
    )


@given(keys=_keys)
@settings(**_SETTINGS)
def test_key_skew_profile_matches_brute_force(spark, keys):
    df = spark.createDataFrame([("g", k) for k in keys], "g: string, k: long")
    row = SKEW.key_skew_profile(df, "g", "k").collect()[0]
    got = (row.n_rows, row.n_keys, row.max_count, row.top1_share6, row.gini6)
    assert got == _py_profile(keys)
    assert 0 <= row.gini6 < 1_000_000


# --------------------------------------------------------------------------
# lm_surprisal == brute-force corpus LM replay
# --------------------------------------------------------------------------

def _py_surprisal(corpus: list[list[str]]):
    pair: Counter = Counter()
    vocab = set()
    for doc in corpus:
        vocab.update(doc)
        pair.update(zip(doc, doc[1:]))
    ctx: Counter = Counter()
    for (w1, _), n in pair.items():
        ctx[w1] += n
    v = len(vocab)
    out = {}
    for i, doc in enumerate(corpus):
        bgs = list(zip(doc, doc[1:]))
        if not bgs:
            continue
        s = sum(
            round(-math.log2((pair[b] + 1) / float(ctx[b[0]] + v)) * 1_000_000)
            for b in bgs
        )
        out[i] = (len(bgs), s // len(bgs))
    return out


@given(corpus=_corpus)
@settings(**_SETTINGS)
def test_lm_surprisal_matches_python_model(spark, corpus):
    df = spark.createDataFrame(
        [(i, " ".join(doc)) for i, doc in enumerate(corpus)],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.surprisal6)
        for r in TX.lm_surprisal(df).collect()
    }
    assert got == _py_surprisal(corpus)


# --------------------------------------------------------------------------
# zipf_fit == the exact integer regression over Counter ranks
# --------------------------------------------------------------------------

def _py_zipf(corpus: list[list[str]], k: int):
    counts = Counter(w for doc in corpus for w in doc)
    ranked = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:k]
    pts = [
        (round(math.log2(i + 1) * 1000), round(math.log2(c) * 1000))
        for i, (_, c) in enumerate(ranked)
    ]
    n = len(pts)
    if n == 0:
        return None
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    if den <= 0:
        return (n, None, None)

    def rdiv(a, b):
        return (2 * a + b) // (2 * b) if a >= 0 else -((2 * -a + b) // (2 * b))

    slope3 = rdiv(1000 * num, den)
    return (n, slope3, rdiv(1000 * sy - slope3 * sx, 1000 * n))


@given(corpus=_corpus.filter(lambda c: any(c)), k=st.integers(2, 6))
@settings(**_SETTINGS)
def test_zipf_fit_matches_python_model(spark, corpus, k):
    df = spark.createDataFrame(
        [(i, " ".join(doc)) for i, doc in enumerate(corpus)],
        "doc_id: long, text: string",
    )
    row = TX.zipf_fit(df, k=k).collect()[0]
    assert (row.n_terms, row.slope3, row.intercept3) == _py_zipf(corpus, k)
