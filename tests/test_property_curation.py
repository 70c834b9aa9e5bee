"""Property-based checks of the curation operators against pure-Python
models (same style as test_property_fallback): hypothesis generates small
corpora, a reference model computes the expected result exactly, and one
Spark job per example compares multisets.  These pin the semantics the
DuckDB oracles can only sample at one dataset."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from flink_invoice_processor_spark.functions import curation as CUR

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# docs: whitespace-separated lowercase words from a tiny vocabulary so
# cross-doc n-gram collisions actually happen
_WORD = st.sampled_from(["a", "b", "cc", "dd", "eee", "ff"])
_DOC = st.lists(_WORD, min_size=0, max_size=60).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=12)


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


@settings(**_SETTINGS)
@given(texts=_CORPUS)
def test_chunking_matches_python_model(spark, texts):
    chunk, stride = 7, 5
    expected = set()
    for i, t in enumerate(texts):
        toks = t.split()
        for k in range(math.ceil(len(toks) / stride)):
            window = toks[k * stride : k * stride + chunk]
            expected.add((i, k, len(window), " ".join(window)))
    got = {
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in CUR.chunk_documents(
            _df(spark, texts), chunk_size=chunk, stride=stride
        ).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(texts=_CORPUS, nparts=st.sampled_from([1, 3, 7]))
def test_pack_sequences_matches_sequential_model(spark, texts, nparts):
    seq_len = 11
    offset, expected = 0, set()
    for i, t in enumerate(texts):
        n = len(t.split())
        if n == 0:
            continue
        first, last = offset // seq_len, (offset + n) // seq_len
        expected.add((i, n, offset, first, last, last - first + 1))
        offset += n + 1
    got = {
        tuple(r)
        for r in CUR.pack_sequences(
            _df(spark, texts).repartition(nparts), seq_len=seq_len
        ).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(texts=_CORPUS)
def test_decontaminate_matches_python_model(spark, texts):
    n = 3

    def grams(t):
        toks = t.split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    ev_grams = set().union(
        *(grams(t) for i, t in enumerate(texts) if i % 3 == 0), set()
    )
    expected = {}
    for i, t in enumerate(texts):
        if i % 3 == 0:
            continue
        g = grams(t)
        if not g:
            continue
        hits = len(g & ev_grams)
        expected[i] = (len(g), hits, hits > 0)
    df = _df(spark, texts)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"], r["is_contaminated"])
        for r in CUR.decontaminate(
            df.where("doc_id % 3 != 0"), df.where("doc_id % 3 = 0"), n=n
        ).collect()
    }
    assert got == expected
