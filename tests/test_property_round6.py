"""Property-based checks of the round-6 operators against pure-Python
models: hypothesis generates small corpora, a reference model computes
the exact expected result, one Spark job per example compares.  Pins
the semantics the DuckDB oracles only sample at one dataset."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from flink_invoice_processor_spark.functions import dedup as DD
from flink_invoice_processor_spark.functions import text as TX

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["aa", "ab", "ba", "cc", "x"]
_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _py_bpe(words: dict[str, int], n_merges: int):
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        if not counts:
            break
        (pa, pb), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, pa, pb, n))
        new_vocab: Counter = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = dict(new_vocab)
    return merges, vocab


@settings(**_SETTINGS)
@given(texts=_texts, n_merges=st.integers(min_value=1, max_value=5))
def test_bpe_merges_match_python_model(spark, texts, n_merges):
    words = Counter(w for t in texts for w in t.lower().split())
    expected, _ = _py_bpe(dict(words), n_merges)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [tuple(r) for r in TX.bpe_merges(df, n_merges=n_merges).collect()]
    assert got == expected


@settings(**_SETTINGS)
@given(texts=_texts, n_merges=st.integers(min_value=1, max_value=4))
def test_bpe_encode_matches_python_model(spark, texts, n_merges):
    words = Counter(w for t in texts for w in t.lower().split())
    merges, final_vocab = _py_bpe(dict(words), n_merges)
    pairs = [(pa, pb) for _, pa, pb, _ in merges]

    def encode_len(word):
        syms = list(word)
        for pa, pb in pairs:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_words, r.n_pieces)
           for r in TX.bpe_encode(df, pairs).collect()}
    for i, t in enumerate(texts):
        toks = t.lower().split()
        assert got[i] == (len(toks), sum(encode_len(w) for w in toks))


@settings(**_SETTINGS)
@given(
    texts=_texts,
    span=st.integers(min_value=2, max_value=4),
    min_docs=st.integers(min_value=1, max_value=3),
)
def test_duplicate_spans_match_python_model(spark, texts, span, min_docs):
    per_doc = []
    for t in texts:
        toks = t.lower().split()
        per_doc.append(
            [" ".join(toks[i:i + span]) for i in range(len(toks) - span + 1)]
        )
    n_docs: Counter = Counter()
    n_occ: Counter = Counter()
    for spans in per_doc:
        for s in set(spans):
            n_docs[s] += 1
        for s in spans:
            n_occ[s] += 1
    expected = {
        (s, n_docs[s], n_occ[s]) for s in n_docs if n_docs[s] >= min_docs
    }
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.span, r.n_docs, r.n_occurrences)
        for r in DD.duplicate_spans(
            df, span_tokens=span, min_docs=min_docs
        ).collect()
    }
    assert got == expected
