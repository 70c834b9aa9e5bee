"""Edge cases for the round-5 text-pipeline operators (boilerplate strip,
quality classifier, DSIR weights, PMI collocations).  Happy paths are
oracle-gated; these pin the corners: empty/one-token docs, full-doc
boilerplate, df thresholds, collocation vs independence."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import text as TX


@pytest.fixture()
def docs(spark):
    # passage 'a b c d' appears in docs 1,2,3 (df=3 -> boilerplate at
    # min_df=3); 'x y z w' only in docs 1,2 (df=2 -> kept)
    return spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="a b c d x y z w"),
            Row(doc_id=2, lang="en", text="a b c d x y z w tail here pad pad"),
            Row(doc_id=3, lang="de", text="a b c d solo unique words here"),
            Row(doc_id=4, lang="de", text=""),
            Row(doc_id=5, lang="en", text="one"),
        ]
    )


def test_boilerplate_strip_df_threshold(docs):
    out = {
        r.doc_id: r
        for r in CUR.boilerplate_strip(
            docs, passage_words=4, min_df=3
        ).collect()
    }
    assert out[1].n_passages == 2 and out[1].n_removed == 1
    assert out[1].clean_text == "x y z w"
    assert out[2].n_removed == 1 and out[2].clean_text.startswith("x y z w")
    assert out[3].n_removed == 1 and out[3].clean_text == "solo unique words here"
    assert (out[4].n_passages, out[4].n_removed, out[4].clean_text) == (0, 0, "")
    # short doc: single 1-token passage, not boilerplate
    assert (out[5].n_passages, out[5].n_removed, out[5].clean_text) == (1, 0, "one")


def test_boilerplate_strip_full_doc_removed(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text="spam spam spam spam") for i in range(3)]
    )
    out = CUR.boilerplate_strip(df, passage_words=4, min_df=3).collect()
    assert all(r.clean_text == "" and r.n_removed == 1 for r in out)


def test_quality_classifier_contract(docs):
    out = {r.doc_id: r for r in TX.quality_classifier(docs).collect()}
    assert (out[4].n_toks, out[4].feat_sum, out[4].score, out[4].keep_flag) == (
        0, 0, 0.0, 0,
    )
    for r in out.values():
        if r.n_toks:
            # mean bucket weight is bounded by the weight range
            assert abs(r.score) <= 0.51
            assert r.keep_flag == (1 if r.feat_sum > 0 else 0)


def test_dsir_weights_target_likeness(spark):
    # target (en) docs speak 'aa bb', others speak 'zz yy': en-bigram
    # buckets get high target ratios, so en docs score higher
    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en", text="aa bb aa bb aa") for i in range(5)]
        + [Row(doc_id=10 + i, lang="de", text="zz yy zz yy zz") for i in range(5)]
        + [Row(doc_id=99, lang="de", text="solo")]
    )
    # small bucket space: the default 8192 add-1 smoothing would swamp
    # these tiny counts toward ratio 1.0
    out = {
        r.doc_id: r
        for r in CUR.dsir_weights(
            df, F.col("lang") == "en", n_buckets=16
        ).collect()
    }
    assert out[0].imp_avg > 1.2 > out[10].imp_avg
    assert (out[99].n_bigrams, out[99].imp_sum, out[99].imp_avg) == (0, 0, 0.0)


def test_pmi_finds_collocation_not_independence(spark):
    # 'new york' always adjacent; 'the'/'dog' co-occur only by chance
    text = " ".join(["new york the dog runs fast"] * 10)
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    out = {
        (r.w1, r.w2): r.pmi6
        for r in TX.pmi_bigrams(df, min_count=5, min_ratio6=1_000_000).collect()
    }
    assert out[("new", "york")] >= 5_000_000  # 6 unigrams -> ratio ~6
    assert ("the", "runs") not in out  # never adjacent
    # min_count gate: pairs seen < 5 times never surface
    few = TX.pmi_bigrams(df, min_count=50, min_ratio6=1_000_000).collect()
    assert few == []


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="abc abc ab x"), Row(doc_id=2, text="abc")]
    )
    out = {r.pair: r.n_pair for r in TX.bpe_pair_counts(df).collect()}
    # 'ab' appears in words 'abc' (corpus count 3) and 'ab' (count 1)
    assert out[("ab")] == 4
    assert out[("bc")] == 3
    # 1-char words contribute no pairs
    assert "x" not in "".join(out) or all(len(p) == 2 for p in out)


def _py_bpe(words: dict[str, int], n_merges: int):
    """Reference BPE trainer: greedy left-to-right non-overlapping merge
    application, max-count argmax with lexicographic tie-break."""
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (pa, pb), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, pa, pb, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_merges_sennrich_toy_corpus(spark):
    """The canonical BPE example: first merges are ('e','s') then
    ('es','t') on the low/lower/newest/widest corpus."""
    df = spark.createDataFrame(
        [Row(doc_id=1, text="low low lower newest newest newest widest")]
    )
    got = [tuple(r) for r in TX.bpe_merges(df, n_merges=3).collect()]
    words = {"low": 2, "lower": 1, "newest": 3, "widest": 1}
    assert got == _py_bpe(words, 3)
    assert got[0][1:] == ("e", "s", 4) and got[1][1:] == ("es", "t", 4)


def test_bpe_merges_greedy_nonoverlap_and_exhaustion(spark):
    """'aaaa' merges to two 'aa' symbols (non-overlapping), then to one
    'aaaa'; the loop stops early when no pairs remain."""
    df = spark.createDataFrame([Row(doc_id=1, text="aaaa aaaa aaaa")])
    got = [tuple(r) for r in TX.bpe_merges(df, n_merges=10).collect()]
    assert got == _py_bpe({"aaaa": 3}, 10)
    # ('a','a') count 9 (3 per word, greedy pairs), then ('aa','aa'),
    # then nothing: early exhaustion
    assert got[0][1:] == ("a", "a", 9)
    assert got[1][1:] == ("aa", "aa", 3)
    assert len(got) == 2


def test_bpe_encode_matches_python_model(spark):
    """Applying trained merges compresses pieces exactly as the Python
    trainer's final vocabulary predicts."""
    corpus = "low low lower newest newest newest widest"
    df = spark.createDataFrame([Row(doc_id=1, text=corpus),
                                Row(doc_id=2, text=""),
                                Row(doc_id=3, text="unseen tokens")])
    merges = [(pa, pb) for _, pa, pb, _ in _py_bpe(
        {"low": 2, "lower": 1, "newest": 3, "widest": 1}, 4)]
    got = {r.doc_id: (r.n_words, r.n_pieces)
           for r in TX.bpe_encode(df, merges).collect()}
    # python model: apply the same merges to every word, count pieces
    def encode(word):
        syms = list(word)
        for pa, pb in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                    out.append(pa + pb); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return len(syms)
    exp1 = sum(encode(w) for w in corpus.split())
    assert got[1] == (7, exp1)
    assert got[2] == (0, 0)
    assert got[3] == (2, sum(encode(w) for w in ["unseen", "tokens"]))


def test_bpe_encode_oracle_survives_early_exhaustion(spark):
    """A vocabulary exhausted before n_merges must leave the oracle's
    per-document apply chain intact (an empty training round is a no-op
    merge, not a row annihilator) and match Spark exactly."""
    import duckdb
    import pandas as pd
    from flink_invoice_processor_spark.plans.queries import (
        QUERIES, ORACLES,
    )

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["aaaa aaaa aaaa", "aa bb"]}
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = sorted(map(tuple, con.execute(ORACLES["bpe_encode_docs"]).fetchall()))
    assert len(oracle) == 2  # the chain survived the empty rounds
    sdf = spark.createDataFrame(pdf)
    merges = [tuple(r)[1:3] for r in TX.bpe_merges(sdf, n_merges=8).collect()]
    assert len(merges) < 8  # exhaustion actually happened
    got = sorted(map(tuple, TX.bpe_encode(sdf, merges).collect()))
    assert got == oracle
