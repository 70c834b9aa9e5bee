"""The int64 fixed-point bounds in pmi_bigrams / dsir_weights are
load-bearing: this file feeds a synthetic OVER-CAP corpus (one pair /
bucket dominating millions of tokens, the worst case for the products)
and proves the contract both ways:

- ``exact_mode="int64"`` fails LOUDLY — via the division-only
  ``assert_true`` guard even with ANSI arithmetic disabled, so the
  result can never silently wrap;
- ``exact_mode="decimal"`` (the documented wide path) returns the
  exact value a big-int Python model computes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import text as TX

# n_ab * n_tokens ~ 1.6e13 > int64_max / 1e6 ~ 9.2e12: over the cap
PMI_TOKENS = 4_000_001
# t_raw * tgt_cnt ~ 1e13 > 9.2e12 with every bigram in one bucket
DSIR_TOKENS = 3_200_001


@pytest.fixture(scope="module")
def pmi_corpus(spark):
    return spark.createDataFrame(
        [(1, "x " * PMI_TOKENS)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def dsir_corpus(spark):
    return spark.createDataFrame(
        [(1, "x " * DSIR_TOKENS, "en")], "doc_id long, text string, lang string"
    )


@pytest.mark.parametrize("ansi", ["true", "false"])
def test_pmi_int64_overcap_fails_loudly(spark, pmi_corpus, ansi):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", ansi)
    try:
        with pytest.raises(Exception, match="pmi_bigrams|ARITHMETIC_OVERFLOW"):
            TX.pmi_bigrams(pmi_corpus, min_count=5, min_ratio6=1).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_pmi_decimal_overcap_matches_bigint_model(spark, pmi_corpus):
    rows = TX.pmi_bigrams(
        pmi_corpus, min_count=5, min_ratio6=1, exact_mode="decimal"
    ).collect()
    n_tok = PMI_TOKENS
    n_ab = n_tok - 1
    expect = n_ab * n_tok * 1_000_000 // (n_tok * n_tok)  # Python bigints
    assert [(r.w1, r.w2, r.n_ab, r.pmi6) for r in rows] == [
        ("x", "x", n_ab, expect)
    ]


@pytest.mark.parametrize("ansi", ["true", "false"])
def test_dsir_int64_overcap_fails_loudly(spark, dsir_corpus, ansi):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", ansi)
    try:
        with pytest.raises(Exception, match="dsir_weights|ARITHMETIC_OVERFLOW"):
            CUR.dsir_weights(dsir_corpus, F.col("lang") == "en").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_dsir_decimal_overcap_matches_bigint_model(spark, dsir_corpus):
    out = CUR.dsir_weights(
        dsir_corpus, F.col("lang") == "en", exact_mode="decimal"
    ).collect()
    n_bg = DSIR_TOKENS - 1
    # every bigram is the target's and lands in one bucket:
    # ratio6 = (n+1)(n+8192)1e6 // ((n+1)(n+8192)) = 1e6 per bigram
    assert [(r.doc_id, r.n_bigrams, r.imp_sum, r.imp_avg) for r in out] == [
        (1, n_bg, n_bg * 1_000_000, 1.0)
    ]


def test_modes_agree_inside_the_envelope(spark):
    """Wherever int64 is defined the two modes are value-identical."""
    docs = spark.createDataFrame(
        [(i, "the quick brown fox " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    narrow = sorted(
        map(tuple, TX.pmi_bigrams(docs, min_count=2, min_ratio6=1).collect())
    )
    wide = sorted(
        map(
            tuple,
            TX.pmi_bigrams(
                docs, min_count=2, min_ratio6=1, exact_mode="decimal"
            ).collect(),
        )
    )
    assert narrow == wide and len(narrow) > 0


def test_bad_mode_rejected(spark):
    df = spark.createDataFrame([(1, "a b", "en")],
                               "doc_id long, text string, lang string")
    with pytest.raises(ValueError):
        TX.pmi_bigrams(df, exact_mode="float")
    with pytest.raises(ValueError):
        CUR.dsir_weights(df, F.col("lang") == "en", exact_mode="float")
