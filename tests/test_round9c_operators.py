"""Round-9 part-3 operator coverage: word-distribution entropy, the
corpus Zipf fit, metadata-vs-content language agreement, exponentially
time-decayed aggregates, and the key-skew diagnostic profile.

All are LLM-data-pipeline / scale-engineering extensions beyond the
reference surface; every value assertion below is hand-computed (or
replicated with exact integer arithmetic in the test), and the same
operators are DuckDB-oracle-checked end to end in plans/queries.py.
"""

from __future__ import annotations

import math
from datetime import datetime

from flink_invoice_processor_spark.functions import skew as SKEW
from flink_invoice_processor_spark.functions import text as TX
from flink_invoice_processor_spark.functions import windows as WIN


class TestWordEntropy:
    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        return {r.doc_id: r.asDict() for r in TX.word_entropy(df).collect()}

    def test_values(self, spark):
        got = self._run(
            spark,
            [
                (1, "a a a a"),          # one word: H = 0
                (2, "a b A B"),          # uniform over 2 (case-folded): H = 1
                (3, "a b c d"),          # uniform over 4: H = 2
                (4, ""),                 # no tokens: excluded
                (5, "   "),              # whitespace only: excluded
            ],
        )
        assert set(got) == {1, 2, 3}
        assert got[1] == {"doc_id": 1, "n_tokens": 4, "n_distinct": 1,
                          "entropy6": 0}
        assert got[2] == {"doc_id": 2, "n_tokens": 4, "n_distinct": 2,
                          "entropy6": 1_000_000}
        assert got[3] == {"doc_id": 3, "n_tokens": 4, "n_distinct": 4,
                          "entropy6": 2_000_000}

    def test_skewed_distribution(self, spark):
        # counts {a:3, b:1}: H = log2(4) - (3*log2(3) + 0)/4
        got = self._run(spark, [(1, "a a a b")])
        s6 = round(3 * math.log2(3) * 1_000_000)
        assert got[1]["entropy6"] == 2_000_000 - s6 // 4


class TestZipfFit:
    def _expected(self, counts, k):
        ranked = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:k]
        pts = [
            (round(math.log2(i + 1) * 1000), round(math.log2(c) * 1000))
            for i, (_, c) in enumerate(ranked)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        if den <= 0:
            return n, None, None

        def rdiv(a, b):  # round half away from zero, positive b
            return (
                (2 * a + b) // (2 * b) if a >= 0 else -((2 * -a + b) // (2 * b))
            )

        slope3 = rdiv(1000 * num, den)
        intercept3 = rdiv(1000 * sy - slope3 * sx, 1000 * n)
        return n, slope3, intercept3

    def test_perfect_zipf(self, spark):
        # counts 8/4/2/1 over ranks 1..4 -> slope near -1.5 bits/bit
        words = []
        for w, c in [("alpha", 8), ("beta", 4), ("gamma", 2), ("delta", 1)]:
            words += [w] * c
        df = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id: long, text: string"
        )
        row = TX.zipf_fit(df, k=10).collect()[0]
        n, slope3, intercept3 = self._expected(
            {"alpha": 8, "beta": 4, "gamma": 2, "delta": 1}, 10
        )
        assert (row.n_terms, row.slope3, row.intercept3) == (
            n, slope3, intercept3,
        )
        assert -1600 < row.slope3 < -1400  # the fit really is ~ -1.5

    def test_degenerate_single_term(self, spark):
        df = spark.createDataFrame(
            [(1, "same same same")], "doc_id: long, text: string"
        )
        row = TX.zipf_fit(df, k=10).collect()[0]
        assert row.n_terms == 1
        assert row.slope3 is None and row.intercept3 is None

    def test_top_k_cut_is_deterministic(self, spark):
        # two words tied at the k-boundary: the (count DESC, word ASC)
        # total order keeps the lexicographically smaller one
        df = spark.createDataFrame(
            [(1, "aa bb aa bb cc dd")], "doc_id: long, text: string"
        )
        row3 = TX.zipf_fit(df, k=3).collect()[0]   # keeps aa, bb, cc
        row4 = TX.zipf_fit(df, k=4).collect()[0]
        assert row3.n_terms == 3 and row4.n_terms == 4
        n, slope3, _ = self._expected({"aa": 2, "bb": 2, "cc": 1}, 3)
        assert (row3.n_terms, row3.slope3) == (n, slope3)


class TestLanguageMismatch:
    def test_rates(self, spark):
        df = spark.createDataFrame(
            [
                # pred en, tag en -> agree
                (1, "the of and to in", "en", "s1"),
                # pred de, tag fr -> mismatch
                (2, "der die das und zu", "fr", "s1"),
                # no stopword hits -> und: counted, out of the denominator
                (3, "xyzzy qwerty plugh", "zh", "s1"),
                # pred es, tag es -> agree
                (4, "el la de y que", "es", "s2"),
            ],
            "doc_id: long, text: string, lang: string, source: string",
        )
        got = {
            r.source: r.asDict()
            for r in TX.language_mismatch(df).collect()
        }
        assert got["s1"] == {
            "source": "s1", "n_docs": 3, "n_pred": 2, "n_mismatch": 1,
            "mismatch_rate6": 500_000,
        }
        assert got["s2"] == {
            "source": "s2", "n_docs": 1, "n_pred": 1, "n_mismatch": 0,
            "mismatch_rate6": 0,
        }

    def test_all_und_source(self, spark):
        df = spark.createDataFrame(
            [(1, "zz yy xx", "zh", "s1")],
            "doc_id: long, text: string, lang: string, source: string",
        )
        row = TX.language_mismatch(df).collect()[0]
        assert (row.n_pred, row.n_mismatch, row.mismatch_rate6) == (0, 0, 0)


class TestDecayedCounts:
    def test_half_life(self, spark):
        t0 = datetime(2024, 1, 2, 0, 0, 0)
        older = datetime(2024, 1, 1, 0, 0, 0)  # exactly one half-life back
        df = spark.createDataFrame(
            [
                (1, t0, "click", 2.0),
                (2, older, "click", 4.0),
                (3, t0, "view", 1.0),
            ],
            "event_id: long, ts: timestamp_ntz, event_type: string, value: double",
        )
        got = {
            r.event_type: r.asDict()
            for r in WIN.decayed_counts(df, half_life_s=86400).collect()
        }
        # click: w = [1.0, 0.5] -> wsum6 = 1_500_000;
        # decayed value = 2.0*1 + 4.0*0.5 = 4.0 -> 4_000_000
        assert got["click"] == {
            "event_type": "click", "n_events": 2,
            "wsum6": 1_500_000, "decayed_value6": 4_000_000,
        }
        assert got["view"] == {
            "event_type": "view", "n_events": 1,
            "wsum6": 1_000_000, "decayed_value6": 1_000_000,
        }

    def test_mergeability(self, spark):
        # decayed sums to a COMMON reference instant just add: computing
        # over the union equals summing the per-half partials (the same
        # max row wins in both halves' unions with the anchor row)
        t0 = datetime(2024, 1, 2, 0, 0, 0)
        rows = [
            (i, datetime(2024, 1, 1, i, 0, 0), "click", float(i))
            for i in range(1, 9)
        ] + [(0, t0, "click", 1.0)]
        df = spark.createDataFrame(
            rows,
            "event_id: long, ts: timestamp_ntz, event_type: string, value: double",
        )
        whole = WIN.decayed_counts(df).collect()[0]
        a = WIN.decayed_counts(
            df.where("event_id % 2 = 0")
        ).collect()[0]
        b = WIN.decayed_counts(
            df.where("event_id % 2 = 1 or event_id = 0")
        ).collect()[0]
        # event 0 (the shared anchor at tmax) is in both halves; its
        # contribution is w6 = 1_000_000 and value 1.0 exactly once over
        assert whole.wsum6 == a.wsum6 + b.wsum6 - 1_000_000
        assert whole.decayed_value6 == (
            a.decayed_value6 + b.decayed_value6 - 1_000_000
        )


class TestKeySkewProfile:
    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "g: string, k: long")
        out = SKEW.key_skew_profile(df, "g", "k")
        return {r.g: r.asDict() for r in out.collect()}

    def test_known_gini(self, spark):
        # group A: key counts {10:1, 11:1, 12:2} -> N=4, K=3
        # sorted c=[1,1,2], Sum i*c_i = 1+2+6 = 9
        # gini = (2*9 - 4*4) / (3*4) = 2/12 -> 166667
        rows = [("A", 10), ("A", 11), ("A", 12), ("A", 12)]
        got = self._run(spark, rows)
        assert got["A"] == {
            "g": "A", "n_rows": 4, "n_keys": 3, "max_count": 2,
            "top1_share6": 500_000, "gini6": 166_667,
        }

    def test_uniform_is_zero(self, spark):
        rows = [("B", k) for k in range(5)] * 3
        got = self._run(spark, rows)
        assert got["B"]["gini6"] == 0
        assert got["B"]["top1_share6"] == 200_000

    def test_hot_key(self, spark):
        # one key owns 96 of 100 rows; 4 keys own 1 each
        rows = [("C", 0)] * 96 + [("C", k) for k in range(1, 5)]
        got = self._run(spark, rows)
        assert got["C"]["n_rows"] == 100 and got["C"]["n_keys"] == 5
        assert got["C"]["top1_share6"] == 960_000
        # sorted c=[1,1,1,1,96]: Sum i*c = 1+2+3+4+480 = 490
        # gini = (2*490 - 6*100)/(5*100) = 380/500 -> 760000
        assert got["C"]["gini6"] == 760_000
