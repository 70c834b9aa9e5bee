"""Unit tests for the round-11 batch operators (exact histogram-ranked
AUC, calibration report, co-occurrence lift, LSH blocking audit) —
pinned against independent Python models and hand-built cases, beyond
their DuckDB oracle rows at one dataset."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import dedup as DD
from flink_invoice_processor_spark.functions import stats as ST


def _py_auc6(pairs):
    """Independent midrank Mann-Whitney model over (score, label)."""
    from collections import Counter

    n_pos = sum(1 for _, l in pairs if l)
    n_neg = len(pairs) - n_pos
    if not n_pos or not n_neg:
        return None
    by_score = Counter(s for s, _ in pairs)
    pos_by_score = Counter(s for s, l in pairs if l)
    cum = 0
    rs2 = 0
    for s in sorted(by_score):
        c = by_score[s]
        rs2 += pos_by_score.get(s, 0) * (2 * cum + c + 1)
        cum += c
    return (rs2 - n_pos * (n_pos + 1)) * 1000000 // (2 * n_pos * n_neg)


class TestAucByGroup:
    def _run(self, spark, pairs):
        df = spark.createDataFrame(
            [("k", s, l) for s, l in pairs],
            "g string, score long, label boolean",
        )
        row = ST.auc_by_group(df, "g", "score", "label").collect()[0]
        return row.n_pos, row.n_neg, row.auc6

    def test_perfect_separation(self, spark):
        pairs = [(i, False) for i in range(5)] + [
            (10 + i, True) for i in range(5)
        ]
        assert self._run(spark, pairs) == (5, 5, 1000000)

    def test_perfectly_wrong(self, spark):
        pairs = [(10 + i, False) for i in range(5)] + [
            (i, True) for i in range(5)
        ]
        assert self._run(spark, pairs) == (5, 5, 0)

    def test_all_tied_is_half(self, spark):
        pairs = [(7, False)] * 4 + [(7, True)] * 6
        assert self._run(spark, pairs) == (6, 4, 500000)

    def test_single_class_is_null(self, spark):
        pairs = [(i, True) for i in range(4)]
        assert self._run(spark, pairs) == (4, 0, None)

    def test_matches_python_model_with_ties(self, spark):
        # deterministic messy case: scores collide across labels
        pairs = [((i * 7) % 5, (i * 3) % 4 == 1) for i in range(40)]
        assert self._run(spark, pairs)[2] == _py_auc6(pairs)

    def test_groups_independent(self, spark):
        rows = [("a", 1, False), ("a", 2, True),
                ("b", 2, True), ("b", 1, True), ("b", 3, False)]
        df = spark.createDataFrame(rows, "g string, score long, label boolean")
        got = {
            r.g: (r.n_pos, r.n_neg, r.auc6)
            for r in ST.auc_by_group(df, "g", "score", "label").collect()
        }
        assert got["a"] == (1, 1, 1000000)
        assert got["b"] == (2, 1, _py_auc6([(2, True), (1, True), (3, False)]))


class TestCalibrationReport:
    def test_hand_case(self, spark):
        # bin 0: two scores 40000/60000, one positive -> mean 50000,
        # rate 500000, gap 450000; bin 9: one score 990000, positive
        rows = [("k", 40000, False), ("k", 60000, True), ("k", 990000, True)]
        df = spark.createDataFrame(rows, "g string, s6 long, label boolean")
        got = {
            r.bin: (r.n, r.mean_conf6, r.pos_rate6, r.gap6)
            for r in ST.calibration_report(df, "g", "s6", "label").collect()
        }
        assert got[0] == (2, 50000, 500000, 450000)
        assert got[9] == (1, 990000, 1000000, 10000)

    def test_score_exactly_1e6_stays_in_top_bin(self, spark):
        df = spark.createDataFrame(
            [("k", 1000000, True)], "g string, s6 long, label boolean"
        )
        rows = ST.calibration_report(df, "g", "s6", "label").collect()
        assert len(rows) == 1 and rows[0].bin == 9
        assert rows[0].gap6 == 0


class TestCooccurrenceLift:
    def test_hand_case(self, spark):
        # 4 groups; A in 3, B in 2, {A,B} together in 2 -> lift =
        # 2*4/(3*2) = 4/3; repeated items in one group count once
        rows = [
            (1, "A"), (1, "B"), (1, "A"),
            (2, "A"), (2, "B"),
            (3, "A"),
            (4, "C"),
        ]
        df = spark.createDataFrame(rows, "g long, i string")
        got = {
            (r.item_a, r.item_b): (
                r.n_a, r.n_b, r.n_both, r.support6, r.confidence6, r.lift6
            )
            for r in ST.cooccurrence_lift(df, "g", "i").collect()
        }
        assert got[("A", "B")] == (3, 2, 2, 500000, 666666, 1333333)
        assert ("A", "C") not in got  # never co-occur

    def test_pair_ordering_canonical(self, spark):
        rows = [(1, "Z"), (1, "A")]
        df = spark.createDataFrame(rows, "g long, i string")
        pairs = ST.cooccurrence_lift(df, "g", "i").collect()
        assert len(pairs) == 1
        assert (pairs[0].item_a, pairs[0].item_b) == ("A", "Z")


class TestLshBlockingAudit:
    def test_counts_consistent_with_pipeline(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta "
        rows = [
            (1, base + "one two three"),
            (2, base + "one two four"),
            (3, "completely different text about engines and planners ok"),
            (4, base + "one two three"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        audit = DD.lsh_blocking_audit(docs).collect()[0]
        cand = DD.minhash_lsh_pairs(docs).count()
        ver = DD.lsh_verified_pairs(docs, threshold=0.5).count()
        assert audit.n_docs == 4
        assert audit.candidates_distinct == cand
        assert audit.n_verified == ver
        assert audit.n_verified <= audit.candidates_distinct
        assert audit.candidates_raw >= audit.candidates_distinct
        total_pairs = audit.n_docs * (audit.n_docs - 1) // 2
        assert audit.reduction6 == (
            1000000 - audit.candidates_distinct * 1000000 // total_pairs
        )
        assert audit.precision6 == (
            audit.n_verified * 1000000 // audit.candidates_distinct
        )
        # docs 1 and 4 are identical -> at least one verified pair
        assert audit.n_verified >= 1

    def test_bucket_profile_bounds(self, spark):
        rows = [(i, "the same text every single time here") for i in range(5)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        audit = DD.lsh_blocking_audit(docs).collect()[0]
        # identical docs: every band bucket holds all 5 docs
        assert audit.max_bucket == 5
        assert audit.candidates_distinct == 10
        assert audit.reduction6 == 0  # blocking avoided nothing
        assert audit.precision6 == 1000000


class TestRound11Part3Queries:
    """Consistency pins for the part-3 inline queries at sf0.001 (their
    value correctness is oracle-gated; these pin cross-row invariants a
    hash can't express)."""

    SF = "/root/testdata/sf0.001"

    def test_vocab_coverage_monotone(self, spark):
        from flink_invoice_processor_spark.plans.queries import QUERIES

        rows = {
            r.k: r
            for r in QUERIES["vocab_coverage_curve_docs"](
                spark, self.SF
            ).collect()
        }
        assert sorted(rows) == [100, 1000, 10000]
        # more vocabulary can only cover more mass, never less
        assert (
            rows[100].covered_tokens
            <= rows[1000].covered_tokens
            <= rows[10000].covered_tokens
            <= rows[100].total_tokens
        )
        # k beyond the vocabulary covers everything
        if rows[10000].n_vocab <= 10000:
            assert rows[10000].covered_tokens == rows[10000].total_tokens
            assert rows[10000].coverage6 == 1000000

    def test_column_profile_bounds(self, spark):
        from flink_invoice_processor_spark.plans.queries import QUERIES

        rows = QUERIES["column_profile_lineitem"](spark, self.SF).collect()
        assert {r.col_name for r in rows} == {
            "l_quantity", "l_extendedprice_cents", "l_returnflag",
            "l_linestatus", "l_shipdate",
        }
        n = rows[0].n
        for r in rows:
            assert r.n == n  # same table, same row count
            assert 0 <= r.n_null <= r.n
            assert 1 <= r.n_distinct <= r.n - r.n_null
            # min/max are rendered strings; compare in value space
            try:
                assert int(r.min_s) <= int(r.max_s)
            except ValueError:
                assert r.min_s <= r.max_s

    def test_forecast_baseline_shapes(self, spark):
        from flink_invoice_processor_spark.plans.queries import QUERIES

        rows = QUERIES["events_forecast_baseline"](spark, self.SF).collect()
        assert rows  # the test week is non-empty
        for r in rows:
            assert r.n_test > 0
            assert r.mae_seasonal_cents >= 0
            assert r.mae_global_cents >= 0

    def test_dataset_card_shares(self, spark):
        from flink_invoice_processor_spark.plans.queries import QUERIES

        rows = QUERIES["dataset_card_report"](spark, self.SF).collect()
        assert rows
        for r in rows:
            assert 0 < r.top_lang_share6 <= 1000000
            assert r.n_tokens <= r.n_chars  # tokens are >=1 char + space
