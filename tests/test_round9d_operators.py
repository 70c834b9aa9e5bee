"""Round-9 part-4 operator coverage: self-scored bigram-LM surprisal,
last-touch attribution, and the hour-of-week seasonality profile.

Every value assertion is hand-computed or replicated with the exact
integer/IEEE formula in the test; the same operators are
DuckDB-oracle-checked end to end in plans/queries.py.
"""

from __future__ import annotations

import math
from datetime import datetime

from flink_invoice_processor_spark.functions import text as TX
from flink_invoice_processor_spark.functions import windows as WIN


def _s6(n_pair: int, n_ctx: int, v: int) -> int:
    return round(-math.log2((n_pair + 1) / float(n_ctx + v)) * 1_000_000)


class TestLmSurprisal:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")],
            "doc_id: long, text: string",
        )
        got = {
            r.doc_id: (r.n_bigrams, r.surprisal6)
            for r in TX.lm_surprisal(df).collect()
        }
        # corpus LM: pairs (a,b):3 (b,a):1 (b,c):1; ctx a:3 b:2; V=3
        ab, ba, bc = _s6(3, 3, 3), _s6(1, 2, 3), _s6(1, 2, 3)
        assert got[1] == (3, (ab + ba + ab) // 3)
        assert got[2] == (2, (ab + bc) // 2)

    def test_boilerplate_scores_below_varied_text(self, spark):
        rows = [(i, "the same line repeated verbatim") for i in range(20)]
        rows += [(100, "entropy curates datasets beyond naive heuristics"),
                 (101, "quantization rounds embeddings toward codebooks")]
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        got = {r.doc_id: r.surprisal6 for r in TX.lm_surprisal(df).collect()}
        template_score = got[0]
        assert all(got[i] == template_score for i in range(20))
        # the one-off docs carry strictly higher surprisal
        assert got[100] > template_score and got[101] > template_score

    def test_short_docs_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, "a b")],
            "doc_id: long, text: string",
        )
        got = {r.doc_id for r in TX.lm_surprisal(df).collect()}
        assert got == {3}


class TestLastTouchAttribution:
    SCHEMA = (
        "event_id: long, ts: timestamp_ntz, user_id: long, "
        "event_type: string, value: double"
    )

    def test_channels(self, spark):
        t = lambda m: datetime(2024, 1, 1, 0, m, 0)
        rows = [
            (1, t(1), 1, "click", 0.0),
            (2, t(2), 1, "view", 0.0),
            (3, t(3), 1, "purchase", 10.0),   # last non-purchase: view
            (4, t(4), 1, "purchase", 5.0),    # purchase at t3 skipped
            (5, t(1), 2, "purchase", 2.0),    # nothing before -> direct
            (6, t(5), 2, "click", 0.0),       # after the purchase: no credit
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        got = {
            r.channel: (r.n_conversions, r.revenue_cents)
            for r in WIN.last_touch_attribution(df).collect()
        }
        assert got == {"view": (2, 1500), "direct": (1, 200)}

    def test_tie_broken_by_event_id(self, spark):
        # two candidate touches at the SAME timestamp: the (ts, event_id)
        # total order makes the higher event_id the last touch
        ts = datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            (1, ts, 1, "click", 0.0),
            (2, ts, 1, "view", 0.0),
            (3, datetime(2024, 1, 1, 0, 1, 0), 1, "purchase", 1.0),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        got = WIN.last_touch_attribution(df).collect()
        assert [(r.channel, r.revenue_cents) for r in got] == [("view", 100)]


class TestSeasonalityProfile:
    def test_grid_and_hot_flag(self, spark):
        # 2024-01-01 is a Monday (Spark dayofweek = 2); 2024-01-02 Tuesday
        mon5 = datetime(2024, 1, 1, 5, 30, 0)
        tue6 = datetime(2024, 1, 2, 6, 15, 0)
        wed7 = datetime(2024, 1, 3, 7, 45, 0)
        rows = (
            [(i, mon5, 1, "a", 0.0) for i in range(7)]
            + [(10, tue6, 1, "a", 0.0), (11, wed7, 1, "a", 0.0)]
        )
        df = spark.createDataFrame(
            rows,
            "event_id: long, ts: timestamp_ntz, user_id: long, "
            "event_type: string, value: double",
        )
        got = {
            (r.event_type, r.dow, r.hour): (r.cnt, r.share6, r.hot)
            for r in WIN.seasonality_profile(df, key_col="event_type").collect()
        }
        # total 9 over 3 cells, mean 3; hot threshold cnt > 2*3
        assert got[("a", 2, 5)] == (7, round(7e6 / 9), True)
        assert got[("a", 3, 6)] == (1, round(1e6 / 9), False)
        assert got[("a", 4, 7)] == (1, round(1e6 / 9), False)
