"""Unit tests for the round-10 first-session operators (CUSUM
changepoints, watermark-drop audit, session sequences, Hilbert keys,
file skipping, synthetic-PPM dHash) — previously covered only by their
DuckDB oracles at one dataset; these pin the semantics against
independent Python models and hand-built cases."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import windows as WIN
from flink_invoice_processor_spark.tables import hilbert_value


def _ts(hour, minute=0):
    return datetime.datetime(2026, 1, 1, hour, minute)


class TestHilbertValue:
    def test_bijective_on_full_grid(self, spark):
        n = 16  # bits=4 -> 16x16 grid
        cells = [(x, y) for x in range(n) for y in range(n)]
        df = spark.createDataFrame(cells, "x int, y int")
        got = df.select(
            "x", "y", hilbert_value(F.col("x"), F.col("y"), bits=4).alias("d")
        ).collect()
        ds = [r.d for r in got]
        assert sorted(ds) == list(range(n * n))  # bijection onto [0, 256)

    def test_unit_step_adjacency(self, spark):
        # THE Hilbert property Z-order lacks: consecutive indices are
        # grid neighbors (|dx| + |dy| == 1), for the entire 4-bit curve
        n = 16
        cells = [(x, y) for x in range(n) for y in range(n)]
        df = spark.createDataFrame(cells, "x int, y int")
        got = df.select(
            "x", "y", hilbert_value(F.col("x"), F.col("y"), bits=4).alias("d")
        ).collect()
        by_d = {r.d: (r.x, r.y) for r in got}
        for d in range(n * n - 1):
            (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


def _py_cusum(counts):
    """Independent model of the implemented closed-window form."""
    n = len(counts)
    total = sum(counts)
    d = [n * c - total for c in counts]
    out = []
    p = 0
    pmin = pmax = None
    for dt in d:
        p += dt
        pmin = p if pmin is None else min(pmin, p)
        pmax = p if pmax is None else max(pmax, p)
        pos, neg = p - pmin, pmax - p
        out.append((pos, neg, pos > 3 * total or neg > 3 * total))
    return out


class TestCusumChangepoints:
    def _run(self, spark, counts):
        rows = []
        eid = 0
        for hour, c in enumerate(counts):
            for _ in range(c):
                rows.append(("k", _ts(hour), eid))
                eid += 1
        df = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long")
        return sorted(
            (
                (r.window_start, r.n_events, r.cusum_pos_num,
                 r.cusum_neg_num, r.is_changepoint)
                for r in WIN.cusum_changepoints(df).collect()
            )
        )

    def test_constant_rate_is_flat(self, spark):
        got = self._run(spark, [5, 5, 5, 5])
        assert all(pos == 0 and neg == 0 and not flag
                   for _, _, pos, neg, flag in got)

    def test_matches_python_model(self, spark):
        counts = [3, 4, 2, 9, 11, 10, 1, 2]
        got = self._run(spark, counts)
        want = _py_cusum(counts)
        assert [(p, n, f) for _, _, p, n, f in got] == want

    def test_sustained_shift_flags(self, spark):
        # rate 1/bucket for 6 buckets, then 9/bucket for 6: the drift
        # accumulates past h_mult * total on both sides of the shift
        counts = [1] * 6 + [9] * 6
        got = self._run(spark, counts)
        assert any(flag for *_, flag in got)
        # and the model agrees bucket for bucket
        assert [(p, n, f) for _, _, p, n, f in got] == _py_cusum(counts)


class TestWatermarkDropReport:
    def test_in_order_stream_drops_nothing(self, spark):
        rows = [("k", _ts(0, m), m) for m in range(10)]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long")
        r = WIN.watermark_drop_report(df, delay="10 minutes").collect()[0]
        assert (r.n_events, r.n_dropped, r.n_kept) == (10, 0, 10)
        assert r.max_late_us is None

    def test_late_element_drops_with_exact_lateness(self, spark):
        # arrival order: ts 0:00, 0:30, then a 0:05 straggler — the
        # watermark is 0:30 - 10min = 0:20, so 0:05 is 15 min late
        rows = [
            ("k", _ts(0, 0), 0),
            ("k", _ts(0, 30), 1),
            ("k", _ts(0, 5), 2),
        ]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long")
        r = WIN.watermark_drop_report(df, delay="10 minutes").collect()[0]
        assert (r.n_dropped, r.n_kept) == (1, 2)
        assert r.max_late_us == 15 * 60 * 1_000_000

    def test_element_never_drops_itself(self, spark):
        # a single element has no predecessors: no watermark, kept
        df = spark.createDataFrame(
            [("k", _ts(5), 0)], "event_type string, ts timestamp, event_id long"
        )
        r = WIN.watermark_drop_report(df).collect()[0]
        assert (r.n_dropped, r.n_kept) == (0, 1)


class TestSessionSequences:
    def test_gap_splits_and_orders(self, spark):
        rows = [
            (1, _ts(0, 0), 0, "view"),
            (1, _ts(0, 10), 1, "click"),
            (1, _ts(0, 20), 2, "buy"),
            (1, _ts(2, 0), 3, "view"),   # > 30 min gap: new session
            (2, _ts(0, 0), 4, "click"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )
        got = {
            (r.user_id, r.session_start, r.n_events, r.event_seq)
            for r in WIN.session_sequences(df).collect()
        }
        assert got == {
            (1, _ts(0, 0), 3, "view>click>buy"),
            (1, _ts(2, 0), 1, "view"),
            (2, _ts(0, 0), 1, "click"),
        }

    def test_boundary_exactly_at_gap_continues(self, spark):
        rows = [(1, _ts(0, 0), 0, "a"), (1, _ts(0, 30), 1, "b")]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )
        got = WIN.session_sequences(df).collect()
        assert len(got) == 1 and got[0].event_seq == "a>b"


class TestFileSkippingReport:
    def test_exact_stats_and_skip_decisions(self, spark):
        rows = [(1, 10), (1, 20), (2, 100), (2, 200), (3, 15)]
        df = spark.createDataFrame(rows, "f long, v long")
        rep = {
            r.file_id: r
            for r in CUR.file_skipping_report(
                df,
                F.col("f"),
                ["v"],
                {"mid": ("v", 12, 18), "high": ("v", 150, 300)},
            ).collect()
        }
        assert (rep[1].v_min, rep[1].v_max, rep[1].n_rows) == (10, 20, 2)
        # file 1 overlaps [12,18] -> cannot skip; disjoint from [150,300]
        assert not rep[1].skip_mid and rep[1].skip_high
        # file 2 disjoint from [12,18]; overlaps [150,300]
        assert rep[2].skip_mid and not rep[2].skip_high
        # file 3: single value 15 inside [12,18]
        assert not rep[3].skip_mid and rep[3].skip_high


def _py_dhash(i, w=9, h=7):
    def px(x, y):
        return int(
            hashlib.md5(f"px:{i}:{x}:{y}".encode()).hexdigest()[:2], 16
        )

    d = 0
    for y in range(h):
        for x in range(w - 1):
            if px(x + 1, y) > px(x, y):
                d |= 1 << (y * (w - 1) + x)
    return d


class TestImageDhashRoundTrip:
    def test_dhash_matches_pixel_formula_through_real_codec(self, spark):
        # the operator ENCODES the md5 pixels as a real PPM, decodes it
        # through the stdlib decoder, and differences neighbors; the
        # model computes the same bits straight from the formula — so
        # equality round-trips encoder + decoder byte-exactly
        from flink_invoice_processor_spark.functions.multimodal import (
            attach_synth_gray_ppm,
            image_dhash,
        )

        df = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
        got = {
            r.media_id: r.dhash
            for r in image_dhash(attach_synth_gray_ppm(df)).collect()
        }
        assert got == {i: _py_dhash(i) for i in range(5)}
