"""Round-9 part-2 operators: JL sign projection + distortion QA, and
the file-compaction bin planner.  Values cross-checked against
independent Python-integer reimplementations (never the operator's own
arithmetic)."""

from __future__ import annotations

import pytest

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import similarity as SIM


class TestJlSignMatrix:
    def test_deterministic_and_shaped(self):
        a = SIM.jl_sign_matrix(8, 4)
        b = SIM.jl_sign_matrix(8, 4)
        assert a == b
        assert len(a) == 4 and all(len(r) == 8 for r in a)
        assert all(s in (-1, 1) for r in a for s in r)

    def test_rows_differ(self):
        # md5-derived rows must not collapse to one sign pattern
        a = SIM.jl_sign_matrix(64, 16)
        assert len({tuple(r) for r in a}) == 16


class TestJlProject:
    def test_values_match_integer_reimplementation(self, spark):
        rows = [(1, [0.5, -0.25, 0.125]), (2, [1.0, 2.0, -3.0])]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = {
            r.vec_id: list(r.proj)
            for r in SIM.jl_project(emb, in_dims=3, out_dims=4).collect()
        }
        signs = SIM.jl_sign_matrix(3, 4)
        for vid, vec in rows:
            q = [round(v * 1_000_000) for v in vec]
            want = [sum(s * x for s, x in zip(row, q)) for row in signs]
            assert out[vid] == want, vid

    def test_magnitude_guard_raises(self, spark):
        emb = spark.createDataFrame(
            [(1, [4000.0, 0.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="normalize"):
            SIM.jl_project(emb, in_dims=2, out_dims=2).collect()


class TestJlNormDistortion:
    def test_ratio_matches_integer_reimplementation(self, spark):
        rows = [(1, [0.5, -0.25, 0.125, 0.75]), (2, [0.1, 0.2, 0.3, 0.4])]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = {
            r.vec_id: r.ratio6
            for r in SIM.jl_norm_distortion(
                emb, in_dims=4, out_dims=3
            ).collect()
        }
        signs = SIM.jl_sign_matrix(4, 3)
        for vid, vec in rows:
            q = [round(v * 1_000_000) for v in vec]
            ys = [sum(s * x for s, x in zip(row, q)) for row in signs]
            st = sum(x * x for x in q)
            want = (1_000_000 * sum(y * y for y in ys)) // (3 * st)
            assert out[vid] == want, vid

    def test_zero_vectors_excluded(self, spark):
        emb = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        got = SIM.jl_norm_distortion(emb, in_dims=2, out_dims=2).collect()
        assert [r.vec_id for r in got] == [2]

    def test_identity_out_equals_in_distortion_near_one(self, spark):
        # with out_dims == in_dims the sign projection is an orthogonal-ish
        # rotation only in expectation — but ratio6 must still be finite,
        # positive, and exactly reproducible
        emb = spark.createDataFrame(
            [(i, [((i * 7 + j * 3) % 13 - 6) / 10.0 for j in range(8)])
             for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        first = sorted(
            map(tuple, SIM.jl_norm_distortion(emb, 8, 8).collect())
        )
        second = sorted(
            map(tuple, SIM.jl_norm_distortion(emb, 8, 8).collect())
        )
        assert first == second
        assert all(r[1] > 0 for r in first)


class TestCompactionBins:
    def test_hand_computed_bins_per_source(self, spark):
        docs = spark.createDataFrame(
            [
                ("a", 1, "w x y"),          # 3 tokens, ex=0  -> bin 0
                ("a", 2, "u v"),            # 2 tokens, ex=3  -> bin 0
                ("a", 3, "p q r s"),        # 4 tokens, ex=5  -> bin 1
                ("a", 4, "z"),              # 1 token,  ex=9  -> bin 1
                ("b", 5, "one two three"),  # source resets: ex=0 -> bin 0
                ("b", 6, "four five six"),  # ex=3 -> bin 0
                ("b", 7, "seven"),          # ex=6 -> bin 1
            ],
            "source string, doc_id long, text string",
        )
        out = {
            r.doc_id: (r.source, r.n_tokens, r.bin_id)
            for r in CUR.compaction_bins(docs, target_tokens=5).collect()
        }
        assert out == {
            1: ("a", 3, 0), 2: ("a", 2, 0), 3: ("a", 4, 1), 4: ("a", 1, 1),
            5: ("b", 3, 0), 6: ("b", 3, 0), 7: ("b", 1, 1),
        }

    def test_empty_text_counts_zero_tokens(self, spark):
        docs = spark.createDataFrame(
            [("a", 1, "  "), ("a", 2, "w x")],
            "source string, doc_id long, text string",
        )
        out = {
            r.doc_id: (r.n_tokens, r.bin_id)
            for r in CUR.compaction_bins(docs, target_tokens=2).collect()
        }
        assert out == {1: (0, 0), 2: (2, 0)}

    def test_bins_contiguous_and_filled_on_average(self, spark):
        # bin ids contiguous from 0 in doc order; the first b bins
        # together always hold >= b*target tokens (documents are never
        # split, so an individual bin undershoots only by its
        # predecessor's overshoot); bin assignment is monotone in
        # doc order
        docs = spark.createDataFrame(
            [("s", i, " ".join(["t"] * ((i * 13) % 7 + 1)))
             for i in range(1, 60)],
            "source string, doc_id long, text string",
        )
        rows = sorted(
            CUR.compaction_bins(docs, target_tokens=10).collect(),
            key=lambda r: r.doc_id,
        )
        assert [r.bin_id for r in rows] == sorted(r.bin_id for r in rows)
        bins: dict[int, int] = {}
        for r in rows:
            bins[r.bin_id] = bins.get(r.bin_id, 0) + r.n_tokens
        assert sorted(bins) == list(range(len(bins)))
        cum = 0
        for b in sorted(bins)[:-1]:
            cum += bins[b]
            assert cum >= (b + 1) * 10, (b, cum)
