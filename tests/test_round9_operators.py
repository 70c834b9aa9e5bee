"""Round-9 operator coverage: snapshot-version diff, exact fixed-point
embedding covariance + driver-side PCA, and the adaptive per-source
quality percentile gate.

These are LLM-data-pipeline / warehouse extensions beyond the reference
surface (SURVEY.md §2 extension families); the contract under test is
our own documented one, cross-checked by the DuckDB oracles in
plans/queries.py (pca_project has no SQL form — its ground truth is the
pure-numpy PCA below).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Window, functions as F

from flink_invoice_processor_spark.functions import cdc as CDC
from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import similarity as SIM


class TestSnapshotDiff:
    SCHEMA = "k: long, a: string, b: long"

    def _diff(self, spark, old_rows, new_rows):
        old = spark.createDataFrame(old_rows, self.SCHEMA)
        new = spark.createDataFrame(new_rows, self.SCHEMA)
        rows = CDC.snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
        return {r.k: (r.change_type, r.changed_cols) for r in rows}

    def test_classification(self, spark):
        got = self._diff(
            spark,
            [(1, "x", 10), (2, "y", 20), (3, "z", 30)],
            [(2, "y", 25), (3, "z", 30), (4, "w", 40)],
        )
        assert got == {
            1: ("removed", ""),
            2: ("changed", "b"),
            4: ("added", ""),
        }  # key 3 identical -> dropped: output is churn-sized

    def test_null_safe_compare(self, spark):
        got = self._diff(
            spark,
            [(1, None, 10), (2, None, 20), (3, "x", 30)],
            [(1, None, 10), (2, "v", 20), (3, None, 30)],
        )
        # NULL vs NULL is not a change; NULL vs value is, in either direction
        assert got == {2: ("changed", "a"), 3: ("changed", "a")}

    def test_multi_column_change_lists_both(self, spark):
        got = self._diff(spark, [(1, "x", 10)], [(1, "y", 11)])
        assert got == {1: ("changed", "a,b")}

    def test_empty_old_is_all_added(self, spark):
        got = self._diff(spark, [], [(1, "x", 10)])
        assert got == {1: ("added", "")}

    def test_roundtrip_with_apply_changes(self, spark):
        """snapshot_diff is the inverse audit of apply_changes: the diff
        of (base, apply_changes(base, batch)) recovers the batch's key
        classes."""
        base = spark.createDataFrame(
            [(i, f"v{i}", i * 10) for i in range(8)], self.SCHEMA
        )
        changes = spark.createDataFrame(
            [("D", 0, "v0", 0), ("U", 1, "v1", 999), ("I", 100, "new", 1)],
            "op: string, k: long, a: string, b: long",
        )
        new = CDC.apply_changes(base, changes, ["k"]).drop("src")
        got = {
            r.k: r.change_type
            for r in CDC.snapshot_diff(base, new, ["k"], ["a", "b"]).collect()
        }
        assert got == {0: "removed", 1: "changed", 100: "added"}


def _quantize(vecs: np.ndarray) -> np.ndarray:
    # same per-row micro-unit rounding the operators apply
    return np.round(vecs.astype(np.float64) * 1_000_000)


class TestCovarianceMatrix:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id: long, embedding: array<float>",
        )

    def test_matches_numpy_population_covariance(self, spark):
        rng = np.random.RandomState(7)
        vecs = rng.uniform(-0.5, 0.5, size=(40, 6)).astype(np.float32)
        q = _quantize(vecs)
        n = q.shape[0]
        rows = SIM.covariance_matrix(self._emb(spark, vecs)).collect()
        assert len(rows) == 6 * 7 // 2
        for r in rows:
            num = n * np.dot(q[:, r.i], q[:, r.j]) - q[:, r.i].sum() * q[
                :, r.j
            ].sum()
            expect = int(num) // (n * n) if num >= 0 else -((-int(num)) // (n * n))
            assert r.n_vecs == n
            assert r.cov_e12 == expect, (r.i, r.j)

    def test_diagonal_equals_dim_stats_variance(self, spark):
        rng = np.random.RandomState(11)
        vecs = rng.uniform(-0.5, 0.5, size=(25, 4)).astype(np.float32)
        emb = self._emb(spark, vecs)
        diag = {
            r.i: r.cov_e12
            for r in SIM.covariance_matrix(emb).where("i = j").collect()
        }
        var = {r.dim: r.var_e12 for r in SIM.dim_stats(emb).collect()}
        assert diag == var

    def test_null_vectors_skipped(self, spark):
        emb = spark.createDataFrame(
            [(0, [0.1, 0.2]), (1, None), (2, [0.3, 0.4])],
            "vec_id: long, embedding: array<float>",
        )
        rows = SIM.covariance_matrix(emb).collect()
        assert all(r.n_vecs == 2 for r in rows) and len(rows) == 3


class TestPcaProject:
    def test_matches_numpy_pca(self, spark):
        rng = np.random.RandomState(3)
        # anisotropic cloud so the principal directions are unambiguous
        base = rng.normal(size=(60, 4)) * np.array([0.2, 0.05, 0.01, 0.002])
        vecs = (base @ np.linalg.qr(rng.normal(size=(4, 4)))[0]).astype(
            np.float32
        )
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id: long, embedding: array<float>",
        )
        got = {
            r.vec_id: (r.pc0, r.pc1)
            for r in SIM.pca_project(emb, k=2).collect()
        }

        # pure-numpy ground truth over the SAME quantized arithmetic
        q = _quantize(np.array([list(v) for v in vecs.astype(np.float64)]))
        n = q.shape[0]
        cov_e12 = (
            (n * (q.T @ q) - np.outer(q.sum(0), q.sum(0)))
            / (n * n)
        )  # float here is fine: the test tolerance absorbs the DIV truncation
        cov = cov_e12 * 1e-12
        mean = np.trunc(q.sum(0) / n) * 1e-6
        vals, eigvecs = np.linalg.eigh(cov)
        comps = eigvecs[:, ::-1][:, :2].T
        for c in range(2):
            if comps[c, np.abs(comps[c]).argmax()] < 0:
                comps[c] = -comps[c]
        expect = vecs.astype(np.float64) @ comps.T - mean @ comps.T
        for i in range(n):
            assert abs(got[i][0] - expect[i, 0]) < 2e-3
            assert abs(got[i][1] - expect[i, 1]) < 2e-3

    def test_top_component_carries_most_variance(self, spark):
        rng = np.random.RandomState(5)
        vecs = (rng.normal(size=(50, 3)) * np.array([1.0, 0.1, 0.01])).astype(
            np.float32
        )
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id: long, embedding: array<float>",
        )
        df = SIM.pca_project(emb, k=3)
        variances = [
            df.agg(F.variance(f"pc{c}")).first()[0] for c in range(3)
        ]
        assert variances[0] > variances[1] > variances[2]

    def test_k_out_of_range_raises(self, spark):
        emb = spark.createDataFrame(
            [(0, [0.1, 0.2]), (1, [0.3, 0.1])],
            "vec_id: long, embedding: array<float>",
        )
        import pytest

        with pytest.raises(ValueError):
            SIM.pca_project(emb, k=3)


class TestAdaptiveQualityCut:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id: long, text: string, source: string"
        )

    def _model(self, spark, rows, pct=75):
        """Pure-Python replica of the documented contract."""
        from flink_invoice_processor_spark.functions.text import (
            QC_CENTER,
            QC_MOD,
            quality_classifier,
        )

        cls = {
            r.doc_id: (r.n_toks, r.feat_sum)
            for r in quality_classifier(self._docs(spark, rows)).collect()
        }
        scores = {}
        for doc_id, text, source in rows:
            n_toks, feat_sum = cls[doc_id]
            s6 = (
                0
                if n_toks == 0
                else ((feat_sum + n_toks * QC_CENTER) * 1_000_000)
                // (n_toks * QC_MOD)
            )
            scores.setdefault(source, []).append((doc_id, s6))
        kept = {}
        for source, docs in scores.items():
            vals = sorted(s for _, s in docs)
            k = -(-len(vals) * pct // 100)  # ceil
            thr = vals[k - 1]
            for doc_id, s6 in docs:
                if s6 >= thr:
                    kept[doc_id] = (s6, thr)
        return kept

    def test_matches_model_and_keeps_ties(self, spark):
        rows = [
            (i, " ".join(f"w{j}" for j in range(i % 7 + 1)), f"s{i % 2}")
            for i in range(24)
        ]
        got = {
            r.doc_id: (r.score6, r.thr6)
            for r in CUR.adaptive_quality_cut(
                self._docs(spark, rows), pct=75
            ).collect()
        }
        assert got == self._model(spark, rows)

    def test_thresholds_are_per_source(self, spark):
        # source A: identical docs (threshold == their score, all kept);
        # source B: distinct texts -> its own, different threshold
        rows = [(i, "alpha beta gamma", "A") for i in range(4)] + [
            (10 + i, " ".join(f"z{j}{i}" for j in range(5)), "B")
            for i in range(4)
        ]
        out = CUR.adaptive_quality_cut(self._docs(spark, rows), pct=75)
        thr = {r.source: r.thr6 for r in out.select("source", "thr6").distinct().collect()}
        assert set(thr) == {"A", "B"}
        a_kept = out.where("source = 'A'").count()
        assert a_kept == 4  # all tied at the threshold -> all survive

    def test_empty_text_scores_zero(self, spark):
        rows = [(1, "", "A"), (2, "good common the and text", "A")]
        out = {
            r.doc_id: r.score6
            for r in CUR.adaptive_quality_cut(
                self._docs(spark, rows), pct=1
            ).collect()
        }
        # pct=1 keeps everything; the empty doc is present with score 0
        assert out[1] == 0 and len(out) == 2


class TestStandardize:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id: long, embedding: array<float>",
        )

    def test_matches_fixed_point_model(self, spark):
        rng = np.random.RandomState(13)
        vecs = rng.uniform(-0.5, 0.5, size=(30, 3)).astype(np.float32)
        emb = self._emb(spark, vecs)
        stats = {r.dim: r for r in SIM.dim_stats(emb).collect()}
        got = {
            (r.vec_id, r.dim): r.z4
            for r in SIM.standardize(emb).collect()
        }
        x = vecs.astype(np.float64)
        for i in range(30):
            for d in range(3):
                s = stats[d]
                expect = round(
                    (x[i, d] - float(s.mean_micro) * 1.0e-6)
                    / np.sqrt(float(s.var_e12) * 1.0e-12),
                    4,
                ) + 0.0
                assert got[(i, d)] == expect, (i, d)

    def test_dead_dimension_emits_zero(self, spark):
        emb = self._emb(
            spark, [[0.5, 0.1], [0.5, 0.2], [0.5, 0.3]]
        )
        z = {
            (r.vec_id, r.dim): r.z4 for r in SIM.standardize(emb).collect()
        }
        assert all(z[(i, 0)] == 0.0 for i in range(3))
        assert any(z[(i, 1)] != 0.0 for i in range(3))

    def test_standardized_moments(self, spark):
        rng = np.random.RandomState(17)
        vecs = (rng.normal(size=(200, 2)) * [5.0, 0.01]).astype(np.float32)
        out = (
            SIM.standardize(self._emb(spark, vecs))
            .groupBy("dim")
            .agg(
                F.round(F.avg("z4"), 2).alias("m"),
                F.round(F.stddev_pop("z4"), 1).alias("s"),
            )
            .collect()
        )
        for r in out:
            assert abs(r.m) <= 0.01 and abs(r.s - 1.0) <= 0.1


class TestKmvJoinSizeEstimate:
    def _sides(self, spark, a_keys, b_keys):
        a = spark.createDataFrame([(k,) for k in a_keys], "k: long")
        b = spark.createDataFrame([(k,) for k in b_keys], "k: long")
        return a, b

    def test_exact_side_and_small_case_exactness(self, spark):
        # < k distinct keys per side: sketches ARE the key sets, so the
        # common-key count is exact and the estimate hits the uniform-
        # multiplicity formula exactly
        a_keys = [1, 1, 2, 3, 4, 5]          # 6 rows, 5 distinct
        b_keys = [3, 4, 4, 5, 6]             # 5 rows, 4 distinct
        a, b = self._sides(spark, a_keys, b_keys)
        from flink_invoice_processor_spark.functions.sketches import (
            kmv_join_size_estimate,
        )

        row = kmv_join_size_estimate(a, b, F.col("k"), k=64).first()
        assert row.n_a == 6 and row.n_b == 5
        assert row.est_distinct_a == 5 and row.est_distinct_b == 4
        assert row.est_common_keys == 3  # {3,4,5}
        # exact join size: key 3 ->1*1, 4 ->1*2, 5 ->1*1 = 4
        assert row.exact_join_size == 4
        assert row.est_join_size == (3 * 6 * 5) // (5 * 4)

    def test_disjoint_sides(self, spark):
        a, b = self._sides(spark, [1, 2, 3], [10, 11])
        from flink_invoice_processor_spark.functions.sketches import (
            kmv_join_size_estimate,
        )

        row = kmv_join_size_estimate(a, b, F.col("k"), k=64).first()
        assert row.est_common_keys == 0
        assert row.est_join_size == 0
        assert row.exact_join_size == 0

    def test_saturated_sketch_reasonable(self, spark):
        # 500-key overlap out of 1000/800 distinct: the k=64 sketch is
        # saturated, so this pins the ESTIMATOR contract (within 50% on
        # uniform data), not exact equality
        a_keys = list(range(1000)) * 2          # 2000 rows
        b_keys = list(range(500, 1300))         # 800 rows
        a, b = self._sides(spark, a_keys, b_keys)
        from flink_invoice_processor_spark.functions.sketches import (
            kmv_join_size_estimate,
        )

        row = kmv_join_size_estimate(a, b, F.col("k"), k=64).first()
        assert row.exact_join_size == 500 * 2
        assert 0.5 * row.exact_join_size <= row.est_join_size <= 2.0 * row.exact_join_size


class TestDistributionDrift:
    def _emb(self, spark, vecs, start_id=0):
        return spark.createDataFrame(
            [(start_id + i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id: long, embedding: array<float>",
        )

    def test_identical_snapshots_have_zero_tvd(self, spark):
        rng = np.random.RandomState(23)
        vecs = rng.uniform(-0.5, 0.5, size=(40, 3)).astype(np.float32)
        a, b = self._emb(spark, vecs), self._emb(spark, vecs, 1000)
        rows = SIM.distribution_drift(a, b).collect()
        assert len(rows) == 3
        assert all(r.tvd6 == 0 and not r.drifted for r in rows)

    def test_shifted_dimension_flags(self, spark):
        rng = np.random.RandomState(29)
        base = rng.uniform(-0.1, 0.1, size=(60, 2)).astype(np.float32)
        shifted = base.copy()
        shifted[:, 1] += 0.4  # dim 1 drifts, dim 0 does not
        a, b = self._emb(spark, base), self._emb(spark, shifted, 1000)
        got = {r.dim: r for r in SIM.distribution_drift(a, b).collect()}
        assert not got[0].drifted and got[0].tvd6 < 50_000
        assert got[1].drifted and got[1].tvd6 > 500_000

    def test_matches_python_model(self, spark):
        rng = np.random.RandomState(31)
        va = rng.uniform(-0.6, 0.5, size=(25, 2))
        vb = rng.uniform(-0.4, 0.6, size=(35, 2))
        a = self._emb(spark, va.astype(np.float32))
        b = self._emb(spark, vb.astype(np.float32), 1000)
        got = {r.dim: (r.n_a, r.n_b, r.tvd6) for r in SIM.distribution_drift(a, b).collect()}

        def bins(vals):
            c = [0] * 12
            for x in vals:
                q = round(float(np.float32(x)) * 1_000_000)
                c[min(max((q + 600_000) // 100_000, 0), 11)] += 1
            return c

        for d in range(2):
            ca, cb = bins(va[:, d]), bins(vb[:, d])
            na, nb = sum(ca), sum(cb)
            tvd = sum(
                abs((ca[i] + 1) * 1_000_000 // (na + 12)
                    - (cb[i] + 1) * 1_000_000 // (nb + 12))
                for i in range(12)
            ) // 2
            assert got[d] == (na, nb, tvd)


class TestAdaptiveThresholdFromStream:
    def test_threshold_served_from_maintained_histogram(self, spark, tmp_path):
        """The adaptive gate's per-source threshold can be served from
        the STREAMING histogram rollup: maintain (source, score6)
        histograms across micro-batches, then rank-select — the served
        threshold equals the batch operator's."""
        from flink_invoice_processor_spark.functions.text import (
            QC_CENTER,
            QC_MOD,
            quality_classifier,
        )
        from flink_invoice_processor_spark.streaming.sketch_rollup import (
            histogram_rollup_writer,
            read_histogram_table,
        )

        rows = [
            (i, " ".join(f"w{j}{i % 5}" for j in range(i % 6 + 1)), f"s{i % 2}")
            for i in range(30)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id: long, text: string, source: string"
        )
        scored = (
            docs.select("source", "doc_id")
            .join(quality_classifier(docs), "doc_id")
            .selectExpr(
                "source",
                f"CASE WHEN n_toks = 0 THEN CAST(0 AS BIGINT)"
                f" ELSE ((feat_sum + n_toks * {QC_CENTER}) * 1000000)"
                f" div (n_toks * {QC_MOD}) END AS score6",
            )
        )
        table = str(tmp_path / "hist")
        writer = histogram_rollup_writer(
            F.col("source"), F.col("score6"), table
        )
        # two "micro-batches" by doc parity
        writer(scored.where("score6 % 2 = 0"), 0)
        writer(scored.where("score6 % 2 = 1"), 1)

        hist = read_histogram_table(spark, table)
        cum = hist.withColumn(
            "cum",
            F.sum("cnt").over(Window.partitionBy("k").orderBy("val")),
        )
        tot = hist.groupBy("k").agg(F.sum("cnt").alias("n"))
        served = {
            r.k: r.thr6
            for r in cum.join(tot, "k")
            .groupBy("k")
            .agg(
                F.min(
                    F.when(
                        F.col("cum") >= F.expr("(n * 75 + 99) div 100"),
                        F.col("val"),
                    )
                ).alias("thr6")
            )
            .collect()
        }

        batch = {
            r.source: r.thr6
            for r in CUR.adaptive_quality_cut(docs, pct=75)
            .select("source", "thr6")
            .distinct()
            .collect()
        }
        assert served == batch


class TestRound9EdgeCases:
    def test_covariance_single_vector(self, spark):
        emb = spark.createDataFrame(
            [(0, [0.25, -0.5])], "vec_id: long, embedding: array<float>"
        )
        rows = {(r.i, r.j): r for r in SIM.covariance_matrix(emb).collect()}
        assert len(rows) == 3
        # n=1: every covariance is exactly 0 (n*sum_xy == sum_x*sum_y)
        assert all(r.cov_e12 == 0 and r.n_vecs == 1 for r in rows.values())

    def test_standardize_single_vector_all_dead(self, spark):
        emb = spark.createDataFrame(
            [(0, [0.25, -0.5])], "vec_id: long, embedding: array<float>"
        )
        out = SIM.standardize(emb).collect()
        assert sorted((r.dim, r.z4) for r in out) == [(0, 0.0), (1, 0.0)]

    def test_drift_one_empty_side(self, spark):
        a = spark.createDataFrame(
            [(0, [0.1]), (1, [0.2])], "vec_id: long, embedding: array<float>"
        )
        b = a.where("vec_id < 0")  # empty
        rows = SIM.distribution_drift(a, b).collect()
        # grid comes from side a's dims; smoothing keeps every p6 finite
        assert len(rows) == 1
        r = rows[0]
        assert r.n_a == 2 and r.n_b == 0 and 0 <= r.tvd6 <= 1_000_000

    def test_adaptive_cut_single_doc_sources(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta", "A"), (2, "gamma delta", "B")],
            "doc_id: long, text: string, source: string",
        )
        out = CUR.adaptive_quality_cut(docs, pct=75).collect()
        # one doc per source: threshold == its own score -> kept
        assert sorted(r.doc_id for r in out) == [1, 2]
        assert all(r.score6 == r.thr6 for r in out)

    def test_snapshot_diff_both_empty(self, spark):
        e = spark.createDataFrame([], "k: long, a: string, b: long")
        assert CDC.snapshot_diff(e, e, ["k"], ["a", "b"]).count() == 0

    def test_pca_on_constant_vectors(self, spark):
        # zero covariance everywhere: projections are constant per
        # component (x.v - m.v == 0 for every row)
        emb = spark.createDataFrame(
            [(i, [0.25, -0.5, 0.1]) for i in range(5)],
            "vec_id: long, embedding: array<float>",
        )
        rows = SIM.pca_project(emb, k=2).collect()
        assert len(rows) == 5
        assert all(abs(r.pc0) < 1e-6 and abs(r.pc1) < 1e-6 for r in rows)

    def test_covariance_magnitude_guard_fires(self, spark):
        import pytest

        emb = spark.createDataFrame(
            [(0, [4000.0, 0.1]), (1, [1.0, 2.0])],
            "vec_id: long, embedding: array<float>",
        )
        with pytest.raises(Exception) as exc:
            SIM.covariance_matrix(emb).collect()
        assert "int64 pair-product range" in str(exc.value)

    def test_density_fine_planes_validation(self, spark):
        import pytest

        emb = spark.createDataFrame(
            [(0, [0.1, 0.2])], "vec_id: long, embedding: array<float>"
        )
        with pytest.raises(ValueError, match="fine_planes"):
            SIM.density_outliers(
                emb, dims=2, n_planes=10, max_bucket=5, fine_planes=4
            )

    def test_pca_empty_input_raises_named_error(self, spark):
        import pytest

        emb = spark.createDataFrame(
            [(0, None)], "vec_id: long, embedding: array<float>"
        )
        with pytest.raises(ValueError, match="no non-null vectors"):
            SIM.pca_project(emb, k=1)


class TestQuantileNormalize:
    def test_quantiles_match_empirical_cdf(self, spark):
        rows = [
            (i, " ".join(f"w{j}{i % 4}" for j in range(i % 5 + 1)), f"s{i % 2}")
            for i in range(20)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id: long, text: string, source: string"
        )
        out = CUR.quantile_normalize_scores(docs).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append((r.doc_id, r.score6, r.q6))
        for source, docs_ in by_src.items():
            scores = sorted(s for _, s, _ in docs_)
            n = len(scores)
            for _, s, q in docs_:
                cum = sum(1 for x in scores if x <= s)
                assert q == cum * 1_000_000 // n
        # every document present exactly once
        assert sorted(r.doc_id for r in out) == list(range(20))

    def test_max_score_gets_quantile_one(self, spark):
        docs = spark.createDataFrame(
            [(1, "aa bb", "A"), (2, "cc dd ee", "A"), (3, "ff", "A")],
            "doc_id: long, text: string, source: string",
        )
        out = {r.doc_id: (r.score6, r.q6) for r in
               CUR.quantile_normalize_scores(docs).collect()}
        top = max(out.values())[0]
        for doc_id, (s, q) in out.items():
            if s == top:
                assert q == 1_000_000


class TestOofTargetEncoding:
    def _rows(self, spark, data):
        from flink_invoice_processor_spark.functions import stats as ST

        df = spark.createDataFrame(
            data, "event_id: long, user_id: long, target: long, fold_id: long"
        )
        return {
            r.event_id: r.enc
            for r in ST.oof_target_encoding(
                df, "user_id", "fold_id", "target"
            ).collect()
        }

    def test_excludes_own_fold(self, spark):
        # user 1: fold 0 rows target 10, 20; fold 1 row target 100
        got = self._rows(
            spark,
            [(1, 1, 10, 0), (2, 1, 20, 0), (3, 1, 100, 1)],
        )
        # rows in fold 0 see only fold 1: enc = 100
        assert got[1] == 100 and got[2] == 100
        # row in fold 1 sees folds != 1: enc = (10+20) div 2 = 15
        assert got[3] == 15

    def test_single_fold_category_falls_back_to_prior(self, spark):
        # user 7 appears only in fold 0 -> prior over all rows NOT in
        # fold 0: targets 100, 200 -> 150
        got = self._rows(
            spark,
            [(1, 7, 1, 0), (2, 8, 100, 1), (3, 9, 200, 1)],
        )
        assert got[1] == 150
        # users 8/9 in fold 1, each seen only there -> prior over rows
        # not in fold 1: target 1 -> 1
        assert got[2] == 1 and got[3] == 1

    def test_enc_column_collision_raises(self, spark):
        import pytest
        from flink_invoice_processor_spark.functions import stats as ST

        df = spark.createDataFrame(
            [(1, 1, 1, 0)], "event_id: long, user_id: long, enc: long, f: long"
        )
        with pytest.raises(ValueError, match="enc"):
            ST.oof_target_encoding(df, "user_id", "f", "enc")
