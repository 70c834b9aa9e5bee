"""Round-8 operator coverage: containment pairs, cross-source overlap,
embedding density outliers, and n-gram vocabulary OOV rate.

These are LLM-data-pipeline extensions beyond the reference surface (see
SURVEY.md §2 extension families); the contract under test is our own
documented one, cross-checked by the DuckDB oracles in plans/queries.py.
"""

from __future__ import annotations

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import dedup as DD
from flink_invoice_processor_spark.functions import similarity as SIM


class TestContainmentPairs:
    def _df(self, spark):
        long = " ".join(f"t{i}" for i in range(20))   # 18 3-gram shingles
        short = " ".join(f"t{i}" for i in range(5))   # 3 shingles, all in long
        return spark.createDataFrame(
            [(1, long), (2, short)], "doc_id: long, text: string"
        )

    def test_contained_doc_found(self, spark):
        rows = DD.containment_pairs(self._df(spark), n=3, threshold=0.9).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.doc_id_a, r.doc_id_b) == (1, 2)
        assert r.n_inter == 3
        assert r.containment == 1.0

    def test_jaccard_misses_the_same_pair(self, spark):
        """The motivating case: containment 1.0 but J = 3/18 — a Jaccard
        threshold that finds near-dups never finds containments."""
        assert DD.jaccard_pairs(self._df(spark), n=3, threshold=0.5).count() == 0

    def test_threshold_filters(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c x")],  # share 1 of 2 shingles each
            "doc_id: long, text: string",
        )
        rows = DD.containment_pairs(df, n=3, threshold=0.6).collect()
        assert rows == []  # containment = 1/2 < 0.6
        rows = DD.containment_pairs(df, n=3, threshold=0.5).collect()
        assert len(rows) == 1 and rows[0].containment == 0.5


class TestSourceOverlap:
    def test_exact_matrix(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b c d", "A"),   # shingles {a b c, b c d}
                (2, "b c d e", "A"),   # adds {c d e} -> A = 3 distinct
                (3, "b c d e", "B"),   # B = {b c d, c d e} = 2
            ],
            "doc_id: long, text: string, source: string",
        )
        rows = DD.source_overlap(df, n=3).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.source_a, r.source_b) == ("A", "B")
        assert r.n_shared == 2
        assert r.jaccard == round(2 / 3, 4)
        assert r.containment == 1.0

    def test_disjoint_sources_emit_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "A"), (2, "x y z", "B")],
            "doc_id: long, text: string, source: string",
        )
        assert DD.source_overlap(df, n=3).count() == 0


class TestDensityOutliers:
    def test_isolated_vectors_flagged_with_zero(self, spark):
        base = [1.0, 0.0, 0.0, 0.0]
        rows = [
            (1, base), (2, base), (3, base),          # tight cluster of 3
            (10, [-1.0, 0.0, 0.0, 0.0]),              # anti-parallel: cos -1
            (11, [0.0, 1.0, 0.0, 0.0]),               # orthogonal: cos 0
        ]
        emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
        out = {
            r.vec_id: r.n_neighbors
            for r in SIM.density_outliers(
                emb, dims=4, threshold=0.3, n_planes=4, min_neighbors=2
            ).collect()
        }
        # cluster members each have 2 qualifying neighbors -> not flagged
        assert 1 not in out and 2 not in out and 3 not in out
        # the isolated vectors come back through the left join with 0
        assert out[10] == 0 and out[11] == 0

    def test_null_vectors_dropped(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, None)], "vec_id: long, embedding: array<float>"
        )
        out = SIM.density_outliers(
            emb, dims=2, threshold=0.3, n_planes=2, min_neighbors=1
        ).collect()
        assert {r.vec_id for r in out} == {1}

    def test_adaptive_blocking_matches_legacy_when_under_cap(self, spark):
        """With every coarse bucket under max_bucket the adaptive path
        must produce the legacy single-level answer bit for bit."""
        import numpy as np

        rng = np.random.RandomState(37)
        rows = [
            (i, [float(x) for x in v])
            for i, v in enumerate(
                rng.uniform(-0.5, 0.5, size=(40, 4)).astype(np.float32)
            )
        ]
        emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
        legacy = sorted(
            map(
                tuple,
                SIM.density_outliers(
                    emb, dims=4, threshold=0.2, n_planes=4, min_neighbors=2
                ).collect(),
            )
        )
        adaptive = sorted(
            map(
                tuple,
                SIM.density_outliers(
                    emb, dims=4, threshold=0.2, n_planes=4, min_neighbors=2,
                    max_bucket=10_000, fine_planes=10,
                ).collect(),
            )
        )
        assert adaptive == legacy

    def test_adaptive_blocking_subdivides_oversized_buckets(self, spark):
        """A tight cluster that overflows max_bucket is re-blocked on the
        fine signature; identical vectors share every fine bit, so true
        duplicates keep their neighbors while the block size shrinks."""
        base = [1.0, 0.0, 0.0, 0.0]
        rows = [(i, base) for i in range(30)] + [(100, [0.0, 1.0, 0.0, 0.0])]
        emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
        out = {
            r.vec_id: r.n_neighbors
            for r in SIM.density_outliers(
                emb, dims=4, threshold=0.3, n_planes=4, min_neighbors=2,
                max_bucket=5, fine_planes=10,
            ).collect()
        }
        # the 30 identical vectors all share the same FINE bucket too ->
        # 29 neighbors each, none flagged; the orthogonal one is flagged
        assert set(out) == {100} and out[100] == 0


class TestOovRate:
    def test_exact_rates_and_tiebreak(self, spark):
        df = spark.createDataFrame(
            [
                (1, "x y x y", "s1"),  # bigrams: "x y","y x","x y"
                (2, "x y z", "s2"),    # bigrams: "x y","y z"
            ],
            "doc_id: long, text: string, source: string",
        )
        # corpus counts: "x y":3, "y x":1, "y z":1; vocab_size=2 keeps
        # "x y" then (tie on n=1, gram ASC) "y x" — so "y z" is OOV
        out = {r.source: r for r in CUR.oov_rate(df, vocab_size=2, n=2).collect()}
        assert out["s1"].n_grams == 3 and out["s1"].n_oov == 0
        assert out["s1"].oov_rate == 0.0
        assert out["s2"].n_grams == 2 and out["s2"].n_oov == 1
        assert out["s2"].oov_rate == 0.5

    def test_full_vocab_means_zero_oov(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "s1")], "doc_id: long, text: string, source: string"
        )
        r = CUR.oov_rate(df, vocab_size=100, n=2).collect()[0]
        assert r.n_oov == 0 and r.oov_rate == 0.0

    def test_short_docs_contribute_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, "solo", "s1"), (2, "", "s1"), (3, "a b", "s2")],
            "doc_id: long, text: string, source: string",
        )
        out = {r.source: r for r in CUR.oov_rate(df, vocab_size=5, n=2).collect()}
        assert "s1" not in out            # no doc reaches bigram length
        assert out["s2"].n_grams == 1


class TestDedupSurvivors:
    def test_quality_beats_canonical_label(self, spark):
        """The survivor is the BEST doc, not the oldest: cluster label is
        min doc_id but keep_id follows n_chars."""
        docs = spark.createDataFrame(
            [(1, 10), (2, 99), (3, 50), (7, 5)],
            "doc_id: long, n_chars: long",
        )
        clusters = spark.createDataFrame(
            [(1, 1, 3), (2, 1, 3), (3, 1, 3), (7, 7, 1)],
            "doc_id: long, cluster_id: long, cluster_size: long",
        )
        out = {r.doc_id: r for r in DD.dedup_survivors(docs, clusters).collect()}
        assert out[1].keep_id == 2 and not out[1].is_kept
        assert out[2].keep_id == 2 and out[2].is_kept
        assert out[3].keep_id == 2 and not out[3].is_kept
        assert out[7].keep_id == 7 and out[7].is_kept  # singleton keeps itself

    def test_tie_breaks_to_lowest_doc_id(self, spark):
        docs = spark.createDataFrame(
            [(5, 40), (9, 40)], "doc_id: long, n_chars: long"
        )
        clusters = spark.createDataFrame(
            [(5, 5, 2), (9, 5, 2)],
            "doc_id: long, cluster_id: long, cluster_size: long",
        )
        out = {r.doc_id: r for r in DD.dedup_survivors(docs, clusters).collect()}
        assert out[5].is_kept and out[9].keep_id == 5


class TestNoveltyRate:
    def test_first_seen_attribution(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b c d"),        # shingles {a b c, b c d} — both novel
                (2, "a b c d e"),      # {a b c, b c d, c d e} — 1 of 3 novel
                (3, "a b c"),          # {a b c} — 0 of 1 novel
            ],
            "doc_id: long, text: string",
        )
        out = {r.doc_id: r for r in DD.novelty_rate(df, n=3).collect()}
        assert (out[1].n_sh, out[1].n_novel, out[1].novelty_rate) == (2, 2, 1.0)
        assert (out[2].n_sh, out[2].n_novel) == (3, 1)
        assert out[2].novelty_rate == round(1 / 3, 4)
        assert (out[3].n_sh, out[3].n_novel, out[3].novelty_rate) == (1, 0, 0.0)

    def test_short_docs_absent(self, spark):
        df = spark.createDataFrame(
            [(1, "a b"), (2, "x y z")], "doc_id: long, text: string"
        )
        assert {r.doc_id for r in DD.novelty_rate(df, n=3).collect()} == {2}


class TestStopShingles:
    def test_df_ratio_and_rank(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c"), (3, "a b c x")],
            "doc_id: long, text: string",
        )
        rows = sorted(
            DD.stop_shingles(df, n=3, top_k=2).collect(), key=lambda r: r.rank
        )
        # df("a b c") = 3 of 3 docs; runners-up ("b c x") have df 1 —
        # rank 2 goes to the ASC-lowest shingle among the ties
        assert rows[0].shingle == "a b c" and rows[0].df == 3
        assert rows[0].df_ratio_6 == 1_000_000  # 3 * 1e6 div 3
        assert rows[1].df == 1 and rows[1].df_ratio_6 == 333_333  # trunc div
        assert len(rows) == 2  # top_k cut


class TestMinhashCalibration:
    def test_identical_docs_perfectly_calibrated(self, spark):
        text = " ".join(f"w{i}" for i in range(12))
        df = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id: long, text: string"
        )
        rows = DD.minhash_calibration(df, k=16, bands=4, n=3).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.doc_id_a, r.doc_id_b, r.n_shared_bands) == (1, 2, 4)
        assert r.n_matching == 16
        assert r.est_jaccard == 1.0 and r.exact_jaccard == 1.0
        assert r.abs_err == 0.0

    def test_zero_intersection_candidates_kept(self, spark):
        """A forced candidate pair with disjoint shingle sets must survive
        with exact 0 — the LSH false-positive row is the whole point."""
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "x y z w")], "doc_id: long, text: string"
        )
        cand = spark.createDataFrame(
            [(1, 2, 1)], "doc_id_a: long, doc_id_b: long, n_shared_bands: long"
        )
        rows = DD.minhash_calibration(df, k=16, bands=4, n=3, candidates=cand).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.exact_jaccard == 0.0
        assert r.abs_err == r.est_jaccard  # err is exactly the estimate


class TestDimStats:
    def test_exact_fixed_point_stats(self, spark):
        emb = spark.createDataFrame(
            [
                (1, [1.0, 0.5, 2.0]),
                (2, [3.0, 0.5, -1.0]),
                (3, None),  # null vectors are excluded entirely
            ],
            "vec_id: long, embedding: array<float>",
        )
        out = {r.dim: r for r in SIM.dim_stats(emb).collect()}
        # dim 0: values 1, 3 -> mean 2, var 1 (population)
        assert out[0].n_vals == 2
        assert out[0].mean_micro == 2_000_000
        assert out[0].var_e12 == 1_000_000_000_000
        assert (out[0].min_micro, out[0].max_micro) == (1_000_000, 3_000_000)
        assert not out[0].is_dead
        # dim 1: constant 0.5 -> dead, var 0
        assert out[1].mean_micro == 500_000 and out[1].var_e12 == 0
        assert out[1].is_dead
        # dim 2: values 2, -1 -> mean 0.5, var 2.25; trunc division exact
        assert out[2].mean_micro == 500_000
        assert out[2].var_e12 == 2_250_000_000_000

    def test_negative_mean_truncates_toward_zero(self, spark):
        emb = spark.createDataFrame(
            [(1, [-1.0]), (2, [0.0]), (3, [0.0])],
            "vec_id: long, embedding: array<float>",
        )
        r = SIM.dim_stats(emb).collect()[0]
        # -1000000 / 3 = -333333.33 -> trunc toward zero (matches DuckDB //)
        assert r.mean_micro == -333_333
