"""Scaling evidence: run representative queries at two scale factors and
report the warm-time ratio against the data-size ratio.

A plan that scales linearly shows time ratio ≈ data ratio (10× here);
a plan with a quadratic join or a single-task funnel shows much worse.
Constant-ish times at both SFs mean fixed overhead dominates — fine.

Usage: python tools/scaling_check.py [small_sf_dir] [large_sf_dir]
                                     [xlarge_dir]
Prints one JSON line:
  {"sf_ratio": R, "queries": {name: {"small_s": a, "large_s": b,
   "ratio": b/a}}}

With a third directory (a 10x-sf0.1 set from
tools/make_scaling_decade.py) an extra DECADE section runs the
historically worst-scaling families one more decade up
(large -> xlarge), timed twice per point: ``*_build`` (first call in a
FRESH suite-cache scope — includes maintained-artifact builds: the
trigram index, memoized SimHash pairs) and the bare name (second call —
the steady state a long-running cluster pays).  ``ratio`` is the
steady-state ratio; ``ratio_build`` the build-inclusive one.

ATTRIBUTION STABILITY (round 9): every decade measurement is the MEDIAN
of ``--reps`` repetitions (default 3), and each build repetition runs in
its own suite-cache scope (``enable()`` clears the scope), so (a) a
family's build charge never depends on which OTHER family ran first and
warmed a shared artifact — the r8 harness shared one scope across the
whole section, which is exactly why committed build ratios oscillated
1.28x vs 3.29x between clean runs — and (b) one GC pause or JIT
compilation can no longer own a committed number.  The output embeds the
producing git sha so artifact identity is checkable from git alone.

PER-FAMILY DRIFT CONTROL (round 12, r11 verdict item 2): r11's paired
runs disagreed on 40/68 decade families while their START-of-run probes
agreed — the drift developed mid-run, where a start probe cannot see
it.  Two mechanisms now localize it:

- a ~0.2 s ``mini_probe`` runs BEFORE EVERY FAMILY and lands as
  ``probe_s`` in that family's dict, so scaling_agreement.py can
  compare probe-NORMALIZED seconds (a slowdown that hits minute 17 of
  run A and minute 4 of run B divides out instead of reading as
  disagreement);
- ``--order=sorted|reverse`` permutes the family iteration order, so a
  paired run executes each family at a DIFFERENT point in the run —
  mid-run interference then hits different families in the two runs
  instead of the same suite position twice.

ISOLATION COLUMN (round 12, r11 verdict item 9): every decade family
whose harness steady ratio exceeds ``--isolate`` (default 2.0) is
re-measured by ``tools/isolate_family.py`` in a FRESH subprocess/JVM
(nothing else run first) and the result lands as ``isolated_*`` keys in
the family dict — the hand-run tail-defense protocol of r9-r11, now
mechanical.  ``--isolate=0`` disables.

PARENT QUIESCE BEFORE ISOLATION (round 13, r12 ADVICE): the isolation
subprocesses used to launch while the harness's own Spark JVM (heap,
block store, page-cache residue from 60+ families) was still resident
and competing for memory/CPU — weaker isolation than the hand-run
protocol it mechanizes.  The parent session is now ``spark.stop()``ed
BEFORE any isolation subprocess starts, and the artifact records
``isolation_parent_quiesced`` so readers know which regime produced
the ``isolated_*`` numbers (r12's were parent-resident).

PROBE-ANOMALY RERUN (round 13, r12 verdict item 5): r12's run A had a
measurably slower middle stretch that per-family probes could bracket
but nothing could FIX in the run.  Now, when a family's pre-measurement
``probe_s`` exceeds ``--probe-anomaly`` (default 1.5) x the run's
post-warm baseline probe, the family is re-measured once immediately
(the bench.py warm-anomaly pattern applied here): the artifact keeps
the second attempt with ``probe_rerun: 1`` and the anomalous first
probe in ``probe_s_first_attempt`` (plus ``probe_still_anomalous: 1``
if the retry's probe is also above threshold — host interference
outlasting one family, visible instead of silent).
``--probe-anomaly=0`` disables.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

# one per family: scan-agg, shuffle join, banded dedup, window, iterative,
# prefix-sum, explode-agg, compressed-domain ANN, inverted-index search,
# iterative graph
REPRESENTATIVE = [
    "q6_revenue_filter",
    "q3_shipping_priority",
    "minhash_lsh_docs",
    "events_user_rolling",
    "dup_clusters_docs",
    "pack_sequences_docs",
    "corpus_top_tokens",
    "ivf_pq_sampled_topk_embeddings",
    "substring_search_docs",
    "pagerank_docs",
    # round-5 families: sketch heavy hitters, KMV distinct, passage dedup,
    # cluster-then-prune semantic dedup
    "events_heavy_hitters",
    "events_kmv_distinct",
    "boilerplate_strip_docs",
    "semantic_dedup_embeddings",
    # round-6 families: double self-join EXISTS/NOT-EXISTS (the
    # join-heaviest TPC-H shape), bloom build+probe, two-window SCD2
    "q21_waiting_suppliers",
    "events_bloom_membership",
    "events_scd2_history",
    # exact order statistics (histogram rank selection): two histogram
    # passes + an outlier-count rescan — state bounded by value-domain
    # cardinality, so time should track the raw scan, not the group sizes
    "events_value_outliers",
    # round-8 families: containment (shares the Jaccard core but is new
    # surface), source-overlap matrix (bounded-fan-out self-join),
    # vocabulary coverage (broadcast top-N cut), LSH density outliers
    "containment_pairs_docs",
    "source_overlap_docs",
    "vocab_oov_docs",
    "embedding_density_outliers",
    # round-8 part 2: first-seen novelty (min-agg + probe join), MinHash
    # estimator calibration (candidate-keyed exact side + signature join),
    # per-dimension embedding QA (one keyed aggregate, dims keys)
    "novelty_rate_docs",
    "minhash_calibration_docs",
    "embedding_dim_stats",
    # round-9 families: full-outer snapshot diff (churn-sized output),
    # per-row d^2 pair expansion into one keyed aggregate, and the
    # histogram-rank adaptive quality gate (token explode + score
    # histogram, shuffle bounded by the score domain)
    "orders_snapshot_diff",
    "embedding_covariance",
    "adaptive_quality_cut_docs",
    # round-9 part 2: broadcast-stats whitening (one corpus scan) and
    # the sketch-only join-size estimate (cost = two scans + k-row
    # reductions; its exact calibration column is the only key shuffle)
    "embedding_standardize",
    "events_join_size_estimate",
    # drift monitoring: two (dim, bin)-keyed aggregates + a grid join
    "embedding_drift_tvd",
    # round-9 part 4: histogram-bounded quantile calibration and the
    # two-aggregate out-of-fold encoder
    "quality_quantile_norm_docs",
    "events_oof_target_encoding",
    # round-8 build: frontier-peel kcore and the one-scan matryoshka
    # truncation-fidelity report
    "kcore_docs",
    "embedding_matryoshka_fidelity",
    "events_rate_spikes",
    # round-9 families: the composites carrying the soft-dedup and fuzzy
    # decontamination stages (documents input only)
    "corpus_curation_fuzzy",
    "training_mix_soft_dedup",
    # round-9 part 2: one-scan JL projection QA and the two-phase
    # prefix-sum compaction planner
    "embedding_jl_distortion",
    "compaction_bins_docs",
    # round-9 part 3: per-doc entropy (explode + two keyed aggs), the
    # top-100 Zipf regression (vocab-bounded agg + k-row tail), decayed
    # feature sums (one scan, map-side combine), and the counts-of-counts
    # skew profile (domain-bounded histogram windows)
    "word_entropy_docs",
    "zipf_fit_docs",
    "events_decayed_counts",
    "events_key_skew_profile",
    # round-9 part 4: the self-scored bigram-LM quality stage (two
    # vocab-bounded aggregates + a doc-bigram equi-join), last-touch
    # attribution (one user-keyed window), and the hour-of-week grid
    "doc_lm_surprisal",
    "events_attribution",
    "events_seasonality",
    # round-10 families: CUSUM closed-form changepoints (two keyed
    # windows over hourly buckets), watermark-drop audit (one keyed
    # arrival window), sessionization to action strings, Hilbert keys
    # (pure map), min/max file skipping (file-keyed aggregate),
    # leave-one-source-out backoff LM (multi-aggregate join), nDCG eval
    # (posting-list windows), dHash near-dup over the real stdlib codec
    # (mapInPandas encode+decode, banded Hamming join)
    "events_cusum_changepoints",
    "events_watermark_drops",
    "events_session_sequences",
    "events_hilbert_keys",
    "events_minmax_pruning",
    "doc_lm_backoff",
    "bm25_ndcg_report",
    "events_minmax_pruning",
    "doc_lm_backoff",
    "bm25_ndcg_report",
    "image_dhash_neardup",
    # round-11 families: the seven maintained-state invariants (each
    # builds its store through the real maintenance path per call, so
    # the timing is build-inclusive by construction), classifier-eval
    # statistics (histogram-ranked AUC, calibration bins), grouped
    # median/MAD, association lift (vocabulary-bounded pair expansion),
    # and the LSH blocking audit (bucket histogram + 1-row counts)
    "cdc_chunk_store_served",
    "matview_hourly_served",
    "histogram_rollup_served",
    "trigram_index_served",
    "scd2_store_served",
    "cdc_snapshot_served",
    "drift_store_served",
    "auc_report_docs",
    "calibration_report_docs",
    "events_value_mad",
    "events_cooccurrence_lift",
    "basket_brand_lift_orders",
    "lsh_blocking_audit_docs",
    "curation_store_served",
    "vocab_coverage_curve_docs",
    "column_profile_lineitem",
    "events_forecast_baseline",
    "dataset_card_report",
    # round-12 families: histogram-ranked exact Gini concentration,
    # the zero-filled hours x types correlation matrix, and the PSI
    # drift report
    "length_gini_docs",
    "events_type_hourly_corr",
    "events_psi_drift",
]


# the three families SCALING_r05 named as the worst scalers; they read
# only documents/events, which make_scaling_decade.py synthesizes at 10x
DECADE_FAMILIES = [
    "substring_search_docs",
    "events_heavy_hitters",
    # the corpus-scale PageRank (tight Hamming<=3 graph): the dense
    # pagerank_docs graph definition is itself near-quadratic in docs and
    # exhausts one node's heap at the decade point — that finding is the
    # round-6 scaling result for the dense variant, recorded in its
    # docstring; the linear-iteration claim is proven on this one
    "pagerank_tight_docs",
    # relational / window / curation / dedup / ANN families, once the
    # generator covers customer/orders/lineitem/embeddings too
    "q6_revenue_filter",
    "q3_shipping_priority",
    "events_user_rolling",
    "pack_sequences_docs",
    "minhash_lsh_docs",
    "dup_clusters_docs",
    "semantic_dedup_embeddings",
    "ivf_pq_sampled_topk_embeddings",
    # exact order statistics over the decade events set (reads events only)
    "events_value_outliers",
    # round-7 rewrite (window counts on one orderkey exchange, replacing
    # the semi/anti self-join pair): pin the decade evidence for the fix
    "q21_waiting_suppliers",
    # round-8 families (documents/embeddings inputs only)
    "containment_pairs_docs",
    "source_overlap_docs",
    "vocab_oov_docs",
    "embedding_density_outliers",
    "novelty_rate_docs",
    "minhash_calibration_docs",
    "embedding_dim_stats",
    # round-9 families (orders/documents/embeddings/events inputs only)
    "orders_snapshot_diff",
    "embedding_covariance",
    "adaptive_quality_cut_docs",
    "embedding_standardize",
    "events_join_size_estimate",
    "embedding_drift_tvd",
    "quality_quantile_norm_docs",
    "events_oof_target_encoding",
    # round-8 build: the frontier-peel kcore (iterative graph, documents
    # input) and the one-scan matryoshka fidelity report
    "kcore_docs",
    "embedding_matryoshka_fidelity",
    # round-8 part 2: keyed hourly window over aggregate rows
    "events_rate_spikes",
    # round-9 composites (documents input only)
    "corpus_curation_fuzzy",
    "training_mix_soft_dedup",
    # round-9 part 2 (embeddings/documents inputs)
    "embedding_jl_distortion",
    "compaction_bins_docs",
    # round-9 part 3 (documents/events inputs)
    "word_entropy_docs",
    "zipf_fit_docs",
    "events_decayed_counts",
    "events_key_skew_profile",
    # round-9 part 4 (documents/events inputs)
    "doc_lm_surprisal",
    "events_attribution",
    "events_seasonality",
    # round-10 (documents/events inputs only)
    "events_cusum_changepoints",
    "events_watermark_drops",
    "events_session_sequences",
    "events_hilbert_keys",
    "events_minmax_pruning",
    "doc_lm_backoff",
    "bm25_ndcg_report",
    "image_dhash_neardup",
    # round-11 (all tables are decade-synthesized)
    "cdc_chunk_store_served",
    "matview_hourly_served",
    "histogram_rollup_served",
    "trigram_index_served",
    "scd2_store_served",
    "cdc_snapshot_served",
    "drift_store_served",
    "auc_report_docs",
    "calibration_report_docs",
    "events_value_mad",
    "events_cooccurrence_lift",
    "basket_brand_lift_orders",
    "lsh_blocking_audit_docs",
    "curation_store_served",
    "vocab_coverage_curve_docs",
    "column_profile_lineitem",
    "events_forecast_baseline",
    "dataset_card_report",
    # round-12 (documents/events inputs only)
    "length_gini_docs",
    "events_type_hourly_corr",
    "events_psi_drift",
]


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    order = "asis"
    isolate = 2.0
    probe_anomaly = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--order="):
            order = a.split("=", 1)[1]
        elif a.startswith("--isolate="):
            isolate = float(a.split("=", 1)[1])
        elif a.startswith("--probe-anomaly="):
            probe_anomaly = float(a.split("=", 1)[1])
    small = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    large = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    xlarge = args[2] if len(args) > 2 else None

    def _ordered(names: list[str]) -> list[str]:
        # dedup first (the hand-maintained lists carry a few repeats;
        # re-measuring a family twice only wastes wall-clock — the dict
        # write made the second measurement win anyway)
        uniq = list(dict.fromkeys(names))
        if order == "sorted":
            return sorted(uniq)
        if order == "reverse":
            return sorted(uniq, reverse=True)
        return uniq

    from flink_invoice_processor_spark.functions import suite_cache
    from flink_invoice_processor_spark.plans.queries import QUERIES
    from flink_invoice_processor_spark.session import get_spark, mini_probe

    spark = get_spark("scaling_check")

    # host-drift calibration probe (VERDICT r9 item 3): the part-4 r9
    # scaling pair's run-to-run disagreement was dominated by host drift
    # (6/47 families within ±20% across byte-identical code); the probe
    # gives the mechanical denominator for cross-session comparisons
    from flink_invoice_processor_spark.session import calibration_probe

    probe = calibration_probe(spark)
    # warm the mini-probe's plan shape once: its first execution pays
    # ~4 s of whole-stage-codegen JIT that would otherwise land in the
    # first family's probe_s and wreck that family's normalization
    mini_probe(spark)
    # the run's baseline for the probe-anomaly rerun rule: a post-warm
    # probe taken before any family has run
    probe_baseline = mini_probe(spark)

    def _guarded(measure) -> dict[str, float]:
        """Measure one family with the probe-anomaly rerun rule: probe,
        measure; if the probe exceeded the anomaly threshold, re-probe
        and re-measure once and keep the retry (annotated)."""
        p = mini_probe(spark)
        times = measure()
        times["probe_s"] = p
        if probe_anomaly > 0 and p > probe_anomaly * probe_baseline:
            p2 = mini_probe(spark)
            retry = measure()
            retry["probe_s"] = p2
            retry["probe_s_first_attempt"] = p
            retry["probe_rerun"] = 1
            if p2 > probe_anomaly * probe_baseline:
                retry["probe_still_anomalous"] = 1
            return retry
        return times

    out: dict[str, dict[str, float]] = {}
    for name in _ordered(REPRESENTATIVE):
        fn = QUERIES[name]

        def measure_rep(fn=fn) -> dict[str, float]:
            times: dict[str, float] = {}
            for label, sf_dir in (("small_s", small), ("large_s", large)):
                fn(spark, sf_dir).count()  # warm (codegen + footers)
                samples = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).count()
                    samples.append(time.perf_counter() - t0)
                times[label] = round(_median(samples), 3)
            times["ratio"] = round(
                times["large_s"] / max(times["small_s"], 1e-9), 2
            )
            return times

        out[name] = _guarded(measure_rep)

    decade: dict[str, dict[str, float]] = {}
    if xlarge:
        try:
            for name in _ordered(DECADE_FAMILIES):
                fn = QUERIES[name]

                def measure_decade(fn=fn) -> dict[str, float]:
                    times: dict[str, float] = {}
                    for label, sf_dir in (
                        ("large", large), ("xlarge", xlarge)
                    ):
                        builds, steadies = [], []
                        for _ in range(reps):
                            # fresh scope per repetition: THIS family pays
                            # its own full artifact build every time,
                            # regardless of what any other family (or
                            # earlier rep) warmed
                            suite_cache.enable()
                            t0 = time.perf_counter()
                            fn(spark, sf_dir).count()
                            builds.append(time.perf_counter() - t0)
                            t0 = time.perf_counter()
                            fn(spark, sf_dir).count()  # steady state
                            steadies.append(time.perf_counter() - t0)
                        times[f"{label}_s_build"] = round(_median(builds), 3)
                        times[f"{label}_s"] = round(_median(steadies), 3)
                    times["ratio"] = round(
                        times["xlarge_s"] / max(times["large_s"], 1e-9), 2
                    )
                    times["ratio_build"] = round(
                        times["xlarge_s_build"]
                        / max(times["large_s_build"], 1e-9),
                        2,
                    )
                    # absolute seconds the decade costs: at sub-2 s
                    # large-side absolutes the RATIO is hypersensitive to
                    # how JIT-warm the baseline happens to be (the same
                    # query reads 1.6 s or 2.7 s at sf0.1 depending on
                    # session history), while the data-driven delta stays
                    # stable — report both
                    times["delta_s"] = round(
                        times["xlarge_s"] - times["large_s"], 3
                    )
                    return times

                decade[name] = _guarded(measure_decade)
        finally:
            suite_cache.disable()

    # quiesce the parent JVM BEFORE any isolation subprocess (r12
    # ADVICE): with the harness session still resident, its heap /
    # block store / page-cache residue competes with the "fresh" JVM
    # and weakens the isolation the column claims
    spark.stop()

    if decade and isolate > 0:
        # r11 verdict item 9: tail members (harness steady ratio above
        # the threshold) get a fresh-JVM isolation measurement so "the
        # ratio doesn't reproduce in isolation" re-proves itself every
        # round.  Subprocess per family: the whole point is a session
        # with NO suite history (JIT state, block store, page cache
        # residue from 60+ earlier families).
        import os
        import subprocess

        tail = [n for n, t in decade.items() if t["ratio"] > isolate]
        for name in tail:
            cmd = [sys.executable,
                   os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "isolate_family.py"),
                   name, large, xlarge, f"--reps={reps}"]
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=900
                )
                iso = json.loads(proc.stdout.strip().splitlines()[-1])
                decade[name]["isolated_large_s"] = iso["large_s"]
                decade[name]["isolated_xlarge_s"] = iso["xlarge_s"]
                decade[name]["isolated_ratio"] = iso["ratio"]
                decade[name]["isolated_probe_s"] = iso["probe_s"]
            except Exception as e:  # noqa: BLE001 - isolation is evidence,
                # not a gate; record the failure instead of killing the run
                decade[name]["isolated_error"] = (
                    f"{type(e).__name__}: {e}"[:200]
                )

    def _sf(d: str) -> float:
        try:
            return float(d.rstrip("/").rsplit("sf", 1)[-1])
        except ValueError:
            return float("nan")

    ratio = round(_sf(large) / _sf(small), 2)
    from gitinfo import git_head

    result = {
        "git_head": git_head(),
        "calibration": probe,
        "probe_baseline_s": round(probe_baseline, 4),
        "reps": reps,
        "order": order,
        "isolate_threshold": isolate,
        "isolation_parent_quiesced": True,
        "probe_anomaly_factor": probe_anomaly,
        "sf_ratio": ratio,
        "queries": out,
    }
    if decade:
        result["decade"] = {"sf_ratio": 10.0, "queries": decade}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
