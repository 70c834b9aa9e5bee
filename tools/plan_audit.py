"""Plan-quality audit: sweep EVERY registered query's physical plan for
scale red flags.  The oracle gate proves values; this proves the plans
would survive a 1000-executor cluster.

Hard flags (exit 1):
- ``CartesianProduct``      — a non-broadcast cross join: O(n*m) shuffle work.
- ``BatchEvalPython``       — a row-at-a-time Python UDF in the plan (the
                              only sanctioned Python is Arrow-batched:
                              ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).

Soft flags (reported, not fatal — legitimate when the input is provably
tiny, e.g. the <=P-row partition-offset cumsum in sequence packing, a
bounds aggregate, or a global top-k):
- ``Exchange SinglePartition`` — a single-task funnel.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Prints one JSON line: {"queries": N, "hard": {...}, "soft": {...}}.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

HARD = ("CartesianProduct", "BatchEvalPython")
SOFT = ("Exchange SinglePartition",)

#: Soft flags that are correct-by-construction: the single partition only
#: ever sees a provably tiny input.  Anything NOT in this list is reported
#: as "soft_unexpected" and deserves a look.
ALLOWED_SOFT = {
    "events_gap_fill": "1-row global min/max bounds aggregate",
    "events_psi_drift": (
        "1-row global min-ts aggregate (the base/current period split),"
        " broadcast back — the (type, bin, period) histogram and"
        " everything after it stay bounded by |types| x n_bins rows"
    ),
    "events_value_histogram": "1-row global min/max bounds aggregate",
    "pack_sequences_docs": "<=P-row per-partition offset cumsum (P = shuffle partitions)",
    "vocab_index": "<=P-row per-partition offset cumsum (distributed_row_number)",
    "bm25_ndcg_report": "1-row corpus-stats aggregate (N, sum_dl) inside the BM25 leg, broadcast back — the per-term DCG/iDCG aggregates stay keyed on the |terms| domain",
    "corpus_shuffle_positions": "<=P-row per-partition offset cumsum (distributed_row_number)",
    "doc_lm_backoff": "1-row corpus-token-total aggregate (the backoff denominator n_tok_total), broadcast back — the LOO pair/context/unigram tables stay key-partitioned",
    "snm_verified_pairs": "<=P-row per-partition offset cumsum (distributed_row_number for the global sort-key rank) — candidate generation and shingle verification stay key-partitioned",
    "q6_revenue_filter": "single-row global aggregate (final partial merge)",
    "q14_promo_revenue": "single-row global aggregate (final partial merge)",
    "q11_important_stock": "1-row regional stock-value total (broadcast threshold)",
    "orders_cdc_apply": "1-row bad-op count for the lazy op-domain assert",
    "orders_snapshot_diff": (
        "1-row bad-op count for the lazy op-domain assert (the diff's"
        " 'new' side is built by apply_changes, which carries the guard)"
    ),
    "events_oof_target_encoding": (
        "1-row global-sum aggregate feeding the n_folds-row fold-excluded"
        " prior table (the fallback for categories seen only in their own"
        " fold), broadcast back — model-sized by construction"
    ),
    "events_join_size_estimate": (
        "sketch-sized/1-row model aggregates (two side counts, three"
        " <=k-row KMV min-sets, the match count, the exact-size sum)"
        " cross-joined into the single-row report — every funnel input"
        " is bounded by k=64 or is already one row"
    ),
    "q19_disjunctive_filter": "single-row global aggregate (final partial merge)",
    "q17_small_quantity_revenue": "single-row global aggregate (final partial merge)",
    "q15_top_supplier": "1-row scalar MAX aggregate, broadcast back",
    "q22_idle_wealthy_customers": "1-row scalar sum/count aggregate, broadcast back",
    "events_approx_topk": "single-row merge of mergeable sketch partials",
    "column_profile_lineitem": (
        "the profile IS one row pre-unpivot: a single global aggregate"
        " (5 columns x count/nulls/distinct/min/max via expand) whose"
        " final partial merge is the funnel"
    ),
    "vocab_coverage_curve_docs": (
        "1-row vocab totals aggregate + <=P-row per-partition offset"
        " cumsum (distributed_row_number) — the rank itself never"
        " funnels; the curve aggregate is 3 keys"
    ),
    "events_cooccurrence_lift": (
        "1-row n_groups count + vocabulary-bounded (<=|types|-row)"
        " marginals, broadcast back — the pair expansion stays keyed on"
        " the group column"
    ),
    "basket_brand_lift_orders": (
        "1-row n_groups count + vocabulary-bounded (<=|brands|-row)"
        " marginals, broadcast back — the pair expansion stays keyed on"
        " the order key"
    ),
    "lsh_blocking_audit_docs": (
        "the report IS one row: four 1-row aggregates (bucket profile,"
        " doc count, candidate count, verified count) cross-joined by"
        " broadcast; the only corpus-scale shuffle is the bucket"
        " histogram, which stays (band, hash)-keyed"
    ),
    "bm25_topk_docs": "1-row corpus-stats aggregate (N, sum_dl), broadcast back",
    "substring_search_docs": (
        "1-row kept-query-trigram count aggregate, broadcast back"
    ),
    "domain_mix_weights_docs": "1-row weight-sum over |sources| rows, broadcast back",
    "mix_sample_docs": (
        "1-row weight-sum over |sources| rows inside the allocation leg "
        "(domain_mix_weights), broadcast back — selection itself is a "
        "source-keyed window + broadcast join"
    ),
    "rfm_segments_customers": (
        "<=P-row per-partition offset cumsum (distributed_row_number x3)"
    ),
    "events_equidepth_histogram": (
        "<=P-row per-partition offset cumsum (distributed_row_number)"
    ),
    "events_hll_mergeability": (
        "single-row merge of mergeable HLL sketch partials (the point of "
        "the query)"
    ),
    "dq_checks_lineitem": (
        "1-row conditional-aggregate report (the whole output is 6 rows)"
    ),
    "pps_sample_docs": (
        "<=P-row per-partition offset cumsum (distributed_prefix_sum) "
        "+ 1-row stride aggregate"
    ),
    "compaction_bins_docs": (
        "<=P-row per-partition offset cumsum (distributed_prefix_sum) "
        "— the per-source rebase is a |sources|-row broadcast aggregate"
    ),
    "kmv_rollup_distinct": (
        "union-sketch k-smallest aggregate over <= n_segments*k kept "
        "hashes read from the MAINTAINED sketch table (sketch rows, "
        "never raw data — same funnel as events_kmv_distinct)"
    ),
    "events_kmv_distinct": (
        "union-sketch k-smallest aggregate over <= n_segments*k kept "
        "hashes (sketch rows, never raw data)"
    ),
    "dsir_weights_docs": (
        "1-row corpus-totals aggregate (T_raw, T_tgt), broadcast back"
    ),
    "pmi_bigrams_docs": "1-row token-count aggregate, broadcast back",
    "dsir_weights_wide_docs": (
        "1-row corpus-totals aggregate (T_raw, T_tgt), broadcast back — "
        "same shape as the int64 twin, DECIMAL arithmetic only"
    ),
    "pmi_bigrams_wide_docs": (
        "1-row token-count aggregate, broadcast back — same shape as the "
        "int64 twin, DECIMAL arithmetic only"
    ),
    "pq_rerank_topk_embeddings": (
        "Catalyst-injected runtime bloom filter (bloom_filter_agg over "
        "the broadcast shortlist side) — a 1-row optimizer artifact that "
        "PRUNES the corpus scan, not a data funnel"
    ),
    "training_mix_soft_dedup": (
        "Catalyst-injected runtime bloom filters (bloom_filter_agg over "
        "the doc_id membership sides of the soft-dedup semi-join and the "
        "decontamination anti-joins) — 1-row sketch aggregates that PRUNE "
        "the documents scan, not data funnels"
    ),
    "hybrid_rrf_docs": (
        "1-row corpus-stats aggregate (N, sum_dl) inside the BM25 leg, "
        "broadcast back"
    ),
    "chi2_bigrams_docs": (
        "1-row bigram-grand-total aggregate (n_tot for the 2x2 "
        "contingency margins), broadcast back — the per-bigram and "
        "per-margin counts stay key-partitioned"
    ),
    "contrastive_pairs_docs": (
        "1-row corpus-count aggregate (n for the modular draw) plus the "
        "<=P-row per-partition offset cumsum of distributed_prefix_sum, "
        "broadcast back — the draw resolution itself is a uniform "
        "equi-join on the dense index"
    ),
    "domain_term_lift_docs": (
        "1-row corpus-token-total aggregate (t_all for the lift "
        "denominator), broadcast back — term and class marginals stay "
        "key-partitioned"
    ),
    "stop_shingles_docs": (
        "1-row corpus-size aggregate broadcast against the <=top_k-row "
        "ranked output, plus the <=P-row per-partition offset cumsum of "
        "distributed_row_number ranking the shingle-frequency cut — the "
        "frequency aggregate itself stays key-partitioned"
    ),
    "vocab_oov_docs": (
        "<=P-row per-partition offset cumsum (distributed_row_number "
        "ranking the vocabulary cut) — the corpus-side n-gram explode "
        "stays key-partitioned and joins the <=vocab_size-row vocab by "
        "broadcast"
    ),
    "events_decayed_counts": (
        "1-row max-timestamp aggregate (the decay reference instant), "
        "broadcast-cross-joined back — the decayed sums themselves stay "
        "key-partitioned with map-side combine"
    ),
    "zipf_fit_docs": (
        "<=P-row per-partition offset cumsum (distributed_row_number "
        "ranking the top-100 cut) + the 1-row regression aggregate over "
        "<=100 rank/count points"
    ),
    "doc_lm_surprisal": (
        "1-row vocabulary-size distinct-count aggregate (the add-one "
        "smoothing denominator), broadcast back — the LM pair/context "
        "aggregates and the doc-bigram join stay key-partitioned"
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from flink_invoice_processor_spark.functions import dedup
    from flink_invoice_processor_spark.plans.queries import QUERIES
    from flink_invoice_processor_spark.session import get_spark

    # audit the LAZY plans: eager localCheckpoints in the pair generators
    # would present as bare scans of materialized RDDs, hiding every join
    # upstream from this sweep (and executing the pipelines besides).
    # Restored in the finally: this is a process-wide module toggle, and
    # leaving it off would hand lazy, unpersisted pair pipelines to any
    # later in-process user (e.g. check_oracles run from the same driver).
    prior_materialize = dedup.MATERIALIZE_PAIRS
    dedup.MATERIALIZE_PAIRS = False

    spark = get_spark("plan_audit", master="local[4]", shuffle_partitions=4)
    hard: dict[str, list[str]] = {}
    soft: dict[str, list[str]] = {}
    names = sorted(only or QUERIES)
    try:
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            # initial physical plan (pre-AQE) — shows the static strategy;
            # AQE only ever improves on it (broadcast promotion, coalescing)
            plan = df._jdf.queryExecution().executedPlan().toString()
            h = [f for f in HARD if f in plan]
            s = [f for f in SOFT if f in plan]
            if h:
                hard[name] = h
            if s:
                soft[name] = s
    finally:
        dedup.MATERIALIZE_PAIRS = prior_materialize
    unexpected = {n: f for n, f in soft.items() if n not in ALLOWED_SOFT}
    from gitinfo import git_head

    print(
        json.dumps(
            {
                "git_head": git_head(),
                "queries": len(names),
                "hard": hard,
                "soft_allowed": {
                    n: ALLOWED_SOFT[n] for n in soft if n in ALLOWED_SOFT
                },
                "soft_unexpected": unexpected,
            }
        )
    )
    spark.stop()
    if hard:
        sys.exit(1)


if __name__ == "__main__":
    main()
