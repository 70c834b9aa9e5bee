"""Physical-plan assertions for the properties README claims at 100 TB.

These pin the *optimizer outcomes*, not the results: predicate pushdown and
column pruning reach the parquet scan, dimension joins broadcast, the hot
relational path stays inside whole-stage codegen, and no Python evaluation
node appears anywhere on the reference surface (Arrow kernels are allowed
only in the similarity/multimodal extensions).
"""

from __future__ import annotations

import re

from flink_invoice_processor_spark.plans.queries import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _final_plan(df) -> str:
    # under AQE the codegen-annotated final plan only exists post-execution,
    # and only on this DataFrame's own QueryExecution (count() would make a
    # new one)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_scan_pushdown_and_pruning(spark, sf_dir):
    plan = _final_plan(QUERIES["q1_pricing_summary"](spark, sf_dir))
    # the l_shipdate filter reaches the parquet reader
    assert re.search(r"PushedFilters: \[.*l_shipdate", plan)
    # column pruning: q1 never touches keys, so the scan must not read them
    read_schema = re.search(r"ReadSchema: (\S+)", plan).group(1)
    assert "l_quantity" in read_schema
    for unused in ("l_orderkey", "l_partkey", "l_suppkey"):
        assert unused not in read_schema
    # whole-stage codegen spans render as "*(n)" operator prefixes
    assert re.search(r"\*\(\d+\) HashAggregate", plan)
    assert re.search(r"\*\(\d+\) Filter", plan)


def test_dimension_joins_broadcast(spark, sf_dir):
    for name in ("q3_shipping_priority", "q5_local_supplier_volume"):
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        # the fact table is never broadcast: no plan should build a
        # broadcast relation from lineitem's full row
        assert "SortMergeJoin" not in plan or name == "q5_local_supplier_volume"


def test_reference_surface_has_no_python_eval(spark, sf_dir):
    """SURVEY §2.6: the reference surface needs zero Python UDFs — every
    transform is Catalyst expressions.  A Python eval node here means a
    regression off the JVM fast path."""
    for name in (
        "request_parse_explode",
        "request_validation_split",
        "retry_backoff_schedule",
        "response_status_derivation",
        "response_batch_envelope",
        "response_dedup",
        "response_topic_routing",
        "heterogeneous_union",
        "json_extract_keying",
    ):
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_text_analysis_has_no_python_eval(spark, sf_dir):
    for name in ("token_count_docs", "doc_quality", "language_id_docs",
                 "doc_fingerprint", "exact_dedup_docs"):
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_events_scan_prunes_props(spark, sf_dir):
    """The wide `props` JSON column must never be read by queries that
    don't use it — at 100 TB it dominates the table's bytes."""
    for name in ("events_tumbling", "events_sessionization",
                 "events_purchase_click_window", "events_approx_stats"):
        plan = _plan(QUERIES[name](spark, sf_dir))
        for m in re.finditer(r"ReadSchema: (\S+)", plan):
            assert "props" not in m.group(1), name


def test_plan_audit_sample_has_no_hard_flags(spark, sf_dir):
    """Representative sweep of tools/plan_audit.py's hard flags: no
    cartesian products, no row-at-a-time Python UDFs.  (The full registry
    sweep is `python tools/plan_audit.py` — kept out of pytest for time.)"""
    from flink_invoice_processor_spark.plans.queries import QUERIES

    sample = [
        "training_mix_pipeline", "kmeans_clusters", "fuzzy_prefix_pairs",
        "q10_returned_items", "minhash_lsh_docs", "embedding_cosine_topk",
        "events_retention_hourly", "decontaminate_docs",
    ]
    for name in sample:
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
