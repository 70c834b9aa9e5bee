"""Edge cases for the round-4 operators (substring search, bigram
familiarity, domain mixing, length-bucketed batching, TPC-H Q7/Q8/Q9).
The happy paths are oracle-gated in tools/check_oracles.py; these tests
pin the corners oracles can't see (empty/short inputs, contract errors,
allocation invariants)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import retrieval as RET


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="slow join slow join fast scan", source="a"),
            Row(doc_id=2, text="SLOW JOIN uppercase match", source="a"),
            Row(doc_id=3, text="no phrase here", source="b"),
            Row(doc_id=4, text="", source="b"),
            Row(doc_id=5, text="one", source="b"),
            # contains both trigrams of 'slow join' ('slo','low',...) but
            # not the contiguous phrase — index candidate, verify rejects
            Row(doc_id=6, text="slow scan then join later", source="c"),
        ]
    )


def test_substring_search_counts_and_verifies(docs):
    rows = {
        r.doc_id: r.n_occurrences
        for r in RET.substring_search(docs, "slow join").collect()
    }
    assert rows == {1: 2, 2: 1}  # case-insensitive, false positive rejected


def test_substring_search_rejects_short_query(docs):
    with pytest.raises(ValueError):
        RET.substring_search(docs, "ab")


@pytest.mark.parametrize("cap", [1, 2, 100])
def test_substring_search_cap_is_result_transparent(docs, cap):
    """The stop-trigram doc-freq cap only moves the gate/verify balance;
    results must be identical for ANY cap — including cap=1, where every
    shared trigram goes hot and the gate degrades to verify-everything
    (the left-join fallback; an inner-join gate would wrongly return
    zero rows here)."""
    base = {
        (r.doc_id, r.n_occurrences)
        for r in RET.substring_search(docs, "slow join").collect()
    }
    capped = {
        (r.doc_id, r.n_occurrences)
        for r in RET.substring_search(
            docs, "slow join", max_trigram_doc_freq=cap
        ).collect()
    }
    assert capped == base


def test_indexed_search_matches_direct(docs, tmp_path):
    """Probing the persisted index must reach exactly the rows the
    per-query posting build reaches, capped or not."""
    idx = str(tmp_path / "tri_idx")
    RET.build_trigram_index(docs, idx, n_buckets=8)
    base = {
        (r.doc_id, r.n_occurrences)
        for r in RET.substring_search(docs, "slow join").collect()
    }
    for cap in (None, 1, 1000):
        got = {
            (r.doc_id, r.n_occurrences)
            for r in RET.substring_search_indexed(
                docs, "slow join", idx, max_trigram_doc_freq=cap
            ).collect()
        }
        assert got == base


def test_index_incremental_update_no_rebuild(spark, docs, tmp_path):
    """An appended batch updates the index without touching the original
    files (no full rebuild), and probes see old + new docs."""
    import os

    idx = str(tmp_path / "tri_idx")
    old = docs.where("doc_id <= 4")
    new = docs.where("doc_id > 4").unionByName(
        spark.createDataFrame(
            [Row(doc_id=7, text="another slow join arrival", source="z")]
        )
    )
    RET.build_trigram_index(old, idx, n_buckets=8)

    def parquet_files():
        out = {}
        for root, _dirs, files in os.walk(idx):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = parquet_files()
    RET.update_trigram_index(new, idx)
    after = parquet_files()
    # every original file survives untouched; the update only appended
    for p, mtime in before.items():
        assert p in after and after[p] == mtime
    assert len(after) > len(before)
    got = {
        (r.doc_id, r.n_occurrences)
        for r in RET.substring_search_indexed(
            docs.unionByName(
                spark.createDataFrame(
                    [Row(doc_id=7, text="another slow join arrival",
                         source="z")]
                )
            ),
            "slow join", idx, max_trigram_doc_freq=1000,
        ).collect()
    }
    assert got == {(1, 2), (2, 1), (7, 1)}


def test_indexed_search_survives_duplicate_ingest(docs, tmp_path):
    """Re-ingesting a batch duplicates postings; the probe's distinct
    counting must keep the candidate gate and results exact."""
    idx = str(tmp_path / "tri_idx")
    RET.build_trigram_index(docs, idx, n_buckets=8)
    RET.update_trigram_index(docs.where("doc_id = 1"), idx)  # duplicate
    got = {
        (r.doc_id, r.n_occurrences)
        for r in RET.substring_search_indexed(
            docs, "slow join", idx, max_trigram_doc_freq=1000
        ).collect()
    }
    assert got == {(1, 2), (2, 1)}


def test_bigram_familiarity_empty_and_single_token(docs):
    out = {r.doc_id: r for r in CUR.bigram_familiarity(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}  # every doc gets a row
    for did in (4, 5):  # no bigrams => all-zero signals
        assert (
            out[did].n_bigrams,
            out[did].sum_pair_freq,
            out[did].n_singleton,
        ) == (0, 0, 0)
    # doc 1 has 6 tokens -> 5 bigram occurrences
    assert out[1].n_bigrams == 5


def test_domain_mix_weights_invariants(docs):
    out = CUR.domain_mix_weights(docs, total_budget=100).collect()
    assert {r.source for r in out} == {"a", "b", "c"}
    for r in out:
        assert 0 <= r.alloc_docs <= r.n_docs  # capped by availability
        assert r.weight_1e6 > 0


def test_length_bucket_batches_deals_in_order(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * 10)) for i in range(1, 20)]
    )
    out = CUR.length_bucket_batches(df, bucket_width=64, batch_size=8).collect()
    # all 19 docs have 10 tokens -> bucket 0; batches of 8 in doc_id order
    assert all(r.bucket == 0 for r in out)
    by_doc = {r.doc_id: r.batch_in_bucket for r in out}
    assert by_doc[1] == 0 and by_doc[8] == 0
    assert by_doc[9] == 1 and by_doc[16] == 1
    assert by_doc[17] == 2 and by_doc[19] == 2


def test_q8_numerator_bounded_by_denominator(spark, sf_dir):
    from flink_invoice_processor_spark.plans.queries import QUERIES

    for r in QUERIES["q8_market_share"](spark, sf_dir).collect():
        assert 0 <= r.nation_rev_1e4 <= r.total_rev_1e4


def test_pagerank_integer_star_graph(spark):
    """Hub-and-spoke: all mass flows to the hub; spokes keep base rank.
    Hand-computed: N=4, SCALE//4 = 250_000_000_000, base = 15% of that =
    37_500_000_000.  After iter 1: hub = base + 85% * 3*(250e9 div 1) =
    37_500_000_000 + 637_500_000_000; spokes = base + 85% * (250e9 div 3)."""
    from flink_invoice_processor_spark.functions.graph import pagerank_integer

    edges = spark.createDataFrame(
        [Row(src=s, dst=0) for s in (1, 2, 3)]
        + [Row(src=0, dst=s) for s in (1, 2, 3)]
    )
    r1 = {r.id: r.rank_1e12 for r in pagerank_integer(edges, iters=1).collect()}
    assert r1[0] == 37_500_000_000 + 85 * (3 * 250_000_000_000) // 100
    spoke = 37_500_000_000 + 85 * (250_000_000_000 // 3) // 100
    assert r1[1] == r1[2] == r1[3] == spoke
    # rank order is stable under more iterations: hub stays on top
    r3 = {r.id: r.rank_1e12 for r in pagerank_integer(edges, iters=3).collect()}
    assert r3[0] > r3[1] == r3[2] == r3[3]


def test_zorder_interleave_bits(spark, sf_dir):
    from flink_invoice_processor_spark.tables import zorder_value

    df = spark.createDataFrame([Row(a=3, b=0), Row(a=0, b=3), Row(a=1, b=1)])
    out = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_value(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    # a occupies even bit positions, b odd: (3,0)->0b0101=5, (0,3)->0b1010=10,
    # (1,1)->0b11=3
    assert out == {(3, 0): 5, (0, 3): 10, (1, 1): 3}


def test_cohort_offsets_start_at_zero(spark, sf_dir):
    from flink_invoice_processor_spark.plans.queries import QUERIES

    rows = QUERIES["cohort_retention_orders"](spark, sf_dir).collect()
    assert all(r.month_offset >= 0 for r in rows)
    # every cohort has an offset-0 cell (first order is itself activity)
    cohorts = {r.cohort for r in rows}
    zero = {r.cohort for r in rows if r.month_offset == 0}
    assert cohorts == zero


def test_rfm_quartiles_valid(spark, sf_dir):
    from flink_invoice_processor_spark.plans.queries import QUERIES

    rows = QUERIES["rfm_segments_customers"](spark, sf_dir).collect()
    assert rows and all(
        1 <= r.r_quartile <= 4 and 1 <= r.f_quartile <= 4
        and 1 <= r.m_quartile <= 4 and r.recency_days > 0
        for r in rows
    )


def test_equidepth_buckets_are_equal_height(spark, sf_dir):
    from flink_invoice_processor_spark.plans.queries import QUERIES

    rows = QUERIES["events_equidepth_histogram"](spark, sf_dir).collect()
    assert len(rows) == 16
    counts = [r.n_events for r in rows]
    assert max(counts) - min(counts) <= 1  # equal depth up to remainder
    # bucket value ranges are non-overlapping and ordered
    by_bucket = sorted(rows, key=lambda r: r.bucket)
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a.hi_1e4 <= b.lo_1e4


def test_hll_mergeability_asserts_inside_query(spark, sf_dir):
    from flink_invoice_processor_spark.plans.queries import QUERIES

    out = QUERIES["events_hll_mergeability"](spark, sf_dir).collect()
    assert len(out) == 1 and out[0].exact_distinct > 0


def test_trigram_postings_skip_short_docs(spark):
    """Docs shorter than 3 chars must emit NO postings — Spark's
    sequence(1, 0) is the descending [1, 0], which without the guard
    leaked the short text itself as junk non-trigram postings."""
    df = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="a"),
         Row(doc_id=3, text="ab"), Row(doc_id=4, text="abc")]
    )
    rows = RET.trigram_postings(df).collect()
    assert {(r.doc_id, r.tri) for r in rows} == {(4, "abc")}
    assert all(len(r.tri) == 3 for r in rows)


def test_pagerank_empty_graph_returns_empty(spark):
    from flink_invoice_processor_spark.functions.graph import pagerank_integer

    empty = spark.createDataFrame([], "src long, dst long")
    out = pagerank_integer(empty, iters=2)
    assert out.columns == ["id", "rank_1e12"]
    assert out.count() == 0


def test_indexed_search_rejects_text_col_mismatch(docs, tmp_path):
    idx = str(tmp_path / "tri_idx")
    RET.build_trigram_index(docs, idx, n_buckets=8)
    with pytest.raises(ValueError, match="text_col"):
        RET.substring_search_indexed(docs, "slow join", idx, text_col="title")
