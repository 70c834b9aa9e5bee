"""Edge cases for RRF fusion and SemDeDup (happy paths are oracle-gated):
single-list candidates, absent-rank reporting, duplicate-neighborhood
keep rule, orthogonal vectors all kept."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from flink_invoice_processor_spark.functions import retrieval as RET
from flink_invoice_processor_spark.functions import similarity as SIM


def _ranks(spark, rows):
    return spark.createDataFrame([Row(term=t, doc_id=d, rank=r) for t, d, r in rows])


def test_rrf_union_and_absent_ranks(spark):
    a = _ranks(spark, [("q", 1, 1), ("q", 2, 2)])
    b = _ranks(spark, [("q", 2, 1), ("q", 3, 2)])
    out = {r.doc_id: r for r in RET.rrf_fuse(a, b, k=10, c=60).collect()}
    # doc 2 is in both lists -> two contributions, ranks reported
    assert out[2].rank_a == 2 and out[2].rank_b == 1
    assert out[2].rrf_score == round(1 / 62 + 1 / 61, 6)
    # docs 1 and 3 are single-list -> absent rank reported as 0
    assert out[1].rank_b == 0 and out[1].rrf_score == round(1 / 61, 6)
    assert out[3].rank_a == 0 and out[3].rrf_score == round(1 / 62, 6)
    # doc 2 fuses highest
    assert out[2].fused_rank == 1


def test_rrf_tie_breaks_on_doc_id(spark):
    a = _ranks(spark, [("q", 5, 1), ("q", 3, 2)])
    b = _ranks(spark, [("q", 3, 1), ("q", 5, 2)])
    out = RET.rrf_fuse(a, b, k=10).collect()
    # both docs score 1/61 + 1/62 -> tie -> lower doc_id first
    assert [(r.doc_id, r.fused_rank) for r in sorted(out, key=lambda r: r.fused_rank)] == [
        (3, 1), (5, 2),
    ]


def test_rrf_respects_k(spark):
    a = _ranks(spark, [("q", i, i) for i in range(1, 30)])
    b = _ranks(spark, [("q", 100 + i, i) for i in range(1, 30)])
    assert RET.rrf_fuse(a, b, k=5).count() == 5


@pytest.fixture()
def dup_embeddings(spark):
    # unit-norm vectors (the documented contract): ids 0/1/2 span three
    # directions (and seed the 3 clusters); 3 is a near-dup of 0, 4 of 1
    e1 = [1.0] + [0.0] * 7
    e2 = [0.0, 1.0] + [0.0] * 6
    e3 = [0.0, 0.0, 1.0] + [0.0] * 5
    near1 = [0.995, 0.0999] + [0.0] * 6
    near2 = [0.0999, 0.995] + [0.0] * 6
    rows = [
        Row(vec_id=0, embedding=e1),
        Row(vec_id=1, embedding=e2),
        Row(vec_id=2, embedding=e3),
        Row(vec_id=3, embedding=near1),
        Row(vec_id=4, embedding=near2),
    ]
    return spark.createDataFrame(rows)


def test_semantic_dedup_keeps_lowest_id_per_neighborhood(dup_embeddings):
    out = {
        r.vec_id: r
        for r in SIM.semantic_dedup(
            dup_embeddings, n_clusters=3, iters=2, threshold=0.9
        ).collect()
    }
    # the three direction anchors survive
    assert out[0].kept_flag == 1 and out[1].kept_flag == 1
    assert out[2].kept_flag == 1
    # near-dups cluster with their anchor and are pruned (cos ~0.995)
    assert out[3].kept_flag == 0 and out[3].n_lower_neighbors >= 1
    assert out[4].kept_flag == 0 and out[4].n_lower_neighbors >= 1


def test_semantic_dedup_all_kept_when_orthogonal(spark):
    rows = [
        Row(vec_id=i, embedding=[1.0 if j == i else 0.0 for j in range(8)])
        for i in range(5)
    ]
    out = SIM.semantic_dedup(
        spark.createDataFrame(rows), n_clusters=2, iters=2, threshold=0.5
    ).collect()
    assert all(r.kept_flag == 1 and r.n_lower_neighbors == 0 for r in out)
