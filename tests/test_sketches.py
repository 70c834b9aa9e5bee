"""Sketch-layer invariants the DuckDB oracles can't see: Count-Min
candidate superset-ness and counter-table boundedness, KMV mergeability
(union-of-sketches == sketch-of-union) and exact-below-k behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from flink_invoice_processor_spark.functions import sketches as SK
from flink_invoice_processor_spark.tables import load_table


@pytest.fixture()
def skewed(spark):
    rows = [Row(k=f"hot{i % 2}", v=i) for i in range(200)]
    rows += [Row(k=f"cold{i}", v=i) for i in range(50)]
    return spark.createDataFrame(rows)


def test_cms_heavy_hitters_exact_vs_plain_groupby(skewed):
    got = {
        r.hh_key: r.n_events
        for r in SK.cms_heavy_hitters(
            skewed, F.col("k"), threshold=50, depth=3, width=64
        ).collect()
    }
    exact = {
        r.k: r.n
        for r in skewed.groupBy("k")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 50)
        .collect()
    }
    assert got == exact == {"hot0": 100, "hot1": 100}


def test_cms_survives_tiny_width_collisions(skewed):
    # width=2 makes every bucket collide: the candidate set inflates but
    # the exact confirm still returns the true heavy hitters only
    got = SK.cms_heavy_hitters(
        skewed, F.col("k"), threshold=50, depth=2, width=2
    )
    assert {r.hh_key for r in got.collect()} == {"hot0", "hot1"}


def test_cms_counter_table_bounded(spark):
    df = spark.range(5000).select(F.col("id").cast("string").alias("k"))
    keyed = df.select(F.col("k").alias("hh_key"))
    depth, width = 3, 16
    cells = keyed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        (
                            SK._md5_int63(
                                F.concat(F.lit(f"{i}:"), F.col("hh_key"))
                            )
                            % width
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.*")
    counters = cells.groupBy("row_i", "bucket").count()
    assert counters.count() <= depth * width


def test_kmv_exact_when_under_k(spark):
    df = spark.createDataFrame(
        [Row(seg="a", v=i % 7) for i in range(100)]
        + [Row(seg="b", v=i) for i in range(30)]
    )
    sk = SK.kmv_sketch(df, F.col("seg"), F.col("v"), k=64)
    est = {
        r.segment: (r.n_kept, r.est_distinct)
        for r in SK.kmv_estimates(sk, k=64).collect()
    }
    assert est["a"] == (7, 7)
    assert est["b"] == (30, 30)
    # union: 7 and 30 distinct ints overlap on 0..6 -> 30 distinct values
    assert est["__all__"] == (30, 30)


def test_kmv_union_equals_sketch_of_union(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    val = F.floor(F.col("value") * 100).cast("long")
    per_seg = SK.kmv_sketch(ev, F.col("event_type"), val, k=16)
    merged_est = {
        r.segment: (r.n_kept, r.kth_min, r.est_distinct)
        for r in SK.kmv_estimates(per_seg, k=16).collect()
    }["__all__"]
    # segment name must differ from the union row's '__all__' label, or
    # the groupBy would fold the single real segment into its own union
    direct = SK.kmv_sketch(ev, F.lit("alldirect"), val, k=16)
    direct_est = {
        r.segment: (r.n_kept, r.kth_min, r.est_distinct)
        for r in SK.kmv_estimates(direct, k=16).collect()
    }["alldirect"]
    assert merged_est == direct_est


def test_kmv_estimator_accuracy_order_of_magnitude(spark):
    df = spark.range(20000).select(
        F.lit("s").alias("seg"), F.col("id").alias("v")
    )
    sk = SK.kmv_sketch(df, F.col("seg"), F.col("v"), k=64)
    row = [
        r
        for r in SK.kmv_estimates(sk, k=64).collect()
        if r.segment == "s"
    ][0]
    assert row.n_kept == 64
    # KMV with k=64 has ~1/sqrt(62) ~ 13% stddev; allow 3 sigma
    assert 20000 * 0.6 <= row.est_distinct <= 20000 * 1.4


@pytest.mark.parametrize("n_salts", [1, 3, 64])
def test_kmv_kth_min_is_truly_kth_smallest_under_merge(spark, n_salts):
    """The estimator's precondition: for any n_salts tuning and any
    merge of partial sketches, a full segment's kth_min (max over the
    kept set) must equal the k-th smallest DISTINCT hash of the raw
    values — the invariant that makes ``F.max('h')`` an honest name."""
    k = 8
    vals = [f"v{i}" for i in range(60)]
    df = spark.createDataFrame([("s", v) for v in vals], "seg string, v string")
    # merge of two disjoint-ish partials (overlap on purpose: distinctness
    # must hold across the union too)
    part_a = SK.kmv_sketch(
        df.where(F.col("v") < "v4"), F.col("seg"), F.col("v"), k=k,
        n_salts=n_salts,
    )
    part_b = SK.kmv_sketch(
        df.where(F.col("v") >= "v2"), F.col("seg"), F.col("v"), k=k,
        n_salts=n_salts,
    )
    merged = SK.kmv_merge(part_a.unionByName(part_b), k=k, n_salts=n_salts)
    est = {r.segment: r for r in SK.kmv_estimates(merged, k=k).collect()}
    truth = sorted(
        r.h
        for r in df.select(
            SK._md5_int44(F.col("v")).alias("h")
        ).distinct().collect()
    )
    assert est["s"].n_kept == k
    assert est["s"].kth_min == truth[k - 1]
    # and the merged sketch holds exactly the k smallest, not just k rows
    assert sorted(r.h for r in merged.collect()) == truth[:k]


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def test_bloom_never_false_negative_and_tiny_filter_false_positives(spark):
    """The one-sided guarantee on a deliberately saturated 60-bit filter:
    every member hits; with 40 members in 60 bits some non-members MUST
    hit too (pigeonhole: 3*40 positions over 60 bits)."""
    members = spark.createDataFrame([Row(v=i) for i in range(40)])
    words = SK.bloom_words(members, F.col("v"), m_bits=60, k=3)
    cands = spark.createDataFrame([Row(v=i) for i in range(200)])
    got = {
        int(r["value"]): r["bloom_hit"]
        for r in SK.bloom_probe(
            cands, F.col("v"), words, m_bits=60, k=3
        ).collect()
    }
    assert all(got[i] for i in range(40))  # no false negatives, ever
    assert any(got[i] for i in range(40, 200))  # saturated -> FPs exist


def test_bloom_shard_merge_is_bitor_and_idempotent(spark):
    """bit_or over shard partials == whole-set build, and replaying a
    shard (OR-ing it in twice) changes nothing — the property that lets
    streaming rollups merge bloom partials without an epoch fence."""
    a = spark.createDataFrame([Row(v=i) for i in range(0, 30)])
    b = spark.createDataFrame([Row(v=i) for i in range(30, 60)])
    whole = spark.createDataFrame([Row(v=i) for i in range(60)])
    wa = SK.bloom_words(a, F.col("v"), m_bits=300, k=3)
    wb = SK.bloom_words(b, F.col("v"), m_bits=300, k=3)
    merged = {
        r["word_idx"]: r["word"]
        for r in wa.unionByName(wb)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
        .collect()
    }
    direct = {
        r["word_idx"]: r["word"]
        for r in SK.bloom_words(whole, F.col("v"), m_bits=300, k=3).collect()
    }
    assert merged == direct
    replayed = {
        r["word_idx"]: r["word"]
        for r in wa.unionByName(wb)
        .unionByName(wa)  # shard A delivered twice
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
        .collect()
    }
    assert replayed == direct


def test_bloom_probe_of_empty_filter_all_miss(spark):
    empty = spark.createDataFrame([], "v long")
    words = SK.bloom_words(empty, F.col("v"), m_bits=300, k=3)
    cands = spark.createDataFrame([Row(v=i) for i in range(10)])
    rows = SK.bloom_probe(cands, F.col("v"), words, m_bits=300, k=3).collect()
    assert len(rows) == 10 and not any(r["bloom_hit"] for r in rows)


def test_bloom_rejects_unaligned_m_bits(spark):
    with pytest.raises(ValueError):
        SK.bloom_words(
            spark.createDataFrame([Row(v=1)]), F.col("v"), m_bits=100, k=3
        )


def test_bloom_masks_always_positive(spark):
    """60-bit words keep every mask clear of the int64 sign bit."""
    members = spark.createDataFrame([Row(v=i) for i in range(500)])
    words = SK.bloom_words(members, F.col("v"), m_bits=1020, k=3)
    assert words.where(F.col("word") < 0).count() == 0
    assert words.count() <= 17  # 1020 / 60
