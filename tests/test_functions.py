"""Tests for the LLM-pipeline operator extensions: text analysis, dedup
family, similarity search, multimodal plumbing, windows — run against the
real sf0.001 testdata plus crafted frames."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import dedup as D
from flink_invoice_processor_spark.functions import similarity as S
from flink_invoice_processor_spark.functions import text as X
from flink_invoice_processor_spark.functions import windows as W
from flink_invoice_processor_spark.functions.multimodal import (
    attach_fake_media,
    decode_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_token_count(spark):
    df = spark.createDataFrame(
        [(1, "a bb  ccc"), (2, ""), (3, "  x  ")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in X.token_count(df).collect()}
    assert rows[1].n_tokens == 3
    assert rows[2].n_tokens == 0
    assert rows[3].n_tokens == 1
    assert rows[1].n_subword_est >= rows[1].n_tokens


def test_quality_score_bounds(docs):
    rows = X.quality_score(docs).collect()
    assert all(0.0 <= r.quality <= 1.0 for r in rows)
    assert all(0.0 <= r.punct_ratio <= 1.0 for r in rows)


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy"),
            (2, "el perro y la casa es de los niños por la tarde"),
            (3, "zzz qqq vvv"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.pred_lang for r in X.language_id(df).collect()}
    assert rows[1] == "en"
    assert rows[2] == "es"
    assert rows[3] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different text")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in X.fingerprint(df).collect()}
    assert rows[1].content_md5 == rows[2].content_md5  # case/ws-insensitive
    assert rows[1].content_md5 != rows[3].content_md5
    assert isinstance(rows[1].head_fp64, int)


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "Same   TEXT"), (3, "unique")],
        "doc_id long, text string",
    )
    rows = {r.canonical_doc_id: r.n_docs for r in D.exact_dedup(df).collect()}
    assert rows == {1: 2, 3: 1}


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = {r.shingle for r in D.shingles(df, n=3).collect()}
    assert got == {"a b c", "b c d"}
    # doc shorter than n produces nothing
    short = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert D.shingles(short, n=3).count() == 0


def test_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated words appear right here now"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.doc_id_a, r.doc_id_b): r.jaccard for r in D.jaccard_pairs(df, threshold=0.3).collect()}
    assert (1, 2) in pairs
    # 7 shingles each, 6 shared → 6/8
    assert pairs[(1, 2)] == pytest.approx(0.75)
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_finds_near_dups(docs, spark):
    # seed two near-duplicate docs on top of the real corpus
    extra = spark.createDataFrame(
        [
            (100001, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (100002, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        ],
        "doc_id long, text string",
    )
    corpus = docs.select("doc_id", "text").unionByName(extra)
    pairs = D.minhash_lsh_pairs(corpus, k=16, bands=4).collect()
    assert any(
        (r.doc_id_a, r.doc_id_b) == (100001, 100002) for r in pairs
    ), f"expected seeded near-dup pair, got {pairs[:10]}"


def test_simhash_stability_and_closeness(spark):
    df = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight"),
            (2, "one two three four five six seven nine"),
            (3, "totally different content in every way possible"),
        ],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.simhash for r in D.simhash(df).collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(sigs[1], sigs[2]) < ham(sigs[1], sigs[3])
    # deterministic across runs
    sigs2 = {r.doc_id: r.simhash for r in D.simhash(df).collect()}
    assert sigs == sigs2


def test_cosine_topk_exact(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = S.cosine_topk(df, df.where(F.col("vec_id") == 1), k=2)
    rows = out.orderBy("rank").collect()
    assert [r.neighbor_id for r in rows] == [2, 3]
    assert rows[0].score == pytest.approx(
        0.9 / math.sqrt(0.81 + 0.01), abs=1e-3
    )


def test_cosine_topk_on_real_embeddings(emb):
    out = S.cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=5)
    rows = out.collect()
    assert len(rows) == 15  # 3 queries × 5
    assert all(-1.0001 <= r.score <= 1.0001 for r in rows)


def test_lsh_topk_agrees_reasonably(emb):
    exact = S.cosine_topk(emb, emb.where(F.col("vec_id") < 2), k=3)
    approx = S.lsh_cosine_topk(emb, emb.where(F.col("vec_id") < 2), dims=64, k=3, n_planes=4)
    # LSH returns a subset of plausible neighbors with valid scores
    a = approx.collect()
    assert all(r.rank <= 3 for r in a)
    assert len(a) >= 1


def test_ivf_topk_valid_and_consistent(emb):
    approx = S.ivf_cosine_topk(
        emb, emb.where(F.col("vec_id") < 3), n_cells=8, nprobe=2, k=3
    ).collect()
    assert {r.query_id for r in approx} == {0, 1, 2}
    assert all(1 <= r.rank <= 3 for r in approx)
    # every IVF hit carries the true cosine score (search is exact in-cell)
    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in S.cosine_topk(
            emb, emb.where(F.col("vec_id") < 3), k=emb.count()
        ).collect()
    }
    for r in approx:
        assert exact[(r.query_id, r.neighbor_id)] == r.score


def test_neardup_pairs_exact_and_lsh(emb, spark):
    # seed two true near-duplicates on top of the real corpus
    base = [float((i * 37) % 19 - 9) for i in range(64)]
    twin = list(base)
    twin[0] += 0.01
    extra = spark.createDataFrame(
        [(900001, base), (900002, twin)], "vec_id long, embedding array<float>"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(extra)
    exact = {
        (r.vec_id_a, r.vec_id_b): r.score
        for r in S.neardup_pairs_exact(corpus, threshold=0.9).collect()
    }
    assert (900001, 900002) in exact
    assert exact[(900001, 900002)] >= 0.999
    # identical vectors share every LSH bucket → blocked variant finds them
    lsh = {
        (r.vec_id_a, r.vec_id_b): r.score
        for r in S.neardup_pairs_lsh(corpus, dims=64, threshold=0.9).collect()
    }
    assert (900001, 900002) in lsh
    # precision 1: every LSH pair is a true ≥-threshold pair
    assert set(lsh) <= set(exact)
    assert all(lsh[p] == exact[p] for p in lsh)


def test_simhash_pairs_blocking(spark):
    # long docs + one substituted token → small Hamming distance, so the
    # 8-bit-band pigeonhole must surface the pair
    words = [f"w{i}" for i in range(30)]
    doc1 = " ".join(words)
    doc2 = " ".join(words[:-1] + ["changed"])
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2),
         (3, "totally different content in every way possible indeed")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.simhash for r in D.simhash(df).collect()}
    ham12 = bin(sigs[1] ^ sigs[2]).count("1")
    assert ham12 <= 3, f"seeded near-dup drifted: hamming={ham12}"
    pairs = {
        (r.doc_id_a, r.doc_id_b): r.hamming
        for r in D.simhash_pairs(df, bits=32, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == ham12
    assert not any(3 in p for p in pairs)


def test_multimodal_plumbing(docs):
    media = attach_fake_media(docs.limit(30))
    feats = decode_images(media).collect()
    assert len(feats) == 30 // 3 or len(feats) > 0
    for r in feats:
        assert 64 <= r.width <= 2048 and 1 <= r.n_channels <= 3
        assert len(r.features) == 8
        assert len(r.sha256) == 64
    frames = sample_frames(media).collect()
    assert all(f.frame_idx % 10 == 0 for f in frames)
    # the real backend's gate moved per-format INSIDE the decoder: these
    # utf-8 payloads are no stdlib-supported image, so the job fails
    # loudly at execution naming the dependency
    with pytest.raises(Exception, match="Pillow"):
        decode_images(media, backend="real").collect()


def test_multimodal_audio_and_resize(docs):
    from flink_invoice_processor_spark.functions.multimodal import (
        extract_audio_features,
        resize_images,
    )

    media = attach_fake_media(docs.limit(30))
    audio = extract_audio_features(media).collect()
    assert len(audio) > 0
    for r in audio:
        assert r.sample_rate == 16000 and r.duration_ms >= 0
        assert len(r.mfcc) == 4 and all(-1.0 <= x <= 1.0 for x in r.mfcc)
    # deterministic across runs
    again = extract_audio_features(media).collect()
    assert sorted((r.media_id, r.sha256) for r in again) == sorted(
        (r.media_id, r.sha256) for r in audio
    )

    resized = resize_images(media, 224, 224).collect()
    assert len(resized) > 0
    for r in resized:
        assert r.media_type == "image"
        assert r.meta["width"] == "224" and r.meta["resized"] == "true"
        assert len(r.media) == 32  # sha256-derived fake payload
    # per-format gates: utf-8 payloads are neither stdlib images nor WAV
    with pytest.raises(Exception, match="Pillow"):
        resize_images(media, 2, 2, backend="real").collect()
    with pytest.raises(Exception):
        extract_audio_features(media, backend="real").collect()


def test_salted_join_and_aggregate_match_plain(spark, sf_dir):
    from flink_invoice_processor_spark.functions.skew import (
        salted_aggregate,
        salted_join,
    )
    from flink_invoice_processor_spark.tables import load_table

    events = load_table(spark, sf_dir, "events").limit(400)
    plain = {
        (r.event_type): (r.n, r.mx)
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("event_id").alias("mx"))
        .collect()
    }
    salted = {
        (r.event_type): (r.n, r.mx)
        for r in salted_aggregate(
            events, ["event_type"], {"n": ("count", "*"), "mx": ("max", "event_id")}
        ).collect()
    }
    assert salted == plain

    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3)], "event_type string, w int"
    )
    plain_j = sorted(
        (r.event_id, r.w) for r in events.join(dim, ["event_type"]).collect()
    )
    salted_j = sorted(
        (r.event_id, r.w)
        for r in salted_join(events, dim, ["event_type"], salt_buckets=8).collect()
    )
    assert salted_j == plain_j
    # left join keeps unmatched left rows exactly once
    plain_l = events.join(dim, ["event_type"], "left").count()
    assert salted_join(events, dim, ["event_type"], how="left").count() == plain_l


def test_asof_join_semantics(spark):
    from flink_invoice_processor_spark.functions.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (3, 7, "d")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (2, 6, "r6")],
        "k long, rt long, rv string",
    )
    out = {
        (r.k, r.t): (r.rt, r.rv)
        for r in asof_join(
            left, right, by="k", left_on="t", right_on="rt",
            value_cols=["rt", "rv"],
        ).collect()
    }
    assert out[(1, 10)] == (10, "r10")   # inclusive: rt == t matches
    assert out[(1, 20)] == (15, "r15")   # latest at-or-before
    assert out[(2, 5)] == (None, None)   # right row is later → no match
    assert out[(3, 7)] == (None, None)   # key absent on the right
    # collision guard
    with pytest.raises(ValueError):
        asof_join(left, right.withColumnRenamed("rv", "tag"),
                  by="k", left_on="t", right_on="rt", value_cols=["tag"])


def test_windows_tumbling_and_session(spark, sf_dir):
    from flink_invoice_processor_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    t = W.tumbling_counts(events, "1 hour")
    total = t.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    s = W.session_counts(events.limit(200), gap="10 minutes")
    assert s.agg(F.sum("n_events")).collect()[0][0] == 200


def test_pq_rerank_restores_exact_precision(spark, sf_dir):
    """The two-stage path: (a) its top-k is drawn from the ADQ shortlist,
    (b) exact_dist equals the true integer L2 (not the quantized ADQ
    distance), (c) within the shortlist the final order is the exact
    order — quantization error cannot reorder it."""
    from flink_invoice_processor_spark.functions import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    short = SIM.pq_adq_topk(emb, queries, m=8, ksub=8, k=10)
    rer = SIM.pq_rerank_topk(emb, queries, m=8, ksub=8, k=4, shortlist=10)
    short_set = {(r.query_id, r.neighbor_id) for r in short.collect()}
    got = rer.collect()
    assert {(r.query_id, r.neighbor_id) for r in got} <= short_set
    # exact_dist equals the brute-force integer L2 for every output pair
    pts = {
        r.vec_id: r.v6
        for r in SIM._int_points(emb, "embedding", "vec_id").collect()
    }
    for r in got:
        true_d = sum(
            (a - b) * (a - b)
            for a, b in zip(pts[r.query_id], pts[r.neighbor_id])
        )
        assert r.exact_dist == true_d
    # per query: ranks 1..4 ordered by (exact_dist, neighbor_id)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        keys = [(r.exact_dist, r.neighbor_id) for r in rows]
        assert keys == sorted(keys)
