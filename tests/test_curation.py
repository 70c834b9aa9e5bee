"""Unit tests for corpus-curation operators (functions/curation.py and
dedup.dup_clusters): invariants the DuckDB oracle can't express — chunk
coverage/overlap, sampling determinism and monotonicity, component
convergence on hand-built graphs, redaction behavior on crafted text."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions.dedup import dup_clusters


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------

def test_chunking_covers_every_token_with_overlap(spark):
    words = " ".join(f"w{i}" for i in range(200))
    out = CUR.chunk_documents(
        docs_df(spark, [(1, words)]), chunk_size=64, stride=48
    ).collect()
    # ceil(200/48) = 5 chunks; starts 0,48,96,144,192
    assert [r["chunk_id"] for r in sorted(out, key=lambda r: r["chunk_id"])] == [
        0, 1, 2, 3, 4
    ]
    by_id = {r["chunk_id"]: r for r in out}
    assert by_id[0]["n_tokens"] == 64
    assert by_id[4]["n_tokens"] == 200 - 192  # short tail kept
    # overlap: chunk k starts at token k*48, i.e. 16 tokens shared
    assert by_id[1]["chunk_text"].split()[0] == "w48"
    assert by_id[0]["chunk_text"].split()[-1] == "w63"
    # every token appears in at least one chunk
    seen = {t for r in out for t in r["chunk_text"].split()}
    assert seen == {f"w{i}" for i in range(200)}


def test_chunking_short_and_empty_docs(spark):
    out = CUR.chunk_documents(
        docs_df(spark, [(1, "a b c"), (2, "   "), (3, "")]),
        chunk_size=64,
        stride=48,
    ).collect()
    assert len(out) == 1  # empty docs emit nothing
    assert out[0]["doc_id"] == 1 and out[0]["n_tokens"] == 3
    assert out[0]["chunk_text"] == "a b c"


def test_chunking_is_a_pure_map(spark):
    plan = CUR.chunk_documents(
        docs_df(spark, [(1, "a b")]), 64, 48
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: chunking runs at scan speed


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def test_stratified_sample_deterministic_and_rate_bounded(spark):
    rows = [(i, "x", "en" if i % 2 == 0 else "de") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    s1 = CUR.stratified_sample(df, {"en": 50, "de": 10}).collect()
    s2 = CUR.stratified_sample(df, {"en": 50, "de": 10}).collect()
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)
    en = [r for r in s1 if r["lang"] == "en"]
    de = [r for r in s1 if r["lang"] == "de"]
    # md5 buckets are uniform: expect ~250/50 with generous slack
    assert 175 <= len(en) <= 325
    assert 20 <= len(de) <= 90
    assert all(r["sample_bucket"] < 50 for r in en)
    assert all(r["sample_bucket"] < 10 for r in de)


def test_stratified_sample_is_nested(spark):
    """Raising a stratum's rate only ADDS rows (hash-gated ⇒ samples nest),
    which is what makes re-sampling at a new rate resumable at 100 TB."""
    df = spark.createDataFrame(
        [(i, "x", "en") for i in range(500)], "doc_id long, text string, lang string"
    )
    small = {r["doc_id"] for r in CUR.stratified_sample(df, {"en": 20}).collect()}
    large = {r["doc_id"] for r in CUR.stratified_sample(df, {"en": 60}).collect()}
    assert small <= large


def test_stratified_sample_default_rate(spark):
    df = spark.createDataFrame(
        [(i, "x", "zz") for i in range(200)], "doc_id long, text string, lang string"
    )
    out = CUR.stratified_sample(df, {"en": 50}, default_rate=0).collect()
    assert out == []


# ---------------------------------------------------------------------------
# repetition stats
# ---------------------------------------------------------------------------

def test_repetition_stats_degenerate_doc(spark):
    out = {
        r["doc_id"]: r
        for r in CUR.repetition_stats(
            docs_df(spark, [(1, "spam spam spam spam"), (2, "a fresh new doc here")])
        ).collect()
    }
    spammy, fresh = out[1], out[2]
    assert spammy["n_tokens"] == 4 and spammy["top_tok_count"] == 4
    assert spammy["n_2grams"] == 3 and spammy["n_distinct_2grams"] == 1
    assert fresh["top_tok_count"] == 1
    assert fresh["n_2grams"] == fresh["n_distinct_2grams"] == 4
    assert fresh["total_word_chars"] == len("afreshnewdochere")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def test_redact_pii_counts_and_replaces(spark):
    out = {
        r["doc_id"]: r
        for r in CUR.redact_pii(
            docs_df(
                spark,
                [
                    (1, "mail a.b+c@sub.example.org and d@e.io now"),
                    (2, "call +1-555-0123 or +1-555-0999"),
                    (3, "nothing personal here"),
                ],
            )
        ).collect()
    }
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 0
    assert out[2]["n_phones"] == 2 and out[2]["n_emails"] == 0
    assert out[3]["n_emails"] == out[3]["n_phones"] == 0
    # redacted_len reflects the substitution, and the md5 is over the
    # redacted text (spot-check via an explicit recomputation)
    import hashlib

    expected = "call <PHONE> or <PHONE>"
    assert out[2]["redacted_len"] == len(expected)
    assert out[2]["redacted_md5"] == hashlib.md5(expected.encode()).hexdigest()


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------

def test_tfidf_prefers_rare_frequent_terms(spark):
    df = docs_df(
        spark,
        [
            (1, "common common rare rare rare"),
            (2, "common other words here"),
            (3, "common unrelated text body"),
        ],
    )
    out = CUR.tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r["tok"] for r in out}
    # "rare" (tf=3, df=1) beats "common" (tf=2, df=3) for doc 1
    assert top[1] == "rare"
    assert all(r["rank"] == 1 for r in out)


def test_tfidf_blocked_pairs_drops_hub_terms(spark):
    # 5 docs all sharing the hub term "hub" (block df 5 > cap 3), two of
    # them also sharing the rare term "rare" (block df 2 <= cap).  The
    # hub block must contribute ZERO pairs — without the guard it alone
    # would produce C(5,2)=10 — leaving exactly the one rare-term pair.
    rows = [(i, "hub", 100) for i in range(5)]
    rows += [(1, "rare", 500), (3, "rare", 400)]
    top = spark.createDataFrame(rows, "doc_id long, tok string, score long")
    out = CUR.tfidf_blocked_pairs(top, max_block_df=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_id_a"], r["doc_id_b"]) == (1, 3)
    assert r["dot"] == 500 * 400
    assert r["n_shared_terms"] == 1
    # raising the cap readmits the hub block: 10 hub pairs, one of which
    # (1,3) also shares "rare" and folds into a single two-term row
    out = CUR.tfidf_blocked_pairs(top, max_block_df=5).collect()
    assert len(out) == 10
    both = {(r["doc_id_a"], r["doc_id_b"]): r for r in out}
    assert both[(1, 3)]["n_shared_terms"] == 2
    assert both[(1, 3)]["dot"] == 100 * 100 + 500 * 400


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

def pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id_a long, doc_id_b long")


def test_dup_clusters_path_graph_converges(spark):
    """A 6-node path (worst diameter per edge) plus two singletons."""
    nodes = spark.range(8).withColumnRenamed("id", "doc_id")
    path = pairs_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)])
    out = {r["doc_id"]: r for r in dup_clusters(nodes, path).collect()}
    assert all(out[i]["cluster_id"] == 0 for i in range(6))
    assert all(out[i]["cluster_size"] == 6 for i in range(6))
    assert out[6]["cluster_id"] == 6 and out[6]["cluster_size"] == 1
    assert out[7]["is_canonical"] is True
    canon = [r for r in out.values() if r["is_canonical"]]
    assert sorted(r["doc_id"] for r in canon) == [0, 6, 7]


def test_dup_clusters_two_components_and_edge_direction(spark):
    nodes = spark.range(7).withColumnRenamed("id", "doc_id")
    # edges given in arbitrary orientation; component {1,2,5}, {3,6}
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(nodes, pairs_df(spark, [(5, 2), (1, 5), (6, 3)])).collect()
    }
    assert out[1] == out[2] == out[5] == 1
    assert out[3] == out[6] == 3
    assert out[0] == 0 and out[4] == 4


def test_dup_clusters_no_pairs(spark):
    nodes = spark.range(4).withColumnRenamed("id", "doc_id")
    empty = pairs_df(spark, []).where(F.lit(False))
    out = dup_clusters(nodes, empty).collect()
    assert all(r["cluster_size"] == 1 and r["is_canonical"] for r in out)
    assert len(out) == 4


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_flags_exact_ngram_overlap(spark):
    eval_df = docs_df(spark, [(100, "the quick brown fox jumps over it")])
    train = docs_df(
        spark,
        [
            # shares the 5-gram "the quick brown fox jumps"
            (1, "intro text the quick brown fox jumps away"),
            # shares words but never 5 in a row
            (2, "quick fox brown the jumps over lazy dogs"),
            (3, "completely unrelated content with many words here"),
        ],
    )
    out = {r["doc_id"]: r for r in CUR.decontaminate(train, eval_df, n=5).collect()}
    assert out[1]["is_contaminated"] is True and out[1]["n_contaminated"] == 1
    assert out[2]["is_contaminated"] is False
    assert out[3]["is_contaminated"] is False
    # n_grams counts the doc's own distinct 5-grams: len(8 tokens) - 4 = 4
    assert out[1]["n_grams"] == 4


def test_decontaminate_short_docs_have_no_grams(spark):
    eval_df = docs_df(spark, [(9, "a b c d e")])
    train = docs_df(spark, [(1, "a b c d")])  # < 5 tokens: no 5-grams
    assert CUR.decontaminate(train, eval_df, n=5).collect() == []


def test_decontaminate_broadcasts_eval_side(spark):
    eval_df = docs_df(spark, [(9, "a b c d e")])
    train = docs_df(spark, [(1, "a b c d e f")])
    df = CUR.decontaminate(train, eval_df, n=5)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # big side never shuffles on the gram


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_offsets_are_exact_prefix_sums(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(10 + i))) for i in range(20)]
    out = sorted(
        CUR.pack_sequences(docs_df(spark, rows), seq_len=16).collect(),
        key=lambda r: r["doc_id"],
    )
    expected_offset = 0
    for r in out:
        assert r["token_offset"] == expected_offset
        assert r["first_seq"] == r["token_offset"] // 16
        assert r["last_seq"] == (r["token_offset"] + r["n_tokens"]) // 16
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
        expected_offset += r["n_tokens"] + 1  # +1 for the eod separator


def test_pack_sequences_independent_of_input_partitioning(spark):
    rows = [(i, " ".join("x" for _ in range(1 + i % 7))) for i in range(300)]
    df = docs_df(spark, rows)
    a = sorted(map(tuple, CUR.pack_sequences(df.repartition(1)).collect()))
    b = sorted(map(tuple, CUR.pack_sequences(df.repartition(17, "text")).collect()))
    assert a == b


def test_pack_sequences_skips_empty_docs(spark):
    out = CUR.pack_sequences(
        docs_df(spark, [(1, "a b"), (2, "   "), (3, "c")]), seq_len=4
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert set(got) == {1, 3}
    # doc 1: tokens [0,1], eod at 2; doc 3 starts at offset 3
    assert got[1]["token_offset"] == 0 and got[3]["token_offset"] == 3


def test_pack_sequences_no_global_single_partition_window(spark):
    """The per-row window must be partitioned by the physical partition id —
    a bare Window.orderBy would funnel 100 TB through one task."""
    df = docs_df(spark, [(i, "a b c") for i in range(50)])
    res = CUR.pack_sequences(df)
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the per-row prefix window hash-partitions on the physical partition id
    assert "windowspecdefinition(_pid" in plan
    assert "hashpartitioning(_pid" in plan


# ---------------------------------------------------------------------------
# fuzzy edit-distance pairs
# ---------------------------------------------------------------------------

def test_fuzzy_pairs_catches_typo_misses_rewrite(spark):
    from flink_invoice_processor_spark.functions.dedup import fuzzy_pairs

    df = docs_df(
        spark,
        [
            (1, "spark streaming engine design notes"),
            (2, "spark streaming engine desing notes"),   # one transposition
            (3, "spark batch pipeline totally different text"),
            (4, "flink streaming engine design notes"),   # different block
        ],
    )
    out = {(r["doc_id_a"], r["doc_id_b"]): r["edit_distance"]
           for r in fuzzy_pairs(df, max_distance=3).collect()}
    assert (1, 2) in out and out[(1, 2)] == 2  # transposition = 2 unit edits
    assert all(3 not in p for p in out)
    assert all(4 not in p for p in out)  # blocking: first token differs


def test_fuzzy_pairs_block_cap_drops_hot_block(spark):
    from flink_invoice_processor_spark.functions.dedup import fuzzy_pairs

    rows = [(i, f"the common prefix variant {i}") for i in range(30)]
    df = docs_df(spark, rows)
    assert fuzzy_pairs(df, max_distance=9, max_block_doc_freq=10).count() == 0
    assert fuzzy_pairs(df, max_distance=9).count() > 0


# ---------------------------------------------------------------------------
# integer k-means
# ---------------------------------------------------------------------------

def test_kmeans_separates_obvious_clusters(spark):
    from flink_invoice_processor_spark.functions.similarity import kmeans_integer

    # two tight blobs far apart; k=2, init = vec 0 (blob A) and vec 1 (blob B)
    rows = []
    for i in range(20):
        base = [10.0, 10.0] if i % 2 == 0 else [-10.0, -10.0]
        rows.append((i, [base[0] + (i % 5) * 0.01, base[1] - (i % 3) * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_integer(df, k=2, iters=2)
    got = {r["vec_id"]: r["cid"] for r in out.collect()}
    a = {got[i] for i in range(0, 20, 2)}
    b = {got[i] for i in range(1, 20, 2)}
    assert a == {0} and b == {1}


def test_kmeans_broadcasts_centroids(spark):
    from flink_invoice_processor_spark.functions.similarity import kmeans_integer

    df = spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    res = kmeans_integer(df, k=4, iters=1, materialize=False)
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# distributed row_number + feature hashing
# ---------------------------------------------------------------------------

def test_distributed_row_number_matches_total_order(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(500)], "k long, v long"
    )
    out = CUR.distributed_row_number(
        df.repartition(13), [F.col("v").desc(), F.col("k").asc()], out_col="rn"
    ).collect()
    expected = sorted(((r["v"], r["k"]) for r in out), key=lambda t: (-t[0], t[1]))
    got = {(r["v"], r["k"]): r["rn"] for r in out}
    for i, key in enumerate(expected, start=1):
        assert got[key] == i
    plan_df = CUR.distributed_row_number(
        df, [F.col("v").asc(), F.col("k").asc()]
    )
    plan_df.collect()
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(_pid" in plan  # never a global window


def test_prefix_sum_rejects_reserved_column_collision(spark):
    """An input already carrying ``_w`` (part of the public output
    contract) must fail loudly instead of silently losing the column."""
    import pytest

    df = spark.createDataFrame([(1, 2)], "k long, _w long")
    with pytest.raises(ValueError, match="_w"):
        CUR.distributed_prefix_sum(df, [F.col("k")], F.lit(1))


def test_feature_hashing_sparse_counts(spark):
    df = docs_df(spark, [(1, "a a b"), (2, ""), (3, "b")])
    out = CUR.feature_hashing(df, n_buckets=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = r["n"]
    assert sum(by_doc[1].values()) == 3 and len(by_doc[1]) == 2  # a,b buckets
    assert 2 not in by_doc  # empty doc: no rows
    # same token → same bucket across docs
    (b_bucket,) = [b for b, n in by_doc[3].items()]
    assert by_doc[1][b_bucket] == 1


# ---------------------------------------------------------------------------
# hostile inputs: unicode, emoji, RTL, CJK, huge tokens
# ---------------------------------------------------------------------------

def test_text_ops_survive_hostile_unicode(spark):
    """The text-path operators must not throw and must stay internally
    consistent on non-ASCII content (CJK has no spaces → one giant token;
    RTL and emoji are opaque tokens; NULs survive)."""
    hostile = [
        (1, "普通话没有空格的长句子在这里持续下去"),
        (2, "مرحبا بالعالم هذا نص عربي"),
        (3, "🚀🚀 emoji 🎉 tokens 🎉 everywhere 🚀"),
        (4, "a" * 10_000),
        (5, "mixed 普通话 and english مع العربية too"),
        (6, "null\x00byte inside"),
    ]
    df = docs_df(spark, hostile)
    rep = {r["doc_id"]: r for r in CUR.repetition_stats(df).collect()}
    assert rep[1]["n_tokens"] == 1 and rep[1]["n_2grams"] == 0
    assert rep[2]["n_tokens"] == 5
    assert rep[4]["total_word_chars"] == 10_000
    chunks = CUR.chunk_documents(df, chunk_size=4, stride=3).collect()
    assert {r["doc_id"] for r in chunks} == {1, 2, 3, 4, 5, 6}
    red = {r["doc_id"]: r for r in CUR.redact_pii(df).collect()}
    assert all(r["n_emails"] == 0 for r in red.values())
    # redacted_len counts characters, not bytes — CJK stays intact
    assert red[1]["redacted_len"] == len(hostile[0][1])
    tf = CUR.tfidf_top_terms(df, k=1).collect()
    assert {r["doc_id"] for r in tf} == {1, 2, 3, 4, 5, 6}


def test_dup_clusters_long_path_converges_in_log_rounds(spark):
    """Pointer doubling: a 64-node path needs ~log2(64) rounds, not 63 —
    max_iter=10 must suffice (it would raise without the shortcut step)."""
    nodes = spark.range(64).withColumnRenamed("id", "doc_id")
    path = pairs_df(spark, [(i, i + 1) for i in range(63)])
    out = dup_clusters(nodes, path, max_iter=10).collect()
    assert all(r["cluster_id"] == 0 for r in out)
    assert all(r["cluster_size"] == 64 for r in out)


def test_dup_clusters_raises_when_unconverged(spark):
    nodes = spark.range(8).withColumnRenamed("id", "doc_id")
    path = pairs_df(spark, [(i, i + 1) for i in range(7)])
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(nodes, path, max_iter=1)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def test_bm25_relevance_ordering(spark):
    from flink_invoice_processor_spark.functions.retrieval import bm25_topk

    df = docs_df(
        spark,
        [
            (1, "cat cat cat dog bird"),          # high tf for 'cat'
            (2, "cat dog bird fish mouse"),        # tf 1
            (3, "cat " + "filler " * 50),          # tf 1, long doc → penalized
            (4, "dog bird fish mouse rat"),        # no 'cat'
        ],
    )
    out = [r for r in bm25_topk(df, ["cat"], k=10).collect()]
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] == 1              # highest term frequency wins
    assert 4 not in ranked             # no match, no row
    assert ranked.index(2) < ranked.index(3)  # length normalization
    scores = {r["doc_id"]: r["score"] for r in out}
    assert scores[1] > scores[2] > scores[3] > 0


def test_duplicate_spans_cross_doc_only(spark):
    from flink_invoice_processor_spark.functions import dedup as DD

    boiler = "all rights reserved by the original content owner here"
    df = docs_df(spark, [
        (1, f"intro text {boiler}"),
        (2, f"{boiler} and a different tail entirely follows now"),
        (3, "short doc"),
        (4, "self repeat self repeat self repeat self repeat self repeat"),
    ])
    out = {r.span: (r.n_docs, r.n_occurrences)
           for r in DD.duplicate_spans(df, span_tokens=8, min_docs=2).collect()}
    # the 9-token boilerplate yields two 8-token spans shared by docs 1,2
    b = boiler.split()
    assert out[" ".join(b[:8])] == (2, 2)
    assert out[" ".join(b[1:9])] == (2, 2)
    # doc 4's within-doc repeats never reach min_docs=2
    assert all("self repeat" not in s for s in out)
    # and min_docs=1 sees them with occurrence counts > doc count
    solo = {r.span: (r.n_docs, r.n_occurrences)
            for r in DD.duplicate_spans(df, span_tokens=8, min_docs=1).collect()}
    assert solo["self repeat self repeat self repeat self repeat"] == (1, 2)


def test_duplicate_spans_digest_mode_matches_text_mode(spark):
    """key_on_digest=True (the 100 TB fixed-width-shuffle-key mode) must
    return exactly the rows the oracle-gated text-keyed mode returns."""
    from flink_invoice_processor_spark.functions import dedup as DD

    boiler = "all rights reserved by the original content owner here"
    df = docs_df(spark, [
        (1, f"intro text {boiler}"),
        (2, f"{boiler} and a different tail entirely follows now"),
        (3, "self repeat self repeat self repeat self repeat self repeat"),
    ])
    for min_docs in (1, 2):
        text_keyed = sorted(
            map(tuple, DD.duplicate_spans(
                df, span_tokens=8, min_docs=min_docs).collect())
        )
        digest_keyed = sorted(
            map(tuple, DD.duplicate_spans(
                df, span_tokens=8, min_docs=min_docs, key_on_digest=True
            ).collect())
        )
        assert text_keyed == digest_keyed and text_keyed


def test_materialize_mix_matches_allocation(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    alloc = {r.source: r.alloc_docs
             for r in CUR.domain_mix_weights(df, total_budget=20).collect()}
    picked = CUR.materialize_mix(df, total_budget=20).collect()
    by_src = {}
    for r in picked:
        by_src.setdefault(r.source, []).append(r.mix_rank)
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, alloc[src] + 1))
    assert set(by_src) == {s for s, a in alloc.items() if a > 0}
    # deterministic under re-run (retry safety)
    again = CUR.materialize_mix(df, total_budget=20).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, picked))
