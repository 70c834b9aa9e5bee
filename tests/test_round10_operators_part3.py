"""Round-10 part-3 operators: content-defined chunking dedup,
sorted-neighborhood near-dup pairs, URL canonicalization, and the
fenced CMS rollup serving exact heavy hitters.  Properties are checked
against independent Python reimplementations or first principles,
never the operator's own arithmetic."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import dedup as DD


def _cuts(toks: list[str], window: int = 16) -> list[int]:
    """Independent reimplementation of the CDC boundary rule."""
    return [
        i + 1
        for i, t in enumerate(toks)
        if int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % window == 0
    ]


def _chunks(toks: list[str], window: int = 16) -> list[list[str]]:
    cuts = _cuts(toks, window)
    bounds = list(zip([0] + cuts, cuts + [len(toks)]))
    return [toks[s:e] for s, e in bounds if e > s]


class TestContentDefinedChunks:
    def test_matches_reference_reimplementation(self, spark):
        text = "the quick brown fox jumps over the lazy dog " * 20
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = (
            DD.content_defined_chunks(df, window=4)
            .orderBy("chunk_id")
            .collect()
        )
        want = _chunks(text.split(), window=4)
        assert [r.chunk.split(" ") for r in got] == want
        assert [r.n_tokens for r in got] == [len(c) for c in want]
        assert [r.chunk_id for r in got] == list(range(len(want)))

    def test_chunks_partition_the_document(self, spark):
        words = [f"w{i * 37 % 101}" for i in range(300)]
        df = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        got = DD.content_defined_chunks(df, window=8).orderBy("chunk_id")
        joined = " ".join(r.chunk for r in got.collect())
        assert joined == " ".join(words)

    def test_boundaries_resynchronize_after_insertion(self, spark):
        # THE property fixed windows lack: prepending tokens shifts
        # only chunks up to the next content cut; everything after the
        # first shared boundary is identical.
        base = [f"t{i * 13 % 59}" for i in range(200)]
        edited = ["inserted", "tokens", "here"] + base
        df = spark.createDataFrame(
            [(1, " ".join(base)), (2, " ".join(edited))],
            "doc_id long, text string",
        )
        rows = DD.content_defined_chunks(df, window=8).collect()
        a = {r.chunk for r in rows if r.doc_id == 1}
        b = {r.chunk for r in rows if r.doc_id == 2}
        shared = a & b
        # every base chunk after the first cut following the insertion
        # point survives verbatim; with ~25 chunks the overlap must be
        # nearly total
        assert len(shared) >= len(a) - 2

    def test_empty_and_whitespace_docs_emit_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "one two")],
            "doc_id long, text string",
        )
        rows = DD.content_defined_chunks(df, window=4).collect()
        assert {r.doc_id for r in rows} == {3}

    def test_digest_mode_equals_text_mode(self, spark):
        texts = [
            (i, " ".join(f"v{(i * j) % 23}" for j in range(60)))
            for i in range(12)
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        plain = sorted(
            map(tuple, DD.cdc_chunk_duplicates(df, window=4).collect())
        )
        digest = sorted(
            map(
                tuple,
                DD.cdc_chunk_duplicates(
                    df, window=4, key_on_digest=True
                ).collect(),
            )
        )
        assert plain == digest
        assert len(plain) > 0


class TestSortedNeighborhoodPairs:
    def test_finds_prefix_stable_near_dups(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta " * 6
        rows = [
            (1, shared + "tail one extra"),
            (2, shared + "tail two other"),
            (3, "completely different text about nothing shared " * 8),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = DD.sorted_neighborhood_pairs(df, w=4, threshold=0.3).collect()
        pairs = {(r.doc_id_a, r.doc_id_b) for r in got}
        assert (1, 2) in pairs
        assert all(3 not in p for p in pairs)

    def test_each_candidate_pair_generated_once(self, spark):
        # identical docs sort adjacently; the bucket-adjacency join must
        # not duplicate a pair even when both docs share a bucket edge
        rows = [(i, "same words everywhere repeated " * 10) for i in range(9)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = DD.sorted_neighborhood_pairs(df, w=3, threshold=0.9).collect()
        pairs = [(r.doc_id_a, r.doc_id_b) for r in got]
        assert len(pairs) == len(set(pairs))
        # ranks are doc_id order here; every pair at rank distance <= 3
        expect = {
            (a, b) for a in range(9) for b in range(9) if 0 < b - a <= 3
        }
        assert set(pairs) == expect

    def test_beyond_window_not_candidates(self, spark):
        # two identical docs forced > w apart in the sort order by
        # distinct middle keys cannot be paired (SNM's documented trade)
        rows = [(i, f"key{i:02d} filler words " * 10) for i in range(10)]
        rows.append((97, "zz twin document body " * 10))
        rows.append((98, "zz twin document body " * 10))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = DD.sorted_neighborhood_pairs(
            df, w=2, threshold=0.5
        ).collect()
        pairs = {(r.doc_id_a, r.doc_id_b) for r in got}
        assert (97, 98) in pairs  # adjacent twins found
        # the distant distinct docs produce no false pairs
        assert all(a >= 97 for a, b in pairs)


class TestCanonicalUrl:
    def _canon(self, spark, urls: list[str]) -> list[str]:
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return [
            r.c
            for r in df.select(
                CUR.canonical_url(F.col("url")).alias("c")
            ).collect()
        ]

    def test_rules(self, spark):
        cases = {
            # scheme + host casing, www
            "HTTP://WWW.Ex.COM/a": "http://ex.com/a",
            # default ports dropped, non-default kept
            "http://ex.com:80/a": "http://ex.com/a",
            "https://ex.com:443/a": "https://ex.com/a",
            "http://ex.com:8080/a": "http://ex.com:8080/a",
            # fragment dropped
            "https://ex.com/a#frag": "https://ex.com/a",
            # tracking params dropped, others sorted
            "https://ex.com/a?utm_source=x&b=2&a=1": "https://ex.com/a?a=1&b=2",
            "https://ex.com/a?b=2&a=1&fbclid=z": "https://ex.com/a?a=1&b=2",
            # trailing slash; root path vanishes
            "https://ex.com/a/": "https://ex.com/a",
            "https://ex.com/": "https://ex.com",
            # all params tracking -> no query at all
            "https://ex.com/a?utm_x=1": "https://ex.com/a",
        }
        got = self._canon(spark, list(cases))
        assert got == list(cases.values())

    def test_idempotent(self, spark):
        urls = [
            "HTTP://WWW.Ex.COM:80/Articles/5/?utm_source=f&b=2&a=1#s",
            "https://ex.com:9443/x?z=1&y=2",
        ]
        once = self._canon(spark, urls)
        twice = self._canon(spark, once)
        assert once == twice


class TestCmsRolloverFence:
    def test_replayed_epoch_is_noop(self, spark, tmp_path):
        from flink_invoice_processor_spark.streaming.sketch_rollup import (
            cms_rollup_writer,
            read_cms_table,
        )

        path = str(tmp_path / "cms")
        df1 = spark.createDataFrame(
            [(k,) for k in ["a", "a", "b"]], "k string"
        )
        df2 = spark.createDataFrame([(k,) for k in ["a", "c"]], "k string")
        w = cms_rollup_writer(F.col("k"), path, depth=2, width=8)
        w(df1, 0)
        w(df2, 1)
        after = sorted(map(tuple, read_cms_table(spark, path).collect()))
        w(df2, 1)  # at-least-once replay: must be fenced
        again = sorted(map(tuple, read_cms_table(spark, path).collect()))
        assert after == again
        total = sum(c for _, _, c in after)
        assert total == 5 * 2  # 5 keys x depth 2, no double count
