"""Hand-model unit tests for the round-10 part-2 operators (nDCG, LOO
backoff LM) and the probe-normalizing bench-compare tool — values
computed by independent Python models, never the operator's own
arithmetic."""

from __future__ import annotations

import json
import math
import subprocess
import sys
from collections import Counter

from flink_invoice_processor_spark.functions import retrieval as RET
from flink_invoice_processor_spark.functions import text as TX


def _r6(x: float) -> int:
    return round(x * 1_000_000)


class TestNdcgHandModel:
    def test_three_doc_corpus(self, spark):
        # term 'cat': doc 1 tf=3, doc 2 tf=1, doc 3 tf=0
        rows = [
            (1, "cat cat cat filler words here"),
            (2, "cat other words entirely here now"),
            (3, "nothing relevant at all in this"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.term: r for r in RET.ndcg_report(df, ["cat"], k=10).collect()}
        r = got["cat"]
        assert r.n_matching == 2
        # ideal == actual here (BM25 ranks tf=3 above tf=1: same dl)
        # gains: rank 1 rel=3 -> (2^3-1)/log2(2) = 7; rank 2 rel=1 ->
        # (2^1-1)/log2(3)
        g1 = _r6((2**3 - 1) / math.log2(2))
        g2 = _r6((2**1 - 1) / math.log2(3))
        assert r.idcg6 == g1 + g2
        assert r.dcg6 == r.idcg6
        # ndcg6 = round-half-up of 1e6 * dcg/idcg = 1_000_000
        assert r.ndcg6 == 1_000_000

    def test_inverted_ranking_detected(self, spark):
        # make the BM25 ranking differ from the ideal: the high-tf doc
        # is much longer, so length normalization demotes it
        rows = [
            (1, "cat " * 3 + "pad " * 60),
            (2, "cat here with few other words"),
        ]
        df = spark.createDataFrame(
            [(i, t.strip()) for i, t in rows], "doc_id long, text string"
        )
        got = {r.term: r for r in RET.ndcg_report(df, ["cat"], k=10).collect()}
        r = got["cat"]
        assert r.n_matching == 2
        assert r.dcg6 < r.idcg6  # ranking is imperfect -> nDCG < 1
        assert 0 < r.ndcg6 < 1_000_000


def _py_loo_backoff(corpus):
    """Independent model: corpus = [(doc_id, source, tokens)]."""
    pair = Counter()
    ctx = Counter()
    uni = Counter()
    spair = Counter()
    sctx = Counter()
    suni = Counter()
    stok = Counter()
    ntok = 0
    for _, src, toks in corpus:
        for t in toks:
            uni[t] += 1
            suni[(src, t)] += 1
            stok[src] += 1
            ntok += 1
        for a, b in zip(toks, toks[1:]):
            pair[(a, b)] += 1
            ctx[a] += 1
            spair[(src, a, b)] += 1
            sctx[(src, a)] += 1
    out = {}
    for doc_id, src, toks in corpus:
        bigrams = Counter(zip(toks, toks[1:]))
        if not bigrams:
            continue
        n = sum(bigrams.values())
        backoff = 0
        s_total = 0
        for (a, b), c in bigrams.items():
            loo_pair = pair[(a, b)] - spair[(src, a, b)]
            loo_ctx = ctx[a] - sctx[(src, a)]
            loo_w2 = uni[b] - suni[(src, b)]
            loo_n = ntok - stok[src]
            if loo_pair > 0:
                s = -math.log2(loo_pair / loo_ctx)
            elif loo_w2 > 0:
                s = -math.log2(0.4 * loo_w2 / loo_n)
                backoff += c
            else:
                s = -math.log2(0.4 / (loo_n + 1))
                backoff += c
            s_total += c * _r6(s)
        out[doc_id] = (n, backoff, s_total // n)
    return out


class TestLooBackoffHandModel:
    def test_matches_python_model(self, spark):
        corpus = [
            (1, "web", "the cat sat on the mat".split()),
            (2, "web", "the cat ran off the mat".split()),
            (3, "code", "def cat foo the end".split()),
            (4, "news", "unique tokens nowhere else ever".split()),
        ]
        df = spark.createDataFrame(
            [(d, s, " ".join(t)) for d, s, t in corpus],
            "doc_id long, source string, text string",
        )
        got = {
            r.doc_id: (r.n_bigrams, r.n_backoff, r.surprisal6)
            for r in TX.loo_backoff_surprisal(df).collect()
        }
        want = _py_loo_backoff(corpus)
        assert got == want

    def test_backoff_fires_for_source_unique_bigrams(self, spark):
        # doc 4's bigrams exist ONLY in its own source -> every one
        # takes a backoff path under LOO
        corpus = [
            (1, "web", "shared words appear here twice".split()),
            (2, "code", "shared words appear here again".split()),
            (4, "news", "utterly singular phrasing throughout".split()),
        ]
        df = spark.createDataFrame(
            [(d, s, " ".join(t)) for d, s, t in corpus],
            "doc_id long, source string, text string",
        )
        got = {r.doc_id: r for r in TX.loo_backoff_surprisal(df).collect()}
        assert got[4].n_backoff == got[4].n_bigrams


class TestCompareBenchTool:
    def _run(self, old, new, tmp_path):
        po, pn = tmp_path / "o.json", tmp_path / "n.json"
        po.write_text(json.dumps(old))
        pn.write_text(json.dumps(new))
        res = subprocess.run(
            [sys.executable, "tools/compare_bench.py", str(po), str(pn)],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        )
        assert res.returncode == 0, res.stderr
        return json.loads(res.stdout.strip().splitlines()[-1])

    def test_drift_verdict_inside_probe_band(self, tmp_path):
        probe_o = {"probe_parallel_s": 0.5, "probe_serial_s": 0.3,
                   "probe_work": "w"}
        probe_n = {"probe_parallel_s": 0.6, "probe_serial_s": 0.36,
                   "probe_work": "w"}
        old = {"queries": {"a": 1.0, "b": 2.0}, "queries_warm": {"a": 0.9},
               "calibration": probe_o}
        new = {"queries": {"a": 1.2, "b": 2.4}, "queries_warm": {"a": 1.08},
               "calibration": probe_n}
        out = self._run(old, new, tmp_path)
        assert out["cold_ratio"] == 1.2
        assert out["probe_ratio"] == {"parallel": 1.2, "serial": 1.2}
        assert out["verdict"] == "drift"
        assert out["cold_ratio_norm"] == 1.0

    def test_code_verdict_outside_probe_band(self, tmp_path):
        probe = {"probe_parallel_s": 0.5, "probe_serial_s": 0.3,
                 "probe_work": "w"}
        old = {"queries": {"a": 1.0}, "queries_warm": {},
               "calibration": probe}
        new = {"queries": {"a": 3.0}, "queries_warm": {},
               "calibration": dict(probe)}
        out = self._run(old, new, tmp_path)
        assert out["cold_ratio"] == 3.0
        assert out["verdict"] == "code"
        assert out["movers_cold"][0] == ["a", 2.0]

    def test_no_probe_old_file(self, tmp_path):
        old = {"queries": {"a": 1.0}, "queries_warm": {}}
        new = {"queries": {"a": 1.1}, "queries_warm": {},
               "calibration": {"probe_parallel_s": 0.5,
                               "probe_serial_s": 0.3, "probe_work": "w"}}
        out = self._run(old, new, tmp_path)
        assert out["verdict"] == "unknown-no-probe"
