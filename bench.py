"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line as its very last stdout line:
{"metric": ..., "value": cold_total_sec, "value_warm": warm_total_sec,
 "unit": "sec", "sf": ..., "queries": {<10 slowest cold>: sec, ...}}.

The full cold+warm per-query breakdown goes to BENCH_DETAIL.json next to
this script — the round-2 single-line dump of 80×2 per-query dicts
overflowed the driver's tail capture (BENCH_r02.json: parsed=null), so
the final line now stays small no matter how many queries the suite has.

Each query is executed to completion (count() over the result — rows are
materialized but not shipped to the driver), timed wall-clock after a
warm-up of the session.

Two passes are timed: the cold pass (``value`` — directly comparable
across rounds, dominated by whole-stage-codegen JIT of ~2-3 s per novel
plan shape) and a warm pass (``value_warm`` — the steady-state plan cost,
which is what a long-running cluster actually pays per query).
``SPARK_GRAFT_COLD_ONLY=1`` skips the warm pass.  The cache is cleared
between passes so persisted dedup intermediates from the cold pass don't
accumulate (and the warm pass measures plan cost, not cache hits).

Round 14 (additions only, same timing methodology and output contract):
each timed leg is bracketed with /proc/stat snapshots and the steal/user
delta emitted as ``steal_pct`` {cold, warm, run}, and the calibration
probe is re-run mid-suite (between the legs) and at end
(``calibration_mid`` / ``calibration_end``) — this host's neighbors
steal 2-40% of user CPU under sustained load, invisible to a
start-of-run probe, and r13's 0.68x phantom headline took a forensic
8-core control run to dismiss.  A run with steal above a few percent
should be discarded and re-run, mechanically, from the JSON alone.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def _headline() -> list[str]:
    """EVERY registered query, in FIXED canonical order (sorted by name).
    Derived instead of hand-listed so a newly registered query can never be
    silently missing from the perf surface.  Sorted instead of registry
    order (VERDICT r10 item 9): registry order follows the driver-gate
    window, which rotates every round — benching in that order moved
    rotated rows to the suite head where they pay the shared JVM/JIT
    warmup, so cross-round cold comparisons aliased the window rotation
    (r10's bigram_familiarity_docs/hybrid_rrf_docs cold "regressions"
    were pure suite position).  A name-sorted suite keeps warmup costs
    attached to the same queries round over round."""
    from flink_invoice_processor_spark.plans.queries import QUERIES

    return sorted(QUERIES)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from flink_invoice_processor_spark.session import get_spark
    from flink_invoice_processor_spark.plans.queries import QUERIES

    HEADLINE = _headline()
    # system load at start: concurrent Spark jobs (pytest, oracle sweeps)
    # pollute timings with phantom warm>cold anomalies (r5 postmortem) —
    # record the 1-min load average, and flag when it exceeds half the
    # bench's own CPU budget so readers can tell noise from leaks without
    # a re-run
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_at_start = round(os.getloadavg()[0], 2) if hasattr(os, "getloadavg") else None
    load_warning = (
        load_at_start is not None and load_at_start > n_cpus / 2
    )

    spark = get_spark("bench")
    # warm up the JVM, the Python/Arrow UDF workers, and parquet footers so
    # per-query timings measure the queries, not process startup
    spark.range(1).count()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(v: pd.Series) -> pd.Series:
        return v

    spark.range(1000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .select(_warm(col("id"))).count()

    # host-drift calibration probe (VERDICT r9 item 3): fixed synthetic
    # work timed at run start so cross-session suite ratios can be
    # mechanically normalized by the probe ratio instead of by prose
    from flink_invoice_processor_spark.session import (
        calibration_probe,
        cpu_stat,
        steal_pct,
    )

    probe = calibration_probe(spark)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from gitinfo import git_head

    from flink_invoice_processor_spark.functions import suite_cache

    def timed_query(name: str) -> tuple[float, dict[str, float]]:
        """Execute one query to completion and return (seconds EXCLUDING
        suite-cache artifact builds, {artifact: build seconds}).  The
        single timing/attribution definition for the cold pass, the warm
        pass, and the anomaly reruns — their numbers are documented as
        comparable, so they must come from the same code."""
        t0 = time.perf_counter()
        # no drain in an except here: a failing query may still have
        # BUILT a shared artifact successfully — the caller drains and
        # folds those seconds into the __artifact entries, otherwise the
        # build vanishes from the pass total and the artifact's later
        # consumers look anomalously cheap (exactly the attribution
        # noise the __artifact entries exist to fix)
        QUERIES[name](spark, sf_dir).count()
        elapsed = time.perf_counter() - t0
        built = suite_cache.drain_build_times()
        return max(elapsed - sum(built.values()), 0.0), built

    def timed_pass() -> tuple[
        dict[str, float], dict[str, str], dict[str, float]
    ]:
        # Crash-isolated: one regressed query must NEVER zero out the whole
        # round's perf signal (round 3 shipped rc=1/no-headline because a
        # single analysis error escaped this loop).  Failures are timed out
        # of the totals and recorded by name.
        #
        # Suite-cache scope: composed queries (pagerank over simhash pairs,
        # dup clusters over LSH pairs, the 4 PQ-family queries over one
        # codebook) share their bit-identical intermediates WITHIN a pass —
        # the first builder pays the build, later consumers reuse.  The
        # scope ends with the pass, so the warm pass rebuilds from scratch
        # and stays comparable round-over-round.
        #
        # Artifact attribution (r6 verdict #5): which query pays a shared
        # build is an accident of suite order, so a cache-shared family's
        # per-query number used to jump rounds (simhash_pairs_docs
        # 0.30→2.65 s in r6, pure attribution).  Build seconds are now
        # drained from the suite cache after every query, SUBTRACTED from
        # that query's time, and reported as explicit ``__artifact:<name>``
        # pseudo-entries — the pass total is unchanged, but a query's
        # number now means "probe cost given the artifact" every round.
        #
        # Per-query load (r6 verdict #6): the 1-min load average is
        # sampled before every query so a warm>cold anomaly can be traced
        # to exogenous load without a re-run.
        t: dict[str, float] = {}
        errs: dict[str, str] = {}
        loads: dict[str, float] = {}
        suite_cache.enable()
        try:
            for name in HEADLINE:
                if hasattr(os, "getloadavg"):
                    loads[name] = round(os.getloadavg()[0], 2)
                try:
                    secs, built = timed_query(name)
                    t[name] = round(secs, 3)
                except Exception as e:  # noqa: BLE001 - record, keep benching
                    # artifacts built inside the failing query are real
                    # pass cost — fold them in so their later consumers'
                    # probe-only numbers stay attribution-stable
                    built = suite_cache.drain_build_times()
                    errs[name] = f"{type(e).__name__}: {e}"[:400]
                for art, bsecs in built.items():
                    t[f"__artifact:{art}"] = round(
                        t.get(f"__artifact:{art}", 0.0) + bsecs, 3
                    )
        finally:
            suite_cache.disable()
        return t, errs, loads

    # Steal brackets (VERDICT r13 item 1): this host's hypervisor
    # neighbors steal 2-40% of user CPU under sustained load, and the
    # start-of-run probe cannot see it (r13's 0.68x "regression" was
    # host steal; proving that took an 8-core control run).  Each timed
    # leg is bracketed with /proc/stat snapshots and its steal/user
    # delta emitted, so a degraded run self-identifies in the JSON.
    stat_run_start = cpu_stat()
    stat_cold_start = cpu_stat()
    timings, errors, loads = timed_pass()  # cold: first execution of every plan
    stat_cold_end = cpu_stat()
    # mid-suite probe re-run: r13 showed drift developing MID-run where
    # the start probe can't see it (overnight neighbor ramp) — a second
    # probe between the legs localizes when the host turned.
    probe_mid = calibration_probe(spark)
    detail = {
        "metric": "headline query suite wall-clock",
        "value": round(sum(timings.values()), 3),
        # number of queries contributing to `value`: a crash-isolated
        # failure SHRINKS the sum, so round-over-round comparisons must
        # check n_ok (and `errors`), not the bare total.  __artifact:
        # pseudo-entries are part of the sum but are not queries.
        "n_ok": sum(not k.startswith("__artifact:") for k in timings),
        "n_total": len(HEADLINE),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "git_head": git_head(),
        "calibration": probe,
        "calibration_mid": probe_mid,
        "load_at_start": load_at_start,
        "load_before_query": loads,
        "steal_pct": {"cold": steal_pct(stat_cold_start, stat_cold_end)},
    }
    if load_warning:
        detail["load_warning"] = (
            f"1-min load {load_at_start} > {n_cpus / 2:g} at bench start: "
            "timings likely polluted by concurrent work; rerun solo before "
            "reading regressions"
        )
    if errors:
        detail["errors"] = errors
    if os.environ.get("SPARK_GRAFT_COLD_ONLY") != "1":
        # dedup/ANN queries persist() intermediates; clear them so the warm
        # pass measures plan cost, not cache hits, and cached partitions from
        # 80+ queries don't accumulate across the double pass
        spark.catalog.clearCache()
        # clearCache only drops catalog-level cache; localCheckpoint blocks
        # from ~20 cold-pass queries are RDD-level.  One gc + fixed sleep
        # (the round-3 fix) is not enough: py4j detach lands after the first
        # JVM GC, so ~1 GB of dead checkpoint blocks from the cold tail
        # (pagerank edges, IVF+PQ Lloyd steps) survived into the warm pass
        # and thrashed its first big persist (ngram_jaccard warm 65% SLOWER
        # than cold in BENCH_DETAIL_r04).  drain_block_store loops the GC
        # handshake until the block store is actually empty.
        from flink_invoice_processor_spark.session import drain_block_store

        leftover = drain_block_store(spark, timeout_s=45.0)
        stat_warm_start = cpu_stat()
        warm_timings, warm_errors, warm_loads = timed_pass()  # codegen JIT'd
        detail["steal_pct"]["warm"] = steal_pct(stat_warm_start, cpu_stat())
        detail["rdds_left_after_drain"] = leftover
        detail["value_warm"] = round(sum(warm_timings.values()), 3)
        detail["queries_warm"] = warm_timings
        detail["load_before_query_warm"] = warm_loads
        if warm_errors:
            detail["errors_warm"] = warm_errors
        # r6 verdict #6: a warm number >1.5x its cold twin is anomalous
        # (warm should only drop JIT cost).  Re-run each anomaly once at
        # pass end and record the second measurement next to the first —
        # if the rerun is back near cold, the first number was exogenous
        # (load spike, page-cache eviction), not a regression.  The
        # absolute margin is 0.35 s (was 0.5): the r11 driver run's
        # simhash_docs anomaly (warm 1.21 vs cold 0.72) missed the old
        # gate by 0.017 s and polluted the movers list (r11 verdict
        # item 6) — at sub-second colds the 1.5x leg alone is too
        # permissive, and a spurious extra rerun costs ~1 s.
        rerun: dict[str, float] = {}
        suite_cache.enable()
        try:
            for name, wsec in warm_timings.items():
                if name.startswith("__artifact:"):
                    continue
                csec = timings.get(name)
                if csec is None or wsec <= max(1.5 * csec, csec + 0.35):
                    continue
                try:
                    # artifacts rebuilt in the rerun scope are excluded by
                    # timed_query so the number compares to queries_warm
                    rerun[name] = round(timed_query(name)[0], 3)
                except Exception:  # noqa: BLE001 - rerun is best-effort
                    # drain so a failed rerun's builds can't pollute the
                    # next rerun's attribution
                    suite_cache.drain_build_times()
        finally:
            suite_cache.disable()
        if rerun:
            detail["queries_warm_rerun"] = rerun

    # end-of-run probe + whole-run steal: with start/mid/end probes and
    # per-leg steal deltas, a reader can tell WHEN the host turned (and
    # by how much) without a control re-run.
    detail["calibration_end"] = calibration_probe(spark)
    detail["steal_pct"]["run"] = steal_pct(stat_run_start, cpu_stat())

    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    # the driver tail-captures stdout and parses the LAST line as JSON — keep
    # it compact (totals + the 10 slowest cold queries) no matter how many
    # queries HEADLINE grows to
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    out = {
        "metric": detail["metric"],
        "value": detail["value"],
        "n_ok": detail["n_ok"],
        "n_total": detail["n_total"],
        "unit": "sec",
        "queries": slowest,
        "sf": sf,
        "calibration": probe,
        # steal + mid/end probes in the compact line too (VERDICT r13
        # item 1): the driver only tail-captures this line, and a
        # degraded run must self-identify there, not just in the detail
        "calibration_mid": detail["calibration_mid"],
        "calibration_end": detail["calibration_end"],
        "steal_pct": detail["steal_pct"],
    }
    if load_warning:
        out["load_warning"] = detail["load_warning"]
    if "value_warm" in detail:
        out["value_warm"] = detail["value_warm"]
        # a query that succeeds cold but crashes warm silently shrinks
        # value_warm — surface the warm ok-count (and names) up here too
        out["n_ok_warm"] = sum(
            not k.startswith("__artifact:") for k in detail["queries_warm"]
        )
    if errors:
        # names only in the compact line (messages live in BENCH_DETAIL.json)
        out["errors"] = sorted(errors)
    if detail.get("errors_warm"):
        out["errors_warm"] = sorted(detail["errors_warm"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
