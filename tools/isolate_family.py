"""Isolation measurement for one scaling family: a FRESH process/JVM,
nothing else run before it, large -> xlarge steady-state medians.

This mechanizes the hand-run isolation protocol used since r9 for
decade-tail defenses ("does the >2x harness ratio reproduce without the
suite history?") so the evidence re-runs every round instead of living
as a one-off docstring note (r11 verdict item 9: embedding_drift_tvd
sat >2x in the harness for two rounds while isolating clean at 1.26x —
the isolation column belongs IN the scaling artifact).

scaling_check.py shells out to this for every decade family whose
harness steady ratio exceeds the --isolate threshold; it can also be
run by hand.  Prints ONE JSON line on the last stdout line:

  {"family": name, "large_s": a, "xlarge_s": b, "ratio": b/a,
   "probe_s": mini_probe_at_start, "reps": n}

Usage: python tools/isolate_family.py FAMILY LARGE_DIR XLARGE_DIR
       [--reps=3]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    family, large, xlarge = args[0], args[1], args[2]

    from flink_invoice_processor_spark.functions import suite_cache
    from flink_invoice_processor_spark.plans.queries import QUERIES
    from flink_invoice_processor_spark.session import get_spark, mini_probe

    spark = get_spark("isolate_family")
    mini_probe(spark)  # warm: first execution is ~4 s of codegen JIT
    probe = mini_probe(spark)
    fn = QUERIES[family]

    out: dict[str, float | str | int] = {"family": family, "reps": reps,
                                         "probe_s": probe}
    # steady state per scale, same shape as the harness's bare-name
    # timing: suite-cache scope enabled, first (warm) call pays codegen
    # + artifact builds, the timed repetitions measure the plan.  The
    # scope spans both scales — cache keys carry sf_dir, so large-side
    # artifacts never serve xlarge calls.
    suite_cache.enable()
    try:
        for label, sf_dir in (("large_s", large), ("xlarge_s", xlarge)):
            fn(spark, sf_dir).count()  # warm: codegen + builds
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            out[label] = round(_median(samples), 3)
    finally:
        suite_cache.disable()
    out["ratio"] = round(out["xlarge_s"] / max(out["large_s"], 1e-9), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
