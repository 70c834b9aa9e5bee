"""Probe-normalized comparison of two BENCH_DETAIL.json files.

Usage: python tools/compare_bench.py OLD.json NEW.json [--top=N]

Prints one JSON line:
  {"cold_common": n, "warm_common": n, "cold_ratio": raw,
   "warm_ratio": raw,
   "probe_ratio": {"parallel": p, "serial": s} | null,
   "cold_ratio_norm": cold/closest_probe_leg, "cold_norm_leg": "...",
   "warm_ratio_norm": warm/closest_probe_leg, "warm_norm_leg": "...",
   "cold_verdict": "drift" | "code", "warm_verdict": "drift" | "code",
   "verdict": "drift" | "code" | "mixed",
   "movers_cold": [[name, cold_delta_s], ...]}

The verdict is mechanical (VERDICT r9 item 3): if both files carry a
calibration probe and a suite ratio lies INSIDE the band spanned by
the two probe ratios (parallel..serial, widened by ±5%), that
movement is host drift by construction; a ratio outside the band is
code (or data) movement.  BOTH legs are judged — cold and warm each
get their own verdict, and the combined verdict is "mixed" when they
disagree (a warm-only code regression on a drifting host must not be
labeled "drift").  Each suite ratio is normalized by whichever probe
leg sits closest to it (parallel-bound suites track the parallel
probe, single-task tails the serial one); the leg used is emitted.
Files without a probe (pre-r10) compare raw, with verdict
"unknown-no-probe".

Movers are reported RAW and should be read against the probe ratio —
a mover whose own ratio matches the probe is drifting with the host.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    for a in sys.argv[1:]:
        if a.startswith("--top="):
            top = int(a.split("=", 1)[1])
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))

    out: dict = {}
    for label, key in (("cold", "queries"), ("warm", "queries_warm")):
        qo, qn = old.get(key) or {}, new.get(key) or {}
        common = sorted(set(qo) & set(qn))
        so = sum(qo[k] for k in common)
        sn = sum(qn[k] for k in common)
        out[f"{label}_common"] = len(common)
        out[f"{label}_ratio"] = round(sn / so, 3) if so else None

    po, pn = old.get("calibration"), new.get("calibration")
    if po and pn and po.get("probe_work") == pn.get("probe_work"):
        pr = {
            "parallel": round(
                pn["probe_parallel_s"] / po["probe_parallel_s"], 3
            ),
            "serial": round(pn["probe_serial_s"] / po["probe_serial_s"], 3),
        }
        out["probe_ratio"] = pr
        lo = min(pr.values()) * 0.95
        hi = max(pr.values()) * 1.05
        verdicts = []
        for label in ("cold", "warm"):
            r = out.get(f"{label}_ratio")
            if r is None:
                continue
            leg = min(pr, key=lambda leg: abs(pr[leg] - r))
            out[f"{label}_ratio_norm"] = round(r / pr[leg], 3)
            out[f"{label}_norm_leg"] = leg
            out[f"{label}_verdict"] = "drift" if lo <= r <= hi else "code"
            verdicts.append(out[f"{label}_verdict"])
        if not verdicts:
            out["verdict"] = "unknown"
        elif len(set(verdicts)) == 1:
            out["verdict"] = verdicts[0]
        else:
            out["verdict"] = "mixed"
    else:
        out["probe_ratio"] = None
        out["verdict"] = "unknown-no-probe"

    qo, qn = old.get("queries") or {}, new.get("queries") or {}
    movers = sorted(
        ((round(qn[k] - qo[k], 3), k) for k in set(qo) & set(qn)),
        key=lambda x: -abs(x[0]),
    )[:top]
    out["movers_cold"] = [[k, d] for d, k in movers]
    out["git_head_old"] = old.get("git_head")
    out["git_head_new"] = new.get("git_head")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
