"""Compare two scaling_check.py outputs for run-to-run agreement.

Usage: python tools/scaling_agreement.py A.json B.json [tolerance]

Prints one JSON line: per-section counts of families whose steady (and
build) medians agree within the tolerance (default 0.20 = ±20%), and the
list of disagreements with both values.  Agreement is measured on the
raw MEDIAN SECONDS (not the ratio): |a - b| / max(a, b) <= tol, the
symmetric relative difference.  Families under 0.3 s on both sides are
reported separately — at that absolute, scheduler jitter exceeds any
meaningful tolerance.

PROBE-NORMALIZED AGREEMENT (round 12): when both files carry per-family
``probe_s`` mini-probes (scaling_check.py embeds one before every
family since r12 — r11 verdict item 2), a second agreement pass runs on
probe-normalized seconds (family seconds ÷ that family's own probe), so
host drift that developed MID-RUN — which start-of-run probes proved
unable to explain in r11 (28/68 agreement at agreeing start probes) —
divides out family-by-family.  Both views are reported: ``agree`` (raw)
and ``agree_norm``; a family that disagrees raw but agrees normalized
was measured on a drifted host, not changed by code.

RATIO AGREEMENT (round 12, the claim-level view): the decade section
also reports ``agree_ratio`` — whether the two runs agree on each
family's STEADY-STATE DECADE RATIO (``xlarge_s / large_s``), which is
the number the docstrings actually claim.  Because scaling_check
measures a family's two scales back-to-back, slow host drift hits
numerator and denominator together and cancels in the ratio, so ratio
agreement is robust to exactly the drift that wrecks absolute-seconds
agreement (r12 paired runs: 69/71 ratio agreement at 44/71 seconds
agreement).  Read ``agree_ratio`` for "do the committed scaling claims
reproduce", and the seconds views for "was the host steady".
"""

from __future__ import annotations

import json
import sys


def _close(a: float, b: float, tol: float) -> bool:
    return abs(a - b) <= tol * max(a, b, 1e-9)


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.20

    out = {"tol": tol, "heads": [a.get("git_head"), b.get("git_head")]}
    for section, keys in (
        ("representative", ("small_s", "large_s")),
        ("decade", ("large_s", "xlarge_s", "large_s_build", "xlarge_s_build")),
    ):
        qa = a["decade"]["queries"] if section == "decade" else a["queries"]
        qb = b["decade"]["queries"] if section == "decade" else b["queries"]
        agree, agree_norm, tiny = 0, 0, 0
        diff: dict = {}
        diff_norm: dict = {}
        have_probes = True
        for name in qa:
            if name not in qb:
                continue
            pa = qa[name].get("probe_s")
            pb = qb[name].get("probe_s")
            if not pa or not pb:
                have_probes = False
            vals = [(k, qa[name][k], qb[name][k]) for k in keys]
            if all(max(x, y) < 0.3 for _, x, y in vals):
                tiny += 1
                continue
            bad = {
                k: [x, y] for k, x, y in vals
                if max(x, y) >= 0.3 and not _close(x, y, tol)
            }
            if bad:
                diff[name] = bad
            else:
                agree += 1
            if pa and pb:
                # normalized values are in "probe units"; the 0.3 s
                # jitter floor applies to the RAW seconds, same as above
                bad_n = {
                    k: [round(x / pa, 2), round(y / pb, 2)]
                    for k, x, y in vals
                    if max(x, y) >= 0.3 and not _close(x / pa, y / pb, tol)
                }
                if bad_n:
                    diff_norm[name] = bad_n
                else:
                    agree_norm += 1
        comparable = len([n for n in qa if n in qb]) - tiny
        out[section] = {
            "families": len([n for n in qa if n in qb]),
            "agree": agree,
            "sub_300ms_both": tiny,
            # BOTH accountings, mechanically (r12 verdict item 5): the
            # strict rate excludes the sub-300ms jitter-floor families
            # from the DENOMINATOR too (they are excluded from
            # comparison, not judged as agreeing); the inclusive rate
            # counts them as non-disagreeing.  Quote strict first.
            "agree_pct_strict": round(100.0 * agree / max(comparable, 1), 1),
            "agree_pct_incl_sub300ms": round(
                100.0 * (agree + tiny)
                / max(len([n for n in qa if n in qb]), 1),
                1,
            ),
            "disagree": diff,
        }
        if have_probes:
            out[section]["agree_norm"] = agree_norm
            out[section]["disagree_norm"] = diff_norm
        if section == "decade":
            r_agree, r_dis = 0, {}
            for name in qa:
                if name not in qb:
                    continue
                ra, rb = qa[name].get("ratio"), qb[name].get("ratio")
                if ra is None or rb is None:
                    continue
                if _close(ra, rb, tol):
                    r_agree += 1
                else:
                    r_dis[name] = [ra, rb]
            out[section]["agree_ratio"] = r_agree
            out[section]["disagree_ratio"] = r_dis
    print(json.dumps(out))


if __name__ == "__main__":
    main()
