"""Compare two scaling_check.py outputs for run-to-run agreement.

Usage: python tools/scaling_agreement.py A.json B.json [tolerance]

Prints one JSON line: per-section counts of families whose steady (and
build) medians agree within the tolerance (default 0.20 = ±20%), and the
list of disagreements with both values.  Agreement is measured on the
raw MEDIAN SECONDS (not the ratio): |a - b| / max(a, b) <= tol, the
symmetric relative difference.  Families under 0.3 s on both sides are
reported separately — at that absolute, scheduler jitter exceeds any
meaningful tolerance.
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
        agree, tiny, diff = 0, 0, {}
        for name in qa:
            if name not in qb:
                continue
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
        out[section] = {
            "families": len([n for n in qa if n in qb]),
            "agree": agree,
            "sub_300ms_both": tiny,
            "disagree": diff,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
