"""Capture ``.explain("formatted")`` output for declared queries.

Usage:
    python tools/capture_plans.py --repo <repo_root> --out <out_dir> \
        --suffix <before|after> [--sf <sf_dir>] <query> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query.  Two plan
classes per file:

- the FINAL returned DataFrame's formatted plan (for maintained-store
  queries this is a trivial scan of a localCheckpoint — the real work
  lives in the write legs);
- every ``DataFrameWriter.parquet`` call the query performs while
  running, captured by intercepting the writer (the store queries'
  landing/view/compaction writes are plans too, and the landing-fan
  fixes of round 13 live exactly there).

``--repo`` lets the same tool run against a historical git worktree
(for ``_before`` files) without committing anything there.  Paths under
/tmp are sanitized so before/after files diff cleanly.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys


def _sanitize(text: str) -> str:
    # temp dirs (tempfile.mkdtemp suffixes) and plan ids differ run to
    # run; normalize so _before/_after diffs show structure, not noise
    text = re.sub(r"/tmp/[A-Za-z0-9_]+_q_[a-z0-9_]+", "/tmp/<store>", text)
    text = re.sub(r"#\d+L?", "#x", text)
    text = re.sub(r"plan_id=\d+", "plan_id=x", text)
    text = re.sub(r"RDD\[\d+\]", "RDD[x]", text)
    return text


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    os.makedirs(args.out, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("capture_plans")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from flink_invoice_processor_spark.plans.queries import QUERIES

    import pyspark.sql.readwriter as rw

    def explain_str(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    captures: list[tuple[str, str]] = []
    orig_parquet = rw.DataFrameWriter.parquet

    def spy_parquet(self, path, *a, **kw):
        captures.append((path, explain_str(self._df)))
        return orig_parquet(self, path, *a, **kw)

    rw.DataFrameWriter.parquet = spy_parquet
    try:
        for name in args.queries:
            captures.clear()
            df = QUERIES[name](spark, args.sf)
            final = explain_str(df)
            out_path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
            with open(out_path, "w") as fh:
                fh.write(f"== query: {name}  (sf_dir={args.sf})\n")
                fh.write("== final returned DataFrame ==\n")
                fh.write(_sanitize(final))
                for i, (wpath, plan) in enumerate(captures):
                    fh.write(
                        f"\n== write leg {i}: "
                        f"{_sanitize(wpath)} ==\n"
                    )
                    fh.write(_sanitize(plan))
            print(f"wrote {out_path} ({1 + len(captures)} plans)")
    finally:
        rw.DataFrameWriter.parquet = orig_parquet
    spark.stop()


if __name__ == "__main__":
    main()
