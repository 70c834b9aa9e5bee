"""Local replica of the driver's t2 correctness gate: run every declared
query through Spark AND its DuckDB oracle on the same parquet, compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
from datetime import datetime

import duckdb

sys.path.insert(0, "/root/repo")


def norm_cell(v):
    # Driver-strength normalization: full-precision float repr (any ULP
    # difference between Spark and DuckDB is a mismatch) and NO
    # Decimal→float collapse (a DECIMAL on one side vs DOUBLE on the other
    # must fail here, because it fails the driver's hash).  Local green
    # must imply driver green — looser normalization lied in round 1.
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from gitinfo import git_head

    # producing-commit identity first, so a committed sweep file is
    # checkable against git history without re-running the sweep
    print(f"git_head: {git_head()}")

    # Replicate the driver: a PLAIN SparkSession, NOT the repo session
    # factory.  Round 1 shipped a conf that lived only in the factory and 13
    # queries died in the driver's harness while local checks stayed green.
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("check_oracles")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            # Relation first: inspect declared output types BEFORE fetching.
            # fetchall() collapses HUGEINT (DuckDB's SUM(BIGINT) result) to
            # Python int, hiding a type the driver's pandas/Arrow
            # materialization turns into float64/object — an invisible-
            # locally, hash-fatal-in-the-driver divergence (q10, round 3).
            rel = con.sql(oracles[name])
            otypes = {c: str(t) for c, t in zip(rel.columns, rel.types)}
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            failures.append(name)
            continue

        problems = []
        widened = {
            c: t for c, t in otypes.items()
            if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")
        }
        if widened:
            problems.append(
                f"oracle output type(s) {widened} have no Spark equivalent — "
                f"CAST them (AS BIGINT / AS DOUBLE) in the oracle SQL"
            )
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            hs = table_hash(scols, srows)
            ho = table_hash(ocols, orows)
            if hs != ho:
                problems.append("value hash mismatch")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x01".join(norm_cell(r[i]) for i in order_s) for r in srows)
                lo = sorted("\x01".join(norm_cell(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"first diff:\n  spark={a[:300]}\n  duck ={b[:300]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
