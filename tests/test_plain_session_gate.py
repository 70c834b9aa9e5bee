"""Regression gate for the round-1 failure class: a conf that lives only in
the repo's session factory is invisible to the driver's harness, which
builds its own plain SparkSession.  This test runs the oracle checker in a
FRESH subprocess (so no session state leaks from the pytest JVM) against
queries covering every table family — most importantly ``events``, whose
nanosecond-timestamp parquet is unreadable unless ``load_table`` itself
arranges the conf."""

from __future__ import annotations

import subprocess
import sys

SF_DIR = "/root/testdata/sf0.001"

# one per table family / failure class: events (nanos), lineitem (float
# discipline), customer+orders (anti join, integer cents), documents,
# embeddings (ANN oracle)
QUERIES = [
    "events_tumbling",
    "events_user_rolling",  # NTZ epoch-seconds path (r3's crash class)
    "retry_backoff_schedule",
    "q1_pricing_summary",
    "customers_without_orders",
    "exact_dedup_docs",
    "ann_lsh_topk",
]


def test_oracle_gate_on_plain_session():
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/check_oracles.py", SF_DIR, *QUERIES],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    tail = "\n".join(proc.stdout.splitlines()[-12:])
    assert proc.returncode == 0, f"oracle gate failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "0 failures" in proc.stdout
