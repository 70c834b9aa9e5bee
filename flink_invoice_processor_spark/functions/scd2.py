"""Type-2 slowly-changing-dimension history over an event stream.

One shared definition of the SCD2 computation, used by BOTH the batch
query (``plans/queries.py`` ``events_scd2_history``, oracle-gated
against DuckDB) and the incremental streaming maintainer
(``streaming/scd2_job.py``) — batch/stream parity is a property of the
code, not a convention, because there is exactly one set of expressions.

Semantics (the warehouse MERGE-on-every-load dimension pattern):

- each (user_id, ts, event_type) observation is a potential state
  change; consecutive observations of the SAME state collapse into one
  version (the SCD2 no-op-update rule);
- each surviving change opens a version with ``valid_from`` = its ts;
  the version closes (``valid_to``) when the next change arrives —
  intervals are half-open [valid_from, valid_to);
- the single open interval per user (``valid_to`` NULL,
  ``is_current`` true) is the user's current state;
- ``version`` numbers a user's versions densely from 1 in ts order.

Determinism contract: (user_id, ts) must be unique (true of the driver
events table — pinned by the dq suite's uniqueness check pattern).  With
duplicate timestamps for one user the lag/lead order would be
ambiguous; the streaming maintainer defends against the AT-LEAST-ONCE
version of this (the same observation redelivered in a different epoch)
by deduplicating exact (user_id, ts, event_type) triples before
recomputing.

Scale shape: ONE exchange on user_id serves the change filter and both
interval windows (pinned in ``tests/test_relational.py``); ordering
within a user is partition-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(events: DataFrame) -> DataFrame:
    """Full-rebuild SCD2 history from an events DataFrame with columns
    ``user_id``, ``ts``, ``event_type`` (extra columns are ignored).

    Returns (user_id, state, valid_from, valid_to, is_current, version).
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    changes = (
        events.select(
            "user_id", "ts", "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version"),
    )
