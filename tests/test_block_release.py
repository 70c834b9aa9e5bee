"""Storage-release regression tests for the eager pair pipelines.

BENCH_DETAIL_r04 showed ngram_jaccard 65% SLOWER warm than cold: dead
localCheckpoint blocks from earlier pipelines survived one GC cycle
(py4j detach lands after the first JVM GC) and thrashed the next big
persist.  These tests pin the two halves of the fix:

1. ``drain_block_store`` actually empties the block store after pair
   pipelines whose blocks a single gc+System.gc leaves behind;
2. repeated pair-pipeline calls do not accumulate storage (each call's
   persist is released by ``_finish_pairs`` before returning, so live
   blocks never grow with call count).
"""

from __future__ import annotations

from flink_invoice_processor_spark.functions import dedup as DD
from flink_invoice_processor_spark.session import drain_block_store
from flink_invoice_processor_spark.tables import load_table


def _stored_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_drain_block_store_empties_after_pair_pipelines(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    DD.jaccard_pairs(docs, n=3, threshold=0.5, max_shingle_doc_freq=100).count()
    DD.simhash_pairs(docs, bits=32, max_hamming=3).count()
    left = drain_block_store(spark, timeout_s=30.0)
    assert left == 0, f"{left} RDDs still stored after drain"


def test_repeated_pair_calls_do_not_accumulate_storage(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # each call checkpoints ONE small pair output whose blocks free on GC;
    # draining to zero after EVERY call proves no module- or caller-level
    # reference pins storage (the persisted shingle explode is released
    # inside the call).  Counting stored RDDs between calls without a
    # drain is GC-timing-dependent and flaked in full-suite runs.
    for i in range(3):
        DD.jaccard_pairs(
            docs, n=3, threshold=0.5, max_shingle_doc_freq=100
        ).count()
        left = drain_block_store(spark, timeout_s=30.0)
        assert left == 0, f"call {i}: {left} RDDs still stored after drain"
