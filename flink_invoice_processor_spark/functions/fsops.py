"""Filesystem operations through the Hadoop FileSystem API.

Spark writes resolve their filesystem from the path scheme (local, HDFS,
s3a, ...).  Any maintenance code that cleans up after those writes must
resolve the SAME way: a local ``glob``/``shutil.rmtree`` sweep silently
no-ops on every non-local scheme, leaving superseded partitions to
accumulate forever (correct reads only via downstream DISTINCTs, but
unbounded store growth and repeated re-compaction).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def delete_matching_dirs(spark: SparkSession, pattern: str) -> int:
    """Recursively delete every path matching the Hadoop glob ``pattern``
    (e.g. ``store/band_bucket=*/batch=3``), resolving the filesystem from
    the path scheme exactly like Spark's own writers.  Returns the number
    of paths deleted; a pattern with no matches deletes nothing and
    returns 0 (mirrors ``shutil.rmtree(ignore_errors=True)``'s tolerance
    of already-gone paths, which compaction re-runs rely on)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(jpath)
    n = 0
    if statuses is not None:
        for status in statuses:
            if fs.delete(status.getPath(), True):
                n += 1
    return n
