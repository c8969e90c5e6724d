"""Adaptive partition spread for Python-kernel stages.

A heavy per-row kernel (Arrow pandas UDF / mapInPandas) runs at the width
of its INPUT partitioning.  A streaming micro-batch or small-file scan
arrives with 1-3 parquet splits, capping the kernel at that width while
the rest of the cluster idles; a 100 TB scan with thousands of splits has
the opposite property — repartitioning it would shuffle the full payload
for nothing.  ``spread_for_kernel`` widens ONLY narrow inputs, so the
same operator code is right at both extremes.

Measured at local[32] (BENCH/BASELINE.md, round 5): one 80k-doc one-file
micro-batch through the k=64 MinHash kernel, 18.4 s -> 2.2 s (8.2x); the
600k-doc streaming dedup sweep end-to-end, 203 s -> 84 s at byte-identical
outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_kernel(df: DataFrame) -> DataFrame:
    """Round-robin repartition to defaultParallelism when (and only when)
    the input has fewer partitions than the cluster has slots.  Streaming
    DataFrames pass through untouched (no RDD conversion exists for them;
    the foreachBatch micro-batch frames the engine actually runs kernels
    on are batch frames and DO spread)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    width = sc.defaultParallelism
    if df.rdd.getNumPartitions() < width:
        return df.repartition(width)
    return df
