"""Adaptive partition spread for Python-kernel stages.

A heavy per-row kernel (Arrow pandas UDF / mapInPandas) runs at the width
of its INPUT partitioning.  A streaming micro-batch or small-file scan
arrives with 1-3 parquet splits, capping the kernel at that width while
the rest of the cluster idles; a 100 TB scan with thousands of splits has
the opposite property — repartitioning it would shuffle the full payload
for nothing.  ``spread_for_kernel`` widens ONLY narrow inputs, so the
same operator code is right at both extremes.

Two narrowness signals (both measured, round 6):

  * ``getNumPartitions() < width`` — the obvious case (few splits).
  * ``len(inputFiles()) < width`` while the split count LOOKS wide — the
    single-row-group trap: Spark range-splits a parquet file regardless of
    its row-group layout, but a range that starts past the file's only
    row-group boundary reads ZERO rows, so a 200 MB corpus written as 2
    AQE-coalesced files "has" 32 splits while every row sits in 2 of them.
    Round-6 measurement: the 1.28M-doc dedup-sweep signature stage ran
    ~120 s with 30 of 32 tasks empty (2 workers busy, host 90% idle);
    with this check + the round-robin spread it runs at full width.
    The file probe is bounded: it only fires when the split count is
    already small (< 8x width), so a 100 TB scan with ~10^5 splits never
    pays a driver-side file listing here.

Measured at local[32] (BENCH/BASELINE.md, round 5): one 80k-doc one-file
micro-batch through the k=64 MinHash kernel, 18.4 s -> 2.2 s (8.2x); the
600k-doc streaming dedup sweep end-to-end, 203 s -> 84 s at byte-identical
outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# (session id, analyzed-plan semanticHash, width) -> decision.  The probe
# itself (plan -> RDD conversion) costs ~0.1 s of driver time per build;
# a bench/driver run rebuilds the same query plans repeatedly, and the
# decision is deterministic per semantic plan + session conf, so memoize.
# Bounded: evicted wholesale when it grows past _MEMO_CAP (cheap, and a
# long-lived serve process cannot leak unbounded plan hashes).
_DECISION_MEMO: dict[tuple, bool] = {}
_MEMO_CAP = 4096


def _probe_is_narrow(df: DataFrame, width: int) -> bool:
    parts = df.rdd.getNumPartitions()
    if parts < width:
        return True
    if parts < width * 8:
        # split count looks wide but may be hollow (see module docstring):
        # a file-backed plan cannot parallelize a row group across tasks,
        # so fewer files than slots means the extra splits are empty.
        # inputFiles() is [] for non-file plans (in-memory, checkpoint
        # scans) — those splits are real, leave them alone.
        try:
            n_files = len(df.inputFiles())
        except Exception:
            n_files = 0
        if 0 < n_files < width:
            return True
    return False


def spread_for_kernel(df: DataFrame) -> DataFrame:
    """Round-robin repartition to defaultParallelism when (and only when)
    the input is effectively narrower than the cluster's slot count.
    Streaming DataFrames pass through untouched (no RDD conversion exists
    for them; the foreachBatch micro-batch frames the engine actually runs
    kernels on are batch frames and DO spread)."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    sc = spark.sparkContext
    width = sc.defaultParallelism
    try:
        key = (
            sc.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
            width,
        )
    except Exception:
        key = None
    if key is not None and key in _DECISION_MEMO:
        narrow = _DECISION_MEMO[key]
    else:
        narrow = _probe_is_narrow(df, width)
        if key is not None:
            if len(_DECISION_MEMO) >= _MEMO_CAP:
                _DECISION_MEMO.clear()
            _DECISION_MEMO[key] = narrow
    return df.repartition(width) if narrow else df
