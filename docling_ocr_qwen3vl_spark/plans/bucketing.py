"""Bucketed (co-located) joins — the repeated-join strategy at 100 TB.

A join between two large tables shuffles BOTH sides on the key every time
it runs.  When the same join runs repeatedly (daily dedup sweeps, fact x
dim enrichment), pre-bucketing both tables by the join key amortizes that
shuffle into the write: Spark's bucketed scan reports the hash
partitioning to Catalyst, and the join plans with ZERO Exchange —
verified by test_bucketing.py, which asserts no Exchange operator in the
executed plan and result equality with the shuffled join.

Notes for real deployments:
  * bucket counts must match (or divide evenly, AQE 3.4+) on both sides;
  * ``sortBy`` on the key removes the sort before SortMergeJoin too;
  * Iceberg's bucket partition transform is the catalog-native equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Persist as an external bucketed+sorted table (parquet at ``path``)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two pre-bucketed tables on their bucket key — plans with no
    Exchange on either side (the scan's bucketing satisfies the join's
    clustering requirement)."""
    return spark.table(left_table).join(spark.table(right_table), key)
