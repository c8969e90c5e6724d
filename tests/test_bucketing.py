"""Bucketed co-located join: zero Exchange in the executed plan, results
identical to the shuffled join."""

import os

from pyspark.sql import functions as F

from docling_ocr_qwen3vl_spark.plans.bucketing import co_located_join, write_bucketed
from docling_ocr_qwen3vl_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange_and_matches(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    cust = customer.withColumnRenamed("c_custkey", "o_custkey")

    write_bucketed(orders, "orders_b", str(tmp_path / "ob"), "o_custkey")
    write_bucketed(cust, "customer_b", str(tmp_path / "cb"), "o_custkey")
    try:
        # force SMJ: the small side would broadcast and hide the bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = co_located_join(spark, "orders_b", "customer_b", "o_custkey")
        got = sorted(
            (r.o_orderkey, r.o_custkey, r.c_name) for r in joined.collect()
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        want = sorted(
            (r.o_orderkey, r.o_custkey, r.c_name)
            for r in orders.join(cust, "o_custkey").collect()
        )
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
