"""North-rule skew defusal: the unit of parallel work is a PAGE, so one
pathological document cannot pin a single task."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from docling_ocr_qwen3vl_spark.plans.pipeline import repartition_pages


def test_monster_document_spreads_across_partitions(spark):
    # one 4000-page document plus a handful of normal ones
    rows = [
        Row(doc_id="monster", page_no=p, payload_kind="plain_text",
            payload=f"page {p}", page_width=1000.0, page_height=1400.0)
        for p in range(4000)
    ] + [
        Row(doc_id=f"d{i}", page_no=0, payload_kind="plain_text",
            payload="x", page_width=1000.0, page_height=1400.0)
        for i in range(10)
    ]
    pages = repartition_pages(spark.createDataFrame(rows), spark, num_partitions=16)
    per_partition = (
        pages.filter(F.col("doc_id") == "monster")
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    counts = {r.pid: r["count"] for r in per_partition}
    # the monster's pages land on (virtually) every partition, none dominant
    assert len(counts) >= 14
    assert max(counts.values()) < 4000 * 0.25
