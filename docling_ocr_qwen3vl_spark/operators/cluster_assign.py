"""G6: cell -> cluster assignment (spatial containment join) + orphans.

The reference delegates to docling's LayoutPostprocessor
(layout_model.py:104-107): OCR cells are assigned to layout clusters by
geometric containment; cells matching no cluster become orphan TEXT
clusters (options.py:332-335 ``create_orphan_clusters``).

Spark shape: a range/theta join on bbox-center containment within the same
(doc_id, page_no), ties broken by max overlap area then min cluster_id
(deterministic total order); orphans via left-anti semantics from the same
join (null cluster side), wrapped as synthetic clusters with label 'text'.

Scale notes: the join key is (doc_id, page_no) EQUALITY plus a range
predicate, so Spark plans a hash join on the page key with the containment
as residual filter — co-partitioned, no cartesian blowup: cells and
clusters of one page meet in one task.  Skew = max clusters x cells per
page, bounded by page content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_cells_to_clusters(cells: DataFrame, clusters: DataFrame) -> DataFrame:
    """Assign each cell to the best containing cluster; orphans get
    cluster_id = -(cell_index+1) and label 'text'.

    cells:    doc_id, page_no, cell_index, cell_text, l, t, r, b
    clusters: doc_id, page_no, cluster_id, label, l, t, r, b
    output:   doc_id, page_no, cell_index, cell_text, cluster_id, label,
              is_orphan
    """
    cl = clusters.select(
        "doc_id",
        "page_no",
        "cluster_id",
        "label",
        F.col("l").alias("cl_l"),
        F.col("t").alias("cl_t"),
        F.col("r").alias("cl_r"),
        F.col("b").alias("cl_b"),
    )
    cx = (F.col("l") + F.col("r")) / 2.0
    cy = (F.col("t") + F.col("b")) / 2.0
    contained = (
        (cx >= F.col("cl_l"))
        & (cx <= F.col("cl_r"))
        & (cy >= F.col("cl_t"))
        & (cy <= F.col("cl_b"))
    )

    joined = cells.join(cl, on=["doc_id", "page_no"], how="left").filter(
        contained | F.col("cluster_id").isNull()
    )

    # overlap area of cell bbox with cluster bbox (for tie-break)
    ov_w = F.greatest(
        F.lit(0.0),
        F.least(F.col("r"), F.col("cl_r")) - F.greatest(F.col("l"), F.col("cl_l")),
    )
    ov_h = F.greatest(
        F.lit(0.0),
        F.least(F.col("b"), F.col("cl_b")) - F.greatest(F.col("t"), F.col("cl_t")),
    )
    scored = joined.withColumn("overlap", ov_w * ov_h)

    w = Window.partitionBy("doc_id", "page_no", "cell_index").orderBy(
        F.col("overlap").desc(), F.col("cluster_id").asc_nulls_last()
    )
    best = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)

    # cells whose best match is null (no cluster contained them, or the page
    # had no clusters at all) -> orphan text clusters
    matched = best.filter(F.col("cluster_id").isNotNull()).select(
        "doc_id",
        "page_no",
        "cell_index",
        "cell_text",
        "cluster_id",
        "label",
        F.lit(False).alias("is_orphan"),
    )
    all_cells = cells.select("doc_id", "page_no", "cell_index", "cell_text")
    orphan = all_cells.join(
        best.filter(F.col("cluster_id").isNotNull()).select(
            "doc_id", "page_no", "cell_index"
        ),
        on=["doc_id", "page_no", "cell_index"],
        how="left_anti",
    ).select(
        "doc_id",
        "page_no",
        "cell_index",
        "cell_text",
        (-(F.col("cell_index") + 1)).cast("int").alias("cluster_id"),
        F.lit("text").alias("label"),
        F.lit(True).alias("is_orphan"),
    )
    return matched.unionByName(orphan)
