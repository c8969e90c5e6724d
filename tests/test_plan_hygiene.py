"""Plan-hygiene sweep over EVERY registered query: no accidental cartesian
products or broadcast nested-loop joins anywhere in the surface.

Two allowlisted exceptions: knn_bruteforce deliberately crossJoins a
broadcast ONE-ROW query vector (the exactness baseline; the ANN paths are
the scale alternatives), and knn_batch's fast arm crossJoins a broadcast
16-row salt table to replicate queries over the salted corpus shards
(bounded by n_salts, never corpus-proportional — see _cogroup_topk).

The driver-loop queries (dup_components, dedup_survivors, ivf_kmeans)
execute jobs during plan CONSTRUCTION, so their whole-loop plan cannot be
swept; instead their PER-ITERATION plans — one min-label propagation round,
one Lloyd iteration — are asserted directly below, which is the plan that
actually repeats at scale."""

import pytest
from pyspark.sql import functions as F

from docling_ocr_qwen3vl_spark.queries import QUERIES

ALLOWED_NESTED_LOOP = {"knn_bruteforce", "knn_batch"}

# fixpoint loops: whole-query plan construction runs jobs; their repeating
# per-iteration plans are asserted individually below instead
ITERATIVE = {"ivf_kmeans", "dup_components", "dedup_survivors"}


def _assert_clean(df, name, allow_nested_loop=False):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if not allow_nested_loop:
        assert "BroadcastNestedLoopJoin" not in plan, name


@pytest.mark.parametrize("name", sorted(set(QUERIES) - ITERATIVE))
def test_no_cartesian_anywhere(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    _assert_clean(df, name, allow_nested_loop=name in ALLOWED_NESTED_LOOP)


def test_propagation_round_plan_clean(spark):
    """One dup_components round: edges x labels is an EQUI-join + min-agg."""
    from docling_ocr_qwen3vl_spark.operators.dedup import propagation_round

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    labels = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, comp long")
    refined = propagation_round(edges, labels)
    _assert_clean(refined, "propagation_round")
    plan = refined._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan  # it really is the join round, not a degenerate plan


def test_lloyd_iteration_plan_clean(spark):
    """One ivf_kmeans Lloyd iteration: argmin projection + partial-agg
    groupBy(cell) — no join at all, nothing to go cartesian, and the
    aggregate is the map-side-combine hash form."""
    from docling_ocr_qwen3vl_spark.operators.similarity import (
        _init_centroids,
        lloyd_iteration_plan,
    )

    dim = 4
    base = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (k + 1)).cast("long") for k in range(dim)]).alias(
            "vq"
        ),
    )
    stats = lloyd_iteration_plan(base, _init_centroids(3, dim), dim)
    _assert_clean(stats, "lloyd_iteration")
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "HashAggregate" in plan
