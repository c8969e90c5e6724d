"""Plan-hygiene sweep over EVERY registered query: no accidental cartesian
products or broadcast nested-loop joins anywhere in the surface.

knn_bruteforce is the single allowlisted exception: it deliberately
crossJoins a broadcast ONE-ROW query vector (the exactness baseline; the
ANN paths are the scale alternatives)."""

import pytest

from docling_ocr_qwen3vl_spark.queries import QUERIES

ALLOWED_NESTED_LOOP = {"knn_bruteforce"}

# driver-loop queries execute jobs during plan CONSTRUCTION; they are
# audited separately in PLANS.md and skipped here to keep the sweep fast
ITERATIVE = {"ivf_kmeans", "dup_components", "dup_components_fast", "dedup_survivors"}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - ITERATIVE))
def test_no_cartesian_anywhere(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if name not in ALLOWED_NESTED_LOOP:
        assert "BroadcastNestedLoopJoin" not in plan, name
