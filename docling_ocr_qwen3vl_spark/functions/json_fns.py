"""Spark column expressions for the regex-expressible JSON repair steps.

The full repair CASCADE (try/parse/retry) lives in the pandas UDFs
(operators/layout.py, operators/tables.py) via ``semantics.json_repair``;
these column forms cover the individual regex steps so they stay JVM-side
when used standalone (T6/T7-partial/T13 in SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fix_corrupted_keys(col: Column) -> Column:
    """``"y1:890`` -> ``"y1":890`` (_vlm_jsonformer.py:35-38)."""
    return F.regexp_replace(col, r'"(\w+):(\d)', r'"$1":$2')


def strip_trailing_commas(col: Column) -> Column:
    """``,}`` / ``,]`` -> ``}`` / ``]`` (_vlm_jsonformer.py:45,76)."""
    return F.regexp_replace(col, r",\s*([}\]])", r"$1")


def extract_json_block(col: Column) -> Column:
    """First-to-last brace block, greedy; '' when absent
    (picture_classifier_model.py:146-149)."""
    return F.regexp_extract(col, r"\{[\s\S]*\}", 0)
