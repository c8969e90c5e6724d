"""Spark column expressions for the text-structuring operators.

Everything here is JVM-side (whole-stage-codegen-able) — these are the fast
paths for the operators whose semantics allow pure column expressions:

  T2 boilerplate strip   -> strip_tags / collapse_ws   (qwen_runner.py:283-291)
  T3 paragraph split     -> split_paragraphs_col       (qwen_runner.py:295-315)
  T4 elements -> text    -> join_paragraphs_col        (qwen_runner.py:173-175)
  M4 think stripper      -> strip_think_col            (_model_registry.py:205-216)

The pure-Python twins in ``semantics/`` are the test oracles; unit tests
assert expression == kernel on adversarial inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java-regex class matching every boundary Python's str.splitlines() splits
# on (\r\n first so it counts as ONE break, like splitlines).
_LINE_BREAK_RE = r"\r\n|[\n\r\x0B\x0C\x1C\x1D\x1E\x85\u2028\u2029]"


def collapse_ws(col: Column) -> Column:
    """Whitespace runs -> single space."""
    return F.regexp_replace(col, r"\s+", " ")


def ws_trim(col: Column) -> Column:
    """Python-``str.strip()`` semantics: ALL leading/trailing whitespace.

    (Spark's ``trim`` strips only ASCII spaces, so it is NOT parity with the
    reference's ``.strip()`` on inputs containing tabs/newlines.)
    """
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def strip_tags(col: Column) -> Column:
    """``<...>`` runs -> space, then strip + collapse (reference fallback)."""
    return collapse_ws(ws_trim(F.regexp_replace(col, r"<[^>]+>", " ")))


def strip_think(col: Column) -> Column:
    """Keep only the text after the LAST ``</think>``; unchanged if absent."""
    return F.substring_index(col, "</think>", -1)


def words(col: Column) -> Column:
    """Non-empty whitespace-delimited tokens."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda w: w != F.lit(""))


def split_paragraphs_col(col: Column) -> Column:
    """Array-of-paragraphs column with full reference semantics.

    Branches on the size of the blank-line split of the WHOLE text (the
    global fallback, SURVEY.md §7 hard part (a)):

      cleaned = non-blank trimmed parts of split on ``\\n\\s*\\n``
      lines   = non-blank trimmed lines
      base    = lines  if len(cleaned) <= 1 and text non-blank and len(lines) > 1
                else cleaned
      result  = base if non-empty else [trim(text)] if non-blank else []
    """
    nonblank = ws_trim(col) != F.lit("")
    # NB: single-parameter lambdas only — F.transform treats a two-parameter
    # callable as (element, index), and F.trim itself takes a second
    # trim-characters argument in Spark 4, so it must be wrapped.
    cleaned = F.filter(
        F.transform(F.split(col, r"\n\s*\n"), lambda p: ws_trim(p)),
        lambda p: p != F.lit(""),
    )
    # Python str.splitlines() semantics, not just '\n': the reference kernel
    # splits on \r\n and the single-char line breaks \n \r \x0b \x0c
    # \x1c \x1d \x1e \x85    , so 'a\rb' must yield TWO lines.
    lines = F.filter(
        F.transform(
            F.split(col, _LINE_BREAK_RE), lambda p: ws_trim(p)
        ),
        lambda p: p != F.lit(""),
    )
    base = F.when(
        (F.size(cleaned) <= 1) & nonblank & (F.size(lines) > 1), lines
    ).otherwise(cleaned)
    return F.when(F.size(base) > 0, base).otherwise(
        F.when(nonblank, F.array(ws_trim(col))).otherwise(
            F.array().cast("array<string>")
        )
    )


def join_paragraphs(texts: Column) -> Column:
    """Non-blank texts joined with blank lines (qwen_runner.py:174)."""
    return F.array_join(
        F.filter(texts, lambda t: ws_trim(t) != F.lit("")), "\n\n"
    )
