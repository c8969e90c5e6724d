"""Property-based parity: column expressions == pure kernels on arbitrary
inputs (Hypothesis), run in batches through one Spark job per property.

This is the upgrade over the reference's example-only tests (SURVEY.md §5):
the blank-line/fallback branching of the paragraph splitter and the regex
repair steps have input-dependent control flow that examples under-cover.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from docling_ocr_qwen3vl_spark.functions.json_fns import fix_corrupted_keys
from docling_ocr_qwen3vl_spark.functions.text_fns import (
    split_paragraphs_col,
    strip_tags,
    strip_think,
)
from docling_ocr_qwen3vl_spark.semantics import (
    fix_corrupted_keys as py_fix_keys,
)
from docling_ocr_qwen3vl_spark.semantics import (
    parse_qwenvl_html,
    split_paragraphs,
    strip_tags_to_plain_text,
    strip_think_prefix,
)

# text with plenty of whitespace structure to hit the splitter branches
_TEXTY = st.text(
    alphabet=st.sampled_from(list("ab c\n\t.!<>/=\"'#{}[]:,1")), max_size=80
)


def _run_batch(spark, values, expr_fn):
    df = spark.createDataFrame([(v,) for v in values], ["t"])
    return [r.o for r in df.select(expr_fn(F.col("t")).alias("o")).collect()]


def _check_property(spark, expr_fn, kernel, examples):
    got = _run_batch(spark, examples, expr_fn)
    want = [kernel(v) for v in examples]
    assert got == want, next(
        (e, g, w) for e, g, w in zip(examples, got, want) if g != w
    )


def _collect_examples(strategy, n=60):
    examples = []

    @settings(max_examples=n, deadline=None, database=None)
    @given(strategy)
    def gather(s):
        examples.append(s)

    gather()
    return examples


def test_split_paragraphs_property(spark):
    _check_property(
        spark, split_paragraphs_col, split_paragraphs, _collect_examples(_TEXTY)
    )


def test_strip_tags_property(spark):
    _check_property(
        spark, strip_tags, strip_tags_to_plain_text, _collect_examples(_TEXTY)
    )


def test_strip_think_property(spark):
    marked = st.lists(
        st.one_of(_TEXTY, st.just("</think>")), max_size=5
    ).map("".join)
    _check_property(
        spark, strip_think, strip_think_prefix, _collect_examples(marked)
    )


def test_fix_keys_property(spark):
    jsonish = st.text(
        alphabet=st.sampled_from(list('abc{}[]":,0123456789 ')), max_size=60
    )
    _check_property(
        spark, fix_corrupted_keys, py_fix_keys, _collect_examples(jsonish)
    )


def test_html_parser_total():
    """The parser never raises and always returns ordered elements, even on
    adversarial tag soup (reference wraps feed() in try/except)."""
    for ex in _collect_examples(_TEXTY, n=120):
        els = parse_qwenvl_html(ex)
        assert all(e.text or e.element_type == "figure" for e in els) or not els
        els_media = parse_qwenvl_html(ex, keep_empty_media=True)
        assert len(els_media) >= len(els) or els == els_media