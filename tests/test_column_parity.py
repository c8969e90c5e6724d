"""Column-expression vs pure-kernel parity on adversarial inputs.

Every JVM-side re-expression of a reference operator must agree with the
pure-Python reference-parity kernel on edge cases — this is what lets the
engine keep the hot path in whole-stage codegen without semantic drift.
"""

import pytest
from pyspark.sql import functions as F

from docling_ocr_qwen3vl_spark.functions.json_fns import (
    extract_json_block,
    fix_corrupted_keys,
    strip_trailing_commas,
)
from docling_ocr_qwen3vl_spark.functions.text_fns import (
    split_paragraphs_col,
    strip_tags,
    strip_think,
)
from docling_ocr_qwen3vl_spark.semantics import (
    fix_corrupted_keys as py_fix_keys,
)
from docling_ocr_qwen3vl_spark.semantics import (
    split_paragraphs,
    strip_tags_to_plain_text,
    strip_think_prefix,
)

PARAGRAPH_CASES = [
    "First.\n\nSecond.\n\nThird.",
    "Line one.\nLine two.\nLine three.",
    "",
    "   ",
    "Just one paragraph.",
    "a\nb\n\nc\nd",
    "lead\n\n\n\ntrail",
    "x\n \t\ny",
    "\n\nonly\n\n",
    "a",
    "a\nb",
    "  padded  \n\n  more  ",
    "a\t\n\nb\t",
    "\ttabbed only\t",
    "x\r\n\r\ny",
    # str.splitlines() boundaries beyond '\n' (ADVICE round 1)
    "a\rb",
    "a\x0bb\x0cc",
    "x\r\n\ry",
    "one\x1ctwo\x1dthree\x1efour",
    "nel\x85split",
    "u v w",
]


@pytest.fixture(scope="module")
def run(spark):
    def _run(values, expr_fn, out_type="array<string>"):
        df = spark.createDataFrame([(v,) for v in values], ["t"])
        return [
            r.o for r in df.select(expr_fn(F.col("t")).alias("o")).collect()
        ]

    return _run


def test_split_paragraphs_parity(run):
    got = run(PARAGRAPH_CASES, split_paragraphs_col)
    expected = [split_paragraphs(c) for c in PARAGRAPH_CASES]
    assert got == expected


def test_strip_tags_parity(run):
    cases = ["<a>x</a> <b>y</b>", "no tags", "<a></a>", "a <br/> b\t c"]
    assert run(cases, strip_tags) == [strip_tags_to_plain_text(c) for c in cases]


def test_strip_think_parity(run):
    cases = ["pre</think>post", "a</think>b</think>c", "plain", "</think>"]
    assert run(cases, strip_think) == [strip_think_prefix(c) for c in cases]


def test_fix_keys_parity(run):
    cases = ['{"y1:890}', '{"a":1,"b2:3}', "{}", '"x:y"']
    assert run(cases, fix_corrupted_keys) == [py_fix_keys(c) for c in cases]


def test_strip_trailing_commas(run):
    cases = ['[{"a":1},]', '{"a":1, }', "[1,2,3]"]
    assert run(cases, strip_trailing_commas) == ['[{"a":1}]', '{"a":1}', "[1,2,3]"]


def test_extract_json_block(run):
    cases = ['pre {"a":1} post', "none", '{"a":{"b":2}} x}']
    assert run(cases, extract_json_block) == ['{"a":1}', "", '{"a":{"b":2}} x}']
