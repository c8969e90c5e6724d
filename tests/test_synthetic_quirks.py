"""The synthetic html corpus must exercise the STREAM parser, not just the
regex fast path: each doc_num%5 variant trips (or deliberately stays inside)
a specific grammar boundary, and the parsed elements match the oracle's
slot enumeration."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from docling_ocr_qwen3vl_spark.semantics import html_parse as hp
from docling_ocr_qwen3vl_spark.sources.synthetic import _html_payload

WORDS = [f"w{i}" for i in range(1, 11)]
W12 = "w1 w2"
W38 = "w3 w4 w5 w6 w7 w8"
W910 = "w9 w10"


VARIANTS = (0, 8, 12, 14, 15)  # one flat + the four quirk variants


def _payloads(spark):
    df = spark.createDataFrame([Row(doc_num=v, ws=WORDS) for v in VARIANTS])
    rows = df.select(
        "doc_num", _html_payload(F.col("ws"), F.col("doc_num")).alias("p")
    ).collect()
    return {r.doc_num: r.p for r in rows}


def test_variant_fast_path_coverage(spark):
    p = _payloads(spark)
    assert hp._fast_parse(p[0], False) is not None      # flat -> fast path
    for v in (8, 12, 14, 15):                          # quirks -> stream parser
        assert hp._fast_parse(p[v], False) is None, f"variant {v} must bail"


def test_variant_elements_match_slot_enumeration(spark):
    p = _payloads(spark)
    expect = {
        0: [("h1", W12, (100, 40, 900, 90), "heading"),
            ("p", W38, (100, 120, 900, 400), "paragraph"),
            ("p", W910, (100, 820, 900, 980), "paragraph")],
        12: [("h1", W12, (100, 40, 900, 90), "heading"),
             ("li", W38, (100, 120, 900, 400), "list_item"),
             ("p", W910, (100, 820, 900, 980), "paragraph")],
        8: [("h1", W12, (100, 40, 900, 90), "heading"),
            ("p", W38 + " p{margin:0}", (100, 120, 900, 400), "paragraph"),
            ("p", W910, (100, 820, 900, 980), "paragraph")],
        14: [("h1", W12, None, "heading"),
             ("p", W38, (100, 120, 900, 400), "paragraph"),
             ("p", W910, (100, 820, 900, 980), "paragraph")],
        15: [("h1", W12, (100, 40, 900, 90), "heading"),
             ("p", W38 + " & co", (100, 120, 900, 400), "paragraph"),
             ("p", W910, (100, 820, 900, 980), "paragraph")],
    }
    for v in VARIANTS:
        got = [
            (e.tag, e.text, e.bbox, e.element_type)
            for e in hp.parse_qwenvl_html(p[v])
        ]
        assert got == expect[v], f"variant {v}"
        # media path: the img is ALWAYS the 3rd kept element (seq 2)
        kept = hp.parse_qwenvl_html(p[v], keep_empty_media=True)
        assert [e.tag for e in kept].index("img") == 2, f"variant {v}"
