"""Negative-case coverage for the Gopher-style quality rule gate.

The driver corpus trips none of the rules (every row is keep=true there),
so the oracle's value-hash cannot distinguish a broken rule from a working
one — these crafted documents exercise each rule's reject branch."""

from __future__ import annotations

import pytest

from docling_ocr_qwen3vl_spark.queries import q_quality_filter_rules

GOOD = "the quick brown fox jumps over the lazy dog again and again today"

DOCS = {
    1: GOOD,                                              # passes everything
    2: "too few words",                                   # word count < 5
    3: " ".join(["pneumonoultramicroscopic"] * 10),       # mean word len > 12
    4: "a b c d e " + "#" * 40,                           # symbol ratio > 0.1
    5: "\n".join(["keep reading..."] * 8 + ["distinct line %d" % i for i in range(2)]),
    6: "\n".join(["same line of text"] * 9 + ["unique one"]),  # dup lines > 0.3
    7: "1 2 3 4 5 6 7 8 9 x",                             # alpha ratio 0.1
    # templated text: 'buy now' dominates the 2-gram distribution while
    # every LINE stays distinct (dup-line rule can't see it)
    8: "\n".join(f"buy now item {i} buy now" for i in range(12)),
}


@pytest.fixture(scope="module")
def rules(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("quality_sf"))
    rows = [
        (doc_id, text, "en", "crafted", len(text)) for doc_id, text in DOCS.items()
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(sf + "/documents.parquet")
    out = q_quality_filter_rules(spark, sf).collect()
    return {r.doc_id: r.asDict() for r in out}


def test_good_doc_keeps(rules):
    r = rules[1]
    assert r["keep"] and all(v for k, v in r.items() if k.startswith("ok_"))


@pytest.mark.parametrize(
    "doc_id,failing_rule",
    [
        (2, "ok_word_count"),
        (3, "ok_mean_word_len"),
        (4, "ok_symbol_ratio"),
        (5, "ok_ellipsis_lines"),
        (6, "ok_dup_lines"),
        (7, "ok_alpha_words"),
        (8, "ok_top_2gram"),
    ],
)
def test_each_rule_rejects_its_pathology(rules, doc_id, failing_rule):
    r = rules[doc_id]
    assert r[failing_rule] is False, r
    assert r["keep"] is False
    # the OTHER rules each have at least one doc where they hold, so a
    # stuck-false rule cannot hide: the good doc asserts all-true above


def test_rules_are_independent(rules):
    """Each pathological doc fails for ITS reason, not as collateral of
    another rule (except where the pathology inherently overlaps)."""
    assert rules[6]["ok_ellipsis_lines"] is True   # dup lines aren't ellipses
    assert rules[5]["ok_dup_lines"] is False or rules[5]["ok_ellipsis_lines"] is False
    assert rules[7]["ok_word_count"] is True       # 10 words is plenty
    assert rules[8]["ok_dup_lines"] is True        # every line is distinct
    assert rules[1]["ok_top_2gram"] is True        # normal prose passes
