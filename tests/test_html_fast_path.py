"""Differential test: the regex fast path must be byte-equal to the
quirk-exact stream parser on every input it accepts (it may decline and
fall back, never disagree)."""

import random

from docling_ocr_qwen3vl_spark.semantics import html_parse as hp

FRAGMENTS = [
    '<p data-bbox="1 2 3 4">', "</p>", "<h1>", "</h1>", "text ", "more",
    '<img data-bbox="9 9 9 9"/>', "<style>", "</style>", "<ul>", "</ul>",
    "<li>", "</li>", " ", "\n", "&amp;", "<p>", "<P>", "a<b", '"x"',
    '<div class="z">', "</div>", "<td>", "</td>", "<p/>", "p{margin:0}",
    '<p data-bbox="bad">', '<p data-bbox="1 2 3">', "<figure>", "</figure>",
    "<script>", "</script>", "<br>", '<link rel="x"/>',
    '<p data-bbox="1 2 3 4" data-bbox="5 6 7 8">', "\t",
    '<p xdata-bbox="1 2 3 4">', '<p data-bbox="1 2 3 4" xdata-bbox="5 6 7 8">',
]


def _stream_parse(s: str, keep: bool):
    parser = hp._QwenHtmlParser(keep)
    try:
        parser.feed(s)
    except Exception:
        pass
    return parser.out


def test_fast_path_never_disagrees():
    rng = random.Random(1234)
    taken = 0
    for trial in range(20000):
        s = "".join(rng.choices(FRAGMENTS, k=rng.randint(0, 8)))
        keep = trial % 2 == 0
        fast = hp._fast_parse(s, keep)
        if fast is None:
            continue
        taken += 1
        assert fast == _stream_parse(s, keep), repr(s)
    assert taken > 1000  # the fast path actually fires


def test_fast_path_accepts_canonical_vlm_output():
    html = (
        '<h1 data-bbox="100 40 900 90">Title</h1>'
        '<p data-bbox="100 120 900 400">body text</p>'
        "<style>p{margin:0}</style>"
        '<img data-bbox="100 420 500 800"/>'
    )
    assert hp._fast_parse(html, True) is not None
    assert hp._fast_parse(html, True) == _stream_parse(html, True)


def test_fast_path_bbox_attr_name_is_anchored():
    # attr names merely ENDING in data-bbox must not contribute a bbox
    for s, keep in [
        ('<p xdata-bbox="1 2 3 4">t</p>', False),
        ('<p data-bbox="1 2 3 4" xdata-bbox="5 6 7 8">t</p>', False),
    ]:
        fast = hp._fast_parse(s, keep)
        assert fast is not None
        assert fast == _stream_parse(s, keep), repr(s)
    only = hp._fast_parse('<p xdata-bbox="1 2 3 4">t</p>', False)
    assert only[0].bbox is None
    both = hp._fast_parse('<p data-bbox="1 2 3 4" xdata-bbox="5 6 7 8">t</p>', False)
    assert both[0].bbox == (1, 2, 3, 4)


def test_fast_path_declines_hard_cases():
    # nesting, entities, stray text, uppercase: must fall back, not guess
    for s in ["<ul><li>x</li></ul>", "<p>a&amp;b</p>", "<p>a</p>junk<p>b</p>",
              "<P>x</P>", "<p>a<style>s</style>b</p>"]:
        assert hp._fast_parse(s, False) is None
