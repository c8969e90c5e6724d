"""T12 per-value jsonformer: scripted-backend tests of the full walk.

The model is replaced by a scripted TokenBackend, so these pin the pure
control flow — progress prefixes, scalar parsing, the array-continue probe,
the at-least-two-elements quirk — exactly as the reference implements them
(_vlm_jsonformer.py:231-502)."""

from __future__ import annotations

import json

import pytest

from docling_ocr_qwen3vl_spark.inference.jsonformer import (
    GENERATION_MARKER,
    JsonformerWalk,
    parse_generated_number,
    parse_generated_string,
)


class ScriptedBackend:
    """Returns scripted continuations/candidates/boolean verdicts in call
    order while recording every assistant prefix it was asked about."""

    def __init__(self, continuations=(), candidate_lists=(), bool_verdicts=()):
        self.continuations = list(continuations)
        self.candidate_lists = list(candidate_lists)
        self.bool_verdicts = list(bool_verdicts)
        self.prefixes: list[str] = []
        self.probe_prefixes: list[str] = []
        self.bool_prefixes: list[str] = []

    def continue_text(self, user_text, assistant_prefix, max_new_tokens):
        self.prefixes.append(assistant_prefix)
        return self.continuations.pop(0)

    def top_tokens(self, user_text, assistant_prefix, k):
        self.probe_prefixes.append(assistant_prefix)
        return self.candidate_lists.pop(0)

    def prefer_literal(self, user_text, assistant_prefix, a, b):
        # scripted logit-compare verdict; None = the reference's
        # convert_tokens_to_ids-failure branch (greedy fallback)
        self.bool_prefixes.append(assistant_prefix)
        return self.bool_verdicts.pop(0)


# ------------------------------------------------------------- scalar parse
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("42.0", 42),          # integral float -> int
        (" 3.5,", 3.5),        # rstrip ,
        ("17}", 17),           # rstrip }
        ("-7 junk", -7),       # leading sign, stop at non-digit
        ("abc", 0),            # no digits -> 0
        ("12.3.4", 0),         # malformed float -> 0
        ("", 0),
    ],
)
def test_parse_generated_number(raw, expected):
    out = parse_generated_number(raw)
    assert out == expected and type(out) is type(expected)


def test_parse_generated_string_cuts_at_quote():
    assert parse_generated_string('Title" and more') == "Title"
    assert parse_generated_string("  no quote ") == "no quote"


# --------------------------------------------------------------- object walk
def test_object_walk_scalars_and_prefixes():
    schema = {
        "type": "object",
        "properties": {
            "rows": {"type": "number"},
            "title": {"type": "string"},
            "hdr": {"type": "boolean"},
        },
    }
    backend = ScriptedBackend(
        continuations=["3, ", 'Quarterly" ...'],
        bool_verdicts=[False],  # logits['true'] <= logits['false']
    )
    result = JsonformerWalk(backend, schema, "extract the table")()
    assert result == {"rows": 3, "title": "Quarterly", "hdr": False}
    # progress prefixes are exactly the serialized partial JSON up to the
    # value being generated (string gets its opening quote injected)
    assert backend.prefixes == ['{"rows": ', '{"rows": 3, "title": "']
    assert backend.bool_prefixes == ['{"rows": 3, "title": "Quarterly", "hdr": ']


def test_schema_embedded_in_user_text():
    schema = {"type": "object", "properties": {"n": {"type": "number"}}}
    backend = ScriptedBackend(continuations=["1"])
    walk = JsonformerWalk(backend, schema, "the task prompt")
    walk()
    assert "the task prompt" in walk.user_text
    assert json.dumps(schema) in walk.user_text


# ---------------------------------------------------------------- array walk
def test_array_walk_continue_probe_and_min_two_quirk():
    schema = {
        "type": "array",
        "items": {
            "type": "object",
            "properties": {"label": {"type": "string"}, "x1": {"type": "number"}},
        },
    }
    backend = ScriptedBackend(
        continuations=['text"', "100", 'table"', "250", 'title"', "40"],
        # probes: after element 2 -> continue (","), after element 3 -> stop ("]")
        candidate_lists=[[" ,"], [" ]"]],
    )
    result = JsonformerWalk(backend, schema, "layout")()
    assert result == [
        {"label": "text", "x1": 100},
        {"label": "table", "x1": 250},
        {"label": "title", "x1": 40},
    ]
    # the continue-probe never ran after the FIRST element (reference quirk:
    # arrays always reach two elements before the model can close them)
    assert len(backend.probe_prefixes) == 2
    # probe prefix ends with the serialized array + pending marker position
    assert backend.probe_prefixes[0].startswith('[{"label": "text", "x1": 100}')


def test_array_caps_at_max_length():
    schema = {"type": "array", "items": {"type": "number"}}
    backend = ScriptedBackend(
        continuations=["1", "2", "3"],
        candidate_lists=[[","], [","]],  # model always wants to continue
    )
    result = JsonformerWalk(backend, schema, "nums", max_array_length=3)()
    assert result == [1, 2, 3]


def test_boolean_logit_probe_primary_branch():
    schema = {"type": "object", "properties": {"ok": {"type": "boolean"}}}
    backend = ScriptedBackend(bool_verdicts=[True])
    assert JsonformerWalk(backend, schema, "p")() == {"ok": True}
    # the primary branch never touches greedy generation
    assert backend.prefixes == []


def test_boolean_greedy_fallback_when_literals_unresolvable():
    """None from prefer_literal = convert_tokens_to_ids failed -> the
    reference's 3-token greedy fallback (_vlm_jsonformer.py:356-365)."""
    schema = {"type": "object", "properties": {"ok": {"type": "boolean"}}}
    backend = ScriptedBackend(
        continuations=["True enough"], bool_verdicts=[None]
    )
    assert JsonformerWalk(backend, schema, "p")() == {"ok": True}
    assert backend.prefixes == ['{"ok": ']


def test_nested_object_in_array_in_object():
    schema = {
        "type": "object",
        "properties": {
            "cells": {
                "type": "array",
                "items": {"type": "object", "properties": {"v": {"type": "number"}}},
            }
        },
    }
    backend = ScriptedBackend(
        continuations=["1", "2"],
        candidate_lists=[["]"]],
    )
    result = JsonformerWalk(backend, schema, "p")()
    assert result == {"cells": [{"v": 1}, {"v": 2}]}
    # every prefix the backend saw is a valid JSON prefix of the final doc
    final = json.dumps(result)
    for prefix in backend.prefixes:
        assert final.startswith(prefix.rstrip('"')) or GENERATION_MARKER not in prefix


def test_torch_backend_prefer_literal_unk_guard():
    """Tokenizers that map unknown tokens to unk_token_id return an INT for
    both literals — the same int.  The backend must treat identical ids
    (or an unk id) as resolution failure (None -> greedy fallback), not
    compare a logit with itself; documented deviation from the reference's
    isinstance-only guard (_vlm_jsonformer.py:353)."""
    import types

    from docling_ocr_qwen3vl_spark.inference.jsonformer import TorchTokenBackend

    calls = {"forward": 0}

    class Tok:
        unk_token_id = 0

        def convert_tokens_to_ids(self, tok):
            return 0  # everything unknown -> unk

    class Model:
        device = "cpu"

        def forward(self, **kw):
            calls["forward"] += 1

    processor = types.SimpleNamespace(tokenizer=Tok())
    backend = TorchTokenBackend(Model(), processor, types.SimpleNamespace(), None)
    assert backend.prefer_literal("u", "p", "true", "false") is None
    assert calls["forward"] == 0  # no wasted forward pass on a degenerate probe

    # non-int (the reference's own failure branch) still yields None
    processor.tokenizer.convert_tokens_to_ids = lambda tok: None
    assert backend.prefer_literal("u", "p", "true", "false") is None
