"""T12: per-value constrained JSON generation (the guaranteed-valid path).

The reference ships a jsonformer that drives the VLM value-by-value from a
JSON schema (_vlm_jsonformer.py:231-502): every scalar is its own model
call, structural tokens are inserted programmatically, so the output is
syntactically valid by construction — the slow fallback when single-shot
generation + repair cascade (T11/T6-T10) cannot be trusted.  Both live
reference callers use the single-shot path, so this is an OPTIONAL slot
here too; it exists so a GPU deployment can flip to guaranteed-valid
generation per cluster/table without engine changes.

Spark-first design difference: the model interaction is abstracted behind a
three-method ``TokenBackend`` (greedy continuation + top-k next-token
candidates + a two-literal relative-likelihood probe), so the ENTIRE walk —
progress-prefix building, value parsing, array-continue decisions, the
recursive schema traversal — is pure Python, unit-tested with scripted
backends, and identical on a GPU deployment (``TorchTokenBackend`` below
wraps processor/model exactly like ``generation.run_vlm_inference`` does
for the single-shot path).

Reference semantics replicated (cited per method):
  * progress prefix = json.dumps of the partial root truncated at the
    generation marker (_vlm_jsonformer.py:295-303)
  * number: strip + rstrip(".,}"), leading-sign/digit/dot scan, int when
    integral, 0 on garbage (_vlm_jsonformer.py:305-336)
  * boolean: logit comparison of the exact 'true'/'false' token ids when
    both resolve, 3-token greedy fallback otherwise
    (_vlm_jsonformer.py:338-365)
  * string: opening quote injected, cut at the first quote
    (_vlm_jsonformer.py:367-388)
  * array-continue: scan the top-30 candidate tokens for ',' vs ']'
    (_vlm_jsonformer.py:390-411)
  * walk: objects per property; arrays element-at-a-time up to
    max_array_length with the continue probe after each element past the
    first (_vlm_jsonformer.py:413-502)
"""

from __future__ import annotations

import json
from typing import Any, Protocol

GENERATION_MARKER = "|GENERATION|"


class TokenBackend(Protocol):
    """The three model touchpoints the walk needs.

    ``user_text`` is the full task text (prompt + schema); the backend owns
    chat templating, tensors, devices.  ``assistant_prefix`` is the partial
    JSON the model must continue.
    """

    def continue_text(
        self, user_text: str, assistant_prefix: str, max_new_tokens: int
    ) -> str:
        """Greedy continuation after the assistant prefix."""
        ...

    def top_tokens(self, user_text: str, assistant_prefix: str, k: int) -> list[str]:
        """Decoded top-k next-token candidates, most likely first."""
        ...

    def prefer_literal(
        self, user_text: str, assistant_prefix: str, a: str, b: str
    ) -> bool | None:
        """True if the next-token logit of literal token ``a`` beats ``b``,
        False otherwise; None when either literal does not resolve to a
        single vocab token (the caller then falls back to greedy decoding).
        Mirrors the reference's generate_boolean primary branch
        (_vlm_jsonformer.py:345-354: one forward pass, compare
        ``logits[true_id] > logits[false_id]``)."""
        ...


def parse_generated_number(text: str) -> int | float:
    """Reference number post-processing (_vlm_jsonformer.py:322-336)."""
    text = text.strip().rstrip(".,}")
    num = ""
    for ch in text:
        if ch.isdigit() or ch == "." or (ch == "-" and not num):
            num += ch
        else:
            break
    try:
        val = float(num) if num else 0.0
    except ValueError:
        return 0
    return int(val) if val == int(val) else val


def parse_generated_string(text: str) -> str:
    """Cut at the closing quote the model produced (_vlm_jsonformer.py:385-388)."""
    if '"' in text:
        text = text.split('"')[0]
    return text.strip()


class JsonformerWalk:
    """Schema-driven value-by-value generation over a ``TokenBackend``."""

    def __init__(
        self,
        backend: TokenBackend,
        json_schema: dict[str, Any],
        prompt: str,
        *,
        max_array_length: int = 20,
        max_number_tokens: int = 6,
        max_string_token_length: int = 30,
    ):
        self.backend = backend
        self.json_schema = json_schema
        self.user_text = (
            f"{prompt}\nOutput JSON matching this schema:\n{json.dumps(json_schema)}"
        )
        self.max_array_length = max_array_length
        self.max_number_tokens = max_number_tokens
        self.max_string_token_length = max_string_token_length
        self._root: dict | list | None = None

    # -- progress prefix --------------------------------------------------
    def _progress(self) -> str:
        """Serialized partial root, truncated where generation resumes
        (_vlm_jsonformer.py:295-303: the marker may appear quoted or not)."""
        progress = json.dumps(self._root)
        idx = progress.find(f'"{GENERATION_MARKER}"')
        if idx == -1:
            idx = progress.find(GENERATION_MARKER)
        return progress[:idx] if idx != -1 else progress

    # -- scalar generators ------------------------------------------------
    def _gen_number(self) -> int | float:
        text = self.backend.continue_text(
            self.user_text, self._progress(), self.max_number_tokens
        )
        return parse_generated_number(text)

    def _gen_boolean(self) -> bool:
        """Primary branch = relative next-token likelihood of the exact
        'true' vs 'false' literals (_vlm_jsonformer.py:345-354: one forward
        pass, ``logits[true_id] > logits[false_id]``); greedy 3-token
        fallback only when a literal fails to resolve to a vocab token
        (the reference's convert_tokens_to_ids-failure branch,
        _vlm_jsonformer.py:356-365)."""
        prefix = self._progress()
        verdict = self.backend.prefer_literal(self.user_text, prefix, "true", "false")
        if verdict is not None:
            return verdict
        text = self.backend.continue_text(self.user_text, prefix, 3)
        return text.strip().lower().startswith("true")

    def _gen_string(self) -> str:
        text = self.backend.continue_text(
            self.user_text, self._progress() + '"', self.max_string_token_length
        )
        return parse_generated_string(text)

    def _should_continue_array(self) -> bool:
        """First of the top-30 candidates containing ',' continues the
        array; ']' ends it; neither -> end (_vlm_jsonformer.py:390-411)."""
        for tok in self.backend.top_tokens(self.user_text, self._progress(), 30):
            if "," in tok:
                return True
            if "]" in tok:
                return False
        return False

    # -- recursive walk ---------------------------------------------------
    def _gen_value(self, schema: dict, obj: dict | list, key: str | None) -> Any:
        def mark(placeholder: Any) -> None:
            if key is not None:
                obj[key] = placeholder
            elif isinstance(obj, list):
                obj.append(placeholder)

        schema_type = schema["type"]
        if schema_type == "number":
            mark(GENERATION_MARKER)
            return self._gen_number()
        if schema_type == "boolean":
            mark(GENERATION_MARKER)
            return self._gen_boolean()
        if schema_type == "string":
            mark(GENERATION_MARKER)
            return self._gen_string()
        if schema_type == "array":
            arr: list = []
            mark(arr)
            return self._gen_array(schema["items"], arr)
        if schema_type == "object":
            nested: dict = {}
            mark(nested)
            return self._gen_object(schema["properties"], nested)
        raise ValueError(f"Unsupported schema type: {schema_type}")

    def _gen_object(self, properties: dict, obj: dict) -> dict:
        for key, schema in properties.items():
            obj[key] = self._gen_value(schema, obj, key)
        return obj

    def _gen_array(self, item_schema: dict, arr: list) -> list:
        for i in range(self.max_array_length):
            element = self._gen_value(item_schema, arr, None)
            arr[-1] = element
            # quirk preserved: the continue-probe only runs from the SECOND
            # element on (_vlm_jsonformer.py:478-479), so arrays always get
            # at least two elements before the model can close them
            if i == 0:
                continue
            arr.append(GENERATION_MARKER)
            keep_going = self._should_continue_array()
            arr.pop()
            if not keep_going:
                break
        return arr

    def __call__(self) -> dict | list:
        root_type = self.json_schema.get("type", "object")
        if root_type == "object":
            self._root = {}
            return self._gen_object(self.json_schema["properties"], self._root)
        if root_type == "array":
            self._root = []
            return self._gen_array(self.json_schema["items"], self._root)
        raise ValueError(
            f"Root schema type must be 'object' or 'array', got '{root_type}'"
        )


# ---------------------------------------------------------------------------
# Default schemas for the two JSON-emitting page kinds.  Field vocabulary =
# what the structural parsers consume: build_clusters reads label /
# confidence / x1..y2 (layout_model.py:184-232), build_table reads rows /
# cols / cells[{row,col,rs,cs,hdr,x1..y2,text}] (table_structure_model.py:
# 135-225, compact field names).  A deployment can override per stage.
# ---------------------------------------------------------------------------

LAYOUT_JSON_SCHEMA: dict[str, Any] = {
    "type": "array",
    "items": {
        "type": "object",
        "properties": {
            "label": {"type": "string"},
            "x1": {"type": "number"},
            "y1": {"type": "number"},
            "x2": {"type": "number"},
            "y2": {"type": "number"},
            "confidence": {"type": "number"},
        },
    },
}

TABLE_JSON_SCHEMA: dict[str, Any] = {
    "type": "object",
    "properties": {
        "rows": {"type": "number"},
        "cols": {"type": "number"},
        "cells": {
            "type": "array",
            "items": {
                "type": "object",
                "properties": {
                    "row": {"type": "number"},
                    "col": {"type": "number"},
                    "rs": {"type": "number"},
                    "cs": {"type": "number"},
                    "hdr": {"type": "boolean"},
                    "x1": {"type": "number"},
                    "y1": {"type": "number"},
                    "x2": {"type": "number"},
                    "y2": {"type": "number"},
                    "text": {"type": "string"},
                },
            },
        },
    },
}

JSONFORMER_SCHEMAS: dict[str, dict[str, Any]] = {
    "layout_json": LAYOUT_JSON_SCHEMA,
    "table_json": TABLE_JSON_SCHEMA,
}


class TorchTokenBackend:
    """GPU-deployment ``TokenBackend`` over (model, processor, torch, image).

    Performs exactly the tensor calls the reference VLMJsonformer performs —
    _prepare_inputs chat templating + assistant-prefix append
    (_vlm_jsonformer.py:263-301), greedy ``generate`` for continuations
    (:305-321, 367-388), one ``forward`` + ``topk(k)`` re-sorted by logit
    for candidate scans (:390-411), and one ``forward`` + two-id logit
    compare for the boolean probe (:345-354) — but behind the walk's pure
    protocol, so the traversal logic above never touches a tensor.  Like
    ``TorchQwenDecoder`` this class is deployment-only (torch injected);
    control flow is pinned under mocks in tests/test_torch_decoder.py.
    """

    def __init__(self, model, processor, torch_mod, image):
        self.model = model
        self.processor = processor
        self.torch = torch_mod
        self.image = image

    def _inputs(self, user_text: str, assistant_prefix: str):
        messages = [
            {
                "role": "user",
                "content": [
                    {"type": "image", "image": self.image},
                    {"type": "text", "text": user_text},
                ],
            }
        ]
        text_input = self.processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        text_input += assistant_prefix
        inputs = self.processor(
            text=[text_input], images=[self.image], padding=True,
            return_tensors="pt",
        )
        return inputs.to(self.model.device)

    def _next_logits(self, user_text: str, assistant_prefix: str):
        inputs = self._inputs(user_text, assistant_prefix)
        with self.torch.no_grad():
            output = self.model.forward(**inputs)
        return output.logits[0, -1]

    def continue_text(
        self, user_text: str, assistant_prefix: str, max_new_tokens: int
    ) -> str:
        inputs = self._inputs(user_text, assistant_prefix)
        with self.torch.no_grad():
            response = self.model.generate(
                **inputs,
                max_new_tokens=max_new_tokens,
                do_sample=False,
                pad_token_id=self.processor.tokenizer.eos_token_id,
            )
        input_len = inputs["input_ids"].shape[1]
        return self.processor.tokenizer.decode(
            response[0, input_len:], skip_special_tokens=True
        )

    def top_tokens(self, user_text: str, assistant_prefix: str, k: int) -> list[str]:
        logits = self._next_logits(user_text, assistant_prefix)
        top_ids = logits.topk(k).indices
        sorted_ids = top_ids[logits[top_ids].argsort(descending=True)]
        return [self.processor.tokenizer.decode(tid) for tid in sorted_ids]

    def prefer_literal(
        self, user_text: str, assistant_prefix: str, a: str, b: str
    ) -> bool | None:
        a_id = self.processor.tokenizer.convert_tokens_to_ids(a)
        b_id = self.processor.tokenizer.convert_tokens_to_ids(b)
        if not (isinstance(a_id, int) and isinstance(b_id, int)):
            return None
        # Deliberate deviation from the reference guard
        # (_vlm_jsonformer.py:353 checks only isinstance(int)): tokenizers
        # that map unknown tokens to unk_token_id return an int for BOTH
        # literals — the same int — and the reference then compares a
        # logit with itself (always False).  Two identical ids cannot be
        # two distinct literals, so treat that as resolution failure and
        # let the walk take the greedy fallback the reference reserves
        # for exactly this case.
        unk = getattr(self.processor.tokenizer, "unk_token_id", None)
        if a_id == b_id or a_id == unk or b_id == unk:
            return None
        logits = self._next_logits(user_text, assistant_prefix)
        return bool(logits[a_id] > logits[b_id])
