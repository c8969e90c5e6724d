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
two-method ``TokenBackend`` (greedy continuation + top-k next-token
candidates), so the ENTIRE walk — progress-prefix building, value parsing,
array-continue decisions, the recursive schema traversal — is pure Python,
unit-tested with scripted backends, and identical on a GPU deployment
(where the backend wraps processor/model exactly like
``generation.run_vlm_inference`` does for the single-shot path).

Reference semantics replicated (cited per method):
  * progress prefix = json.dumps of the partial root truncated at the
    generation marker (_vlm_jsonformer.py:295-303)
  * number: strip + rstrip(".,}"), leading-sign/digit/dot scan, int when
    integral, 0 on garbage (_vlm_jsonformer.py:305-336)
  * boolean: true-vs-false next-token preference with a 3-token greedy
    fallback (_vlm_jsonformer.py:338-365)
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
    """The two model touchpoints the walk needs.

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
        """Prefer whichever of true/false the model ranks higher among the
        next-token candidates; greedy 3-token fallback when neither shows
        (the reference's convert_tokens_to_ids-failure branch)."""
        prefix = self._progress()
        for tok in self.backend.top_tokens(self.user_text, prefix, 30):
            lowered = tok.strip().lower()
            if lowered.startswith("true"):
                return True
            if lowered.startswith("false"):
                return False
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
