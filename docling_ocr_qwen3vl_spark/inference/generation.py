"""GPU-free halves of the production decode path (M3/M7/M8/M9 + T11).

Everything torch-independent in the reference's inference loop lives here
as pure functions, so the production ``TorchQwenDecoder`` is thin tensor
plumbing around tested logic:

  * chat-message assembly        qwen_runner.py:74-99 (system prompt for
                                 the QWENVL_HTML mode, user-only otherwise)
  * decode-regime selection      qwen_runner.py:128-146 (deterministic for
                                 structured HTML; sampled per options else)
  * constrained-JSON prefix      _vlm_jsonformer.py:105-160 (T11: inject
                                 the opening bracket as assistant prefix,
                                 prepend it to the decoded text)
  * micro-batch chunking         engine-side batching for model.generate
  * think-token suffix slice     _model_registry.py:205-216 (M4 token form)
  * attention-backend fallback   _model_registry.py:164-174 (M7: the live
                                 function falls back to "sdpa"; the
                                 reference's own test pins a dead
                                 qwen_runner._select_attention_backend
                                 returning "eager" — we mirror the live code)
  * dtype-name resolution        _model_registry.py:146-162 (M9, name half)
  * quantization plan            _model_registry.py:177-201 (M8, as plain
                                 kwargs; BitsAndBytesConfig built GPU-side)
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

from ..config import QWENVL_HTML_SYSTEM_PROMPT

THINK_END_TOKEN_ID = 151668  # _model_registry.py:23 (Qwen3 </think>)

# deterministic decoding: structured-output modes only (qwen_runner.py:128)
DETERMINISTIC_MODES = frozenset({"qwenvl_html"})

# _vlm_jsonformer.py:135-141 fixed generate kwargs for single-shot JSON
JSON_SINGLE_SHOT_KWARGS = {"do_sample": False, "repetition_penalty": 1.3}

_DTYPE_ALIASES = {
    "bfloat16": "bfloat16",
    "bf16": "bfloat16",
    "float16": "float16",
    "half": "float16",
    "fp16": "float16",
    "float32": "float32",
    "fp32": "float32",
}


def build_chat_messages(
    prompt_mode: str, prompt: str, image: Any
) -> list[dict]:
    """Chat-template input (qwen_runner.py:74-99): QWENVL_HTML prepends the
    system prompt that triggers data-bbox output; every other mode sends a
    single user message with the image and the resolved prompt."""
    user = {
        "role": "user",
        "content": [
            {"type": "image", "image": image},
            {"type": "text", "text": prompt},
        ],
    }
    if prompt_mode == "qwenvl_html":
        return [
            {
                "role": "system",
                "content": [{"type": "text", "text": QWENVL_HTML_SYSTEM_PROMPT}],
            },
            user,
        ]
    return [user]


def select_generation_kwargs(prompt_mode: str, options) -> dict:
    """Decode-regime switch (qwen_runner.py:128-146).

    QWENVL_HTML uses deterministic decoding for stable structured output;
    other modes pass the sampling knobs, with temperature/top_p/top_k set
    to None when do_sample is off (exactly as the reference calls
    model.generate)."""
    if prompt_mode in DETERMINISTIC_MODES:
        return {"max_new_tokens": options.max_new_tokens, "do_sample": False}
    return {
        "max_new_tokens": options.max_new_tokens,
        "temperature": options.temperature if options.do_sample else None,
        "top_p": options.top_p if options.do_sample else None,
        "top_k": options.top_k if options.do_sample else None,
        "do_sample": options.do_sample,
    }


def json_prefix(root_type: str) -> str:
    """Assistant-prefix bracket for constrained single-shot JSON (T11,
    _vlm_jsonformer.py:123-125)."""
    if root_type not in ("array", "object"):
        raise ValueError(f"root_type must be 'array' or 'object', got {root_type!r}")
    return "[" if root_type == "array" else "{"


def inject_assistant_prefix(text_input: str, root_type: str) -> str:
    """Append the opening bracket AFTER the chat template so the model
    continues the JSON directly, avoiding markdown fences
    (_vlm_jsonformer.py:123-125: ``text_input += prefix``)."""
    return text_input + json_prefix(root_type)


def finalize_json_output(raw_text: str, root_type: str) -> str:
    """Re-attach the injected prefix to the decoded continuation
    (_vlm_jsonformer.py:158: ``full_text = prefix + raw_text.strip()``)."""
    return json_prefix(root_type) + raw_text.strip()


def micro_batches(items: Iterable, size: int) -> Iterator[list]:
    """Fixed-size chunks for model.generate micro-batching (M3): bounds
    peak VRAM per forward pass regardless of Arrow batch size."""
    if size < 1:
        raise ValueError(f"micro-batch size must be >= 1, got {size}")
    chunk: list = []
    for item in items:
        chunk.append(item)
        if len(chunk) == size:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


def slice_after_think(token_ids: list[int], marker: int = THINK_END_TOKEN_ID) -> list[int]:
    """Keep only the ids after the LAST </think> marker; unchanged when the
    marker is absent (_model_registry.py:205-216, list form — the tensor
    wrapper is trivial on GPU deployments)."""
    for i in range(len(token_ids) - 1, -1, -1):
        if token_ids[i] == marker:
            return token_ids[i + 1 :]
    return token_ids


def run_vlm_inference_batch(
    model,
    processor,
    torch_mod,
    images: list,
    prompt_mode: str,
    prompt: str,
    options,
    json_root: str | None = None,
) -> list[str]:
    """The reference inference loop (qwen_runner.py:102-162), call-for-call
    but over a MICRO-BATCH of images in one ``model.generate`` (M3: the
    forward-pass overhead amortizes across the batch; the reference runs
    one image per call).  Tensor-owning objects are INJECTED so the control
    flow is unit-testable under mocks and identical on a GPU deployment:

      apply_chat_template -> [inject JSON prefix (T11)] -> processor() ->
      .to(device) -> torch.no_grad(): model.generate(**regime kwargs) ->
      slice off the (padded-common-length) input tokens -> per-row
      think-token suffix slice (M4, BEFORE decode — skip_special_tokens
      would strip the markers) -> batch_decode(skip_special_tokens,
      clean_up_tokenization_spaces) -> strip [-> re-attach JSON prefix].

    ``json_root`` switches to the constrained single-shot JSON path
    (_vlm_jsonformer.py:105-160): assistant-prefix bracket injection and
    the fixed deterministic kwargs."""
    text_inputs = []
    for image in images:
        messages = build_chat_messages(prompt_mode, prompt, image)
        text_input = processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        if json_root is not None:
            text_input = inject_assistant_prefix(text_input, json_root)
        text_inputs.append(text_input)
    # Micro-batches are RAGGED (vision-token counts vary per image), and the
    # reference only ever runs batch-of-one (qwen_runner.py:108-113) so it
    # never hit this: Qwen tokenizers default to RIGHT padding, which for a
    # decoder-only generate() puts pad tokens BETWEEN a shorter prompt and
    # its continuation, corrupting every row shorter than the longest in the
    # chunk.  Left padding (the documented Qwen batch-inference setting)
    # keeps all prompts flush with the generation boundary; the common
    # input_len slice below is then correct for every row.
    # Set-and-RESTORE around the one call that needs it: the processor's
    # tokenizer is shared process-wide (M1 singleton), and a permanent
    # padding_side mutation would silently change every other consumer's
    # default for the rest of the worker's life.
    tokenizer = getattr(processor, "tokenizer", None)
    prev_padding_side = None
    if tokenizer is not None and hasattr(tokenizer, "padding_side"):
        prev_padding_side = tokenizer.padding_side
        tokenizer.padding_side = "left"
    try:
        inputs = processor(
            text=text_inputs, images=list(images), padding=True,
            return_tensors="pt",
        )
    finally:
        if prev_padding_side is not None:
            tokenizer.padding_side = prev_padding_side
    inputs = inputs.to(model.device)
    if json_root is not None:
        gen_kwargs = dict(
            JSON_SINGLE_SHOT_KWARGS, max_new_tokens=options.max_new_tokens
        )
    else:
        gen_kwargs = select_generation_kwargs(prompt_mode, options)
    with torch_mod.no_grad():
        generated_ids = model.generate(**inputs, **gen_kwargs)
    input_len = inputs["input_ids"].shape[1]
    generated_ids = generated_ids[:, input_len:]
    token_rows = []
    for i in range(len(images)):
        row = generated_ids[i]
        token_rows.append(
            slice_after_think(row.tolist() if hasattr(row, "tolist") else list(row))
        )
    raw_texts = processor.batch_decode(
        token_rows, skip_special_tokens=True, clean_up_tokenization_spaces=True
    )
    out = []
    for raw in raw_texts:
        raw = raw.strip()
        out.append(finalize_json_output(raw, json_root) if json_root else raw)
    return out


def run_vlm_inference(
    model,
    processor,
    torch_mod,
    image,
    prompt_mode: str,
    prompt: str,
    options,
    json_root: str | None = None,
) -> str:
    """Single-image form: a micro-batch of one (see run_vlm_inference_batch)."""
    return run_vlm_inference_batch(
        model, processor, torch_mod, [image], prompt_mode, prompt, options,
        json_root=json_root,
    )[0]


def select_attention_backend(requested: str) -> str:
    """M7: flash_attention_2 silently degrades to sdpa when flash_attn is
    not importable (_model_registry.py:164-174); other values pass through."""
    if requested == "flash_attention_2":
        try:
            import flash_attn  # noqa: F401
        except ImportError:
            return "sdpa"
    return requested


def resolve_dtype_name(dtype_name: str | None) -> str:
    """M9, torch-free half: canonicalize the dtype NAME
    (_model_registry.py:146-162); the GPU deployment getattr's torch with
    the result.  None/'auto' -> 'auto' (transformers picks)."""
    if dtype_name is None or dtype_name == "auto":
        return "auto"
    lowered = dtype_name.lower()
    return _DTYPE_ALIASES.get(lowered, lowered)


def quantization_plan(
    quantization: str,
    bnb_4bit_quant_type: str = "nf4",
    bnb_4bit_use_double_quant: bool = True,
) -> dict | None:
    """M8 as plain data (_model_registry.py:177-201): the kwargs a GPU
    deployment feeds BitsAndBytesConfig; None means full precision."""
    if quantization == "none":
        return None
    if quantization == "int8":
        return {"load_in_8bit": True}
    if quantization == "int4":
        return {
            "load_in_4bit": True,
            "bnb_4bit_quant_type": bnb_4bit_quant_type,
            "bnb_4bit_use_double_quant": bnb_4bit_use_double_quant,
            "bnb_4bit_compute_dtype": "bfloat16",
        }
    raise ValueError(f"unknown quantization mode: {quantization!r}")
