"""Mocked-torch drive of the production TorchQwenDecoder control flow.

The sandbox has no torch/transformers, so the tensor path cannot execute for
real — but its CONTROL FLOW (reference loop qwen_runner.py:63-190 and the
constrained-JSON path _vlm_jsonformer.py:105-160) is pinned here by
injecting fake torch/transformers modules: chat-template call shape,
processor kwargs, regime-switched generate kwargs, input-token slice,
think-token strip BEFORE decode, batch_decode kwargs, JSON prefix
inject/finalize, and the shared structural parse with DeterministicDecoder.
"""

from __future__ import annotations

import sys
import types

import pytest

THINK = 151668  # </think> token id

# ---------------------------------------------------------------- fakes


class FakeRow:
    def __init__(self, vals):
        self.vals = list(vals)

    def tolist(self):
        return list(self.vals)


class FakeTensor2D:
    """Just enough of a 2-D tensor: [:, n:] slicing and [0] row access."""

    def __init__(self, rows):
        self.rows = [list(r) for r in rows]

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            rsel, csel = idx
            assert rsel == slice(None)
            return FakeTensor2D([r[csel] for r in self.rows])
        return FakeRow(self.rows[idx])


class FakeInputs(dict):
    def to(self, device):
        self.moved_to = device
        return self


class FakeIds:
    def __init__(self, n):
        self.shape = (1, n)


class FakeProcessor:
    def __init__(self):
        self.calls = []

    def apply_chat_template(self, messages, tokenize, add_generation_prompt):
        self.calls.append(("template", messages, tokenize, add_generation_prompt))
        return "<chat>" + messages[-1]["content"][1]["text"]

    def __call__(self, *, text, images, padding, return_tensors):
        self.calls.append(("process", text, images, padding, return_tensors))
        self.last_text = text[0]
        self.model.next_n = len(text)  # batch size flows to generate()
        return FakeInputs(input_ids=FakeIds(5), pixel_values="px")

    def batch_decode(self, ids, *, skip_special_tokens, clean_up_tokenization_spaces):
        self.calls.append(
            ("decode", [list(i) for i in ids], skip_special_tokens,
             clean_up_tokenization_spaces)
        )
        return [self.decode_result] * len(ids)


class FakeModel:
    device = "cuda:0"

    def __init__(self, output_ids):
        self.output_ids = output_ids
        self.generate_kwargs = None
        self.generate_calls = 0
        self.generate_batch_sizes = []
        self.next_n = 1

    def generate(self, **kwargs):
        self.generate_kwargs = kwargs
        self.generate_calls += 1
        self.generate_batch_sizes.append(self.next_n)
        # echo 5 "input" tokens then the scripted continuation, per row
        return FakeTensor2D(
            [[1, 2, 3, 4, 5] + list(self.output_ids) for _ in range(self.next_n)]
        )


class _NoGrad:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _fake_torch():
    torch = types.ModuleType("torch")
    torch.no_grad = _NoGrad
    torch.cuda = types.SimpleNamespace(
        is_available=lambda: False, empty_cache=lambda: None
    )
    return torch


def _fake_transformers(model, processor, load_kwargs_log=None):
    tf = types.ModuleType("transformers")

    def processor_load(repo, **kw):
        if load_kwargs_log is not None:
            load_kwargs_log.append(("processor", repo, kw))
        return processor

    def model_load(repo, **kw):
        if load_kwargs_log is not None:
            load_kwargs_log.append(("model", repo, kw))
        return model

    tf.AutoProcessor = types.SimpleNamespace(from_pretrained=processor_load)
    tf.AutoModelForImageTextToText = types.SimpleNamespace(
        from_pretrained=model_load
    )
    tf.BitsAndBytesConfig = lambda **kw: ("bnb", kw)
    return tf


@pytest.fixture()
def decoder_env(monkeypatch):
    """TorchQwenDecoder constructed against injected fake torch/transformers."""
    from docling_ocr_qwen3vl_spark.inference import registry

    processor = FakeProcessor()
    model = FakeModel(output_ids=[])
    processor.model = model
    load_log: list = []
    monkeypatch.setitem(sys.modules, "torch", _fake_torch())
    monkeypatch.setitem(
        sys.modules, "transformers", _fake_transformers(model, processor, load_log)
    )
    registry.clear()
    from docling_ocr_qwen3vl_spark.inference.decoder import TorchQwenDecoder

    dec = TorchQwenDecoder(model_repo_id="owner/repo", device="cuda")
    dec._test_load_log = load_log
    yield dec, model, processor
    registry.clear()


# ---------------------------------------------------------------- tests


def test_html_page_full_loop(decoder_env):
    """qwenvl_html page: system prompt, deterministic decoding, think strip
    before decode, and the SAME structural parse as DeterministicDecoder."""
    dec, model, processor = decoder_env
    html = '<h1 data-bbox="10 20 500 60">Title</h1><p data-bbox="10 80 500 120">Body text</p>'
    model.output_ids = [9, 9, THINK, 7, 8]  # CoT tokens, marker, answer tokens
    processor.decode_result = "  " + html + "  "

    out = dec.decode_page("qwenvl_html", image := object())

    # chat template got system + user with the image (qwen_runner.py:76-99)
    kind, messages, tokenize, agp = processor.calls[0]
    assert (kind, tokenize, agp) == ("template", False, True)
    assert messages[0]["role"] == "system"
    assert messages[1]["content"][0] == {"type": "image", "image": image}
    # processor kwargs (qwen_runner.py:108-114)
    assert processor.calls[1][3:] == (True, "pt")
    # deterministic regime for structured HTML (qwen_runner.py:128-135)
    assert model.generate_kwargs["do_sample"] is False
    assert "input_ids" in model.generate_kwargs
    # think strip happened BEFORE decode: only the post-marker ids decoded
    decoded_ids = processor.calls[-1][1][0]
    assert decoded_ids == [7, 8]
    assert processor.calls[-1][2:] == (True, True)
    # downstream parse identical to the deterministic backend
    from docling_ocr_qwen3vl_spark.inference.decoder import DeterministicDecoder

    assert out == DeterministicDecoder().decode_page("qwenvl_html", html)


def test_plain_page_sampling_regime(decoder_env):
    """Non-HTML mode passes the sampling knobs exactly as the reference
    calls model.generate (qwen_runner.py:137-146)."""
    dec, model, processor = decoder_env
    dec.options.prompt_mode = "ocr"   # reference: the OPTIONS mode governs
    dec.options.do_sample = True
    dec.options.temperature = 0.7
    model.output_ids = [7]
    processor.decode_result = "one para\n\ntwo para"

    out = dec.decode_page("plain_text", object())

    gk = model.generate_kwargs
    assert gk["do_sample"] is True
    assert gk["temperature"] == 0.7
    assert [e[2] for e in out] == ["one para", "two para"]
    # single user message (no system prompt outside qwenvl_html)
    assert processor.calls[0][1][0]["role"] == "user"


def test_layout_json_single_shot_path(decoder_env):
    """layout_json takes the T11 constrained path: '[' injected after the
    chat template, JSON kwargs (repetition_penalty=1.3, do_sample=False),
    prefix re-attached before parsing (_vlm_jsonformer.py:105-160)."""
    dec, model, processor = decoder_env
    model.output_ids = [7]
    # model continues AFTER the injected '[' — no opening bracket of its own
    processor.decode_result = '{"label":"picture","x1":1,"y1":2,"x2":30,"y2":40}]'

    out = dec.decode_page("layout_json", object())

    assert processor.last_text.endswith("[")  # injected assistant prefix
    gk = model.generate_kwargs
    assert gk["repetition_penalty"] == 1.3
    assert gk["do_sample"] is False
    # the re-attached prefix made the array parse -> one picture media span
    assert len(out) == 1 and out[0][1] == "media_ref"


def test_micro_batched_generate_calls(decoder_env):
    """M3: decode_batch groups pages by kind and chunks model.generate to
    micro_batch images per forward pass — 5 same-kind pages at
    micro_batch=2 -> 3 generate calls of sizes [2, 2, 1], not 5."""
    dec, model, processor = decoder_env
    dec.options.prompt_mode = "ocr"
    dec.micro_batch = 2
    model.output_ids = [7]
    processor.decode_result = "alpha\n\nbeta"

    out = dec.decode_batch([("plain_text", object()) for _ in range(5)])

    assert model.generate_calls == 3
    assert model.generate_batch_sizes == [2, 2, 1]
    assert len(out) == 5
    assert all([e[2] for e in page] == ["alpha", "beta"] for page in out)


def test_mixed_kinds_grouped_by_effective_regime(decoder_env):
    """OCR-ish kinds share one options-driven prompt/regime and BATCH
    TOGETHER; the JSON stages (their own prompt + constrained regime) get
    separate generate calls.  Results return in input order."""
    dec, model, processor = decoder_env
    dec.options.prompt_mode = "ocr"
    dec.micro_batch = 8
    model.output_ids = [7]
    processor.decode_result = "solo"

    out = dec.decode_batch(
        [("plain_text", object()), ("qwenvl_html", object()),
         ("layout_json", object()), ("plain_text", object())]
    )
    # plain_text + qwenvl_html + plain_text share the 'ocr' regime -> ONE
    # call of 3; layout_json gets its own constrained call of 1
    assert model.generate_calls == 2
    assert sorted(model.generate_batch_sizes) == [1, 3]
    assert len(out) == 4 and out[0] and out[1] and out[3]  # ocr rows parsed


def test_load_forwards_auth_and_quant_options(decoder_env):
    """hf_token / trust_remote_code reach BOTH from_pretrained calls, and
    the int4 bnb fields reach the quantization config (previously dropped)."""
    from docling_ocr_qwen3vl_spark.config import Qwen3VlOcrOptions
    from docling_ocr_qwen3vl_spark.inference import registry
    from docling_ocr_qwen3vl_spark.inference.decoder import TorchQwenDecoder

    dec2 = TorchQwenDecoder(
        options=Qwen3VlOcrOptions(
            hf_token="tok-123",
            quantization="int4",
            bnb_4bit_quant_type="fp4",
            bnb_4bit_use_double_quant=False,
            device="cuda:1",
        )
    )
    assert dec2.device == "cuda:1"  # options.device honored
    _, model, processor = decoder_env
    dec2._test_load_log = decoder_env[0]._test_load_log
    model.output_ids = [7]
    processor.decode_result = "x"
    registry.clear()
    dec2.decode_page("plain_text", object())
    log = {kind: (repo, kw) for kind, repo, kw in dec2._test_load_log}
    assert log["processor"][1] == {"trust_remote_code": True, "token": "tok-123"}
    mkw = log["model"][1]
    assert mkw["token"] == "tok-123" and mkw["trust_remote_code"] is True
    assert mkw["quantization_config"] == (
        "bnb",
        {
            "load_in_4bit": True,
            "bnb_4bit_quant_type": "fp4",
            "bnb_4bit_use_double_quant": False,
            "bnb_4bit_compute_dtype": "bfloat16",
        },
    )


def test_model_loaded_once_per_worker(decoder_env):
    """M1/M2: the (model, processor) pair is a lazy per-worker singleton."""
    from docling_ocr_qwen3vl_spark.inference import registry

    dec, model, processor = decoder_env
    assert dec._shared is None  # lazy: nothing loaded at construction
    model.output_ids = [7]
    processor.decode_result = "x"
    before = registry.registry_size()
    dec.decode_page("plain_text", object())
    dec.decode_page("plain_text", object())
    assert registry.registry_size() == before + 1
    assert dec._shared[0] is model
