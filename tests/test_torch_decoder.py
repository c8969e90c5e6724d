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
        tok = getattr(self, "tokenizer", None)
        self.padding_side_at_call = getattr(tok, "padding_side", None)
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


# -------------------------------------------- T12 force_valid_json wiring

class JfIdVec:
    def __init__(self, ids):
        self.ids = list(ids)

    def __getitem__(self, order):
        if isinstance(order, JfIdVec):
            return JfIdVec([self.ids[i] for i in order.ids])
        return self.ids[order]

    def __iter__(self):
        return iter(self.ids)


class JfScoreVec:
    def __init__(self, scores):
        self.scores = scores

    def argsort(self, descending=False):
        order = sorted(range(len(self.scores)),
                       key=lambda i: self.scores[i], reverse=descending)
        return JfIdVec(order)


class JfLogits:
    """Supports exactly the tensor ops TorchTokenBackend performs on
    logits[0, -1]: topk(k).indices, fancy-index scoring, scalar lookup."""

    def __init__(self, ranked_ids):
        self.scores = {t: float(len(ranked_ids) - i)
                       for i, t in enumerate(ranked_ids)}
        self.ranked = list(ranked_ids)

    def topk(self, k):
        return types.SimpleNamespace(indices=JfIdVec(self.ranked[:k]))

    def __getitem__(self, idx):
        if isinstance(idx, JfIdVec):
            return JfScoreVec([self.scores.get(i, 0.0) for i in idx.ids])
        return self.scores.get(idx, 0.0)


class JfLogits2D:
    def __init__(self, logits):
        self.logits = logits

    def __getitem__(self, idx):  # logits[0, -1]
        return self.logits


class JfTokenizer:
    """Queue-decoding tokenizer: generate() continuations come off a
    scripted queue; single-id decodes map through a tiny vocab."""

    eos_token_id = 7

    def __init__(self, continuations, vocab):
        self.continuations = list(continuations)
        self.vocab = dict(vocab)
        self.padding_side = "right"

    def convert_tokens_to_ids(self, tok):
        return {"true": 101, "false": 102}.get(tok, 103)

    def decode(self, ids, skip_special_tokens=False):
        if isinstance(ids, int):
            return self.vocab[ids]
        return self.continuations.pop(0)


def test_force_valid_json_routes_layout_through_jsonformer(decoder_env):
    """T12 as a decode regime: force_valid_json=True sends layout_json
    through the per-value JsonformerWalk over a TorchTokenBackend — one
    greedy generate per scalar, one forward for the array-continue probe,
    NO single-shot generate — and the serialized result flows through the
    same structural parse (picture label -> media span)."""
    dec, model, processor = decoder_env
    dec.options.force_valid_json = True

    # layout schema walk: 2 elements (the >=2 quirk) x 6 scalars each
    continuations = ['picture"', "1", "2", "30", "40", "0.9",
                     'text"', "5", "6", "7", "8", "0.8"]
    processor.tokenizer = JfTokenizer(continuations, vocab={201: "]"})
    probe_rankings = [[201]]  # after elem 2: ']' ranked first -> stop

    gen_log = []

    def jf_generate(**kw):
        gen_log.append(kw)

        class Resp:
            def __getitem__(self, idx):  # response[0, input_len:]
                return [9, 9]

        return Resp()

    def jf_forward(**inputs):
        return types.SimpleNamespace(
            logits=JfLogits2D(JfLogits(probe_rankings.pop(0)))
        )

    model.generate = jf_generate
    model.forward = jf_forward

    out = dec.decode_page("layout_json", object())

    # one greedy generate per scalar, all with the reference kwargs
    assert len(gen_log) == 12
    assert all(kw["do_sample"] is False for kw in gen_log)
    assert all(kw["pad_token_id"] == 7 for kw in gen_log)
    assert not probe_rankings  # the continue probe ran exactly once
    # first scalar's assistant prefix = progress + injected opening quote
    # (string generation, _vlm_jsonformer.py:367-373)
    process_texts = [c[1][0] for c in processor.calls if c[0] == "process"]
    assert any(t.endswith('[{"label": "') for t in process_texts)
    # picture element -> one media span at its layout (t, l); the text
    # element emits nothing (same _decode_layout parse as single-shot)
    assert out == [(0, "media_ref", "", 2, 1)]


def test_force_valid_json_decode_batch_mixes_walk_and_batched_ocr(decoder_env):
    """The T12 regime at the decode_batch level, not just page-of-one:
    under force_valid_json=True a MIXED batch keeps OCR-ish pages on the
    micro-batched generate path (ONE forward pass for both plain pages)
    while every layout_json page runs its own per-value JsonformerWalk
    over TorchTokenBackend (12 greedy scalar generates + 1 continue-probe
    forward each), and both groups' parsed structs land in input order."""
    dec, model, processor = decoder_env
    dec.options.force_valid_json = True
    dec.options.prompt_mode = "ocr"

    # two independent layout walks: 2 elements x 6 scalars each
    continuations = [
        'picture"', "1", "2", "30", "40", "0.9",
        'text"', "5", "6", "7", "8", "0.8",
    ] * 2
    processor.tokenizer = JfTokenizer(continuations, vocab={201: "]"})
    probe_rankings = [[201], [201]]  # each page: ']' first after elem 2

    jf_gen_log = []
    ocr_generate = model.generate  # the batched-OCR fake, bound pre-swap

    def dispatch_generate(**kw):
        # only TorchTokenBackend.continue_text passes pad_token_id
        # (generation.py's batched path never does)
        if "pad_token_id" in kw:
            jf_gen_log.append(kw)

            class Resp:
                def __getitem__(self, idx):  # response[0, input_len:]
                    return [9, 9]

            return Resp()
        return ocr_generate(**kw)

    def jf_forward(**inputs):
        return types.SimpleNamespace(
            logits=JfLogits2D(JfLogits(probe_rankings.pop(0)))
        )

    model.generate = dispatch_generate
    model.forward = jf_forward
    model.output_ids = [7]
    processor.decode_result = "alpha"

    out = dec.decode_batch([
        ("plain_text", object()), ("layout_json", object()),
        ("plain_text", object()), ("layout_json", object()),
    ])

    # both plain pages shared ONE micro-batched generate call of size 2
    assert model.generate_calls == 1
    assert model.generate_batch_sizes == [2]
    # each layout page walked independently: 12 scalars + 1 probe apiece
    assert len(jf_gen_log) == 24
    assert all(kw["do_sample"] is False for kw in jf_gen_log)
    assert not probe_rankings
    # results in INPUT order: parsed paragraphs, then the walked struct
    # through the same _decode_layout parse (picture -> media span at (t,l))
    assert [e[2] for e in out[0]] == ["alpha"] and out[2] == out[0]
    assert out[1] == [(0, "media_ref", "", 2, 1)]
    assert out[3] == out[1]


def test_force_valid_json_boolean_probe_uses_logit_compare(decoder_env):
    """table_json + force_valid_json: the 'hdr' boolean resolves via ONE
    forward pass comparing the exact true/false token logits
    (_vlm_jsonformer.py:345-354), never a greedy generate."""
    dec, model, processor = decoder_env
    dec.options.force_valid_json = True

    # table schema: rows, cols, then cells array (2 elements x 10 scalars,
    # hdr handled by the probe) then the continue probe
    cell_scalars = ["0", "0", "1", "1", "1", "2", "30", "40", 'x"']
    continuations = ["2", "3"] + cell_scalars + cell_scalars
    processor.tokenizer = JfTokenizer(continuations, vocab={201: "]"})
    # forwards: hdr probe (elem1), hdr probe (elem2), continue probe
    forward_logits = [
        JfLogits([101]),        # true beats false -> hdr: true
        JfLogits([102, 101]),   # false ranked above true -> hdr: false
        JfLogits([201]),        # ']' -> stop array
    ]

    def jf_generate(**kw):
        class Resp:
            def __getitem__(self, idx):
                return [9]

        return Resp()

    def jf_forward(**inputs):
        return types.SimpleNamespace(logits=JfLogits2D(forward_logits.pop(0)))

    model.generate = jf_generate
    model.forward = jf_forward

    out = dec.decode_page("table_json", object())
    assert not forward_logits  # exactly 3 forward passes
    # rows=2/cols=3 -> a real table -> one media span
    assert out == [(0, "media_ref", "", 0, 0)]


def test_batched_generate_sets_left_padding(decoder_env):
    """Ragged micro-batches need LEFT padding (Qwen batch-inference
    setting): right padding would insert pad tokens between a shorter
    prompt and its continuation.  run_vlm_inference_batch must flip the
    tokenizer for the batched processor call — and RESTORE the previous
    side afterwards (the tokenizer is the process-wide singleton's; a
    permanent mutation would leak into every other consumer)."""
    dec, model, processor = decoder_env
    processor.tokenizer = JfTokenizer([], vocab={})
    assert processor.tokenizer.padding_side == "right"
    model.output_ids = [7]
    processor.decode_result = "para"

    dec.decode_batch([("plain_text", object()), ("plain_text", object())])

    assert processor.padding_side_at_call == "left"
    assert processor.tokenizer.padding_side == "right"
