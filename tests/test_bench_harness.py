"""Guard rails for bench.py — the driver runs it once per round and a
silent breakage (bad snippet format string, a renamed registry query,
normalization arithmetic) would cost the whole round's BENCH artifact."""

from __future__ import annotations

import importlib.util
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return sys.modules["bench"]


def test_child_snippets_format_and_compile():
    """The scaling/burn children are source strings built with .format —
    a stray brace or bad placeholder would fail at bench time, not at
    import time.  Compile both exactly as bench does."""
    bench = _load_bench()
    child = bench._CHILD_SNIPPET.format(repo="/root/repo", sf="/root/testdata/sf0.1")
    compile(child, "<scaling-child>", "exec")
    compile(bench._BURN_SNIPPET, "<cpu-burn>", "exec")
    compile(bench._BW_BURN_SNIPPET, "<bw-burn>", "exec")


def test_bench_queries_exist_in_registry():
    bench = _load_bench()
    from docling_ocr_qwen3vl_spark.queries import QUERIES

    for name in bench.BENCH_QUERIES + bench.EAGER_BENCH_QUERIES:
        assert name in QUERIES, name
    # the flagship the JSON 'value' field reads must stay in the timed set
    assert "extract_interleaved_spans" in bench.BENCH_QUERIES


def test_scaling_efficiency_arithmetic():
    """efficiency = (tput_hi / tput_lo) / (hi / lo) on the min-of-k secs;
    pin the arithmetic with a fake child so a refactor cannot silently
    invert the ratio."""
    bench = _load_bench()

    fake = {
        8: {"cores": 8, "rows": 1, "docs": 1000, "sec": 10.0, "all_secs": [10.0]},
        32: {"cores": 32, "rows": 1, "docs": 1000, "sec": 2.5, "all_secs": [2.5]},
    }
    orig = bench._run_scaling_child
    bench._run_scaling_child = lambda sf, cores, rep, reps, env: fake[cores]
    try:
        out = bench.run_scaling("ignored", lo=8, hi=32, rep=1, reps=1)
    finally:
        bench._run_scaling_child = orig
    # (400 / 100) / 4 = 1.0: perfect scaling
    assert out["efficiency"] == 1.0
    assert out["docs_per_sec_n"] == 100.0 and out["docs_per_sec_4n"] == 400.0
    assert out["attempts"] == 1
