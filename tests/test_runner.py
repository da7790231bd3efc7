"""End-to-end runner tests against a tiny on-disk model file:
event-stream ordering, prompt echo, determinism, reverse prompt, errors."""

import asyncio

import numpy as np
import pytest

from llama_swift_tpu.config import ModelConfig, RunnerConfig, SamplingConfig
from llama_swift_tpu.formats import ggml
from llama_swift_tpu.runtime.errors import FailedToLoadModelError
from llama_swift_tpu.runtime.events import EventKind, RunState
from llama_swift_tpu.runtime.runner import LlamaRunner


@pytest.fixture(scope="module")
def model_path(tmp_path_factory, tiny_cfg, tiny_tensors, tiny_vocab_pieces):
    path = str(tmp_path_factory.mktemp("m") / "model.bin")
    ggml.write_model_file(path, tiny_cfg, tiny_vocab_pieces, tiny_tensors)
    return path


def _cfg(n_tokens=8, **kw):
    sampling = SamplingConfig(seed=7, **kw.pop("sampling_kw", {}))
    return RunnerConfig(num_tokens=n_tokens, sampling=sampling, **kw)


def test_event_stream_order(model_path):
    runner = LlamaRunner(model_path, n_ctx=64, prefill_bucket=8)
    events = list(runner.run_events("the rain", _cfg()))
    kinds = [e.kind for e in events]
    assert kinds[0] == EventKind.STARTED_LOADING_MODEL
    assert kinds[1] == EventKind.FINISHED_LOADING_MODEL
    assert kinds[2] == EventKind.STARTED_GENERATING_OUTPUT
    assert kinds[-1] == EventKind.COMPLETED
    assert all(k == EventKind.OUTPUT_TOKEN for k in kinds[3:-1])
    assert len(kinds) > 4


def test_prompt_echoed_through_stream(model_path, tiny_vocab_pieces):
    """The reference emits prompt tokens through the same outputToken stream
    (.mm:892-895)."""
    runner = LlamaRunner(model_path, n_ctx=64, prefill_bucket=8)
    prompt = "the rain"
    tokens = [
        e.token for e in runner.run_events(prompt, _cfg())
        if e.kind == EventKind.OUTPUT_TOKEN
    ]
    from llama_swift_tpu.tokenizer import Vocab

    v = Vocab(tiny_vocab_pieces)
    prompt_ids = v.tokenize(prompt, bos=True)
    echoed = "".join(tokens[: len(prompt_ids)])
    assert echoed == "".join(v.piece_str(t) for t in prompt_ids)
    assert len(tokens) == len(prompt_ids) + 8  # + n_predict generated


def test_seeded_runs_identical(model_path):
    runner = LlamaRunner(model_path, n_ctx=64, prefill_bucket=8)
    out1 = [e.token for e in runner.run_events("the rain", _cfg())
            if e.kind == EventKind.OUTPUT_TOKEN]
    out2 = [e.token for e in runner.run_events("the rain", _cfg())
            if e.kind == EventKind.OUTPUT_TOKEN]
    assert out1 == out2


def test_model_loaded_once(model_path):
    runner = LlamaRunner(model_path, n_ctx=64, prefill_bucket=8)
    list(runner.run_events("the", _cfg(n_tokens=2)))
    params_before = runner.params
    list(runner.run_events("rain", _cfg(n_tokens=2)))
    assert runner.params is params_before  # no per-run reload (fix vs .mm:790)


def test_n_predict_clamped_to_ctx(model_path):
    runner = LlamaRunner(model_path, n_ctx=16, prefill_bucket=8)
    events = list(runner.run_events("the rain in", _cfg(n_tokens=100)))
    toks = [e for e in events if e.kind == EventKind.OUTPUT_TOKEN]
    assert events[-1].kind == EventKind.COMPLETED
    assert len(toks) <= 16  # prompt echo + generated never exceeds n_ctx


def test_run_with_callback_states(model_path):
    runner = LlamaRunner(model_path, n_ctx=64, prefill_bucket=8)
    states, tokens = [], []
    runner.run_with_callback(
        "the", _cfg(n_tokens=4),
        token_handler=tokens.append,
        state_change_handler=states.append,
    )
    assert states == [
        RunState.NOT_STARTED, RunState.INITIALIZING,
        RunState.GENERATING_OUTPUT, RunState.COMPLETED,
    ]
    assert len(tokens) > 0


def test_async_run(model_path):
    runner = LlamaRunner(model_path, n_ctx=64, prefill_bucket=8)
    states, tokens = [], []

    async def go():
        async for tok in runner.run("the", _cfg(n_tokens=4), states.append):
            tokens.append(tok)

    asyncio.run(go())
    assert RunState.COMPLETED in states
    assert len(tokens) > 0


def test_async_run_raises_on_bad_model(tmp_path):
    bad = tmp_path / "missing.bin"
    runner = LlamaRunner(str(bad))
    states = []

    async def go():
        async for _ in runner.run("x", _cfg(), states.append):
            pass

    with pytest.raises(FailedToLoadModelError):
        asyncio.run(go())
    assert states[-1] == RunState.FAILED


def test_failed_event_on_bad_model(tmp_path):
    runner = LlamaRunner(str(tmp_path / "missing.bin"))
    events = list(runner.run_events("x", _cfg()))
    assert events[-1].kind == EventKind.FAILED
    assert isinstance(events[-1].error, FailedToLoadModelError)
    assert events[-1].error.code == -1000


def test_reverse_prompt_stops_generation(model_path, tiny_vocab_pieces):
    """Capability fix: reversePrompt actually stops generation (the reference
    plumbs it then ignores it, .mm:815)."""
    runner = LlamaRunner(model_path, n_ctx=64, prefill_bucket=8)
    base_cfg = _cfg(n_tokens=20)
    base = [e.token for e in runner.run_events("the rain", base_cfg)
            if e.kind == EventKind.OUTPUT_TOKEN]
    # pick the first generated token as the reverse prompt → generation must
    # stop immediately after (and not emit it)
    from llama_swift_tpu.tokenizer import Vocab

    v = Vocab(tiny_vocab_pieces)
    n_prompt = len(v.tokenize("the rain", bos=True))
    # pick a generated token whose string round-trips to a single id (skip
    # specials like <extra_N> that re-tokenize per-char)
    candidates = [t for t in base[n_prompt:] if len(v.tokenize(t)) == 1]
    if not candidates:
        pytest.skip("no single-id generated token to use as reverse prompt")
    rp = candidates[0]
    cfg = RunnerConfig(
        num_tokens=20, reverse_prompt=rp,
        sampling=SamplingConfig(seed=7),
    )
    out = [e.token for e in runner.run_events("the rain", cfg)
           if e.kind == EventKind.OUTPUT_TOKEN]
    assert len(out) < len(base)


def test_empty_prompt_uses_random_prompt(model_path):
    runner = LlamaRunner(model_path, n_ctx=64, prefill_bucket=8)
    events = list(runner.run_events("", _cfg(n_tokens=2)))
    assert events[-1].kind == EventKind.COMPLETED
    assert any(e.kind == EventKind.OUTPUT_TOKEN for e in events)


def test_stats_reported(model_path):
    runner = LlamaRunner(model_path, n_ctx=64, prefill_bucket=8)
    list(runner.run_events("the rain", _cfg()))
    assert runner.stats["prompt_tokens"] > 0
    assert runner.stats["generated_tokens"] == 8
    assert runner.stats["t_load_s"] >= 0


def test_chunked_prefill_matches_single(model_path):
    """n_batch chunked prompt consumption (reference .mm:878-889) must give
    the same generation as one padded prefill."""
    from llama_swift_tpu.config import RunnerConfig, SamplingConfig

    runner = LlamaRunner(model_path, n_ctx=64, prefill_bucket=8)
    single = [e.token for e in runner.run_events(
        "the rain in spain", RunnerConfig(
            num_tokens=6, sampling=SamplingConfig(seed=5)))
        if e.kind == EventKind.OUTPUT_TOKEN]
    chunked = [e.token for e in runner.run_events(
        "the rain in spain", RunnerConfig(
            num_tokens=6, chunked_prefill=True,
            sampling=SamplingConfig(seed=5, n_batch=3)))
        if e.kind == EventKind.OUTPUT_TOKEN]
    assert single == chunked
