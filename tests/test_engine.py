"""Continuous-batching engine tests: batched-vs-single parity, concurrent
streams, admission/retirement (SURVEY.md §7 phase 7)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.config import ModelConfig, SamplingConfig
from llama_swift_tpu.models import llama as model_lib
from llama_swift_tpu.runtime.engine import Engine, batched_decode, slot_prefill
from llama_swift_tpu.tokenizer import Vocab


@pytest.fixture(scope="module")
def setup(tiny_cfg, tiny_tensors, tiny_vocab_pieces):
    cfg = ModelConfig.tiny(n_ctx=64)
    params = model_lib.params_from_tensors(tiny_tensors, cfg, param_dtype=jnp.float32)
    return cfg, params, Vocab(tiny_vocab_pieces)


def test_batched_decode_matches_single(setup):
    cfg, params, _ = setup
    B = 4
    cache_b = model_lib.init_cache_batched(cfg, B)
    tokens = np.array([3, 9, 17, 40], dtype=np.int32)
    n_pasts = np.zeros(B, dtype=np.int32)
    logits_b, _ = batched_decode(
        params, jnp.asarray(tokens), jnp.asarray(n_pasts), cache_b, cfg
    )
    for i in range(B):
        cache = model_lib.init_cache(cfg)
        logits, _ = model_lib.decode_step(
            params, jnp.asarray(tokens[i]), jnp.int32(0), cache, cfg
        )
        np.testing.assert_allclose(
            np.asarray(logits_b[i]), np.asarray(logits), rtol=2e-5, atol=2e-5
        )


def test_slot_prefill_matches_single(setup):
    cfg, params, _ = setup
    B = 3
    cache_b = model_lib.init_cache_batched(cfg, B)
    tokens = [1, 5, 9, 2]
    padded, length = model_lib.pad_tokens(tokens, 8)
    logits_slot, cache_b = slot_prefill(
        params, jnp.asarray(padded), jnp.int32(length), jnp.int32(1), cache_b, cfg
    )
    cache = model_lib.init_cache(cfg)
    logits_all, cache1 = model_lib.prefill(
        params, jnp.asarray(padded), jnp.int32(0), cache, cfg
    )
    np.testing.assert_allclose(
        np.asarray(logits_slot), np.asarray(logits_all[length - 1]),
        rtol=2e-5, atol=2e-5,
    )
    # slot 1 cache plane must equal the single-seq cache; other slots
    # untouched (cache is layer-major [L, B, H, ctx, Dh])
    np.testing.assert_allclose(
        np.asarray(cache_b["k"])[:, 1, :, :length],
        np.asarray(cache1["k"])[:, :, :length], rtol=2e-5, atol=2e-5,
    )
    assert np.all(np.asarray(cache_b["k"])[:, 0] == 0)


def test_engine_single_stream_matches_runner_tokens(setup):
    """Engine output for one stream == LlamaRunner output (same seed)."""
    cfg, params, vocab = setup
    eng = Engine(params, cfg, vocab, max_slots=2, prefill_bucket=8)
    h = eng.submit("the rain", SamplingConfig(seed=7, n_predict=8))
    with eng:
        toks_engine = list(h)

    # reference: single-stream path
    from llama_swift_tpu.runtime.events import EventKind
    from llama_swift_tpu.runtime.runner import LlamaRunner

    class _FakeRunner(LlamaRunner):
        def ensure_loaded(self):
            self.config, self.vocab, self.params = cfg, vocab, params
            self._loaded = True

    from llama_swift_tpu.config import RunnerConfig

    r = _FakeRunner("unused", n_ctx=cfg.n_ctx, prefill_bucket=8)
    events = r.run_events(
        "the rain", RunnerConfig(num_tokens=8, sampling=SamplingConfig(seed=7))
    )
    toks_runner = [e.token for e in events if e.kind == EventKind.OUTPUT_TOKEN]
    assert toks_engine == toks_runner


def test_engine_concurrent_streams(setup):
    cfg, params, vocab = setup
    eng = Engine(params, cfg, vocab, max_slots=4, prefill_bucket=8)
    prompts = ["the rain", "he said", "in the", "a on"]
    with eng:
        handles = [
            eng.submit(p, SamplingConfig(seed=i, n_predict=6))
            for i, p in enumerate(prompts)
        ]
        outs = [list(h) for h in handles]
    for p, out in zip(prompts, outs):
        ids = vocab.tokenize(p, bos=True)
        echoed = "".join(out[: len(ids)])
        assert echoed == "".join(vocab.piece_str(t) for t in ids)
        assert len(out) == len(ids) + 6
    assert eng.stats["admitted"] == 4


def test_engine_more_streams_than_slots(setup):
    """Queueing: 5 streams through 2 slots all complete."""
    cfg, params, vocab = setup
    eng = Engine(params, cfg, vocab, max_slots=2, prefill_bucket=8)
    with eng:
        handles = [
            eng.submit(f"the {c}", SamplingConfig(seed=i, n_predict=4))
            for i, c in enumerate("abcde")
        ]
        outs = [list(h) for h in handles]
    assert all(len(o) > 4 for o in outs)
    assert eng.stats["admitted"] == 5


def test_engine_isolation_between_streams(setup):
    """A slot's output must not depend on what other slots run."""
    cfg, params, vocab = setup
    eng1 = Engine(params, cfg, vocab, max_slots=4, prefill_bucket=8)
    with eng1:
        alone = list(eng1.submit("the rain", SamplingConfig(seed=3, n_predict=6)))
    eng2 = Engine(params, cfg, vocab, max_slots=4, prefill_bucket=8)
    with eng2:
        h1 = eng2.submit("the rain", SamplingConfig(seed=3, n_predict=6))
        h2 = eng2.submit("on a he", SamplingConfig(seed=9, n_predict=6))
        together = list(h1)
        list(h2)
    assert alone == together


def test_perplexity_harness(setup):
    cfg, params, vocab = setup
    from llama_swift_tpu.utils.perplexity import perplexity

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 90, size=3 * cfg.n_ctx).astype(np.int32)
    out = perplexity(params, cfg, ids)
    assert out["n_scored"] == 3 * (cfg.n_ctx // 2)
    assert 1.0 < out["ppl"] < cfg.n_vocab * 2
    # random model on random tokens ≈ uniform → ppl near n_vocab
    assert out["ppl"] > 20
