"""Continuous-batching engine tests: batched-vs-single parity, concurrent
streams, admission/retirement (SURVEY.md §7 phase 7)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.config import ModelConfig, SamplingConfig
from llama_swift_tpu.models import llama as model_lib
from llama_swift_tpu.runtime.engine import Engine, batched_decode, slot_prefill_chunk
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
    logits_slot, cache_b = slot_prefill_chunk(
        params, jnp.asarray(padded), jnp.int32(0), jnp.int32(1), cache_b, cfg
    )
    cache = model_lib.init_cache(cfg)
    logits_all, cache1 = model_lib.prefill(
        params, jnp.asarray(padded), jnp.int32(0), cache, cfg
    )
    np.testing.assert_allclose(
        np.asarray(logits_slot[length - 1]), np.asarray(logits_all[length - 1]),
        rtol=2e-5, atol=2e-5,
    )
    # slot 1 cache plane must equal the single-seq cache; other slots
    # untouched (cache is layer-major [L, B, H, ctx, Dh])
    np.testing.assert_allclose(
        np.asarray(cache_b["k"])[:, 1, :, :length],
        np.asarray(cache1["k"])[:, :, :length], rtol=2e-5, atol=2e-5,
    )
    assert np.all(np.asarray(cache_b["k"])[:, 0] == 0)


def test_slot_prefill_chunked_matches_whole(setup):
    """Prefilling a prompt in 3 chunks == prefilling it at once."""
    cfg, params, _ = setup
    rng = np.random.default_rng(5)
    ids = rng.integers(3, 90, size=20).astype(np.int32).tolist()
    bucket = 8
    cache_b = model_lib.init_cache_batched(cfg, 2)
    pos = 0
    while pos < len(ids):
        chunk = ids[pos : pos + bucket]
        padded, clen = model_lib.pad_tokens(chunk, bucket)
        logits, cache_b = slot_prefill_chunk(
            params, jnp.asarray(padded), jnp.int32(pos), jnp.int32(0),
            cache_b, cfg,
        )
        pos += clen
    padded_all, length = model_lib.pad_tokens(ids, bucket)
    cache = model_lib.init_cache(cfg)
    logits_all, cache1 = model_lib.prefill(
        params, jnp.asarray(padded_all), jnp.int32(0), cache, cfg
    )
    np.testing.assert_allclose(
        np.asarray(logits[(len(ids) - 1) % bucket]),
        np.asarray(logits_all[length - 1]), rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(cache_b["k"])[:, 0, :, : len(ids)],
        np.asarray(cache1["k"])[:, :, : len(ids)], rtol=2e-5, atol=2e-5,
    )


def test_engine_decode_continues_during_long_admission(setup):
    """An active slot keeps emitting while a long prompt admits chunk by
    chunk (admission must not freeze decode — VERDICT r2 item 8)."""
    cfg, params, vocab = setup
    eng = Engine(params, cfg, vocab, max_slots=2, prefill_bucket=4)
    # slot A: short prompt, long budget — admitted and decoding first
    ha = eng.submit("the rain", SamplingConfig(seed=1, n_predict=40))
    for _ in range(8):  # admit A (possibly several chunks) + first decodes
        eng.step()
        if eng.slots[0].active:
            break
    assert eng.slots[0].active
    # slot B: a prompt long enough to need several chunks
    long_prompt = "the rain " * 5
    ids_b = vocab.tokenize(long_prompt, bos=True)
    assert len(ids_b) > 3 * 4, "prompt must span >3 chunks for this test"
    hb = eng.submit(long_prompt, SamplingConfig(seed=2, n_predict=2))
    a_before = len(eng.slots[0].generated)
    steps_during_admission = 0
    eng.step()  # B assigned + first chunk
    while eng.slots[1].prefilling:
        assert not eng.slots[1].active
        eng.step()
        steps_during_admission += 1
    assert steps_during_admission >= 2  # really was chunked
    a_after = len(eng.slots[0].generated)
    # A decoded one token per step throughout B's admission
    assert a_after - a_before >= steps_during_admission


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

    # seeded requests use the host numpy RNG stream on both sides (the
    # engine falls back to host sampling for per-request seeds; pin the
    # runner off its device-sampling default to match)
    r = _FakeRunner("unused", n_ctx=cfg.n_ctx, prefill_bucket=8)
    events = r.run_events(
        "the rain",
        RunnerConfig(
            num_tokens=8, sampling=SamplingConfig(seed=7),
            device_sampling=False,
        ),
    )
    toks_runner = [e.token for e in events if e.kind == EventKind.OUTPUT_TOKEN]
    assert toks_engine == toks_runner


def test_engine_device_sampling_path(setup):
    """Unseeded requests take the fused decode+sample path (the serving
    default): streams complete with full budgets and the device-step
    counter proves the fast branch actually ran."""
    cfg, params, vocab = setup
    eng = Engine(params, cfg, vocab, max_slots=2, prefill_bucket=8)
    h1 = eng.submit("the rain", SamplingConfig(n_predict=6))
    h2 = eng.submit("he said", SamplingConfig(n_predict=6))
    with eng:
        o1, o2 = list(h1), list(h2)
    for p, out in (("the rain", o1), ("he said", o2)):
        ids = vocab.tokenize(p, bos=True)
        assert len(out) == len(ids) + 6
        echoed = "".join(out[: len(ids)])
        assert echoed == "".join(vocab.piece_str(t) for t in ids)
    assert eng.stats["device_sampled_steps"] > 0
    assert eng.stats["device_sampled_steps"] == eng.stats["decode_steps"]


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
