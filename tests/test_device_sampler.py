"""On-device sampler tests: exact pipeline parity with the host sampler
(``utils.cpp:333-428`` semantics) and the chunked device decode path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.config import ModelConfig, RunnerConfig, SamplingConfig
from llama_swift_tpu.models import llama as model_lib
from llama_swift_tpu.runtime.device_sampler import (
    init_ring,
    sample_token,
    sampled_decode_loop,
    topk_topp_probs,
)
from llama_swift_tpu.runtime.sampler import sample_top_p_top_k


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("top_p", [0.5, 0.95, 1.0])
def test_truncated_categorical_matches_host(seed, top_p):
    """(ids, probs) after temp/penalty/top-k/softmax/top-p must equal the
    host sampler's — the draw is then the only RNG-dependent step."""
    rng = np.random.default_rng(seed)
    v = 333
    logits = (rng.standard_normal(v) * 3).astype(np.float32)
    ring = rng.integers(0, v, size=64).astype(np.int32)
    kw = dict(repeat_penalty=1.3, top_k=40, top_p=top_p, temp=0.8)
    _, order, probs = sample_top_p_top_k(
        logits, list(ring), rng=np.random.default_rng(0), return_probs=True,
        **kw,
    )
    ids_d, probs_d = topk_topp_probs(jnp.asarray(logits), jnp.asarray(ring), **kw)
    ids_d, probs_d = np.asarray(ids_d), np.asarray(probs_d)
    n = len(order)
    np.testing.assert_array_equal(ids_d[:n], order)
    np.testing.assert_allclose(probs_d[:n], probs, rtol=2e-4, atol=2e-6)
    assert np.all(probs_d[n:] == 0.0), "beyond the top-p cut must be zero"


def test_penalty_sign_behavior():
    """Positive logits divide, negative multiply (utils.cpp:364-370)."""
    logits = np.array([2.0, -2.0, 1.0, 0.5], dtype=np.float32)
    ring = np.array([0, 1], dtype=np.int32)
    ids, probs = topk_topp_probs(
        jnp.asarray(logits), jnp.asarray(ring),
        repeat_penalty=2.0, top_k=4, top_p=1.0, temp=1.0,
    )
    ids = np.asarray(ids)
    # expected scaled: [2/2, -2*2, 1, .5] = [1, -4, 1, .5] -> order 0,2,3,1
    np.testing.assert_array_equal(ids, [0, 2, 3, 1])


def test_draw_distribution_matches_host():
    """Empirical draw frequencies (threefry inverse-CDF) match the host
    probabilities."""
    logits = jnp.asarray(np.array([1.0, 0.5, 0.0, -1.0, -3.0] + [-9.0] * 27,
                                  dtype=np.float32))
    ring = jnp.zeros((4,), jnp.int32)
    scfg = SamplingConfig(top_k=8, top_p=0.95, temp=0.8, repeat_penalty=1.0,
                          repeat_last_n=0)
    keys = jax.random.split(jax.random.key(0), 4000)
    toks = jax.vmap(lambda k: sample_token(logits, ring, k, scfg))(keys)
    counts = np.bincount(np.asarray(toks), minlength=32) / 4000.0
    _, order, probs = sample_top_p_top_k(
        np.asarray(logits), [], rng=np.random.default_rng(0),
        repeat_penalty=1.0, top_k=8, top_p=0.95, temp=0.8, return_probs=True,
    )
    full = np.zeros(32)
    full[order] = probs
    np.testing.assert_allclose(counts, full, atol=0.03)


def test_sampled_decode_loop_matches_host_greedy(tiny_cfg, tiny_tensors):
    """With top_k=1 the pipeline is deterministic: the device loop must
    reproduce the host sampler's token sequence exactly, including the
    repetition penalty feedback through the ring."""
    cfg = ModelConfig.tiny(n_ctx=64)
    params = model_lib.params_from_tensors(tiny_tensors, cfg, param_dtype=jnp.float32)
    prompt = [1, 7, 19]
    scfg = SamplingConfig(top_k=1, temp=0.8, repeat_penalty=1.3, seed=0)

    # host path
    from llama_swift_tpu.runtime.sampler import SamplerState

    cache = model_lib.init_cache(cfg)
    padded, length = model_lib.pad_tokens(prompt, 8)
    logits_all, cache = model_lib.prefill(params, jnp.asarray(padded), jnp.int32(0), cache, cfg)
    st = SamplerState(scfg)
    for t in prompt:
        st.observe(t)
    host_toks = []
    logits = np.asarray(logits_all[length - 1])
    n_past = length
    for _ in range(10):
        tid = st.sample(logits)
        host_toks.append(tid)
        sl, cache = model_lib.decode_step(
            params, jnp.asarray(tid, jnp.int32), jnp.int32(n_past), cache, cfg
        )
        logits = np.asarray(sl)
        n_past += 1

    # device path, two chunks of different dynamic sizes through ONE program
    cache2 = model_lib.init_cache(cfg)
    _, cache2 = model_lib.prefill(params, jnp.asarray(padded), jnp.int32(0), cache2, cfg)
    ring, pos = init_ring(prompt, scfg.repeat_last_n)
    key = jax.random.key(0)
    dev_toks = []
    last = jnp.asarray(prompt[-1], jnp.int32)
    np_ = length - 1
    for steps in (6, 4):
        toks, cache2, ring, pos, key = sampled_decode_loop(
            params, last, jnp.int32(np_), cache2, ring, pos, key,
            jnp.int32(steps), cfg, dataclasses.replace(scfg, seed=None), 6,
        )
        out = np.asarray(toks)[:steps]
        dev_toks += [int(t) for t in out]
        last = jnp.asarray(int(out[-1]), jnp.int32)
        np_ += steps
    assert dev_toks == host_toks


def test_sampled_decode_loop_compiles_once_across_chunks(tiny_cfg, tiny_tensors):
    """Chunk 2 must reuse chunk 1's compiled program.  Regression: init_ring
    used to return ``pos`` as a python int (weak-typed), so the strong int32
    the loop returns changed the signature and the SECOND serving chunk
    silently recompiled the whole decode loop (~13 s on the real chip)."""
    cfg = ModelConfig.tiny(n_ctx=64)
    params = model_lib.params_from_tensors(tiny_tensors, cfg, param_dtype=jnp.float32)
    cache = model_lib.init_cache(cfg)
    ring, pos = init_ring([1, 7], 64)
    key = jax.random.key(0)
    scfg = SamplingConfig(top_k=1, seed=None)
    last = jnp.asarray(7, jnp.int32)
    before = sampled_decode_loop._cache_size()
    np_ = 1
    for _ in range(2):
        toks, cache, ring, pos, key = sampled_decode_loop(
            params, last, jnp.int32(np_), cache, ring, pos, key,
            jnp.int32(4), cfg, scfg, 4,
        )
        last = jnp.asarray(int(np.asarray(toks)[-1]), jnp.int32)
        np_ += 4
    assert sampled_decode_loop._cache_size() == before + 1


def test_runner_device_sampling_matches_host_greedy(tiny_cfg, tiny_tensors, tiny_vocab_pieces):
    from llama_swift_tpu.runtime.events import EventKind
    from llama_swift_tpu.runtime.runner import LlamaRunner
    from llama_swift_tpu.tokenizer import Vocab

    cfg = ModelConfig.tiny(n_ctx=64)
    params = model_lib.params_from_tensors(tiny_tensors, cfg, param_dtype=jnp.float32)
    vocab = Vocab(tiny_vocab_pieces)

    class _FakeRunner(LlamaRunner):
        def ensure_loaded(self):
            self.config, self.vocab, self.params = cfg, vocab, params
            self._loaded = True

    outs = {}
    for name, dev in [("host", False), ("device", True)]:
        r = _FakeRunner("unused", n_ctx=cfg.n_ctx, prefill_bucket=8)
        events = r.run_events(
            "the rain",
            RunnerConfig(
                num_tokens=9,
                sampling=SamplingConfig(seed=3, top_k=1),
                device_sampling=dev,
                device_chunk=4,
            ),
        )
        outs[name] = [e.token for e in events if e.kind == EventKind.OUTPUT_TOKEN]
    assert outs["host"] == outs["device"]
