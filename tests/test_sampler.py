"""Sampler parity tests vs llama_sample_top_p_top_k (utils.cpp:333-428)."""

import numpy as np
import pytest

from llama_swift_tpu.config import SamplingConfig
from llama_swift_tpu.runtime.sampler import SamplerState, greedy, sample_top_p_top_k


def _ref_pipeline(logits, last_n, repeat_penalty, top_k, top_p, temp):
    """Direct transcription of the documented pipeline, returning the final
    (ids, probs) support for distribution-level comparison."""
    n = len(logits)
    scale = 1.0 / temp
    pairs = []
    for i in range(n):
        v = logits[i] * scale
        if i in last_n:
            v = v * repeat_penalty if logits[i] < 0 else v / repeat_penalty
        pairs.append((v, i))
    pairs.sort(key=lambda p: (-p[0], p[1]))
    pairs = pairs[: min(top_k, n)]
    maxl = max(p[0] for p in pairs)
    probs = np.array([np.exp(p[0] - maxl) for p in pairs])
    probs /= probs.sum()
    if top_p < 1.0:
        cum = 0.0
        for i, p in enumerate(probs):
            cum += p
            if cum >= top_p:
                probs = probs[: i + 1] / cum
                pairs = pairs[: i + 1]
                break
    return [p[1] for p in pairs], probs


def test_distribution_matches_reference_pipeline():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal(100).astype(np.float32) * 3
    last_n = [5, 17, 3, 99]
    ids_ref, probs_ref = _ref_pipeline(
        list(map(float, logits)), set(last_n), 1.3, 40, 0.95, 0.8
    )
    _, ids_got, probs_got = sample_top_p_top_k(
        logits, last_n, repeat_penalty=1.3, top_k=40, top_p=0.95, temp=0.8,
        rng=np.random.default_rng(0), return_probs=True,
    )
    assert list(ids_got) == ids_ref
    np.testing.assert_allclose(probs_got, probs_ref, rtol=1e-10)


def test_repeat_penalty_sign_dependent():
    # CTRL penalty: negative logits multiplied, positive divided (utils.cpp:364-370)
    logits = np.array([2.0, -2.0, 0.5], dtype=np.float32)
    ids, probs = _ref_pipeline([2.0, -2.0, 0.5], {0, 1}, 2.0, 3, 1.0, 1.0)
    # token0: 2/2=1; token1: -2*2=-4; token2: 0.5
    assert ids == [0, 2, 1]
    _, got_ids, got_probs = sample_top_p_top_k(
        logits, [0, 1], repeat_penalty=2.0, top_k=3, top_p=1.0, temp=1.0,
        rng=np.random.default_rng(0), return_probs=True,
    )
    assert list(got_ids) == ids
    np.testing.assert_allclose(got_probs, probs, rtol=1e-12)


def test_top_k_truncation():
    logits = np.arange(10, dtype=np.float32)
    _, ids, probs = sample_top_p_top_k(
        logits, [], repeat_penalty=1.0, top_k=3, top_p=1.0, temp=1.0,
        rng=np.random.default_rng(0), return_probs=True,
    )
    assert list(ids) == [9, 8, 7]
    assert len(probs) == 3


def test_top_p_inclusive_cut():
    # probs after top-k softmax: [0.7, 0.2, 0.1]-ish; top_p=0.8 keeps 2
    logits = np.log(np.array([0.7, 0.2, 0.1], dtype=np.float64)).astype(np.float32)
    _, ids, probs = sample_top_p_top_k(
        logits, [], repeat_penalty=1.0, top_k=3, top_p=0.8, temp=1.0,
        rng=np.random.default_rng(0), return_probs=True,
    )
    assert len(ids) == 2
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-9)
    np.testing.assert_allclose(probs[0] / probs[1], 0.7 / 0.2, rtol=1e-6)


def test_temperature_extremes():
    logits = np.array([1.0, 1.1, 0.9], dtype=np.float32)
    # very low temp → near-argmax
    _, ids, probs = sample_top_p_top_k(
        logits, [], repeat_penalty=1.0, top_k=3, top_p=1.0, temp=0.01,
        rng=np.random.default_rng(0), return_probs=True,
    )
    assert ids[0] == 1
    assert probs[0] > 0.999


def test_seeded_determinism():
    cfg = SamplingConfig(seed=42)
    logits = np.random.default_rng(1).standard_normal(50).astype(np.float32)
    s1, s2 = SamplerState(cfg), SamplerState(cfg)
    seq1 = [s1.sample(logits) for _ in range(20)]
    seq2 = [s2.sample(logits) for _ in range(20)]
    assert seq1 == seq2


def test_ring_initialized_with_zeros():
    # token 0 is penalized out of the gate (.mm:827-829)
    cfg = SamplingConfig(seed=0, repeat_last_n=4, top_k=2, top_p=1.0, temp=1.0,
                         repeat_penalty=1000.0)
    s = SamplerState(cfg)
    logits = np.array([10.0, 9.0, 0.0], dtype=np.float32)
    # id 0 has the top raw logit but sits in the zero-initialized ring with a
    # huge penalty → id 1 must win
    assert s.sample(logits) == 1


def test_ring_observes_prompt_tokens():
    cfg = SamplingConfig(seed=0, repeat_last_n=2, top_k=2, top_p=1.0, temp=1.0,
                         repeat_penalty=1000.0)
    s = SamplerState(cfg)
    s.observe(1)
    s.observe(1)  # ring now [1, 1] — zeros flushed
    logits = np.array([0.0, 10.0, 9.0], dtype=np.float32)
    assert s.sample(logits) == 2


def test_greedy():
    assert greedy(np.array([0.0, 3.0, 2.0])) == 1
