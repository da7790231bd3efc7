"""On-device sampling: ``llama_sample_top_p_top_k`` semantics inside jit.

The reference samples on the host between every ``llama_eval``
(``LlamaPredictOperation.mm:851-877`` → ``utils.cpp:333-428``), which on a
TPU serving stack means one device→host round trip per token — the
structural reason the runner path was slower than the on-device benchmark
loop.  This module implements the exact sampling pipeline as jax ops so
``sampled_decode_loop`` can generate N tokens per dispatch:

1. scale logits by 1/temp;
2. CTRL repetition penalty for ids in the last-n ring: scaled value ×penalty
   if the RAW logit < 0 else ÷penalty (``utils.cpp:364-370``);
3. top-k (``jax.lax.top_k`` — ties break to the lower id, same determinism
   choice as the host sampler);
4. softmax with max-subtraction over the k survivors (``:379-398``);
5. top-p: keep indices whose PRECEDING cumulative mass is < top_p (the
   inclusive ``searchsorted(cum, top_p, 'left') + 1`` cut), renormalize
   (``:400-415``);
6. inverse-CDF categorical draw from one uniform (what
   ``std::discrete_distribution`` and ``np.random.Generator.choice`` do).

The RNG is jax's counted threefry (SURVEY.md §7 #6): a third PRNG stream
next to the host sampler's numpy Generator and the native mt19937
(bit-parity) option — distribution parity is tested, stream parity is only
a goal for the mt19937 path.  Arithmetic is f32 on device vs the
reference's double; Δ is covered by the distribution tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import ModelConfig, SamplingConfig


def topk_topp_probs(
    logits: jnp.ndarray,  # [V] f32 raw logits
    ring: jnp.ndarray,  # [R] int32 last-n token ids (id 0 counts — .mm:827)
    *,
    top_k: int,
    top_p: float,
    temp: float,
    repeat_penalty: float,
    penalize: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (ids [k], probs [k]) — the truncated, renormalized categorical
    the reference draws from; probs beyond the top-p cut are exact zeros."""
    v = logits.shape[0]
    logits = logits.astype(jnp.float32)
    # temp/top_p/repeat_penalty may be TRACED scalars (the engine's batched
    # sampler passes them as per-slot arrays under vmap); only top_k is
    # shape-static
    scaled = logits / jnp.asarray(temp, jnp.float32)
    if penalize:
        in_ring = jnp.zeros((v,), bool).at[jnp.clip(ring, 0, v - 1)].set(True)
        rp = jnp.asarray(repeat_penalty, jnp.float32)
        pen = jnp.where(logits < 0.0, scaled * rp, scaled / rp)
        scaled = jnp.where(in_ring, pen, scaled)
    k = min(int(top_k), v)
    vals, ids = jax.lax.top_k(scaled, k)  # ties -> lower id (stable)
    m = vals[0]
    e = jnp.exp(vals - m)
    probs = e / jnp.sum(e)
    # inclusive cut: index j survives iff the mass BEFORE it is < top_p
    cum = jnp.cumsum(probs)
    keep = (cum - probs) < jnp.asarray(top_p, jnp.float32)
    probs = jnp.where(keep, probs, 0.0)
    probs = probs / jnp.sum(probs)
    return ids, probs


def sample_token_dyn(
    logits: jnp.ndarray,  # [V] f32
    ring: jnp.ndarray,  # [R] int32
    key: jax.Array,
    *,
    top_k: int,  # static
    penalize: bool,  # static
    temp,  # traced or python scalars
    top_p,
    repeat_penalty,
) -> jnp.ndarray:
    """Draw one token id (scalar int32) with the reference pipeline;
    temp/top_p/penalty may be traced (per-slot values under vmap)."""
    ids, probs = topk_topp_probs(
        logits, ring,
        top_k=top_k, top_p=top_p, temp=temp,
        repeat_penalty=repeat_penalty, penalize=penalize,
    )
    u = jax.random.uniform(key, (), jnp.float32)
    cum = jnp.cumsum(probs)
    idx = jnp.sum((u * cum[-1] >= cum).astype(jnp.int32))
    idx = jnp.minimum(idx, probs.shape[0] - 1)
    return ids[idx].astype(jnp.int32)


def sample_token(
    logits: jnp.ndarray,  # [V] f32
    ring: jnp.ndarray,  # [R] int32
    key: jax.Array,
    scfg: SamplingConfig,
) -> jnp.ndarray:
    """Draw one token id (scalar int32) with the reference pipeline."""
    return sample_token_dyn(
        logits, ring, key,
        top_k=scfg.top_k, penalize=scfg.repeat_last_n > 0,
        temp=scfg.temp, top_p=scfg.top_p, repeat_penalty=scfg.repeat_penalty,
    )


def init_ring(prompt_ids, repeat_last_n: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Last-n ring after prompt consumption: ``repeat_last_n`` zeros
    (``LlamaPredictOperation.mm:827-829``) with the prompt pushed in order —
    i.e. the trailing ``R`` of ``[0]*R + prompt_ids``.  Returns (ring, pos):
    entries are oldest-first, so the next push overwrites slot ``pos=0``.

    ``pos`` is a strong-typed int32 scalar ON PURPOSE: ``sampled_decode_loop``
    returns a strong int32 for it, so a weak-typed (python int) first call
    would give the second call a different abstract signature and silently
    recompile the whole decode loop — ~13 s burned on the first serving chunk.
    """
    r = max(1, int(repeat_last_n))
    buf = [0] * r + [int(t) for t in prompt_ids]
    return jnp.asarray(buf[-r:], dtype=jnp.int32), jnp.int32(0)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "scfg", "max_steps"),
    donate_argnames=("cache",),
)
def sampled_decode_loop(
    params,
    last_token,  # [] int32: token whose forward produces the next logits
    n_past,  # [] int32: its position
    cache,
    ring,  # [R] int32 (already contains the prompt and last_token history)
    ring_pos,  # [] int32: next ring slot to overwrite (oldest entry)
    key,  # threefry key
    n_steps,  # [] int32 DYNAMIC step count (<= max_steps)
    cfg: ModelConfig,
    scfg: SamplingConfig,
    max_steps: int,
):
    """Generate ``max_steps`` tokens fully on device — forward + exact
    reference sampling per step under ONE ``lax.scan`` (the same structure
    as ``greedy_decode_loop``, which benchmarks at the kernel rate; a
    dynamic-trip ``while_loop`` variant measured ~70× slower at 7B on the
    tunneled backend), zero host round trips.  ``n_steps`` masks the ring
    updates of trailing steps so a final PARTIAL chunk can reuse the same
    compiled program: steps ≥ n_steps still run the forward (their cache
    writes land beyond the consumed window and are overwritten by the next
    real token, the same staleness invariant the prefill padding relies on)
    but do not advance the ring.

    Returns (tokens [max_steps] (entries >= n_steps are garbage — ignore),
    cache, ring, ring_pos, key).
    """
    from ..models import llama as model_lib

    r = ring.shape[0]

    def body(carry, i):
        token, np_, c, ring, pos, key = carry
        logits, c = model_lib.forward(params, token[None], np_, c, cfg)
        key, sub = jax.random.split(key)
        nxt = sample_token(logits[0], ring, sub, scfg)
        live = i < n_steps
        ring = jnp.where(
            live,
            jax.lax.dynamic_update_index_in_dim(ring, nxt, pos, 0),
            ring,
        )
        pos = jnp.where(live, (pos + 1) % r, pos)
        return (nxt, np_ + 1, c, ring, pos, key), nxt

    (token, np_, cache, ring, pos, key), toks = jax.lax.scan(
        body,
        (last_token, n_past, cache, ring,
         jnp.asarray(ring_pos, jnp.int32) % r, key),
        jnp.arange(max_steps, dtype=jnp.int32),
    )
    return toks, cache, ring, pos, key
