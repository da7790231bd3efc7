"""Perplexity evaluation harness.

The reference has no evaluation tooling at all (SURVEY.md §4); the BASELINE
target ("Δppl vs llama.cpp Q4_0 ≤0.01 on WikiText-2") needs one.  Protocol
matches llama.cpp's classic ``perplexity`` tool so numbers are comparable:

* tokenize the whole corpus (BOS prepended per chunk);
* split into non-overlapping windows of ``n_ctx`` tokens;
* one full-logits forward per window; NLL of tokens in the second half of
  each window (positions n_ctx/2 .. n_ctx-1), conditioned on the first half —
  llama.cpp evaluates ppl over the last half to give every scored token at
  least n_ctx/2 context;
* ppl = exp(mean NLL).
"""

from __future__ import annotations

import functools
import math
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import llama as model_lib
from ..tokenizer import BOS_TOKEN_ID, Vocab


def log_softmax_row(logits: np.ndarray, target: int) -> float:
    m = float(np.max(logits))
    lse = m + math.log(float(np.sum(np.exp(logits - m))))
    return float(logits[target]) - lse


@functools.partial(jax.jit, static_argnames=("first_scored",))
def _window_nll(logits, targets, first_scored: int):
    """Σ −log p(target) over positions [first_scored-1, n-1) — ONE device
    dispatch per window (the r4 version looped log-softmax over 32k-float
    rows on the host: minutes of pure host math at real-corpus scale)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    span = lp[first_scored - 1 :]
    picked = jnp.take_along_axis(
        span, targets[first_scored - 1 :, None], axis=-1
    )[:, 0]
    return -jnp.sum(picked.astype(jnp.float64))


def perplexity(
    params,
    cfg: ModelConfig,
    token_ids: np.ndarray,
    *,
    stride: Optional[int] = None,
    progress=None,
) -> dict:
    """Compute perplexity over ``token_ids`` with non-overlapping n_ctx
    windows, scoring the second half of each window.

    Returns {"ppl", "nll", "n_scored"}.
    """
    n_ctx = cfg.n_ctx
    first_scored = n_ctx // 2
    ids = np.asarray(token_ids, dtype=np.int32)
    n_windows = len(ids) // n_ctx
    if n_windows == 0:
        raise ValueError(f"need at least n_ctx={n_ctx} tokens, got {len(ids)}")

    total_nll = 0.0
    n_scored = 0
    for w in range(n_windows):
        chunk = ids[w * n_ctx : (w + 1) * n_ctx].copy()
        chunk[0] = BOS_TOKEN_ID  # each window starts from BOS, llama.cpp-style
        cache = model_lib.init_cache(cfg)
        logits, _ = model_lib.prefill(
            params, jnp.asarray(chunk), jnp.int32(0), cache, cfg
        )
        # logits[i] predicts chunk[i+1]: score on device in one dispatch
        targets = jnp.asarray(np.roll(chunk, -1).astype(np.int32))
        total_nll += float(
            _window_nll(logits[: n_ctx - 1], targets[: n_ctx - 1], first_scored)
        )
        n_scored += n_ctx - first_scored
        if progress:
            progress(w + 1, n_windows, math.exp(total_nll / max(n_scored, 1)))

    return {
        "ppl": math.exp(total_nll / n_scored),
        "nll": total_nll / n_scored,
        "n_scored": n_scored,
    }


def perplexity_of_text(params, cfg: ModelConfig, vocab: Vocab, text: str, **kw) -> dict:
    ids = vocab.tokenize(text, bos=False)
    return perplexity(params, cfg, np.asarray(ids, dtype=np.int32), **kw)
