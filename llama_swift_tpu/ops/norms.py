"""Normalization ops.

The reference's ``ggml_norm`` is a *mean-centered* LayerNorm-style transform
without bias (eps=1e-5 hardcoded, double-precision accumulation) — NOT
RMSNorm (``Sources/cpp/ggml.c:5327-5385``).  llama.cpp of this vintage used
it for all three norm sites; perplexity parity requires matching it.  RMSNorm
is also provided, selected by ``ModelConfig.norm_type`` (SURVEY.md §7
"numerics decisions" #1).
"""

from __future__ import annotations

import jax.numpy as jnp


def ggml_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Mean-center, scale to unit variance, multiply by weight (no bias).

    Matches ``ggml_compute_forward_norm_f32``: ``y = (x - mean) /
    sqrt(mean((x-mean)^2) + eps)`` then the graph multiplies by the repeated
    norm weight (``LlamaPredictOperation.mm:569-576``).
    Accumulation is f32 (reference uses f64 accumulators over f32 data; the
    difference is inside the parity tolerance budget — SURVEY.md §7 #5).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    y = centered / jnp.sqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm (later llama.cpp / LLaMA paper semantics)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf / jnp.sqrt(ms + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def norm(x: jnp.ndarray, weight: jnp.ndarray, norm_type: str, eps: float = 1e-5):
    if norm_type == "layernorm":
        return ggml_norm(x, weight, eps)
    if norm_type == "rmsnorm":
        return rms_norm(x, weight, eps)
    raise ValueError(f"unknown norm_type {norm_type!r}")
