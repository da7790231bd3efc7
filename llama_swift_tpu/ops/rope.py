"""Rotary position embedding, adjacent-pair convention.

Matches ``ggml_compute_forward_rope_f32`` (``Sources/cpp/ggml.c:7076-7131``):
pairs are *adjacent* dims ``(2j, 2j+1)`` (not split-half), angle
``theta_j = 10000^(-2j/n_dims)``, rotation ``(x0 cos - x1 sin,
x0 sin + x1 cos)`` at position ``p``.

The reference's graph applies mode-0 rope to Q at positions ``n_past + i``
and mode-1 rope to a *view of the K cache*, which — because ``ggml_rope`` is
in-place (``ggml.c:4044``) and the mode-1 kernel only iterates positions
``i2 ∈ [n_past, n_past+N)`` (``ggml.c:7109-7110``) — rotates exactly the
newly-inserted keys, leaving the already-rotated history untouched.  I.e. the
cache holds POST-rope keys and rope is applied once per key at insert time.
We do the same explicitly: rotate K for the new positions, then store.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope(x: jnp.ndarray, positions: jnp.ndarray, n_dims: int) -> jnp.ndarray:
    """Apply adjacent-pair rotary embedding.

    x: [..., N, H, D] (positions along axis -3), positions: [N] int32,
    n_dims: number of leading head dims to rotate (n_rot; rest pass through —
    the reference always rotates the full head_dim for llama since n_rot is
    recomputed as n_embd/n_head at eval, ``LlamaPredictOperation.mm:528``).
    """
    D = x.shape[-1]
    assert n_dims % 2 == 0 and n_dims <= D
    xr = x[..., :n_dims]
    x0 = xr[..., 0::2].astype(jnp.float32)
    x1 = xr[..., 1::2].astype(jnp.float32)
    # theta for pair j (dims 2j,2j+1): 10000^(-2j/n_dims)   (ggml.c:7113)
    inv_freq = jnp.power(
        jnp.float32(10000.0),
        -jnp.arange(0, n_dims, 2, dtype=jnp.float32) / jnp.float32(n_dims),
    )
    ang = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [N, n_dims/2]
    # broadcast over head axis: [..., N, 1, n_dims/2]
    ang = jnp.expand_dims(ang, axis=-2)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    rot = jnp.stack([r0, r1], axis=-1).reshape(xr.shape).astype(x.dtype)
    if n_dims == D:
        return rot
    return jnp.concatenate([rot, x[..., n_dims:]], axis=-1)
