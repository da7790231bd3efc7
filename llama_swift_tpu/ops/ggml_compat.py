"""ggml op-set compatibility layer: the reference's 34 graph ops
(``Sources/cpp/ggml.h:212-253``, builders ``ggml.c:3011-4188``) as jnp
functions with matching semantics.

The TPU framework's model code uses idiomatic jnp directly; this module
exists for capability parity (every op a ggml user could call has an
equivalent) and for porting ggml-built graphs.  ggml is a lazy graph builder
— here each function is eager/traceable jnp, and `jax.jit` is the graph
compiler (``ggml_build_forward_expand`` + ``ggml_graph_compute`` have no
analogue: wrap your composition in ``jax.jit``).

Axis convention: ggml ``ne[4]`` lists dims fastest-first; numpy/jnp shapes
are the reverse.  2-D ggml tensors ``ne=(in, out)`` are jnp ``[out, in]``.
``mul_mat(a, b) = b @ a.T`` (``ggml.c:3623-3646``: result[i,j] = dot of row i
of a with row j of b).

Autodiff: the reference's backward pass is half-implemented and aborts on
gelu/silu/norm/mul_mat/rope (``ggml.c:8702-8804`` GGML_ASSERT TODOs); every
op here is differentiable via ``jax.grad`` — strictly more capable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .norms import ggml_norm as _ggml_norm
from .rope import rope as _rope_insert

# ---------------------------------------------------------------------------
# elementwise / unary (forward kernels ggml.c:4190-5326)
# ---------------------------------------------------------------------------

dup = lambda a: jnp.array(a)
add = jnp.add
sub = jnp.subtract
mul = jnp.multiply
div = jnp.divide
sqr = lambda a: a * a
sqrt = jnp.sqrt
abs = jnp.abs  # noqa: A001 - mirrors ggml_abs
sgn = jnp.sign
neg = jnp.negative


def step(a):
    """ggml_step: x > 0 ? 1 : 0 (``ggml.c:4920-4971``)."""
    return (a > 0).astype(a.dtype)


relu = jax.nn.relu


def gelu(a):
    """ggml's gelu is the tanh approximation evaluated through a 64K fp16
    LUT (``ggml.c:1915-1945``); we use the exact tanh form (Δ ≤ fp16 LUT
    quantization, see SURVEY.md §7 #5)."""
    return jax.nn.gelu(a, approximate=True)


def silu(a):
    return jax.nn.silu(a)


# ---------------------------------------------------------------------------
# reductions / shape ops
# ---------------------------------------------------------------------------


def sum(a):  # noqa: A001
    """ggml_sum returns a 1-element tensor (``ggml.c:3377``)."""
    return jnp.sum(a).reshape(1)


def mean(a):
    """ggml_mean: mean over the fastest dim, per row (``ggml.c:3397``)."""
    return jnp.mean(a, axis=-1, keepdims=True)


def repeat(a, b):
    """ggml_repeat(a, like=b): tile a up to b's shape (``ggml.c:3268``);
    used to broadcast 1-D norm weights over rows."""
    return jnp.broadcast_to(a, jnp.shape(b))


def norm(a, eps: float = 1e-5):
    """ggml_norm WITHOUT the weight multiply (the graph multiplies
    separately, ``LlamaPredictOperation.mm:571-575``)."""
    return _ggml_norm(a, jnp.ones(a.shape[-1], a.dtype), eps)


def mul_mat(a, b):
    """result = b @ a.T — ggml's row-dot convention (``ggml.c:3623-3646``)."""
    return jnp.matmul(b, jnp.swapaxes(a, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def scale(a, s):
    return a * s


def cpy(a, _like=None):
    return jnp.array(a)


def reshape(a, shape):
    return jnp.reshape(a, shape)


reshape_2d = reshape_3d = reshape


def view(a, shape, offset_elems: int = 0):
    """ggml_view_1d/2d over a contiguous buffer (``ggml.c:3740-3800``)."""
    flat = jnp.ravel(a)
    import numpy as _np

    n = int(_np.prod(shape))
    return jax.lax.dynamic_slice(flat, (offset_elems,), (n,)).reshape(shape)


def permute(a, *axes):
    """ggml_permute takes ggml-axis order; for jnp arrays use transpose axes
    directly."""
    return jnp.transpose(a, axes) if axes else jnp.transpose(a)


transpose = jnp.transpose


def get_rows(a, ids):
    """Row gather, dequantizing when a is packed (``ggml.c:6760-6920``)."""
    from .quantized_matmul import embedding_lookup

    return embedding_lookup(jnp.asarray(ids, jnp.int32), a)


def diag_mask_inf(a, n_past: int):
    """Mask entries above the shifted diagonal with -inf
    (``ggml.c:6921-6981``): for a [..., N, M] score tensor, entry (i, j) with
    j > n_past + i becomes -inf."""
    N, M = a.shape[-2], a.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1)
    return jnp.where(j > n_past + i, -jnp.inf, a)


def soft_max(a):
    """Max-subtracted softmax over the fastest dim; -inf → 0
    (``ggml.c:6982-7050``; exact exp instead of the fp16 LUT)."""
    m = jnp.max(jnp.where(jnp.isfinite(a), a, -jnp.inf), axis=-1, keepdims=True)
    e = jnp.where(jnp.isfinite(a), jnp.exp(a - m), 0.0)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def rope(a, n_past: int, n_dims: int, mode: int):
    """Adjacent-pair rotary embedding (``ggml.c:7076-7131``).

    a: [N, H, D] (positions on the leading axis, matching the ggml 3-D
    layout ne=(D, H, N)).  mode 0: all N positions rotated with
    p = n_past + i.  mode 1: only positions i >= n_past are rotated
    (p = i), the rest pass through unchanged — the in-place cache-view
    behavior (see ops/rope.py docstring).
    """
    N = a.shape[0]
    if mode == 0:
        pos = n_past + jnp.arange(N, dtype=jnp.int32)
        return _rope_insert(a, pos, n_dims)
    pos = jnp.arange(N, dtype=jnp.int32)
    rotated = _rope_insert(a, pos, n_dims)
    keep = (jnp.arange(N) < n_past).reshape(N, 1, 1)
    return jnp.where(keep, a, rotated)


def conv_1d_1s(a, b):
    """Stride-1 'same' 1-D convolution (whisper leftover, ``ggml.c:4060``).
    a: kernels [OC, IC, K], b: signal [IC, T] → [OC... ggml returns (T, OC)
    jnp [OC, T]."""
    out = jax.lax.conv_general_dilated(
        b[None], a.transpose(2, 1, 0),
        window_strides=(1,), padding="SAME",
        dimension_numbers=("NCT", "TIO", "NCT"),
    )
    return out[0]


def conv_1d_2s(a, b):
    """Stride-2 variant (``ggml.c:4088``)."""
    out = jax.lax.conv_general_dilated(
        b[None], a.transpose(2, 1, 0),
        window_strides=(2,), padding="SAME",
        dimension_numbers=("NCT", "TIO", "NCT"),
    )
    return out[0]


def flash_attn(q, k, v, masked: bool):
    """Fused attention (``ggml.c:7753-8237`` — implemented there but unused
    by the llama path).  q,k,v: [N|M, H, D] position-major; returns [N, H, D].
    """
    import numpy as _np

    N, H, D = q.shape
    M = k.shape[0]
    scores = jnp.einsum("nhd,mhd->hnm", q, k,
                        precision=jax.lax.Precision.HIGHEST) / _np.sqrt(D)
    if masked:
        scores = diag_mask_inf(scores, M - N)
    p = soft_max(scores)
    return jnp.einsum("hnm,mhd->nhd", p, v,
                      precision=jax.lax.Precision.HIGHEST)


def flash_ff(x, w1, b1, w2, b2):
    """Fused feed-forward with gelu (``ggml.c:8238-8448``)."""
    h = gelu(mul_mat(w1, x) + b1)
    return mul_mat(w2, h) + b2


def set_param(x):
    """ggml_set_param marks a tensor trainable (``ggml.c:4179-4188``);
    with jax, differentiation is positional — identity."""
    return x
