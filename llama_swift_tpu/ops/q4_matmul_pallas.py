"""Fused Q4_0 dequant+matmul Pallas kernel — the TPU replacement for
``ggml_vec_dot_q4_0`` + the mul_mat executor (``Sources/cpp/ggml.c:1296-1582,
5987-6285``).

Decode is weight-bandwidth-bound: every token streams the packed weight
bytes from HBM once (SURVEY.md §3.2 "where time goes").  The kernel therefore
reads the *packed* nibble array (0.5 B/weight) + f32 block scales
(0.125 B/weight) — 5 bits/weight, identical storage to the reference — and
dequantizes in VMEM right before the MXU dot.  Packed bytes are read exactly
once; no dense f16/f32 weight copy ever exists in HBM.

Layout trick: GGML packs elements (2j, 2j+1) into byte j (low/high nibble).
Instead of interleaving nibbles back (an awkward lane shuffle), we split the
*activations* into even/odd columns once per step (cheap XLA slice on a
[N, in] array) and compute

    y = x_even @ (deq_lo)ᵀ + x_odd @ (deq_hi)ᵀ

where ``deq_lo[o, j] = (qs[o, j] & 15  - 8) * d[o, j//16]`` covers the even
elements and ``deq_hi`` the odd — each packed byte contributes to both
partial products but is loaded once.

Grid: (out_tiles,) with the full contraction dim resident in VMEM (decode
matvecs: in/2 ≤ 11008 bytes/row ⇒ a 256-row tile is ≤ 2.8 MB even for 65B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import QK
from ..formats.quant import Q4_0Tensor

# nibbles per scale block along the packed (half-width) axis
PACKED_PER_BLOCK = QK // 2  # 16


def _q4_0_matvec_kernel(x_even_ref, x_odd_ref, qs_ref, scales_ref, out_ref):
    """One out-tile: dequantize [TO, Kh] packed bytes, two MXU dots."""
    qs = qs_ref[:].astype(jnp.int32)
    lo = (qs & 15) - 8
    hi = (qs >> 4) - 8
    # elementwise-repeat scales x16 along the packed axis:
    # [TO, nb] -> [TO, nb*16]
    scales = pltpu.repeat(
        scales_ref[:].reshape(scales_ref.shape[0], scales_ref.shape[1], 1),
        PACKED_PER_BLOCK,
        axis=2,
    ).reshape(qs_ref.shape)
    deq_lo = lo.astype(jnp.float32) * scales
    deq_hi = hi.astype(jnp.float32) * scales
    acc = jax.lax.dot_general(
        x_even_ref[:], deq_lo,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += jax.lax.dot_general(
        x_odd_ref[:], deq_hi,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = acc


def _pick_out_tile(out_dim: int, kh: int) -> int:
    """Out-tile sized so qs tile (~TO*kh bytes) stays well under VMEM."""
    budget = 4 * 1024 * 1024  # ~4MB for the packed tile
    to = max(128, min(1024, budget // max(kh, 1) // 128 * 128))
    while out_dim % to:
        to //= 2
        if to < 128:
            return 0
    return to


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_matmul_call(x_even, x_odd, qs, scales, *, interpret=False):
    n = x_even.shape[0]
    out_dim, kh = qs.shape
    nb = scales.shape[1]
    to = _pick_out_tile(out_dim, kh)
    assert to, (out_dim, kh)
    grid = (out_dim // to,)
    return pl.pallas_call(
        _q4_0_matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, kh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, kh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, kh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, nb), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, to), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * out_dim * kh,
            bytes_accessed=out_dim * kh + out_dim * nb * 4 + 2 * n * kh * 4
            + n * out_dim * 4,
            transcendentals=0,
        ),
    )(x_even, x_odd, qs, scales)


def q4_0_matmul_pallas(
    x: jnp.ndarray, w: Q4_0Tensor, *, compute_dtype=jnp.float32, interpret=False
) -> jnp.ndarray:
    """``y[..., out] = x[..., in] @ deq(W)[out, in].T`` via the fused kernel.

    Activations should already be fake-quantized by the caller when parity
    with the reference's int4×int4 dot is wanted (``ops/quantized_matmul.py``).
    Falls back to the jnp dequant path for shapes the kernel can't tile.
    """
    from .quantized_matmul import dequantize_q4_0_jnp  # cycle-free at runtime

    qs = jnp.asarray(w.qs)
    scales = jnp.asarray(w.scales)
    out_dim, kh = qs.shape
    lead = x.shape[:-1]
    n_rows = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(n_rows, x.shape[-1]).astype(jnp.float32)

    # tiling preconditions: lanes are 128-wide; sublane (row) dim padded to 8
    if kh % 128 or out_dim % 128 or scales.shape[1] % 8:
        wd = dequantize_q4_0_jnp(w, dtype=compute_dtype)
        y = jnp.dot(x2, wd.T, preferred_element_type=jnp.float32)
        return y.reshape(*lead, out_dim).astype(compute_dtype)

    n_pad = max(8, ((n_rows + 7) // 8) * 8)
    if n_pad != n_rows:
        x2 = jnp.pad(x2, ((0, n_pad - n_rows), (0, 0)))
    x_even = x2[:, 0::2]
    x_odd = x2[:, 1::2]
    y = _q4_0_matmul_call(x_even, x_odd, qs, scales, interpret=interpret)
    y = y[:n_rows]
    return y.reshape(*lead, out_dim).astype(compute_dtype)
