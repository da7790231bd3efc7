"""Fused Q4_0 dequant+matmul Pallas kernel — the TPU replacement for
``ggml_vec_dot_q4_0`` + the pthread mul_mat executor
(``Sources/cpp/ggml.c:1296-1582, 5987-6285``).

Decode is weight-bandwidth-bound: every token streams the packed weight bytes
from HBM once (SURVEY.md §3.2 "where time goes").  The kernel reads the
*packed* nibble array (0.5 B/weight) + f32 block scales (0.125 B/weight) —
5 bits/weight, identical storage to the reference — and dequantizes in VMEM
right before the MXU dot.  No dense f16/f32 weight copy ever exists in HBM.

Two layout tricks make this Mosaic-friendly:

1. **Even/odd activation split.**  GGML packs elements (2j, 2j+1) into byte j
   (low/high nibble).  Instead of re-interleaving nibbles (an unsupported
   lane shuffle), split the *activations* into even/odd columns once per step
   (cheap XLA slice) and compute
   ``y = x_even @ deq_lo + x_odd @ deq_hi`` — each packed byte is loaded once
   and feeds both partial products.

2. **Transposed (contraction-major) device layout.**  The per-block scales
   must be broadcast ×16 along the packed axis.  Lane-axis expansion does not
   lower on Mosaic, sublane-axis expansion does — so device arrays are stored
   transposed: ``qs_t [in/2, out]``, ``scales_t [in/32, out]``; the ×16
   expansion becomes ``reshape(nb,1,out) → broadcast(nb,16,out) →
   reshape(kh,out)``, all on non-minor axes (verified to compile on v5e).

Grid: (out_tiles,) with the full contraction dim resident in VMEM — for
decode matvecs even 65B shapes fit (qs tile [11008, 256] ≈ 2.8 MB).
Dots use ``Precision.HIGHEST`` (f32-accurate) — decode has FLOPs to burn;
the bandwidth roofline is the binding constraint.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import QK
from ..formats.quant import Q4_0Tensor

PACKED_PER_BLOCK = QK // 2  # nibble-bytes per 32-element scale block


@dataclasses.dataclass
class Q4_0TensorT:
    """Q4_0 weight in transposed (contraction-major) device layout.

    Logical weight is [out, in] (same as :class:`Q4_0Tensor`); stored as
    ``qs_t`` uint8 [in/2, out] and ``scales_t`` f32 [in/32, out].
    """

    scales_t: jnp.ndarray
    qs_t: jnp.ndarray

    @property
    def shape(self) -> tuple[int, int]:
        return (self.qs_t.shape[1], self.qs_t.shape[0] * 2)

    @classmethod
    def from_q4_0(cls, w: Q4_0Tensor) -> "Q4_0TensorT":
        scales = np.ascontiguousarray(np.asarray(w.scales).T)
        qs = np.ascontiguousarray(np.asarray(w.qs).T)
        return cls(scales_t=scales, qs_t=qs)

    def to_q4_0(self) -> Q4_0Tensor:
        return Q4_0Tensor(
            scales=np.ascontiguousarray(np.asarray(self.scales_t).T),
            qs=np.ascontiguousarray(np.asarray(self.qs_t).T),
        )


jax.tree_util.register_pytree_node(
    Q4_0TensorT,
    lambda t: ((t.scales_t, t.qs_t), None),
    lambda _, leaves: Q4_0TensorT(*leaves),
)


def dequantize_q4_0t_jnp(w: Q4_0TensorT, dtype=jnp.float32) -> jnp.ndarray:
    """Dense [out, in] from the transposed layout (jnp fallback path)."""
    qs = jnp.asarray(w.qs_t).astype(jnp.int32)  # [kh, out]
    lo = ((qs & 15) - 8).astype(jnp.float32)
    hi = ((qs >> 4) - 8).astype(jnp.float32)
    scales = jnp.asarray(w.scales_t).astype(jnp.float32)  # [nb, out]
    s = jnp.repeat(scales, PACKED_PER_BLOCK, axis=0)  # [kh, out]
    kh, out = qs.shape
    # w_t[j, o] gives elements 2j (lo) / 2j+1 (hi) of row o
    wt = jnp.stack([lo * s, hi * s], axis=1).reshape(kh * 2, out)
    return wt.T.astype(dtype)


def _q4_0_matvec_kernel(x_even_ref, x_odd_ref, qs_ref, scales_ref, out_ref):
    """One (out-tile, k-tile) step: dequantize [KT, TO] packed bytes in VMEM,
    two MXU dots, accumulate into the out tile across k steps."""
    kt, to = qs_ref.shape
    nbt = scales_ref.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    s = jnp.broadcast_to(
        scales_ref[:].reshape(nbt, 1, to), (nbt, PACKED_PER_BLOCK, to)
    ).reshape(kt, to)
    acc = jnp.dot(
        x_even_ref[:], ((qs & 15) - 8).astype(jnp.float32) * s,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    acc += jnp.dot(
        x_odd_ref[:], ((qs >> 4) - 8).astype(jnp.float32) * s,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] += acc


def _largest_aligned_divisor(dim: int, cap: int, align: int) -> int:
    """Largest divisor of ``dim`` that is a multiple of ``align`` and ≤ cap."""
    best = 0
    t = align
    while t <= min(dim, cap):
        if dim % t == 0:
            best = t
        t += align
    return best


def _pick_tiles(out_dim: int, kh: int) -> tuple[int, int]:
    """(TO, KT) such that the f32 dequant temporaries (~13 B per packed
    byte across qs/int32/f32/s buffers) stay well inside the 16 MB VMEM."""
    kt = _largest_aligned_divisor(kh, 2048, 128)
    if not kt:
        return 0, 0
    budget = 6 * 1024 * 1024 // 13  # packed bytes per (TO×KT) tile
    to_cap = max(128, budget // kt // 128 * 128)
    to = _largest_aligned_divisor(out_dim, min(to_cap, 512), 128)
    return (to, kt) if to else (0, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_matmul_call(x_even, x_odd, qs_t, scales_t, *, interpret=False):
    n = x_even.shape[0]
    kh, out_dim = qs_t.shape
    nb = scales_t.shape[0]
    to, kt = _pick_tiles(out_dim, kh)
    assert to and kt, (out_dim, kh)
    nbt = kt // PACKED_PER_BLOCK
    grid = (out_dim // to, kh // kt)  # k innermost: out tile revisited across k
    return pl.pallas_call(
        _q4_0_matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, kt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, kt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, to), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nbt, to), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, to), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * out_dim * kh,
            bytes_accessed=out_dim * kh + out_dim * nb * 4
            + 2 * n * kh * 4 + n * out_dim * 4,
            transcendentals=0,
        ),
    )(x_even, x_odd, qs_t, scales_t)


#: N (activation rows) above which the jnp dense-dequant path wins (prefill
#: is compute-bound; the matvec kernel keeps all of x in VMEM which stops
#: paying off for long prompts).
MAX_KERNEL_ROWS = 64


def q4_0_matmul_pallas(
    x: jnp.ndarray, w: Q4_0TensorT, *, compute_dtype=jnp.float32, interpret=False
) -> jnp.ndarray:
    """``y[..., out] = x[..., in] @ deq(W)[out, in].T`` via the fused kernel.

    The caller fake-quantizes activations first when reference int4×int4
    parity is wanted (``ops/quantized_matmul.py``).  Falls back to the jnp
    dequant path for shapes the kernel can't tile.
    """
    qs_t = jnp.asarray(w.qs_t)
    scales_t = jnp.asarray(w.scales_t)
    kh, out_dim = qs_t.shape
    nb = scales_t.shape[0]
    lead = x.shape[:-1]
    n_rows = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(n_rows, x.shape[-1]).astype(jnp.float32)

    # tiling preconditions: tiles must exist (128-aligned divisors) and the
    # row count small enough that x stays VMEM-resident
    to, kt = _pick_tiles(out_dim, kh)
    usable = bool(to) and nb % 8 == 0 and n_rows <= MAX_KERNEL_ROWS
    if not usable:
        wd = dequantize_q4_0t_jnp(w, dtype=compute_dtype)
        y = jnp.dot(
            x2, wd.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return y.reshape(*lead, out_dim).astype(compute_dtype)

    n_pad = max(8, ((n_rows + 7) // 8) * 8)
    if n_pad != n_rows:
        x2 = jnp.pad(x2, ((0, n_pad - n_rows), (0, 0)))
    x_even = x2[:, 0::2]
    x_odd = x2[:, 1::2]
    y = _q4_0_matmul_call(x_even, x_odd, qs_t, scales_t, interpret=interpret)
    y = y[:n_rows]
    return y.reshape(*lead, out_dim).astype(compute_dtype)
