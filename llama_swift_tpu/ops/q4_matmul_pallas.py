"""Fused Q4_0 dequant+matmul Pallas kernel — the TPU replacement for
``ggml_vec_dot_q4_0`` + the pthread mul_mat executor
(``Sources/cpp/ggml.c:1296-1582, 5987-6285``).

Decode is weight-bandwidth-bound: every token streams the packed weight bytes
from HBM once (SURVEY.md §3.2 "where time goes").  The kernel reads the
*packed* nibble array (0.5 B/weight) + f32 block scales (0.125 B/weight) —
5 bits/weight, identical storage to the reference — and dequantizes in VMEM
right before the MXU dot.  No dense f16/f32 weight copy ever exists in HBM.

Three layout decisions make this fast and Mosaic-friendly:

1. **Even/odd activation split.**  GGML packs elements (2j, 2j+1) into byte
   j (low/high nibble).  Instead of re-interleaving nibbles (an unsupported
   lane shuffle), split the *activations* into even/odd columns once per
   step (cheap XLA slice) and compute ``y = x_even @ deq_lo + x_odd @
   deq_hi`` — each packed byte is loaded once and feeds both partial
   products.

2. **Contraction-major tiles.**  The per-block scales must be broadcast ×16
   along the packed axis.  Lane-axis expansion does not lower on Mosaic,
   sublane-axis expansion does — so inside a tile the packed axis (kh) runs
   on sublanes and the out axis on lanes: tile [KT, TO], scales [KT/16, TO],
   expansion = reshape(nbt,1,TO) → broadcast(nbt,16,TO) → reshape (verified
   compiling on v5e).

3. **Pre-tiled physical layout.**  A plain [kh, out] array makes every
   (k, j) grid block a column slice — thousands of 128-byte strided HBM
   reads, which caps bandwidth at ~15% of peak (measured).  The device
   arrays are therefore stored pre-tiled as ``[out/TO, kh, TO]`` so every
   grid block is one contiguous HBM range, streamed in ascending address
   order (k innermost).

Grid: (n_tiles, out_tiles, k_tiles) with accumulation over k — covers both
decode matvecs and prefill batches.  Dots use ``Precision.HIGHEST``
(f32-accurate): decode has FLOPs to spare, bandwidth is the binding
constraint.
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
LANE_TILE = 128  # out-axis tile width (TO); fixed by the physical layout


@dataclasses.dataclass
class Q4_0TensorT:
    """Q4_0 weight in the pre-tiled, contraction-major device layout.

    Logical weight is [out, in] (as :class:`Q4_0Tensor`); stored as
    ``qs_t`` uint8 [out/128, in/2, 128] and ``scales_t`` f32
    [out/128, in/32, 128] — each (out-tile, k-range) block contiguous in
    HBM (see module docstring, layout decision 3).
    """

    scales_t: jnp.ndarray
    qs_t: jnp.ndarray

    @property
    def shape(self) -> tuple[int, int]:
        return (self.qs_t.shape[0] * LANE_TILE, self.qs_t.shape[1] * 2)

    @classmethod
    def from_q4_0(cls, w: Q4_0Tensor) -> "Q4_0TensorT":
        qs = np.asarray(w.qs)  # [out, kh]
        scales = np.asarray(w.scales)  # [out, nb]
        out, kh = qs.shape
        assert out % LANE_TILE == 0, f"out dim {out} not a multiple of {LANE_TILE}"
        ot = out // LANE_TILE

        def tile(a):
            # [out, X] -> [ot, X, LANE_TILE]
            return np.ascontiguousarray(
                a.reshape(ot, LANE_TILE, a.shape[1]).transpose(0, 2, 1)
            )

        return cls(scales_t=tile(scales), qs_t=tile(qs))

    def to_q4_0(self) -> Q4_0Tensor:
        def untile(a):
            a = np.asarray(a)
            ot, x, lt = a.shape
            return np.ascontiguousarray(a.transpose(0, 2, 1).reshape(ot * lt, x))

        return Q4_0Tensor(scales=untile(self.scales_t), qs=untile(self.qs_t))


jax.tree_util.register_pytree_node(
    Q4_0TensorT,
    lambda t: ((t.scales_t, t.qs_t), None),
    lambda _, leaves: Q4_0TensorT(*leaves),
)


def dequantize_q4_0t_jnp(w: Q4_0TensorT, dtype=jnp.float32) -> jnp.ndarray:
    """Dense [out, in] from the tiled layout (jnp fallback path)."""
    qs = jnp.asarray(w.qs_t).astype(jnp.int32)  # [ot, kh, LT]
    lo = ((qs & 15) - 8).astype(jnp.float32)
    hi = ((qs >> 4) - 8).astype(jnp.float32)
    scales = jnp.asarray(w.scales_t).astype(jnp.float32)  # [ot, nb, LT]
    s = jnp.repeat(scales, PACKED_PER_BLOCK, axis=1)  # [ot, kh, LT]
    ot, kh, lt = qs.shape
    # elements 2j (lo) / 2j+1 (hi) interleave along the in axis
    wt = jnp.stack([lo * s, hi * s], axis=2).reshape(ot, kh * 2, lt)
    return wt.transpose(0, 2, 1).reshape(ot * lt, kh * 2).astype(dtype)


def _q4_0_matmul_kernel(x_even_ref, x_odd_ref, qs_ref, scales_ref, out_ref):
    """One (n, out, k) grid step: dequantize a contiguous [KT, TO] block in
    VMEM, two MXU dots, accumulate across k."""
    kt, to = qs_ref.shape[1], qs_ref.shape[2]
    nbt = scales_ref.shape[1]

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[0].astype(jnp.int32)  # [KT, TO]
    s = jnp.broadcast_to(
        scales_ref[0].reshape(nbt, 1, to), (nbt, PACKED_PER_BLOCK, to)
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


def _pick_kt(kh: int) -> int:
    """Largest 128-multiple divisor of kh ≤ 2048 (f32 dequant temporaries
    ~13 B per packed byte must fit VMEM at TO=128: 2048·128·13 ≈ 3.4 MB)."""
    best = 0
    t = 128
    while t <= min(kh, 2048):
        if kh % t == 0:
            best = t
        t += 128
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_matmul_call(x_even, x_odd, qs_t, scales_t, *, interpret=False):
    n = x_even.shape[0]
    ot, kh, lt = qs_t.shape
    out_dim = ot * lt
    nb = scales_t.shape[1]
    kt = _pick_kt(kh)
    assert kt, kh
    nbt = kt // PACKED_PER_BLOCK
    tn = n if n <= 128 else 128  # caller pads n accordingly
    # k innermost: per out tile, blocks stream k-ascending = contiguous HBM
    grid = (n // tn, ot, kh // kt)
    return pl.pallas_call(
        _q4_0_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, kt), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, kt), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, kt, lt), lambda i, j, k: (j, k, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, nbt, lt), lambda i, j, k: (j, k, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tn, lt), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * out_dim * kh,
            bytes_accessed=out_dim * kh + out_dim * nb * 4
            + 2 * n * kh * 4 + n * out_dim * 4,
            transcendentals=0,
        ),
    )(x_even, x_odd, qs_t, scales_t)


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
    ot, kh, lt = qs_t.shape
    out_dim = ot * lt
    nb = scales_t.shape[1]
    lead = x.shape[:-1]
    n_rows = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(n_rows, x.shape[-1]).astype(jnp.float32)

    usable = bool(_pick_kt(kh)) and nb % 8 == 0
    if not usable:
        wd = dequantize_q4_0t_jnp(w, dtype=compute_dtype)
        y = jnp.dot(
            x2, wd.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return y.reshape(*lead, out_dim).astype(compute_dtype)

    # pad rows to the sublane tile (8) and, beyond 128, to a 128-multiple so
    # the n-tiled grid divides evenly
    unit = 8 if n_rows <= 128 else 128
    n_pad = max(8, ((n_rows + unit - 1) // unit) * unit)
    if n_pad != n_rows:
        x2 = jnp.pad(x2, ((0, n_pad - n_rows), (0, 0)))
    x_even = x2[:, 0::2]
    x_odd = x2[:, 1::2]
    y = _q4_0_matmul_call(x_even, x_odd, qs_t, scales_t, interpret=interpret)
    y = y[:n_rows]
    return y.reshape(*lead, out_dim).astype(compute_dtype)
