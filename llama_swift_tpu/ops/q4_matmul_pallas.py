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


# ---------------------------------------------------------------------------
# Integer decode kernel: int8 MXU dots, exact ggml_vec_dot_q4_0 semantics
# ---------------------------------------------------------------------------
#
# The dequant kernel above is VPU-bound: ~6-10 vector ops per weight
# (mask/shift/convert/scale) against a speed-of-light budget of ~3 — it cannot
# reach the HBM roofline.  The decode kernel below restructures the math so
# the nibbles never leave the int8 domain:
#
#   y[o] = Σ_b d_x[b]·d_w[b,o]·Σ_{j∈b} qx[j]·(qw[j,o]-8)
#        = Σ_b d_x[b]·d_w[b,o]·(P[b,o] - 8·S[b]),   P = Σ_{j∈b} qx[j]·qw[j,o]
#
# P for ALL blocks at once is ONE int8×int8 MXU matmul against a
# block-diagonal expansion X' of the quantized activations
# (X'[b,j] = qx[j] iff j ∈ block b, built once per token outside the kernel).
# In-kernel VPU work is just the nibble mask/shift (int8, ~1 op/weight) and
# O(blocks·out) scale math — within the roofline budget.  This is *exactly*
# the reference's int4×int4 dot with f32 block-scale products
# (``ggml.c:1558-1578``), including integer accumulation.


def _q4_0_int_kernel(xe_ref, xo_ref, dxc_ref, c2c_ref, qs_ref, scales_ref, out_ref):
    """One (out, k) step: int8 dots against the block-diagonal activation.

    xe/xo: int8 [N·NBT, KT] (block-diagonal, even/odd planes);
    dxc: f32 [N·NBT, TO-bcast] per-block activation scales;
    c2c: f32 [N·NBT, TO-bcast] correction 8·d_x·(S_e+S_o);
    qs: u8 [1, KT, TO]; scales: f32 [1, NBT, TO]; out: f32 [N, TO].
    """
    kt, to = qs_ref.shape[1], qs_ref.shape[2]
    nbt = scales_ref.shape[1]
    n = out_ref.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # nibble split: Mosaic has no u8 shift (arith.shrui unsupported) — mask
    # and shift in i32, downcast to i8 for the MXU operands
    qs = qs_ref[0].astype(jnp.int32)
    lo = (qs & 15).astype(jnp.int8)
    hi = (qs >> 4).astype(jnp.int8)
    pe = jax.lax.dot_general(
        xe_ref[:], lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    po = jax.lax.dot_general(
        xo_ref[:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # rows are block-major [(b, n)] so a k-range of blocks is contiguous:
    # z[b,n,o] = s[b,o] · (d_x[n,b]·(Pe+Po)[b,n,o] − 8·d_x·S [b,n])
    p = (pe + po).astype(jnp.float32).reshape(nbt, n, to)
    dx = dxc_ref[:].reshape(nbt, n, to)
    c2 = c2c_ref[:].reshape(nbt, n, to)
    contrib = (scales_ref[0][:, None, :] * (dx * p - c2)).sum(axis=0)
    out_ref[:] += contrib


def quantize_activations_q4_0_int(x: jnp.ndarray):
    """Per-32-block Q4_0 activation quantization, integer form.

    x: [N, IN] → (qx int8 [N, IN] in [-7, 7], dx f32 [N, IN/32]).
    Scalar reference semantics (amax/7, round half away — ``ggml.c:568-601``).
    """
    n, in_dim = x.shape
    nb = in_dim // QK
    xb = x.astype(jnp.float32).reshape(n, nb, QK)
    amax = jnp.max(jnp.abs(xb), axis=-1)
    d = amax / 7.0
    inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    q = jnp.trunc(xb * inv[..., None] + jnp.where(xb >= 0, 0.5, -0.5))
    return q.reshape(n, in_dim).astype(jnp.int8), d


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_int_matmul_call(qx, dx, qs_t, scales_t, *, interpret=False):
    """qx int8 [N, IN], dx f32 [N, NB] → y f32 [N, OUT]."""
    n, in_dim = qx.shape
    ot, kh, lt = qs_t.shape
    out_dim = ot * lt
    nb = in_dim // QK
    kt = _pick_kt(kh)
    assert kt, kh
    nbt = kt // PACKED_PER_BLOCK

    # block-diagonal expansion (once per call, reused across all out tiles),
    # block-major rows [(b, n)] so k-tiles slice contiguous block ranges:
    # X'[b, n, j] = qx_plane[n, j] iff j // 16 == b
    j_blocks = jax.lax.broadcasted_iota(jnp.int32, (nb, kh), 1) // PACKED_PER_BLOCK
    b_rows = jax.lax.broadcasted_iota(jnp.int32, (nb, kh), 0)
    diag = (j_blocks == b_rows)[:, None, :]  # [nb, 1, kh]

    def expand(plane):  # [N, kh] int8 -> [nb·N, kh] int8, block-major
        e = jnp.where(diag, plane[None, :, :], jnp.int8(0))
        return e.reshape(nb * n, kh)

    xe = expand(qx[:, 0::2])
    xo = expand(qx[:, 1::2])
    # per-block correction: 8·d_x·(Σ qx over the block, both planes)
    s_all = qx.astype(jnp.float32).reshape(n, nb, QK).sum(axis=-1)
    c2 = 8.0 * dx * s_all  # [N, nb]
    # pre-broadcast small per-block vectors over the lane tile, block-major
    dxc = jnp.broadcast_to(dx.T[:, :, None], (nb, n, lt)).reshape(nb * n, lt)
    c2c = jnp.broadcast_to(c2.T[:, :, None], (nb, n, lt)).reshape(nb * n, lt)

    grid = (ot, kh // kt)
    return pl.pallas_call(
        _q4_0_int_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n * nbt, kt), lambda j, k: (k, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((n * nbt, kt), lambda j, k: (k, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((n * nbt, lt), lambda j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n * nbt, lt), lambda j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt, lt), lambda j, k: (j, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbt, lt), lambda j, k: (j, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, lt), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * nb * out_dim * PACKED_PER_BLOCK,
            bytes_accessed=out_dim * kh + out_dim * nb * 4 + n * out_dim * 4,
            transcendentals=0,
        ),
    )(xe, xo, dxc, c2c, qs_t, scales_t)


#: use the integer kernel for row counts up to this. 0 disables it: measured
#: end-to-end on v5e the int8 dot_general path decodes *slower* than the
#: dequant kernel (20.7 vs 25.8 tok/s at 7B) — int8 MXU lowering needs more
#: investigation before it becomes the default.
MAX_INT_KERNEL_ROWS = 0


def q4_0_int_matmul_pallas(
    x: jnp.ndarray, w: Q4_0TensorT, *, compute_dtype=jnp.float32, interpret=False
) -> jnp.ndarray:
    """Integer-exact Q4_0 matmul: quantizes activations per 32-block and
    runs the int8 MXU kernel — the reference's int4×int4 dot, end to end."""
    qs_t = jnp.asarray(w.qs_t)
    scales_t = jnp.asarray(w.scales_t)
    ot, kh, lt = qs_t.shape
    out_dim = ot * lt
    lead = x.shape[:-1]
    n_rows = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(n_rows, x.shape[-1]).astype(jnp.float32)
    qx, dx = quantize_activations_q4_0_int(x2)
    y = _q4_0_int_matmul_call(qx, dx, qs_t, scales_t, interpret=interpret)
    return y.reshape(*lead, out_dim).astype(compute_dtype)


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
