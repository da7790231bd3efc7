"""Fused Q4_0 matmul Pallas kernels — the TPU replacement for
``ggml_vec_dot_q4_0`` + the pthread mul_mat executor
(``Sources/cpp/ggml.c:1296-1582, 5987-6285``).

Decode is weight-bandwidth-bound: every token streams the packed weight bytes
from HBM once (SURVEY.md §3.2 "where time goes").  The kernels read the
*packed* nibble array (0.5 B/weight) + f32 block scales (0.125 B/weight) —
5 bits/weight, identical storage to the reference — and feed the MXU without
ever materializing a dense weight copy in HBM.

At the HBM roofline the VPU budget is ~3 vector-ops per weight; a naive
mask/shift/convert/scale dequant needs 8-10 and caps at ~6% of peak
(measured).  The decode kernel therefore uses three structural tricks:

1. **u32-lane packing + magic-mantissa extraction.**  Packed bytes are
   stored 4-per-u32-lane.  A nibble at bit offset 4p (p<4 per 16-bit half)
   is turned into an exact f32 with two bit ops and a free bitcast:
   ``f32_bits(0x4B000000 | (x & mask)) = 2^23 + 16^p·n``.  One shared
   ``>>16`` serves the high half.  Subtracting the 2^23 offset (exact,
   Sterbenz) leaves ``16^p·n`` — a 4-significant-bit value that converts to
   bf16 EXACTLY.  ≈4 vector-ops per weight, no int↔float conversion shuffles
   (Mosaic only legalizes shifts at 32 bit — measured).

2. **Integer phase dots with output-side scales.**  Activations are
   quantized per 32-block (the reference's own activation quantization,
   ``ggml.c:6134-6151``) and laid out as a block-diagonal bf16 matrix per
   nibble phase, so ONE MXU dot per phase yields every per-block partial sum
   ``P[b,o]``; block scales ``d_x[b]·d_w[b,o]`` and the −8 nibble bias apply
   on the tiny [blocks, out-tile] result.  bf16×bf16 dots are exact here
   (integer-valued operands, f32 accumulation) — this reproduces the
   reference's int4×int4 integer dot bit-for-bit semantics.

3. **Pre-tiled physical layout.**  Device arrays are stored
   ``[out/128, in-packed, 128]`` so every grid block is one contiguous HBM
   range streamed in ascending order (column slices of a flat layout are
   128-byte strided reads — measured ~15% of peak).

Prefill / large-N matmuls fall back to a jnp dequant path (compute-bound
anyway; the block-diagonal trick's MXU waste scales with N).
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
LANE_TILE = 128  # out-axis tile width; fixed by the physical layout
PHASES = 8  # nibbles per u32 lane
MAGIC = 0x4B000000  # f32 bits of 2^23; OR-ing mantissa bits is exact
OFFSET = float(2 ** 23)


@dataclasses.dataclass
class Q4_0TensorT:
    """Q4_0 weight in the pre-tiled, contraction-major device layout.

    Logical weight is [out, in] (as :class:`Q4_0Tensor`); stored as
    ``qs4`` int32 [out/128, in/8, 128] — four packed bytes (eight nibbles /
    weights) per lane, bytes little-endian within the lane — and
    ``scales_t`` f32 [out/128, in/32, 128].
    """

    scales_t: jnp.ndarray
    qs4: jnp.ndarray

    @property
    def shape(self) -> tuple[int, int]:
        return (self.qs4.shape[0] * LANE_TILE, self.qs4.shape[1] * PHASES)

    @classmethod
    def from_q4_0(cls, w: Q4_0Tensor) -> "Q4_0TensorT":
        qs = np.asarray(w.qs)  # u8 [out, in/2]
        scales = np.asarray(w.scales)  # f32 [out, in/32]
        out, kh = qs.shape
        assert out % LANE_TILE == 0, f"out dim {out} not a multiple of {LANE_TILE}"
        assert kh % 4 == 0, kh
        ot = out // LANE_TILE
        # merge 4 packed bytes per u32 along the in axis (little-endian)
        qs4 = qs.reshape(out, kh // 4, 4)
        qs4 = (
            qs4[:, :, 0].astype(np.uint32)
            | (qs4[:, :, 1].astype(np.uint32) << 8)
            | (qs4[:, :, 2].astype(np.uint32) << 16)
            | (qs4[:, :, 3].astype(np.uint32) << 24)
        ).view(np.int32)

        def tile(a):  # [out, X] -> [ot, X, LANE_TILE]
            return np.ascontiguousarray(
                a.reshape(ot, LANE_TILE, a.shape[1]).transpose(0, 2, 1)
            )

        return cls(scales_t=tile(scales), qs4=tile(qs4))

    def to_q4_0(self) -> Q4_0Tensor:
        def untile(a):
            a = np.asarray(a)
            ot, x, lt = a.shape
            return np.ascontiguousarray(a.transpose(0, 2, 1).reshape(ot * lt, x))

        qs4 = untile(self.qs4).view(np.uint32)
        out, kh4 = qs4.shape
        qs = np.empty((out, kh4, 4), dtype=np.uint8)
        for b in range(4):
            qs[:, :, b] = ((qs4 >> (8 * b)) & 0xFF).astype(np.uint8)
        return Q4_0Tensor(
            scales=untile(self.scales_t), qs=qs.reshape(out, kh4 * 4)
        )


jax.tree_util.register_pytree_node(
    Q4_0TensorT,
    lambda t: ((t.scales_t, t.qs4), None),
    lambda _, leaves: Q4_0TensorT(*leaves),
)


def dequantize_q4_0t_jnp(w: Q4_0TensorT, dtype=jnp.float32) -> jnp.ndarray:
    """Dense [out, in] from the tiled u32 layout (jnp fallback path)."""
    qs4 = jnp.asarray(w.qs4).view(jnp.uint32)  # [ot, kh4, LT]
    scales = jnp.asarray(w.scales_t).astype(jnp.float32)  # [ot, nb, LT]
    ot, kh4, lt = qs4.shape
    # phase p = element 8j + p: nibble at bit 4p
    phases = [
        ((qs4 >> jnp.uint32(4 * p)) & jnp.uint32(0xF)).astype(jnp.float32) - 8.0
        for p in range(PHASES)
    ]
    vals = jnp.stack(phases, axis=2)  # [ot, kh4, 8, LT]
    in_dim = kh4 * PHASES
    nb = in_dim // QK
    s = jnp.repeat(scales, QK // PHASES, axis=1)  # [ot, kh4, LT]
    vals = vals * s[:, :, None, :]
    # [ot, kh4, 8, LT] -> [ot, LT, kh4*8] -> [out, in]
    vals = vals.transpose(0, 3, 1, 2).reshape(ot, lt, in_dim)
    return vals.reshape(ot * lt, in_dim).astype(dtype)


# ---------------------------------------------------------------------------
# decode kernel: magic-mantissa phase dots
# ---------------------------------------------------------------------------

_PHASE_MASK = [0xF, 0xF0, 0xF00, 0xF000]
_PHASE_SCALE = [1.0, 1.0 / 16, 1.0 / 256, 1.0 / 4096]


def _magic_core(xp, dx, c2, qs4, scales, out_ref, is_first):
    """Shared decode-kernel body on loaded arrays.

    xp: bf16 [8, N·NBT, KT4] block-diagonal quantized activations per phase;
    dx/c2: f32 [N·NBT, TO] per-block activation scales / −8 corrections
    (block-major rows, pre-broadcast over lanes);
    qs4: i32 [KT4, TO]; scales: f32 [NBT, TO]; out: f32 [N, TO].
    """
    kt4, to = qs4.shape
    nbt = scales.shape[0]
    n = out_ref.shape[0]

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xl = qs4
    xh = jax.lax.shift_right_logical(xl, 16)

    acc = None
    for p in range(PHASES):
        src = xl if p < 4 else xh
        bits = (src & _PHASE_MASK[p % 4]) | MAGIC
        f = pltpu.bitcast(bits, jnp.float32)
        w_p = (f - OFFSET).astype(jnp.bfloat16)  # = 16^{p%4} · nibble, exact
        d = jax.lax.dot_general(
            xp[p], w_p,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N·NBT, TO]
        d = d * _PHASE_SCALE[p % 4]
        acc = d if acc is None else acc + d

    # z[b,n,o] = s[b,o]·(d_x[n,b]·Σ_p c_p·D_p − 8·d_x·S)
    pcomb = acc.reshape(nbt, n, to)
    dxr = dx.reshape(nbt, n, to)
    c2r = c2.reshape(nbt, n, to)
    contrib = (scales[:, None, :] * (dxr * pcomb - c2r)).sum(axis=0)
    out_ref[:] += contrib


def _q4_0_magic_kernel(xp_ref, dxc_ref, c2c_ref, qs4_ref, scales_ref, out_ref):
    _magic_core(
        xp_ref[:], dxc_ref[:], c2c_ref[:], qs4_ref[0], scales_ref[0], out_ref,
        pl.program_id(1) == 0,
    )


def quantize_activations_q4_0_int(x: jnp.ndarray):
    """Per-32-block Q4_0 activation quantization, integer form.

    x: [N, IN] → (qx f32-int-valued [N, IN] in [-7, 7], dx f32 [N, IN/32]).
    Scalar reference semantics (amax/7, round half away — ``ggml.c:568-601``).
    """
    n, in_dim = x.shape
    nb = in_dim // QK
    xb = x.astype(jnp.float32).reshape(n, nb, QK)
    amax = jnp.max(jnp.abs(xb), axis=-1)
    d = amax / 7.0
    inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    q = jnp.trunc(xb * inv[..., None] + jnp.where(xb >= 0, 0.5, -0.5))
    return q.reshape(n, in_dim), d


def _pick_kt4(kh4: int) -> int:
    """Largest divisor of kh4 that is a multiple of 128 and ≤ 512 (Mosaic
    blocks need 128-aligned trailing dims; q4 in-dims are padded to 1024
    multiples at param build so such a divisor always exists)."""
    best = 0
    t = 128
    while t <= min(kh4, 512):
        if kh4 % t == 0:
            best = t
        t += 128
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_magic_matmul_call(qx, dx, qs4, scales_t, *, interpret=False):
    """qx f32 int-valued [N, IN], dx f32 [N, NB] → y f32 [N, OUT]."""
    n, in_dim = qx.shape
    ot, kh4, lt = qs4.shape
    out_dim = ot * lt
    nb = in_dim // QK
    kt4 = _pick_kt4(kh4)
    assert kt4, kh4
    nbt = kt4 // (QK // PHASES)  # blocks per k-tile (4 u32 rows per block)

    # phase split + block-diagonal expansion (built once per call, reused
    # across every out tile).  Block-major rows [(b, n)] so k-tiles slice
    # contiguous block ranges.  Phase p holds elements 8j+p.
    j_blk = jax.lax.broadcasted_iota(jnp.int32, (nb, kh4), 1) // (QK // PHASES)
    b_row = jax.lax.broadcasted_iota(jnp.int32, (nb, kh4), 0)
    diag = (j_blk == b_row)[:, None, :]  # [nb, 1, kh4]

    def expand(plane):  # [N, kh4] -> [nb·N, kh4] bf16 block-diagonal
        e = jnp.where(diag, plane[None, :, :], 0.0)
        return e.reshape(nb * n, kh4).astype(jnp.bfloat16)

    xp = jnp.stack([expand(qx[:, p::PHASES]) for p in range(PHASES)])

    s_all = qx.reshape(n, nb, QK).sum(axis=-1)
    c2 = 8.0 * dx * s_all  # [N, nb]
    dxc = jnp.broadcast_to(dx.T[:, :, None], (nb, n, lt)).reshape(nb * n, lt)
    c2c = jnp.broadcast_to(c2.T[:, :, None], (nb, n, lt)).reshape(nb * n, lt)

    grid = (ot, kh4 // kt4)  # k innermost: contiguous HBM streaming
    return pl.pallas_call(
        _q4_0_magic_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (PHASES, n * nbt, kt4), lambda j, k: (0, k, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n * nbt, lt), lambda j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n * nbt, lt), lambda j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt4, lt), lambda j, k: (j, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbt, lt), lambda j, k: (j, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n, lt), lambda j, k: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * nb * out_dim * (QK // PHASES) * PHASES,
            bytes_accessed=out_dim * kh4 * 4 + out_dim * nb * 4 + n * out_dim * 4,
            transcendentals=0,
        ),
    )(xp, dxc, c2c, qs4, scales_t)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_magic_matmul_call_stacked(
    layer_idx, qx, dx, qs4_stacked, scales_stacked, *, interpret=False
):
    """Stacked-layer variant: weights [L, ot, ...] stay in HBM; the layer is
    selected via scalar-prefetch in the BlockSpec index maps, so a scan over
    layers never materializes per-layer weight copies (a lax.scan slicing a
    stacked array into a pallas operand would copy ~weight-size per layer)."""
    n, in_dim = qx.shape
    L, ot, kh4, lt = qs4_stacked.shape
    out_dim = ot * lt
    nb = in_dim // QK
    kt4 = _pick_kt4(kh4)
    assert kt4, kh4
    nbt = kt4 // (QK // PHASES)

    j_blk = jax.lax.broadcasted_iota(jnp.int32, (nb, kh4), 1) // (QK // PHASES)
    b_row = jax.lax.broadcasted_iota(jnp.int32, (nb, kh4), 0)
    diag = (j_blk == b_row)[:, None, :]

    def expand(plane):
        e = jnp.where(diag, plane[None, :, :], 0.0)
        return e.reshape(nb * n, kh4).astype(jnp.bfloat16)

    xp = jnp.stack([expand(qx[:, p::PHASES]) for p in range(PHASES)])
    s_all = qx.reshape(n, nb, QK).sum(axis=-1)
    c2 = 8.0 * dx * s_all
    dxc = jnp.broadcast_to(dx.T[:, :, None], (nb, n, lt)).reshape(nb * n, lt)
    c2c = jnp.broadcast_to(c2.T[:, :, None], (nb, n, lt)).reshape(nb * n, lt)

    def kernel(il_ref, xp_ref, dxc_ref, c2c_ref, qs4_ref, scales_ref, out_ref):
        _magic_core(
            xp_ref[:], dxc_ref[:], c2c_ref[:], qs4_ref[0, 0], scales_ref[0, 0],
            out_ref, pl.program_id(1) == 0,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ot, kh4 // kt4),
        in_specs=[
            pl.BlockSpec(
                (PHASES, n * nbt, kt4), lambda j, k, il: (0, k, k),
            ),
            pl.BlockSpec((n * nbt, lt), lambda j, k, il: (k, 0)),
            pl.BlockSpec((n * nbt, lt), lambda j, k, il: (k, 0)),
            pl.BlockSpec(
                (1, 1, kt4, lt), lambda j, k, il: (il[0], j, k, 0),
            ),
            pl.BlockSpec(
                (1, 1, nbt, lt), lambda j, k, il: (il[0], j, k, 0),
            ),
        ],
        out_specs=pl.BlockSpec((n, lt), lambda j, k, il: (0, j)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([layer_idx], dtype=jnp.int32), xp, dxc, c2c, qs4_stacked, scales_stacked)


def q4_0_int_matmul_pallas_stacked(
    x: jnp.ndarray, w_stacked: "Q4_0TensorT", layer_idx, *,
    compute_dtype=jnp.float32, interpret=False,
) -> jnp.ndarray:
    """Layer-indexed matmul against stacked Q4 weights ([L, ...] leaves)."""
    qs4 = jnp.asarray(w_stacked.qs4)
    scales = jnp.asarray(w_stacked.scales_t)
    L, ot, kh4, lt = qs4.shape
    out_dim = ot * lt
    lead = x.shape[:-1]
    n_rows = int(np.prod(lead)) if lead else 1
    x2 = _pad_x_to(x.reshape(n_rows, x.shape[-1]).astype(jnp.float32), kh4 * PHASES)
    qx, dx = quantize_activations_q4_0_int(x2)
    y = _q4_0_magic_matmul_call_stacked(
        layer_idx, qx, dx, qs4, scales, interpret=interpret
    )
    return y.reshape(*lead, out_dim).astype(compute_dtype)


@dataclasses.dataclass
class StackedQ4Ref:
    """Transient handle: stacked Q4 weights ([L, ...] leaves) + a traced
    layer index, passed through ``linear`` inside a scan-over-layers body so
    the pallas kernel can index the stacked HBM buffer directly (scalar
    prefetch) instead of the scan materializing per-layer copies."""

    w: Q4_0TensorT
    layer_idx: object  # traced int32 scalar

    def at_layer(self) -> Q4_0TensorT:
        """Sliced 3-D view (dynamic-slice; used by non-pallas fallbacks)."""
        return Q4_0TensorT(
            scales_t=jnp.asarray(self.w.scales_t)[self.layer_idx],
            qs4=jnp.asarray(self.w.qs4)[self.layer_idx],
        )


#: route matmuls with at most this many rows to the block-diagonal integer
#: kernel. 0 disables it (measured slower end-to-end than the phase-dequant
#: kernel: the block-diagonal expansion wastes ~16× MXU flops and its small
#: per-phase dots are latency-bound); kept for further investigation.
MAX_INT_KERNEL_ROWS = 0


def _pad_x_to(x2: jnp.ndarray, in_dim: int) -> jnp.ndarray:
    """Zero-pad activations to a weight's (1024-padded) in-dim — zero blocks
    quantize to zero and contribute nothing."""
    if x2.shape[-1] < in_dim:
        x2 = jnp.pad(x2, ((0, 0), (0, in_dim - x2.shape[-1])))
    return x2


def q4_0_int_matmul_pallas(
    x: jnp.ndarray, w: Q4_0TensorT, *, compute_dtype=jnp.float32, interpret=False
) -> jnp.ndarray:
    """Integer-exact Q4_0 matmul: quantizes activations per 32-block and
    runs the magic-phase kernel — the reference's int4×int4 dot end to end."""
    qs4 = jnp.asarray(w.qs4)
    scales_t = jnp.asarray(w.scales_t)
    ot, kh4, lt = qs4.shape
    out_dim = ot * lt
    lead = x.shape[:-1]
    n_rows = int(np.prod(lead)) if lead else 1
    x2 = _pad_x_to(x.reshape(n_rows, x.shape[-1]).astype(jnp.float32), kh4 * PHASES)
    qx, dx = quantize_activations_q4_0_int(x2)
    y = _q4_0_magic_matmul_call(qx, dx, qs4, scales_t, interpret=interpret)
    return y.reshape(*lead, out_dim).astype(compute_dtype)


# ---------------------------------------------------------------------------
# phase-dequant kernel: magic extraction, one concatenated dot per tile
# ---------------------------------------------------------------------------


def _q4_0_phase_kernel(xr_ref, qs4_ref, scales_ref, out_ref):
    _phase_core(xr_ref, qs4_ref[0], scales_ref[0], out_ref)


def _phase_core(xr_ref, xl, scales, out_ref):
    """One (out, k) step: extract all 8 nibble phases with magic bitcasts,
    scale, accumulate one MXU dot per phase.

    xr: f32 [N, 8, KT4] activations reordered phase-major (element 8j+p at
    [:, p, j]); xl: i32 [KT4, TO]; scales: f32 [NBT, TO];
    out: f32 [N, TO], accumulated over k.
    """
    kt4, to = xl.shape
    nbt = scales.shape[0]
    n = out_ref.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # per-row scales: u32 row j holds elements 8j..8j+7, all in block j//4
    s4 = jnp.broadcast_to(
        scales.reshape(nbt, 1, to), (nbt, 4, to)
    ).reshape(kt4, to)
    s4c = [s4 * c for c in _PHASE_SCALE]

    xh = jax.lax.shift_right_logical(xl, 16)
    acc = None
    for p in range(PHASES):
        src = xl if p < 4 else xh
        bits = (src & _PHASE_MASK[p % 4]) | MAGIC
        f = pltpu.bitcast(bits, jnp.float32)
        # ((2^23 + 16^p(n)) − (2^23 + 8·16^p)) · s/16^p = (n − 8)·s, exact
        w_p = (f - (OFFSET + 8.0 * (16 ** (p % 4)))) * s4c[p % 4]
        # HIGHEST (6-pass bf16) = f32-exact; Mosaic rejects HIGH inside a
        # kernel, and decode at these row counts is HBM-bound so the extra
        # MXU passes are free
        d = jnp.dot(
            xr_ref[:, p, :], w_p, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc = d if acc is None else acc + d
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_phase_matmul_call(x2, qs4, scales_t, *, interpret=False):
    """x2 f32 [N, IN] (N a multiple of 8) → y f32 [N, OUT]."""
    n, in_dim = x2.shape
    ot, kh4, lt = qs4.shape
    out_dim = ot * lt
    kt4 = _pick_kt4(kh4)
    assert kt4, kh4
    nbt = kt4 // 4
    xr = x2.reshape(n, kh4, PHASES).transpose(0, 2, 1)  # [N, 8, kh4]
    grid = (ot, kh4 // kt4)
    return pl.pallas_call(
        _q4_0_phase_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, PHASES, kt4), lambda j, k: (0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt4, lt), lambda j, k: (j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbt, lt), lambda j, k: (j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, lt), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * out_dim * in_dim,
            bytes_accessed=out_dim * kh4 * 4 + out_dim * (in_dim // QK) * 4
            + n * in_dim * 4 + n * out_dim * 4,
            transcendentals=0,
        ),
    )(xr, qs4, scales_t)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_phase_matmul_call_stacked(
    layer_idx, x2, qs4_stacked, scales_stacked, *, interpret=False
):
    """Stacked-layer phase-dequant matmul: weights [L, ot, kh4, lt] stay in
    HBM, the layer picked via scalar prefetch (the batched-decode analogue of
    ``_q4_0_magic_matmul_call_stacked``)."""
    n, in_dim = x2.shape
    L, ot, kh4, lt = qs4_stacked.shape
    out_dim = ot * lt
    kt4 = _pick_kt4(kh4)
    assert kt4, kh4
    nbt = kt4 // 4
    xr = x2.reshape(n, kh4, PHASES).transpose(0, 2, 1)  # [N, 8, kh4]

    def kernel(il_ref, xr_ref, qs4_ref, scales_ref, out_ref):
        del il_ref  # consumed by the BlockSpec index maps
        _phase_core(xr_ref, qs4_ref[0, 0], scales_ref[0, 0], out_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ot, kh4 // kt4),
        in_specs=[
            pl.BlockSpec((n, PHASES, kt4), lambda j, k, il: (0, 0, k)),
            pl.BlockSpec((1, 1, kt4, lt), lambda j, k, il: (il[0], j, k, 0)),
            pl.BlockSpec((1, 1, nbt, lt), lambda j, k, il: (il[0], j, k, 0)),
        ],
        out_specs=pl.BlockSpec((n, lt), lambda j, k, il: (0, j)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([layer_idx], jnp.int32), xr, qs4_stacked, scales_stacked)


def q4_0_matmul_pallas_stacked(
    x: jnp.ndarray, w_stacked: "Q4_0TensorT", layer_idx, *,
    compute_dtype=jnp.float32, interpret=False,
) -> jnp.ndarray:
    """Layer-indexed phase-dequant matmul against stacked Q4 weights.
    The caller handles activation fake-quant (as :func:`q4_0_matmul_pallas`)."""
    qs4 = jnp.asarray(w_stacked.qs4)
    scales = jnp.asarray(w_stacked.scales_t)
    L, ot, kh4, lt = qs4.shape
    out_dim = ot * lt
    lead = x.shape[:-1]
    n_rows = int(np.prod(lead)) if lead else 1
    x2 = _pad_x_to(x.reshape(n_rows, x.shape[-1]).astype(jnp.float32), kh4 * PHASES)
    n_pad = max(8, (n_rows + 7) // 8 * 8)
    if n_pad != n_rows:
        x2 = jnp.pad(x2, ((0, n_pad - n_rows), (0, 0)))
    y = _q4_0_phase_matmul_call_stacked(
        layer_idx, x2, qs4, scales, interpret=interpret
    )
    return y[:n_rows].reshape(*lead, out_dim).astype(compute_dtype)


#: rows above which the jnp dense-dequant path wins (x must stay VMEM
#: resident per out tile)
MAX_PHASE_KERNEL_ROWS = 64


def q4_0_matmul_pallas(
    x: jnp.ndarray, w: Q4_0TensorT, *, compute_dtype=jnp.float32, interpret=False
) -> jnp.ndarray:
    """``y[..., out] = x[..., in] @ deq(W)[out, in].T``.

    Small row counts go through the fused phase-dequant kernel; larger ones
    (and untileable shapes) through the jnp dequant path (prefill is
    compute-bound; XLA's dense matmul is fine there).  The caller handles
    activation fake-quant.
    """
    qs4 = jnp.asarray(w.qs4)
    scales_t = jnp.asarray(w.scales_t)
    ot, kh4, lt = qs4.shape
    out_dim = ot * lt
    lead = x.shape[:-1]
    n_rows = int(np.prod(lead)) if lead else 1
    x2 = _pad_x_to(x.reshape(n_rows, x.shape[-1]).astype(jnp.float32), kh4 * PHASES)

    if _pick_kt4(kh4) and n_rows <= MAX_PHASE_KERNEL_ROWS:
        n_pad = max(8, (n_rows + 7) // 8 * 8)
        if n_pad != n_rows:
            x2 = jnp.pad(x2, ((0, n_pad - n_rows), (0, 0)))
        y = _q4_0_phase_matmul_call(x2, qs4, scales_t, interpret=interpret)
        y = y[:n_rows]
        return y.reshape(*lead, out_dim).astype(compute_dtype)

    wd = dequantize_q4_0t_jnp(w, dtype=compute_dtype)
    y = jnp.dot(
        x2, wd.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(*lead, out_dim).astype(compute_dtype)


# ---------------------------------------------------------------------------
# multi-row (batched-decode) VPU kernel on the T layout
# ---------------------------------------------------------------------------

#: rows the T-layout multi-row VPU kernel accepts in `linear` dispatch.
#: DISABLED (0): measured 11.9 tok/s aggregate at 13B batch-8 on hardware —
#: the T orientation needs a LANE-broadcast of the [kh4, 1] activation
#: column for every FMA, which Mosaic lowers to per-vreg shuffles (the V
#: layout's sublane-broadcast is free; its 4096-aligned in-dims just don't
#: fit 13B).  Batched T serving stays on the block-diagonal MXU phase
#: kernel; the kernel below remains for the record + interpret tests.
MAX_MULTI_ROWS_T = 0

_T_MASKS = [0xF << (4 * p) for p in range(7)]  # phase 7 uses a logical shift
_T_XSCALE = [float(16.0 ** -p) for p in range(7)] + [1.0]


def _vpu_core_multi_t(xl, xr_ref, aux_ref, scales, B: int, kchunk: int = 512):
    """B-row exact int4-dot core on a T-layout tile.

    xl: i32 [KH4, 128] (in-packed on sublanes, out rows on lanes);
    xr: f32 [KH4, 8B] (column b·8+p = row b's phase-p activations ·16^-p,
    sublane s = in elements [8s, 8s+8)); aux: f32 [NB, 2B] (columns 2b /
    2b+1 = row b's block scales d_x / 8·Σ q); scales: f32 [NB, 128].
    Returns y [B, 128] — LANE-major outputs, no per-tile transpose (the
    V-layout core's [128, 1] column needed one per tile).

    Processes the in-dim in ``kchunk``-sublane slices: hoisting all 8
    whole-tile nibble planes (8·kh4·128·4 B live) blows the 16 MB
    scoped-VMEM stack at 13B's kh4=1792 w2 tiles (compile-time OOM, r5).
    """
    kh4 = xl.shape[0]
    ys = None
    for k0 in range(0, kh4, kchunk):
        k1 = min(k0 + kchunk, kh4)
        xc = xl[k0:k1]
        nibs = [
            (xc & _T_MASKS[p]).astype(jnp.float32) for p in range(7)
        ] + [jax.lax.shift_right_logical(xc, 28).astype(jnp.float32)]
        nbc = (k1 - k0) // 4
        b0 = k0 // 4
        outs = []
        for b in range(B):
            acc = nibs[0] * xr_ref[k0:k1, b * 8 : b * 8 + 1]
            for p in range(1, PHASES):
                acc = acc + nibs[p] * xr_ref[k0:k1, b * 8 + p : b * 8 + p + 1]
            a4 = acc.reshape(nbc, 4, LANE_TILE)
            accb = a4[:, 0] + a4[:, 1] + a4[:, 2] + a4[:, 3]  # [nbc, 128]
            dx = aux_ref[b0 : b0 + nbc, 2 * b : 2 * b + 1]
            corr = aux_ref[b0 : b0 + nbc, 2 * b + 1 : 2 * b + 2]
            outs.append(
                jnp.sum(
                    (accb - corr) * (scales[b0 : b0 + nbc] * dx),
                    axis=0, keepdims=True,
                )
            )
        part = jnp.concatenate(outs, axis=0)  # [B, 128]
        ys = part if ys is None else ys + part
    return ys


def _prep_inputs_multi_t(x2: jnp.ndarray, kh4: int, quantize_acts: bool):
    """x2 f32 [B, in] → (xr [kh4, 8B], aux [nb, 2B]) for the T multi core."""
    B = x2.shape[0]
    in_dim = kh4 * PHASES
    nb = in_dim // QK
    if quantize_acts:
        qx, dx = quantize_activations_q4_0_int(x2)  # [B, in], [B, nb]
    else:
        qx = x2.astype(jnp.float32)
        dx = jnp.ones((B, nb), jnp.float32)
    xsc = jnp.asarray(_T_XSCALE, jnp.float32)
    xr = qx.reshape(B, kh4, PHASES).transpose(1, 0, 2).reshape(kh4, B * PHASES)
    xr = xr * jnp.tile(xsc, B)[None, :]
    corr = 8.0 * qx.reshape(B, nb, QK).sum(axis=2)  # [B, nb]
    aux = jnp.stack([dx, corr], axis=2).transpose(1, 0, 2).reshape(nb, 2 * B)
    return xr, aux


def _make_multi_t_kernel(B: int, stacked: bool):
    def core(xl, xr_ref, aux_ref, scales):
        return _vpu_core_multi_t(xl, xr_ref, aux_ref, scales, B)

    def loop(idx, steps, xr_ref, aux_ref, qs4_hbm, sc_hbm, out_ref,
             qbuf, sbuf, qsem, ssem):
        def qdma(slot, j):
            return pltpu.make_async_copy(
                qs4_hbm.at[idx(j)], qbuf.at[slot], qsem.at[slot]
            )

        def sdma(slot, j):
            return pltpu.make_async_copy(
                sc_hbm.at[idx(j)], sbuf.at[slot], ssem.at[slot]
            )

        nbuf = qbuf.shape[0]
        for j in range(nbuf - 1):

            @pl.when(j < steps)
            def _(j=j):
                qdma(j % nbuf, j).start()
                sdma(j % nbuf, j).start()

        def body(j, _):
            slot = j % nbuf
            pre = j + nbuf - 1

            @pl.when(pre < steps)
            def _():
                qdma(pre % nbuf, pre).start()
                sdma(pre % nbuf, pre).start()

            qdma(slot, j).wait()
            sdma(slot, j).wait()
            out_ref[j] = core(qbuf[slot], xr_ref, aux_ref, sbuf[slot])
            return ()

        jax.lax.fori_loop(0, steps, body, (), unroll=False)

    if stacked:

        def kernel(il_ref, xr_ref, aux_ref, qs4_hbm, sc_hbm, out_ref,
                   qbuf, sbuf, qsem, ssem):
            il = il_ref[0]
            loop(lambda j: (il, j), qs4_hbm.shape[1], xr_ref, aux_ref,
                 qs4_hbm, sc_hbm, out_ref, qbuf, sbuf, qsem, ssem)

        return kernel

    def kernel(xr_ref, aux_ref, qs4_hbm, sc_hbm, out_ref,
               qbuf, sbuf, qsem, ssem):
        loop(lambda j: (j,), qs4_hbm.shape[0], xr_ref, aux_ref,
             qs4_hbm, sc_hbm, out_ref, qbuf, sbuf, qsem, ssem)

    return kernel


def _multi_t_grid_kernel(B: int, stacked: bool):
    """Auto-pipelined grid variant for interpret mode (same core)."""
    if stacked:

        def kernel(il_ref, xr_ref, aux_ref, qs4_ref, scales_ref, out_ref):
            del il_ref  # consumed by the BlockSpec index maps
            out_ref[0] = _vpu_core_multi_t(
                qs4_ref[0, 0], xr_ref, aux_ref, scales_ref[0, 0], B
            )

        return kernel

    def kernel(xr_ref, aux_ref, qs4_ref, scales_ref, out_ref):
        out_ref[0] = _vpu_core_multi_t(
            qs4_ref[0], xr_ref, aux_ref, scales_ref[0], B
        )

    return kernel


#: T multi-row DMA ring depth (same rationale as q4_vpu_pallas.NBUF)
NBUF_T = 6


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_t_multi_call(xr, aux, qs4, scales_t, *, interpret=False):
    ot, kh4, lt = qs4.shape
    nb = scales_t.shape[1]
    B = xr.shape[1] // PHASES
    if interpret:
        out = pl.pallas_call(
            _multi_t_grid_kernel(B, stacked=False),
            grid=(ot,),
            in_specs=[
                pl.BlockSpec((kh4, B * PHASES), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 2 * B), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kh4, lt), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb, lt), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, B, lt), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((ot, B, lt), jnp.float32),
            interpret=True,
        )(xr, aux, qs4, scales_t)
        return out.transpose(1, 0, 2).reshape(B, ot * lt)
    out = pl.pallas_call(
        _make_multi_t_kernel(B, stacked=False),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, B, lt), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NBUF_T, kh4, lt), jnp.int32),
            pltpu.VMEM((NBUF_T, nb, lt), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF_T,)),
            pltpu.SemaphoreType.DMA((NBUF_T,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * ot * lt * kh4 * PHASES,
            bytes_accessed=ot * lt * (kh4 + nb) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # the default 16 MB scoped-VMEM limit rejects large-in-dim tiles
            # at compile time; the chunked core's working set is far smaller
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xr, aux, qs4, scales_t)
    return out.transpose(1, 0, 2).reshape(B, ot * lt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_t_multi_call_stacked(layer_idx, xr, aux, qs4, scales_t, *,
                               interpret=False):
    L, ot, kh4, lt = qs4.shape
    nb = scales_t.shape[2]
    B = xr.shape[1] // PHASES
    if interpret:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ot,),
            in_specs=[
                pl.BlockSpec((kh4, B * PHASES), lambda j, il: (0, 0)),
                pl.BlockSpec((nb, 2 * B), lambda j, il: (0, 0)),
                pl.BlockSpec((1, 1, kh4, lt), lambda j, il: (il[0], j, 0, 0)),
                pl.BlockSpec((1, 1, nb, lt), lambda j, il: (il[0], j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, B, lt), lambda j, il: (j, 0, 0)),
        )
        out = pl.pallas_call(
            _multi_t_grid_kernel(B, stacked=True),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ot, B, lt), jnp.float32),
            interpret=True,
        )(jnp.asarray([layer_idx], jnp.int32), xr, aux, qs4, scales_t)
        return out.transpose(1, 0, 2).reshape(B, ot * lt)
    out = pl.pallas_call(
        _make_multi_t_kernel(B, stacked=True),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, B, lt), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NBUF_T, kh4, lt), jnp.int32),
            pltpu.VMEM((NBUF_T, nb, lt), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF_T,)),
            pltpu.SemaphoreType.DMA((NBUF_T,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # the default 16 MB scoped-VMEM limit rejects the w2-shaped
            # tiles (kh4=1792 at 13B) at compile time; the actual working
            # set is chunked well below this
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(jnp.asarray([layer_idx], jnp.int32), xr, aux, qs4, scales_t)
    return out.transpose(1, 0, 2).reshape(B, ot * lt)


def q4_0_t_matmul_multi(
    x: jnp.ndarray,  # [..., in] with 2 <= prod(lead) <= MAX_MULTI_ROWS_T
    w: Q4_0TensorT,
    layer_idx=None,  # not None: w leaves carry a leading [L] axis
    *,
    quantize_acts: bool = True,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched-decode Q4_0 matmul on the T layout: streams the packed
    weights ONCE for all B rows on the VPU (exact ``ggml_vec_dot_q4_0``
    int4×int4 semantics per row) — replaces the magic-mantissa MXU phase
    kernel for batched serving (its batch-1-style MXU weight-load floor was
    the 13B batched bottleneck, BENCH_r04)."""
    qs4 = jnp.asarray(w.qs4)
    scales_t = jnp.asarray(w.scales_t)
    kh4 = qs4.shape[-2]
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    assert 1 <= B <= 32, B  # kernel cap (MAX_MULTI_ROWS_T gates dispatch)
    x2 = _pad_x_to(
        x.reshape(B, x.shape[-1]).astype(jnp.float32), kh4 * PHASES
    )
    xr, aux = _prep_inputs_multi_t(x2, kh4, quantize_acts)
    if layer_idx is None:
        y = _q4_0_t_multi_call(xr, aux, qs4, scales_t, interpret=interpret)
    else:
        y = _q4_0_t_multi_call_stacked(
            layer_idx, xr, aux, qs4, scales_t, interpret=interpret
        )
    out_dim = qs4.shape[-3] * qs4.shape[-1]
    return y.reshape(*lead, out_dim).astype(compute_dtype)
