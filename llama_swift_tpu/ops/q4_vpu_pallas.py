"""VPU-only fused Q4_0 matvec kernel — the batch-1 decode replacement for
``ggml_vec_dot_q4_0`` (``Sources/cpp/ggml.c:1296-1582``).

Why not the MXU?  Every earlier kernel design (BASELINE.md measured table)
pushed the dequantized weights through the MXU as the *stationary* operand.
Loading a 128×128 weight tile into the systolic array costs ~128 cycles —
~128 weights/cycle ≈ 1.2e11 weights/s — so a 7B forward (6.7e9 weights) has
a hard MXU-weight-load floor of ~55 ms/token at batch 1 no matter how cheap
the dequant is.  That floor is exactly the ~20-26 tok/s every MXU variant
measured.  A matvec has 2 FLOPs/weight; the VPU does those directly.

Design (per 128-out × in tile, grid over out tiles only):

* **Layout** (:class:`Q4_0TensorV`): out rows on sublanes, packed in-dim on
  lanes — ``qs4v`` int32 ``[out/128, 128, in/8]`` (eight nibbles per lane),
  ``scales_v`` f32 ``[out/128, 128, in/32]``.  One grid step = one fully
  contiguous HBM slab; the whole weight streams front-to-back.  Lanes are
  **group-major**: lane ``g·(in/32) + b`` holds u32 #g of block b, so the
  per-block reduction is four contiguous 128-aligned lane slices (Mosaic
  cannot lower a lane-splitting reshape; strided lane gathers shuffle).
* **cvt-dequant fused into the MAC.**  Phase p∈[0,7) isolates nibble p with
  one AND (fields ``n·16^p`` stay positive below bit 28); int→f32 convert is
  exact; one fused multiply-add against the phase's activation lane-vector
  (pre-scaled by ``16^-p``) accumulates ``n·x``.  Phase 7 (bits 28-31, sign
  bit) uses one logical right-shift instead of a mask.  ≈3.1 VPU ops/weight
  vs the ~2.9/weight VPU budget at the 819 GB/s HBM roofline.
* **−8 bias and scales applied per block on the reduced result**: the
  reference's integer dot ``Σ(n−8)(m−8)·d_w·d_x`` is reproduced exactly —
  activations quantize per 32-block to integers (amax/7, round half away,
  ``ggml.c:568-601``), all per-block partial sums are exact small integers
  in f32, and scales multiply once per block.

Activations enter as a phase-major ``[8, in/8]`` f32 array; block
corrections/activation scales as a ``[2, in/32]`` aux array.  Both are
grid-invariant (fetched once, resident in VMEM).
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
from ..formats.quant import Q4_0Tensor, Q4_1Tensor
from .q4_matmul_pallas import quantize_activations_q4_0_int

PHASES = 8
OUT_TILE = 128  # out rows per grid step (sublane-major)
OUT_LANES = 8  # lanes of the (broadcast) per-tile output column
IN_ALIGN = 4096  # in-dim padding unit: in/32 block-lanes stay 128-aligned

_MASKS = [0xF << (4 * p) for p in range(7)]  # phases 0-6; phase 7 shifts
_XSCALE = [float(16.0 ** -p) for p in range(7)] + [1.0]


def _pack_qs_v(qs: np.ndarray) -> np.ndarray:
    """u8 nibble bytes [out, in/2] → group-major i32 lanes
    [out/128, 128, in/8] (lane g·nb + b = u32 #g of block b)."""
    out, kh = qs.shape
    assert out % OUT_TILE == 0, f"out dim {out} not a multiple of {OUT_TILE}"
    assert kh % 4 == 0, kh
    qs4 = qs.reshape(out, kh // 4, 4)
    qs4 = (
        qs4[:, :, 0].astype(np.uint32)
        | (qs4[:, :, 1].astype(np.uint32) << 8)
        | (qs4[:, :, 2].astype(np.uint32) << 16)
        | (qs4[:, :, 3].astype(np.uint32) << 24)
    ).view(np.int32)
    nb = kh // 16
    qs4 = qs4.reshape(out, nb, 4).transpose(0, 2, 1).reshape(out, nb * 4)
    return np.ascontiguousarray(qs4.reshape(out // OUT_TILE, OUT_TILE, -1))


def _unpack_qs_v(qs4v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_pack_qs_v` → u8 [out, in/2]."""
    qs4 = np.asarray(qs4v).view(np.uint32)
    ot, lt, kh4 = qs4.shape
    nb = kh4 // 4
    qs4 = qs4.reshape(ot * lt, 4, nb).transpose(0, 2, 1).reshape(ot * lt, kh4)
    qs = np.empty((ot * lt, kh4, 4), dtype=np.uint8)
    for b in range(4):
        qs[:, :, b] = ((qs4 >> (8 * b)) & 0xFF).astype(np.uint8)
    return qs.reshape(ot * lt, kh4 * 4)


@dataclasses.dataclass
class Q4_0TensorV:
    """Q4_0 weight in the VPU-matvec device layout.

    Logical weight [out, in] (`Q4_0Tensor` row-major semantics, ggml block
    layout ``ggml.c:408-411``); stored as ``qs4v`` int32 [out/128, 128, in/8]
    (4 packed little-endian bytes per lane = 8 consecutive in-elements) and
    ``scales_v`` f32 [out/128, 128, in/32].
    """

    scales_v: jnp.ndarray
    qs4v: jnp.ndarray

    @property
    def shape(self) -> tuple[int, int]:
        return (self.qs4v.shape[0] * OUT_TILE, self.qs4v.shape[2] * PHASES)

    @classmethod
    def from_q4_0(cls, w: Q4_0Tensor) -> "Q4_0TensorV":
        scales = np.asarray(w.scales).astype(np.float32)  # [out, in/32]
        ot = scales.shape[0] // OUT_TILE
        return cls(
            scales_v=np.ascontiguousarray(scales.reshape(ot, OUT_TILE, -1)),
            qs4v=_pack_qs_v(np.asarray(w.qs)),
        )

    def to_q4_0(self) -> Q4_0Tensor:
        ot, lt, _ = np.asarray(self.qs4v).shape
        return Q4_0Tensor(
            scales=np.asarray(self.scales_v).reshape(ot * lt, -1),
            qs=_unpack_qs_v(self.qs4v),
        )


@dataclasses.dataclass
class Q4_1TensorV:
    """Q4_1 weight in the VPU-matvec device layout (min/delta affine blocks,
    ``ggml.c:2040`` / ``utils.cpp:487-544``).

    ``qs4v`` packs nibbles exactly like :class:`Q4_0TensorV`; ``sm_v`` f32
    [out/128, 128, 2·in/32] carries per-block delta in lanes [0, nb) and min
    in lanes [nb, 2nb) — ONE DMA streams both.  The matvec kernel computes
    ``y = Σ_b d_b·Σ(n·x̂) + m_b·Σx̂`` per block, algebraically the reference's
    f32 dequant-dot (``ggml_vec_dot_q4_1``, ``ggml.c:1584-1626``).
    """

    sm_v: jnp.ndarray
    qs4v: jnp.ndarray

    @property
    def shape(self) -> tuple[int, int]:
        return (self.qs4v.shape[0] * OUT_TILE, self.qs4v.shape[2] * PHASES)

    @classmethod
    def from_q4_1(cls, w: Q4_1Tensor) -> "Q4_1TensorV":
        scales = np.asarray(w.scales).astype(np.float32)  # [out, nb]
        mins = np.asarray(w.mins).astype(np.float32)
        out = scales.shape[0]
        ot = out // OUT_TILE
        sm = np.concatenate([scales, mins], axis=1)  # [out, 2nb]
        return cls(
            sm_v=np.ascontiguousarray(sm.reshape(ot, OUT_TILE, -1)),
            qs4v=_pack_qs_v(np.asarray(w.qs)),
        )

    def to_q4_1(self) -> Q4_1Tensor:
        sm = np.asarray(self.sm_v)
        ot, lt, nb2 = sm.shape
        nb = nb2 // 2
        sm = sm.reshape(ot * lt, nb2)
        return Q4_1Tensor(
            mins=sm[:, nb:], scales=sm[:, :nb], qs=_unpack_qs_v(self.qs4v)
        )


jax.tree_util.register_pytree_node(
    Q4_0TensorV,
    lambda t: ((t.scales_v, t.qs4v), None),
    lambda _, leaves: Q4_0TensorV(*leaves),
)
jax.tree_util.register_pytree_node(
    Q4_1TensorV,
    lambda t: ((t.sm_v, t.qs4v), None),
    lambda _, leaves: Q4_1TensorV(*leaves),
)


def _nibbles_v_jnp(qs4v) -> jnp.ndarray:
    """[ot, 128, kh4] packed lanes → f32 nibble values [ot, 128, in] in
    logical element order (undoes the group-major lane permutation)."""
    qs4 = jnp.asarray(qs4v).view(jnp.uint32)  # [ot, 128, kh4]
    ot, lt, kh4 = qs4.shape
    nb = kh4 // 4
    qs4 = qs4.reshape(ot, lt, 4, nb).transpose(0, 1, 3, 2)  # undo group-major
    vals = jnp.stack(
        [
            ((qs4 >> jnp.uint32(4 * p)) & jnp.uint32(0xF)).astype(jnp.float32)
            for p in range(PHASES)
        ],
        axis=-1,
    )  # [ot, 128, nb, 4, 8]; element index = 32b + 8g + p
    return vals.reshape(ot, lt, kh4 * PHASES)


def dequantize_q4_0v_jnp(w: Q4_0TensorV, dtype=jnp.float32) -> jnp.ndarray:
    """Dense [out, in] from the V layout (prefill / fallback path)."""
    vals = _nibbles_v_jnp(w.qs4v) - 8.0
    scales = jnp.asarray(w.scales_v).astype(jnp.float32)  # [ot, 128, nb]
    ot, lt, in_dim = vals.shape
    s = jnp.repeat(scales, QK, axis=2).reshape(ot, lt, in_dim)
    return (vals * s).reshape(ot * lt, in_dim).astype(dtype)


def dequantize_q4_1v_jnp(w: Q4_1TensorV, dtype=jnp.float32) -> jnp.ndarray:
    """Dense [out, in] from the Q4_1 V layout: ``n·d + m`` per block."""
    vals = _nibbles_v_jnp(w.qs4v)
    sm = jnp.asarray(w.sm_v).astype(jnp.float32)  # [ot, 128, 2nb]
    ot, lt, in_dim = vals.shape
    nb = in_dim // QK
    d = jnp.repeat(sm[:, :, :nb], QK, axis=2).reshape(ot, lt, in_dim)
    m = jnp.repeat(sm[:, :, nb:], QK, axis=2).reshape(ot, lt, in_dim)
    return (vals * d + m).reshape(ot * lt, in_dim).astype(dtype)


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------


def _vpu_core(xl, xr_ref, aux_ref, scales):
    """acc/reduce/scale shared by the single and stacked kernels.

    xl: i32 [128, KH4]; xr: f32 [8, KH4] phase-major pre-scaled activations;
    aux: f32 [2, NB] (row 0: activation block scales d_x, row 1: 8·Σ_b x);
    scales: f32 [128, NB].  Returns y [128, 1] f32.
    """
    kh4 = xl.shape[1]
    nb = kh4 // 4
    acc = (xl & _MASKS[0]).astype(jnp.float32) * xr_ref[0:1, :]
    for p in range(1, 7):
        acc = acc + (xl & _MASKS[p]).astype(jnp.float32) * xr_ref[p : p + 1, :]
    top = jax.lax.shift_right_logical(xl, 28)
    acc = acc + top.astype(jnp.float32) * xr_ref[7:8, :]
    # per-block partial sums; group-major lanes make these contiguous
    # 128-aligned slices (exact small-int arithmetic throughout)
    accb = (
        acc[:, 0 * nb : 1 * nb]
        + acc[:, 1 * nb : 2 * nb]
        + acc[:, 2 * nb : 3 * nb]
        + acc[:, 3 * nb : 4 * nb]
    )  # [128, NB]
    s_eff = scales * aux_ref[0:1, :]  # d_w · d_x
    return jnp.sum((accb - aux_ref[1:2, :]) * s_eff, axis=1, keepdims=True)


def _acc_blocks(xl, xr_ref):
    """Phase MACs + per-block reduction shared by Q4_0/Q4_1 cores: returns
    accb [128, NB] = Σ_block nibble·x̂ (exact small-int arithmetic when the
    activations are integers)."""
    kh4 = xl.shape[1]
    nb = kh4 // 4
    acc = (xl & _MASKS[0]).astype(jnp.float32) * xr_ref[0:1, :]
    for p in range(1, 7):
        acc = acc + (xl & _MASKS[p]).astype(jnp.float32) * xr_ref[p : p + 1, :]
    top = jax.lax.shift_right_logical(xl, 28)
    acc = acc + top.astype(jnp.float32) * xr_ref[7:8, :]
    return (
        acc[:, 0 * nb : 1 * nb]
        + acc[:, 1 * nb : 2 * nb]
        + acc[:, 2 * nb : 3 * nb]
        + acc[:, 3 * nb : 4 * nb]
    )  # [128, NB]


def _vpu_core_q41(xl, xr_ref, aux_ref, sm):
    """Q4_1 tile core.  sm: f32 [128, 2·NB] (delta lanes then min lanes);
    aux row 0: per-block Σx̂.  y_b = d_b·Σ(n·x̂) + m_b·Σx̂."""
    accb = _acc_blocks(xl, xr_ref)
    nb = accb.shape[1]
    d = sm[:, :nb]
    m = sm[:, nb:]
    return jnp.sum(accb * d + aux_ref[0:1, :] * m, axis=1, keepdims=True)


def _q4_0_vpu_kernel(xr_ref, aux_ref, qs4_ref, scales_ref, out_ref):
    y = _vpu_core(qs4_ref[0], xr_ref, aux_ref, scales_ref[0])
    out_ref[0] = jnp.broadcast_to(y, (OUT_TILE, OUT_LANES))


def _q4_0_vpu_kernel_stacked(il_ref, xr_ref, aux_ref, qs4_ref, scales_ref, out_ref):
    del il_ref  # consumed by the BlockSpec index maps
    y = _vpu_core(qs4_ref[0, 0], xr_ref, aux_ref, scales_ref[0, 0])
    out_ref[0] = jnp.broadcast_to(y, (OUT_TILE, OUT_LANES))


def _q4_1_vpu_kernel(xr_ref, aux_ref, qs4_ref, sm_ref, out_ref):
    y = _vpu_core_q41(qs4_ref[0], xr_ref, aux_ref, sm_ref[0])
    out_ref[0] = jnp.broadcast_to(y, (OUT_TILE, OUT_LANES))


def _q4_1_vpu_kernel_stacked(il_ref, xr_ref, aux_ref, qs4_ref, sm_ref, out_ref):
    del il_ref
    y = _vpu_core_q41(qs4_ref[0, 0], xr_ref, aux_ref, sm_ref[0, 0])
    out_ref[0] = jnp.broadcast_to(y, (OUT_TILE, OUT_LANES))


# ---------------------------------------------------------------------------
# manually pipelined kernels (the compiled TPU path)
# ---------------------------------------------------------------------------

#: DMA buffer count for the kernel-managed pipeline.  Measured (v5e, w13
#: shape): the AUTO-pipelined grid kernel serializes the VPU phase MACs after
#: each block's DMA (t_step ≈ t_DMA + t_compute → ~525 GB/s); a manual buffer
#: ring decouples them.  Depth sweep on the same shape: 2 buffers leave the
#: DMA engine idle whenever compute momentarily falls behind (~700 GB/s),
#: 3 reach ~740, and 6 keep enough requests outstanding to absorb the
#: per-tile compute jitter at ~97% of the pure-read probe (762 vs 782 GB/s);
#: beyond 6 only VMEM cost grows.
NBUF = 6


def _manual_stream_loop(
    idx, steps, xr_ref, aux_ref, qs4_hbm, sc_hbm, out_ref, qbuf, sbuf, qsem,
    ssem, core=_vpu_core,
):
    """Shared ring-buffered stream loop: for j in [0, steps): DMA the j-th
    weight tile (index ``idx(j)`` into the HBM refs) into slot j%NBUF,
    overlap with the phase-MAC compute of tile j-(NBUF-1), write y tile j.
    ``core`` is the per-tile math (Q4_0 scale-only or Q4_1 delta+min).
    """

    def qdma(slot, j):
        return pltpu.make_async_copy(
            qs4_hbm.at[idx(j)], qbuf.at[slot], qsem.at[slot]
        )

    def sdma(slot, j):
        return pltpu.make_async_copy(
            sc_hbm.at[idx(j)], sbuf.at[slot], ssem.at[slot]
        )

    for j in range(NBUF - 1):  # warm-up: fill all but one slot

        @pl.when(j < steps)
        def _(j=j):
            qdma(j % NBUF, j).start()
            sdma(j % NBUF, j).start()

    def body(j, _):
        slot = j % NBUF
        pre = j + NBUF - 1

        @pl.when(pre < steps)
        def _():
            qdma(pre % NBUF, pre).start()
            sdma(pre % NBUF, pre).start()

        qdma(slot, j).wait()
        sdma(slot, j).wait()
        y = core(qbuf[slot], xr_ref, aux_ref, sbuf[slot])
        # single-row cores return [128, 1] (lane-broadcast to the output
        # tile); multi-row cores return [128, B] stored as-is
        out_ref[j] = (
            jnp.broadcast_to(y, (OUT_TILE, OUT_LANES)) if y.shape[1] == 1
            else y
        )
        return ()

    jax.lax.fori_loop(0, steps, body, (), unroll=False)


def _q4_0_vpu_kernel_manual(
    xr_ref, aux_ref, qs4_hbm, sc_hbm, out_ref, qbuf, sbuf, qsem, ssem
):
    _manual_stream_loop(
        lambda j: (j,), qs4_hbm.shape[0], xr_ref, aux_ref, qs4_hbm, sc_hbm,
        out_ref, qbuf, sbuf, qsem, ssem,
    )


def _q4_0_vpu_kernel_manual_stacked(
    il_ref, xr_ref, aux_ref, qs4_hbm, sc_hbm, out_ref, qbuf, sbuf, qsem, ssem
):
    il = il_ref[0]
    _manual_stream_loop(
        lambda j: (il, j), qs4_hbm.shape[1], xr_ref, aux_ref, qs4_hbm, sc_hbm,
        out_ref, qbuf, sbuf, qsem, ssem,
    )


def _q4_1_vpu_kernel_manual(
    xr_ref, aux_ref, qs4_hbm, sm_hbm, out_ref, qbuf, sbuf, qsem, ssem
):
    _manual_stream_loop(
        lambda j: (j,), qs4_hbm.shape[0], xr_ref, aux_ref, qs4_hbm, sm_hbm,
        out_ref, qbuf, sbuf, qsem, ssem, core=_vpu_core_q41,
    )


def _q4_1_vpu_kernel_manual_stacked(
    il_ref, xr_ref, aux_ref, qs4_hbm, sm_hbm, out_ref, qbuf, sbuf, qsem, ssem
):
    il = il_ref[0]
    _manual_stream_loop(
        lambda j: (il, j), qs4_hbm.shape[1], xr_ref, aux_ref, qs4_hbm, sm_hbm,
        out_ref, qbuf, sbuf, qsem, ssem, core=_vpu_core_q41,
    )


def _manual_scratch(lt, kh4, nb):
    return [
        pltpu.VMEM((NBUF, lt, kh4), jnp.int32),
        pltpu.VMEM((NBUF, lt, nb), jnp.float32),
        pltpu.SemaphoreType.DMA((NBUF,)),
        pltpu.SemaphoreType.DMA((NBUF,)),
    ]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _prep_inputs(x2: jnp.ndarray, kh4: int, quantize_acts: bool):
    """x2 f32 [1, in] → (xr [8, kh4] phase-major·16^-p, aux [2, nb])."""
    in_dim = kh4 * PHASES
    nb = in_dim // QK
    if quantize_acts:
        qx, dx = quantize_activations_q4_0_int(x2)
        qx = qx[0]
        dxv = dx[0]
    else:
        qx = x2[0].astype(jnp.float32)
        dxv = jnp.ones((nb,), jnp.float32)
    xsc = jnp.asarray(_XSCALE, jnp.float32)
    # group-major lane order to match the weight layout: xr[p, g·nb + b]
    # = qx[32b + 8g + p] · 16^-p
    xr = qx.reshape(nb, 4, PHASES).transpose(2, 1, 0).reshape(PHASES, kh4)
    xr = xr * xsc[:, None]  # [8, kh4]
    corr = 8.0 * qx.reshape(nb, QK).sum(axis=1)
    aux = jnp.stack([dxv, corr])  # [2, nb]
    return xr, aux


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_vpu_call(xr, aux, qs4v, scales_v, *, interpret=False):
    ot, lt, kh4 = qs4v.shape
    nb = scales_v.shape[2]
    if interpret:
        # interpreter path (CPU tests): the auto-pipelined grid kernel shares
        # _vpu_core with the manual kernel, so the math under test is the same
        out = pl.pallas_call(
            _q4_0_vpu_kernel,
            grid=(ot,),
            in_specs=[
                pl.BlockSpec((PHASES, kh4), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, nb), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lt, kh4), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lt, nb), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, lt, OUT_LANES), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
            interpret=True,
        )(xr, aux, qs4v, scales_v)
        return out[:, :, 0].reshape(ot * lt)
    out = pl.pallas_call(
        _q4_0_vpu_kernel_manual,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
        scratch_shapes=_manual_scratch(lt, kh4, nb),
        cost_estimate=pl.CostEstimate(
            flops=2 * ot * lt * kh4 * PHASES,
            bytes_accessed=ot * lt * (kh4 + nb) * 4,
            transcendentals=0,
        ),
    )(xr, aux, qs4v, scales_v)
    return out[:, :, 0].reshape(ot * lt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_vpu_call_stacked(layer_idx, xr, aux, qs4v, scales_v, *, interpret=False):
    """Stacked-layer variant: weights [L, ot, 128, ·] stay in HBM and the
    layer is chosen by indexing the HBM ref with an SMEM scalar — a lax.scan
    slicing the stack into a pallas operand would copy weight-sized buffers
    per layer."""
    L, ot, lt, kh4 = qs4v.shape
    nb = scales_v.shape[3]
    if interpret:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ot,),
            in_specs=[
                pl.BlockSpec((PHASES, kh4), lambda j, il: (0, 0)),
                pl.BlockSpec((2, nb), lambda j, il: (0, 0)),
                pl.BlockSpec((1, 1, lt, kh4), lambda j, il: (il[0], j, 0, 0)),
                pl.BlockSpec((1, 1, lt, nb), lambda j, il: (il[0], j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, lt, OUT_LANES), lambda j, il: (j, 0, 0)),
        )
        out = pl.pallas_call(
            _q4_0_vpu_kernel_stacked,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
            interpret=True,
        )(jnp.asarray([layer_idx], jnp.int32), xr, aux, qs4v, scales_v)
        return out[:, :, 0].reshape(ot * lt)
    out = pl.pallas_call(
        _q4_0_vpu_kernel_manual_stacked,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
        scratch_shapes=_manual_scratch(lt, kh4, nb),
    )(jnp.asarray([layer_idx], jnp.int32), xr, aux, qs4v, scales_v)
    return out[:, :, 0].reshape(ot * lt)


def _prep_inputs_q41(x2: jnp.ndarray, kh4: int, quantize_acts: bool):
    """x2 f32 [1, in] → (xr [8, kh4] phase-major·16^-p of x̂, aux [2, nb]
    with row 0 = per-block Σx̂).  x̂ is the q4_1 fake-quantized activation
    when ``quantize_acts`` (the reference's q4_1 matmul quantizes
    activations to q4_1 as well, ``ggml.c:6287+``)."""
    from .quantized_matmul import fake_quantize_q4_1

    in_dim = kh4 * PHASES
    nb = in_dim // QK
    xh = x2[0].astype(jnp.float32)
    if quantize_acts:
        xh = fake_quantize_q4_1(xh[None])[0]
    xsc = jnp.asarray(_XSCALE, jnp.float32)
    xr = xh.reshape(nb, 4, PHASES).transpose(2, 1, 0).reshape(PHASES, kh4)
    xr = xr * xsc[:, None]
    sx = xh.reshape(nb, QK).sum(axis=1)  # Σ_block x̂ (for the min term)
    aux = jnp.stack([sx, jnp.zeros_like(sx)])  # [2, nb]
    return xr, aux


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_1_vpu_call(xr, aux, qs4v, sm_v, *, interpret=False):
    ot, lt, kh4 = qs4v.shape
    nb2 = sm_v.shape[2]
    if interpret:
        out = pl.pallas_call(
            _q4_1_vpu_kernel,
            grid=(ot,),
            in_specs=[
                pl.BlockSpec((PHASES, kh4), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, nb2 // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lt, kh4), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lt, nb2), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, lt, OUT_LANES), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
            interpret=True,
        )(xr, aux, qs4v, sm_v)
        return out[:, :, 0].reshape(ot * lt)
    out = pl.pallas_call(
        _q4_1_vpu_kernel_manual,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
        scratch_shapes=_manual_scratch(lt, kh4, nb2),
        cost_estimate=pl.CostEstimate(
            flops=2 * ot * lt * kh4 * PHASES,
            bytes_accessed=ot * lt * (kh4 + nb2) * 4,
            transcendentals=0,
        ),
    )(xr, aux, qs4v, sm_v)
    return out[:, :, 0].reshape(ot * lt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_1_vpu_call_stacked(layer_idx, xr, aux, qs4v, sm_v, *, interpret=False):
    L, ot, lt, kh4 = qs4v.shape
    nb2 = sm_v.shape[3]
    if interpret:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ot,),
            in_specs=[
                pl.BlockSpec((PHASES, kh4), lambda j, il: (0, 0)),
                pl.BlockSpec((2, nb2 // 2), lambda j, il: (0, 0)),
                pl.BlockSpec((1, 1, lt, kh4), lambda j, il: (il[0], j, 0, 0)),
                pl.BlockSpec((1, 1, lt, nb2), lambda j, il: (il[0], j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, lt, OUT_LANES), lambda j, il: (j, 0, 0)),
        )
        out = pl.pallas_call(
            _q4_1_vpu_kernel_stacked,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
            interpret=True,
        )(jnp.asarray([layer_idx], jnp.int32), xr, aux, qs4v, sm_v)
        return out[:, :, 0].reshape(ot * lt)
    out = pl.pallas_call(
        _q4_1_vpu_kernel_manual_stacked,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
        scratch_shapes=_manual_scratch(lt, kh4, nb2),
    )(jnp.asarray([layer_idx], jnp.int32), xr, aux, qs4v, sm_v)
    return out[:, :, 0].reshape(ot * lt)


def q4_1_vpu_matvec(
    x: jnp.ndarray,
    w: Q4_1TensorV,
    *,
    quantize_acts: bool = True,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Q4_1 single-row matvec streaming packed nibbles + delta/min lanes at
    HBM rate — the 6.0-bit analogue of :func:`q4_0_vpu_matvec`."""
    qs4v = jnp.asarray(w.qs4v)
    sm_v = jnp.asarray(w.sm_v)
    ot, lt, kh4 = qs4v.shape
    lead = x.shape[:-1]
    assert int(np.prod(lead)) == 1 if lead else True, "matvec kernel: 1 row"
    x2 = _pad_x(x.reshape(1, x.shape[-1]).astype(jnp.float32), kh4 * PHASES)
    xr, aux = _prep_inputs_q41(x2, kh4, quantize_acts)
    y = _q4_1_vpu_call(xr, aux, qs4v, sm_v, interpret=interpret)
    return y.reshape(*lead, ot * lt).astype(compute_dtype)


def q4_1_vpu_matvec_stacked(
    x: jnp.ndarray,
    w: Q4_1TensorV,
    layer_idx,
    *,
    quantize_acts: bool = True,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    qs4v = jnp.asarray(w.qs4v)
    sm_v = jnp.asarray(w.sm_v)
    L, ot, lt, kh4 = qs4v.shape
    lead = x.shape[:-1]
    assert int(np.prod(lead)) == 1 if lead else True, "matvec kernel: 1 row"
    x2 = _pad_x(x.reshape(1, x.shape[-1]).astype(jnp.float32), kh4 * PHASES)
    xr, aux = _prep_inputs_q41(x2, kh4, quantize_acts)
    y = _q4_1_vpu_call_stacked(layer_idx, xr, aux, qs4v, sm_v, interpret=interpret)
    return y.reshape(*lead, ot * lt).astype(compute_dtype)


@dataclasses.dataclass
class StackedQ4VRef:
    """Stacked V-layout weights (Q4_0 or Q4_1) + traced layer index
    (scan-over-layers)."""

    w: object  # Q4_0TensorV | Q4_1TensorV; leaves have a leading [L] axis
    layer_idx: object

    def at_layer(self):
        if isinstance(self.w, Q4_1TensorV):
            return Q4_1TensorV(
                sm_v=jnp.asarray(self.w.sm_v)[self.layer_idx],
                qs4v=jnp.asarray(self.w.qs4v)[self.layer_idx],
            )
        return Q4_0TensorV(
            scales_v=jnp.asarray(self.w.scales_v)[self.layer_idx],
            qs4v=jnp.asarray(self.w.qs4v)[self.layer_idx],
        )


def _pad_x(x2: jnp.ndarray, in_dim: int) -> jnp.ndarray:
    if x2.shape[-1] < in_dim:
        x2 = jnp.pad(x2, ((0, 0), (0, in_dim - x2.shape[-1])))
    return x2


def q4_0_vpu_matvec(
    x: jnp.ndarray,
    w: Q4_0TensorV,
    *,
    quantize_acts: bool = True,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """``y[..., out] = x[..., in] @ deq(W).T`` for a single activation row.

    Integer-exact reference semantics when ``quantize_acts`` (the default):
    matches ``ggml_vec_dot_q4_0`` with scalar-rounded activation quantization
    end to end.
    """
    qs4v = jnp.asarray(w.qs4v)
    scales_v = jnp.asarray(w.scales_v)
    ot, lt, kh4 = qs4v.shape
    lead = x.shape[:-1]
    assert int(np.prod(lead)) == 1 if lead else True, "matvec kernel: 1 row"
    x2 = _pad_x(x.reshape(1, x.shape[-1]).astype(jnp.float32), kh4 * PHASES)
    xr, aux = _prep_inputs(x2, kh4, quantize_acts)
    y = _q4_0_vpu_call(xr, aux, qs4v, scales_v, interpret=interpret)
    return y.reshape(*lead, ot * lt).astype(compute_dtype)


def q4_0_vpu_matvec_stacked(
    x: jnp.ndarray,
    w: Q4_0TensorV,
    layer_idx,
    *,
    quantize_acts: bool = True,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    qs4v = jnp.asarray(w.qs4v)
    scales_v = jnp.asarray(w.scales_v)
    L, ot, lt, kh4 = qs4v.shape
    lead = x.shape[:-1]
    assert int(np.prod(lead)) == 1 if lead else True, "matvec kernel: 1 row"
    x2 = _pad_x(x.reshape(1, x.shape[-1]).astype(jnp.float32), kh4 * PHASES)
    xr, aux = _prep_inputs(x2, kh4, quantize_acts)
    y = _q4_0_vpu_call_stacked(
        layer_idx, xr, aux, qs4v, scales_v, interpret=interpret
    )
    return y.reshape(*lead, ot * lt).astype(compute_dtype)


# ---------------------------------------------------------------------------
# multi-row (batched-decode) kernels: one weight stream, B activation rows
# ---------------------------------------------------------------------------

#: rows the multi-row kernel accepts.  Cost model: per packed word the VPU
#: does 2 shared dequant ops (mask+convert) + B FMAs → (2+B) ops/weight
#: against the ~2.9 ops/weight budget at the HBM roofline, so small batches
#: are bandwidth-bound-ish and large batches compute-bound but still far
#: faster than re-streaming weights per row (vmap) or the dense-dequant
#: fallback (2 extra HBM passes).  32 keeps the per-slot VMEM state small.
MAX_MULTI_ROWS = 32


def _vpu_core_multi(xl, xr_ref, aux_ref, scales, B: int):
    """B-row extension of :func:`_vpu_core`.

    xl: i32 [128, KH4]; xr: f32 [B·8, KH4] (rows b·8+p = row b's phase p,
    pre-scaled by 16^-p); aux: f32 [2·B, NB] (rows 2b / 2b+1 = row b's d_x /
    8·Σq); scales: f32 [128, NB].  Returns y [128, B] f32.

    The nibble isolation (AND + exact int→f32 convert) is shared across the
    B rows — the dequant cost amortizes over the batch, which is the entire
    point vs running the matvec B times.  It runs per GROUP (the 4
    group-major lane segments of the packed layout) rather than hoisting
    all 8 whole-tile nibble planes: the hoisted form's live set is
    8·kh4·128·4 B and blows the 16 MB scoped-VMEM stack at 13B shapes
    (compile-time OOM, r5).
    """
    kh4 = xl.shape[1]
    nb = kh4 // 4
    seg = min(nb, 128)  # block segment: bounds live state at any B
    ys = [None] * B
    for s0 in range(0, nb, seg):
        s1 = min(s0 + seg, nb)
        accbs = [None] * B
        for g in range(4):
            xg = xl[:, g * nb + s0 : g * nb + s1]
            nibs = [
                (xg & _MASKS[p]).astype(jnp.float32) for p in range(7)
            ] + [jax.lax.shift_right_logical(xg, 28).astype(jnp.float32)]
            for b in range(B):
                acc = nibs[0] * xr_ref[
                    b * 8 : b * 8 + 1, g * nb + s0 : g * nb + s1
                ]
                for p in range(1, PHASES):
                    acc = acc + nibs[p] * xr_ref[
                        b * 8 + p : b * 8 + p + 1, g * nb + s0 : g * nb + s1
                    ]
                accbs[b] = acc if accbs[b] is None else accbs[b] + acc
        for b in range(B):
            s_eff = scales[:, s0:s1] * aux_ref[2 * b : 2 * b + 1, s0:s1]
            part = jnp.sum(
                (accbs[b] - aux_ref[2 * b + 1 : 2 * b + 2, s0:s1]) * s_eff,
                axis=1, keepdims=True,
            )
            ys[b] = part if ys[b] is None else ys[b] + part
    return jnp.concatenate(ys, axis=1)  # [128, B]


def _make_multi_kernel(B: int, stacked: bool):
    def core(xl, xr_ref, aux_ref, scales):
        return _vpu_core_multi(xl, xr_ref, aux_ref, scales, B)

    if stacked:

        def kernel(il_ref, xr_ref, aux_ref, qs4_hbm, sc_hbm, out_ref,
                   qbuf, sbuf, qsem, ssem):
            il = il_ref[0]
            _manual_stream_loop(
                lambda j: (il, j), qs4_hbm.shape[1], xr_ref, aux_ref,
                qs4_hbm, sc_hbm, out_ref, qbuf, sbuf, qsem, ssem, core=core,
            )

        return kernel

    def kernel(xr_ref, aux_ref, qs4_hbm, sc_hbm, out_ref,
               qbuf, sbuf, qsem, ssem):
        _manual_stream_loop(
            lambda j: (j,), qs4_hbm.shape[0], xr_ref, aux_ref,
            qs4_hbm, sc_hbm, out_ref, qbuf, sbuf, qsem, ssem, core=core,
        )

    return kernel


def _multi_grid_kernel(B: int):
    """Auto-pipelined grid variant for interpret mode (shares the core)."""

    def kernel(xr_ref, aux_ref, qs4_ref, scales_ref, out_ref):
        out_ref[0] = _vpu_core_multi(
            qs4_ref[0], xr_ref, aux_ref, scales_ref[0], B
        )

    return kernel


def _multi_grid_kernel_stacked(B: int):
    def kernel(il_ref, xr_ref, aux_ref, qs4_ref, scales_ref, out_ref):
        del il_ref  # consumed by the BlockSpec index maps
        out_ref[0] = _vpu_core_multi(
            qs4_ref[0, 0], xr_ref, aux_ref, scales_ref[0, 0], B
        )

    return kernel


def _prep_inputs_multi(x2: jnp.ndarray, kh4: int, quantize_acts: bool):
    """x2 f32 [B, in] → (xr [B·8, kh4], aux [2B, nb]) — the B-row operand
    set of :func:`_vpu_core_multi` (row-interleaved per slot)."""
    B = x2.shape[0]
    in_dim = kh4 * PHASES
    nb = in_dim // QK
    if quantize_acts:
        qx, dx = quantize_activations_q4_0_int(x2)  # [B, in], [B, nb]
    else:
        qx = x2.astype(jnp.float32)
        dx = jnp.ones((B, nb), jnp.float32)
    xsc = jnp.asarray(_XSCALE, jnp.float32)
    xr = qx.reshape(B, nb, 4, PHASES).transpose(0, 3, 2, 1).reshape(
        B, PHASES, kh4
    ) * xsc[None, :, None]
    xr = xr.reshape(B * PHASES, kh4)
    corr = 8.0 * qx.reshape(B, nb, QK).sum(axis=2)  # [B, nb]
    aux = jnp.stack([dx, corr], axis=1).reshape(2 * B, nb)
    return xr, aux


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_vpu_call_multi(xr, aux, qs4v, scales_v, *, interpret=False):
    ot, lt, kh4 = qs4v.shape
    nb = scales_v.shape[2]
    B = xr.shape[0] // PHASES
    if interpret:
        out = pl.pallas_call(
            _multi_grid_kernel(B),
            grid=(ot,),
            in_specs=[
                pl.BlockSpec((B * PHASES, kh4), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * B, nb), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lt, kh4), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lt, nb), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, lt, B), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((ot, lt, B), jnp.float32),
            interpret=True,
        )(xr, aux, qs4v, scales_v)
        return out.transpose(2, 0, 1).reshape(B, ot * lt)
    out = pl.pallas_call(
        _make_multi_kernel(B, stacked=False),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, lt, B), jnp.float32),
        scratch_shapes=_manual_scratch(lt, kh4, nb),
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
    )(xr, aux, qs4v, scales_v)
    return out.transpose(2, 0, 1).reshape(B, ot * lt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_0_vpu_call_multi_stacked(layer_idx, xr, aux, qs4v, scales_v, *,
                                 interpret=False):
    L, ot, lt, kh4 = qs4v.shape
    nb = scales_v.shape[3]
    B = xr.shape[0] // PHASES
    if interpret:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ot,),
            in_specs=[
                pl.BlockSpec((B * PHASES, kh4), lambda j, il: (0, 0)),
                pl.BlockSpec((2 * B, nb), lambda j, il: (0, 0)),
                pl.BlockSpec((1, 1, lt, kh4), lambda j, il: (il[0], j, 0, 0)),
                pl.BlockSpec((1, 1, lt, nb), lambda j, il: (il[0], j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, lt, B), lambda j, il: (j, 0, 0)),
        )
        out = pl.pallas_call(
            _multi_grid_kernel_stacked(B),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ot, lt, B), jnp.float32),
            interpret=True,
        )(jnp.asarray([layer_idx], jnp.int32), xr, aux, qs4v, scales_v)
        return out.transpose(2, 0, 1).reshape(B, ot * lt)
    out = pl.pallas_call(
        _make_multi_kernel(B, stacked=True),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, lt, B), jnp.float32),
        scratch_shapes=_manual_scratch(lt, kh4, nb),
        compiler_params=pltpu.CompilerParams(
            # the default 16 MB scoped-VMEM limit rejects large-in-dim tiles
            # at compile time; the chunked core's working set is far smaller
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(jnp.asarray([layer_idx], jnp.int32), xr, aux, qs4v, scales_v)
    return out.transpose(2, 0, 1).reshape(B, ot * lt)


def q4_0_vpu_matmul_multi(
    x: jnp.ndarray,  # [..., in] with 2 <= prod(lead) <= MAX_MULTI_ROWS
    w: Q4_0TensorV,
    layer_idx=None,  # not None: w leaves carry a leading [L] axis
    *,
    quantize_acts: bool = True,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched-decode Q4_0 matmul: streams the packed weights ONCE for all
    B rows (the continuous-batching analogue of :func:`q4_0_vpu_matvec`;
    exact ``ggml_vec_dot_q4_0`` int4×int4 semantics per row).
    """
    qs4v = jnp.asarray(w.qs4v)
    scales_v = jnp.asarray(w.scales_v)
    kh4 = qs4v.shape[-1]
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    assert 1 <= B <= MAX_MULTI_ROWS, B
    x2 = _pad_x(x.reshape(B, x.shape[-1]).astype(jnp.float32), kh4 * PHASES)
    xr, aux = _prep_inputs_multi(x2, kh4, quantize_acts)
    if layer_idx is None:
        y = _q4_0_vpu_call_multi(xr, aux, qs4v, scales_v, interpret=interpret)
    else:
        y = _q4_0_vpu_call_multi_stacked(
            layer_idx, xr, aux, qs4v, scales_v, interpret=interpret
        )
    out = qs4v.shape[-3] * qs4v.shape[-2]
    return y.reshape(*lead, out).astype(compute_dtype)


# ---------------------------------------------------------------------------
# bandwidth probe (microbench only)
# ---------------------------------------------------------------------------


def _stream_probe_kernel(b_ref, qs4_ref, out_ref):
    t = qs4_ref[0] + b_ref[0, 0]  # data dependency: keeps timing loops honest
    out_ref[0] = jnp.broadcast_to(
        jnp.sum(t, axis=1, keepdims=True), (OUT_TILE, OUT_LANES)
    ).astype(jnp.float32)


@jax.jit
def stream_probe(qs4v, bias):
    """Reads every weight byte with ~minimal VPU work: the pure-HBM-stream
    upper bound for this grid/launch structure.  ``bias`` (i32 scalar) is
    mixed in so repeated calls in a timing loop can't be CSE'd/hoisted."""
    ot, lt, kh4 = qs4v.shape
    out = pl.pallas_call(
        _stream_probe_kernel,
        grid=(ot,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, lt, kh4), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, lt, OUT_LANES), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
    )(bias.reshape(1, 1).astype(jnp.int32), qs4v)
    return out[:, 0, 0]
