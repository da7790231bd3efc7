"""Fused transformer kernels for batch-1 decode, in two generations:

* ``fused_layers_block`` — the r5 WHOLE-STACK megakernel and serving
  default: ONE pallas call runs ALL L layers.  A single weight-DMA ring is
  routed across every matmul of every layer via static phase-successor
  chains (wqkv → wo → w13 → w2 → next layer's wqkv), so the HBM weight
  stream never stops — not at the attn/FFN boundary, not at layer
  boundaries.  KV history chunks for layer il start streaming at il's
  FIRST wqkv tile and are consumed by the in-kernel flash attention one
  weight-phase later.  All glue (norm, activation quant/prep, rope,
  online-softmax attention, SwiGLU, residuals) runs between DMA waits;
  the per-layer K/V of the new token come back as outputs for one
  all-layers cache write in XLA.

* ``fused_attn_block`` / ``fused_ffn_block`` — the r4 two-kernels-per-
  layer design (kept for tests and as a reference point): same dataflow,
  but the DMA pipe drained 2L times per token at kernel boundaries
  (151.2 → 157-167 tok/s at 7B from the merge).

Why fused at all: the r3 decode trace showed ~1.1 ms/step of XLA glue
between per-matmul kernels against a 5.5 ms weight-stream floor.

**W layout** (`Q4_0TensorW`): contraction on SUBLANES, out rows on LANES —
``qs4w`` i32 [out/128, in/8, 128], ``scales_w`` f32 [out/128, in/32, 128].
The matvec accumulates over sublanes and yields each tile's 128 outputs as
a LANE row [1, 128], which is exactly the orientation the next stage's
activation prep consumes — no sublane↔lane transposes between stages.

**Block permutation.**  Mosaic cannot lower a lane-splitting reshape (it
crashes on ``[1,4096]→(128,32)``), so the in-kernel activation prep builds
the phase-major operand with only proven-lowerable ops (2-D transpose,
leading-dim split/transpose, lanes-merge, lane rolls):

  h [R,128] → roll-based per-32-block quant → q [R,128] → qᵀ [128,R]
    → [4(g'),4(o),8(p),R(r)] → transpose(2,1,0,3) → merge [8, in/8] → ᵀ

which emits activation lanes in the order ``o·nb + g'·R + r`` for flat
element ``32·(4r+g') + 8o+p``.  The weight packer permutes blocks by
``λ(β) = (β%4)·R + β//4`` so weight sublane ``o·nb + λ(β)`` meets exactly
that activation — the permutation lives entirely inside the layout and the
dot is unchanged.

Numerics: identical to ``q4_0_vpu_pallas`` — exact int nibble arithmetic,
per-block −8 correction and d_w·d_x scaling (``ggml_vec_dot_q4_0``,
``ggml.c:1296-1582``); mean-centered ggml norm; adjacent-pair rope via lane
rolls; online-softmax attention over the unmodified [L, H, n_ctx, Dh]
cache with the same j ≤ n_past mask.
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

PHASES = 8
LANES = 128
NBUF = 6  # weight-tile DMA ring depth (see q4_vpu_pallas.NBUF rationale)
KVBUF = 3  # attention chunk ring depth
NEG_INF = -1e30


def block_perm(nb: int) -> np.ndarray:
    """λ such that packed position λ holds logical block ``4·(λ%R)+λ//R``
    (R = nb//4): the inverse of the prep chain's natural emission order."""
    R = nb // 4
    lam = np.arange(nb)
    return 4 * (lam % R) + lam // R


@dataclasses.dataclass
class Q4_0TensorW:
    """Q4_0 weight packed for the fused-layer kernels: the V-layout geometry
    (out rows on sublanes, packed in-dim on lanes — `q4_vpu_pallas`) with
    the blocks PRE-PERMUTED by λ so the in-kernel Mosaic prep chain emits
    activations in exactly the packed lane order.  The matvec core is the
    measured-at-762-GB/s `_vpu_core` unchanged.  Requires in % 4096 == 0
    (same lane-alignment rule as the V layout)."""

    scales_w: jnp.ndarray  # f32 [out/128, 128, in/32]  (λ block order)
    qs4w: jnp.ndarray  # i32 [out/128, 128, in/8]  (group-major over λ)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.qs4w.shape[0] * LANES, self.qs4w.shape[2] * PHASES)

    @classmethod
    def from_q4_0(cls, w: Q4_0Tensor) -> "Q4_0TensorW":
        from .q4_vpu_pallas import _pack_qs_v

        qs = np.asarray(w.qs)  # u8 [out, in/2]
        scales = np.asarray(w.scales).astype(np.float32)  # [out, nb]
        out, kh = qs.shape
        nb = kh // 16
        assert out % LANES == 0 and nb % LANES == 0, (out, nb)
        perm = block_perm(nb)
        qs = qs.reshape(out, nb, 16)[:, perm].reshape(out, kh)
        scales = scales[:, perm]
        ot = out // LANES
        return cls(
            scales_w=np.ascontiguousarray(scales.reshape(ot, LANES, nb)),
            qs4w=_pack_qs_v(qs),
        )

    def to_q4_0(self) -> Q4_0Tensor:
        from .q4_vpu_pallas import _unpack_qs_v

        qs = _unpack_qs_v(self.qs4w)
        scales = np.asarray(self.scales_w)
        ot, lt, nb = scales.shape
        out = ot * lt
        inv = np.argsort(block_perm(nb))
        qs = qs.reshape(out, nb, 16)[:, inv].reshape(out, nb * 16)
        return Q4_0Tensor(scales=scales.reshape(out, nb)[:, inv], qs=qs)


jax.tree_util.register_pytree_node(
    Q4_0TensorW,
    lambda t: ((t.scales_w, t.qs4w), None),
    lambda _, leaves: Q4_0TensorW(*leaves),
)


@dataclasses.dataclass
class StackedQ4WRef:
    """Stacked W-layout weights + traced layer index: lets the prefill
    matmul dequantize straight out of the [L, ...] HBM stack instead of
    dynamic-slicing the layer's packed bytes first (a full-weight copy)."""

    w: "Q4_0TensorW"  # leaves carry a leading [L] axis
    layer_idx: object


def dequantize_q4_0w_jnp(w: Q4_0TensorW, dtype=jnp.float32) -> jnp.ndarray:
    """Dense [out, in] from the fused layout (prefill / fallback path)."""
    from .q4_vpu_pallas import Q4_0TensorV, dequantize_q4_0v_jnp

    dense = dequantize_q4_0v_jnp(
        Q4_0TensorV(scales_v=w.scales_w, qs4v=w.qs4w), dtype=dtype
    )  # λ block order
    out, in_dim = dense.shape
    nb = in_dim // QK
    inv = jnp.asarray(np.argsort(block_perm(nb)))
    return dense.reshape(out, nb, QK)[:, inv].reshape(out, in_dim)


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------

_MASKS = [0xF << (4 * p) for p in range(7)]  # phase 7 uses a logical shift
_XSC = [float(16.0 ** -p) for p in range(7)] + [1.0]


def _ggml_norm_row(x, w, norm_type: str, eps: float):
    """x, w: [1, D] f32 — mean-centered ggml norm (or rmsnorm) · weight.

    Also correct for 2-D [R, 128] row-major activations (the reductions are
    over the whole array either way)."""
    if norm_type == "layernorm":
        mean = jnp.mean(x)
        c = x - mean
        var = jnp.mean(c * c)
        return (c / jnp.sqrt(var + eps)) * w
    ms = jnp.mean(x * x)
    return (x / jnp.sqrt(ms + eps)) * w


def _xsc_col():
    """[8, 1] column of 16^-p (p<7) and 1.0 (p=7), built from iota (array
    constants cannot be captured by pallas kernels)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (PHASES, 1), 0)
    return jnp.where(p == 7, 1.0, jnp.exp2(-4.0 * p.astype(jnp.float32)))


def _quant_prep(h):
    """h [1, D] f32 → (xr [8, D/8] phase rows ·16^-p, aux [2, nb]) in PACKED
    λ block order — the operand set of ``q4_vpu_pallas._vpu_core`` (aux row
    0: activation block scales d_x; row 1: 8·Σ_block q).

    Exact reference activation quantization: per-32-block amax/7 scale,
    round half away from zero (``ggml.c:568-601``).
    NOTE: this reshape formulation is the interpret-mode specification; the
    Mosaic path substitutes the roll/slice/concat formulation (tested
    bit-equal)."""
    D = h.shape[1]
    nb = D // QK
    R = nb // 4
    hb = h.reshape(nb, QK)
    amax = jnp.max(jnp.abs(hb), axis=1)
    d = amax / 7.0
    inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    q = jnp.trunc(hb * inv[:, None] + jnp.where(hb >= 0, 0.5, -0.5))
    corr = 8.0 * jnp.sum(q, axis=1)

    def pack(a):  # [nb, ...] logical block order -> packed order λ = g'R + r
        return a.reshape(R, 4, *a.shape[1:]).swapaxes(0, 1).reshape(a.shape)

    qp = pack(q)  # [nb(λ), 32]
    xr = qp.reshape(nb, 4, PHASES).transpose(2, 1, 0).reshape(PHASES, 4 * nb)
    xr = xr * _xsc_col()
    aux = jnp.stack([pack(d), pack(corr)])  # [2, nb]
    return xr, aux


def _quant_prep2d_interp(y):
    """Interpret-mode 2-D prep: y [R, 128] row-major (row r = elements
    [128r, 128(r+1))) → the same (xr, aux) as :func:`_quant_prep`."""
    return _quant_prep(y.reshape(1, y.shape[0] * LANES))


def _pad_rows(y, rows: int):
    """Zero-pad [R, 128] activations along sublanes up to ``rows`` (the
    weight in-dim / 128); zero blocks quantize to zero and contribute
    nothing — the 2-D analogue of :func:`_pad_h`."""
    pad = rows - y.shape[0]
    if pad:
        y = jnp.concatenate([y, jnp.zeros((pad, LANES), jnp.float32)], axis=0)
    return y


def _quant_prep_mosaic(h):
    """Mosaic-lowerable `_quant_prep`: identical outputs, expressed with only
    ops the TPU compiler accepts (probed r3): [1,N]→[N/128,128] reshape,
    lane rolls (segmented per-32-block max/sum + broadcast), 2-D transposes,
    contiguous sublane slices, lane/sublane concatenation.  The natural
    reshape formulation crashes Mosaic on lane-splitting reshapes; this one
    never splits lanes."""
    return _quant_prep2d_mosaic(h.reshape(h.shape[1] // LANES, LANES))


def _quant_prep2d_mosaic(y):
    """2-D core of :func:`_quant_prep_mosaic`: y [R, 128] row-major
    activations (row r = elements [128r, 128(r+1)))."""
    R = y.shape[0]
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1) % QK

    def seg_reduce(a, op):
        # windowed op over [l, l+31] (read only at 32-aligned lane starts)
        for k in (1, 2, 4, 8, 16):
            a = op(a, pltpu.roll(a, shift=LANES - k, axis=1))
        return a

    def seg_broadcast(a):
        # every lane takes the value from its 32-aligned segment start
        for k in (1, 2, 4, 8, 16):
            a = jnp.where((lane32 & k) != 0, pltpu.roll(a, shift=k, axis=1), a)
        return a

    d_full = seg_broadcast(seg_reduce(jnp.abs(y), jnp.maximum)) / 7.0
    inv = jnp.where(d_full > 0, 1.0 / jnp.where(d_full > 0, d_full, 1.0), 0.0)
    q = jnp.trunc(y * inv + jnp.where(y >= 0, 0.5, -0.5))
    corr_full = 8.0 * seg_broadcast(seg_reduce(q, jnp.add))

    qT = q.T  # [128, R]; row l = 32g' + 8o + p
    pieces = [
        qT[QK * g + PHASES * o : QK * g + PHASES * o + PHASES, :]
        for o in range(4)
        for g in range(4)
    ]
    xr = jnp.concatenate(pieces, axis=1)  # [8, 16R]; lane = o·4R + g'·R + r
    xr = xr * _xsc_col()

    def row(full):  # [R,128] block-broadcast stats -> [1, 4R] packed lane row
        t4 = full.T.reshape(4, QK, R)[:, 0, :]  # [4(g'), R] at segment starts
        return jnp.concatenate(
            [t4[g : g + 1, :] for g in range(4)], axis=1
        )  # [1, 4R], lane λ = g'·R + r

    aux = jnp.concatenate([row(d_full), row(corr_full)], axis=0)  # [2, nb]
    return xr, aux


def _rope_row(x, cos_row, sin_srow):
    """Adjacent-pair rope on [H, 128] lane-major rows via lane rolls:
    y = x·cos + swap(x)·sin_signed (swap exchanges each (2i, 2i+1) pair;
    sin_srow carries −sin at even lanes, +sin at odd)."""
    left = pltpu.roll(x, shift=LANES - 1, axis=1)  # x[l+1]
    right = pltpu.roll(x, shift=1, axis=1)  # x[l-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    swap = jnp.where(lane % 2 == 0, left, right)
    return x * cos_row + swap * sin_srow


def rope_vectors(n_past, head_dim: int = 128):
    """(cos_row, sin_signed_row) [1, head_dim] f32 for position ``n_past`` —
    computed once per decode step in XLA and passed into the attn kernel.
    theta_j = 10000^(-2j/d) (``ggml.c:7076-7131``)."""
    j = jnp.arange(head_dim // 2, dtype=jnp.float32)
    theta = jnp.float32(10000.0) ** (-2.0 * j / head_dim)
    ang = n_past.astype(jnp.float32) * theta
    cos = jnp.repeat(jnp.cos(ang), 2)[None, :]
    sin = jnp.sin(ang)
    sin_s = jnp.stack([-sin, sin], axis=1).reshape(-1)[None, :]
    return cos, sin_s


# ---------------------------------------------------------------------------
# fused FFN block kernel
# ---------------------------------------------------------------------------


def _pad_h(h, kh4: int):
    """Zero-pad activations along lanes to the weight's (4096-aligned)
    in-dim; zero blocks quantize to zero and contribute nothing."""
    pad = kh4 * PHASES - h.shape[1]
    if pad:
        h = jnp.concatenate([h, jnp.zeros((1, pad), jnp.float32)], axis=1)
    return h


def _make_ffn_kernel(ot13: int, ot2: int, kh4_13: int, kh4_2: int,
                     norm_type: str, eps: float, mosaic_prep: bool):
    from .q4_vpu_pallas import _vpu_core

    nb13 = kh4_13 // 4
    nb2 = kh4_2 // 4
    steps = ot13 + ot2
    in2 = kh4_2 * PHASES

    def kernel(s_ref, x_ref, nw_ref, w13_qs, w13_sc, w2_qs, w2_sc,
               out_ref, qbuf, sbuf, gbuf, xr_ref, aux_ref, qsem, ssem):
        il = s_ref[0]

        def w13_copies(slot, j):
            return (
                pltpu.make_async_copy(
                    w13_qs.at[il, j], qbuf.at[slot, :, :kh4_13], qsem.at[slot]
                ),
                pltpu.make_async_copy(
                    w13_sc.at[il, j], sbuf.at[slot, :, :nb13], ssem.at[slot]
                ),
            )

        def w2_copies(slot, j):
            return (
                pltpu.make_async_copy(
                    w2_qs.at[il, j - ot13], qbuf.at[slot], qsem.at[slot]
                ),
                pltpu.make_async_copy(
                    w2_sc.at[il, j - ot13], sbuf.at[slot, :, :nb2], ssem.at[slot]
                ),
            )

        def start(j):
            slot = j % NBUF

            @pl.when(j < ot13)
            def _():
                a, b = w13_copies(slot, j)
                a.start()
                b.start()

            @pl.when(jnp.logical_and(j >= ot13, j < steps))
            def _():
                a, b = w2_copies(slot, j)
                a.start()
                b.start()

        for w in range(NBUF - 1):  # warm-up before any compute
            start(jnp.int32(w))

        # norm + quant/prep overlap the warm-up DMAs
        prep = _quant_prep_mosaic if mosaic_prep else _quant_prep
        h = _ggml_norm_row(x_ref[:, :], nw_ref[:, :], norm_type, eps)
        xr1, aux1 = prep(_pad_h(h, kh4_13))

        def body(j, carry):
            slot = j % NBUF
            start(j + NBUF - 1)

            @pl.when(j < ot13)
            def _():
                a, b = w13_copies(slot, j)
                a.wait()
                b.wait()
                y = _vpu_core(
                    qbuf[slot, :, :kh4_13], xr1, aux1, sbuf[slot, :, :nb13]
                )  # [128, 1]
                gbuf[j] = jnp.broadcast_to(y.T, (8, LANES))

            @pl.when(j == ot13)
            def _():
                # SwiGLU + w2 prep — w2's tiles already streaming
                g1 = gbuf[0 : ot13 // 2, 0, :]
                g3 = gbuf[ot13 // 2 : ot13, 0, :]
                gate = (g1 / (1.0 + jnp.exp(-g1))) * g3  # exact f32 silu
                xr2, aux2 = prep(_pad_h(gate.reshape(1, -1), kh4_2))
                xr_ref[:, :] = xr2
                aux_ref[:, :] = aux2

            @pl.when(j >= ot13)
            def _():
                a, b = w2_copies(slot, j)
                a.wait()
                b.wait()
                y = _vpu_core(
                    qbuf[slot], xr_ref[:, :], aux_ref[:, :],
                    sbuf[slot, :, :nb2],
                )
                out_ref[j - ot13] = jnp.broadcast_to(y.T, (8, LANES))

            return carry

        jax.lax.fori_loop(0, steps, body, 0, unroll=False)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("norm_type", "eps", "ff_real", "interpret")
)
def fused_ffn_block(
    x,  # [1, D] f32
    ffn_norm,  # [1, D] f32
    w13_qs, w13_sc,  # stacked fused layout [L, ot13, 128, kh4_13]/[.., nb13]
    w2_qs, w2_sc,  # [L, ot2, 128, kh4_2] / [.., 128, nb2]
    layer_idx,
    *,
    norm_type: str = "layernorm",
    eps: float = 1e-5,
    ff_real: int = 0,  # real (unpadded) n_ff — gbuf live rows = 2*ff_real/128
    interpret: bool = False,
):
    """w2·(silu(g1)⊙g3) with [g1;g3] = w13·quant(norm(x)·w) — one kernel, one
    continuous weight-DMA stream.  Returns delta tiles [ot2, 8, 128] (row 0
    live); the caller adds the residual (a tile-aligned store is the only
    fast dynamic store shape, so the [1, D] assembly happens in XLA)."""
    L, ot13, _, kh4_13 = w13_qs.shape
    _, ot2, _, kh4_2 = w2_qs.shape
    D = x.shape[1]
    assert ot13 == 2 * ff_real // LANES, (ot13, ff_real)
    kernel = _make_ffn_kernel(
        ot13, ot2, kh4_13, kh4_2, norm_type, eps, mosaic_prep=not interpret
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot2, 8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NBUF, LANES, kh4_2), jnp.int32),
            pltpu.VMEM((NBUF, LANES, max(kh4_13, kh4_2) // 4), jnp.float32),
            pltpu.VMEM((ot13, 8, LANES), jnp.float32),
            pltpu.VMEM((PHASES, kh4_2), jnp.float32),
            pltpu.VMEM((2, kh4_2 // 4), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.asarray([layer_idx], jnp.int32), x, ffn_norm,
        w13_qs, w13_sc, w2_qs, w2_sc,
    )


# ---------------------------------------------------------------------------
# fused attention block kernel
# ---------------------------------------------------------------------------


def _make_attn_kernel(H: int, ot_qkv: int, kh4: int, ctx_chunk: int,
                      norm_type: str, eps: float, mosaic_prep: bool):
    from .q4_vpu_pallas import _vpu_core

    nb = kh4 // 4
    steps = ot_qkv + H  # wqkv tiles then wo tiles (wo out = D = H·128)
    D = H * LANES

    def kernel(s_ref, x_ref, nw_ref, cos_ref, sin_ref,
               wqkv_qs, wqkv_sc, wo_qs, wo_sc, kc, vc,
               out_ref, knew_ref, vnew_ref,
               qbuf, sbuf, qkvbuf, xr_ref, aux_ref, kvbuf,
               qsem, ssem, kvsem):
        il = s_ref[0]
        n_past = s_ref[1]
        prep = _quant_prep_mosaic if mosaic_prep else _quant_prep

        def qkv_copies(slot, j):
            return (
                pltpu.make_async_copy(
                    wqkv_qs.at[il, j], qbuf.at[slot], qsem.at[slot]
                ),
                pltpu.make_async_copy(
                    wqkv_sc.at[il, j], sbuf.at[slot], ssem.at[slot]
                ),
            )

        def wo_copies(slot, j):
            return (
                pltpu.make_async_copy(
                    wo_qs.at[il, j - ot_qkv], qbuf.at[slot], qsem.at[slot]
                ),
                pltpu.make_async_copy(
                    wo_sc.at[il, j - ot_qkv], sbuf.at[slot], ssem.at[slot]
                ),
            )

        def start(j):
            slot = j % NBUF

            @pl.when(j < ot_qkv)
            def _():
                a, b = qkv_copies(slot, j)
                a.start()
                b.start()

            @pl.when(jnp.logical_and(j >= ot_qkv, j < steps))
            def _():
                a, b = wo_copies(slot, j)
                a.start()
                b.start()

        for w in range(NBUF - 1):
            start(jnp.int32(w))

        h = _ggml_norm_row(x_ref[:, :], nw_ref[:, :], norm_type, eps)
        xr1, aux1 = prep(_pad_h(h, kh4))
        scale = 1.0 / float(np.sqrt(128.0))

        def kv_copy(slot, c):
            off = pl.multiple_of(c * ctx_chunk, ctx_chunk)
            return (
                pltpu.make_async_copy(
                    kc.at[il, :, pl.ds(off, ctx_chunk), :],
                    kvbuf.at[slot, 0], kvsem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    vc.at[il, :, pl.ds(off, ctx_chunk), :],
                    kvbuf.at[slot, 1], kvsem.at[slot, 1],
                ),
            )

        def body(j, carry):
            slot = j % NBUF
            start(j + NBUF - 1)

            @pl.when(j < ot_qkv)
            def _():
                a, b = qkv_copies(slot, j)
                a.wait()
                b.wait()
                y = _vpu_core(qbuf[slot], xr1, aux1, sbuf[slot])
                qkvbuf[j] = jnp.broadcast_to(y.T, (8, LANES))

            @pl.when(j == ot_qkv)
            def _():
                # ---- rope + attention + wo prep -------------------------
                # the new token's K/V never touch the cache here (a dynamic
                # single-row cache DMA is a sub-tile store Mosaic cannot
                # express): they go out as kernel outputs (written back by
                # XLA) and enter the softmax as an explicit extra term.
                q = _rope_row(qkvbuf[0:H, 0, :], cos_ref[:, :], sin_ref[:, :])
                k = _rope_row(
                    qkvbuf[H : 2 * H, 0, :], cos_ref[:, :], sin_ref[:, :]
                )
                v = qkvbuf[2 * H : 3 * H, 0, :]
                # round-trip through the cache dtype so the new token's own
                # softmax term sees exactly what later steps will read back
                k = k.astype(kvbuf.dtype).astype(jnp.float32)
                v = v.astype(kvbuf.dtype).astype(jnp.float32)
                knew_ref[:, :] = k
                vnew_ref[:, :] = v

                # chunks cover history j < n_past only
                n_live = (n_past + ctx_chunk - 1) // ctx_chunk
                for c0 in range(KVBUF - 1):

                    @pl.when(c0 < n_live)
                    def _(c0=c0):
                        a, b = kv_copy(c0 % KVBUF, jnp.int32(c0))
                        a.start()
                        b.start()

                def att_body(c, att):
                    m, l, acc = att
                    slot = c % KVBUF
                    pre = c + KVBUF - 1

                    @pl.when(pre < n_live)
                    def _():
                        a, b = kv_copy(pre % KVBUF, pre)
                        a.start()
                        b.start()

                    a, b = kv_copy(slot, c)
                    a.wait()
                    b.wait()
                    kcb = kvbuf[slot, 0].astype(jnp.float32)  # [H, C, 128]
                    vcb = kvbuf[slot, 1].astype(jnp.float32)
                    # Precision.HIGHEST: Mosaic lowers f32 dots to the MXU
                    # at single-pass bf16 by default — interpret mode (and
                    # the CPU tests) compute exact f32, and the ~1e-3/layer
                    # drift compounds to ~0.19 rel logit error over 32
                    # layers (caught by experiments/tpu_selfcheck.py r4).
                    # Attention FLOPs are tiny vs the weight stream, so the
                    # multi-pass cost is free.
                    s = jnp.concatenate(
                        [
                            jax.lax.dot_general(
                                q[hh : hh + 1, :], kcb[hh],
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            )
                            for hh in range(H)
                        ],
                        axis=0,
                    ) * scale  # [H, C]
                    jidx = c * ctx_chunk + jax.lax.broadcasted_iota(
                        jnp.int32, (H, ctx_chunk), 1
                    )
                    s = jnp.where(jidx < n_past, s, NEG_INF)
                    m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                    alpha = jnp.exp(m - m_new)
                    p = jnp.exp(s - m_new)
                    l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
                    pv = jnp.concatenate(
                        [
                            jax.lax.dot_general(
                                p[hh : hh + 1, :], vcb[hh],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            )
                            for hh in range(H)
                        ],
                        axis=0,
                    )
                    return m_new, l, acc * alpha + pv

                m0 = jnp.full((H, 1), NEG_INF, jnp.float32)
                l0 = jnp.zeros((H, 1), jnp.float32)
                a0 = jnp.zeros((H, LANES), jnp.float32)
                m, l, acc = jax.lax.fori_loop(0, n_live, att_body, (m0, l0, a0))
                # the new token's own (j == n_past) softmax term
                sn = jnp.sum(q * k, axis=1, keepdims=True) * scale  # [H, 1]
                m_f = jnp.maximum(m, sn)
                alpha = jnp.exp(m - m_f)
                pn = jnp.exp(sn - m_f)
                l = l * alpha + pn
                acc = acc * alpha + pn * v
                ctx = acc / l  # [H, 128]
                xr2, aux2 = prep(_pad_h(ctx.reshape(1, D), kh4))
                xr_ref[:, :] = xr2
                aux_ref[:, :] = aux2

            @pl.when(j >= ot_qkv)
            def _():
                a, b = wo_copies(slot, j)
                a.wait()
                b.wait()
                y = _vpu_core(qbuf[slot], xr_ref[:, :], aux_ref[:, :], sbuf[slot])
                out_ref[j - ot_qkv] = jnp.broadcast_to(y.T, (8, LANES))

            return carry

        jax.lax.fori_loop(0, steps, body, 0, unroll=False)

    return kernel


# ---------------------------------------------------------------------------
# whole-stack kernel: ONE pallas call for all L layers
# ---------------------------------------------------------------------------


def pick_ctx_chunk(n_ctx: int, max_chunks: int = 16) -> int:
    """Smallest 128-multiple chunk dividing ``n_ctx`` with at most
    ``max_chunks`` chunks (the whole-stack kernel keeps every live KV chunk
    resident in VMEM so their DMAs can overlap the wqkv weight stream)."""
    if n_ctx % 128:
        return n_ctx  # odd context: one resident chunk
    k = n_ctx // 128
    for m in range(1, k + 1):
        if k % m == 0 and k // m <= max_chunks:
            return 128 * m
    return n_ctx


#: DMA ring depth for the whole-stack kernel.  Deeper than the matvec
#: kernels' NBUF=6: between weight phases the kernel runs glue (attention,
#: SwiGLU, norms, activation prep) during which NO new tile DMAs are issued
#: — the ring's NBUF-1 outstanding tiles are the only buffer keeping the
#: HBM stream busy.  12 tiles ≈ 4-5 µs of stream covers the measured
#: per-phase glue at decode n_past; beyond that only VMEM cost grows.
NBUF_STACK = 12


def _make_layers_kernel(L, H, ot13, kh4, kh4_2, n_chunks, ctx_chunk,
                        norm_type, eps, mosaic_prep):
    from .q4_vpu_pallas import _vpu_core

    NB = NBUF_STACK
    nb = kh4 // 4
    nb2 = kh4_2 // 4
    R_attn = kh4 // 16  # weight in-dim rows (= padded D / 128)
    R2 = kh4_2 // 16
    SPL = 3 * H + H + ot13 + H  # tiles per layer
    assert SPL >= NB - 1, (SPL, NB)

    def kernel(s_ref, x_ref, anorm_ref, fnorm_ref, cos_ref, sin_ref,
               wqkv_qs, wqkv_sc, wo_qs, wo_sc, w13_qs, w13_sc, w2_qs, w2_sc,
               kc, vc,
               out_ref, knew_ref, vnew_ref,
               qbuf, sbuf, qkvbuf, gbuf, obuf, x2d, xr_ref, aux_ref, kvbuf,
               qsem, ssem, kvsem):
        n_past = s_ref[0]
        prep2d = _quant_prep2d_mosaic if mosaic_prep else _quant_prep2d_interp
        n_live = (n_past + ctx_chunk - 1) // ctx_chunk
        scale = 1.0 / float(np.sqrt(128.0))

        def wcopies(qs_h, sc_h, il, t, slot, kw, nbw):
            return (
                pltpu.make_async_copy(
                    qs_h.at[il, t], qbuf.at[slot, :, :kw], qsem.at[slot]
                ),
                pltpu.make_async_copy(
                    sc_h.at[il, t], sbuf.at[slot, :, :nbw], ssem.at[slot]
                ),
            )

        # Static per-layer phase table: (qs, sc, count, kh, nb).  Each tile
        # loop starts the DMA NB-1 positions ahead; the lookahead target is
        # routed by STATIC successor segments (the tail of each phase falls
        # into the next phase(s), wrapping to the next layer after w2).
        # The first megakernel cut routed every start with g//SPL divisions
        # + 8 predicates inside ONE giant loop body and lost ~20% of decode
        # to per-step scalar/branch overhead (128 vs 151 tok/s at 7B).
        phases = [
            (wqkv_qs, wqkv_sc, 3 * H, kh4, nb),
            (wo_qs, wo_sc, H, kh4, nb),
            (w13_qs, w13_sc, ot13, kh4, nb),
            (w2_qs, w2_sc, H, kh4_2, nb2),
        ]

        def start_ahead(p, il, j, g_ahead):
            """Start the weight-tile DMA NB-1 positions ahead of (phase p,
            local tile j): rel = j + NB - 1 is resolved against the static
            successor chain, 1-2 predicates per step, no divisions."""
            slot = g_ahead % NB
            rel = j + NB - 1
            offs, k = 0, p
            while offs < phases[p][2] + NB - 1:  # reachable segments only
                qs_h, sc_h, cnt, kw, nbw = phases[k % 4]
                wrapped = k >= 4  # chain crossed into the next layer
                cond = jnp.logical_and(rel >= offs, rel < offs + cnt)
                if wrapped:
                    cond = jnp.logical_and(cond, il + 1 < L)
                lay = il + 1 if wrapped else il

                @pl.when(cond)
                def _(qs_h=qs_h, sc_h=sc_h, kw=kw, nbw=nbw, offs=offs,
                      lay=lay):
                    a, b = wcopies(qs_h, sc_h, lay, rel - offs, slot, kw, nbw)
                    a.start()
                    b.start()

                offs += cnt
                k += 1

        def kv_copy(il, c):
            off = pl.multiple_of(c * ctx_chunk, ctx_chunk)
            return (
                pltpu.make_async_copy(
                    kc.at[il, :, pl.ds(off, ctx_chunk), :],
                    kvbuf.at[c, 0], kvsem.at[c, 0],
                ),
                pltpu.make_async_copy(
                    vc.at[il, :, pl.ds(off, ctx_chunk), :],
                    kvbuf.at[c, 1], kvsem.at[c, 1],
                ),
            )

        def tile_loop(p, il, base, consume):
            """One weight phase: for j in [0, count): start the DMA NB-1
            ahead, wait tile j, matvec, hand the [128, 1] result to
            ``consume(j, y)``.  The MAIN range [0, cnt-NB+1) starts its
            lookahead in the SAME phase unconditionally (zero predicates per
            step); only the NB-1 TAIL steps pay the successor routing."""
            qs_h, sc_h, cnt, kw, nbw = phases[p]
            main = max(0, cnt - (NB - 1))

            def wait_core(j):
                slot = (base + j) % NB
                a, b = wcopies(qs_h, sc_h, il, j, slot, kw, nbw)
                a.wait()
                b.wait()
                y = _vpu_core(qbuf[slot, :, :kw], xr_ref[:, :kw],
                              aux_ref[:, :nbw], sbuf[slot, :, :nbw])
                consume(j, y)

            def body_main(j, carry):
                a, b = wcopies(
                    qs_h, sc_h, il, j + NB - 1, (base + j + NB - 1) % NB,
                    kw, nbw,
                )
                a.start()
                b.start()
                wait_core(j)
                return carry

            jax.lax.fori_loop(0, main, body_main, 0, unroll=False)

            def body_tail(j, carry):
                start_ahead(p, il, j, base + j + NB - 1)
                wait_core(j)
                return carry

            jax.lax.fori_loop(main, cnt, body_tail, 0, unroll=False)
            return base + cnt

        x2d[:, :] = x_ref[:, :]
        for w in range(NB - 1):  # warm-up: first tiles of layer 0
            p, lo = 0, 0
            while w - lo >= phases[p][2]:  # static spill into later phases
                lo += phases[p][2]
                p += 1
            qs_h, sc_h, cnt, kw, nbw = phases[p]
            a, b = wcopies(qs_h, sc_h, 0, jnp.int32(w - lo), w % NB, kw, nbw)
            a.start()
            b.start()

        def per_layer(il, base):
            # ---- attn norm + prep; ALL live KV history chunks start
            # streaming NOW so they arrive during the wqkv weight phase
            # (r4's #1 gap: KV DMAs only started after the wqkv stream) ----
            for c in range(n_chunks):

                @pl.when(c < n_live)
                def _(c=c):
                    a, b = kv_copy(il, jnp.int32(c))
                    a.start()
                    b.start()

            h = _ggml_norm_row(x2d[:, :], anorm_ref[il], norm_type, eps)
            xr, aux = prep2d(_pad_rows(h, R_attn))
            xr_ref[:, :kh4] = xr
            aux_ref[:, :nb] = aux

            def to_qkv(j, y):
                qkvbuf[j] = jnp.broadcast_to(y.T, (8, LANES))

            base = tile_loop(0, il, base, to_qkv)

            # ---- rope + flash attention over the prefetched chunks --------
            q = _rope_row(qkvbuf[0:H, 0, :], cos_ref[:, :], sin_ref[:, :])
            k = _rope_row(qkvbuf[H : 2 * H, 0, :], cos_ref[:, :], sin_ref[:, :])
            v = qkvbuf[2 * H : 3 * H, 0, :]
            # round-trip through the cache dtype so the new token's own
            # softmax term sees exactly what later steps will read back
            k = k.astype(kvbuf.dtype).astype(jnp.float32)
            v = v.astype(kvbuf.dtype).astype(jnp.float32)
            knew_ref[il] = k
            vnew_ref[il] = v

            lane_h = jax.lax.broadcasted_iota(
                jnp.int32, (H, H * ctx_chunk), 1
            ) // ctx_chunk
            row_h = jax.lax.broadcasted_iota(
                jnp.int32, (H, H * ctx_chunk), 0
            )

            def att_body(c, att):
                m, l, acc = att
                a, b = kv_copy(il, c)
                a.wait()
                b.wait()
                kcb = kvbuf[c, 0].astype(jnp.float32)  # [H, C, 128]
                vcb = kvbuf[c, 1].astype(jnp.float32)
                # ONE MXU dot for all heads (q [H,128] x K [H·C,128]ᵀ
                # computes every head PAIR; the diagonal blocks are the real
                # scores) instead of H serialized 1x128 dots — the unrolled
                # form cost ~15 µs/layer of MXU-launch latency on the
                # kernel's critical path (decode profile r5).  H× redundant
                # MACs are free: the MXU is otherwise idle at batch 1.
                # HIGHEST: Mosaic's default lowers f32 dots to single-pass
                # bf16 on the MXU (r4 selfcheck catch).
                kflat = kcb.reshape(H * ctx_chunk, LANES)
                big = jax.lax.dot_general(
                    q, kflat,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [H, H·C]
                s = jnp.concatenate(
                    [
                        big[hh : hh + 1, hh * ctx_chunk : (hh + 1) * ctx_chunk]
                        for hh in range(H)
                    ],
                    axis=0,
                ) * scale  # [H, C]
                jidx = c * ctx_chunk + jax.lax.broadcasted_iota(
                    jnp.int32, (H, ctx_chunk), 1
                )
                s = jnp.where(jidx < n_past, s, NEG_INF)
                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
                # p·V likewise as one dot: P [H, H·C] carries p on the
                # diagonal blocks and exact zeros elsewhere
                pbig = jnp.where(
                    lane_h == row_h,
                    jnp.concatenate([p] * H, axis=1),
                    0.0,
                )
                pv = jax.lax.dot_general(
                    pbig, vcb.reshape(H * ctx_chunk, LANES),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [H, 128]
                return m_new, l, acc * alpha + pv

            m0 = jnp.full((H, 1), NEG_INF, jnp.float32)
            l0 = jnp.zeros((H, 1), jnp.float32)
            a0 = jnp.zeros((H, LANES), jnp.float32)
            m, l, acc = jax.lax.fori_loop(0, n_live, att_body, (m0, l0, a0))
            # the new token's own (j == n_past) softmax term
            sn = jnp.sum(q * k, axis=1, keepdims=True) * scale
            m_f = jnp.maximum(m, sn)
            alpha = jnp.exp(m - m_f)
            pn = jnp.exp(sn - m_f)
            l = l * alpha + pn
            acc = acc * alpha + pn * v
            ctx = acc / l  # [H, 128]
            xr, aux = prep2d(_pad_rows(ctx, R_attn))
            xr_ref[:, :kh4] = xr
            aux_ref[:, :nb] = aux

            def to_obuf(j, y):
                obuf[j] = jnp.broadcast_to(y.T, (8, LANES))

            base = tile_loop(1, il, base, to_obuf)

            # ---- wo residual + ffn norm + prep (w13 already streaming) ----
            x2d[:, :] = x2d[:, :] + obuf[0:H, 0, :]
            h = _ggml_norm_row(x2d[:, :], fnorm_ref[il], norm_type, eps)
            xr, aux = prep2d(_pad_rows(h, R_attn))
            xr_ref[:, :kh4] = xr
            aux_ref[:, :nb] = aux

            def to_gbuf(j, y):
                gbuf[j] = jnp.broadcast_to(y.T, (8, LANES))

            base = tile_loop(2, il, base, to_gbuf)

            # ---- SwiGLU + w2 prep (w2 tiles already streaming) ------------
            g1 = gbuf[0 : ot13 // 2, 0, :]
            g3 = gbuf[ot13 // 2 : ot13, 0, :]
            gate = (g1 / (1.0 + jnp.exp(-g1))) * g3  # exact f32 silu
            xr, aux = prep2d(_pad_rows(gate, R2))
            xr_ref[:, :kh4_2] = xr
            aux_ref[:, :nb2] = aux

            base = tile_loop(3, il, base, to_obuf)
            x2d[:, :] = x2d[:, :] + obuf[0:H, 0, :]  # w2 residual
            return base

        jax.lax.fori_loop(0, L, per_layer, jnp.int32(0), unroll=False)
        out_ref[:, :] = x2d[:, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("norm_type", "eps", "ctx_chunk", "interpret"),
)
def fused_layers_block(
    x,  # [H, 128] f32 row-major residual stream (row r = dims [128r, ...))
    attn_norms, ffn_norms,  # [L, H, 128] f32
    cos_row, sin_row,  # [1, 128] f32 rope vectors for position n_past
    wqkv_qs, wqkv_sc,  # stacked fused layout [L, 3H, 128, kh4]/[L, 3H, 128, nb]
    wo_qs, wo_sc,  # [L, H, 128, kh4] / [L, H, 128, nb]
    w13_qs, w13_sc,  # [L, ot13, 128, kh4] / [L, ot13, 128, nb]
    w2_qs, w2_sc,  # [L, H, 128, kh4_2] / [L, H, 128, nb2]
    k_cache, v_cache,  # [L, H, n_ctx, 128] (read-only history)
    n_past,
    *,
    norm_type: str = "layernorm",
    eps: float = 1e-5,
    ctx_chunk: int = 128,
    interpret: bool = False,
):
    """ALL transformer layers in ONE kernel: the weight-DMA ring is routed
    across every matmul of every layer, so the HBM weight stream literally
    never stops — not at the attn/FFN boundary, not at layer boundaries
    (r4's two-kernels-per-layer design drained the pipe 2L times per token).
    KV history chunks for layer il start streaming at il's first wqkv step
    and are consumed by the in-kernel flash attention one weight-phase later.

    The cache is READ-only here; the new token's per-layer K/V come back as
    outputs for the caller to write at position n_past (one
    dynamic_update_slice covering all layers).  Requires head_dim == 128.
    Returns (x_out [H, 128], k_new [L, H, 128], v_new [L, H, 128])."""
    L, ot_qkv, _, kh4 = wqkv_qs.shape
    _, ot13, _, kh4_13 = w13_qs.shape
    _, ot2, _, kh4_2 = w2_qs.shape
    _, H, n_ctx, dh = k_cache.shape
    assert dh == LANES and ot_qkv == 3 * H and ot2 == H, (H, ot_qkv, ot2)
    assert kh4_13 == kh4 and wo_qs.shape[1] == H, (kh4_13, kh4)
    assert n_ctx % ctx_chunk == 0, (n_ctx, ctx_chunk)
    n_chunks = n_ctx // ctx_chunk
    kernel = _make_layers_kernel(
        L, H, ot13, kh4, kh4_2, n_chunks, ctx_chunk, norm_type, eps,
        mosaic_prep=not interpret,
    )
    kh4m = max(kh4, kh4_2)
    nbm = kh4m // 4
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 10,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, LANES), jnp.float32),
            jax.ShapeDtypeStruct((L, H, LANES), jnp.float32),
            jax.ShapeDtypeStruct((L, H, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF_STACK, LANES, kh4m), jnp.int32),
            pltpu.VMEM((NBUF_STACK, LANES, nbm), jnp.float32),
            pltpu.VMEM((3 * H, 8, LANES), jnp.float32),
            pltpu.VMEM((ot13, 8, LANES), jnp.float32),
            pltpu.VMEM((H, 8, LANES), jnp.float32),
            pltpu.VMEM((H, LANES), jnp.float32),
            pltpu.VMEM((PHASES, kh4m), jnp.float32),
            pltpu.VMEM((2, nbm), jnp.float32),
            pltpu.VMEM((n_chunks, 2, H, ctx_chunk, LANES), k_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF_STACK,)),
            pltpu.SemaphoreType.DMA((NBUF_STACK,)),
            pltpu.SemaphoreType.DMA((n_chunks, 2)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        jnp.full((1,), n_past, jnp.int32), x, attn_norms, ffn_norms,
        cos_row, sin_row,
        wqkv_qs, wqkv_sc, wo_qs, wo_sc, w13_qs, w13_sc, w2_qs, w2_sc,
        k_cache, v_cache,
    )


@functools.partial(
    jax.jit,
    static_argnames=("norm_type", "eps", "ctx_chunk", "interpret"),
)
def fused_attn_block(
    x,  # [1, D] f32
    attn_norm,  # [1, D] f32
    cos_row, sin_row,  # [1, 128] f32 rope vectors for position n_past
    wqkv_qs, wqkv_sc,  # stacked fused layout [L, 3H, 128, kh4]/[L, 3H, 128, nb]
    wo_qs, wo_sc,  # [L, H, 128, kh4] / [L, H, 128, nb]
    k_cache, v_cache,  # [L, H, n_ctx, 128] (read-only history)
    layer_idx, n_past,
    *,
    norm_type: str = "layernorm",
    eps: float = 1e-5,
    ctx_chunk: int = 128,
    interpret: bool = False,
):
    """wo·attn(rope(qkv(norm(x)·w))) — one kernel, continuous weight stream,
    O(n_past) attention chunks; the cache is READ-only here (the history
    j < n_past) and the new token's K/V come back as outputs for the caller
    to write at position n_past.  Requires head_dim == 128 (each head = one
    tile).  Returns (delta tiles [H, 8, 128] (row 0 live; caller adds the
    residual), k_new [H,128], v_new [H,128])."""
    L, ot_qkv, _, kh4 = wqkv_qs.shape
    _, H, n_ctx, dh = k_cache.shape
    D = x.shape[1]
    assert dh == LANES and H * LANES == D and ot_qkv == 3 * H, (H, D, ot_qkv)
    assert n_ctx % ctx_chunk == 0, (n_ctx, ctx_chunk)
    kernel = _make_attn_kernel(
        H, ot_qkv, kh4, ctx_chunk, norm_type, eps, mosaic_prep=not interpret
    )
    nbw = kh4 // 4
    scalars = jnp.stack(
        [jnp.asarray(layer_idx, jnp.int32), jnp.asarray(n_past, jnp.int32)]
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((H, LANES), jnp.float32),
            jax.ShapeDtypeStruct((H, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, LANES, kh4), jnp.int32),
            pltpu.VMEM((NBUF, LANES, nbw), jnp.float32),
            pltpu.VMEM((3 * H, 8, LANES), jnp.float32),
            pltpu.VMEM((PHASES, kh4), jnp.float32),
            pltpu.VMEM((2, nbw), jnp.float32),
            pltpu.VMEM((KVBUF, 2, H, ctx_chunk, LANES), k_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((KVBUF, 2)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        scalars, x, attn_norm, cos_row, sin_row,
        wqkv_qs, wqkv_sc, wo_qs, wo_sc, k_cache, v_cache,
    )
