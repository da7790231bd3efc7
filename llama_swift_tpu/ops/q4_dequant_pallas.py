"""Pallas dequantization kernels: packed Q4 → dense bf16/f32, for prefill.

Prefill (N ≫ 1) is compute-bound, so the right TPU shape for it is
dequantize-once → one big MXU matmul (the reference's BLAS path does the
same dance on CPU: dequant + sgemm, ``ggml.c:6054-6131``).  The jnp
fallback (``dequantize_q4_0v_jnp``) materializes the unpack through
[ot, 128, nb, 4, 8] f32 stacks/concats — ~1.5 ms PER WEIGHT at 7B, ~0.55 s
of a 0.64 s 512-token prefill.  This kernel streams the packed words once
and writes the dense matrix once, at HBM rate.

**Phase-major output, permuted activations.**  Mosaic cannot lower the
lane-splitting reshape that converts packed lane order (lane ``g·nb + b``
holding 8 nibble phases) to logical element order (``32b + 8g + p``).  So
the kernel never permutes lanes: it emits the dense matrix in *phase-major
packed order*,

    dense_pm[row, p·kh4 + l] = (nibble_p(qs[row, l]) − 8) · d[row, l % nb]

(8 shifted copies of the packed word row, laid side by side), and the
*activation* is permuted to match in plain XLA (a reshape/transpose on
[N, in] — microseconds):

    x_pm[n, p·kh4 + g·nb + b] = x[n, 32b + 8g + p]

The dot over the permuted in-dim is mathematically the same contraction,
and every per-element product is bit-identical (nibble−8 and the f32 scale
multiply are exact in f32); only the f32 summation order differs, which is
already unspecified for XLA matmuls.

Used by ``quantized_matmul.linear`` for the dense-fallback (prefill) path
of the V / W / Q4_1-V layouts whenever the Pallas branch is enabled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import QK

PHASES = 8
LANES = 128
_MASKS = [0xF << (4 * p) for p in range(7)]  # phase 7 uses a logical shift
_XSCALE = [float(16.0 ** -p) for p in range(7)]


def _nibble_phases(qs):
    """i32 [128, kh4] packed words → 8 × f32 [128, kh4] nibble values.

    Exact: masked values are n·16^p with n < 16, representable in f32, and
    16^-p is a power of two (same trick as ``q4_vpu_pallas._vpu_core``)."""
    out = [
        (qs & _MASKS[p]).astype(jnp.float32) * _XSCALE[p] for p in range(7)
    ]
    out.append(jax.lax.shift_right_logical(qs, 28).astype(jnp.float32))
    return out


def _dequant_kernel_q4_0(qs_ref, sc_ref, out_ref, *, dtype):
    qs = qs_ref[0]  # [128, kh4] i32
    sc = sc_ref[0]  # [128, nb] f32
    kh4 = qs.shape[1]
    sc4 = jnp.concatenate([sc] * 4, axis=-1)  # lane l -> d[l % nb]
    for p, v in enumerate(_nibble_phases(qs)):
        out_ref[0, :, p * kh4 : (p + 1) * kh4] = ((v - 8.0) * sc4).astype(dtype)


def _dequant_kernel_q4_1(qs_ref, sm_ref, out_ref, *, dtype):
    qs = qs_ref[0]
    sm = sm_ref[0]  # [128, 2nb]: delta lanes then min lanes
    kh4 = qs.shape[1]
    nb = kh4 // 4
    d4 = jnp.concatenate([sm[:, :nb]] * 4, axis=-1)
    m4 = jnp.concatenate([sm[:, nb:]] * 4, axis=-1)
    for p, v in enumerate(_nibble_phases(qs)):
        out_ref[0, :, p * kh4 : (p + 1) * kh4] = (v * d4 + m4).astype(dtype)


@functools.partial(jax.jit, static_argnames=("is_q41", "dtype", "interpret"))
def q4v_dequant_pm(qs4v, sc_or_sm, *, is_q41=False, dtype=jnp.bfloat16,
                   interpret=False):
    """Packed V/W-layout weight → phase-major dense [out, 8·kh4]."""
    ot, lt, kh4 = qs4v.shape
    assert lt == LANES, qs4v.shape
    kernel = _dequant_kernel_q4_1 if is_q41 else _dequant_kernel_q4_0
    nbl = sc_or_sm.shape[2]  # nb (q4_0) or 2nb (q4_1)
    dense = pl.pallas_call(
        functools.partial(kernel, dtype=dtype),
        grid=(ot,),
        in_specs=[
            pl.BlockSpec((1, LANES, kh4), lambda o: (o, 0, 0)),
            pl.BlockSpec((1, LANES, nbl), lambda o: (o, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, LANES, PHASES * kh4), lambda o: (o, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((ot, LANES, PHASES * kh4), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(qs4v, sc_or_sm)
    return dense.reshape(ot * LANES, PHASES * kh4)


def _dequant_kernel_q4_0_stacked(il_ref, qs_ref, sc_ref, out_ref, *, dtype):
    del il_ref  # consumed by the BlockSpec index maps
    _dequant_kernel_q4_0(qs_ref[0], sc_ref[0], out_ref, dtype=dtype)


def _dequant_kernel_q4_1_stacked(il_ref, qs_ref, sc_ref, out_ref, *, dtype):
    del il_ref
    _dequant_kernel_q4_1(qs_ref[0], sc_ref[0], out_ref, dtype=dtype)


@functools.partial(jax.jit, static_argnames=("is_q41", "dtype", "interpret"))
def q4v_dequant_pm_stacked(layer_idx, qs4v, sc_or_sm, *, is_q41=False,
                           dtype=jnp.bfloat16, interpret=False):
    """Stacked-layer variant: weights stay as whole [L, ...] HBM buffers and
    the layer is chosen by the scalar-prefetch index map.  The prefill path
    used to ``at_layer()``-slice the layer out of the stack first — a
    dynamic-slice COPY of every packed weight byte before dequantizing it
    (~3.4 GB per 7B prefill, the dominant cost in the r5 prefill profile).
    """
    L, ot, lt, kh4 = qs4v.shape
    assert lt == LANES, qs4v.shape
    kernel = (
        _dequant_kernel_q4_1_stacked if is_q41 else _dequant_kernel_q4_0_stacked
    )
    nbl = sc_or_sm.shape[3]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ot,),
        in_specs=[
            pl.BlockSpec((1, 1, LANES, kh4), lambda o, s: (s[0], o, 0, 0)),
            pl.BlockSpec((1, 1, LANES, nbl), lambda o, s: (s[0], o, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, LANES, PHASES * kh4), lambda o, s: (o, 0, 0)
        ),
    )
    dense = pl.pallas_call(
        functools.partial(kernel, dtype=dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ot, LANES, PHASES * kh4), dtype),
        interpret=interpret,
    )(jnp.asarray([layer_idx], jnp.int32), qs4v, sc_or_sm)
    return dense.reshape(ot * LANES, PHASES * kh4)


def phase_major_x(x2, *, block_perm: np.ndarray | None = None) -> jnp.ndarray:
    """[N, in] activations → [N, in] in the kernel's phase-major packed
    order (plus the W layout's λ block permutation when given)."""
    n, in_dim = x2.shape
    nb = in_dim // QK
    xb = x2.reshape(n, nb, 4, PHASES)  # axes (b, g, p)
    if block_perm is not None:
        xb = xb[:, jnp.asarray(block_perm)]
    # (b, g, p) -> (p, g, b): index p·4nb + g·nb + b = p·kh4 + lane
    return xb.transpose(0, 3, 2, 1).reshape(n, in_dim)


def q4_dense_matmul_pm(x2, qs4v, sc_or_sm, *, is_q41=False,
                       w_block_perm: np.ndarray | None = None,
                       mm_dtype=jnp.bfloat16, interpret=False,
                       layer_idx=None) -> jnp.ndarray:
    """y[N, out] = x2 @ W.T via the phase-major dequant kernel + one XLA
    matmul.  ``x2`` must already be padded to the packed in-dim (and
    activation-fake-quantized by the caller, matching the jnp path).
    ``layer_idx``: qs4v/sc carry a leading [L] axis read in place."""
    if layer_idx is not None:
        wd = q4v_dequant_pm_stacked(
            layer_idx, qs4v, sc_or_sm, is_q41=is_q41, dtype=mm_dtype,
            interpret=interpret,
        )
    else:
        wd = q4v_dequant_pm(
            qs4v, sc_or_sm, is_q41=is_q41, dtype=mm_dtype, interpret=interpret
        )
    x_pm = phase_major_x(x2, block_perm=w_block_perm).astype(mm_dtype)
    # HIGHEST: with f32 operands (mm_dtype=f32, e.g. batched decode) the
    # default lowers to single-pass bf16 on the MXU — 2e-1 logit drift vs
    # the jnp path (caught by the r5 batched_v selfcheck family).  bf16
    # operands (prefill) are unaffected: bf16×bf16→f32 is the native pass.
    return jnp.dot(x_pm, wd.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
