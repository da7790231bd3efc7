"""Quantized linear ops: `y = x @ W.T` for dense, Q4_0 and Q4_1 weights.

Replaces the reference's quantized matmul path (``ggml_compute_forward_mul_mat_q4_0_f32``,
``Sources/cpp/ggml.c:5987-6285``) whose inner loop is ``ggml_vec_dot_q4_0``
(``ggml.c:1296-1582``).  Parity-relevant semantics (SURVEY.md §7 #2):

* the reference quantizes the *activations* to Q4_0 as well (INIT phase,
  ``ggml.c:6134-6151``) and dots int4×int4, scaling by the product of block
  scales.  In exact arithmetic that equals dequantizing both operands and
  taking an f32 dot; we replicate it as a fake-quant of the activation rows
  (:func:`fake_quantize_q4_0`) followed by an f32 matmul, so the MXU does the
  FLOPs.  Controlled by ``ModelConfig.quantize_activations``.
* rounding: canonical round-half-away-from-zero (the reference's scalar
  path; its NEON/AVX2 paths differ on ties — SURVEY.md §7 #3).

Here: a reference jnp implementation that works on any backend (and is what
XLA fuses on CPU tests).  The fused Pallas kernel that reads the packed
nibbles straight from HBM lives in ``q4_matmul_pallas.py`` and is selected
automatically on TPU.

Q4_0/Q4_1 tensors are registered as jax pytrees so they can live inside
jit-ted param trees and be sharded with ``NamedSharding`` like any leaf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QK
from ..formats.quant import Q4_0Tensor, Q4_1Tensor

# ---------------------------------------------------------------------------
# pytree registration
# ---------------------------------------------------------------------------

jax.tree_util.register_pytree_node(
    Q4_0Tensor,
    lambda t: ((t.scales, t.qs), None),
    lambda _, leaves: Q4_0Tensor(*leaves),
)
jax.tree_util.register_pytree_node(
    Q4_1Tensor,
    lambda t: ((t.mins, t.scales, t.qs), None),
    lambda _, leaves: Q4_1Tensor(*leaves),
)


def round_half_away_jnp(v: jnp.ndarray) -> jnp.ndarray:
    """C ``round()`` semantics on device (``ggml.c:588``)."""
    return jnp.trunc(v + jnp.where(v >= 0, 0.5, -0.5))


def fake_quantize_q4_0(x: jnp.ndarray) -> jnp.ndarray:
    """Quantize-dequantize activation rows through Q4_0, replicating the
    INIT-phase ``quantize_row_q4_0`` (scalar semantics) of the reference's
    quantized matmul (``ggml.c:6134-6151``).

    x: [..., k] with k % 32 == 0.  Returns same-shape f32.
    """
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(shape[:-1] + (shape[-1] // QK, QK))
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    d = amax / 7.0
    inv_d = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    q = round_half_away_jnp(xf * inv_d)
    return (q * d).reshape(shape).astype(x.dtype)


def dequantize_q4_0_jnp(w: Q4_0Tensor, dtype=jnp.float32) -> jnp.ndarray:
    """Unpack+dequantize a Q4_0 weight to dense [rows, cols] on device."""
    qs = jnp.asarray(w.qs)
    scales = jnp.asarray(w.scales)
    rows, half = qs.shape
    lo = (qs & jnp.uint8(0xF)).astype(jnp.int8)
    hi = (qs >> jnp.uint8(4)).astype(jnp.int8)
    # byte j holds elements (2j, 2j+1): interleave
    vals = jnp.stack([lo, hi], axis=-1).reshape(rows, half * 2)
    vals = vals.astype(jnp.float32) - 8.0
    nb = scales.shape[1]
    vals = vals.reshape(rows, nb, QK) * scales[:, :, None].astype(jnp.float32)
    return vals.reshape(rows, nb * QK).astype(dtype)


def dequantize_q4_1_jnp(w: Q4_1Tensor, dtype=jnp.float32) -> jnp.ndarray:
    qs = jnp.asarray(w.qs)
    scales = jnp.asarray(w.scales)
    mins = jnp.asarray(w.mins)
    rows, half = qs.shape
    lo = (qs & jnp.uint8(0xF)).astype(jnp.uint8)
    hi = (qs >> jnp.uint8(4)).astype(jnp.uint8)
    vals = jnp.stack([lo, hi], axis=-1).reshape(rows, half * 2).astype(jnp.float32)
    nb = scales.shape[1]
    vals = vals.reshape(rows, nb, QK) * scales[:, :, None] + mins[:, :, None]
    return vals.reshape(rows, nb * QK).astype(dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


#: test/dryrun switch: route ``linear`` to the Pallas kernel branches in
#: interpreter mode on non-TPU backends, so CPU-mesh TP tests and
#: ``dryrun_multichip`` certify the SAME dispatch path that serves on
#: hardware (VERDICT r2: the tested path and the serving path must not
#: diverge at the kernel branch).
FORCE_PALLAS_INTERPRET = False


def _kernel_mode(prefer_pallas: bool | None) -> tuple[bool, bool]:
    """-> (use_pallas, interpret) for the current backend + overrides."""
    if prefer_pallas is not None:
        return prefer_pallas, (FORCE_PALLAS_INTERPRET and not _on_tpu())
    if _on_tpu():
        return True, False
    if FORCE_PALLAS_INTERPRET:
        return True, True
    return False, False


def linear(
    x: jnp.ndarray,
    w,
    *,
    quantize_activations: bool = True,
    compute_dtype=jnp.float32,
    prefer_pallas: bool | None = None,
    dense_matmul_dtype=None,
) -> jnp.ndarray:
    """``y[..., out] = x[..., in] @ W[out, in].T`` with dtype-based dispatch.

    Equivalent of ``ggml_mul_mat(w, x)`` (``ggml.c:3623-3646``) for every
    weight dtype the reference supports.

    ``dense_matmul_dtype``: dtype for the dense-dequant fallback matmuls
    (the prefill path of the packed layouts).  Only honored on TPU — CPU
    keeps exact f32 so golden tests pin the reference numerics.  Accumulation
    is always f32 (``preferred_element_type``).
    """
    from .q4_matmul_pallas import (
        MAX_INT_KERNEL_ROWS,
        MAX_MULTI_ROWS_T,
        MAX_PHASE_KERNEL_ROWS,
        Q4_0TensorT,
        StackedQ4Ref,
        _pick_kt4,
        dequantize_q4_0t_jnp,
        q4_0_int_matmul_pallas,
        q4_0_int_matmul_pallas_stacked,
        q4_0_matmul_pallas,
        q4_0_matmul_pallas_stacked,
        q4_0_t_matmul_multi,
    )
    from .q4_vpu_pallas import (
        MAX_MULTI_ROWS,
        Q4_0TensorV,
        Q4_1TensorV,
        StackedQ4VRef,
        dequantize_q4_0v_jnp,
        dequantize_q4_1v_jnp,
        q4_0_vpu_matmul_multi,
        q4_0_vpu_matvec,
        q4_0_vpu_matvec_stacked,
        q4_1_vpu_matvec,
        q4_1_vpu_matvec_stacked,
    )

    mm_dtype = (
        dense_matmul_dtype
        if dense_matmul_dtype is not None and _on_tpu()
        else compute_dtype
    )

    if isinstance(w, StackedQ4VRef):
        use_pallas, interp = _kernel_mode(prefer_pallas)
        n_rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        if use_pallas and n_rows == 1:
            mv = (
                q4_1_vpu_matvec_stacked
                if isinstance(w.w, Q4_1TensorV)
                else q4_0_vpu_matvec_stacked
            )
            return mv(
                x, w.w, w.layer_idx,
                quantize_acts=quantize_activations, compute_dtype=compute_dtype,
                interpret=interp,
            )
        if (
            use_pallas and isinstance(w.w, Q4_0TensorV)
            and 1 < n_rows <= MAX_MULTI_ROWS
        ):
            # batched decode: ONE weight stream for all B slot rows
            return q4_0_vpu_matmul_multi(
                x, w.w, w.layer_idx,
                quantize_acts=quantize_activations,
                compute_dtype=compute_dtype, interpret=interp,
            )
        if use_pallas:
            # prefill rows: STACKED dequant kernel — ``at_layer()`` would
            # dynamic-slice the layer's packed bytes out of the [L, ...]
            # stack first, copying every weight byte before dequantizing it
            # (~3.4 GB per 7B prefill; dominant in the r5 prefill profile)
            is41 = isinstance(w.w, Q4_1TensorV)
            if quantize_activations:
                x = fake_quantize_q4_1(x) if is41 else fake_quantize_q4_0(x)
            from .q4_dequant_pallas import q4_dense_matmul_pm
            from .q4_vpu_pallas import _pad_x

            lead = x.shape[:-1]
            nr = int(np.prod(lead)) if lead else 1
            out_dim = w.w.qs4v.shape[1] * 128
            x2 = _pad_x(
                x.reshape(nr, x.shape[-1]).astype(jnp.float32),
                w.w.qs4v.shape[3] * 8,
            )
            y = q4_dense_matmul_pm(
                x2, w.w.qs4v, w.w.sm_v if is41 else w.w.scales_v,
                is_q41=is41, mm_dtype=mm_dtype, interpret=interp,
                layer_idx=w.layer_idx,
            )
            return y.reshape(*lead, out_dim).astype(compute_dtype)
        return linear(
            x, w.at_layer(), quantize_activations=quantize_activations,
            compute_dtype=compute_dtype, prefer_pallas=prefer_pallas,
            dense_matmul_dtype=dense_matmul_dtype,
        )

    if isinstance(w, (Q4_0TensorV, Q4_1TensorV)):
        is_q41 = isinstance(w, Q4_1TensorV)
        use_pallas, interp = _kernel_mode(prefer_pallas)
        n_rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        if use_pallas and n_rows == 1:
            # batch-1 decode: the VPU matvec kernel streams packed nibbles
            # at HBM rate (exact reference int4-dot semantics when
            # quantize_activations)
            mv = q4_1_vpu_matvec if is_q41 else q4_0_vpu_matvec
            return mv(
                x, w, quantize_acts=quantize_activations,
                compute_dtype=compute_dtype, interpret=interp,
            )
        if use_pallas and not is_q41 and 1 < n_rows <= MAX_MULTI_ROWS:
            # small row counts (batched decode): one weight stream, B rows
            return q4_0_vpu_matmul_multi(
                x, w, quantize_acts=quantize_activations,
                compute_dtype=compute_dtype, interpret=interp,
            )
        # prefill / batched rows: dense-dequant matmul (compute-bound)
        if quantize_activations:
            x = fake_quantize_q4_1(x) if is_q41 else fake_quantize_q4_0(x)
        from .q4_vpu_pallas import _pad_x

        lead = x.shape[:-1]
        n_rows = int(np.prod(lead)) if lead else 1
        out_dim = w.qs4v.shape[0] * 128
        x2 = _pad_x(
            x.reshape(n_rows, x.shape[-1]).astype(jnp.float32),
            w.qs4v.shape[2] * 8,
        )
        if use_pallas:
            # kernel dequant (streams packed words once, writes dense once)
            # + one MXU matmul — the jnp unpack materializes ~1.5 ms of f32
            # intermediates per weight at 7B
            from .q4_dequant_pallas import q4_dense_matmul_pm

            y = q4_dense_matmul_pm(
                x2, w.qs4v, w.sm_v if is_q41 else w.scales_v,
                is_q41=is_q41, mm_dtype=mm_dtype, interpret=interp,
            )
        else:
            wd = (
                dequantize_q4_1v_jnp(w, dtype=mm_dtype)
                if is_q41
                else dequantize_q4_0v_jnp(w, dtype=mm_dtype)
            )
            y = jnp.dot(
                x2.astype(mm_dtype), wd.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return y.reshape(*lead, out_dim).astype(compute_dtype)

    if isinstance(w, StackedQ4Ref):
        use_pallas, interp = _kernel_mode(prefer_pallas)
        n_rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        kh4 = w.w.qs4.shape[2]
        if (
            use_pallas and quantize_activations
            and n_rows <= MAX_INT_KERNEL_ROWS and _pick_kt4(kh4)
        ):
            return q4_0_int_matmul_pallas_stacked(
                x, w.w, w.layer_idx, compute_dtype=compute_dtype,
                interpret=interp,
            )
        if use_pallas and 1 <= n_rows <= MAX_MULTI_ROWS_T:
            # batched decode: multi-row VPU stream (weights cross HBM once
            # for all slot rows; exact int4-dot semantics per row)
            return q4_0_t_matmul_multi(
                x, w.w, w.layer_idx,
                quantize_acts=quantize_activations,
                compute_dtype=compute_dtype, interpret=interp,
            )
        if use_pallas and n_rows <= MAX_PHASE_KERNEL_ROWS and _pick_kt4(kh4):
            # batched decode (continuous batching): stream packed weights
            # once for all rows through the stacked phase-dequant kernel
            if quantize_activations:
                x = fake_quantize_q4_0(x)
            return q4_0_matmul_pallas_stacked(
                x, w.w, w.layer_idx, compute_dtype=compute_dtype,
                interpret=interp,
            )
        return linear(
            x, w.at_layer(), quantize_activations=quantize_activations,
            compute_dtype=compute_dtype, prefer_pallas=prefer_pallas,
            dense_matmul_dtype=dense_matmul_dtype,
        )

    if isinstance(w, Q4_0TensorT):
        use_pallas, interp = _kernel_mode(prefer_pallas)
        n_rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        kh4 = w.qs4.shape[1]
        from .q4_matmul_pallas import _pick_kt4

        if (
            use_pallas and quantize_activations
            and n_rows <= MAX_INT_KERNEL_ROWS and _pick_kt4(kh4)
        ):
            # integer decode kernel: exact int4×int4 reference semantics
            return q4_0_int_matmul_pallas(
                x, w, compute_dtype=compute_dtype, interpret=interp
            )
        if use_pallas and 1 <= n_rows <= MAX_MULTI_ROWS_T:
            return q4_0_t_matmul_multi(
                x, w, quantize_acts=quantize_activations,
                compute_dtype=compute_dtype, interpret=interp,
            )
        if use_pallas and n_rows <= MAX_PHASE_KERNEL_ROWS and _pick_kt4(kh4):
            # small-batch rows: fused phase-dequant kernel (streams packed
            # weights once; no dense weight materialization in HBM)
            if quantize_activations:
                x = fake_quantize_q4_0(x)
            return q4_0_matmul_pallas(
                x, w, compute_dtype=compute_dtype, interpret=interp
            )
        if quantize_activations:
            x = fake_quantize_q4_0(x)
        from .q4_matmul_pallas import _pad_x_to

        x = _pad_x_to(x.astype(mm_dtype), w.qs4.shape[1] * 8)
        wd = dequantize_q4_0t_jnp(w, dtype=mm_dtype)
        return jnp.dot(
            x, wd.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(compute_dtype)
    from .q4_fused_layer import (
        Q4_0TensorW,
        StackedQ4WRef,
        block_perm,
        dequantize_q4_0w_jnp,
    )

    if isinstance(w, StackedQ4WRef):
        use_pallas, interp = _kernel_mode(prefer_pallas)
        if use_pallas:
            # prefill over the stacked W (megakernel) params: dequantize in
            # place out of the [L, ...] stack (see the StackedQ4VRef note)
            if quantize_activations:
                x = fake_quantize_q4_0(x)
            from .q4_dequant_pallas import q4_dense_matmul_pm
            from .q4_vpu_pallas import _pad_x

            lead = x.shape[:-1]
            nr = int(np.prod(lead)) if lead else 1
            in_dim = w.w.qs4w.shape[3] * 8
            out_dim = w.w.qs4w.shape[1] * 128
            x2 = _pad_x(x.reshape(nr, x.shape[-1]).astype(jnp.float32), in_dim)
            y = q4_dense_matmul_pm(
                x2, w.w.qs4w, w.w.scales_w,
                w_block_perm=block_perm(in_dim // 32),
                mm_dtype=mm_dtype, interpret=interp, layer_idx=w.layer_idx,
            )
            return y.reshape(*lead, out_dim).astype(compute_dtype)
        return linear(
            x, jax.tree_util.tree_map(lambda a: a[w.layer_idx], w.w),
            quantize_activations=quantize_activations,
            compute_dtype=compute_dtype, prefer_pallas=prefer_pallas,
            dense_matmul_dtype=dense_matmul_dtype,
        )

    if isinstance(w, Q4_0TensorW):
        # W layout serves batch-1 decode through the fused-layer kernels
        # (models/llama.forward); other shapes (prefill) dense-dequant here
        if quantize_activations:
            x = fake_quantize_q4_0(x)
        from .q4_vpu_pallas import _pad_x

        use_pallas, interp = _kernel_mode(prefer_pallas)
        lead = x.shape[:-1]
        n_rows = int(np.prod(lead)) if lead else 1
        in_dim = w.qs4w.shape[2] * 8
        out_dim = w.qs4w.shape[0] * 128
        x2 = _pad_x(x.reshape(n_rows, x.shape[-1]).astype(jnp.float32), in_dim)
        if use_pallas:
            from .q4_dequant_pallas import q4_dense_matmul_pm
            from .q4_fused_layer import block_perm

            y = q4_dense_matmul_pm(
                x2, w.qs4w, w.scales_w,
                w_block_perm=block_perm(in_dim // 32),
                mm_dtype=mm_dtype, interpret=interp,
            )
        else:
            wd = dequantize_q4_0w_jnp(w, dtype=mm_dtype)
            y = jnp.dot(
                x2.astype(mm_dtype), wd.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return y.reshape(*lead, out_dim).astype(compute_dtype)
    if isinstance(w, Q4_0Tensor):
        if quantize_activations:
            x = fake_quantize_q4_0(x)
        wd = dequantize_q4_0_jnp(w, dtype=mm_dtype)
        return jnp.dot(
            x.astype(mm_dtype), wd.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(compute_dtype)
    if isinstance(w, Q4_1Tensor):
        # reference q4_1 matmul also quantizes activations to q4_1
        # (ggml.c:6287+); activation fake-quant for q4_1 uses the runtime
        # (true-max) variant
        if quantize_activations:
            x = fake_quantize_q4_1(x)
        wd = dequantize_q4_1_jnp(w, dtype=mm_dtype)
        return jnp.dot(
            x.astype(mm_dtype), wd.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(compute_dtype)
    w = jnp.asarray(w)
    return jnp.dot(
        x.astype(compute_dtype), w.astype(compute_dtype).T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(compute_dtype)


def fake_quantize_q4_1(x: jnp.ndarray) -> jnp.ndarray:
    """Quantize-dequantize through Q4_1 (runtime ``quantize_row_q4_1``
    semantics, true min/max — ``ggml.c:606-648``)."""
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(shape[:-1] + (shape[-1] // QK, QK))
    mn = jnp.min(xf, axis=-1, keepdims=True)
    mx = jnp.max(xf, axis=-1, keepdims=True)
    d = (mx - mn) / 15.0
    inv_d = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    q = round_half_away_jnp((xf - mn) * inv_d)
    return (q * d + mn).reshape(shape).astype(x.dtype)


def embedding_lookup(
    tokens: jnp.ndarray, w, *, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """``ggml_get_rows`` equivalent (``ggml.c:6760-6920``): rows of the
    (possibly quantized) embedding table, dequantized to f32 per row."""
    from .q4_matmul_pallas import LANE_TILE, Q4_0TensorT
    from .q4_vpu_pallas import Q4_0TensorV, Q4_1TensorV

    if isinstance(w, Q4_1TensorV):
        # V layout row gather + affine dequant (n·d + m per block)
        ot_idx = tokens // 128
        sub_idx = tokens % 128
        qs4_rows = jnp.asarray(w.qs4v)[ot_idx, sub_idx, :].view(jnp.uint32)
        sm_rows = jnp.asarray(w.sm_v)[ot_idx, sub_idx, :]  # [N, 2nb]
        n, kh4 = qs4_rows.shape
        nb = kh4 // 4
        qs4_rows = qs4_rows.reshape(n, 4, nb).transpose(0, 2, 1)  # [N, nb, 4]
        vals = jnp.stack(
            [
                ((qs4_rows >> jnp.uint32(4 * p)) & jnp.uint32(0xF)).astype(
                    jnp.float32
                )
                for p in range(8)
            ],
            axis=-1,
        )  # [N, nb, 4, 8]; element index = 32b + 8g + p
        vals = vals.reshape(n, nb, 32)
        d = sm_rows[:, :nb, None]
        m = sm_rows[:, nb:, None]
        return (vals * d + m).reshape(n, nb * 32).astype(compute_dtype)

    if isinstance(w, Q4_0TensorV):
        # V layout [out/128, 128, in/8]: row r at (r//128, r%128, :), lanes
        # group-major (lane g·nb + b = u32 #g of block b)
        ot_idx = tokens // 128
        sub_idx = tokens % 128
        qs4_rows = jnp.asarray(w.qs4v)[ot_idx, sub_idx, :].view(jnp.uint32)  # [N, kh4]
        sc_rows = jnp.asarray(w.scales_v)[ot_idx, sub_idx, :]  # [N, nb]
        n, kh4 = qs4_rows.shape
        nb = kh4 // 4
        qs4_rows = qs4_rows.reshape(n, 4, nb).transpose(0, 2, 1)  # [N, nb, 4]
        vals = jnp.stack(
            [
                ((qs4_rows >> jnp.uint32(4 * p)) & jnp.uint32(0xF)).astype(
                    jnp.float32
                )
                - 8.0
                for p in range(8)
            ],
            axis=-1,
        )  # [N, nb, 4, 8]; element index = 32b + 8g + p
        vals = vals.reshape(n, nb, 32) * sc_rows[:, :, None]
        return vals.reshape(n, nb * 32).astype(compute_dtype)

    if isinstance(w, Q4_0TensorT):
        # tiled layout [out/128, X, 128]: row r lives at (r//128, :, r%128)
        ot_idx = tokens // LANE_TILE
        lane_idx = tokens % LANE_TILE
        qs4_rows = jnp.asarray(w.qs4)[ot_idx, :, lane_idx].view(jnp.uint32)  # [N, kh4]
        sc_rows = jnp.asarray(w.scales_t)[ot_idx, :, lane_idx]  # [N, nb]
        vals = jnp.stack(
            [
                ((qs4_rows >> jnp.uint32(4 * p)) & jnp.uint32(0xF)).astype(jnp.float32)
                - 8.0
                for p in range(8)
            ],
            axis=-1,
        ).reshape(qs4_rows.shape[0], -1)  # [N, in]
        nb = sc_rows.shape[1]
        vals = vals.reshape(vals.shape[0], nb, -1) * sc_rows[:, :, None]
        return vals.reshape(vals.shape[0], -1).astype(compute_dtype)
    if isinstance(w, Q4_0Tensor):
        sub = Q4_0Tensor(
            jnp.take(jnp.asarray(w.scales), tokens, axis=0),
            jnp.take(jnp.asarray(w.qs), tokens, axis=0),
        )
        return dequantize_q4_0_jnp(sub, dtype=compute_dtype)
    if isinstance(w, Q4_1Tensor):
        sub = Q4_1Tensor(
            jnp.take(jnp.asarray(w.mins), tokens, axis=0),
            jnp.take(jnp.asarray(w.scales), tokens, axis=0),
            jnp.take(jnp.asarray(w.qs), tokens, axis=0),
        )
        return dequantize_q4_1_jnp(sub, dtype=compute_dtype)
    return jnp.take(jnp.asarray(w).astype(compute_dtype), tokens, axis=0)
