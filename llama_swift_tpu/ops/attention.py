"""Decode attention kernels.

The reference has a fused ``ggml_flash_attn`` (``Sources/cpp/ggml.c:7753-
8237``) that the llama path never uses (SURVEY.md §5.7); here the fused
flash-decode kernel is real and used: single-query attention over the
head-major KV cache with an online-softmax accumulator, processed in
context chunks so long contexts never materialize a full score row in HBM.

Layout: cache [H, n_ctx, Dh] (head-major — each head's history contiguous,
see ``models/llama.init_cache``).  Grid (H, ctx_chunks): per head, chunks
stream contiguously; the n_past mask is applied per chunk via iota compare
(slots beyond the high-water mark contribute exp(-inf)=0, so stale cache
contents are harmless — same invariant as the XLA path).

The XLA einsum path (``models/llama._attention``) remains the default for
prefill and short contexts; this kernel serves long-context decode where
score-row materialization and non-fused softmax start to cost.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _diag_scores(qb, kc):
    """qb [HB, Dh], kc [HB, C, Dh] → per-head scores [HB, C] via ONE MXU dot
    over ALL head pairs + diagonal-block extraction.  HB serialized [1, Dh]
    dots pay an MXU-launch latency each — measured 6x slower end-to-end on
    the batched decode path (r5); the HB× redundant MACs are free (the MXU
    is idle at decode batch sizes).  HIGHEST: Mosaic defaults f32 dots to
    single-pass bf16 (r4 selfcheck catch)."""
    hb, chunk, dh = kc.shape
    big = jax.lax.dot_general(
        qb, kc.reshape(hb * chunk, dh),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [HB, HB·C]
    return jnp.concatenate(
        [big[h : h + 1, h * chunk : (h + 1) * chunk] for h in range(hb)],
        axis=0,
    )


def _diag_pv(p, vc):
    """p [HB, C] softmax weights, vc [HB, C, Dh] → [HB, Dh] per-head p·V as
    ONE dot: P carries p on the diagonal blocks and exact zeros elsewhere."""
    hb, chunk, dh = vc.shape
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * chunk), 1) // chunk
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * chunk), 0)
    pbig = jnp.where(lane_h == row_h, jnp.concatenate([p] * hb, axis=1), 0.0)
    return jax.lax.dot_general(
        pbig, vc.reshape(hb * chunk, dh),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _alias_shim(kernel, n_alias: int):
    """Wrap a flash kernel with ``n_alias`` extra pass-through output refs
    (cache buffers aliased input→output, never written).

    Why: the serving dataflow is "DUS-write the cache → flash-read it →
    carry it"; with the cache as a plain custom-call INPUT, XLA cannot
    prove the call doesn't alias and inserts full-cache copies around every
    invocation — measured 24 ms/call at 13B batch-8 (2× 1.7 GB caches
    copied), 6× the whole step.  Aliasing the buffers THROUGH the call
    ("donated buffers were not usable" warning gone) makes them in-place.
    """

    def shim(*refs):
        # refs = (*ins, out, *alias_outs, *scratch): drop the alias outputs
        n_scratch = 3  # m, l, acc
        ins_out = refs[: len(refs) - n_scratch - n_alias]
        scratch = refs[len(refs) - n_scratch :]
        return kernel(*ins_out, *scratch)

    return shim


def _with_alias_outspecs(grid_spec):
    """Copy of a PrefetchScalarGridSpec with two extra un-pipelined (ANY)
    output specs for the aliased cache pass-throughs."""
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=grid_spec.num_scalar_prefetch,
        grid=grid_spec.grid,
        in_specs=grid_spec.in_specs,
        out_specs=(
            grid_spec.out_specs,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=grid_spec.scratch_shapes,
    )


def _flash_decode_kernel(npast_ref, q_ref, k_ref, v_ref, out_ref, m_ref, l_ref, acc_ref):
    """One (head, chunk) step of online-softmax single-query attention.

    q: [H, Dh] and out: [H, Dh] are full-array VMEM blocks (Mosaic requires
    the last two block dims be (8, 128)-divisible or whole — a (1, Dh)
    per-head block is neither); the kernel indexes the live head's row.
    k/v chunk: [1, C, Dh]; scratch m/l: [1, 128] (col 0 live), acc: [1, Dh].

    O(n_past), not O(n_ctx): chunks past the high-water mark are skipped —
    their compute is predicated off here, and their k/v DMA never happens
    because the index map clamps the block index (Pallas elides refetch of
    an unchanged block).  KV bytes/step scale with n_past.
    """
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    chunk = k_ref.shape[1]
    dh = q_ref.shape[1]
    n_past = npast_ref[0]
    live = n_past // chunk  # last chunk containing attendable slots

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= live)
    def _():
        scale = 1.0 / np.sqrt(float(dh))
        q = q_ref[pl.dslice(i, 1), :].astype(jnp.float32)  # [1, Dh]
        k = k_ref[0].astype(jnp.float32)  # [C, Dh]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
                    # HIGHEST: Mosaic's default lowers f32 dots to
                    # single-pass bf16 on the MXU (~1e-3/layer drift,
                    # compounds across layers; experiments/tpu_selfcheck)
                    precision=jax.lax.Precision.HIGHEST,
        ) * scale  # [1, C]
        j = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        s = jnp.where(j <= n_past, s, NEG_INF)

        m_prev = m_ref[0, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [1, C]
        # vector stores only (Mosaic rejects scalar VMEM stores): every lane
        # of the m/l scratch rows carries the same value
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p)
        pv = jax.lax.dot_general(
            p, v_ref[0].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                    # HIGHEST: Mosaic's default lowers f32 dots to
                    # single-pass bf16 on the MXU (~1e-3/layer drift,
                    # compounds across layers; experiments/tpu_selfcheck)
                    precision=jax.lax.Precision.HIGHEST,
        )  # [1, Dh]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.full_like(m_ref, m_new)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[pl.dslice(i, 1), :] = (acc_ref[:] / l_ref[0, 0]).astype(
            out_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def flash_decode_attention(
    q: jnp.ndarray,  # [H, Dh] single query, post-rope
    keys: jnp.ndarray,  # [H, n_ctx, Dh]
    values: jnp.ndarray,  # [H, n_ctx, Dh]
    n_past: jnp.ndarray,  # scalar int32: attend slots j <= n_past
    *,
    chunk: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused single-query attention; returns [H, Dh] f32.

    KV traffic is O(n_past): the chunk grid covers n_ctx but the index map
    clamps chunks beyond ``n_past // chunk`` onto the last live block, whose
    DMA Pallas elides as unchanged (SURVEY.md §5.7 — the O(ctx²) pathology
    this build exists to kill; the reference re-reads and re-ropes the full
    K history every step, ``LlamaPredictOperation.mm:604-611``).
    """
    if interpret is None:
        # auto: interpreter on non-TPU backends so the flag works everywhere
        interpret = jax.default_backend() not in ("tpu", "axon")
    h, n_ctx, dh = keys.shape
    chunk = min(chunk, n_ctx)
    assert n_ctx % chunk == 0, (n_ctx, chunk)
    npast_arr = jnp.full((1,), n_past, dtype=jnp.int32)

    def kv_map(i, c, s):
        return (i, jnp.minimum(c, s[0] // chunk), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h, n_ctx // chunk),
        in_specs=[
            pl.BlockSpec((h, dh), lambda i, c, s: (0, 0)),
            pl.BlockSpec((1, chunk, dh), kv_map),
            pl.BlockSpec((1, chunk, dh), kv_map),
        ],
        out_specs=pl.BlockSpec((h, dh), lambda i, c, s: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((1, dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _flash_decode_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, dh), jnp.float32),
        interpret=interpret,
    )(npast_arr, q, keys, values)


def _flash_decode_stacked_kernel(
    s_ref, q_ref, k_ref, v_ref, out_ref, m_ref, l_ref, acc_ref
):
    """One (head-block, chunk) step.  k/v blocks are DMA'd straight out of
    the full [L, H, n_ctx, Dh] cache buffer (the layer picked by the
    scalar-prefetch index map) — no [H, n_ctx, Dh] plane is ever
    materialized in HBM.  HB heads per step (vs one) makes each DMA
    HB·C·Dh·2 bytes — single-head blocks measured only ~370 GB/s.
    s_ref: [2] i32 = (layer_idx, n_past); q/out: [H, Dh] whole-array blocks;
    k/v: [1, HB, C, Dh]; scratch m/l: [HB, 128] (lane-replicated), acc:
    [HB, Dh]."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    hb, chunk, dh = k_ref.shape[1], k_ref.shape[2], q_ref.shape[1]
    n_past = s_ref[1]
    live = n_past // chunk

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= live)
    def _():
        scale = 1.0 / np.sqrt(float(dh))
        qb = q_ref[pl.dslice(i * hb, hb), :].astype(jnp.float32)  # [HB, Dh]
        s = _diag_scores(qb, k_ref[0].astype(jnp.float32)) * scale  # [HB, C]
        j = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (hb, chunk), 1)
        s = jnp.where(j <= n_past, s, NEG_INF)

        m_prev = m_ref[:, 0:1]  # [HB, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # [HB, 1]
        p = jnp.exp(s - m_new)  # [HB, C]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = _diag_pv(p, v_ref[0].astype(jnp.float32))  # [HB, Dh]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[pl.dslice(i * hb, hb), :] = (
            acc_ref[:] / l_ref[:, 0:1]
        ).astype(out_ref.dtype)


def _flash_decode_stacked_int8_kernel(
    s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref, m_ref, l_ref, acc_ref
):
    """int8-cache variant: per-(head, position) symmetric scales are applied
    inside the kernel — score_c = (q·k_c)·ks_c and pv = (p⊙vs)·V — so the
    int8 cache streams at 1 B/elem with NO dense dequant pass (VERDICT r2
    weak #7: the int8 option used to fall back to the XLA path).
    ks/vs blocks: [1, HB, C] f32."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    hb, chunk, dh = k_ref.shape[1], k_ref.shape[2], q_ref.shape[1]
    n_past = s_ref[1]
    live = n_past // chunk

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= live)
    def _():
        scale = 1.0 / np.sqrt(float(dh))
        qb = q_ref[pl.dslice(i * hb, hb), :].astype(jnp.float32)  # [HB, Dh]
        s = (
            _diag_scores(qb, k_ref[0].astype(jnp.float32)) * ks_ref[0]
        ) * scale  # [HB, C]
        j = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (hb, chunk), 1)
        s = jnp.where(j <= n_past, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new) * vs_ref[0]  # fold v scales into the weights
        l_ref[:] = l_ref[:] * alpha + jnp.sum(
            jnp.exp(s - m_new), axis=1, keepdims=True
        )
        pv = _diag_pv(p, v_ref[0].astype(jnp.float32))
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[pl.dslice(i * hb, hb), :] = (
            acc_ref[:] / l_ref[:, 0:1]
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "h_block", "interpret"))
def flash_decode_attention_stacked_int8(
    q: jnp.ndarray,  # [H, Dh] single query, post-rope
    keys: jnp.ndarray,  # [L, H, n_ctx, Dh] int8
    values: jnp.ndarray,  # [L, H, n_ctx, Dh] int8
    k_scale: jnp.ndarray,  # [L, H, n_ctx, 1] f32
    v_scale: jnp.ndarray,  # [L, H, n_ctx, 1] f32
    layer_idx,
    n_past: jnp.ndarray,
    *,
    chunk: int = 128,
    h_block: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused single-query attention over the int8 quantized stacked cache;
    O(n_past) like the bf16 variant; returns [H, Dh] f32."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    L, h, n_ctx, dh = keys.shape
    chunk = min(chunk, n_ctx)
    assert n_ctx % chunk == 0, (n_ctx, chunk)
    if h_block is None:
        h_block = max(1, min(h, (1 << 20) // (chunk * dh)))
        while h % h_block:
            h_block -= 1
    scalars = jnp.stack(
        [jnp.asarray(layer_idx, jnp.int32), jnp.asarray(n_past, jnp.int32)]
    )
    ks = k_scale.reshape(L, h, n_ctx)
    vs = v_scale.reshape(L, h, n_ctx)

    def kv_map(i, c, s):
        return (s[0], i, jnp.minimum(c, s[1] // chunk), 0)

    def sc_map(i, c, s):
        return (s[0], i, jnp.minimum(c, s[1] // chunk))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h // h_block, n_ctx // chunk),
        in_specs=[
            pl.BlockSpec((h, dh), lambda i, c, s: (0, 0)),
            pl.BlockSpec((1, h_block, chunk, dh), kv_map),
            pl.BlockSpec((1, h_block, chunk, dh), kv_map),
            pl.BlockSpec((1, h_block, chunk), sc_map),
            pl.BlockSpec((1, h_block, chunk), sc_map),
        ],
        out_specs=pl.BlockSpec((h, dh), lambda i, c, s: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, dh), jnp.float32),
        ],
    )
    if interpret:
        out = pl.pallas_call(
            _flash_decode_stacked_int8_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((h, dh), jnp.float32),
            interpret=True,
        )(scalars, q, keys, values, ks, vs)
        return out, keys, values
    grid_spec_a = _with_alias_outspecs(grid_spec)
    return pl.pallas_call(
        _alias_shim(_flash_decode_stacked_int8_kernel, 2),
        grid_spec=grid_spec_a,
        out_shape=(
            jax.ShapeDtypeStruct((h, dh), jnp.float32),
            jax.ShapeDtypeStruct(keys.shape, keys.dtype),
            jax.ShapeDtypeStruct(values.shape, values.dtype),
        ),
        input_output_aliases={2: 1, 3: 2},
    )(scalars, q, keys, values, ks, vs)


@functools.partial(jax.jit, static_argnames=("chunk", "h_block", "interpret"))
def flash_decode_attention_stacked(
    q: jnp.ndarray,  # [H, Dh] single query, post-rope
    keys: jnp.ndarray,  # [L, H, n_ctx, Dh] full stacked cache
    values: jnp.ndarray,  # [L, H, n_ctx, Dh]
    layer_idx,  # scalar int32
    n_past: jnp.ndarray,  # scalar int32: attend slots j <= n_past
    *,
    chunk: int = 128,
    h_block: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused single-query attention reading one layer of the stacked cache
    in place; returns [H, Dh] f32.

    KV traffic is O(n_past): chunk blocks beyond ``n_past // chunk`` clamp
    onto the last live block in the index map, so Pallas elides their DMA
    (unchanged block) and the kernel predicates their compute off.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    L, h, n_ctx, dh = keys.shape
    chunk = min(chunk, n_ctx)
    assert n_ctx % chunk == 0, (n_ctx, chunk)
    if h_block is None:
        # ≤ ~1 MiB per k/v block; double-buffered pairs stay well under VMEM
        h_block = max(1, min(h, (1 << 20) // (chunk * dh * keys.dtype.itemsize)))
        while h % h_block:
            h_block -= 1
    assert h % h_block == 0, (h, h_block)
    scalars = jnp.stack(
        [jnp.asarray(layer_idx, jnp.int32), jnp.asarray(n_past, jnp.int32)]
    )

    def kv_map(i, c, s):
        return (s[0], i, jnp.minimum(c, s[1] // chunk), 0)

    if interpret:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(h // h_block, n_ctx // chunk),
            in_specs=[
                pl.BlockSpec((h, dh), lambda i, c, s: (0, 0)),
                pl.BlockSpec((1, h_block, chunk, dh), kv_map),
                pl.BlockSpec((1, h_block, chunk, dh), kv_map),
            ],
            out_specs=pl.BlockSpec((h, dh), lambda i, c, s: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((h_block, 128), jnp.float32),
                pltpu.VMEM((h_block, 128), jnp.float32),
                pltpu.VMEM((h_block, dh), jnp.float32),
            ],
        )
        out = pl.pallas_call(
            _flash_decode_stacked_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((h, dh), jnp.float32),
            interpret=True,
        )(scalars, q, keys, values)
        return out, keys, values
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h // h_block, n_ctx // chunk),
        in_specs=[
            pl.BlockSpec((h, dh), lambda i, c, s: (0, 0)),
            pl.BlockSpec((1, h_block, chunk, dh), kv_map),
            pl.BlockSpec((1, h_block, chunk, dh), kv_map),
        ],
        out_specs=(
            pl.BlockSpec((h, dh), lambda i, c, s: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _alias_shim(_flash_decode_stacked_kernel, 2),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((h, dh), jnp.float32),
            jax.ShapeDtypeStruct(keys.shape, keys.dtype),
            jax.ShapeDtypeStruct(values.shape, values.dtype),
        ),
        input_output_aliases={2: 1, 3: 2},
    )(scalars, q, keys, values)


# ---------------------------------------------------------------------------
# batched (continuous-batching) flash decode: per-slot n_past, layer-major
# [L, B, H, n_ctx, Dh] cache read in place
# ---------------------------------------------------------------------------


def _flash_batched_kernel(
    s_ref, q_ref, k_ref, v_ref, out_ref, m_ref, l_ref, acc_ref
):
    """One (slot, head-block, chunk) step.  s_ref: [1 + B] i32 =
    (layer_idx, n_past per slot); the chunk grid covers n_ctx but each
    slot's index map clamps at its OWN high-water mark, so KV bytes/step
    scale with Σ_b n_past_b, not B·n_ctx (the r4 batched path read the
    whole dense cache every step — 6.7 GB at 13B/B8/512).
    q/out: [B, H, Dh] whole-array blocks; k/v: [1, 1, HB, C, Dh]."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    hb, chunk, dh = k_ref.shape[2], k_ref.shape[3], q_ref.shape[2]
    n_past = s_ref[1 + b]
    live = n_past // chunk

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= live)
    def _():
        scale = 1.0 / np.sqrt(float(dh))
        qb = q_ref[b, pl.dslice(i * hb, hb), :].astype(jnp.float32)  # [HB, Dh]
        s = _diag_scores(qb, k_ref[0, 0].astype(jnp.float32)) * scale
        j = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (hb, chunk), 1)
        s = jnp.where(j <= n_past, s, NEG_INF)
        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = _diag_pv(p, v_ref[0, 0].astype(jnp.float32))
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[b, pl.dslice(i * hb, hb), :] = (
            acc_ref[:] / l_ref[:, 0:1]
        ).astype(out_ref.dtype)


def _flash_batched_int8_kernel(
    s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref, m_ref, l_ref, acc_ref
):
    """int8-cache batched variant: per-(head, position) scales applied
    in-kernel (score·ks, p⊙vs before ·V) — the cache streams at 1 B/elem."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    hb, chunk, dh = k_ref.shape[2], k_ref.shape[3], q_ref.shape[2]
    n_past = s_ref[1 + b]
    live = n_past // chunk

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= live)
    def _():
        scale = 1.0 / np.sqrt(float(dh))
        qb = q_ref[b, pl.dslice(i * hb, hb), :].astype(jnp.float32)
        s = (
            _diag_scores(qb, k_ref[0, 0].astype(jnp.float32)) * ks_ref[0, 0]
        ) * scale
        j = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (hb, chunk), 1)
        s = jnp.where(j <= n_past, s, NEG_INF)
        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        pe = jnp.exp(s - m_new)
        p = pe * vs_ref[0, 0]  # fold v scales into the weights
        l_ref[:] = l_ref[:] * alpha + jnp.sum(pe, axis=1, keepdims=True)
        pv = _diag_pv(p, v_ref[0, 0].astype(jnp.float32))
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[b, pl.dslice(i * hb, hb), :] = (
            acc_ref[:] / l_ref[:, 0:1]
        ).astype(out_ref.dtype)


def _batched_h_block(h, chunk, dh, itemsize):
    hb = max(1, min(h, (1 << 20) // (chunk * dh * itemsize)))
    while h % hb:
        hb -= 1
    return hb


@functools.partial(jax.jit, static_argnames=("chunk", "h_block", "interpret"))
def flash_decode_attention_batched(
    q: jnp.ndarray,  # [B, H, Dh] one post-rope query per slot
    keys: jnp.ndarray,  # [L, B, H, n_ctx, Dh] layer-major batched cache
    values: jnp.ndarray,  # [L, B, H, n_ctx, Dh]
    layer_idx,
    n_pasts: jnp.ndarray,  # [B] i32: slot b attends j <= n_pasts[b]
    *,
    chunk: int = 128,
    h_block: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused B-slot single-query attention over one layer of the batched
    cache, in place; per-slot O(n_past) KV traffic; returns [B, H, Dh] f32."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    L, B, h, n_ctx, dh = keys.shape
    chunk = min(chunk, n_ctx)
    assert n_ctx % chunk == 0, (n_ctx, chunk)
    if h_block is None:
        h_block = _batched_h_block(h, chunk, dh, keys.dtype.itemsize)
    scalars = jnp.concatenate(
        [jnp.asarray([layer_idx], jnp.int32), n_pasts.astype(jnp.int32)]
    )

    def kv_map(b, i, c, s):
        return (s[0], b, i, jnp.minimum(c, s[1 + b] // chunk), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, h // h_block, n_ctx // chunk),
        in_specs=[
            pl.BlockSpec((B, h, dh), lambda b, i, c, s: (0, 0, 0)),
            pl.BlockSpec((1, 1, h_block, chunk, dh), kv_map),
            pl.BlockSpec((1, 1, h_block, chunk, dh), kv_map),
        ],
        out_specs=pl.BlockSpec((B, h, dh), lambda b, i, c, s: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, dh), jnp.float32),
        ],
    )
    if interpret:
        out = pl.pallas_call(
            _flash_batched_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, h, dh), jnp.float32),
            interpret=True,
        )(scalars, q, keys, values)
        return out, keys, values
    grid_spec_a = _with_alias_outspecs(grid_spec)
    return pl.pallas_call(
        _alias_shim(_flash_batched_kernel, 2),
        grid_spec=grid_spec_a,
        out_shape=(
            jax.ShapeDtypeStruct((B, h, dh), jnp.float32),
            jax.ShapeDtypeStruct(keys.shape, keys.dtype),
            jax.ShapeDtypeStruct(values.shape, values.dtype),
        ),
        input_output_aliases={2: 1, 3: 2},
    )(scalars, q, keys, values)


@functools.partial(jax.jit, static_argnames=("chunk", "h_block", "interpret"))
def flash_decode_attention_batched_int8(
    q: jnp.ndarray,  # [B, H, Dh]
    keys: jnp.ndarray,  # [L, B, H, n_ctx, Dh] int8
    values: jnp.ndarray,  # [L, B, H, n_ctx, Dh] int8
    k_scale: jnp.ndarray,  # [L, B, H, n_ctx, 1] f32
    v_scale: jnp.ndarray,  # [L, B, H, n_ctx, 1] f32
    layer_idx,
    n_pasts: jnp.ndarray,  # [B]
    *,
    chunk: int = 128,
    h_block: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched flash decode over the int8 quantized cache (scales applied
    in-kernel, 1 B/elem streamed); returns [B, H, Dh] f32."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    L, B, h, n_ctx, dh = keys.shape
    chunk = min(chunk, n_ctx)
    assert n_ctx % chunk == 0, (n_ctx, chunk)
    if h_block is None:
        h_block = _batched_h_block(h, chunk, dh, 1)
    scalars = jnp.concatenate(
        [jnp.asarray([layer_idx], jnp.int32), n_pasts.astype(jnp.int32)]
    )
    ks = k_scale.reshape(L, B, h, n_ctx)
    vs = v_scale.reshape(L, B, h, n_ctx)

    def kv_map(b, i, c, s):
        return (s[0], b, i, jnp.minimum(c, s[1 + b] // chunk), 0)

    def sc_map(b, i, c, s):
        return (s[0], b, i, jnp.minimum(c, s[1 + b] // chunk))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, h // h_block, n_ctx // chunk),
        in_specs=[
            pl.BlockSpec((B, h, dh), lambda b, i, c, s: (0, 0, 0)),
            pl.BlockSpec((1, 1, h_block, chunk, dh), kv_map),
            pl.BlockSpec((1, 1, h_block, chunk, dh), kv_map),
            pl.BlockSpec((1, 1, h_block, chunk), sc_map),
            pl.BlockSpec((1, 1, h_block, chunk), sc_map),
        ],
        out_specs=pl.BlockSpec((B, h, dh), lambda b, i, c, s: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, dh), jnp.float32),
        ],
    )
    if interpret:
        out = pl.pallas_call(
            _flash_batched_int8_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, h, dh), jnp.float32),
            interpret=True,
        )(scalars, q, keys, values, ks, vs)
        return out, keys, values
    grid_spec_a = _with_alias_outspecs(grid_spec)
    return pl.pallas_call(
        _alias_shim(_flash_batched_int8_kernel, 2),
        grid_spec=grid_spec_a,
        out_shape=(
            jax.ShapeDtypeStruct((B, h, dh), jnp.float32),
            jax.ShapeDtypeStruct(keys.shape, keys.dtype),
            jax.ShapeDtypeStruct(values.shape, values.dtype),
        ),
        input_output_aliases={2: 1, 3: 2},
    )(scalars, q, keys, values, ks, vs)


# ---------------------------------------------------------------------------
# PAGED batched flash decode (BASELINE north star: paged fp16/int8 KV):
# pages are position-range chunks of ONE slot spanning ALL layers —
# pool [P, L, H, page, Dh], page table [B, MP] int32.  A slot's HBM
# footprint grows with its actual length instead of a dense n_ctx
# preallocation (the reference preallocates the whole 512-slot cache up
# front, LlamaPredictOperation.mm:289-304; so did our dense engine cache —
# the direct reason 13B batch 16/32 didn't fit in 16 GB, BENCH_r04).
# ---------------------------------------------------------------------------


def _flash_paged_kernel(
    s_ref, q_ref, k_ref, v_ref, out_ref, m_ref, l_ref, acc_ref
):
    """One (slot, head-block, page) step.  s_ref layout:
    [layer, n_past_0..n_past_{B-1}, table_00..table_{B-1,MP-1}] — the page
    id is resolved in the INDEX MAP (scalar prefetch), so only live pages
    are ever DMA'd; the kernel body is the batched online softmax with the
    per-slot j <= n_past mask."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    hb, chunk, dh = k_ref.shape[2], k_ref.shape[3], q_ref.shape[2]
    n_past = s_ref[1 + b]
    live = n_past // chunk

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= live)
    def _():
        scale = 1.0 / np.sqrt(float(dh))
        qb = q_ref[b, pl.dslice(i * hb, hb), :].astype(jnp.float32)
        s = _diag_scores(qb, k_ref[0, 0].astype(jnp.float32)) * scale
        j = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (hb, chunk), 1)
        s = jnp.where(j <= n_past, s, NEG_INF)
        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = _diag_pv(p, v_ref[0, 0].astype(jnp.float32))
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[b, pl.dslice(i * hb, hb), :] = (
            acc_ref[:] / l_ref[:, 0:1]
        ).astype(out_ref.dtype)


def _flash_paged_int8_kernel(
    s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref, m_ref, l_ref, acc_ref
):
    """int8 page-pool variant: per-(head, position) scales live in their own
    pools and are applied in-kernel (the cache streams at 1 B/elem)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    hb, chunk, dh = k_ref.shape[2], k_ref.shape[3], q_ref.shape[2]
    n_past = s_ref[1 + b]
    live = n_past // chunk

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= live)
    def _():
        scale = 1.0 / np.sqrt(float(dh))
        qb = q_ref[b, pl.dslice(i * hb, hb), :].astype(jnp.float32)
        s = (
            _diag_scores(qb, k_ref[0, 0].astype(jnp.float32)) * ks_ref[0, 0]
        ) * scale
        j = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (hb, chunk), 1)
        s = jnp.where(j <= n_past, s, NEG_INF)
        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        pe = jnp.exp(s - m_new)
        p = pe * vs_ref[0, 0]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(pe, axis=1, keepdims=True)
        pv = _diag_pv(p, v_ref[0, 0].astype(jnp.float32))
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[b, pl.dslice(i * hb, hb), :] = (
            acc_ref[:] / l_ref[:, 0:1]
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h_block", "interpret"))
def flash_decode_attention_paged(
    q: jnp.ndarray,  # [B, H, Dh] one post-rope query per slot
    k_pool: jnp.ndarray,  # [P, L, H, page, Dh] page pool
    v_pool: jnp.ndarray,  # [P, L, H, page, Dh]
    page_table: jnp.ndarray,  # [B, MP] int32 page ids (chunk c of slot b)
    layer_idx,
    n_pasts: jnp.ndarray,  # [B] i32: slot b attends j <= n_pasts[b]
    *,
    h_block: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Paged B-slot flash decode over one layer: the page TABLE resolves
    each (slot, chunk) to a pool page inside the index map, per-slot
    O(n_past) traffic; returns [B, H, Dh] f32.  Table entries beyond a
    slot's live range may be garbage — the index map clamps the chunk to
    the live page and ids to the pool."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    P, L, h, page, dh = k_pool.shape
    B, MP = page_table.shape
    if h_block is None:
        h_block = _batched_h_block(h, page, dh, k_pool.dtype.itemsize)
    scalars = jnp.concatenate(
        [
            jnp.asarray([layer_idx], jnp.int32),
            n_pasts.astype(jnp.int32),
            page_table.astype(jnp.int32).reshape(-1),
        ]
    )

    def kv_map(b, i, c, s):
        cc = jnp.minimum(c, s[1 + b] // page)
        pid = jnp.clip(s[1 + B + b * MP + cc], 0, P - 1)
        return (pid, s[0], i, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, h // h_block, MP),
        in_specs=[
            pl.BlockSpec((B, h, dh), lambda b, i, c, s: (0, 0, 0)),
            pl.BlockSpec((1, 1, h_block, page, dh), kv_map),
            pl.BlockSpec((1, 1, h_block, page, dh), kv_map),
        ],
        out_specs=pl.BlockSpec((B, h, dh), lambda b, i, c, s: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, dh), jnp.float32),
        ],
    )
    if interpret:
        out = pl.pallas_call(
            _flash_paged_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, h, dh), jnp.float32),
            interpret=True,
        )(scalars, q, k_pool, v_pool)
        return out, k_pool, v_pool
    grid_spec_a = _with_alias_outspecs(grid_spec)
    return pl.pallas_call(
        _alias_shim(_flash_paged_kernel, 2),
        grid_spec=grid_spec_a,
        out_shape=(
            jax.ShapeDtypeStruct((B, h, dh), jnp.float32),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ),
        input_output_aliases={2: 1, 3: 2},
    )(scalars, q, k_pool, v_pool)


@functools.partial(jax.jit, static_argnames=("h_block", "interpret"))
def flash_decode_attention_paged_int8(
    q: jnp.ndarray,  # [B, H, Dh]
    k_pool: jnp.ndarray,  # [P, L, H, page, Dh] int8
    v_pool: jnp.ndarray,  # [P, L, H, page, Dh] int8
    k_scale_pool: jnp.ndarray,  # [P, L, H, page, 1] f32
    v_scale_pool: jnp.ndarray,  # [P, L, H, page, 1] f32
    page_table: jnp.ndarray,  # [B, MP] int32
    layer_idx,
    n_pasts: jnp.ndarray,  # [B]
    *,
    h_block: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Paged flash decode over the int8 page pool; returns [B, H, Dh] f32."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    P, L, h, page, dh = k_pool.shape
    B, MP = page_table.shape
    if h_block is None:
        h_block = _batched_h_block(h, page, dh, 1)
    scalars = jnp.concatenate(
        [
            jnp.asarray([layer_idx], jnp.int32),
            n_pasts.astype(jnp.int32),
            page_table.astype(jnp.int32).reshape(-1),
        ]
    )
    ks = k_scale_pool.reshape(P, L, h, page)
    vs = v_scale_pool.reshape(P, L, h, page)

    def kv_map(b, i, c, s):
        cc = jnp.minimum(c, s[1 + b] // page)
        pid = jnp.clip(s[1 + B + b * MP + cc], 0, P - 1)
        return (pid, s[0], i, 0, 0)

    def sc_map(b, i, c, s):
        cc = jnp.minimum(c, s[1 + b] // page)
        pid = jnp.clip(s[1 + B + b * MP + cc], 0, P - 1)
        return (pid, s[0], i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, h // h_block, MP),
        in_specs=[
            pl.BlockSpec((B, h, dh), lambda b, i, c, s: (0, 0, 0)),
            pl.BlockSpec((1, 1, h_block, page, dh), kv_map),
            pl.BlockSpec((1, 1, h_block, page, dh), kv_map),
            pl.BlockSpec((1, 1, h_block, page), sc_map),
            pl.BlockSpec((1, 1, h_block, page), sc_map),
        ],
        out_specs=pl.BlockSpec((B, h, dh), lambda b, i, c, s: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, 128), jnp.float32),
            pltpu.VMEM((h_block, dh), jnp.float32),
        ],
    )
    if interpret:
        out = pl.pallas_call(
            _flash_paged_int8_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, h, dh), jnp.float32),
            interpret=True,
        )(scalars, q, k_pool, v_pool, ks, vs)
        return out, k_pool, v_pool
    grid_spec_a = _with_alias_outspecs(grid_spec)
    return pl.pallas_call(
        _alias_shim(_flash_paged_int8_kernel, 2),
        grid_spec=grid_spec_a,
        out_shape=(
            jax.ShapeDtypeStruct((B, h, dh), jnp.float32),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ),
        input_output_aliases={2: 1, 3: 2},
    )(scalars, q, k_pool, v_pool, ks, vs)


def reference_decode_attention(q, keys, values, n_past):
    """Unfused reference for tests: q [H, Dh], cache [H, n_ctx, Dh]."""
    h, n_ctx, dh = keys.shape
    s = jnp.einsum("hd,hjd->hj", q.astype(jnp.float32),
                   keys.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    s = s / np.sqrt(float(dh))
    j = jnp.arange(n_ctx)[None, :]
    s = jnp.where(j <= n_past, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hj,hjd->hd", p, values.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)
