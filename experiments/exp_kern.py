"""Round-2 kernel microbench: what limits the VPU matvec's HBM rate?

Chained-dependency marginal timing (the methodology tools_ablate.py
validated): a jitted lax.scan whose carry feeds every kernel invocation, so
nothing hoists; tok-time = (t(2N) - t(N)) / N with a forced host fetch.

Variants (per weight shape):
  probe    : pure-stream kernel (sum of i32 blocks), carry-dependent bias
  vpu      : the real matvec kernel
  vpu4     : 4-of-8 phases (wrong math; VPU-op sensitivity)
  vpu12    : 12 phases = 1.5x ops (wrong math; op sensitivity up)
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_swift_tpu.ops import q4_vpu_pallas as vq

OUT_TILE, PHASES, OUT_LANES = vq.OUT_TILE, vq.PHASES, vq.OUT_LANES


def synth_v(out_dim, in_dim, seed=0):
    ot = out_dim // 128
    kh4 = in_dim // 8
    nb = in_dim // 32
    a = jax.lax.broadcasted_iota(jnp.int32, (ot, 128, kh4), 1)
    b = jax.lax.broadcasted_iota(jnp.int32, (ot, 128, kh4), 2)
    qs4v = ((a * 7 + b * 13 + seed) % (2**31 - 1)).astype(jnp.int32)
    c = jax.lax.broadcasted_iota(jnp.int32, (ot, 128, nb), 2)
    scales_v = 0.001 + 1e-5 * (c % 97).astype(jnp.float32)
    nbytes = out_dim * in_dim // 2 + out_dim * nb * 4
    return vq.Q4_0TensorV(scales_v=scales_v, qs4v=qs4v), nbytes


def marginal_chain(step_fn, x0, lo=96, pairs=4):
    """step_fn: x -> x' (same shape), with a real data dependency.

    Paired-difference timing: each (lo, hi) pair runs back to back so tunnel
    / contention noise is correlated within the pair; the reported marginal
    is the min over pairs.  lo is large enough (~0.5-1 s device time) that
    per-dispatch jitter (~30 ms) is <5% of the diff.
    """
    hi = 2 * lo

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x0, iters):
        def body(x, _):
            return step_fn(x), ()

        xf, _ = jax.lax.scan(body, x0, None, length=iters)
        return xf

    def t(iters):
        t0 = time.perf_counter()
        np.asarray(run(x0, iters))
        return time.perf_counter() - t0

    t(lo)
    t(hi)
    best = min(t(hi) - t(lo) for _ in range(pairs))
    return best / lo


# --- variable-phase kernel (op-count sensitivity; wrong math for !=8) -------


def _vpu_kernel_nph(xr_ref, aux_ref, qs4_ref, scales_ref, out_ref, *, nph):
    xl = qs4_ref[0]
    kh4 = xl.shape[1]
    nb = kh4 // 4
    acc = (xl & vq._MASKS[0]).astype(jnp.float32) * xr_ref[0:1, :]
    for p in range(1, nph):
        m = vq._MASKS[p % 7] if (p % 8) != 7 else None
        if m is None:
            acc = acc + jax.lax.shift_right_logical(xl, 28).astype(
                jnp.float32
            ) * xr_ref[7:8, :]
        else:
            acc = acc + (xl & m).astype(jnp.float32) * xr_ref[p % 8 : p % 8 + 1, :]
    accb = (
        acc[:, 0 * nb : 1 * nb]
        + acc[:, 1 * nb : 2 * nb]
        + acc[:, 2 * nb : 3 * nb]
        + acc[:, 3 * nb : 4 * nb]
    )
    s_eff = scales_ref[0] * aux_ref[0:1, :]
    y = jnp.sum((accb - aux_ref[1:2, :]) * s_eff, axis=1, keepdims=True)
    out_ref[0] = jnp.broadcast_to(y, (OUT_TILE, OUT_LANES))


@functools.partial(jax.jit, static_argnames=("nph",))
def vpu_nph_call(xr, aux, qs4v, scales_v, nph):
    ot, lt, kh4 = qs4v.shape
    nb = scales_v.shape[2]
    out = pl.pallas_call(
        functools.partial(_vpu_kernel_nph, nph=nph),
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
    )(xr, aux, qs4v, scales_v)
    return out[:, :, 0].reshape(ot * lt)


# --- chunked kernel: per-group register-resident phase MACs -----------------


def _vpu_chunk_kernel(xr_ref, aux_ref, qs4_ref, scales_ref, out_ref, *, cb):
    kh4 = qs4_ref.shape[2]
    nb = kh4 // 4
    steps = nb // cb
    y = None
    for ci in range(steps):
        lo = ci * cb
        accb = None
        for g in range(4):
            base = g * nb + lo
            xg = qs4_ref[0, :, base : base + cb]  # [128, cb] i32
            acc = (xg & vq._MASKS[0]).astype(jnp.float32) * xr_ref[
                0:1, base : base + cb
            ]
            for p in range(1, 7):
                acc = acc + (xg & vq._MASKS[p]).astype(jnp.float32) * xr_ref[
                    p : p + 1, base : base + cb
                ]
            acc = acc + jax.lax.shift_right_logical(xg, 28).astype(
                jnp.float32
            ) * xr_ref[7:8, base : base + cb]
            accb = acc if accb is None else accb + acc
        s_eff = scales_ref[0, :, lo : lo + cb] * aux_ref[0:1, lo : lo + cb]
        contrib = (accb - aux_ref[1:2, lo : lo + cb]) * s_eff
        y = contrib if y is None else y + contrib
    out_ref[0] = jnp.broadcast_to(
        jnp.sum(y, axis=1, keepdims=True), (OUT_TILE, OUT_LANES)
    )


@functools.partial(jax.jit, static_argnames=("cb",))
def vpu_chunk_call(xr, aux, qs4v, scales_v, cb):
    ot, lt, kh4 = qs4v.shape
    nb = scales_v.shape[2]
    out = pl.pallas_call(
        functools.partial(_vpu_chunk_kernel, cb=cb),
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
    )(xr, aux, qs4v, scales_v)
    return out[:, :, 0].reshape(ot * lt)


# --- manually pipelined kernel: kernel-managed multi-buffered DMA -----------


def _vpu_manual_kernel(xr_ref, aux_ref, qs4_hbm, sc_hbm, out_ref,
                       qbuf, sbuf, qsem, ssem, *, nbuf):
    ot = qs4_hbm.shape[0]

    def qdma(slot, j):
        return pltpu.make_async_copy(qs4_hbm.at[j], qbuf.at[slot], qsem.at[slot])

    def sdma(slot, j):
        return pltpu.make_async_copy(sc_hbm.at[j], sbuf.at[slot], ssem.at[slot])

    # warm-up: fill all but one buffer
    for j in range(nbuf - 1):
        @pl.when(j < ot)
        def _(j=j):
            qdma(j % nbuf, j).start()
            sdma(j % nbuf, j).start()

    def body(j, _):
        slot = j % nbuf
        pre = j + nbuf - 1

        @pl.when(pre < ot)
        def _():
            qdma(pre % nbuf, pre).start()
            sdma(pre % nbuf, pre).start()

        qdma(slot, j).wait()
        sdma(slot, j).wait()
        y = vq._vpu_core(qbuf[slot], xr_ref, aux_ref, sbuf[slot])
        out_ref[j] = jnp.broadcast_to(y, (OUT_TILE, OUT_LANES))
        return ()

    jax.lax.fori_loop(0, ot, body, (), unroll=False)


@functools.partial(jax.jit, static_argnames=("nbuf",))
def vpu_manual_call(xr, aux, qs4v, scales_v, nbuf=3):
    ot, lt, kh4 = qs4v.shape
    nb = scales_v.shape[2]
    out = pl.pallas_call(
        functools.partial(_vpu_manual_kernel, nbuf=nbuf),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, lt, kh4), jnp.int32),
            pltpu.VMEM((nbuf, lt, nb), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )(xr, aux, qs4v, scales_v)
    return out[:, :, 0].reshape(ot * lt)


def main():
    shapes = {
        "w13": (22016 + 512, 4096),  # padded n_ff fusion shape
        "w2": (4096, 12288),
        "qkv": (12288, 4096),
    }
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else ["w13"]
    variants = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else ["probe", "vpu", "vpu4"]
    )
    res = {}
    for name in which:
        out_dim, in_dim = shapes[name]
        w, nbytes = synth_v(out_dim, in_dim)
        qs4v, scales_v = w.qs4v, w.scales_v
        ot, lt, kh4 = qs4v.shape
        r = {}

        if "probe" in variants:
            def step_probe(x):
                y = vq.stream_probe(qs4v, x)  # [ot] f32
                return jnp.sum(y).astype(jnp.int32) % 7

            dt = marginal_chain(step_probe, jnp.int32(0))
            r["probe"] = round(nbytes / dt / 1e9, 1)

        for vname, nph in (("vpu4", 4), ("vpu", 8), ("vpu12", 12)):
            if vname not in variants:
                continue

            def step_vpu(x, nph=nph):
                xr, aux = vq._prep_inputs(x[None, :in_dim] * 1e-3, kh4, True)
                y = vpu_nph_call(xr, aux, qs4v, scales_v, nph)
                return jnp.broadcast_to(jnp.tanh(y[:1]), (in_dim,))

            dt = marginal_chain(step_vpu, jnp.ones((in_dim,), jnp.float32))
            r[vname] = round(nbytes / dt / 1e9, 1)

        if any(v.startswith("manual") for v in variants):
            x0 = jnp.ones((in_dim,), jnp.float32) * 1e-3
            xr0, aux0 = vq._prep_inputs(x0[None], kh4, True)
            ref = vq._q4_0_vpu_call(xr0, aux0, qs4v, scales_v)
            got = vpu_manual_call(xr0, aux0, qs4v, scales_v, 3)
            err = float(jnp.max(jnp.abs(ref - got)))
            print(f"{name} manual-vs-ref max abs err: {err}", flush=True)

        for vname, nbuf in (("manual2", 2), ("manual3", 3), ("manual4", 4)):
            if vname not in variants:
                continue

            def step_manual(x, nbuf=nbuf):
                xr, aux = vq._prep_inputs(x[None, :in_dim] * 1e-3, kh4, True)
                y = vpu_manual_call(xr, aux, qs4v, scales_v, nbuf)
                return jnp.broadcast_to(jnp.tanh(y[:1]), (in_dim,))

            dt = marginal_chain(step_manual, jnp.ones((in_dim,), jnp.float32))
            r[vname] = round(nbytes / dt / 1e9, 1)

        nb = in_dim // 32
        for vname, cb in (("chunk128", 128), ("chunkfull", nb)):
            if vname not in variants:
                continue
            if nb % cb:
                continue

            def step_chunk(x, cb=cb):
                xr, aux = vq._prep_inputs(x[None, :in_dim] * 1e-3, kh4, True)
                y = vpu_chunk_call(xr, aux, qs4v, scales_v, cb)
                return jnp.broadcast_to(jnp.tanh(y[:1]), (in_dim,))

            dt = marginal_chain(step_chunk, jnp.ones((in_dim,), jnp.float32))
            r[vname] = round(nbytes / dt / 1e9, 1)

        res[name] = r
        print(name, json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
