"""Scratch experiments: what limits the VPU matvec kernel's HBM rate?

Variants, all timed with the MARGINAL method (time(2N)-time(N), host fetch):
  probe_g1   : current stream probe, block (1, 128, kh4)
  probe_g4   : bigger blocks, (4, 128, kh4) per grid step
  probe_2op  : weight split into two operands (2 concurrent DMA queues)
  vpu        : real kernel
  vpu_g2     : real kernel, 2 out-tiles per grid step
  vpu_half   : real kernel but only 4 of 8 phases (WRONG math; VPU-ops probe)
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
from llama_swift_tpu.tools.kernelbench import synth_v

OUT_TILE, PHASES, OUT_LANES = vq.OUT_TILE, vq.PHASES, vq.OUT_LANES


def marginal_scan(step_fn, x0, lo=32):
    hi = 2 * lo

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x0, iters):
        def body(x, _):
            return step_fn(x), ()

        xf, _ = jax.lax.scan(body, x0, None, length=iters)
        return xf

    def t(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(x0, iters))[0])
        return time.perf_counter() - t0

    t(lo); t(hi)
    dt = min(t(hi), t(hi)) - min(t(lo), t(lo))
    return dt / lo


# --- probe with G out-tiles per grid step ---------------------------------

def _probe_kernel_g(b_ref, qs4_ref, out_ref):
    t = qs4_ref[...] + b_ref[0, 0]
    out_ref[...] = jnp.sum(t, axis=(0, 2), keepdims=True).astype(
        jnp.float32
    ) + jnp.zeros_like(out_ref)


@functools.partial(jax.jit, static_argnames=("g",))
def probe_g(qs4v, bias, g):
    ot, lt, kh4 = qs4v.shape
    out = pl.pallas_call(
        _probe_kernel_g,
        grid=(ot // g,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, lt, kh4), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lt, 128), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot // g, lt, 128), jnp.float32),
    )(bias.reshape(1, 1).astype(jnp.int32), qs4v)
    return out[:, 0, 0]


# --- probe with the weight split into two operands -------------------------

def _probe_kernel_2op(b_ref, a_ref, c_ref, out_ref):
    t = a_ref[0] + c_ref[0] + b_ref[0, 0]
    out_ref[0] = jnp.broadcast_to(
        jnp.sum(t, axis=1, keepdims=True), out_ref.shape[1:]
    ).astype(jnp.float32)


@jax.jit
def probe_2op(qa, qb, bias):
    ot, lt, kh4 = qa.shape
    out = pl.pallas_call(
        _probe_kernel_2op,
        grid=(ot,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, lt, kh4), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, kh4), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lt, 128), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, lt, 128), jnp.float32),
    )(bias.reshape(1, 1).astype(jnp.int32), qa, qb)
    return out[:, 0, 0]


# --- half-phase kernel (VPU op-count sensitivity; WRONG math) ---------------

def _vpu_half_kernel(xr_ref, aux_ref, qs4_ref, scales_ref, out_ref):
    xl = qs4_ref[0]
    kh4 = xl.shape[1]
    nb = kh4 // 4
    acc = (xl & vq._MASKS[0]).astype(jnp.float32) * xr_ref[0:1, :]
    for p in range(1, 4):
        acc = acc + (xl & vq._MASKS[p]).astype(jnp.float32) * xr_ref[p : p + 1, :]
    accb = (
        acc[:, 0 * nb : 1 * nb]
        + acc[:, 1 * nb : 2 * nb]
        + acc[:, 2 * nb : 3 * nb]
        + acc[:, 3 * nb : 4 * nb]
    )
    s_eff = scales_ref[0] * aux_ref[0:1, :]
    y = jnp.sum((accb - aux_ref[1:2, :]) * s_eff, axis=1, keepdims=True)
    out_ref[0] = jnp.broadcast_to(y, (OUT_TILE, OUT_LANES))


@jax.jit
def vpu_half_call(xr, aux, qs4v, scales_v):
    ot, lt, kh4 = qs4v.shape
    nb = scales_v.shape[2]
    out = pl.pallas_call(
        _vpu_half_kernel,
        grid=(ot,),
        in_specs=[
            pl.BlockSpec((PHASES, kh4), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, nb), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, kh4), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, nb), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lt, OUT_LANES), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
    )(xr, aux, qs4v, scales_v)
    return out[:, :, 0].reshape(ot * lt)


# --- vpu kernel with G out-tiles per grid step ------------------------------

def _vpu_kernel_g(xr_ref, aux_ref, qs4_ref, scales_ref, out_ref):
    g = qs4_ref.shape[0]
    for i in range(g):
        y = vq._vpu_core(qs4_ref[i], xr_ref, aux_ref, scales_ref[i])
        out_ref[i] = jnp.broadcast_to(y, (OUT_TILE, OUT_LANES))


@functools.partial(jax.jit, static_argnames=("g",))
def vpu_g_call(xr, aux, qs4v, scales_v, g):
    ot, lt, kh4 = qs4v.shape
    nb = scales_v.shape[2]
    out = pl.pallas_call(
        _vpu_kernel_g,
        grid=(ot // g,),
        in_specs=[
            pl.BlockSpec((PHASES, kh4), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, nb), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lt, kh4), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lt, nb), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, lt, OUT_LANES), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ot, lt, OUT_LANES), jnp.float32),
    )(xr, aux, qs4v, scales_v)
    return out[:, :, 0].reshape(ot * lt)


def main():
    shapes = {"w13": (22016, 4096), "w2": (4096, 11264), "qkv": (12288, 4096)}
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else list(shapes)
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "probe_g1", "probe_g4", "probe_2op", "vpu", "vpu_g2", "vpu_half",
    ]
    res = {}
    for name in which:
        out_dim, in_dim = shapes[name]
        w, nbytes = synth_v(out_dim, in_dim)
        qs4v, scales_v = w.qs4v, w.scales_v
        ot, lt, kh4 = qs4v.shape
        qbytes = out_dim * in_dim // 2
        x0 = jnp.ones((1, in_dim), jnp.float32) * 0.01
        xr, aux = vq._prep_inputs(x0, kh4, True)
        r = {}

        if "probe_g1" in variants:
            dt = marginal_scan(
                lambda b: b + jnp.int32(1) + (vq.stream_probe(qs4v, b)[0] == jnp.inf).astype(jnp.int32),
                jnp.int32(0),
            )
            r["probe_g1"] = qbytes / dt / 1e9
        if "probe_g4" in variants:
            dt = marginal_scan(
                lambda b: b + jnp.int32(1) + (probe_g(qs4v, b, 4)[0] == jnp.inf).astype(jnp.int32),
                jnp.int32(0),
            )
            r["probe_g4"] = qbytes / dt / 1e9
        if "probe_2op" in variants:
            half = ot // 2
            qa, qb = qs4v[:half], qs4v[half:]
            dt = marginal_scan(
                lambda b: b + jnp.int32(1) + (probe_2op(qa, qb, b)[0] == jnp.inf).astype(jnp.int32),
                jnp.int32(0),
            )
            r["probe_2op"] = qbytes / dt / 1e9
        if "vpu" in variants:
            dt = marginal_scan(
                lambda x: x * (1.0 + 1e-12 * vq._q4_0_vpu_call(xr, aux, qs4v, scales_v)[:1]),
                jnp.ones((1,), jnp.float32),
            )
            r["vpu"] = nbytes / dt / 1e9
        if "vpu_g2" in variants:
            dt = marginal_scan(
                lambda x: x * (1.0 + 1e-12 * vpu_g_call(xr, aux, qs4v, scales_v, 2)[:1]),
                jnp.ones((1,), jnp.float32),
            )
            r["vpu_g2"] = nbytes / dt / 1e9
        if "vpu_half" in variants:
            dt = marginal_scan(
                lambda x: x * (1.0 + 1e-12 * vpu_half_call(xr, aux, qs4v, scales_v)[:1]),
                jnp.ones((1,), jnp.float32),
            )
            r["vpu_half"] = nbytes / dt / 1e9
        res[name] = {k: round(v, 1) for k, v in r.items()}
        print(name, json.dumps(res[name]), flush=True)


if __name__ == "__main__":
    main()
