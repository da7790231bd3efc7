"""Prototype: VPU-only flash-decode attention with transposed-K layout.

The MXU variant is stationary-load-bound (~1024 cycles/head/layer).  Here:
  kT cache [L, H, Dh, ctx]  (Dh on sublanes, ctx on lanes)
  v  cache [L, H, ctx, Dh]  (unchanged)
  s  = sublane-reduce(kT * qT_bcast)   -> [1, C]
  p  = online-softmax on [1, C]
  pv = sublane-reduce(v * pT_bcast)    -> [1, Dh]
(pT = transpose of p — the one in-kernel relayout to validate.)

Measures us/layer for the MXU kernel vs the VPU kernel, plus the cost of a
lane-strided DUS write into the transposed cache.
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _vpu_flash_kernel(s_ref, qt_ref, kt_ref, v_ref, out_ref, m_ref, l_ref, acc_ref):
    """grid (H, n_chunks).  qt: [Dh, H]; kt chunk: [1, 1, Dh, C];
    v chunk: [1, 1, C, Dh]; out: [H, Dh]; scratch m/l [1,128], acc [1,Dh]."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    dh, chunk = kt_ref.shape[2], kt_ref.shape[3]

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_past = s_ref[1]
    scale = 1.0 / np.sqrt(float(dh))
    qh = qt_ref[:, pl.dslice(i, 1)].astype(jnp.float32)  # [Dh, 1]
    kt = kt_ref[0, 0].astype(jnp.float32)  # [Dh, C]
    s = jnp.sum(kt * qh, axis=0, keepdims=True) * scale  # [1, C] sublane-reduce
    j = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    s = jnp.where(j <= n_past, s, NEG_INF)

    m_prev = m_ref[0, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # [1, C]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p)
    pt = p.reshape(chunk, 1)  # the relayout under test: [1,C] -> [C,1]
    pv = jnp.sum(v_ref[0, 0].astype(jnp.float32) * pt, axis=0, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.full_like(m_ref, m_new)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[pl.dslice(i, 1), :] = (acc_ref[:] / l_ref[0, 0]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk",))
def vpu_flash(qt, kt, v, layer_idx, n_past, *, chunk=512):
    L, h, dh, n_ctx = kt.shape
    chunk = min(chunk, n_ctx)
    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32), jnp.asarray(n_past, jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h, n_ctx // chunk),
        in_specs=[
            pl.BlockSpec((dh, h), lambda i, c, s: (0, 0)),
            pl.BlockSpec((1, 1, dh, chunk), lambda i, c, s: (s[0], i, 0, c)),
            pl.BlockSpec((1, 1, chunk, dh), lambda i, c, s: (s[0], i, c, 0)),
        ],
        out_specs=pl.BlockSpec((h, dh), lambda i, c, s: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((1, dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _vpu_flash_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, dh), jnp.float32),
    )(scalars, qt, kt, v)


def reference(q, k_plane, v_plane, n_past):
    s = jnp.einsum("hd,hjd->hj", q.astype(jnp.float32), k_plane.astype(jnp.float32))
    s = s / np.sqrt(float(q.shape[-1]))
    j = jnp.arange(k_plane.shape[1])[None, :]
    s = jnp.where(j <= n_past, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hj,hjd->hd", p, v_plane.astype(jnp.float32))


def main():
    L, H, C, D = 32, 32, 512, 128
    kd = jax.random.normal(jax.random.PRNGKey(0), (L, H, C, D), jnp.bfloat16)
    kt = jnp.transpose(kd, (0, 1, 3, 2))
    v = jax.random.normal(jax.random.PRNGKey(1), (L, H, C, D), jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(2), (H, D), jnp.float32)
    qt = q.T

    out = vpu_flash(qt, kt, v, jnp.int32(2), jnp.int32(300))
    ref = reference(q, kd[2], v[2], jnp.int32(300))
    print("correctness max diff:", float(jnp.max(jnp.abs(out - ref))))

    # --- timing: us/layer ---
    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(qt, kt, v, iters):
        def body(qc, il):
            o = vpu_flash(qc, kt, v, il % L, jnp.int32(300))
            return o.T.astype(jnp.float32) * 1e-3 + qt, ()
        qf, _ = jax.lax.scan(body, qt, jnp.arange(iters, dtype=jnp.int32))
        return qf

    def t(iters):
        t0 = time.perf_counter(); np.asarray(loop(qt, kt, v, iters)); return time.perf_counter() - t0

    t(64); t(128)
    dt = (min(t(128), t(128)) - min(t(64), t(64))) / 64
    print(f"vpu_flash: {dt*1e6:.1f} us/layer  {2*H*C*D*2/dt/1e9:.1f} GB/s")

    # --- transposed cache write cost (lane-strided DUS) ---
    @functools.partial(jax.jit, static_argnames=("iters",), donate_argnames=("kt",))
    def wloop(kt, knew, iters):
        def body(carry, t_):
            kt = carry
            kt = jax.lax.dynamic_update_slice(
                kt, knew * (1.0 + t_.astype(jnp.bfloat16)), (0, 0, 0, t_ % C)
            )
            return kt, ()
        kt, _ = jax.lax.scan(body, kt, jnp.arange(iters, dtype=jnp.int32))
        return kt

    knew = jnp.ones((L, H, D, 1), jnp.bfloat16)
    def tw(iters):
        nonlocal_kt = jnp.array(kt)  # fresh donation target
        t0 = time.perf_counter()
        r = wloop(nonlocal_kt, knew, iters)
        np.asarray(r[0, 0, 0, :4])
        return time.perf_counter() - t0

    tw(64); tw(128)
    dtw = (min(tw(128), tw(128)) - min(tw(64), tw(64))) / 64
    print(f"transposed DUS write (all 32 layers at once): {dtw*1e6:.1f} us/step")

    # baseline: normal-layout DUS write
    @functools.partial(jax.jit, static_argnames=("iters",), donate_argnames=("kd",))
    def wloop_n(kd, knew, iters):
        def body(carry, t_):
            kd = carry
            kd = jax.lax.dynamic_update_slice(
                kd, knew * (1.0 + t_.astype(jnp.bfloat16)), (0, 0, t_ % C, 0)
            )
            return kd, ()
        kd, _ = jax.lax.scan(body, kd, jnp.arange(iters, dtype=jnp.int32))
        return kd

    knew_n = jnp.ones((L, H, 1, D), jnp.bfloat16)
    def twn(iters):
        fresh = jnp.array(kd)
        t0 = time.perf_counter()
        r = wloop_n(fresh, knew_n, iters)
        np.asarray(r[0, 0, :4, 0])
        return time.perf_counter() - t0

    twn(64); twn(128)
    dtwn = (min(twn(128), twn(128)) - min(twn(64), twn(64))) / 64
    print(f"normal DUS write   (all 32 layers at once): {dtwn*1e6:.1f} us/step")


if __name__ == "__main__":
    main()
