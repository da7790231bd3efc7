"""Optimization driver — parity with ``ggml_opt`` (Adam + L-BFGS,
``Sources/cpp/ggml.c:9752-10421``).

The reference ships full Adam and L-BFGS(+backtracking-linesearch)
implementations that nothing in the inference product uses (SURVEY.md §2.4
"Optimizers (unused)").  Capability parity here is jax-native: gradients via
``jax.grad`` (the reference's backward pass aborts on half its ops,
``ggml.c:8702-8804``; ours covers everything), Adam via optax, L-BFGS via
optax's solver with a zoom linesearch.

API mirrors ``ggml_opt(ctx, params, f, x)``: minimize a scalar function of a
pytree, returning result + convergence info.  Defaults follow
``ggml_opt_default_params`` (``ggml.c:10307-10377``): adam lr 1e-3, 100
iters; lbfgs m=6, 100 iters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


class OptResult:
    def __init__(self, x, fx, n_iters, converged):
        self.x = x
        self.fx = float(fx)
        self.n_iters = int(n_iters)
        self.converged = bool(converged)


@dataclasses.dataclass
class AdamParams:
    """Defaults per ``ggml.c:10318-10341``."""

    n_iter: int = 100
    alpha: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    eps_f: float = 1e-5  # relative function-change convergence test
    eps_g: float = 1e-3  # gradient-norm convergence test


@dataclasses.dataclass
class LBFGSParams:
    """Defaults per ``ggml.c:10343-10373``."""

    n_iter: int = 100
    m: int = 6
    eps: float = 1e-5


def adam(
    f: Callable[[Any], jnp.ndarray],
    x0: Any,
    params: Optional[AdamParams] = None,
) -> OptResult:
    import optax

    p = params or AdamParams()
    opt = optax.adam(p.alpha, b1=p.beta1, b2=p.beta2, eps=p.eps)
    state = opt.init(x0)
    vg = jax.jit(jax.value_and_grad(f))

    @jax.jit
    def step(x, state):
        fx, g = jax.value_and_grad(f)(x)
        updates, state = opt.update(g, state, x)
        gnorm = optax.global_norm(g)
        return optax.apply_updates(x, updates), state, fx, gnorm

    x = x0
    fx_prev = None
    for it in range(p.n_iter):
        x, state, fx, gnorm = step(x, state)
        fx = float(fx)
        if float(gnorm) < p.eps_g:
            return OptResult(x, fx, it + 1, True)
        if fx_prev is not None and abs(fx - fx_prev) < p.eps_f * max(1.0, abs(fx)):
            return OptResult(x, fx, it + 1, True)
        fx_prev = fx
    return OptResult(x, float(vg(x)[0]), p.n_iter, False)


def lbfgs(
    f: Callable[[Any], jnp.ndarray],
    x0: Any,
    params: Optional[LBFGSParams] = None,
) -> OptResult:
    import optax

    p = params or LBFGSParams()
    solver = optax.lbfgs(memory_size=p.m)
    vg = jax.jit(jax.value_and_grad(f))

    @jax.jit
    def step(x, state):
        fx, g = jax.value_and_grad(f)(x)
        updates, state = solver.update(
            g, state, x, value=fx, grad=g, value_fn=f
        )
        return optax.apply_updates(x, updates), state, fx, optax.global_norm(g)

    x = x0
    state = solver.init(x0)
    for it in range(p.n_iter):
        x, state, fx, gnorm = step(x, state)
        if float(gnorm) < p.eps:
            return OptResult(x, float(fx), it + 1, True)
    return OptResult(x, float(vg(x)[0]), p.n_iter, False)


def opt(f, x0, method: str = "adam", **kw) -> OptResult:
    """``ggml_opt`` facade: method ∈ {"adam", "lbfgs"} (``ggml.c:10379-10421``)."""
    if method == "adam":
        return adam(f, x0, AdamParams(**kw) if kw else None)
    if method == "lbfgs":
        return lbfgs(f, x0, LBFGSParams(**kw) if kw else None)
    raise ValueError(f"unknown method {method!r}")
