"""Aux subsystem tests: ggml-compat op set, profiling introspection,
optimizers (SURVEY.md §2.4 parity rows), greedy on-device decode loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.ops import ggml_compat as g


def test_elementwise_ops():
    a = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_allclose(g.sqr(a), np.asarray(a) ** 2)
    np.testing.assert_allclose(g.sgn(a), np.sign(np.asarray(a)))
    np.testing.assert_allclose(g.step(a), [0, 0, 0, 1, 1])
    np.testing.assert_allclose(g.relu(a), np.maximum(np.asarray(a), 0))
    assert g.sum(a).shape == (1,)


def test_mul_mat_row_dot_convention():
    # ggml_mul_mat(a, b): out[j, i] = dot(a_row_i, b_row_j) → b @ a.T
    a = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((3, 8)), jnp.float32)
    out = g.mul_mat(a, b)
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out, np.asarray(b) @ np.asarray(a).T, rtol=1e-5)


def test_diag_mask_inf_and_softmax():
    x = jnp.zeros((3, 5))
    m = g.diag_mask_inf(x, n_past=1)
    # row i allows cols j <= 1 + i
    expected_mask = np.array([
        [0, 0, 1, 1, 1],
        [0, 0, 0, 1, 1],
        [0, 0, 0, 0, 1],
    ], dtype=bool)
    np.testing.assert_array_equal(~np.isfinite(np.asarray(m)), expected_mask)
    sm = g.soft_max(m)
    np.testing.assert_allclose(np.asarray(sm).sum(axis=-1), np.ones(3), rtol=1e-6)
    assert np.all(np.asarray(sm)[expected_mask] == 0)


def test_rope_mode1_only_rotates_new_positions():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((6, 2, 8)), jnp.float32)
    out = g.rope(x, n_past=4, n_dims=8, mode=1)
    # first 4 positions unchanged (already-rotated cache history)
    np.testing.assert_array_equal(np.asarray(out)[:4], np.asarray(x)[:4])
    assert not np.allclose(np.asarray(out)[4:], np.asarray(x)[4:])


def test_rope_mode0_equals_mode1_on_fresh_positions():
    """rope-at-insert equivalence: mode-0 on [n_past, n_past+N) positions ==
    mode-1 over the whole buffer restricted to those rows."""
    rng = np.random.default_rng(1)
    full = jnp.asarray(rng.standard_normal((7, 2, 8)), jnp.float32)
    m1 = g.rope(full, n_past=3, n_dims=8, mode=1)
    m0 = g.rope(full[3:], n_past=3, n_dims=8, mode=0)
    np.testing.assert_allclose(np.asarray(m1)[3:], np.asarray(m0), rtol=1e-5, atol=1e-6)


def test_flash_attn_matches_unfused():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((4, 2, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((4, 2, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((4, 2, 8)), jnp.float32)
    out = g.flash_attn(q, k, v, masked=True)
    scores = np.einsum("nhd,mhd->hnm", q, k) / np.sqrt(8)
    i, j = np.mgrid[0:4, 0:4]
    scores = np.where(j[None] > i[None], -np.inf, scores)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = np.einsum("hnm,mhd->nhd", p, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_autodiff_covers_ops_reference_aborts_on():
    """jax.grad works through gelu/silu/norm/mul_mat/rope — the ops whose
    ggml backward is GGML_ASSERT(false) (ggml.c:8702-8804)."""
    w = jnp.asarray(np.random.default_rng(3).standard_normal((4, 8)), jnp.float32)

    def loss(w):
        x = jnp.ones((2, 8))
        h = g.silu(g.mul_mat(w, x))
        h = g.norm(h)
        r = g.rope(h.reshape(2, 1, 4), 0, 4, 0)
        return jnp.sum(g.gelu(r) ** 2)

    grads = jax.grad(loss)(w)
    assert grads.shape == w.shape
    assert np.isfinite(np.asarray(grads)).all()


def test_opt_adam_quadratic():
    from llama_swift_tpu.utils.optimize import opt

    target = jnp.asarray([1.0, -2.0, 3.0])

    def f(x):
        return jnp.sum((x - target) ** 2)

    res = opt(f, jnp.zeros(3), method="adam", n_iter=500, alpha=0.05)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(target), atol=0.05)


def test_opt_lbfgs_quadratic():
    pytest.importorskip("optax")
    import optax

    if not hasattr(optax, "lbfgs"):
        pytest.skip("optax.lbfgs unavailable")
    from llama_swift_tpu.utils.optimize import opt

    target = jnp.asarray([0.5, 1.5])

    def f(x):
        return jnp.sum((x - target) ** 2) + 0.1 * jnp.sum(x**4)

    res = opt(f, jnp.zeros(2), method="lbfgs", n_iter=50)
    assert res.fx < f(jnp.zeros(2))


def test_graph_summary_and_hlo_dump(tiny_cfg, tiny_tensors):
    from llama_swift_tpu.utils.profiling import dump_hlo, graph_summary

    def f(x):
        return jnp.sum(x * 2.0)

    x = jnp.ones((8, 8))
    s = graph_summary(f, x)
    assert isinstance(s, dict) and s
    hlo = dump_hlo(f, x)
    assert "HloModule" in hlo


def test_step_timer():
    from llama_swift_tpu.utils.profiling import StepTimer

    t = StepTimer().start()
    t.tick()
    t.tick()
    t.tick()
    s = t.summary()
    assert s["decode_tokens"] == 3
    assert s["ttft_s"] >= 0


def test_greedy_decode_loop_matches_stepwise(tiny_cfg, tiny_tensors):
    from llama_swift_tpu.config import ModelConfig
    from llama_swift_tpu.models import llama as model_lib

    cfg = ModelConfig.tiny()
    params = model_lib.params_from_tensors(tiny_tensors, cfg, param_dtype=jnp.float32)

    cache = model_lib.init_cache(cfg)
    toks_loop, _ = model_lib.greedy_decode_loop(
        params, jnp.int32(5), jnp.int32(0), cache, cfg, 6
    )

    cache = model_lib.init_cache(cfg)
    tok = jnp.int32(5)
    toks_step = []
    for i in range(6):
        logits, cache = model_lib.decode_step(params, tok, jnp.int32(i), cache, cfg)
        tok = jnp.argmax(logits).astype(jnp.int32)
        toks_step.append(int(tok))
    assert list(np.asarray(toks_loop)) == toks_step
