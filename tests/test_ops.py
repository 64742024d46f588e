"""Pallas kernel correctness tests (interpreter mode on CPU): forward and
gradient parity against pure-XLA / reference-transliteration math."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

os.environ["NRT_PALLAS"] = "interpret"

from news_recsys_tpu.ops.dcn_kernel import (dcn_cross_stack,
                                            reference_cross_stack)
from news_recsys_tpu.ops.fm_kernel import fm_second_order
from news_recsys_tpu.ops.fused_lookup_pool import (fused_lookup_pool,
                                                   reference_lookup_pool)


@pytest.fixture(autouse=True)
def _interpret_mode():
    os.environ["NRT_PALLAS"] = "interpret"
    yield
    os.environ["NRT_PALLAS"] = ""


def test_fused_lookup_pool_forward():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    table = table.at[0].set(0.0)
    ids = jnp.asarray(rng.integers(0, 64, (16, 5)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (16, 5)), jnp.float32)
    out = fused_lookup_pool(table, ids, mask)
    ref = reference_lookup_pool(table, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_fused_lookup_pool_grad():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((32, 4)), jnp.float32).at[0].set(0.0)
    ids = jnp.asarray(rng.integers(0, 32, (8, 6)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (8, 6)), jnp.float32)

    def f_fused(t):
        return jnp.sum(fused_lookup_pool(t, ids, mask) ** 2)

    def f_ref(t):
        return jnp.sum(reference_lookup_pool(t, ids, mask) ** 2)

    g_fused = jax.grad(f_fused)(table)
    g_ref = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
    # padding row gets zero grad
    np.testing.assert_allclose(np.asarray(g_fused[0]), 0.0)


def test_fm_second_order():
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal((256, 5, 15)), jnp.float32)
    out = fm_second_order(v)
    sum_v = jnp.sum(v, axis=1)
    ref = 0.5 * jnp.sum(sum_v**2 - jnp.sum(v**2, axis=1), axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    g = jax.grad(lambda v: jnp.sum(fm_second_order(v) ** 2))(v)
    g_ref = jax.grad(lambda v: jnp.sum((0.5 * jnp.sum(jnp.sum(v, 1)**2 - jnp.sum(v**2, 1), 1)) ** 2))(v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-3)


def test_dcn_cross_stack():
    rng = np.random.default_rng(3)
    B, D, NL = 128, 16, 3
    x0 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((NL, D)) * 0.1, jnp.float32)
    bs = jnp.asarray(rng.standard_normal((NL, D)) * 0.1, jnp.float32)

    out = dcn_cross_stack(x0, ws, bs)
    ref = reference_cross_stack(x0, ws, bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    # gradient parity vs autodiff through the reference formulation
    def f(x0, ws, bs):
        return jnp.sum(dcn_cross_stack(x0, ws, bs) ** 2)

    def f_ref(x0, ws, bs):
        return jnp.sum(reference_cross_stack(x0, ws, bs) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(x0, ws, bs)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x0, ws, bs)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)
