"""Pallas kernel numerics vs einsum attention (interpreter mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import guided_attention_tpu.ops.flash_attention as fa
from guided_attention_tpu.ops.attention import attention


@pytest.fixture(autouse=True)
def interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def ref_attn(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v), p


def make_qkv(shape, n=3, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return [jax.random.normal(k, shape, jnp.float32) for k in keys]


def test_flash_self_forward_and_grads():
    B, H, N, D = 1, 2, 256, 40
    q, k, v = make_qkv((B, H, N, D))
    sc = 1 / np.sqrt(D)
    out = fa.flash_attention(q, k, v, block_q=128)
    ref, _ = ref_attn(q, k, v, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
    g1 = jax.grad(lambda *a: jnp.sum(fa.flash_attention(*a, block_q=128) ** 2), (0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(ref_attn(*a, sc)[0] ** 2), (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_cross_with_map_forward_map_and_grads():
    B, H, N, D, K = 1, 2, 128, 40, 77
    q, = make_qkv((B, H, N, D), 1)
    k, v = make_qkv((B, H, K, D), 2, seed=1)
    sc = 1 / np.sqrt(D)
    out, m = fa.cross_attention_with_map(q, k, v, block_q=128)
    ref, p = ref_attn(q, k, v, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)
    np.testing.assert_allclose(np.asarray(m), np.asarray(p.mean(1)), atol=2e-6)

    def lf(*a):
        o, mm = fa.cross_attention_with_map(*a, block_q=128)
        return jnp.sum(o**2) + jnp.sum(mm**2)

    def lr(*a):
        o, pp = ref_attn(*a, sc)
        return jnp.sum(o**2) + jnp.sum(pp.mean(1) ** 2)

    g1 = jax.grad(lf, (0, 1, 2))(q, k, v)
    g2 = jax.grad(lr, (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_attention_op_routes_to_kernels():
    """attention(use_flash=True) matches the einsum path for both the self
    fast path and the fused cross+map path."""
    B, N, C, H = 1, 256, 80, 2
    key = jax.random.PRNGKey(2)
    q, k, v = [jax.random.normal(kk, (B, N, C)) for kk in jax.random.split(key, 3)]
    o_e, _ = attention(q, k, v, H, use_flash=False)
    o_f, _ = attention(q, k, v, H, use_flash=True)
    np.testing.assert_allclose(np.asarray(o_e), np.asarray(o_f), atol=5e-6)
    kc, vc = [jax.random.normal(kk, (B, 77, C)) for kk in jax.random.split(key, 2)]
    o_e, m_e = attention(q, kc, vc, H, capture=True, use_flash=False)
    o_f, m_f = attention(q, kc, vc, H, capture=True, use_flash=True)
    np.testing.assert_allclose(np.asarray(o_e), np.asarray(o_f), atol=5e-6)
    np.testing.assert_allclose(np.asarray(m_e), np.asarray(m_f), atol=2e-6)


def test_pww_falls_back_to_einsum():
    """paint-with-words needs materialized scores; the flash flag must not
    change results when a pww mask is active."""
    B, N, C, H, K = 1, 64, 80, 2, 77
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, N, C))
    k, v = [jax.random.normal(kk, (B, K, C)) for kk in jax.random.split(key, 2)]
    mask = jnp.zeros((N, K)).at[:, 3].set(1.0)
    gate = jnp.asarray(0.7)
    o1, m1 = attention(q, k, v, H, capture=True, pww_mask=mask, pww_gate=gate, use_flash=True)
    o2, m2 = attention(q, k, v, H, capture=True, pww_mask=mask, pww_gate=gate, use_flash=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # and the bias actually shifts mass toward token 3
    o0, m0 = attention(q, k, v, H, capture=True, use_flash=False)
    assert float(m1[..., 3].mean()) > float(m0[..., 3].mean())
