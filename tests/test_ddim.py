"""DDIM schedule math vs hand-computed diffusers-0.12 semantics
(reference pipeline_guided_attention.py:883-890, 1027-1029, 1046-1053)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guided_attention_tpu.schedulers.ddim import make_ddim_schedule, ddim_step, renoise


def test_timesteps_sd15_50_steps():
    s = make_ddim_schedule(50)
    ts = np.asarray(s.timesteps)
    assert ts[0] == 981 and ts[-1] == 1
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_alphas_cumprod_scaled_linear():
    s = make_ddim_schedule(50)
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    ac = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(s.alpha_prod), ac[np.asarray(s.timesteps)], rtol=1e-6)
    # set_alpha_to_one=False: the final step's prev alpha is alphas_cumprod[0]
    assert float(s.alpha_prod_prev[-1]) == pytest.approx(ac[0], rel=1e-6)


def test_sigma_formula():
    s = make_ddim_schedule(50)
    a = np.asarray(s.alpha_prod)
    np.testing.assert_allclose(np.asarray(s.sigmas), np.sqrt((1 - a) / a), rtol=1e-5)


def test_ddim_step_recovers_x0():
    """If sample = sqrt(a)*x0 + sqrt(1-a)*eps and noise_pred == eps,
    pred_original == x0 and prev lands on the correct trajectory point."""
    s = make_ddim_schedule(50)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
    i = 10
    a_t = s.alpha_prod[i]
    xt = jnp.sqrt(a_t) * x0 + jnp.sqrt(1 - a_t) * eps
    prev, pred_x0 = ddim_step(s, i, eps, xt)
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), rtol=1e-4, atol=1e-5)
    a_p = s.alpha_prod_prev[i]
    want_prev = jnp.sqrt(a_p) * x0 + jnp.sqrt(1 - a_p) * eps
    np.testing.assert_allclose(np.asarray(prev), np.asarray(want_prev), rtol=1e-4, atol=1e-5)


def test_renoise_blend_and_last_step_identity():
    s = make_ddim_schedule(50)
    x = jnp.ones((1, 4, 8, 8))
    key = jax.random.PRNGKey(2)
    # interior step: Bt = a_t/a_prev in (0,1), output != input
    y = renoise(s, 5, x, key)
    assert not np.allclose(np.asarray(y), np.asarray(x))
    bt = float(s.renoise_beta[5])
    assert 0.0 < bt < 1.0
    assert bt == pytest.approx(float(s.alpha_prod[5] / s.alpha_prod_prev[5]), rel=1e-5)
    # final step (prev timestep <= 0): identity (pipeline:1051 gate)
    y_last = renoise(s, 49, x, key)
    np.testing.assert_allclose(np.asarray(y_last), np.asarray(x), rtol=1e-6)


def test_deterministic_under_same_key():
    s = make_ddim_schedule(50)
    x = jnp.ones((1, 4, 8, 8))
    k = jax.random.PRNGKey(3)
    np.testing.assert_array_equal(np.asarray(renoise(s, 5, x, k)), np.asarray(renoise(s, 5, x, k)))


def test_eta_zero_matches_default():
    """eta=0 must compile the exact deterministic update (knob default)."""
    s = make_ddim_schedule(50)
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
    xt = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8))
    prev0, x00 = ddim_step(s, 7, eps, xt)
    prev1, x01 = ddim_step(s, 7, eps, xt, eta=0.0, key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(prev0), np.asarray(prev1))
    np.testing.assert_array_equal(np.asarray(x00), np.asarray(x01))


@pytest.mark.parametrize("eta", [0.3, 1.0])
def test_eta_matches_diffusers_formula(eta):
    """Pin the stochastic update against an independent numpy port of
    diffusers DDIMScheduler.step (_get_variance: (1-a_prev)/(1-a_t) *
    (1-a_t/a_prev); prev = sqrt(a_prev)*x0 + sqrt(1-a_prev-std^2)*eps +
    std*noise), using the same key-derived noise."""
    s = make_ddim_schedule(50)
    i = 12
    eps = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 8, 8))
    xt = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8, 8))
    key = jax.random.PRNGKey(6)
    prev, x0 = ddim_step(s, i, eps, xt, eta=eta, key=key)

    a_t = float(s.alpha_prod[i])
    a_prev = float(s.alpha_prod_prev[i])
    eps_n, xt_n = np.asarray(eps), np.asarray(xt)
    x0_n = (xt_n - np.sqrt(1 - a_t) * eps_n) / np.sqrt(a_t)
    var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    std = eta * np.sqrt(var)
    noise = np.asarray(jax.random.normal(key, xt.shape, jnp.float32))
    want = np.sqrt(a_prev) * x0_n + np.sqrt(1 - a_prev - std**2) * eps_n + std * noise
    np.testing.assert_allclose(np.asarray(prev), want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x0), x0_n, rtol=1e-5, atol=1e-6)
    # stochastic: a different key moves the sample
    prev2, _ = ddim_step(s, i, eps, xt, eta=eta, key=jax.random.PRNGKey(7))
    assert not np.allclose(np.asarray(prev), np.asarray(prev2))


def test_eta_requires_key():
    s = make_ddim_schedule(50)
    x = jnp.ones((1, 4, 8, 8))
    with pytest.raises(ValueError):
        ddim_step(s, 5, x, x, eta=0.5)
