"""Scheduler math tests, including the degenerate beta==1 GenPercept algebra."""

import jax
import jax.numpy as jnp
import numpy as np

from genpercept_tpu.diffusion import (
    GENPERCEPT_SCHEDULER,
    SchedulerConfig,
    add_noise,
    ddim_step,
    ddpm_step,
    get_velocity,
    leading_timesteps,
    make_scheduler,
)
from genpercept_tpu.diffusion.schedulers import pred_original_sample


def test_genpercept_beta1_algebra():
    """With beta_start=beta_end=1: add_noise==eps, velocity==-x0,
    ddim pred_x0==-model_output. This is what makes one-step inference work."""
    cfg = GENPERCEPT_SCHEDULER
    state = make_scheduler(cfg)
    assert np.allclose(np.asarray(state.alphas_cumprod), 0.0)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 8, 8)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 4, 8, 8)), jnp.float32)
    t = jnp.array([1, 500])

    np.testing.assert_allclose(add_noise(state, x0, eps, t), eps, atol=1e-6)
    np.testing.assert_allclose(get_velocity(state, x0, eps, t), -x0, atol=1e-6)

    model_out = eps  # arbitrary
    _, pred_x0 = ddim_step(cfg, state, model_out, t, x0, num_inference_steps=1)
    np.testing.assert_allclose(pred_x0, -model_out, atol=1e-6)


def test_leading_timesteps_one_step_is_t1():
    ts = leading_timesteps(GENPERCEPT_SCHEDULER, 1)
    assert ts.tolist() == [1]
    ts10 = leading_timesteps(GENPERCEPT_SCHEDULER, 10)
    assert len(ts10) == 10 and ts10[0] == 901 and ts10[-1] == 1
    assert all(np.diff(ts10) == -100)


def test_scaled_linear_matches_sd21_table():
    """SD2.1 default (0.00085, 0.012) scaled_linear: spot-check endpoints."""
    cfg = SchedulerConfig(beta_start=0.00085, beta_end=0.012)
    state = make_scheduler(cfg)
    betas = np.asarray(state.betas)
    assert abs(betas[0] - 0.00085) < 1e-9
    assert abs(betas[-1] - 0.012) < 1e-9
    # alphas_cumprod must be monotone decreasing in (0,1)
    abar = np.asarray(state.alphas_cumprod)
    assert np.all(np.diff(abar) < 0) and abar[0] < 1.0 and abar[-1] > 0.0


def test_scaled_linear_power_reduces_to_scaled_linear_at_p2():
    """power_beta_curve=2 over sqrt-space == scaled_linear by construction."""
    a = make_scheduler(SchedulerConfig(beta_schedule="scaled_linear"))
    b = make_scheduler(
        SchedulerConfig(beta_schedule="scaled_linear_power", power_beta_curve=2.0)
    )
    np.testing.assert_allclose(np.asarray(a.betas), np.asarray(b.betas), rtol=1e-6)


def test_zero_snr_rescale_terminal():
    cfg = SchedulerConfig(
        beta_start=0.00085, beta_end=0.012, rescale_betas_zero_snr=True
    )
    state = make_scheduler(cfg)
    abar = np.asarray(state.alphas_cumprod)
    assert abs(abar[-1]) < 1e-10  # exactly zero terminal SNR


def test_add_noise_velocity_roundtrip():
    """x_t and v determine (x0, eps): check the inverse algebra for a
    nondegenerate schedule."""
    cfg = SchedulerConfig(beta_start=0.00085, beta_end=0.012)
    state = make_scheduler(cfg)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    t = jnp.array([10, 900])

    xt = add_noise(state, x0, eps, t)
    v = get_velocity(state, x0, eps, t)
    x0_rec, eps_rec = pred_original_sample(cfg, state, v, xt, t)
    np.testing.assert_allclose(x0_rec, x0, atol=1e-4)
    np.testing.assert_allclose(eps_rec, eps, atol=1e-4)


def test_ddim_multi_step_denoises():
    """10-step DDIM with a perfect v-predicting oracle recovers x0."""
    cfg = SchedulerConfig(beta_start=0.00085, beta_end=0.012)
    state = make_scheduler(cfg)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)

    n_steps = 10
    ts = leading_timesteps(cfg, n_steps)
    sample = add_noise(state, x0, eps, jnp.array([ts[0]]))
    for t in ts:
        t_arr = jnp.array([t])
        # oracle model output: the true velocity at this (x_t, t)
        abar = state.alphas_cumprod[t]
        # recover the eps consistent with current sample and true x0
        eps_t = (sample - jnp.sqrt(abar) * x0) / jnp.sqrt(1 - abar)
        v = jnp.sqrt(abar) * eps_t - jnp.sqrt(1 - abar) * x0
        sample, pred_x0 = ddim_step(cfg, state, v, t_arr, sample, n_steps)
    # the final DDIM step lands at final_alpha_cumprod = abar[0] (< 1 since
    # set_alpha_to_one=False), so `sample` keeps a sqrt(1-abar[0]) eps term;
    # the oracle's pred_x0 must be exact.
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), atol=1e-3)


def test_ddpm_step_shapes_and_t0():
    cfg = SchedulerConfig(beta_start=0.00085, beta_end=0.012)
    state = make_scheduler(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    t = jnp.array([0, 999])
    prev, x0 = ddpm_step(cfg, state, v, t, x, eps)
    assert prev.shape == x.shape and x0.shape == x.shape
    # at t=0 no noise is added: prev must be deterministic given inputs
    prev2, _ = ddpm_step(cfg, state, v, t, x, -eps)
    np.testing.assert_allclose(prev[0], prev2[0], atol=1e-6)


def test_jit_and_grad_through_scheduler():
    cfg = GENPERCEPT_SCHEDULER
    state = make_scheduler(cfg)

    @jax.jit
    def loss(x0, eps):
        t = jnp.array([1])
        v = get_velocity(state, x0, eps, t)
        return jnp.mean(v**2)

    g = jax.grad(loss)(jnp.ones((1, 4, 2, 2)), jnp.zeros((1, 4, 2, 2)))
    np.testing.assert_allclose(g, 2.0 * jnp.ones_like(g) / g.size, atol=1e-6)
