"""Diffusion scheduler math as pure JAX functions.

Reimplements (TPU-first, functional) the scheduler semantics the reference
relies on: DDIM/DDPM with `scaled_linear` and the custom `scaled_linear_power`
beta schedules, zero-terminal-SNR rescaling, v-prediction targets, and the
degenerate beta_start=beta_end=1.0 schedule that powers one-step GenPercept
inference (cf. reference `src/customized_modules/ddim.py:61-217` and
`hf_configs/scheduler_beta_1.0_1.0/scheduler_config.json`).

Key algebra: with beta == 1 everywhere, alpha_bar_t == 0 for every t, so
    add_noise(x0, eps, t) == eps
    velocity(x0, eps, t)  == -x0
    ddim pred_x0          == -model_output
which is exactly the "UNet output is the negated prediction latent" trick
(reference `genpercept_pipeline.py:465`).

Everything here is shape-polymorphic, jittable, and free of Python-level
data-dependent control flow. Beta tables are precomputed on host with numpy
and baked into a `SchedulerState` pytree of device arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Static scheduler hyperparameters (hashable; safe as a jit static arg)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # linear | scaled_linear | scaled_linear_power | squaredcos_cap_v2
    power_beta_curve: float = 1.0  # only for scaled_linear_power
    prediction_type: str = "v_prediction"  # epsilon | sample | v_prediction
    rescale_betas_zero_snr: bool = False
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    thresholding: bool = False
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    timestep_spacing: str = "leading"


# The degenerate config used by every GenPercept one-step checkpoint.
GENPERCEPT_SCHEDULER = SchedulerConfig(beta_start=1.0, beta_end=1.0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SchedulerState:
    """Precomputed tables as device arrays; a pytree leaf container."""

    betas: jax.Array  # (T,)
    alphas_cumprod: jax.Array  # (T,)
    final_alpha_cumprod: jax.Array  # scalar

    def tree_flatten(self):
        return (self.betas, self.alphas_cumprod, self.final_alpha_cumprod), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _compute_betas(cfg: SchedulerConfig) -> np.ndarray:
    T = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, T, dtype=np.float64)
    elif cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, T, dtype=np.float64)
            ** 2
        )
    elif cfg.beta_schedule == "scaled_linear_power":
        # Reference custom schedule: linspace in beta^(1/p) space, then ^p
        # (src/customized_modules/ddim.py:91-92,173-175).
        p = cfg.power_beta_curve
        betas = (
            np.linspace(
                cfg.beta_start ** (1.0 / p), cfg.beta_end ** (1.0 / p), T,
                dtype=np.float64,
            )
            ** p
        )
    elif cfg.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(T, dtype=np.float64)
        betas = np.minimum(1.0 - alpha_bar((ts + 1) / T) / alpha_bar(ts / T), 0.999)
    else:
        raise ValueError(f"unknown beta schedule {cfg.beta_schedule!r}")
    return betas


def _rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Shift alpha_bar so the terminal step has exactly zero SNR.

    Port of the standard zero-SNR fix (reference ddim.py:25-58), as pure
    numpy since it runs once at scheduler construction.
    """
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)

    a0 = alphas_bar_sqrt[0].copy()
    aT = alphas_bar_sqrt[-1].copy()
    alphas_bar_sqrt = alphas_bar_sqrt - aT
    alphas_bar_sqrt = alphas_bar_sqrt * a0 / (a0 - aT)

    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = np.concatenate([alphas_bar[:1], alphas])
    return 1.0 - alphas


def make_scheduler(cfg: SchedulerConfig, dtype=jnp.float32) -> SchedulerState:
    betas = _compute_betas(cfg)
    if cfg.rescale_betas_zero_snr:
        betas = _rescale_zero_terminal_snr(betas)
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = np.float64(1.0) if cfg.set_alpha_to_one else alphas_cumprod[0]
    return SchedulerState(
        betas=jnp.asarray(betas, dtype=dtype),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=dtype),
        final_alpha_cumprod=jnp.asarray(final, dtype=dtype),
    )


def _extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep scalars and reshape for broadcasting over samples."""
    vals = table[t]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def add_noise(
    state: SchedulerState, x0: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """q(x_t | x_0): sqrt(abar) x0 + sqrt(1-abar) eps."""
    abar = _extract(state.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * noise


def get_velocity(
    state: SchedulerState, x0: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """v-prediction target: sqrt(abar) eps - sqrt(1-abar) x0
    (reference ddim.py:121-142). With beta==1 this is exactly -x0."""
    abar = _extract(state.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(abar) * noise - jnp.sqrt(1.0 - abar) * x0


def pred_original_sample(
    cfg: SchedulerConfig,
    state: SchedulerState,
    model_output: jax.Array,
    sample: jax.Array,
    t: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Recover (pred_x0, pred_epsilon) from the model output at timestep t."""
    abar = _extract(state.alphas_cumprod, t, sample.ndim)
    sqrt_a = jnp.sqrt(abar)
    sqrt_1ma = jnp.sqrt(1.0 - abar)
    if cfg.prediction_type == "epsilon":
        x0 = (sample - sqrt_1ma * model_output) / sqrt_a
        eps = model_output
    elif cfg.prediction_type == "sample":
        x0 = model_output
        eps = (sample - sqrt_a * x0) / sqrt_1ma
    elif cfg.prediction_type == "v_prediction":
        x0 = sqrt_a * sample - sqrt_1ma * model_output
        eps = sqrt_a * model_output + sqrt_1ma * sample
    else:
        raise ValueError(f"unknown prediction type {cfg.prediction_type!r}")
    if cfg.clip_sample:
        x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)
    return x0, eps


def leading_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """'leading' timestep spacing (descending), matching the reference
    scheduler config (`timestep_spacing: leading`, `steps_offset: 1`).
    For num_inference_steps=1 this yields [steps_offset] == [1]."""
    step_ratio = cfg.num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
    return ts + cfg.steps_offset


def ddim_step(
    cfg: SchedulerConfig,
    state: SchedulerState,
    model_output: jax.Array,
    t: jax.Array,
    sample: jax.Array,
    num_inference_steps: int,
    eta: float = 0.0,
    noise: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Deterministic (eta=0) DDIM update. Returns (prev_sample, pred_x0).

    For the GenPercept one-step case callers only consume pred_x0, which with
    the beta==1 schedule equals -model_output.
    """
    prev_t = t - cfg.num_train_timesteps // num_inference_steps
    abar_prev = jnp.where(
        prev_t >= 0,
        state.alphas_cumprod[jnp.maximum(prev_t, 0)],
        state.final_alpha_cumprod,
    )
    abar_prev = abar_prev.reshape(abar_prev.shape + (1,) * (sample.ndim - abar_prev.ndim))

    x0, eps = pred_original_sample(cfg, state, model_output, sample, t)

    if eta > 0.0:
        abar_t = _extract(state.alphas_cumprod, t, sample.ndim)
        variance = (1.0 - abar_prev) / (1.0 - abar_t) * (1.0 - abar_t / abar_prev)
        std = eta * jnp.sqrt(variance)
        if noise is None:
            raise ValueError("eta > 0 requires noise")
        dir_xt = jnp.sqrt(1.0 - abar_prev - std**2) * eps
        prev = jnp.sqrt(abar_prev) * x0 + dir_xt + std * noise
    else:
        prev = jnp.sqrt(abar_prev) * x0 + jnp.sqrt(1.0 - abar_prev) * eps
    return prev, x0


def ddpm_step(
    cfg: SchedulerConfig,
    state: SchedulerState,
    model_output: jax.Array,
    t: jax.Array,
    sample: jax.Array,
    noise: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Ancestral DDPM update (training scheduler family). Returns
    (prev_sample, pred_x0)."""
    abar_t = _extract(state.alphas_cumprod, t, sample.ndim)
    prev_t = jnp.maximum(t - 1, 0)
    abar_prev = jnp.where(
        (t - 1 >= 0).reshape(abar_t.shape[: t.ndim] + (1,) * (abar_t.ndim - t.ndim)),
        _extract(state.alphas_cumprod, prev_t, sample.ndim),
        jnp.ones_like(abar_t),
    )
    beta_t = 1.0 - abar_t / abar_prev
    alpha_t = 1.0 - beta_t

    x0, _ = pred_original_sample(cfg, state, model_output, sample, t)

    # Posterior mean coefficients (Ho et al. eq. 7).
    coef_x0 = jnp.sqrt(abar_prev) * beta_t / (1.0 - abar_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - abar_prev) / (1.0 - abar_t)
    mean = coef_x0 * x0 + coef_xt * sample

    variance = (1.0 - abar_prev) / (1.0 - abar_t) * beta_t
    variance = jnp.clip(variance, 1e-20, None)
    nonzero = (t > 0).reshape(
        abar_t.shape[: t.ndim] + (1,) * (abar_t.ndim - t.ndim)
    )
    prev = mean + jnp.where(nonzero, jnp.sqrt(variance), 0.0) * noise
    return prev, x0
