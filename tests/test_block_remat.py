"""Per-unit UNet rematerialization (unet_apply remat="block"): forward must
match the un-rematerialized UNet bit-exactly (same math, same program order),
and gradients to tight fp32 tolerance (the backward graph structure differs,
so XLA's fusion/summation order may legally reorder float accumulations)."""

import jax
import jax.numpy as jnp
import numpy as np

from genpercept_tpu.models import UNetConfig, init_unet, unet_apply

# chans[0] must be >=32 (GroupNorm uses 32 groups, like SD2.1); two levels
# keep the CPU compile cheap
TINY = UNetConfig(
    block_out_channels=(32, 32),
    down_block_has_attn=(True, False),
    attention_heads=(1, 1),
    cross_attention_dim=24,
)


def _setup():
    params = init_unet(jax.random.key(0), TINY)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (2, 7, 24), jnp.float32)
    t = jnp.array([3, 5], jnp.int32)
    return params, x, t, ctx


def _check(g0, g1):
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        ),
        g0, g1,
    )


def test_block_remat_forward_and_grads():
    params, x, t, ctx = _setup()

    def loss(p, remat):
        return jnp.sum(unet_apply(p, x, t, ctx, TINY, remat=remat) ** 2)

    # forward alone is the identical program -> bit-exact
    f0 = jax.jit(lambda p: unet_apply(p, x, t, ctx, TINY))(params)
    f1 = jax.jit(lambda p: unet_apply(p, x, t, ctx, TINY, remat="block"))(params)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))

    v0, g0 = jax.value_and_grad(lambda p: loss(p, None))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, "block"))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    _check(g0, g1)


def test_block_remat_features_path():
    params, x, t, ctx = _setup()

    def feats_sum(p, remat):
        _, feats = unet_apply(p, x, t, ctx, TINY, return_features=True,
                              remat=remat)
        return jnp.sum(jnp.stack([jnp.sum(f ** 2) for f in feats]))

    v0, g0 = jax.value_and_grad(lambda p: feats_sum(p, None))(params)
    v1, g1 = jax.value_and_grad(lambda p: feats_sum(p, "block"))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    _check(g0, g1)


def test_train_step_block_granularity_runs():
    """End-to-end: TrainConfig(remat_granularity='block') steps; loss matches
    the whole-UNet-remat step (identical forward program)."""
    from genpercept_tpu.models import VAEConfig, init_vae
    from genpercept_tpu.pipeline import GenPerceptModels
    from genpercept_tpu.train import TrainConfig, build_train_step, init_train_state

    vae_cfg = VAEConfig(block_out_channels=(32, 32))
    models = GenPerceptModels(
        unet=init_unet(jax.random.key(0), TINY),
        vae=init_vae(jax.random.key(1), vae_cfg),
        unet_cfg=TINY, vae_cfg=vae_cfg,
        text_embed=jnp.zeros((1, 7, 24), jnp.float32),
    )
    rng = np.random.default_rng(0)
    hw = 16
    batch = {
        "rgb_norm": jnp.asarray(rng.uniform(-1, 1, (2, hw, hw, 3)), jnp.float32),
        "gt_norm": jnp.asarray(rng.uniform(-1, 1, (2, hw, hw, 3)), jnp.float32),
        "valid_mask": jnp.ones((2, hw, hw), bool),
    }
    losses = {}
    for gran in ("unet", "block"):
        cfg = TrainConfig(loss_names=("mse",), fix_timesteps=1,
                          remat_unet=True, remat_granularity=gran)
        trainable, frozen, tx, opt_state = init_train_state(models.params(), cfg)
        step = build_train_step(cfg, models, tx)
        _, _, metrics = jax.jit(step)(trainable, frozen, opt_state, batch,
                                      jax.random.key(0))
        losses[gran] = float(metrics["loss"])
    np.testing.assert_allclose(losses["unet"], losses["block"], rtol=1e-6)
