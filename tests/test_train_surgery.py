"""conv_in surgery, remat training, and DPT-head training tests."""

import jax
import jax.numpy as jnp
import numpy as np

from genpercept_tpu.models import (
    DPTHeadConfig,
    UNetConfig,
    VAEConfig,
    init_dpt_head,
    init_unet,
    init_vae,
    unet_apply,
)
from genpercept_tpu.pipeline import GenPerceptModels
from genpercept_tpu.train import TrainConfig, build_train_step, init_train_state
from genpercept_tpu.train.train_step import replace_unet_conv_in

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 128, 128),
    attention_heads=(1, 2, 4, 4),
    cross_attention_dim=48,
)
TINY_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64))
TINY_DPT = DPTHeadConfig(neck_hidden_sizes=(32, 64, 128, 128), fusion_hidden_size=32)


def test_replace_unet_conv_in_preserves_mean_semantics():
    """8-ch model on [z, z] must equal 4-ch model on z (duplicate + halve)."""
    unet = init_unet(jax.random.key(0), TINY_UNET)
    unet8, cfg8 = replace_unet_conv_in(unet, TINY_UNET)
    assert cfg8.in_channels == 8
    z = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 4)), jnp.float32)
    ctx = jnp.zeros((1, 77, 48))
    t = jnp.array([5])
    out4 = unet_apply(unet, z, t, ctx, TINY_UNET)
    out8 = unet_apply(unet8, jnp.concatenate([z, z], -1), t, ctx, cfg8)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(out8), atol=1e-5)


def _models(dpt=False):
    ks = jax.random.split(jax.random.key(0), 3)
    return GenPerceptModels(
        unet=init_unet(ks[0], TINY_UNET),
        vae=init_vae(ks[1], TINY_VAE),
        unet_cfg=TINY_UNET,
        vae_cfg=TINY_VAE,
        text_embed=jnp.zeros((1, 77, 48)),
        dpt_head=init_dpt_head(ks[2], TINY_DPT) if dpt else None,
        dpt_cfg=TINY_DPT,
    )


def _batch(b=1, hw=64):
    rng = np.random.default_rng(0)
    mask = np.ones((b, hw, hw), bool)
    mask[:, :16, :16] = False
    return {
        "rgb_norm": jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)), jnp.float32),
        "gt_norm": jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)), jnp.float32),
        "valid_mask": jnp.asarray(mask),
    }


def test_remat_matches_plain_gradients():
    models = _models()
    base = dict(loss_names=("latent_mse",), fix_timesteps=1)
    params = models.params()

    from genpercept_tpu.train.train_step import build_loss_fn, split_trainable

    tr, fr = split_trainable(params, TrainConfig(**base))
    batch = _batch()
    rng = jax.random.key(0)

    g1 = jax.grad(
        lambda t: build_loss_fn(TrainConfig(**base), models)(t, {**fr, **t}, batch, rng)[0]
    )(tr)
    g2 = jax.grad(
        lambda t: build_loss_fn(TrainConfig(**base, remat_unet=True), models)(
            t, {**fr, **t}, batch, rng
        )[0]
    )(tr)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dpt_head_training_updates_head():
    models = _models(dpt=True)
    cfg = TrainConfig(
        mode="depth", loss_names=("mse", "grad"), fix_timesteps=1,
        train_unet=True, train_dpt_head=True, lr=1e-3,
        lr_warmup_steps=0, lr_total_iter_length=10, lr_final_ratio=1.0,
    )
    params = models.params()
    trainable, frozen, tx, opt_state = init_train_state(params, cfg)
    assert "dpt_head" in trainable
    step = jax.jit(build_train_step(cfg, models, tx))
    t2, _, metrics = step(trainable, frozen, opt_state, _batch(), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    moved = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(trainable["dpt_head"]),
                        jax.tree.leaves(t2["dpt_head"]))
    )
    assert moved > 0
