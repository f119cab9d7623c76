"""LoRA training mode, multi-res-noise marigold training, metric3d dispatch."""

import jax
import jax.numpy as jnp
import numpy as np

from genpercept_tpu.models import UNetConfig, VAEConfig, init_unet, init_vae
from genpercept_tpu.pipeline import GenPerceptModels
from genpercept_tpu.train import TrainConfig, build_train_step, init_train_state

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 128, 128),
    attention_heads=(1, 2, 4, 4),
    cross_attention_dim=48,
)
TINY_UNET8 = UNetConfig(
    in_channels=8,
    block_out_channels=(32, 64, 128, 128),
    attention_heads=(1, 2, 4, 4),
    cross_attention_dim=48,
)
TINY_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64))


def tiny_models(key=0, unet_cfg=TINY_UNET):
    ks = jax.random.split(jax.random.key(key), 2)
    return GenPerceptModels(
        unet=init_unet(ks[0], unet_cfg),
        vae=init_vae(ks[1], TINY_VAE),
        unet_cfg=unet_cfg,
        vae_cfg=TINY_VAE,
        text_embed=jnp.zeros((1, 77, 48)),
    )


def make_batch(b=2, hw=64, seed=0, intrinsic=False):
    rng = np.random.default_rng(seed)
    mask = np.ones((b, hw, hw), bool)
    mask[:, : hw // 4, : hw // 4] = False
    batch = {
        "rgb_norm": jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)), jnp.float32),
        "gt_norm": jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)), jnp.float32),
        "valid_mask": jnp.asarray(mask),
    }
    if intrinsic:
        batch["intrinsic"] = jnp.asarray(
            [[[50.0, 0, hw / 2], [0, 50.0, hw / 2], [0, 0, 1]]] * b
        )
    return batch


def test_lora_training_only_updates_adapters():
    models = tiny_models()
    cfg = TrainConfig(
        loss_names=("latent_mse",), fix_timesteps=1, unet_lora_rank=4, lr=1e-3,
        lr_warmup_steps=0, lr_total_iter_length=10, lr_final_ratio=1.0,
    )
    params = models.params()
    trainable, frozen, tx, opt_state = init_train_state(params, cfg, jax.random.key(5))
    assert "unet_lora" in trainable and "unet" in frozen
    step = jax.jit(build_train_step(cfg, models, tx))
    batch = make_batch()
    t2, _, metrics = step(trainable, frozen, opt_state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    # lora_B moved away from zero => adapters received gradient
    moved = [
        float(jnp.abs(x).max())
        for p, x in jax.tree_util.tree_leaves_with_path(t2["unet_lora"])
        if "lora_B" in str(p)
    ]
    assert max(moved) > 0


def test_marigold_multi_res_noise_training():
    models = tiny_models(unet_cfg=TINY_UNET8)
    cfg = TrainConfig(
        arch="marigold", loss_names=("latent_mse",),
        multi_res_noise_strength=0.9, multi_res_noise_strategy="power_of_two",
    )
    params = models.params()
    trainable, frozen, tx, opt_state = init_train_state(params, cfg)
    step = jax.jit(build_train_step(cfg, models, tx))
    _, _, metrics = step(trainable, frozen, opt_state, make_batch(), jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_metric3d_losses_in_train_step():
    models = tiny_models()
    cfg = TrainConfig(
        loss_names=("mse", "vnl", "hdnr", "hdsnr"), fix_timesteps=1,
    )
    params = models.params()
    trainable, frozen, tx, opt_state = init_train_state(params, cfg)
    step = jax.jit(build_train_step(cfg, models, tx))
    batch = make_batch(intrinsic=True)
    _, _, metrics = step(trainable, frozen, opt_state, batch, jax.random.key(2))
    for k in ("loss", "vnl", "hdnr", "hdsnr"):
        assert np.isfinite(float(metrics[k])), k


def test_latent_loss_zoo_variants():
    """latent_l1 / latent_mean_abs_rel train-step variants run and differ
    from latent_mse (reference util/loss.py get_loss factory)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from genpercept_tpu.train import TrainConfig, build_train_step, init_train_state

    models = tiny_models()
    rng = np.random.default_rng(0)
    batch = {
        "rgb_norm": jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32),
        "gt_norm": jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32),
        "valid_mask": jnp.ones((2, 64, 64), bool),
    }
    losses = {}
    for name in ("latent_mse", "latent_l1", "latent_mean_abs_rel"):
        cfg = TrainConfig(loss_names=(name,), fix_timesteps=1)
        trainable, frozen, tx, opt_state = init_train_state(models.params(), cfg)
        step = jax.jit(build_train_step(cfg, models, tx))
        _, _, metrics = step(trainable, frozen, opt_state, batch, jax.random.key(0))
        losses[name] = float(metrics["loss"])
        assert np.isfinite(losses[name]), name
        assert name in metrics
    assert losses["latent_mse"] != losses["latent_l1"]
