"""Training-step tests: loss decreases, masks respected, grad-accum, sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from genpercept_tpu.models import UNetConfig, VAEConfig, init_unet, init_vae
from genpercept_tpu.pipeline import GenPerceptModels
from genpercept_tpu.train import TrainConfig, build_train_step, init_train_state
from genpercept_tpu.train.train_step import downscale_valid_mask, split_trainable

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 128, 128),
    attention_heads=(1, 2, 4, 4),
    cross_attention_dim=48,
)
TINY_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64))


def tiny_models(key=0):
    ks = jax.random.split(jax.random.key(key), 2)
    return GenPerceptModels(
        unet=init_unet(ks[0], TINY_UNET),
        vae=init_vae(ks[1], TINY_VAE),
        unet_cfg=TINY_UNET,
        vae_cfg=TINY_VAE,
        text_embed=jnp.zeros((1, 77, 48)),
    )


def make_batch(b=2, hw=64, seed=0):
    rng = np.random.default_rng(seed)
    # invalid region must be contiguous: a random scatter invalidates every
    # 8x8 latent cell after the maxpool-8 downscale (faithful to reference)
    mask = np.ones((b, hw, hw), bool)
    mask[:, : hw // 4, : hw // 4] = False
    return {
        "rgb_norm": jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)), jnp.float32),
        "gt_norm": jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)), jnp.float32),
        "valid_mask": jnp.asarray(mask),
    }


def test_downscale_valid_mask():
    m = np.ones((1, 16, 16), bool)
    m[0, 3, 5] = False
    out = np.asarray(downscale_valid_mask(jnp.asarray(m)))
    assert out.shape == (1, 2, 2)
    assert not out[0, 0, 0]  # cell containing the invalid pixel
    assert out[0, 1, 1]


def test_split_trainable():
    models = tiny_models()
    params = models.params()
    cfg = TrainConfig(train_unet=True, train_vae_decoder=True)
    trainable, frozen = split_trainable(params, cfg)
    assert "unet" in trainable
    assert set(trainable["vae"]) == {"decoder", "post_quant_conv"}
    assert "encoder" in frozen["vae"] and "quant_conv" in frozen["vae"]
    assert "text_embed" in frozen


def test_train_step_latent_mse_decreases_loss():
    models = tiny_models()
    cfg = TrainConfig(
        loss_names=("latent_mse",), fix_timesteps=1, lr=1e-4,
        lr_warmup_steps=0, lr_total_iter_length=100, lr_final_ratio=1.0,
    )
    params = models.params()
    trainable, frozen, tx, opt_state = init_train_state(params, cfg)
    step = jax.jit(build_train_step(cfg, models, tx))

    batch = make_batch()
    rng = jax.random.key(0)
    losses = []
    for i in range(5):
        trainable, opt_state, metrics = step(trainable, frozen, opt_state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_train_step_pixel_losses_run():
    models = tiny_models()
    cfg = TrainConfig(
        loss_names=("mse", "ssi", "grad"), fix_timesteps=1,
    )
    params = models.params()
    trainable, frozen, tx, opt_state = init_train_state(params, cfg)
    step = jax.jit(build_train_step(cfg, models, tx))
    batch = make_batch()
    trainable, opt_state, metrics = step(trainable, frozen, opt_state, batch, jax.random.key(1))
    for k in ("loss", "mse", "ssi", "grad"):
        assert np.isfinite(float(metrics[k])), k


def test_grad_accum_matches_big_batch():
    """2 micro-batches of 1 must produce the same update as 1 batch of 2
    (both averaged)."""
    models = tiny_models()
    base = dict(loss_names=("latent_mse",), fix_timesteps=1, lr=1e-3,
                lr_warmup_steps=0, lr_total_iter_length=10, lr_final_ratio=1.0)
    import optax

    cfg1 = TrainConfig(**base, grad_accum_steps=1)
    cfg2 = TrainConfig(**base, grad_accum_steps=2)
    params = models.params()

    # SGD so the update is linear in the gradient (adam's first-step sign
    # normalization amplifies fp32 batching noise into +-lr sign flips)
    from genpercept_tpu.train.train_step import split_trainable

    tr1, fr = split_trainable(params, cfg1)
    tr2 = tr1
    tx = optax.sgd(1.0)
    os1 = tx.init(tr1)
    os2 = tx.init(tr2)

    batch = make_batch(b=2)
    micro = jax.tree.map(lambda x: x.reshape((2, 1) + x.shape[1:]), batch)

    step1 = jax.jit(build_train_step(cfg1, models, tx))
    step2 = jax.jit(build_train_step(cfg2, models, tx))
    rng = jax.random.key(0)
    # rng is only used for the timestep draw, disabled by fix_timesteps
    out1, _, m1 = step1(tr1, fr, os1, batch, rng)
    out2, _, m2 = step2(tr2, fr, os2, micro, rng)

    # updated param = old - grad; compare the applied gradients
    for a, b in zip(jax.tree.leaves(out1), jax.tree.leaves(out2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


def test_train_step_sharded_dp():
    """Full train step jitted over a 8-device ('data','model') mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genpercept_tpu.parallel import batch_sharding, make_mesh, shard_params_tp

    mesh = make_mesh(data=4, model=2)
    models = tiny_models()
    cfg = TrainConfig(loss_names=("latent_mse",), fix_timesteps=1)
    params = models.params()
    trainable, frozen, tx, opt_state = init_train_state(params, cfg)

    trainable = shard_params_tp(trainable, mesh)
    frozen = shard_params_tp(frozen, mesh)
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())) if hasattr(x, "shape") else x,
        opt_state,
    )
    batch = make_batch(b=4)
    batch = jax.device_put(batch, batch_sharding(mesh))

    step = jax.jit(build_train_step(cfg, models, tx))
    trainable, opt_state, metrics = step(trainable, frozen, opt_state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_vae_decoder_trainable():
    """train_vae_decoder=True must run end-to-end: the partial trainable vae
    subtree (decoder+post_quant_conv) merges subtree-wise with the frozen
    encoder (reference genpercept_trainer.py:176-244 trainability matrix)."""
    models = tiny_models()
    cfg = TrainConfig(
        loss_names=("mse",), fix_timesteps=1, lr=1e-3,
        lr_warmup_steps=0, lr_total_iter_length=10, lr_final_ratio=1.0,
        train_unet=False, train_dpt_head=False, train_vae_decoder=True,
    )
    params = models.params()
    trainable, frozen, tx, opt_state = init_train_state(params, cfg)
    assert set(trainable) == {"vae"}
    before = jax.tree.map(lambda x: np.asarray(x).copy(), trainable)
    step = jax.jit(build_train_step(cfg, models, tx))
    batch = make_batch()
    trainable, opt_state, metrics = step(
        trainable, frozen, opt_state, batch, jax.random.key(0)
    )
    assert np.isfinite(float(metrics["loss"]))
    # decoder params actually moved
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(trainable))
    )
    assert moved


def test_grad_accum_keeps_per_loss_aux():
    """accum>1 must still log each loss component (reference logs each;
    genpercept_trainer.py:845-863)."""
    models = tiny_models()
    cfg = TrainConfig(
        loss_names=("mse", "ssi", "grad"), fix_timesteps=1, grad_accum_steps=2,
    )
    params = models.params()
    trainable, frozen, tx, opt_state = init_train_state(params, cfg)
    step = jax.jit(build_train_step(cfg, models, tx))
    batch = make_batch(b=2)
    micro = jax.tree.map(lambda x: x.reshape((2, 1) + x.shape[1:]), batch)
    _, _, metrics = step(trainable, frozen, opt_state, micro, jax.random.key(0))
    for k in ("loss", "mse", "ssi", "grad"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
