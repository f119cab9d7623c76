"""Batched pipeline API + batched cli.run tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genpercept_tpu.models import UNetConfig, VAEConfig, init_unet, init_vae
from genpercept_tpu.pipeline import GenPerceptModels, GenPerceptPipeline, PipelineConfig

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 128, 128),
    attention_heads=(1, 2, 4, 4),
    cross_attention_dim=48,
)
TINY_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64))


def tiny_pipe(processing_res=64):
    ks = jax.random.split(jax.random.key(0), 2)
    models = GenPerceptModels(
        unet=init_unet(ks[0], TINY_UNET),
        vae=init_vae(ks[1], TINY_VAE),
        unet_cfg=TINY_UNET,
        vae_cfg=TINY_VAE,
        text_embed=jnp.zeros((1, 77, 48)),
    )
    return GenPerceptPipeline(models, PipelineConfig(mode="depth",
                                                     processing_res=processing_res))


def test_batch_matches_single():
    pipe = tiny_pipe()
    rng = np.random.default_rng(0)
    imgs = [
        (rng.uniform(0, 255, (80, 80, 3))).astype(np.uint8) for _ in range(3)
    ]
    singles = [pipe(im) for im in imgs]
    batched = pipe.batch(imgs, batch_size=2)
    assert len(batched) == 3
    for s, b in zip(singles, batched):
        assert b.pred_np.shape == s.pred_np.shape == (80, 80)
        np.testing.assert_allclose(b.pred_np, s.pred_np, atol=1e-5)
        assert b.pred_colored is not None


def test_batch_groups_mixed_aspects():
    pipe = tiny_pipe()
    rng = np.random.default_rng(1)
    imgs = [
        rng.uniform(0, 255, (80, 80, 3)).astype(np.uint8),
        rng.uniform(0, 255, (64, 96, 3)).astype(np.uint8),  # different aspect
        rng.uniform(0, 255, (80, 80, 3)).astype(np.uint8),
    ]
    outs = pipe.batch(imgs, batch_size=4)
    assert outs[0].pred_np.shape == (80, 80)
    assert outs[1].pred_np.shape == (64, 96)
    assert outs[2].pred_np.shape == (80, 80)


def test_batch_data_parallel_mesh_matches_single():
    """Data-parallel inference over the 8-virtual-device mesh: params
    replicated, batch sharded over the 'data' axis, ragged chunks padded.
    Values must match the single-device pipeline."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    ks = jax.random.split(jax.random.key(0), 2)
    models = GenPerceptModels(
        unet=init_unet(ks[0], TINY_UNET),
        vae=init_vae(ks[1], TINY_VAE),
        unet_cfg=TINY_UNET,
        vae_cfg=TINY_VAE,
        text_embed=jnp.zeros((1, 77, 48)),
    )
    cfg = PipelineConfig(mode="depth", processing_res=64)
    pipe_dp = GenPerceptPipeline(models, cfg, mesh=mesh)
    pipe_1 = GenPerceptPipeline(models, cfg)
    assert pipe_dp.n_data_shards == 4

    rng = np.random.default_rng(2)
    imgs = [rng.uniform(0, 255, (80, 80, 3)).astype(np.uint8)
            for _ in range(6)]  # 6 % 4 != 0 -> exercises padding
    ref = pipe_1.batch(imgs, batch_size=8)
    out = pipe_dp.batch(imgs, batch_size=8)
    assert len(out) == 6
    for r, o in zip(ref, out):
        np.testing.assert_allclose(o.pred_np, r.pred_np, atol=1e-5)
