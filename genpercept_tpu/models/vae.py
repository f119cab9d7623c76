"""SD2.1 AutoencoderKL (VAE) as pure functions, NHWC.

Mirrors the diffusers AutoencoderKL the reference loads from the SD2.1
checkpoint. The GenPercept pipeline uses:
  encode: encoder -> quant_conv -> take mean (first 4 ch) -> * 0.18215
          (reference genpercept_pipeline.py:488-505)
  decode: / 0.18215 -> post_quant_conv -> decoder
          (reference genpercept_pipeline.py:507-526)

Param tree key structure mirrors the diffusers safetensors layout
(encoder.down_blocks.N.resnets.M..., decoder.up_blocks..., quant_conv,
post_quant_conv) so the importer is a pure layout transform.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from genpercept_tpu.models.layers import (
    Params,
    conv,
    conv_init,
    downsample2d,
    init_downsample,
    init_resnet_block,
    init_upsample,
    init_vae_attention,
    norm_init,
    resnet_block,
    upsample2d,
    vae_attention,
)
from genpercept_tpu.ops import group_norm


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


SD21_VAE = VAEConfig()


# ------------------------------------------------------------------- init

def init_vae(key, cfg: VAEConfig = SD21_VAE) -> Params:
    ke, kd, kq, kpq = jax.random.split(key, 4)
    return {
        "encoder": _init_encoder(ke, cfg),
        "decoder": _init_decoder(kd, cfg),
        "quant_conv": conv_init(kq, 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels),
        "post_quant_conv": conv_init(kpq, 1, 1, cfg.latent_channels, cfg.latent_channels),
    }


def _init_encoder(key, cfg: VAEConfig) -> Params:
    chans = cfg.block_out_channels
    n_blocks = len(chans)
    keys = iter(jax.random.split(key, 4 + n_blocks * (cfg.layers_per_block + 1)))
    p: Params = {"conv_in": conv_init(next(keys), 3, 3, cfg.in_channels, chans[0])}
    down = {}
    cin = chans[0]
    for i, cout in enumerate(chans):
        blk: Params = {"resnets": {}}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = init_resnet_block(next(keys), cin, cout, None)
            cin = cout
        if i < n_blocks - 1:
            blk["downsamplers"] = {"0": init_downsample(next(keys), cout)}
        down[str(i)] = blk
    p["down_blocks"] = down
    c = chans[-1]
    p["mid_block"] = {
        "resnets": {
            "0": init_resnet_block(next(keys), c, c, None),
            "1": init_resnet_block(next(keys), c, c, None),
        },
        "attentions": {"0": init_vae_attention(next(keys), c)},
    }
    p["conv_norm_out"] = norm_init(c)
    p["conv_out"] = conv_init(next(keys), 3, 3, c, 2 * cfg.latent_channels)
    return p


def _init_decoder(key, cfg: VAEConfig) -> Params:
    chans = tuple(reversed(cfg.block_out_channels))  # (512, 512, 256, 128)
    n_blocks = len(chans)
    keys = iter(jax.random.split(key, 5 + n_blocks * (cfg.layers_per_block + 2)))
    p: Params = {"conv_in": conv_init(next(keys), 3, 3, cfg.latent_channels, chans[0])}
    c = chans[0]
    p["mid_block"] = {
        "resnets": {
            "0": init_resnet_block(next(keys), c, c, None),
            "1": init_resnet_block(next(keys), c, c, None),
        },
        "attentions": {"0": init_vae_attention(next(keys), c)},
    }
    up = {}
    cin = chans[0]
    for i, cout in enumerate(chans):
        blk: Params = {"resnets": {}}
        for j in range(cfg.layers_per_block + 1):  # decoder: 3 resnets/block
            blk["resnets"][str(j)] = init_resnet_block(next(keys), cin, cout, None)
            cin = cout
        if i < n_blocks - 1:
            blk["upsamplers"] = {"0": init_upsample(next(keys), cout)}
        up[str(i)] = blk
    p["up_blocks"] = up
    p["conv_norm_out"] = norm_init(chans[-1])
    p["conv_out"] = conv_init(next(keys), 3, 3, chans[-1], cfg.out_channels)
    return p


# ------------------------------------------------------------------ apply

def vae_encoder_apply(p: Params, x: jax.Array, cfg: VAEConfig = SD21_VAE,
                      fused: bool = False, conv_fn=None,
                      attn_int8: bool = False, dense_fn=None) -> jax.Array:
    """x: (N, H, W, 3) in [-1, 1] -> moments (N, H/8, W/8, 8).

    fused=True uses the Pallas fused GN+SiLU+conv kernel in every resblock
    (inference path; see ops/fused_conv.py). conv_fn (ops/quant.py) hooks
    every resnet/downsampler conv for int8 execution or calibration;
    conv_in/conv_out/shortcuts stay full-precision. attn_int8 runs the
    mid-block d=512 attention through the s8 flash kernel and dense_fn
    hooks its four projections (inference-only)."""
    enc = p["encoder"]
    h = conv(enc["conv_in"], x)
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        blk = enc["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h = resnet_block(blk["resnets"][str(j)], h, None, eps=1e-6,
                             fused=fused, conv_fn=conv_fn,
                             name=f"encoder.down_blocks.{i}.resnets.{j}")
        if "downsamplers" in blk:
            h = downsample2d(blk["downsamplers"]["0"], h, asymmetric_pad=True,
                             conv_fn=conv_fn,
                             name=f"encoder.down_blocks.{i}.downsamplers.0")
    mid = enc["mid_block"]
    h = resnet_block(mid["resnets"]["0"], h, None, eps=1e-6, fused=fused,
                     conv_fn=conv_fn, name="encoder.mid_block.resnets.0")
    h = vae_attention(mid["attentions"]["0"], h, int8=attn_int8,
                      dense_fn=dense_fn, name="encoder.mid_block.attentions.0")
    h = resnet_block(mid["resnets"]["1"], h, None, eps=1e-6, fused=fused,
                     conv_fn=conv_fn, name="encoder.mid_block.resnets.1")
    h = _gn_silu_conv(h, enc["conv_norm_out"], enc["conv_out"],
                      cfg.norm_num_groups, fused)
    # quant_conv maps moments -> moments (1x1 conv over 8 channels)
    from genpercept_tpu.ops.conv import conv1x1
    return conv1x1(h, p["quant_conv"]["weight"][0, 0], p["quant_conv"].get("bias"))


def _gn_silu_conv(h, norm_p, conv_p, groups, fused, native_norm=False):
    """Final GN -> SiLU -> conv3x3, fused into one Pallas kernel when
    possible (same shapes guard as resnet_block)."""
    from genpercept_tpu.ops import fused_conv as FC

    if fused and FC.supported(h.shape, conv_p["weight"].shape[-1]) \
            and groups == 32:
        return FC.fused_gn_silu_conv3x3(
            h, norm_p["weight"], norm_p["bias"],
            conv_p["weight"], conv_p.get("bias"),
        )
    h = group_norm(h, norm_p["weight"], norm_p["bias"], groups, 1e-6,
                   native_apply=native_norm)
    h = jax.nn.silu(h)
    return conv(conv_p, h)


def vae_encode(p: Params, x: jax.Array, cfg: VAEConfig = SD21_VAE,
               fused: bool = False, conv_fn=None,
               attn_int8: bool = False, dense_fn=None) -> jax.Array:
    """Deterministic latent: mean channel of the posterior, scaled.
    Matches reference `encode_rgb` (genpercept_pipeline.py:488-505)."""
    moments = vae_encoder_apply(p, x, cfg, fused=fused, conv_fn=conv_fn,
                                attn_int8=attn_int8, dense_fn=dense_fn)
    mean = moments[..., : cfg.latent_channels]
    return mean * cfg.scaling_factor


def vae_decode(p: Params, z: jax.Array, cfg: VAEConfig = SD21_VAE,
               fused: bool = False, remat: bool = False,
               conv_fn=None, attn_int8: bool = False,
               dense_fn=None) -> jax.Array:
    """z: (N, h, w, 4) scaled latent -> (N, 8h, 8w, 3).
    Matches reference `decode_pred` up to the task-specific channel mean.

    remat=True checkpoints each resblock/attention/upsampler (training path
    where gradients flow THROUGH the frozen decoder into the UNet): only
    block-boundary activations are saved for the backward, each block's
    interior is recomputed — without this the decoder backward holds every
    768^2-level tensor at once (~4+ GB at batch 2 on top of optimizer
    state, OOMing the 16 GB v5e)."""
    from genpercept_tpu.ops.conv import conv1x1

    import functools

    def ckpt(fn):
        return jax.checkpoint(fn) if remat else fn

    def rb(pp, hh, name=""):
        # bind the (static, string) conv path before jax.checkpoint wraps the
        # call — checkpoint traces every argument, and strings don't trace.
        # Under remat (training-through-frozen-decoder) the GroupNorm apply
        # runs in the compute dtype: the fp32 apply was measured to hold
        # 2 x 1.14 GB fp32 full-res temps in the decoder backward at 768^2
        # micro-batch 4 (the difference between fitting and OOM on 16 GB)
        f = functools.partial(resnet_block, temb=None, eps=1e-6, fused=fused,
                              conv_fn=conv_fn, name=name, native_norm=remat)
        return ckpt(f)(pp, hh)

    def up(pp, hh, name=""):
        f = functools.partial(upsample2d, conv_fn=conv_fn, name=name)
        return ckpt(f)(pp, hh)

    attn = ckpt(functools.partial(
        vae_attention, int8=attn_int8, dense_fn=dense_fn,
        name="decoder.mid_block.attentions.0"))

    z = z / cfg.scaling_factor
    z = conv1x1(z, p["post_quant_conv"]["weight"][0, 0], p["post_quant_conv"].get("bias"))
    dec = p["decoder"]
    h = conv(dec["conv_in"], z)
    mid = dec["mid_block"]
    h = rb(mid["resnets"]["0"], h, name="decoder.mid_block.resnets.0")
    h = attn(mid["attentions"]["0"], h)
    h = rb(mid["resnets"]["1"], h, name="decoder.mid_block.resnets.1")
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        blk = dec["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            h = rb(blk["resnets"][str(j)], h,
                   name=f"decoder.up_blocks.{i}.resnets.{j}")
        if "upsamplers" in blk:
            h = up(blk["upsamplers"]["0"], h,
                   name=f"decoder.up_blocks.{i}.upsamplers.0")
    return _gn_silu_conv(h, dec["conv_norm_out"], dec["conv_out"],
                         cfg.norm_num_groups, fused, native_norm=remat)
