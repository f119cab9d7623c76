"""SD2.1 UNet2DConditionModel as pure functions (NHWC), with the GenPercept
multi-level feature taps.

Geometry (SD2.1): 4-ch latent in/out, block_out_channels (320, 640, 1280,
1280), 2 resnets per block, cross-attention on 1024-d CLIP states, heads
(5, 10, 20, 20) with head_dim 64, use_linear_projection.

GenPercept extension (reference `genpercept/models/custom_unet.py:365-408`):
the output of each of the 4 up-blocks (after its upsampler) is collected
into `multi_level_feats`; with `return_feature=True` the final
conv_norm_out/conv_out are skipped (the DPT head replaces them). The
pipeline reverses the list before feeding the head, giving resolutions /
channels [(H, 320), (H, 640), (H/2, 1280), (H/4, 1280)] for latent size H.

Param tree keys mirror the diffusers safetensors layout.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from genpercept_tpu.models.layers import (
    Params,
    conv,
    conv_init,
    dense,
    dense_init,
    downsample2d,
    init_downsample,
    init_resnet_block,
    init_spatial_transformer,
    init_upsample,
    norm_init,
    resnet_block,
    spatial_transformer,
    upsample2d,
)
from genpercept_tpu.ops import group_norm, timestep_embedding


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # which blocks carry cross-attention transformers (SD2.1: first three
    # down blocks / last three up blocks)
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_eps: float = 1e-5
    # when a custom (DPT) head is attached, conv_norm_out/conv_out are absent
    # (reference run.py:316-341 filters them from checkpoints)
    with_conv_out: bool = True


SD21_UNET = UNetConfig()


# ---------------------------------------------------------------------- init

def init_unet(key, cfg: UNetConfig = SD21_UNET) -> Params:
    chans = cfg.block_out_channels
    n_blocks = len(chans)
    temb_dim = chans[0] * 4
    keys = iter(jax.random.split(key, 8 + n_blocks * 16))

    p: Params = {
        "conv_in": conv_init(next(keys), 3, 3, cfg.in_channels, chans[0]),
        "time_embedding": {
            "linear_1": dense_init(next(keys), chans[0], temb_dim),
            "linear_2": dense_init(next(keys), temb_dim, temb_dim),
        },
    }

    # down blocks
    down = {}
    cin = chans[0]
    for i, cout in enumerate(chans):
        blk: Params = {"resnets": {}}
        if cfg.down_block_has_attn[i]:
            blk["attentions"] = {}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = init_resnet_block(next(keys), cin, cout, temb_dim)
            cin = cout
            if cfg.down_block_has_attn[i]:
                blk["attentions"][str(j)] = init_spatial_transformer(
                    next(keys), cout, cfg.attention_heads[i], cfg.cross_attention_dim
                )
        if i < n_blocks - 1:
            blk["downsamplers"] = {"0": init_downsample(next(keys), cout)}
        down[str(i)] = blk
    p["down_blocks"] = down

    # mid block
    c = chans[-1]
    p["mid_block"] = {
        "resnets": {
            "0": init_resnet_block(next(keys), c, c, temb_dim),
            "1": init_resnet_block(next(keys), c, c, temb_dim),
        },
        "attentions": {
            "0": init_spatial_transformer(
                next(keys), c, cfg.attention_heads[-1], cfg.cross_attention_dim
            )
        },
    }

    # up blocks (reversed channels); resnet j consumes skip from the down path
    up = {}
    rev = tuple(reversed(chans))  # (1280, 1280, 640, 320)
    for i in range(n_blocks):
        cout = rev[i]
        prev_out = rev[max(i - 1, 0)]
        blk = {"resnets": {}}
        has_attn = tuple(reversed(cfg.down_block_has_attn))[i]
        if has_attn:
            blk["attentions"] = {}
        heads = tuple(reversed(cfg.attention_heads))[i]
        for j in range(cfg.layers_per_block + 1):
            # skip channels: the down path pushed, per down block i, one
            # residual per resnet plus one post-downsample; popping in
            # reverse yields this sequence:
            res_skip = rev[min(i + 1, n_blocks - 1)] if j == cfg.layers_per_block else cout
            res_in = prev_out if j == 0 else cout
            blk["resnets"][str(j)] = init_resnet_block(
                next(keys), res_in + res_skip, cout, temb_dim
            )
            if has_attn:
                blk["attentions"][str(j)] = init_spatial_transformer(
                    next(keys), cout, heads, cfg.cross_attention_dim
                )
        if i < n_blocks - 1:
            blk["upsamplers"] = {"0": init_upsample(next(keys), cout)}
        up[str(i)] = blk
    p["up_blocks"] = up

    if cfg.with_conv_out:
        p["conv_norm_out"] = norm_init(chans[0])
        p["conv_out"] = conv_init(next(keys), 3, 3, chans[0], cfg.out_channels)
    return p


# --------------------------------------------------------------------- apply

def unet_apply(
    p: Params,
    sample: jax.Array,
    timesteps: jax.Array,
    encoder_hidden_states: jax.Array,
    cfg: UNetConfig = SD21_UNET,
    return_features: bool = False,
    conv_fn=None,
    dense_fn=None,
    remat: Optional[str] = None,
) -> jax.Array | Tuple[Optional[jax.Array], List[jax.Array]]:
    """sample: (N, h, w, 4); timesteps: (N,) or scalar; text states
    (N, 77, 1024). Returns the v-prediction, or with return_features=True a
    tuple (sample_or_None, multi_level_feats) where feats are the 4 up-block
    outputs (reference custom_unet.py:365-408).

    conv_fn / dense_fn (ops/quant.py) hook every resnet/down/up conv and
    every transformer projection/FF matmul for int8 execution or
    calibration; conv_in/conv_out, time embedding, cross-attention k/v and
    the flash attention itself stay full precision.

    remat="block" checkpoints each (resnet [+ transformer]) unit separately
    (training only; mutually exclusive with conv_fn/dense_fn hooks): the
    backward holds one unit's internals at a time instead of the whole
    UNet's, which is what lets the 768^2 recipe raise its per-chip
    micro-batch. Skip/boundary tensors are saved either way."""
    chans = cfg.block_out_channels
    n_blocks = len(chans)
    ctx = encoder_hidden_states

    block_remat = remat == "block"
    if block_remat:
        assert conv_fn is None and dense_fn is None, (
            "block remat is a training feature; quant hooks are inference")

    def make_unit(has_attn, heads, concat_skip=False):
        """One checkpointable (resnet [+ transformer]) unit; statics closed
        over, traced operands passed explicitly."""

        def unit(rp, ap, h, skip, temb, ctx):
            if concat_skip:
                h = jnp.concatenate([h, skip], axis=-1)
            h = resnet_block(rp, h, temb, cfg.norm_eps)
            if has_attn:
                h = spatial_transformer(ap, h, ctx, heads)
            return h

        return jax.checkpoint(unit) if block_remat else unit

    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
    temb = timestep_embedding(timesteps, chans[0])
    te = p["time_embedding"]
    temb = dense(te["linear_2"], jax.nn.silu(dense(te["linear_1"], temb)))
    temb = temb.astype(sample.dtype)

    h = conv(p["conv_in"], sample)
    residuals = [h]

    # down path
    for i in range(n_blocks):
        blk = p["down_blocks"][str(i)]
        has_attn = cfg.down_block_has_attn[i]
        for j in range(cfg.layers_per_block):
            if block_remat:
                unit = make_unit(has_attn, cfg.attention_heads[i])
                ap = blk["attentions"][str(j)] if has_attn else None
                h = unit(blk["resnets"][str(j)], ap, h, None, temb, ctx)
            else:
                h = resnet_block(blk["resnets"][str(j)], h, temb, cfg.norm_eps,
                                 conv_fn=conv_fn,
                                 name=f"down_blocks.{i}.resnets.{j}")
                if has_attn:
                    h = spatial_transformer(
                        blk["attentions"][str(j)], h, ctx,
                        cfg.attention_heads[i], dense_fn=dense_fn,
                        name=f"down_blocks.{i}.attentions.{j}",
                    )
            residuals.append(h)
        if "downsamplers" in blk:
            h = downsample2d(blk["downsamplers"]["0"], h, conv_fn=conv_fn,
                             name=f"down_blocks.{i}.downsamplers.0")
            residuals.append(h)

    # mid
    mid = p["mid_block"]
    if block_remat:
        unit = make_unit(True, cfg.attention_heads[-1])
        h = unit(mid["resnets"]["0"], mid["attentions"]["0"], h, None, temb, ctx)
        h = make_unit(False, 0)(mid["resnets"]["1"], None, h, None, temb, ctx)
    else:
        h = resnet_block(mid["resnets"]["0"], h, temb, cfg.norm_eps,
                         conv_fn=conv_fn, name="mid_block.resnets.0")
        h = spatial_transformer(mid["attentions"]["0"], h, ctx,
                                cfg.attention_heads[-1], dense_fn=dense_fn,
                                name="mid_block.attentions.0")
        h = resnet_block(mid["resnets"]["1"], h, temb, cfg.norm_eps,
                         conv_fn=conv_fn, name="mid_block.resnets.1")

    # up path, tapping features after every complete up block
    feats: List[jax.Array] = []
    rev_attn = tuple(reversed(cfg.down_block_has_attn))
    rev_heads = tuple(reversed(cfg.attention_heads))
    for i in range(n_blocks):
        blk = p["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            skip = residuals.pop()
            if block_remat:
                unit = make_unit(rev_attn[i], rev_heads[i], concat_skip=True)
                ap = blk["attentions"][str(j)] if rev_attn[i] else None
                h = unit(blk["resnets"][str(j)], ap, h, skip, temb, ctx)
            else:
                h = jnp.concatenate([h, skip], axis=-1)
                h = resnet_block(blk["resnets"][str(j)], h, temb, cfg.norm_eps,
                                 conv_fn=conv_fn,
                                 name=f"up_blocks.{i}.resnets.{j}")
                if rev_attn[i]:
                    h = spatial_transformer(
                        blk["attentions"][str(j)], h, ctx, rev_heads[i],
                        dense_fn=dense_fn, name=f"up_blocks.{i}.attentions.{j}",
                    )
        if "upsamplers" in blk:
            # match the next skip's spatial size (diffusers upsample_size)
            target = residuals[-1].shape[1:3] if residuals else None
            h = upsample2d(blk["upsamplers"]["0"], h, target, conv_fn=conv_fn,
                           name=f"up_blocks.{i}.upsamplers.0")
        if return_features:
            feats.append(h)

    if not cfg.with_conv_out:
        assert return_features
        return None, feats

    out = group_norm(
        h, p["conv_norm_out"]["weight"], p["conv_norm_out"]["bias"], 32, cfg.norm_eps
    )
    out = jax.nn.silu(out)
    out = conv(p["conv_out"], out)
    if return_features:
        return out, feats
    return out
