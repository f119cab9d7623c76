"""UNet stage-by-stage profile on the real TPU: times cumulative prefixes
(conv_in+down0..3 / mid / up0..3 / conv_out) of the SD2.1 UNet forward so
the gap between the measured whole-UNet time (~322 ms at batch 16) and the
conv/attention floor can be localized per level.

Usage: timeout 1200 python scripts/profile_unet_stages.py [--batch 16]
Prints one JSON line per cumulative stage with the marginal delta.
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from genpercept_tpu.models.layers import (  # noqa: E402
    dense,
    conv,
    downsample2d,
    resnet_block,
    spatial_transformer,
    upsample2d,
)
from genpercept_tpu.models.unet import SD21_UNET, init_unet  # noqa: E402
from genpercept_tpu.ops import timestep_embedding  # noqa: E402


def marginal_time(fn, params, x, n_lo=2, n_hi=6):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(params, x, n):
        def body(i, carry):
            acc, p = carry
            out = fn(p, x)
            s = jnp.sum(out).astype(jnp.float32)
            p = jax.tree.map(lambda t: t * (1.0 + s.astype(t.dtype) * 1e-30), p)
            return (acc + s, p)

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), params))[0]

    float(run_n(params, x, n_lo))
    float(run_n(params, x, n_hi))
    t0 = time.perf_counter()
    float(run_n(params, x, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_n(params, x, n_hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def unet_prefix(p, sample, ctx, stop, cfg=SD21_UNET):
    """unet_apply (models/unet.py:151-230) truncated after `stop` stages.

    Stage order: down0..down3 (incl. downsampler), mid, up0..up3 (incl.
    upsampler), out. Returns the running activation summed with all skip
    residuals so no stage is dead code."""
    chans = cfg.block_out_channels
    n_blocks = len(chans)
    timesteps = jnp.full((sample.shape[0],), 301, jnp.int32)
    temb = timestep_embedding(timesteps, chans[0])
    te = p["time_embedding"]
    temb = dense(te["linear_2"], jax.nn.silu(dense(te["linear_1"], temb)))
    temb = temb.astype(sample.dtype)

    stage = 0
    h = conv(p["conv_in"], sample)
    residuals = [h]
    for i in range(n_blocks):
        blk = p["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h = resnet_block(blk["resnets"][str(j)], h, temb, cfg.norm_eps)
            if cfg.down_block_has_attn[i]:
                h = spatial_transformer(
                    blk["attentions"][str(j)], h, ctx, cfg.attention_heads[i]
                )
            residuals.append(h)
        if "downsamplers" in blk:
            h = downsample2d(blk["downsamplers"]["0"], h)
            residuals.append(h)
        stage += 1
        if stage == stop:
            return sum(jnp.sum(r) for r in residuals) + jnp.sum(h)

    mid = p["mid_block"]
    h = resnet_block(mid["resnets"]["0"], h, temb, cfg.norm_eps)
    h = spatial_transformer(mid["attentions"]["0"], h, ctx, cfg.attention_heads[-1])
    h = resnet_block(mid["resnets"]["1"], h, temb, cfg.norm_eps)
    stage += 1
    if stage == stop:
        return sum(jnp.sum(r) for r in residuals) + jnp.sum(h)

    rev_attn = tuple(reversed(cfg.down_block_has_attn))
    rev_heads = tuple(reversed(cfg.attention_heads))
    for i in range(n_blocks):
        blk = p["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            skip = residuals.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = resnet_block(blk["resnets"][str(j)], h, temb, cfg.norm_eps)
            if rev_attn[i]:
                h = spatial_transformer(
                    blk["attentions"][str(j)], h, ctx, rev_heads[i]
                )
        if "upsamplers" in blk:
            target = residuals[-1].shape[1:3] if residuals else None
            h = upsample2d(blk["upsamplers"]["0"], h, target)
        stage += 1
        if stage == stop:
            return sum(jnp.sum(r) for r in residuals) + jnp.sum(h)

    from genpercept_tpu.ops import group_norm

    out = group_norm(
        h, p["conv_norm_out"]["weight"], p["conv_norm_out"]["bias"], 32,
        cfg.norm_eps,
    )
    out = jax.nn.silu(out)
    out = conv(p["conv_out"], out)
    return jnp.sum(out)


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--latent", type=int, default=96)
    args = ap.parse_args()
    b, s = args.batch, args.latent
    bf = jnp.bfloat16

    params = jax.tree.map(
        lambda t: t.astype(bf), init_unet(jax.random.key(0))
    )
    sample = jax.random.normal(jax.random.key(1), (b, s, s, 4), bf)
    ctx = jax.random.normal(jax.random.key(2), (b, 77, 1024), bf)

    names = ["down0", "down1", "down2", "down3", "mid",
             "up0", "up1", "up2", "up3", "out"]
    prev = 0.0
    for stop, name in enumerate(names, start=1):
        fn = functools.partial(
            lambda p, x, _stop: unet_prefix(p, x, ctx, _stop), _stop=stop
        )
        dt = marginal_time(fn, params, sample) * 1e3
        print(json.dumps({"stage": name, "cum_ms": round(dt, 2),
                          "delta_ms": round(dt - prev, 2)}), flush=True)
        prev = dt


if __name__ == "__main__":
    main()
