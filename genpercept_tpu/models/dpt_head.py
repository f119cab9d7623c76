"""DPT decode head grafted onto the UNet's up-block features (NHWC).

Rebuild of the reference's `DPTNeckHeadForUnetAfterUpsample[Identity]`
(reference `genpercept/models/dpt_head.py:416-593`), which assembles
transformers-DPT pieces with the reassemble stage disabled:

  input: 4 reversed UNet up-block features
         [(H, 320), (H, 640), (H/2, 1280), (H/4, 1280)] for latent size H
  1. Upsample2D(use_conv) on feature 0             -> (2H, 320)
  2. neck convs: per-level 3x3, no bias, -> 256
  3. fusion stage (low-res first): PreActResidual units + x2 bilinear
     (align_corners=True) + 1x1 projection          -> (8H, 256)
  4. head: [opt 3x3 proj + ReLU] -> 3x3 conv 256->128 -> x2 bilinear
     (align_corners=True) -> 3x3 conv 128->32 -> ReLU -> 1x1 conv 32->1
     -> ReLU (depth/seg) or Identity (disparity variant)

For latent 96 (768^2 input) the output is (B, 768, 768).

Variant coverage (config flags):
  final_act="identity"         -> ...Identity (disparity, dpt_head.py:585)
  final_act="elu_plus_one"     -> v1 ELU zoo (dpt_head_elu.py:183-221)
  upsample_first_feature=False -> v1 DPTNeckHeadForUnet /
                                  ...WithVaeDecoderWithNeck (dpt_head_elu.py:
                                  247,537 — neck+head without the Upsample2D)
  use_neck=False               -> v1 ...WithVaeDecoderWithoutNeck
                                  (dpt_head_elu.py:683-829 — per-level
                                  bias-free 3x3 adapt convs, no fusion)

Param tree keys mirror the reference checkpoint layout
(feature_upsample_0.conv, neck.convs.N, neck.fusion_stage.layers.N.{projection,
residual_layer1,residual_layer2}.{convolution1,convolution2}, head.projection,
head.head.{0,2,4}).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from genpercept_tpu.models.layers import Params, conv, conv_init
from genpercept_tpu.ops.conv import conv1x1
from genpercept_tpu.ops.resize import resize_bilinear_align_corners


@dataclasses.dataclass(frozen=True)
class DPTHeadConfig:
    neck_hidden_sizes: tuple = (320, 640, 1280, 1280)
    fusion_hidden_size: int = 256
    add_projection: bool = True
    head_in_index: int = -1
    # final activation: "relu" (depth/seg), "identity" (disparity variant),
    # "elu_plus_one" (v1 ELU head zoo, dpt_head_elu.py:183-221: ELU(x)+1,
    # range [0, inf))
    final_act: str = "relu"
    # v1 DPTNeckHeadForUnet (dpt_head_elu.py:247) skips the Upsample2D on
    # the finest feature
    upsample_first_feature: bool = True
    # v1 ...WithVaeDecoderWithoutNeck (dpt_head_elu.py:683-829): the neck
    # (per-level convs + fusion stage) is replaced by 4 bias-free 3x3
    # "feature_adapt" convs to fusion_hidden_size; the head then consumes
    # adapted[head_in_index] directly
    use_neck: bool = True

    @property
    def final_relu(self) -> bool:  # backward-compatible alias
        return self.final_act == "relu"


DPT_GENERAL = DPTHeadConfig()
DPT_IDENTITY = DPTHeadConfig(final_act="identity")
DPT_ELU = DPTHeadConfig(final_act="elu_plus_one")


def init_dpt_head(key, cfg: DPTHeadConfig = DPT_GENERAL) -> Params:
    f = cfg.fusion_hidden_size
    n = len(cfg.neck_hidden_sizes)
    keys = iter(jax.random.split(key, 8 + n * 6))

    def residual_unit():
        return {
            "convolution1": conv_init(next(keys), 3, 3, f, f),
            "convolution2": conv_init(next(keys), 3, 3, f, f),
        }

    fusion_layers = {}
    for i in range(n):
        layer: Params = {
            "projection": conv_init(next(keys), 1, 1, f, f),
            "residual_layer2": residual_unit(),
        }
        if i > 0:
            layer["residual_layer1"] = residual_unit()
        fusion_layers[str(i)] = layer

    p: Params = {
        "head": {
            "head": {
                "0": conv_init(next(keys), 3, 3, f, f // 2),
                "2": conv_init(next(keys), 3, 3, f // 2, 32),
                "4": conv_init(next(keys), 1, 1, 32, 1),
            }
        },
    }
    if cfg.use_neck:
        p["neck"] = {
            "convs": {
                str(i): conv_init(next(keys), 3, 3, c, f, bias=False)
                for i, c in enumerate(cfg.neck_hidden_sizes)
            },
            "fusion_stage": {"layers": fusion_layers},
        }
    else:
        for i, c in enumerate(cfg.neck_hidden_sizes):
            p[f"feature_adapt_conv_{i}"] = conv_init(
                next(keys), 3, 3, c, f, bias=False
            )
    if cfg.upsample_first_feature:
        p["feature_upsample_0"] = {
            "conv": conv_init(next(keys), 3, 3, cfg.neck_hidden_sizes[0],
                              cfg.neck_hidden_sizes[0])
        }
    if cfg.add_projection:
        p["head"]["projection"] = conv_init(next(keys), 3, 3, f, f)
    return p


def _preact_residual(p: Params, x: jax.Array) -> jax.Array:
    h = jax.nn.relu(x)
    h = conv(p["convolution1"], h)
    h = jax.nn.relu(h)
    h = conv(p["convolution2"], h)
    return x + h


def _fusion_layer(p: Params, x: jax.Array, residual: jax.Array | None) -> jax.Array:
    if residual is not None:
        x = x + _preact_residual(p["residual_layer1"], residual)
    x = _preact_residual(p["residual_layer2"], x)
    x = resize_bilinear_align_corners(x, (x.shape[1] * 2, x.shape[2] * 2))
    return conv1x1(x, p["projection"]["weight"][0, 0], p["projection"].get("bias"))


def dpt_head_apply(
    p: Params, hidden_states: List[jax.Array], cfg: DPTHeadConfig = DPT_GENERAL
) -> jax.Array:
    """hidden_states: 4 NHWC features (highest resolution first — i.e. the
    UNet's multi_level_feats reversed, reference genpercept_pipeline.py:479).
    Returns (B, 8*H_latent, 8*W_latent) prediction."""
    assert len(hidden_states) == len(cfg.neck_hidden_sizes)
    hs = list(hidden_states)

    if cfg.upsample_first_feature:
        # Upsample2D(use_conv=True): nearest x2 + 3x3 conv on finest feature
        x0 = hs[0]
        x0 = jnp.repeat(jnp.repeat(x0, 2, axis=1), 2, axis=2)
        hs[0] = conv(p["feature_upsample_0"]["conv"], x0)

    if cfg.use_neck:
        feats = [
            conv(p["neck"]["convs"][str(i)], h) for i, h in enumerate(hs)
        ]

        # fusion: lowest resolution first
        feats = feats[::-1]
        layers = p["neck"]["fusion_stage"]["layers"]
        fused = _fusion_layer(layers["0"], feats[0], None)
        outputs = [fused]
        for i in range(1, len(feats)):
            fused = _fusion_layer(layers[str(i)], fused, feats[i])
            outputs.append(fused)
    else:
        # ...WithVaeDecoderWithoutNeck (dpt_head_elu.py:800-818): per-level
        # adapt convs, no fusion; the head reads adapted[head_in_index]
        outputs = [
            conv(p[f"feature_adapt_conv_{i}"], h) for i, h in enumerate(hs)
        ]

    h = outputs[cfg.head_in_index]
    head = p["head"]
    if cfg.add_projection:
        h = jax.nn.relu(conv(head["projection"], h))
    h = conv(head["head"]["0"], h)
    h = resize_bilinear_align_corners(h, (h.shape[1] * 2, h.shape[2] * 2))
    h = jax.nn.relu(conv(head["head"]["2"], h))
    h = conv1x1(h, head["head"]["4"]["weight"][0, 0], head["head"]["4"].get("bias"))
    if cfg.final_act == "relu":
        h = jax.nn.relu(h)
    elif cfg.final_act == "elu_plus_one":
        h = jax.nn.elu(h) + 1.0
    return h[..., 0]
