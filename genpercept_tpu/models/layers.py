"""Shared building blocks for the SD2.1 model zoo (pure functions, NHWC).

Parameter pytrees are nested dicts whose key structure mirrors the diffusers
checkpoint naming (resnets / attentions / norm1 / conv1 / to_q ...), so the
safetensors importer is a pure layout transform (OIHW->HWIO, linear
transpose) with no renaming table.

Conventions:
  conv weight: HWIO;  linear weight: (in, out);  norm scale/bias: (C,)
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from genpercept_tpu.ops import conv2d, group_norm, layer_norm
from genpercept_tpu.ops.attention import attention_projection, dot_product_attention
from genpercept_tpu.ops.conv import conv1x1

Params = Dict[str, Any]


# ---------------------------------------------------------------- init utils

def dense_init(key, din: int, dout: int, bias: bool = True) -> Params:
    k1, _ = jax.random.split(key)
    bound = 1.0 / math.sqrt(din)
    p = {"weight": jax.random.uniform(k1, (din, dout), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((dout,), jnp.float32)
    return p


def conv_init(key, kh: int, kw: int, cin: int, cout: int, bias: bool = True) -> Params:
    k1, _ = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin * kh * kw)
    p = {"weight": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def norm_init(c: int) -> Params:
    return {"weight": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def dense(p: Params, x: jax.Array) -> jax.Array:
    return attention_projection(x, p["weight"], p.get("bias"))


def conv(p: Params, x: jax.Array, stride: int = 1, padding: int = 1) -> jax.Array:
    return conv2d(x, p["weight"], p.get("bias"), stride=stride, padding=padding)


# ------------------------------------------------------------- resnet block

def init_resnet_block(key, cin: int, cout: int, temb_dim: int | None) -> Params:
    ks = jax.random.split(key, 4)
    p: Params = {
        "norm1": norm_init(cin),
        "conv1": conv_init(ks[0], 3, 3, cin, cout),
        "norm2": norm_init(cout),
        "conv2": conv_init(ks[1], 3, 3, cout, cout),
    }
    if temb_dim is not None:
        p["time_emb_proj"] = dense_init(ks[2], temb_dim, cout)
    if cin != cout:
        p["conv_shortcut"] = conv_init(ks[3], 1, 1, cin, cout)
    return p


def resnet_block(
    p: Params, x: jax.Array, temb: jax.Array | None = None, eps: float = 1e-5,
    fused: bool = False, conv_fn=None, name: str = "",
    native_norm: bool = False,
) -> jax.Array:
    """diffusers ResnetBlock2D: GN -> SiLU -> conv -> (+temb) -> GN -> SiLU
    -> conv -> +shortcut.

    fused=True routes both GN+SiLU+conv sequences (and the skip add) through
    the Pallas fused kernel (ops/fused_conv.py) — inference path only.
    conv_fn (see ops/quant.py) overrides how conv1/conv2 are applied
    (int8-quantized execution or calibration); `name` prefixes the conv
    paths it sees. native_norm does the GroupNorm apply in x's dtype
    (training remat path; see ops/norms.py::group_norm)."""
    if fused and temb is None and conv_fn is None:
        from genpercept_tpu.ops import fused_conv as FC

        cout = p["conv1"]["weight"].shape[-1]
        if FC.supported(x.shape, cout):
            h = FC.fused_gn_silu_conv3x3(
                x, p["norm1"]["weight"], p["norm1"]["bias"],
                p["conv1"]["weight"], p["conv1"].get("bias"), eps=eps,
            )
            skip = x
            if "conv_shortcut" in p:
                skip = conv1x1(x, p["conv_shortcut"]["weight"][0, 0],
                               p["conv_shortcut"].get("bias"))
            return FC.fused_gn_silu_conv3x3(
                h, p["norm2"]["weight"], p["norm2"]["bias"],
                p["conv2"]["weight"], p["conv2"].get("bias"),
                residual=skip, eps=eps,
            )
    cf = (lambda _n, cp, xx: conv(cp, xx)) if conv_fn is None else conv_fn
    h = group_norm(x, p["norm1"]["weight"], p["norm1"]["bias"], 32, eps,
                   native_apply=native_norm)
    h = jax.nn.silu(h)
    h = cf(name + ".conv1", p["conv1"], h)
    if temb is not None and "time_emb_proj" in p:
        t = dense(p["time_emb_proj"], jax.nn.silu(temb))
        h = h + t[:, None, None, :].astype(h.dtype)
    h = group_norm(h, p["norm2"]["weight"], p["norm2"]["bias"], 32, eps,
                   native_apply=native_norm)
    h = jax.nn.silu(h)
    h = cf(name + ".conv2", p["conv2"], h)
    if "conv_shortcut" in p:
        x = conv1x1(x, p["conv_shortcut"]["weight"][0, 0], p["conv_shortcut"].get("bias"))
    return x + h


# ---------------------------------------------------------- up/down sampling

def init_downsample(key, c: int) -> Params:
    return {"conv": conv_init(key, 3, 3, c, c)}


def downsample2d(p: Params, x: jax.Array, asymmetric_pad: bool = False,
                 conv_fn=None, name: str = "") -> jax.Array:
    """Stride-2 conv. The VAE encoder pads (0,1,0,1) asymmetrically (folded
    into the conv's padding argument — an explicit jnp.pad would copy the
    full tensor); the UNet uses symmetric padding=1."""
    pad = ((0, 1), (0, 1)) if asymmetric_pad else 1
    if conv_fn is not None:
        return conv_fn(name + ".conv", p["conv"], x, stride=2, padding=pad)
    if asymmetric_pad:
        from genpercept_tpu.ops.conv import conv2d

        return conv2d(x, p["conv"]["weight"], p["conv"].get("bias"),
                      stride=2, padding=pad)
    return conv(p["conv"], x, stride=2, padding=1)


def init_upsample(key, c: int, cout: int | None = None) -> Params:
    return {"conv": conv_init(key, 3, 3, c, cout or c)}


def upsample2d(p: Params, x: jax.Array, out_hw: tuple | None = None,
               conv_fn=None, name: str = "") -> jax.Array:
    """Nearest upsample (x2 or to explicit size) then 3x3 conv — diffusers
    Upsample2D(use_conv=True). The explicit size path mirrors diffusers'
    `forward_upsample_size` handling for latents not divisible by 8."""
    n, h, w, c = x.shape
    if out_hw is None or out_hw == (2 * h, 2 * w):
        if conv_fn is not None:
            return conv_fn(name + ".conv", p["conv"], x, kind="up4x4")
        from genpercept_tpu.ops.conv import nearest_up2_conv3x3

        return nearest_up2_conv3x3(
            x, p["conv"]["weight"], p["conv"].get("bias")
        )
    else:
        oh, ow = out_hw
        # torch F.interpolate mode='nearest': src = floor(i * in / out)
        ys = jnp.minimum((jnp.arange(oh) * h // oh).astype(jnp.int32), h - 1)
        xs = jnp.minimum((jnp.arange(ow) * w // ow).astype(jnp.int32), w - 1)
        x = x[:, ys][:, :, xs]
    # This explicit-size branch (latents not divisible by 8) deliberately
    # stays full precision under conv_fn: the quantized upsampler is the
    # collapsed lhs-dilated 4x4 kernel, whose geometry assumes the exact-x2
    # path, and production resolutions never land here.
    return conv(p["conv"], x)


# ------------------------------------------------- VAE single-head attention

def init_vae_attention(key, c: int) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "group_norm": norm_init(c),
        "to_q": dense_init(ks[0], c, c),
        "to_k": dense_init(ks[1], c, c),
        "to_v": dense_init(ks[2], c, c),
        "to_out": {"0": dense_init(ks[3], c, c)},
    }


def vae_attention(p: Params, x: jax.Array, eps: float = 1e-6,
                  int8: bool = False, dense_fn=None,
                  name: str = "") -> jax.Array:
    """Single-head full self-attention over spatial tokens (VAE mid block).

    int8=True runs QK^T and PV through the s8 flash kernel
    (ops/flash_attention.py::flash_attention_int8) — inference-only; the
    d=512 matmuls dominate this kernel so the 2x s8 MXU rate pays here
    (unlike the UNet's VPU-bound d=64 attention). dense_fn additionally
    hooks the four 512x512 projections for int8/calibration (ops/quant.py),
    same contract as the UNet transformer hooks."""
    n, h, w, c = x.shape
    res = x
    y = group_norm(x, p["group_norm"]["weight"], p["group_norm"]["bias"], 32, eps)
    y = y.reshape(n, h * w, c)
    df = (lambda _n, pp, xx: dense(pp, xx)) if dense_fn is None else dense_fn
    q = df(name + ".to_q", p["to_q"], y)[:, :, None, :]
    k = df(name + ".to_k", p["to_k"], y)[:, :, None, :]
    v = df(name + ".to_v", p["to_v"], y)[:, :, None, :]
    if int8:
        from genpercept_tpu.ops.flash_attention import flash_attention_int8

        o = flash_attention_int8(q, k, v)[:, :, 0, :]
    else:
        o = dot_product_attention(q, k, v)[:, :, 0, :]
    o = df(name + ".to_out.0", p["to_out"]["0"], o)
    return res + o.reshape(n, h, w, c)


# -------------------------------------------- transformer (UNet attn blocks)

def init_cross_attention(key, c: int, heads: int, context_dim: int | None) -> Params:
    ks = jax.random.split(key, 4)
    kv_in = context_dim if context_dim is not None else c
    return {
        "to_q": dense_init(ks[0], c, c, bias=False),
        "to_k": dense_init(ks[1], kv_in, c, bias=False),
        "to_v": dense_init(ks[2], kv_in, c, bias=False),
        "to_out": {"0": dense_init(ks[3], c, c)},
    }


def cross_attention(
    p: Params, x: jax.Array, context: jax.Array | None, heads: int,
    dense_fn=None, name: str = "",
) -> jax.Array:
    """x: (B, S, C); context: (B, Sk, Ck) or None for self-attention.

    dense_fn (ops/quant.py) hooks the q/out projections (and k/v for
    self-attention; cross-attention k/v act on 77 text tokens — too small
    to be worth quantizing)."""
    df = (lambda _n, pp, xx: dense(pp, xx)) if dense_fn is None else dense_fn
    b, s, c = x.shape
    ctx = x if context is None else context
    d = c // heads
    q = df(name + ".to_q", p["to_q"], x).reshape(b, s, heads, d)
    if context is None:
        k = df(name + ".to_k", p["to_k"], ctx).reshape(b, ctx.shape[1], heads, d)
        v = df(name + ".to_v", p["to_v"], ctx).reshape(b, ctx.shape[1], heads, d)
    else:
        k = dense(p["to_k"], ctx).reshape(b, ctx.shape[1], heads, d)
        v = dense(p["to_v"], ctx).reshape(b, ctx.shape[1], heads, d)
    o = dot_product_attention(q, k, v).reshape(b, s, c)
    return df(name + ".to_out.0", p["to_out"]["0"], o)


def init_feed_forward(key, c: int, mult: int = 4) -> Params:
    k1, k2 = jax.random.split(key)
    inner = c * mult
    return {
        "net": {
            "0": {"proj": dense_init(k1, c, inner * 2)},  # GEGLU
            "2": dense_init(k2, inner, c),
        }
    }


def feed_forward(p: Params, x: jax.Array, dense_fn=None,
                 name: str = "") -> jax.Array:
    """GEGLU feed-forward: proj -> split -> x * gelu(gate) -> linear.

    Computed as TWO matmuls over column slices of the fused proj weight
    (exact: slicing W before the matmul == splitting the output after).
    The fused form writes a (B, S, 8C) intermediate that XLA cannot fuse
    away — `hidden` and `gate` come from different output columns of one
    matmul, so the gelu-mul is not an elementwise epilogue of it. Split,
    the gelu-mul becomes an input fusion of the down-projection and the
    (B, S, 4C) tensors never round-trip HBM twice (measured 4.7 -> ~3.6 ms
    per 9216-token UNet layer at batch 16)."""
    w = p["net"]["0"]["proj"]["weight"]
    b = p["net"]["0"]["proj"].get("bias")
    if dense_fn is not None:
        # int8 execution path (make_quant_dense_fn exposes its qtree): when
        # all three matmuls of this FF are calibrated, run them as ONE
        # Pallas program with s8 MXU matmuls and VMEM-resident
        # intermediates (ops/fused_ff.py::fused_geglu_ff_int8) — the same
        # streaming as the bf16 fused kernel, so QDense no longer displaces
        # the fusion (the round-2 negative result for int8_unet_dense)
        qtree = getattr(dense_fn, "qtree", None)
        if qtree is not None and jax.default_backend() != "cpu":
            from genpercept_tpu.ops import fused_ff as FF

            qh = qtree.get(name + ".net.0.proj:h")
            qg = qtree.get(name + ".net.0.proj:g")
            q2 = qtree.get(name + ".net.2")
            if (qh is not None and qg is not None and q2 is not None
                    and FF.supported_int8(x.shape[0], x.shape[1],
                                          x.shape[2])):
                return FF.fused_geglu_ff_int8(x, qh, qg, q2)
        # quantized/calibration path: the two GEGLU halves stay separate
        # column-sliced matmuls (same HBM argument as below), each its own
        # QDense keyed by the :h / :g suffix
        inner = w.shape[1] // 2
        hidden = dense_fn(name + ".net.0.proj:h",
                          {"weight": w[:, :inner],
                           "bias": None if b is None else b[:inner]}, x)
        gate = dense_fn(name + ".net.0.proj:g",
                        {"weight": w[:, inner:],
                         "bias": None if b is None else b[inner:]}, x)
        h = hidden * jax.nn.gelu(gate, approximate=False)
        return dense_fn(name + ".net.2", p["net"]["2"], h)
    from genpercept_tpu.ops import fused_ff as FF

    if (jax.default_backend() != "cpu"
            and FF.supported(x.shape[0], x.shape[1], x.shape[2])):
        # one Pallas program streams a row block through all three matmuls;
        # the (B, S, 4C) intermediates never exist in HBM (3.4 vs 4.9 ms at
        # the level-0 shape; differentiable via XLA-recompute vjp)
        return FF.fused_geglu_ff(x, w, b, p["net"]["2"]["weight"],
                                 p["net"]["2"].get("bias"))
    inner = w.shape[1] // 2
    hidden = attention_projection(x, w[:, :inner], None if b is None else b[:inner])
    gate = attention_projection(x, w[:, inner:], None if b is None else b[inner:])
    h = hidden * jax.nn.gelu(gate, approximate=False)
    return dense(p["net"]["2"], h)


def init_transformer_block(key, c: int, heads: int, context_dim: int) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "norm1": norm_init(c),
        "attn1": init_cross_attention(ks[0], c, heads, None),
        "norm2": norm_init(c),
        "attn2": init_cross_attention(ks[1], c, heads, context_dim),
        "norm3": norm_init(c),
        "ff": init_feed_forward(ks[2], c),
    }


def transformer_block(
    p: Params, x: jax.Array, context: jax.Array, heads: int,
    dense_fn=None, name: str = "",
) -> jax.Array:
    """BasicTransformerBlock: self-attn, cross-attn, GEGLU FF (pre-LN)."""
    h = layer_norm(x, p["norm1"]["weight"], p["norm1"]["bias"])
    x = x + cross_attention(p["attn1"], h, None, heads,
                            dense_fn=dense_fn, name=name + ".attn1")
    h = layer_norm(x, p["norm2"]["weight"], p["norm2"]["bias"])
    x = x + cross_attention(p["attn2"], h, context, heads,
                            dense_fn=dense_fn, name=name + ".attn2")
    h = layer_norm(x, p["norm3"]["weight"], p["norm3"]["bias"])
    x = x + feed_forward(p["ff"], h, dense_fn=dense_fn, name=name + ".ff")
    return x


def init_spatial_transformer(
    key, c: int, heads: int, context_dim: int, depth: int = 1
) -> Params:
    ks = jax.random.split(key, depth + 2)
    return {
        "norm": norm_init(c),
        "proj_in": dense_init(ks[0], c, c),
        "transformer_blocks": {
            str(i): init_transformer_block(ks[1 + i], c, heads, context_dim)
            for i in range(depth)
        },
        "proj_out": dense_init(ks[depth + 1], c, c),
    }


def spatial_transformer(
    p: Params, x: jax.Array, context: jax.Array, heads: int,
    dense_fn=None, name: str = "",
) -> jax.Array:
    """diffusers Transformer2DModel with use_linear_projection=True (SD2.1):
    GN(eps 1e-6) -> flatten -> linear proj_in -> blocks -> linear proj_out
    -> unflatten -> +residual."""
    df = (lambda _n, pp, xx: dense(pp, xx)) if dense_fn is None else dense_fn
    n, h, w, c = x.shape
    res = x
    y = group_norm(x, p["norm"]["weight"], p["norm"]["bias"], 32, 1e-6)
    y = y.reshape(n, h * w, c)
    y = df(name + ".proj_in", p["proj_in"], y)
    for i in range(len(p["transformer_blocks"])):
        y = transformer_block(p["transformer_blocks"][str(i)], y, context,
                              heads, dense_fn=dense_fn,
                              name=f"{name}.transformer_blocks.{i}")
    y = df(name + ".proj_out", p["proj_out"], y)
    return res + y.reshape(n, h, w, c)
