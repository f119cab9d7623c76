"""Fused GroupNorm→SiLU→conv3x3(→+residual) Pallas kernel for the VAE
resblocks (SURVEY §7 "fused resblock epilogue"; reference hot path
genpercept_pipeline.py:488-526 via diffusers ResnetBlock2D).

Why: with XLA, every GN+SiLU+conv sequence materializes the normalized
tensor in HBM (write + conv re-read — ~5.9 ms per instance at 768^2@128,
batch 16 on v5e). Here the GroupNorm statistics are computed by XLA (one
read, usually fused into the producer), folded into per-(sample, channel)
affine coefficients, and the normalize+SiLU is applied on VMEM tiles inside
an implicit-GEMM 3x3 convolution — the normalized tensor never exists in
HBM. The resblock's skip-add can ride along as an optional residual input,
removing another full-tensor read+write.

Kernel layout: grid (N, H/TH); each program loads a TH-row stripe plus one
halo row above/below, normalizes into a zero-padded (TH+2, W+2, C) VMEM
buffer, and accumulates the nine shifted-window matmuls
(TH*W, C) @ (C, Co) in fp32. All matmul operands stay in the input dtype
(bf16 in production).

Inference path only (no custom VJP): training keeps the XLA composition.

MEASUREMENT (v5e, batch 16, 768^2 bf16 end-to-end): 12.0 img/s with this
kernel vs 15.8 img/s with the XLA composition — XLA's conv emitter runs at
~206 TFLOP/s (90% of peak) and already fuses the normalize+SiLU cheaply, so
the hand-written implicit GEMM loses more on its nine shifted-window
matmuls than it saves in HBM traffic. Kept as an OFF-BY-DEFAULT
experimental path (PipelineConfig.fused_vae); the honest conclusion is that
on this op class the XLA baseline is the speed of light.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 8  # output rows per program


def _kernel(xt_ref, xc_ref, xb_ref, a_ref, b_ref, w_ref, bias_ref, *rest,
            th: int, has_res: bool):
    if has_res:
        res_ref, o_ref, ybuf = rest
    else:
        (o_ref, ybuf) = rest
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    wdt = xc_ref.shape[2]
    c = xc_ref.shape[3]
    co = o_ref.shape[3]

    a = a_ref[0, 0].astype(jnp.float32)  # (C,)
    b = b_ref[0, 0].astype(jnp.float32)

    def norm(v):  # (rows, W, C) -> normalized+SiLU in input dtype
        y = v.astype(jnp.float32) * a + b
        return (y * jax.nn.sigmoid(y)).astype(ybuf.dtype)

    ybuf[1:th + 1, 1:wdt + 1, :] = norm(xc_ref[0])

    @pl.when(i > 0)
    def _top():
        ybuf[0:1, 1:wdt + 1, :] = norm(xt_ref[0])

    @pl.when(i == 0)
    def _top_zero():
        ybuf[0:1, :, :] = jnp.zeros((1, wdt + 2, c), ybuf.dtype)

    @pl.when(i < nh - 1)
    def _bot():
        ybuf[th + 1:th + 2, 1:wdt + 1, :] = norm(xb_ref[0])

    @pl.when(i == nh - 1)
    def _bot_zero():
        ybuf[th + 1:th + 2, :, :] = jnp.zeros((1, wdt + 2, c), ybuf.dtype)

    # zero the left/right halo columns (after the row writes above)
    zcol = jnp.zeros((th + 2, 1, c), ybuf.dtype)
    ybuf[:, 0:1, :] = zcol
    ybuf[:, wdt + 1:wdt + 2, :] = zcol

    acc = jnp.zeros((th * wdt, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            v = ybuf[dy:dy + th, dx:dx + wdt, :].reshape(th * wdt, c)
            acc = acc + jax.lax.dot_general(
                v, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + bias_ref[0].astype(jnp.float32)
    if has_res:
        acc = acc + res_ref[0].reshape(th * wdt, co).astype(jnp.float32)
    o_ref[0] = acc.reshape(th, wdt, co).astype(o_ref.dtype)


def supported(x_shape, co: int, temb=None) -> bool:
    n, h, w, c = x_shape
    return (
        temb is None
        and h % _TH == 0
        and h >= 2 * _TH
        and c % 128 == 0
        # output channels must fill lane tiles too: the final conv_out
        # layers (co=3 decoder / co=8 encoder moments) would emit
        # 1/42nd-full output tiles — leave those to XLA
        and co % 128 == 0
        and w % 8 == 0
    )


@functools.partial(jax.jit, static_argnames=("groups", "eps"))
def fused_gn_silu_conv3x3(
    x: jax.Array,            # (N, H, W, C)
    gn_scale: jax.Array,     # (C,)
    gn_bias: jax.Array,      # (C,)
    conv_w: jax.Array,       # (3, 3, C, Co) HWIO
    conv_b: jax.Array | None,
    residual: jax.Array | None = None,  # (N, H, W, Co), added to the output
    groups: int = 32,
    eps: float = 1e-6,
) -> jax.Array:
    n, h, w, c = x.shape
    co = conv_w.shape[-1]
    th = _TH

    # GroupNorm stats by XLA (one read of x, fusable with x's producer),
    # folded to per-(sample, channel) affine y = x*a + b. One-pass variance
    # with the non-negativity clamp (see ops/norms.py).
    xf = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
    mean_g = jnp.mean(xf, axis=(1, 3))                       # (N, G)
    sq_g = jnp.mean(jnp.square(xf), axis=(1, 3))
    var_g = jnp.maximum(sq_g - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    gpc = c // groups
    rstd = jnp.repeat(rstd_g, gpc, axis=1)                   # (N, C)
    mean = jnp.repeat(mean_g, gpc, axis=1)
    a = gn_scale[None, :].astype(jnp.float32) * rstd         # (N, C)
    b = gn_bias[None, :].astype(jnp.float32) - mean * a
    a = a[:, None, :]                                        # (N, 1, C)
    b = b[:, None, :]

    bias = (jnp.zeros((co,), jnp.float32) if conv_b is None
            else conv_b.astype(jnp.float32)).reshape(1, co)

    has_res = residual is not None
    kernel = functools.partial(_kernel, th=th, has_res=has_res)

    in_specs = [
        # one halo row above (clamped at the top edge; kernel zeroes it)
        pl.BlockSpec((1, 1, w, c),
                     lambda nn, ii: (nn, jnp.maximum(ii * _TH - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, w, c), lambda nn, ii: (nn, ii, 0, 0),
                     memory_space=pltpu.VMEM),
        # one halo row below (clamped at the bottom edge)
        pl.BlockSpec((1, 1, w, c),
                     lambda nn, ii, hh=h: (nn, jnp.minimum(ii * _TH + _TH, hh - 1), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda nn, ii: (nn, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda nn, ii: (nn, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, c, co), lambda nn, ii: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda nn, ii: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, x, x, a, b, conv_w.astype(x.dtype), bias]
    if has_res:
        in_specs.append(
            pl.BlockSpec((1, th, w, co), lambda nn, ii: (nn, ii, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(residual)

    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, co), lambda nn, ii: (nn, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w + 2, c), x.dtype),  # normalized halo tile
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # the 768^2@128 stripe working set (input/res/out double buffers
            # + halo scratch + fp32 accumulator) peaks ~18 MB, above
            # Mosaic's default 16 MB scoped-vmem budget
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(*operands)
