"""Pallas W8A8 3x3 conv with in-VMEM quantize and bf16 epilogue —
EXPERIMENTAL, measured and NOT routed (see below).

Hypothesis: XLA cannot emit an s8xs8 convolution whose s32 result is
dequantized before touching HBM, so at the bandwidth-heavy 768^2@128 VAE
levels the int32 round trip should erase the MXU's int8 rate and a kernel
that quantizes on VMEM tiles (clip(round(x * 127/a))), accumulates the nine
shifted-window s8 matmuls in int32 registers, and writes dequantized bf16
(one HBM read + one write total) should win.

MEASUREMENT (v5e, batch 16, scripts/profile_quant_conv.py): the hypothesis
fails at the shape that matters. 768^2@128: XLA 21.1 ms (132 TFLOP/s) vs
this kernel 28.9 ms — and bf16 XLA conv is ~13.5 ms at the same shape
(~206 TFLOP/s): with only a 128-deep contraction the MXU's 2x int8 rate
never materializes, so int8 loses there no matter who emits it (this is
why quantize_from_stats placement should skip cin-128 convs, not why a
hand kernel is needed). At deeper contractions the kernel merely ties XLA:
384^2@256 14.7 vs 14.4 ms, 192^2@512 10.6 vs 11.0 (only win, +4%),
96^2@512 2.8 vs 2.1. Kept off the hot path as a negative result with its
parity test, like ops/fused_conv.py.

Same stripe/halo layout as fused_conv.py: grid (N, H/TH), each program
quantizes a (TH+2, W+2, C) halo tile into int8 VMEM scratch.

Inference-only (the int8 path is inference-only by construction).
Reference counterpart: none (fp16 autocast only, /root/reference/run.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 8  # output rows per program


def _kernel(xt_ref, xc_ref, xb_ref, inv_a_ref, w_ref, o_scale_ref, bias_ref,
            o_ref, ybuf, *, th: int):
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    wdt = xc_ref.shape[2]
    c = xc_ref.shape[3]
    co = o_ref.shape[3]

    inv_a = inv_a_ref[0, 0].astype(jnp.float32)  # (C,)

    def quant(v):  # (rows, W, C) bf16 -> int8
        y = v.astype(jnp.float32) * inv_a
        return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)

    ybuf[1:th + 1, 1:wdt + 1, :] = quant(xc_ref[0])

    @pl.when(i > 0)
    def _top():
        ybuf[0:1, 1:wdt + 1, :] = quant(xt_ref[0])

    @pl.when(i == 0)
    def _top_zero():
        ybuf[0:1, :, :] = jnp.zeros((1, wdt + 2, c), jnp.int8)

    @pl.when(i < nh - 1)
    def _bot():
        ybuf[th + 1:th + 2, 1:wdt + 1, :] = quant(xb_ref[0])

    @pl.when(i == nh - 1)
    def _bot_zero():
        ybuf[th + 1:th + 2, :, :] = jnp.zeros((1, wdt + 2, c), jnp.int8)

    # zero-pad halo columns (symmetric pad=1; quantized zero is exactly 0)
    zcol = jnp.zeros((th + 2, 1, c), jnp.int8)
    ybuf[:, 0:1, :] = zcol
    ybuf[:, wdt + 1:wdt + 2, :] = zcol

    acc = jnp.zeros((th * wdt, co), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            v = ybuf[dy:dy + th, dx:dx + wdt, :].reshape(th * wdt, c)
            acc = acc + jax.lax.dot_general(
                v, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    out = acc.astype(jnp.float32) * o_scale_ref[0].astype(jnp.float32)
    out = out + bias_ref[0].astype(jnp.float32)
    o_ref[0] = out.reshape(th, wdt, co).astype(o_ref.dtype)


def supported(x_shape, co: int, kind: str = "3x3", stride=1) -> bool:
    """Stride-1 pad-1 3x3 only; channel counts must fill MXU tiles and the
    stripe grid must divide the height (true for every 768^2-derived VAE /
    UNet level)."""
    n, h, w, c = x_shape
    return (
        kind == "3x3"
        and stride in (1, (1, 1))
        and h % _TH == 0
        and h >= 2 * _TH
        and c % 128 == 0
        and co % 128 == 0
        and w % 8 == 0
    )


@jax.jit
def quantized_conv3x3(
    x: jax.Array,          # (N, H, W, C) bf16/f32
    w_int8: jax.Array,     # (3, 3, C, Co) int8
    inv_a: jax.Array,      # (C,) f32 = 127/a
    o_scale: jax.Array,    # (Co,) f32
    bias: jax.Array,       # (Co,) f32 (zeros if the conv has none)
) -> jax.Array:
    n, h, w, c = x.shape
    co = w_int8.shape[-1]
    th = _TH

    in_specs = [
        pl.BlockSpec((1, 1, w, c),
                     lambda nn, ii: (nn, jnp.maximum(ii * _TH - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, w, c), lambda nn, ii: (nn, ii, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, c),
                     lambda nn, ii, hh=h: (nn, jnp.minimum(ii * _TH + _TH, hh - 1), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda nn, ii: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, c, co), lambda nn, ii: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda nn, ii: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda nn, ii: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        x, x, x,
        inv_a.astype(jnp.float32).reshape(1, 1, c),
        w_int8,
        o_scale.astype(jnp.float32).reshape(1, co),
        bias.astype(jnp.float32).reshape(1, co),
    ]

    return pl.pallas_call(
        functools.partial(_kernel, th=th),
        grid=(n, h // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, co), lambda nn, ii: (nn, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w + 2, c), jnp.int8),  # quantized halo tile
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(*operands)
