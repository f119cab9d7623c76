"""Fused GEGLU feed-forward Pallas kernel for the UNet transformer blocks.

Replaces the three-matmul XLA composition of diffusers' FeedForward
(GEGLU: proj -> split -> hidden * gelu(gate) -> down-projection; reference
uses it inside every BasicTransformerBlock via diffusers, consumed at
`src/trainer/genpercept_trainer.py:235` through the UNet).

Why: at the s=9216, C=320 level-0 shape (batch 16) the XLA composition
runs at ~69 TFLOP/s (5.26 ms for 0.36 TFLOP): the (B, S, 4C) hidden and
gate tensors are written to and re-read from HBM (~1.5 GB of traffic)
around the gelu-mul, and the three dispatches don't overlap. Here one
program streams a row-block of x through all three matmuls in VMEM — the
(4C)-wide intermediates never exist in HBM and weight blocks stay VMEM
resident across the row grid.

Numerics match the split-matmul path: the MXU accumulates fp32, hidden and
gate are rounded to the input dtype (exactly where the XLA composition
materializes them), and the exact (erf) gelu-mul is computed in fp32.

Inference path only (no custom VJP): training keeps the XLA composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLK = 512  # rows of x per program


def _erf_f32(x):
    """XLA's f32 Erf expansion (xla/hlo/builder/lib/math.cc ErfImpl32): a
    clamped rational approximation in x^2. Mosaic has no erf primitive;
    replicating XLA's own polynomial keeps the kernel numerically aligned
    with the unfused jax.nn.gelu(approximate=False) path."""
    alpha = (0.00022905065861350646, 0.0034082910107109506,
             0.050955695062380861, 0.18520832239976145, 1.128379143519084)
    beta = (-1.1791602954361697e-7, 2.3547966471313185e-5,
            0.0010179625278914885, 0.014070470171167667, 0.11098505178285362,
            0.49746925110067538, 1.0)
    x = jnp.clip(x, -3.832506856900711, 3.832506856900711)
    x2 = x * x

    def horner(coeffs):
        acc = jnp.full_like(x2, coeffs[0])
        for c in coeffs[1:]:
            acc = acc * x2 + c
        return acc

    return x * horner(alpha) / horner(beta)


def _kernel(x_ref, wh_ref, wg_ref, bh_ref, bg_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]  # (R, C) input dtype
    h = jax.lax.dot_general(
        x, wh_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bh_ref[0].astype(jnp.float32)
    g = jax.lax.dot_general(
        x, wg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bg_ref[0].astype(jnp.float32)
    # round to the input dtype first: this is where the unfused path
    # materializes hidden/gate, so rounding here keeps the kernel bit-close
    h = h.astype(x.dtype).astype(jnp.float32)
    g = g.astype(x.dtype).astype(jnp.float32)
    # exact gelu (erf), as jax.nn.gelu(approximate=False)
    a = h * (0.5 * g * (1.0 + _erf_f32(g * (2.0 ** -0.5))))
    a = a.astype(x.dtype)
    out = jax.lax.dot_general(
        a, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def supported(b: int, s: int, c: int) -> bool:
    """Shapes where the kernel wins on v5e (profile_unet.py --part fusedff):
    at C=320/S=9216 it measures 3.4 vs 4.9 ms; at C=640 and C=1280 the
    XLA composition is faster (weight-block traffic dominates), so the
    policy is C==320 only."""
    return c == 320 and (b * s) % _ROW_BLK == 0


def _xla_geglu_ff(x, w1, b1, w2, b2):
    """Reference composition (models/layers.py feed_forward) on raw arrays;
    used for the backward pass."""
    inner = w1.shape[1] // 2
    dt = x.dtype

    def proj(w, b):
        out = jnp.einsum("...i,io->...o", x, w.astype(dt))
        return out if b is None else out + b.astype(dt)

    h = proj(w1[:, :inner], None if b1 is None else b1[:inner])
    g = proj(w1[:, inner:], None if b1 is None else b1[inner:])
    a = h * jax.nn.gelu(g, approximate=False)
    out = jnp.einsum("...i,io->...o", a, w2.astype(dt))
    return out if b2 is None else out + b2.astype(dt)


@jax.custom_vjp
def fused_geglu_ff(
    x: jax.Array,    # (B, S, C)
    w1: jax.Array,   # (C, 2*inner) fused GEGLU projection, [hidden | gate]
    b1: jax.Array | None,
    w2: jax.Array,   # (inner, C)
    b2: jax.Array | None,
) -> jax.Array:
    return _fused_geglu_fwd_impl(x, w1, b1, w2, b2)


def _fused_ff_fwd(x, w1, b1, w2, b2):
    # save only the inputs: the (B, S, 4C) intermediates are recomputed in
    # the backward (remat-style), so training memory drops too
    return _fused_geglu_fwd_impl(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _fused_ff_bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_xla_geglu_ff, x, w1, b1, w2, b2)
    return vjp(g)


fused_geglu_ff.defvjp(_fused_ff_fwd, _fused_ff_bwd)


# ------------------------------------------------------- int8 (W8A8) path

def _kernel_int8(x_ref, w1h_ref, w1g_ref, w2_ref,
                 inva1_ref, zp1_ref, osch_ref, bh_ref, oscg_ref, bg_ref,
                 inva2_ref, zp2_ref, osc2_ref, b2_ref, o_ref, *, asym):
    """W8A8 GEGLU FF with the same VMEM streaming as _kernel: the three
    matmuls run s8 x s8 -> s32 on the MXU (2x the bf16 rate on v5e) against
    statically-calibrated per-channel scales, and the (R, 4C) intermediates
    never exist in HBM. Per-matmul numerics are EXACTLY qdense_apply
    (ops/quant.py): quantize the (shifted) input per channel, integer
    matmul, f32 scale+bias epilogue (zero-point constants are pre-folded
    into the bias by quantize_dense), round to the input dtype where the
    unfused path materializes."""
    x = x_ref[...].astype(jnp.float32)  # (R, C)
    if asym:
        x = x - zp1_ref[0].astype(jnp.float32)
    xq = jnp.clip(jnp.round(x * inva1_ref[0]), -127.0, 127.0).astype(jnp.int8)
    h = jax.lax.dot_general(
        xq, w1h_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * osch_ref[0] + bh_ref[0]
    g = jax.lax.dot_general(
        xq, w1g_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * oscg_ref[0] + bg_ref[0]
    # round to the compute dtype where the unfused int8 path materializes
    # hidden/gate (qdense_apply returns x.dtype)
    h = h.astype(o_ref.dtype).astype(jnp.float32)
    g = g.astype(o_ref.dtype).astype(jnp.float32)
    a = h * (0.5 * g * (1.0 + _erf_f32(g * (2.0 ** -0.5))))
    a = a.astype(o_ref.dtype).astype(jnp.float32)
    if asym:
        a = a - zp2_ref[0].astype(jnp.float32)
    aq = jnp.clip(jnp.round(a * inva2_ref[0]), -127.0, 127.0).astype(jnp.int8)
    out = jax.lax.dot_general(
        aq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * osc2_ref[0] + b2_ref[0]
    o_ref[...] = out.astype(o_ref.dtype)


def _vec(v, dim, dtype=jnp.float32):
    if v is None:
        v = jnp.zeros((dim,), dtype)
    return jnp.asarray(v, dtype).reshape(1, dim)


def supported_int8(b: int, s: int, c: int) -> bool:
    """int8 variant policy: C=320 streams at row-block 512 like the bf16
    kernel; C=640 fits VMEM at row-block 256 (s8 weights are half the
    bf16 bytes, which is also why 640 is worth retrying here after losing
    in bf16). C=1280's 3x 6.5 MB weight blocks blow the VMEM budget."""
    if c == 320:
        return (b * s) % 512 == 0
    if c == 640:
        return (b * s) % 256 == 0
    return False


def fused_geglu_ff_int8(x: jax.Array, qh, qg, q2,
                        row_blk: int | None = None) -> jax.Array:
    """x: (B, S, C); qh/qg: QDense for the GEGLU hidden/gate column halves
    (din=C, dout=inner); q2: QDense for the down-projection (inner, C).
    Inference-only (the int8 path has no training story). Numerically
    equivalent to qdense_apply(qh/qg) -> gelu-mul -> qdense_apply(q2); see
    tests/test_ops.py. row_blk overrides the per-program row block (the
    VMEM high-water knob; scripts/stress_int8_ff.py sweeps it)."""
    bsz, s, c = x.shape
    inner = qh.w_int8.shape[1]
    rows = bsz * s
    rb = row_blk or (_ROW_BLK if c <= 320 else 256)
    asym = qh.zp is not None or q2.zp is not None

    out = pl.pallas_call(
        functools.partial(_kernel_int8, asym=asym),
        grid=(rows // rb,),
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
             for d in (c, c, inner, inner, inner, inner, inner, inner, c, c)],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
    )(
        x.reshape(rows, c),
        qh.w_int8, qg.w_int8, q2.w_int8,
        _vec(qh.inv_a, c), _vec(qh.zp, c),
        _vec(qh.o_scale, inner), _vec(qh.bias, inner),
        _vec(qg.o_scale, inner), _vec(qg.bias, inner),
        _vec(q2.inv_a, inner), _vec(q2.zp, inner),
        _vec(q2.o_scale, c), _vec(q2.bias, c),
    )
    return out.reshape(bsz, s, c)


@jax.jit
def _fused_geglu_fwd_impl(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array | None,
    w2: jax.Array,
    b2: jax.Array | None,
) -> jax.Array:
    bsz, s, c = x.shape
    inner = w1.shape[1] // 2
    rows = bsz * s
    rb = _ROW_BLK

    wh = w1[:, :inner].astype(x.dtype)
    wg = w1[:, inner:].astype(x.dtype)
    bh = (jnp.zeros((inner,), jnp.float32) if b1 is None
          else b1[:inner].astype(jnp.float32)).reshape(1, inner)
    bg = (jnp.zeros((inner,), jnp.float32) if b1 is None
          else b1[inner:].astype(jnp.float32)).reshape(1, inner)
    b2v = (jnp.zeros((c,), jnp.float32) if b2 is None
           else b2.astype(jnp.float32)).reshape(1, c)

    out = pl.pallas_call(
        _kernel,
        grid=(rows // rb,),
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # intermediates (2x fp32 (512, 1280) + weights) peak ~13 MB
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
    )(x.reshape(rows, c), wh, wg, bh, bg, w2.astype(x.dtype), b2v)
    return out.reshape(bsz, s, c)
