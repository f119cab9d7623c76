"""Pallas TPU flash attention (non-causal) for UNet and VAE attention.

Replaces xformers memory-efficient attention (reference `run.py:383`,
`genpercept_trainer.py:235`). Online-softmax with K/V streamed block-by-block
through VMEM on a (batch*heads, q_blocks, k_blocks) grid — the (Sq x Sk)
logits matrix never exists in HBM. Running max / denominator / accumulator
live in VMEM scratch, persistent across the innermost ("arbitrary") k grid
dimension.

Covers both hot attention shapes of the GenPercept stack at 768^2 input:
  - UNet self-attention: Sq=Sk in {9216, 2304, 576}, head_dim 64
  - VAE mid-block attention: Sq=Sk=9216, ONE head of dim 512 (the XLA
    fallback materializes ~340 MB of logits per image here — this kernel is
    what makes the VAE encoder/decoder fast)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634


def _pick_block(s: int, cap: int,
                candidates=(1536, 1152, 1024, 768, 576, 512, 384, 256, 128,
                            64)) -> int | None:
    for b in candidates:
        if b <= cap and s % b == 0:
            return b
    return None


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, acc_ref,
                  *, scale, fold_rowsum, kv_valid=None):
    """Online-softmax step, tuned for the VPU-bound d=64 regime: the
    elementwise work on the (q_blk, k_blk) logits tile dominates the two
    64-deep MXU matmuls, so every per-logit op counts. Three cuts vs the
    textbook form:
      - base-2 softmax as one FMA + exp2 per logit: p = exp2(s*c - m*c) with
        c = scale*log2e (exp lowers to exp2+mul anyway); the running max m
        is tracked on RAW logits so no per-logit scale multiply exists;
      - for small d (fold_rowsum=True) the row sum l rides the p@v matmul as
        an appended ones-column: d=64 already pads the MXU lane dim to 128,
        so the extra column is free, and the separate VPU row-sum
        disappears. At d=512 the extra column forces a fifth 128-lane output
        tile (+25% pv cost), so there the sum is a VPU reduce instead;
      - l lives inside the accumulator, so one alpha rescale covers both.
    lse is returned in BASE-2 units of the SCALED logits (m*c + log2 l);
    the backward kernels consume it with exp2."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Matmul operands stay in the input dtype (bf16 in production; the MXU
    # accumulates fp32). Softmax math stays fp32.
    q = q_ref[0]  # (q_blk, d)
    k = k_ref[0]  # (k_blk, d)
    v = v_ref[0]
    c = scale * _LOG2E

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (q_blk, k_blk) fp32, raw logits
    if kv_valid is not None:
        # cross-attention over padded KV (e.g. 77 text tokens padded to
        # 128): kill the pad columns before the online softmax
        col = ki * k_ref.shape[1] + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = jnp.where(col < kv_valid, s, _NEG_INF)
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s * c - m_new * c).astype(v.dtype)  # FMA + exp2 per logit
    alpha = jnp.exp2((m_prev - m_new) * c)
    m_ref[:] = m_new
    if fold_rowsum:
        pv = jax.lax.dot_general(
            p, jnp.concatenate([v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (q_blk, d+1): weighted values | row sum
        acc_ref[:] = acc_ref[:] * alpha + pv
    else:
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (q_blk, d) — exactly d/128 output tiles, no ones-column
        acc_ref[:, :-1] = acc_ref[:, :-1] * alpha + pv
        acc_ref[:, -1:] = acc_ref[:, -1:] * alpha + jnp.sum(
            p.astype(jnp.float32), axis=-1, keepdims=True
        )

    @pl.when(ki == nk - 1)
    def _finish():
        l = acc_ref[:, -1:]
        o_ref[0] = (acc_ref[:, :-1] / l).astype(o_ref.dtype)
        lse_ref[0] = m_ref[:] * c + jnp.log2(l)


def _blocks(sq: int, sk: int, d: int):
    # VMEM budget: q + out + 2*(k,v) blocks + fp32 acc + logits; caps keep
    # the working set under ~8 MB with double buffering. At d=64 the kernel
    # is VPU-bound on the per-logit softmax work (the two 64-deep matmuls
    # are ~1.4 us/block vs ~2.5 us of VPU time at 1024x1024), so block
    # choice mainly trades grid overhead vs VMEM; (1024, 1024) measured
    # fastest at the 9216-token shape on v5e. At d=512 (VAE mid), swept
    # best is (512, 1024) with the separate VPU row-sum: 16.3 ms / 170
    # TFLOP/s vs 22.4 ms for the old (256, 512)+ones-column config.
    if d <= 128:
        # v5e-swept at the UNet shapes (scripts/profile_unet.py --part
        # blocks): s=9216 h5 — (1152, 1536) 22.2 ms vs (1024, 1024) 23.8;
        # s=2304 h10 — k=2304 (a single k step drops the online-softmax
        # rescale chain entirely) with q=768: 3.1 ms vs (768, 768) 4.35.
        # q=1152 at k=2304 measured faster standalone (2.96) but its
        # 16.4 MB scoped-VMEM footprint fails to compile inside larger
        # programs; (1536, 1536) collapses to 25 TF/s.
        if sk == 2304:
            return _pick_block(sq, 768), sk
        return _pick_block(sq, 1152), _pick_block(sk, 1536)
    # d=512 (VAE mid): (512, 1536) swept best (16.6 ms vs 30 for (512,1024)
    # in the same run; scripts/profile_unet.py --part blocks512); larger q
    # blocks at k>=1536 fail the 16 MB scoped-VMEM compile
    return _pick_block(sq, 512), _pick_block(sk, 1536)


@functools.partial(jax.jit, static_argnames=("scale", "kv_valid"))
def _flash_bhsd(qh: jax.Array, kh: jax.Array, vh: jax.Array, scale: float,
                kv_valid: int | None = None):
    """qh: (BH, Sq, D); kh/vh: (BH, Sk, D) -> (out, lse2) with lse2 the
    BASE-2 logsumexp of the natural-units logits (see _flash_kernel).
    kv_valid: only the first kv_valid KV rows are real (rest is padding)."""
    bh, sq, d = qh.shape
    sk = kh.shape[1]
    q_blk, k_blk = _blocks(sq, sk, d)
    grid = (bh, sq // q_blk, sk // k_blk)
    kernel = functools.partial(_flash_kernel, scale=scale,
                               fold_rowsum=d <= 128, kv_valid=kv_valid)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_blk, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_blk, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_blk, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, q_blk, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_blk, 1), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq, d), qh.dtype),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((q_blk, 1), jnp.float32),      # running max (base-2)
            pltpu.VMEM((q_blk, d + 1), jnp.float32),  # acc | row sum
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qh, kh, vh)


# ------------------------------------------------- int8 forward (d=512)

def _flash_int8_kernel(q_ref, k_ref, v_ref, qs_ref, ks_ref, vs_ref,
                       o_ref, m_ref, acc_ref, *, scale):
    """Online-softmax step with s8 matmuls (inference-only; used for the
    VAE mid-block d=512 single-head attention where the two 512-deep
    matmuls dominate and the v5e MXU runs s8 x s8 -> s32 at ~2x bf16).

    Operands arrive pre-quantized (see flash_attention_int8): q/k symmetric
    per-ROW int8 with fp32 row scales qs/ks, v per-COLUMN int8 with scales
    vs. Logits are rebuilt exactly as s32 * qs[i] * ks[j] (one FMA per
    logit, same per-logit cost as the bf16 kernel's scale fold). The
    softmax probabilities are quantized to int8 with the fixed scale 127
    (p in [0,1]); the SAME quantized p feeds both the PV matmul and the row
    sum, so the normalization stays self-consistent."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]          # (q_blk, d) int8
    k = k_ref[0]          # (k_blk, d) int8
    v = v_ref[0]          # (k_blk, d) int8
    qs = qs_ref[0]        # (q_blk, 1) f32
    ks = ks_ref[0][:, 0]  # (k_blk,) f32
    c = scale * _LOG2E

    s32 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    s = s32.astype(jnp.float32) * (qs * ks[None, :])  # (q_blk, k_blk) logits
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s * c - m_new * c)
    pq = jnp.round(p * 127.0).astype(jnp.int8)  # p in [0,1] -> scale 1/127
    alpha = jnp.exp2((m_prev - m_new) * c)
    m_ref[:] = m_new
    pv = jax.lax.dot_general(
        pq, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)  # missing vs[j]/127^2; applied at finish (vs is
    # constant across k blocks, so it commutes with the accumulation)
    acc_ref[:, :-1] = acc_ref[:, :-1] * alpha + pv
    acc_ref[:, -1:] = acc_ref[:, -1:] * alpha + jnp.sum(
        pq.astype(jnp.float32), axis=-1, keepdims=True)

    @pl.when(ki == nk - 1)
    def _finish():
        vs = vs_ref[0][0]  # (d,) f32 per-column v scales
        l = acc_ref[:, -1:]  # sum of quantized p (scale 1/127 cancels)
        o_ref[0] = (acc_ref[:, :-1] * vs[None, :] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_int8_bhsd(qh, kh, vh, scale: float):
    """qh/kh/vh: (BH, S, D) float -> (BH, S, D) attention output with s8
    QK^T and PV. Quantization of the operands happens here in XLA (fusing
    into whatever produced them; the kernel then reads HALF the HBM bytes
    of the bf16 version)."""
    bh, sq, d = qh.shape
    sk = kh.shape[1]

    def rowq(x):
        a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        s = jnp.maximum(a, 1e-8) / 127.0
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                        -127, 127).astype(jnp.int8), s

    q8, qs = rowq(qh)
    k8, ks = rowq(kh)
    va = jnp.max(jnp.abs(vh.astype(jnp.float32)), axis=1, keepdims=True)
    vsc = jnp.maximum(va, 1e-8) / 127.0  # (BH, 1, D)
    v8 = jnp.clip(jnp.round(vh.astype(jnp.float32) / vsc),
                  -127, 127).astype(jnp.int8)

    q_blk, k_blk = _blocks(sq, sk, d)
    grid = (bh, sq // q_blk, sk // k_blk)
    out = pl.pallas_call(
        functools.partial(_flash_int8_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_blk, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_blk, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_blk, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_blk, 1), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_blk, 1), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, qi, ki: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_blk, d), lambda b, qi, ki: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), qh.dtype),
        scratch_shapes=[
            pltpu.VMEM((q_blk, 1), jnp.float32),
            pltpu.VMEM((q_blk, d + 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q8, k8, v8, qs, ks, vsc)
    return out


def flash_attention_int8(q: jax.Array, k: jax.Array, v: jax.Array,
                         scale: float | None = None) -> jax.Array:
    """Inference-only int8 flash attention, (B, S, H, D) API like
    flash_attention. Worth it ONLY where the matmuls dominate the kernel —
    the d=512 VAE mid-block (512-deep MXU contractions); at the UNet's
    d=64 the kernel is VPU-bound on per-logit softmax work and the extra
    quantize/round per logit makes it SLOWER — measured on v5e
    (scripts/profile_unet.py --part int8flash, batch 16, 2026-08-20):
    s=9216 h=5: 32.8 ms int8 vs 21.6 ms bf16; s=2304 h=10: 6.3 vs 4.1 ms.
    The bf16 kernel stays the UNet path."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    sk = k.shape[1]
    out = _flash_int8_bhsd(
        _to_bhsd(q, b, sq, h, d), _to_bhsd(k, b, sk, h, d),
        _to_bhsd(v, b, sk, h, d), scale,
    )
    return _from_bhsd(out, b, sq, h, d)


# ------------------------------------------------------------- backward

def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                         dq_ref, acc_ref, *, scale, kv_valid=None):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # bf16 matmul operands, fp32 accumulation/softmath; lse2 is in base-2
    # units of the scaled logits (see _flash_kernel)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0][:, 0]  # (q_blk,)
    dsum = dsum_ref[0][:, 0]
    c = scale * _LOG2E

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp2(s * c - lse2[:, None])
    if kv_valid is not None:
        # zero-padded K gives s=0 -> p=exp2(-lse) != 0 on pad columns;
        # mask so ds (hence dq) ignores them. The dk/dv kernel needs no
        # mask: its pad-row outputs are finite garbage sliced off by the
        # caller.
        col = ki * k_ref.shape[1] + jax.lax.broadcasted_iota(
            jnp.int32, p.shape, 1
        )
        p = jnp.where(col < kv_valid, p, 0.0)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - dsum[:, None]) * scale).astype(k.dtype)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, scale):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    # bf16 matmul operands, fp32 accumulation/softmath; lse2 in base-2 units
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0][:, 0]
    dsum = dsum_ref[0][:, 0]
    c = scale * _LOG2E

    # (k_blk, q_blk) transposed score block
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    pt = jnp.exp2(st * c - lse2[None, :])
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dst = (pt * (dpt - dsum[None, :]) * scale).astype(q.dtype)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _blocks_bwd(sq: int, sk: int, d: int):
    # The backward kernels hold more live VMEM per grid step than the
    # forward (dk+dv fp32 accumulators + both operand streams), and in
    # training they can run on fp32 operands: the forward's tuned
    # (512, 1024) blocks at d=512 blow the 16 MB scoped-vmem budget there
    # (measured: 20 MB for the dkv kernel). Keep the smaller, known-safe
    # caps on the backward path — it is off the inference hot path.
    q_cap = 512 if d <= 128 else 256
    k_cap = 1024 if d <= 128 else 512
    return _pick_block(sq, q_cap), _pick_block(sk, k_cap)


@functools.partial(jax.jit, static_argnames=("scale", "kv_valid"))
def _flash_bwd_bhsd(qh, kh, vh, oh, do, lse, scale: float,
                    kv_valid: int | None = None):
    bh, sq, d = qh.shape
    sk = kh.shape[1]
    q_blk, k_blk = _blocks_bwd(sq, sk, d)
    dsum = jnp.sum(do.astype(jnp.float32) * oh.astype(jnp.float32), axis=-1,
                   keepdims=True)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale,
                          kv_valid=kv_valid),
        grid=(bh, sq // q_blk, sk // k_blk),
        in_specs=[
            pl.BlockSpec((1, q_blk, d), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_blk, d), lambda b, qi, ki: (b, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_blk, d), lambda b, qi, ki: (b, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_blk, d), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_blk, 1), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_blk, 1), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_blk, d), lambda b, qi, ki: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), qh.dtype),
        scratch_shapes=[pltpu.VMEM((q_blk, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qh, kh, vh, do, lse, dsum)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(bh, sk // k_blk, sq // q_blk),
        in_specs=[
            pl.BlockSpec((1, q_blk, d), lambda b, ki, qi: (b, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_blk, d), lambda b, ki, qi: (b, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_blk, d), lambda b, ki, qi: (b, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_blk, d), lambda b, ki, qi: (b, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_blk, 1), lambda b, ki, qi: (b, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_blk, 1), lambda b, ki, qi: (b, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k_blk, d), lambda b, ki, qi: (b, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_blk, d), lambda b, ki, qi: (b, ki, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sk, d), kh.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), vh.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((k_blk, d), jnp.float32),
            pltpu.VMEM((k_blk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qh, kh, vh, do, lse, dsum)
    return dq, dk, dv


def supported(sq: int, sk: int, d: int) -> bool:
    """True if flash_attention handles (sq, sk, d) — directly when a block
    divides the raw KV length (e.g. sk=576 -> one 576 k block), else by
    padding short KV up to the 128 tile."""
    if d not in (64, 128, 256, 512):
        return False
    q_blk, k_blk = _blocks(sq, sk, d)
    if k_blk is None:
        q_blk, k_blk = _blocks(sq, max(128, -(-sk // 128) * 128), d)
    return q_blk is not None and k_blk is not None


def _to_bhsd(x, b, s, h, d):
    if h == 1:
        return x.reshape(b, s, d)
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from_bhsd(x, b, s, h, d):
    if h == 1:
        return x.reshape(b, s, 1, d)
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _flash_fwd_impl(q, k, v, scale: float, kv_valid: int | None):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    out, lse = _flash_bhsd(
        _to_bhsd(q, b, sq, h, d), _to_bhsd(k, b, sk, h, d),
        _to_bhsd(v, b, sk, h, d), scale, kv_valid,
    )
    return _from_bhsd(out, b, sq, h, d), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_diff(q, k, v, scale: float, kv_valid: int | None):
    return _flash_fwd_impl(q, k, v, scale, kv_valid)[0]


def _flash_diff_fwd(q, k, v, scale, kv_valid):
    out, lse = _flash_fwd_impl(q, k, v, scale, kv_valid)
    return out, (q, k, v, out, lse)


def _flash_diff_bwd(scale, kv_valid, res, g):
    """Flash backward as two Pallas passes (dq; dk+dv), using the saved
    logsumexp — the (Sq x Sk) probability matrix never materializes in HBM
    in either direction."""
    q, k, v, out, lse = res
    b, sq, h, d = q.shape
    sk = k.shape[1]
    dq, dk, dv = _flash_bwd_bhsd(
        _to_bhsd(q, b, sq, h, d), _to_bhsd(k, b, sk, h, d),
        _to_bhsd(v, b, sk, h, d), _to_bhsd(out, b, sq, h, d),
        _to_bhsd(g, b, sq, h, d), lse, scale, kv_valid,
    )
    return (
        _from_bhsd(dq, b, sq, h, d),
        _from_bhsd(dk, b, sk, h, d),
        _from_bhsd(dv, b, sk, h, d),
    )


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None
) -> jax.Array:
    """q: (B, Sq, H, D), k/v: (B, Sk, H, D) -> (B, Sq, H, D). Differentiable
    (flash forward; flash backward with saved logsumexp).

    Short KV (cross-attention over 77 text tokens) is zero-padded to the
    128-lane tile and masked inside the kernel with a static kv_valid, so
    the (Sq x Sk) probability tensor never hits HBM in either direction
    (reference relies on xformers for this, genpercept_trainer.py:235)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    sk = k.shape[1]
    kv_valid = None
    if _blocks(sq, sk, d)[1] is None:
        sk_pad = max(128, -(-sk // 128) * 128)
        if _blocks(sq, sk_pad, d)[1] is not None:
            pad = [(0, 0), (0, sk_pad - sk), (0, 0), (0, 0)]
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
            kv_valid, sk = sk, sk_pad
    if not supported(sq, sk, d):
        raise ValueError(f"flash_attention unsupported shape {(sq, sk, d)}")
    out = _flash_diff(q, k, v, scale, kv_valid)
    return out
