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


def _pick_block(s: int, cap: int, candidates=(1024, 768, 512, 384, 256, 128, 64)) -> int | None:
    for b in candidates:
        if b <= cap and s % b == 0:
            return b
    return None


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * scale  # (q_blk, d)
    k = k_ref[0].astype(jnp.float32)  # (k_blk, d)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (q_blk, k_blk)
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_ref[:] = m_new
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p, v, preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_bhsd(qh: jax.Array, kh: jax.Array, vh: jax.Array, scale: float):
    """qh: (BH, Sq, D); kh/vh: (BH, Sk, D)."""
    bh, sq, d = qh.shape
    sk = kh.shape[1]
    # VMEM budget: q + out + 2*(k,v) blocks + fp32 acc + logits; cap blocks
    # so the working set stays well under ~8 MB with double buffering.
    q_cap = 512 if d <= 128 else 256
    k_cap = 1024 if d <= 128 else 512
    q_blk = _pick_block(sq, q_cap)
    k_blk = _pick_block(sk, k_cap)
    grid = (bh, sq // q_blk, sk // k_blk)
    kernel = functools.partial(_flash_kernel, scale=scale)
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
        out_specs=pl.BlockSpec((1, q_blk, d), lambda b, qi, ki: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), qh.dtype),
        scratch_shapes=[
            pltpu.VMEM((q_blk, 1), jnp.float32),  # running max
            pltpu.VMEM((q_blk, 1), jnp.float32),  # running denominator
            pltpu.VMEM((q_blk, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qh, kh, vh)


def supported(sq: int, sk: int, d: int) -> bool:
    q_cap = 512 if d <= 128 else 256
    k_cap = 1024 if d <= 128 else 512
    return (
        _pick_block(sq, q_cap) is not None
        and _pick_block(sk, k_cap) is not None
        and d in (64, 128, 256, 512)
    )


def _flash_fwd_impl(q, k, v, scale: float):
    b, sq, h, d = q.shape
    sk = k.shape[1]

    def to_bhsd(x, s):
        if h == 1:
            return x.reshape(b, s, d)
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    out = _flash_bhsd(to_bhsd(q, sq), to_bhsd(k, sk), to_bhsd(v, sk), scale)
    if h == 1:
        return out.reshape(b, sq, 1, d)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, scale: float):
    return _flash_fwd_impl(q, k, v, scale)


def _flash_diff_fwd(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale), (q, k, v)


def _flash_diff_bwd(scale, res, g):
    """Backward via XLA recompute: correct gradients, dense logits in the
    backward pass only (training at <=4800 tokens fits; the kernel's memory
    win matters for the inference-heavy 9216-token path). A dedicated
    Pallas backward kernel can replace this transparently later."""
    from genpercept_tpu.ops.attention import _xla_attention

    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v)
    return vjp(g)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None
) -> jax.Array:
    """q: (B, Sq, H, D), k/v: (B, Sk, H, D) -> (B, Sq, H, D). Differentiable
    (flash forward; recomputed dense backward)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if not supported(sq, sk, d):
        raise ValueError(f"flash_attention unsupported shape {(sq, sk, d)}")
    return _flash_diff(q, k, v, scale)
