"""Pallas TPU flash attention (non-causal, no mask) for UNet/VAE self-attention.

Replaces xformers memory-efficient attention (reference `run.py:383`,
`genpercept_trainer.py:235`). Online-softmax over K/V blocks: the full
(Sq x Sk) logits matrix never materializes in VMEM/HBM. At 768^2 input the
UNet's first-stage self-attention runs at Sq=Sk=9216, head_dim 64 — the
dominant attention cost this kernel targets.

Grid: (batch*heads, Sq/q_block). K/V for one (batch, head) are staged into
VMEM in full (<= 2.25 MB each at 9216x64 fp32) and consumed in k_block
slices by an online-softmax fori_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pick_block(s: int, candidates=(512, 384, 256, 128, 64)) -> int | None:
    for b in candidates:
        if s % b == 0:
            return b
    return None


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, k_blk: int):
    q = q_ref[0].astype(jnp.float32) * scale  # (q_blk, D)
    q_blk, d = q.shape
    s_k = k_ref.shape[1]
    num_kb = s_k // k_blk

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * k_blk, k_blk), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * k_blk, k_blk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (q_blk, k_blk)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((q_blk, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((q_blk, 1), jnp.float32)
    acc0 = jnp.zeros((q_blk, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_bhsd(qh: jax.Array, kh: jax.Array, vh: jax.Array, scale: float):
    """qh/kh/vh: (BH, S, D)."""
    bh, sq, d = qh.shape
    sk = kh.shape[1]
    q_blk = _pick_block(sq)
    k_blk = _pick_block(sk)
    grid = (bh, sq // q_blk)
    kernel = functools.partial(_flash_kernel, scale=scale, k_blk=k_blk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_blk, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, q_blk, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), qh.dtype),
    )(qh, kh, vh)


def supported(sq: int, sk: int, d: int) -> bool:
    return (
        _pick_block(sq) is not None
        and _pick_block(sk) is not None
        and d in (64, 128)
    )


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None
) -> jax.Array:
    """q: (B, Sq, H, D), k/v: (B, Sk, H, D) -> (B, Sq, H, D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if not supported(sq, sk, d):
        raise ValueError(f"flash_attention unsupported shape {(sq, sk, d)}")

    def to_bhsd(x, s):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    out = _flash_bhsd(to_bhsd(q, sq), to_bhsd(k, sk), to_bhsd(v, sk), scale)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
