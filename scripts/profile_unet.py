"""UNet-phase micro-profile on the real TPU: flash-attention block-size
sweep at the hot (Sq=9216, d=64) shape, transformer blocks, UNet resblocks,
and the GEGLU feed-forward — to locate the UNet's MFU gap (measured ~39%
vs ~90% for the VAE convs).

Usage: timeout 590 python scripts/profile_unet.py [--batch 16] [--part X]
  parts: flash | blocks | ff | resblock | all
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


def marginal_time(fn, params, x, n_lo=2, n_hi=8):
    # the loop-carry perturbation below only touches inexact leaves; a tree
    # with none (e.g. an all-int qtree) would silently re-enable XLA's
    # loop-invariant hoisting and report a plausibly-fast wrong number
    assert any(jnp.issubdtype(t.dtype, jnp.inexact)
               for t in jax.tree.leaves(params)), (
        "marginal_time needs >=1 inexact leaf in params to defeat hoisting")

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(params, x, n):
        def body(i, carry):
            acc, p = carry
            out = fn(p, x)
            s = jnp.sum(out).astype(jnp.float32)
            # perturb only inexact leaves: int8 weight planes (QDense/QConv
            # trees) must keep their dtype or the loop carry type changes
            p = jax.tree.map(
                lambda t: t * (1.0 + s.astype(t.dtype) * 1e-30)
                if jnp.issubdtype(t.dtype, jnp.inexact) else t, p)
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


def flash_with_blocks(q_blk, k_blk):
    """Parameterized copy of _flash_bhsd (ops/flash_attention.py) for block
    tuning; (BH, S, D) in, out only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from genpercept_tpu.ops.flash_attention import _flash_kernel

    def fn(qh, kh, vh, scale):
        bh, sq, d = qh.shape
        sk = kh.shape[1]
        grid = (bh, sq // q_blk, sk // k_blk)
        kernel = functools.partial(_flash_kernel, scale=scale,
                                   fold_rowsum=d <= 128)
        out, _ = pl.pallas_call(
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
                pltpu.VMEM((q_blk, 1), jnp.float32),      # running max
                pltpu.VMEM((q_blk, d + 1), jnp.float32),  # acc | row sum
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(qh, kh, vh)
        return out

    return fn


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--part", default="all")
    args = ap.parse_args()
    b = args.batch

    from genpercept_tpu.models.layers import (
        feed_forward,
        init_feed_forward,
        init_resnet_block,
        init_transformer_block,
        resnet_block,
        transformer_block,
    )
    from genpercept_tpu.ops.attention import dot_product_attention

    bf = jnp.bfloat16

    if args.part in ("flash", "all"):
        # production entry point at the three UNet self-attn shapes
        for s, c, heads in ((9216, 320, 5), (2304, 640, 10), (576, 1280, 20)):
            d = 64
            q = jax.random.normal(jax.random.key(1), (b, s, heads, d), bf)
            fl = 4 * b * s * s * heads * d

            def attn(p, x):
                return dot_product_attention(x * p, x, x)

            dt = marginal_time(attn, jnp.ones((), bf), q)
            print(json.dumps({"op": f"flash_s{s}_h{heads}", "ms": round(dt * 1e3, 2),
                              "tflops": round(fl / dt / 1e12, 1)}))

    if args.part in ("blocks", "blocks2304", "all"):
        d = 64
        sweeps = {
            9216: ((1024, 1024), (1152, 1536), (2304, 768), (4608, 768),
                   (2304, 512), (4608, 512), (9216, 768), (3072, 768)),
            2304: ((768, 768), (1152, 1152), (2304, 2304), (2304, 1152),
                   (1152, 2304), (576, 2304), (768, 2304), (2304, 768)),
        }
        wanted = [2304] if args.part == "blocks2304" else (
            [9216] if args.part == "blocks" else [9216, 2304])
        for s in wanted:
            heads = 5 if s == 9216 else 10
            qh = jax.random.normal(jax.random.key(2), (b * heads, s, d), bf)
            for q_blk, k_blk in sweeps[s]:
                if s % q_blk or s % k_blk:
                    continue
                fn = flash_with_blocks(q_blk, k_blk)

                def attn(p, x):
                    return fn(x * p, x, x, d ** -0.5)

                try:
                    dt = marginal_time(attn, jnp.ones((), bf), qh)
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"op": f"blocks_s{s}_{q_blk}x{k_blk}",
                                      "error": str(e)[:80]}))
                    continue
                fl = 4 * b * heads * s * s * d
                print(json.dumps({"op": f"blocks_s{s}_{q_blk}x{k_blk}",
                                  "ms": round(dt * 1e3, 2),
                                  "tflops": round(fl / dt / 1e12, 1)}))

    if args.part == "blocks576":
        # level-2 shape: s=576, d=64, h=20 (currently served by XLA attn —
        # 1.49 ms; is one-block flash faster?)
        s, d, heads = 576, 64, 20
        qh = jax.random.normal(jax.random.key(2), (b * heads, s, d), bf)
        for q_blk, k_blk in ((576, 576), (288, 576), (192, 576)):
            if s % q_blk or s % k_blk:
                continue
            fn = flash_with_blocks(q_blk, k_blk)

            def attn(p, x):
                return fn(x * p, x, x, d ** -0.5)

            try:
                dt = marginal_time(attn, jnp.ones((), bf), qh)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"op": f"blocks576_{q_blk}x{k_blk}",
                                  "error": str(e)[:80]}))
                continue
            fl = 4 * b * heads * s * s * d
            print(json.dumps({"op": f"blocks576_{q_blk}x{k_blk}",
                              "ms": round(dt * 1e3, 2),
                              "tflops": round(fl / dt / 1e12, 1)}))

    if args.part == "blocks512":
        # VAE mid-block shape: one head of d=512, s=9216, BH=b
        s, d = 9216, 512
        qh = jax.random.normal(jax.random.key(2), (b, s, d), bf)
        for q_blk, k_blk in ((512, 1024), (512, 1536), (256, 1536),
                             (384, 1536), (768, 1536), (512, 2304),
                             (384, 2304), (256, 2304), (1024, 1024)):
            if s % q_blk or s % k_blk:
                continue
            fn = flash_with_blocks(q_blk, k_blk)

            def attn(p, x):
                return fn(x * p, x, x, d ** -0.5)

            try:
                dt = marginal_time(attn, jnp.ones((), bf), qh)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"op": f"blocks512_{q_blk}x{k_blk}",
                                  "error": str(e)[:80]}))
                continue
            fl = 4 * b * s * s * d
            print(json.dumps({"op": f"blocks512_{q_blk}x{k_blk}",
                              "ms": round(dt * 1e3, 2),
                              "tflops": round(fl / dt / 1e12, 1)}))

    if args.part in ("ff", "all"):
        for s, c in ((9216, 320), (2304, 640)):
            x = jax.random.normal(jax.random.key(3), (b, s, c), bf)
            p = jax.tree.map(lambda t: t.astype(bf),
                             init_feed_forward(jax.random.key(4), c))

            def ff(p, x):
                return feed_forward(p, x)

            dt = marginal_time(ff, p, x)
            fl = 2 * b * s * c * (8 * c) * 2 + 2 * b * s * (4 * c) * c
            print(json.dumps({"op": f"geglu_ff_s{s}_c{c}", "ms": round(dt * 1e3, 2),
                              "tflops": round(fl / dt / 1e12, 1)}))

    if args.part == "bf16softmax":
        # EXPERIMENT: is the VPU 2x on packed bf16 elementwise ops? The
        # d=64 flash kernel is VPU-bound on per-logit fp32 softmax work
        # (max-compare + FMA + exp2 + cast ~= the whole 22.6 ms); if bf16
        # halves that, the kernel drops toward the MXU floor. Numerics: raw
        # bf16 logits quantize at ~0.25% relative in p, same order as the
        # accepted bf16 p cast.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel_bf(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, *, scale):
            ki = pl.program_id(2)
            nk = pl.num_programs(2)

            @pl.when(ki == 0)
            def _init():
                m_ref[:] = jnp.full_like(m_ref, -1e30)
                acc_ref[:] = jnp.zeros_like(acc_ref)

            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
            c = jnp.bfloat16(scale * 1.4426950408889634)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)  # one cast, then bf16 elementwise chain
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2((s - m_new) * c)  # all bf16
            alpha = jnp.exp2(((m_prev - m_new) * c).astype(jnp.float32))
            m_ref[:] = m_new
            pv = jax.lax.dot_general(
                p, jnp.concatenate(
                    [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] = acc_ref[:] * alpha + pv

            @pl.when(ki == nk - 1)
            def _finish():
                l = acc_ref[:, -1:]
                o_ref[0] = (acc_ref[:, :-1] / l).astype(o_ref.dtype)

        def flash_bf(q_blk, k_blk):
            def fn(qh, kh, vh, scale):
                bh, sq, d = qh.shape
                sk = kh.shape[1]
                grid = (bh, sq // q_blk, sk // k_blk)
                return pl.pallas_call(
                    functools.partial(kernel_bf, scale=scale),
                    grid=grid,
                    in_specs=[
                        pl.BlockSpec((1, q_blk, d),
                                     lambda b_, qi, ki: (b_, qi, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, k_blk, d),
                                     lambda b_, qi, ki: (b_, ki, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, k_blk, d),
                                     lambda b_, qi, ki: (b_, ki, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, q_blk, d),
                                           lambda b_, qi, ki: (b_, qi, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((bh, sq, d), qh.dtype),
                    scratch_shapes=[
                        pltpu.VMEM((q_blk, 1), jnp.bfloat16),
                        pltpu.VMEM((q_blk, d + 1), jnp.float32),
                    ],
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel", "parallel",
                                             "arbitrary"),
                    ),
                )(qh, kh, vh)

            return fn

        s, d, heads = 9216, 64, 5
        qh = jax.random.normal(jax.random.key(2), (b * heads, s, d), bf)
        for q_blk, k_blk in ((2304, 1536), (4608, 1536), (3072, 1536),
                             (2304, 2304), (4608, 768), (2304, 768),
                             (9216, 768), (9216, 1536)):
            fn = flash_bf(q_blk, k_blk)

            def attn(p, x):
                return fn(x * p, x, x, d ** -0.5)

            try:
                dt = marginal_time(attn, jnp.ones((), bf), qh)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"op": f"bf16sm_{q_blk}x{k_blk}",
                                  "error": str(e)[:100]}))
                continue
            fl = 4 * b * heads * s * s * d
            print(json.dumps({"op": f"bf16sm_{q_blk}x{k_blk}",
                              "ms": round(dt * 1e3, 2),
                              "tflops": round(fl / dt / 1e12, 1)}))

    if args.part == "fusedff":
        # fused GEGLU kernel vs the split-matmul XLA path (true FLOP count:
        # 2*b*s*c*(8c) proj + 2*b*s*(4c)*c down = 0.36 TF at s=9216 c=320)
        from genpercept_tpu.ops.fused_ff import fused_geglu_ff

        for s, c in ((9216, 320), (2304, 640), (576, 1280)):
            x = jax.random.normal(jax.random.key(3), (b, s, c), bf)
            p = jax.tree.map(lambda t: t.astype(bf),
                             init_feed_forward(jax.random.key(4), c))
            w1 = p["net"]["0"]["proj"]["weight"]
            b1 = p["net"]["0"]["proj"].get("bias")
            w2 = p["net"]["2"]["weight"]
            b2 = p["net"]["2"].get("bias")
            fl = 2 * b * s * c * (8 * c) + 2 * b * s * (4 * c) * c

            def xla_ff(p, x):
                return feed_forward(p, x)

            def fff(p, x):
                return fused_geglu_ff(x, p["net"]["0"]["proj"]["weight"],
                                      p["net"]["0"]["proj"].get("bias"),
                                      p["net"]["2"]["weight"],
                                      p["net"]["2"].get("bias"))

            for name, fn in (("xla", xla_ff), ("fused", fff)):
                try:
                    dt = marginal_time(fn, p, x)
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"op": f"ff_{name}_s{s}_c{c}",
                                      "error": str(e)[:120]}))
                    continue
                print(json.dumps({"op": f"ff_{name}_s{s}_c{c}",
                                  "ms": round(dt * 1e3, 2),
                                  "tflops": round(fl / dt / 1e12, 1)}))

    if args.part == "int8ff":
        # W8A8 fused GEGLU (one s8 Pallas program, VMEM intermediates) vs
        # the bf16 fused kernel vs the XLA split path (VERDICT r3 #4)
        from genpercept_tpu.ops.fused_ff import (fused_geglu_ff,
                                                 fused_geglu_ff_int8)
        from genpercept_tpu.ops.quant import absmax_per_channel, quantize_dense

        for s, c in ((9216, 320), (2304, 640)):
            x = jax.random.normal(jax.random.key(3), (b, s, c), bf)
            p = jax.tree.map(lambda t: t.astype(bf),
                             init_feed_forward(jax.random.key(4), c))
            w1 = p["net"]["0"]["proj"]["weight"]
            b1 = p["net"]["0"]["proj"]["bias"]
            inner = w1.shape[1] // 2
            qh = quantize_dense({"weight": w1[:, :inner], "bias": b1[:inner]},
                                absmax_per_channel(x))
            qg = quantize_dense({"weight": w1[:, inner:], "bias": b1[inner:]},
                                absmax_per_channel(x))
            from genpercept_tpu.ops.quant import qdense_apply
            a = (qdense_apply(qh, x)
                 * jax.nn.gelu(qdense_apply(qg, x), approximate=False))
            q2 = quantize_dense(p["net"]["2"], absmax_per_channel(a))
            qtree = {"qh": qh, "qg": qg, "q2": q2}
            fl = 2 * b * s * c * (8 * c) + 2 * b * s * (4 * c) * c

            def int8ff(qt, x):
                return fused_geglu_ff_int8(x, qt["qh"], qt["qg"], qt["q2"])

            def bf16ff(pp, x):
                return fused_geglu_ff(x, pp["net"]["0"]["proj"]["weight"],
                                      pp["net"]["0"]["proj"].get("bias"),
                                      pp["net"]["2"]["weight"],
                                      pp["net"]["2"].get("bias"))

            def xlaff(pp, x):
                return feed_forward(pp, x)

            # each fn must CONSUME the carried tree (marginal_time perturbs
            # it per iteration) — closing over the weights instead hoists
            # the loop body and times nothing
            for name, fn, tree in (("int8", int8ff, qtree),
                                   ("bf16fused", bf16ff, p),
                                   ("xla", xlaff, p)):
                try:
                    dt = marginal_time(fn, tree, x)
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"op": f"int8ff_{name}_s{s}_c{c}",
                                      "error": str(e)[:120]}))
                    continue
                print(json.dumps({"op": f"int8ff_{name}_s{s}_c{c}",
                                  "ms": round(dt * 1e3, 2),
                                  "tflops": round(fl / dt / 1e12, 1)}))

    if args.part == "int8flash":
        # s8 QK^T/PV flash at the UNet d=64 shapes vs the bf16 kernel —
        # expectation (flash_attention.py docstring): VPU-bound per-logit
        # softmax work dominates at d=64, so the s8 matmul rate doesn't pay
        from genpercept_tpu.ops.flash_attention import (flash_attention,
                                                        flash_attention_int8)

        for s, heads in ((9216, 5), (2304, 10)):
            d = 64
            q = jax.random.normal(jax.random.key(1), (b, s, heads, d), bf)
            fl = 4 * b * s * s * heads * d

            def attn8(p, x):
                return flash_attention_int8(x * p, x, x)

            def attnbf(p, x):
                return flash_attention(x * p, x, x)

            for name, fn in (("int8", attn8), ("bf16", attnbf)):
                try:
                    dt = marginal_time(fn, jnp.ones((), bf), q)
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"op": f"int8flash_{name}_s{s}_h{heads}",
                                      "error": str(e)[:120]}))
                    continue
                print(json.dumps({"op": f"int8flash_{name}_s{s}_h{heads}",
                                  "ms": round(dt * 1e3, 2),
                                  "tflops": round(fl / dt / 1e12, 1)}))

    if args.part in ("resblock", "all"):
        for hw, c in ((96, 320), (48, 640), (24, 1280), (12, 1280)):
            x = jax.random.normal(jax.random.key(5), (b, hw, hw, c), bf)
            p = jax.tree.map(lambda t: t.astype(bf),
                             init_resnet_block(jax.random.key(6), c, c, 1280))
            temb = jax.random.normal(jax.random.key(7), (b, 1280), bf)

            def blk(p, x):
                return resnet_block(p, x, temb, eps=1e-5)

            dt = marginal_time(blk, p, x)
            fl = 2 * 2 * 9 * b * hw * hw * c * c
            print(json.dumps({"op": f"unet_resblock_{hw}@{c}",
                              "ms": round(dt * 1e3, 2),
                              "tflops": round(fl / dt / 1e12, 1)}))

    if args.part in ("stransformer", "all"):
        # full Transformer2D wrapper on an NHWC conv-layout input, composed
        # with a resblock (the real level-0 unit) — quantifies reshape /
        # layout-copy glue vs the sum of isolated parts
        from genpercept_tpu.models.layers import (
            init_spatial_transformer,
            spatial_transformer,
        )

        for hw, c, heads in ((96, 320, 5), (48, 640, 10)):
            x = jax.random.normal(jax.random.key(11), (b, hw, hw, c), bf)
            ctx = jax.random.normal(jax.random.key(9), (b, 77, 1024), bf)
            ps = jax.tree.map(
                lambda t: t.astype(bf),
                init_spatial_transformer(jax.random.key(12), c, heads, 1024),
            )
            pr = jax.tree.map(lambda t: t.astype(bf),
                              init_resnet_block(jax.random.key(13), c, c, 1280))
            temb = jax.random.normal(jax.random.key(7), (b, 1280), bf)

            def unit(p, x):
                h = resnet_block(p["r"], x, temb, eps=1e-5)
                return spatial_transformer(p["s"], h, ctx, heads)

            dt = marginal_time(unit, {"r": pr, "s": ps}, x)
            print(json.dumps({"op": f"res+stransformer_{hw}@{c}",
                              "ms": round(dt * 1e3, 2)}))

    if args.part in ("tblock", "all"):
        for s, c, heads in ((9216, 320, 5), (2304, 640, 10)):
            x = jax.random.normal(jax.random.key(8), (b, s, c), bf)
            ctx = jax.random.normal(jax.random.key(9), (b, 77, 1024), bf)
            p = jax.tree.map(
                lambda t: t.astype(bf),
                init_transformer_block(jax.random.key(10), c, heads, 1024),
            )

            def tb(p, x):
                return transformer_block(p, x, ctx, heads)

            dt = marginal_time(tb, p, x)
            fl = (4 * b * s * s * heads * 64          # self-attn
                  + 8 * b * s * c * c                 # qkvo self
                  + 2 * b * s * c * (8 * c) + 2 * b * s * (4 * c) * c  # ff
                  + 4 * b * 77 * c * 1024 + 4 * b * s * 77 * c)  # cross approx
            print(json.dumps({"op": f"tblock_s{s}_c{c}", "ms": round(dt * 1e3, 2),
                              "tflops": round(fl / dt / 1e12, 1)}))


if __name__ == "__main__":
    main()
