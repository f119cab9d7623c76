"""Profile the VAE mid attention (1 head, d=512, s=9216) and the UNet
spatial-transformer boundary (GN + linear proj_in/out + reshape) on the real
TPU — looking for layout copies and sub-peak matmuls around the flash kernel.

Usage: timeout 590 python scripts/profile_attn_boundary.py [--part X]
  parts: vae | flash512 | stransformer | dense | all
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


def marginal_time_chain(fn, params, x, n_lo=2, n_hi=8):
    """Like marginal_time, but chains the (same-shaped) output back as the
    next input — a loop-carried dependency on X itself, with no extra
    perturbation pass. Required for x-only memory-bound ops (GroupNorm),
    where perturbing only the params lets XLA hoist the x passes."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(params, x, n):
        def body(i, xx):
            return fn(params, xx).astype(xx.dtype)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    float(run_n(params, x, n_lo))
    float(run_n(params, x, n_hi))
    t0 = time.perf_counter()
    float(run_n(params, x, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_n(params, x, n_hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--part", default="all")
    args = ap.parse_args()
    b = args.batch
    bf = jnp.bfloat16

    from genpercept_tpu.models.layers import (
        init_spatial_transformer,
        init_vae_attention,
        spatial_transformer,
        vae_attention,
    )
    from genpercept_tpu.ops.flash_attention import _flash_bhsd

    if args.part in ("vae", "all"):
        # full VAE mid attention at 96^2 @ 512 (encoder+decoder each run one)
        x = jax.random.normal(jax.random.key(0), (b, 96, 96, 512), bf)
        p = jax.tree.map(lambda t: t.astype(bf),
                         init_vae_attention(jax.random.key(1), 512))
        dt = marginal_time(lambda p, x: vae_attention(p, x), p, x)
        fl = 4 * b * 9216 * 9216 * 512 + 4 * 2 * b * 9216 * 512 * 512
        print(json.dumps({"op": "vae_attention_96@512", "ms": round(dt * 1e3, 2),
                          "tflops": round(fl / dt / 1e12, 1)}))

    if args.part in ("flash512", "all"):
        # bare flash kernel at the VAE shape (BH=b, S=9216, D=512)
        qh = jax.random.normal(jax.random.key(2), (b, 9216, 512), bf)

        def attn(p, x):
            return _flash_bhsd(x * p, x, x, 512 ** -0.5)[0]

        dt = marginal_time(attn, jnp.ones((), bf), qh)
        fl = 4 * b * 9216 * 9216 * 512
        print(json.dumps({"op": "flash_bare_s9216_d512", "ms": round(dt * 1e3, 2),
                          "tflops": round(fl / dt / 1e12, 1)}))

    if args.part in ("stransformer", "all"):
        # full spatial transformer (GN + proj_in/out + 1 tblock + reshape)
        # vs the tblock alone (33.7 ms measured) -> boundary cost
        for hw, c, heads, depth in ((96, 320, 5, 1), (48, 640, 10, 1)):
            x = jax.random.normal(jax.random.key(3), (b, hw, hw, c), bf)
            ctx = jax.random.normal(jax.random.key(4), (b, 77, 1024), bf)
            p = jax.tree.map(
                lambda t: t.astype(bf),
                init_spatial_transformer(jax.random.key(5), c, heads, 1024,
                                         depth),
            )

            def st(p, x):
                return spatial_transformer(p, x, ctx, heads)

            dt = marginal_time(st, p, x)
            s = hw * hw
            fl = (4 * b * s * s * heads * 64 + 8 * b * s * c * c
                  + 2 * b * s * c * (8 * c) + 2 * b * s * (4 * c) * c
                  + 4 * b * 77 * c * 1024 + 4 * b * s * 77 * c
                  + 2 * 2 * b * s * c * c)  # proj_in/out
            print(json.dumps({"op": f"spatial_transformer_{hw}@{c}",
                              "ms": round(dt * 1e3, 2),
                              "tflops": round(fl / dt / 1e12, 1)}))

    if args.part in ("sweep512",):
        # block-size sweep for the d=512 VAE shape, both rowsum modes
        import functools as ft

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from genpercept_tpu.ops.flash_attention import _flash_kernel

        qh = jax.random.normal(jax.random.key(2), (b, 9216, 512), bf)
        d = 512

        def build(q_blk, k_blk, fold):
            kernel = ft.partial(_flash_kernel, scale=d ** -0.5,
                                fold_rowsum=fold)

            def fn(p, x):
                bh, sq, _ = x.shape
                out, _ = pl.pallas_call(
                    kernel,
                    grid=(bh, sq // q_blk, sq // k_blk),
                    in_specs=[
                        pl.BlockSpec((1, q_blk, d), lambda bb, qi, ki: (bb, qi, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, k_blk, d), lambda bb, qi, ki: (bb, ki, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, k_blk, d), lambda bb, qi, ki: (bb, ki, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=(
                        pl.BlockSpec((1, q_blk, d), lambda bb, qi, ki: (bb, qi, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, q_blk, 1), lambda bb, qi, ki: (bb, qi, 0), memory_space=pltpu.VMEM),
                    ),
                    out_shape=(
                        jax.ShapeDtypeStruct(x.shape, x.dtype),
                        jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
                    ),
                    scratch_shapes=[
                        pltpu.VMEM((q_blk, 1), jnp.float32),
                        pltpu.VMEM((q_blk, d + 1), jnp.float32),
                    ],
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel", "parallel", "arbitrary"),
                    ),
                )(x * p, x, x)
                return out

            return fn

        fl = 4 * b * 9216 * 9216 * 512
        for q_blk, k_blk in ((256, 512), (512, 512), (256, 1024),
                             (512, 1024), (1024, 512), (384, 768),
                             (512, 768), (768, 512), (256, 768)):
            if 9216 % q_blk or 9216 % k_blk:
                continue
            for fold in (True, False):
                fn = build(q_blk, k_blk, fold)
                try:
                    dt = marginal_time(fn, jnp.ones((), bf), qh)
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"op": f"d512_{q_blk}x{k_blk}_fold{fold}",
                                      "error": str(e)[:90]}), flush=True)
                    continue
                print(json.dumps({"op": f"d512_{q_blk}x{k_blk}_fold{fold}",
                                  "ms": round(dt * 1e3, 2),
                                  "tflops": round(fl / dt / 1e12, 1)}),
                      flush=True)

    if args.part in ("gn",):
        # GroupNorm+SiLU at the hot VAE shapes: HBM floor is 2 reads +
        # 1 write of the tensor (stats pass + fused normalize/silu pass).
        # The loop-carried perturbation must hit X (not the params), else
        # XLA hoists the x-only stats/normalize passes out of the loop.
        from genpercept_tpu.ops import group_norm

        for hw, c in ((768, 128), (384, 256), (192, 512), (96, 512)):
            xx = jax.random.normal(jax.random.key(10), (b, hw, hw, c), bf)
            w = jnp.abs(jax.random.normal(jax.random.key(11), (c,)))
            bb = jax.random.normal(jax.random.key(12), (c,))

            def gn(p, x):
                return jax.nn.silu(group_norm(x, w * p, bb, 32, 1e-6))

            dt = marginal_time_chain(gn, jnp.ones((), bf), xx)
            gb = 3 * b * hw * hw * c * 2 / 1e9  # bf16, 2R+1W
            print(json.dumps({"op": f"gn_silu_{hw}@{c}",
                              "ms": round(dt * 1e3, 2),
                              "gbps_eff": round(gb / dt, 0),
                              "floor_ms_819gbps": round(gb / 819 * 1e3, 2)}),
                  flush=True)

    if args.part in ("nomax",):
        # d=64 flash with the running max replaced by a static clamp
        # (exp2 of clamped logits, fp32 accumulation cannot overflow below
        # clamp 110): measures the VPU cost of online max tracking.
        import functools as ft

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, scale):
            ki = pl.program_id(2)
            nk = pl.num_programs(2)

            @pl.when(ki == 0)
            def _init():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
            c = scale * 1.4426950408889634
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp2(jnp.minimum(s * c, 110.0)).astype(v.dtype)
            ones = jnp.ones((v.shape[0], 1), v.dtype)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                p, jnp.concatenate([v, ones], axis=1),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )

            @pl.when(ki == nk - 1)
            def _finish():
                o_ref[0] = (acc_ref[:, :-1] / acc_ref[:, -1:]).astype(o_ref.dtype)

        def build(q_blk, k_blk, d):
            kfn = ft.partial(kernel, scale=d ** -0.5)

            def fn(p, x):
                bh, sq, _ = x.shape
                return pl.pallas_call(
                    kfn,
                    grid=(bh, sq // q_blk, sq // k_blk),
                    in_specs=[
                        pl.BlockSpec((1, q_blk, d), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, k_blk, d), lambda b, qi, ki: (b, ki, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, k_blk, d), lambda b, qi, ki: (b, ki, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, q_blk, d), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                    scratch_shapes=[pltpu.VMEM((q_blk, d + 1), jnp.float32)],
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel", "parallel", "arbitrary"),
                    ),
                )(x * p, x, x)

            return fn

        s, heads, d = 9216, 5, 64
        qh = jax.random.normal(jax.random.key(2), (b * heads, s, d), bf)
        fl = 4 * b * heads * s * s * d
        for q_blk, k_blk in ((1024, 1024), (512, 1024), (1024, 1536)):
            if s % q_blk or s % k_blk:
                continue
            fn = build(q_blk, k_blk, d)
            try:
                dt = marginal_time(fn, jnp.ones((), bf), qh)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"op": f"nomax_{q_blk}x{k_blk}",
                                  "error": str(e)[:90]}), flush=True)
                continue
            print(json.dumps({"op": f"nomax_{q_blk}x{k_blk}",
                              "ms": round(dt * 1e3, 2),
                              "tflops": round(fl / dt / 1e12, 1)}), flush=True)

    if args.part in ("resblock_chain",):
        # full VAE resblock, output chained to input (true in-situ cost,
        # nothing hoistable); floor = 2 convs at 206 TFLOP/s + 2 GN at BW
        from genpercept_tpu.models.layers import init_resnet_block, resnet_block

        for hw, c in ((768, 128), (384, 256), (192, 512)):
            xx = jax.random.normal(jax.random.key(20), (b, hw, hw, c), bf)
            p = jax.tree.map(lambda t: t.astype(bf),
                             init_resnet_block(jax.random.key(21), c, c, None))

            def blk(p, x):
                return resnet_block(p, x, None, eps=1e-6)

            dt = marginal_time_chain(blk, p, xx)
            fl = 2 * 2 * 9 * b * hw * hw * c * c
            conv_floor = fl / 206e12 * 1e3
            gn_floor = 2 * 3 * b * hw * hw * c * 2 / 819e9 * 1e3
            print(json.dumps({
                "op": f"vae_resblock_chain_{hw}@{c}",
                "ms": round(dt * 1e3, 2),
                "conv_floor_ms": round(conv_floor, 1),
                "gn_floor_ms": round(gn_floor, 1),
            }), flush=True)

    if args.part in ("xattn",):
        # cross-attention (Sk=77 text tokens) at the UNet levels: padded
        # flash vs the XLA fallback it replaces
        from genpercept_tpu.ops.attention import (
            _xla_attention,
            dot_product_attention,
        )

        for s, heads in ((9216, 5), (2304, 10)):
            d = 64
            q = jax.random.normal(jax.random.key(13), (b, s, heads, d), bf)
            k = jax.random.normal(jax.random.key(14), (b, 77, heads, d), bf)
            v = jax.random.normal(jax.random.key(15), (b, 77, heads, d), bf)

            for name, fn in (
                ("xla", lambda p, x: _xla_attention(x * p, k, v, d ** -0.5)),
                ("flash", lambda p, x: dot_product_attention(x * p, k, v)),
            ):
                dt = marginal_time(fn, jnp.ones((), bf), q)
                print(json.dumps({"op": f"xattn_{name}_s{s}",
                                  "ms": round(dt * 1e3, 2)}), flush=True)

    if args.part in ("dense", "all"):
        # bare qkv-style matmul efficiency at the tblock shapes
        for s, c in ((9216, 320), (2304, 640), (9216, 512)):
            x = jax.random.normal(jax.random.key(6), (b, s, c), bf)
            w = jax.random.normal(jax.random.key(7), (c, c), bf) * 0.03

            def mm(w, x):
                return jnp.einsum("bsc,cd->bsd", x, w)

            dt = marginal_time(mm, w, x)
            fl = 2 * b * s * c * c
            print(json.dumps({"op": f"dense_s{s}_c{c}", "ms": round(dt * 1e3, 2),
                              "tflops": round(fl / dt / 1e12, 1)}))


if __name__ == "__main__":
    main()
