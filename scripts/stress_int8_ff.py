"""Stress / crash-repro harness for the int8 fused GEGLU FF kernel
(ops/fused_ff.py::fused_geglu_ff_int8) — VERDICT r4 weak-#1.

Round-4 observation: 768^2 programs CONTAINING the int8 FF crashed or hung
the axon TPU worker in 3 of 5 on-chip runs, so the kernel was shelved
opt-in without a root cause. This script isolates the kernel and walks the
suspect axes so the failure (if kernel-level) reproduces in minutes and
bisects:

  --part kernel    the kernel alone at the production shapes, many real
                   dispatches with host syncs + tiny probe matmuls between
                   iterations (each iteration logged: a crash pins the
                   exact shape/config that killed the worker)
  --part unet      the full UNet fwd (the composite program that crashed)
                   with int8 convs + int8 FF, repeated
  --part vmem      kernel-alone sweep over row-block size and
                   vmem_limit_bytes at C=320/640

Run under `timeout 590`; a worker crash surfaces as the timeout killing a
hung iteration whose last log line names the config.
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def probe():
    x = jnp.ones((128, 128), jnp.bfloat16)
    t0 = time.perf_counter()
    float(jnp.sum(x @ x))
    return time.perf_counter() - t0


def build_qtree(s, c, asym, key=0):
    from genpercept_tpu.models.layers import init_feed_forward
    from genpercept_tpu.ops.quant import (absmax_per_channel, qdense_apply,
                                          quantize_dense)

    bf = jnp.bfloat16
    x = jax.random.normal(jax.random.key(key), (16, s, c), bf)
    p = jax.tree.map(lambda t: t.astype(bf),
                     init_feed_forward(jax.random.key(key + 1), c))
    w1 = p["net"]["0"]["proj"]["weight"]
    b1 = p["net"]["0"]["proj"]["bias"]
    inner = w1.shape[1] // 2
    stats_x = absmax_per_channel(x)
    if asym:
        # asymmetric stats: (min, max) tuple layout per ops/quant.py
        xf = x.astype(jnp.float32)
        stats_x = (jnp.min(xf, axis=(0, 1)), jnp.max(xf, axis=(0, 1)))
    qh = quantize_dense({"weight": w1[:, :inner], "bias": b1[:inner]}, stats_x)
    qg = quantize_dense({"weight": w1[:, inner:], "bias": b1[inner:]}, stats_x)
    a = (qdense_apply(qh, x) * jax.nn.gelu(qdense_apply(qg, x),
                                           approximate=False))
    stats_a = absmax_per_channel(a)
    if asym:
        af = a.astype(jnp.float32)
        stats_a = (jnp.min(af, axis=(0, 1)), jnp.max(af, axis=(0, 1)))
    q2 = quantize_dense(p["net"]["2"], stats_a)
    return x, {"qh": qh, "qg": qg, "q2": q2}


def stress_kernel(iters, asym):
    from genpercept_tpu.ops.fused_ff import fused_geglu_ff_int8

    for s, c in ((9216, 320), (2304, 640)):
        x, qt = build_qtree(s, c, asym)

        @jax.jit
        def step(x, qt):
            return jnp.sum(fused_geglu_ff_int8(
                x, qt["qh"], qt["qg"], qt["q2"]).astype(jnp.float32))

        log(f"kernel s={s} c={c} asym={asym}: compiling")
        v0 = float(step(x, qt))
        log(f"kernel s={s} c={c}: compiled, v={v0:.3e}; {iters} dispatches")
        for i in range(iters):
            v = float(step(x, qt))
            pdt = probe()
            if pdt > 2:
                log(f"  iter {i}: probe took {pdt:.1f}s (worker hiccup?)")
            if v != v:
                log(f"  iter {i}: NaN!")
                return False
        log(f"kernel s={s} c={c} asym={asym}: {iters} iters clean")
    return True


def stress_unet(iters):
    """The composite that crashed: full UNet forward, int8 convs + int8 FF,
    at production geometry (96x96 latent, batch 16)."""
    from __graft_entry__ import _flagship_models
    from genpercept_tpu.pipeline import PipelineConfig, build_single_infer
    from genpercept_tpu.ops.quant import (apply_bias_correction,
                                          calibrate_chunked,
                                          quantize_from_stats)
    from genpercept_tpu.utils.synthetic import natural_like_images

    models = _flagship_models(jnp.bfloat16)
    cfg = PipelineConfig(mode="depth", dtype=jnp.bfloat16, int8_vae=True,
                         int8_unet=True, int8_unet_ff=True,
                         int8_asymmetric=True)
    params = models.params()
    rgb = natural_like_images(jax.random.key(1), 16, 768)
    calibrate = jax.jit(build_single_infer(models, cfg, "calibrate"))
    log("unet: calibrating (chunk 2)")
    _, stats = calibrate_chunked(calibrate, params, rgb, chunk=2)

    def keep(s):
        return {k: v for k, v in s.items()
                if not any(e in k for e in cfg.int8_exclude)}

    vq = {
        "enc": quantize_from_stats(models.vae, keep(stats["enc"]), 1.0),
        "dec": quantize_from_stats(models.vae, keep(stats["dec"]), 1.0),
        "unet": quantize_from_stats(models.unet, keep(stats["unet"]), 1.0,
                                    asymmetric_downsample=False),
    }
    vq = {k: apply_bias_correction(v, stats["corr"][k]) for k, v in vq.items()}
    params = dict(params)
    params["vae_quant"] = jax.device_put(vq)
    single_infer = build_single_infer(models, cfg, "quant")

    @jax.jit
    def step(params, rgb):
        return jnp.sum(single_infer(params, rgb).astype(jnp.float32))

    log("unet: compiling the quant+FF 768^2 program")
    v0 = float(step(params, rgb))
    log(f"unet: compiled, v={v0:.3e}; {iters} dispatches")
    for i in range(iters):
        t0 = time.perf_counter()
        v = float(step(params, rgb))
        dt = time.perf_counter() - t0
        pdt = probe()
        log(f"  iter {i}: {dt * 1e3:.0f} ms, probe {pdt * 1e3:.0f} ms, "
            f"v={v:.3e}")
        if v != v:
            return False
    log(f"unet: {iters} iters clean")
    return True


def throughput_ab(reps):
    """End-to-end A/B at the default placement: int8 with vs without the
    fused FF, same loop-carried marginal harness as bench.py, `reps`
    alternating measurements per arm (stability + throughput in one run)."""
    import functools

    from __graft_entry__ import _flagship_models
    from genpercept_tpu.pipeline import PipelineConfig, build_single_infer
    from genpercept_tpu.ops.quant import (apply_bias_correction,
                                          calibrate_chunked,
                                          quantize_from_stats)
    from genpercept_tpu.utils.synthetic import natural_like_images

    models = _flagship_models(jnp.bfloat16)
    rgb = natural_like_images(jax.random.key(1), 16, 768)
    arms = {}
    for name, ff in (("noff", False), ("ff", True)):
        cfg = PipelineConfig(mode="depth", dtype=jnp.bfloat16, int8_vae=True,
                             int8_unet=True, int8_unet_ff=ff,
                             int8_asymmetric=True)
        params = models.params()
        calibrate = jax.jit(build_single_infer(models, cfg, "calibrate"))
        log(f"{name}: calibrating")
        fp, stats = calibrate_chunked(calibrate, params, rgb, chunk=2)

        def keep(s, excl=cfg.int8_exclude):
            return {k: v for k, v in s.items()
                    if not any(e in k for e in excl)}

        vq = {
            "enc": quantize_from_stats(models.vae, keep(stats["enc"]), 1.0),
            "dec": quantize_from_stats(models.vae, keep(stats["dec"]), 1.0),
            "unet": quantize_from_stats(models.unet, keep(stats["unet"]),
                                        1.0, asymmetric_downsample=False),
        }
        vq = {k: apply_bias_correction(v, stats["corr"][k])
              for k, v in vq.items()}
        params = dict(params)
        params["vae_quant"] = jax.device_put(vq)
        single = build_single_infer(models, cfg, "quant")

        @jax.jit
        def probe_dev(params, rgb, ref, single=single):
            out = single(params, rgb)
            return jnp.mean(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32)))

        dev = float(probe_dev(params, rgb, fp))
        log(f"{name}: mean_dev {dev:.3e}")

        @functools.partial(jax.jit, static_argnames=("n",))
        def run_n(params, rgb, n, single=single):
            def body(i, carry):
                acc, x = carry
                out = single(params, x)
                s = jnp.sum(out)
                return (acc + s, x * (1.0 + s * 1e-30))
            return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), rgb))[0]

        log(f"{name}: warming the timing loops")
        float(run_n(params, rgb, 2))
        float(run_n(params, rgb, 8))
        arms[name] = (run_n, params, dev)

    for r in range(reps):
        for name, (run_n, params, dev) in arms.items():
            t0 = time.perf_counter()
            float(run_n(params, rgb, 2))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run_n(params, rgb, 8))
            dt = (time.perf_counter() - t0 - t_lo) / 6
            print(json.dumps({"op": "throughput", "arm": name, "rep": r,
                              "img_per_s": round(16 / dt, 2),
                              "mean_dev": round(dev, 6)}), flush=True)
            pdt = probe()
            if pdt > 2:
                log(f"rep {r} {name}: probe {pdt:.1f}s (worker hiccup?)")
    return True


def stress_vmem(iters, asym):
    """Kernel-alone sweep: row block x vmem_limit at both shapes. A config
    that crashes here pins the Mosaic-side budget; all-clean points at the
    composite program instead."""
    import genpercept_tpu.ops.fused_ff as FF

    for s, c in ((9216, 320), (2304, 640)):
        x, qt = build_qtree(s, c, asym)
        for rb in (512, 256, 128):
            if (16 * s) % rb:
                continue
            try:
                step = jax.jit(lambda x, qt, rb=rb: jnp.sum(
                    FF.fused_geglu_ff_int8(
                        x, qt["qh"], qt["qg"], qt["q2"],
                        row_blk=rb).astype(jnp.float32)))
                t0 = time.perf_counter()
                v0 = float(step(x, qt))
                log(f"vmem s={s} c={c} rb={rb}: compiled "
                    f"{time.perf_counter() - t0:.0f}s v={v0:.3e}")
                for i in range(iters):
                    float(step(x, qt))
                log(f"vmem s={s} c={c} rb={rb}: {iters} clean")
            except Exception as e:  # noqa: BLE001
                log(f"vmem s={s} c={c} rb={rb}: FAILED {str(e)[:160]}")


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="kernel",
                    choices=["kernel", "unet", "vmem", "throughput"])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--sym", action="store_true")
    args = ap.parse_args()

    log(f"start: part={args.part} iters={args.iters} "
        f"dev={jax.devices()[0]}")
    t0 = probe()
    log(f"initial probe {t0:.1f}s")
    if args.part == "kernel":
        ok = stress_kernel(args.iters, not args.sym)
    elif args.part == "unet":
        ok = stress_unet(args.iters)
    elif args.part == "throughput":
        ok = throughput_ab(max(1, args.iters))
    else:
        ok = stress_vmem(args.iters, not args.sym)
        ok = True
    print(json.dumps({"part": args.part, "ok": bool(ok)}))


if __name__ == "__main__":
    main()
