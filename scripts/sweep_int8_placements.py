"""On-chip int8 placement sweep from ONE calibration pass (VERDICT r3 #2/#3).

Calibrates once (full asymmetric stats + bias-correction residuals, and the
GPTQ Grams when --gptq), runs the full-precision reference once, then builds
the quantized tree for EACH placement from the same stats and measures its
cross-batch fidelity — one quant-infer compile per placement instead of a
full profile_int8_vae run each. Optionally (--throughput NAME) measures the
timed loop for the named placement.

The sweep question this answers: can the VAE ENCODER be quantized under the
<=1e-2 bar (it is the last big bf16 phase, ~230 ms of the ~880 ms batch-16
pipeline), and which encoder sub-placement / GPTQ setting gets there?
Round-3 datum: everything-int8 asym = 19.42 img/s at mean dev 1.63e-2.

Usage: timeout 3500 python scripts/sweep_int8_placements.py [--batch 16]
    [--gptq] [--throughput NAME]
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name -> int8_exclude substrings (encoder placements around the known
# endpoints: full exclusion [r2 default] ... no exclusion [19.42 @ 1.63e-2])
PLACEMENTS = {
    # the shipping PipelineConfig.int8_exclude default (== enc_deep below;
    # flipped round 5 after the same-harness throughput column inverted
    # the round-4 cross-harness ordering — see README)
    "default": ("encoder.down_blocks.0.", "encoder.down_blocks.1.",
                "decoder.up_blocks.3."),
    # the round-2..4 default: max fidelity (4.8e-3), ~2 img/s slower
    "max_fidelity": ("encoder.", "decoder.up_blocks.3."),
    # r3 measured 8.4e-3 @ 18.16 img/s — the known-good fallback
    "dec_full": ("encoder.",),
    # encoder high-res halves int8, deep layers (closest to the latent,
    # least FLOPs) bf16
    "enc_01": ("encoder.mid_block.", "encoder.down_blocks.3.",
               "encoder.down_blocks.2."),
    "enc_012": ("encoder.mid_block.", "encoder.down_blocks.3."),
    # everything except the encoder mid block
    "enc_all_but_mid": ("encoder.mid_block.",),
    # encoder DEEP-only: int8 just down_blocks.2/3 + mid (256/512-deep
    # contractions at 192^2/96^2, where the MXU's 2x int8 rate is
    # reachable), keeping the high-res 768^2/384^2 x128 blocks bf16 —
    # those are exactly the shapes where XLA's s8 conv emitter measured
    # SLOWER than bf16 (21.1 vs 13.5 ms), which is why enc_01/enc_012
    # were a throughput loss. Decoder stays at the shipping placement.
    "enc_deep": ("encoder.down_blocks.0.", "encoder.down_blocks.1.",
                 "decoder.up_blocks.3."),
    # r3 measured 1.63e-2 @ 19.42 img/s
    "all": (),
}


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gptq", action="store_true",
                    help="ALSO quantize each placement with GPTQ rounding "
                         "(collects enc/dec Grams; calibrates at chunk 1)")
    ap.add_argument("--placements", default="",
                    help="comma-separated subset of placement names")
    ap.add_argument("--throughput", default="",
                    help="comma-separated placement names to ALSO measure "
                         "the timed loop for (each adds 2 loop compiles)")
    args = ap.parse_args()
    b = args.batch
    throughput_names = {n for n in args.throughput.split(",") if n}

    from __graft_entry__ import _flagship_models
    from genpercept_tpu.ops.quant import (
        apply_bias_correction, calibrate_chunked, quantize_from_stats)
    from genpercept_tpu.pipeline import PipelineConfig, build_single_infer
    from genpercept_tpu.utils.synthetic import natural_like_images

    models = _flagship_models(jnp.bfloat16)
    cfg = PipelineConfig(mode="depth", dtype=jnp.bfloat16,
                         int8_vae=True, int8_unet=True,
                         int8_gptq=args.gptq)
    params = models.params()

    calib = jax.jit(build_single_infer(models, cfg, "calibrate"))
    infer_fp = jax.jit(build_single_infer(models, cfg, None))
    infer_q = jax.jit(build_single_infer(models, cfg, "quant"))

    rgb_a = natural_like_images(jax.random.key(1), b, 768)
    rgb_b = natural_like_images(jax.random.key(2), b, 768)

    t0 = time.time()
    _, stats = calibrate_chunked(calib, params, rgb_a,
                                 chunk=1 if args.gptq else 2)
    hess = jax.tree.map(np.asarray, stats.pop("hess", {}))
    corr = stats["corr"]
    print(json.dumps({"op": "calibrated", "seconds": round(time.time() - t0),
                      "gptq": args.gptq}), flush=True)

    pred_fp = np.asarray(infer_fp(params, rgb_b))

    names = ([n for n in args.placements.split(",") if n]
             or list(PLACEMENTS))
    modes = ("rtn", "gptq") if args.gptq else ("rtn",)
    for name in names:
        excl = PLACEMENTS[name]

        def keep(s):
            return {k: v for k, v in s.items()
                    if not any(e in k for e in excl)}

        for mode in modes:
            hq = hess if mode == "gptq" else {}
            vq = {
                "enc": quantize_from_stats(models.vae, keep(stats["enc"]),
                                           1.0, hess=hq.get("enc")),
                "dec": quantize_from_stats(models.vae, keep(stats["dec"]),
                                           1.0, hess=hq.get("dec")),
                "unet": quantize_from_stats(models.unet, keep(stats["unet"]),
                                            1.0, asymmetric_downsample=False),
            }
            vq = {k: apply_bias_correction(v, corr[k]) for k, v in vq.items()}
            p = dict(params)
            p["vae_quant"] = jax.device_put(vq)
            pred_q = np.asarray(infer_q(p, rgb_b))
            err = np.abs(pred_q - pred_fp)
            print(json.dumps({
                "op": "placement", "name": name, "mode": mode,
                "n_enc": len(vq["enc"]), "n_dec": len(vq["dec"]),
                "mean": round(float(err.mean()), 6),
                "p99": round(float(np.percentile(err, 99)), 5),
                "max": round(float(err.max()), 5),
                "pass_1e-2": bool(err.mean() <= 1e-2),
            }), flush=True)
            if name in throughput_names and mode == modes[-1]:
                single = build_single_infer(models, cfg, "quant")

                @functools.partial(jax.jit, static_argnames=("n",))
                def run_n(pp, rgb, n):
                    def body(i, carry):
                        acc, x = carry
                        out = single(pp, x)
                        s = jnp.sum(out)
                        return (acc + s, x * (1.0 + s * 1e-30))
                    return jax.lax.fori_loop(
                        0, n, body, (jnp.float32(0.0), rgb))[0]

                float(run_n(p, rgb_b, 2))
                float(run_n(p, rgb_b, 8))
                t0 = time.perf_counter()
                float(run_n(p, rgb_b, 2))
                t_lo = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(run_n(p, rgb_b, 8))
                dt = (time.perf_counter() - t0 - t_lo) / 6
                print(json.dumps({"op": "throughput", "name": name,
                                  "img_per_s": round(b / dt, 2),
                                  "ms_per_batch": round(dt * 1e3, 1)}),
                      flush=True)
            del vq, p


if __name__ == "__main__":
    main()
