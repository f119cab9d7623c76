"""Benchmark: one-step 768^2 depth throughput on TPU (driver contract).

Prints ONE JSON line:
  {"metric": "img_per_s_per_chip_768_depth", "value": N, "unit": "img/s",
   "vs_baseline": N / 2.5}

Baseline: the reference's ~0.4 s/img single-image loop on an A800
(BASELINE.md; reference README.md:101) == 2.5 img/s.

What is measured: the production inference configuration — the full jitted
pipeline (VAE encode -> SD2.1 UNet one-step -> VAE decode -> depth postproc)
in bfloat16 with the W8A8 int8 conv path at its default max-fidelity
placement (PipelineConfig.int8_exclude). That placement's per-pixel deviation
vs the exact-bf16 pipeline is measured on-chip by scripts/profile_int8_vae.py
and sits UNDER the repo's / BASELINE.json's <=1e-2 fidelity bar (see README
"Performance" for the current numbers), so it is the shipping default for
throughput deployments.
Calibration (one full-precision stats pass + per-channel clip search + bias
correction, all one program) happens once before timing, exactly as a
deployment would via GenPerceptPipeline / cli.run --int8_calibration.

Robustness contract (the round-3 lesson, BENCH_r03.json rc=1): the driver
must ALWAYS get a JSON line. Any failure — HBM OOM, axon remote-compile
HTTP 500, anything raised while building/calibrating/warming a rung — moves
the run down a fallback ladder instead of aborting:

  rung 0: int8 asym chunk-2 + fused FF, enc_012 placement  (fastest
          bar-passing configuration; thin fidelity margin, probe-gated)
  rung 1: same, enc_deep placement     (the production config default)
  rung 2: same, max-fidelity placement (the round-2..4 default placement)
  rung 3: rung 2 minus the FF kernel   (chunk-4 asym calibration OOMs the
          16 GB HBM, the round-3 lesson — all asym rungs run chunk 2)
  rung 4: int8, asymmetric, chunk 1    (smaller calibration live set)
  rung 5: int8, symmetric, chunk 4     (the round-2 proven configuration)
  rung 6: exact bf16                   (no calibration program at all)

plus batch halving (16 -> 8 -> ... -> 1) on OOM-shaped errors within a
rung. Only if the bf16 rung at batch 1 fails does the script exit nonzero.
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_S = 2.5
RES = 768

# int8_exclude tuples by name. Placement throughput/fidelity points are
# ONLY comparable within one harness (the sweep script's heavyweight
# process measures the SAME program ~8% slower than this one); the img/s
# below are THIS harness, each with its in-run mean_dev (2026-08-20):
#   enc_012       22.70 img/s @ 8.1e-3  (cross-batch 9.9e-3 — thin margin,
#                                        hence the probe-gated ladder)
#   enc_deep      21.93 img/s @ 6.0e-3  (cross-batch 7.1e-3 — also the
#                                        production PipelineConfig default;
#                                        tests assert they stay in sync)
#   max_fidelity  19.7-20.0  @ 4.9e-3   (the round-2..4 default placement)
PLACEMENTS = {
    "enc_012": ("encoder.mid_block.", "encoder.down_blocks.3."),
    "enc_deep": ("encoder.down_blocks.0.", "encoder.down_blocks.1.",
                 "decoder.up_blocks.3."),
    "max_fidelity": ("encoder.", "decoder.up_blocks.3."),
    "all": (),
}
PLACEMENTS["default"] = PLACEMENTS["enc_deep"]


FIDELITY_BAR = 1e-2  # BASELINE.json per-pixel bar vs full precision


class FidelityError(RuntimeError):
    """int8 rung's in-run deviation vs its own calibration-pass full-
    precision prediction exceeded FIDELITY_BAR — fall down the ladder."""


def is_oom(e: Exception) -> bool:
    """Batch/live-set too big — halving the batch is the right response."""
    s = str(e)
    return ("RESOURCE_EXHAUSTED" in s or "Ran out of memory" in s
            or "hbm" in s.lower())


def probe_worker():
    """Tiny matmul before each rung (CLAUDE.md recipe): after an axon TPU
    worker crash/restart the next device op can hang ~5 min while the
    tunnel reconnects — absorbing that into a cheap probe surfaces the
    restart as a logged retry instead of a silent stall inside a 768^2
    compile. Logged when slow so a mid-run restart is visible in stderr."""
    t0 = time.perf_counter()
    x = jnp.ones((128, 128), jnp.bfloat16)
    float(jnp.sum(x @ x))
    dt = time.perf_counter() - t0
    if dt > 5:
        print(f"bench: worker probe took {dt:.0f}s "
              "(TPU worker restart / tunnel reconnect absorbed)",
              file=sys.stderr)


def run_rung(models, rung, batch, res, n_lo, n_hi):
    """Build + calibrate + warm one ladder rung; returns
    (run_n, params, rgb, mean_dev).

    mean_dev is the IN-RUN fidelity measurement for int8 rungs: the
    calibration pass already computes the full-precision prediction for the
    timing batch (calibrate_chunked's first return), so one extra jitted
    forward compares the quantized pipeline's output against it on the same
    inputs. A calibration-numerics regression therefore fails THIS run
    (FidelityError -> next rung) instead of sailing through under a
    cross-referenced fidelity claim. bf16 rungs report 0.0 by definition.

    Raises on any failure — classification (OOM vs other) is the caller's
    job. Everything expensive (compiles) happens in here so a failed rung
    never leaks state into the next attempt."""
    from genpercept_tpu.pipeline import PipelineConfig, build_single_infer
    from genpercept_tpu.ops.quant import (
        apply_bias_correction, calibrate_chunked, quantize_from_stats)
    from genpercept_tpu.utils.synthetic import natural_like_images

    use_int8 = rung["int8"]
    excl = PLACEMENTS[rung.get("placement", "default")]
    cfg = PipelineConfig(mode="depth", dtype=jnp.bfloat16,
                         int8_vae=use_int8, int8_unet=use_int8,
                         int8_unet_ff=rung.get("ff", False),
                         int8_asymmetric=rung.get("asym", True),
                         int8_exclude=excl)
    single_infer = build_single_infer(models, cfg, "quant" if use_int8 else None)

    # NOTE on methodology: (a) loops run INSIDE one XLA program with a scalar
    # fetch at the end — under the axon tunnel jax.block_until_ready() does
    # not synchronize and every dispatch costs ~30 ms of relay latency; (b) the
    # loop body carries a data dependency (the output feeds an epsilon back
    # into the input), otherwise XLA hoists the loop-invariant pipeline call
    # and the measurement is ~5x too fast; (c) the reported time is the
    # MARGINAL cost per iteration between two loop lengths, which cancels
    # the one-off dispatch/warmup overhead.
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(params, rgb, n):
        def body(i, carry):
            acc, x = carry
            out = single_infer(params, x)
            s = jnp.sum(out)
            x = x * (1.0 + s * 1e-30)  # numerically a no-op; defeats hoisting
            return (acc + s, x)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), rgb))[0]

    params = models.params()
    # natural-image-like calibration/timing inputs (gradients + edges,
    # utils/synthetic.py) — matches the configuration the fidelity numbers
    # are measured in (profile_int8_vae.py --natural); uniform noise would
    # calibrate different activation scales than deployment
    rgb = natural_like_images(jax.random.key(1), batch, res)

    mean_dev = 0.0
    if use_int8:
        # One-time calibration, mirroring GenPerceptPipeline._run: fp stats
        # pass, per-channel quantization with the default int8_exclude
        # placement, bias correction folded into the quantized biases (the
        # calibration program runs in batch chunks — see calibrate_chunked;
        # only the TIMED program needs the full batch in HBM). A calibration
        # OOM halves the CHUNK (smaller calibration live set) down to 1
        # before giving up — the batch must stay intact for the timed
        # program, so batch halving is the wrong lever here.
        calibrate = jax.jit(build_single_infer(models, cfg, "calibrate"))
        chunk = min(rung.get("chunk", 4), batch)
        while True:
            try:
                fp_pred, stats = calibrate_chunked(calibrate, params, rgb,
                                                   chunk=chunk)
                break
            except Exception as e:
                if chunk == 1 or not is_oom(e):
                    raise
                chunk //= 2
                print(f"bench: calibration OOM, retrying at chunk {chunk}",
                      file=sys.stderr)

        def keep(s):
            return {k: v for k, v in s.items()
                    if not any(e in k for e in cfg.int8_exclude)}

        vq = {
            "enc": quantize_from_stats(models.vae, keep(stats["enc"]), 1.0),
            "dec": quantize_from_stats(models.vae, keep(stats["dec"]), 1.0),
            "unet": quantize_from_stats(models.unet, keep(stats["unet"]), 1.0,
                                        asymmetric_downsample=False),
        }
        vq = {k: apply_bias_correction(v, stats["corr"][k])
              for k, v in vq.items()}
        params = dict(params)
        params["vae_quant"] = jax.device_put(vq)

        # in-run fidelity probe (VERDICT r4 #4): one untimed quantized
        # forward on the calibration/timing batch vs the full-precision
        # prediction the calibration pass already produced
        @jax.jit
        def probe_dev(params, rgb, ref):
            out = single_infer(params, rgb)
            return jnp.mean(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32)))

        mean_dev = float(probe_dev(params, rgb, fp_pred))
        if not mean_dev < FIDELITY_BAR:  # catches NaN too
            raise FidelityError(
                f"in-run int8 deviation {mean_dev:.3e} exceeds the "
                f"{FIDELITY_BAR} bar at rung {rung['name']}")
        del fp_pred

    float(run_n(params, rgb, n_lo))   # compile + warmup + full sync
    float(run_n(params, rgb, n_hi))   # compile the long loop too
    return run_n, params, rgb, mean_dev


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from genpercept_tpu.utils.batchsize import find_batch_size
    from __graft_entry__ import _flagship_models

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = find_batch_size(1, RES, "bfloat16") if on_tpu else 1
    if os.environ.get("BENCH_BATCH"):  # experimentation override
        batch = int(os.environ["BENCH_BATCH"])
    res = RES if on_tpu else 128  # CPU fallback keeps the script runnable
    n_hi, n_lo = (8, 2) if on_tpu else (2, 1)

    # BENCH_BF16=1 forces the exact-bf16 pipeline; BENCH_INT8=1 forces the
    # int8 path even off-TPU (tiny-shape CI coverage of the quantize flow).
    force_int8 = bool(os.environ.get("BENCH_INT8"))
    if os.environ.get("BENCH_BF16"):
        rungs = [dict(name="bf16", int8=False)]
    elif force_int8 or on_tpu:
        rungs = [
            # The top rungs walk DOWN the placement-depth/fidelity-margin
            # trade (PLACEMENTS table above): enc_012 is the fastest
            # bar-passing placement but its cross-batch margin is thin
            # (9.9e-3 of 1e-2), so the in-run probe gates it and a miss
            # falls to enc_deep (7.1e-3 margin), then to the max-fidelity
            # placement (4.8e-3, the round-2..4 default).
            #
            # All ff rungs run the fused int8 GEGLU FF (ops/fused_ff.py),
            # promoted after the round-5 root-cause of the round-4
            # "crashed or hung the worker in 3/5 runs" shelving
            # (scripts/stress_int8_ff.py, on-chip 2026-08-20): the kernel
            # ran 200 isolated + 20 composite 768^2 dispatches clean, and
            # the one reproduced failure was a COLD-COMPILE transport
            # error — a retryable exception this ladder already catches,
            # not a kernel fault or an uncatchable hang. Same-process A/B:
            # +0.2 img/s at +0.05e-3 mean deviation over 5 stable reps.
            dict(name="int8-enc012-ff", int8=True, asym=True, chunk=2,
                 ff=True, placement="enc_012"),
            dict(name="int8-encdeep-ff", int8=True, asym=True, chunk=2,
                 ff=True, placement="enc_deep"),
            dict(name="int8-asym-ff", int8=True, asym=True, chunk=2,
                 ff=True, placement="max_fidelity"),
            # asym calibration at chunk 4 OOMs the 16 GB HBM (the round-3
            # endpoint-shrink clip search tripled the per-candidate stat
            # temps; measured on-chip 2026-08-19) — chunk 2 is the asym
            # default, and run_rung still halves further on OOM.
            dict(name="int8-asym", int8=True, asym=True, chunk=2,
                 placement="max_fidelity"),
            dict(name="int8-asym-c1", int8=True, asym=True, chunk=1,
                 placement="max_fidelity"),
            dict(name="int8-sym", int8=True, asym=False, chunk=4,
                 placement="max_fidelity"),
            dict(name="bf16", int8=False),
        ]
        if os.environ.get("BENCH_PLACEMENT"):  # placement A/B override
            for r in rungs:
                if r["int8"]:
                    r["placement"] = os.environ["BENCH_PLACEMENT"]
    else:
        rungs = [dict(name="bf16", int8=False)]

    models = _flagship_models(jnp.bfloat16)

    run_n = params = rgb = None
    rung_used = None
    mean_dev = 0.0
    last_err = None
    for rung in rungs:
        while True:
            try:
                if on_tpu:
                    probe_worker()  # absorb a worker-restart hang cheaply
                run_n, params, rgb, mean_dev = run_rung(models, rung, batch,
                                                        res, n_lo, n_hi)
                rung_used = rung
                break
            except Exception as e:  # ladder: never leave the driver empty
                last_err = e
                if is_oom(e) and batch > 1:
                    batch = max(batch // 2, 1)
                    print(f"bench: {rung['name']} OOM "
                          f"({str(e)[:160]}), retrying at batch {batch}",
                          file=sys.stderr)
                    continue
                print(f"bench: rung {rung['name']} failed "
                      f"({type(e).__name__}: {str(e)[:200]}), "
                      "falling to next rung", file=sys.stderr)
                break
        if rung_used is not None:
            break
    if rung_used is None:
        raise SystemExit(f"bench: every ladder rung failed; last: {last_err}")

    # three (lo, hi) marginal pairs, median dt: single pairs measured a
    # ±7% spread across runs (21.97/22.70/25.21 img/s for the identical
    # program, 2026-08-20) — tunnel relay jitter lands in the host-side
    # timestamps; the median of three pairs stabilizes the driver's one
    # sample at the cost of ~4 extra loop executions
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        s_lo = float(run_n(params, rgb, n_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        s_hi = float(run_n(params, rgb, n_hi))
        t_hi = time.perf_counter() - t0
        dts.append((t_hi - t_lo) / (n_hi - n_lo))
        assert s_lo == s_lo and s_hi == s_hi, "NaN in benchmark output"
    dt = sorted(dts)[1]

    img_per_s = batch / dt
    use_int8 = rung_used["int8"]
    print(
        json.dumps(
            {
                "metric": "img_per_s_per_chip_768_depth",
                "value": round(img_per_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 3),
                "batch": batch,
                "res": res,
                "p50_latency_ms": round(dt / batch * 1000, 2),
                "platform": jax.devices()[0].platform,
                "rung": rung_used["name"],
                "placement": (rung_used.get("placement", "default")
                              if use_int8 else None),
                # measured IN THIS RUN: quantized output vs the calibration
                # pass's full-precision prediction on the timing batch
                # (run_rung's probe; a rung over the bar falls down the
                # ladder instead of reporting)
                "mean_dev": round(mean_dev, 6),
                "numerics": (
                    f"w8a8-int8 {rung_used.get('placement', 'default')} "
                    "placement; in-run mean deviation vs full precision "
                    f"{mean_dev:.2e} (<=1e-2 bar)"
                    if use_int8 else "bf16"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
