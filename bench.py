"""Benchmark: one-step 768^2 depth throughput on TPU (driver contract).

Prints ONE JSON line:
  {"metric": "img_per_s_per_chip_768_depth", "value": N, "unit": "img/s",
   "vs_baseline": N / 2.5}

Baseline: the reference's ~0.4 s/img single-image loop on an A800
(BASELINE.md; reference README.md:101) == 2.5 img/s.

Runs the full jitted pipeline (VAE encode -> SD2.1 UNet one-step -> VAE
decode -> depth postproc) in bfloat16 at the batch size from the v5e oracle,
on whatever backend JAX selects (TPU under the driver).
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_S = 2.5
RES = 768


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import os

    from genpercept_tpu.pipeline import PipelineConfig, build_single_infer
    from genpercept_tpu.utils.batchsize import find_batch_size
    from __graft_entry__ import _flagship_models

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = find_batch_size(1, RES, "bfloat16") if on_tpu else 1
    if os.environ.get("BENCH_BATCH"):  # experimentation override
        batch = int(os.environ["BENCH_BATCH"])
    res = RES if on_tpu else 128  # CPU fallback keeps the script runnable

    models = _flagship_models(jnp.bfloat16)
    cfg = PipelineConfig(mode="depth", dtype=jnp.bfloat16)
    single_infer = build_single_infer(models, cfg)
    params = models.params()

    n_hi, n_lo = (8, 2) if on_tpu else (2, 1)

    # NOTE on methodology: (a) loops run INSIDE one XLA program with a scalar
    # fetch at the end — under the axon tunnel jax.block_until_ready() does
    # not synchronize and every dispatch costs ~30 ms of relay latency; (b) the
    # loop body carries a data dependency (the output feeds an epsilon back
    # into the input), otherwise XLA hoists the loop-invariant pipeline call
    # and the measurement is ~5x too fast; (c) the reported time is the
    # MARGINAL cost per iteration between two loop lengths, which cancels
    # the one-off dispatch/warmup overhead.
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(params, rgb, n):
        def body(i, carry):
            acc, x = carry
            out = single_infer(params, x)
            s = jnp.sum(out)
            x = x * (1.0 + s * 1e-30)  # numerically a no-op; defeats hoisting
            return (acc + s, x)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), rgb))[0]

    while True:
        rgb = jax.random.uniform(
            jax.random.key(1), (batch, res, res, 3), jnp.float32
        )
        try:
            float(run_n(params, rgb, n_lo))  # compile + warmup + full sync
            break
        except Exception:  # OOM: halve the batch and retry
            if batch == 1:
                raise
            batch = max(batch // 2, 1)

    float(run_n(params, rgb, n_hi))  # compile the long loop too
    t0 = time.perf_counter()
    s_lo = float(run_n(params, rgb, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    s_hi = float(run_n(params, rgb, n_hi))
    t_hi = time.perf_counter() - t0
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    assert s_lo == s_lo and s_hi == s_hi, "NaN in benchmark output"

    img_per_s = batch / dt
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
            }
        )
    )


if __name__ == "__main__":
    main()
