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
    from genpercept_tpu.pipeline import PipelineConfig, build_single_infer
    from genpercept_tpu.utils.batchsize import find_batch_size
    from __graft_entry__ import _flagship_models

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = find_batch_size(1, RES, "bfloat16") if on_tpu else 1
    res = RES if on_tpu else 128  # CPU fallback keeps the script runnable

    models = _flagship_models(jnp.bfloat16)
    cfg = PipelineConfig(mode="depth", dtype=jnp.bfloat16)
    single_infer = build_single_infer(models, cfg)
    params = models.params()

    n_iters = 5 if on_tpu else 1

    # NOTE: timing loops INSIDE one XLA program with a scalar fetch at the
    # end: under the axon tunnel jax.block_until_ready() does not actually
    # synchronize, and every dispatch costs ~30 ms of relay latency, so
    # host-side per-call timing is meaningless.
    def run_n(params, rgb):
        def body(i, acc):
            out = single_infer(params, rgb)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    run = jax.jit(run_n)

    while True:
        rgb = jax.random.uniform(
            jax.random.key(1), (batch, res, res, 3), jnp.float32
        )
        try:
            float(run(params, rgb))  # compile + warmup + full sync
            break
        except Exception:  # OOM: halve the batch and retry
            if batch == 1:
                raise
            batch = max(batch // 2, 1)

    t0 = time.perf_counter()
    s = float(run(params, rgb))
    dt = (time.perf_counter() - t0) / n_iters
    assert s == s, "NaN in benchmark output"

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
