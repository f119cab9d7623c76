"""Training-step throughput on the real TPU: the canonical depth recipe
(768^2 crops, mse+ssi+grad losses, bf16 compute, bf16 adam mu) at per-chip
micro-batch 2 — the reference's per-GPU batch on H100s
(/root/reference/config/main_paper/*depth*.yaml:55 train batch 2, eff. 32
via grad accum 16). Prints one JSON line (NOT the driver bench contract —
that is bench.py).

Methodology: same loop-carried marginal-cost timing as bench.py (the axon
tunnel neither syncs on block_until_ready nor survives naive timing).

Usage: timeout 590 python scripts/bench_train.py [--batch 2] [--remat]
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


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--res", type=int, default=768)
    # remat_unet=True is the production recipe default (configs/train/
    # depth.yaml:69) — at 768^2 fp32-master training without remat the
    # backward's held activations OOM the 16 GB HBM
    ap.add_argument("--no_remat", dest="remat", action="store_false")
    ap.set_defaults(remat=True)
    # per-unit UNet checkpointing: same recompute FLOPs as whole-UNet remat
    # but the backward holds ONE unit's internals at a time -> larger
    # micro-batches fit the 16 GB chip
    ap.add_argument("--block_remat", action="store_true")
    # the frozen VAE decoder's backward only needs d/dlatent; per-block
    # remat trades one decoder-fwd recompute for not holding its
    # activations. With the native-dtype GroupNorm apply (ops/norms.py)
    # the held activations shrank ~2x — this flag measures whether the
    # recompute still pays for itself (profile_train_phases r5: decode is
    # the dominant phase of the step)
    ap.add_argument("--no_decode_remat", dest="decode_remat",
                    action="store_false")
    ap.set_defaults(decode_remat=True)
    # production cli.train loads fp32 master weights (bf16 is this bench's
    # default to mirror the memory-lean config); use --fp32_masters to
    # measure the exact production dtype mix (fp32 masters, bf16 compute)
    ap.add_argument("--fp32_masters", action="store_true")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_models
    from genpercept_tpu.train import (
        TrainConfig,
        build_train_step,
        init_train_state,
    )

    models = _flagship_models(
        jnp.float32 if args.fp32_masters else jnp.bfloat16
    )
    cfg = TrainConfig(
        loss_names=("mse", "ssi", "grad"),
        fix_timesteps=1,
        compute_dtype=jnp.bfloat16,
        adam_mu_dtype=jnp.bfloat16,
        remat_unet=args.remat,
        remat_granularity="block" if args.block_remat else "unet",
        remat_vae_decode=args.decode_remat,
    )
    trainable, frozen, tx, opt_state = init_train_state(models.params(), cfg)
    step_inner = build_train_step(cfg, models, tx)

    b, hw = args.batch, args.res
    import numpy as np

    rng = np.random.default_rng(0)
    mask = np.ones((b, hw, hw), bool)
    mask[:, : hw // 4, : hw // 4] = False
    batch = {
        "rgb_norm": jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)), jnp.float32),
        "gt_norm": jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)), jnp.float32),
        "valid_mask": jnp.asarray(mask),
    }

    # n is DYNAMIC (fori_loop with a traced bound): one compile serves both
    # loop lengths — the full fwd+bwd program takes minutes to compile on
    # the remote compiler, so a static-n recompile per length would blow
    # the time budget. Donating (trainable, opt_state) matters: without it
    # the undonated inputs double the ~7 GB optimizer/master state.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_n(trainable, opt_state, batch, n):
        def body(i, carry):
            tr, opt = carry
            # fresh key per iter; batch fixed — the param update itself is
            # the loop-carried dependency (nothing hoistable)
            tr, opt, metrics = step_inner(tr, frozen, opt, batch,
                                          jax.random.fold_in(jax.random.key(7), i))
            return (tr, opt)

        tr, opt = jax.lax.fori_loop(0, n, body, (trainable, opt_state))
        return tr, opt, jax.tree.leaves(tr)[0].astype(jnp.float32).sum()

    state = (trainable, opt_state)

    def call(n) -> float:
        nonlocal_state = call.state
        tr, opt, s = run_n(nonlocal_state[0], nonlocal_state[1], batch, n)
        call.state = (tr, opt)
        return float(s)

    call.state = state

    n_lo, n_hi = 2, 6
    call(n_lo)
    call(n_hi)
    t0 = time.perf_counter()
    call(n_lo)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    call(n_hi)
    t_hi = time.perf_counter() - t0
    dt = (t_hi - t_lo) / (n_hi - n_lo)

    print(json.dumps({
        "metric": "train_step_768_depth",
        "ms_per_step": round(dt * 1e3, 1),
        "img_per_s": round(b / dt, 2),
        "batch": b,
        "res": hw,
        "remat": args.remat,
        "granularity": "block" if args.block_remat else "unet",
        "decode_remat": args.decode_remat,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
