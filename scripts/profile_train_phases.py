"""Per-component cost of the production training step on the real TPU
(batch 2, 768^2, bf16 compute, remat_unet + remat_vae_decode — the recipe
benchmarked by scripts/bench_train.py at ~774 ms/step).

Components, each timed with the loop-carried marginal-cost method:
  encode       frozen VAE encode fwd (the step runs TWO: rgb + gt)
  unet_fwd     UNet forward only (remat'd fn, fwd cost identical)
  unet_bwd     UNet value_and_grad (fwd + recompute + bwd under remat)
  decode_bwd   VAE decode value_and_grad wrt params+latent (per-block remat)
  losses       mse+ssi+grad pixel losses fwd+bwd wrt pred at 768^2
  adam         optax.adam update + apply_updates on the full trainable tree
  full         the whole train step (== bench_train's number)

Reference counterpart: the torch/Accelerate step at
/root/reference/src/trainer/genpercept_trainer.py:560-834 has no published
phase split; this documents where the TPU rebuild's step time goes.

Usage: timeout 1500 python scripts/profile_train_phases.py \
          [--part encode,unet_bwd,...] [--batch 2]
Parts compile separately (remote compiles are minutes each); run subsets
under tighter timeouts if needed.
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


def marginal_time(step, carry0, consts=(), n_lo=2, n_hi=6):
    """step(consts, carry, i) -> carry with a data dependency; returns marginal
    s/iter. `consts` (e.g. a params tree) MUST come in as a jit argument, not a
    closure: closed-over arrays bake into the HLO as constants (an 865M-param
    UNet adds ~1.7 GB of literals), which breaks the remote-compile transport."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(consts, carry, n):
        carry = jax.lax.fori_loop(0, n, lambda i, c: step(consts, c, i), carry)
        return jax.tree.map(
            lambda x: x.astype(jnp.float32).sum(), jax.tree.leaves(carry)[0]
        )

    float(run_n(consts, carry0, n_lo))
    float(run_n(consts, carry0, n_hi))
    t0 = time.perf_counter()
    float(run_n(consts, carry0, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_n(consts, carry0, n_hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--res", type=int, default=768)
    ap.add_argument("--part", default=None,
                    help="comma-separated subset of parts to run")
    args = ap.parse_args()
    b, res = args.batch, args.res
    lat = res // 8

    from __graft_entry__ import _flagship_models
    from genpercept_tpu.models import unet_apply, vae_decode, vae_encode
    from genpercept_tpu.train import TrainConfig, build_train_step, init_train_state
    from genpercept_tpu.train import losses as L

    models = _flagship_models(jnp.bfloat16)
    cfg = TrainConfig(
        loss_names=("mse", "ssi", "grad"), fix_timesteps=1,
        compute_dtype=jnp.bfloat16, adam_mu_dtype=jnp.bfloat16,
        remat_unet=True,
    )
    trainable, frozen, tx, opt_state = init_train_state(models.params(), cfg)
    unet_cfg, vae_cfg = models.unet_cfg, models.vae_cfg
    params = models.params()

    rgb = jax.random.uniform(jax.random.key(0), (b, res, res, 3), jnp.bfloat16)
    latent = jax.random.normal(jax.random.key(1), (b, lat, lat, 4), jnp.bfloat16)
    text = jnp.zeros((b, 77, 1024), jnp.bfloat16)
    mask = jnp.ones((b, res, res), bool)

    results = {}

    def emit(name, timer):
        # the remote compiler intermittently drops connections ("Broken
        # pipe"); don't let one part kill the sweep — the compile cache makes
        # a re-run resume where it failed
        try:
            dt = timer()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"part": name, "error": str(e)[:120]}), flush=True)
            return
        results[name] = dt
        print(json.dumps({"part": name, "ms": round(dt * 1e3, 1)}), flush=True)

    parts = args.part.split(",") if args.part else [
        "encode", "unet_fwd", "unet_bwd", "decode_bwd", "losses", "adam", "full",
    ]

    unet_fn = jax.checkpoint(
        lambda p, z: unet_apply(p, z, jnp.int32(1), text, unet_cfg))

    if "encode" in parts:
        def step(vp, c, i):
            acc, x = c
            out = vae_encode(vp, x, vae_cfg)
            s = jnp.sum(out).astype(jnp.float32)
            return (acc + s, x * (1.0 + s.astype(x.dtype) * 1e-30))
        emit("encode", lambda: marginal_time(
            step, (jnp.float32(0.0), rgb), params["vae"]))

    if "unet_fwd" in parts:
        def step(up, c, i):
            acc, z = c
            out = unet_apply(up, z, jnp.int32(1), text, unet_cfg)
            s = jnp.sum(out).astype(jnp.float32)
            return (acc + s, z * (1.0 + s.astype(z.dtype) * 1e-30))
        emit("unet_fwd", lambda: marginal_time(
            step, (jnp.float32(0.0), latent), params["unet"]))

    if "unet_bwd" in parts:
        gf = jax.value_and_grad(
            lambda p, z: jnp.sum(unet_fn(p, z)).astype(jnp.float32))

        def step(up, c, i):
            acc, z = c
            v, g = gf(up, z)
            s = v + jax.tree.leaves(g)[0].astype(jnp.float32).sum()
            return (acc + s, z * (1.0 + s.astype(z.dtype) * 1e-30))
        emit("unet_bwd", lambda: marginal_time(
            step, (jnp.float32(0.0), latent), params["unet"]))

    if "decode_bwd" in parts:
        gf = jax.value_and_grad(
            lambda p, z: jnp.sum(
                vae_decode(p, z, vae_cfg, remat=True)).astype(jnp.float32),
            argnums=(0, 1))

        def step(vp, c, i):
            acc, z = c
            v, (gp, gz) = gf(vp, z)
            s = v + jax.tree.leaves(gp)[0].astype(jnp.float32).sum()
            return (acc + s, z * (1.0 + s.astype(z.dtype) * 1e-30))
        emit("decode_bwd", lambda: marginal_time(
            step, (jnp.float32(0.0), latent), params["vae"]))

    if "losses" in parts:
        def lfn(pred, targ):
            p32 = pred.astype(jnp.float32) + 2.0
            return (L.masked_mse(p32, targ, mask)
                    + 0.5 * L.ssi_loss(p32, targ, mask, "least_square")
                    + 2.0 * L.gradient_loss(p32, targ, mask))
        gf = jax.value_and_grad(lfn)

        def step(targ, c, i):
            acc, x = c
            v, g = gf(x, targ)
            s = v + jnp.sum(g)
            return (acc + s, x * (1.0 + s.astype(x.dtype) * 1e-30))
        emit("losses", lambda: marginal_time(
            step, (jnp.float32(0.0), rgb[..., 0]),
            rgb[..., 0].astype(jnp.float32) + 2.0))

    if "adam" in parts:
        # grads in the PARAM dtype: optax.apply_updates promotes the carry
        # otherwise (f32 updates on bf16 masters), and the fori_loop carry
        # must keep one type across iterations
        grads = jax.tree.map(lambda p: jnp.ones(p.shape, p.dtype), trainable)

        def step(g, c, i):
            tr, opt = c
            import optax
            upd, opt = tx.update(g, opt, tr)
            tr = optax.apply_updates(tr, upd)
            return (tr, opt)
        emit("adam", lambda: marginal_time(step, (trainable, opt_state), grads))

    if "full" in parts:
        step_inner = build_train_step(cfg, models, tx)
        batch = {"rgb_norm": rgb.astype(jnp.float32),
                 "gt_norm": rgb.astype(jnp.float32), "valid_mask": mask}

        def step(consts, c, i):
            fr, bt = consts
            tr, opt = c
            tr, opt, _ = step_inner(
                tr, fr, opt, bt, jax.random.fold_in(jax.random.key(7), i))
            return (tr, opt)
        emit("full", lambda: marginal_time(
            step, (trainable, opt_state), (frozen, batch)))

    known = sum(v for k, v in results.items()
                if k in ("unet_bwd", "decode_bwd", "losses", "adam"))
    if "full" in results and known:
        # encode runs twice in the real step (rgb + gt)
        known += 2 * results.get("encode", 0.0)
        print(json.dumps({
            "part": "sum_of_parts_ms", "ms": round(known * 1e3, 1),
            "full_minus_parts_ms": round((results["full"] - known) * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
