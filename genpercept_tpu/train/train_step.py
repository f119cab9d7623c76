"""The GenPercept training step as one jitted, sharded XLA program.

Functional rebuild of `GenPerceptTrainer.train()`'s inner loop
(`src/trainer/genpercept_trainer.py:560-834`):

  1. valid-mask downscale to the latent grid (max-pool 8 of the invalid mask)
  2. frozen VAE encodes rgb and gt (stop_gradient)
  3. t ~ U[0, 1000) or fixed; noise = rgb_latent (genpercept mode)
  4. noisy = add_noise(gt_latent, noise, t) (== noise at beta==1)
     target = velocity (== -gt_latent at beta==1)
  5. UNet forward; loss = masked latent loss and/or pixel losses on the
     decoded prediction (mse x1 + ssi x0.5 + grad x2 on depth shifted +2),
     or DPT-head losses on multi-level features
  6. grads -> optax update.  Gradient accumulation is a lax.scan over
     micro-batches with fp32 accumulators (replacing Accelerate's
     `accumulate`); data parallelism is a sharding annotation, the gradient
     all-reduce is compiled by XLA (replacing DDP/NCCL).

Trainability masks (train unet / head / vae-decoder; `genpercept_trainer.py:
176-244`) are optax.masked partitions over the param pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from genpercept_tpu.diffusion import (
    GENPERCEPT_SCHEDULER,
    SchedulerConfig,
    add_noise,
    get_velocity,
    make_scheduler,
)
from genpercept_tpu.models import (
    DPTHeadConfig,
    UNetConfig,
    VAEConfig,
    dpt_head_apply,
    unet_apply,
    vae_decode,
    vae_encode,
)
from genpercept_tpu.train import losses as L
from genpercept_tpu.train.lr import iter_exponential_schedule


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    mode: str = "depth"
    arch: str = "genpercept"  # genpercept | rgb_blending | marigold
    # losses: subset of {latent_mse, mse, ssi, ssi_medium, grad, angular, l1,
    # vnl, hdnr, hdsnr} (vnl needs batch["intrinsic"])
    loss_names: Tuple[str, ...] = ("mse", "ssi", "grad")
    # LoRA fine-tuning of the UNet attention projections
    # (genpercept_trainer.py:223-233); when set, the base UNet is frozen
    unet_lora_rank: Optional[int] = None
    # marigold-mode pyramid noise (genpercept_trainer.py:643-654)
    multi_res_noise_strength: Optional[float] = None
    multi_res_noise_strategy: str = "original"  # reference default (multi_res_noise.py:30)
    multi_res_noise_annealed: bool = False
    fix_timesteps: Optional[int] = None
    num_train_timesteps: int = 1000
    lr: float = 3e-5
    # separate LR for the decoder param groups (custom DPT head / trained
    # VAE decoder), reference `decoder_lr` (genpercept_trainer.py:266-274);
    # None = use `lr` for everything
    decoder_lr: Optional[float] = None
    lr_total_iter_length: int = 25000
    lr_final_ratio: float = 0.01
    lr_warmup_steps: int = 100
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    # bf16 first moment halves optimizer HBM (v5e has 16 GB vs the
    # reference's 80 GB H100s); second moment stays fp32
    adam_mu_dtype: Optional[Any] = None
    # master-weight dtype for TRAINABLE params (None = keep checkpoint
    # dtype). bf16 masters save 1.7 GB for the full SD2.1 UNet and are what
    # makes full-UNet 768^2 training fit on one 16 GB chip; on a pod slice,
    # prefer fp32 masters + --zero1 (sharded optimizer) instead.
    master_dtype: Optional[Any] = None
    grad_accum_steps: int = 1
    train_unet: bool = True
    train_dpt_head: bool = True
    train_vae_decoder: bool = False
    compute_dtype: Any = jnp.float32  # bf16 for production
    # rematerialize the UNet forward in backward (trades FLOPs for HBM,
    # enabling larger per-chip batch — jax.checkpoint)
    remat_unet: bool = False
    # "unet": one checkpoint around the whole UNet (backward recompute holds
    # every UNet activation at once); "block": checkpoint each
    # resnet+transformer unit (peak = boundaries + ONE unit's internals) —
    # same recompute FLOPs, much lower peak HBM, unlocking larger per-chip
    # micro-batches at 768^2
    remat_granularity: str = "unet"
    # per-block remat of the VAE decode inside pixel losses: the decoder's
    # backward otherwise holds every 768^2-level activation simultaneously
    # (~4+ GB at batch 2), which together with optimizer state OOMs the
    # 16 GB chip. Costs one extra decoder forward per step.
    remat_vae_decode: bool = True

    scheduler: SchedulerConfig = GENPERCEPT_SCHEDULER


def replace_unet_conv_in(unet_params: Dict, unet_cfg) -> Tuple[Dict, Any]:
    """Marigold-mode conv_in surgery (genpercept_trainer.py:539-558): widen
    the 4-channel input conv to 8 channels by duplicating the kernel along
    the input-channel axis and halving it, so the initial output at
    [rgb_latent, noisy] == the SD2.1 output at their mean."""
    import dataclasses

    w = unet_params["conv_in"]["weight"]  # (3, 3, 4, C)
    assert w.shape[2] == 4, "conv_in already widened?"
    new_w = jnp.concatenate([w, w], axis=2) * 0.5
    new_params = dict(unet_params)
    new_params["conv_in"] = dict(unet_params["conv_in"])
    new_params["conv_in"]["weight"] = new_w
    new_cfg = dataclasses.replace(unet_cfg, in_channels=8)
    return new_params, new_cfg


def downscale_valid_mask(valid_mask: jax.Array, factor: int = 8) -> jax.Array:
    """(B, H, W) bool -> (B, H/f, W/f) bool: a latent cell is valid iff all
    its pixels are (max-pool of the invalid mask, genpercept_trainer.py:608-615)."""
    b, h, w = valid_mask.shape
    invalid = (~valid_mask).astype(jnp.float32)
    pooled = jax.lax.reduce_window(
        invalid, -jnp.inf, jax.lax.max, (1, factor, factor), (1, factor, factor), "VALID"
    )
    return pooled < 0.5


def build_loss_fn(cfg: TrainConfig, models):
    """models: GenPerceptModels (pipeline module). Returns
    loss_fn(trainable, frozen, batch, rng) -> (loss, aux)."""
    unet_cfg: UNetConfig = models.unet_cfg
    vae_cfg: VAEConfig = models.vae_cfg
    dpt_cfg: DPTHeadConfig = models.dpt_cfg
    sched = make_scheduler(cfg.scheduler)
    use_head = models.dpt_head is not None

    unet_remat = (
        "block" if cfg.remat_unet and cfg.remat_granularity == "block" else None
    )

    def _unet_plain(p, x, t, ctx):
        return unet_apply(p, x, t, ctx, unet_cfg, remat=unet_remat)

    def _unet_feats(p, x, t, ctx):
        _, feats = unet_apply(p, x, t, ctx, unet_cfg, return_features=True,
                              remat=unet_remat)
        return feats

    if cfg.remat_unet and unet_remat is None:
        _unet_plain = jax.checkpoint(_unet_plain)
        _unet_feats = jax.checkpoint(_unet_feats)

    def loss_fn(trainable: Dict, frozen: Dict, batch: Dict, rng) -> Tuple[jax.Array, Dict]:
        # subtree-wise merge: with train_vae_decoder the trainable "vae" is
        # only {decoder, post_quant_conv} and a flat {**frozen, **trainable}
        # would drop the frozen encoder
        params = merge_vae(trainable, frozen)
        if "unet_lora" in trainable:
            from genpercept_tpu.train.lora import apply_lora

            params["unet"] = apply_lora(params["unet"], trainable["unet_lora"])
        rgb = batch["rgb_norm"].astype(cfg.compute_dtype)  # (B,H,W,3) in [-1,1]
        gt = batch["gt_norm"].astype(cfg.compute_dtype)    # (B,H,W,3) in [-1,1]
        valid = batch["valid_mask"]                        # (B,H,W) bool
        bsz = rgb.shape[0]

        rgb_latent = jax.lax.stop_gradient(vae_encode(params["vae"], rgb, vae_cfg))
        gt_latent = jax.lax.stop_gradient(vae_encode(params["vae"], gt, vae_cfg))

        if cfg.fix_timesteps is not None:
            t = jnp.full((bsz,), cfg.fix_timesteps, jnp.int32)
        else:
            rng, tkey = jax.random.split(rng)
            t = jax.random.randint(tkey, (bsz,), 0, cfg.num_train_timesteps)

        if cfg.arch in ("genpercept", "rgb_blending"):
            noise = rgb_latent
        else:
            rng, nkey = jax.random.split(rng)
            if cfg.multi_res_noise_strength is not None:
                from genpercept_tpu.train.noise import multi_res_noise_like

                strength = cfg.multi_res_noise_strength
                if cfg.multi_res_noise_annealed:
                    strength = strength * (
                        t.astype(jnp.float32) / cfg.num_train_timesteps
                    ).reshape(-1, 1, 1, 1)
                noise = multi_res_noise_like(
                    nkey, gt_latent.shape, strength,
                    cfg.multi_res_noise_strategy, cfg.compute_dtype,
                )
            else:
                noise = jax.random.normal(nkey, gt_latent.shape, cfg.compute_dtype)

        # add_noise/get_velocity mix in f32 scheduler coefficients, which
        # silently PROMOTES the whole downstream UNet + VAE-decode graph to
        # f32 (2x the activation memory and half the MXU rate) — cast back
        # to the compute dtype at the boundary. The target stays f32: it
        # only feeds the (f32) latent losses, never the network.
        noisy = add_noise(sched, gt_latent, noise, t).astype(cfg.compute_dtype)
        target = get_velocity(sched, gt_latent, noise, t)
        unet_in = (
            jnp.concatenate([rgb_latent, noisy], axis=-1)
            if cfg.arch == "marigold"
            else noisy
        )

        text = jnp.broadcast_to(
            params["text_embed"].astype(cfg.compute_dtype),
            (bsz,) + params["text_embed"].shape[-2:],
        )

        aux: Dict[str, jax.Array] = {}
        total = jnp.float32(0.0)

        mask_latent = downscale_valid_mask(valid)[..., None]  # (B,h,w,1)

        if use_head:
            feats = _unet_feats(params["unet"], unet_in, t, text)
            head_pred = dpt_head_apply(params["dpt_head"], feats[::-1], dpt_cfg)
            pred_px = head_pred  # (B,H,W)
        else:
            v = _unet_plain(params["unet"], unet_in, t, text)
            for name in cfg.loss_names:
                if not name.startswith("latent"):
                    continue
                vm = jnp.broadcast_to(mask_latent, v.shape)
                v32, t32 = v.astype(jnp.float32), target.astype(jnp.float32)
                # masked latent-loss zoo (reference util/loss.py get_loss,
                # applied under the latent valid mask at
                # genpercept_trainer.py:695-715)
                if name in ("latent_mse", "latent_mse_loss"):
                    l = L.masked_mse(v32, t32, vm)
                elif name in ("latent_l1", "latent_l1_loss",
                              "latent_l1_loss_with_mask"):
                    l = L.masked_l1(v32, t32, vm)
                elif name == "latent_mean_abs_rel":
                    mm = vm.astype(jnp.float32)
                    rel = jnp.abs(v32 - t32) / jnp.maximum(jnp.abs(t32), 1e-6)
                    l = jnp.sum(rel * mm) / (jnp.sum(mm) + 1e-6)
                else:
                    raise ValueError(name)
                aux[name] = l
                total += l
            pixel_losses = [n for n in cfg.loss_names
                            if not n.startswith("latent")]
            if not pixel_losses:
                return total, aux
            decoded = vae_decode(params["vae"], -v, vae_cfg,
                                 remat=cfg.remat_vae_decode)  # grads flow
            pred_px = jnp.mean(decoded, axis=-1) if cfg.mode == "depth" else decoded

        # pixel-space losses (reference :760-805)
        if cfg.mode == "depth":
            pred = pred_px.astype(jnp.float32) + 2.0  # shift [-1,1] -> [1,3]
            targ = gt[..., 0].astype(jnp.float32) + 2.0
            m = valid
            for name in cfg.loss_names:
                if name.startswith("latent"):
                    continue
                if name == "mse":
                    l, w = L.masked_mse(pred, targ, m), 1.0
                elif name == "ssi":
                    l, w = L.ssi_loss(pred, targ, m, "least_square"), 0.5
                elif name == "ssi_medium":
                    l, w = L.ssi_loss(pred, targ, m, "medium"), 0.5
                elif name == "grad":
                    l, w = L.gradient_loss(pred, targ, m), 2.0
                elif name == "l1":
                    l, w = L.masked_l1(pred, targ, m), 1.0
                elif name in ("vnl", "hdnr", "hdsnr"):
                    from genpercept_tpu.train import metric3d_losses as M3D

                    rng, lkey = jax.random.split(rng)
                    if name == "vnl":
                        l = M3D.vnl_loss(pred, targ, m, batch["intrinsic"], lkey)
                    elif name == "hdnr":
                        l = M3D.hdnl_random_loss(pred, targ, m, lkey)
                    else:
                        l = M3D.hdsnl_random_loss(pred, targ, m, lkey)
                    w = 1.0
                else:
                    raise ValueError(name)
                aux[name] = l
                total += w * l
        else:
            pred = pred_px.astype(jnp.float32)
            if pred.ndim == 3:
                pred = jnp.repeat(pred[..., None], 3, axis=-1)
            targ = gt.astype(jnp.float32)
            m = valid
            for name in cfg.loss_names:
                if name.startswith("latent"):
                    continue
                if name == "mse":
                    l, w = L.masked_mse(pred, targ, m[..., None] & jnp.ones_like(pred, bool)), 1.0
                elif name == "l1":
                    l, w = L.masked_l1(pred, targ, m[..., None] & jnp.ones_like(pred, bool)), 1.0
                elif name == "angular":
                    l, w = L.angular_loss(pred, targ, m), 1.0
                else:
                    raise ValueError(name)
                aux[name] = l
                total += w * l

        return total, aux

    return loss_fn


def split_trainable(
    params: Dict, cfg: TrainConfig, rng=None
) -> Tuple[Dict, Dict]:
    """Partition the param tree into (trainable, frozen) per the
    trainability matrix (genpercept_trainer.py:176-244). With
    `unet_lora_rank` set, the base UNet is frozen and a fresh LoRA tree
    becomes the trainable unet part."""
    trainable, frozen = {}, {}
    lora_mode = cfg.unet_lora_rank is not None
    if lora_mode:
        from genpercept_tpu.train.lora import init_lora

        trainable["unet_lora"] = init_lora(
            rng if rng is not None else jax.random.key(0),
            params["unet"], cfg.unet_lora_rank,
        )
    for k, v in params.items():
        train = (
            (k == "unet" and cfg.train_unet and not lora_mode)
            or (k == "dpt_head" and cfg.train_dpt_head)
        )
        if k == "vae" and cfg.train_vae_decoder:
            tv = {kk: vv for kk, vv in v.items() if kk in ("decoder", "post_quant_conv")}
            fv = {kk: vv for kk, vv in v.items() if kk not in tv}
            trainable["vae"] = tv
            frozen["vae"] = fv
            continue
        (trainable if train else frozen)[k] = v
    return trainable, frozen


def merge_vae(trainable: Dict, frozen: Dict) -> Dict:
    """Re-merge a split vae subtree before apply (loss_fn does {**f, **t},
    which would drop the frozen vae encoder if vae is in both)."""
    merged = {**frozen, **trainable}
    if "vae" in trainable and "vae" in frozen:
        merged["vae"] = {**frozen["vae"], **trainable["vae"]}
    return merged


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched = iter_exponential_schedule(
        cfg.lr, cfg.lr_total_iter_length, cfg.lr_final_ratio, cfg.lr_warmup_steps
    )
    adam = optax.adam(sched, b1=cfg.adam_b1, b2=cfg.adam_b2,
                      mu_dtype=cfg.adam_mu_dtype)
    if cfg.decoder_lr is None or cfg.decoder_lr == cfg.lr:
        return adam
    # Per-group learning rate for the decoder parts — custom head and/or
    # trained VAE decoder — like the reference's Adam param groups
    # (genpercept_trainer.py:266-274, config `decoder_lr`). Adam's update is
    # lr * m_hat/(sqrt(v_hat)+eps), so scaling the post-adam update by
    # decoder_lr/lr on those subtrees is EXACTLY a second param group with
    # decoder_lr under the shared IterExponential lambda.
    ratio = cfg.decoder_lr / cfg.lr

    def labels(tree):
        return {k: jax.tree.map(
            lambda _: "decoder" if k in ("dpt_head", "vae") else "main", v)
            for k, v in tree.items()}

    return optax.chain(
        adam,
        optax.multi_transform(
            {"main": optax.identity(), "decoder": optax.scale(ratio)},
            labels,
        ),
    )


def init_train_state(params: Dict, cfg: TrainConfig, rng=None):
    trainable, frozen = split_trainable(params, cfg, rng)
    if cfg.master_dtype is not None:
        trainable = jax.tree.map(
            lambda x: x.astype(cfg.master_dtype), trainable
        )
    tx = make_optimizer(cfg)
    opt_state = tx.init(trainable)
    return trainable, frozen, tx, opt_state


def build_train_step(cfg: TrainConfig, models, tx: optax.GradientTransformation):
    """Returns step(trainable, frozen, opt_state, batch, rng) ->
    (trainable, opt_state, metrics).

    With grad_accum_steps > 1 the batch's leading axis must be
    (accum, micro_batch, ...) and grads accumulate through a lax.scan.
    """
    loss_fn = build_loss_fn(cfg, models)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(trainable, frozen, opt_state, batch, rng):
        if cfg.grad_accum_steps > 1:
            rngs = jax.random.split(rng, cfg.grad_accum_steps)

            def accum(carry, xs):
                grads_acc, loss_acc, aux_acc = carry
                micro_batch, micro_rng = xs
                (loss, aux), grads = grad_fn(trainable, frozen, micro_batch, micro_rng)
                grads_acc = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), grads_acc, grads
                )
                aux_acc = jax.tree.map(
                    lambda a, v: a + v.astype(jnp.float32), aux_acc, aux
                )
                return (grads_acc, loss_acc + loss, aux_acc), None

            zero = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), trainable
            )
            # per-loss aux survives accumulation (the reference logs each
            # component; genpercept_trainer.py:845-863)
            micro0 = jax.tree.map(lambda x: x[0], batch)
            aux_sd = jax.eval_shape(grad_fn, trainable, frozen, micro0, rngs[0])[0][1]
            zero_aux = jax.tree.map(
                lambda s: jnp.zeros(s.shape, jnp.float32), aux_sd
            )
            (grads, loss, aux), _ = jax.lax.scan(
                accum, (zero, jnp.float32(0.0), zero_aux), (batch, rngs)
            )
            grads = jax.tree.map(lambda g: g / cfg.grad_accum_steps, grads)
            loss = loss / cfg.grad_accum_steps
            aux = jax.tree.map(lambda a: a / cfg.grad_accum_steps, aux)
        else:
            (loss, aux), grads = grad_fn(trainable, frozen, batch, rng)

        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics = {"loss": loss, **aux}
        return trainable, opt_state, metrics

    return step
