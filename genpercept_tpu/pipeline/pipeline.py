"""The GenPercept inference pipeline, TPU-first.

Functional equivalent of the reference `GenPerceptPipeline.__call__`
(`genpercept/genpercept_pipeline.py:146-337`), redesigned so that the whole
hot path — normalize, VAE encode, UNet, decode (VAE or DPT head), task
postprocess — is ONE jitted XLA program over static shapes, batched and
shardable over a device mesh. Host code only decodes/encodes image files and
picks static shapes.

Inference math (genpercept arch):
    z_rgb = 0.18215 * mean(vae.encode(2*rgb - 1))
    v     = unet(z_rgb, t=1, empty_text_embed)
    z_pred = -v                                 # beta==1 scheduler algebra
    pred  = vae.decode(z_pred) -> clip [-1,1] -> (x+1)/2  [channel-mean for
            depth/matting/dis/disparity]
or, with a DPT head:
    feats = unet(z_rgb, ..., return_features)[::-1]
    pred  = minmax(dpt_head(feats))
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genpercept_tpu.diffusion import (
    GENPERCEPT_SCHEDULER,
    SchedulerConfig,
    ddim_step,
    leading_timesteps,
    make_scheduler,
)
from genpercept_tpu.models import (
    CLIPTextConfig,
    DPTHeadConfig,
    UNetConfig,
    VAEConfig,
    clip_text_apply,
    dpt_head_apply,
    unet_apply,
    vae_decode,
    vae_encode,
)
from genpercept_tpu.models.clip_text import SD21_CLIP_TEXT, empty_prompt_ids
from genpercept_tpu.ops.colorize import colorize_depth
from genpercept_tpu.ops.resize import max_res_shape, resize
from genpercept_tpu.pipeline.tasks import TASKS, TaskSpec


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    mode: str = "depth"
    arch: str = "genpercept"  # genpercept | rgb_blending | marigold
    processing_res: int = 768  # 0 = keep input resolution
    match_input_res: bool = True
    denoising_steps: int = 1
    ensemble_size: int = 1
    fix_timesteps: Optional[int] = None
    resample_method: str = "bilinear"
    dtype: Any = jnp.float32
    # Pallas fused GN+SiLU+conv resblocks in the VAE (ops/fused_conv.py).
    # Measured SLOWER than XLA's composition on v5e (12.0 vs 15.8 img/s
    # end-to-end at 768^2 b16): XLA's conv emitter runs at ~206 TFLOP/s and
    # fuses the normalize+SiLU well enough that the hand-written implicit
    # GEMM loses more on the 9 shifted-window matmuls than it saves in HBM
    # traffic. Kept as an off-by-default experimental path.
    fused_vae: bool = False
    # W8A8 int8 VAE convolutions (ops/quant.py): the v5e MXU runs s8 at 2x
    # the bf16 rate and the bf16 VAE is already at ~90% MFU, so this is the
    # main single-chip throughput lever. Calibrates per-channel activation
    # scales on the FIRST batch (one extra full-precision pass), then runs
    # every resnet/up/down conv in both VAE halves in int8. The reference
    # has no analogue (fp16 autocast only).
    int8_vae: bool = False
    int8_margin: float = 1.1
    # Additionally quantize the UNet's resnet/down/up convs (flash
    # attention, conv_in/out and the time embedding stay bf16). Valid at
    # inference because the timestep is fixed, so activation ranges are
    # static. Implies the same fidelity caveat as int8_vae; requires
    # int8_vae. Measured on v5e at 768^2 b16: 19.12 (VAE only) -> 19.58
    # img/s, fidelity unchanged.
    int8_unet: bool = False
    # Also quantize the transformer projection / GEGLU matmuls. Measured
    # SLOWER end-to-end (19.16 vs 19.58 img/s): QDense displaces the fused
    # GEGLU Pallas kernel and adds quant/dequant VPU work on
    # bandwidth-light matmuls that XLA already runs near peak. Kept for
    # memory-bound deployments (halves UNet transformer weight traffic).
    int8_unet_dense: bool = False
    # Quantize ONLY the GEGLU feed-forward matmuls and run each FF as one
    # Pallas program with s8 MXU matmuls and VMEM-resident intermediates
    # (ops/fused_ff.py::fused_geglu_ff_int8) — the fix for the
    # int8_unet_dense negative result above: the quantization now lives
    # INSIDE the fused kernel instead of displacing it. Attention
    # projections stay bf16 (they were the losing part of int8_unet_dense).
    # Requires int8_unet; subsumed by int8_unet_dense when that is set.
    # Measured (scripts/stress_int8_ff.py --part throughput, same-process
    # alternating A/B, 2026-08-20): +0.2 img/s (18.37 vs 18.16) at
    # mean_dev 4.98e-3 vs 4.93e-3, stable over 5 reps. The round-4
    # "worker crash" shelving was root-caused to a retryable cold-compile
    # transport error, not a kernel fault (200 isolated + 20 composite
    # dispatches clean) — bench.py's rung 0 now runs with this on.
    int8_unet_ff: bool = False
    # Calibration refinements (both computed inside the one calibration
    # program, no extra compile pass): per-channel MSE-optimal clip search
    # instead of absmax*margin, and bias correction (fold the measured
    # per-output-channel mean quantization error E[y_fp - y_int8] into the
    # quantized bias). Roughly halves the int8-vs-bf16 deviation at no
    # runtime cost; off only for A/B against the plain absmax scheme.
    int8_refine: bool = True
    # After calibration, run the quantized pipeline once on the calibration
    # batch and compare against the full-precision prediction already in
    # hand (the same probe bench.py gates its rungs with): logs a warning
    # and records GenPerceptPipeline.int8_mean_dev if the deviation
    # exceeds 1e-2 on the deployment's OWN data. One extra batch-forward
    # on the first batch only; no new compile (the quantized program runs
    # every later batch anyway).
    int8_selfcheck: bool = True
    # Asymmetric (zero-point) per-channel ACTIVATION quantization
    # (ops/quant.py::mse_optimal_clip_asym). The quantized conv inputs sit
    # after GroupNorm+SiLU whose output is bounded below (-0.278) but not
    # above; symmetric quantization wastes the never-used half of the
    # range, and the measured full-placement error is activation-side
    # dominated (profile_int8_vae --attribution: a-only 1.98e-2 vs w-only
    # 9.4e-3 of the 2.09e-2 total). Exact algebra: quantize the shifted
    # input (x - zp), fold sum(zp*w_hat) into the bias, and pad the int8
    # code tensor with the exact code of real 0 so the conv's padding
    # decodes correctly (ops/quant.py::qconv_apply). Measured at the
    # exclude-encoder placement (full decoder incl. 128ch tail + UNet
    # convs int8): mean dev 8.4e-3 at 18.16 img/s — the symmetric scheme
    # needs the decoder tail excluded to stay under the 1e-2 bar.
    int8_asymmetric: bool = True
    # GPTQ error-compensated weight rounding (Frantar et al. 2022;
    # ops/quant.py::gptq_round) for the VAE convs: the calibration program
    # additionally accumulates each conv input's code-domain Gram matrix
    # (conv_input_hessian) and the weights round with sequential error
    # compensation instead of round-to-nearest. Zero runtime cost (same
    # int8 tensors); calibration-time only. On-chip A/B
    # (sweep_int8_placements --gptq, 2026-08-20): a consistent -8..9%
    # mean deviation at every placement (default 7.05e-3 -> 6.46e-3,
    # enc_012 9.57 -> 8.71e-3, everything-int8 9.97 -> 9.03e-3 — GPTQ
    # flips the all-int8 placement under the 1e-2 bar) — but the
    # Gram-collecting calibration runs 12x longer (2881 s vs 236 s at
    # 768^2 b16: chunk-1 chunks + ~85 MB/layer Gram D2H). Off by default
    # because the fidelity margin is already ample at the default
    # placement; enable it (ideally with save_calibration to amortize the
    # one-time cost) for deployments at thin-margin placements or
    # heavy-tailed trained checkpoints.
    int8_gptq: bool = False
    # Per-output-channel MSE clip search on the activation-folded WEIGHTS
    # (ops/quant.py::_mse_optimal_clip_cols). Measured on the heavy-tail
    # surrogate (scripts/profile_int8_vae.py --heavy_tails --weight_clip):
    # at 8-bit weight granularity absmax is already MSE-optimal for
    # t(4)-tailed channel-scaled weights (the clip search picks frac=1.0
    # per column), so this defaults OFF; it exists for extreme-outlier
    # checkpoints and for 4-bit experiments where clipping does pay.
    int8_weight_clip: bool = False
    # Quantize the VAE mid-block d=512 single-head attention: s8 QK^T/PV
    # inside the flash kernel (ops/flash_attention.py::flash_attention_int8)
    # + int8 to_q/k/v/out projections via the dense hooks. This is the one
    # attention where the matmuls dominate (512-deep contractions); the
    # UNet's d=64 attention is VPU-bound and stays bf16. Requires int8_vae.
    int8_vae_attn: bool = False
    # Placement: layers whose path contains any of these substrings stay
    # full precision. The default is the "enc_deep" point of the v5e
    # placement sweep (scripts/sweep_int8_placements.py + bench.py
    # BENCH_PLACEMENT, asym chunk-2, 2026-08-20; full table in README):
    # int8 everywhere EXCEPT the encoder's high-res down-blocks 0-1 (their
    # 768^2/384^2 x128 shapes don't profit from s8) and the decoder's
    # 128-ch tail — 21.93 img/s in the bench harness at mean dev 6.0e-3
    # in-run / 7.1e-3 cross-batch, a ~30% margin under the 1e-2 bar.
    # The VAE *encoder* is the dominant fidelity cost (latent-space errors
    # amplify through the whole UNet+decoder chain): quantizing down 0-1-2
    # too ("enc_012", 22.70 img/s) thins the margin to 9.9e-3 cross-batch,
    # and everything-int8 fails the bar at 1.02e-2. Maximum-fidelity
    # placement: ("encoder.", "decoder.up_blocks.3.") at 4.8e-3 (the
    # round-2..4 default, ~2 img/s slower). Throughput/fidelity points are
    # only comparable within one harness — the sweep's heavyweight process
    # measures the SAME program ~8% slower than bench.py (round-4's
    # "encoder int8 is a throughput loss" was that cross-harness artifact).
    int8_exclude: tuple = ("encoder.down_blocks.0.",
                           "encoder.down_blocks.1.",
                           "decoder.up_blocks.3.")

    def __post_init__(self):
        if self.arch == "genpercept":
            # reference enforces steps==1, ensemble==1 (run.py:209-211)
            assert self.denoising_steps == 1 and self.ensemble_size == 1
        if self.int8_unet:
            assert self.int8_vae, "int8_unet rides the int8_vae calibration"

    @property
    def task(self) -> TaskSpec:
        return TASKS[self.mode]

    @property
    def scheduler(self) -> SchedulerConfig:
        if self.arch == "genpercept":
            return GENPERCEPT_SCHEDULER
        return SchedulerConfig()  # SD2.1 default betas for marigold arch


@dataclasses.dataclass
class GenPerceptModels:
    """Parameter pytrees + static configs for one checkpoint."""

    unet: Dict[str, Any]
    vae: Dict[str, Any]
    unet_cfg: UNetConfig = UNetConfig()
    vae_cfg: VAEConfig = VAEConfig()
    text_embed: Optional[jax.Array] = None  # precomputed (1, 77, 1024)
    clip: Optional[Dict[str, Any]] = None
    clip_cfg: CLIPTextConfig = SD21_CLIP_TEXT
    dpt_head: Optional[Dict[str, Any]] = None
    dpt_cfg: DPTHeadConfig = DPTHeadConfig()
    tokenizer: Optional[Any] = None  # utils.tokenizer.CLIPTokenizer

    def get_text_embed(self) -> jax.Array:
        """Empty-prompt CLIP embedding, cached (reference
        genpercept_pipeline.py:360-372)."""
        if self.text_embed is None:
            assert self.clip is not None, "need CLIP params or a precomputed embed"
            self.text_embed = clip_text_apply(
                self.clip, empty_prompt_ids(self.clip_cfg), self.clip_cfg
            )
        return self.text_embed

    def encode_prompt(self, prompt: str) -> jax.Array:
        """CLIP embedding for an arbitrary prompt (reference infer.py
        --prompt). Needs CLIP params; non-empty prompts also need the
        checkpoint's tokenizer files."""
        if not prompt:
            return self.get_text_embed()
        assert self.clip is not None, "custom prompts need CLIP params"
        assert self.tokenizer is not None, "custom prompts need tokenizer files"
        ids = jnp.asarray(self.tokenizer(prompt), jnp.int32)
        return clip_text_apply(self.clip, ids, self.clip_cfg)

    def params(self) -> Dict[str, Any]:
        p = {"unet": self.unet, "vae": self.vae, "text_embed": self.get_text_embed()}
        if self.dpt_head is not None:
            p["dpt_head"] = self.dpt_head
        return p


def build_single_infer(models: GenPerceptModels, cfg: PipelineConfig,
                       quant_mode: Optional[str] = None):
    """Returns a jittable fn(params, rgb_01, noise=None) -> prediction.

    rgb_01: (B, H, W, 3) float in [0, 1] at processing resolution
    (H, W multiples of 8). Returns (B, H, W) or (B, H, W, 3) in [0, 1].
    Equivalent to reference `single_infer` (genpercept_pipeline.py:374-486).

    quant_mode (int8 VAE, ops/quant.py):
      None        — full-precision VAE convs.
      "calibrate" — full precision, but also returns per-conv input absmax
                    stats: fn -> (pred, {"enc": {...}, "dec": {...}}).
      "quant"     — expects params["vae_quant"] = {"enc": qtree, "dec": qtree}
                    and runs the calibrated convs in int8.
      "fake:w" / "fake:a" — diagnostic: full-precision conv with only the
                    weight / activation side of the quantization simulated
                    (error attribution; same params["vae_quant"] contract).
    """
    task = cfg.task
    unet_cfg, vae_cfg, dpt_cfg = models.unet_cfg, models.vae_cfg, models.dpt_cfg
    sched_cfg = cfg.scheduler
    sched = make_scheduler(sched_cfg)
    if cfg.fix_timesteps:
        ts = np.full((cfg.denoising_steps,), cfg.fix_timesteps, np.int64)
    else:
        ts = leading_timesteps(sched_cfg, cfg.denoising_steps)
    use_head = models.dpt_head is not None
    compute_dtype = cfg.dtype
    fused = cfg.fused_vae

    def single_infer(params, rgb, noise: Optional[jax.Array] = None):
        from genpercept_tpu.ops.quant import (
            make_calib_conv_fn,
            make_calib_dense_fn,
            make_quant_conv_fn,
            make_quant_dense_fn,
        )

        u_conv = u_dense = None
        enc_dense = dec_dense = None
        vattn = False  # s8 flash attention only on the real quantized path
        if quant_mode == "calibrate":
            enc_stats, dec_stats, unet_stats = {}, {}, {}
            refine = cfg.int8_refine
            corr = {"enc": {}, "dec": {}, "unet": {}} if refine else None
            # GPTQ Hessians for the VAE groups only — the UNet's
            # 1280-channel convs would need 530 MB of Gram each
            hess = {"enc": {}, "dec": {}} if cfg.int8_gptq else None
            kw = dict(clip_search=refine,
                      margin=1.0 if refine else cfg.int8_margin,
                      weight_clip=cfg.int8_weight_clip,
                      asymmetric=cfg.int8_asymmetric)
            enc_fn = make_calib_conv_fn(
                enc_stats, corr=corr["enc"] if refine else None,
                hess=hess["enc"] if hess else None, **kw)
            dec_fn = make_calib_conv_fn(
                dec_stats, corr=corr["dec"] if refine else None,
                hess=hess["dec"] if hess else None, **kw)
            if cfg.int8_vae_attn:
                enc_dense = make_calib_dense_fn(
                    enc_stats, corr=corr["enc"] if refine else None,
                    hess=hess["enc"] if hess else None, **kw)
                dec_dense = make_calib_dense_fn(
                    dec_stats, corr=corr["dec"] if refine else None,
                    hess=hess["dec"] if hess else None, **kw)
            if cfg.int8_unet:
                ucorr = corr["unet"] if refine else None
                u_conv = make_calib_conv_fn(unet_stats, corr=ucorr, **kw)
                if cfg.int8_unet_dense:
                    u_dense = make_calib_dense_fn(unet_stats, corr=ucorr, **kw)
                elif cfg.int8_unet_ff:
                    # record stats only for the GEGLU FF matmuls; attention
                    # projections pass through full precision uncalibrated
                    inner_fn = make_calib_dense_fn(unet_stats, corr=ucorr,
                                                   **kw)

                    def u_dense(name, p, x, _f=inner_fn):
                        if ".ff.net." in name:
                            return _f(name, p, x)
                        from genpercept_tpu.ops.attention import (
                            attention_projection)
                        return attention_projection(x, p["weight"],
                                                    p.get("bias"))
        elif quant_mode == "quant":
            enc_fn = make_quant_conv_fn(params["vae_quant"]["enc"])
            dec_fn = make_quant_conv_fn(params["vae_quant"]["dec"])
            if cfg.int8_vae_attn:
                vattn = True
                enc_dense = make_quant_dense_fn(params["vae_quant"]["enc"])
                dec_dense = make_quant_dense_fn(params["vae_quant"]["dec"])
            if cfg.int8_unet:
                u_conv = make_quant_conv_fn(params["vae_quant"]["unet"])
                if cfg.int8_unet_dense or cfg.int8_unet_ff:
                    # for int8_unet_ff the qtree only holds .ff.net. paths;
                    # everything else falls back to full precision, and
                    # feed_forward fuses fully-quantized FFs into one
                    # Pallas program via dense_fn.qtree
                    u_dense = make_quant_dense_fn(params["vae_quant"]["unet"])
        elif quant_mode is not None and quant_mode.startswith("fake:"):
            from genpercept_tpu.ops.quant import make_fakequant_conv_fn

            side = quant_mode.split(":", 1)[1]
            enc_fn = make_fakequant_conv_fn(params["vae_quant"]["enc"], side)
            dec_fn = make_fakequant_conv_fn(params["vae_quant"]["dec"], side)
            if cfg.int8_unet:
                u_conv = make_fakequant_conv_fn(
                    params["vae_quant"]["unet"], side)
        else:
            enc_fn = dec_fn = None

        def finish(pred):
            if quant_mode == "calibrate":
                out = {"enc": enc_stats, "dec": dec_stats, "unet": unet_stats}
                if corr is not None:
                    out["corr"] = corr
                if hess is not None:
                    out["hess"] = hess
                return pred, out
            return pred

        def attn_kept(path):
            return not any(e in path for e in cfg.int8_exclude)

        rgb_norm = (rgb.astype(compute_dtype) * 2.0 - 1.0)
        rgb_latent = vae_encode(
            params["vae"], rgb_norm, vae_cfg, fused=fused, conv_fn=enc_fn,
            attn_int8=vattn and attn_kept("encoder.mid_block.attentions.0"),
            dense_fn=enc_dense)
        text = jnp.broadcast_to(
            params["text_embed"].astype(compute_dtype),
            (rgb.shape[0],) + params["text_embed"].shape[-2:],
        )

        if use_head:
            t = jnp.asarray(ts[0], jnp.int32)
            _, feats = unet_apply(
                params["unet"], rgb_latent, t, text, unet_cfg,
                return_features=True, conv_fn=u_conv, dense_fn=u_dense,
            )
            pred = dpt_head_apply(params["dpt_head"], feats[::-1], dpt_cfg)
            # per-image min-max (reference :481 normalizes over the batch
            # tensor; batches there are per-image)
            lo = jnp.min(pred, axis=(1, 2), keepdims=True)
            hi = jnp.max(pred, axis=(1, 2), keepdims=True)
            return finish(
                ((pred - lo) / jnp.maximum(hi - lo, 1e-6)).astype(jnp.float32))

        if cfg.arch in ("genpercept", "rgb_blending"):
            pred_latent = rgb_latent
        else:  # marigold: stochastic init
            assert noise is not None, "marigold arch needs initial noise"
            pred_latent = noise.astype(compute_dtype)

        if cfg.arch == "genpercept":
            t = jnp.asarray(ts[0], jnp.int32)
            v = unet_apply(params["unet"], pred_latent, t, text, unet_cfg,
                           conv_fn=u_conv, dense_fn=u_dense)
            pred_latent = -v  # beta==1: pred_original_sample == -noise_pred
        else:
            eight_ch = cfg.arch == "marigold"
            for t_host in ts:
                t = jnp.asarray(t_host, jnp.int32)
                unet_in = (
                    jnp.concatenate([rgb_latent, pred_latent], axis=-1)
                    if eight_ch
                    else pred_latent
                )
                v = unet_apply(params["unet"], unet_in, t, text, unet_cfg,
                               conv_fn=u_conv, dense_fn=u_dense)
                pred_latent, pred_x0 = ddim_step(
                    sched_cfg, sched, v, jnp.broadcast_to(t, (rgb.shape[0],)),
                    pred_latent, cfg.denoising_steps,
                )
                # ddim_step mixes f32 scheduler coefficients, which would
                # silently promote every later UNet pass + the decode to f32
                pred_latent = pred_latent.astype(compute_dtype)
            pred_latent = pred_x0.astype(compute_dtype)

        decoded = vae_decode(
            params["vae"], pred_latent, vae_cfg, fused=fused, conv_fn=dec_fn,
            attn_int8=vattn and attn_kept("decoder.mid_block.attentions.0"),
            dense_fn=dec_dense)
        if task.channel_mean:
            decoded = jnp.mean(decoded, axis=-1)
        pred = jnp.clip(decoded, -1.0, 1.0)
        return finish(((pred + 1.0) / 2.0).astype(jnp.float32))

    return single_infer


@dataclasses.dataclass
class GenPerceptOutput:
    pred_np: np.ndarray  # (H, W) or (H, W, 3) float in [0, 1]
    pred_colored: Optional[np.ndarray]  # (H, W, 3) uint8 or None
    # per-pixel ensemble disagreement (median abs deviation of the aligned
    # members, in merged-output units) — populated when ensemble_size > 1,
    # like the reference's `uncertainty` (genpercept_pipeline.py:289-298,
    # util/ensemble.py:124-140)
    uncertainty: Optional[np.ndarray] = None


class GenPerceptPipeline:
    """Host-side orchestration: file-shaped inputs in, predictions out.

    Thin wrapper over the jitted `single_infer`; handles resize to
    processing resolution, ensembling, resize back, and colorization
    (all resize/colorize also run on device).
    """

    def __init__(self, models: GenPerceptModels, cfg: PipelineConfig,
                 mesh: Optional[jax.sharding.Mesh] = None):
        """mesh: optional 1-axis device mesh for data-parallel inference —
        parameters are replicated once, each device batch is sharded over
        the mesh's first axis, and XLA runs the identical program per chip
        with no collectives in the hot path (the TPU answer to multi-GPU
        serving). Multi-chip throughput is a PROJECTION from the measured
        single-chip rate (no collectives + per-chip-identical programs =>
        ~linear): this environment has one real chip; `cli.serve
        --data_parallel` / `cli.run --data_parallel` are the paths that
        measure it on real multi-chip hardware without code changes."""
        self.models = models
        self.cfg = cfg
        self.mesh = mesh
        self._params = models.params()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._repl = NamedSharding(mesh, P())
            self._data = NamedSharding(mesh, P(mesh.axis_names[0]))
            self._params = jax.device_put(self._params, self._repl)
        self._infer = jax.jit(
            build_single_infer(models, cfg, "quant" if cfg.int8_vae else None))
        self._calibrated = not cfg.int8_vae
        self.int8_mean_dev = None  # set by the post-calibration self-check
        if cfg.int8_vae:
            self._calib_infer = jax.jit(
                build_single_infer(models, cfg, "calibrate"))

    @property
    def n_data_shards(self) -> int:
        return 1 if self.mesh is None else self.mesh.devices.size

    def _shard_batch(self, x: jax.Array) -> jax.Array:
        """Lay a (B, ...) array out over the mesh's data axis (B padded to a
        multiple of the shard count by the caller)."""
        if self.mesh is None:
            return x
        return jax.device_put(x, self._data)

    def _run(self, x: jax.Array, noise: Optional[jax.Array] = None):
        """Dispatch one device batch; with int8_vae the first batch runs the
        full-precision calibration pass (returning its prediction) and
        builds the int8 weight tree used by every later batch."""
        if x.shape[0] % self.n_data_shards == 0:
            x = self._shard_batch(x)
            if noise is not None:
                noise = self._shard_batch(noise)
        if not self._calibrated:
            from genpercept_tpu.ops.quant import (
                apply_bias_correction, calibrate_chunked, quantize_from_stats)

            # calibration holds ~2x the inference program's activations
            # (stat temps + in-trace quantized convs) — run it in chunks
            # per data shard so the first batch fits HBM at the same batch
            # size every later batch uses: 4 images/shard symmetric, 2 with
            # asymmetric stats (the endpoint-shrink clip search triples the
            # per-candidate temps; chunk 4 asym OOMs 16 GB, measured
            # 2026-08-19) or with the GPTQ Grams resident
            chunk = (2 if (self.cfg.int8_gptq or self.cfg.int8_asymmetric)
                     else 4) * self.n_data_shards
            pred, stats = calibrate_chunked(
                self._calib_infer, self._params, x, noise, chunk=chunk)
            m = 1.0 if self.cfg.int8_refine else self.cfg.int8_margin
            excl = self.cfg.int8_exclude

            def keep(s):
                return {k: v for k, v in s.items()
                        if not any(e in k for e in excl)}

            wc = self.cfg.int8_weight_clip
            hess = stats.get("hess", {})
            vq = {
                "enc": quantize_from_stats(self.models.vae, keep(stats["enc"]),
                                           m, weight_clip=wc,
                                           hess=hess.get("enc")),
                "dec": quantize_from_stats(self.models.vae, keep(stats["dec"]),
                                           m, weight_clip=wc,
                                           hess=hess.get("dec")),
            }
            if self.cfg.int8_unet:
                vq["unet"] = quantize_from_stats(
                    self.models.unet, keep(stats["unet"]), m,
                    asymmetric_downsample=False, weight_clip=wc)
            if self.cfg.int8_refine:
                vq = {k: apply_bias_correction(v, stats["corr"][k])
                      for k, v in vq.items()}
            if self.mesh is not None:
                vq = jax.device_put(vq, self._repl)
            self._params["vae_quant"] = vq
            self._calibrated = True
            if self.cfg.int8_selfcheck:
                # one untimed quantized forward vs the fp prediction just
                # computed — catches a calibration-numerics problem on the
                # deployment's own data instead of silently serving it
                q_pred = self._infer(self._params, x, noise)
                self.int8_mean_dev = float(jnp.mean(jnp.abs(
                    jnp.asarray(q_pred, jnp.float32)
                    - jnp.asarray(pred, jnp.float32))))
                if self.int8_mean_dev > 1e-2:
                    import logging

                    logging.getLogger(__name__).warning(
                        "int8 self-check: mean deviation %.3e vs full "
                        "precision on the calibration batch exceeds the "
                        "1e-2 bar — consider a shallower int8_exclude "
                        "placement (max fidelity: ('encoder.', "
                        "'decoder.up_blocks.3.')) or int8_gptq",
                        self.int8_mean_dev)
            return pred
        return self._infer(self._params, x, noise)

    def save_calibration(self, path) -> None:
        """Persist the int8 weight tree built by the first (calibration)
        batch; a later process loads it with load_calibration and skips the
        full-precision calibration pass entirely."""
        from genpercept_tpu.ops.quant import save_calibration

        assert self.cfg.int8_vae and self._calibrated, (
            "run at least one batch with int8_vae=True before saving")
        save_calibration(path, jax.device_get(self._params["vae_quant"]))

    def load_calibration(self, path) -> None:
        from genpercept_tpu.ops.quant import load_calibration

        assert self.cfg.int8_vae, "calibration needs int8_vae=True"
        vq = load_calibration(path)
        if self.mesh is not None:
            vq = jax.device_put(vq, self._repl)
        self._params["vae_quant"] = vq
        self._calibrated = True

    def __call__(
        self,
        image: np.ndarray,
        rng: Optional[jax.Array] = None,
        color_map: Optional[str] = "auto",
    ) -> GenPerceptOutput:
        """image: (H, W, 3) uint8 or float [0,1]."""
        cfg = self.cfg
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        h, w = image.shape[:2]
        x = jnp.asarray(image)[None]

        if cfg.processing_res > 0:
            ph, pw = max_res_shape(h, w, cfg.processing_res)
        else:
            ph, pw = h, w
        x = resize(x, (ph, pw), cfg.resample_method, antialias=True)

        # latent dims: three stride-2 convs, each a floor-halving
        lh, lw = ph, pw
        for _ in range(3):
            lh, lw = lh // 2, lw // 2

        e = cfg.ensemble_size
        uncertainty = None
        if e > 1:
            x = jnp.broadcast_to(x, (e, ph, pw, 3))
            if rng is None:
                rng = jax.random.key(0)
            noise = jax.random.normal(rng, (e, lh, lw, 4))
            preds = self._run(x, noise)
            from genpercept_tpu.pipeline.ensemble import ensemble_predictions

            pred, uncertainty = ensemble_predictions(
                preds, return_uncertainty=True)
            pred = pred[None]
        else:
            noise = (
                jax.random.normal(
                    rng if rng is not None else jax.random.key(0), (1, lh, lw, 4)
                )
                if cfg.arch == "marigold"
                else None
            )
            pred = self._run(x, noise)

        if cfg.match_input_res and pred.shape[1:3] != (h, w):
            if pred.ndim == 3:
                pred = resize(pred[..., None], (h, w), cfg.resample_method)[..., 0]
            else:
                pred = resize(pred, (h, w), cfg.resample_method)
            if uncertainty is not None:
                uncertainty = resize(uncertainty[None, ..., None], (h, w),
                                     cfg.resample_method)[0, ..., 0]

        pred = jnp.clip(pred, 0.0, 1.0)

        colored = None
        if color_map == "auto":
            color_map = cfg.task.color_map
        if color_map is not None and pred.ndim == 3:
            colored_dev = colorize_depth(pred[0])
            colored = np.asarray((colored_dev * 255).astype(jnp.uint8))

        pred_np = np.asarray(pred[0])
        return GenPerceptOutput(
            pred_np=pred_np, pred_colored=colored,
            uncertainty=None if uncertainty is None else np.asarray(uncertainty),
        )

    def batch(
        self,
        images: list,
        batch_size: int = 0,
        color_map: Optional[str] = "auto",
    ) -> list:
        """Batched inference over a list of (H, W, 3) arrays: images are
        resized to the processing resolution, grouped into device batches
        (size from the v5e oracle when batch_size=0), run through ONE jitted
        program per batch, then resized back individually. This is where the
        TPU throughput win lands for folder-scale workloads (the reference
        loops images singly, run.py:403)."""
        from genpercept_tpu.utils.batchsize import find_batch_size

        cfg = self.cfg
        assert cfg.processing_res > 0, "batched mode needs a fixed processing res"
        if batch_size <= 0:
            dtype_name = "bfloat16" if cfg.dtype == jnp.bfloat16 else "float32"
            batch_size = find_batch_size(cfg.ensemble_size, cfg.processing_res,
                                         dtype_name) * self.n_data_shards

        # common processing shape: long side = processing_res, square pad-free
        # grouping requires same aspect; group by resized shape
        groups: Dict[tuple, list] = {}
        metas = []
        for idx, image in enumerate(images):
            if image.dtype == np.uint8:
                image = image.astype(np.float32) / 255.0
            h, w = image.shape[:2]
            ph, pw = max_res_shape(h, w, cfg.processing_res)
            groups.setdefault((ph, pw), []).append((idx, image, (h, w)))
            metas.append(None)

        results: list = [None] * len(images)
        for (ph, pw), items in groups.items():
            for start in range(0, len(items), batch_size):
                chunk = items[start : start + batch_size]
                x = jnp.stack([
                    resize(jnp.asarray(im)[None], (ph, pw),
                           cfg.resample_method, antialias=True)[0]
                    for _, im, _ in chunk
                ])
                # pad to a multiple of the mesh's data axis so the batch
                # shards evenly; padded rows are dropped below
                n = self.n_data_shards
                if x.shape[0] % n:
                    pad = n - x.shape[0] % n
                    x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)
                preds = self._run(x)
                preds = jnp.clip(preds, 0.0, 1.0)
                for bi, (idx, _, (h, w)) in enumerate(chunk):
                    pred = preds[bi : bi + 1]
                    if cfg.match_input_res and pred.shape[1:3] != (h, w):
                        if pred.ndim == 3:
                            pred = resize(pred[..., None], (h, w),
                                          cfg.resample_method)[..., 0]
                        else:
                            pred = resize(pred, (h, w), cfg.resample_method)
                    cm = cfg.task.color_map if color_map == "auto" else color_map
                    colored = None
                    if cm is not None and pred.ndim == 3:
                        colored = np.asarray(
                            (colorize_depth(pred[0]) * 255).astype(jnp.uint8)
                        )
                    results[idx] = GenPerceptOutput(
                        pred_np=np.asarray(pred[0]), pred_colored=colored
                    )
        return results
