"""Full-resolution torch golden for the <=1e-2 fidelity bar (VERDICT r3 #6).

The BASELINE bar is per-pixel <=1e-2 vs PyTorch; the published checkpoints
are unreachable in this environment (zero egress), so this script enforces
the bar at PRODUCTION geometry today: it assembles the SD2.1-sized models
from the independent torch oracles (tests/test_{unet,vae}_oracle.py, scaled
to block_out_channels (320,640,1280,1280) / heads (5,10,20,20) / 1024-d
cross-attention), runs the reference inference math end-to-end at 768^2 in
torch fp32 on CPU —

    z = 0.18215 * mean(vae.encode(2*rgb - 1))
    v = unet(z, t=1, ctx); pred = clip(decode(-v)).mean(ch); (pred+1)/2

(genpercept_pipeline.py:374-486 semantics) — and saves the golden npz.
With --compare it rebuilds the SAME weights (fixed torch seeds), runs OUR
jitted pipeline (fp32, highest matmul precision), and enforces the bar.

Weights are deterministic torch-default inits (seeds below), NOT the
published checkpoints — this validates every numerical property of the
stack (wiring, GN eps, attention scaling, timestep embedding, resize) at
full geometry; scripts/parity_real.py covers the real-weights load path
the day weights exist on disk.

Usage:
  python scripts/make_torch_golden.py [--res 768] [--out golden/torch_golden_768.npz]
  python scripts/make_torch_golden.py --compare [--out ...]   # both halves
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SD_C = (320, 640, 1280, 1280)
SD_HEADS = (5, 10, 20, 20)
SD_CTX = 1024
UNET_SEED = 0
VAE_SEED = 1
BAR = 1e-2


def _patched_oracles():
    """tests.test_{unet,vae}_oracle assemblies rebound to SD2.1 geometry
    (their layer classes read module globals at call time)."""
    import tests.test_unet_oracle as TU
    import tests.test_vae_oracle as TV

    TU.C, TU.HEADS, TU.CTX, TU.TEMB = SD_C, SD_HEADS, SD_CTX, SD_C[0] * 4
    TV.C = (128, 256, 512, 512)  # the real SD2.1 VAE channels
    return TU, TV


def build_torch_models():
    import torch

    TU, TV = _patched_oracles()
    torch.manual_seed(UNET_SEED)
    unet = TU.TUNet().eval()
    torch.manual_seed(VAE_SEED)
    vae = TV.TVAE().eval()
    return unet, vae


def golden_inputs(res: int):
    """Deterministic natural-image-like input + text context (CPU jax)."""
    import jax

    from genpercept_tpu.utils.synthetic import natural_like_images

    rgb = np.asarray(natural_like_images(jax.random.key(0), 1, res),
                     np.float32)
    ctx = np.asarray(
        jax.random.normal(jax.random.key(7), (1, 77, SD_CTX)), np.float32)
    return rgb, ctx


def run_torch(res: int, out_path: str) -> dict:
    import torch

    unet, vae = build_torch_models()
    rgb, ctx = golden_inputs(res)

    t0 = time.time()
    with torch.no_grad():
        x = torch.from_numpy(rgb).permute(0, 3, 1, 2) * 2.0 - 1.0
        z = vae.encode(x)
        v, _ = unet(z, torch.tensor([1]), torch.from_numpy(ctx))
        dec = vae.decode(-v)
        pred = dec.mean(dim=1).clamp(-1.0, 1.0)
        pred = (pred + 1.0) / 2.0
    dt = time.time() - t0

    rec = {
        "rgb": rgb,
        "ctx": ctx,
        "z": z.permute(0, 2, 3, 1).numpy(),
        "v": v.permute(0, 2, 3, 1).numpy(),
        "pred": pred.numpy(),
        "meta": json.dumps({
            "res": res, "unet_seed": UNET_SEED, "vae_seed": VAE_SEED,
            "torch": torch.__version__,
            "geometry": {"unet_c": SD_C, "heads": SD_HEADS, "ctx": SD_CTX,
                         "vae_c": [128, 256, 512, 512]},
            "timestep": 1, "torch_seconds": round(dt, 1),
        }),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez_compressed(out_path, **rec)
    print(json.dumps({"op": "torch_golden", "res": res,
                      "seconds": round(dt, 1), "out": out_path,
                      "pred_mean": float(pred.mean()),
                      "pred_std": float(pred.std())}), flush=True)
    return rec


def compare_ours(out_path: str) -> int:
    """Run OUR pipeline on the golden input with the golden weights and
    enforce the bar. Returns a process exit code."""
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from genpercept_tpu.io.weights import torch_module_to_pytree
    from genpercept_tpu.models import UNetConfig, VAEConfig
    from genpercept_tpu.pipeline import (GenPerceptModels, PipelineConfig,
                                         build_single_infer)
    from genpercept_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    with np.load(out_path, allow_pickle=False) as zf:
        golden = {k: zf[k] for k in zf.files}
    meta = json.loads(str(golden["meta"]))
    res = meta["res"]

    unet_t, vae_t = build_torch_models()
    models = GenPerceptModels(
        unet=torch_module_to_pytree(unet_t),
        vae=torch_module_to_pytree(vae_t),
        unet_cfg=UNetConfig(block_out_channels=SD_C,
                            attention_heads=SD_HEADS,
                            cross_attention_dim=SD_CTX),
        vae_cfg=VAEConfig(block_out_channels=(128, 256, 512, 512)),
        text_embed=jnp.asarray(golden["ctx"]),
    )
    del unet_t, vae_t
    cfg = PipelineConfig(mode="depth", dtype=jnp.float32)
    infer = jax.jit(build_single_infer(models, cfg))
    t0 = time.time()
    pred = np.asarray(infer(models.params(), jnp.asarray(golden["rgb"])))
    dt = time.time() - t0

    err = np.abs(pred - golden["pred"])
    rec = {
        "op": "golden_768_parity",
        "backend": jax.default_backend(),
        "seconds": round(dt, 1),
        "mean": float(err.mean()),
        "p99": float(np.percentile(err, 99)),
        "max": float(err.max()),
        "bar": BAR,
        "pass": bool(err.mean() <= BAR),
    }
    print(json.dumps(rec), flush=True)
    return 0 if rec["pass"] else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=768)
    ap.add_argument("--out", default=os.path.join(
        ROOT, "golden", "torch_golden_768.npz"))
    ap.add_argument("--compare", action="store_true",
                    help="also run our pipeline and enforce the bar "
                         "(generates the golden first if missing)")
    ap.add_argument("--force", action="store_true",
                    help="regenerate the golden even if the npz exists")
    args = ap.parse_args()

    if args.force or not os.path.exists(args.out):
        run_torch(args.res, args.out)
    if args.compare:
        sys.exit(compare_ours(args.out))


if __name__ == "__main__":
    main()
