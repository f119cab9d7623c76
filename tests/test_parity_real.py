"""Drive scripts/parity_real.py end-to-end on a tiny published-layout
checkpoint, and cover the unet-only (v2) + base-checkpoint loader
composition (ADVICE r2 medium: load_genpercept_checkpoint used to hard-
require <ckpt>/unet and <ckpt>/vae, so the guangkaixu/genpercept-models
layout could not load at all)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpercept_tpu.io.weights import save_safetensors, to_torch_state_dict
from genpercept_tpu.models import UNetConfig, VAEConfig, init_unet, init_vae

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 128, 128),
    attention_heads=(1, 2, 4, 4),
    cross_attention_dim=48,
)
TINY_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64))


def _unet_config_json(cfg):
    return {
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "num_attention_heads": list(cfg.attention_heads),
        "cross_attention_dim": cfg.cross_attention_dim,
        "down_block_types": ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        "norm_eps": cfg.norm_eps,
    }


@pytest.fixture(scope="module")
def published_ckpt(tmp_path_factory):
    """Full diffusers layout: unet/ + vae/ + empty_text_embed.npy."""
    root = tmp_path_factory.mktemp("ckpt_full")
    ks = jax.random.split(jax.random.key(0), 2)
    unet = init_unet(ks[0], TINY_UNET)
    os.makedirs(root / "unet")
    save_safetensors(to_torch_state_dict(unet),
                     str(root / "unet/diffusion_pytorch_model.safetensors"))
    (root / "unet/config.json").write_text(
        json.dumps(_unet_config_json(TINY_UNET)))
    vae = init_vae(ks[1], TINY_VAE)
    os.makedirs(root / "vae")
    save_safetensors(to_torch_state_dict(vae),
                     str(root / "vae/diffusion_pytorch_model.safetensors"))
    (root / "vae/config.json").write_text(json.dumps({
        "block_out_channels": list(TINY_VAE.block_out_channels),
        "latent_channels": 4, "scaling_factor": 0.18215,
    }))
    np.save(root / "empty_text_embed.npy", np.zeros((1, 77, 48), np.float32))
    return root


def test_unet_only_checkpoint_composes_with_base(published_ckpt, tmp_path):
    """The genpercept-models v2 layout: safetensors directly in the ckpt
    dir, vae/text_encoder from the SD2.1 base (reference run.py:284-293)."""
    from genpercept_tpu.io.checkpoints import load_genpercept_checkpoint

    unet_dir = tmp_path / "unet_depth_v2"
    os.makedirs(unet_dir)
    unet = init_unet(jax.random.key(3), TINY_UNET)
    save_safetensors(to_torch_state_dict(unet),
                     str(unet_dir / "diffusion_pytorch_model.safetensors"))

    # without a base dir the load must fail with a clear message
    with pytest.raises(AssertionError, match="BASE_CKPT_DIR|base_ckpt_dir"):
        load_genpercept_checkpoint(str(unet_dir), "depth")

    models = load_genpercept_checkpoint(
        str(unet_dir), "depth", base_ckpt_dir=str(published_ckpt))
    # unet weights came from the unet-only dir, not the base
    np.testing.assert_array_equal(
        np.asarray(models.unet["conv_in"]["weight"]),
        np.asarray(unet["conv_in"]["weight"]))
    # vae + unet config came from the base
    assert models.vae_cfg.block_out_channels == TINY_VAE.block_out_channels
    assert models.unet_cfg.cross_attention_dim == 48
    # BASE_CKPT_DIR env fallback works too
    os.environ["BASE_CKPT_DIR"] = str(published_ckpt)
    try:
        m2 = load_genpercept_checkpoint(str(unet_dir), "depth")
        assert m2.unet_cfg.cross_attention_dim == 48
    finally:
        del os.environ["BASE_CKPT_DIR"]


def test_unet_only_dpt_head_sniffed_from_parent(published_ckpt, tmp_path):
    """unet_disparity_dpt_head_v2: the head subdir lives in the PARENT of
    the unet dir (reference run.py:286-288)."""
    from genpercept_tpu.io.checkpoints import load_genpercept_checkpoint
    from genpercept_tpu.models import DPTHeadConfig, init_dpt_head

    repo = tmp_path / "genpercept-models"
    unet_dir = repo / "unet_disparity_dpt_head_v2"
    os.makedirs(unet_dir)
    unet = init_unet(jax.random.key(4), TINY_UNET)
    save_safetensors(to_torch_state_dict(unet),
                     str(unet_dir / "diffusion_pytorch_model.safetensors"))
    tiny_dpt = DPTHeadConfig(neck_hidden_sizes=(32, 64, 128, 128),
                             fusion_hidden_size=32)
    head = init_dpt_head(jax.random.key(5), tiny_dpt)
    os.makedirs(repo / "dpt_head_identity")
    save_safetensors(to_torch_state_dict(head),
                     str(repo / "dpt_head_identity/model.safetensors"))
    (repo / "dpt_head_identity/config.json").write_text(json.dumps({
        "neck_hidden_sizes": [32, 64, 128, 128], "fusion_hidden_size": 32,
    }))

    models = load_genpercept_checkpoint(
        str(unet_dir), "disparity_dpt_head",
        base_ckpt_dir=str(published_ckpt))
    assert models.dpt_head is not None
    assert models.dpt_cfg.fusion_hidden_size == 32
    # custom head present => conv_out filtered from the unet
    assert "conv_out" not in models.unet


def test_parity_real_script_runs_on_tiny_checkpoint(published_ckpt, tmp_path):
    """The harness itself must run today (tiny weights, CPU, int8 + bf16 +
    export roundtrip) so it works the minute real weights land."""
    out = tmp_path / "parity_out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        # the max-fidelity placement: tiny RANDOM weights at 64^2 exaggerate
        # quantization error far past any realistic checkpoint's (the
        # production enc_deep default measures 7.1e-3 at SD geometry but
        # ~1.2e-2 here), so this fixture pins the placement whose bar
        # behavior is weight-independent; the shipping default placement is
        # validated on-chip by bench.py's in-run probe every run
        [sys.executable, "scripts/parity_real.py",
         "--checkpoint", str(published_ckpt), "--mode", "depth",
         "--out", str(out), "--batch", "2", "--res", "64",
         "--int8_exclude", "encoder.,decoder.up_blocks.3.",
         "--export_roundtrip"],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    ops = {l["op"]: l for l in lines}
    assert ops["parity_real"]["status"] == "ok"
    assert ops["export_roundtrip_unet"]["bit_exact"] is True
    assert "realweight_bf16_vs_fp32" in ops
    assert "realweight_int8_vs_bf16" in ops  # the enforced placement bar
    # inputs + predictions persisted for the torch-side golden generation
    assert (out / "inputs" / "synthetic_00.png").exists()
    assert (out / "pred_int8.npz").exists()
