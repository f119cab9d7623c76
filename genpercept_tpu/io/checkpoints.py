"""Checkpoint loading/saving.

Inference checkpoints: the published GenPercept/SD2.1 layout — subdirs of
torch safetensors, sniffed exactly like the reference loaders
(`run.py:283-357`):

  unet/diffusion_pytorch_model.safetensors        (conv_out-filtered when a
                                                   custom head is present)
  vae/diffusion_pytorch_model.safetensors
  text_encoder/model.safetensors
  dpt_head/ | dpt_head_identity/ model.safetensors
  vae_decoder/ , vae_post_quant_conv/             (decoder-finetuned ckpts)

Training checkpoints: orbax PyTree checkpoints with the same logical subtree
names the reference serializes (unet / dpt_head / vae_decoder; reference
save hooks genpercept_trainer.py:404-445), plus optimizer state and the
iteration counter, with `_old_` backup rotation (reference :1256-1304).
"""

from __future__ import annotations

import os
import os.path as osp
import shutil
from typing import Any, Dict, Optional

import jax.numpy as jnp

from genpercept_tpu.io.weights import convert_torch_state_dict, load_safetensors

_UNET_HEAD_DROP = ("conv_norm_out", "conv_out")


def _find_safetensors(subdir: str) -> Optional[str]:
    if not osp.isdir(subdir):
        return None
    for name in ("diffusion_pytorch_model.safetensors", "model.safetensors"):
        p = osp.join(subdir, name)
        if osp.isfile(p):
            return p
    cands = [f for f in os.listdir(subdir) if f.endswith(".safetensors")]
    return osp.join(subdir, cands[0]) if cands else None


def _unet_config_from_json(subdir: str, with_conv_out: bool):
    """Build a UNetConfig from a diffusers config.json when present
    (published checkpoints ship one next to the safetensors)."""
    import json

    from genpercept_tpu.models.unet import SD21_UNET, UNetConfig

    cfg_path = osp.join(subdir, "config.json")
    if not osp.isfile(cfg_path):
        return SD21_UNET if with_conv_out else UNetConfig(with_conv_out=False)
    with open(cfg_path) as f:
        c = json.load(f)
    heads = c.get("num_attention_heads") or c.get("attention_head_dim", [5, 10, 20, 20])
    if isinstance(heads, int):
        heads = [heads] * len(c.get("block_out_channels", [320, 640, 1280, 1280]))
    down_types = c.get(
        "down_block_types",
        ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
    )
    return UNetConfig(
        in_channels=c.get("in_channels", 4),
        out_channels=c.get("out_channels", 4),
        block_out_channels=tuple(c.get("block_out_channels", (320, 640, 1280, 1280))),
        layers_per_block=c.get("layers_per_block", 2),
        down_block_has_attn=tuple("CrossAttn" in t for t in down_types),
        attention_heads=tuple(heads),
        cross_attention_dim=c.get("cross_attention_dim", 1024),
        norm_eps=c.get("norm_eps", 1e-5),
        with_conv_out=with_conv_out,
    )


def _vae_config_from_json(subdir: str):
    import json

    from genpercept_tpu.models.vae import SD21_VAE, VAEConfig

    cfg_path = osp.join(subdir, "config.json")
    if not osp.isfile(cfg_path):
        return SD21_VAE
    with open(cfg_path) as f:
        c = json.load(f)
    return VAEConfig(
        in_channels=c.get("in_channels", 3),
        out_channels=c.get("out_channels", 3),
        latent_channels=c.get("latent_channels", 4),
        block_out_channels=tuple(c.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=c.get("layers_per_block", 2),
        norm_num_groups=c.get("norm_num_groups", 32),
        scaling_factor=c.get("scaling_factor", 0.18215),
    )


def load_genpercept_checkpoint(
    ckpt_dir: str,
    mode: str = "depth",
    dtype=jnp.float32,
    unet_subdir: str = "unet",
    base_ckpt_dir: Optional[str] = None,
):
    """Sniff a checkpoint directory and build GenPerceptModels.

    Mirrors run.py:283-357: presence of dpt_head/dpt_head_identity selects
    the custom-head path (and filters the UNet's conv_out weights); presence
    of vae_decoder/vae_post_quant_conv overrides those VAE subtrees.

    Layouts accepted:
      - full diffusers layout (unet/ vae/ [text_encoder/ dpt_head*/ ...]) —
        the per-task hub repos (guangkaixu/genpercept-depth, ...);
      - a UNET-ONLY dir (safetensors directly in ckpt_dir, the
        guangkaixu/genpercept-models `unet_<task>_v2/` layout, reference
        run.py:284-293) — the vae / text_encoder / unet config then come
        from `base_ckpt_dir` (the SD2.1 base checkpoint; defaults to the
        BASE_CKPT_DIR env var, like the reference's accelerate_train.py
        env fallback), and dpt_head*/ subdirs are sniffed in the unet dir's
        PARENT (where genpercept-models keeps them).
    """
    from genpercept_tpu.models.clip_text import SD21_CLIP_TEXT
    from genpercept_tpu.models.dpt_head import DPT_GENERAL, DPT_IDENTITY
    from genpercept_tpu.pipeline import GenPerceptModels

    base_ckpt_dir = base_ckpt_dir or os.environ.get("BASE_CKPT_DIR")

    # unet weights: <ckpt>/unet, or the ckpt dir itself (unet-only layout)
    unet_dir = osp.join(ckpt_dir, unet_subdir)
    unet_path = _find_safetensors(unet_dir)
    unet_only = False
    if unet_path is None:
        unet_path = _find_safetensors(ckpt_dir)
        if unet_path:
            unet_dir, unet_only = ckpt_dir, True
    if unet_path is None and base_ckpt_dir:
        # trained-run layout that saved no unet (frozen-unet recipes):
        # fall back to the base SD2.1 unet (reference run.py:330-334)
        unet_dir = osp.join(base_ckpt_dir, "unet")
        unet_path = _find_safetensors(unet_dir)
    assert unet_path, (
        f"no unet safetensors under {ckpt_dir}[/{unet_subdir}]"
        + ("" if base_ckpt_dir else
           " (for unet-only checkpoints, pass base_ckpt_dir= or set "
           "BASE_CKPT_DIR to the SD2.1 base checkpoint)"))

    # custom heads live next to the unet subdir; for the unet-only layout
    # they sit in the parent dir (run.py:286-288 uses dirname(args.unet))
    head_roots = [ckpt_dir] + ([osp.dirname(osp.abspath(ckpt_dir))]
                               if unet_only else [])
    head_dir = None
    dpt_cfg = DPT_GENERAL
    for root in head_roots:
        if osp.isdir(osp.join(root, "dpt_head_identity")):
            head_dir = osp.join(root, "dpt_head_identity")
            dpt_cfg = DPT_IDENTITY
            break
        if osp.isdir(osp.join(root, "dpt_head")):
            head_dir = osp.join(root, "dpt_head")
            break

    unet_state = load_safetensors(unet_path)
    drop = _UNET_HEAD_DROP if head_dir else ()
    unet = convert_torch_state_dict(unet_state, drop_keys=drop, dtype=dtype)
    cfg_dir = unet_dir
    if not osp.isfile(osp.join(cfg_dir, "config.json")) and base_ckpt_dir:
        cfg_dir = osp.join(base_ckpt_dir, "unet")
    unet_cfg = _unet_config_from_json(cfg_dir, with_conv_out=not head_dir)

    vae_dir = osp.join(ckpt_dir, "vae")
    vae_path = _find_safetensors(vae_dir)
    if vae_path is None and base_ckpt_dir:
        vae_dir = osp.join(base_ckpt_dir, "vae")
        vae_path = _find_safetensors(vae_dir)
    assert vae_path, (
        f"no vae safetensors under {ckpt_dir}/vae"
        + ("" if base_ckpt_dir else
           " — unet-only checkpoints need the SD2.1 vae: pass "
           "base_ckpt_dir= or set BASE_CKPT_DIR"))
    vae = convert_torch_state_dict(load_safetensors(vae_path), dtype=dtype)
    vae_cfg = _vae_config_from_json(vae_dir)

    # decoder-finetuned overrides (run.py:304-312); same roots as the heads
    for root in head_roots:
        dec_path = _find_safetensors(osp.join(root, "vae_decoder"))
        if dec_path:
            dec = convert_torch_state_dict(load_safetensors(dec_path), dtype=dtype)
            vae["decoder"] = dec.get("decoder", dec)
        pq_path = _find_safetensors(osp.join(root, "vae_post_quant_conv"))
        if pq_path:
            pq = convert_torch_state_dict(load_safetensors(pq_path), dtype=dtype)
            vae["post_quant_conv"] = pq.get("post_quant_conv", pq)
        if dec_path or pq_path:
            break

    dpt_head = None
    if head_dir:
        head_path = _find_safetensors(head_dir)
        dpt_head = convert_torch_state_dict(load_safetensors(head_path), dtype=dtype)
        head_cfg_path = osp.join(head_dir, "config.json")
        if osp.isfile(head_cfg_path):
            import dataclasses
            import json

            with open(head_cfg_path) as f:
                hc = json.load(f)
            dpt_cfg = dataclasses.replace(
                dpt_cfg,
                neck_hidden_sizes=tuple(
                    hc.get("neck_hidden_sizes", dpt_cfg.neck_hidden_sizes)
                ),
                fusion_hidden_size=hc.get("fusion_hidden_size",
                                          dpt_cfg.fusion_hidden_size),
                add_projection=hc.get("add_projection", dpt_cfg.add_projection),
                head_in_index=hc.get("head_in_index", dpt_cfg.head_in_index),
            )

    clip = None
    text_embed = None
    te_path = _find_safetensors(osp.join(ckpt_dir, "text_encoder"))
    if te_path is None and base_ckpt_dir:
        te_path = _find_safetensors(osp.join(base_ckpt_dir, "text_encoder"))
    if te_path:
        clip = convert_torch_state_dict(
            load_safetensors(te_path), strip_prefix="text_model.", dtype=dtype
        )
    embed_path = osp.join(ckpt_dir, "empty_text_embed.npy")
    if osp.isfile(embed_path):
        import numpy as np

        text_embed = jnp.asarray(np.load(embed_path), dtype)

    from genpercept_tpu.utils.tokenizer import load_tokenizer

    return GenPerceptModels(
        unet=unet,
        vae=vae,
        unet_cfg=unet_cfg,
        vae_cfg=vae_cfg,
        clip=clip,
        clip_cfg=SD21_CLIP_TEXT,
        text_embed=text_embed,
        dpt_head=dpt_head,
        dpt_cfg=dpt_cfg,
        tokenizer=(load_tokenizer(ckpt_dir)
                   or (load_tokenizer(base_ckpt_dir) if base_ckpt_dir else None)),
    )


# ----------------------------------------------------------- train ckpts

_CKPT_SINGLETON = None


def _ckpt_handler():
    """One process-wide checkpointer: orbax saves are async and each
    instance owns a thread pool — per-call instances get GC'd mid-save."""
    global _CKPT_SINGLETON
    if _CKPT_SINGLETON is None:
        import orbax.checkpoint as ocp

        _CKPT_SINGLETON = ocp.StandardCheckpointer()
    return _CKPT_SINGLETON


def save_train_checkpoint(
    out_dir: str,
    state: Dict[str, Any],
    name: str = "latest",
    rotate_backup: bool = True,
) -> str:
    """Save {trainable, opt_state, step, ...} under out_dir/name with the
    reference's `_old_` backup rotation (genpercept_trainer.py:1256-1304).

    Multi-host: ALL processes must call this (orbax coordinates shard
    writes internally), but the directory rotation runs on process 0 only,
    fenced by global barriers — concurrent rename/rmtree from several
    hosts on a shared filesystem would race and corrupt the rotation."""
    import jax

    multi = jax.process_count() > 1
    is_main = jax.process_index() == 0

    def _barrier(tag):
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    os.makedirs(out_dir, exist_ok=True)
    path = osp.abspath(osp.join(out_dir, name))
    backup = osp.join(out_dir, f"_old_{name}")
    if is_main and osp.exists(path):
        if rotate_backup:
            if osp.exists(backup):
                shutil.rmtree(backup)
            os.rename(path, backup)
        else:
            shutil.rmtree(path)
    _barrier("genpercept_ckpt_rotated")
    handler = _ckpt_handler()
    handler.save(path, state)
    handler.wait_until_finished()  # async save: block until files are on disk
    _barrier("genpercept_ckpt_saved")
    if is_main and rotate_backup and osp.exists(backup):
        shutil.rmtree(backup)
    return path


def load_train_checkpoint(out_dir: str, name: str = "latest",
                          template: Optional[Dict[str, Any]] = None):
    path = osp.abspath(osp.join(out_dir, name))
    return _ckpt_handler().restore(path, template)
