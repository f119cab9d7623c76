"""End-to-end CLI tests over a tiny checkpoint in the published layout."""

import json
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from genpercept_tpu.io.weights import save_safetensors, to_torch_state_dict
from genpercept_tpu.models import (
    DPTHeadConfig,
    UNetConfig,
    VAEConfig,
    init_dpt_head,
    init_unet,
    init_vae,
)

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 128, 128),
    attention_heads=(1, 2, 4, 4),
    cross_attention_dim=48,
)
TINY_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64))
TINY_DPT = DPTHeadConfig(neck_hidden_sizes=(32, 64, 128, 128), fusion_hidden_size=32)


def _unet_config_json(cfg: UNetConfig):
    return {
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "attention_head_dim": list(cfg.attention_heads),
        "cross_attention_dim": cfg.cross_attention_dim,
        "down_block_types": ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        "norm_eps": cfg.norm_eps,
    }


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    """Write a tiny checkpoint in the published torch-safetensors layout."""
    root = tmp_path_factory.mktemp("ckpt")
    ks = jax.random.split(jax.random.key(0), 3)

    unet = init_unet(ks[0], TINY_UNET)
    os.makedirs(root / "unet")
    save_safetensors(
        to_torch_state_dict(unet), str(root / "unet/diffusion_pytorch_model.safetensors")
    )
    (root / "unet/config.json").write_text(json.dumps(_unet_config_json(TINY_UNET)))

    vae = init_vae(ks[1], TINY_VAE)
    os.makedirs(root / "vae")
    save_safetensors(
        to_torch_state_dict(vae), str(root / "vae/diffusion_pytorch_model.safetensors")
    )
    (root / "vae/config.json").write_text(json.dumps({
        "block_out_channels": list(TINY_VAE.block_out_channels),
        "latent_channels": 4, "scaling_factor": 0.18215,
    }))

    # precomputed empty text embed (49406-dim models are too slow for CI)
    np.save(root / "empty_text_embed.npy", np.zeros((1, 77, 48), np.float32))
    return root


@pytest.fixture(scope="module")
def tiny_dpt_checkpoint(tiny_checkpoint, tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt_dpt")
    os.symlink(tiny_checkpoint / "vae", root / "vae")
    np.save(root / "empty_text_embed.npy", np.zeros((1, 77, 48), np.float32))

    # UNet without conv_out (filtered like the reference trained ckpts)
    cfg = UNetConfig(
        block_out_channels=TINY_UNET.block_out_channels,
        attention_heads=TINY_UNET.attention_heads,
        cross_attention_dim=TINY_UNET.cross_attention_dim,
        with_conv_out=False,
    )
    unet = init_unet(jax.random.key(1), cfg)
    os.makedirs(root / "unet")
    save_safetensors(
        to_torch_state_dict(unet), str(root / "unet/diffusion_pytorch_model.safetensors")
    )
    (root / "unet/config.json").write_text(json.dumps(_unet_config_json(cfg)))

    head = init_dpt_head(jax.random.key(2), TINY_DPT)
    os.makedirs(root / "dpt_head_identity")
    save_safetensors(
        to_torch_state_dict(head), str(root / "dpt_head_identity/model.safetensors")
    )
    (root / "dpt_head_identity/config.json").write_text(json.dumps({
        "neck_hidden_sizes": list(TINY_DPT.neck_hidden_sizes),
        "fusion_hidden_size": TINY_DPT.fusion_hidden_size,
        "add_projection": True, "head_in_index": -1,
    }))
    return root


def test_checkpoint_loader_roundtrip(tiny_checkpoint):
    """Import of the exported torch layout reproduces the original params."""
    from genpercept_tpu.io.checkpoints import load_genpercept_checkpoint

    models = load_genpercept_checkpoint(str(tiny_checkpoint))
    assert models.unet_cfg.block_out_channels == TINY_UNET.block_out_channels
    assert models.unet_cfg.attention_heads == TINY_UNET.attention_heads
    from genpercept_tpu.io.weights import flatten_dict

    orig = init_unet(jax.random.split(jax.random.key(0), 3)[0], TINY_UNET)
    fa, fb = flatten_dict(orig), flatten_dict(models.unet)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k]), np.asarray(fb[k]), atol=1e-6, err_msg=k
        )


def test_cli_run_depth(tiny_checkpoint, tmp_path):
    from genpercept_tpu.cli.run import main as run_main

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray((rng.uniform(0, 255, (80, 96, 3))).astype(np.uint8)).save(
        in_dir / "img0.png"
    )
    run_main([
        "--checkpoint", str(tiny_checkpoint),
        "--input_rgb_dir", str(in_dir),
        "--output_dir", str(out_dir),
        "--mode", "depth", "--processing_res", "64",
    ])
    pred = np.load(out_dir / "img0_pred.npy")
    assert pred.shape == (80, 96)
    assert 0 <= pred.min() and pred.max() <= 1
    png16 = np.asarray(Image.open(out_dir / "img0_pred.png"))
    assert png16.dtype == np.int32 or png16.dtype == np.uint16  # 16-bit
    colored = np.asarray(Image.open(out_dir / "img0_pred_colored.png"))
    assert colored.shape == (80, 96, 3)


def test_cli_run_dpt_head(tiny_dpt_checkpoint, tmp_path):
    from genpercept_tpu.cli.run import main as run_main

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    Image.fromarray(np.full((64, 64, 3), 128, np.uint8)).save(in_dir / "x.png")
    run_main([
        "--checkpoint", str(tiny_dpt_checkpoint),
        "--input_rgb_dir", str(in_dir),
        "--output_dir", str(out_dir),
        "--mode", "disparity_dpt_head", "--processing_res", "64",
    ])
    pred = np.load(out_dir / "x_pred.npy")
    assert pred.shape == (64, 64)


@pytest.fixture
def toy_eval_dataset(tmp_path):
    """NYU-format toy dataset + matching dataset yaml."""
    data_dir = tmp_path / "nyu"
    data_dir.mkdir()
    rng = np.random.default_rng(1)
    lines = []
    for i in range(2):
        rgb = rng.uniform(0, 255, (480, 640, 3)).astype(np.uint8)
        depth_mm = rng.uniform(1000, 9000, (480, 640)).astype(np.int32)
        Image.fromarray(rgb).save(data_dir / f"rgb_{i:05d}.png")
        Image.fromarray(depth_mm, mode="I").save(data_dir / f"depth_{i:05d}.png")
        lines.append(
            f"rgb_{i:05d}.png depth_{i:05d}.png depth_{i:05d}.png"
        )
    split = tmp_path / "filename_list_test.txt"
    split.write_text("\n".join(lines))
    yaml_path = tmp_path / "data_nyu_test.yaml"
    yaml_path.write_text(
        "dataset:\n"
        "  name: nyu_v2\n"
        "  disp_name: nyu_test\n"
        "  dir: nyu\n"
        f"  filenames: {split}\n"
        "  eigen_valid_mask: true\n"
    )
    return tmp_path, yaml_path


def test_cli_infer_then_eval(tiny_checkpoint, toy_eval_dataset, tmp_path):
    from genpercept_tpu.cli.eval import main as eval_main
    from genpercept_tpu.cli.infer import main as infer_main

    base_dir, yaml_path = toy_eval_dataset
    pred_dir = tmp_path / "preds"
    infer_main([
        "--checkpoint", str(tiny_checkpoint),
        "--dataset_config", str(yaml_path),
        "--base_data_dir", str(base_dir),
        "--output_dir", str(pred_dir),
        "--mode", "depth", "--processing_res", "64",
    ])
    preds = sorted(os.listdir(pred_dir))
    assert preds == ["pred_00000.npy", "pred_00001.npy"]
    assert np.load(pred_dir / "pred_00000.npy").shape == (480, 640)

    out_dir = tmp_path / "eval_out"
    summary = eval_main([
        "--dataset_config", str(yaml_path),
        "--base_data_dir", str(base_dir),
        "--prediction_dir", str(pred_dir),
        "--output_dir", str(out_dir),
        "--alignment", "least_square",
    ])
    assert set(summary) >= {"abs_relative_difference", "delta1_acc", "silog_rmse"}
    assert np.isfinite(list(summary.values())).all()
    assert osp.exists(out_dir / "eval_metrics.txt")
    assert osp.exists(out_dir / "per_sample_metrics.csv")


def test_trainer_loop_and_resume(tiny_checkpoint, tmp_path):
    """Short Trainer run -> checkpoint -> resume restores counters+params."""
    from genpercept_tpu.data.sampler import collate
    from genpercept_tpu.io.checkpoints import load_genpercept_checkpoint
    from genpercept_tpu.train import TrainConfig
    from genpercept_tpu.train.trainer import Trainer

    models = load_genpercept_checkpoint(str(tiny_checkpoint))

    rng = np.random.default_rng(2)
    mask = np.ones((48, 48), bool)
    mask[:8, :8] = False

    def sample(i):
        return {
            "rgb_norm": rng.uniform(-1, 1, (48, 48, 3)).astype(np.float32),
            "depth_raw_norm": rng.uniform(-1, 1, (48, 48)).astype(np.float32),
            "valid_mask_raw": mask,
        }

    class Loader:
        def __iter__(self):
            for i in range(0, 4, 2):
                yield collate([sample(i), sample(i + 1)])
        def __len__(self):
            return 2

    cfg = TrainConfig(loss_names=("latent_mse",), fix_timesteps=1, lr=1e-4)
    trainer = Trainer(
        cfg=cfg, models=models, train_loader=Loader(),
        out_dir=str(tmp_path / "run"), max_iter=3, save_period=2,
    )
    trainer.train()
    assert trainer.effective_iter == 3
    assert osp.isdir(tmp_path / "run/checkpoint/final")

    trainer2 = Trainer(
        cfg=cfg, models=models, train_loader=Loader(),
        out_dir=str(tmp_path / "run"), max_iter=3, save_period=2,
    )
    trainer2.load_checkpoint("final")
    assert trainer2.effective_iter == 3
    a = jax.tree.leaves(trainer.trainable)
    b = jax.tree.leaves(trainer2.trainable)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


def test_config_include_merge(tmp_path):
    from genpercept_tpu.utils.config import recursive_load_config

    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        f"base_config:\n- {base}\na: 5\nnested:\n  y: 7\n"
    )
    cfg = recursive_load_config(str(child))
    assert cfg.a == 5
    assert cfg.nested.x == 1 and cfg.nested.y == 7
    assert cfg.get_path("nested.y") == 7
    assert cfg.get_path("missing.key", "d") == "d"


def test_trainer_metric3d_losses_with_intrinsics(tiny_checkpoint, tmp_path):
    """vnl/hdsnr train end-to-end through the Trainer: the dataset-style
    batch carries 'intrinsic', _device_batch forwards it, vnl consumes it
    (reference genpercept_trainer.py:776-780)."""
    from genpercept_tpu.data.sampler import collate
    from genpercept_tpu.io.checkpoints import load_genpercept_checkpoint
    from genpercept_tpu.train import TrainConfig
    from genpercept_tpu.train.trainer import Trainer

    models = load_genpercept_checkpoint(str(tiny_checkpoint))
    rng = np.random.default_rng(5)
    mask = np.ones((48, 48), bool)
    mask[:8, :8] = False
    K = np.array([[52.0, 0, 24.0], [0, 52.0, 24.0], [0, 0, 1]], np.float32)

    def sample(i):
        return {
            "rgb_norm": rng.uniform(-1, 1, (48, 48, 3)).astype(np.float32),
            "depth_raw_norm": rng.uniform(-1, 1, (48, 48)).astype(np.float32),
            "valid_mask_raw": mask,
            "intrinsic": K,
        }

    class Loader:
        def __iter__(self):
            for i in range(0, 4, 2):
                yield collate([sample(i), sample(i + 1)])

        def __len__(self):
            return 2

    cfg = TrainConfig(
        loss_names=("mse", "vnl", "hdsnr"), fix_timesteps=1, lr=1e-4,
    )
    trainer = Trainer(
        cfg=cfg, models=models, train_loader=Loader(),
        out_dir=str(tmp_path / "run_vnl"), max_iter=2, save_period=0,
    )
    trainer.train()
    assert trainer.effective_iter == 2
    # per-loss components logged (one JSONL line per scalar)
    import json

    logged = {}
    with open(tmp_path / "run_vnl" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            logged.update({k: v for k, v in rec.items() if k.startswith("train/")})
    for k in ("train/mse", "train/vnl", "train/hdsnr"):
        assert k in logged and np.isfinite(logged[k]), logged


def test_cli_train_main_end_to_end(tiny_checkpoint, tmp_path):
    """Drive cli.train.main() itself (recipe yaml -> dataset -> Trainer ->
    checkpoint/resume artifacts), including the marigold-arch + latent-loss
    + scheduler_path ablation axes (reference accelerate_train.py:82-518)."""
    from genpercept_tpu.cli.train import main as train_main

    # toy NYU-style training data
    data_dir = tmp_path / "data" / "nyu"
    data_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    lines = []
    for i in range(4):
        rgb = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        depth_mm = rng.uniform(1000, 9000, (64, 64)).astype(np.int32)
        Image.fromarray(rgb).save(data_dir / f"rgb_{i}.png")
        Image.fromarray(depth_mm, mode="I").save(data_dir / f"depth_{i}.png")
        lines.append(f"rgb_{i}.png depth_{i}.png depth_{i}.png")
    split = tmp_path / "train_list.txt"
    split.write_text("\n".join(lines))

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(f"""
mode: depth
pipeline:
  name: MarigoldPipeline
  kwargs: {{mode: depth, rgb_blending: false}}
model:
  scheduler_path: hf_configs/scheduler_beta_0.00085_0.012
  remat_unet: false
multi_res_noise:
  strength: 0.9
  annealed: true
  downscale_strategy: original
depth_normalization:
  type: scale_shift_depth
  clip: true
  norm_min: -1.0
  norm_max: 1.0
  min_max_quantile: 0.02
dataloader:
  effective_batch_size: 2
  max_train_batch_size: 2
  seed: 2024
dataset:
  train:
    name: nyu_v2
    disp_name: nyu_toy
    dir: nyu
    filenames: {split}
max_iter: 2
trainer:
  init_seed: 2024
  save_period: 2
loss:
  customized_loss: false
  name: [mse_loss]
lr: 1.0e-04
""")
    out_dir = tmp_path / "run"
    train_main([
        "--config", str(cfg_path),
        "--checkpoint", str(tiny_checkpoint),
        "--base_data_dir", str(tmp_path / "data"),
        "--output_dir", str(out_dir),
        "--data_parallel", "1",
    ])
    assert osp.isdir(out_dir / "checkpoint" / "final")
    assert osp.exists(out_dir / "config.yaml")
    assert osp.exists(out_dir / "code_snapshot.tar.gz")
    assert osp.exists(out_dir / "metrics.jsonl")

    # resume path restores counters
    train_main([
        "--config", str(cfg_path),
        "--checkpoint", str(tiny_checkpoint),
        "--base_data_dir", str(tmp_path / "data"),
        "--output_dir", str(out_dir),
        "--data_parallel", "1",
        "--resume_run", "final",
    ])


def test_cli_infer_overwrite_guard(tmp_path):
    """Non-empty output dir aborts without --overwrite (the reference's
    interactive confirmation, infer.py:249-267, as an explicit flag)."""
    from genpercept_tpu.cli.infer import main as infer_main

    out = tmp_path / "preds"
    out.mkdir()
    (out / "pred_stale.npy").write_bytes(b"x")
    with pytest.raises(SystemExit, match="overwrite"):
        infer_main([
            "--checkpoint", "unused",
            "--dataset_config", "unused.yaml",
            "--output_dir", str(out),
        ])


def test_cli_run_batched_data_parallel_int8(tiny_checkpoint, tmp_path):
    """cli.run --batch_size --data_parallel --int8_vae: device-batched
    folder inference sharded over the virtual CPU mesh with the quantized
    VAE (first batch calibrates full-precision)."""
    from genpercept_tpu.cli.run import main as run_main

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):  # 3 % mesh_size != 0 -> exercises chunk padding
        Image.fromarray(rng.uniform(0, 255, (80, 80, 3)).astype(np.uint8)).save(
            in_dir / f"img{i}.png")
    run_main([
        "--checkpoint", str(tiny_checkpoint),
        "--input_rgb_dir", str(in_dir),
        "--output_dir", str(out_dir),
        "--mode", "depth", "--processing_res", "64",
        "--batch_size", "4", "--data_parallel", "--int8_vae",
    ])
    for i in range(3):
        pred = np.load(out_dir / f"img{i}_pred.npy")
        assert pred.shape == (80, 80)
        assert 0 <= pred.min() and pred.max() <= 1
