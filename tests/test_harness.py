"""Batched eval harness + trainer visualize tests."""

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from genpercept_tpu.models import UNetConfig, VAEConfig, init_unet, init_vae
from genpercept_tpu.pipeline import GenPerceptModels

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 128, 128),
    attention_heads=(1, 2, 4, 4),
    cross_attention_dim=48,
)
TINY_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64))


def tiny_models():
    ks = jax.random.split(jax.random.key(0), 2)
    return GenPerceptModels(
        unet=init_unet(ks[0], TINY_UNET),
        vae=init_vae(ks[1], TINY_VAE),
        unet_cfg=TINY_UNET,
        vae_cfg=TINY_VAE,
        text_embed=jnp.zeros((1, 77, 48)),
    )


class FakeDataset:
    """Fixed-size eval items, like NYU's 480x640 (here 64x64)."""

    min_depth = 1e-3
    max_depth = 10.0

    def __init__(self, n=5, hw=64):
        self.n, self.hw = n, hw
        self.rng = np.random.default_rng(0)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        hw = self.hw
        return {
            "rgb_norm": self.rng.uniform(-1, 1, (hw, hw, 3)).astype(np.float32),
            "depth_raw_linear": self.rng.uniform(1, 9, (hw, hw)).astype(np.float32),
            "valid_mask_raw": np.ones((hw, hw), bool),
        }


def test_evaluate_dataset_batched():
    from genpercept_tpu.eval.harness import evaluate_dataset

    models = tiny_models()
    res = evaluate_dataset(
        models, FakeDataset(), batch_size=2, processing_res=0, dtype=jnp.float32
    )
    assert set(res) >= {"abs_relative_difference", "delta1_acc", "silog_rmse"}
    assert all(np.isfinite(v) for v in res.values()), res


def test_evaluate_dataset_sharded():
    from genpercept_tpu.eval.harness import evaluate_dataset
    from genpercept_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, model=1)
    models = tiny_models()
    res = evaluate_dataset(
        models, FakeDataset(n=4), batch_size=4, processing_res=0,
        mesh=mesh, dtype=jnp.float32,
    )
    assert all(np.isfinite(v) for v in res.values())


def test_trainer_visualize(tmp_path):
    from genpercept_tpu.data.sampler import collate
    from genpercept_tpu.train import TrainConfig
    from genpercept_tpu.train.trainer import Trainer

    models = tiny_models()
    rng = np.random.default_rng(1)

    def sample():
        return {
            "rgb_norm": rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32),
            "depth_raw_norm": rng.uniform(-1, 1, (64, 64)).astype(np.float32),
            "valid_mask_raw": np.ones((64, 64), bool),
        }

    class Loader:
        def __iter__(self):
            yield collate([sample()])

    trainer = Trainer(
        cfg=TrainConfig(loss_names=("latent_mse",), fix_timesteps=1),
        models=models, train_loader=Loader(), out_dir=str(tmp_path),
        max_iter=1, save_period=0, vis_period=1,
        vis_loaders={"toy": Loader()},
    )
    trainer.train()
    vis = osp.join(tmp_path, "visualization", "iter_000001")
    assert osp.isdir(vis)
    files = os.listdir(vis)
    assert any(f.startswith("toy_") for f in files)


def test_trainer_zero1_shards_opt_state(tmp_path):
    """--zero1 routes the optimizer moments through shard_opt_state_zero1:
    at least one Adam moment leaf must be sharded over the 'data' axis, and
    a step must still run (reference DeepSpeed hook,
    accelerate_train.py:198-202)."""
    from genpercept_tpu.data.sampler import collate
    from genpercept_tpu.parallel import make_mesh
    from genpercept_tpu.train import TrainConfig
    from genpercept_tpu.train.trainer import Trainer

    models = tiny_models()
    rng = np.random.default_rng(2)

    def sample():
        return {
            "rgb_norm": rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32),
            "depth_raw_norm": rng.uniform(-1, 1, (64, 64)).astype(np.float32),
            "valid_mask_raw": np.ones((64, 64), bool),
        }

    class Loader:
        def __iter__(self):
            yield collate([sample() for _ in range(4)])

    mesh = make_mesh(data=4, model=1)
    trainer = Trainer(
        cfg=TrainConfig(loss_names=("latent_mse",), fix_timesteps=1),
        models=models, train_loader=Loader(), out_dir=str(tmp_path),
        max_iter=1, save_period=0, mesh=mesh, zero1=True,
    )
    n_sharded = sum(
        1
        for leaf in jax.tree.leaves(trainer.opt_state)
        if hasattr(leaf, "sharding")
        and any(s is not None for s in getattr(leaf.sharding, "spec", ()))
    )
    assert n_sharded > 0
    trainer.train()
