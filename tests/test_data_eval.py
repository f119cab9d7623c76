"""Data layer + eval metric tests (torch transcriptions as oracles)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from genpercept_tpu.data import (
    DatasetMode,
    MixedBatchSampler,
    get_dataset,
    scale_shift_depth_normalize,
    scale_shift_disparity_normalize,
)
from genpercept_tpu.data.datasets import (
    KITTIDataset,
    NYUDataset,
    PredNameMode,
    get_pred_name,
)
from genpercept_tpu.data.sampler import ConcatDataset, DataLoader, collate
from genpercept_tpu.eval import (
    align_depth_least_square,
    compute_metrics,
    depth2disparity,
)
from genpercept_tpu.eval.metrics import MetricTracker


def test_scale_shift_depth_normalizer_matches_torch():
    rng = np.random.default_rng(0)
    depth = (rng.uniform(0.5, 10, (32, 32))).astype(np.float32)
    valid = rng.uniform(size=(32, 32)) > 0.2

    ours = scale_shift_depth_normalize(depth, valid)

    # torch transcription (depth_transform.py:90-116)
    d = torch.from_numpy(depth)
    v = torch.from_numpy(valid) & (d > 0)
    lo, hi = torch.quantile(d[v], torch.tensor([0.02, 0.98]))
    theirs = ((d - lo) / (hi - lo) * 2 - 1).clamp(-1, 1)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=2e-4)


def test_disparity_normalizer_range_and_invalid():
    rng = np.random.default_rng(1)
    depth = rng.uniform(1, 50, (16, 16)).astype(np.float32)
    valid = np.ones((16, 16), bool)
    valid[:4] = False
    out = scale_shift_disparity_normalize(depth, valid)
    assert out.min() >= -1 and out.max() <= 1
    assert (out[:4] == -1).all()  # invalid -> norm_min


def test_get_pred_name_modes():
    assert get_pred_name("rgb_0001.png", PredNameMode.rgb_id) == "pred_0001.png"
    assert get_pred_name("0001_rgb.png", PredNameMode.i_d_rgb) == "0001_pred.png"
    assert get_pred_name("0001.png", PredNameMode.id) == "pred_0001.png"
    assert get_pred_name("rgb_a_b.png", PredNameMode.rgb_i_d, ".npy") == "pred_a_b.npy"


@pytest.fixture
def toy_dataset(tmp_path):
    """Folder dataset with a txt split: rgb png + depth png (mm)."""
    from PIL import Image

    rng = np.random.default_rng(2)
    lines = []
    for i in range(4):
        rgb = (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
        depth_mm = (rng.uniform(500, 9000, (48, 64))).astype(np.int32)
        Image.fromarray(rgb).save(tmp_path / f"rgb_{i}.png")
        Image.fromarray(depth_mm, mode="I").save(tmp_path / f"depth_{i}.png")
        lines.append(f"rgb_{i}.png depth_{i}.png depth_{i}.png")
    split = tmp_path / "split.txt"
    split.write_text("\n".join(lines))
    return tmp_path, split


def test_nyu_dataset_eval_mode(toy_dataset):
    root, split = toy_dataset
    ds = NYUDataset(
        mode=DatasetMode.EVAL,
        filename_ls_path=str(split),
        dataset_dir=str(root),
        eigen_valid_mask=False,
    )
    assert len(ds) == 4
    item = ds[0]
    assert item["rgb_norm"].shape == (48, 64, 3)
    assert item["rgb_norm"].min() >= -1 and item["rgb_norm"].max() <= 1
    assert item["depth_raw_linear"].shape == (48, 64)
    # /1000 decode: mm -> m in [0.5, 9]
    assert 0.4 < item["depth_raw_linear"].min() < item["depth_raw_linear"].max() < 10
    assert item["valid_mask_raw"].dtype == bool and item["valid_mask_raw"].all()


def test_nyu_train_mode_normalizes(toy_dataset):
    from genpercept_tpu.data.transforms import DepthNormalizer

    root, split = toy_dataset
    ds = NYUDataset(
        mode=DatasetMode.TRAIN,
        filename_ls_path=str(split),
        dataset_dir=str(root),
        eigen_valid_mask=False,
        depth_transform=DepthNormalizer(),
    )
    item = ds[1]
    assert "depth_raw_norm" in item and "depth_raw_linear" not in item
    assert -1 <= item["depth_raw_norm"].min() <= item["depth_raw_norm"].max() <= 1


def test_kitti_benchmark_crop():
    img = np.zeros((375, 1242, 3))
    out = KITTIDataset.kitti_benchmark_crop(img)
    assert out.shape == (352, 1216, 3)


def test_mixed_batch_sampler_single_source_batches():
    class Fake:
        def __init__(self, n):
            self.n = n
        def __len__(self):
            return self.n

    d1, d2 = Fake(20), Fake(12)
    sampler = MixedBatchSampler([d1, d2], batch_size=4, prob=[0.5, 0.5],
                                generator=np.random.default_rng(0))
    batches = list(sampler)
    assert len(batches) == 20 // 4 + 12 // 4
    for b in batches:
        assert len(b) == 4
        # all indices in a batch from one source
        from_d1 = all(i < 20 for i in b)
        from_d2 = all(i >= 20 for i in b)
        assert from_d1 or from_d2


def test_dataloader_collates(toy_dataset):
    root, split = toy_dataset
    ds = NYUDataset(
        mode=DatasetMode.EVAL, filename_ls_path=str(split), dataset_dir=str(root),
        eigen_valid_mask=False,
    )
    concat = ConcatDataset([ds])
    sampler = MixedBatchSampler([ds], batch_size=2, generator=np.random.default_rng(1))
    loader = DataLoader(concat, sampler)
    batch = next(iter(loader))
    assert batch["rgb_norm"].shape == (2, 48, 64, 3)
    assert batch["depth_raw_linear"].shape == (2, 48, 64)
    assert len(batch["rgb_relative_path"]) == 2


# --------------------------------------------------------------------- eval

def test_metrics_match_torch_formulas():
    rng = np.random.default_rng(3)
    pred = rng.uniform(1, 10, (2, 16, 16)).astype(np.float32)
    gt = rng.uniform(1, 10, (2, 16, 16)).astype(np.float32)
    mask = rng.uniform(size=(2, 16, 16)) > 0.2

    m = compute_metrics(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))

    pt, gtt, mt = map(torch.from_numpy, (pred, gt, mask))
    # abs_rel (metric.py:34-45)
    ar = torch.abs(pt - gtt) / gtt
    ar[~mt] = 0
    expected_abs_rel = (ar.sum((-1, -2)) / mt.sum((-1, -2))).mean().item()
    np.testing.assert_allclose(float(m["abs_relative_difference"]), expected_abs_rel, rtol=1e-5)

    # delta1 (metric.py:101-117)
    ratio = torch.max(pt / gtt, gtt / pt)
    bit = (ratio < 1.25).float()
    bit[~mt] = 0
    expected_d1 = (bit.sum((-1, -2)) / mt.sum((-1, -2))).mean().item()
    np.testing.assert_allclose(float(m["delta1_acc"]), expected_d1, rtol=1e-5)

    # silog (metric.py:145-158)
    d = torch.log(pt) - torch.log(gtt)
    d[~mt] = 0
    n = mt.sum((-1, -2))
    first = (d**2).sum((-1, -2)) / n
    second = d.sum((-1, -2)) ** 2 / n**2
    expected_silog = (torch.sqrt((first - second).mean()) * 100).item()
    np.testing.assert_allclose(float(m["silog_rmse"]), expected_silog, rtol=1e-4)


def test_align_depth_least_square_recovers_affine():
    rng = np.random.default_rng(4)
    gt = rng.uniform(1, 10, (32, 32)).astype(np.float32)
    pred = (gt - 3.0) / 2.0  # gt = 2*pred + 3
    mask = rng.uniform(size=(32, 32)) > 0.3
    aligned, s, t = align_depth_least_square(gt, pred, mask)
    np.testing.assert_allclose(s, 2.0, rtol=1e-4)
    np.testing.assert_allclose(t, 3.0, rtol=1e-3)
    np.testing.assert_allclose(aligned, gt, atol=1e-3)


def test_align_jax_matches_numpy():
    from genpercept_tpu.eval.alignment import align_depth_least_square_jax

    rng = np.random.default_rng(5)
    gt = rng.uniform(1, 10, (2, 16, 16)).astype(np.float32)
    pred = rng.uniform(0.1, 1, (2, 16, 16)).astype(np.float32)
    mask = rng.uniform(size=(2, 16, 16)) > 0.3

    aligned_j, s_j, t_j = align_depth_least_square_jax(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask)
    )
    for i in range(2):
        _, s_n, t_n = align_depth_least_square(gt[i], pred[i], mask[i])
        np.testing.assert_allclose(float(s_j[i]), s_n, rtol=1e-3)
        np.testing.assert_allclose(float(t_j[i]), t_n, rtol=1e-3)


def test_depth2disparity_roundtrip():
    depth = np.array([[2.0, 0.0], [4.0, 1.0]])
    disp = depth2disparity(depth)
    np.testing.assert_allclose(disp, [[0.5, 0.0], [0.25, 1.0]])


def test_metric_tracker():
    t = MetricTracker("a")
    t.update("a", 1.0)
    t.update("a", 3.0)
    assert t.avg("a") == 2.0
    t.reset()
    assert t.result()["a"] == 0.0


def test_skip_first_batches_no_dataset_io(toy_dataset):
    """Index-level resume: skipped batches never touch the dataset
    (reference SkipBatchSampler, src/util/data_loader.py:24-68)."""
    from genpercept_tpu.data.sampler import skip_first_batches

    root, split = toy_dataset
    ds = NYUDataset(
        mode=DatasetMode.EVAL, filename_ls_path=str(split), dataset_dir=str(root),
        eigen_valid_mask=False,
    )
    calls = []

    class Counting:
        def __init__(self, inner):
            self.inner = inner

        def __len__(self):
            return len(self.inner)

        def __getitem__(self, i):
            calls.append(i)
            return self.inner[i]

    counting = Counting(ConcatDataset([ds]))
    sampler = MixedBatchSampler([ds], batch_size=2,
                                generator=np.random.default_rng(1))
    loader = DataLoader(counting, sampler)

    # full pass: 2 batches, 4 getitem calls
    batches = list(iter(loader))
    assert len(batches) == 2 and len(calls) == 4

    # fresh same-seeded sampler (resume reconstructs the seed state; the
    # sampler rng is stateful across epochs)
    calls.clear()
    sampler_r = MixedBatchSampler([ds], batch_size=2,
                                  generator=np.random.default_rng(1))
    loader_r = DataLoader(counting, sampler_r)
    remaining = list(skip_first_batches(loader_r, 1))
    assert len(remaining) == 1
    assert len(calls) == 2  # only the unskipped batch was loaded

    # seed-replay consistency: the unskipped batch equals the second batch
    # of the original full pass
    np.testing.assert_array_equal(
        remaining[0]["rgb_norm"], batches[1]["rgb_norm"]
    )


def test_collate_mixed_shapes_raises():
    with pytest.raises(ValueError, match="mixed raster shapes"):
        collate([
            {"x": np.zeros((4, 4))},
            {"x": np.zeros((5, 4))},
        ])


def test_intrinsic_emitted_and_transformed(toy_dataset):
    """TRAIN samples from intrinsic-bearing datasets carry a 3x3 K, scaled
    under resize and mirrored under LR flip."""
    from genpercept_tpu.data.transforms import DepthNormalizer

    root, split = toy_dataset

    ds = NYUDataset(
        mode=DatasetMode.TRAIN, filename_ls_path=str(split), dataset_dir=str(root),
        eigen_valid_mask=False, depth_transform=DepthNormalizer(),
    )
    item = ds[0]
    assert "intrinsic" in item and item["intrinsic"].shape == (3, 3)
    # NYU native is 480x640; the 48x64 toy raster scales K by 0.1
    np.testing.assert_allclose(item["intrinsic"][0, 0], 518.8579 * 0.1, rtol=1e-5)
    np.testing.assert_allclose(item["intrinsic"][1, 2], 253.73617 * 0.1, rtol=1e-5)

    # EVAL mode: no intrinsic key
    ds_eval = NYUDataset(
        mode=DatasetMode.EVAL, filename_ls_path=str(split), dataset_dir=str(root),
        eigen_valid_mask=False,
    )
    assert "intrinsic" not in ds_eval[0]

    # resize scales K
    ds_r = NYUDataset(
        mode=DatasetMode.TRAIN, filename_ls_path=str(split), dataset_dir=str(root),
        eigen_valid_mask=False, depth_transform=DepthNormalizer(),
        resize_to_hw=(24, 32),
    )
    item_r = ds_r[0]
    np.testing.assert_allclose(
        item_r["intrinsic"][0, 0], item["intrinsic"][0, 0] * 0.5, rtol=1e-5
    )
    assert item_r["rgb_norm"].shape[:2] == (24, 32)

    # LR flip mirrors cx (force flip with p=1)
    class A:
        lr_flip_p = 1.0

    ds_f = NYUDataset(
        mode=DatasetMode.TRAIN, filename_ls_path=str(split), dataset_dir=str(root),
        eigen_valid_mask=False, depth_transform=DepthNormalizer(),
        augmentation_args=A(),
    )
    item_f = ds_f[0]
    w = item_f["rgb_norm"].shape[1]
    np.testing.assert_allclose(
        item_f["intrinsic"][0, 2], (w - 1) - item["intrinsic"][0, 2], rtol=1e-5
    )
    # K itself must not be raster-flipped
    assert item_f["intrinsic"][2, 2] == 1.0
