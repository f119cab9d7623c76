"""Parity tests against the reference's ACTUAL code (not transcriptions).

The reference modules under /root/reference/src/util/ and
genpercept/losses/ are torch/numpy-only and import cleanly in this
environment, so they serve as the ground-truth oracles here — a bug in our
own torch transcriptions (tests/test_losses.py) cannot hide from these.

Loaded by file path (importlib) because the package __init__ files pull
torchvision/omegaconf, which aren't needed for the oracles themselves.

Covered: the 10 eval metrics (src/util/metric.py), alignment
(src/util/alignment.py), the latent-loss factory (src/util/loss.py),
depth/disparity normalizers (src/util/depth_transform.py), IterExponential
(src/util/lr_scheduler.py), SSI + gradient + L1 perception losses
(genpercept/losses/{geometry_losses,gradient_loss,l1_loss}.py), the VNL
back-projection (metric3d_losses/VNL.py, deterministic part), and
MixedBatchSampler (src/dataset/mixed_sampler.py, structural).
"""

import importlib.util
import pathlib
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

REF = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference tree not on disk")


def _load(name: str, rel: str):
    spec = importlib.util.spec_from_file_location(name, REF / rel)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    class R:
        metric = _load("ref_metric", "src/util/metric.py")
        alignment = _load("ref_alignment", "src/util/alignment.py")
        loss = _load("ref_loss", "src/util/loss.py")
        depth_transform = _load("ref_depth_transform",
                                "src/util/depth_transform.py")
        lr_scheduler = _load("ref_lr_scheduler", "src/util/lr_scheduler.py")
        geometry = _load("ref_geometry", "genpercept/losses/geometry_losses.py")
        gradient = _load("ref_gradient", "genpercept/losses/gradient_loss.py")
        l1 = _load("ref_l1", "genpercept/losses/l1_loss.py")
        mixed_sampler = _load("ref_mixed_sampler",
                              "src/dataset/mixed_sampler.py")
    return R


def _depth_pair(shape=(3, 20, 24), seed=0):
    rng = np.random.default_rng(seed)
    pred = rng.uniform(0.5, 8.0, shape).astype(np.float32)
    target = rng.uniform(0.5, 8.0, shape).astype(np.float32)
    mask = rng.uniform(size=shape) > 0.3
    # every image keeps some valid pixels
    mask[:, :2, :2] = True
    return pred, target, mask


# ------------------------------------------------------------- metrics


def test_all_ten_metrics_vs_reference(ref):
    from genpercept_tpu.eval import metrics as M

    pred, target, mask = _depth_pair()
    pt, tt = torch.from_numpy(pred), torch.from_numpy(target)
    mt = torch.from_numpy(mask)

    pairs = [
        ("abs_relative_difference", ref.metric.abs_relative_difference),
        ("squared_relative_difference",
         ref.metric.squared_relative_difference),
        ("rmse_linear", ref.metric.rmse_linear),
        ("rmse_log", ref.metric.rmse_log),
        ("log10", ref.metric.log10),
        ("delta1_acc", ref.metric.delta1_acc),
        ("delta2_acc", ref.metric.delta2_acc),
        ("delta3_acc", ref.metric.delta3_acc),
        ("i_rmse", ref.metric.i_rmse),
        ("silog_rmse", ref.metric.silog_rmse),
    ]
    for name, ref_fn in pairs:
        ours = float(M.METRIC_FUNCS[name](
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)))
        # reference metrics mutate their inputs (diff[~mask] = 0) — clone
        theirs = float(ref_fn(pt.clone(), tt.clone(), mt.clone()))
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, err_msg=name)


def test_metrics_no_mask_vs_reference(ref):
    from genpercept_tpu.eval import metrics as M

    pred, target, _ = _depth_pair(seed=5)
    pt, tt = torch.from_numpy(pred), torch.from_numpy(target)
    for name in ("abs_relative_difference", "rmse_linear", "silog_rmse"):
        ours = float(M.METRIC_FUNCS[name](jnp.asarray(pred),
                                          jnp.asarray(target)))
        theirs = float(getattr(ref.metric, name)(pt.clone(), tt.clone()))
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, err_msg=name)


# ----------------------------------------------------------- alignment


def test_compute_scale_and_shift_vs_reference(ref):
    from genpercept_tpu.train import losses as L

    pred, target, mask = _depth_pair(seed=1)
    s_ref, t_ref = ref.alignment.compute_scale_and_shift(
        torch.from_numpy(pred), torch.from_numpy(target),
        torch.from_numpy(mask.astype(np.float32)))
    s, t = L.compute_scale_and_shift(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
    # fp32 summation-order differences only
    np.testing.assert_allclose(np.asarray(s), s_ref.numpy(), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(t), t_ref.numpy(), rtol=1e-3,
                               atol=1e-5)


def test_align_depth_least_square_vs_reference(ref):
    from genpercept_tpu.eval import alignment as A

    rng = np.random.default_rng(2)
    gt = rng.uniform(0.5, 10.0, (64, 48)).astype(np.float32)
    pred = (0.4 * gt + 0.2 + rng.normal(0, 0.05, gt.shape)).astype(np.float32)
    mask = rng.uniform(size=gt.shape) > 0.2

    for max_res in (None, 32):
        al_ref, s_ref, t_ref = ref.alignment.align_depth_least_square(
            gt, pred, mask, return_scale_shift=True, max_resolution=max_res)
        al, s, t = A.align_depth_least_square(
            gt, pred, mask, return_scale_shift=True, max_resolution=max_res)
        np.testing.assert_allclose(s, float(np.asarray(s_ref).item()), rtol=1e-5)
        np.testing.assert_allclose(t, float(np.asarray(t_ref).item()), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(al, al_ref.reshape(al.shape), rtol=1e-4,
                                   atol=1e-5)

    # the batched jittable closed form agrees with the numpy lstsq oracle
    al_j, s_j, t_j = A.align_depth_least_square_jax(
        jnp.asarray(gt)[None], jnp.asarray(pred)[None], jnp.asarray(mask)[None])
    al_ref, s_ref, t_ref = ref.alignment.align_depth_least_square(
        gt, pred, mask, return_scale_shift=True)
    np.testing.assert_allclose(float(s_j[0]), float(np.asarray(s_ref).item()), rtol=1e-3)
    np.testing.assert_allclose(float(t_j[0]), float(np.asarray(t_ref).item()), rtol=1e-3,
                               atol=1e-4)


def test_depth2disparity_vs_reference(ref):
    from genpercept_tpu.eval import alignment as A

    depth = np.array([[0.0, 2.0], [4.0, 0.5]], np.float32)
    d_ref, m_ref = ref.alignment.depth2disparity(depth.copy(),
                                                 return_mask=True)
    d, m = A.depth2disparity(depth, return_mask=True)
    np.testing.assert_allclose(np.asarray(d), d_ref)
    np.testing.assert_array_equal(np.asarray(m), m_ref)


# --------------------------------------------------- latent-loss factory


def test_latent_loss_factory_vs_reference(ref):
    from genpercept_tpu.train.losses import get_loss

    pred, target, mask = _depth_pair(seed=3)
    log_pred = np.log(pred)
    pt, tt = torch.from_numpy(pred), torch.from_numpy(target)
    lt = torch.from_numpy(log_pred)
    mt = torch.from_numpy(mask)

    # silog_mse: reference default log_pred=True consumes log-depth preds
    ours = float(get_loss("silog_mse", lamb=0.5)(
        jnp.asarray(log_pred), jnp.asarray(target), mask=jnp.asarray(mask)))
    theirs = float(ref.loss.get_loss("silog_mse", lamb=0.5)(
        lt.clone(), tt.clone(), mt.clone()))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)

    ours = float(get_loss("silog_rmse", lamb=0.85, alpha=10.0)(
        jnp.asarray(log_pred), jnp.asarray(target), mask=jnp.asarray(mask)))
    theirs = float(ref.loss.get_loss("silog_rmse", lamb=0.85, alpha=10.0)(
        lt.clone(), tt.clone(), mt.clone()))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)

    # l1_loss_with_mask: the reference divides the GLOBAL sum by the
    # PER-IMAGE counts (a [B] vector) — equivalence holds at B=1
    p1, t1, m1 = pred[:1], target[:1], mask[:1]
    ours = float(get_loss("l1_loss_with_mask")(
        jnp.asarray(p1), jnp.asarray(t1), mask=jnp.asarray(m1)))
    theirs = float(ref.loss.get_loss("l1_loss_with_mask")(
        torch.from_numpy(p1.copy()), torch.from_numpy(t1), torch.from_numpy(m1)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)

    # mse / l1 / mean_abs_rel on flat tensors
    flat_p = jnp.asarray(pred.ravel())
    flat_t = jnp.asarray(target.ravel())
    ft_p, ft_t = pt.ravel(), tt.ravel()
    for name in ("mse_loss", "l1_loss", "mean_abs_rel"):
        ours = float(get_loss(name)(flat_p, flat_t))
        theirs = float(ref.loss.get_loss(name)(ft_p, ft_t))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, err_msg=name)


# ------------------------------------------------------ depth normalizers


def test_depth_normalizer_vs_reference(ref):
    from genpercept_tpu.data.transforms import scale_shift_depth_normalize

    rng = np.random.default_rng(4)
    depth = rng.uniform(0.0, 20.0, (40, 50)).astype(np.float32)
    depth[rng.uniform(size=depth.shape) < 0.1] = 0.0  # invalid
    mask = depth > 0

    norm_ref = ref.depth_transform.ScaleShiftDepthNormalizer(
        norm_min=-1.0, norm_max=1.0, min_max_quantile=0.02, clip=True)
    theirs = norm_ref(torch.from_numpy(depth),
                      valid_mask=torch.from_numpy(mask)).numpy()
    ours = scale_shift_depth_normalize(depth, mask)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_disparity_normalizer_vs_reference(ref):
    from genpercept_tpu.data.transforms import scale_shift_disparity_normalize

    rng = np.random.default_rng(6)
    depth = rng.uniform(0.5, 30.0, (24, 30)).astype(np.float32)
    depth[rng.uniform(size=depth.shape) < 0.15] = 0.0
    mask = depth > 0

    norm_ref = ref.depth_transform.ScaleShiftDisparityNormalizer(
        norm_min=-1.0, norm_max=1.0, min_max_quantile=0.02, clip=True)
    # the reference divides 1/depth with zeros present -> inf on invalid,
    # then overwrites them via the mask; feed it exactly what training does
    theirs = norm_ref(torch.from_numpy(depth.copy()),
                      valid_mask=torch.from_numpy(mask)).numpy()
    ours = scale_shift_disparity_normalize(depth, mask)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------- LR schedule


def test_iter_exponential_vs_reference(ref):
    from genpercept_tpu.train.lr import iter_exponential_schedule

    ref_sched = ref.lr_scheduler.IterExponential(
        total_iter_length=25000, final_ratio=0.01, warmup_steps=100)
    ours = iter_exponential_schedule(
        1.0, total_iter_length=25000, final_ratio=0.01, warmup_steps=100)
    for step in (0, 1, 50, 99, 100, 101, 1000, 12500, 24999, 25000, 30000):
        np.testing.assert_allclose(float(ours(step)), ref_sched(step),
                                   rtol=1e-5, err_msg=f"step {step}")


# ------------------------------------------------- perception loss zoo


def test_ssi_least_square_vs_reference(ref):
    from genpercept_tpu.train.losses import ssi_loss

    pred, target, mask = _depth_pair(seed=7)
    loss_ref = ref.geometry.ScaleAndShiftInvariantLoss(
        align_type="least_square")
    theirs = float(loss_ref(
        torch.from_numpy(pred)[:, None], torch.from_numpy(target)[:, None],
        torch.from_numpy(mask)[:, None]))
    ours = float(ssi_loss(jnp.asarray(pred), jnp.asarray(target),
                          jnp.asarray(mask), align_type="least_square"))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_ssi_least_square_median_fallback_vs_reference(ref):
    """Anti-correlated pred forces scale <= 0 -> the median-ratio branch."""
    from genpercept_tpu.train.losses import ssi_loss

    rng = np.random.default_rng(8)
    target = rng.uniform(1.0, 5.0, (2, 16, 16)).astype(np.float32)
    pred = (6.0 - target + rng.normal(0, 0.01, target.shape)).astype(np.float32)
    mask = np.ones_like(target, bool)

    loss_ref = ref.geometry.ScaleAndShiftInvariantLoss(
        align_type="least_square")
    theirs = float(loss_ref(
        torch.from_numpy(pred)[:, None], torch.from_numpy(target)[:, None],
        torch.from_numpy(mask)[:, None]))
    ours = float(ssi_loss(jnp.asarray(pred), jnp.asarray(target),
                          jnp.asarray(mask), align_type="least_square"))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3)


def test_ssi_medium_vs_reference(ref):
    from genpercept_tpu.train.losses import ssi_loss

    pred, target, mask = _depth_pair(seed=9)
    loss_ref = ref.geometry.ScaleAndShiftInvariantLoss(align_type="medium")
    theirs = float(loss_ref(
        torch.from_numpy(pred)[:, None], torch.from_numpy(target)[:, None],
        torch.from_numpy(mask)[:, None]))
    ours = float(ssi_loss(jnp.asarray(pred), jnp.asarray(target),
                          jnp.asarray(mask), align_type="medium"))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_gradient_loss_vs_reference(ref):
    from genpercept_tpu.train.losses import gradient_loss

    pred, target, mask = _depth_pair(seed=10)
    for scales in (1, 4):
        loss_ref = ref.gradient.GradientLoss(scales=scales,
                                             reduction="batch-based")
        theirs = float(loss_ref(torch.from_numpy(pred),
                                torch.from_numpy(target),
                                torch.from_numpy(mask.astype(np.float32))))
        ours = float(gradient_loss(jnp.asarray(pred), jnp.asarray(target),
                                   jnp.asarray(mask), scales=scales))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4,
                                   err_msg=f"scales={scales}")


def test_gradient_log_loss_vs_reference(ref):
    from genpercept_tpu.train.losses import gradient_log_loss

    pred, target, mask = _depth_pair(seed=11)
    loss_ref = ref.gradient.GradientLoss_Li(scale_num=1)
    # the reference module consumes 4-D (B, C, H, W) and a BOOL mask
    theirs = float(loss_ref(torch.from_numpy(pred)[:, None],
                            torch.from_numpy(target)[:, None],
                            torch.from_numpy(mask)[:, None]))
    ours = float(gradient_log_loss(jnp.asarray(pred), jnp.asarray(target),
                                   jnp.asarray(mask), scales=1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_l1_losses_vs_reference(ref):
    from genpercept_tpu.train.losses import (l1_disp_loss, l1_inverse_loss,
                                             masked_l1)

    pred, target, mask = _depth_pair(seed=12)
    pt, tt = torch.from_numpy(pred), torch.from_numpy(target)
    mt = torch.from_numpy(mask)

    theirs = float(ref.l1.L1Loss()(pt, tt, mt))
    ours = float(masked_l1(jnp.asarray(pred), jnp.asarray(target),
                           jnp.asarray(mask)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)

    theirs = float(ref.l1.L1DispLoss()(pt, tt, mt))
    ours = float(l1_disp_loss(jnp.asarray(pred), jnp.asarray(target),
                              jnp.asarray(mask)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)

    theirs = float(ref.l1.L1InverseLoss()(pt, tt, mt))
    ours = float(l1_inverse_loss(jnp.asarray(pred), jnp.asarray(target),
                                 jnp.asarray(mask)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_angular_loss_vs_reference(ref):
    from genpercept_tpu.train.losses import angular_loss

    rng = np.random.default_rng(13)
    pred = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    target = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    target /= np.linalg.norm(target, axis=-1, keepdims=True)
    mask = rng.uniform(size=(2, 8, 8)) > 0.25

    # reference angular_loss: (B, C, H, W) layout, mask (B, 1, H, W)
    theirs = float(ref.geometry.angular_loss(
        torch.from_numpy(pred.transpose(0, 3, 1, 2)),
        torch.from_numpy(target.transpose(0, 3, 1, 2)),
        torch.from_numpy(mask[:, None])))
    ours = float(angular_loss(jnp.asarray(pred), jnp.asarray(target),
                              jnp.asarray(mask)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_vnl_back_projection_vs_reference(ref, monkeypatch):
    """The deterministic core of VNLoss (transfer_xyz back-projection with
    intrinsics); the triplet sampling is torch.randperm-stochastic and is
    covered structurally in test_lora_noise_metric3d."""
    vnl_mod = _load("ref_vnl", "genpercept/losses/metric3d_losses/VNL.py")

    real_arange = torch.arange
    real_meshgrid = torch.meshgrid

    def cpu_arange(*a, **kw):
        kw.pop("device", None)
        return real_arange(*a, **kw)

    monkeypatch.setattr(torch, "arange", cpu_arange)
    rng = np.random.default_rng(14)
    h, w = 12, 16
    fx = fy = 100.0
    u0, v0 = w / 2.0, h / 2.0
    intrinsic = torch.tensor(
        [[[fx, 0, u0], [0, fy, v0], [0, 0, 1.0]]], dtype=torch.float32)
    vnl = vnl_mod.VNLoss()
    vnl.init_image_coor(intrinsic, h, w)
    depth = rng.uniform(1.0, 5.0, (1, 1, h, w)).astype(np.float32)
    pw_ref = vnl.transfer_xyz(torch.from_numpy(depth),
                              torch.tensor([[fx]])[:, :, None, None],
                              vnl.u_m_u0, vnl.v_m_v0).numpy()

    from genpercept_tpu.train.metric3d_losses import _backproject
    pw_ours = np.asarray(_backproject(
        jnp.asarray(depth[0, 0]),
        jnp.asarray(np.array([[fx, 0, u0], [0, fy, v0], [0, 0, 1.0]],
                             np.float32))))
    np.testing.assert_allclose(pw_ours, pw_ref[0], rtol=1e-5, atol=1e-5)


# ------------------------------------------------------ mixed sampler


def test_mixed_batch_sampler_structure_vs_reference(ref):
    """Structural parity with the reference MixedBatchSampler on the same
    toy datasets: batch count, single-source batches, index ranges.
    (Draw-for-draw equality is impossible: torch vs numpy RNG.)"""
    from genpercept_tpu.data.sampler import MixedBatchSampler

    class _FakeDS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return i

    sizes = [10, 7, 5]
    batch = 2
    prob = [0.6, 0.3, 0.1]

    ref_sampler = ref.mixed_sampler.MixedBatchSampler(
        src_dataset_ls=[_FakeDS(n) for n in sizes],
        batch_size=batch, drop_last=True, shuffle=True, prob=prob,
        generator=torch.Generator().manual_seed(0))
    ours = MixedBatchSampler(
        [_FakeDS(n) for n in sizes], batch_size=batch, drop_last=True,
        shuffle=True, prob=prob, generator=np.random.default_rng(0))

    ref_batches = list(ref_sampler)
    our_batches = list(ours)
    # same number of batches per epoch (sum of floor(n_i / batch))
    assert len(ref_batches) == len(our_batches) == sum(
        n // batch for n in sizes)

    offsets = np.cumsum([0] + sizes)

    def src_of(idx):
        return int(np.searchsorted(offsets, idx, side="right") - 1)

    for batches in (ref_batches, our_batches):
        for b in batches:
            srcs = {src_of(i) for i in b}
            assert len(srcs) == 1, f"batch mixes sources: {b}"
            assert all(0 <= i < offsets[-1] for i in b)
