"""Loss-zoo parity tests against torch transcriptions of the reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from genpercept_tpu.train import losses as L


def _rand(shape, seed=0, positive=False):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=shape).astype(np.float32)
    return np.abs(x) + 0.5 if positive else x


def test_masked_mse_and_l1():
    pred = _rand((2, 8, 8), 0)
    targ = _rand((2, 8, 8), 1)
    mask = np.random.default_rng(2).uniform(size=(2, 8, 8)) > 0.3

    ours_mse = float(L.masked_mse(jnp.asarray(pred), jnp.asarray(targ), jnp.asarray(mask)))
    pt, tt, mt = map(torch.from_numpy, (pred, targ, mask))
    theirs_mse = F.mse_loss(pt[mt], tt[mt]).item()
    # reference divides by mask count which == count of selected elements
    np.testing.assert_allclose(ours_mse, theirs_mse, rtol=1e-5)

    ours_l1 = float(L.masked_l1(jnp.asarray(pred), jnp.asarray(targ), jnp.asarray(mask)))
    theirs_l1 = (torch.abs(pt - tt) * mt).sum() / (mt.sum() + 1e-6)
    np.testing.assert_allclose(ours_l1, theirs_l1.item(), rtol=1e-5)


def test_compute_scale_and_shift_matches_lstsq():
    pred = _rand((3, 16, 16), 3, positive=True)
    mask = np.random.default_rng(4).uniform(size=(3, 16, 16)) > 0.2
    s_true, t_true = 2.5, -0.7
    targ = s_true * pred + t_true

    s, t = L.compute_scale_and_shift(
        jnp.asarray(pred), jnp.asarray(targ), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(s), s_true, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, rtol=1e-3)


def test_ssi_least_square_zero_for_affine_pred():
    """If pred is an affine transform of target, SSI least-square loss ~ 0."""
    targ = _rand((2, 12, 12), 5, positive=True) + 1.0
    pred = 0.5 * targ + 0.3
    mask = np.ones((2, 12, 12), bool)
    loss = float(L.ssi_loss(jnp.asarray(pred), jnp.asarray(targ), jnp.asarray(mask)))
    assert loss < 1e-4


def test_ssi_medium_matches_torch_transcription():
    pred = _rand((2, 10, 10), 6, positive=True)
    targ = _rand((2, 10, 10), 7, positive=True)
    mask = np.random.default_rng(8).uniform(size=(2, 10, 10)) > 0.25

    ours = float(L.ssi_loss(jnp.asarray(pred), jnp.asarray(targ),
                            jnp.asarray(mask), "medium"))

    # torch transcription of geometry_losses.py ssi_mae (175-199)
    eps = 1e-6
    pt, tt = torch.from_numpy(pred), torch.from_numpy(targ)
    mt = torch.from_numpy(mask)
    bs = 2
    t_med = torch.median(tt.reshape(bs, -1), dim=1)[0]
    t_s = torch.abs(tt - t_med[:, None, None]).reshape(bs, -1).sum(1) / (
        mt.reshape(bs, -1).sum(1) + eps
    )
    t_tr = (tt - t_med[:, None, None]) / (t_s[:, None, None] + eps)
    p_med = torch.median(pt.reshape(bs, -1), dim=1)[0]
    p_s = torch.abs(pt - p_med[:, None, None]).reshape(bs, -1).sum(1) / (
        mt.reshape(bs, -1).sum(1) + eps
    )
    p_tr = (pt - p_med[:, None, None]) / (p_s[:, None, None] + eps)
    theirs = F.l1_loss(p_tr[mt], t_tr[mt]).item()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4)


def test_gradient_loss_matches_torch_transcription():
    pred = _rand((2, 16, 16), 9)
    targ = _rand((2, 16, 16), 10)
    mask = np.random.default_rng(11).uniform(size=(2, 16, 16)) > 0.2

    ours = float(L.gradient_loss(jnp.asarray(pred), jnp.asarray(targ),
                                 jnp.asarray(mask), scales=1))

    pt, tt = torch.from_numpy(pred), torch.from_numpy(targ)
    mt = torch.from_numpy(mask).float()
    diff = (pt - tt) * mt
    gx = torch.abs(diff[:, :, 1:] - diff[:, :, :-1]) * (mt[:, :, 1:] * mt[:, :, :-1])
    gy = torch.abs(diff[:, 1:, :] - diff[:, :-1, :]) * (mt[:, 1:, :] * mt[:, :-1, :])
    img = gx.sum((1, 2)) + gy.sum((1, 2))
    theirs = (img.sum() / mt.sum()).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_angular_loss_zero_for_identical_normals():
    n = _rand((1, 8, 8, 3), 12)
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    mask = np.ones((1, 8, 8), bool)
    loss = float(L.angular_loss(jnp.asarray(n), jnp.asarray(n), jnp.asarray(mask)))
    assert loss < 0.02  # arccos(1-eps) ~ 0.014


def test_angular_loss_pi_for_opposite():
    n = np.zeros((1, 4, 4, 3), np.float32)
    n[..., 2] = 1.0
    mask = np.ones((1, 4, 4), bool)
    loss = float(L.angular_loss(jnp.asarray(n), jnp.asarray(-n), jnp.asarray(mask)))
    np.testing.assert_allclose(loss, np.pi, atol=0.05)


def test_iter_exponential_schedule():
    from genpercept_tpu.train.lr import iter_exponential_schedule

    sched = iter_exponential_schedule(1.0, 25000, 0.01, 100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(50)), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(sched(25000)), 0.01, rtol=1e-3)
    np.testing.assert_allclose(float(sched(30000)), 0.01, rtol=1e-3)  # clamped
