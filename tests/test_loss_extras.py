"""Latent-loss factory, log gradient loss, disparity L1 variants, ZeRO-1."""

import jax
import jax.numpy as jnp
import numpy as np

from genpercept_tpu.train.losses import (
    get_loss,
    gradient_log_loss,
    l1_disp_loss,
    l1_inverse_loss,
    sig_loss,
)


def test_get_loss_factory():
    pred = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    targ = jnp.asarray([[1.5, 2.0], [3.0, 5.0]])
    for name in ("silog_mse", "silog_rmse", "mse_loss", "l1_loss",
                 "l1_loss_with_mask", "mean_abs_rel"):
        fn = get_loss(name)
        v = float(fn(pred, targ))
        assert np.isfinite(v) and v >= 0, name
    assert float(get_loss("mse_loss")(pred, pred)) == 0.0


def test_gradient_log_loss_zero_for_equal():
    x = jnp.asarray(np.random.default_rng(0).uniform(1, 5, (2, 8, 8)), jnp.float32)
    m = jnp.ones((2, 8, 8), bool)
    assert float(gradient_log_loss(x, x, m)) < 1e-6
    y = x * jnp.asarray(np.random.default_rng(1).uniform(0.5, 2, (2, 8, 8)), jnp.float32)
    assert float(gradient_log_loss(y, x, m)) > 0


def test_l1_disp_and_inverse():
    depth = jnp.asarray([[2.0, 5.0], [10.0, 1.0]])[None]
    inv = 10.0 / depth
    m = jnp.ones_like(depth, bool)
    assert float(l1_inverse_loss(depth, inv, m)) < 1e-6
    assert float(l1_disp_loss(inv, inv, m)) == 0.0
    np.testing.assert_allclose(float(l1_disp_loss(inv + 1, inv, m)), 1.0, rtol=1e-5)


def test_sig_loss():
    x = jnp.asarray(np.random.default_rng(2).uniform(1, 5, (1, 8, 8)), jnp.float32)
    m = jnp.ones((1, 8, 8), bool)
    assert float(sig_loss(x, x, m)) < 1e-4
    # fully scale-invariant only at lam=1.0
    assert float(sig_loss(x * 3, x, m, lam=1.0)) < 1e-3
    # at the default lam=0.85 a global scale leaves sqrt(0.15)*log(3)
    np.testing.assert_allclose(
        float(sig_loss(x * 3, x, m)), np.sqrt(0.15) * np.log(3), atol=1e-3
    )
    y = x + jnp.asarray(np.random.default_rng(3).normal(0, 0.5, (1, 8, 8)), jnp.float32)
    assert float(sig_loss(jnp.clip(y, 0.1), x, m)) > 0.01


def test_zero1_opt_state_sharding():
    import optax

    from genpercept_tpu.parallel import make_mesh
    from genpercept_tpu.parallel.mesh import shard_opt_state_zero1

    mesh = make_mesh(data=4, model=1)
    params = {"w": jnp.ones((8, 16)), "b": jnp.ones((3,))}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    sharded = shard_opt_state_zero1(opt_state, mesh)
    # adam mu for "w" must be sharded over the first divisible axis
    mu_w = sharded[0].mu["w"]
    specs = [s for s in mu_w.sharding.spec if s is not None]
    assert specs == ["data"]
    # odd-sized "b" falls back to replication
    mu_b = sharded[0].mu["b"]
    assert all(s is None for s in mu_b.sharding.spec)


def test_trainer_registry():
    from genpercept_tpu.train.registry import get_trainer_cls
    from genpercept_tpu.train.trainer import Trainer

    assert get_trainer_cls("GenPerceptTrainer") is Trainer
    assert get_trainer_cls("Trainer") is Trainer
