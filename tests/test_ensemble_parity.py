"""Our on-device ALS ensembling vs a scipy-BFGS oracle of the reference's
objective (genpercept/util/ensemble.py:142-182): both align ensemble members
by per-member scale/shift minimizing pairwise RMS, then median-reduce and
min-max. The optimizers differ (closed-form alternation vs 2-iteration BFGS)
but the merged maps must agree closely on well-posed inputs."""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from genpercept_tpu.pipeline import ensemble_predictions


def _scipy_reference_merge(preds: np.ndarray, reduction="median"):
    """Transcription of the reference ensemble objective + pipeline."""
    E = preds.shape[0]
    lo = preds.reshape(E, -1).min(1)
    hi = preds.reshape(E, -1).max(1)
    s0 = 1.0 / np.clip(hi - lo, 1e-6, None)
    t0 = -s0 * lo
    x0 = np.concatenate([s0, t0])

    def cost(x):
        s, t = x[:E], x[E:]
        aligned = s[:, None, None] * preds + t[:, None, None]
        c = 0.0
        for i in range(E):
            for j in range(i + 1, E):
                c += np.sqrt(np.mean((aligned[i] - aligned[j]) ** 2))
        # range regularizer (ensemble.py:166-175)
        merged = np.median(aligned, axis=0) if reduction == "median" else aligned.mean(0)
        c += abs(merged.min()) * 1.0 + abs(1.0 - merged.max()) * 1.0
        return c

    res = minimize(cost, x0, method="BFGS", tol=1e-3,
                   options={"maxiter": 20})
    s, t = res.x[:E], res.x[E:]
    aligned = s[:, None, None] * preds + t[:, None, None]
    merged = np.median(aligned, axis=0)
    merged = (merged - merged.min()) / max(merged.max() - merged.min(), 1e-6)
    return merged


def test_als_matches_scipy_reference_objective():
    rng = np.random.default_rng(0)
    base = rng.uniform(size=(24, 24)).astype(np.float32)
    members = np.stack([
        1.7 * base - 0.3 + rng.normal(scale=5e-3, size=base.shape),
        0.6 * base + 0.9 + rng.normal(scale=5e-3, size=base.shape),
        base + rng.normal(scale=5e-3, size=base.shape),
    ]).astype(np.float32)

    ours = np.asarray(ensemble_predictions(jnp.asarray(members)))
    theirs = _scipy_reference_merge(members)

    corr = np.corrcoef(ours.ravel(), theirs.ravel())[0, 1]
    assert corr > 0.999, corr
    # after min-max both live in [0,1]; values should be close too
    assert np.abs(ours - theirs).mean() < 0.02
