"""Perception training losses (JAX, jittable, mask-aware).

Reimplements the loss zoo the reference trainer dispatches
(`genpercept_trainer.py:140-173,760-805`; `genpercept/losses/*`;
`src/util/loss.py`). All functions take NHW (or NHWC for normals) arrays and
boolean masks, reduce exactly like the reference (batch-based sum / total
valid count), and avoid NaN tricks (masked arithmetic instead), so they jit
and differentiate cleanly on TPU.

Canonical depth recipe weights (genpercept_trainer.py:785-805):
  mse x1.0, least_square_ssi x0.5, grad x2.0, on predictions shifted
  from [-1,1] to [1,3].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def _masked_sum_mean(value: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.sum(value * mask) / (jnp.sum(mask) + _EPS)


# ------------------------------------------------------------ simple losses

def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """F.mse_loss over masked elements (genpercept_trainer.py:790)."""
    return _masked_sum_mean((pred - target) ** 2, mask.astype(pred.dtype))


def masked_l1(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """L1Loss (genpercept/losses/l1_loss.py:4-22): sum|d|*m / sum m."""
    return _masked_sum_mean(jnp.abs(pred - target), mask.astype(pred.dtype))


# -------------------------------------------------------------- latent losses
# (src/util/loss.py factory: used for marigold-style latent training)

def silog_mse(pred: jax.Array, target: jax.Array, lam: float = 0.5,
              mask: jax.Array | None = None, log_pred: bool = False,
              batch_reduction: bool = True) -> jax.Array:
    """SILogMSELoss (src/util/loss.py:70-101): per-image first/second log
    terms, optional valid mask, then batch mean. log_pred=True means `pred`
    is already log-depth (the reference's default; our latent callers pass
    linear depth, hence log_pred=False here)."""
    lp = pred if log_pred else jnp.log(jnp.clip(pred, _EPS))
    d = lp - jnp.log(jnp.maximum(target, _EPS))
    if mask is not None:
        d = jnp.where(mask, d, 0.0)
        n = jnp.sum(mask, axis=(-1, -2))
    elif d.ndim >= 2:
        n = d.shape[-1] * d.shape[-2]
    else:
        n = d.shape[-1]
    axes = (-1, -2) if d.ndim >= 2 else (-1,)
    first = jnp.sum(d**2, axis=axes) / n
    second = lam * jnp.sum(d, axis=axes) ** 2 / (n**2)
    loss = first - second
    return jnp.mean(loss) if batch_reduction else loss

def silog_rmse(pred: jax.Array, target: jax.Array, lam: float = 0.5,
               mask: jax.Array | None = None, log_pred: bool = False,
               alpha: float = 1.0) -> jax.Array:
    """SILogRMSELoss (src/util/loss.py:104-140): sqrt of the per-image
    silog terms, batch-meaned, scaled by alpha."""
    loss = silog_mse(pred, target, lam, mask=mask, log_pred=log_pred,
                     batch_reduction=False)
    return jnp.mean(jnp.sqrt(jnp.maximum(loss, 0.0) + _EPS)) * alpha

def mean_abs_rel(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target) / jnp.maximum(jnp.abs(target), _EPS))


def get_loss(loss_name: str, **kwargs):
    """Latent-loss factory (reference src/util/loss.py:20-36): names
    silog_mse / silog_rmse / mse_loss / l1_loss / l1_loss_with_mask /
    mean_abs_rel."""
    if loss_name == "silog_mse":
        lam = kwargs.get("lamb", 0.5)
        log_pred = kwargs.get("log_pred", True)  # reference default
        return lambda pred, target, mask=None, **kw: silog_mse(
            pred, target, lam, mask=mask, log_pred=log_pred)
    if loss_name == "silog_rmse":
        lam = kwargs.get("lamb", 0.5)
        alpha = kwargs.get("alpha", 1.0)
        log_pred = kwargs.get("log_pred", True)
        return lambda pred, target, mask=None, **kw: silog_rmse(
            pred, target, lam, mask=mask, log_pred=log_pred, alpha=alpha)
    if loss_name == "mse_loss":
        return lambda pred, target, **kw: jnp.mean((pred - target) ** 2)
    if loss_name == "l1_loss":
        return lambda pred, target, **kw: jnp.mean(jnp.abs(pred - target))
    if loss_name == "l1_loss_with_mask":
        return lambda pred, target, mask=None, **kw: masked_l1(
            pred, target, mask if mask is not None else jnp.ones_like(pred, bool)
        )
    if loss_name == "mean_abs_rel":
        return lambda pred, target, **kw: mean_abs_rel(pred, target)
    raise ValueError(f"unknown loss: {loss_name}")


def l1_disp_loss(pred_disp: jax.Array, inv_depth: jax.Array, mask: jax.Array) -> jax.Array:
    """L1DispLoss (l1_loss.py:24-44): masked L1 in disparity space."""
    return _masked_sum_mean(jnp.abs(pred_disp - inv_depth), mask.astype(pred_disp.dtype))


def l1_inverse_loss(pred_depth: jax.Array, inv_depth: jax.Array, mask: jax.Array) -> jax.Array:
    """L1InverseLoss (l1_loss.py:46-63): invert the prediction (x10), masked
    to positive GT disparity."""
    m = mask & (inv_depth > 0)
    inv_pred = 10.0 / jnp.maximum(pred_depth, _EPS)
    return _masked_sum_mean(jnp.abs(inv_pred - inv_depth), m.astype(pred_depth.dtype))


def sig_loss(pred: jax.Array, target: jax.Array, mask: jax.Array,
             lam: float = 0.85) -> jax.Array:
    """Scale-invariant log loss over masked pixels (geometry_losses.py
    sig_loss family)."""
    m = mask.astype(pred.dtype)
    n = jnp.sum(m) + _EPS
    d = (jnp.log(jnp.maximum(pred, _EPS)) - jnp.log(jnp.maximum(target, _EPS))) * m
    return jnp.sqrt(jnp.maximum(
        jnp.sum(d**2) / n - lam * (jnp.sum(d) / n) ** 2, 0.0
    ))


# --------------------------------------------------- scale/shift invariance

def compute_scale_and_shift(pred: jax.Array, target: jax.Array, mask: jax.Array):
    """Closed-form per-sample (s, t) minimizing ||m*(s*pred+t-target)||^2
    (geometry_losses.py:63-91). pred/target/mask: (B, H, W).
    Returns s, t of shape (B,); zero where the system is singular."""
    m = mask.astype(pred.dtype)
    a00 = jnp.sum(m * pred * pred, axis=(1, 2))
    a01 = jnp.sum(m * pred, axis=(1, 2))
    a11 = jnp.sum(m, axis=(1, 2))
    b0 = jnp.sum(m * pred * target, axis=(1, 2))
    b1 = jnp.sum(m * target, axis=(1, 2))
    det = a00 * a11 - a01 * a01
    valid = det > 0
    safe_det = jnp.where(valid, det, 1.0)
    s = jnp.where(valid, (a11 * b0 - a01 * b1) / safe_det, 0.0)
    t = jnp.where(valid, (-a01 * b0 + a00 * b1) / safe_det, 0.0)
    return s, t


def _masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Median over masked elements per sample; 1.0 where mask is empty
    (geometry_losses.py:30-62 nanmedian semantics). x/mask: (B, N)."""
    big = jnp.float32(3.0e38)
    n_valid = jnp.sum(mask, axis=1)
    xs = jnp.sort(jnp.where(mask, x, big), axis=1)
    n = x.shape[1]
    # torch.nanmedian = lower median (index (k-1)//2 of valid entries)
    idx = jnp.clip((n_valid - 1) // 2, 0, n - 1).astype(jnp.int32)
    med = jnp.take_along_axis(xs, idx[:, None], axis=1)[:, 0]
    return jnp.where(n_valid > 0, med, 1.0)


def ssi_loss(
    pred: jax.Array, target: jax.Array, mask: jax.Array,
    align_type: str = "least_square",
) -> jax.Array:
    """ScaleAndShiftInvariantLoss (geometry_losses.py:168-252).

    least_square: align pred to target with closed-form (s, t); where s <= 0
    fall back to median-ratio scaling; L1 over masked pixels.
    medium: median/MAD normalize pred and target independently (the MAD sum
    runs over ALL pixels but divides by the masked count, faithfully to the
    reference ssi_mae), then masked L1.
    pred/target: (B, H, W); mask: (B, H, W) bool.
    """
    b = pred.shape[0]
    m = mask.astype(pred.dtype)
    if align_type == "least_square":
        s, t = compute_scale_and_shift(pred, target, mask)
        pf = pred.reshape(b, -1)
        tf = target.reshape(b, -1)
        mf = mask.reshape(b, -1) & (tf > 0)
        pred_med = _masked_median(pf, mf)
        targ_med = _masked_median(tf, mf)
        s_median = targ_med / (pred_med + 1e-8)
        use_median = (s <= 0)[:, None, None]
        scaled = jnp.where(
            use_median,
            pred * s_median[:, None, None],
            pred * s[:, None, None] + t[:, None, None],
        )
        return _masked_sum_mean(jnp.abs(scaled - target), m)
    elif align_type == "medium":
        eps = 1e-6
        pf = pred.reshape(b, -1)
        tf = target.reshape(b, -1)
        mf = mask.reshape(b, -1)
        n_valid = jnp.sum(mf, axis=1) + eps
        t_med = jnp.median(tf, axis=1)  # over ALL pixels, like the reference
        t_s = jnp.sum(jnp.abs(tf - t_med[:, None]), axis=1) / n_valid
        t_trans = (tf - t_med[:, None]) / (t_s[:, None] + eps)
        p_med = jnp.median(pf, axis=1)
        p_s = jnp.sum(jnp.abs(pf - p_med[:, None]), axis=1) / n_valid
        p_trans = (pf - p_med[:, None]) / (p_s[:, None] + eps)
        return _masked_sum_mean(jnp.abs(p_trans - t_trans), mf.astype(pred.dtype))
    raise ValueError(align_type)


# ------------------------------------------------------------ gradient loss

def _gradient_term(pred, target, mask):
    """Ke Xian gradient matching at one scale (gradient_loss.py:77-99),
    batch-based reduction. (B, H, W) inputs."""
    m = mask.astype(pred.dtype)
    diff = (pred - target) * m
    gx = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1]) * (m[:, :, 1:] * m[:, :, :-1])
    gy = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :]) * (m[:, 1:, :] * m[:, :-1, :])
    image_loss = jnp.sum(gx, axis=(1, 2)) + jnp.sum(gy, axis=(1, 2))
    total_m = jnp.sum(m)
    return jnp.where(total_m > 0, jnp.sum(image_loss) / jnp.maximum(total_m, 1.0), 0.0)


def gradient_loss(
    pred: jax.Array, target: jax.Array, mask: jax.Array, scales: int = 1
) -> jax.Array:
    """Multi-scale gradient matching (GradientLoss, gradient_loss.py:101-121;
    the main-paper recipe uses scales=1, genpercept_trainer.py:155)."""
    total = 0.0
    for scale in range(scales):
        step = 2**scale
        total += _gradient_term(
            pred[:, ::step, ::step], target[:, ::step, ::step], mask[:, ::step, ::step]
        )
    return total


def gradient_log_loss(
    pred: jax.Array, target: jax.Array, mask: jax.Array, scales: int = 1
) -> jax.Array:
    """Log-space gradient loss (GradientLoss_Li, gradient_loss.py:25-63):
    |d_i - d_{i+2}| over a TWO-pixel gap on the log-depth difference,
    normalized by the masked-GRADIENT count (sum of both direction masks
    + 1e-6), invalid targets shifted +100 before the log. Present in the
    reference but unwired by any training recipe (the trainer's grad_loss
    is the Ke-Xian GradientLoss); verified against the reference module in
    tests/test_reference_oracle.py. For scales > 1 both spatial dims are
    strided (the reference's own striding indexes the channel dim of its
    4-D input — broken for scale_num > 1 and never exercised)."""
    target_safe = target + jnp.where(mask, 0.0, 100.0)
    pred_log = jnp.log(jnp.maximum(pred, _EPS))
    gt_log = jnp.log(jnp.maximum(target_safe, _EPS))
    diff = pred_log - gt_log
    m = mask.astype(pred.dtype)
    total = 0.0
    for scale in range(scales):
        step = 2**scale
        d = diff[:, ::step, ::step]
        mm = m[:, ::step, ::step]
        v_m = mm[:, :-2, :] * mm[:, 2:, :]
        h_m = mm[:, :, :-2] * mm[:, :, 2:]
        v = jnp.abs(d[:, :-2, :] - d[:, 2:, :]) * v_m
        h = jnp.abs(d[:, :, :-2] - d[:, :, 2:]) * h_m
        n = jnp.sum(v_m) + jnp.sum(h_m) + 1e-6
        total += (jnp.sum(v) + jnp.sum(h)) / n
    return total / scales


# ----------------------------------------------------------- normals losses

def angular_loss(
    pred: jax.Array, target: jax.Array, mask: jax.Array,
    uncertainty_aware: bool = False, eps: float = 1e-4,
) -> jax.Array:
    """Angular (arccos cosine-similarity) loss for surface normals, with the
    optional ELU-kappa uncertainty head (geometry_losses.py:550-590).

    pred: (B, H, W, 3) or (B, H, W, 4 with kappa); target: (B, H, W, 3);
    mask: (B, H, W)."""
    n_pred = pred[..., :3]
    dot = jnp.sum(n_pred * target, axis=-1)
    norm = jnp.linalg.norm(n_pred, axis=-1) * jnp.linalg.norm(target, axis=-1)
    cos = dot / jnp.maximum(norm, 1e-8)
    ang = jnp.arccos(jnp.clip(cos, -1 + eps, 1 - eps))
    if uncertainty_aware or pred.shape[-1] == 4:
        kappa = jax.nn.elu(pred[..., 3]) + 1.01
        kappa_reg = jnp.log1p(jnp.exp(-kappa * jnp.pi)) - jnp.log(kappa**2 + 1)
        loss = kappa_reg + kappa * ang
    else:
        loss = ang
    return _masked_sum_mean(loss, mask.astype(loss.dtype))


def normal_l1_loss(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-pixel L1 over normal vectors (geometry_losses.py snorm_l1_loss)."""
    diff = jnp.sum(jnp.abs(pred[..., :3] - target), axis=-1)
    return _masked_sum_mean(diff, mask.astype(diff.dtype))
