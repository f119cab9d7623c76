"""W8A8 symmetric per-channel quantization for VAE convolutions.

The v5e MXU runs s8 x s8 -> s32 at ~2x the bf16 rate (measured 255-448
TFLOP/s vs 124-173 at the VAE decoder hot shapes, scripts/profile_int8_conv.py),
and the bf16 VAE decode already sits at ~92% MFU — quantization is the only
remaining single-chip lever on the dominant pipeline phase.

Scheme (exact algebra, error only from the two round() calls):

  activation: per-INPUT-channel scale a[ci] (static, calibrated absmax with
      a safety margin);  xq = clip(round(x * 127/a[ci]), -127, 127) int8
  weight:     fold a into the kernel's input axis, w' = w * a[ci]/127, then
      per-OUTPUT-channel s[co] = absmax(w'[..., co])/127,
      wq = clip(round(w'/s), -127, 127) int8
  output:     y = conv_s8(xq, wq) * s[co] + bias   (f32 epilogue, fused)

Per-channel activation scales normally require a per-channel dequant that
conv can't express — but folding them into the weight's input axis is exact
(the conv is linear in each input channel), so this is per-channel-A +
per-channel-W quantization at per-tensor cost.

Calibration is static: VAE conv inputs sit directly after GroupNorm+SiLU,
whose output distribution is set by the learned norm parameters rather than
the input image, so absmax from one representative batch transfers.

The reference has no quantized path (fp16 autocast only,
/root/reference/run.py:270-280); this is a TPU-deployment addition, off by
default and gated on a measured fidelity bound (see PipelineConfig.int8_vae).
"""

from __future__ import annotations

import os
import sys
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

_DIMS = ("NHWC", "HWIO", "NHWC")


@jax.tree_util.register_pytree_node_class
class QConv:
    """Quantized conv parameters + static geometry.

    Array leaves (traced under jit): w_int8 (HWIO, int8; 4x4 for the
    upsample form), inv_a (Ci,) f32 = 127/a, o_scale (Co,) f32, bias
    (Co,) f32 or None, zp (Ci,) f32 zero-point or None (symmetric).
    Static aux: kind ('3x3' | 'up4x4'), stride, padding ((t,b),(l,r))."""

    def __init__(self, w_int8, inv_a, o_scale, bias, kind, stride, padding,
                 zp=None):
        self.w_int8 = w_int8
        self.inv_a = inv_a
        self.o_scale = o_scale
        self.bias = bias
        self.kind = kind
        self.stride = stride
        self.padding = padding
        self.zp = zp

    def tree_flatten(self):
        return ((self.w_int8, self.inv_a, self.o_scale, self.bias, self.zp),
                (self.kind, self.stride, self.padding))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves[:4], *aux, zp=leaves[4])


def absmax_per_channel(x: jax.Array) -> jax.Array:
    """Per-channel absolute max over all leading axes -> (C,) f32."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)),
                   axis=tuple(range(x.ndim - 1)))


# Candidate clip fractions for the per-channel MSE-optimal scale search.
# 1.0 = plain absmax; smaller fractions trade a little saturation error on
# the channel's tail for a finer quantization step on its bulk. The argmin
# over measured quantization MSE picks per channel.
CLIP_CANDIDATES = (1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4)


def mse_optimal_clip(x: jax.Array) -> jax.Array:
    """Per-channel clip value minimizing int8 quantization MSE -> (C,) f32.

    For each channel and each candidate clip a = frac * absmax, simulates
    symmetric 8-bit round-to-nearest with saturation and measures the mean
    squared reconstruction error over the calibration tensor; returns the
    winning clip per channel (Banner et al. 2019 style post-training scale
    search, done on-device inside the calibration program)."""
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    amax = jnp.max(jnp.abs(xf), axis=0)
    a0 = jnp.maximum(amax, 1e-8)
    errs = []
    for frac in CLIP_CANDIDATES:
        a = a0 * frac
        s = a / 127.0
        xq = jnp.clip(jnp.round(xf / s), -127.0, 127.0) * s
        errs.append(jnp.mean(jnp.square(xq - xf), axis=0))
    best = jnp.argmin(jnp.stack(errs), axis=0)
    fracs = jnp.asarray(CLIP_CANDIDATES, jnp.float32)
    return a0 * fracs[best]


def mse_optimal_clip_asym(x: jax.Array) -> jax.Array:
    """Asymmetric per-channel quantization range -> (2, C) f32 [zp, a].

    The channel's range [lo, hi] (forced to contain 0 — real zeros enter
    the conv via padding, so 0 must encode in-range) is parameterized as a
    midpoint zp and half-range a; encoding is xq = round((x-zp) * 127/a).
    VAE conv inputs sit after GroupNorm+SiLU whose output is bounded below
    at -0.278 but unbounded above — the measured activation-side int8
    error (profile_int8_vae --attribution: a-only 1.98e-2 of the 2.09e-2
    full-placement total) is dominated by the half of the symmetric range
    those skewed channels never use.

    The MSE search runs over three candidate families per channel:
    midpoint-shrink (both endpoints toward the center — the natural move
    for roughly-centered channels), hi-shrink (lo pinned, clip only the
    positive tail), and lo-shrink. The endpoint families matter: for a
    skewed post-SiLU channel like [-0.278, 10] the midpoint sits far from
    0, so ANY midpoint-shrink ejects 0 from the range and the feasibility
    guard rejects it — only endpoint shrinking can actually clip the tail.
    The winner's zp is snapped so real 0 encodes EXACTLY onto an integer
    code (padding contributes no rounding error)."""
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    lo = jnp.minimum(jnp.min(xf, axis=0), 0.0)
    hi = jnp.maximum(jnp.max(xf, axis=0), 0.0)
    z0 = (lo + hi) / 2.0
    a0 = jnp.maximum((hi - lo) / 2.0, 1e-8)
    cands = []  # (zp, a, feasible) per candidate
    for frac in CLIP_CANDIDATES:
        a = a0 * frac
        cands.append((z0, a, a >= jnp.abs(z0) * (1.0 + 1.0 / 127.0)))
        if frac < 1.0:  # frac=1.0 duplicates the midpoint family's
            t = jnp.bool_(True)
            cands.append(((lo + hi * frac) / 2.0,
                          jnp.maximum((hi * frac - lo) / 2.0, 1e-8), t))
            cands.append(((lo * frac + hi) / 2.0,
                          jnp.maximum((hi - lo * frac) / 2.0, 1e-8), t))
    errs, zps, amps = [], [], []
    for zp_c, a_c, ok in cands:
        s = a_c / 127.0
        xq = zp_c + jnp.clip(jnp.round((xf - zp_c) / s), -127.0, 127.0) * s
        err = jnp.mean(jnp.square(xq - xf), axis=0)
        errs.append(jnp.where(ok, err, jnp.inf))
        zps.append(zp_c)
        amps.append(a_c)
    best = jnp.argmin(jnp.stack(errs), axis=0)
    z = jnp.take_along_axis(jnp.stack(zps), best[None], axis=0)[0]
    a = jnp.take_along_axis(jnp.stack(amps), best[None], axis=0)[0]
    # snap zp so encode(0) = round(-zp*127/a) is exact (<= step/2 shift)
    q0 = jnp.round(-z * 127.0 / a)
    zp = -q0 * a / 127.0
    return jnp.stack([zp, a])


def conv_input_hessian(x: jax.Array, a_stat: jax.Array, *,
                       stride=(1, 1), padding=((1, 1), (1, 1))) -> jax.Array:
    """Gram matrix of the conv's im2col'd input in the int8 CODE domain
    -> (9*Ci, 9*Ci) f32, the GPTQ Hessian proxy H = sum c c^T.

    The quantized conv contracts codes c = (x - zp) * 127/a against the
    folded weight wf (ci-major within each of the 9 taps, matching
    quantize_conv's wf.reshape(-1, Co) layout: index = (kh*3+kw)*Ci + ci).
    Padding positions carry the code of real 0 (q0 = -zp*127/a; 0 when
    symmetric) — exactly what qconv_apply's q0-padding feeds the MXU — so
    H captures the border statistics the rounding error actually meets.
    Slices are cast to bf16 for the 81 pairwise tap dots (f32 accumulate);
    the Gram's ~1e-3 relative error is negligible under GPTQ's damping."""
    zp, a = _split_stat(jnp.asarray(a_stat), 1.0)
    xf = x.astype(jnp.float32)
    (pt, pb), (pl, pr) = padding
    xf = jnp.pad(xf, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    if zp is not None:
        xf = xf - zp  # pad positions become -zp = q0 * a/127
    xf = (xf * (127.0 / a)).astype(jnp.bfloat16)
    sh, sw = stride
    n_h = (xf.shape[1] - 3) // sh + 1
    n_w = (xf.shape[2] - 3) // sw + 1
    ci = xf.shape[-1]
    cols = [
        xf[:, dh:dh + (n_h - 1) * sh + 1:sh,
           dw:dw + (n_w - 1) * sw + 1:sw, :].reshape(-1, ci)
        for dh in range(3) for dw in range(3)
    ]
    rows = []
    for i in range(9):
        rows.append(jnp.concatenate(
            [jax.lax.dot_general(
                cols[i], cols[j], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
             for j in range(9)], axis=1))
    return jnp.concatenate(rows, axis=0)


def dense_input_hessian(x: jax.Array, a_stat: jax.Array) -> jax.Array:
    """Dense analogue of conv_input_hessian -> (din, din) f32."""
    zp, a = _split_stat(jnp.asarray(a_stat), 1.0)
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    if zp is not None:
        xf = xf - zp
    xf = (xf * (127.0 / a)).astype(jnp.bfloat16)
    return jax.lax.dot_general(xf, xf, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def gptq_round(wf: jax.Array, o_scale: jax.Array, H: jax.Array,
               damp: float = 0.01) -> jax.Array:
    """GPTQ error-compensated rounding (Frantar et al. 2022) -> int8 (d, Co).

    Rounds the activation-folded weight wf (d, Co) to the fixed per-output
    -channel grid o_scale, but instead of round-to-nearest, processes input
    dims in order and folds each dim's rounding error into the not-yet-
    quantized dims via the Cholesky of the damped inverse Hessian — the
    exact OBQ update under a fixed elimination order. Runs as one
    lax.scan over d rows entirely on device (d <= 4608 for the VAE; ~20
    GFLOP — calibration-time only, zero runtime cost). No activation
    reordering (act-order buys little at 8 bits under per-channel scales).

    In CODE-domain terms: minimizes (wf - wq*o_scale)^T H (wf - wq*o_scale)
    per output channel, H from conv_input_hessian / dense_input_hessian.
    With H = I this reduces exactly to round-to-nearest."""
    d = wf.shape[0]
    wf = wf.astype(jnp.float32)
    Hf = H.astype(jnp.float32)
    dm = jnp.mean(jnp.diagonal(Hf))
    Hd = Hf + (damp * dm + 1e-12) * jnp.eye(d, dtype=jnp.float32)
    # U upper-triangular with H^-1 = U^T U; eliminating dim i leaves
    # U[i+1:, i+1:] as the factor of the remaining submatrix's inverse —
    # the property GPTQ's sequential update relies on.
    U = jnp.linalg.cholesky(jnp.linalg.inv(Hd)).T

    def step(W, xs):
        u, i = xs
        w_i = jax.lax.dynamic_index_in_dim(W, i, 0, keepdims=False)
        q = jnp.clip(jnp.round(w_i / o_scale), -127.0, 127.0)
        u_ii = jax.lax.dynamic_index_in_dim(u, i, 0, keepdims=False)
        err = (w_i - q * o_scale) / jnp.maximum(u_ii, 1e-12)
        # u[:i] = 0 (upper triangular), so already-quantized rows are
        # untouched; row i itself is overwritten but its q was emitted.
        return W - jnp.outer(u, err), q

    _, qs = jax.lax.scan(step, wf, (U, jnp.arange(d)))
    return qs.astype(jnp.int8)


def merge_stats(a: Dict[str, jax.Array], b: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Merge two calibration stat dicts (same keys). Symmetric (C,) stats
    max-merge; asymmetric (2, C) [zp, a] stats merge by the union of the
    ranges [zp-a, zp+a] (re-snapping is left to the consumer — the <=
    step/2 zp drift is negligible across calibration batches)."""
    out = {}
    for k in a:
        sa, sb = a[k], b[k]
        if sa.ndim == 2:
            lo = jnp.minimum(sa[0] - sa[1], sb[0] - sb[1])
            hi = jnp.maximum(sa[0] + sa[1], sb[0] + sb[1])
            out[k] = jnp.stack([(lo + hi) / 2.0, (hi - lo) / 2.0])
        else:
            out[k] = jnp.maximum(sa, sb)
    return out


def calibrate_chunked(calib_fn, params, rgb, *extra, chunk: int = 4):
    """Run a jitted calibration program over batch chunks and merge.

    The calibration program's live set is ~2x the inference program's
    (full-res f32 stat temps for the min/max/clip search, plus one extra
    in-trace quantized conv per layer for bias correction); at 768^2
    batch 16 with asymmetric activation stats it needs 25.4 GB — past the
    16 GB v5e HBM. Per-channel activation ranges converge with a few
    images, so calibration runs in chunks of `chunk` along the batch:

      * range stats union across chunks (merge_stats);
      * bias-correction residuals ('corr') average — each chunk's corr is
        measured against its own in-trace quantizer, a second-order
        approximation of the merged quantizer's residual;
      * full-precision predictions concatenate, so a caller that serves
        the calibration batch's output (GenPerceptPipeline._run) still
        returns the whole batch.

    `extra` arrays (e.g. marigold noise) are sliced along axis 0 in step
    with rgb; None / non-array extras pass through unchanged. The batch
    dispatches as ceil(b/chunk) executions of one (or, on a ragged tail,
    two) compiled programs — same total FLOPs as the single-program form."""
    b = rgb.shape[0]
    chunk = max(1, min(chunk, b))

    def run(lo, hi):
        sliced = tuple(
            e[lo:hi] if hasattr(e, "shape") and getattr(e, "ndim", 0) > 0
            else e
            for e in extra)
        return calib_fn(params, rgb[lo:hi], *sliced)

    def merge_val(a, b):
        # grouped ({"enc": {path: stat}}) and flat ({path: stat}) layouts
        if isinstance(a, dict):
            return merge_stats(a, b)
        return merge_stats({"_": a}, {"_": b})["_"]

    # side-channels merged by AVERAGING across chunks instead of range
    # union: per-chunk bias-correction residuals ("corr") and GPTQ input
    # Hessians ("hess" — scale-free in gptq_round, so mean == sum). The
    # average is weighted by chunk size, so a ragged tail chunk (1 image
    # in a chunk-4 run) contributes proportionally, not equally. The
    # Grams are pulled to HOST each chunk and summed in numpy: keeping the
    # running sums device-resident while async dispatch queues the next
    # chunk held 2-3 Gram sets live at once and reproducibly OOM'd the
    # 16 GB HBM at 768^2 (hess is calibration-only, so the extra D2H copy
    # costs nothing at runtime).
    #
    # Both side-channels are second-order approximations of their merged-
    # stat values: each chunk measures corr against its own in-trace
    # quantizer and accumulates its Gram in its own chunk's code domain
    # (that chunk's zp/a), while the consumers (apply_bias_correction,
    # gptq_round) fold the MERGED stats into the weights. The per-channel
    # affine drift between a chunk's range and the union range is what the
    # 1.1x/clip-search margins already absorb; an exact two-pass recompute
    # was judged not worth a second full calibration program. Additionally,
    # under int8_gptq the corr residuals are measured against the
    # RTN-rounded quantizer but folded onto the GPTQ-rounded tree — an
    # RTN-domain approximation of the (smaller) GPTQ rounding error.
    avg_keys = ("corr", "hess")
    host_keys = ("hess",)
    preds, merged = [], None
    avg_sums: Dict[str, Dict] = {}
    n_images = 0
    for lo in range(0, b, chunk):
        hi = min(lo + chunk, b)
        if os.environ.get("GENPERCEPT_CALIB_PROGRESS"):
            print(f"calibrate_chunked: chunk {lo}:{hi} of {b}",
                  file=sys.stderr, flush=True)
        pred, stats = run(lo, hi)
        preds.append(pred)
        sz = hi - lo
        n_images += sz
        groups = {k: v for k, v in stats.items() if k not in avg_keys}
        for key in avg_keys:
            side = stats.pop(key, None)
            if side is None:
                continue
            assert isinstance(side, dict) and all(
                isinstance(v, dict) for v in side.values()), (
                f"'{key}' side-channel must be a {{group: {{path: array}}}} "
                "tree (flat dicts would silently iterate array rows)")
            side = jax.tree.map(lambda v: v * sz, side)  # chunk-size weight
            if key in host_keys:
                host = jax.tree.map(jax.device_get, side)
                # drop the DEVICE Gram buffers before the next chunk
                # dispatches — holding them across iterations keeps two
                # chunks' Grams (~2x1.8 GB for the VAE) live at once and
                # OOMs the 16 GB HBM alongside the calibration live set
                del side
                side = host
            if key not in avg_sums:
                avg_sums[key] = side
            else:
                avg_sums[key] = {
                    g: {k: avg_sums[key][g][k] + side[g][k] for k in side[g]}
                    for g in side}
        if merged is None:
            merged = groups
            continue
        merged = {k: merge_val(merged[k], groups[k]) for k in groups}
    out = dict(merged)
    for key, sums in avg_sums.items():
        out[key] = {g: {k: v / n_images for k, v in d.items()}
                    for g, d in sums.items()}
    pred = preds[0] if len(preds) == 1 else jnp.concatenate(preds, axis=0)
    return pred, out


def _mse_optimal_clip_cols(wf: jax.Array) -> jax.Array:
    """Per-COLUMN (output-channel) clip minimizing int8 quantization MSE for
    a 2-D matrix wf (rows = flattened taps*input-channels, cols = Co).

    Used on the activation-folded weight wf = w * a[ci]/127: its rows are
    already scaled by the calibrated activation ranges, so plain weight MSE
    here is an activation-weighted proxy of the layer's output error. On
    uniform-init weights this reduces to ~absmax (no tails to clip); on real
    SD2.1 weights per-channel outliers make the clipped scale materially
    finer for the bulk."""
    amax = jnp.max(jnp.abs(wf), axis=0)
    a0 = jnp.maximum(amax, 1e-12)
    errs = []
    for frac in CLIP_CANDIDATES:
        s = a0 * frac / 127.0
        wq = jnp.clip(jnp.round(wf / s), -127.0, 127.0) * s
        errs.append(jnp.mean(jnp.square(wq - wf), axis=0))
    best = jnp.argmin(jnp.stack(errs), axis=0)
    fracs = jnp.asarray(CLIP_CANDIDATES, jnp.float32)
    return a0 * fracs[best]


def _norm_geometry(stride, padding) -> Tuple[Tuple[int, int], tuple]:
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and padding and not isinstance(padding[0], tuple):
        padding = (padding, padding)
    return tuple(stride), tuple(tuple(p) for p in padding)


def _collapse_up_kernel(w: jax.Array) -> jax.Array:
    """3x3 HWIO -> the 4x4 lhs-dilated kernel of ops.conv.nearest_up2_conv3x3
    (same separable row/column collapse; see that docstring)."""
    r = jnp.concatenate([w[:1], w[:1] + w[1:2], w[1:2] + w[2:3], w[2:3]], axis=0)
    return jnp.concatenate(
        [r[:, :1], r[:, :1] + r[:, 1:2], r[:, 1:2] + r[:, 2:3], r[:, 2:3]], axis=1
    )


def _split_stat(a_stat: jax.Array, margin: float):
    """Normalize a calibration stat to (zp | None, half-range a).

    (C,) = symmetric absmax/clip; (2, C) = asymmetric [zp, a] from
    mse_optimal_clip_asym. margin widens the half-range around the fixed
    midpoint; the zero-point is re-snapped onto the widened grid so real 0
    still encodes exactly."""
    if a_stat.ndim == 2:
        zp = a_stat[0].astype(jnp.float32)
        a = jnp.maximum(a_stat[1].astype(jnp.float32) * margin, 1e-8)
        q0 = jnp.round(-zp * 127.0 / a)
        return -q0 * a / 127.0, a
    return None, jnp.maximum(a_stat.astype(jnp.float32) * margin, 1e-8)


def quantize_conv(
    conv_p: Dict[str, jax.Array],
    a_absmax: jax.Array,
    *,
    kind: str = "3x3",
    stride=1,
    padding=1,
    margin: float = 1.1,
    weight_clip: bool = False,
    hess: jax.Array | None = None,
) -> QConv:
    """Build a QConv from bf16/f32 conv params + a calibrated input stat —
    (C,) symmetric absmax/clip, or (2, C) asymmetric [zp, a].

    hess (9*Ci, 9*Ci): calibrated code-domain input Gram; when given, the
    weight rounds via GPTQ error compensation (gptq_round) instead of
    round-to-nearest. Ignored for up4x4 (the collapsed lhs-dilated kernel
    sees algebraic-zero taps the Gram doesn't model).

    margin headroom guards against activations slightly exceeding the
    calibration batch's range at runtime (excess is clipped to +-127).
    weight_clip runs the per-output-channel MSE-optimal clip search on the
    activation-folded weight instead of plain absmax (outlier-aware PTQ for
    trained weights; exact no-op on tail-free uniform init).

    Asymmetric algebra: y = conv(x-zp, w) + sum_{taps,ci} zp[ci]*w[..ci..]
    — the first term is the quantized conv on the SHIFTED input (padded
    with the exact int8 code of real 0 so padding decodes correctly; see
    qconv_apply), the second is an exact f32 constant per output channel
    folded into the bias. up4x4 upsamplers degrade to the covering
    symmetric range: the
    lhs-dilation zeros of the collapsed kernel are algebraic zeros, not
    real activations, so a zero-point cannot be folded there."""
    w = conv_p["weight"].astype(jnp.float32)
    if kind == "up4x4":
        w = _collapse_up_kernel(w)
    zp, a = _split_stat(jnp.asarray(a_absmax), margin)
    if zp is not None and kind == "up4x4":
        a = jnp.maximum(jnp.abs(zp) + a, 1e-8)
        zp = None
    wf = w * (a / 127.0)[None, None, :, None]
    if weight_clip:
        clip = _mse_optimal_clip_cols(wf.reshape(-1, wf.shape[-1]))
        o_scale = jnp.maximum(clip / 127.0, 1e-12)
    else:
        o_scale = jnp.maximum(
            jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0, 1e-12)
    if hess is not None and kind != "up4x4":
        # GPTQ rounds the (9*Ci, Co) matrix in conv_input_hessian's
        # (tap-major, ci-minor) row order — exactly wf.reshape(-1, Co)
        wq = gptq_round(wf.reshape(-1, wf.shape[-1]), o_scale,
                        hess).reshape(wf.shape)
    else:
        wq = jnp.clip(jnp.round(wf / o_scale), -127, 127).astype(jnp.int8)
    stride, padding = _norm_geometry(stride, padding)
    bias = conv_p.get("bias")
    bias = None if bias is None else bias.astype(jnp.float32)
    if zp is not None:
        # the offset constant must use the QUANTIZED weight's effective
        # value (wq*o_scale un-folded by 127/a), not the float weight —
        # otherwise per-element weight rounding error couples to the
        # zero-point magnitude instead of cancelling exactly:
        # y = (sum xq*wq)*o_scale + sum zp*w_hat = sum x*w_hat.
        zq = zp * (127.0 / a)
        z_co = jnp.einsum(
            "hwio,i->o", wq.astype(jnp.float32), zq) * o_scale
        bias = z_co if bias is None else bias + z_co
    return QConv(wq, (127.0 / a), o_scale, bias, kind, stride, padding, zp)


def qconv_apply(q: QConv, x: jax.Array) -> jax.Array:
    """Quantize x per-channel, run the s8 conv on the MXU, dequantize.

    The quantize (round/clip) fuses into whatever elementwise chain
    produced x (GN+SiLU), and the f32-scale + bias epilogue fuses into the
    conv output; only the int8 tensor round-trips HBM (half the bf16
    traffic).

    Asymmetric path (q.zp set): the int8 code runs the SHIFTED input
    (x - zp), so the conv's native zero padding would decode to x = zp
    instead of the true pad value 0. Fix: pad the int8 code tensor
    explicitly with q0 = round(-zp*127/a) — zp is snapped at calibration
    so q0 is the EXACT code of real 0 — and run the conv pad-free. Every
    tap (real or pad) then decodes uniformly as code*a/127 + zp, which is
    exactly what the z_co constant folded into the bias assumes, so the
    algebra is exact up to the int8 rounding the symmetric path already
    has. Cost: one int8 concat copy of the conv input (~1/4 of one bf16
    pass) per conv; the scale+bias epilogue fuses identically to the
    symmetric path.

    Three exact output-side formulations were measured on-chip and
    rejected (768^2 b16, exclude-encoder placement, vs 18.4 img/s
    symmetric): explicitly zero-padding the FLOAT input = 16.5 img/s
    (f32 pad copy, breaks producer-chain fusion); .at[row].add border
    repairs = 15.6 img/s (each dynamic-update-slice copies the full conv
    output); iota/where border masks subtracted from the f32 epilogue =
    OOM (XLA materialized the epilogue as f32 temps with layout copies —
    3x 1.14 GB per decoder stage at calibration chunk 4)."""
    xf = x.astype(jnp.float32)
    if q.zp is not None:
        xf = xf - q.zp
    xq = jnp.clip(jnp.round(xf * q.inv_a), -127.0, 127.0).astype(jnp.int8)
    padding = q.padding
    if q.zp is not None and q.kind != "up4x4":
        q0 = jnp.round(-q.zp * q.inv_a).astype(jnp.int8)
        (th, bh), (lw, rw) = padding
        if th or bh:
            b, _, w, c = xq.shape
            row = jnp.broadcast_to(q0, (b, 1, w, c))
            xq = jnp.concatenate([row] * th + [xq] + [row] * bh, axis=1)
        if lw or rw:
            b, h, _, c = xq.shape
            col = jnp.broadcast_to(q0, (b, h, 1, c))
            xq = jnp.concatenate([col] * lw + [xq] + [col] * rw, axis=2)
        padding = ((0, 0), (0, 0))
    if q.kind == "up4x4":
        y = jax.lax.conv_general_dilated(
            xq, q.w_int8, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
            dimension_numbers=_DIMS, preferred_element_type=jnp.int32,
        )
    else:
        y = jax.lax.conv_general_dilated(
            xq, q.w_int8, q.stride, list(padding),
            dimension_numbers=_DIMS, preferred_element_type=jnp.int32,
        )
    out = y.astype(jnp.float32) * q.o_scale
    if q.bias is not None:
        out = out + q.bias
    return out.astype(x.dtype)


@jax.tree_util.register_pytree_node_class
class QDense:
    """Quantized linear layer: w_int8 (din, dout), inv_a (din,) f32,
    o_scale (dout,) f32, bias (dout,) f32 or None, zp (din,) f32 or None.
    Same folding algebra as QConv with the weight's input axis playing the
    role of ci; a dense layer has no padding, so the asymmetric case is
    just y = (x-zp)W + zp@W with zp@W folded into the bias."""

    def __init__(self, w_int8, inv_a, o_scale, bias, zp=None):
        self.w_int8 = w_int8
        self.inv_a = inv_a
        self.o_scale = o_scale
        self.bias = bias
        self.zp = zp

    def tree_flatten(self):
        return ((self.w_int8, self.inv_a, self.o_scale, self.bias, self.zp),
                ())

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def quantize_dense(
    p: Dict[str, jax.Array], a_absmax: jax.Array, *, margin: float = 1.1,
    cols: slice | None = None, weight_clip: bool = False,
    hess: jax.Array | None = None,
) -> QDense:
    """Build a QDense from (in, out) linear params + calibrated input absmax.
    cols selects a column slice of the weight/bias (used to quantize the two
    halves of the fused GEGLU projection as separate matmuls, preserving the
    split-FF HBM optimization — see models/layers.py::feed_forward).
    hess (din, din): code-domain input Gram -> GPTQ rounding (gptq_round)."""
    w = p["weight"].astype(jnp.float32)
    bias = p.get("bias")
    if cols is not None:
        w = w[:, cols]
        bias = None if bias is None else bias[cols]
    zp, a = _split_stat(jnp.asarray(a_absmax), margin)
    wf = w * (a / 127.0)[:, None]
    if weight_clip:
        o_scale = jnp.maximum(_mse_optimal_clip_cols(wf) / 127.0, 1e-12)
    else:
        o_scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0, 1e-12)
    if hess is not None:
        wq = gptq_round(wf, o_scale, hess)
    else:
        wq = jnp.clip(jnp.round(wf / o_scale), -127, 127).astype(jnp.int8)
    bias = None if bias is None else bias.astype(jnp.float32)
    if zp is not None:
        # quantized-weight offset constant — see quantize_conv
        z_o = ((zp * (127.0 / a)) @ wq.astype(jnp.float32)) * o_scale
        bias = z_o if bias is None else bias + z_o
    return QDense(wq, (127.0 / a), o_scale, bias, zp)


def qdense_apply(q: QDense, x: jax.Array) -> jax.Array:
    """Quantize x per input channel, s8 matmul on the MXU, dequantize."""
    xf = x.astype(jnp.float32)
    if q.zp is not None:
        xf = xf - q.zp
    xq = jnp.clip(jnp.round(xf * q.inv_a), -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, q.w_int8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * q.o_scale
    if q.bias is not None:
        out = out + q.bias
    return out.astype(x.dtype)


# ------------------------------------------------------------ conv_fn hooks
#
# The VAE traversals (models/vae.py) accept an optional
#   conv_fn(name, conv_p, x, *, kind="3x3", stride=1, padding=1) -> y
# applied to every quantizable conv (resnet conv1/conv2, downsamplers,
# upsamplers). These factories build the two interesting hooks.


def minmax_asym(x: jax.Array) -> jax.Array:
    """Plain (searchless) asymmetric range stat -> (2, C) [zp, a] with the
    range forced to contain 0 and zp snapped (see mse_optimal_clip_asym)."""
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    lo = jnp.minimum(jnp.min(xf, axis=0), 0.0)
    hi = jnp.maximum(jnp.max(xf, axis=0), 0.0)
    z0 = (lo + hi) / 2.0
    a = jnp.maximum((hi - lo) / 2.0, 1e-8)
    q0 = jnp.round(-z0 * 127.0 / a)
    return jnp.stack([-q0 * a / 127.0, a])


def _calib_stat(x, clip_search: bool, asymmetric: bool):
    if asymmetric:
        return mse_optimal_clip_asym(x) if clip_search else minmax_asym(x)
    return mse_optimal_clip(x) if clip_search else absmax_per_channel(x)


def make_calib_conv_fn(stats: Dict[str, jax.Array], corr: Dict | None = None,
                       clip_search: bool = False, margin: float = 1.1,
                       weight_clip: bool = False, asymmetric: bool = False,
                       hess: Dict | None = None):
    """Records per-channel input scale into `stats` (traced values — the
    caller must return `stats` from the jitted function) and runs the
    ordinary full-precision conv.

    clip_search replaces the absmax statistic with the MSE-optimal clip.
    If `corr` is given, the calibration program additionally quantizes the
    layer in-trace (same arithmetic as quantize_from_stats) and records the
    per-output-channel mean of (y_fp - y_int8) — the systematic component
    of the quantization error, E[dW.x] (Banner et al. 2019 bias
    correction), later folded into the quantized bias by
    apply_bias_correction. One extra conv per layer, calibration-only.
    If `hess` is given, also records the code-domain input Gram
    (conv_input_hessian) for GPTQ weight rounding — ~85 MB per 512-channel
    layer, VAE-scale only (the UNet's 1280-channel convs would need 530 MB
    each; calibrate with a smaller chunk when enabled)."""
    from genpercept_tpu.ops.conv import conv2d, nearest_up2_conv3x3

    def conv_fn(name, conv_p, x, *, kind="3x3", stride=1, padding=1):
        a = _calib_stat(x, clip_search, asymmetric)
        stats[name] = a
        if kind == "up4x4":
            y = nearest_up2_conv3x3(x, conv_p["weight"], conv_p.get("bias"))
        else:
            y = conv2d(x, conv_p["weight"], conv_p.get("bias"),
                       stride=stride, padding=padding)
        if hess is not None and kind != "up4x4":
            st, pd = _norm_geometry(stride, padding)
            hess[name] = conv_input_hessian(x, a, stride=st, padding=pd)
        if corr is not None:
            q = quantize_conv(conv_p, a, kind=kind, stride=stride,
                              padding=padding, margin=margin,
                              weight_clip=weight_clip)
            corr[name] = jnp.mean(
                (y - qconv_apply(q, x)).astype(jnp.float32),
                axis=tuple(range(y.ndim - 1)))
        return y

    return conv_fn


def make_quant_conv_fn(qtree: Dict[str, QConv]):
    """Routes convs present in `qtree` through the int8 path; anything
    missing falls back to full precision."""
    from genpercept_tpu.ops.conv import conv2d, nearest_up2_conv3x3

    def conv_fn(name, conv_p, x, *, kind="3x3", stride=1, padding=1):
        q = qtree.get(name)
        if q is not None:
            return qconv_apply(q, x)
        if kind == "up4x4":
            return nearest_up2_conv3x3(x, conv_p["weight"], conv_p.get("bias"))
        return conv2d(x, conv_p["weight"], conv_p.get("bias"),
                      stride=stride, padding=padding)

    return conv_fn


def make_calib_dense_fn(stats: Dict[str, jax.Array], corr: Dict | None = None,
                        clip_search: bool = False, margin: float = 1.1,
                        weight_clip: bool = False, asymmetric: bool = False,
                        hess: Dict | None = None):
    """Dense analogue of make_calib_conv_fn (p arrives pre-column-sliced
    for the GEGLU :h/:g halves, so in-trace quantization needs no cols)."""
    from genpercept_tpu.ops.attention import attention_projection

    def dense_fn(name, p, x):
        a = _calib_stat(x, clip_search, asymmetric)
        stats[name] = a
        y = attention_projection(x, p["weight"], p.get("bias"))
        if hess is not None:
            hess[name] = dense_input_hessian(x, a)
        if corr is not None:
            q = quantize_dense(p, a, margin=margin, weight_clip=weight_clip)
            corr[name] = jnp.mean(
                (y - qdense_apply(q, x)).astype(jnp.float32),
                axis=tuple(range(y.ndim - 1)))
        return y

    return dense_fn


def make_quant_dense_fn(qtree: Dict) -> "callable":
    from genpercept_tpu.ops.attention import attention_projection

    def dense_fn(name, p, x):
        q = qtree.get(name)
        if q is not None:
            return qdense_apply(q, x)
        return attention_projection(x, p["weight"], p.get("bias"))

    # models/layers.py::feed_forward inspects the tree to fuse a fully-
    # quantized GEGLU FF into one Pallas program (fused_geglu_ff_int8)
    dense_fn.qtree = qtree
    return dense_fn


def save_calibration(path, vq: Dict[str, Dict]) -> None:
    """Persist a calibrated {'enc'|'dec'|'unet': {path: QConv|QDense}} tree
    to one .npz so deployments (cli.run --int8_calibration, cli.serve)
    calibrate once and reload instead of paying the extra full-precision
    compile + pass per process. '|'-joined keys; static conv geometry in a
    JSON __meta__ entry."""
    import json

    import numpy as np

    arrays: Dict[str, "np.ndarray"] = {}
    meta: Dict[str, dict] = {}
    for group, tree in vq.items():
        for name, q in tree.items():
            key = f"{group}|{name}"
            if isinstance(q, QConv):
                meta[key] = {"type": "conv", "kind": q.kind,
                             "stride": list(q.stride),
                             "padding": [list(p) for p in q.padding]}
            else:
                meta[key] = {"type": "dense"}
            arrays[key + "|w"] = np.asarray(q.w_int8)
            arrays[key + "|a"] = np.asarray(q.inv_a)
            arrays[key + "|s"] = np.asarray(q.o_scale)
            if q.bias is not None:
                arrays[key + "|b"] = np.asarray(q.bias)
            if q.zp is not None:
                arrays[key + "|z"] = np.asarray(q.zp)
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_calibration(path) -> Dict[str, Dict]:
    """Inverse of save_calibration -> {'enc'|...: {path: QConv|QDense}}."""
    import json

    import numpy as np

    with np.load(path) as z:
        meta = json.loads(str(z["__meta__"]))
        vq: Dict[str, Dict] = {}
        for key, m in meta.items():
            group, name = key.split("|", 1)
            w = jnp.asarray(z[key + "|w"])
            a = jnp.asarray(z[key + "|a"])
            s = jnp.asarray(z[key + "|s"])
            b = jnp.asarray(z[key + "|b"]) if key + "|b" in z else None
            zp = jnp.asarray(z[key + "|z"]) if key + "|z" in z else None
            if m["type"] == "conv":
                q = QConv(w, a, s, b, m["kind"], tuple(m["stride"]),
                          tuple(tuple(p) for p in m["padding"]), zp)
            else:
                q = QDense(w, a, s, b, zp)
            vq.setdefault(group, {})[name] = q
    return vq


def apply_bias_correction(qtree: Dict, corr: Dict) -> Dict:
    """Fold calibration-measured mean errors into the quantized biases:
    bias += E[y_fp - y_int8]. Layers without a recorded correction pass
    through unchanged."""
    out: Dict = {}
    for k, q in qtree.items():
        c = corr.get(k)
        if c is None:
            out[k] = q
            continue
        c = jnp.asarray(c, jnp.float32)
        bias = c if q.bias is None else q.bias + c
        if isinstance(q, QConv):
            out[k] = QConv(q.w_int8, q.inv_a, q.o_scale, bias,
                           q.kind, q.stride, q.padding, q.zp)
        else:
            out[k] = QDense(q.w_int8, q.inv_a, q.o_scale, bias, q.zp)
    return out


def quantize_from_stats(
    params: Dict, stats: Dict[str, jax.Array], margin: float = 1.1,
    asymmetric_downsample: bool = True, weight_clip: bool = False,
    hess: Dict | None = None,
) -> Dict[str, QConv]:
    """Build the {path: QConv | QDense} tree for every calibrated layer.

    `params` is the model param tree; paths are dot-joined diffusers-style
    (e.g. 'decoder.up_blocks.1.resnets.0.conv1'). A 2-D weight at the path
    quantizes as a dense layer; a ':h' / ':g' suffix selects the hidden /
    gate column half of a fused GEGLU projection. Conv geometry is inferred
    from the path: downsamplers are stride-2 (asymmetric (0,1)x(0,1)
    padding in the VAE encoder, symmetric pad-1 in the UNet —
    `asymmetric_downsample` picks), upsamplers use the collapsed 4x4
    lhs-dilated form, everything else is a stride-1 pad-1 3x3.

    hess: optional {path: Gram} from a hess-collecting calibration; layers
    present in it round via GPTQ (gptq_round), the rest round-to-nearest."""
    hess = hess or {}
    qtree: Dict = {}
    for path, amax in stats.items():
        base, _, tag = path.partition(":")
        node = params
        for part in base.split("."):
            node = node[part]
        w = node["weight"]
        h = hess.get(path)
        if w.ndim == 2:
            cols = None
            if tag:
                inner = w.shape[1] // 2
                cols = slice(0, inner) if tag == "h" else slice(inner, None)
            qtree[path] = quantize_dense(node, amax, margin=margin, cols=cols,
                                         weight_clip=weight_clip, hess=h)
        elif "downsamplers" in path:
            pad = ((0, 1), (0, 1)) if asymmetric_downsample else 1
            qtree[path] = quantize_conv(
                node, amax, stride=2, padding=pad, margin=margin,
                weight_clip=weight_clip, hess=h)
        elif "upsamplers" in path:
            qtree[path] = quantize_conv(node, amax, kind="up4x4",
                                        margin=margin, weight_clip=weight_clip)
        else:
            qtree[path] = quantize_conv(node, amax, margin=margin,
                                        weight_clip=weight_clip, hess=h)
    return qtree


# ------------------------------------------------- error-attribution hooks

def make_fakequant_conv_fn(qtree: Dict[str, QConv], side: str):
    """Full-precision conv with ONE side of the quantization simulated —
    isolates where the int8 error comes from (diagnostic only, never the
    production path):

      side="w": run the conv with the dequantized int8 weight (exact weight
                the int8 path uses) on EXACT activations;
      side="a": quantize-dequantize the activation per channel, run the
                original full-precision weight.

    With both applied (side="wa") the result equals qconv_apply up to
    accumulation order. Layers absent from qtree run untouched."""
    from genpercept_tpu.ops.conv import conv2d, nearest_up2_conv3x3

    assert side in ("w", "a", "wa"), side

    def conv_fn(name, conv_p, x, *, kind="3x3", stride=1, padding=1):
        q = qtree.get(name)
        if q is None:
            if kind == "up4x4":
                return nearest_up2_conv3x3(x, conv_p["weight"],
                                           conv_p.get("bias"))
            return conv2d(x, conv_p["weight"], conv_p.get("bias"),
                          stride=stride, padding=padding)
        if "a" in side:
            xf = x.astype(jnp.float32)
            if q.zp is not None:
                xf = xf - q.zp
            xq = jnp.clip(jnp.round(xf * q.inv_a), -127.0, 127.0)
            xf = xq / q.inv_a
            if q.zp is not None:
                # zp is snapped so real 0 round-trips exactly — the float
                # conv's implicit zero padding stays faithful to the real
                # asymmetric path's explicit-pad behavior
                xf = xf + q.zp
            x = xf.astype(x.dtype)
        if "w" in side:
            # effective original-space fp weight of the int8 path:
            # wq * o_scale un-does the per-co scale, * inv_a (= 127/a)
            # un-folds the activation scale from the input axis
            # (wf = w * a/127 => w = wq * o_scale * 127/a)
            w = (q.w_int8.astype(jnp.float32) * q.o_scale
                 * q.inv_a[None, None, :, None]).astype(x.dtype)
            bias = q.bias
            if q.zp is not None and bias is not None:
                # q.bias carries the folded zero-point constant sum(zp*w_hat)
                # — the fake path feeds REAL (un-shifted) activations through
                # a float conv, so that constant must come back out
                z_co = jnp.einsum("hwio,i->o", q.w_int8.astype(jnp.float32),
                                  q.zp * q.inv_a) * q.o_scale
                bias = bias - z_co
        else:
            w = conv_p["weight"]
            if kind == "up4x4":
                w = _collapse_up_kernel(w.astype(jnp.float32)).astype(x.dtype)
            bias = conv_p.get("bias")
        if kind == "up4x4":
            y = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), [(2, 2), (2, 2)],
                lhs_dilation=(2, 2), dimension_numbers=_DIMS)
            if bias is not None:
                y = y + jnp.asarray(bias, x.dtype)
            return y
        return conv2d(x, w.astype(x.dtype),
                      None if bias is None else jnp.asarray(bias, x.dtype),
                      stride=q.stride, padding=q.padding)

    return conv_fn
