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

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

_DIMS = ("NHWC", "HWIO", "NHWC")


@jax.tree_util.register_pytree_node_class
class QConv:
    """Quantized conv parameters + static geometry.

    Array leaves (traced under jit): w_int8 (HWIO, int8; 4x4 for the
    upsample form), inv_a (Ci,) f32 = 127/a, o_scale (Co,) f32, bias
    (Co,) f32 or None. Static aux: kind ('3x3' | 'up4x4'), stride,
    padding ((t,b),(l,r))."""

    def __init__(self, w_int8, inv_a, o_scale, bias, kind, stride, padding):
        self.w_int8 = w_int8
        self.inv_a = inv_a
        self.o_scale = o_scale
        self.bias = bias
        self.kind = kind
        self.stride = stride
        self.padding = padding

    def tree_flatten(self):
        return ((self.w_int8, self.inv_a, self.o_scale, self.bias),
                (self.kind, self.stride, self.padding))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


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


def merge_stats(a: Dict[str, jax.Array], b: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Elementwise-max merge of two calibration stat dicts (same keys)."""
    return {k: jnp.maximum(a[k], b[k]) for k in a}


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


def quantize_conv(
    conv_p: Dict[str, jax.Array],
    a_absmax: jax.Array,
    *,
    kind: str = "3x3",
    stride=1,
    padding=1,
    margin: float = 1.1,
    weight_clip: bool = False,
) -> QConv:
    """Build a QConv from bf16/f32 conv params + calibrated input absmax.

    margin headroom guards against activations slightly exceeding the
    calibration batch's range at runtime (excess is clipped to +-127).
    weight_clip runs the per-output-channel MSE-optimal clip search on the
    activation-folded weight instead of plain absmax (outlier-aware PTQ for
    trained weights; exact no-op on tail-free uniform init)."""
    w = conv_p["weight"].astype(jnp.float32)
    if kind == "up4x4":
        w = _collapse_up_kernel(w)
    a = jnp.maximum(a_absmax.astype(jnp.float32) * margin, 1e-8)
    wf = w * (a / 127.0)[None, None, :, None]
    if weight_clip:
        clip = _mse_optimal_clip_cols(wf.reshape(-1, wf.shape[-1]))
        o_scale = jnp.maximum(clip / 127.0, 1e-12)
    else:
        o_scale = jnp.maximum(
            jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(wf / o_scale), -127, 127).astype(jnp.int8)
    stride, padding = _norm_geometry(stride, padding)
    bias = conv_p.get("bias")
    bias = None if bias is None else bias.astype(jnp.float32)
    return QConv(wq, (127.0 / a), o_scale, bias, kind, stride, padding)


def qconv_apply(q: QConv, x: jax.Array) -> jax.Array:
    """Quantize x per-channel, run the s8 conv on the MXU, dequantize.

    The quantize (round/clip) fuses into whatever elementwise chain
    produced x (GN+SiLU), and the f32-scale + bias epilogue fuses into the
    conv output; only the int8 tensor round-trips HBM (half the bf16
    traffic)."""
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * q.inv_a), -127.0, 127.0
    ).astype(jnp.int8)
    if q.kind == "up4x4":
        y = jax.lax.conv_general_dilated(
            xq, q.w_int8, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
            dimension_numbers=_DIMS, preferred_element_type=jnp.int32,
        )
    else:
        y = jax.lax.conv_general_dilated(
            xq, q.w_int8, q.stride, list(q.padding),
            dimension_numbers=_DIMS, preferred_element_type=jnp.int32,
        )
    out = y.astype(jnp.float32) * q.o_scale
    if q.bias is not None:
        out = out + q.bias
    return out.astype(x.dtype)


@jax.tree_util.register_pytree_node_class
class QDense:
    """Quantized linear layer: w_int8 (din, dout), inv_a (din,) f32,
    o_scale (dout,) f32, bias (dout,) f32 or None. Same folding algebra as
    QConv with the weight's input axis playing the role of ci."""

    def __init__(self, w_int8, inv_a, o_scale, bias):
        self.w_int8 = w_int8
        self.inv_a = inv_a
        self.o_scale = o_scale
        self.bias = bias

    def tree_flatten(self):
        return ((self.w_int8, self.inv_a, self.o_scale, self.bias), ())

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def quantize_dense(
    p: Dict[str, jax.Array], a_absmax: jax.Array, *, margin: float = 1.1,
    cols: slice | None = None, weight_clip: bool = False,
) -> QDense:
    """Build a QDense from (in, out) linear params + calibrated input absmax.
    cols selects a column slice of the weight/bias (used to quantize the two
    halves of the fused GEGLU projection as separate matmuls, preserving the
    split-FF HBM optimization — see models/layers.py::feed_forward)."""
    w = p["weight"].astype(jnp.float32)
    bias = p.get("bias")
    if cols is not None:
        w = w[:, cols]
        bias = None if bias is None else bias[cols]
    a = jnp.maximum(a_absmax.astype(jnp.float32) * margin, 1e-8)
    wf = w * (a / 127.0)[:, None]
    if weight_clip:
        o_scale = jnp.maximum(_mse_optimal_clip_cols(wf) / 127.0, 1e-12)
    else:
        o_scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(wf / o_scale), -127, 127).astype(jnp.int8)
    bias = None if bias is None else bias.astype(jnp.float32)
    return QDense(wq, (127.0 / a), o_scale, bias)


def qdense_apply(q: QDense, x: jax.Array) -> jax.Array:
    """Quantize x per input channel, s8 matmul on the MXU, dequantize."""
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * q.inv_a), -127.0, 127.0
    ).astype(jnp.int8)
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


def make_calib_conv_fn(stats: Dict[str, jax.Array], corr: Dict | None = None,
                       clip_search: bool = False, margin: float = 1.1,
                       weight_clip: bool = False):
    """Records per-channel input scale into `stats` (traced values — the
    caller must return `stats` from the jitted function) and runs the
    ordinary full-precision conv.

    clip_search replaces the absmax statistic with the MSE-optimal clip.
    If `corr` is given, the calibration program additionally quantizes the
    layer in-trace (same arithmetic as quantize_from_stats) and records the
    per-output-channel mean of (y_fp - y_int8) — the systematic component
    of the quantization error, E[dW.x] (Banner et al. 2019 bias
    correction), later folded into the quantized bias by
    apply_bias_correction. One extra conv per layer, calibration-only."""
    from genpercept_tpu.ops.conv import conv2d, nearest_up2_conv3x3

    def conv_fn(name, conv_p, x, *, kind="3x3", stride=1, padding=1):
        a = mse_optimal_clip(x) if clip_search else absmax_per_channel(x)
        stats[name] = a
        if kind == "up4x4":
            y = nearest_up2_conv3x3(x, conv_p["weight"], conv_p.get("bias"))
        else:
            y = conv2d(x, conv_p["weight"], conv_p.get("bias"),
                       stride=stride, padding=padding)
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
                        weight_clip: bool = False):
    """Dense analogue of make_calib_conv_fn (p arrives pre-column-sliced
    for the GEGLU :h/:g halves, so in-trace quantization needs no cols)."""
    from genpercept_tpu.ops.attention import attention_projection

    def dense_fn(name, p, x):
        a = mse_optimal_clip(x) if clip_search else absmax_per_channel(x)
        stats[name] = a
        y = attention_projection(x, p["weight"], p.get("bias"))
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
            if m["type"] == "conv":
                q = QConv(w, a, s, b, m["kind"], tuple(m["stride"]),
                          tuple(tuple(p) for p in m["padding"]))
            else:
                q = QDense(w, a, s, b)
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
                           q.kind, q.stride, q.padding)
        else:
            out[k] = QDense(q.w_int8, q.inv_a, q.o_scale, bias)
    return out


def quantize_from_stats(
    params: Dict, stats: Dict[str, jax.Array], margin: float = 1.1,
    asymmetric_downsample: bool = True, weight_clip: bool = False,
) -> Dict[str, QConv]:
    """Build the {path: QConv | QDense} tree for every calibrated layer.

    `params` is the model param tree; paths are dot-joined diffusers-style
    (e.g. 'decoder.up_blocks.1.resnets.0.conv1'). A 2-D weight at the path
    quantizes as a dense layer; a ':h' / ':g' suffix selects the hidden /
    gate column half of a fused GEGLU projection. Conv geometry is inferred
    from the path: downsamplers are stride-2 (asymmetric (0,1)x(0,1)
    padding in the VAE encoder, symmetric pad-1 in the UNet —
    `asymmetric_downsample` picks), upsamplers use the collapsed 4x4
    lhs-dilated form, everything else is a stride-1 pad-1 3x3."""
    qtree: Dict = {}
    for path, amax in stats.items():
        base, _, tag = path.partition(":")
        node = params
        for part in base.split("."):
            node = node[part]
        w = node["weight"]
        if w.ndim == 2:
            cols = None
            if tag:
                inner = w.shape[1] // 2
                cols = slice(0, inner) if tag == "h" else slice(inner, None)
            qtree[path] = quantize_dense(node, amax, margin=margin, cols=cols,
                                         weight_clip=weight_clip)
        elif "downsamplers" in path:
            pad = ((0, 1), (0, 1)) if asymmetric_downsample else 1
            qtree[path] = quantize_conv(
                node, amax, stride=2, padding=pad, margin=margin,
                weight_clip=weight_clip)
        elif "upsamplers" in path:
            qtree[path] = quantize_conv(node, amax, kind="up4x4",
                                        margin=margin, weight_clip=weight_clip)
        else:
            qtree[path] = quantize_conv(node, amax, margin=margin,
                                        weight_clip=weight_clip)
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
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * q.inv_a),
                          -127.0, 127.0)
            x = (xq / q.inv_a).astype(x.dtype)
        if "w" in side:
            # effective original-space fp weight of the int8 path:
            # wq * o_scale un-does the per-co scale, * inv_a (= 127/a)
            # un-folds the activation scale from the input axis
            # (wf = w * a/127 => w = wq * o_scale * 127/a)
            w = (q.w_int8.astype(jnp.float32) * q.o_scale
                 * q.inv_a[None, None, :, None]).astype(x.dtype)
            bias = q.bias
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
