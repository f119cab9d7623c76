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
    """Per-channel absolute max over (N, H, W) of an NHWC tensor -> (C,) f32."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2))


def merge_stats(a: Dict[str, jax.Array], b: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Elementwise-max merge of two calibration stat dicts (same keys)."""
    return {k: jnp.maximum(a[k], b[k]) for k in a}


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
) -> QConv:
    """Build a QConv from bf16/f32 conv params + calibrated input absmax.

    margin headroom guards against activations slightly exceeding the
    calibration batch's range at runtime (excess is clipped to +-127)."""
    w = conv_p["weight"].astype(jnp.float32)
    if kind == "up4x4":
        w = _collapse_up_kernel(w)
    a = jnp.maximum(a_absmax.astype(jnp.float32) * margin, 1e-8)
    wf = w * (a / 127.0)[None, None, :, None]
    o_scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0, 1e-12)
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


# ------------------------------------------------------------ conv_fn hooks
#
# The VAE traversals (models/vae.py) accept an optional
#   conv_fn(name, conv_p, x, *, kind="3x3", stride=1, padding=1) -> y
# applied to every quantizable conv (resnet conv1/conv2, downsamplers,
# upsamplers). These factories build the two interesting hooks.


def make_calib_conv_fn(stats: Dict[str, jax.Array]):
    """Records per-channel input absmax into `stats` (traced values — the
    caller must return `stats` from the jitted function) and runs the
    ordinary full-precision conv."""
    from genpercept_tpu.ops.conv import conv2d, nearest_up2_conv3x3

    def conv_fn(name, conv_p, x, *, kind="3x3", stride=1, padding=1):
        stats[name] = absmax_per_channel(x)
        if kind == "up4x4":
            return nearest_up2_conv3x3(x, conv_p["weight"], conv_p.get("bias"))
        return conv2d(x, conv_p["weight"], conv_p.get("bias"),
                      stride=stride, padding=padding)

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


def quantize_from_stats(
    params: Dict, stats: Dict[str, jax.Array], margin: float = 1.1
) -> Dict[str, QConv]:
    """Build the {path: QConv} tree for every calibrated conv.

    `params` is the VAE param tree; paths are dot-joined diffusers-style
    (e.g. 'decoder.up_blocks.1.resnets.0.conv1'). Geometry is inferred from
    the path: downsamplers are stride-2 with the encoder's asymmetric
    (0,1)x(0,1) padding, upsamplers use the collapsed 4x4 lhs-dilated form,
    everything else is a stride-1 pad-1 3x3."""
    qtree: Dict[str, QConv] = {}
    for path, amax in stats.items():
        node = params
        for part in path.split("."):
            node = node[part]
        if "downsamplers" in path:
            qtree[path] = quantize_conv(
                node, amax, stride=2, padding=((0, 1), (0, 1)), margin=margin)
        elif "upsamplers" in path:
            qtree[path] = quantize_conv(node, amax, kind="up4x4", margin=margin)
        else:
            qtree[path] = quantize_conv(node, amax, margin=margin)
    return qtree
