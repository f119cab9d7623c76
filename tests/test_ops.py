"""Numerical parity tests for core ops against torch CPU references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from genpercept_tpu.ops import (
    conv2d,
    dot_product_attention,
    group_norm,
    layer_norm,
    resize,
    timestep_embedding,
)
from genpercept_tpu.ops.colorize import colorize_depth
from genpercept_tpu.ops.conv import conv1x1


def test_group_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 5, 32)).astype(np.float32)  # NHWC
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)

    ours = group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                      num_groups=8, eps=1e-5)

    gn = torch.nn.GroupNorm(8, 32, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        theirs = gn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 7, 16)).astype(np.float32)
    w = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    ours = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    theirs = F.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b)
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


@pytest.mark.parametrize("stride,pad", [(1, 1), (2, 1), (1, 0)])
def test_conv2d_matches_torch(stride, pad):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    w_oihw = rng.normal(size=(7, 5, 3, 3)).astype(np.float32)
    b = rng.normal(size=(7,)).astype(np.float32)

    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    ours = conv2d(jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b),
                  stride=stride, padding=pad)
    theirs = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w_oihw), torch.from_numpy(b),
        stride=stride, padding=pad,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


def test_conv1x1_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    w_oihw = rng.normal(size=(9, 6, 1, 1)).astype(np.float32)
    b = rng.normal(size=(9,)).astype(np.float32)
    w_io = np.transpose(w_oihw[:, :, 0, 0], (1, 0))
    ours = conv1x1(jnp.asarray(x), jnp.asarray(w_io), jnp.asarray(b))
    theirs = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w_oihw), torch.from_numpy(b),
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


def test_attention_matches_torch_sdpa():
    rng = np.random.default_rng(4)
    b, sq, sk, h, d = 2, 10, 7, 3, 16
    q = rng.normal(size=(b, sq, h, d)).astype(np.float32)
    k = rng.normal(size=(b, sk, h, d)).astype(np.float32)
    v = rng.normal(size=(b, sk, h, d)).astype(np.float32)

    ours = dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), use_flash=False
    )
    theirs = F.scaled_dot_product_attention(
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(k).permute(0, 2, 1, 3),
        torch.from_numpy(v).permute(0, 2, 1, 3),
    ).permute(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


def test_flash_attention_matches_xla():
    """Pallas kernel (interpret mode on CPU) vs plain XLA attention."""
    from genpercept_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(5)
    b, s, h, d = 1, 256, 2, 64
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out_flash = fa.flash_attention(q, k, v)
    out_ref = dot_product_attention(q, k, v, use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), atol=2e-3
    )


def test_timestep_embedding_matches_diffusers_formula():
    """Check against a direct numpy transcription of the SD2.1 convention
    (flip_sin_to_cos=True, downscale_freq_shift=0)."""
    t = np.array([0, 1, 500, 999], dtype=np.float32)
    dim = 320
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = t[:, None] * freqs[None, :]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)

    ours = timestep_embedding(jnp.asarray(t), dim)
    # fp32 trig at arg ~1000 carries ~1e-4 absolute error vs float64
    np.testing.assert_allclose(np.asarray(ours), expected, atol=3e-4)


@pytest.mark.parametrize("method", ["bilinear", "bicubic"])
def test_resize_downsample_antialias_matches_torch(method):
    rng = np.random.default_rng(6)
    x = rng.uniform(size=(1, 37, 53, 3)).astype(np.float32)
    ours = resize(jnp.asarray(x), (16, 24), method=method, antialias=True)
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=(16, 24), mode=method, antialias=True,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=2e-2, rtol=1e-2
    )


def test_resize_nearest_exact_matches_torch():
    rng = np.random.default_rng(7)
    x = rng.uniform(size=(1, 33, 17, 2)).astype(np.float32)
    ours = resize(jnp.asarray(x), (10, 40), method="nearest_exact")
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(10, 40),
        mode="nearest-exact",
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=0)


def test_resize_upsample_bilinear_matches_torch():
    rng = np.random.default_rng(8)
    x = rng.uniform(size=(1, 8, 8, 4)).astype(np.float32)
    ours = resize(jnp.asarray(x), (16, 16), method="bilinear", antialias=False)
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(16, 16),
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_colorize_matches_matplotlib_spectral():
    import matplotlib

    cmap = matplotlib.colormaps["Spectral"]
    vals = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    ours = colorize_depth(jnp.asarray(vals))
    theirs = cmap(vals)[..., :3]
    # matplotlib does nearest-entry lookup into its 256-LUT; we lerp between
    # entries — bounded by ~half a LUT step (~2 LSB of an 8-bit PNG).
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1.2e-2)


def test_nearest_up2_conv3x3_exact():
    """Fused subpixel upsampler == nearest-x2 then 3x3 conv, exactly."""
    import numpy as np

    from genpercept_tpu.ops.conv import conv2d, nearest_up2_conv3x3

    rng = np.random.default_rng(0)
    for (h, w, ci, co) in [(5, 7, 8, 16), (12, 12, 32, 32), (1, 1, 4, 4)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, ci)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, ci, co)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        ref = conv2d(up, k, b, stride=1, padding=1)
        got = nearest_up2_conv3x3(x, k, b)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_nearest_up2_conv3x3_grad():
    """The fused upsampler is differentiable and matches the naive grad."""
    import numpy as np

    from genpercept_tpu.ops.conv import conv2d, nearest_up2_conv3x3

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)), jnp.float32)

    def f_ref(x, k):
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return jnp.sum(jnp.sin(conv2d(up, k, None, 1, 1)))

    def f_new(x, k):
        return jnp.sum(jnp.sin(nearest_up2_conv3x3(x, k, None)))

    gx_r, gk_r = jax.grad(f_ref, (0, 1))(x, k)
    gx_n, gk_n = jax.grad(f_new, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_n), np.asarray(gk_r), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "sq,sk,h,d",
    [
        (256, 256, 2, 64),   # UNet self-attention shape class
        (256, 128, 2, 64),   # Sq != Sk
        (128, 256, 1, 512),  # VAE mid-block: one head, head_dim 512
        (256, 77, 2, 64),    # cross-attention: KV padded to 128 + masked
    ],
)
def test_flash_attention_backward_matches_xla(sq, sk, h, d):
    """jax.grad through the Pallas custom VJP (_flash_bwd_bhsd, interpret
    mode) vs jax.grad of plain XLA attention, for dq, dk and dv."""
    from jax.experimental.pallas import tpu as pltpu

    from genpercept_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(6)
    b = 1
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, sk, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, sk, h, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) * w)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, use_flash=False) * w)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, ours, ref in zip(("dq", "dk", "dv"), g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=2e-3, rtol=1e-3,
            err_msg=name,
        )


def test_flash_attention_padded_kv_forward():
    """Masked padded-KV forward (77 text tokens -> 128 tile) equals dense
    softmax attention exactly."""
    from jax.experimental.pallas import tpu as pltpu

    from genpercept_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(2, 256, 3, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 77, 3, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 77, 3, 64)), jnp.float32)
    assert fa.supported(256, 77, 64)
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    ref = dot_product_attention(q, k, v, use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("co,with_res", [(128, False), (128, True), (256, False)])
def test_fused_gn_silu_conv_matches_xla(co, with_res):
    """Pallas fused GN+SiLU+conv3x3(+residual) kernel (interpret mode) vs
    the XLA composition it replaces (ops/fused_conv.py)."""
    from jax.experimental.pallas import tpu as pltpu

    from genpercept_tpu.ops.fused_conv import fused_gn_silu_conv3x3, supported

    rng = np.random.default_rng(7)
    n, h, w, c = 2, 16, 24, 128
    assert supported((n, h, w, c), co)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
    gs = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    gb = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    cw = jnp.asarray(rng.normal(size=(3, 3, c, co)) * 0.05, jnp.float32)
    cb = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    res = (jnp.asarray(rng.normal(size=(n, h, w, co)), jnp.float32)
           if with_res else None)

    ref = conv2d(jax.nn.silu(group_norm(x, gs, gb, 32, 1e-6)), cw, cb)
    if with_res:
        ref = ref + res
    with pltpu.force_tpu_interpret_mode():
        out = fused_gn_silu_conv3x3(x, gs, gb, cw, cb, residual=res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_resnet_block_matches_unfused():
    """resnet_block(fused=True) == resnet_block(fused=False), including the
    conv_shortcut channel-change path."""
    from jax.experimental.pallas import tpu as pltpu

    from genpercept_tpu.models.layers import init_resnet_block, resnet_block

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 128)), jnp.float32)
    p = init_resnet_block(jax.random.key(0), 128, 256, None)
    ref = resnet_block(p, x, None, eps=1e-6)
    with pltpu.force_tpu_interpret_mode():
        out = resnet_block(p, x, None, eps=1e-6, fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_geglu_ff_matches_split_path():
    """Pallas fused GEGLU FF (interpret mode) vs the split-matmul
    composition (models/layers.py feed_forward), fp32 and bf16."""
    from jax.experimental.pallas import tpu as pltpu

    from genpercept_tpu.models.layers import feed_forward, init_feed_forward
    from genpercept_tpu.ops.fused_ff import fused_geglu_ff

    rng = np.random.default_rng(11)
    for dt, atol in ((jnp.float32, 2e-5), (jnp.bfloat16, 6e-2)):
        p = jax.tree.map(
            lambda t: t.astype(dt), init_feed_forward(jax.random.key(0), 64)
        )
        x = jnp.asarray(rng.normal(size=(2, 512, 64)) * 2.0, dt)
        ref = feed_forward(p, x)  # CPU backend -> split path
        with pltpu.force_tpu_interpret_mode():
            out = fused_geglu_ff(
                x,
                p["net"]["0"]["proj"]["weight"],
                p["net"]["0"]["proj"].get("bias"),
                p["net"]["2"]["weight"],
                p["net"]["2"].get("bias"),
            )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=atol,
        )


def test_fused_geglu_ff_gradients_match_split_path():
    """The custom VJP (XLA-recompute backward) must give the same x / weight
    gradients as differentiating the split composition directly."""
    from jax.experimental.pallas import tpu as pltpu

    from genpercept_tpu.models.layers import feed_forward, init_feed_forward
    from genpercept_tpu.ops.fused_ff import fused_geglu_ff

    rng = np.random.default_rng(12)
    p = init_feed_forward(jax.random.key(1), 64)
    x = jnp.asarray(rng.normal(size=(1, 512, 64)), jnp.float32)
    w1 = p["net"]["0"]["proj"]["weight"]
    b1 = p["net"]["0"]["proj"]["bias"]
    w2 = p["net"]["2"]["weight"]
    b2 = p["net"]["2"]["bias"]

    def loss_ref(x, w1, b1, w2, b2):
        q = {"net": {"0": {"proj": {"weight": w1, "bias": b1}},
                     "2": {"weight": w2, "bias": b2}}}
        return jnp.sum(jnp.sin(feed_forward(q, x)))

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(jnp.sin(fused_geglu_ff(x, w1, b1, w2, b2)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            x, w1, b1, w2, b2
        )
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flash_attention_int8_matches_fp_within_quant_error():
    """s8 flash attention (QK^T + PV int8, VAE mid-block path) vs the fp
    reference, interpret mode. Error budget: per-row q/k int8 rounding +
    the 1/127-step probability quantization + per-column v rounding."""
    from jax.experimental.pallas import tpu as pltpu

    from genpercept_tpu.ops.attention import dot_product_attention
    from genpercept_tpu.ops.flash_attention import flash_attention_int8

    rng = jax.random.key(11)
    kq, kk, kv = jax.random.split(rng, 3)
    b, s, d = 2, 256, 512
    q = jax.random.normal(kq, (b, s, 1, d), jnp.float32) * 0.5
    k = jax.random.normal(kk, (b, s, 1, d), jnp.float32) * 0.5
    v = jax.random.normal(kv, (b, s, 1, d), jnp.float32)
    ref = dot_product_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_int8(q, k, v)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.05, err.max() / scale
    assert err.mean() / scale < 0.01, err.mean() / scale


def test_vae_attention_int8_and_dense_hooks():
    """vae_attention with int8 flash + quantized projections stays close to
    the fp path; the dense hooks see the four projection names."""
    from jax.experimental.pallas import tpu as pltpu

    from genpercept_tpu.models.layers import init_vae_attention, vae_attention
    from genpercept_tpu.ops.quant import (
        make_calib_dense_fn, make_quant_dense_fn, quantize_from_stats)

    c = 128
    p = init_vae_attention(jax.random.key(0), c)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, c), jnp.float32)
    ref = vae_attention(p, x)

    stats = {}
    out_calib = vae_attention(p, x, dense_fn=make_calib_dense_fn(stats),
                              name="encoder.mid_block.attentions.0")
    np.testing.assert_allclose(np.asarray(out_calib), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert set(stats) == {
        f"encoder.mid_block.attentions.0.{n}"
        for n in ("to_q", "to_k", "to_v", "to_out.0")}

    qtree = quantize_from_stats(
        {"encoder": {"mid_block": {"attentions": {"0": p}}}}, stats, 1.0)
    with pltpu.force_tpu_interpret_mode():
        out = vae_attention(p, x, int8=True,
                            dense_fn=make_quant_dense_fn(qtree),
                            name="encoder.mid_block.attentions.0")
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.mean() / scale < 0.02, err.mean() / scale


def test_fused_geglu_ff_int8_matches_qdense_composition():
    """Pallas int8 fused GEGLU FF (interpret mode) vs the unfused
    qdense_apply -> gelu-mul -> qdense_apply path, symmetric and
    asymmetric activation stats."""
    from jax.experimental.pallas import tpu as pltpu

    from genpercept_tpu.models.layers import init_feed_forward
    from genpercept_tpu.ops.fused_ff import fused_geglu_ff_int8
    from genpercept_tpu.ops.quant import (minmax_asym, absmax_per_channel,
                                          qdense_apply, quantize_dense)

    rng = np.random.default_rng(13)
    c = 64
    p = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16),
        init_feed_forward(jax.random.key(2), c))
    x = jnp.asarray(rng.normal(size=(1, 512, c)) + 0.3, jnp.bfloat16)
    w1 = p["net"]["0"]["proj"]["weight"]
    b1 = p["net"]["0"]["proj"]["bias"]
    inner = w1.shape[1] // 2

    for asym in (False, True):
        stat = minmax_asym if asym else absmax_per_channel
        # calibrate on the actual activations, like make_calib_dense_fn
        hid = qdense_apply(
            quantize_dense({"weight": w1[:, :inner], "bias": b1[:inner]},
                           stat(x)), x)
        gate = qdense_apply(
            quantize_dense({"weight": w1[:, inner:], "bias": b1[inner:]},
                           stat(x)), x)
        a = hid * jax.nn.gelu(gate, approximate=False)
        qh = quantize_dense({"weight": w1[:, :inner], "bias": b1[:inner]},
                            stat(x))
        qg = quantize_dense({"weight": w1[:, inner:], "bias": b1[inner:]},
                            stat(x))
        q2 = quantize_dense(p["net"]["2"], stat(a))
        ref = qdense_apply(q2, a)

        with pltpu.force_tpu_interpret_mode():
            out = fused_geglu_ff_int8(x, qh, qg, q2)
            # row_blk override (the VMEM-budget knob) must not change values
            out_rb = fused_geglu_ff_int8(x, qh, qg, q2, row_blk=128)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=6e-2, rtol=0,
            err_msg=f"asym={asym}")
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(out_rb, np.float32),
            err_msg=f"row_blk changed values, asym={asym}")
