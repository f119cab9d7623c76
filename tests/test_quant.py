"""W8A8 int8 VAE quantization (ops/quant.py): kernel-level parity, exactness
on grid-aligned inputs, calibration plumbing, and end-to-end pipeline error.
"""

import jax
import jax.numpy as jnp
import numpy as np

from genpercept_tpu.models import VAEConfig, init_vae, vae_decode, vae_encode
from genpercept_tpu.ops.conv import conv2d, nearest_up2_conv3x3
from genpercept_tpu.ops.quant import (
    absmax_per_channel,
    make_calib_conv_fn,
    make_quant_conv_fn,
    merge_stats,
    qconv_apply,
    quantize_conv,
    quantize_from_stats,
)

TINY_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64))


def _rand_conv(key, cin, cout, k=3):
    kw, kb = jax.random.split(key)
    return {
        "weight": jax.random.normal(kw, (k, k, cin, cout), jnp.float32) * 0.05,
        "bias": jax.random.normal(kb, (cout,), jnp.float32) * 0.1,
    }


def test_qconv_matches_f32_conv_within_quant_error():
    key = jax.random.key(0)
    kx, kp = jax.random.split(key)
    x = jax.random.normal(kx, (2, 16, 16, 32), jnp.float32)
    p = _rand_conv(kp, 32, 24)
    q = quantize_conv(p, absmax_per_channel(x), margin=1.0)
    ref = conv2d(x, p["weight"], p["bias"])
    out = qconv_apply(q, x)
    # error budget: x rounding (<= a/254 per element) plus weight rounding,
    # accumulated over 9*32 taps — relative to output scale
    err = np.abs(np.asarray(out - ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.03, err.max() / scale


def test_qconv_exact_on_grid_aligned_values():
    # x on the int grid with a = 127 (scale 1), and int weights whose per-co
    # absmax is exactly 127 (so o_scale = 1): both round() calls are
    # identity and the int8 path must be bit-exact
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-100, 100, (1, 8, 8, 8)), jnp.float32)
    w_np = rng.integers(-127, 128, (3, 3, 8, 8)).astype(np.float32)
    w_np[0, 0, 0, :] = 127.0
    w = jnp.asarray(w_np)
    p = {"weight": w, "bias": jnp.zeros((8,), jnp.float32)}
    q = quantize_conv(p, jnp.full((8,), 127.0), margin=1.0)
    np.testing.assert_array_equal(np.asarray(q.o_scale), np.ones(8))
    ref = conv2d(x, w, None)
    out = qconv_apply(q, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_qconv_stride2_asymmetric_and_upsample_kinds():
    key = jax.random.key(2)
    kx, kp = jax.random.split(key)
    x = jax.random.normal(kx, (2, 12, 12, 16), jnp.float32)
    p = _rand_conv(kp, 16, 16)
    amax = absmax_per_channel(x)

    qd = quantize_conv(p, amax, stride=2, padding=((0, 1), (0, 1)), margin=1.0)
    ref_d = conv2d(x, p["weight"], p["bias"], stride=2, padding=((0, 1), (0, 1)))
    out_d = qconv_apply(qd, x)
    assert out_d.shape == ref_d.shape == (2, 6, 6, 16)
    assert np.abs(np.asarray(out_d - ref_d)).max() / np.abs(np.asarray(ref_d)).max() < 0.03

    qu = quantize_conv(p, amax, kind="up4x4", margin=1.0)
    ref_u = nearest_up2_conv3x3(x, p["weight"], p["bias"])
    out_u = qconv_apply(qu, x)
    assert out_u.shape == ref_u.shape == (2, 24, 24, 16)
    assert np.abs(np.asarray(out_u - ref_u)).max() / np.abs(np.asarray(ref_u)).max() < 0.03


def test_calibrate_then_quant_vae_decode():
    vae = init_vae(jax.random.key(3), TINY_VAE)
    z = jax.random.normal(jax.random.key(4), (2, 8, 8, 4), jnp.float32) * 0.3

    @jax.jit
    def calib(p, z):
        stats = {}
        y = vae_decode(p, z, TINY_VAE, conv_fn=make_calib_conv_fn(stats))
        return y, stats

    y_ref, stats = calib(vae, z)
    # decoder: 2 mid resnets + 4 up blocks x 3 resnets -> 28 convs, + 3 ups
    assert len(stats) == 2 * 2 + 4 * 3 * 2 + 3
    assert all(k.startswith("decoder.") for k in stats)

    qtree = quantize_from_stats(vae, stats)
    y_q = jax.jit(
        lambda p, q, z: vae_decode(p, z, TINY_VAE, conv_fn=make_quant_conv_fn(q))
    )(vae, qtree, z)
    assert y_q.shape == y_ref.shape
    # W8A8 rounding error per conv output ~ q_step/sqrt(K); this tiny net
    # (K = 9*32 = 288 taps) is ~4x worse than the 512-channel SD VAE.
    # Measured here: mean ~1%, max ~10% of output scale.
    err = np.abs(np.asarray(y_q - y_ref))
    scale = np.abs(np.asarray(y_ref)).max()
    assert err.mean() / scale < 0.02
    assert err.max() / scale < 0.2


def test_calibrate_then_quant_vae_encode():
    vae = init_vae(jax.random.key(5), TINY_VAE)
    x = jax.random.uniform(jax.random.key(6), (2, 32, 32, 3), jnp.float32) * 2 - 1

    @jax.jit
    def calib(p, x):
        stats = {}
        y = vae_encode(p, x, TINY_VAE, conv_fn=make_calib_conv_fn(stats))
        return y, stats

    y_ref, stats = calib(vae, x)
    # encoder: 4 blocks x 2 resnets x 2 convs + 3 downsamplers + 2 mid x 2
    assert len(stats) == 4 * 2 * 2 + 3 + 2 * 2
    assert any("downsamplers" in k for k in stats)

    qtree = quantize_from_stats(vae, stats)
    y_q = jax.jit(
        lambda p, q, x: vae_encode(p, x, TINY_VAE, conv_fn=make_quant_conv_fn(q))
    )(vae, qtree, x)
    scale = np.abs(np.asarray(y_ref)).max()
    assert np.abs(np.asarray(y_q - y_ref)).max() / scale < 0.1


def test_merge_stats():
    a = {"k": jnp.asarray([1.0, 5.0])}
    b = {"k": jnp.asarray([2.0, 3.0])}
    np.testing.assert_array_equal(np.asarray(merge_stats(a, b)["k"]), [2.0, 5.0])


def test_pipeline_int8_vae_end_to_end():
    """First call calibrates (matches full precision exactly); later calls
    run int8 and must stay within a small per-pixel bound of full precision."""
    import tests.test_pipeline as TP

    models = TP.tiny_models()
    rgb = np.random.default_rng(7).uniform(size=(48, 48, 3)).astype(np.float32)

    from genpercept_tpu.pipeline import GenPerceptPipeline, PipelineConfig

    cfg_fp = PipelineConfig(mode="depth", processing_res=0)
    cfg_q = PipelineConfig(mode="depth", processing_res=0, int8_vae=True,
                       int8_exclude=())
    pipe_fp = GenPerceptPipeline(models, cfg_fp)
    pipe_q = GenPerceptPipeline(models, cfg_q)

    ref = pipe_fp(rgb).pred_np
    first = pipe_q(rgb).pred_np  # calibration pass: full precision
    np.testing.assert_allclose(first, ref, atol=1e-6)
    assert pipe_q._calibrated and "vae_quant" in pipe_q._params
    assert len(pipe_q._params["vae_quant"]["enc"]) == 23
    assert len(pipe_q._params["vae_quant"]["dec"]) == 31

    # the post-calibration self-check ran on the first batch: one quantized
    # forward vs the fp prediction, recorded for deployment observability
    assert pipe_q.int8_mean_dev is not None
    assert np.isfinite(pipe_q.int8_mean_dev)

    second = pipe_q(rgb).pred_np  # int8 path
    # tiny-channel worst case (see test_calibrate_then_quant_vae_decode);
    # full-size parity is measured on-chip by scripts/profile_int8_vae.py
    assert np.abs(second - ref).max() < 0.3
    assert np.abs(second - ref).mean() < 0.05
    # the recorded self-check deviation is the same comparison (same batch)
    assert abs(pipe_q.int8_mean_dev - np.abs(second - ref).mean()) < 0.02


def test_pipeline_int8_unet_end_to_end():
    """int8_vae + int8_unet(+dense): calibration covers UNet conv AND dense
    paths (GEGLU halves as :h/:g slices); quantized run stays within the
    tiny-net error envelope of full precision."""
    import tests.test_pipeline as TP

    models = TP.tiny_models()
    # 64 = power of two: every UNet upsample is an exact x2 so all 50 convs
    # take the quantizable path (odd latent sizes route upsamplers through
    # the full-precision explicit-size branch — see layers.upsample2d)
    rgb = np.random.default_rng(8).uniform(size=(64, 64, 3)).astype(np.float32)

    from genpercept_tpu.pipeline import GenPerceptPipeline, PipelineConfig

    pipe_fp = GenPerceptPipeline(
        models, PipelineConfig(mode="depth", processing_res=0))
    pipe_q = GenPerceptPipeline(
        models, PipelineConfig(mode="depth", processing_res=0,
                               int8_vae=True, int8_unet=True,
                               int8_unet_dense=True, int8_exclude=()))

    ref = pipe_fp(rgb).pred_np
    first = pipe_q(rgb).pred_np
    np.testing.assert_allclose(first, ref, atol=1e-6)  # calibration pass

    uq = pipe_q._params["vae_quant"]["unet"]
    # 8 down resnets x2 + 3 downsamplers + 2 mid x2 + 12 up resnets x2
    # + 3 upsamplers = 50 convs
    n_conv = sum(1 for k in uq if "conv" in k or "samplers" in k)
    n_dense = len(uq) - n_conv
    assert n_conv == 50
    # 16 spatial transformers (3 attn down blocks x2 + mid + 3 up x3), each
    # 11 denses: proj_in/out(2) + attn1 q,k,v,out(4) + attn2 q,out(2)
    # + ff :h,:g,net.2(3)
    assert n_dense == 16 * 11
    from genpercept_tpu.ops.quant import QDense
    assert any(isinstance(v, QDense) for v in uq.values())

    second = pipe_q(rgb).pred_np
    assert np.abs(second - ref).max() < 0.35
    assert np.abs(second - ref).mean() < 0.06


def test_pipeline_int8_unet_default_is_conv_only():
    """Without int8_unet_dense, only the 50 convs quantize (QDense measured
    slower end-to-end on v5e: it displaces the fused GEGLU kernel)."""
    import tests.test_pipeline as TP

    from genpercept_tpu.ops.quant import QDense
    from genpercept_tpu.pipeline import GenPerceptPipeline, PipelineConfig

    models = TP.tiny_models()
    rgb = np.random.default_rng(9).uniform(size=(64, 64, 3)).astype(np.float32)
    pipe_q = GenPerceptPipeline(
        models, PipelineConfig(mode="depth", processing_res=0,
                               int8_vae=True, int8_unet=True,
                               int8_exclude=()))
    pipe_q(rgb)
    uq = pipe_q._params["vae_quant"]["unet"]
    assert len(uq) == 50
    assert not any(isinstance(v, QDense) for v in uq.values())


def test_mse_optimal_clip_tightens_on_heavy_tails():
    """With enough bulk elements, a lone huge outlier should get clipped
    (finer steps for the bulk beat covering the outlier: the crossover
    needs n*(step^2)/12 savings > (V-c)^2, i.e. large n — real VAE
    channels hold ~10M elements); a well-behaved channel keeps absmax."""
    from genpercept_tpu.ops.quant import mse_optimal_clip

    rng = np.random.default_rng(0)
    n = 1 << 18
    bulk = rng.normal(0, 1.0, (n, 2)).astype(np.float32)
    bulk[0, 0] = 100.0  # lone outlier in channel 0
    clip = np.asarray(mse_optimal_clip(jnp.asarray(bulk)))
    amax = np.abs(bulk).max(axis=0)
    assert clip[0] < 0.5 * amax[0]
    assert clip[1] >= 0.89 * amax[1]


def test_bias_correction_zeroes_mean_error_on_calibration_batch():
    """bias += E[y_fp - y_int8] measured in-calibration makes the corrected
    quantized layer's per-channel mean error exactly zero on that batch."""
    from genpercept_tpu.ops.quant import (
        apply_bias_correction, make_calib_conv_fn, mse_optimal_clip)

    key = jax.random.key(7)
    kx, kp = jax.random.split(key)
    x = jax.random.normal(kx, (2, 16, 16, 32), jnp.float32)
    p = _rand_conv(kp, 32, 24)

    stats, corr = {}, {}
    conv_fn = make_calib_conv_fn(stats, corr=corr, clip_search=True, margin=1.0)
    y_fp = conv_fn("c", p, x)
    qtree = {"c": quantize_conv(p, stats["c"], margin=1.0)}
    qtree = apply_bias_correction(qtree, corr)
    y_q = qconv_apply(qtree["c"], x)
    mean_err = np.asarray(jnp.mean(y_fp - y_q, axis=(0, 1, 2)))
    np.testing.assert_allclose(mean_err, 0.0, atol=1e-5)
    # and the correction is non-trivial
    assert np.abs(np.asarray(corr["c"])).max() > 0


def test_refined_quantization_beats_plain_absmax():
    """Clip search + bias correction should not increase (and normally
    decreases) the end-to-end quantization MSE of a conv stack with
    heavy-tailed activations."""
    from genpercept_tpu.ops.quant import (
        apply_bias_correction, make_calib_conv_fn)

    key = jax.random.key(3)
    kx, k1, k2 = jax.random.split(key, 3)
    # heavy-tailed input (student-t-ish): normal / sqrt(chi2)
    g = jax.random.normal(kx, (2, 16, 16, 16), jnp.float32)
    s = jnp.abs(jax.random.normal(k1, (2, 16, 16, 16))) + 0.1
    x = g / s
    p1 = _rand_conv(k2, 16, 16)

    def run(refine):
        stats, corr = {}, {}
        conv_fn = make_calib_conv_fn(
            stats, corr=corr if refine else None, clip_search=refine,
            margin=1.0 if refine else 1.1)
        y_fp = conv_fn("c", p1, x)
        m = 1.0 if refine else 1.1
        qtree = {"c": quantize_conv(p1, stats["c"], margin=m)}
        if refine:
            qtree = apply_bias_correction(qtree, corr)
        y_q = qconv_apply(qtree["c"], x)
        return float(jnp.mean(jnp.square(y_q - y_fp)))

    assert run(True) <= run(False)


def test_calibration_save_load_roundtrip(tmp_path):
    """save_calibration/load_calibration round-trips the int8 weight tree
    bit-exactly: a fresh pipeline that loads the cache skips the
    full-precision calibration pass and reproduces the donor's quantized
    outputs exactly."""
    import tests.test_pipeline as TP

    from genpercept_tpu.pipeline import GenPerceptPipeline, PipelineConfig

    models = TP.tiny_models()
    rgb = np.random.default_rng(11).uniform(size=(64, 64, 3)).astype(np.float32)
    cfg = PipelineConfig(mode="depth", processing_res=0,
                         int8_vae=True, int8_unet=True, int8_exclude=())

    donor = GenPerceptPipeline(models, cfg)
    donor(rgb)  # calibration pass
    quant_out = donor(rgb).pred_np
    path = tmp_path / "calib.npz"
    donor.save_calibration(path)

    fresh = GenPerceptPipeline(models, cfg)
    fresh.load_calibration(path)
    assert fresh._calibrated
    loaded_out = fresh(rgb).pred_np  # FIRST call already quantized
    np.testing.assert_array_equal(loaded_out, quant_out)


def test_pallas_quantized_conv3x3_matches_xla_qconv():
    """ops/quant_conv.py kernel (interpret mode) vs the XLA qconv_apply
    path: identical int8 arithmetic, so outputs must agree to f32 epilogue
    rounding — including the zero-padded borders across stripe boundaries."""
    from jax.experimental.pallas import tpu as pltpu

    from genpercept_tpu.ops.quant_conv import quantized_conv3x3, supported

    key = jax.random.key(21)
    kx, kp = jax.random.split(key)
    x = jax.random.normal(kx, (2, 24, 16, 128), jnp.float32)
    p = _rand_conv(kp, 128, 128)
    q = quantize_conv(p, absmax_per_channel(x), margin=1.0)
    assert supported(x.shape, 128)

    ref = qconv_apply(q, x)
    with pltpu.force_tpu_interpret_mode():
        out = quantized_conv3x3(x, q.w_int8, q.inv_a, q.o_scale, q.bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # bf16 activations (production dtype): quantization happens in f32
    # inside both paths, outputs cast back to bf16
    xb = x.astype(jnp.bfloat16)
    ref_b = qconv_apply(q, xb)
    with pltpu.force_tpu_interpret_mode():
        out_b = quantized_conv3x3(xb, q.w_int8, q.inv_a, q.o_scale, q.bias)
    np.testing.assert_array_equal(np.asarray(out_b.astype(jnp.float32)),
                                  np.asarray(ref_b.astype(jnp.float32)))


def test_default_int8_placement_is_enc_deep():
    """The default int8_exclude is the 'enc_deep' sweep point: the
    encoder's high-res down-blocks 0-1 (768^2/384^2 x128 shapes where s8
    does not pay and the fidelity cost is largest — latent errors amplify
    downstream) and the decoder's 128-channel tail stay full precision;
    the deep encoder blocks, the rest of the decoder, and the UNet convs
    quantize."""
    import tests.test_pipeline as TP

    from genpercept_tpu.pipeline import GenPerceptPipeline, PipelineConfig

    models = TP.tiny_models()
    rgb = np.random.default_rng(13).uniform(size=(64, 64, 3)).astype(np.float32)
    pipe = GenPerceptPipeline(
        models, PipelineConfig(mode="depth", processing_res=0,
                               int8_vae=True, int8_unet=True))
    pipe(rgb)
    vq = pipe._params["vae_quant"]
    assert not any("down_blocks.0." in k or "down_blocks.1." in k
                   for k in vq["enc"])
    assert any("mid_block" in k for k in vq["enc"])  # deep encoder is int8
    assert not any("up_blocks.3." in k for k in vq["dec"])
    assert len(vq["dec"]) == 31 - 6  # up_blocks.3: 3 resnets x 2 convs
    assert len(vq["unet"]) == 50


def test_bench_placement_table_matches_pipeline_default():
    """bench.py's PLACEMENTS['default'] must stay in sync with the
    production PipelineConfig.int8_exclude default."""
    import bench

    from genpercept_tpu.pipeline import PipelineConfig

    assert tuple(bench.PLACEMENTS["default"]) == PipelineConfig.int8_exclude


# ---------------------------------------------------- asymmetric activations

def _skewed(key, shape):
    # post-GroupNorm+SiLU-like: bounded below at -0.278, long positive tail
    return jax.nn.silu(jax.random.normal(key, shape, jnp.float32) * 2.0)


def test_asymmetric_beats_symmetric_on_skewed_activations():
    from genpercept_tpu.ops.quant import (
        mse_optimal_clip, mse_optimal_clip_asym, qdense_apply, quantize_dense)

    key = jax.random.key(10)
    kx, kp, kd = jax.random.split(key, 3)
    x = _skewed(kx, (2, 16, 16, 8))
    p = _rand_conv(kp, 8, 12)
    ref = conv2d(x, p["weight"], p["bias"])
    e_sym = np.abs(np.asarray(
        qconv_apply(quantize_conv(p, mse_optimal_clip(x), margin=1.0), x)
        - ref)).mean()
    e_asym = np.abs(np.asarray(
        qconv_apply(quantize_conv(p, mse_optimal_clip_asym(x), margin=1.0), x)
        - ref)).mean()
    # SiLU outputs use ~half the symmetric range; the zero-point roughly
    # halves the step and must cut the error by >=25%
    assert e_asym < 0.75 * e_sym, (e_asym, e_sym)

    xd = _skewed(kd, (64, 8))
    pd = {"weight": jax.random.normal(kd, (8, 6), jnp.float32) * 0.3,
          "bias": jnp.ones((6,), jnp.float32) * 0.05}
    refd = xd @ pd["weight"] + pd["bias"]
    ed_sym = np.abs(np.asarray(
        qdense_apply(quantize_dense(pd, mse_optimal_clip(xd), margin=1.0), xd)
        - refd)).mean()
    ed_asym = np.abs(np.asarray(
        qdense_apply(quantize_dense(pd, mse_optimal_clip_asym(xd),
                                    margin=1.0), xd) - refd)).mean()
    assert ed_asym < 0.85 * ed_sym, (ed_asym, ed_sym)


def test_asymmetric_zero_input_and_padding_exact():
    """The pad-then-quantize + quantized-weight offset algebra: an all-zero
    input (every position behaves like conv padding) must reproduce the
    float conv EXACTLY — the zero-point is snapped onto an integer code and
    the folded constant uses the quantized weight, so nothing couples to
    weight rounding error."""
    from genpercept_tpu.ops.quant import mse_optimal_clip_asym

    key = jax.random.key(11)
    kx, kp = jax.random.split(key)
    x = _skewed(kx, (2, 12, 12, 8))
    p = _rand_conv(kp, 8, 12)
    q = quantize_conv(p, mse_optimal_clip_asym(x), margin=1.0)
    assert q.zp is not None
    x0 = jnp.zeros_like(x)
    out = np.asarray(qconv_apply(q, x0))
    ref = np.asarray(conv2d(x0, p["weight"], p["bias"]))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # stride-2 downsampler geometry (encoder's asymmetric (0,1) padding)
    q2 = quantize_conv(p, mse_optimal_clip_asym(x), stride=2,
                       padding=((0, 1), (0, 1)), margin=1.0)
    ref2 = conv2d(x, p["weight"], p["bias"], stride=2,
                  padding=((0, 1), (0, 1)))
    out2 = qconv_apply(q2, x)
    assert out2.shape == ref2.shape
    scale = np.abs(np.asarray(ref2)).max()
    assert np.abs(np.asarray(out2 - ref2)).max() / scale < 0.03


def test_asymmetric_up4x4_degrades_to_symmetric():
    from genpercept_tpu.ops.quant import mse_optimal_clip_asym

    key = jax.random.key(12)
    kx, kp = jax.random.split(key)
    x = _skewed(kx, (1, 8, 8, 8))
    p = _rand_conv(kp, 8, 8)
    q = quantize_conv(p, mse_optimal_clip_asym(x), kind="up4x4", margin=1.0)
    # lhs-dilation zeros are algebraic, not real activations — no zero-point
    assert q.zp is None
    ref = nearest_up2_conv3x3(x, p["weight"], p["bias"])
    out = qconv_apply(q, x)
    assert out.shape == ref.shape
    scale = np.abs(np.asarray(ref)).max()
    assert np.abs(np.asarray(out - ref)).max() / scale < 0.05


def test_asymmetric_fakequant_wa_matches_real_path():
    from genpercept_tpu.ops.quant import (
        make_fakequant_conv_fn, mse_optimal_clip_asym)

    key = jax.random.key(13)
    kx, kp = jax.random.split(key)
    x = _skewed(kx, (1, 10, 10, 8))
    p = _rand_conv(kp, 8, 12)
    q = quantize_conv(p, mse_optimal_clip_asym(x), margin=1.0)
    fk = make_fakequant_conv_fn({"c": q}, "wa")
    real = np.asarray(qconv_apply(q, x))
    fake = np.asarray(fk("c", p, x))
    np.testing.assert_allclose(fake, real, atol=1e-4)


def test_asymmetric_calibration_save_load_roundtrip(tmp_path):
    from genpercept_tpu.ops.quant import (
        load_calibration, make_calib_conv_fn, save_calibration)

    key = jax.random.key(14)
    kx, kp = jax.random.split(key)
    x = _skewed(kx, (1, 8, 8, 8))
    p = _rand_conv(kp, 8, 8)
    stats = {}
    calib = make_calib_conv_fn(stats, clip_search=True, asymmetric=True)
    calib("layer", p, x)
    assert stats["layer"].shape == (2, 8)
    q = quantize_conv(p, stats["layer"], margin=1.0)
    save_calibration(tmp_path / "c.npz", {"enc": {"layer": q}})
    q2 = load_calibration(tmp_path / "c.npz")["enc"]["layer"]
    assert q2.zp is not None
    np.testing.assert_array_equal(np.asarray(q.w_int8), np.asarray(q2.w_int8))
    np.testing.assert_allclose(np.asarray(q.zp), np.asarray(q2.zp))
    np.testing.assert_allclose(
        np.asarray(qconv_apply(q, x)), np.asarray(qconv_apply(q2, x)),
        atol=1e-6)


def test_merge_stats_asymmetric_ranges():
    s1 = {"k": jnp.stack([jnp.asarray([1.0, 0.0]), jnp.asarray([2.0, 1.0])])}
    s2 = {"k": jnp.stack([jnp.asarray([0.0, 1.0]), jnp.asarray([1.0, 3.0])])}
    m = merge_stats(s1, s2)["k"]
    np.testing.assert_allclose(np.asarray(m[0] - m[1]), [-1.0, -2.0])
    np.testing.assert_allclose(np.asarray(m[0] + m[1]), [3.0, 4.0])


def test_pipeline_asymmetric_int8_end_to_end_tighter_than_symmetric():
    """Tiny-VAE pipeline-level A/B: the asymmetric default must not be worse
    than symmetric end-to-end (it is strictly better on skewed layers)."""
    from genpercept_tpu.ops.quant import make_quant_conv_fn

    key = jax.random.key(15)
    params = init_vae(key, TINY_VAE)
    x = jax.random.uniform(jax.random.key(16), (1, 64, 64, 3), jnp.float32)

    def run(asymmetric):
        stats = {}
        calib = make_calib_conv_fn(stats, clip_search=True,
                                   asymmetric=asymmetric)
        ref = vae_encode(params, x, TINY_VAE, conv_fn=calib)
        qtree = quantize_from_stats(params, stats, margin=1.0)
        out = vae_encode(params, x, TINY_VAE,
                         conv_fn=make_quant_conv_fn(qtree))
        return np.abs(np.asarray(out - ref)).mean()

    e_sym, e_asym = run(False), run(True)
    assert e_asym <= e_sym * 1.05, (e_asym, e_sym)


# ----------------------------------------------------- chunked calibration

def test_calibrate_chunked_matches_full_batch():
    """Batch-chunked calibration (the OOM guard for the 768^2 asym program,
    ops/quant.py::calibrate_chunked): absmax stats merge EXACTLY (max is
    associative over batch splits), preds concatenate to the full batch, and
    the refine path's averaged corr still quantizes within the usual bar."""
    from genpercept_tpu.ops.quant import calibrate_chunked

    vae = init_vae(jax.random.key(20), TINY_VAE)
    z = jax.random.normal(jax.random.key(21), (4, 8, 8, 4), jnp.float32) * 0.3

    @jax.jit
    def calib(p, z):
        stats = {}
        y = vae_decode(p, z, TINY_VAE, conv_fn=make_calib_conv_fn(stats))
        return y, stats

    y_full, s_full = calib(vae, z)
    y_ch, s_ch = calibrate_chunked(calib, vae, z, chunk=2)
    # different-batch-shape programs fuse/accumulate differently — bitwise
    # equality is not expected, only numerical equivalence
    np.testing.assert_allclose(np.asarray(y_ch), np.asarray(y_full),
                               atol=1e-4)
    assert set(s_ch) == set(s_full)
    for k in s_full:
        np.testing.assert_allclose(np.asarray(s_ch[k]), np.asarray(s_full[k]),
                                   rtol=1e-4)


def test_calibrate_chunked_refine_asym_fidelity():
    """Chunked refine (clip search + corr averaging + asymmetric stats) must
    hold the same end-to-end fidelity class as single-program calibration."""
    from genpercept_tpu.ops.quant import (
        apply_bias_correction, calibrate_chunked, make_quant_conv_fn)

    vae = init_vae(jax.random.key(22), TINY_VAE)
    z = jax.random.normal(jax.random.key(23), (4, 8, 8, 4), jnp.float32) * 0.3

    def make_calib():
        @jax.jit
        def calib(p, z):
            stats, corr = {}, {}
            fn = make_calib_conv_fn(stats, corr=corr, clip_search=True,
                                    margin=1.0, asymmetric=True)
            y = vae_decode(p, z, TINY_VAE, conv_fn=fn)
            return y, {"dec": stats, "corr": {"dec": corr}}
        return calib

    def fidelity(stats):
        q = apply_bias_correction(
            quantize_from_stats(vae, stats["dec"], margin=1.0),
            stats["corr"]["dec"])
        ref = vae_decode(vae, z, TINY_VAE)
        out = vae_decode(vae, z, TINY_VAE, conv_fn=make_quant_conv_fn(q))
        return np.abs(np.asarray(out - ref)).mean()

    _, s_full = make_calib()(vae, z)
    _, s_ch = calibrate_chunked(make_calib(), vae, z, chunk=2)
    e_full, e_ch = fidelity(s_full), fidelity(s_ch)
    # corr averaging + range union are approximations — same error class
    assert e_ch <= e_full * 1.5 + 1e-4, (e_ch, e_full)


def test_calibrate_chunked_extra_args_and_ragged_tail():
    from genpercept_tpu.ops.quant import calibrate_chunked

    def calib(params, rgb, noise):
        assert rgb.shape[0] == noise.shape[0]
        return rgb + noise, {"g": {"k": jnp.max(jnp.abs(rgb), axis=0)}}

    rgb = jax.random.normal(jax.random.key(24), (5, 3), jnp.float32)
    noise = jax.random.normal(jax.random.key(25), (5, 3), jnp.float32)
    pred, stats = calibrate_chunked(calib, None, rgb, noise, chunk=2)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(rgb + noise),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["g"]["k"]),
                               np.asarray(jnp.max(jnp.abs(rgb), axis=0)),
                               rtol=1e-6)
    # None extras pass through
    def calib2(params, rgb, noise=None):
        assert noise is None
        return rgb, {"g": {"k": jnp.max(jnp.abs(rgb), axis=0)}}

    calibrate_chunked(calib2, None, rgb, None, chunk=3)


# ------------------------------------------------------------------- GPTQ

def test_gptq_identity_hessian_equals_rtn():
    """With H proportional to I (uncorrelated inputs) the GPTQ recursion's
    compensation terms vanish and it must reproduce round-to-nearest
    exactly (damping only rescales the identity)."""
    from genpercept_tpu.ops.quant import gptq_round

    key = jax.random.key(30)
    wf = jax.random.normal(key, (18, 6), jnp.float32) * 0.2
    o_scale = jnp.max(jnp.abs(wf), axis=0) / 127.0
    H = jnp.eye(18, dtype=jnp.float32) * 100.0
    wq = gptq_round(wf, o_scale, H)
    rtn = jnp.clip(jnp.round(wf / o_scale), -127, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(wq), np.asarray(rtn))


def test_conv_input_hessian_matches_explicit_im2col():
    """conv_input_hessian == im2col(x)^T im2col(x) built by hand, in the
    code domain, including padding semantics: symmetric stats pad with
    code 0, asymmetric with q0 = -zp*127/a (what the q0-padded conv
    actually feeds the MXU). Also covers the encoder downsampler geometry
    (stride 2, (0,1) padding)."""
    from genpercept_tpu.ops.quant import (
        conv_input_hessian, mse_optimal_clip_asym)

    key = jax.random.key(31)
    x = jax.nn.silu(jax.random.normal(key, (2, 6, 6, 3), jnp.float32))

    def im2col_gram(x, stat, stride, padding):
        from genpercept_tpu.ops.quant import _split_stat
        zp, a = _split_stat(jnp.asarray(stat), 1.0)
        xf = np.asarray(x, np.float64)
        (pt, pb), (pl, pr) = padding
        xf = np.pad(xf, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        if zp is not None:
            xf = xf - np.asarray(zp, np.float64)
        xf = xf * (127.0 / np.asarray(a, np.float64))
        b, hp, wp, ci = xf.shape
        nh = (hp - 3) // stride + 1
        nw = (wp - 3) // stride + 1
        cols = []
        for bi in range(b):
            for i in range(nh):
                for j in range(nw):
                    patch = xf[bi, i * stride:i * stride + 3,
                               j * stride:j * stride + 3, :]
                    cols.append(patch.reshape(-1))  # (kh,kw,ci) row-major
        X = np.stack(cols)
        return X.T @ X

    for stat_fn, stride, padding in [
        (absmax_per_channel, 1, ((1, 1), (1, 1))),
        (mse_optimal_clip_asym, 1, ((1, 1), (1, 1))),
        (mse_optimal_clip_asym, 2, ((0, 1), (0, 1))),
    ]:
        stat = stat_fn(x)
        H = np.asarray(conv_input_hessian(
            x, stat, stride=(stride, stride), padding=padding))
        H_ref = im2col_gram(x, stat, stride, padding)
        # bf16 tap dots: ~1% relative tolerance on the Gram
        np.testing.assert_allclose(
            H, H_ref, rtol=0.05, atol=0.05 * np.abs(H_ref).max())


def test_gptq_beats_rtn_on_correlated_inputs():
    """On spatially-smooth (strongly autocorrelated) inputs, GPTQ's error
    compensation must reduce the conv output error vs round-to-nearest.
    Forcing a coarse weight grid (few effective levels) makes rounding
    error the dominant term so the win is unambiguous."""
    from genpercept_tpu.ops.quant import conv_input_hessian, gptq_round

    key = jax.random.key(32)
    kx, kp = jax.random.split(key)
    # smooth field: cumulative sums of noise -> strong spatial correlation
    base = jax.random.normal(kx, (2, 16, 16, 8), jnp.float32)
    x = jnp.cumsum(jnp.cumsum(base, axis=1), axis=2) * 0.05
    p = _rand_conv(kp, 8, 12)
    stat = absmax_per_channel(x)
    a = jnp.maximum(stat, 1e-8)
    wf = (p["weight"].astype(jnp.float32)
          * (a / 127.0)[None, None, :, None])
    # coarse grid: 8x the natural step (simulates ~5-bit weights)
    o_scale = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0 * 8.0
    H = conv_input_hessian(x, stat)

    wq_g = gptq_round(wf.reshape(-1, 12), o_scale, H).reshape(wf.shape)
    wq_r = jnp.clip(jnp.round(wf / o_scale), -127, 127).astype(jnp.int8)

    xq = jnp.clip(jnp.round(x * (127.0 / a)), -127, 127)
    ref = conv2d(xq, wf, None)

    def err(wq):
        y = conv2d(xq, wq.astype(jnp.float32) * o_scale, None)
        return float(jnp.mean(jnp.square(y - ref)))

    e_g, e_r = err(wq_g), err(wq_r)
    assert e_g < 0.8 * e_r, (e_g, e_r)


def test_quantize_from_stats_gptq_end_to_end():
    """hess-routed quantize_from_stats on the tiny VAE decoder: runs, and
    the quantized decode error does not regress vs RTN."""
    from genpercept_tpu.ops.quant import make_quant_conv_fn
    from genpercept_tpu.models import vae_decode

    vae = init_vae(jax.random.key(33), TINY_VAE)
    z = jax.random.normal(jax.random.key(34), (2, 8, 8, 4), jnp.float32) * 0.3

    stats, hess = {}, {}
    calib = make_calib_conv_fn(stats, clip_search=True, asymmetric=True,
                               hess=hess)
    ref = vae_decode(vae, z, TINY_VAE, conv_fn=calib)
    assert set(hess).issubset(set(stats))
    assert all("upsamplers" not in k for k in hess)

    q_rtn = quantize_from_stats(vae, stats, margin=1.0)
    q_gptq = quantize_from_stats(vae, stats, margin=1.0, hess=hess)
    out_r = vae_decode(vae, z, TINY_VAE, conv_fn=make_quant_conv_fn(q_rtn))
    out_g = vae_decode(vae, z, TINY_VAE, conv_fn=make_quant_conv_fn(q_gptq))
    e_r = np.abs(np.asarray(out_r - ref)).mean()
    e_g = np.abs(np.asarray(out_g - ref)).mean()
    assert e_g <= e_r * 1.1, (e_g, e_r)


def test_pipeline_int8_gptq_end_to_end():
    """int8_gptq=True through GenPerceptPipeline: the calibration program
    returns the VAE Grams, quantize_from_stats routes them into gptq_round,
    and the quantized run stays within the tiny-net error envelope."""
    import tests.test_pipeline as TP

    from genpercept_tpu.pipeline import GenPerceptPipeline, PipelineConfig

    models = TP.tiny_models()
    rgb = np.random.default_rng(10).uniform(size=(48, 48, 3)).astype(
        np.float32)
    pipe_fp = GenPerceptPipeline(
        models, PipelineConfig(mode="depth", processing_res=0))
    pipe_q = GenPerceptPipeline(
        models, PipelineConfig(mode="depth", processing_res=0,
                               int8_vae=True, int8_gptq=True,
                               int8_exclude=()))
    ref = pipe_fp(rgb).pred_np
    first = pipe_q(rgb).pred_np
    np.testing.assert_allclose(first, ref, atol=1e-6)  # calibration pass
    vq = pipe_q._params["vae_quant"]
    assert len(vq["enc"]) == 23 and len(vq["dec"]) == 31
    second = pipe_q(rgb).pred_np
    assert np.abs(second - ref).max() < 0.3
    assert np.abs(second - ref).mean() < 0.05


def test_pipeline_int8_unet_ff_only():
    """int8_unet_ff: only the GEGLU FF matmuls quantize (3 per transformer:
    :h/:g halves + net.2); attention projections stay full precision. The
    quantized run stays within the tiny-net error envelope. (On TPU the
    fully-quantized FFs additionally fuse into one s8 Pallas program —
    ops/fused_ff.py::fused_geglu_ff_int8, covered by tests/test_ops.py;
    this CPU test drives the placement/calibration plumbing.)"""
    import tests.test_pipeline as TP

    from genpercept_tpu.ops.quant import QDense
    from genpercept_tpu.pipeline import GenPerceptPipeline, PipelineConfig

    models = TP.tiny_models()
    rgb = np.random.default_rng(10).uniform(size=(64, 64, 3)).astype(np.float32)
    pipe_fp = GenPerceptPipeline(
        models, PipelineConfig(mode="depth", processing_res=0))
    pipe_q = GenPerceptPipeline(
        models, PipelineConfig(mode="depth", processing_res=0,
                               int8_vae=True, int8_unet=True,
                               int8_unet_ff=True, int8_exclude=()))
    ref = pipe_fp(rgb).pred_np
    pipe_q(rgb)  # calibration pass
    uq = pipe_q._params["vae_quant"]["unet"]
    denses = {k for k, v in uq.items() if isinstance(v, QDense)}
    assert len(uq) - len(denses) == 50  # convs unchanged
    assert len(denses) == 16 * 3  # ff :h/:g/net.2 per spatial transformer
    assert all(".ff.net." in k for k in denses)

    second = pipe_q(rgb).pred_np
    assert np.abs(second - ref).max() < 0.35
    assert np.abs(second - ref).mean() < 0.06
