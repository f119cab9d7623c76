"""Analytic FLOP count of the one-step 768^2 pipeline, per phase, and the
bf16 roofline it implies. All counts are 2*MACs, walked layer-by-layer from
the SD2.1 geometry in models/{vae,unet}.py (the same geometry as the
reference's diffusers configs, /root/reference/hf_configs and
genpercept_pipeline.py:374-486).

This is the source of the README's MFU numbers. Run: python scripts/model_flops.py
[--batch 16] [--res 768]. Pure host arithmetic — no device needed.

Roofline inputs (measured on the one v5e chip, see git log / README):
  - XLA bf16 conv emitter sustains ~206 TFLOP/s at the VAE shapes
  - flash self-attention (d=64) sustains ~77-88 TFLOP/s (VPU softmax bound)
  - d=512 single-head attention ~170 TFLOP/s
  - chip matmul peak ~230 bf16 TFLOP/s (measured; official v5e 197)
"""

import argparse
import json


def conv(h, w, cin, cout, k=3):
    return h * w * cin * cout * k * k * 2


def dense(n, cin, cout):
    return n * cin * cout * 2


def attention(s_q, s_k, d):
    """QK^T + PV only (projections counted by caller)."""
    return 2 * 2 * s_q * s_k * d


def vae_encoder_flops(res):
    """models/vae.py encoder: channels (128,256,512,512), 2 resnets/level,
    stride-2 downsamples, mid resnet+1-head-512 attn+resnet, conv_out->8ch,
    quant_conv."""
    f_conv = 0
    ch = [128, 256, 512, 512]
    h = w = res
    f_conv += conv(h, w, 3, ch[0])
    c = ch[0]
    for i, co in enumerate(ch):
        for _ in range(2):
            f_conv += conv(h, w, c, co) + conv(h, w, co, co)
            if c != co:
                f_conv += conv(h, w, c, co, k=1)
            c = co
        if i < 3:
            h, w = h // 2, w // 2
            f_conv += conv(h, w, c, c)
    f_conv += 4 * conv(h, w, c, c)                      # 2 mid resnets
    s = h * w
    f_attn = attention(s, s, 512)
    f_conv += 4 * dense(s, 512, 512)                     # qkv+out proj
    f_conv += conv(h, w, c, 8) + conv(h, w, 8, 8, k=1)   # conv_out, quant
    return f_conv, f_attn


def vae_decoder_flops(res):
    """models/vae.py decoder: post_quant, conv_in 4->512, mid, levels
    (512,512,256,128) x 3 resnets, upsample conv after levels 0-2 (counted at
    the output resolution — the fused lhs-dilated 4x4 form has the same MAC
    count as the naive nearest-x2 + 3x3), conv_out->3."""
    h = w = res // 8
    f_conv = conv(h, w, 4, 4, k=1) + conv(h, w, 4, 512)
    c = 512
    f_conv += 4 * conv(h, w, c, c)
    s = h * w
    f_attn = attention(s, s, 512)
    f_conv += 4 * dense(s, 512, 512)
    for i, co in enumerate([512, 512, 256, 128]):
        for _ in range(3):
            f_conv += conv(h, w, c, co) + conv(h, w, co, co)
            if c != co:
                f_conv += conv(h, w, c, co, k=1)
            c = co
        if i < 3:
            h, w = h * 2, w * 2
            f_conv += conv(h, w, c, c)
    f_conv += conv(h, w, c, 3)
    return f_conv, f_attn


def unet_flops(res, ctx_s=77, ctx_d=1024):
    """models/unet.py SD2.1: channels (320,640,1280,1280), 2 layers/block,
    cross-attn transformers on blocks 0-2 (down) / 1-3 (up), GEGLU c->8c->4c->c
    feed-forward, skip-concat resnets on the up path."""
    ch = [320, 640, 1280, 1280]
    has_attn = [True, True, True, False]
    h = w = res // 8

    def resnet(h, w, cin, cout):
        r = conv(h, w, cin, cout) + conv(h, w, cout, cout)
        if cin != cout:
            r += conv(h, w, cin, cout, k=1)
        return r

    def transformer(h, w, c):
        s = h * w
        matmul = 2 * conv(h, w, c, c, k=1)               # proj in/out
        matmul += 4 * dense(s, c, c)                     # self qkv+out
        matmul += 2 * dense(s, c, c) + 2 * dense(ctx_s, ctx_d, c)  # cross
        matmul += dense(s, c, 8 * c) + dense(s, 4 * c, c)          # GEGLU
        sa = attention(s, s, c)
        ca = attention(s, ctx_s, c)
        return matmul + ca, sa

    f_conv = conv(h, w, 4, ch[0])
    f_attn = 0
    c = ch[0]
    skips = [(h, w, c)]
    for i, co in enumerate(ch):
        for _ in range(2):
            f_conv += resnet(h, w, c, co)
            c = co
            if has_attn[i]:
                m, sa = transformer(h, w, c)
                f_conv += m
                f_attn += sa
            skips.append((h, w, c))
        if i < 3:
            h, w = h // 2, w // 2
            f_conv += conv(h, w, c, c)
            skips.append((h, w, c))
    f_conv += resnet(h, w, c, c) + resnet(h, w, c, c)
    m, sa = transformer(h, w, c)
    f_conv += m
    f_attn += sa
    for i, co in enumerate(ch[::-1]):
        for _ in range(3):
            _, _, sc = skips.pop()
            f_conv += resnet(h, w, c + sc, co)
            c = co
            if [False, True, True, True][i]:
                m, sa = transformer(h, w, c)
                f_conv += m
                f_attn += sa
        if i < 3:
            h, w = h * 2, w * 2
            f_conv += conv(h, w, c, c)
    f_conv += conv(h, w, c, 4)
    return f_conv, f_attn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=768)
    # measured per-phase ms at 768^2 b16 (scripts/profile_phases.py); pass
    # fresh numbers to recompute achieved TFLOP/s
    ap.add_argument("--measured_ms", default="230,316,425",
                    help="encode,unet,decode ms per batch")
    args = ap.parse_args()
    B, res = args.batch, args.res
    meas = [float(x) for x in args.measured_ms.split(",")]

    phases = {}
    for name, (fc, fa) in [
        ("encode", vae_encoder_flops(res)),
        ("unet", unet_flops(res)),
        ("decode", vae_decoder_flops(res)),
    ]:
        phases[name] = (fc * B, fa * B)

    # roofline rates (TFLOP/s, measured — see module docstring)
    CONV, FLASH_D64, ATTN_D512, PEAK = 206e12, 82e12, 170e12, 230e12

    total_f = total_ideal = 0.0
    for (name, (fc, fa)), ms in zip(phases.items(), meas):
        f = fc + fa
        attn_rate = FLASH_D64 if name == "unet" else ATTN_D512
        ideal = fc / CONV + fa / attn_rate
        total_f += f
        total_ideal += ideal
        print(json.dumps({
            "phase": name,
            "tflop_batch": round(f / 1e12, 2),
            "measured_ms": ms,
            "achieved_tflops": round(f / 1e12 / (ms / 1e3), 1),
            "pct_of_peak": round(f / (ms / 1e3) / PEAK * 100, 1),
            "ideal_ms": round(ideal * 1e3, 1),
        }))
    t_meas = sum(meas) / 1e3
    print(json.dumps({
        "total_tflop_per_img": round(total_f / B / 1e12, 2),
        "measured_img_per_s": round(B / t_meas, 2),
        "aggregate_tflops": round(total_f / t_meas / 1e12, 1),
        "aggregate_mfu_pct": round(total_f / t_meas / PEAK * 100, 1),
        "bf16_roofline_img_per_s": round(B / total_ideal, 1),
    }))


if __name__ == "__main__":
    main()
