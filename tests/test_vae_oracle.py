"""Full-VAE wiring oracle: independent torch assembly of the SD AutoencoderKL
(encoder with asymmetric-pad downsamples, mid attention, decoder with 3
resnets/stage) vs our JAX VAE with identical weights."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from genpercept_tpu.io.weights import torch_module_to_pytree
from genpercept_tpu.models import VAEConfig, vae_decode, vae_encode

C = (32, 32, 64, 64)
CFG = VAEConfig(block_out_channels=C)


class TResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return (self.conv_shortcut(x) if self.conv_shortcut else x) + h


class TAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleDict({"0": nn.Linear(c, c)})

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        o = F.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None]
        )[:, 0]
        o = self.to_out["0"](o)
        return x + o.reshape(b, h, w, c).permute(0, 3, 1, 2)


def _mid(c):
    m = nn.Module()
    m.resnets = nn.ModuleList([TResnet(c, c), TResnet(c, c)])
    m.attentions = nn.ModuleList([TAttn(c)])
    return m


class TVAE(nn.Module):
    def __init__(self):
        super().__init__()
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, C[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        cin = C[0]
        for i, cout in enumerate(C):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(cin if j == 0 else cout, cout) for j in range(2)]
            )
            if i < 3:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(cout, cout, 3, 2, 0)
            cin = cout
            enc.down_blocks.append(blk)
        enc.mid_block = _mid(C[-1])
        enc.conv_norm_out = nn.GroupNorm(32, C[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(C[-1], 8, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(8, 8, 1)
        self.post_quant_conv = nn.Conv2d(4, 4, 1)

        dec = nn.Module()
        rev = list(reversed(C))
        dec.conv_in = nn.Conv2d(4, rev[0], 3, padding=1)
        dec.mid_block = _mid(rev[0])
        dec.up_blocks = nn.ModuleList()
        cin = rev[0]
        for i, cout in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(cin if j == 0 else cout, cout) for j in range(3)]
            )
            if i < 3:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(cout, cout, 3, padding=1)
            cin = cout
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn.GroupNorm(32, rev[-1], eps=1e-6)
        dec.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)
        self.decoder = dec

    def encode(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for rn in blk.resnets:
                h = rn(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(F.pad(h, (0, 1, 0, 1)))
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        moments = self.quant_conv(h)
        mean = moments[:, :4]
        return mean * 0.18215

    def decode(self, z):
        z = self.post_quant_conv(z / 0.18215)
        d = self.decoder
        h = d.conv_in(z)
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for blk in d.up_blocks:
            for rn in blk.resnets:
                h = rn(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


def test_full_vae_matches_torch_oracle():
    torch.manual_seed(1)
    m = TVAE().eval()
    params = torch_module_to_pytree(m)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)

    z_ours = vae_encode(params, jnp.asarray(x), CFG)
    with torch.no_grad():
        z_theirs = m.encode(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(z_ours), z_theirs.permute(0, 2, 3, 1).numpy(), atol=5e-4
    )

    y_ours = vae_decode(params, z_ours, CFG)
    with torch.no_grad():
        y_theirs = m.decode(z_theirs)
    np.testing.assert_allclose(
        np.asarray(y_ours), y_theirs.permute(0, 2, 3, 1).numpy(), atol=5e-4
    )
