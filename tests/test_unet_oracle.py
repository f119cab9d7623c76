"""Full-UNet wiring oracle: an independent torch assembly of the SD-style
UNet (2 resnets/block, cross-attn in the first 3 down / last 3 up blocks,
skip-connection stack, nearest-x2 upsamplers, timestep MLP) is compared
against our JAX UNet with identical weights. This catches cross-block wiring
bugs (skip pop order, downsample placement, feature-tap indices) that
block-level parity tests cannot."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from genpercept_tpu.io.weights import torch_module_to_pytree
from genpercept_tpu.models import UNetConfig, unet_apply

C = (32, 64, 96, 96)
HEADS = (1, 2, 3, 3)
CTX = 24
TEMB = C[0] * 4

CFG = UNetConfig(
    block_out_channels=C,
    attention_heads=HEADS,
    cross_attention_dim=CTX,
)


class TResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(TEMB, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        return (self.conv_shortcut(x) if self.conv_shortcut else x) + h


class TAttnBlock(nn.Module):
    """Transformer2D with use_linear_projection (1 basic block)."""

    def __init__(self, c, heads):
        super().__init__()
        self.heads = heads
        self.norm = nn.GroupNorm(32, c, eps=1e-6)
        self.proj_in = nn.Linear(c, c)
        blk = nn.Module()
        blk.norm1 = nn.LayerNorm(c)
        blk.attn1 = self._mha(c, c)
        blk.norm2 = nn.LayerNorm(c)
        blk.attn2 = self._mha(c, CTX)
        blk.norm3 = nn.LayerNorm(c)
        blk.ff = nn.Module()
        blk.ff.net = nn.ModuleDict({
            "0": nn.ModuleDict({"proj": nn.Linear(c, c * 8)}),
            "2": nn.Linear(c * 4, c),
        })
        self.transformer_blocks = nn.ModuleList([blk])
        self.proj_out = nn.Linear(c, c)

    @staticmethod
    def _mha(c, kv):
        return nn.ModuleDict({
            "to_q": nn.Linear(c, c, bias=False),
            "to_k": nn.Linear(kv, c, bias=False),
            "to_v": nn.Linear(kv, c, bias=False),
            "to_out": nn.ModuleDict({"0": nn.Linear(c, c)}),
        })

    def _attn(self, mod, x, ctx):
        b, s, c = x.shape
        h = self.heads
        q = mod["to_q"](x).view(b, s, h, c // h).transpose(1, 2)
        k = mod["to_k"](ctx).view(b, ctx.shape[1], h, c // h).transpose(1, 2)
        v = mod["to_v"](ctx).view(b, ctx.shape[1], h, c // h).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, s, c)
        return mod["to_out"]["0"](o)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        res = x
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        y = self.proj_in(y)
        blk = self.transformer_blocks[0]
        y = y + self._attn(blk.attn1, blk.norm1(y), blk.norm1(y))
        y = y + self._attn(blk.attn2, blk.norm2(y), ctx)
        h2 = blk.ff.net["0"]["proj"](blk.norm3(y))
        hid, gate = h2.chunk(2, dim=-1)
        y = y + blk.ff.net["2"](hid * F.gelu(gate))
        y = self.proj_out(y)
        return res + y.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class TUNet(nn.Module):
    """Independent diffusers-semantics UNet assembly (layers_per_block=2)."""

    def __init__(self):
        super().__init__()
        self.conv_in = nn.Conv2d(4, C[0], 3, padding=1)
        te = nn.Module()
        te.linear_1 = nn.Linear(C[0], TEMB)
        te.linear_2 = nn.Linear(TEMB, TEMB)
        self.time_embedding = te

        self.down_blocks = nn.ModuleList()
        cin = C[0]
        for i, cout in enumerate(C):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([TResnet(cin if j == 0 else cout, cout)
                                         for j in range(2)])
            if i < 3:
                blk.attentions = nn.ModuleList([TAttnBlock(cout, HEADS[i])
                                                for _ in range(2)])
                blk.downsamplers = nn.ModuleList(
                    [nn.Module()]
                )
                blk.downsamplers[0].conv = nn.Conv2d(cout, cout, 3, 2, 1)
            cin = cout
            self.down_blocks.append(blk)

        mid = nn.Module()
        mid.resnets = nn.ModuleList([TResnet(C[-1], C[-1]), TResnet(C[-1], C[-1])])
        mid.attentions = nn.ModuleList([TAttnBlock(C[-1], HEADS[-1])])
        self.mid_block = mid

        rev = list(reversed(C))
        self.up_blocks = nn.ModuleList()
        for i in range(4):
            cout = rev[i]
            prev_out = rev[max(i - 1, 0)]
            blk = nn.Module()
            resnets = []
            for j in range(3):
                skip = rev[min(i + 1, 3)] if j == 2 else cout
                rin = prev_out if j == 0 else cout
                resnets.append(TResnet(rin + skip, cout))
            blk.resnets = nn.ModuleList(resnets)
            if i > 0:
                blk.attentions = nn.ModuleList(
                    [TAttnBlock(cout, list(reversed(HEADS))[i]) for _ in range(3)]
                )
            if i < 3:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(32, C[0], eps=1e-5)
        self.conv_out = nn.Conv2d(C[0], 4, 3, padding=1)

    def forward(self, x, t, ctx):
        # sinusoidal t-embedding, flip_sin_to_cos
        half = C[0] // 2
        freqs = torch.exp(-np.log(10000.0) * torch.arange(half) / half)
        args = t.float()[:, None] * freqs[None]
        temb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        temb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(temb)))

        h = self.conv_in(x)
        res_stack = [h]
        for i, blk in enumerate(self.down_blocks):
            for j, rn in enumerate(blk.resnets):
                h = rn(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                res_stack.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                res_stack.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)

        feats = []
        for i, blk in enumerate(self.up_blocks):
            for j, rn in enumerate(blk.resnets):
                h = torch.cat([h, res_stack.pop()], dim=1)
                h = rn(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
            feats.append(h)

        out = self.conv_out(F.silu(self.conv_norm_out(h)))
        return out, feats


def test_full_unet_matches_torch_oracle():
    torch.manual_seed(0)
    m = TUNet().eval()
    params = torch_module_to_pytree(m)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
    ctx = rng.normal(size=(1, 7, CTX)).astype(np.float32)
    t = np.array([421], np.int64)

    ours, feats_j = unet_apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), CFG,
        return_features=True,
    )
    with torch.no_grad():
        theirs, feats_t = m(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t),
            torch.from_numpy(ctx),
        )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(0, 2, 3, 1).numpy(), atol=5e-4
    )
    assert len(feats_j) == len(feats_t) == 4
    for fj, ft in zip(feats_j, feats_t):
        np.testing.assert_allclose(
            np.asarray(fj), ft.permute(0, 2, 3, 1).numpy(), atol=5e-4
        )
