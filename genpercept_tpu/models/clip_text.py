"""CLIP text encoder (SD2.1's OpenCLIP-ViT/H text tower) as pure functions.

The GenPercept pipeline encodes exactly one prompt — the empty string — and
caches the (1, 77, 1024) embedding (reference genpercept_pipeline.py:360-372);
this module reproduces transformers' CLIPTextModel numerics so that cached
embedding matches.

SD2.1 text config: vocab 49408, hidden 1024, 23 layers, 16 heads,
intermediate 4096, act gelu, causal self-attention, eps 1e-5.

Param tree keys mirror the transformers safetensors layout under
`text_model.`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from genpercept_tpu.models.layers import Params, dense, dense_init, norm_init
from genpercept_tpu.ops import layer_norm

BOS_TOKEN_ID = 49406
EOS_TOKEN_ID = 49407
# stabilityai/stable-diffusion-2* tokenizer pads with "!" (id 0)
SD21_PAD_TOKEN_ID = 0


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"  # SD2.1; SD1.x uses quick_gelu
    bos_token_id: int = BOS_TOKEN_ID
    eos_token_id: int = EOS_TOKEN_ID
    pad_token_id: int = SD21_PAD_TOKEN_ID


SD21_CLIP_TEXT = CLIPTextConfig()


def empty_prompt_ids(cfg: CLIPTextConfig = SD21_CLIP_TEXT) -> jnp.ndarray:
    """Token ids of "" : [BOS, EOS, PAD...], shape (1, 77)."""
    ids = [cfg.bos_token_id, cfg.eos_token_id] + [cfg.pad_token_id] * (
        cfg.max_position_embeddings - 2
    )
    return jnp.asarray([ids], dtype=jnp.int32)


def init_clip_text(key, cfg: CLIPTextConfig = SD21_CLIP_TEXT) -> Params:
    keys = iter(jax.random.split(key, 2 + cfg.num_layers * 8))
    c, inter = cfg.hidden_size, cfg.intermediate_size
    p: Params = {
        "embeddings": {
            "token_embedding": {
                "weight": jax.random.normal(next(keys), (cfg.vocab_size, c)) * 0.02
            },
            "position_embedding": {
                "weight": jax.random.normal(next(keys), (cfg.max_position_embeddings, c))
                * 0.02
            },
        },
        "encoder": {"layers": {}},
        "final_layer_norm": norm_init(c),
    }
    for i in range(cfg.num_layers):
        p["encoder"]["layers"][str(i)] = {
            "layer_norm1": norm_init(c),
            "self_attn": {
                "q_proj": dense_init(next(keys), c, c),
                "k_proj": dense_init(next(keys), c, c),
                "v_proj": dense_init(next(keys), c, c),
                "out_proj": dense_init(next(keys), c, c),
            },
            "layer_norm2": norm_init(c),
            "mlp": {
                "fc1": dense_init(next(keys), c, inter),
                "fc2": dense_init(next(keys), inter, c),
            },
        }
    return p


def _act(x, kind: str):
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(kind)


def _causal_self_attention(p: Params, x: jax.Array, heads: int) -> jax.Array:
    b, s, c = x.shape
    d = c // heads
    scale = d**-0.5
    q = dense(p["q_proj"], x).reshape(b, s, heads, d)
    k = dense(p["k_proj"], x).reshape(b, s, heads, d)
    v = dense(p["v_proj"], x).reshape(b, s, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    causal = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(causal[None, None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c)
    return dense(p["out_proj"], o)


def clip_text_apply(
    p: Params, input_ids: jax.Array, cfg: CLIPTextConfig = SD21_CLIP_TEXT
) -> jax.Array:
    """input_ids: (B, 77) int32 -> last_hidden_state (B, 77, hidden)."""
    emb = p["embeddings"]
    x = emb["token_embedding"]["weight"][input_ids]
    x = x + emb["position_embedding"]["weight"][None, : x.shape[1]]
    for i in range(cfg.num_layers):
        lyr = p["encoder"]["layers"][str(i)]
        h = layer_norm(x, lyr["layer_norm1"]["weight"], lyr["layer_norm1"]["bias"],
                       cfg.layer_norm_eps)
        x = x + _causal_self_attention(lyr["self_attn"], h, cfg.num_heads)
        h = layer_norm(x, lyr["layer_norm2"]["weight"], lyr["layer_norm2"]["bias"],
                       cfg.layer_norm_eps)
        h = _act(dense(lyr["mlp"]["fc1"], h), cfg.hidden_act)
        x = x + dense(lyr["mlp"]["fc2"], h)
    return layer_norm(
        x, p["final_layer_norm"]["weight"], p["final_layer_norm"]["bias"],
        cfg.layer_norm_eps,
    )
