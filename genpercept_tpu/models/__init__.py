from genpercept_tpu.models.vae import VAEConfig, init_vae, vae_encode, vae_decode
from genpercept_tpu.models.unet import UNetConfig, init_unet, unet_apply
from genpercept_tpu.models.clip_text import CLIPTextConfig, init_clip_text, clip_text_apply
from genpercept_tpu.models.dpt_head import DPTHeadConfig, init_dpt_head, dpt_head_apply

__all__ = [
    "VAEConfig", "init_vae", "vae_encode", "vae_decode",
    "UNetConfig", "init_unet", "unet_apply",
    "CLIPTextConfig", "init_clip_text", "clip_text_apply",
    "DPTHeadConfig", "init_dpt_head", "dpt_head_apply",
]
