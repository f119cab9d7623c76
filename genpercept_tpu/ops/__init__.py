from genpercept_tpu.ops.norms import group_norm, layer_norm
from genpercept_tpu.ops.attention import dot_product_attention
from genpercept_tpu.ops.embeddings import timestep_embedding
from genpercept_tpu.ops.conv import conv2d, conv1x1
from genpercept_tpu.ops.resize import resize_bilinear_antialias, resize, resize_max_res
from genpercept_tpu.ops.colorize import colorize_depth

__all__ = [
    "group_norm",
    "layer_norm",
    "dot_product_attention",
    "timestep_embedding",
    "conv2d",
    "conv1x1",
    "resize_bilinear_antialias",
    "resize",
    "resize_max_res",
    "colorize_depth",
]
