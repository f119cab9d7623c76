"""Predictor API: the torch.hub-style interface of GenPercept v1.

Rebuild of `GenPercept_v1/hubconf.py:45-154`: task-named constructors
returning a predictor with `infer_cv2` (BGR uint8 in) and `infer_pil` (PIL
in), including the HWC3 conversion and resize-to-multiple-of-64 preprocess.
Loads local checkpoint directories (no hub download in this environment).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _hwc3(x: np.ndarray) -> np.ndarray:
    """Grayscale/alpha -> 3-channel (hubconf.py:16-30 semantics)."""
    if x.ndim == 2:
        x = x[:, :, None]
    if x.shape[2] == 1:
        x = np.repeat(x, 3, axis=2)
    elif x.shape[2] == 4:
        rgb = x[..., :3].astype(np.float32)
        a = x[..., 3:4].astype(np.float32) / 255.0
        x = (rgb * a + 255.0 * (1.0 - a)).astype(np.uint8)
    return x


def _resize_multiple_of_64(x: np.ndarray, resolution: int) -> np.ndarray:
    import cv2

    h, w = x.shape[:2]
    k = resolution / min(h, w)
    nh = int(np.round(h * k / 64.0)) * 64
    nw = int(np.round(w * k / 64.0)) * 64
    interp = cv2.INTER_LANCZOS4 if k > 1 else cv2.INTER_AREA
    return cv2.resize(x, (nw, nh), interpolation=interp)


class BasePredictor:
    def __init__(self, checkpoint_dir: str, mode: str, resolution: int = 512,
                 half_precision: bool = True):
        import jax.numpy as jnp

        from genpercept_tpu.io.checkpoints import load_genpercept_checkpoint
        from genpercept_tpu.pipeline import GenPerceptPipeline, PipelineConfig

        dtype = jnp.bfloat16 if half_precision else jnp.float32
        models = load_genpercept_checkpoint(checkpoint_dir, mode, dtype=dtype)
        self.mode = mode
        self.resolution = resolution
        self.pipe = GenPerceptPipeline(
            models, PipelineConfig(mode=mode, processing_res=0, dtype=dtype)
        )

    def infer_pil(self, image, image_resolution: Optional[int] = None) -> np.ndarray:
        return self.infer_rgb(np.asarray(image.convert("RGB")), image_resolution)

    def infer_cv2(self, image: np.ndarray, image_resolution: Optional[int] = None) -> np.ndarray:
        return self.infer_rgb(image[..., ::-1], image_resolution)

    def infer_rgb(self, rgb: np.ndarray, image_resolution: Optional[int] = None) -> np.ndarray:
        rgb = _hwc3(np.asarray(rgb, np.uint8))
        h, w = rgb.shape[:2]
        x = _resize_multiple_of_64(rgb, image_resolution or self.resolution)
        out = self.pipe(x, color_map=None)
        pred = out.pred_np
        import cv2

        pred = cv2.resize(pred.astype(np.float32), (w, h), interpolation=cv2.INTER_LINEAR)
        if self.mode == "normal":
            # norm_to_rgb (v1 pipeline_genpercept.py:241-257): [-1,1] -> uint8
            n = pred * 2.0 - 1.0
            n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
            return ((n + 1.0) * 0.5 * 255.0).astype(np.uint8)
        return pred


def GenPercept_Depth(local_file_path: str, **kw) -> BasePredictor:
    return BasePredictor(local_file_path, "depth", **kw)


def GenPercept_Normal(local_file_path: str, **kw) -> BasePredictor:
    return BasePredictor(local_file_path, "normal", **kw)


def GenPercept_Segmentation(local_file_path: str, **kw) -> BasePredictor:
    return BasePredictor(local_file_path, "seg", **kw)


def GenPercept_Matting(local_file_path: str, **kw) -> BasePredictor:
    return BasePredictor(local_file_path, "matting", **kw)


def GenPercept_Disparity(local_file_path: str, **kw) -> BasePredictor:
    return BasePredictor(local_file_path, "disparity", **kw)
