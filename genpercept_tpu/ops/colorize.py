"""On-device depth colorization with the ColorBrewer 'Spectral' colormap.

The reference colorizes on host via matplotlib (`image_util.py:25-63`); here
the LUT lives on device and colorization is a gather + lerp inside the jitted
postprocess, so colored previews never leave the chip as fp32 rasters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ColorBrewer Spectral-11 anchors (public domain data), low -> high.
_SPECTRAL_ANCHORS = np.array(
    [
        [158, 1, 66],
        [213, 62, 79],
        [244, 109, 67],
        [253, 174, 97],
        [254, 224, 139],
        [255, 255, 191],
        [230, 245, 152],
        [171, 221, 164],
        [102, 194, 165],
        [50, 136, 189],
        [94, 79, 162],
    ],
    dtype=np.float64,
) / 255.0


def _build_lut(n: int = 256) -> np.ndarray:
    """Piecewise-linear interpolation of the 11 anchors, matching how
    matplotlib builds its 'Spectral' LinearSegmentedColormap."""
    xs = np.linspace(0.0, 1.0, len(_SPECTRAL_ANCHORS))
    ts = np.linspace(0.0, 1.0, n)
    lut = np.stack(
        [np.interp(ts, xs, _SPECTRAL_ANCHORS[:, c]) for c in range(3)], axis=-1
    )
    return lut.astype(np.float32)


SPECTRAL_LUT = jnp.asarray(_build_lut())


def colorize_depth(
    depth: jax.Array,
    vmin: float | jax.Array = 0.0,
    vmax: float | jax.Array = 1.0,
    reverse: bool = False,
) -> jax.Array:
    """depth: (..., H, W) in [vmin, vmax] -> (..., H, W, 3) float32 in [0,1]."""
    t = (depth.astype(jnp.float32) - vmin) / jnp.maximum(vmax - vmin, 1e-8)
    t = jnp.clip(t, 0.0, 1.0)
    if reverse:
        t = 1.0 - t
    pos = t * (SPECTRAL_LUT.shape[0] - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, SPECTRAL_LUT.shape[0] - 1)
    frac = (pos - lo)[..., None]
    return SPECTRAL_LUT[lo] * (1.0 - frac) + SPECTRAL_LUT[hi] * frac
