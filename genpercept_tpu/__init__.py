"""genpercept_tpu — TPU-native one-step diffusion dense-perception framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of aim-uofa/GenPercept
(ICLR 2025): repurposing Stable Diffusion 2.1 into one-step deterministic
dense-perception models (depth, surface normal, dichotomous segmentation,
matting, semantic-boundary segmentation, disparity) on TPU.

Design: models are pure functions over parameter pytrees, the whole
inference path (preprocess -> VAE encode -> UNet -> decode -> postprocess)
is a single jitted program, sharded over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
