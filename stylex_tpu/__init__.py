"""stylex_tpu — a TPU-native (JAX/XLA/Pallas) StylEx framework.

A from-scratch rebuild of the capabilities of
NoahVl/Explaining-In-Style-Reproducibility-Study (a ReScience reproduction of
"Explaining in Style: Training a GAN to Explain a Classifier in StyleSpace",
Lang et al., ICCV 2021) designed for TPU hardware:

* the StyleGAN2-style modulated convolution is expressed as input-scaling +
  XLA convolution + per-(sample, channel) demodulation so it tiles directly
  onto the MXU (no CUDA batch-into-groups trick),
* training is one jitted step (gradient accumulation via ``lax.scan``,
  conditional penalties via ``lax.cond``) data-parallel over a
  ``jax.sharding.Mesh``,
* AttFind — the StyleSpace attribute search — is a batched, vmapped,
  on-device sweep over (image, style coordinate, direction) instead of the
  reference's sequential bias-mutation loop
  (cf. /root/reference/stylex/run_attfind_combined.ipynb cell 5).
"""

from stylex_tpu.version import __version__

__all__ = ["__version__"]
