"""sr3_tpu — a TPU-native (JAX/XLA/Pallas) framework for SR3 / DDPM
image super-resolution via iterative refinement.

Re-designed from scratch for TPU hardware with the capability envelope of
the PyTorch reference (Janspiry/Image-Super-Resolution-via-Iterative-Refinement):

- one parameterized diffusion core + UNet (continuous-gamma SR3 conditioning and
  discrete-t DDPM conditioning) instead of the reference's two duplicated trees
  (reference: model/sr3_modules vs model/ddpm_modules),
- the full reverse-diffusion chain compiled into a single ``lax.scan`` so all
  2000 steps stay on-chip (the reference drives the loop from Python with one
  host round-trip per step, model/sr3_modules/diffusion.py:176-200),
- NHWC layouts, bf16 compute with f32 params, Pallas kernels for attention and
  GroupNorm+SiLU,
- data parallelism over a ``jax.sharding.Mesh`` (the reference's only
  parallelism is single-process ``nn.DataParallel``, model/networks.py:113-115).
"""

__version__ = "0.1.0"
