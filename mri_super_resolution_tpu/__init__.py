"""mri_super_resolution_tpu — TPU-native framework for DWI super-resolution.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
MRIRC/MRI-super-resolution (reference: /root/reference):

- INR pipeline: SIREN / WIRE / Fourier-feature coordinate MLPs fit to
  low-resolution diffusion-weighted MRI acquisitions, sampled on dense grids
  for super-resolution, with ERD outlier rejection, learned coordinate
  perturbation (PerturbNet), and a 3-compartment biophysical model (PIA).
- MISR pipeline: RAMS residual-attention 3-D conv network fusing repeated
  acquisitions into a 3x upscaled image with shift-tolerant losses.

Design: functional JAX + flax models, optax optimizers, orbax checkpoints,
lax.scan training loops, Pallas fused kernels for the INR hot path, and
jax.sharding meshes for multi-chip data/cohort parallelism.
"""

__version__ = "0.1.0"

from mri_super_resolution_tpu import core, data, models, ops, fit, parallel, utils  # noqa: F401
