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

import os as _os


def _enable_compilation_cache() -> None:
    """Persist compiled XLA/Mosaic executables across processes.

    The pipelines' big scanned programs take minutes to compile through the
    tunnelled TPU backend; with the persistent cache a rerun with identical
    shapes loads instantly. Opt out with MRI_SR_NO_COMPILE_CACHE=1.

    MRI_SR_CACHE_MIN_COMPILE_SECS overrides the 1.0 s persistence threshold:
    on a tunnelled backend even sub-second compiles pay a network round-trip
    per program, so cohort drivers that re-run the same shapes across many
    processes may want 0 (persist everything; costs cache-dir inodes). See
    results/round5_coldstart/ for the measured cold/warm split.
    """
    if _os.environ.get("MRI_SR_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/mri_sr_tpu_xla"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(_os.environ.get("MRI_SR_CACHE_MIN_COMPILE_SECS", "1.0")),
        )
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from mri_super_resolution_tpu import core, data, models, ops, fit, parallel, utils  # noqa: F401
