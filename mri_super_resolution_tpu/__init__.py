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


def _host_fingerprint() -> str:
    """Short stable hash of this host's CPU identity (model + feature flags
    from /proc/cpuinfo; hostname-free so identical machines share a cache)."""
    import hashlib

    ident = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    ident = ident + line
                    if "\nflags" in ident or ident.startswith("flags"):
                        break
    except OSError:
        import platform

        ident = platform.machine() + platform.processor()
    return hashlib.sha256(ident.encode()).hexdigest()[:12]


def _enable_compilation_cache() -> None:
    """Persist compiled XLA/Mosaic executables across processes.

    The pipelines' big scanned programs take minutes to compile through the
    tunnelled TPU backend; with the persistent cache a rerun with identical
    shapes loads instantly. Opt out with MRI_SR_NO_COMPILE_CACHE=1.

    The persistence threshold defaults to 0 (persist EVERY compile):
    round-5 measured the cohort pipelines' per-process cold-start tail as
    ~110 sub-second tiny-op compiles that jax's default 1.0 s threshold
    refused to cache — each re-paying a backend round-trip every process.
    With min=0 and a warm cache, a fresh quality-preset patient process
    drops from 238 s to 16.9 s end-to-end (prep 174 s -> 3.5 s; all 126
    program loads served from cache in 4.4 s), for ~1.5 MB / 110 inodes of
    extra cache (results/round5_coldstart/run{2,3,4}.json). Override with
    MRI_SR_CACHE_MIN_COMPILE_SECS if cache-dir inodes matter more than
    cold-start latency.
    """
    if _os.environ.get("MRI_SR_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
        if cache_dir is None:
            # Scope the default dir by a host-CPU fingerprint: XLA:CPU AOT
            # cache keys do NOT include host machine features, so a cache
            # written on one machine type loads on another and risks SIGILL
            # (observed: cpu_aot_loader "+prefer-no-gather is not supported
            # on the host machine" warnings when a persisted home dir moved
            # hosts). Same host -> same dir, so the cold-start win
            # (results/round5_coldstart/) is unaffected.
            cache_dir = _os.path.expanduser(
                _os.path.join("~/.cache/mri_sr_tpu_xla", _host_fingerprint()))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(_os.environ.get("MRI_SR_CACHE_MIN_COMPILE_SECS", "0.0")),
        )
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from mri_super_resolution_tpu import core, data, models, ops, fit, parallel, utils  # noqa: F401
