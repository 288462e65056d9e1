"""Standalone PerturbNet (PN): learned per-acquisition coordinate perturbation.

Reference equivalent: ``PN`` (implicit-neural-representations/SRDWI.py:93-109;
2-D variant nn_mri.py:148-164). Input is concat(coords_features, acq_id/10);
two linears with a tanh between; output ``eps * tanh(.)`` — a bounded d-dim
coordinate offset modelling inter-acquisition motion.

In the 3-D pipeline the PN input is the *Fourier-encoded* coordinates
(2*mapping_size features) and its output is re-Fourier-encoded before the INR
(superresDWI.py:149-151 applies input_mapping to the PN output — the "double
mapping" quirk; replicated by the fit engine, not here).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mri_super_resolution_tpu.models.siren import _dense

Array = jax.Array


class PerturbNet(nn.Module):
    hidden_features: int = 128
    dimension: int = 2
    acq_scale: float = 10.0  # acq id divided by this before concat (SRDWI.py:101)

    @nn.compact
    def __call__(self, coords: Array, sample: float | Array = 0.0, eps: float = 0.0) -> Array:
        acq = jnp.full(coords.shape[:-1] + (1,), jnp.asarray(sample, coords.dtype) / self.acq_scale)
        x = jnp.concatenate([coords, acq], axis=-1)
        kinit = nn.initializers.lecun_normal()
        x = _dense(self.hidden_features, x.shape[-1], kinit)(x)
        x = jnp.tanh(x)
        x = _dense(self.dimension, self.hidden_features, kinit)(x)
        return eps * jnp.tanh(x)
