"""WIRE: complex Gabor-wavelet INR, implemented as paired real ops.

Reference equivalent: ``ComplexGaborLayer2D`` (implicit-neural-representations/
INRmodel.py:66-120) and the WIRE-Siren wrapper of wiretest.ipynb (which takes
``.real`` of the network output).

The reference uses torch cfloat tensors. XLA complex support on TPU is limited
and slow (SURVEY.md "hard parts"), so complex values are carried as an
explicit (real, imag) pair and every complex op is expanded into real
arithmetic:

    z  = W x            (complex linear)
    z2 = W2 x           (second Gaussian window linear)
    out = exp(i*omega0*z) * exp(-sigma0^2 * (|z|^2 + |z2|^2))
        = exp(-omega0*Im(z) - sigma0^2*(...)) * (cos(omega0*Re z) + i sin(...))

omega0/sigma0 are trainable scalars when ``trainable=True`` (reference keeps
them fixed by default).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mri_super_resolution_tpu.models.siren import (
    _bias_for as _bias_init,  # torch nn.Linear default bias, shared w/ siren
    _dense,
    siren_first_init,
)

Array = jax.Array


class ComplexDense(nn.Module):
    """Complex linear layer on (real, imag) pairs via four real matmuls.

    (Kr + i Ki)(zr + i zi) + (br + i bi)
      = (zr Kr - zi Ki + br) + i (zr Ki + zi Kr + bi)
    """

    features: int

    @nn.compact
    def __call__(self, zr: Array, zi: Array) -> tuple[Array, Array]:
        fan_in = zr.shape[-1]
        kinit = nn.initializers.lecun_normal()
        kr = self.param("kernel_r", kinit, (fan_in, self.features))
        ki = self.param("kernel_i", kinit, (fan_in, self.features))
        binit = _bias_init(fan_in)
        br = self.param("bias_r", binit, (self.features,))
        bi = self.param("bias_i", binit, (self.features,))
        mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
        out_r = mm(zr, kr) - mm(zi, ki) + br
        out_i = mm(zr, ki) + mm(zi, kr) + bi
        return out_r, out_i


class ComplexGaborLayer(nn.Module):
    """Gabor wavelet activation layer. First layer takes real input."""

    features: int
    omega_0: float = 10.0
    sigma_0: float = 10.0
    is_first: bool = False
    trainable: bool = False

    @nn.compact
    def __call__(self, zr: Array, zi: Array | None = None) -> tuple[Array, Array]:
        omega = self.param("omega_0", nn.initializers.constant(self.omega_0), (1,))
        sigma = self.param("sigma_0", nn.initializers.constant(self.sigma_0), (1,))
        if not self.trainable:
            omega = jax.lax.stop_gradient(omega)
            sigma = jax.lax.stop_gradient(sigma)

        if self.is_first or zi is None:
            lin = _dense(self.features, zr.shape[-1], siren_first_init())
            orth = _dense(self.features, zr.shape[-1], siren_first_init())
            sr = lin(zr)
            si = jnp.zeros_like(sr)
            s2r, s2i = orth(zr), jnp.zeros_like(sr)
            abs2 = sr * sr
            abs2_orth = s2r * s2r
        else:
            sr, si = ComplexDense(self.features, name="linear")(zr, zi)
            s2r, s2i = ComplexDense(self.features, name="scale_orth")(zr, zi)
            abs2 = sr * sr + si * si
            abs2_orth = s2r * s2r + s2i * s2i

        # exp(i*omega*(sr + i si)) = exp(-omega*si) * (cos(omega*sr) + i sin)
        gauss = jnp.exp(-(sigma * sigma) * (abs2 + abs2_orth))
        mag = jnp.exp(-omega * si) * gauss
        return mag * jnp.cos(omega * sr), mag * jnp.sin(omega * sr)


class Wire(nn.Module):
    """WIRE INR: stacked Gabor layers + final complex linear, real output."""

    hidden_features: int = 256
    hidden_layers: int = 2
    out_features: int = 1
    omega_0: float = 10.0
    sigma_0: float = 10.0
    trainable: bool = False

    @nn.compact
    def __call__(self, coords: Array) -> Array:
        zr, zi = ComplexGaborLayer(
            self.hidden_features, self.omega_0, self.sigma_0, is_first=True,
            trainable=self.trainable,
        )(coords)
        for _ in range(self.hidden_layers):
            zr, zi = ComplexGaborLayer(
                self.hidden_features, self.omega_0, self.sigma_0,
                trainable=self.trainable,
            )(zr, zi)
        out_r, _ = ComplexDense(self.out_features, name="final")(zr, zi)
        return out_r
