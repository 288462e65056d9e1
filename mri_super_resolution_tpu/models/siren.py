"""SIREN coordinate MLPs (flax), with the reference's exact initialisation.

Reference equivalents:
- ``SineLayer`` / ``Siren`` — implicit-neural-representations/SRDWI.py:41-91
  (copies at nn_mri.py:96-146, INRmodel.py:41-64): ``sin(omega_0 * (W x + b))``
  with first-layer W ~ U(-1/in, 1/in), hidden W ~ U(+-sqrt(6/in)/omega_0),
  final linear W ~ U(+-sqrt(6/hidden)/omega_0).
- ``SirenERD``  — the INR_ERD.py:28-67 variant: SineLayer stack + Linear+ReLU
  head inside the trunk, a ReLU output, and a built-in perturbation branch
  (concat(coords, acq) -> Linear -> tanh -> Linear -> eps*tanh) whose
  (broadcast) output shifts the input coordinates.
- ``SirenToy``  — the inr_toy.py:25-63 variant whose perturb branch maps
  (in+1) -> (in+1) -> in and is added to the coords.

Biases keep torch ``nn.Linear``'s default U(+-1/sqrt(fan_in)) init (the
reference only overrides weights).

Precision policy: INR matmuls default to ``Precision.HIGH`` (bf16x3 error
compensation). Measured on the v5e chip (FF-SIREN 512x3, 70k coords, 300
steps): HIGH converges bit-comparably to HIGHEST (5.724e-6 vs 5.727e-6 final
loss) at 14.8 vs 21.5 ms/step. Raw bf16 (``default``) is another 1.4x faster
but risks stalling the reference's <2e-5 while-loop thresholds on
high-frequency targets — set ``set_precision('highest')`` for bit-parity runs
or ``'default'`` for speed experiments.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

PRECISION = jax.lax.Precision.HIGH


def set_precision(name: str) -> None:
    """Set the INR matmul precision globally ('default'|'high'|'highest').

    Affects layers constructed afterwards (flax binds precision at call time
    through the module attribute, so existing model objects pick it up too).
    """
    global PRECISION
    PRECISION = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def siren_first_init(dtype=jnp.float32):
    def init(key, shape, dtype=dtype):
        fan_in = shape[0]
        return jax.random.uniform(key, shape, dtype, -1.0 / fan_in, 1.0 / fan_in)

    return init


def siren_hidden_init(omega_0: float, dtype=jnp.float32):
    def init(key, shape, dtype=dtype):
        fan_in = shape[0]
        bound = np.sqrt(6.0 / fan_in) / omega_0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(dtype=jnp.float32):
    """torch nn.Linear default bias: U(+-1/sqrt(fan_in)).

    flax bias init receives only the bias shape, so fan_in is bound at layer
    construction via closure (see ``_dense``).
    """

    def make(fan_in: int):
        def init(key, shape, dtype=dtype):
            bound = 1.0 / np.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return init

    return make


_bias_for = torch_bias_init()


def _dense(features: int, fan_in: int, kernel_init) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=kernel_init,
        bias_init=_bias_for(fan_in),
        precision=PRECISION,
    )


class SineLayer(nn.Module):
    """Linear + sin(omega_0 * .) with SIREN init."""

    features: int
    omega_0: float = 30.0
    is_first: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        kinit = (
            siren_first_init() if self.is_first else siren_hidden_init(self.omega_0)
        )
        x = _dense(self.features, fan_in, kinit)(x)
        return jnp.sin(self.omega_0 * x)


class Siren(nn.Module):
    """Plain SIREN: first SineLayer, ``hidden_layers`` hidden SineLayers,
    final linear (SRDWI.py:67-91)."""

    hidden_features: int = 256
    hidden_layers: int = 3
    out_features: int = 1
    first_omega_0: float = 30.0
    hidden_omega_0: float = 30.0

    @nn.compact
    def __call__(self, coords: Array) -> Array:
        x = SineLayer(self.hidden_features, self.first_omega_0, is_first=True)(coords)
        for _ in range(self.hidden_layers):
            x = SineLayer(self.hidden_features, self.hidden_omega_0)(x)
        return _dense(
            self.out_features,
            self.hidden_features,
            siren_hidden_init(self.hidden_omega_0),
        )(x)


class PerturbHead(nn.Module):
    """Two-linear tanh perturbation head used by the ERD/toy Siren variants."""

    hidden: int
    out: int
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: Array, eps: float | Array) -> Array:
        kinit = self.kernel_init or nn.initializers.lecun_normal()
        h = _dense(self.hidden, x.shape[-1], kinit)(x)
        h = jnp.tanh(h)
        h = _dense(self.out, self.hidden, kinit)(h)
        return eps * jnp.tanh(h)


class SirenERD(nn.Module):
    """INR_ERD.py:28-67 Siren: trunk = SineLayers + Linear + ReLU; output =
    ReLU(final_linear(trunk)); optional perturbation branch shifting coords.

    The perturbation branch input is concat(coords, acq_id) (acq_id raw, not
    /10 — that differs from the standalone PN) and its output has
    ``out_features`` dims, broadcast-added to the 2-D coords exactly as the
    reference's broadcasting does.
    """

    hidden_features: int = 128
    hidden_layers: int = 3
    out_features: int = 1
    first_omega_0: float = 30.0
    hidden_omega_0: float = 30.0
    perturb: bool = False

    @nn.compact
    def __call__(self, coords: Array, sample: float = 0.0, eps: float = 0.0) -> Array:
        if self.perturb:
            acq = jnp.full(coords.shape[:-1] + (1,), sample, coords.dtype)
            delta = PerturbHead(
                self.hidden_features,
                self.out_features,
                kernel_init=siren_hidden_init(self.hidden_omega_0),
                name="perturb",
            )(jnp.concatenate([coords, acq], axis=-1), eps)
            coords = coords + delta
        x = SineLayer(self.hidden_features, self.first_omega_0, is_first=True)(coords)
        for _ in range(self.hidden_layers):
            x = SineLayer(self.hidden_features, self.hidden_omega_0)(x)
        x = _dense(self.hidden_features, self.hidden_features, nn.initializers.lecun_normal())(x)
        x = nn.relu(x)
        x = _dense(
            self.out_features,
            self.hidden_features,
            siren_hidden_init(self.hidden_omega_0),
        )(x)
        return nn.relu(x)


class SirenToy(nn.Module):
    """inr_toy.py:25-63 Siren: plain trunk + (in+1)->(in+1)->in perturb branch
    added to coords."""

    hidden_features: int = 128
    hidden_layers: int = 3
    out_features: int = 1
    first_omega_0: float = 30.0
    hidden_omega_0: float = 30.0
    perturb: bool = False

    @nn.compact
    def __call__(self, coords: Array, sample: float = 0.0, eps: float = 0.0) -> Array:
        if self.perturb:
            d = coords.shape[-1]
            acq = jnp.full(coords.shape[:-1] + (1,), sample, coords.dtype)
            delta = PerturbHead(d + 1, d, name="perturb")(
                jnp.concatenate([coords, acq], axis=-1), eps
            )
            coords = coords + delta
        x = SineLayer(self.hidden_features, self.first_omega_0, is_first=True)(coords)
        for _ in range(self.hidden_layers):
            x = SineLayer(self.hidden_features, self.hidden_omega_0)(x)
        return _dense(
            self.out_features,
            self.hidden_features,
            siren_hidden_init(self.hidden_omega_0),
        )(x)
