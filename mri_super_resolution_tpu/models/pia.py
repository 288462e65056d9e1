"""PIA: physics-informed autoencoder for 3-compartment tissue decomposition.

Reference equivalent: ``PIA`` (implicit-neural-representations/PIA.py:16-155):
MLP encoder (16 -> 32-64-128-256-512, LeakyReLU) with three predictor heads
producing per-compartment D (diffusivity), T2, and volume fractions v
(epithelium / stroma / lumen), bounded around physiological priors by
tanh*delta (v via softmax), and an *analytic* decoder evaluating the
3-compartment signal model over the 4x4 (b, TE) grid:

    S(b, TE) = 1000 * sum_c v_c * exp(-b/1000 * D_c) * exp(-TE / T2_c)

Also: the synthetic batch generator (PIA.py:171-213) and losses
(PIA.py:139-155, PIDS-weighted MSE / supervised variant).

The decoder's 16-point loop is replaced by a broadcast over the (b, TE) grid.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

D_MEAN = (0.5, 1.2, 2.85)
T2_MEAN = (45.0, 70.0, 750.0)
D_DELTA = (0.2, 0.5, 0.15)
T2_DELTA = (25.0, 30.0, 250.0)
B_VALUES = (0.0, 150.0, 1000.0, 1500.0)
TE_VALUES = (0.0, 13.0, 93.0, 143.0)


def signal_model(D: Array, T2: Array, v: Array, b_values=B_VALUES, te_values=TE_VALUES) -> Array:
    """Analytic 3-compartment decay over the (b, TE) grid.

    D, T2, v: (..., 3). Returns (..., len(b)*len(TE)) with the reference's
    ordering (b outer, TE inner; PIA.py:120-128).
    """
    b = jnp.asarray(b_values)[:, None]  # (B, 1)
    te = jnp.asarray(te_values)[None, :]  # (1, T)
    # (..., 3, B, T)
    decay = (
        v[..., :, None, None]
        * jnp.exp(-b / 1000.0 * D[..., :, None, None])
        * jnp.exp(-te / T2[..., :, None, None])
    )
    sig = decay.sum(axis=-3)  # (..., B, T)
    return 1000.0 * sig.reshape(sig.shape[:-2] + (-1,))


class PIA(nn.Module):
    number_of_signals: int = 16
    hidden_dims: Sequence[int] = (32, 64, 128, 256, 512)
    predictor_depth: int = 1
    D_mean: Sequence[float] = D_MEAN
    T2_mean: Sequence[float] = T2_MEAN
    D_delta: Sequence[float] = D_DELTA
    T2_delta: Sequence[float] = T2_DELTA
    b_values: Sequence[float] = B_VALUES
    TE_values: Sequence[float] = TE_VALUES
    # Documented deviation from PIA.py: the encoder input is scaled by the
    # known S0 amplitude (signal_model's 1000x factor) so activations are
    # O(1). With raw ~1000-scale signals and variance-preserving init, the
    # head logits saturate tanh/softmax at step 0 and training collapses to
    # a constant prediction (measured: v stuck at one-hot, signal RMSE 131
    # vs NLLS's 38 after 4000 Adam steps). The reference model has the same
    # scale problem under torch's default init; its training loop is not in
    # the repo. Scaling only the encoder INPUT changes no physics: the
    # decoder and losses still operate on raw-scale signals.
    input_scale: float = 1e-3

    def _head(self, x: Array, name: str) -> Array:
        for i in range(self.predictor_depth):
            x = nn.Dense(self.hidden_dims[-1], name=f"{name}_h{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return nn.Dense(3, name=f"{name}_out")(x)

    @nn.compact
    def encode(self, x: Array) -> tuple[Array, Array, Array]:
        h = x * self.input_scale
        for i, dim in enumerate(self.hidden_dims):
            h = nn.Dense(dim, name=f"enc_{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.01)
        D = jnp.asarray(self.D_mean) + jnp.asarray(self.D_delta) * jnp.tanh(
            self._head(h, "D")
        )
        T2 = jnp.asarray(self.T2_mean) + jnp.asarray(self.T2_delta) * jnp.tanh(
            self._head(h, "T2")
        )
        v = nn.softmax(self._head(h, "v"), axis=-1)
        return D, T2, v

    def decode(self, D: Array, T2: Array, v: Array) -> Array:
        return signal_model(D, T2, v, self.b_values, self.TE_values)

    def __call__(self, x: Array):
        D, T2, v = self.encode(x)
        return self.decode(D, T2, v), x, D, T2, v


def pia_loss_unsupervised(pred_signal: Array, true_signal: Array, pids: Array) -> Array:
    """PIDS-weighted MSE (PIA.py:150-153)."""
    return jnp.mean(pids * (pred_signal - true_signal) ** 2)


def pia_loss_supervised(
    pred_signal, pred_D, pred_T2, pred_v, true_signal, true_D, true_T2, true_v
) -> Array:
    """Supervised composite loss (PIA.py:139-147): MSE on signal/D/T2 +
    KL on volume fractions, with the reference's weights."""
    loss_signal = jnp.mean((pred_signal - true_signal) ** 2)
    loss_D = jnp.mean((pred_D - true_D) ** 2)
    loss_T2 = jnp.mean((pred_T2 - true_T2) ** 2)
    # torch F.kl_div(input, target) = mean(target * (log target - input))
    loss_v = jnp.mean(true_v * (jnp.log(true_v + 1e-12) - pred_v))
    return loss_signal + loss_D + 1e-4 * loss_T2 + 0.2 * loss_v


def synthetic_batch(key: jax.Array, batch_size: int = 16, noise_std=0.1):
    """Synthetic training batch (PIA.py:171-213): uniform physiological draws,
    normalised volume fractions, additive Gaussian noise on the 1000x signal.

    ``noise_std``: scalar, or an array broadcastable against the
    ``(batch_size, 16)`` signal (e.g. ``(batch_size, 1)`` per-voxel sigmas
    for noise-range training)."""
    ks = jax.random.split(key, 10)
    u = lambda k, lo, hi: jax.random.uniform(k, (batch_size,), minval=lo, maxval=hi)
    D = jnp.stack([u(ks[0], 0.3, 0.7), u(ks[1], 0.7, 1.7), u(ks[2], 2.7, 3.0)], -1)
    T2 = jnp.stack([u(ks[3], 20, 70), u(ks[4], 40, 100), u(ks[5], 500, 1000)], -1)
    v = jnp.stack([u(ks[6], 0, 1), u(ks[7], 0, 1), u(ks[8], 0, 1)], -1)
    v = v / v.sum(-1, keepdims=True)
    clean = signal_model(D, T2, v)
    noise = 1000.0 * noise_std * jax.random.normal(ks[9], clean.shape)
    return clean + noise, D, T2, v, clean
