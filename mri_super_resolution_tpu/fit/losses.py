"""Loss functions for INR fitting."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def mse(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


def weighted_mse(pred: Array, target: Array, weights: Array) -> Array:
    """Acceptance-weighted MSE (master.py:143-145): mean of w*(y-t)^2.

    Note the reference divides by the *total* element count, not the weight
    sum — rejected pixels shrink the loss rather than renormalising it.
    Replicated exactly.
    """
    return jnp.mean(weights * (pred - target) ** 2)
