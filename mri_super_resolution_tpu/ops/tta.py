"""Test-time augmentation ensembles for MISR prediction.

Reference: multi-image-super-resolution/utils/prediction.py:10-97 —
RAMS+ geometric self-ensemble (8 flip/rot combinations, predict, invert the
transforms, average), optional temporal-axis shuffling, and the clip/round
``predict_tensor`` wrapper.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def predict_tensor(apply_fn: Callable, x: Array) -> Array:
    """Forward + clip to [0, 2^16] + round (prediction.py:76-83)."""
    sr = apply_fn(x.astype(jnp.float32))
    return jnp.round(jnp.clip(sr, 0.0, 2.0**16))


def _flip(x: Array, do: bool) -> Array:
    return x[:, :, ::-1] if do else x


def _rot(x: Array, k: int) -> Array:
    return jnp.rot90(x, k, axes=(1, 2)) if k else x


def geometric_ensemble_predict(
    apply_fn: Callable,
    x: Array,
    shuffle_key: jax.Array | None = None,
    max_device_batch: int = 64,
) -> np.ndarray:
    """RAMS+ 8-fold flip/rotate self-ensemble (prediction.py:31-52).

    ``x``: (B, H, W, T). Each of the 8 (flip, rot) combos is predicted and
    un-transformed (inverse rotation k' = 4-k, then flip), then averaged.
    Optionally shuffles the temporal axis per variant.

    Square inputs ride one batched forward of size 8B — but only while
    8B <= ``max_device_batch``: the batched call multiplies peak activation
    memory 8x, so large serving batches that fit per-variant would OOM.
    Past the cap the per-variant loop (peak batch B, as before the batching
    change) is used instead.
    """
    variants, metas = [], []
    for f in (0, 1):
        for k in range(4):
            xa = _rot(_flip(x, bool(f)), k)
            if shuffle_key is not None:
                shuffle_key, sub = jax.random.split(shuffle_key)
                perm = jax.random.permutation(sub, xa.shape[-1])
                xa = xa[..., perm]
            variants.append(xa)
            metas.append((bool(f), k))
    if x.shape[1] == x.shape[2] and 8 * x.shape[0] <= max_device_batch:
        # square tiles (the production patch shape): all 8 variants ride ONE
        # batched forward instead of 8 launches
        srs = predict_tensor(apply_fn, jnp.concatenate(variants, axis=0))
        B = x.shape[0]
        outs = [
            _flip(_rot(srs[i * B:(i + 1) * B], (4 - k) % 4), f)
            for i, (f, k) in enumerate(metas)
        ]
    else:  # non-square (odd rotations change shape) or large batch: per variant
        outs = [
            _flip(_rot(predict_tensor(apply_fn, xa), (4 - k) % 4), f)
            for xa, (f, k) in zip(variants, metas)
        ]
    return np.mean([np.asarray(o) for o in outs], axis=0)


def temporal_permute_predict(
    apply_fn: Callable, x: Array, key: jax.Array, n_ens: int = 10
) -> np.ndarray:
    """Temporal-permutation ensemble (prediction.py:86-97): average
    predictions over ``n_ens`` shuffles of the acquisition axis."""
    outs = []
    for _ in range(n_ens):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, x.shape[-1])
        outs.append(np.asarray(predict_tensor(apply_fn, x[..., perm])))
    return np.mean(outs, axis=0)
