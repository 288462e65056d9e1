"""PIA training loop: synthetic-batch pretraining + per-voxel inference.

The reference defines the PIA model, its losses, and a synthetic batch
generator (PIA.py:16-213) but ships no training driver (training lived in
notebooks). This module provides the canonical loop both supervised (on
synthetic draws with known D/T2/v) and unsupervised (PIDS-weighted signal
reconstruction on real hybrid voxels), as one jitted scan.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from mri_super_resolution_tpu.models.pia import (
    PIA,
    pia_loss_supervised,
    pia_loss_unsupervised,
    synthetic_batch,
)

Array = jax.Array


class PIATrainResult(NamedTuple):
    params: object
    losses: Array


def train_synthetic(
    model: PIA,
    key: jax.Array,
    steps: int = 2000,
    batch_size: int = 256,
    lr: float = 1e-4,
    noise_std: float = 0.1,
    supervised: bool = True,
    noise_range: tuple[float, float] | None = None,
) -> PIATrainResult:
    """Pretrain on synthetic 3-compartment draws (PIA.py:171-213 data).

    ``noise_range=(lo, hi)``: instead of the reference's fixed noise level,
    sample a per-voxel sigma log-uniformly in [lo, hi] each step. A
    fixed-noise encoder plateaus at its training-noise recovery error even
    on cleaner test signals (results/round3_pia/recovery.json); range
    training makes one amortized encoder track the NLLS accuracy curve
    across noise levels. Default None keeps the reference behavior.
    """
    kinit, kdata = jax.random.split(key)
    sample, *_ = synthetic_batch(kinit, batch_size, noise_std)
    params = model.init(kinit, sample)
    tx = optax.adam(lr)

    @jax.jit
    def run(params):
        def step(carry, k):
            params, opt_state = carry
            if noise_range is not None:
                kn, k = jax.random.split(k)
                lo, hi = noise_range
                sigma = jnp.exp(jax.random.uniform(
                    kn, (batch_size, 1),
                    minval=jnp.log(lo), maxval=jnp.log(hi)))
            else:
                sigma = noise_std
            sig, D, T2, v, clean = synthetic_batch(k, batch_size, sigma)

            def loss_fn(p):
                pred_sig, _, pD, pT2, pv = model.apply(p, sig)
                if supervised:
                    return pia_loss_supervised(pred_sig, pD, pT2, pv, clean, D, T2, v)
                return jnp.mean((pred_sig - clean) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        keys = jax.random.split(kdata, steps)
        (params, _), losses = jax.lax.scan(step, (params, tx.init(params)), keys)
        return params, losses

    params, losses = run(params)
    return PIATrainResult(params, losses)


def finetune_on_voxels(
    model: PIA,
    params,
    signals: Array,  # (N, 16) real hybrid voxel signals
    pids: Array,  # (N, 16) or (N, 1) PIDS weights
    steps: int = 500,
    lr: float = 1e-5,
) -> PIATrainResult:
    """Unsupervised PIDS-weighted fine-tune on real voxels
    (PIA.loss_function tissue_available=False branch)."""
    tx = optax.adam(lr)

    @jax.jit
    def run(params):
        def step(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                pred, _, _, _, _ = model.apply(p, signals)
                return pia_loss_unsupervised(pred, signals, pids)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params_out, _), losses = jax.lax.scan(
            step, (params, tx.init(params)), None, length=steps
        )
        return params_out, losses

    params, losses = run(params)
    return PIATrainResult(params, losses)


def predict_maps(model: PIA, params, signals: Array, batch: int = 65536):
    """Per-voxel D/T2/v maps from trained PIA (chunked)."""
    outs_D, outs_T2, outs_v = [], [], []

    @jax.jit
    def enc(x):
        return model.apply(params, x, method=model.encode)

    for i in range(0, signals.shape[0], batch):
        D, T2, v = enc(signals[i : i + batch])
        outs_D.append(D)
        outs_T2.append(T2)
        outs_v.append(v)
    return (
        jnp.concatenate(outs_D),
        jnp.concatenate(outs_T2),
        jnp.concatenate(outs_v),
    )
