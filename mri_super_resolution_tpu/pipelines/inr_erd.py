"""Soft-ERD two-phase fine-tune — the INR_ERD.py pipeline.

Reference: implicit-neural-representations/INR_ERD.py:162-303. Per seed x case:
1. Rayleigh-corrected noise level from the noise ROI (:178-181).
2. Soft-ERD weighted mean image (calc_adc_erd_single2, :126-160).
3. Phase 1: pre-train SirenERD(2 -> 128x3 + ReLU head) on that mean until
   loss < 2e-5, restarting on output collapse (:201-217); save checkpoint.
4. Soft-ERD per-acquisition weights (:222-236).
5. Phase 2: single joint step (the .py does one step; the notebook loops) —
   per-acquisition perturbed forward, acceptance-weighted MSE *summed* over
   acquisitions, two Adam optimizers (perturb branch lr 3e-4, trunk lr 1e-7).
6. Mean reconstruction over acquisitions; ADC; CNR/SNR CSV rows (:276-303).

TPU-native restructuring: phase 1 is a lax.while_loop (fit/engine.fit_until);
phase 2's per-acquisition forwards are one vmapped batch with a summed loss,
and the two-optimizer split uses optax.multi_transform over a param-label
pytree instead of two torch optimizers.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mri_super_resolution_tpu.config import INRERDConfig
from mri_super_resolution_tpu.core.adc import adc_log_ratio
from mri_super_resolution_tpu.core.coords import mgrid
from mri_super_resolution_tpu.core.metrics import cnr_snr_log10
from mri_super_resolution_tpu.core.normalize import rayleigh_noise_std
from mri_super_resolution_tpu.data import MetricsCSV, CNR_SNR_HEADER
from mri_super_resolution_tpu.fit.engine import fit_until, plain_apply_init
from mri_super_resolution_tpu.models import SirenERD
from mri_super_resolution_tpu.ops.erd import soft_erd_mean, soft_erd_weights
from mri_super_resolution_tpu.utils import save_pytree
from mri_super_resolution_tpu.fit.optim import cached_adam

Array = jax.Array


@dataclasses.dataclass
class ERDCase:
    """Case record for the big-image protocol (INR_ERD.py:69-95): separate
    per-b volumes instead of a single 4-D stack."""

    pt_id: str
    b: tuple[float, float, float, float]
    cancer_loc: tuple[int, int]
    contralateral_loc: tuple[int, int]
    noise: tuple[int, int]
    cancer_slice: int
    b0: np.ndarray  # (H, W, S)
    b3: np.ndarray  # (H, W, S, A) high-b acquisitions


def _label_params(params):
    """Label the perturb branch vs the trunk for optax.multi_transform."""

    def label(path, _):
        names = [getattr(p, "key", "") for p in path]
        return "perturb" if "perturb" in names else "net"

    return jax.tree_util.tree_map_with_path(label, params)


@dataclasses.dataclass
class ERDResult:
    mean_recon: np.ndarray
    mean_orig: np.ndarray
    adc_in: np.ndarray
    adc_out: np.ndarray
    pretrain_steps: int
    params: object


@functools.lru_cache(maxsize=None)
def _phase2_fn(model, eps: float, perturb_lr: float, net_lr: float):
    """Cached (tx, jitted step) for the two-optimizer phase-2 fine-tune —
    one compile per config; fresh @jax.jit closures would recompile per
    case (minutes apiece on tunnelled-compile environments)."""
    tx = optax.multi_transform(
        {"perturb": optax.adam(perturb_lr), "net": optax.adam(net_lr)},
        _label_params,
    )

    @jax.jit
    def phase2_step(params, opt_state, coords, acq_ids, acq_targets,
                    acq_weights):
        def loss_fn(p):
            def per_acq(i, t, w):
                out = model.apply(p, coords, sample=i, eps=eps)
                return jnp.mean(w * (out - t) ** 2)

            return jnp.sum(jax.vmap(per_acq)(acq_ids, acq_targets, acq_weights))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    return tx, phase2_step


@functools.lru_cache(maxsize=None)
def _finetune_scan_fn(model, steps: int, eps: float, perturb_lr: float,
                      net_lr: float):
    """Cached jitted scan version of the phase-2 fine-tune (whole loop in
    one executable; used by the lowres-qual and qual-study pipelines)."""
    tx = optax.multi_transform(
        {"perturb": optax.adam(perturb_lr), "net": optax.adam(net_lr)},
        _label_params,
    )

    @jax.jit
    def fine_tune(params, coords, acq_ids, acq_targets, acq_weights):
        opt_state = tx.init(params)

        def step(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                def per_acq(i, t, w):
                    out = model.apply(p, coords, sample=i, eps=eps)
                    return jnp.mean(w * (out - t) ** 2)

                return jnp.sum(jax.vmap(per_acq)(acq_ids, acq_targets, acq_weights))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), None, length=steps)
        return params, losses

    return fine_tune


@functools.lru_cache(maxsize=None)
def _recon_mean_fn(model, eps: float):
    @jax.jit
    def recon(params, coords, acq_ids):
        def one(i):
            return model.apply(params, coords, sample=i, eps=eps)

        return jax.vmap(one)(acq_ids).mean(0)

    return recon


def run_case(
    case: ERDCase,
    cfg: INRERDConfig,
    seed: int,
    models_dir: str | None = None,
    csv: MetricsCSV | None = None,
    phase2_steps: int = 1,
) -> ERDResult:
    _slice = case.cancer_slice
    b = case.b[3]
    H, W = case.b0.shape[:2]
    A = case.b3.shape[3]
    dwi = case.b3[:, :, _slice, :]  # (H, W, A)
    b0 = case.b0[:, :, _slice]

    nx, ny = case.noise
    noise_roi = case.b3[nx - 3 : nx + 2, ny - 3 : ny + 2, _slice]
    noise_level = rayleigh_noise_std(jnp.asarray(noise_roi))

    # soft-ERD mean image — the phase-1 target, kept in [0, 1] space (see
    # the deviation note below: the ReLU head cannot emit the negatives of
    # the reference's Normalize(0.5,0.5) space)
    erd_mean = np.asarray(
        soft_erd_mean(jnp.asarray(dwi), jnp.asarray(b0), noise_level,
                      mul=cfg.soft_erd_mul, slope=cfg.soft_erd_slope)
    )

    coords = mgrid((H, W))
    # [0, 1]-space target (not Normalize(0.5, 0.5)): the ReLU output head
    # cannot emit negatives, so on unit-scale volumes the normalized
    # background would sit below the representable range and the
    # loss-threshold while-loop could never fire (see lowres_qual.py note).
    target = jnp.asarray(erd_mean.reshape(-1, 1))

    model = SirenERD(
        hidden_features=cfg.hidden_features,
        hidden_layers=cfg.hidden_layers,
        perturb=True,
    )

    # phase 1: trunk-only training (perturb off via eps=0, sample=0);
    # on TPU the one-pass fused kernel also carries the collapse signal
    # (~5x faster per step than the XLA autodiff path at this config).
    # plain_apply_init returns identity-stable callables so fit_until's jit
    # cache hits across cases instead of recompiling per call.
    from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
        tpu_value_grad_absmax)

    vag_absmax = tpu_value_grad_absmax(model)
    apply_plain, init_fn = plain_apply_init(model)
    params, steps, loss = fit_until(
        apply_plain,
        cached_adam(cfg.pretrain_lr),
        init_fn,
        jax.random.key(seed),
        coords,
        target,
        loss_threshold=cfg.loss_threshold,
        max_steps=100_000,
        value_grad_absmax_fn=vag_absmax,
    )
    if models_dir:
        save_pytree(os.path.join(models_dir, case.pt_id), params)

    # phase 2: joint perturbed fine-tune with two learning rates
    weights = np.asarray(
        soft_erd_weights(jnp.asarray(dwi), jnp.asarray(b0), noise_level,
                         mul=cfg.soft_erd_mul, slope=cfg.soft_erd_slope)
    )
    acq_targets = jnp.asarray(np.moveaxis(dwi, -1, 0).reshape(A, -1, 1))
    acq_weights = jnp.asarray(np.moveaxis(weights, -1, 0).reshape(A, -1, 1))
    acq_ids = jnp.arange(A, dtype=jnp.float32)

    tx, phase2_step = _phase2_fn(
        model, float(cfg.perturb_eps), float(cfg.perturb_lr), float(cfg.net_lr))
    opt_state = tx.init(params)
    for _ in range(phase2_steps):
        params, opt_state, _ = phase2_step(
            params, opt_state, coords, acq_ids, acq_targets, acq_weights)

    # mean reconstruction over acquisitions (INR_ERD.py:276-282)
    mean_recon = np.asarray(
        _recon_mean_fn(model, float(cfg.perturb_eps))(params, coords, acq_ids)
    ).reshape(H, W)
    mean_orig = dwi.mean(-1)

    adc_in = np.asarray(adc_log_ratio(jnp.asarray(mean_orig), jnp.asarray(b0), b))
    adc_out = np.asarray(adc_log_ratio(jnp.asarray(mean_recon), jnp.asarray(b0), b))

    if models_dir:
        save_pytree(os.path.join(models_dir, f"{case.pt_id}_{seed}"), params)

    if csv is not None:
        rows = [
            (mean_orig, "DWI", "orig"),
            (mean_recon, "DWI", "recon"),
            (adc_in, "ADC", "orig"),
            (adc_out, "ADC", "recon"),
        ]
        for img, kind, phase in rows:
            m = cnr_snr_log10(
                jnp.asarray(img), case.cancer_loc, case.contralateral_loc, case.noise
            )
            csv.append(
                seed,
                round(float(m.log10_SNRc), 3),
                round(float(m.log10_CNR), 3),
                round(float(m.Sc), 3),
                round(float(m.Sb), 3),
                round(float(m.CR), 3),
                case.pt_id,
                kind,
                phase,
            )

    return ERDResult(mean_recon, mean_orig, adc_in, adc_out, int(steps), params)


def run(cases: Sequence[ERDCase], cfg: INRERDConfig, out_csv: str, models_dir: str | None = None) -> str:
    csv = MetricsCSV(out_csv, CNR_SNR_HEADER)
    for seed in range(cfg.seeds):
        for case in cases:
            print(f"seed {seed} case {case.pt_id}")
            run_case(case, cfg, seed, models_dir=models_dir, csv=csv)
    return csv.path
