"""Hybrid multi-TE super-resolution + 3-compartment fitting — superresHybrid.

Reference: implicit-neural-representations/superresHybrid.py:25-188. Per TE:
average acquisitions per b; per-(b, TE) max-normalise; fit an FF-SIREN
(2*128 -> 512x3) to the 4-b mean ROI volume (::2 LR) for 2500 epochs;
reconstruct at 2x -> assemble the (2sx, 2sy, S, 4b, 4TE) hybrid; normalise by
the (b0, TE0) channel x 1000; per-voxel 3-compartment NLLS -> D/T2/v maps;
polyfit ADC; cancer map (v_ep > 0.4) & (v_lu <= 0.2) with small-object
removal.

TPU-native: the four per-TE fits are vmapped into one scanned program (four
independent SIRENs training simultaneously); NLLS is the vmapped LM of
ops/nlls; small-object removal is a pure-numpy connected-components pass
(scipy.ndimage replaces skimage.morphology, which is unavailable here).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mri_super_resolution_tpu.core.adc import adc_polyfit
from mri_super_resolution_tpu.core.coords import fourier_matrix, fourier_encode, mgrid
from mri_super_resolution_tpu.fit.engine import infer_dense_grid
from mri_super_resolution_tpu.models import Siren
from mri_super_resolution_tpu.ops.nlls import hybrid_fit
from mri_super_resolution_tpu.fit.optim import cached_adam, restart_adam

Array = jax.Array

EPS = 1e-7


@dataclasses.dataclass
class HybridConfig:
    number_of_epochs: int = 2500
    hidden_dim: int = 512
    num_layers: int = 3
    mapping_size: int = 128
    ff_scale: float = 0.5
    roi_start_x: int = 35
    roi_end_x: int = 95
    roi_start_y: int = 35
    roi_end_y: int = 95
    lr: float = 1e-4
    nlls_iters: int = 40
    # "siren" = the reference's FF-SIREN per TE (superresHybrid.py:58-118).
    # "grid" = the multiresolution dense-grid INR (models/grid_inr.py): all
    # four per-TE fits ride the separable tensor-product path (scatter-free,
    # all-MXU) — same trade as superres3d's --inr_model grid.
    # "grid_shared" = ONE grid INR across all four TEs: the (b, TE) pair is
    # a single 16-slot categorical embedding, so the four per-TE volumes
    # share spatial feature grids (they image the same anatomy — only the
    # contrast weighting differs) and the whole patient is one fit instead
    # of four. Beyond-reference change: the reference fits per TE
    # independently (superresHybrid.py:58-118).
    inr_model: str = "siren"
    # >0: restart_adam(lr, every) on the INR fits (fit/optim.py) — measured
    # faster time-to-PSNR AND higher final plateau than flat Adam on the
    # sibling 3-D fit (results/round3_flagship/time_to_psnr.jsonl)
    inr_restart_every: int = 0
    grid_levels: int = 4
    grid_base_resolution: int = 6
    grid_features: int = 4
    grid_hidden: int = 64
    grid_lr: float = 5e-3
    grid_z_divisor: int = 1  # ROI-cropped grids: z comparable to in-plane


def _hybrid_grid_model(cfg: HybridConfig, num_b: int = 4):
    from mri_super_resolution_tpu.models import GridINR

    return GridINR(
        num_levels=cfg.grid_levels,
        base_resolution=cfg.grid_base_resolution,
        features_per_level=cfg.grid_features,
        hidden=cfg.grid_hidden,
        z_divisor=cfg.grid_z_divisor,
        num_b=num_b,
    )


@dataclasses.dataclass
class HybridResult:
    recon_hybrid: np.ndarray  # (2sx, 2sy, S, 4, 4) de-normalised
    maxes: np.ndarray
    # phase wall-clock (seconds), device-fenced at the prep/fit/infer
    # boundaries. First call of a process includes XLA compiles; warm numbers
    # are the per-patient steady state (results/round4_hybrid/).
    timings: dict = dataclasses.field(default_factory=dict)


def mean_over_acquisitions(hybrid_raw_all_acq) -> list[list[np.ndarray]]:
    """Per (b, TE): average the acquisition axis for b > 0
    (superresHybrid.py:52-56)."""
    out = [[None] * 4 for _ in range(4)]
    for b in range(4):
        for te in range(4):
            arr = np.asarray(hybrid_raw_all_acq[b][te], dtype=np.float32)
            out[b][te] = arr.mean(-1) if (b and arr.ndim == 4) else arr
    return out


@functools.lru_cache(maxsize=32)
def _make_fit_stack(vag, model, tx, num_epochs: int):
    """Identity-stable jitted 4-TE vmapped fit program.

    Keyed on the (lru-cached, hence stable) value_and_grad callable, the
    model, the (cached) optimizer, and the epoch count — a fresh ``@jax.jit``
    closure per patient would recompile the whole scanned program every call
    (the silent multi-minute cost behind round 3's unexplained 553 s fit
    timing). ``vag`` may be None (plain XLA autodiff through model.apply)."""

    @jax.jit
    def fit_stack(params_stack, ff_fit, targets_fit):
        def one(params, target):
            def step(carry, _):
                p, o = carry
                if vag is not None:
                    loss, grads = vag(p, ff_fit, target)
                else:
                    loss, grads = jax.value_and_grad(
                        lambda q: jnp.mean((model.apply(q, ff_fit) - target) ** 2)
                    )(p)
                updates, o = tx.update(grads, o)
                return (optax.apply_updates(p, updates), o), loss

            (p, _), losses = jax.lax.scan(
                step, (params, tx.init(params)), None, length=num_epochs
            )
            return p, losses

        return jax.vmap(one)(params_stack, targets_fit)

    return fit_stack


def _fit_shared_grid(normed, maxes, cfg: HybridConfig, seed: int,
                     t0: float) -> HybridResult:
    """One grid INR over the full (x, y, z, 16) hybrid: the (b, TE) pair is
    a 16-slot embedding (b-major), so all four TE volumes share the spatial
    feature grids and the patient is ONE z-bucketed fit (inr_model
    'grid_shared'; see HybridConfig)."""
    import time

    from mri_super_resolution_tpu.models.grid_inr import (
        build_z_aux,
        infer_tensor_grid_zbucket,
        make_zbucket_value_and_grad,
        pad_target_z,
        z_bucket_for,
    )
    from mri_super_resolution_tpu.fit.engine import fit_simple

    S = normed[0][0].shape[2]
    sx = cfg.roi_end_x - cfg.roi_start_x
    sy = cfg.roi_end_y - cfg.roi_start_y
    vol16 = np.stack(
        [np.asarray(normed[b][te], dtype=np.float32)
         for b in range(4) for te in range(4)], axis=-1)  # (X, Y, S, 16)
    lr = vol16[cfg.roi_start_x : cfg.roi_end_x : 2,
               cfg.roi_start_y : cfg.roi_end_y : 2]
    lr_shape = tuple(int(s) for s in lr.shape)  # (sx', sy', S, 16)
    target = jnp.asarray(lr.reshape(-1, 1))
    jax.device_get(target[0])
    t_prep = time.perf_counter()

    model = _hybrid_grid_model(cfg, num_b=16)
    key = jax.random.key(seed)
    params = model.init(key, mgrid(lr_shape)[:8])
    z_bucket = z_bucket_for(lr_shape[2])
    vag = make_zbucket_value_and_grad(
        model, lr_shape[0], lr_shape[1], z_bucket, 16)
    z_aux = build_z_aux(model, lr_shape[2], z_bucket)
    target_p = pad_target_z(target, lr_shape, z_bucket)
    inr_lr = cfg.grid_lr
    tx = (restart_adam(inr_lr, cfg.inr_restart_every)
          if cfg.inr_restart_every else cached_adam(inr_lr))
    res = fit_simple(model.apply, tx, params, z_aux, target_p,
                     cfg.number_of_epochs, value_and_grad_fn=vag)
    jax.device_get(res.losses[-1])
    t_fit = time.perf_counter()

    test_shape = (sx * 2, sy * 2, S, 16)
    rec = infer_tensor_grid_zbucket(
        model, res.params, test_shape, clamp_min=0.0
    ).reshape(sx * 2, sy * 2, S, 4, 4)  # b-major slot order -> (b, te)
    recon_hybrid = rec * maxes[None, None, None]
    t_infer = time.perf_counter()
    timings = {
        "prep_s": t_prep - t0,
        "fit_s": t_fit - t_prep,
        "infer_s": t_infer - t_fit,
        "fit_epochs": cfg.number_of_epochs,
        "lr_voxels_per_te": int(target.shape[0]) // 4,
        "inr_model": cfg.inr_model,
        "platform": jax.devices()[0].platform,
    }
    return HybridResult(recon_hybrid.astype(np.float32), maxes, timings)


def fit_all_te(hybrid_raw, cfg: HybridConfig, seed: int = 0) -> HybridResult:
    """Fit the four per-TE volumes (vmapped) and assemble the 2x hybrid."""
    import time

    from mri_super_resolution_tpu.pipelines.superres3d import normalize_hybrid

    t0 = time.perf_counter()
    normed, maxes = normalize_hybrid(hybrid_raw)
    if cfg.inr_model == "grid_shared":
        return _fit_shared_grid(normed, maxes, cfg, seed, t0)
    S = normed[0][0].shape[2]
    sx = cfg.roi_end_x - cfg.roi_start_x
    sy = cfg.roi_end_y - cfg.roi_start_y

    # per-TE 4-b mean volumes, ROI ::2 LR
    lr_targets = []
    for te in range(4):
        vol = np.stack([normed[b][te] for b in range(4)], axis=-1)  # (X, Y, S, 4)
        lr = vol[cfg.roi_start_x : cfg.roi_end_x : 2, cfg.roi_start_y : cfg.roi_end_y : 2]
        lr_targets.append(lr.reshape(-1, 1))
    lr_shape = (sx // 2 + sx % 2, sy // 2 + sy % 2, S, 4)
    targets = jnp.asarray(np.stack(lr_targets).astype(np.float32))  # (4, P, 1)
    jax.device_get(targets[0, 0])  # fence: prep time stays in prep_s
    t_prep = time.perf_counter()

    use_grid = cfg.inr_model == "grid"
    key = jax.random.key(seed)
    kB, kI = jax.random.split(key)
    B = fourier_matrix(kB, cfg.mapping_size, 4, scale=cfg.ff_scale)
    keys = jax.random.split(kI, 4)

    vag = None
    if use_grid:
        from mri_super_resolution_tpu.models.grid_inr import (
            build_z_aux,
            make_zbucket_value_and_grad,
            pad_target_z,
            z_bucket_for,
        )

        model = _hybrid_grid_model(cfg)
        ff = mgrid(lr_shape)  # for model.init only
        # z-bucketed separable fit: one executable per slice BUCKET, shared
        # across patients with heterogeneous S (grid_inr.py rationale)
        z_bucket = z_bucket_for(lr_shape[2])
        vag = make_zbucket_value_and_grad(
            model, lr_shape[0], lr_shape[1], z_bucket, lr_shape[3]
        )
        ff_fit = build_z_aux(model, lr_shape[2], z_bucket)
        # host-side z pad of all four TE targets in one transfer
        # (pad_target_z is numpy-backed and not vmappable)
        th = np.asarray(targets).reshape(4, *lr_shape, -1)
        th = np.pad(th, ((0, 0), (0, 0), (0, 0),
                         (0, z_bucket - lr_shape[2]), (0, 0), (0, 0)))
        targets_fit = jnp.asarray(th.reshape(4, -1, 1))
    else:
        model = Siren(hidden_features=cfg.hidden_dim, hidden_layers=cfg.num_layers)
        ff = fourier_encode(mgrid(lr_shape), B)
        # the four per-TE fits ride the one-pass fused kernel on TPU
        # (vmapped), with the loop-invariant coordinate pad hoisted out of
        # the scan
        ff_fit, targets_fit = ff, targets
        if jax.devices()[0].platform == "tpu" and cfg.hidden_dim % 128 == 0:
            from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
                make_fused_value_and_grad, pad_rows_to)

            vag = make_fused_value_and_grad(model, n_rows=ff.shape[0])
            ff_fit = pad_rows_to(ff, 512)
            pad = ff_fit.shape[0] - ff.shape[0]
            targets_fit = jnp.pad(targets, ((0, 0), (0, pad), (0, 0)))

    params_stack = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[model.init(k, ff[:8]) for k in keys]
    )
    inr_lr = cfg.grid_lr if use_grid else cfg.lr
    tx = (restart_adam(inr_lr, cfg.inr_restart_every)
          if cfg.inr_restart_every else cached_adam(inr_lr))

    fit_stack = _make_fit_stack(vag, model, tx, cfg.number_of_epochs)
    fitted, losses = fit_stack(params_stack, ff_fit, targets_fit)
    # fence the scanned fits (device_get: block_until_ready is unreliable on
    # the tunnelled backend — see utils/profiling.py)
    jax.device_get(jax.tree_util.tree_leaves(fitted)[0].ravel()[0])
    t_fit = time.perf_counter()

    test_shape = (sx * 2, sy * 2, S, 4)
    recon_hybrid = np.zeros((sx * 2, sy * 2, S, 4, 4), dtype=np.float32)
    for te in range(4):
        params_te = jax.tree_util.tree_map(lambda x: x[te], fitted)
        if use_grid:
            from mri_super_resolution_tpu.models.grid_inr import (
                infer_tensor_grid_zbucket,
            )

            rec = infer_tensor_grid_zbucket(
                model, params_te, test_shape, clamp_min=0.0
            ).reshape(test_shape)
        else:
            # infer_dense_grid: coords generated in-program — one executable
            # across all four TEs AND every volume shape (fit/engine.py)
            rec = infer_dense_grid(
                model.apply, params_te, test_shape, clamp_min=0.0, fourier_B=B
            ).reshape(test_shape)
        for b in range(4):
            recon_hybrid[:, :, :, b, te] = rec[:, :, :, b] * maxes[b, te]
    t_infer = time.perf_counter()
    timings = {
        "prep_s": t_prep - t0,
        "fit_s": t_fit - t_prep,
        "infer_s": t_infer - t_fit,
        "fit_epochs": cfg.number_of_epochs,
        "lr_voxels_per_te": int(targets.shape[1]),
        "inr_model": cfg.inr_model,
        "platform": jax.devices()[0].platform,
    }
    return HybridResult(recon_hybrid, maxes, timings)


def remove_small_objects(mask: np.ndarray, min_size: int = 12) -> np.ndarray:
    """skimage.morphology.remove_small_objects equivalent (4-connectivity)."""
    from scipy import ndimage

    labeled, n = ndimage.label(mask, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
    if n == 0:
        return np.zeros_like(mask, dtype=bool)
    sizes = ndimage.sum_labels(np.ones_like(mask), labeled, index=np.arange(1, n + 1))
    keep = np.isin(labeled, np.nonzero(sizes >= min_size)[0] + 1)
    return keep


@dataclasses.dataclass
class SliceMaps:
    D: np.ndarray  # (H, W, 3)
    T2: np.ndarray
    v: np.ndarray
    adc: np.ndarray  # (H, W)
    cancer: np.ndarray  # (H, W) bool


def make_pia_fitter(params_path: str | None = None, train_steps: int = 4000,
                    seed: int = 0):
    """Amortized tissue fitter: a trained PIA encoder as a drop-in for
    :func:`hybrid_fit` in :func:`tissue_maps`.

    This is what the reference wrote PIA *for* (PIA.py:16-155 replaces the
    superresHybrid curve_fit loop); measured ~63-67x faster than the
    vmapped NLLS at production voxel counts with comparable or better
    recovery (results/round3_pia/recovery_rangetrain.json). Loads params
    from ``params_path`` (a save_pytree dir, e.g. cli/pia.py --out) or
    trains fresh on the synthetic generator with noise-range sampling.
    """
    import jax as _jax

    from ..models.pia import PIA
    from . import pia_train

    model = PIA()
    if params_path:
        from ..utils import restore_pytree

        params = restore_pytree(params_path)
    else:
        params = pia_train.train_synthetic(
            model, _jax.random.key(seed), steps=train_steps,
            noise_range=(0.01, 0.1)).params

    def fitter(signals):
        return pia_train.predict_maps(model, params, jnp.asarray(signals))

    return fitter


def tissue_maps(
    result: HybridResult, bvalues: np.ndarray, _slice: int = 9,
    nlls_iters: int = 40, fitter=None
) -> SliceMaps:
    """Per-slice 3-compartment decomposition + ADC + cancer map
    (superresHybrid.py:127-186).

    ``fitter``: optional ``(signals) -> (D, T2, v)`` replacing the NLLS
    (e.g. :func:`make_pia_fitter`); default is the projected-LM
    :func:`hybrid_fit`.
    """
    rh = result.recon_hybrid
    H, W = rh.shape[:2]
    # normalise by (b0, TE0) x 1000 (superresHybrid.py:130-133)
    norm = 1000.0 * rh / (rh[:, :, :, 0:1, 0:1] + EPS)
    signals = norm[:, :, _slice].reshape(H * W, 16)
    if fitter is None:
        D, T2, v = hybrid_fit(jnp.asarray(signals), iters=nlls_iters)
    else:
        D, T2, v = fitter(signals)
    D, T2, v = np.asarray(D), np.asarray(T2), np.asarray(v)

    adc = np.asarray(
        adc_polyfit(jnp.asarray(bvalues), jnp.asarray(rh[:, :, _slice, :, 0]))
    )
    v_ep = v[:, 0].reshape(H, W)
    v_lu = v[:, 2].reshape(H, W)
    cancer = remove_small_objects((v_ep > 0.4) & (v_lu <= 0.2), min_size=12)
    return SliceMaps(
        D.reshape(H, W, 3), T2.reshape(H, W, 3), v.reshape(H, W, 3), adc, cancer
    )
