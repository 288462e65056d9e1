"""Blinded qualitative-study panel preparation + perceptual scoring.

Reference: implicit-neural-representations/prepare_qual_images.py:139-301 and
perceptual_similarity_tests/perceptual_similarity.m.

Per case x slice:
1. Down-sample the acquisition mean to half resolution (the synthetic "low"
   arm), fit a SirenERD to it until loss < 2e-5 (restart-on-collapse).
2. Soft-ERD weights on half-res acquisitions; 500 joint fine-tune steps with
   two optimizers (perturb lr 1e-5, trunk lr 1e-7).
3. Reconstruct at full resolution via the perturb-averaged INR (the "SR" arm).
4. ADC maps for low / interpolated(2x spline) / SR / full-res-mean ("base").
5. Emit a blinded 2x4 panel PNG with randomly shuffled column order and a
   labels.csv row mapping columns to arms.

``score_labels`` then replaces the MATLAB analysis: it re-reads the labelled
arms and computes SSIM/MSE/MS-SSIM/FSIM/SR-SIM (raw + HPF) per panel.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mri_super_resolution_tpu.config import INRERDConfig
from mri_super_resolution_tpu.core.adc import adc_log_ratio
from mri_super_resolution_tpu.core.coords import mgrid
from mri_super_resolution_tpu.core.interp import rescale
from mri_super_resolution_tpu.core.normalize import rayleigh_noise_std
from mri_super_resolution_tpu.data import MetricsCSV
from mri_super_resolution_tpu.fit.engine import fit_until, plain_apply_init
from mri_super_resolution_tpu.models import SirenERD
from mri_super_resolution_tpu.ops.erd import soft_erd_weights
from mri_super_resolution_tpu.ops.perceptual import score_panel
from mri_super_resolution_tpu.pipelines.inr_erd import (
    ERDCase, _finetune_scan_fn, _label_params, _recon_mean_fn)
from mri_super_resolution_tpu.fit.optim import cached_adam

ARMS = ("low", "interpolated", "SR", "base")


@dataclasses.dataclass
class QualPanel:
    low: np.ndarray
    interpolated: np.ndarray
    sr: np.ndarray
    base: np.ndarray
    adc_low: np.ndarray
    adc_interpolated: np.ndarray
    adc_sr: np.ndarray
    adc_base: np.ndarray
    order: tuple  # shuffled column -> arm name


def build_panel(
    case: ERDCase, _slice: int, cfg: INRERDConfig | None = None, seed: int = 0,
    fine_tune_steps: int = 500,
) -> QualPanel:
    cfg = cfg or INRERDConfig()
    rng = np.random.default_rng(seed)
    b = case.b[3]
    b0 = case.b0[:, :, _slice]
    dwi = case.b3[:, :, _slice, :]
    H, W = dwi.shape[:2]
    A = dwi.shape[-1]

    base = dwi.mean(-1)
    img_low = np.asarray(rescale(jnp.asarray(base), 0.5, anti_aliasing=True))
    h, w = img_low.shape
    b0_low = np.asarray(rescale(jnp.asarray(b0), 0.5, anti_aliasing=True))

    coords = mgrid((h, w))
    # [0, 1]-space target, NOT Normalize(0.5, 0.5): the SirenERD output head
    # is ReLU'd, so on unit-scale volumes the normalized ~-1 background is
    # unrepresentable — the loss<2e-5 while-loop would burn max_steps and the
    # SR arm's background would render mid-gray, unblinding the panels (same
    # deviation as inr_erd.py / lowres_qual.py, documented there).
    target = jnp.asarray(img_low.reshape(-1, 1))
    model = SirenERD(
        hidden_features=cfg.hidden_features, hidden_layers=cfg.hidden_layers,
        perturb=True,
    )

    apply_plain, init_fn = plain_apply_init(model)
    from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
        tpu_value_grad_absmax)

    params, _, _ = fit_until(
        apply_plain, cached_adam(cfg.pretrain_lr), init_fn,
        jax.random.key(seed), coords, target,
        loss_threshold=cfg.loss_threshold, max_steps=100_000,
        value_grad_absmax_fn=tpu_value_grad_absmax(model),
    )

    # soft-ERD weights on half-res acquisitions (prepare_qual_images.py:205-219)
    # — noise ROI from the slice being processed, like lowres_qual.run_slice
    nx, ny = case.noise
    noise_level = rayleigh_noise_std(
        jnp.asarray(case.b3[nx - 3 : nx + 2, ny - 3 : ny + 2, _slice])
    )
    low_acqs = np.stack(
        [np.asarray(rescale(jnp.asarray(dwi[..., i]), 0.5, anti_aliasing=True)) for i in range(A)],
        axis=-1,
    )
    weights = np.asarray(
        soft_erd_weights(jnp.asarray(low_acqs), jnp.asarray(b0_low), noise_level,
                         mul=cfg.soft_erd_mul, slope=cfg.soft_erd_slope)
    )

    acq_targets = jnp.asarray(np.moveaxis(low_acqs, -1, 0).reshape(A, -1, 1))
    acq_weights = jnp.asarray(np.moveaxis(weights, -1, 0).reshape(A, -1, 1))
    acq_ids = jnp.arange(A, dtype=jnp.float32)

    fine_tune = _finetune_scan_fn(model, fine_tune_steps,
                                  float(cfg.perturb_eps), 1e-5, 1e-7)
    params, _ = fine_tune(params, coords, acq_ids, acq_targets, acq_weights)

    # full-res reconstruction, perturb-averaged (prepare_qual_images.py:268-275)
    big_coords = mgrid((H, W))
    recon_big = _recon_mean_fn(model, float(cfg.perturb_eps))
    sr = np.asarray(
        recon_big(params, big_coords, acq_ids)).reshape(H, W)

    interpolated = np.asarray(rescale(jnp.asarray(img_low), 2, anti_aliasing=True))
    b0_up = np.asarray(rescale(jnp.asarray(b0_low), 2, anti_aliasing=True))

    calc = lambda img, bb: np.asarray(adc_log_ratio(jnp.asarray(img), jnp.asarray(bb), b, mag=1000.0))
    panel = QualPanel(
        low=img_low,
        interpolated=interpolated,
        sr=sr,
        base=base,
        adc_low=calc(img_low, b0_low),
        adc_interpolated=calc(interpolated, b0_up),
        adc_sr=calc(sr, b0_up),
        adc_base=calc(base, b0),
        order=tuple(rng.permutation(ARMS)),
    )
    return panel


def save_panel(panel: QualPanel, path: str, roi=(35, 95)) -> dict:
    """Write the blinded 2x4 PNG; returns the labels.csv row dict."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arm_imgs = {
        "low": (panel.low, panel.adc_low),
        "interpolated": (panel.interpolated, panel.adc_interpolated),
        "SR": (panel.sr, panel.adc_sr),
        "base": (panel.base, panel.adc_base),
    }
    r0, r1 = roi
    fig, axes = plt.subplots(2, 4, figsize=(24, 12))
    row = {}
    for col, arm in enumerate(panel.order):
        img, adc = arm_imgs[arm]
        crop = (slice(r0 // 2, r1 // 2) if img.shape[0] < 128 else slice(r0, r1))
        axes[0][col].imshow(img, cmap="gray")
        axes[1][col].imshow(adc[crop, crop], cmap="gray", vmin=0, vmax=3)
        axes[0][col].axis("off")
        axes[1][col].axis("off")
        row[str(col + 1)] = arm
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    return row


def run(
    cases: Sequence[ERDCase],
    out_dir: str = "qual",
    slices_per_case: int | None = None,
    seed: int = 0,
    start_counter: int = 291,
    fine_tune_steps: int = 500,
) -> str:
    """Full prep driver: panels + labels.csv (prepare_qual_images.py:139-301)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    csv = MetricsCSV(
        os.path.join(out_dir, "labels.csv"),
        ("file", "pt", "image", "1", "2", "3", "4"),
    )
    counter = start_counter
    panels = {}
    for case in cases:
        S = case.b3.shape[2]
        chosen = rng.permutation(S)[: slices_per_case or S]
        for _slice in chosen:
            panel = build_panel(case, int(_slice), seed=counter, fine_tune_steps=fine_tune_steps)
            row = save_panel(panel, os.path.join(out_dir, f"{counter}.png"))
            csv.append(counter, case.pt_id, int(_slice), row["1"], row["2"], row["3"], row["4"])
            panels[counter] = panel
            counter += 1
    return csv.path


def score_panels(panels: dict[int, QualPanel], out_csv: str) -> str:
    """Perceptual scoring of prepared panels — the perceptual_similarity.m
    analysis with the MATLAB metrics replaced by ops/perceptual."""
    csv = None
    for counter, panel in sorted(panels.items()):
        scores = score_panel(
            HR=panel.base * 255.0 / (panel.base.max() + 1e-7),
            interp=panel.interpolated * 255.0 / (panel.base.max() + 1e-7),
            SR=panel.sr * 255.0 / (panel.base.max() + 1e-7),
        )
        if csv is None:
            csv = MetricsCSV(out_csv, ("file",) + tuple(scores.keys()))
        csv.append(counter, *[round(v, 5) for v in scores.values()])
    if csv is None:
        # no panels: emit the SAME header schema a populated run would
        # (consumers discover columns from the header / concatenate files)
        keys = tuple(score_panel(HR=np.ones((8, 8)), interp=np.ones((8, 8)),
                                 SR=np.ones((8, 8))).keys())
        MetricsCSV(out_csv, ("file",) + keys)
    return out_csv
