"""2-D directional ensemble super-resolution — the master.py pipeline.

Reference: implicit-neural-representations/master.py:54-263. Per seed x case:
optional AutoERD acceptance mask; per gradient direction (x, y, z): build the
per-acquisition dataset from the cancer slice ROI, fit a Siren(2 -> 64x6) with
acceptance-weighted MSE for ``total_steps`` Adam steps, ensemble-average the
last ``seg`` steps' dense-grid predictions at 1x and scale-x; normalise; ADC
(log-ratio); contrast metrics -> CSV; across-direction means -> DICOM.

TPU-native restructuring:
- The three directions are *vmapped into one fit*: per-direction acquisition
  stacks are padded to a common length with zero weights, a (3, ...) parameter
  stack trains under one jitted scan — 3x fewer launches, one compile.
- The ensemble tail accumulates inside the scan carry (no per-step device ->
  host copies, unlike master.py:149-160).
- The per-pixel sklearn clustering of AutoERD runs as a single vectorised op.

Deliberate deviation (documented): the reference's across-direction
accumulation block (master.py:197-223) doubles the *last* direction's images
instead of summing the three directions (``orig += orig`` after reassignment),
so its "direction-mean" DICOMs are (2/3) x the z-direction image. We compute
the actual mean over directions. Per-direction metric rows are unaffected
(written before the block), but the reference's direction='mean' CSV rows
(master.py:249-263) derive from the corrupted images — those rows will NOT
match this port row-for-row; the difference is this documented deviation,
not a port bug.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mri_super_resolution_tpu.config import Master2DConfig
from mri_super_resolution_tpu.core import adc as adc_lib
from mri_super_resolution_tpu.core import metrics as metrics_lib
from mri_super_resolution_tpu.core.coords import mgrid
from mri_super_resolution_tpu.core.interp import rescale
from mri_super_resolution_tpu.core.normalize import to_tensor_normalize
from mri_super_resolution_tpu.data import Case, MetricsCSV, CONTRAST_HEADER, save_dicom
from mri_super_resolution_tpu.fit.engine import fit_ensemble
from mri_super_resolution_tpu.models import Siren
from mri_super_resolution_tpu.ops.erd import auto_erd
from mri_super_resolution_tpu.fit.optim import cached_adam

Array = jax.Array

METRIC_NAMES = ("C", "CNR", "CNR2")
EPS = 1e-7
MAG = 1000.0


@dataclasses.dataclass
class DirectionOutputs:
    """Per-direction images keyed like the reference's ``images`` dict
    (master.py:180-188)."""

    mean: np.ndarray
    erd: np.ndarray
    superres: np.ndarray
    superres_n: np.ndarray
    large: np.ndarray
    large_n: np.ndarray
    adc_orig: np.ndarray
    adc_erd: np.ndarray
    adc_super: np.ndarray
    adc_super_norm: np.ndarray
    adc_large: np.ndarray
    adc_large_norm: np.ndarray

    def metric_images(self) -> dict[str, np.ndarray]:
        return {
            "mean": self.mean,
            "ERD": self.erd,
            "superres": self.superres,
            "superres_n": self.superres_n,
            "ADC_orig": self.adc_orig,
            "ADC_ERD": self.adc_erd,
            "ADC_super": self.adc_super,
            "ADC_super_norm": self.adc_super_norm,
        }


def _direction_slices(acquisitions: Sequence[int]) -> list[tuple[int, int]]:
    ends = np.cumsum(acquisitions)
    starts = ends - np.asarray(acquisitions)
    return [(int(s), int(e)) for s, e in zip(starts, ends)]


def fit_directions(
    roi_dwi: np.ndarray,  # (H, W, A_total) ROI crop of the cancer slice
    accept: np.ndarray,  # (H, W, A_total) acceptance mask
    acquisitions: Sequence[int],
    cfg: Master2DConfig,
    seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit all gradient directions in one vmapped ensemble fit.

    Returns (pred_1x [D, H, W], pred_scale [D, H*s, W*s]) ensemble means in
    Normalize(0.5, 0.5) space.

    Directions with fewer acquisitions than the max are padded with
    zero-weight slots so the vmap shapes match; the per-slot validity mask
    makes padded slots leave params AND optimizer state untouched, so
    unequal acquisition counts match the reference's per-direction loop
    exactly (Adam update counts included).
    """
    H, W, _ = roi_dwi.shape
    D = len(acquisitions)
    A_max = max(acquisitions)
    P = H * W

    pixels = np.zeros((D, A_max, P, 1), dtype=np.float32)
    weights = np.zeros((D, A_max, P, 1), dtype=np.float32)
    for d, (s, e) in enumerate(_direction_slices(acquisitions)):
        for i, a in enumerate(range(s, e)):
            pixels[d, i, :, 0] = to_tensor_normalize(roi_dwi[:, :, a]).reshape(-1)
            weights[d, i, :, 0] = accept[:, :, a].reshape(-1)

    coords = mgrid((H, W))
    coords_s = mgrid((H * cfg.scale, W * cfg.scale))
    model = Siren(
        hidden_features=cfg.hidden_features,
        hidden_layers=cfg.hidden_layers,
        out_features=1,
    )
    keys = jax.random.split(jax.random.key(seed), D)
    params_stack = jax.vmap(lambda k: model.init(k, coords[:4]))(keys)
    tx = cached_adam(cfg.learning_rate)

    valid = np.zeros((D, A_max), dtype=bool)
    for d, n in enumerate(acquisitions):
        valid[d, :n] = True

    # the per-acquisition updates ride the one-pass fused kernel on TPU
    # (64-wide hidden dims are zero-padded to the 128-lane width, exactly);
    # the ensemble-tail dense evaluations stay on apply_fn
    wvag = None
    if (cfg.use_pallas and jax.devices()[0].platform == "tpu"
            and float(model.first_omega_0) == float(model.hidden_omega_0)):
        from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
            make_fused_weighted_value_and_grad)

        wvag = make_fused_weighted_value_and_grad(model)

    def one_direction(params, pix, w, ok):
        return fit_ensemble(
            model.apply, tx, params, coords, pix, w, coords, coords_s,
            total_steps=cfg.total_steps, seg=cfg.seg, valid=ok,
            weighted_value_and_grad_fn=wvag,
        )

    res = jax.vmap(one_direction)(
        params_stack, jnp.asarray(pixels), jnp.asarray(weights), jnp.asarray(valid)
    )
    pred_1x = np.asarray(res.pred_1x).reshape(D, H, W)
    pred_s = np.asarray(res.pred_scale).reshape(D, H * cfg.scale, W * cfg.scale)
    return pred_1x, pred_s


def run_case(
    case: Case,
    cfg: Master2DConfig,
    seed: int,
    csv: MetricsCSV | None = None,
) -> dict[str, DirectionOutputs]:
    """Run one case for one seed; returns per-direction outputs ('x','y','z')
    plus writes metric rows / DICOMs like the reference driver."""
    r0, r1 = cfg.roi_begin, cfg.roi_end
    _slice = case.cancer_slice
    b0 = case.b0[r0:r1, r0:r1, _slice]
    roi_dwi = case.dwi[r0:r1, r0:r1, _slice, :]
    accept = case.accept[r0:r1, r0:r1, _slice, :].astype(np.float32)

    if cfg.erd:
        erd_map = case.erd[r0:r1, r0:r1, _slice] if cfg.erd == 2 else None
        accept = np.asarray(
            auto_erd(jnp.asarray(roi_dwi), None if erd_map is None else jnp.asarray(erd_map), mode=cfg.erd)
        ).astype(np.float32)
        case.accept[r0:r1, r0:r1, _slice, :] = accept

    pred_1x, pred_s = fit_directions(roi_dwi, accept, case.acquisitions, cfg, seed)

    directions = ["x", "y", "z"]
    outputs: dict[str, DirectionOutputs] = {}
    b0_scaled = np.asarray(rescale(jnp.asarray(b0), cfg.scale))

    for d, name in enumerate(directions[: len(case.acquisitions)]):
        s, e = _direction_slices(case.acquisitions)[d]
        imgs = roi_dwi[:, :, s:e]
        acc = accept[:, :, s:e]
        direction_mean = imgs.mean(-1)
        accepted_mean = (imgs * acc).sum(-1) / (acc.sum(-1) + EPS)

        out_img = pred_1x[d] - pred_1x[d].min()
        large_out = pred_s[d] - pred_s[d].min()
        norm_out = np.asarray(metrics_lib.minmax_normalize(jnp.asarray(out_img), jnp.asarray(direction_mean)))
        norm_large = np.asarray(metrics_lib.minmax_normalize(jnp.asarray(large_out), jnp.asarray(direction_mean)))

        calc = lambda img, bb: np.asarray(
            adc_lib.adc_log_ratio(jnp.asarray(img), jnp.asarray(bb), case.b, mag=MAG * MAG)
        )
        out = DirectionOutputs(
            mean=direction_mean,
            erd=accepted_mean,
            superres=out_img,
            superres_n=norm_out,
            large=large_out,
            large_n=norm_large,
            adc_orig=calc(direction_mean, b0),
            adc_erd=calc(accepted_mean, b0),
            adc_super=calc(out_img, b0),
            adc_super_norm=calc(norm_out, b0),
            adc_large=calc(large_out, b0_scaled),
            adc_large_norm=calc(norm_large, b0_scaled),
        )
        outputs[name] = out

        if csv is not None:
            for img_name, img in out.metric_images().items():
                m = metrics_lib.contrast_cnr(
                    jnp.asarray(img), case.cancer_loc, case.contralateral_loc,
                    case.noise, scale=1, focus=cfg.roi_begin,
                )
                for metric_name, value in zip(METRIC_NAMES, m):
                    csv.append(seed, case.pt_no, name, img_name, metric_name, float(value))

    return outputs


def save_case_outputs(
    outputs: dict[str, DirectionOutputs],
    case: Case,
    cfg: Master2DConfig,
    seed: int,
    csv: MetricsCSV | None = None,
) -> None:
    """Across-direction means -> DICOM files + 'mean' CSV rows
    (master.py:212-262; with the corrected direction averaging, see module
    docstring)."""
    fields = [f.name for f in dataclasses.fields(DirectionOutputs)]
    mean = DirectionOutputs(
        **{
            f: np.mean([getattr(o, f) for o in outputs.values()], axis=0)
            for f in fields
        }
    )
    base = os.path.join(cfg.out_img_folder, cfg.exp_name, case.pt_no)
    dwi_files = {
        "mean.dcm": mean.mean * MAG,
        "erd.dcm": mean.erd * MAG,
        "super.dcm": mean.large * MAG,
        "super_norm.dcm": mean.large_n * MAG,
    }
    adc_files = {
        "mean.dcm": mean.adc_orig,
        "erd.dcm": mean.adc_erd,
        "super.dcm": mean.adc_super,
        "large.dcm": mean.adc_large,
        "norm_super.dcm": mean.adc_super_norm,
        "norm_super_large.dcm": mean.adc_large_norm,
    }
    for fname, img in dwi_files.items():
        save_dicom(img, os.path.join(base, "DWI", fname))
    for fname, img in adc_files.items():
        save_dicom(img, os.path.join(base, "ADC", fname))

    if csv is not None:
        for img_name, img in mean.metric_images().items():
            m = metrics_lib.contrast_cnr(
                jnp.asarray(img), case.cancer_loc, case.contralateral_loc,
                case.noise, scale=1, focus=cfg.roi_begin,
            )
            for metric_name, value in zip(METRIC_NAMES, m):
                csv.append(seed, case.pt_no, "mean", img_name, metric_name, float(value))


def run(cfg: Master2DConfig, cases: list[Case]) -> str:
    """Full driver loop (master.py main): seeds x cases. Returns CSV path."""
    os.makedirs(cfg.out_folder, exist_ok=True)
    csv = MetricsCSV(os.path.join(cfg.out_folder, cfg.exp_name + ".csv"), CONTRAST_HEADER)
    for seed in range(cfg.repeat_time):
        for case in cases:
            print(f"seed {seed} case {case.pt_id}")
            outputs = run_case(case, cfg, seed, csv)
            save_case_outputs(outputs, case, cfg, seed, csv)
    return csv.path
