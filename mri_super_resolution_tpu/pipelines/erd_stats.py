"""ERD-only statistics study — the david.py pipeline (no INR).

Reference: implicit-neural-representations/david.py:31-95. Per case: AutoERD
acceptance over the full 128x128 cancer slice (the reference's majority-vote
clustering, run pixel-by-pixel with sklearn — here the vectorised exact op);
per direction: per-acquisition and mean / ERD-mean contrast metrics for DWI
and ADC -> CSV with schema
``patient,image,direction,acquisition,metric,performance``.
"""
from __future__ import annotations

import os
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from mri_super_resolution_tpu.core.adc import adc_log_ratio
from mri_super_resolution_tpu.core.metrics import contrast_cnr
from mri_super_resolution_tpu.data import Case, MetricsCSV
from mri_super_resolution_tpu.ops.erd import auto_erd

EPS = 1e-7
METRICS = ("C", "CNR")
HEADER = ("patient", "image", "direction", "acquisition", "metric", "performance")


def _write_metrics(csv, case, pt_no, image_name, direction, acq, img):
    m = contrast_cnr(
        jnp.asarray(img), case.cancer_loc, case.contralateral_loc, case.noise,
        scale=1, focus=0,
    )
    for name, value in zip(METRICS, (m.C, m.CNR)):
        csv.append(pt_no, image_name, direction, acq, name, float(value))


def run(cases: Sequence[Case], out_folder: str, experiment_name: str = "david") -> str:
    os.makedirs(out_folder, exist_ok=True)
    csv = MetricsCSV(os.path.join(out_folder, experiment_name + ".csv"), HEADER)
    directions = ["x", "y", "z"]
    for case in cases:
        pt_no = case.pt_no
        _slice = case.cancer_slice
        img_all = case.dwi[:, :, _slice, :]
        accept = np.asarray(auto_erd(jnp.asarray(img_all), mode=1)).astype(np.float32)
        case.accept[:, :, _slice, :] = accept
        b0 = case.b0[:, :, _slice]
        b = case.b

        ends = np.cumsum(case.acquisitions)
        starts = ends - np.asarray(case.acquisitions)
        for d in range(len(case.acquisitions)):
            imgs = img_all[:, :, starts[d] : ends[d]]
            acc = accept[:, :, starts[d] : ends[d]]
            for local_a, acq in enumerate(range(starts[d], ends[d])):
                img = imgs[:, :, local_a]
                adc_img = np.asarray(
                    adc_log_ratio(jnp.asarray(img), jnp.asarray(b0), b, mag=1000.0)
                )
                _write_metrics(csv, case, pt_no, "DWI", directions[d], acq, img)
                _write_metrics(csv, case, pt_no, "ADC", directions[d], acq, adc_img)

            direction_mean = imgs.mean(-1)
            accepted_mean = (imgs * acc).sum(-1) / (acc.sum(-1) + EPS)
            dm_adc = np.asarray(adc_log_ratio(jnp.asarray(direction_mean), jnp.asarray(b0), b, mag=1000.0))
            am_adc = np.asarray(adc_log_ratio(jnp.asarray(accepted_mean), jnp.asarray(b0), b, mag=1000.0))
            _write_metrics(csv, case, pt_no, "DWI", directions[d], "mean", direction_mean)
            _write_metrics(csv, case, pt_no, "ADC", directions[d], "mean", dm_adc)
            _write_metrics(csv, case, pt_no, "DWI_ERD", directions[d], "mean", accepted_mean)
            _write_metrics(csv, case, pt_no, "ADC_ERD", directions[d], "mean", am_adc)
    return csv.path
