#!/usr/bin/env python
"""Pipeline-level tissue-fitter A/B: NLLS vs amortized PIA on the SAME recon.

The synthetic-GT recovery study (results/round3_pia/recovery_rangetrain.json)
established PIA's parameter accuracy and ~63x throughput; this script closes
the remaining gap — evidence at the PIPELINE operating point
(superresHybrid.py:127-186): one INR hybrid reconstruction, both fitters on
the identical (H*W, 16) signal matrix, map agreement + cancer-map overlap +
PIDS physics-violation rates + wall-clock.

Usage: python scripts/hybrid_tissue_ab.py [--epochs 2500] [--slices ...]
Writes results/round3_pia/hybrid_ab.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mri_super_resolution_tpu.data import available_patients, load_mat, synthetic
from mri_super_resolution_tpu.pipelines.hybrid import (
    HybridConfig,
    fit_all_te,
    make_pia_fitter,
    mean_over_acquisitions,
    tissue_maps,
)


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    union = float(np.logical_or(a, b).sum())
    return float(np.logical_and(a, b).sum()) / union if union else 1.0


def _map_stats(name, x, y):
    """x = NLLS maps, y = PIA maps; both (H, W, 3)."""
    out = {}
    for c, comp in enumerate(("epithelium", "stroma", "lumen")):
        xc, yc = x[..., c].ravel(), y[..., c].ravel()
        corr = float(np.corrcoef(xc, yc)[0, 1])
        out[comp] = {
            "mae": float(np.mean(np.abs(xc - yc))),
            "corr": round(corr, 4),
            f"{name}_nlls_mean": round(float(xc.mean()), 4),
            f"{name}_pia_mean": round(float(yc.mean()), 4),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2500)
    ap.add_argument("--nlls_iters", type=int, default=40)
    ap.add_argument("--pia_train_steps", type=int, default=4000)
    ap.add_argument("--slices", type=int, nargs="*", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--patient_index", type=int, default=0,
                    help="index into available_patients()")
    ap.add_argument("--substrate", choices=("mono", "tissue"), default="mono",
                    help="mono: hybrid_from_b0 (3-compartment fit is "
                         "non-identifiable); tissue: hybrid_from_tissue "
                         "(in-model, GT recovery is well-posed)")
    ap.add_argument("--out", default=None,
                    help="default: results/round3_pia/hybrid_ab[_<substrate>]"
                         "[_p<idx>].json")
    args = ap.parse_args()
    if args.out is None:
        suffix = "" if args.substrate == "mono" else f"_{args.substrate}"
        pidx = "" if args.patient_index == 0 else f"_p{args.patient_index}"
        args.out = f"results/round3_pia/hybrid_ab{suffix}{pidx}.json"

    row = available_patients()[args.patient_index]
    pt_no = row["pt_id"].split("-")[-1]
    b_values = np.asarray((0.0, 150.0, 1000.0, 1500.0))
    b0 = np.asarray(
        load_mat(
            os.path.join(
                os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data"),
                f"pat{pt_no}_mean_b0.mat",
            ),
            "data_mean_b0",
            prefer_native=True,
        ),
        dtype=np.float32,
    )
    gt = None
    if args.substrate == "tissue":
        hybrid_all, gt = synthetic.hybrid_from_tissue(
            b0, b_values=tuple(b_values), seed=int(pt_no))
    else:
        hybrid_all = synthetic.hybrid_from_b0(
            b0, b_values=tuple(b_values), seed=int(pt_no))
    hybrid = mean_over_acquisitions(hybrid_all)

    cfg = HybridConfig(number_of_epochs=args.epochs, nlls_iters=args.nlls_iters)
    t0 = time.perf_counter()
    result = fit_all_te(hybrid, cfg, seed=args.seed)
    t_fit = time.perf_counter() - t0
    S = result.recon_hybrid.shape[2]
    slices = args.slices if args.slices else [S // 2]
    H, W = result.recon_hybrid.shape[:2]
    n_vox = H * W

    t0 = time.perf_counter()
    fitter = make_pia_fitter(train_steps=args.pia_train_steps, seed=args.seed)
    t_pia_train = time.perf_counter() - t0

    def _gt_on_recon_grid(field, _slice):
        """GT field (H0, W0, S, 3) -> recon grid (H, W, 3): the recon covers
        the ROI at 2x, so 2x nearest-neighbour upsampling of the ROI crop."""
        crop = field[cfg.roi_start_x:cfg.roi_end_x,
                     cfg.roi_start_y:cfg.roi_end_y, _slice]
        return np.repeat(np.repeat(crop, 2, axis=0), 2, axis=1)

    def _gt_mae(maps, _slice):
        out = {}
        for name, field in (("D", gt["D"]), ("T2", gt["T2"]), ("v", gt["v"])):
            g = _gt_on_recon_grid(field, _slice)
            m = getattr(maps, name)
            out[name] = {
                comp: round(float(np.mean(np.abs(m[..., c] - g[..., c]))), 4)
                for c, comp in enumerate(("epithelium", "stroma", "lumen"))
            }
        return out

    per_slice = []
    t_nlls_total = t_pia_total = 0.0
    for _slice in slices:
        t0 = time.perf_counter()
        m_nlls = tissue_maps(result, b_values, _slice=_slice,
                             nlls_iters=args.nlls_iters)
        t_nlls = time.perf_counter() - t0
        t0 = time.perf_counter()
        m_pia = tissue_maps(result, b_values, _slice=_slice, fitter=fitter)
        t_pia = time.perf_counter() - t0
        t_nlls_total += t_nlls
        t_pia_total += t_pia

        gt_block = {}
        if gt is not None:
            gt_block = {"gt_mae_nlls": _gt_mae(m_nlls, _slice),
                        "gt_mae_pia": _gt_mae(m_pia, _slice)}
        per_slice.append({
            "slice": _slice,
            **gt_block,
            "D_um2_per_ms": _map_stats("D", m_nlls.D, m_pia.D),
            "T2_ms": _map_stats("T2", m_nlls.T2, m_pia.T2),
            "v": _map_stats("v", m_nlls.v, m_pia.v),
            "cancer_iou": round(_iou(m_nlls.cancer, m_pia.cancer), 4),
            "cancer_frac_nlls": round(float(m_nlls.cancer.mean()), 5),
            "cancer_frac_pia": round(float(m_pia.cancer.mean()), 5),
            "t_nlls_s": round(t_nlls, 3),
            "t_pia_s": round(t_pia, 3),
        })
        print(json.dumps(per_slice[-1]))

    out = {
        "experiment": "pipeline tissue-fitter A/B on one shared INR recon "
                      "(superresHybrid.py:127-186 operating point)",
        "substrate": args.substrate,
        "patient": pt_no,
        "config": {"epochs": args.epochs, "nlls_iters": args.nlls_iters,
                   "pia_train_steps": args.pia_train_steps,
                   "recon_hw": [H, W], "voxels_per_slice": n_vox},
        "t_inr_fit_s": round(t_fit, 2),
        "t_pia_train_s": round(t_pia_train, 2),
        "t_nlls_per_slice_s": round(t_nlls_total / len(slices), 3),
        "t_pia_per_slice_s": round(t_pia_total / len(slices), 3),
        "note": ("t_pia_per_slice includes the shared adc_polyfit + morphology "
                 "in tissue_maps; the PIA train cost is one-off and amortizes "
                 "across slices/patients. Map agreement is consistency between "
                 "two estimators, not accuracy — GT accuracy is the recovery "
                 "study (recovery_rangetrain.json)."),
        "slices": per_slice,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
