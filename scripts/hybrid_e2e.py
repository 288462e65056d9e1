#!/usr/bin/env python
"""Hybrid driver end-to-end wall-clock (VERDICT r3 Next #1).

Runs superresHybrid's per-patient pipeline (pipelines/hybrid.py) over N
synthetic patients for both INR arms — the reference FF-SIREN config and the
grid + restart_adam arm — and records phase-fenced timings per patient. The
first patient of each arm pays the XLA compiles (fit_all_te's fit program is
now an lru-cached jitted runner, so later patients are warm); warm rows are
the steady-state per-patient cost.

Also the explain-or-eliminate evidence for round 3's unexplained
``t_inr_fit_s: 553.33`` (results/round3_pia/hybrid_ab_tissue.json): that
number was one cold compile-inclusive call of a fit program that was REBUILT
(fresh ``@jax.jit`` closure) on every fit_all_te call — the compile was paid
per patient, not amortized. This script separates compile from steady state.

Writes results/round4_hybrid/e2e.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--patients", type=int, default=3)
    p.add_argument("--epochs", type=int, default=2500)
    p.add_argument("--nlls_iters", type=int, default=40)
    p.add_argument("--arms", nargs="*", default=None,
                   help="subset of arms to run (default: all)")
    p.add_argument("--out", default="results/round4_hybrid/e2e.json")
    args = p.parse_args()

    import jax

    from mri_super_resolution_tpu.data import available_patients, load_mat
    from mri_super_resolution_tpu.data import synthetic
    from mri_super_resolution_tpu.pipelines.hybrid import (
        HybridConfig, fit_all_te, mean_over_acquisitions, tissue_maps)

    b_values = (0.0, 150.0, 1000.0, 1500.0)
    rows = available_patients()[: args.patients]
    patients = []
    for row in rows:
        pt_no = row["pt_id"].split("-")[-1]
        b0 = np.asarray(
            load_mat(
                os.path.join(
                    os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data"),
                    f"pat{pt_no}_mean_b0.mat"),
                "data_mean_b0", prefer_native=True),
            dtype=np.float32)
        patients.append((pt_no, synthetic.hybrid_from_b0(
            b0, b_values=b_values, seed=int(pt_no))))
    bv = np.asarray(b_values)

    arms = {
        "siren_reference": HybridConfig(number_of_epochs=args.epochs,
                                        nlls_iters=args.nlls_iters),
        "grid_restart": HybridConfig(number_of_epochs=args.epochs,
                                     nlls_iters=args.nlls_iters,
                                     inr_model="grid",
                                     inr_restart_every=250),
        # the fast preset's schedule (config.PRESETS): grid + restart
        # stopped at 600 epochs — past the 40 dB knee with margin
        "grid_fast_600": HybridConfig(number_of_epochs=600,
                                      nlls_iters=args.nlls_iters,
                                      inr_model="grid",
                                      inr_restart_every=250),
        # one shared grid over all 4 TEs (16-slot (b, TE) embedding):
        # the whole patient is one fit instead of four
        "grid_shared_restart": HybridConfig(number_of_epochs=args.epochs,
                                            nlls_iters=args.nlls_iters,
                                            inr_model="grid_shared",
                                            inr_restart_every=250),
    }
    if args.arms:
        arms = {k: v for k, v in arms.items() if k in args.arms}

    import jax.numpy as jnp

    from mri_super_resolution_tpu.core.metrics import masked_ssim_protocol
    from mri_super_resolution_tpu.core.normalize import max_normalize
    from mri_super_resolution_tpu.pipelines.superres3d import normalize_hybrid

    @jax.jit
    def recon_quality(recon, hr):
        """Masked SSIM + PSNR of the de-normalized recon vs the HR ROI over
        every (slice, b, te) image. recon: (2sx, 2sy, S, 4, 4) on the 2x
        super-resolved grid; hr: (sx, sy, S, 4, 4) — the full-resolution
        acquired ROI. recon[::2, ::2] lands exactly on the HR ROI grid (the
        fit only ever saw ITS ::2 decimation), so the comparison scores the
        half of the grid the fit never observed alongside the seen half."""
        recon = recon[::2, ::2]
        r = jnp.moveaxis(recon, (2, 3, 4), (0, 1, 2)).reshape(-1, *recon.shape[:2])
        h = jnp.moveaxis(hr, (2, 3, 4), (0, 1, 2)).reshape(-1, *hr.shape[:2])

        def one(ri, hi):
            hn = max_normalize(hi)
            rn = max_normalize(ri)
            mse = jnp.mean((rn - hn) ** 2)
            return (masked_ssim_protocol(hn, rn),
                    10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-30)))

        s, p = jax.vmap(one)(r, h)
        return s.mean(), p.mean()

    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0]),
           "epochs": args.epochs, "arms": {}}
    for arm, cfg in arms.items():
        rows_out = []
        for i, (pt_no, hybrid_all) in enumerate(patients):
            hybrid = mean_over_acquisitions(hybrid_all)
            res = fit_all_te(hybrid, cfg, seed=0)
            S = res.recon_hybrid.shape[2]
            # HR reference: the unstrided ROI of the de-normalized volumes
            normed, maxes = normalize_hybrid(hybrid)
            hr = np.stack(
                [np.stack([np.asarray(normed[b][te]) * maxes[b, te]
                           for te in range(4)], -1) for b in range(4)], -2
            )[cfg.roi_start_x:cfg.roi_end_x, cfg.roi_start_y:cfg.roi_end_y]
            ssim_m, psnr_m = (float(x) for x in recon_quality(
                jnp.asarray(res.recon_hybrid), jnp.asarray(hr)))
            t0 = time.perf_counter()
            maps = tissue_maps(res, bv, _slice=S // 2,
                               nlls_iters=cfg.nlls_iters)
            t_tissue = time.perf_counter() - t0
            row = dict(res.timings, pt_id=pt_no, cold=(i == 0),
                       tissue_s=round(t_tissue, 3),
                       recon_ssim_vs_hr=round(ssim_m, 5),
                       recon_psnr_vs_hr=round(psnr_m, 3),
                       cancer_frac=round(float(maps.cancer.mean()), 5))
            row["total_s"] = round(
                row["prep_s"] + row["fit_s"] + row["infer_s"] + t_tissue, 3)
            for k in ("prep_s", "fit_s", "infer_s"):
                row[k] = round(row[k], 3)
            rows_out.append(row)
            print(json.dumps(row))
        warm = [r for r in rows_out if not r["cold"]]
        summary = {}
        if warm:
            for k in ("prep_s", "fit_s", "infer_s", "tissue_s", "total_s"):
                summary[f"warm_{k}_mean"] = round(
                    float(np.mean([r[k] for r in warm])), 3)
            for k in ("recon_ssim_vs_hr", "recon_psnr_vs_hr"):
                summary[f"{k}_mean"] = round(
                    float(np.mean([r[k] for r in rows_out])), 4)
            vps = (warm[0]["lr_voxels_per_te"] * 4 * cfg.number_of_epochs
                   / summary["warm_fit_s_mean"])
            summary["warm_fit_voxel_steps_per_sec"] = round(vps)
        out["arms"][arm] = {"patients": rows_out, "summary": summary}

    out["r3_553s_explanation"] = (
        "round 3's t_inr_fit_s=553 s was ONE cold call: fit_all_te rebuilt "
        "its @jax.jit fit program per call, so the multi-minute XLA compile "
        "of the vmapped 2500-epoch scan was charged to every patient. The "
        "program is now an lru-cached runner (_make_fit_stack); the cold "
        "rows above isolate the remaining one-off compile and the warm rows "
        "are the true per-patient cost."
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
