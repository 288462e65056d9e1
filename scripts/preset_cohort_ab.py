#!/usr/bin/env python
"""10-patient cohort A/B: --preset quality vs --preset reference under the
split-acquisition protocol (VERDICT r3 Next #2).

Protocol (the confound-free form established in round 3,
results/round3_lowres_split/): per patient, synthesize 2x the acquisitions,
give each arm only the INPUT half, and score masked SSIM against the mean of
the HELD-OUT half — ground-truth noise is independent of both arms, so
neither the spline nor the SR arm can get credit for reproducing noise. The
b=0 channel has a single shared volume (no acquisition axis to split,
superresDWI.py:52-55), so scoring covers b1..b3.

Arms are exactly what the presets select (config.PRESETS): reference =
FF-SIREN 2500 epochs flat Adam; quality = grid INR (z_divisor 1, lr 5e-3) +
restart_adam(250). Same seeds, same input data.

Writes results/round4_presets/cohort_ab.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patients", type=int, default=10)
    ap.add_argument("--acq_per_half", type=int, default=3,
                    help="acquisitions per b given to the arms (input half)")
    ap.add_argument("--acq_heldout", type=int, default=None,
                    help="held-out acquisitions per b forming the GT mean "
                    "(default: same as input). A noisy GT (few held-out "
                    "acquisitions) biases masked SSIM toward arms whose "
                    "local variance matches the GT noise — i.e. AGAINST "
                    "smooth reconstructions; use e.g. 9 for a low-noise GT")
    ap.add_argument("--wire", action="store_true",
                    help="add a WIRE arm (superres_dwi --inr_model wire) to "
                         "the same paired protocol")
    ap.add_argument("--wire_trainable", action="store_true",
                    help="the WIRE arm trains per-layer omega/sigma (the "
                    "round-5 sweep's best config: +6.7 dB on the flagship "
                    "ROI fit, results/round5_wire/sweep.json)")
    ap.add_argument("--wire_hidden", type=int, default=None,
                    help="WIRE arm hidden width (sweep: 512x2 was +14 dB "
                    "over 256x2 on the flagship ROI fit)")
    ap.add_argument("--wire_lr", type=float, default=None,
                    help="WIRE arm lr (sweep: 1e-3 beats the 5e-3 default "
                    "at equal wall-clock)")
    ap.add_argument("--arms", default=None,
                    help="comma subset of {reference,quality,wire} to run "
                    "(default: reference,quality[,wire]). Running without "
                    "'reference' skips the paired-vs-reference stats and "
                    "reports each arm vs its paired spline only — the "
                    "protocol is seed-deterministic, so rows stay "
                    "comparable with a prior full run")
    ap.add_argument("--out", default="results/round4_presets/cohort_ab.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mri_super_resolution_tpu.config import PRESETS, SupperresDWIConfig
    from mri_super_resolution_tpu.core.interp import rescale
    from mri_super_resolution_tpu.core.metrics import masked_ssim_protocol
    from mri_super_resolution_tpu.core.normalize import max_normalize
    from mri_super_resolution_tpu.data import available_patients, load_mat
    from mri_super_resolution_tpu.data import synthetic
    from mri_super_resolution_tpu.pipelines import superres3d

    cfg_ref = SupperresDWIConfig()
    q = {k: v for k, v in PRESETS["quality"].items()
         if k in {f.name for f in dataclasses.fields(SupperresDWIConfig)}}
    cfg_quality = dataclasses.replace(SupperresDWIConfig(), **q)

    b_values = (0.0, 150.0, 1000.0, 1500.0)
    n_half = args.acq_per_half
    n_held = args.acq_heldout or n_half
    rows = available_patients()[: args.patients]
    data_dir = os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data")

    # paired masked-SSIM scorer: one jitted program over the whole
    # (slice x b) table (same shape discipline as superres3d.ssim_table)
    @jax.jit
    def score_table(gt_vol, sr_vol, lr_vol):
        """gt/sr: (sx, sy, S, 3); lr: (lx, ly, S, 3) input LR mean."""
        gts = jnp.moveaxis(gt_vol, (2, 3), (0, 1)).reshape(-1, *gt_vol.shape[:2])
        srs = jnp.moveaxis(sr_vol, (2, 3), (0, 1)).reshape(-1, *sr_vol.shape[:2])
        lrs = jnp.moveaxis(lr_vol, (2, 3), (0, 1)).reshape(-1, *lr_vol.shape[:2])

        def one(gt_im, sr_im, lr_im):
            gt_n = max_normalize(gt_im)
            up = rescale(lr_im, 2, anti_aliasing=True)
            sp_n = max_normalize(up[: gt_im.shape[0], : gt_im.shape[1]])
            sr_n = max_normalize(sr_im)
            psnr = lambda a, b: 10.0 * jnp.log10(
                1.0 / jnp.maximum(jnp.mean((a - b) ** 2), 1e-30))
            return (masked_ssim_protocol(gt_n, sp_n),
                    masked_ssim_protocol(gt_n, sr_n),
                    psnr(gt_n, sp_n), psnr(gt_n, sr_n))

        return jax.vmap(one)(gts, srs, lrs)

    arms = {"reference": cfg_ref, "quality": cfg_quality}
    if args.wire:
        wire_over = {"inr_model": "wire",
                     "wire_trainable": args.wire_trainable}
        if args.wire_hidden is not None:
            wire_over["wire_hidden"] = args.wire_hidden
        if args.wire_lr is not None:
            wire_over["wire_lr"] = args.wire_lr
        arms["wire"] = dataclasses.replace(SupperresDWIConfig(), **wire_over)
    if args.arms:
        want = [a.strip() for a in args.arms.split(",") if a.strip()]
        unknown = set(want) - set(arms)
        if unknown:
            ap.error(f"unknown arms {sorted(unknown)} (have {sorted(arms)})")
        arms = {a: arms[a] for a in want}
    per_arm = {a: {"rows": [], "timings": []} for a in arms}
    for row in rows:
        pt_no = row["pt_id"].split("-")[-1]
        b0 = np.asarray(load_mat(
            os.path.join(data_dir, f"pat{pt_no}_mean_b0.mat"),
            "data_mean_b0", prefer_native=True), dtype=np.float32)
        n_tot = n_half + n_held
        full = synthetic.hybrid_from_b0(
            b0, b_values=b_values, acq_counts=(1, n_tot, n_tot, n_tot),
            seed=int(pt_no))
        inp = [[None] * 4 for _ in range(4)]
        held = [[None] * 4 for _ in range(4)]
        for b in range(4):
            for te in range(4):
                arr = np.asarray(full[b][te], dtype=np.float32)
                if b == 0:
                    inp[b][te] = held[b][te] = arr
                else:
                    inp[b][te] = arr[..., :n_half]
                    held[b][te] = arr[..., n_half:]

        # held-out GT: plain mean over the held-out half at TE index 0,
        # ROI crop, b1..b3 (max-normalized per image inside the scorer)
        r0, r1 = cfg_ref.roi_start, cfg_ref.roi_end
        gt = np.stack([held[b][0].mean(-1) for b in (1, 2, 3)], axis=-1)
        gt_roi = gt[r0:r1, r0:r1]

        for arm, cfg in arms.items():
            res = superres3d.run_patient(inp, np.asarray(b_values), cfg,
                                         seed=0, pt_id=pt_no)
            sr = res.sr_hr_grid[..., 1:4]
            lr = res.mean_img[r0:r1:2, r0:r1:2][..., 1:4]
            sp_s, sr_s, sp_p, sr_p = (np.asarray(x) for x in score_table(
                jnp.asarray(gt_roi), jnp.asarray(sr), jnp.asarray(lr)))
            S = gt_roi.shape[2]
            for i in range(S * 3):
                per_arm[arm]["rows"].append(
                    (pt_no, i // 3, (1, 2, 3)[i % 3],
                     float(sp_s[i]), float(sr_s[i]),
                     float(sp_p[i]), float(sr_p[i])))
            per_arm[arm]["timings"].append(
                {k: round(v, 3) for k, v in res.timings.items()
                 if isinstance(v, float)})
            print(f"pat{pt_no} {arm}: SR ssim mean "
                  f"{np.mean(sr_s):.4f} (spline {np.mean(sp_s):.4f}), "
                  f"fit {res.timings['fit_s']:.1f}s")

    # paired stats: each non-reference arm vs reference on SR SSIM
    from scipy import stats

    ref_rows = per_arm.get("reference", {}).get("rows")
    paired = {}
    for arm in arms:
        if arm == "reference" or ref_rows is None:
            continue
        arm_rows = per_arm[arm]["rows"]
        assert len(ref_rows) == len(arm_rows)
        deltas = [a[4] - r[4] for a, r in zip(arm_rows, ref_rows)]
        wins = sum(d > 0 for d in deltas)
        n = len(deltas)
        paired[arm] = {
            "n": n,
            f"{arm}_wins": wins,
            "mean_delta_ssim": round(float(np.mean(deltas)), 5),
            "median_delta_ssim": round(float(np.median(deltas)), 5),
            "sign_test_p": float(stats.binomtest(wins, n, 0.5).pvalue),
        }

    def arm_summary(rows_, timings):
        sp = [r[3] for r in rows_]
        sr = [r[4] for r in rows_]
        spp = [r[5] for r in rows_]
        srp = [r[6] for r in rows_]
        warm = timings[1:] or timings
        return {
            "sr_ssim_mean": round(float(np.mean(sr)), 5),
            "spline_ssim_mean": round(float(np.mean(sp)), 5),
            "sr_beats_spline_rows": f"{sum(b > a for a, b in zip(sp, sr))}/{len(sp)}",
            "sr_psnr_mean": round(float(np.mean(srp)), 3),
            "spline_psnr_mean": round(float(np.mean(spp)), 3),
            "sr_beats_spline_psnr_rows":
                f"{sum(b > a for a, b in zip(spp, srp))}/{len(spp)}",
            "warm_fit_s_mean": round(float(np.mean(
                [t["fit_s"] for t in warm])), 2),
            "warm_total_s_mean": round(float(np.mean(
                [t["total_s"] for t in warm])), 2),
        }

    out = {
        "protocol": "split-acquisition masked SSIM (held-out GT), "
                    f"{len(rows)} patients x slices x b1..b3, "
                    f"input {n_half} + held-out {n_held} acquisitions per b",
        "platform": jax.devices()[0].platform,
        "arms": {a: arm_summary(per_arm[a]["rows"], per_arm[a]["timings"])
                 for a in arms},
        "paired_vs_reference": paired,
        "per_patient_timings": {a: per_arm[a]["timings"] for a in arms},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["paired_vs_reference"]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
